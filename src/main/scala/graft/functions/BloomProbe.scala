package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over Spark's own runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.enabled`), surfaced as
  * explicit Columns for operators whose pruning side is too large to
  * broadcast as an exact set but fits as a bits-bounded sketch.
  *
  * The aggregate runs distributed (per-partition filters OR-merged
  * shuffle-side); the single resulting binary is embedded as a foldable
  * literal — the same constant-bloom shape the optimizer produces when it
  * rewrites a runtime filter's scalar subquery, which is what
  * `BloomFilterMightContain` requires of its filter side, and what keeps
  * the probe inside whole-stage codegen (the filter deserializes once per
  * task, not per row).
  *
  * Correct use is PREFILTER + EXACT CONFIRM: `mightContain` can return
  * false positives (never false negatives), so a join against the true set
  * must follow — the bloom's job is to shrink what reaches that join. */
object BloomProbe {

  /** Aggregate column: a bloom filter (binary) over an int64 column. */
  def aggCol(values: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(values),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Probe predicate: might `value` (int64) be in the serialized filter?
    * False positives possible at the filter's FPP; false negatives never. */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(value)))
}
