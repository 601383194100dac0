package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary — the mergeable frequent-items sketch
  * (Misra & Gries 1982 "Finding repeated elements"; merge rule from
  * Agarwal et al., PODS'12 "Mergeable summaries"). A capacity-m summary
  * guarantees, for every item x over a stream of N total items, an estimate
  * with `count(x) - N/(m+1) <= est(x) <= count(x)` — and Agarwal et al.
  * prove the COMBINED error stays N/(m+1) under arbitrary merge trees, so
  * per-partition partials merged shuffle-side keep the bound. Consequence:
  * any item with true frequency strictly above N/(m+1) is guaranteed
  * present in the final summary. The retained SET beyond those is
  * partitioning-dependent — callers must treat it as a candidate superset
  * and confirm with exact counts (p39 does; its final answer is therefore
  * deterministic and exact while the sketch pass stays bounded-state).
  *
  * Scale shape: per-group per-partition state is at most m (key, counter)
  * entries, merged like any algebraic partial — the token space itself is
  * never shuffled, which is the point at 100 TB: a raw `groupBy(token)`
  * shuffles the full vocabulary, the sketch pass moves <= m entries per
  * partition, and the confirm pass touches only candidate tokens.
  *
  * Update is amortized O(1): the decrement-all step (full map sweep) only
  * fires when an unseen key meets a full summary, and each firing removes
  * >= m+1 units of counter mass, so sweeps number at most N/(m+1). */
object MgSketch {

  val DefaultCapacity = 256

  type Summary = mutable.HashMap[String, Long]

  /** MG update: count key `v` into `buf`, keeping at most m entries. */
  private[functions] def insert(buf: Summary, v: String, m: Int): Unit = {
    buf.get(v) match {
      case Some(c) => buf.update(v, c + 1)
      case None if buf.size < m => buf.update(v, 1L)
      case None =>
        // full summary, unseen key: decrement everything (the new key's
        // single unit included, so it is discarded), drop zeros
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace { (_, c) => c - 1 }
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity subtract
    * the (m+1)-th largest counter from all and keep the strictly-positive
    * survivors (at most m of them, by construction). */
  private[functions] def merge(a: Summary, b: Summary, m: Int): Summary = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (m + 1)) // (m+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (_, c) => c - cut }
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  /** Candidate heavy-hitter keys of a string column: every item with
    * frequency > N/(capacity+1) is guaranteed included; the rest of the
    * returned set is a partitioning-dependent superset — confirm with exact
    * counts before treating any member as frequent. Output sorted for a
    * stable display; correctness must not depend on the exact set. */
  final case class Candidates(
      child: Expression,
      capacity: Int = DefaultCapacity,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Summary]
      with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    require(capacity > 0, "MG capacity must be positive")

    override def createAggregationBuffer(): Summary = mutable.HashMap.empty

    override def update(buffer: Summary, input: InternalRow): Summary = {
      val v = child.eval(input)
      if (v != null) insert(buffer, v.asInstanceOf[UTF8String].toString, capacity)
      buffer
    }

    override def merge(buffer: Summary, input: Summary): Summary =
      MgSketch.merge(buffer, input, capacity)

    override def eval(buffer: Summary): Any = {
      val keys = buffer.keysIterator.map(UTF8String.fromString).toArray[AnyRef]
      java.util.Arrays.sort(keys, (x: AnyRef, y: AnyRef) =>
        x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String]))
      new GenericArrayData(keys)
    }

    override def serialize(buffer: Summary): Array[Byte] = {
      val entries = buffer.iterator
        .map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }.toArray
      val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
      bb.putInt(entries.length)
      entries.foreach { case (kb, c) => bb.putInt(kb.length); bb.put(kb); bb.putLong(c) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Summary = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val kb = new Array[Byte](bb.getInt()); bb.get(kb)
        out.update(new String(kb, StandardCharsets.UTF_8), bb.getLong())
        i += 1
      }
      out
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes = Seq(StringType)
    override def withNewMutableAggBufferOffset(n: Int): Candidates = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): Candidates = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): Candidates = copy(child = newChild)
    override def prettyName: String = "mg_candidates"
  }

  /** Aggregate column: candidate heavy-hitter keys of a string column. */
  def candidatesCol(values: Column, capacity: Int = DefaultCapacity): Column =
    ColumnBridge.column(Candidates(ColumnBridge.expression(values), capacity).toAggregateExpression())
}
