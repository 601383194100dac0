package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.TableDef
import graft.plan.{PlanError, TableResolver}

/** Format-aware table sources and result sinks.
  *
  * The reference makes the storage engine pluggable through one `Backend`
  * trait with a crate per database (tesseract-core/src/backend.rs;
  * tesseract-clickhouse / tesseract-mysql / tesseract-postgres each
  * reimplement SQL generation for their dialect). On Spark the equivalent
  * pluggability is free: every DataSource format (parquet, csv, json, orc,
  * jdbc, ...) reads into the same DataFrame algebra, so "adding a backend"
  * is a [[SourceSpec]] entry, not a dialect crate. The planner stays
  * storage-agnostic behind [[TableResolver]].
  */
final case class SourceSpec(
    path: String,
    format: String = "parquet",
    options: Map[String, String] = Map.empty,
    /** Optional DDL schema — required for schemaless text formats (csv/json)
      * so member/measure types survive the trip; columnar formats carry
      * their own. */
    schemaDdl: Option[String] = None)

/** Resolves schema table names through per-table [[SourceSpec]] bindings,
  * falling back to `<dir>/<table>.parquet` for unbound names.
  *
  * Scale note: csv/json sources are splittable text scans — fine for dims
  * and ingest staging, but a 100 TB fact belongs in a columnar format where
  * column pruning and predicate pushdown reach the scan; this resolver makes
  * that a deployment choice rather than an engine limitation.
  */
final class FormatResolver(
    bindings: Map[String, SourceSpec],
    fallbackParquetDir: Option[String] = None) extends TableResolver {

  def resolve(spark: SparkSession, table: TableDef): DataFrame =
    bindings.get(table.name) match {
      case Some(spec) =>
        val reader0 = spark.read.format(spec.format).options(spec.options)
        val reader = spec.schemaDdl.fold(reader0)(reader0.schema)
        reader.load(spec.path)
      case None =>
        fallbackParquetDir match {
          case Some(dir) => spark.read.parquet(s"$dir/${table.name}.parquet")
          case None      => throw PlanError(s"no source binding for table '${table.name}'")
        }
    }
}

/** Bucketed table layout — the shuffle-elision story for the biggest joins.
  *
  * A fact⋈fact or fact⋈large-dim join shuffles both sides on the key every
  * query; at 100 TB that shuffle IS the query cost. Writing both tables
  * bucketed (and sorted) on the join key makes the partitioning a stored
  * property: Catalyst sees each side already hash-clustered and elides the
  * Exchange (and with sortBy, the Sort) — the join runs bucket-to-bucket,
  * embarrassingly parallel. This is the deployment-time complement to the
  * per-query broadcast/semi-join choices in the planner. */
object Bucketing {

  /** Writes `df` as an external parquet table bucketed (and sorted) on
    * `keys` — joins between tables sharing bucket keys + count are
    * co-located. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }
}

/** Result sinks: materialize a query result (or a cleaned corpus) to a
  * format + layout. The reference streams results out of HTTP only
  * (format_stream.rs); at pipeline scale results land back on storage, so
  * the write side is first-class here. */
object Sinks {

  /** Writes `df` to `path` in `format`. `partitionBy` columns become
    * directory partitions — the layout that lets downstream readers prune
    * (e.g. a corpus partitioned by lang/split). */
  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit = {
    val w0 = df.write.format(format).mode(mode).options(options)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    w.save(path)
  }
}
