package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Data-QA job behind the reference's `/diagnosis` endpoint
  * (tesseract-server/src/handlers/diagnosis.rs:128-210):
  *
  *   - MissingDimensionIDs: distinct fact FKs absent from the dim table
  *     (left-anti join — distributes as a broadcast/shuffled anti join);
  *   - NonUniqueDimensionIDs: duplicated primary keys in the dim table.
  *
  * One row per (check, dimension); all checks compose into a single plan so
  * the driver pays one job, and each check's fact scan prunes to the FK
  * column only.
  */
object Diagnosis {

  def run(spark: SparkSession, cube: Cube, resolver: TableResolver): DataFrame = {
    val fact = resolver.resolve(spark, cube.table)

    val checks: Seq[DataFrame] = cube.dimensions.flatMap { dim =>
      for {
        fk   <- dim.foreignKey.toSeq
        hier <- dim.hierarchies.find(h => dim.defaultHierarchy.forall(_ == h.name)).toSeq
        t    <- hier.table.toSeq
      } yield {
        val dimDF = resolver.resolve(spark, t)
        val pk    = hier.primaryKey
        val missing = fact.select(col(fk)).distinct()
          .join(dimDF.select(col(pk)), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit("MissingDimensionIDs").as("check_name"),
            lit(dim.name).as("dimension"), col("n"))
        val dup = dimDF.groupBy(col(pk)).count().where(col("count") > 1)
          .agg(count(lit(1)).as("n"))
          .select(lit("NonUniqueDimensionIDs").as("check_name"),
            lit(dim.name).as("dimension"), col("n"))
        Seq(missing, dup)
      }
    }.flatten

    checks.reduce(_ unionByName _).orderBy("check_name", "dimension")
  }
}
