package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Materialization boundaries, mirroring the reference's per-layer configs
  * (dbt_project.yml:80-119): staging = view (lazy), intermediate/marts =
  * table (pinned).
  *
  * In Spark terms: a "view" is a temp view over the lazy plan (Catalyst
  * re-optimizes through it, like dbt's `CREATE VIEW`), a "table" is a
  * parquet/managed-table write that pins the result (like `CREATE TABLE AS`).
  * At cluster scale `table` writes partitioned parquet so downstream layers
  * get partition pruning.
  */
object Materialize {

  /** staging-style: register as (replaceable) temp view, stay lazy. */
  def asView(df: DataFrame, name: String): DataFrame = {
    df.createOrReplaceTempView(name)
    df.sparkSession.table(name)
  }

  /** table-style: pin to storage, return the re-read frame (downstream
    * plans read the materialized copy, exactly like dbt's table
    * materialization).
    */
  def asTable(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Seq.empty
  ): DataFrame = {
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** managed-table flavor (needs a warehouse-enabled session). */
  def saveAsTable(df: DataFrame, name: String): DataFrame = {
    df.write.mode("overwrite").saveAsTable(name)
    df.sparkSession.table(name)
  }
}
