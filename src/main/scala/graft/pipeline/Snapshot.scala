package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD-2 snapshots — the reference *configures* a timestamp-strategy
  * snapshot (`strategy: timestamp, unique_key: record_id, updated_at:
  * updated_at`, dbt_project.yml:161-173) but ships no snapshot model; this
  * implements the declared semantics so the config surface is usable
  * (additive, not parity — SURVEY.md §2.6).
  *
  * dbt timestamp-strategy semantics: a row version is superseded when a new
  * row with the same unique key arrives with a strictly newer `updated_at`;
  * superseded versions get `valid_to` set, current versions keep
  * `valid_to = NULL`.
  *
  * Implemented as a join-free union + window pass (one shuffle keyed by the
  * unique key) — the Spark-native shape of a merge/upsert; on real
  * deployments the same function runs over Delta-style storage, here it
  * returns the new snapshot table for the caller to pin via [[Materialize]].
  */
object Snapshot {

  /** Apply new rows to an existing snapshot (may be empty). Both inputs
    * must carry `uniqueKey` and `updatedAt` columns; `snapshot` additionally
    * carries valid_from/valid_to from a prior application.
    */
  def applyTimestampStrategy(
      snapshot: DataFrame,
      newRows: DataFrame,
      uniqueKey: String,
      updatedAt: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val dataCols = newRows.columns.toSeq
    val withValidity = newRows
      .select(dataCols.map(col): _*)
      .withColumn("valid_from", col(updatedAt))
      .withColumn("valid_to", lit(null).cast(newRows.schema(updatedAt).dataType))

    val all = snapshot.select(withValidity.columns.map(col): _*)
      .unionByName(withValidity)
      // same key + same updated_at re-delivered -> keep one version
      .dropDuplicates(uniqueKey, updatedAt)

    val byKey = Window.partitionBy(col(uniqueKey)).orderBy(col(updatedAt))
    all
      .withColumn("_next_from", lead(col(updatedAt), 1).over(byKey))
      .withColumn("valid_to", col("_next_from"))
      .drop("_next_from")
  }

  /** Start a snapshot from scratch. */
  def initial(newRows: DataFrame, uniqueKey: String, updatedAt: String): DataFrame =
    applyTimestampStrategy(
      newRows.limit(0)
        .withColumn("valid_from", col(updatedAt))
        .withColumn("valid_to", lit(null).cast(newRows.schema(updatedAt).dataType)),
      newRows,
      uniqueKey,
      updatedAt
    )

  /** Current (non-superseded) versions. */
  def current(snapshot: DataFrame): DataFrame =
    snapshot.filter(col("valid_to").isNull)

  /** Versions valid at a point in time. */
  def asOf(snapshot: DataFrame, ts: Column): DataFrame =
    snapshot.filter(
      col("valid_from") <= ts &&
        (col("valid_to").isNull || col("valid_to") > ts)
    )
}
