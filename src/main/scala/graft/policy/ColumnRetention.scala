package graft.policy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage limitation (GDPR Art. 5.1.e) enforced at COLUMN granularity —
  * the obligation the reference declares on every PII column
  * (`/root/reference/dbt_project/models/staging/schema.yml:62,83,100,117,143`:
  * `retention_days: 730`) but, like its `validate_pii_metadata` family,
  * never executes. Row-level expiry already exists ([[graft.operators.Ttl]]
  * drops whole day-partitions; `CurateCli retention` retires batches);
  * this module covers the case those cannot: the ROW is still lawful to
  * keep (the service exists, its non-PII facts serve the mission) while a
  * PII CELL inside it has outlived its declared retention window and must
  * be suppressed.
  *
  * Expiry rule: a cell expires when its row's freshness timestamp is
  * strictly older than the column's window — `datediff(asOf, ts) >
  * retentionDays` — so day `retentionDays` itself is still inside the
  * window ("keep for 730 days" keeps the 730th). A NULL timestamp cannot
  * prove recency, and storage limitation puts the burden of proof on
  * keeping, not dropping: unprovable cells expire conservatively.
  *
  * Scale shape: [[expire]] is a pure projection (per-cell `when` over the
  * existing scan — whole-stage codegen, zero shuffle, zero extra jobs) and
  * [[expiryReport]] is ONE aggregation pass producing a policy-sized
  * report; neither reads the table twice, so both hold unchanged at 100 TB.
  */
object ColumnRetention {

  private def governed(
      df: DataFrame,
      model: String,
      catalog: PolicyCatalog
  ): Seq[(String, Int)] = {
    val pols = catalog.models.getOrElse(model, Map.empty)
    df.columns.toSeq.flatMap(c =>
      pols.get(c).filter(_.pii).flatMap(_.retentionDays).map(d => (c, d)))
  }

  private def alive(tsCol: String, asOf: Column, days: Int): Column =
    col(tsCol).isNotNull && datediff(asOf, col(tsCol)) <= days

  /** Null out, on every row, each PII cell whose column declares
    * `retention_days` and whose row timestamp falls outside that window
    * as of `asOf` — rows, non-PII columns, and PII columns without a
    * declared window pass through untouched, as do cells still inside
    * their window. Columns the policy governs but the frame lacks are
    * ignored (the catalog spans more models than any one frame).
    */
  def expire(
      df: DataFrame,
      model: String,
      catalog: PolicyCatalog,
      tsCol: String,
      asOf: Column
  ): DataFrame = {
    require(df.columns.contains(tsCol),
      s"column retention: frame has no timestamp column '$tsCol'")
    val windows = governed(df, model, catalog).toMap
    df.select(df.columns.toSeq.map { c =>
      windows.get(c) match {
        case Some(days) =>
          when(alive(tsCol, asOf, days), col(c)).as(c)
        case None => col(c)
      }
    }: _*)
  }

  /** The audit twin of [[expire]]: per governed column, how many non-null
    * cells its window expires and how many survive, as of `asOf` — the
    * evidence a DPO files with the suppression run. One aggregation pass
    * (`(column_name, retention_days, n_expired, n_retained)`, one row per
    * governed column, sorted by name). A NULL timestamp counts toward
    * `n_expired` (same conservative rule as [[expire]]).
    */
  def expiryReport(
      df: DataFrame,
      model: String,
      catalog: PolicyCatalog,
      tsCol: String,
      asOf: Column
  ): DataFrame = {
    require(df.columns.contains(tsCol),
      s"column retention: frame has no timestamp column '$tsCol'")
    val cols = governed(df, model, catalog).sortBy(_._1)
    require(cols.nonEmpty,
      s"column retention: no column of '$model' in this frame declares " +
        "retention_days")
    val aggs = cols.flatMap { case (c, days) =>
      Seq(
        sum(when(col(c).isNotNull && !alive(tsCol, asOf, days), 1L)
          .otherwise(0L)).as(s"__exp_$c"),
        sum(when(col(c).isNotNull && alive(tsCol, asOf, days), 1L)
          .otherwise(0L)).as(s"__ret_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { case (c, days) =>
        struct(
          lit(c).as("column_name"),
          lit(days).as("retention_days"),
          coalesce(col(s"__exp_$c"), lit(0L)).as("n_expired"),
          coalesce(col(s"__ret_$c"), lit(0L)).as("n_retained"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }
}
