package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Population-stability-index (PSI) drift between two corpus slices — the
  * standard data-quality monitor a training pipeline runs between crawl
  * snapshots (or train vs eval mixes) to catch distribution shift on a
  * bucketed feature before it reaches the trainer.
  *
  *   psi = Σ over buckets of (p_a - p_b) · ln(p_a / p_b)
  *
  * with add-0.5 Laplace smoothing over a FIXED bucket domain of
  * `domainSize` (so empty buckets are well-defined and both engines agree
  * without knowing the observed-bucket count):
  *
  *   p_x = (cnt_x + 0.5) / (tot_x + 0.5 · domainSize)
  *
  * Scale shape: one keyed aggregation per slice (map-side partial combine
  * collapses each to ≤ domainSize rows) and a full-outer join on the bucket
  * key between two tiny aggregates. Totals are passed in pre-computed so the
  * plan stays a pure function of its inputs (same contract as
  * [[graft.text.TfIdf.topTerms]]).
  */
object Drift {

  /** @param bucketCol expression mapping a row to its bucket in
    *                   [0, domainSize) — same expression for both slices
    * @return one row per observed bucket: `cnt_a`, `cnt_b`, and the PSI
    *         contribution `psi` (the full index is their sum; unobserved
    *         buckets contribute exactly 0 under smoothing since p_a = p_b)
    */
  def psiByBucket(
      sliceA: DataFrame,
      sliceB: DataFrame,
      bucketCol: Column,
      totA: Long,
      totB: Long,
      domainSize: Int
  ): DataFrame = {
    require(domainSize > 0, "psi: domainSize must be positive")
    val a = sliceA.groupBy(bucketCol.as("bucket")).agg(count(lit(1)).as("cnt_a"))
    val b = sliceB.groupBy(bucketCol.as("bucket")).agg(count(lit(1)).as("cnt_b"))
    val pa = (coalesce(col("cnt_a"), lit(0L)) + 0.5) / (lit(totA) + 0.5 * domainSize)
    val pb = (coalesce(col("cnt_b"), lit(0L)) + 0.5) / (lit(totB) + 0.5 * domainSize)
    // null-SAFE join key: a null bucket (out-of-contract but possible from a
    // malformed feature) must land on ONE row, not two half-counted ones
    a.join(b, a("bucket") <=> b("bucket"), "full_outer")
      .select(
        coalesce(a("bucket"), b("bucket")).as("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        ((pa - pb) * log(pa / pb)).as("psi"))
  }

  /** One-job variant: the slice totals are recovered IN-PLAN as whole-frame
    * window sums over the joined per-bucket counts — every slice row lands
    * in exactly one bucket (null included, via the null-safe join), so
    * Σ cnt_x over buckets IS count(slice_x). The window runs over the
    * post-aggregation frame, which is ≤ observed-bucket-count rows (tiny by
    * construction), so the single-partition window is free — and the plan
    * needs no second scan of either slice and no driver pre-count.
    */
  def psiByBucket(
      sliceA: DataFrame,
      sliceB: DataFrame,
      bucketCol: Column,
      domainSize: Int
  ): DataFrame = {
    require(domainSize > 0, "psi: domainSize must be positive")
    val a = sliceA.groupBy(bucketCol.as("bucket")).agg(count(lit(1)).as("cnt_a"))
    val b = sliceB.groupBy(bucketCol.as("bucket")).agg(count(lit(1)).as("cnt_b"))
    val joined = a.join(b, a("bucket") <=> b("bucket"), "full_outer")
      .select(
        coalesce(a("bucket"), b("bucket")).as("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val whole = Window.partitionBy()
    val totA = sum(col("cnt_a")).over(whole)
    val totB = sum(col("cnt_b")).over(whole)
    val pa = (col("cnt_a") + 0.5) / (totA + 0.5 * domainSize)
    val pb = (col("cnt_b") + 0.5) / (totB + 0.5 * domainSize)
    joined.select(
      col("bucket"), col("cnt_a"), col("cnt_b"),
      ((pa - pb) * log(pa / pb)).as("psi"))
  }
}
