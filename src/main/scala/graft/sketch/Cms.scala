package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a relational artifact: `d` independent hash rows of
  * `w` counters, materialized as a DataFrame of at most `d·w`
  * `(row, bucket, cnt)` cells. Build is one explode + one map-side-combined
  * aggregation; point-frequency queries join the (tiny, broadcastable)
  * counter table and take `min` over the d rows; merge of two sketches is
  * `union + sum` — exact, because each cell is a plain count.
  *
  * Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications" (J. Algorithms 2005).
  *
  * The estimate never undercounts (each cell ≥ the true count) and
  * overcounts by at most 2N/w with probability 1 − 2^−d — the classic
  * guarantee a frequency monitor needs at 100 TB, where an exact
  * per-token count table would itself be corpus-sized, while this is
  * `d·w` cells no matter how many distinct tokens flow through.
  *
  * Determinism: row j's hash of token t is the md5 of `"j|t"` — seeded by
  * prefixing, not by runtime salts — so any md5-bearing engine replays the
  * exact cell layout.
  */
object Cms {

  /** Default geometry: 4 rows × 1024 counters = 4096 cells. */
  val DefaultD = 4
  val DefaultW = 1024

  def bucketFor(row: Int, value: Column, w: Int): Column =
    pmod(Hll.hash60(concat(lit(s"$row|"), value)), lit(w.toLong))

  /** One `(row, bucket)` struct per hash row for one input value — the
    * explode payload shared by the batch build, the probe side, and the
    * streaming variant, so every consumer reads its input exactly ONCE
    * regardless of d (a union-of-d-branches formulation would scan it d
    * times).
    */
  private[graft] def cellStructs(value: Column, d: Int, w: Int): Column =
    array((0 until d).map { j =>
      struct(lit(j).as("row"), bucketFor(j, value, w).as("bucket"))
    }: _*)

  /** Builds the counter table from one value column: rows `(row, bucket,
    * cnt)`, at most d·w of them, each the number of input values hashing
    * into that cell. One narrow pass over the input.
    */
  def sketch(
      df: DataFrame,
      value: Column,
      d: Int = DefaultD,
      w: Int = DefaultW
  ): DataFrame = {
    require(d >= 1 && d <= 16, s"cms: d must be in [1,16], got $d")
    require(w >= 16, s"cms: w must be >= 16, got $w")
    df.filter(value.isNotNull)
      .select(explode(cellStructs(value, d, w)).as("e"))
      .groupBy(col("e.row").as("row"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge = cell-wise sum (counts are additive across slices/batches). */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for the distinct values of `value` in
    * `queries`: min over the d cells each value hashes to. The sketch side
    * is ≤ d·w rows — Spark broadcasts it; the probe never rescans the
    * corpus the sketch summarized.
    *
    * Absent cells COUNT AS ZERO (left join + coalesce): a value the
    * sketched corpus never touched estimates 0, not "missing" — an inner
    * join would silently drop never-seen probes (or min over only their
    * collided cells), breaking the never-undercount-by-at-most-2N/w
    * contract exactly for the monitoring case that asks about absent
    * values.
    */
  def estimate(
      sk: DataFrame,
      queries: DataFrame,
      value: Column,
      d: Int = DefaultD,
      w: Int = DefaultW
  ): DataFrame =
    queries
      .filter(value.isNotNull)
      .select(value.as("value"), explode(cellStructs(value, d, w)).as("e"))
      .select(col("value"), col("e.row").as("row"), col("e.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** Join-cardinality estimate from two sketches over the join key:
    * `|A ⋈ B| ≈ min_j Σ_b A_j[b]·B_j[b]` — the count-min inner-product
    * estimate (Cormode & Muthukrishnan §4.2). Like point queries it NEVER
    * undercounts (collisions only add), so it is a safe upper bound for
    * join planning: decide broadcast vs shuffle vs skew-salting from two
    * d·w-cell artifacts BEFORE paying for the join itself — at 100 TB the
    * estimate costs two map-side-combined passes that incremental
    * profiling has often already paid, while the exact answer costs the
    * full join.
    *
    * A hash row with no shared buckets has true inner product 0, so the
    * min runs over a complete 0..d-1 spine (left join + coalesce), not
    * just the rows the inner cell-join happened to produce.
    */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame, d: Int = DefaultD): DataFrame = {
    val spark = skA.sparkSession
    val dots = skA
      .select(col("row"), col("bucket"), col("cnt").as("cnt_a"))
      .join(skB.select(col("row"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
    spark
      .range(d)
      .select(col("id").cast("int").as("row"))
      .join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("join_size_est"))
  }

  /** DuckDB twin fragments (see [[Hll.duck]]). */
  object duck {
    def bucket(row: Int, v: String, w: Int = DefaultW): String =
      s"(${Hll.duck.hash60(s"'$row|' || $v")} % $w)"
  }
}
