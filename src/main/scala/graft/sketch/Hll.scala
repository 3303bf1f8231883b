package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a *relational* artifact: the sketch
  * IS a tiny DataFrame of `(bucket, r)` rows — at most `m = 2^p` of them —
  * built with one narrow pass plus one ≤ m-row-per-partition shuffle
  * (`groupBy(bucket).max(rho)` combines map-side), merged with plain
  * `union + max`, and persisted like any other table. No custom aggregate
  * state, no binary blobs: every stage is built-in, codegen'd column
  * algebra, so Catalyst sees through the whole plan.
  *
  * Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm" (AofA 2007), with the standard
  * linear-counting small-range correction.
  *
  * Determinism contract (the DuckDB-oracle requirement that rules out
  * Spark's built-in `approx_count_distinct`): the 60-bit hash is the first
  * 15 hex chars of `md5(value)` — identical on any engine with md5 — the
  * bucket is its top `p` bits and rho is derived from `length(bin(w))`,
  * all integer-exact. The only floating math is the final estimate, which
  * callers round for display.
  *
  * Scale shape at 100 TB: the corpus is touched exactly once per sketch
  * build (narrow projection: md5 + shifts), and everything after operates
  * on ≤ m rows per group. Incremental profiling appends a batch sketch to
  * a stored sketch with [[merge]] — the historical corpus is never
  * re-read. Reference analogue: the validation suite's per-column
  * `count(distinct ...)` profile (validate_anonymization.py) — which
  * re-scans the warehouse per run; this is its bounded-memory,
  * incrementally-maintainable replacement.
  */
object Hll {

  /** Default precision: m = 4096 buckets, rel. std error 1.04/√m ≈ 1.6%. */
  val DefaultP = 12

  /** 60-bit non-negative hash of a string column (15 hex chars of md5). */
  def hash60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  private def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-value `(bucket, rho)` pair for the 60-bit hash split p | (60-p).
    * Pure per-row column algebra (no aggregation), which is what lets the
    * streaming leg reuse it inside a windowed aggregation.
    */
  def bucketRho(value: Column, p: Int = DefaultP): (Column, Column) = {
    val wBits = 60 - p
    val h = hash60(value)
    val bucket = shiftright(h, wBits)
    val w = h.bitwiseAND(lit((1L << wBits) - 1L))
    // rho = leading zeros of the wBits-wide suffix + 1; bin() has no
    // leading zeros so length(bin(w)) is floor(log2 w)+1, integer-exact
    val rho = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    (bucket, rho)
  }

  /** Builds the sketch: one row per `groupCols` value per non-empty bucket,
    * `r` = max rho. ≤ m rows per group; map-side combined.
    */
  def sketch(
      df: DataFrame,
      value: Column,
      groupCols: Seq[String] = Nil,
      p: Int = DefaultP
  ): DataFrame = {
    require(p >= 4 && p <= 18, s"hll: p must be in [4,18], got $p")
    val (bucket, rho) = bucketRho(value, p)
    df.filter(value.isNotNull)
      .groupBy((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .agg(max(rho).as("r"))
  }

  /** Multi-column distinct sketches in ONE corpus pass: each row explodes
    * to a `(col_name, bucket, rho)` triple per profiled column, and one
    * map-side-combined aggregation collapses them to ≤ |cols|·m sketch
    * rows. This is the scale path for column profiling: the exact
    * multi-`count_distinct` plan Expands the corpus |cols|× and keeps a
    * per-distinct-value hash state per column — at 100 TB that state IS
    * the corpus; here the explode carries only a column tag and two small
    * ints, and the aggregation state is capped at m buckets per column no
    * matter the cardinality. NULLs are skipped per column (matching the
    * exact profile's `count(distinct col)` semantics).
    */
  def sketchColumns(
      df: DataFrame,
      cols: Seq[String],
      p: Int = DefaultP
  ): DataFrame = {
    require(cols.nonEmpty, "hll: need at least one column to profile")
    val rows = cols.map { c =>
      val (b, r) = bucketRho(col(c).cast("string"), p)
      struct(lit(c).as("col_name"), b.as("bucket"), r.as("r"))
    }
    df.select(explode(array(rows: _*)).as("e"))
      .select(col("e.col_name"), col("e.bucket"), col("e.r"))
      .filter(col("bucket").isNotNull) // a NULL value hashes to NULL
      .groupBy(col("col_name"), col("bucket"))
      .agg(max(col("r")).as("r"))
  }

  /** Merges sketches over the same key space: max is associative and
    * commutative, so merge-of-parts equals the sketch of the union —
    * exactly, not approximately.
    */
  def merge(sketches: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    sketches
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))

  /** Distinct-count estimate per `groupCols` value from a sketch DataFrame:
    * raw HLL with the linear-counting correction below 2.5·m. One ≤ m-row
    * aggregation per group.
    */
  def estimate(
      sk: DataFrame,
      groupCols: Seq[String] = Nil,
      p: Int = DefaultP
  ): DataFrame = {
    val m = 1 << p
    val alpha = alphaM(m)
    val agg = sk
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(pow(lit(2.0), -col("r"))).as("z_filled"),
        count(lit(1)).as("n_buckets")
      )
    val zeros = lit(m.toLong) - col("n_buckets") // empty buckets, rho 0
    val z = col("z_filled") + zeros.cast("double") // each empty adds 2^0
    val raw = lit(alpha) * m.toDouble * m.toDouble / z
    val est = when(
      raw <= lit(2.5 * m) && zeros > 0L,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))
    ).otherwise(raw)
    agg.select((groupCols.map(col) :+ est.as("est_distinct")): _*)
  }

  /** DuckDB twin fragments, kept beside the Spark code so the two sides
    * cannot drift. `duckSketchSql(v)` yields the per-row `(bucket, rho)`
    * select-list; estimate SQL mirrors [[estimate]] term for term.
    */
  object duck {
    def hash60(v: String): String =
      s"cast('0x' || substr(md5($v), 1, 15) as bigint)"

    def bucket(v: String, p: Int = DefaultP): String =
      s"(${hash60(v)} >> ${60 - p})"

    def rho(v: String, p: Int = DefaultP): String = {
      val wBits = 60 - p
      val w = s"(${hash60(v)} & ${(1L << wBits) - 1L})"
      s"(case when $w = 0 then ${wBits + 1} else ${wBits + 1} - length(bin($w)) end)"
    }

    /** est_distinct over a relation `sk(bucket, r)`; caller supplies
      * grouping/from. Same alpha literal as the Spark side.
      */
    def estimateExpr(p: Int = DefaultP): String = {
      val m = 1 << p
      val alpha = alphaM(m)
      // every literal cast to double: DuckDB types bare decimal-point
      // literals as DECIMAL and overflows the m^2 multiplication
      val zeros = s"($m - count(*))"
      val z = s"(sum(power(2.0, -r)) + $zeros)"
      val raw = s"(cast($alpha as double) * $m * $m / $z)"
      s"case when $raw <= cast(${2.5 * m} as double) and $zeros > 0 " +
        s"then $m * ln($m / cast($zeros as double)) else $raw end"
    }
  }
}
