package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: an HDR-style log-scaled histogram (Gene
  * Tene's HdrHistogram bucketing; same family as DDSketch, Masson et al.,
  * VLDB 2019) over non-negative doubles. Values are fixed-point scaled by
  * 2^20, then indexed by octave (position of the highest bit) with
  * `2^subBits` linear sub-buckets per octave — so the relative error of
  * any reconstructed value is ≤ 2^−subBits, uniformly across the whole
  * representable range.
  *
  * Everything that decides a bucket is EXACT arithmetic: `floor`,
  * `length(bin(s))` for the octave, and division by `power(2, n)` — whose
  * operands stay below 2^53, where IEEE doubles are integer-exact — so any
  * engine replays the same bucket for the same value. (A float `log()`
  * could land an epsilon away from an octave boundary and flip a bucket;
  * a bit-length cannot.) Contract: scaled values `floor(x·2^20)` must stay
  * below 2^53, i.e. x < ~8.6e9 — far above every profiled column here;
  * larger domains would lower `ScaleBits`.
  *
  * The sketch is a DataFrame of `(idx, cnt)` rows (a few hundred in
  * practice); build is one narrow pass plus a map-side-combined
  * aggregation, merge is `union + sum`, and a quantile query is a window
  * cum-sum over the tiny sketch — the corpus is never re-sorted. At 100 TB
  * that is the whole point: exact percentiles need a full shuffle-sort per
  * query, this needs none after the one build pass, and per-batch
  * histograms roll up into the store's running histogram by addition.
  */
object HdrHistogram {

  /** 128 sub-buckets per octave → rel. error ≤ 1/128 ≈ 0.8%. */
  val DefaultSubBits = 7

  /** Fixed-point scale: 2^20 ≈ 1e6 steps below 1.0. */
  private val ScaleBits = 20
  private val Scale = (1L << ScaleBits).toDouble

  /** Bucket index of a non-negative double value; exact integer algebra
    * (the `pow(2,·)` divisions are exact: operands < 2^53).
    */
  def bucketIdx(value: Column, subBits: Int = DefaultSubBits): Column = {
    val s = floor(value * lit(Scale)).cast("long")
    val small = (1L << (subBits + 1)) - 1L
    val e = length(bin(s)) // floor(log2 s) + 1 for s >= 1
    val sh = (e - lit(subBits + 1)).cast("double") // octave shift, >= 1 here
    val mant = floor(s.cast("double") / pow(lit(2.0), sh)) // s >> sh
    when(s <= small, s.cast("double"))
      .otherwise(sh * lit((1L << subBits).toDouble) + mant)
      .cast("long")
  }

  /** Midpoint of bucket `idx` mapped back to the value domain — the
    * estimate reported for any quantile landing in that bucket.
    */
  def bucketMid(idx: Column, subBits: Int = DefaultSubBits): Column = {
    val small = (1L << (subBits + 1)).toLong
    val sh = (floor(idx.cast("double") / lit((1L << subBits).toDouble)) - 1.0)
    val mant = idx.cast("double") - sh * (1L << subBits).toDouble
    val width = pow(lit(2.0), sh)
    val lo = mant * width // mant << sh, exact below 2^53
    when(idx < small, idx.cast("double") / Scale)
      .otherwise((lo + (width - 1.0) / 2.0) / Scale)
  }

  /** Builds the histogram: `(groupCols..., idx, cnt)`. */
  def sketch(
      df: DataFrame,
      value: Column,
      groupCols: Seq[String] = Nil,
      subBits: Int = DefaultSubBits
  ): DataFrame =
    df.filter(value.isNotNull && value >= 0.0)
      .groupBy((groupCols.map(col) :+ bucketIdx(value, subBits).as("idx")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge = bucket-wise sum. */
  def merge(sketches: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    sketches
      .groupBy((groupCols.map(col) :+ col("idx")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a sketch: for each q, the midpoint of the
    * first bucket whose cumulative count reaches `ceil(q·n)` (the
    * `percentile_disc` convention). One window cum-sum over the tiny
    * sketch, then ALL requested quantiles in a single conditional-min
    * aggregation — a filter-per-q formulation would re-derive the sketch
    * (and its corpus scan) once per quantile.
    */
  def quantiles(
      sk: DataFrame,
      qs: Seq[Double],
      groupCols: Seq[String] = Nil,
      subBits: Int = DefaultSubBits
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"hdr: quantiles must be in (0,1], got $qs")
    val w = if (groupCols.isEmpty) Window.partitionBy()
            else Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(w.orderBy(col("idx"))))
      .withColumn("n", sum(col("cnt")).over(w))
    val picks = qs.zipWithIndex.map { case (q, i) =>
      val rank = greatest(ceil(lit(q) * col("n").cast("double")), lit(1.0))
      min(when(col("cum").cast("double") >= rank, col("idx"))).as(s"_q$i")
    }
    val rows = qs.zipWithIndex.map { case (q, i) =>
      struct(lit(q).as("q"), col(s"_q$i").as("idx"))
    }
    cum
      .groupBy(groupCols.map(col): _*)
      .agg(picks.head, picks.tail: _*)
      .select((groupCols.map(col) :+ explode(array(rows: _*)).as("_pick")): _*)
      .select((groupCols.map(col) :+ col("_pick.q").as("q") :+
        bucketMid(col("_pick.idx"), subBits).as("est")): _*)
  }

  /** Percentile-rank transform: map every row's value to the fraction of
    * the sketched population at or below its HDR bucket (`cum/n`). The
    * 100 TB use: percentile-normalize a score column corpus-wide (e.g.
    * for quality-curriculum mixing) with ONE sketch pass + a broadcast
    * equi-join on the row's bucket index — where the exact transform is a
    * global sort (`percent_rank` shuffles the whole corpus into one
    * ordered partition per group).
    *
    * Self-normalization contract: `rows` must be (a subset of) the data
    * the sketch was built from, so every row's bucket exists in the
    * sketch — the equi-join is then lossless. Resolution is the bucket
    * width: values in one bucket share a rank (≤0.8% relative error on
    * the value axis at the default 128 sub-buckets).
    */
  def percentileRank(
      sk: DataFrame,
      rows: DataFrame,
      value: Column,
      groupCols: Seq[String] = Nil,
      outName: String = "pct_rank",
      subBits: Int = DefaultSubBits
  ): DataFrame = {
    val w = if (groupCols.isEmpty) Window.partitionBy()
            else Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(w.orderBy(col("idx"))))
      .withColumn("n", sum(col("cnt")).over(w))
      .select((groupCols.map(col) :+ col("idx") :+ col("cum") :+ col("n")): _*)
    rows
      .filter(value.isNotNull && value >= 0.0)
      .withColumn("idx", bucketIdx(value, subBits))
      .join(broadcast(cum), groupCols :+ "idx")
      .withColumn(outName, col("cum").cast("double") / col("n").cast("double"))
      .drop("idx", "cum", "n")
  }

  /** DuckDB twin fragments — the same exact algebra, textual form. */
  object duck {
    def s(v: String): String = s"cast(floor(($v) * ${Scale.toLong}) as bigint)"

    def idx(v: String, subBits: Int = DefaultSubBits): String = {
      val sv = s(v)
      val small = (1L << (subBits + 1)) - 1L
      val sh = s"(length(bin($sv)) - ${subBits + 1})"
      val mant = s"floor($sv / power(2.0, $sh))"
      s"cast(case when $sv <= $small then $sv " +
        s"else $sh * ${(1L << subBits).toDouble} + $mant end as bigint)"
    }

    def mid(idx: String, subBits: Int = DefaultSubBits): String = {
      val small = 1L << (subBits + 1)
      val sh = s"(floor(($idx) / ${(1L << subBits).toDouble}) - 1.0)"
      val mant = s"(($idx) - $sh * ${(1L << subBits).toDouble})"
      val width = s"power(2.0, $sh)"
      s"(case when ($idx) < $small then ($idx) / $Scale " +
        s"else ($mant * $width + ($width - 1.0) / 2.0) / $Scale end)"
    }
  }
}
