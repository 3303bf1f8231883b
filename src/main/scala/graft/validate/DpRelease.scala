package graft.validate

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.Hll

/** Differentially-private count release via the two-sided geometric
  * mechanism (Ghosh, Roughgarden & Sundararajan, STOC 2009 — the discrete,
  * utility-optimal counterpart of Laplace noise for sensitivity-1 counting
  * queries): released = max(count + K, 0) with P(K = k) proportional to
  * alpha^|k|, alpha = e^-eps.
  *
  * Randomness is DERIVED, not drawn: the uniform driving each group's noise
  * is the engine-portable 60-bit md5 hash of (releaseSalt, group key). That
  * makes the release reproducible, join-stable, and testable — the property
  * every other sampled operator in this repo holds ([[graft.operators]]
  * Sampling) — at the price that the salt must be secret and FRESH per
  * release for the DP guarantee to hold against an adversary who knows the
  * mechanism (a public salt derandomizes the noise; the scaladoc of the
  * release query states this).
  *
  * Determinism contract: the inverse-CDF table is computed ONCE on the
  * driver ([[thresholds]]) and embedded as integer literals in BOTH
  * engines' plans — the pagerank embedded-constant technique — so float
  * rounding in the CDF can never diverge between Spark and the DuckDB
  * twin. The per-row mapping is a single integer comparison chain; no
  * transcendental function touches the data path.
  *
  * Scale shape: one map-side-combined `groupBy(key).count()` plus a narrow
  * post-aggregation projection. The CASE chain is ~2 * 60 ln2 / eps
  * branches (84 for eps = 1), constant per plan, codegen-friendly.
  */
object DpRelease {

  private val Scale = 1L << 60

  /** Cumulative inverse-CDF thresholds for the two-sided geometric noise,
    * scaled to the [0, 2^60) hash domain: the noise for uniform `u` is the
    * `k` of the FIRST entry with `u < threshold`. Enumeration order
    * 0, -1, +1, -2, +2, ... (mass-descending, sign-stable); the last
    * threshold is pinned to 2^60 so every hash maps to some k.
    */
  def thresholds(eps: Double): Seq[(Long, Int)] = {
    // lower bound: the table has ~120 ln2 / eps entries (the k-cap below
    // is a runaway backstop that never binds in the allowed range, so the
    // geometric tail is never truncated while it still carries mass)
    require(eps >= 0.01 && eps <= 16,
      s"dp release: eps must be in [0.01, 16], got $eps")
    val alpha = math.exp(-eps)
    val p0 = (1 - alpha) / (1 + alpha)
    val buf = mutable.ArrayBuffer.empty[(Long, Int)]
    var cum = 0.0
    var last = -1L
    var k = 0
    var done = false
    while (!done) {
      val ks = if (k == 0) Seq(0) else Seq(-k, k)
      for (s <- ks if !done) {
        cum += (if (k == 0) p0 else p0 * math.pow(alpha, k))
        val t = math.round(cum * Scale.toDouble)
        // three exits, all pinning the final entry to 2^60 so every hash
        // maps: the CDF reached the top of the grid; the CDF stopped
        // ADVANCING on the 2^-60 grid (a `u < t` branch with t == previous
        // t can never fire — double summation stalls below 1.0, so without
        // this the loop would pad dead branches to the k-cap, and a
        // 16k-branch CASE chain OOMs codegen); or the runaway backstop
        if (t >= Scale || t <= last || k >= 8192) {
          buf += ((Scale, s))
          done = true
        } else {
          buf += ((t, s))
          last = t
        }
      }
      k += 1
    }
    buf.toSeq
  }

  /** Noise column for a uniform 60-bit hash column: the embedded-literal
    * comparison chain over [[thresholds]].
    */
  def geometricNoise(u: Column, eps: Double): Column = {
    val ts = thresholds(eps)
    val first = when(u < ts.head._1, lit(ts.head._2))
    ts.tail.init
      .foldLeft(first) { case (acc, (t, k)) => acc.when(u < t, lit(k)) }
      .otherwise(lit(ts.last._2))
      .cast("long")
  }

  /** Noise via a LITERAL-ARRAY threshold lookup instead of a comparison
    * chain: `i = |{t : t <= u}|` (a higher-order `filter` over the
    * embedded table) and the enumeration index maps back to
    * `k = 0, -1, +1, -2, +2, ...` arithmetically. Same distribution as
    * [[geometricNoise]]; use this form when the effective epsilon is
    * small (sum releases divide eps by the sensitivity), where the table
    * grows past what a CASE chain should carry (~120 ln2 / eps entries).
    */
  def geometricNoiseArray(u: Column, eps: Double): Column = {
    val ts = thresholds(eps).map(_._1)
    // the last threshold is 2^60 > any u, so i < ts.length always; index
    // parity recovers the sign: 0 -> 0, odd i -> -(i+1)/2, even i -> i/2
    val i = size(filter(
      typedLit(ts.init), t => t <= u)) // u >= t means u is PAST entry t
    (when(i % 2 === 1, -shiftright(i + 1, 1))
      .otherwise(shiftright(i, 1))).cast("long")
  }

  /** eps-DP released SUM of an integer-valued column with bounded
    * per-record contribution: values are CLAMPED to [lo, hi] (making the
    * add/remove-one sensitivity exactly `max(|lo|, |hi|)`), summed per
    * key, and released with two-sided geometric noise at the scaled
    * epsilon `eps / sensitivity` — the standard bounded-contribution sum
    * mechanism on the integer lattice. Output: `(keyName, exact_sum,
    * noise, released_sum)`; `exact_sum` is audit visibility, as in
    * [[noisyCounts]].
    */
  def noisySums(
      df: DataFrame,
      key: Column,
      keyName: String,
      value: Column,
      lo: Long,
      hi: Long,
      eps: Double,
      releaseSalt: String
  ): DataFrame = {
    require(lo < hi, s"dp release: need lo < hi, got [$lo, $hi]")
    val sensitivity = math.max(math.abs(lo), math.abs(hi))
    require(sensitivity > 0, "dp release: a [0, 0] clamp releases nothing")
    val clamped = greatest(least(value.cast("long"), lit(hi)), lit(lo))
    val sums = df
      .filter(value.isNotNull)
      .groupBy(key.as(keyName))
      .agg(sum(clamped).as("exact_sum"))
    val u = Hll.hash60(
      concat(lit(releaseSalt), lit("|"), col(keyName).cast("string")))
    sums
      .withColumn("noise", geometricNoiseArray(u, eps / sensitivity))
      .withColumn("released_sum", col("exact_sum") + col("noise"))
  }

  /** eps-DP released histogram of `key`: `(keyName, exact_n, noise,
    * released_n)` with `released_n = max(exact_n + noise, 0)`. Callers
    * ensure `key` is non-null (a null key nulls the hash, and the two
    * engines disagree on null CASE fall-through).
    *
    * `exact_n` is emitted for AUDIT visibility (the q_hll_distinct
    * pattern); a production release projects it away.
    */
  def noisyCounts(
      df: DataFrame,
      key: Column,
      keyName: String,
      eps: Double,
      releaseSalt: String
  ): DataFrame = {
    val cnt = df.groupBy(key.as(keyName)).agg(count(lit(1)).as("exact_n"))
    val u = Hll.hash60(
      concat(lit(releaseSalt), lit("|"), col(keyName).cast("string")))
    cnt
      .withColumn("noise", geometricNoise(u, eps))
      .withColumn("released_n", greatest(col("exact_n") + col("noise"), lit(0L)))
  }

  /** eps-DP released quantiles: noise the HDR histogram
    * ([[graft.sketch.HdrHistogram]]) bucket-wise with the two-sided
    * geometric mechanism, then read quantiles off the noised cumulative
    * histogram. Each record lands in exactly ONE bucket, so the bucket
    * counts are a sensitivity-1 histogram query (parallel composition:
    * the whole release costs one eps), and the quantile extraction is
    * pure post-processing — no extra privacy spend no matter how many
    * quantiles are read.
    *
    * Like [[noisyCounts]], only OCCUPIED buckets are released (the
    * known-domain caveat: bucket occupancy itself is visible; a
    * suppression-hardened release would noise the full bucket domain).
    * Noised counts clamp at 0, so emptied buckets simply carry no mass
    * in the cumulative read.
    *
    * Scale shape: the sketch build is the only corpus pass; noising and
    * quantile extraction run on the few-hundred-row sketch.
    */
  def noisyQuantiles(
      df: DataFrame,
      value: Column,
      qs: Seq[Double],
      groupCols: Seq[String],
      eps: Double,
      releaseSalt: String
  ): DataFrame = {
    val sk = graft.sketch.HdrHistogram.sketch(df, value, groupCols)
    val keyStr = (groupCols.map(c => col(c).cast("string")) :+
      col("idx").cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    val u = Hll.hash60(concat(lit(releaseSalt), lit("|"), keyStr))
    val released = sk.withColumn(
      "cnt",
      greatest(col("cnt") + geometricNoise(u, eps), lit(0L))
    )
    graft.sketch.HdrHistogram.quantiles(released, qs, groupCols)
  }

  /** DuckDB twin fragments, generated from the SAME threshold table. */
  object duck {
    def hash(releaseSalt: String, keyExpr: String): String =
      Hll.duck.hash60(s"'$releaseSalt' || '|' || cast($keyExpr as varchar)")

    def noiseCase(uExpr: String, eps: Double): String = {
      val ts = thresholds(eps)
      val branches = ts.init
        .map { case (t, k) => s"when $uExpr < $t then cast($k as bigint)" }
        .mkString(" ")
      s"(case $branches else cast(${ts.last._2} as bigint) end)"
    }

    /** Twin of [[geometricNoiseArray]]'s index step: emit this once in a
      * CTE (the table literal is large at small effective eps), then
      * derive the noise with [[noiseFromIndex]].
      */
    def noiseIndex(uExpr: String, eps: Double): String =
      s"len(list_filter([${thresholds(eps).init.map(_._1).mkString(", ")}], " +
        s"t -> t <= $uExpr))"

    def noiseFromIndex(i: String): String =
      s"cast(case when ($i) % 2 = 1 then -((($i) + 1) // 2) " +
        s"else ($i) // 2 end as bigint)"
  }
}
