package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over event streams: bucket events per
  * key per hour, then score each bucket against the trailing-window
  * baseline of the SAME key.
  *
  * Scale shape: one map-side-combined aggregation to hourly grain (the
  * corpus-sized pass), then window functions over the hourly table — which
  * is |keys|·|hours| rows, thousands-fold smaller than the input, keyed
  * shuffle only. The frame is RANGE over epoch-hours, not ROWS, so silent
  * hours (missing buckets) still age out of the baseline on the clock —
  * a rows-frame would stretch the baseline arbitrarily far back for
  * bursty keys.
  *
  * Numeric parity: the baseline keeps exact integer sums (`Σn`, `Σn²`)
  * and derives mean/variance in ONE closed-form double expression
  * (`var = Σn²/c − (Σn/c)²`), so any engine replays the doubles
  * bit-for-bit. Built-in `stddev` would NOT give that: streaming-Welford
  * vs naive two-pass accumulate different floating error.
  */
object Anomaly {

  /** Hourly-count z-scores for `df`'s events.
    *
    * @param tsCol       event-time timestamp column
    * @param keyCols     series keys (each key gets its own baseline)
    * @param baselineHours trailing window size in hours (exclusive of the
    *                      scored hour)
    * @param minBaseline   minimum observed hours in the window; below it
    *                      the score is null (cold-start guard)
    * @param zThreshold    |z| at or above which `is_anomaly` is 1
    *
    * Output per (key, hour): n, base_cnt, base_sum, base_sumsq,
    * mean/z (nullable doubles), is_anomaly (nullable 0/1).
    */
  /** The corpus-sized pass: events to per-key hourly counts
    * (keys..., hour, n). Also the grain [[EventStatsStore]] persists.
    */
  def hourlyCounts(df: DataFrame, tsCol: String, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "anomaly detection needs at least one key column")
    df.groupBy(
        (keyCols.map(col) :+ date_trunc("hour", col(tsCol)).as("hour")): _*
      )
      .agg(count(lit(1)).as("n"))
  }

  def hourlyZScores(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      baselineHours: Int = 24,
      minBaseline: Int = 12,
      zThreshold: Double = 3.0
  ): DataFrame =
    scoreHourly(hourlyCounts(df, tsCol, keyCols), keyCols,
      baselineHours, minBaseline, zThreshold)

  /** Scoring over a precomputed hourly-count table (keys..., hour, n) —
    * the stage [[EventStatsStore.score]] reuses against persisted counts,
    * where the corpus pass has already been paid batch by batch.
    */
  def scoreHourly(
      hourlyIn: DataFrame,
      keyCols: Seq[String],
      baselineHours: Int = 24,
      minBaseline: Int = 12,
      zThreshold: Double = 3.0
  ): DataFrame = {
    require(keyCols.nonEmpty, "anomaly detection needs at least one key column")
    require(baselineHours >= 1 && minBaseline >= 1)

    val hourly = hourlyIn
      // epoch-hour index: integer, identical across engines, range-frameable
      .withColumn("hr_idx", (unix_timestamp(col("hour")) / 3600L).cast("long"))

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("hr_idx"))
      .rangeBetween(-baselineHours.toLong, -1L)

    scoreOverWindow(hourly, w, minBaseline, zThreshold).drop("hr_idx")
  }

  /** Seasonal variant: each hour's baseline is the SAME hour-of-day over
    * the trailing `baselineDays` days of its series — the right null
    * model for strongly diurnal traffic, where yesterday-same-hour
    * predicts better than the last 24 hours (a 9am spike is not an
    * anomaly just because nights are quiet). Same exact-sums algebra;
    * the frame ranges over epoch-DAYS within a (key, hour-of-day)
    * partition.
    */
  def seasonalZScores(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      baselineDays: Int = 7,
      minBaseline: Int = 3,
      zThreshold: Double = 3.0
  ): DataFrame = {
    require(keyCols.nonEmpty, "anomaly detection needs at least one key column")
    require(baselineDays >= 1 && minBaseline >= 1)

    val hourly = hourlyCounts(df, tsCol, keyCols)
      .withColumn("hod", hour(col("hour")))
      .withColumn("day_idx", (unix_timestamp(col("hour")) / 86400L).cast("long"))

    val w = Window
      .partitionBy((keyCols.map(col) :+ col("hod")): _*)
      .orderBy(col("day_idx"))
      .rangeBetween(-baselineDays.toLong, -1L)

    scoreOverWindow(hourly, w, minBaseline, zThreshold)
      .drop("day_idx")
  }

  /** Retrospective changepoint detection per series — the CUSUM chart
    * (Page, Biometrika 1954): `S_t = Σ_{i<=t}(n_i − n̄)` walks away from
    * zero when the level SHIFTS (a mean change tilts every subsequent
    * step), where the z-score detectors above only see single-hour
    * spikes. The estimated changepoint is the argmax of |S_t| (earliest
    * hour on ties) and the evidence is `s_range / (sd·√T)` — under a
    * stable mean the normalized range concentrates near a small
    * constant; a genuine shift grows it with √T.
    *
    * Everything derives from the hourly table: per-key totals (mean, sd
    * in the closed exact-sums form), one ordered cumulative window, one
    * rank to pick the argmax. No recursion, no driver state — unlike
    * clamped sequential CUSUM, the chart form is pure window algebra,
    * which is what makes it replayable on any engine and cheap at any
    * scale.
    */
  def changepoint(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "changepoint detection needs at least one key column")
    val hourly = hourlyCounts(df, tsCol, keyCols)
      .withColumn("hr_idx", (unix_timestamp(col("hour")) / 3600L).cast("long"))

    val whole = Window.partitionBy(keyCols.map(col): _*)
    val ordered = whole.orderBy(col("hr_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withTotals = hourly
      .withColumn("t_sum", sum(col("n")).over(whole))
      .withColumn("t_sumsq", sum(col("n") * col("n")).over(whole))
      .withColumn("t_cnt", count(col("n")).over(whole))
    val mean = col("t_sum").cast("double") / col("t_cnt").cast("double")
    val variance =
      col("t_sumsq").cast("double") / col("t_cnt").cast("double") - mean * mean
    val withS = withTotals
      .withColumn("s", sum(col("n").cast("double") - mean).over(ordered))
      .withColumn("sd", sqrt(greatest(variance, lit(0.0))))

    val ranked = withS
      .withColumn("s_max", max(col("s")).over(whole))
      .withColumn("s_min", min(col("s")).over(whole))
      .withColumn(
        "rn",
        row_number().over(whole.orderBy(abs(col("s")).desc, col("hr_idx"))))
    ranked
      .filter(col("rn") === 1)
      .select(
        (keyCols.map(col) :+
          col("hour").as("cp_hour") :+
          col("t_cnt").as("n_hours") :+
          abs(col("s")).as("s_max_abs") :+
          (col("s_max") - col("s_min")).as("s_range") :+
          when(col("sd") > 0.0,
            (col("s_max") - col("s_min")) /
              (col("sd") * sqrt(col("t_cnt").cast("double")))).as("stat")): _*)
  }

  private def scoreOverWindow(
      hourly: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec,
      minBaseline: Int,
      zThreshold: Double
  ): DataFrame = {
    val baseCnt = count(col("n")).over(w)
    val baseSum = sum(col("n")).over(w)
    val baseSumSq = sum(col("n") * col("n")).over(w)

    val scored = hourly
      .withColumn("base_cnt", baseCnt)
      .withColumn("base_sum", baseSum)
      .withColumn("base_sumsq", baseSumSq)

    val c = col("base_cnt").cast("double")
    val mean = col("base_sum").cast("double") / c
    val variance = col("base_sumsq").cast("double") / c - mean * mean
    // variance is >= 0 mathematically; clamp the closed form's negative
    // float dust so sqrt never NaNs (both engines clamp identically)
    val sd = sqrt(greatest(variance, lit(0.0)))
    val zOk = col("base_cnt") >= minBaseline && sd > 0.0
    val z = (col("n").cast("double") - mean) / sd

    scored
      .withColumn("mean_n", when(col("base_cnt") >= minBaseline, mean))
      .withColumn("z", when(zOk, z))
      .withColumn(
        "is_anomaly",
        when(zOk, when(abs(z) >= zThreshold, 1).otherwise(0))
      )
  }
}
