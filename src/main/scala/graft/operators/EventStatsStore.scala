package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted hourly-count store: the incrementally-maintained baseline the
  * [[Anomaly]] scorer serves from, so scoring a new batch of events never
  * rescans history.
  *
  * Layout: one parquet tree partitioned by `day` (UTC date of the hour
  * bucket), rows `(keys..., hour, n)`. Merging a batch touches ONLY the
  * day partitions the batch lands in (same-key-same-hour rows SUM, so
  * late events fold into their original bucket), staged then committed by
  * a retire/promote rename swap (see [[merge]] and [[recover]]): a crash
  * anywhere leaves either the exact pre-merge store (rolled back from the
  * retired days) or the fully-merged one (cleanup rolled forward).
  *
  * Exactly-once under replay: count merges are NOT idempotent (a replayed
  * batch would double-add), so each merge records its caller-supplied
  * `batchId` as a marker file and a replay of an already-applied id is a
  * no-op — the standard foreachBatch recipe, shared with the streaming
  * sink in [[graft.streaming.StreamingPipeline]].
  *
  * At 100 TB the store is |keys|·|hours| rows — thousands-fold smaller
  * than the events it summarizes — and a day's merge reads one or two day
  * partitions, never the history.
  */
object EventStatsStore {

  /** UTC day of an hour bucket, derived by epoch arithmetic so the
    * partition value is identical in every session timezone —
    * `date_format` alone renders the instant in the SESSION zone, which
    * would disagree with [[score]]'s UTC horizon day and let the
    * partition-pruning filter exclude days the baseline window needs.
    * (timestamp→long is epoch seconds, timezone-free; date_add on a date
    * is calendar arithmetic, also timezone-free.)
    */
  private def withDay(hourly: DataFrame): DataFrame =
    hourly.withColumn("day",
      date_format(
        date_add(to_date(lit("1970-01-01")),
          floor(col("hour").cast("long") / 86400L).cast("int")),
        "yyyy-MM-dd"))

  private def stageDir(dir: String) = dir.stripSuffix("/") + ".merge-stage"

  /** Bootstrap the store from an hourly-count table (see
    * [[Anomaly.hourlyCounts]]).
    */
  def write(hourly: DataFrame, dir: String): Unit = {
    require(!hourly.columns.contains("day"),
      "event-stats store: input must not already have a day column")
    withDay(hourly)
      .repartition(col("day"))
      .sortWithinPartitions(col("day"), col("hour"))
      .write.mode("overwrite")
      .partitionBy("day").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): DataFrame = {
    recover(spark, dir)
    spark.read.parquet(dir)
  }

  /** Crash recovery for the [[merge]] swap protocol — the
    * [[PartitionSwap]] contract over `day=` partitions: pending marker
    * without an applied marker rolls BACK to the exact pre-merge store,
    * pending with applied rolls the lost cleanup FORWARD. One FS
    * `exists` per call on the healthy path.
    */
  def recover(spark: SparkSession, dir: String): Unit =
    PartitionSwap.recover(spark, dir, ".merge-stage", "day=")

  /** True when `batchId` was already merged (call before re-deriving a
    * batch's hourly counts on a replay).
    */
  def alreadyApplied(spark: SparkSession, dir: String, batchId: Long): Boolean =
    PartitionSwap.alreadyApplied(spark, dir, batchId)

  /** Merge one batch of hourly counts: same (key, hour) rows sum with the
    * stored ones; only the batch's day partitions are read and rewritten.
    * Replays of an applied `batchId` are no-ops.
    */
  def merge(
      spark: SparkSession,
      dir: String,
      batchHourly: DataFrame,
      keyCols: Seq[String],
      batchId: Long
  ): Unit = {
    require(!batchHourly.columns.contains("day"),
      "event-stats store: batch must not already have a day column")
    recover(spark, dir)
    if (alreadyApplied(spark, dir, batchId)) return

    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap keys on DATA presence, not directory existence: an empty
    // first batch leaves only markers behind (a partitionBy write of zero
    // rows emits NO files, and loading it would die on schema inference),
    // so the first NON-empty batch must still take the bootstrap path
    val hasData = dfs.exists(dirPath) &&
      dfs.listStatus(dirPath).exists(_.getPath.getName.startsWith("day="))
    // persisted: both paths run two actions over the batch (emptiness
    // probe + bootstrap write, or touched-day collect + staged merge) —
    // uncached, each re-ran the caller's whole hourly aggregation (r13
    // optimization round)
    val persisted = batchHourly.persist()
    try {
      if (!hasData) {
        if (persisted.isEmpty) {
          PartitionSwap.markApplied(spark, dir, batchId)
          return
        }
        // first non-empty batch bootstraps the store — THROUGH the stage +
        // commit protocol, not a direct overwrite of the live tree: a crash
        // mid-bootstrap would leave a partial set of live day= directories,
        // hasData would read true on replay, and the replayed batch would
        // merge into its own partial data (the AggStore bootstrap argument)
        val stage = stageDir(dir)
        write(persisted, stage)
        PartitionSwap.commit(spark, dir, stage,
          PartitionSwap.listEntries(spark, stage, "day="), batchId)
        return
      }

      val batch = withDay(persisted)
      val touched = batch.select(col("day")).distinct()
        .collect().map(_.getString(0)).sorted
      if (touched.nonEmpty) {
        val slice = load(spark, dir).filter(col("day").isin(touched.toSeq: _*))
        val merged = slice
          .unionByName(batch)
          .groupBy((keyCols.map(col) :+ col("hour") :+ col("day")): _*)
          .agg(sum(col("n")).as("n"))
        val stage = stageDir(dir)
        merged
          .repartition(touched.length, col("day"))
          .sortWithinPartitions(col("day"), col("hour"))
          .write.mode("overwrite")
          .partitionBy("day").parquet(stage)
        // commit by retire/promote rename, not dynamic partition overwrite
        // — the [[PartitionSwap]] protocol: overwrite replaces the touched
        // day directories NON-atomically at job commit, and a crash
        // mid-commit would leave some days merged and others not while the
        // replay re-added the batch to the already-rewritten days
        PartitionSwap.commit(spark, dir, stage,
          touched.toSeq.map(d => s"day=$d"), batchId)
      } else {
        PartitionSwap.markApplied(spark, dir, batchId)
      }
    } finally persisted.unpersist()
  }

  /** Right-to-erasure through the hourly-count store: subtract the
    * erased events' hourly counts (`erasedHourly`, same shape as a merge
    * batch — [[Anomaly.hourlyCounts]] of the subject's events) so the
    * store equals a one-shot aggregate over the retained history. Counts
    * are EXACTLY subtractable — no rebuild, no staleness: `n' = n − nₑ`,
    * rows reaching zero disappear entirely (a count store must not
    * retain even the (key, hour) existence of a fully-erased subject's
    * activity). A subtraction that would go negative aborts loudly: the
    * erased counts then exceed the maintained history.
    *
    * Same scale shape as [[merge]]: only the erased days' partitions are
    * read and rewritten under the [[PartitionSwap]] protocol (a day
    * whose last row disappears is deleted through the same marker), and
    * replays of an applied `batchId` are no-ops. Returns the number of
    * stored (key, hour) rows affected.
    */
  def erase(
      spark: SparkSession,
      dir: String,
      erasedHourly: DataFrame,
      keyCols: Seq[String],
      batchId: Long
  ): Long = {
    require(!erasedHourly.columns.contains("day"),
      "event-stats store: erased batch must not already have a day column")
    recover(spark, dir)
    if (alreadyApplied(spark, dir, batchId)) return 0L

    val e = withDay(erasedHourly)
      .groupBy((keyCols.map(col) :+ col("hour") :+ col("day")): _*)
      .agg(sum(col("n")).as("_n_e"))
      .cache()
    val touched = e.select(col("day")).distinct()
      .collect().map(_.getString(0)).sorted
    if (touched.isEmpty) {
      e.unpersist()
      PartitionSwap.markApplied(spark, dir, batchId)
      return 0L
    }

    val slice = spark.read.parquet(dir).filter(col("day").isin(touched.toSeq: _*))
    val joinCols = keyCols ++ Seq("hour", "day")
    val joined = slice.join(broadcast(e), joinCols, "left")
    val subtracted = joined
      .withColumn("n", col("n") - coalesce(col("_n_e"), lit(0L)))
    val affected = joined.filter(col("_n_e").isNotNull).count()
    val negatives = subtracted.filter(col("n") < 0L).count()
    require(negatives == 0L,
      s"event-stats erase: $negatives (key, hour) rows would go negative — " +
        "the erased counts exceed the maintained history")

    val stage = stageDir(dir)
    subtracted
      .filter(col("n") > 0L)
      .select(slice.columns.map(col): _*)
      .repartition(touched.length, col("day"))
      .sortWithinPartitions(col("day"), col("hour"))
      .write.mode("overwrite")
      .partitionBy("day").parquet(stage)
    e.unpersist()
    PartitionSwap.commit(spark, dir, stage,
      touched.toSeq.map(d => s"day=$d"), batchId)
    affected
  }

  /** Score the store's hours at or after `fromHour` against their trailing
    * baselines, reading only the day partitions the window can reach
    * (`fromHour − baselineHours`, partition-pruned at the scan). Row-
    * identical to [[Anomaly.scoreHourly]] over the FULL store filtered to
    * those hours — the window never looks back further than the baseline.
    */
  def score(
      spark: SparkSession,
      dir: String,
      keyCols: Seq[String],
      fromHour: java.sql.Timestamp,
      baselineHours: Int = 24,
      minBaseline: Int = 12,
      zThreshold: Double = 3.0
  ): DataFrame = {
    val horizon = new java.sql.Timestamp(
      fromHour.getTime - baselineHours.toLong * 3600L * 1000L)
    val horizonDay = horizon.toInstant.atZone(java.time.ZoneOffset.UTC)
      .toLocalDate.toString
    val slice = load(spark, dir).filter(col("day") >= horizonDay)
    Anomaly
      .scoreHourly(slice.drop("day"), keyCols,
        baselineHours, minBaseline, zThreshold)
      .filter(col("hour") >= lit(fromHour))
  }
}
