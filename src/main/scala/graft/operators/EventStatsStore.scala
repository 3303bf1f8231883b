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
  * late events fold into their original bucket), staged then
  * dynamic-partition-overwritten — the [[graft.pipeline.Snapshot]]
  * convention: a crash before the final write leaves the store intact.
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

  private def withDay(hourly: DataFrame): DataFrame =
    hourly.withColumn("day", date_format(col("hour"), "yyyy-MM-dd"))

  private def batchMarker(dir: String, batchId: Long) =
    s"$dir/_batches/$batchId"

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

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** True when `batchId` was already merged (call before re-deriving a
    * batch's hourly counts on a replay).
    */
  def alreadyApplied(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(batchMarker(dir, batchId))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

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
    if (alreadyApplied(spark, dir, batchId)) return

    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!dfs.exists(dirPath)) {
      // first batch bootstraps the store
      write(batchHourly, dir)
      dfs.create(new org.apache.hadoop.fs.Path(batchMarker(dir, batchId)), true).close()
      return
    }

    val batch = withDay(batchHourly)
    val touched = batch.select(col("day")).distinct()
      .collect().map(_.getString(0)).sorted
    if (touched.nonEmpty) {
      val slice = load(spark, dir).filter(col("day").isin(touched.toSeq: _*))
      val merged = slice
        .unionByName(batch)
        .groupBy((keyCols.map(col) :+ col("hour") :+ col("day")): _*)
        .agg(sum(col("n")).as("n"))
      val stage = dir.stripSuffix("/") + ".merge-stage"
      merged
        .repartition(touched.length, col("day"))
        .sortWithinPartitions(col("day"), col("hour"))
        .write.mode("overwrite")
        .partitionBy("day").parquet(stage)
      spark.read.parquet(stage)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    }
    // marker AFTER the data commit: a crash in between replays the batch,
    // which re-runs the merge from the pre-crash store state (the dynamic
    // overwrite is all-or-nothing per partition tree) — never double-adds
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(batchMarker(dir, batchId)), true).close()
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
