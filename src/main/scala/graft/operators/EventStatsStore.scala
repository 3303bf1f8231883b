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

  private def batchMarker(dir: String, batchId: Long) =
    s"$dir/_batches/$batchId"

  private def pendingMarker(dir: String) = s"$dir/_batches/_pending"
  private def retiredDir(dir: String) = dir.stripSuffix("/") + ".retired"
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

  /** Crash recovery for the [[merge]] swap protocol. A merge retires the
    * old touched-day directories to `<dir>.retired` before promoting the
    * staged ones, and writes its applied marker BEFORE cleaning up — so
    * any crash leaves one of two recoverable states:
    *
    *  - pending marker + applied marker: the swap fully committed, only
    *    cleanup was lost → roll FORWARD (delete retired/stage/pending);
    *  - pending marker, no applied marker: the swap may be half done →
    *    roll BACK (every retired day replaces its live counterpart,
    *    restoring the exact pre-merge store; the replayed batch then
    *    re-merges from that consistent state, never double-adding).
    *
    * One FS `exists` per call on the healthy path. Dynamic partition
    * overwrite alone was NOT crash-safe here: it replaces multiple day
    * directories non-atomically during job commit, and a crash mid-commit
    * left some days merged and some not, with the replay re-adding the
    * batch to the already-rewritten days.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val pending = new org.apache.hadoop.fs.Path(pendingMarker(dir))
    val fs = pending.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pending)) return
    val batchId = {
      val in = fs.open(pending)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }
    val retired = new org.apache.hadoop.fs.Path(retiredDir(dir))
    if (!fs.exists(new org.apache.hadoop.fs.Path(batchMarker(dir, batchId)))) {
      // roll back: restore every retired day over its (possibly promoted)
      // live counterpart — the retired tree still holds the full pre-merge
      // content of every touched day, because cleanup only runs after the
      // applied marker lands
      if (fs.exists(retired)) {
        fs.listStatus(retired).foreach { st =>
          if (st.getPath.getName.startsWith("day=")) {
            val live = new org.apache.hadoop.fs.Path(dir, st.getPath.getName)
            fs.delete(live, true)
            fs.rename(st.getPath, live)
          }
        }
      }
    }
    fs.delete(retired, true)
    fs.delete(new org.apache.hadoop.fs.Path(stageDir(dir)), true)
    fs.delete(pending, false)
  }

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
    recover(spark, dir)
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
      val stage = stageDir(dir)
      merged
        .repartition(touched.length, col("day"))
        .sortWithinPartitions(col("day"), col("hour"))
        .write.mode("overwrite")
        .partitionBy("day").parquet(stage)
      // commit by retire/promote rename, not dynamic partition overwrite:
      // overwrite replaces the touched day directories NON-atomically at
      // job commit, and a crash mid-commit would leave some days merged
      // and others not while the replay re-added the batch to the
      // already-rewritten days. Here the pending marker (carrying the
      // batch id) goes down first, old days are retired (not deleted),
      // staged days are promoted, the applied marker lands, and only then
      // is anything destroyed — so [[recover]] can always roll back to
      // the exact pre-merge store (no applied marker) or roll the lost
      // cleanup forward (applied marker present). Directory renames are
      // atomic on HDFS-semantics filesystems; on rename-as-copy object
      // stores, front this store with an HDFS/consistent layer.
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val retired = new org.apache.hadoop.fs.Path(retiredDir(dir))
      fs.delete(retired, true)
      fs.mkdirs(retired)
      val pend = fs.create(new org.apache.hadoop.fs.Path(pendingMarker(dir)), true)
      pend.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      pend.close()
      touched.foreach { d =>
        val live = new org.apache.hadoop.fs.Path(s"$dir/day=$d")
        if (fs.exists(live)) fs.rename(live, new org.apache.hadoop.fs.Path(retired, s"day=$d"))
      }
      touched.foreach { d =>
        fs.rename(new org.apache.hadoop.fs.Path(s"$stage/day=$d"),
          new org.apache.hadoop.fs.Path(s"$dir/day=$d"))
      }
      fs.create(new org.apache.hadoop.fs.Path(batchMarker(dir, batchId)), true).close()
      fs.delete(retired, true)
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      fs.delete(new org.apache.hadoop.fs.Path(pendingMarker(dir)), false)
    } else {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(batchMarker(dir, batchId)), true).close()
    }
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
