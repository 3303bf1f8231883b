package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Anomaly, EventStatsStore}
import graft.streaming.StreamingPipeline

class EventStatsStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00")

  private def mkEvents(rows: Seq[(Timestamp, String)]): DataFrame =
    rows.toDF("ts", "event_type")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"evstats_$tag").toString + "/store"

  private def sortedRows(df: DataFrame) =
    df.select("event_type", "hour", "n")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2.getTime))
      .toSeq

  test("two merged batches equal a one-shot aggregate; same-hour rows sum") {
    val dir = tmp("merge")
    val b1 = mkEvents(Seq((ts(1, 10), "a"), (ts(1, 10, 30), "a"), (ts(1, 11), "b")))
    // batch 2 lands MORE events in the same (a, day1 10:00) hour: late data
    val b2 = mkEvents(Seq((ts(1, 10, 45), "a"), (ts(2, 9), "a")))
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(b1, "ts", Seq("event_type")), Seq("event_type"), 1L)
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(b2, "ts", Seq("event_type")), Seq("event_type"), 2L)

    val oneShot = Anomaly.hourlyCounts(
      b1.unionByName(b2), "ts", Seq("event_type"))
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      sortedRows(oneShot))
    // the late-data hour really did sum to 3
    val merged = sortedRows(EventStatsStore.load(spark, dir).drop("day"))
    assert(merged.contains(("a", ts(1, 10), 3L)))
  }

  test("erase subtracts a subject's hourly counts exactly; emptied rows and days disappear") {
    val dir = tmp("erase")
    val subject = Seq((ts(1, 10), "a"), (ts(1, 10, 30), "a"), (ts(3, 8), "c"))
    val others = Seq((ts(1, 10, 45), "a"), (ts(1, 11), "b"), (ts(2, 9), "a"))
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(subject ++ others.take(2)), "ts", Seq("event_type")),
      Seq("event_type"), 1L)
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(others.drop(2)), "ts", Seq("event_type")),
      Seq("event_type"), 2L)
    val affected = EventStatsStore.erase(spark, dir,
      Anomaly.hourlyCounts(mkEvents(subject), "ts", Seq("event_type")),
      Seq("event_type"), 10L)
    assert(affected == 2L, "two stored (key, hour) rows held subject counts")
    // the store equals a one-shot aggregate over the RETAINED events
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      sortedRows(Anomaly.hourlyCounts(mkEvents(others), "ts", Seq("event_type"))))
    // day 3 held only subject activity: its partition is GONE, not zeroed
    assert(!new java.io.File(dir).listFiles().map(_.getName).contains("day=2024-01-03"))
    // replaying the applied erase batch is a no-op
    assert(EventStatsStore.erase(spark, dir,
      Anomaly.hourlyCounts(mkEvents(subject), "ts", Seq("event_type")),
      Seq("event_type"), 10L) == 0L)
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      sortedRows(Anomaly.hourlyCounts(mkEvents(others), "ts", Seq("event_type"))))
  }

  test("erase of counts exceeding the history aborts instead of serving negatives") {
    val dir = tmp("eraseneg")
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(Seq((ts(1, 10), "a"))), "ts", Seq("event_type")),
      Seq("event_type"), 1L)
    val tooMany = mkEvents(Seq((ts(1, 10), "a"), (ts(1, 10, 5), "a")))
    val ex = intercept[IllegalArgumentException] {
      EventStatsStore.erase(spark, dir,
        Anomaly.hourlyCounts(tooMany, "ts", Seq("event_type")),
        Seq("event_type"), 11L)
    }
    assert(ex.getMessage.contains("negative"))
    // the store is untouched
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      Seq(("a", ts(1, 10), 1L)))
  }

  test("replaying an applied batchId is a no-op") {
    val dir = tmp("replay")
    val b1 = mkEvents(Seq((ts(1, 10), "a")))
    val h1 = Anomaly.hourlyCounts(b1, "ts", Seq("event_type"))
    EventStatsStore.merge(spark, dir, h1, Seq("event_type"), 7L)
    EventStatsStore.merge(spark, dir, h1, Seq("event_type"), 7L)
    EventStatsStore.merge(spark, dir, h1, Seq("event_type"), 7L)
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      Seq(("a", ts(1, 10), 1L)))
  }

  test("score from the store equals inline scoring filtered to the window") {
    val dir = tmp("score")
    // two days of noisy traffic, split into two batches at the day border
    val all = (0 until 48).flatMap { h =>
      val n = if (h % 2 == 0) 4 else 6
      (0 until n).map(i => (ts(1 + h / 24, h % 24, i), "a"))
    }
    val (e1, e2) = all.partition(_._1.getTime < ts(2, 0).getTime)
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(e1), "ts", Seq("event_type")),
      Seq("event_type"), 1L)
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(e2), "ts", Seq("event_type")),
      Seq("event_type"), 2L)

    val from = ts(2, 0)
    val served = EventStatsStore
      .score(spark, dir, Seq("event_type"), from)
      .orderBy("hour").collect()
    val inline = Anomaly
      .hourlyZScores(mkEvents(all), "ts", Seq("event_type"))
      .filter(col("hour") >= lit(from))
      .orderBy("hour").collect()
    assert(served.length == 24 && served.toSeq == inline.toSeq)
  }

  test("crash mid-swap rolls back to the pre-merge store; lost cleanup rolls forward") {
    import java.io.File
    import java.nio.file.{Paths, StandardCopyOption}
    val dir = tmp("crash")
    val b1 = mkEvents(Seq((ts(1, 10), "a"), (ts(2, 9), "b")))
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(b1, "ts", Seq("event_type")), Seq("event_type"), 1L)
    val healthy = sortedRows(EventStatsStore.load(spark, dir).drop("day"))

    // simulate a merge of batch 99 that died AFTER promoting day=2024-01-01
    // but BEFORE its applied marker: retired holds the original day, live
    // holds a half-merged (wrong) version, pending names the batch
    val day = new File(dir).listFiles().map(_.getName).filter(_.startsWith("day=")).min
    val retired = new File(dir + ".retired"); retired.mkdirs()
    val retiredDay = new File(retired, day); retiredDay.mkdirs()
    new File(dir, day).listFiles().foreach { f =>
      Files.copy(f.toPath, Paths.get(retiredDay.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    // corrupt the live day with a double-counted version (staged to a
    // scratch path first: Spark refuses to overwrite a path it reads)
    val scratch = dir + ".scratch"
    spark.read.parquet(s"$dir/$day")
      .withColumn("n", col("n") * 2)
      .write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch)
      .write.mode("overwrite").parquet(s"$dir/$day")
    Files.write(Paths.get(dir, "_batches", "_pending"), "99".getBytes)
    // no applied marker for 99 -> recovery must roll BACK
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) == healthy,
      "rollback must restore the exact pre-merge store")
    assert(!new File(dir + ".retired").exists())
    assert(!new File(dir, "_batches/_pending").exists())
    // and the replayed batch then re-merges normally from consistent state
    EventStatsStore.merge(spark, dir,
      Anomaly.hourlyCounts(mkEvents(Seq((ts(1, 10), "a"))), "ts", Seq("event_type")),
      Seq("event_type"), 99L)
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day"))
      .contains(("a", ts(1, 10), 2L)))

    // crash AFTER the applied marker but before cleanup: roll forward
    val after = sortedRows(EventStatsStore.load(spark, dir).drop("day"))
    Files.write(Paths.get(dir, "_batches", "_pending"), "99".getBytes)
    new File(dir + ".retired").mkdirs()
    new File(dir + ".merge-stage").mkdirs()
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) == after,
      "roll-forward must not disturb the committed store")
    assert(!new File(dir + ".retired").exists())
    assert(!new File(dir + ".merge-stage").exists())
  }

  test("day partition values are UTC regardless of session timezone") {
    val dir = tmp("tz")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // 2024-01-01 02:00 UTC is 2023-12-31 18:00 in LA: a session-tz day
      // string would land the row in day=2023-12-31 and score()'s UTC
      // horizon pruning would miss it
      val utc2am = new Timestamp(
        java.time.Instant.parse("2024-01-01T02:00:00Z").toEpochMilli)
      EventStatsStore.merge(spark, dir,
        Seq(("a", utc2am, 5L)).toDF("event_type", "hour", "n"),
        Seq("event_type"), 1L)
      val days = EventStatsStore.load(spark, dir)
        .select(col("day").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      assert(days == Seq("2024-01-01"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("streaming sink maintains the store exactly-once across epochs") {
    val dir = tmp("stream")
    val ckpt = Files.createTempDirectory("evstats_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "event_type")
    input.addData((ts(1, 10), "a"), (ts(1, 10, 10), "a"))
    val q1 = StreamingPipeline.hourlyStatsStoreSink(
      stream, dir, ckpt, Seq("event_type"))
    q1.awaitTermination()
    input.addData((ts(1, 10, 20), "a"), (ts(1, 11), "b"))
    val q2 = StreamingPipeline.hourlyStatsStoreSink(
      stream, dir, ckpt, Seq("event_type"))
    q2.awaitTermination()
    assert(sortedRows(EventStatsStore.load(spark, dir).drop("day")) ==
      Seq(("a", ts(1, 10), 3L), ("b", ts(1, 11), 1L)))
  }
}
