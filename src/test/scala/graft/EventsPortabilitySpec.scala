package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.queries.{Registry, Tables}

/** Timestamp-type portability of the events surface (the round-5
  * postmortem's lock): the same event data arrives as parquet
  * TIMESTAMP(NANOS) (shipping testdata — Spark 4.1 infers TIMESTAMP_NTZ),
  * as a plain µs TIMESTAMP (any Spark-written source), or as a raw nanos
  * long (older Sparks' `nanosAsLong` escape hatch). `Tables.events`
  * dispatches on the inferred type; this spec pins that every
  * events-reading operator returns IDENTICAL rows on all three readings,
  * so the next Spark upgrade's inference change cannot silently skew
  * results again.
  */
class EventsPortabilitySpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  /** The registry queries that read the events table. */
  private val eventQueries = Seq(
    "q_events_hourly", "q_events_json", "q_sessionize", "q_sliding_window",
    "q_funnel", "q_funnel_report", "q_retention", "q_transitions",
    "q_asof_join", "q_zorder", "q_pruned_scan")

  /** Fixture dir = every sf0.001 table file copied as-is, except events,
    * which is rewritten through `variant` from the canonical µs frame.
    */
  private def fixture(name: String)(
      variant: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"events_port_$name").toString
    val s = Paths.get(src)
    Files.list(s).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && n != "events.parquet")
        Files.copy(p, Paths.get(dir, n), StandardCopyOption.REPLACE_EXISTING)
    }
    variant(Tables.events(spark, src))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val usDir = fixture("us")(identity) // µs TIMESTAMP column
  private lazy val nsLongDir = fixture("nslong")(
    // the legacy nanosAsLong reading: a raw INT64 of nanos since epoch
    _.withColumn("ts", unix_micros(col("ts")) * lit(1000L)))

  private def rows(name: String, dir: String): Seq[String] =
    Registry.all(name).fn(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  eventQueries.foreach { name =>
    test(s"$name: identical on NANOS-NTZ, µs-timestamp, and nanos-long events") {
      val shipping = rows(name, src)
      assert(shipping.nonEmpty, s"$name returned no rows at sf0.001")
      assert(rows(name, usDir) == shipping,
        s"$name differs between the NTZ shipping read and a µs TIMESTAMP source")
      assert(rows(name, nsLongDir) == shipping,
        s"$name differs between the NTZ shipping read and a nanos-long source")
    }
  }

  test("Tables.events dispatch covers all three inferred types") {
    import org.apache.spark.sql.types.TimestampType
    assert(Tables.events(spark, src).schema("ts").dataType == TimestampType)
    assert(Tables.events(spark, usDir).schema("ts").dataType == TimestampType)
    assert(Tables.events(spark, nsLongDir).schema("ts").dataType == TimestampType)
  }
}
