package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.policy.PolicyCatalog
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.{Event, Session}

/** Structured Streaming specs: streaming masking, watermarked windows,
  * stateful sessionization (+ its batch twin).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("streaming maskModel anonymizes a memory stream exactly like batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val df = input.toDF().toDF("service_id", "contact_email", "contact_phone")
    val masked = StreamingPipeline.anonymizeStream(
      df, PolicyCatalog.reference.policiesFor("stg_services_publics"))
    input.addData(("S1", "test1@example.fr", "+33 1 23 45 67 89"))
    val q = masked.writeStream.format("memory").queryName("masked_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val row = spark.table("masked_stream").head()
    assert(row.getAs[String]("contact_email_anon") == "user_3438633363386233@anonymized.gouv.fr")
    assert(row.getAs[String]("contact_phone_anon") == "+33 1  XX XX XX XX")
    assert(row.getAs[String]("service_id_anon") == "S1")
  }

  test("watermarked hourly stats aggregate by window and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val stats = StreamingPipeline.hourlyEventStats(input.toDF())
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 2, "click", 2.0),
      Event(3, ts(20), 1, "buy", 5.0)
    )
    val q = stats.writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("hourly")
      .select($"event_type", $"n", $"total_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("click", 2L, 3.0), ("buy", 1L, 5.0)))
  }

  test("streaming quality monitor aggregates per window/source; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("doc_id", "ts", "source", "text")
    val mon = StreamingPipeline.qualityMonitor(df, lowQuality = 0.5)
    input.addData(
      (1L, ts(1), "web", "This is a reasonably normal sentence of words."),
      (2L, ts(2), "web", "!!!! ???? ;;;; ###"), // punctuation junk
      (3L, ts(3), "web", null),                 // broken upstream: NULL text
      (4L, ts(4), "crawl", "the quality of the data is in the details and that matters here")
    )
    val q = mon.writeStream.format("memory").queryName("qmon")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("qmon")
      .select($"source", $"n_docs", $"n_tokens", $"mean_quality", $"low_quality_frac")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("web")._1 == 3L && out("crawl")._1 == 1L)
    assert(out("crawl")._4 == 0.0)                     // clean source: nothing low-quality
    assert(math.abs(out("web")._4 - 2.0 / 3) < 1e-12)  // junk AND null-text flagged
    assert(out("crawl")._3 > out("web")._3)            // junk drags the mean down
    // stream/batch agreement: same expressions, same numbers
    import graft.text.TextAnalysis
    val batch = Seq(
      (1L, "This is a reasonably normal sentence of words."),
      (2L, "!!!! ???? ;;;; ###"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .withColumn("_st", TextAnalysis.textStats($"text"))
      .agg(avg(when($"text".isNull, lit(0.0))
        .otherwise(TextAnalysis.qualityScoreOfStats($"_st"))))
      .head().getDouble(0)
    assert(math.abs(batch - out("web")._3) < 1e-12)
  }

  test("streaming PII monitor counts lookalike values per window/column; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("id", "ts", "email_col", "addr_col")
    val mon = StreamingPipeline.piiMonitor(df, Seq("email_col", "addr_col"))
    input.addData(
      (1L, ts(1), "leak@corp.fr", "10 rue de Paris"),
      (2L, ts(2), "user_ab@anonymized.gouv.fr", "Ville 3"),
      (3L, ts(3), null, "33 boulevard Haussmann")
    )
    val q = mon.writeStream.format("memory").queryName("piimon")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("piimon")
      .select($"col_name", $"n_nonnull", $"n_email", $"n_address")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the redaction pattern has no anonymized-domain lookahead, so BOTH
    // email-shaped values count — the monitor flags shapes, not policy
    assert(out("email_col") == ((2L, 2L, 0L)))
    assert(out("addr_col") == ((3L, 0L, 2L)))
    // batch twin agreement on the same rows
    val batch = graft.validate.Validate
      .piiDiscovery(
        Seq(
          ("leak@corp.fr", "10 rue de Paris"),
          ("user_ab@anonymized.gouv.fr", "Ville 3"),
          (null.asInstanceOf[String], "33 boulevard Haussmann")
        ).toDF("email_col", "addr_col"),
        Seq("email_col", "addr_col"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(batch == out)
  }

  test("streaming anonymity monitor flags small/uniform QI groups; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val df = input.toDF().toDF("id", "ts", "dept", "org")
    val mon = StreamingPipeline.anonymityMonitor(
      df, $"dept", $"org", k = 3, l = 2)
    input.addData(
      (1L, ts(1), "75", "A"), (2L, ts(1), "75", "B"), (3L, ts(2), "75", "A"),
      (4L, ts(1), "69", "C"), (5L, ts(2), "69", "C"),  // small AND uniform
      (6L, ts(1), "13", null)                          // null sensitive: dropped
    )
    val q = mon.writeStream.format("memory").queryName("anonmon")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("anonmon")
      .select($"qi", $"group_size", $"distinct_sensitive", $"k_ok", $"l_ok")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(out("75") == ((3L, 2, true, true)))
    assert(out("69") == ((2L, 1, false, false)))
    assert(!out.contains("13")) // its only row carried a null sensitive
    // batch twin agreement on the same rows (window spans all of them)
    val batch = graft.validate.Privacy
      .lDiversityAudit(
        Seq(("75", "A"), ("75", "B"), ("75", "A"), ("69", "C"), ("69", "C"),
          ("13", null.asInstanceOf[String])).toDF("dept", "org"),
        $"dept", $"org", l = 2, qiName = "qi")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(batch.keySet == out.keySet)
    assert(batch.forall { case (g, (n, d, lok)) =>
      out(g)._1 == n && out(g)._2.toLong == d && out(g)._4 == lok })
  }

  test("streaming drift monitor: per-window PSI agrees with the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Int)]
    val df = input.toDF().toDF("id", "ts", "feature")
    val ref = Seq(10L, 10L, 10L) // balanced reference histogram
    val mon = StreamingPipeline.driftMonitor(
      df, col("feature"), ref, windowLength = "5 minutes")
    // window 1 (10:00-10:05): skewed to bucket 0; one malformed bucket (9)
    val w1 = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 9))
    // window 2 (10:05-10:10): balanced
    val w2 = Seq((6L, 0), (7L, 1), (8L, 2))
    input.addData(w1.map { case (i, b) => (i, ts(1), b) } ++
      w2.map { case (i, b) => (i, ts(6), b) }: _*)
    val q = mon.writeStream.format("memory").queryName("drift")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("drift")
      .select(col("window.start"), col("n_docs"), col("n_unbucketed"), col("psi"))
      .collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (n1, u1, psi1) = out(Timestamp.valueOf("2024-01-01 10:00:00"))
    val (n2, u2, psi2) = out(Timestamp.valueOf("2024-01-01 10:05:00"))
    assert(n1 == 5L && u1 == 1L, "out-of-domain bucket must surface, not vanish")
    assert(n2 == 3L && u2 == 0L)
    assert(psi1 > psi2, "skewed window must score higher drift")
    // batch twin: Drift.psiByBucket over the same window-1 slice vs the
    // same reference histogram, summed across buckets
    val sliceA = w1.filter(_._2 < 3).toDF("id", "b")
    val refDf = ref.zipWithIndex
      .flatMap { case (c, b) => Seq.fill(c.toInt)(b) }
      .zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "b")
    val batchPsi = graft.validate.Drift
      .psiByBucket(sliceA, refDf, col("b"), 4L, 30L, 3)
      .orderBy("bucket")
      .collect().map(_.getAs[Double]("psi")).sum
    assert(math.abs(psi1 - batchPsi) < 1e-12, s"stream $psi1 vs batch $batchPsi")
  }

  test("streaming HLL sketch: per-window sketch rows equal the batch sketch; estimates agree") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("id", "ts", "user")
    val sk = StreamingPipeline.distinctSketchStream(
      df, col("user"), windowLength = "5 minutes")
    // window 1: 3 distinct users (u1 repeats); window 2: 2 distinct
    val w1 = Seq("u1", "u2", "u3", "u1")
    val w2 = Seq("u4", "u1")
    input.addData(
      w1.zipWithIndex.map { case (u, i) => (i.toLong, ts(1, i), u) } ++
        w2.zipWithIndex.map { case (u, i) => (100L + i, ts(6, i), u) }: _*)
    val q = sk.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hll_stream")
    // the streamed window-1 sketch is DATA-identical to batch-sketching
    // the same values — the property every downstream merge relies on
    import graft.sketch.Hll
    val w1Streamed = streamed
      .filter(col("window.start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .select(col("bucket"), col("r"))
    val w1Batch = Hll.sketch(w1.toDF("user"), col("user"))
    assert(w1Streamed.except(w1Batch).isEmpty && w1Batch.except(w1Streamed).isEmpty)
    // rolled-up estimate over both windows == batch estimate over the
    // union of values (union+max merge is lossless)
    val rolled = Hll.estimate(
      Hll.merge(streamed.select(col("bucket"), col("r"))))
      .head().getDouble(0)
    val direct = Hll.estimate(
      Hll.sketch((w1 ++ w2).toDF("user"), col("user")))
      .head().getDouble(0)
    assert(rolled == direct, s"rolled $rolled vs direct $direct")
    // and in the linear-counting regime the estimate is ~exact: 4 distinct
    assert(math.abs(direct - 4.0) < 0.1, s"estimate $direct for 4 distinct")
  }

  test("streaming CMS sketch: window cells equal the batch sketch; estimates agree") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("id", "ts", "tok")
    val sk = StreamingPipeline.frequencySketchStream(
      df, col("tok"), windowLength = "5 minutes")
    val w1 = Seq("a", "a", "b", "c")
    val w2 = Seq("a", "b")
    input.addData(
      w1.zipWithIndex.map { case (t, i) => (i.toLong, ts(1, i), t) } ++
        w2.zipWithIndex.map { case (t, i) => (100L + i, ts(6, i), t) }: _*)
    val q = sk.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cms_stream")
    import graft.sketch.Cms
    // window-1 cells == batch cells over the same values
    val w1Streamed = streamed
      .filter(col("window.start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .select(col("row"), col("bucket"), col("cnt"))
    val w1Batch = Cms.sketch(w1.toDF("tok"), col("tok"))
    assert(w1Streamed.except(w1Batch).isEmpty && w1Batch.except(w1Streamed).isEmpty)
    // cellwise-summed roll-up == batch sketch of all values; estimates exact
    // here (no collisions at this cardinality)
    val rolled = Cms.merge(streamed.select(col("row"), col("bucket"), col("cnt")))
    val est = Cms.estimate(rolled, Seq("a", "b", "c").toDF("tok"), col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L), est.toString)
  }

  test("streaming dedup drops in-watermark duplicates, keeps first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val deduped = StreamingPipeline.dedupStream(df, "text", "ts", "10 minutes")
    input.addData(
      (1L, ts(0), "alpha"),
      (2L, ts(1), "alpha"), // dup inside watermark -> dropped
      (3L, ts(2), "beta")
    )
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_stream")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (3L, "beta")))
  }

  test("streaming dedup-against-index flags corpus near-dups; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d1b = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    val d3 = "completely different words about spark catalyst optimizer and parquet files"
    val corpus = Seq((10L, d1), (11L, d3)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    val flagged = StreamingPipeline.dedupAgainstIndexStream(
      stream, corpus, threshold = 0.5, watermark = "10 minutes")
    input.addData(
      (100L, ts(0), d1b), // near-dup of corpus 10
      (101L, ts(1), "nothing shared with anything in the corpus at all right now"),
      (102L, ts(2), d1)   // exact copy of corpus 10
    )
    val q = flagged.writeStream.format("memory").queryName("dedup_idx")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_idx")
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 10L), (102L, 10L)))
    val j102 = spark.table("dedup_idx").filter($"doc_id" === 102L)
      .select("jaccard").as[Double].head()
    assert(j102 == 1.0)
    // batch twin: same verdicts from dedupAgainstCorpus
    val batch = Seq((100L, d1b), (101L, "nothing shared with anything in the corpus at all right now"),
      (102L, d1)).toDF("doc_id", "text")
    val twin = graft.dedup.Dedup
      .dedupAgainstCorpus(corpus, batch, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(twin == Map(100L -> true, 101L -> false, 102L -> true))
    assert(got.map(_._1) == twin.filter(_._2).keySet)
  }

  test("streaming model gate scores with a stored model; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.LinearTextModel
    // teacher = doc length signal on a tiny corpus; the point is the
    // train-batch / gate-stream round trip through the stored model
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning", 1.0),
      (2L, "the fast red fox runs to the green river bank with the dog", 1.0),
      (3L, "spam spam spam", 0.0),
      (4L, "buy buy buy now", 0.0)
    ).toDF("doc_id", "text", "y")
    val dir = java.nio.file.Files.createTempDirectory("stream_model").toString
    LinearTextModel.writeModel(
      LinearTextModel.train(train, "text", "y", d = 64, alpha = 1.0), dir, spark)
    val m = LinearTextModel.loadModel(spark, dir)

    val batch = Seq(
      (100L, "the quick brown fox walks near the lazy dog by the river"),
      (101L, "spam buy spam buy now now")
    ).toDF("doc_id", "text")
    val batchKept = batch
      .withColumn("model_score", LinearTextModel.score($"text", m))
      .filter($"model_score" >= 0.5)
      .select("doc_id", "model_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batchKept.keySet == Set(100L), s"batch gate sanity: $batchKept")

    val input = MemoryStream[(Long, String)]
    val gated = StreamingPipeline.modelGateStream(
      input.toDF().toDF("doc_id", "text"), m, minScore = 0.5)
    input.addData((100L, "the quick brown fox walks near the lazy dog by the river"),
      (101L, "spam buy spam buy now now"))
    val q = gated.writeStream.format("memory").queryName("model_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("model_gate")
      .select("doc_id", "model_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == batchKept, "stream gate must agree with the batch twin exactly")
  }

  test("streaming dedup against a LOADED stored index matches the inline overload") {
    implicit val sqlCtx = spark.sqlContext
    val d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d1b = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    val d3 = "completely different words about spark catalyst optimizer and parquet files"
    val corpus = Seq((10L, d1), (11L, d3)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("stream_band_index").toString
    graft.dedup.Dedup.writeBandIndex(
      graft.dedup.Dedup.buildBandIndex(corpus, "doc_id", "text"), dir)
    val loaded = graft.dedup.Dedup.loadBandIndex(spark, dir)
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    // the production shape: static sides are stored parquet, no corpus scan
    val flagged = StreamingPipeline.dedupAgainstIndexStream(
      stream, loaded, "text", "ts", "10 minutes", 0.5)
    input.addData(
      (100L, ts(0), d1b),
      (101L, ts(1), "nothing shared with anything in the corpus at all right now"),
      (102L, ts(2), d1))
    val q = flagged.writeStream.format("memory").queryName("dedup_idx_loaded")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_idx_loaded")
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 10L), (102L, 10L)))
  }

  test("streaming agg-store sink: served aggregate equals a one-shot groupBy over all epochs") {
    import java.nio.file.Files
    import graft.operators.AggStore
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("aggsink").toString + "/store"
    val ckpt = Files.createTempDirectory("aggsink_ckpt").toString
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("grp", "v")
      .select(col("grp"), col("v").cast("decimal(18,2)").as("v"))
    val e0 = Seq(("a", 10L), ("a", 20L), ("b", 5L))
    val e1 = Seq(("a", 30L), ("c", 7L))
    input.addData(e0: _*)
    StreamingPipeline.aggStoreSink(stream, dir, ckpt, Seq("grp"), "v", buckets = 4)
      .awaitTermination()
    input.addData(e1: _*)
    StreamingPipeline.aggStoreSink(stream, dir, ckpt, Seq("grp"), "v", buckets = 4)
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "cnt", "sum", "min", "max")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val oneShot = AggStore.aggregate(
      (e0 ++ e1).toDF("grp", "v")
        .select(col("grp"), col("v").cast("decimal(18,2)").as("v")),
      Seq("grp"), col("v"))
      // the stored schema is the pinned canonical one (sum decimal(38,s))
      .withColumn("sum", col("sum").cast("decimal(38,2)"))
    assert(rows(AggStore.serve(spark, dir)) == rows(oneShot),
      "stream-maintained aggregate must equal the one-shot groupBy")
  }

  test("streaming SCD2 store sink equals the batch-merged store; replays are value-idempotent") {
    import java.nio.file.Files
    import graft.pipeline.Snapshot
    implicit val sqlCtx = spark.sqlContext
    val streamDir = Files.createTempDirectory("scd2_stream").toString + "/store"
    val ckpt = Files.createTempDirectory("scd2_ckpt").toString
    val input = MemoryStream[(String, String, Timestamp)]
    val stream = input.toDF().toDF("record_id", "payload", "updated_at")

    val e0 = Seq(("r1", "v1", ts(0)), ("r2", "w1", ts(0)))
    val e1 = Seq(("r1", "v2", ts(10)), ("r3", "x1", ts(10)),
      ("r1", "v1", ts(0))) // re-delivery of an old version
    input.addData(e0: _*)
    StreamingPipeline.snapshotStoreSink(
      stream, streamDir, ckpt, "record_id", "updated_at", buckets = 4)
      .awaitTermination()
    input.addData(e1: _*)
    StreamingPipeline.snapshotStoreSink(
      stream, streamDir, ckpt, "record_id", "updated_at", buckets = 4)
      .awaitTermination()

    // batch twin: writeStore epoch 0, mergeStore epoch 1
    val batchDir = Files.createTempDirectory("scd2_batch").toString + "/store"
    Snapshot.writeStore(
      Snapshot.initial(e0.toDF("record_id", "payload", "updated_at"),
        "record_id", "updated_at"),
      "record_id", batchDir, buckets = 4)
    Snapshot.mergeStore(spark, batchDir,
      e1.toDF("record_id", "payload", "updated_at"),
      "record_id", "updated_at", buckets = 4)

    def rows(dir: String) = Snapshot.loadStore(spark, dir)
      .select("record_id", "payload", "updated_at", "valid_from", "valid_to")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val served = rows(streamDir)
    assert(served == rows(batchDir),
      "stream-maintained SCD2 store must equal the batch-merged one")
    // supersede semantics visible: r1 v1 closed at v2's timestamp
    val r1 = Snapshot.current(Snapshot.loadStore(spark, streamDir))
      .filter(col("record_id") === "r1").collect()
    assert(r1.length == 1 && r1.head.getAs[String]("payload") == "v2")

    // replayed epoch (same data re-added under a FRESH checkpoint): the
    // dropDuplicates inside the merge makes it value-idempotent
    val ckpt2 = Files.createTempDirectory("scd2_ckpt2").toString
    val input2 = MemoryStream[(String, String, Timestamp)]
    val stream2 = input2.toDF().toDF("record_id", "payload", "updated_at")
    input2.addData(e1: _*)
    StreamingPipeline.snapshotStoreSink(
      stream2, streamDir, ckpt2, "record_id", "updated_at", buckets = 4)
      .awaitTermination()
    assert(rows(streamDir) == served, "a replayed epoch must change nothing")
  }

  test("streaming exact-index maintenance equals the batch-maintained index after two epochs") {
    import java.nio.file.Files
    import graft.dedup.{Dedup, SetSimJoin}
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b0, b1) = docs.partition(_._1 % 2 == 0)

    val streamDir = Files.createTempDirectory("exact_stream").toString + "/exact"
    val ckpt = Files.createTempDirectory("exact_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData(b0: _*)
    val q1 = StreamingPipeline.exactIndexSink(stream, streamDir, ckpt)
    q1.awaitTermination()
    input.addData(b1: _*)
    val q2 = StreamingPipeline.exactIndexSink(stream, streamDir, ckpt)
    q2.awaitTermination()

    // batch-maintained twin: writeIndex on epoch 0, appendIndex epoch 1
    def setsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        array_distinct(transform(Dedup.wordShingles(col("text"), 3),
          x => md5(x))).as("_sh"))
    val batchDir = Files.createTempDirectory("exact_batch").toString + "/exact"
    SetSimJoin.writeIndex(setsOf(b0), "doc_id", "_sh", 2, 5, batchDir)
    SetSimJoin.appendIndex(spark, batchDir, setsOf(b1), "doc_id", "_sh")

    // identical stored data: sets and postings row-for-row
    def sorted(dir: String, leg: String, cols: String*) =
      spark.read.parquet(s"$dir/$leg").select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sorted(streamDir, "sets", "id", "keys", "sz") ==
      sorted(batchDir, "sets", "id", "keys", "sz"),
      "stream-maintained sets must equal the batch-maintained ones")
    assert(sorted(streamDir, "postings", "key", "id", "sz") ==
      sorted(batchDir, "postings", "key", "id", "sz"))

    // and identical serving: probe both with held-out near-copies
    val probes = setsOf(docs.take(10).map { case (id, t) => (id + 900000L, t) })
    def probeRows(dir: String) = SetSimJoin
      .searchIndex(spark, dir, probes, "doc_id", "_sh")
      .select("id_l", "id_r", "inter", "union_sz")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val served = probeRows(streamDir)
    assert(served == probeRows(batchDir))
    assert(served.nonEmpty, "held-out copies must match the corpus")

    // replayed epoch (same checkpoint, no new data): markers make it a no-op
    val q3 = StreamingPipeline.exactIndexSink(stream, streamDir, ckpt)
    q3.awaitTermination()
    assert(probeRows(streamDir) == served)
  }

  test("streaming band-index maintenance equals the batch-maintained index after two epochs") {
    import java.nio.file.Files
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b0, b1) = docs.partition(_._1 % 2 == 0)

    val streamDir = Files.createTempDirectory("band_stream").toString + "/band"
    val ckpt = Files.createTempDirectory("band_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData(b0: _*)
    StreamingPipeline.bandIndexSink(stream, streamDir, ckpt).awaitTermination()
    input.addData(b1: _*)
    StreamingPipeline.bandIndexSink(stream, streamDir, ckpt).awaitTermination()

    // batch-maintained twin: writeBandIndex epoch 0, appendBandIndex epoch 1
    val batchDir = Files.createTempDirectory("band_batch").toString + "/band"
    Dedup.writeBandIndex(
      Dedup.buildBandIndex(b0.toDF("doc_id", "text"), "doc_id", "text"), batchDir)
    Dedup.appendBandIndex(b1.toDF("doc_id", "text"), "text", batchDir)

    // identical stored data: band rows and shingle sets row-for-row
    def sorted(dir: String, leg: String, cols: String*) =
      spark.read.parquet(s"$dir/$leg").select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sorted(streamDir, "bands", "doc_id", "band", "hash") ==
      sorted(batchDir, "bands", "doc_id", "band", "hash"),
      "stream-maintained band rows must equal the batch-maintained ones")
    assert(sorted(streamDir, "shingles", "doc_id", "shingles") ==
      sorted(batchDir, "shingles", "doc_id", "shingles"))

    // and identical serving: dedup held-out near-copies against both
    val probes = docs.take(10).map { case (id, t) => (id + 900000L, t) }
      .toDF("doc_id", "text")
    def flagged(dir: String) = Dedup
      .dedupAgainstCorpus(Dedup.loadBandIndex(spark, dir), probes, "text")
      .select("doc_id", "dup_of", "is_dup")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val served = flagged(streamDir)
    assert(served == flagged(batchDir))
    assert(served.exists(_.last == true), "held-out copies must flag as dups")

    // replayed epoch (same checkpoint, no new data): markers make it a no-op
    StreamingPipeline.bandIndexSink(stream, streamDir, ckpt).awaitTermination()
    assert(flagged(streamDir) == served)
  }

  test("streaming search-index maintenance equals the batch-maintained index after two epochs") {
    import java.nio.file.Files
    import graft.text.Bm25
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b0, b1) = docs.partition(_._1 % 2 == 0)

    val streamDir = Files.createTempDirectory("bm25_stream").toString + "/bm25"
    val ckpt = Files.createTempDirectory("bm25_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData(b0: _*)
    StreamingPipeline.searchIndexSink(stream, streamDir, ckpt).awaitTermination()
    input.addData(b1: _*)
    StreamingPipeline.searchIndexSink(stream, streamDir, ckpt).awaitTermination()

    // batch-maintained twin: writeSearchIndex epoch 0, appendSearchIndex epoch 1
    val batchDir = Files.createTempDirectory("bm25_batch").toString + "/bm25"
    Bm25.writeSearchIndex(b0.toDF("doc_id", "text"), "doc_id", col("text"), batchDir)
    Bm25.appendSearchIndex(b1.toDF("doc_id", "text"), "doc_id", col("text"), batchDir)

    // identical stored data: stats bit-for-bit, postings row-for-row
    assert(spark.read.parquet(s"$streamDir/stats").head() ==
      spark.read.parquet(s"$batchDir/stats").head(),
      "stream-merged stats must be bit-identical to the batch-merged ones")
    def sorted(dir: String, leg: String, cols: String*) =
      spark.read.parquet(s"$dir/$leg").select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sorted(streamDir, "postings", "doc_id", "term", "tf", "dl") ==
      sorted(batchDir, "postings", "doc_id", "term", "tf", "dl"))
    assert(sorted(streamDir, "docs", "doc_id", "dl") ==
      sorted(batchDir, "docs", "doc_id", "dl"))

    // and identical serving
    val queries = Seq((1, "data"), (2, "model"), (3, "spark")).toDF("query_id", "term")
    def topk(dir: String) = {
      val (p, st) = Bm25.loadSearchIndex(spark, dir)
      Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 5)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    val served = topk(streamDir)
    assert(served == topk(batchDir))
    assert(served.nonEmpty, "corpus terms must retrieve")

    // replayed epoch (same checkpoint, no new data): markers make it a no-op
    StreamingPipeline.searchIndexSink(stream, streamDir, ckpt).awaitTermination()
    assert(topk(streamDir) == served)
  }

  test("streaming rectify sink: a correction queue converges the index to the last corrections") {
    import java.nio.file.Files
    import graft.text.Bm25
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(80)
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id"))
      .limit(3).collect().map(_.getLong(0))

    val idx = Files.createTempDirectory("rect_stream").toString + "/bm25"
    Bm25.writeSearchIndex(docs, "doc_id", col("text"), idx)

    // epoch 0 corrects docs 0 and 1; epoch 1 corrects doc 1 AGAIN and
    // doc 2 — the queue's last word on doc 1 must win; an id the index
    // never held rides along and must not be inserted
    val e0 = Seq((ids(0), "epoch zero correction spark data"),
      (ids(1), "first correction of doc one"))
    val e1 = Seq((ids(1), "second correction of doc one wins model data"),
      (ids(2), "epoch one correction stream"),
      (999999999L, "never admitted"))
    val ckpt = Files.createTempDirectory("rect_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData(e0: _*)
    StreamingPipeline.rectifySink(stream, idx, ckpt).awaitTermination()
    input.addData(e1: _*)
    StreamingPipeline.rectifySink(stream, idx, ckpt).awaitTermination()

    // twin: a rebuild over the corpus with the queue's LAST corrections
    val last = (e0.toMap ++ e1.toMap).toSeq.toDF("doc_id", "_new")
    val correctedCorpus = docs
      .join(last, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_new"), col("text")).as("text"))
    val rebuilt = Files.createTempDirectory("rect_rebuild").toString + "/bm25"
    Bm25.writeSearchIndex(correctedCorpus, "doc_id", col("text"), rebuilt)
    assert(spark.read.parquet(s"$idx/stats").head() ==
      spark.read.parquet(s"$rebuilt/stats").head())
    assert(spark.read.parquet(s"$idx/docs").count() == 80,
      "the unmatched correction must not be inserted")
    val queries = Seq((1, "spark"), (2, "correction"), (3, "model"))
      .toDF("query_id", "term")
    def topk(dir: String) = {
      val (p, st) = Bm25.loadSearchIndex(spark, dir)
      Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 5)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    val served = topk(idx)
    assert(served == topk(rebuilt))
    assert(served.nonEmpty)

    // replay (same checkpoint, no new data): applied markers no-op
    StreamingPipeline.rectifySink(stream, idx, ckpt).awaitTermination()
    assert(topk(idx) == served)

    // a duplicate id INSIDE one epoch is refused, never applied in
    // arbitrary order (the store's uniqueness contract)
    input.addData(Seq((ids(0), "conflict a"), (ids(0), "conflict b")): _*)
    val q = StreamingPipeline.rectifySink(stream, idx, ckpt)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("duplicate") ||
      Option(err.getCause).exists(_.getMessage.contains("duplicate")))
    assert(topk(idx) == served, "a refused epoch must leave the index intact")
  }

  test("streaming erase sink: a rights-request queue purges every leg like one batch sweep") {
    import java.nio.file.Files
    implicit val sqlCtx = spark.sqlContext
    def build(tag: String): String = {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val work = Files.createTempDirectory(s"erase_sink_$tag").toString
      docs.write.parquet(s"$work/b0")
      val state = s"$work/state"
      graft.cli.CurateCli.runIncremental(
        spark, s"$work/b0", state, nShards = 2,
        searchIndex = true, exactIndex = true, aggStats = true)
      state
    }
    val streamed = build("s")
    val batched = build("b")
    val subjects = spark.read.parquet(s"$streamed/corpus")
      .orderBy(col("doc_id")).limit(4).select(col("doc_id"))
      .collect().map(_.getLong(0))

    // two epochs of requests (one id never admitted rides along), then
    // the twin: ONE batch sweep of the union on the other state dir
    val ckpt = Files.createTempDirectory("erase_sink_ckpt").toString
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("doc_id")
    input.addData(subjects(0), subjects(1))
    StreamingPipeline.eraseSink(stream, streamed, ckpt).awaitTermination()
    input.addData(subjects(2), subjects(3), 999999999L)
    StreamingPipeline.eraseSink(stream, streamed, ckpt).awaitTermination()

    val allKeys = Files.createTempDirectory("erase_sink_keys").toString + "/keys"
    (subjects :+ 999999999L).toSeq.toDF("doc_id").write.parquet(allKeys)
    graft.cli.CurateCli.runErase(spark, allKeys, batched)

    def leg(state: String, p: String, cols: String*): Set[String] =
      spark.read.parquet(s"$state/$p").select(cols.map(col): _*)
        .collect().map(_.toString).toSet
    assert(leg(streamed, "corpus", "doc_id") == leg(batched, "corpus", "doc_id"))
    assert(!subjects.exists(id =>
      leg(streamed, "corpus", "doc_id").contains(s"[$id]")))
    assert(leg(streamed, "search/docs", "doc_id", "dl") ==
      leg(batched, "search/docs", "doc_id", "dl"))
    assert(leg(streamed, "search/stats", "_n_docs", "_avgdl") ==
      leg(batched, "search/stats", "_n_docs", "_avgdl"))
    assert(leg(streamed, "exact/sets", "id", "sz") ==
      leg(batched, "exact/sets", "id", "sz"))
    assert(leg(streamed, "index/shingles", "doc_id") ==
      leg(batched, "index/shingles", "doc_id"))

    // served retrieval equal between the two erasure routes
    val queries = Seq((1, "data"), (2, "spark")).toDF("query_id", "term")
    def topk(state: String) = {
      val (p, st) = graft.text.Bm25.loadSearchIndex(spark, s"$state/search")
      graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 5)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    assert(topk(streamed) == topk(batched))

    // replay from the same checkpoint (no new requests): nothing rewrites
    def sig(state: String): Set[(String, Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(state), true)
      val b = Set.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          b += ((s.getPath.toString, s.getLen, s.getModificationTime))
      }
      b.result()
    }
    val before = sig(streamed)
    StreamingPipeline.eraseSink(stream, streamed, ckpt).awaitTermination()
    assert(sig(streamed) == before,
      "a drained queue's replay must leave every store byte-identical")
  }

  test("composed rights queues: an erased id stays erased when an earlier rectification replays") {
    import java.nio.file.Files
    import graft.text.Bm25
    implicit val sqlCtx = spark.sqlContext
    // the two rights sinks drain DIFFERENT queues against ONE state
    // directory; the bound to pin: erasure wins over any REDELIVERY of an
    // earlier-queued rectification — whether the replay carries an
    // already-applied epoch id (marker no-op) or a fresh one
    // (replace-only no-ops on the absent id)
    def build(tag: String): String = {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val work = Files.createTempDirectory(s"rights_$tag").toString
      docs.write.parquet(s"$work/b0")
      graft.cli.CurateCli.runIncremental(
        spark, s"$work/b0", s"$work/state", nShards = 2,
        searchIndex = true, aggStats = true)
      s"$work/state"
    }
    val state = build("live")
    val twin = build("twin")
    val ids = spark.read.parquet(s"$state/corpus")
      .orderBy(col("doc_id")).limit(2).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val (x, y) = (ids(0), ids(1))
    val corrections = Seq((x, "corrected text for the erased subject"),
      (y, "corrected text for the retained subject"))

    // live: rectification queue applies, THEN the erasure queue, THEN the
    // rectification is REDELIVERED through a fresh checkpoint lineage —
    // first under a fresh epoch id (a no-op filler epoch shifts it), the
    // at-least-once delivery case
    val rectCkpt = Files.createTempDirectory("rights_rect").toString
    val rectIn = MemoryStream[(Long, String)]
    rectIn.addData(corrections: _*)
    StreamingPipeline.rectifySink(
      rectIn.toDF().toDF("doc_id", "text"), s"$state/search", rectCkpt)
      .awaitTermination()
    val eraseCkpt = Files.createTempDirectory("rights_erase").toString
    val eraseIn = MemoryStream[Long]
    eraseIn.addData(x)
    StreamingPipeline.eraseSink(
      eraseIn.toDF().toDF("doc_id"), state, eraseCkpt).awaitTermination()
    val replayCkpt = Files.createTempDirectory("rights_replay").toString
    val replayIn = MemoryStream[(Long, String)]
    replayIn.addData((999999999L, "filler epoch never admitted"))
    StreamingPipeline.rectifySink(
      replayIn.toDF().toDF("doc_id", "text"), s"$state/search", replayCkpt)
      .awaitTermination()
    replayIn.addData(corrections: _*)
    StreamingPipeline.rectifySink(
      replayIn.toDF().toDF("doc_id", "text"), s"$state/search", replayCkpt)
      .awaitTermination()

    // twin: the request log applied batchwise in order — rectify, erase,
    // redelivered rectify — through the batch surfaces
    Bm25.rectifySearchIndex(spark, s"$twin/search",
      corrections.toDF("doc_id", "text"), "doc_id", col("text"), Some(1001L))
    val keys = Files.createTempDirectory("rights_keys").toString + "/k"
    Seq(x).toDF("doc_id").write.parquet(keys)
    graft.cli.CurateCli.runErase(spark, keys, twin)
    Bm25.rectifySearchIndex(spark, s"$twin/search",
      corrections.toDF("doc_id", "text"), "doc_id", col("text"), Some(1002L))

    def leg(state: String, p: String, cols: String*): Set[String] =
      spark.read.parquet(s"$state/$p").select(cols.map(col): _*)
        .collect().map(_.toString).toSet
    assert(!leg(state, "search/docs", "doc_id").contains(s"[$x]"),
      "the erased id must stay erased after the rectification replay")
    assert(!leg(state, "search/postings", "doc_id").contains(s"[$x]"))
    assert(leg(state, "search/docs", "doc_id", "dl") ==
      leg(twin, "search/docs", "doc_id", "dl"),
      "composed sinks must equal the request log applied batchwise")
    assert(leg(state, "search/postings", "doc_id", "term", "tf") ==
      leg(twin, "search/postings", "doc_id", "term", "tf"))
    assert(leg(state, "search/stats", "_n_docs", "_avgdl") ==
      leg(twin, "search/stats", "_n_docs", "_avgdl"))
    assert(leg(state, "corpus", "doc_id") == leg(twin, "corpus", "doc_id"))

    // and the marker-no-op delivery case: replaying the ORIGINAL
    // checkpoint (already-applied epoch ids) changes nothing either
    StreamingPipeline.rectifySink(
      rectIn.toDF().toDF("doc_id", "text"), s"$state/search", rectCkpt)
      .awaitTermination()
    assert(!leg(state, "search/docs", "doc_id").contains(s"[$x]"))
  }

  test("checkpointed parquet sink: a restarted query resumes exactly-once") {
    import java.nio.file.Files
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("bronze").toString + "/events"
    val ckpt = Files.createTempDirectory("bronze_ckpt").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("id", "ts", "payload")
    // land batch A and let AvailableNow drain to a clean stop
    input.addData((1L, ts(0), "a"), (2L, ts(1), "b"))
    val q1 = StreamingPipeline.sinkDatePartitionedParquet(stream, outDir, ckpt)
    assert(q1.awaitTermination(60000), "first drain did not terminate")
    assert(spark.read.parquet(outDir).count() == 2)
    // add batch B and RESTART from the same checkpoint: batch A must not
    // re-land (committed offsets + the sink commit log; a mid-batch crash
    // leaves uncommitted task files that the commit log hides from readers)
    input.addData((3L, ts(2), "c"))
    val q2 = StreamingPipeline.sinkDatePartitionedParquet(stream, outDir, ckpt)
    assert(q2.awaitTermination(60000), "restart drain did not terminate")
    val back = spark.read.parquet(outDir)
    assert(back.count() == 3, "restart must resume, not replay")
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // layout: the date partition column exists and prunes
    assert(back.columns.contains("event_date"))
    val oneDay = back.filter(col("event_date") ===
      back.agg(min(col("event_date"))).head().getDate(0))
    assert(oneDay.count() == 3) // same synthetic day; the filter still plans
  }

  test("stateful sessionization closes sessions on gap; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingPipeline.sessionize(
      input.toDS(), gapMs = 10 * 60 * 1000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // user 1: events at 10:00 + 10:05 (one session), then 10:30 (new session)
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(30), 1, "click", 3.0)
    )
    q.processAllAvailable()
    // advance watermark far enough to time out the second session
    input.addData(Event(9, Timestamp.valueOf("2024-01-01 13:00:00"), 99, "x", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(got.length == 2)
    assert(got(0).n_events == 2 && got(0).total_value == 3.0)
    assert(got(0).session_end == ts(5))
    assert(got(1).n_events == 1 && got(1).total_value == 3.0)

    // batch twin on the same user-1 events
    val batch = StreamingPipeline.sessionizeBatch(
      Seq(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(30), 1, "click", 3.0)
      ).toDF(),
      gapMs = 10 * 60 * 1000
    ).orderBy("session_start").collect()
    assert(batch.length == 2)
    assert(batch(0).getAs[Long]("n_events") == 2)
    assert(batch(1).getAs[Long]("n_events") == 1)
  }

  test("erasure bound: sessionize state expires by watermark — no state row outlives the timeout") {
    // Store purges (CurateCli erase / Erasure.eraseByKey) do NOT reach
    // flatMapGroupsWithState checkpoints: a subject's open session lives
    // in the state store until its event-time timeout fires. This pins
    // the BOUND of that exposure — watermark past lastSeen+gap ⇒ the
    // subject's key is gone from the persisted state files themselves
    // (read back via the state data source, not inferred from output).
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sess_state").toString
    val input = MemoryStream[Event]
    val sessions = StreamingPipeline.sessionize(
      input.toDS(), gapMs = 10 * 60 * 1000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("erase_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // the subject (user 7) and a bystander (user 8)
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(5), 7, "click", 2.0),
      Event(3, ts(1), 8, "click", 9.0))
    q.processAllAvailable()

    def stateKeys(): Set[Long] =
      spark.read.format("statestore").load(ckpt)
        .select(col("key.*")).collect().map(_.getLong(0)).toSet
    assert(stateKeys().contains(7L),
      "while the session is open, the subject's key IS in the persisted " +
        "state — the documented erasure bound")

    // any event advancing the watermark past lastSeen+gap expires the
    // subject's state (EventTimeTimeout fires without subject traffic)
    input.addData(Event(9, Timestamp.valueOf("2024-01-01 13:00:00"), 8, "x", 0.0))
    q.processAllAvailable()
    q.stop()
    assert(!stateKeys().contains(7L),
      "after the watermark passes the timeout, no state-store row may " +
        "hold the subject's key")
    // ...and the timeout emitted the subject's closed session downstream
    assert(spark.table("erase_sessions").as[Session].collect()
      .exists(s => s.user_id == 7L && s.n_events == 2))
  }

  test("property: streaming sessionize == batch twin on randomized event streams") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val events = (1 to 300).map { i =>
      val user = 1L + rnd.nextInt(8)
      val t = Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(20)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")
      Event(i.toLong, t, user, "e", rnd.nextInt(100).toDouble)
    }
    val gap = 15 * 60 * 1000L

    val input = MemoryStream[Event]
    val q = StreamingPipeline
      .sessionize(input.toDS(), gapMs = gap, watermark = "0 seconds")
      .writeStream.format("memory").queryName("rand_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(events: _*)
    q.processAllAvailable()
    // sentinel far in the future closes every open session via timeout
    input.addData(Event(9999L, Timestamp.valueOf("2024-02-01 00:00:00"), 999L, "x", 0.0))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("rand_sessions").as[Session].collect()
      .filter(_.user_id != 999L)
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events, s.total_value))
      .toSet

    val batch = StreamingPipeline
      .sessionizeBatch(events.toDF(), gapMs = gap)
      .collect()
      .map(r => (
        r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").getTime,
        r.getAs[Timestamp]("session_end").getTime,
        r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")
      ))
      .toSet

    assert(streamed == batch)
  }

  test("PII-leak linter blocks raw PII columns, passes masked plans") {
    import graft.plans.PiiLeakLinter
    val linter = new graft.plans.PiiLeakLinter(PolicyCatalog.reference)
    val raw = Seq(("a@b.fr", "Paris")).toDF("contact_email", "city")
    val ex = intercept[IllegalStateException] {
      PiiLeakLinter.guard {
        linter(raw.queryExecution.analyzed)
      }
    }
    assert(ex.getMessage.contains("contact_email"))
    val masked = graft.masking.MaskModel.maskModel(
      raw,
      PolicyCatalog.reference.policiesFor("stg_services_publics"),
      graft.policy.EngineConfig())
    PiiLeakLinter.guard { linter(masked.queryExecution.analyzed) } // no throw
    linter(raw.queryExecution.analyzed) // inactive outside guard: no throw
  }

  test("SQL-registered functions produce identical results to the Column API") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("test1@example.fr", "the cat sat", 48.8566, 2.3522))
      .toDF("email", "text", "lat", "lon")
      .createOrReplaceTempView("fn_test")
    val r = spark.sql("""
      select mask_email(email) as e, is_valid_email(email) as v,
             token_count(text) as tc, lang_id(text) as lang,
             simhash64(graft_tokens(text)) as sh,
             create_geohash(lat, lon) as geo
      from fn_test""").head()
    assert(r.getAs[String]("e") == "user_3438633363386233@anonymized.gouv.fr")
    assert(r.getAs[Boolean]("v"))
    assert(r.getAs[Int]("tc") == 3)
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[String]("geo") == "geo_48.86_2.35")
    val viaColumn = Seq("the cat sat").toDF("t")
      .select(graft.dedup.Dedup.simhash(graft.text.TextAnalysis.tokens($"t")))
      .as[Long].head()
    assert(r.getAs[Long]("sh") == viaColumn)
    // struct-returning and aggregate registrations
    Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.95), (2L, 20L, 0.5))
      .toDF("src", "dst", "score").createOrReplaceTempView("agg_test")
    val topk = spark.sql("""
      select src, inline(topk_by_score(dst, score, 2))
      from agg_test group by src order by src, rank""").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(3)))
    assert(topk.toSeq == Seq((1L, 12L, 1), (1L, 10L, 2), (2L, 20L, 1)))
    val nt = spark.sql("select text_stats(text).n_tokens as n from fn_test").head()
    assert(nt.getAs[Int]("n") == 3)
  }

  test("streaming HDR sketch: window buckets equal the batch histogram; quantiles roll up") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("id", "ts", "v")
    val sk = StreamingPipeline.histogramSketchStream(
      df, col("v"), windowLength = "5 minutes")
    val w1 = Seq(1.0, 2.5, 10.0, 2.5)
    val w2 = Seq(100.0, 0.5)
    input.addData(
      w1.zipWithIndex.map { case (v, i) => (i.toLong, ts(1, i), v) } ++
        w2.zipWithIndex.map { case (v, i) => (100L + i, ts(6, i), v) }: _*)
    val q = sk.writeStream.format("memory").queryName("hdr_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hdr_stream")
    import graft.sketch.HdrHistogram
    val w1Streamed = streamed
      .filter(col("window.start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .select(col("idx"), col("cnt"))
    val w1Batch = HdrHistogram.sketch(w1.toDF("v"), col("v"))
    assert(w1Streamed.except(w1Batch).isEmpty && w1Batch.except(w1Streamed).isEmpty)
    // rolled-up quantiles over both windows == batch over the union
    val rolled = HdrHistogram
      .quantiles(HdrHistogram.merge(streamed.select(col("idx"), col("cnt"))),
        Seq(0.5, 0.9))
      .orderBy("q").collect().map(_.getDouble(1)).toSeq
    val direct = HdrHistogram
      .quantiles(HdrHistogram.sketch((w1 ++ w2).toDF("v"), col("v")), Seq(0.5, 0.9))
      .orderBy("q").collect().map(_.getDouble(1)).toSeq
    assert(rolled == direct, s"rolled $rolled vs direct $direct")
  }

  test("stream-stream attribution join matches the batch twin; window bounds hold") {
    implicit val sqlCtx = spark.sqlContext
    // (user, ts, event_id)
    val impIn = MemoryStream[(Long, Timestamp, Long)]
    val convIn = MemoryStream[(Long, Timestamp, Long)]
    def frame(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF().toDF("user_id", "ts", "event_id")
    val joined = StreamingPipeline.attributionJoin(
      frame(impIn), frame(convIn), "user_id",
      attributionWindow = "30 minutes", watermark = "2 hours")

    val impRows = Seq(
      (1L, ts(0), 100L), (1L, ts(50), 101L), // 101 too late for conv 201
      (2L, ts(5), 102L))
    val convRows = Seq(
      (1L, ts(20), 200L),  // pairs with 100 (20 min)
      (1L, ts(55), 201L),  // pairs with 101 (5 min); 100 out of window
      (2L, ts(4), 202L),   // BEFORE its impression: no pair
      (3L, ts(10), 203L))  // no impression at all
    impIn.addData(impRows: _*)
    convIn.addData(convRows: _*)
    val q = joined.writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "imp_id", "conv_id", "latency_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val streamed = norm(spark.table("attr_stream"))
    val batch = norm(StreamingPipeline.attributionJoin(
      impRows.toDF("user_id", "ts", "event_id"),
      convRows.toDF("user_id", "ts", "event_id"),
      "user_id", attributionWindow = "30 minutes"))
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed == Set(
      (1L, 100L, 200L, 1200L),
      (1L, 101L, 201L, 300L)))
  }
}
