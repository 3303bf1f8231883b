package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Hybrid, Ivf, KnnClassify, SemDedup, Similarity}
import graft.text.Vocab

/** Semantic dedup, kNN label classification, and vocabulary/OOV specs. */
class SemanticOpsSpec extends SparkSpec {
  import spark.implicits._

  test("batched brute-force topK agrees with the single-query path per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 2).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id").toInt + 1,
        r.getSeq[Float](1).map(_.toDouble).toSeq))
      .toSeq.sortBy(_._1)
    val all = Hybrid.bruteForceTopKAll(emb, "vec_id", "embedding", qs, k = 5)
      .collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id")))
      .sortBy(t => (t._1, t._2)).toSeq
    // the single-query path ranks on the RAW cosine; replay its ordering
    // at the batched path's rounded grain for an exact id comparison
    val single = qs.flatMap { case (qid, v) =>
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", v, k = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getAs[Long]("vec_id")) }
    }
    assert(all == single.sortBy(t => (t._1, t._2)))
  }

  test("rrfFuse: rank arithmetic, list census, and the id tie-break") {
    val a = Seq((1, 1, 10L), (1, 2, 20L), (1, 3, 30L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((1, 1, 20L), (1, 2, 40L)).toDF("query_id", "rank", "doc_id")
    val out = Hybrid.rrfFuse(Seq(a, b), "doc_id", k0 = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_lists"), r.getAs[Double]("rrf_score")))
    def rrf(ranks: Seq[Int]) =
      math.floor(ranks.map(x => 1.0 / (60 + x)).sum * 1e6 + 0.5) / 1e6
    // doc 20 appears in both lists (ranks 2 and 1) and must win; then
    // 10 (1/61), then 40 (1/62) over 30 (1/63)
    assert(out.map(_._2).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(out.head == ((1, 20L, 2L, rrf(Seq(2, 1)))))
    assert(out(1) == ((2, 10L, 1L, rrf(Seq(1)))))
    // equal fused scores fall back to doc_id asc: ranks 3 (list a) and 2+
    // nothing — construct a tie: 1/(60+3) vs 1/(60+3)
    val t1 = Seq((2, 3, 100L)).toDF("query_id", "rank", "doc_id")
    val t2 = Seq((2, 3, 50L)).toDF("query_id", "rank", "doc_id")
    val tie = Hybrid.rrfFuse(Seq(t1, t2), "doc_id", k0 = 60, topK = 10)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(tie == Seq(50L, 100L), "equal RRF must order by id asc")
  }

  test("searchIndexed: stored-index hybrid equals the inline leg composition") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hybrid_spec").toString
    graft.text.Bm25.writeSearchIndex(d, "doc_id", col("text"), s"$tmp/bm25")
    val (centroids, assigned) = Ivf.build(e, "vec_id", "embedding", k = 8, iters = 2)
    Ivf.writeIndex(centroids, assigned, "vec_id", "embedding", s"$tmp/ivf")
    val termQ = Seq(1 -> "data", 1 -> "model", 2 -> "stream", 2 -> "vector")
      .toDF("query_id", "term")
    val vecQ = e.filter(col("vec_id") < 2)
      .select((col("vec_id") + 1).cast("int").as("query_id"),
        col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_lists"),
        r.getAs[Double]("rrf_score")))
      .sortBy(t => (t._1, t._2)).toSeq
    val stored = rows(Hybrid.searchIndexed(spark, s"$tmp/bm25", s"$tmp/ivf",
      "doc_id", "vec_id", "embedding", termQ, vecQ, "qv",
      kPerLeg = 10, nprobe = 3, topK = 5))
    // the inline composition of the same legs: the persistence layer must
    // be transparent to the fused result
    val sparse = graft.text.Bm25
      .retrieveTopK(d, "doc_id", col("text"), termQ, topK = 10)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("doc_id"))
    val dense = Ivf
      .searchAll(assigned, centroids, "vec_id", "embedding", vecQ,
        "query_id", "qv", k = 10, nprobe = 3)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("vec_id").as("doc_id"))
    val inline = rows(Hybrid.rrfFuse(Seq(sparse, dense), "doc_id", topK = 5))
    assert(stored.nonEmpty && stored == inline)
  }

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextFloat() * 2f - 1f)
  }

  test("SemDedup drops exact duplicates, keeps the lowest id per dup group") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // clone vec 3 and 7 under fresh high ids: cos=1.0, same cluster
    val clones = base
      .filter($"vec_id".isin(3L, 7L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding", $"label")
    val df = base.unionByName(clones)
    val verdicts = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 8, iters = 2, eps = 0.9)
      .cache()
    assert(verdicts.count() == df.count())
    val dropped = verdicts.filter(!$"kept").select("vec_id").as[Long].collect().toSet
    assert(Set(10003L, 10007L).subsetOf(dropped))
    assert(!dropped.contains(3L) && !dropped.contains(7L))
    // every drop carries evidence >= eps; every cluster keeps its lowest id
    assert(verdicts.filter(!$"kept" && $"max_cos_lower" < 0.9).count() == 0)
    val lowestPerCluster = verdicts
      .groupBy("centroid_id").agg(min("vec_id").as("vec_id"))
      .join(verdicts, Seq("vec_id", "centroid_id"))
    assert(lowestPerCluster.filter(!$"kept").count() == 0)
    // dedupe() returns exactly the kept rows
    val kept = SemDedup.dedupe(df, "vec_id", "embedding", k = 8, iters = 2, eps = 0.9)
    assert(kept.count() == verdicts.filter($"kept").count())
    verdicts.unpersist()
  }

  test("SemDedup over a stored IVF index matches the inline build exactly") {
    import graft.similarity.Ivf
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (centroids, assigned) = Ivf.build(df, "vec_id", "embedding", k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_index").toString
    Ivf.writeIndex(centroids, assigned, "vec_id", "embedding", dir)
    val (_, loaded) = Ivf.loadIndex(spark, dir)
    def collect(v: org.apache.spark.sql.DataFrame) = v
      .select("vec_id", "centroid_id", "max_cos_lower", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val inline = collect(SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 8, iters = 2, eps = 0.3,
        maxCompare = Some(8), salts = 4))
    val stored = collect(SemDedup
      .semanticDedupAssigned(loaded, "vec_id", "embedding", eps = 0.3,
        maxCompare = Some(8), salts = 4))
    assert(stored == inline,
      "stored-index semantic dedup must reproduce the inline verdicts bit-for-bit")
    // guard: a frame without centroid_id is refused up front
    val e = intercept[IllegalArgumentException] {
      SemDedup.semanticDedupAssigned(df, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("centroid_id"))
  }

  test("SemDedup mega-cluster guard: maxCompare bounds pairs linearly; salts are result-identical") {
    // ONE dominant cluster: 300 near-identical vectors (tiny jitter on a
    // shared base) + 8 well-separated points at ids 0..7 (ids 0..3 become
    // the k-means seeds, so the blob lands WHOLE in one of their clusters).
    // Uncapped pairwise would be ~300^2/2 pairs.
    val base = vec(1)
    val rnd = new scala.util.Random(9)
    val far = (0 until 8).map(j => (j.toLong, vec(50 + j)))
    val mega = (0 until 300).map { i =>
      (10L + i, base.map(v => v + rnd.nextFloat() * 1e-4f))
    }
    val df = (far ++ mega).toDF("vec_id", "embedding")
    val capped = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 4, iters = 1, eps = 0.999,
        maxCompare = Some(5))
      .cache()
    // verdicts still cover every vector; the blob's lowest id (10) survives,
    // every other blob member is caught by a lowest-5 compare candidate
    assert(capped.count() == 308)
    assert(capped.filter($"vec_id" === 10L).select("kept").as[Boolean].head())
    assert(capped.filter($"vec_id" > 10L && !$"kept").count() == 299)
    // the pair count really is bounded: every max_cos_lower came from one
    // of at most 5 compare candidates per cluster -> the plan's join output
    // is <= 5 * rows, not rows^2 (checked structurally: compare side capped)
    val eachHasEvidence = capped.filter(!$"kept" && $"max_cos_lower".isNull).count()
    assert(eachHasEvidence == 0)
    capped.unpersist()
    // salting changes the physical distribution, NOT the result
    val unsalted = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 4, iters = 1, eps = 0.999)
      .select("vec_id", "centroid_id", "kept").collect().toSet
    val salted = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 4, iters = 1, eps = 0.999,
        salts = 3)
      .select("vec_id", "centroid_id", "kept").collect().toSet
    assert(salted == unsalted)
    // and the two guards compose
    val both = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 4, iters = 1, eps = 0.999,
        maxCompare = Some(5), salts = 3)
      .select("vec_id", "centroid_id", "kept").collect().toSet
    val cappedSet = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 4, iters = 1, eps = 0.999,
        maxCompare = Some(5))
      .select("vec_id", "centroid_id", "kept").collect().toSet
    assert(both == cappedSet)
  }

  test("SemDedup maxCompare: a dup pair beyond the compare rank survives (the documented recall cost)") {
    // cluster members 0..9 distinct, 10 duplicates 8 (rank 9 > maxCompare 3)
    // -> with the cap, 10 is never compared against 8 and stays kept;
    // uncapped it drops
    val vecs = (0 until 10).map(i => (i.toLong, vec(200 + i))) :+ (10L, vec(208))
    val df = vecs.toDF("vec_id", "embedding")
    val uncapped = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 1, iters = 1, eps = 0.999)
    assert(!uncapped.filter($"vec_id" === 10L).select("kept").as[Boolean].head())
    val capped = SemDedup
      .semanticDedup(df, "vec_id", "embedding", k = 1, iters = 1, eps = 0.999,
        maxCompare = Some(3))
    assert(capped.filter($"vec_id" === 10L).select("kept").as[Boolean].head())
  }

  test("SemDedup at eps>1 keeps everything") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val verdicts = SemDedup.semanticDedup(base, "vec_id", "embedding", k = 4, iters = 1, eps = 1.01)
    assert(verdicts.filter(!$"kept").count() == 0)
  }

  test("kNN classify: identical-vector groups vote their own label") {
    // three groups of identical vectors -> SRP signatures collide exactly,
    // every neighbor is in-group, majority vote must return the group label
    val rows = for {
      g <- 0 until 3
      i <- 0 until 6
    } yield (g * 10L + i, vec(seed = 100 + g), g)
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = KnnClassify
      .audit(df, "vec_id", "embedding", "label", k = 5, bits = 24, bands = 2)
      .cache()
    assert(out.count() == 18)
    assert(out.filter($"correct" === 0).count() == 0)
    assert(out.filter($"n_neighbors" =!= 5).count() == 0)
    out.unpersist()
  }

  test("kNN classify: vote ties break to the smallest label") {
    // target 0 sits between two identical pairs with labels 2 and 1:
    // 2 votes each among its 4 neighbors -> tie -> predict 1
    val a = vec(7)
    val rows = Seq(
      (0L, a, 9),
      (1L, a, 2), (2L, a, 2),
      (3L, a, 1), (4L, a, 1)
    )
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = KnnClassify.predict(df, "vec_id", "embedding", "label", k = 4)
    val p = out.filter($"vec_id" === 0L).select("predicted_label").as[Int].head()
    assert(p == 1)
  }

  test("kNN classify: STRING labels tie-break to the lexicographically smallest") {
    // same tie construction as above, but labels are strings — the
    // type-agnostic struct tie-break must pick "apple" over "pear", not
    // fall through to max-of-largest (the numeric-negation bug shape)
    val a = vec(7)
    val rows = Seq(
      (0L, a, "zzz"),
      (1L, a, "pear"), (2L, a, "pear"),
      (3L, a, "apple"), (4L, a, "apple")
    )
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = KnnClassify.predict(df, "vec_id", "embedding", "label", k = 4)
    val p = out.filter($"vec_id" === 0L).select("predicted_label").as[String].head()
    assert(p == "apple")
  }

  test("coreset prototypes: per-cluster cap, ranks follow distance, matches window twin") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val protos = graft.similarity.Coreset
      .prototypes(emb, "vec_id", "embedding", k = 8, iters = 2, perCluster = 5)
      .cache()
    val perCluster = protos.groupBy("centroid_id").count()
    assert(perCluster.filter($"count" > 5).count() == 0)
    // ranks within a cluster are 1..n and ordered by sq_dist
    val bad = protos
      .withColumn("rk2", row_number().over(
        Window.partitionBy("centroid_id").orderBy($"sq_dist", $"vec_id")))
      .filter($"rank" =!= $"rk2")
    assert(bad.count() == 0)
    // the selected ids are the window twin's top-5 per cluster
    val (_, assigned) = graft.similarity.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val twin = assigned
      .withColumn("rk", row_number().over(
        Window.partitionBy("centroid_id").orderBy($"_dist", $"vec_id")))
      .filter($"rk" <= 5)
      .select("vec_id").as[Long].collect().toSet
    assert(protos.select("vec_id").as[Long].collect().toSet == twin)
    protos.unpersist()
  }

  test("cluster representatives pick the best-quality member, not the lowest id") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the house " +
      "of a friend in the morning to see the river and the trees of the town"
    val docs = Seq(
      (1L, "zzzz qqqq xxxx"), // low quality, lowest id
      (2L, good), // high quality
      (3L, "another unrelated document about the spark engine and the catalyst optimizer in the lab")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val reps = graft.dedup.Dedup
      .clusterRepresentatives(docs, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one cluster {1,2} labeled by its min id, represented by doc 2
    assert(reps.toSeq == Seq((1L, 2L, 2L)))
  }

  test("funnel: greedy in-order completion, strict-after, entrants only") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts(1000), "view"), (1L, ts(2000), "click"), (1L, ts(3000), "purchase"),
      // user 2: click BEFORE the view, purchase after -> click not counted,
      // so the purchase can't count either
      (2L, ts(500), "click"), (2L, ts(1000), "view"), (2L, ts(2000), "purchase"),
      // user 3: click at the SAME ms as the view -> strict-after excludes it
      (3L, ts(1000), "view"), (3L, ts(1000), "click"),
      // user 4: never viewed -> not a funnel entrant
      (4L, ts(1000), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel
      .conversions(events, Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, Some(1000L), Some(2000L), Some(3000L), 3),
      (2L, Some(1000L), None, None, 1),
      (3L, Some(1000L), None, None, 1)
    ))
    val rep = graft.operators.Funnel
      .report(events, Seq("view", "click", "purchase"))
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rep.toSeq == Seq(
      (0, "view", 3L, 1.0),
      (1, "click", 1L, 1.0 / 3.0),
      (2, "purchase", 1L, 1.0)
    ))
  }

  test("retention triangle: cohort by first day, per-offset distinct actives") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int = 12) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    val events = Seq(
      (1L, ts(0)), (1L, ts(0, 18)), (1L, ts(1)), (1L, ts(3)),
      (2L, ts(0)), (2L, ts(1)),
      (3L, ts(1))
    ).toDF("user_id", "ts")
    val out = graft.operators.Retention
      .cohortRetention(events)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 2L, 2L, 1.0),
      ("2024-01-01", 3, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0)
    ))
  }

  test("transition matrix: lag pairs per user, row-normalized probabilities") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val events = Seq(
      (1L, 1L, ts(1000), "a"), (1L, 2L, ts(2000), "b"), (1L, 3L, ts(3000), "b"),
      (2L, 4L, ts(1000), "b"), (2L, 5L, ts(2000), "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.Transitions
      .transitionMatrix(events)
      .orderBy("prev_type", "next_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 0.5),
      ("b", "b", 1L, 0.5)
    ))
  }

  test("quality ranks: per-source ordering, topFraction keeps the best") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the house " +
      "of a friend in the morning to see the river and the trees of the town"
    val docs = Seq(
      (1L, "zz qq", "s1"), (2L, good, "s1"), (3L, good + " again today", "s1"),
      (4L, "xx yy", "s2"), (5L, good, "s2")
    ).toDF("doc_id", "text", "source")
    val ranks = graft.text.QualitySelect.ranks(docs).cache()
    // best doc per source has pct 0.0; worst has pct 1.0
    val bySource = ranks.orderBy("source", "pct").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Double]("pct")))
    assert(bySource.filter(_._1 == "s1").last._2 == 1L) // gibberish ranks last
    assert(bySource.filter(_._1 == "s2").head._2 == 5L)
    val top = graft.text.QualitySelect.topFraction(docs, 0.5)
    // pct <= 0.5 keeps 2 of 3 in s1 and 1 of 2 in s2
    assert(top.count() == 3)
    assert(!top.select("doc_id").as[Long].collect().contains(1L))
    ranks.unpersist()
  }

  test("pii discovery counts email/phone/address lookalikes per column") {
    val df = Seq(
      ("alice@corp.fr", "+33 1 22 33 44 55", "10 rue de Paris"),
      ("not-an-email", "0144556677", "Ville 3"),
      (null.asInstanceOf[String], "nope", "22 avenue Foch")
    ).toDF("a", "b", "c")
    val out = graft.validate.Validate
      .piiDiscovery(df, Seq("a", "b", "c"))
      .orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1L, 0L, 0L),
      ("b", 3L, 0L, 2L, 0L),
      ("c", 3L, 0L, 0L, 2L)
    ))
  }

  test("property: funnel conversions match an in-memory greedy fold") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "other")
    val events = (1 to 400).map { i =>
      (rnd.nextInt(12).toLong, i.toLong,
        new Timestamp(rnd.nextInt(100000).toLong), types(rnd.nextInt(types.size)))
    }
    val df = events.toDF("user_id", "event_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val got = graft.operators.Funnel
      .conversions(df, steps)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toSet
    // reference: per user, earliest step-0, then min ms of each next step
    // strictly after the previous step's time
    val expected = events
      .groupBy(_._1)
      .flatMap { case (u, evs) =>
        val byType = evs.map(e => (e._4, e._3.getTime))
        def minAfter(tpe: String, after: Long): Option[Long] = {
          val c = byType.collect { case (t, ms) if t == tpe && ms > after => ms }
          if (c.isEmpty) None else Some(c.min)
        }
        val t0 = {
          val v = byType.collect { case (t, ms) if t == steps.head => ms }
          if (v.isEmpty) None else Some(v.min)
        }
        t0.map { s0 =>
          val s1 = minAfter(steps(1), s0)
          val s2 = s1.flatMap(minAfter(steps(2), _))
          (u, Some(s0): Option[Any], s1.map(x => x: Any), s2.map(x => x: Any))
        }
      }
      .toSet
    assert(got == expected)
  }

  test("corr matrix: perfect/anti correlation, null rows excluded everywhere") {
    val df = Seq(
      (Some(1.0), 2.0, -1.0),
      (Some(2.0), 4.0, -2.0),
      (Some(3.0), 6.0, -3.0),
      (Some(4.0), 8.0, -4.0),
      (None: Option[Double], 1.0, 1.0) // dropped for ALL pairs
    ).toDF("x", "y", "z")
    val out = graft.operators.Stats
      .corrMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_a", "col_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.forall(_._3 == 4L))
    assert(math.abs(out(0)._4 - 1.0) < 1e-12)  // x,y
    assert(math.abs(out(1)._4 + 1.0) < 1e-12)  // x,z
    assert(math.abs(out(2)._4 + 1.0) < 1e-12)  // y,z
  }

  test("vocab: ids dense by (count desc, token), min-count floor applied") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b x"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val v = Vocab.build(docs, "doc_id", "text", minCount = 2)
      .orderBy("vocab_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // counts: b=5 (3 docs), a=4 (3 docs); c,x below floor
    assert(v.toSeq == Seq(("b", 5L, 3L, 0L), ("a", 4L, 3L, 1L)))
  }

  test("vocab maxSize truncates the tail of the id ordering") {
    val docs = Seq((1L, "a a b b c c d d")).toDF("doc_id", "text")
    val v = Vocab.build(docs, "doc_id", "text", minCount = 1, maxSize = 2)
    assert(v.count() == 2)
    assert(v.agg(max("vocab_id")).head().getLong(0) == 1L)
  }

  test("oov stats: unknown tokens counted, null/empty text dropped") {
    val docs = Seq(
      (1L, "a a b z"),
      (2L, "z q"),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val vocab = Vocab.build(docs, "doc_id", "text", minCount = 2)
    val stats = Vocab.oovStats(docs, vocab, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vocab = {a(2), z(2)}; doc1: b oov; doc2: q oov; doc3/4 dropped
    assert(stats.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 1L, 0.5)))
  }
}
