package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, Similarity}
import graft.text.CorpusPipeline

/** IVF ANN index + corpus-preparation pipeline specs. */
class IvfCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("IVF: build is deterministic, search recall covers brute-force top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(centroids.count() == 8)
    assert(assigned.count() == emb.count())
    // deterministic rebuild
    val (c2, _) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val sig1 = centroids.select(col("centroid_id"), col("centroid")(0)).orderBy("centroid_id").collect().toSeq
    val sig2 = c2.select(col("centroid_id"), col("centroid")(0)).orderBy("centroid_id").collect().toSeq
    assert(sig1 == sig2)

    val query = emb.filter($"vec_id" === 7).select($"embedding").as[Seq[Float]].head().map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .collect().map(_.getLong(0)).toSet
    val approx = Ivf.search(assigned, centroids, "vec_id", "embedding", query, k = 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    // half the clusters probed -> should recover most of the true top-5
    assert((exact & approx).size >= 3)
    // probing all clusters == exact
    val full = Ivf.search(assigned, centroids, "vec_id", "embedding", query, k = 5, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact)
  }

  test("IVF searchAll: one batched job agrees with per-query search; k truncates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val qids = Seq(0L, 7L, 13L)
    val queries = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val batched = Ivf
      .searchAll(assigned, centroids, "vec_id", "embedding", queries,
        "query_id", "qv", k = 5, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
      .groupBy(_._1)
    assert(batched.keySet == qids.toSet)
    qids.foreach { qid =>
      val qv = emb.filter($"vec_id" === qid).select($"embedding")
        .as[Seq[Float]].head().map(_.toDouble)
      val single = Ivf
        .search(assigned, centroids, "vec_id", "embedding", qv, k = 5, nprobe = 4)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
        .toSeq
      val got = batched(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(got == single, s"query $qid: batched != per-query")
      assert(batched(qid).map(_._2).sorted.toSeq == (1 to 5))
    }
    emb.unpersist()
  }

  test("IVF index round trip: write + load serves identical searchAll results") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Ivf.writeIndex(centroids, assigned, "vec_id", "embedding", dir)
    val (lc, la) = Ivf.loadIndex(spark, dir)
    // centroids survive bit-for-bit; assignments cover every vector with
    // the SAME cluster membership
    assert(lc.orderBy("centroid_id").collect().toSeq ==
      centroids.select(col("centroid_id"), col("centroid")).orderBy("centroid_id")
        .collect().toSeq)
    val memLoaded = la.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val memBuilt = assigned.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(memLoaded == memBuilt)
    // the loaded index answers searchAll identically to the built one
    val queries = emb.filter($"vec_id".isin(0L, 7L, 13L))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def run(a: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Ivf.searchAll(a, c, "vec_id", "embedding", queries, "query_id", "qv",
        k = 5, nprobe = 4)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(la, lc) == run(assigned, centroids))
    // the on-disk layout IS cluster-partitioned: one directory per cluster
    val sub = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("centroid_id="))
    assert(sub.length == 8, s"expected 8 cluster partitions, got ${sub.toSeq}")
    emb.unpersist()
  }

  test("appendIndex: appended index equals a same-centroid rebuild") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val first = emb.filter(pmod($"vec_id", lit(2)) === 0)
    val second = emb.filter(pmod($"vec_id", lit(2)) === 1)
    // build + write on the first half, append the second
    val (centroids, assignedFirst) = Ivf.build(first, "vec_id", "embedding", k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    Ivf.writeIndex(centroids, assignedFirst, "vec_id", "embedding", dir)
    Ivf.appendIndex(second, "vec_id", "embedding", dir)
    val (lc, la) = Ivf.loadIndex(spark, dir)
    // membership: every vector present exactly once, assigned exactly as
    // a full-corpus pass with the same centroids would assign it
    val appended = la.select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    val rebuilt = Ivf.assign(emb, "vec_id", "embedding", centroids)
      .select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(appended.length == rebuilt.length)
    assert(appended.sorted == rebuilt.sorted)
    // serving: searchAll over the appended index == over the rebuild
    val queries = emb.filter($"vec_id".isin(0L, 7L))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def run(a: org.apache.spark.sql.DataFrame) =
      Ivf.searchAll(a, lc, "vec_id", "embedding", queries, "query_id", "qv",
        k = 5, nprobe = 3)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(la) == run(Ivf.assign(emb, "vec_id", "embedding", centroids)))
    emb.unpersist()
  }

  test("searchAll refuses reserved/colliding column names") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 2, iters = 1)
    val qBad = emb.select($"vec_id".as("query_id"), $"embedding".as("qv"),
      lit(1).as("centroid_id"))
    val e1 = intercept[IllegalArgumentException] {
      Ivf.searchAll(assigned, centroids, "vec_id", "embedding", qBad,
        "query_id", "qv", k = 1)
    }
    assert(e1.getMessage.contains("centroid_id"))
    val qOk = emb.select($"vec_id", $"embedding".as("qv"))
    val e2 = intercept[IllegalArgumentException] {
      Ivf.searchAll(assigned, centroids, "vec_id", "embedding", qOk,
        "vec_id", "qv", k = 1)
    }
    assert(e2.getMessage.contains("distinct names"))
  }

  test("PQ: codes in range, deterministic; ADC top-k recalls exact neighbors") {
    import graft.similarity.Pq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 2)
    assert(cb.centroids.size == 8)
    assert(cb.centroids.forall(cs => cs.nonEmpty && cs.size <= 16))
    assert(cb.centroids.forall(_.forall(_._2.size == 8)))
    // cids ascending and within [0, ks)
    assert(cb.centroids.forall(cs =>
      cs.map(_._1) == cs.map(_._1).sorted && cs.forall(c => c._1 >= 0 && c._1 < 16)))
    val encoded = emb.select($"vec_id", Pq.encode($"embedding", cb).as("codes")).cache()
    val codes = encoded.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("codes").toSeq)
      .toMap
    assert(codes.size == 500)
    assert(codes.values.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)))
    // deterministic retrain + re-encode
    val cb2 = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 2)
    assert(cb2.centroids == cb.centroids)

    // ADC search: the exact L2 top-10's members are mostly recovered by
    // the 32x-compressed codes (PQ is lossy; recall, not identity)
    val q = emb.filter($"vec_id" === 7).select($"embedding")
      .as[Seq[Float]].head().map(_.toDouble)
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq)
      .toMap
    val exactTop = vecs.toSeq.sortBy { case (id, v) => (l2(v, q), id) }.take(10).map(_._1).toSet
    val adcTop = Pq.adcTopK(encoded, "vec_id", "codes", q, cb, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((exactTop & adcTop).size >= 5,
      s"ADC recall@10 too low: ${(exactTop & adcTop).size}/10")
    // ADC distance of a vector approximates its true distance through the
    // reconstruction: |adc - l2(q, decode(codes))| ~ 0 by construction
    val someId = 42L
    val adc42 = Pq.adcTopK(encoded.filter($"vec_id" === someId), "vec_id", "codes", q, cb, 1)
      .head().getDouble(1)
    val recon = Pq.decode(codes(someId), cb)
    assert(math.abs(adc42 - l2(q, recon)) < 1e-9,
      "ADC must equal the exact distance to the reconstruction")
    // compression accounting: 8 int8-range codes vs 64 float dims = 32x
    assert(codes.values.forall(_.forall(_ < 256)))

    // codebook round trip: the stored table re-encodes identically
    val dir = java.nio.file.Files.createTempDirectory("pq_codebook").toString
    Pq.writeCodebook(cb, dir, spark)
    val loaded = Pq.loadCodebook(spark, dir)
    assert(loaded == cb)
    val recodes = emb.select($"vec_id", Pq.encode($"embedding", loaded).as("codes"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("codes").toSeq)
      .toMap
    assert(recodes == codes)
    encoded.unpersist(); emb.unpersist()
  }

  test("IVF-PQ: ADC search within probes + exact re-rank; stored codes index serves identically") {
    import graft.similarity.Pq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 2)
    val enc = Pq.encodeAssigned(assigned, "vec_id", "embedding", cb).cache()
    assert(enc.columns.toSeq == Seq("vec_id", "codes", "centroid_id"))
    assert(enc.count() == emb.count())

    val q = emb.filter($"vec_id" === 7).select($"embedding")
      .as[Seq[Float]].head().map(_.toDouble)
    // stage 1 candidates come ONLY from probed clusters, ranked by ADC
    val probed = {
      val cents = centroids.collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      def l2(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      cents.toSeq.sortBy { case (cid, c) => (l2(c, q), cid) }.take(4).map(_._1).toSet
    }
    val shortlist = Pq.searchIvfAdc(enc, centroids, "vec_id", "codes", q, cb,
      k = 20, nprobe = 4).cache()
    val members = assigned.select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val slIds = shortlist.collect().map(_.getLong(0)).toSeq
    assert(slIds.size == 20 && slIds.forall(id => probed(members(id))),
      "shortlist must only contain rows from probed clusters")
    // shortlist ADC distances agree with the brute-force adcTopK restricted
    // to the probed clusters (same operator, different plan shape)
    val bruteAdc = Pq.adcTopK(
      enc.filter($"centroid_id".isin(probed.toSeq: _*)),
      "vec_id", "codes", q, cb, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(shortlist.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == bruteAdc)

    // stage 2: exact re-rank of the shortlist — top-10 by true cosine,
    // descending, and every returned id comes from the shortlist
    val rr = Pq.rerankExact(shortlist, emb, "vec_id", "embedding", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr.size == 10 && rr.map(_._2).reverse.sorted.reverse == rr.map(_._2))
    assert(rr.map(_._1).toSet.subsetOf(slIds.toSet))
    // re-ranked recall vs the full exact top-10 is at least ADC-only recall
    val exactTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val adcOnly = Pq.searchIvfAdc(enc, centroids, "vec_id", "codes", q, cb,
      k = 10, nprobe = 4).collect().map(_.getLong(0)).toSet
    assert((exactTop & rr.map(_._1).toSet).size >= (exactTop & adcOnly).size,
      "exact re-rank must not lose recall vs raw ADC ranking")

    // batched search: one job over a query frame, bit-identical to the
    // per-query path (same ascending fold + left-to-right subspace sum)
    val qids = Seq(0L, 7L, 13L)
    val queries = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val batched = Pq.searchAllAdc(enc, centroids, "vec_id", "codes",
      queries, "query_id", "qv", cb, k = 20, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("adc_dist")))
      .groupBy(_._1)
    assert(batched.keySet == qids.toSet)
    qids.foreach { qid =>
      val qv = emb.filter($"vec_id" === qid).select($"embedding")
        .as[Seq[Float]].head().map(_.toDouble)
      val single = Pq.searchIvfAdc(enc, centroids, "vec_id", "codes", qv, cb,
        k = 20, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batched(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(got == single, s"query $qid: batched ADC != per-query ADC")
    }

    // the serving round trip: the codes table IS an Ivf index (vecCol =
    // codes), cluster-partitioned on disk, and serves identical results
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    Ivf.writeIndex(centroids, enc, "vec_id", "codes", dir)
    val (lc, la) = Ivf.loadIndex(spark, dir)
    val servedSl = Pq.searchIvfAdc(la, lc, "vec_id", "codes", q, cb,
      k = 20, nprobe = 4)
    assert(servedSl.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      shortlist.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    shortlist.unpersist(); enc.unpersist(); emb.unpersist()
  }

  test("cluster drift: identical batch scores zero PSI, a skewed batch scores positive") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    // same distribution (the whole corpus as the batch): pa == pb per
    // bucket exactly, so every contribution is (p-p)*ln(1) = 0
    val same = Ivf.clusterDrift(centroids, assigned, emb, "vec_id", "embedding")
      .agg(sum(col("psi"))).head().getDouble(0)
    assert(same == 0.0, s"identical distributions must score exactly 0, got $same")
    // a batch drawn from ONE cluster: heavy drift
    val oneCluster = assigned.filter(col("centroid_id") ===
        assigned.groupBy("centroid_id").count()
          .orderBy(col("count").desc, col("centroid_id")).head().getInt(0))
      .select(col("vec_id"), col("embedding"))
    val skewed = Ivf.clusterDrift(centroids, assigned, oneCluster, "vec_id", "embedding")
      .agg(sum(col("psi"))).head().getDouble(0)
    assert(skewed > 0.2, s"single-cluster batch must trip the drift alert, got $skewed")
    // evidence rows cover every observed cluster with exact counts
    val rows = Ivf.clusterDrift(centroids, assigned, emb, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == centroids.count())
    assert(rows.forall { case (_, a, b) => a == b })
    emb.unpersist()
  }

  test("IVF buildOnSample: frac=1 equals the exact build; sampled centroids stay close") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val (cExact, aExact) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    // frac=1.0 keeps every row -> same seeds, same Lloyd's path, same index
    val (cFull, aFull) = Ivf.buildOnSample(emb, "vec_id", "embedding", k = 8,
      iters = 2, frac = 1.0)
    assert(cFull.orderBy("centroid_id").collect().toSeq ==
      cExact.orderBy("centroid_id").collect().toSeq)
    assert(aFull.select("vec_id", "centroid_id").collect().toSet ==
      aExact.select("vec_id", "centroid_id").collect().toSet)
    // a half sample: every row still assigned, deterministically, and the
    // quantization quality (mean sq dist to assigned centroid) is within
    // 2x of the exact build's
    val (_, aHalf) = Ivf.buildOnSample(emb, "vec_id", "embedding", k = 8,
      iters = 2, frac = 0.5)
    assert(aHalf.count() == emb.count())
    val (_, aHalf2) = Ivf.buildOnSample(emb, "vec_id", "embedding", k = 8,
      iters = 2, frac = 0.5)
    assert(aHalf.select("vec_id", "centroid_id").collect().toSet ==
      aHalf2.select("vec_id", "centroid_id").collect().toSet)
    def meanDist(a: org.apache.spark.sql.DataFrame): Double =
      a.agg(avg(col("_dist"))).head().getDouble(0)
    val (dE, dH) = (meanDist(aExact), meanDist(aHalf))
    assert(dH <= dE * 2.0, s"sampled build quality off: $dH vs exact $dE")
    emb.unpersist()
  }

  test("corpus pipeline normalize=true dedups NFC spelling variants") {
    val prose = "the quick brown fox jumps over the lazy dog and runs to the river"
    val d = Seq(
      (1L, prose + " caf\u00e9"),   // composed
      (2L, prose + " cafe\u0301"),  // decomposed - same visible text
      (3L, prose + " entirely different ending clause here")
    ).toDF("doc_id", "text")
    // without normalization the two spellings both survive exact dedup
    val keptRaw = CorpusPipeline.prepare(d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptRaw == Set(1L, 2L, 3L))
    // with it, the decomposed copy collapses onto the min-id representative
    val keptNorm = CorpusPipeline.prepare(d,
      cfg = CorpusPipeline.Config(normalize = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNorm == Set(1L, 3L))
  }

  test("corpus pipeline gates quality/repetition/language, redacts, dedups") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the house of a friend in the morning to see the river"),
      (2L, "the quick brown fox jumps over the lazy dog and runs to the house of a friend in the morning to see the river"), // exact dup
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam"), // repetitive
      (4L, "le chat de la maison et les chiens de la ville sont dans le jardin de la mairie avec les enfants du village"), // french
      (5L, "contact the mayor at jean.dupont@mairie.fr for the meeting of the council in the town hall about the new plan of the city"),
      (6L, null.asInstanceOf[String]) // broken upstream: NULL text must be gated
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L)) // 2 deduped, 3 repetitive, 4 non-en, 6 null
    val redacted = out.filter($"doc_id" === 5).select("text").as[String].head()
    assert(redacted.contains("[EMAIL]") && !redacted.contains("@mairie.fr"))
    assert(out.columns.contains("quality_score") && out.columns.contains("lang_guess"))
  }

  test("corpus pipeline near-dup stage drops clustered near-duplicates") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today in the morning sun with the birds"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("today", "yesterday")),
      (3L, "the completely different article talks about the spark engine and the catalyst optimizer in the cluster of the lab")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs,
      cfg = CorpusPipeline.Config(nearDupJaccard = Some(0.5)))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
