package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Rectify

/** Right-to-rectification (Art. 16) specs: the in-place update core, each
  * serving index's rectify (pinned against a REBUILD over the corrected
  * corpus — the contract every rectify path claims), crash recovery, and
  * the end-to-end CurateCli sweep.
  */
class RectifySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"rectify_$tag").toString

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (name, size, mtime) of every parquet file under `dir` — the
    * byte-identity probe for no-op sweeps.
    */
  private def fileSig(dir: String): Set[(String, Long, Long)] = {
    val fs = fsOf(dir)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    val b = Set.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        b += ((s.getPath.toString, s.getLen, s.getModificationTime))
    }
    b.result()
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // deterministic doc corpus: every doc unique, some sharing the probe
  // terms so retrieval rankings are non-trivial
  private def docsFixture(n: Int): DataFrame =
    (1 to n).map { i =>
      val extra = if (i % 3 == 0) " spark window" else " stream filter"
      (i.toLong, s"doc number $i carries payload token$i$extra")
    }.toDF("doc_id", "text")

  test("updateByKey replaces matched rows in place; no-match leaves files byte-identical") {
    val dir = tmp("upd") + "/store"
    (1L to 50L).map(i => (i, s"v$i", i * 10)).toDF("id", "s", "n")
      .write.parquet(dir)
    val corrected = Seq((7L, "CORRECTED"), (9L, "ALSO")).toDF("id", "s")
    val hit = Rectify.updateByKey(spark, dir, corrected, "id")
    assert(hit == 2L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 50)
    assert(back.filter(col("id") === 7L).head().getAs[String]("s") == "CORRECTED")
    assert(back.filter(col("id") === 9L).head().getAs[String]("s") == "ALSO")
    // untouched column and untouched rows survive
    assert(back.filter(col("id") === 7L).head().getAs[Long]("n") == 70L)
    assert(back.filter(col("id") === 8L).head().getAs[String]("s") == "v8")

    val sig = fileSig(dir)
    val miss = Rectify.updateByKey(spark, dir,
      Seq((999L, "X")).toDF("id", "s"), "id")
    assert(miss == 0L)
    assert(fileSig(dir) == sig, "no-match sweep must not rewrite the store")
  }

  test("updateByKey recovers a crashed swap before rectifying") {
    val dir = tmp("updcrash") + "/store"
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "s").write.parquet(dir)
    // fabricate the mid-swap crash: live retired, promote never landed
    val fs = fsOf(dir)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"${dir}__retired"))
    val hit = Rectify.updateByKey(spark, dir,
      Seq((3L, "RECOVERED")).toDF("id", "s"), "id")
    assert(hit == 1L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 20)
    assert(back.filter(col("id") === 3L).head().getAs[String]("s") == "RECOVERED")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__retired")))
  }

  test("updateByKey refuses duplicate corrected ids and unknown columns") {
    val dir = tmp("updbad") + "/store"
    (1L to 5L).map(i => (i, s"v$i")).toDF("id", "s").write.parquet(dir)
    intercept[IllegalArgumentException] {
      Rectify.updateByKey(spark, dir,
        Seq((1L, "a"), (1L, "b")).toDF("id", "s"), "id")
    }
    intercept[IllegalArgumentException] {
      Rectify.updateByKey(spark, dir,
        Seq((1L, "a")).toDF("id", "nope"), "id")
    }
  }

  test("bm25 rectify: serve equals a rebuild over the corrected corpus, replay no-ops") {
    val docs = docsFixture(40)
    val corrected = Seq(
      (3L, "totally new spark spark spark content"),
      (6L, "short"),
      (10L, "stream stream stream stream replacement text")
    ).toDF("doc_id", "text")
    val correctedCorpus = docs.as("d")
      .join(corrected.withColumnRenamed("text", "_new"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_new"), col("text")).as("text"))

    val idx = tmp("bm25") + "/idx"
    graft.text.Bm25.writeSearchIndex(docs, "doc_id", col("text"), idx)
    val n = graft.text.Bm25.rectifySearchIndex(
      spark, idx, corrected, "doc_id", col("text"), Some(77L))
    assert(n == 3L)

    val rebuilt = tmp("bm25r") + "/idx"
    graft.text.Bm25.writeSearchIndex(correctedCorpus, "doc_id", col("text"), rebuilt)
    // stats bit-identical to the rebuild
    assert(rowsOf(spark.read.parquet(s"$idx/stats")) ==
      rowsOf(spark.read.parquet(s"$rebuilt/stats")))
    assert(rowsOf(spark.read.parquet(s"$idx/docs")) ==
      rowsOf(spark.read.parquet(s"$rebuilt/docs")))
    assert(rowsOf(spark.read.parquet(s"$idx/postings")) ==
      rowsOf(spark.read.parquet(s"$rebuilt/postings")))

    val queries = Seq((1, "spark"), (2, "stream"), (2, "payload"))
      .toDF("query_id", "term")
    def serve(dir: String) = {
      val (p, st) = graft.text.Bm25.loadSearchIndex(spark, dir)
      graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 8)
    }
    assert(rowsOf(serve(idx)) == rowsOf(serve(rebuilt)))

    // replay of the applied batch id is an exact no-op
    val sig = fileSig(idx)
    assert(graft.text.Bm25.rectifySearchIndex(
      spark, idx, corrected, "doc_id", col("text"), Some(77L)) == 0L)
    assert(fileSig(idx) == sig)
  }

  test("bm25 rectify is replace-only: ids the index never held update nothing") {
    val docs = docsFixture(10)
    val idx = tmp("bm25ro") + "/idx"
    graft.text.Bm25.writeSearchIndex(docs, "doc_id", col("text"), idx)
    val sig = fileSig(idx)
    val n = graft.text.Bm25.rectifySearchIndex(spark, idx,
      Seq((999L, "new doc that must not be inserted")).toDF("doc_id", "text"),
      "doc_id", col("text"))
    assert(n == 0L)
    assert(fileSig(idx) == sig, "replace-only: nothing may be staged or swapped")
    assert(spark.read.parquet(s"$idx/docs").count() == 10)
  }

  test("bm25 rectify crash mid-commit: recovery restores pre, replay converges to post") {
    val docs = docsFixture(20)
    val corrected = Seq((5L, "crash test spark spark")).toDF("doc_id", "text")
    val pre = tmp("bm25cp") + "/idx"
    graft.text.Bm25.writeSearchIndex(docs, "doc_id", col("text"), pre)
    val post = tmp("bm25cq") + "/idx"
    copyDir(pre, post)
    graft.text.Bm25.rectifySearchIndex(
      spark, post, corrected, "doc_id", col("text"), Some(5L))

    // fabricate the crash: postings retired+promoted, docs retired but NOT
    // promoted (still staged), stats untouched, pending marker present
    val crash = tmp("bm25cc") + "/idx"
    copyDir(pre, crash)
    val fs = fsOf(crash)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$crash.retired"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/postings"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/postings"))
    copyDir(s"$post/postings", s"$crash/postings")
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/docs"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/docs"))
    copyDir(s"$post/docs", s"$crash/.swap-stage/docs")
    copyDir(s"$post/stats", s"$crash/.swap-stage/stats")
    writeMarker(crash, 5L, Seq("postings", "docs", "stats"))

    graft.text.Bm25.recoverSearchIndex(spark, crash)
    assert(rowsOf(spark.read.parquet(s"$crash/postings")) ==
      rowsOf(spark.read.parquet(s"$pre/postings")),
      "rollback must restore the pre-rectify postings")
    assert(rowsOf(spark.read.parquet(s"$crash/docs")) ==
      rowsOf(spark.read.parquet(s"$pre/docs")))
    assert(rowsOf(spark.read.parquet(s"$crash/stats")) ==
      rowsOf(spark.read.parquet(s"$pre/stats")))
    // the replayed sweep converges to the post state
    assert(graft.text.Bm25.rectifySearchIndex(
      spark, crash, corrected, "doc_id", col("text"), Some(5L)) == 1L)
    assert(rowsOf(spark.read.parquet(s"$crash/postings")) ==
      rowsOf(spark.read.parquet(s"$post/postings")))
    assert(rowsOf(spark.read.parquet(s"$crash/stats")) ==
      rowsOf(spark.read.parquet(s"$post/stats")))
  }

  private def copyDir(src: String, dst: String): Unit = {
    val fs = fsOf(src)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(dst), false, true,
      spark.sparkContext.hadoopConfiguration)
  }

  private def writeMarker(dir: String, batchId: Long, entries: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_batches/_pending")
    val fs = fsOf(dir)
    val out = fs.create(p, true)
    out.write((batchId.toString +: entries).mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  private def setsOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      array_distinct(transform(
        graft.dedup.Dedup.wordShingles(col("text"), 3), x => md5(x))).as("sh"))

  test("exact index rectify: probes equal a rebuild over the corrected corpus") {
    val docs = (1 to 30).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon token$i zeta eta theta iota kappa")
    }.toDF("doc_id", "text")
    // corrected doc 4 becomes a near-duplicate of doc 21's content
    val corrected = Seq(
      (4L, "alpha beta gamma delta epsilon token21 zeta eta theta iota kappa lambda")
    ).toDF("doc_id", "text")
    val correctedCorpus = docs.as("d")
      .join(corrected.withColumnRenamed("text", "_new"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_new"), col("text")).as("text"))

    val idx = tmp("exact") + "/idx"
    graft.dedup.SetSimJoin.writeIndex(setsOf(docs), "doc_id", "sh", 2, 5, idx)
    val n = graft.dedup.SetSimJoin.rectifyIndex(
      spark, idx, setsOf(corrected), "doc_id", "sh", Some(9L))
    assert(n == 1L)

    val rebuilt = tmp("exactr") + "/idx"
    graft.dedup.SetSimJoin.writeIndex(setsOf(correctedCorpus), "doc_id", "sh", 2, 5, rebuilt)

    val probe = setsOf(Seq(
      (101L, "alpha beta gamma delta epsilon token21 zeta eta theta iota kappa lambda mu"),
      (102L, "alpha beta gamma delta epsilon token4 zeta eta theta iota kappa")
    ).toDF("doc_id", "text"))
    val a = graft.dedup.SetSimJoin.searchIndex(spark, idx, probe, "doc_id", "sh")
    val b = graft.dedup.SetSimJoin.searchIndex(spark, rebuilt, probe, "doc_id", "sh")
    assert(rowsOf(a) == rowsOf(b))
    assert(a.count() > 0, "the probe must actually accept pairs")
    // sets membership identical to the rebuild
    assert(rowsOf(spark.read.parquet(s"$idx/sets")
      .select(col("id"), col("sz"))) ==
      rowsOf(spark.read.parquet(s"$rebuilt/sets").select(col("id"), col("sz"))))

    // replay no-ops
    val sig = fileSig(idx)
    assert(graft.dedup.SetSimJoin.rectifyIndex(
      spark, idx, setsOf(corrected), "doc_id", "sh", Some(9L)) == 0L)
    assert(fileSig(idx) == sig)
  }

  test("band index rectify: the dedup gate flags exactly what a rebuilt index flags") {
    val docs = (1 to 40).map { i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog near river $i")
    }.toDF("doc_id", "text")
    val corrected = Seq(
      (7L, "an entirely different corrected document about spark shuffles and partitions"),
      (8L, "another corrected document concerning broadcast joins and skew salting")
    ).toDF("doc_id", "text")
    val correctedCorpus = docs.as("d")
      .join(corrected.withColumnRenamed("text", "_new"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_new"), col("text")).as("text"))

    val idx = tmp("band") + "/idx"
    graft.dedup.Dedup.writeBandIndex(
      graft.dedup.Dedup.buildBandIndex(docs, "doc_id", "text"), idx)
    val n = graft.dedup.Dedup.rectifyBandIndex(corrected, "text", idx, Some(11L))
    assert(n == 2L)

    val rebuilt = tmp("bandr") + "/idx"
    graft.dedup.Dedup.writeBandIndex(
      graft.dedup.Dedup.buildBandIndex(correctedCorpus, "doc_id", "text"), rebuilt)

    // a batch holding near-copies of OLD doc-7 text and NEW doc-7 text:
    // the rectified index must flag the new and pass the old
    val batch = Seq(
      (201L, "an entirely different corrected document about spark shuffles and partitions"),
      (202L, "the quick brown fox number 7 jumps over the lazy dog near river 7"),
      (203L, "completely unrelated fresh content with its own words entirely")
    ).toDF("doc_id", "text")
    def flags(dir: String) = graft.dedup.Dedup.dedupAgainstCorpus(
      graft.dedup.Dedup.loadBandIndex(spark, dir), batch, "text", 0.7, maxBucket = None)
      .select(col("doc_id"), col("is_dup"))
    assert(rowsOf(flags(idx)) == rowsOf(flags(rebuilt)))
    val f = flags(idx).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(f(201L), "near-copy of the CORRECTED text must be flagged")
    assert(!f(202L),
      "doc 7's OLD text must no longer near-dup anything — its banded rows " +
        "left the index with the rectification")
    assert(!f(203L))
  }

  test("ivf rectify: search equals a rebuild with the same centroids; PQ layout refused") {
    def vec(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)(r.nextGaussian())
    }
    val vecs = (1 to 60).map(i => (i.toLong, vec(i))).toDF("doc_id", "embedding")
    val idx = tmp("ivf") + "/idx"
    val (centroids, assigned) = graft.similarity.Ivf.buildOnSample(
      vecs, "doc_id", "embedding", k = 4, iters = 3, frac = 1.0)
    graft.similarity.Ivf.writeIndex(centroids, assigned, "doc_id", "embedding", idx)

    val corrected = Seq((5L, vec(500)), (17L, vec(1700))).toDF("doc_id", "embedding")
    val n = graft.similarity.Ivf.rectifyIndex(spark, idx, corrected, "doc_id", "embedding")
    assert(n == 2L)

    val correctedVecs = vecs.as("v")
      .join(corrected.withColumnRenamed("embedding", "_new"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_new"), col("embedding")).as("embedding"))
    val (storedCentroids, storedAssigned) = graft.similarity.Ivf.loadIndex(spark, idx)
    val reassigned = graft.similarity.Ivf.assign(
      correctedVecs, "doc_id", "embedding", storedCentroids.select(col("centroid_id"), col("centroid")))
      .select(col("doc_id"), col("embedding"), col("centroid_id"))
    val queries = Seq((1L, vec(500)), (2L, vec(9))).toDF("query_id", "qv")
    def topk(assignedDf: DataFrame) = graft.similarity.Ivf.searchAll(
      assignedDf, storedCentroids, "doc_id", "embedding",
      queries, "query_id", "qv", k = 5, nprobe = 2)
    assert(rowsOf(topk(storedAssigned)) == rowsOf(topk(reassigned)))
    // the corrected vector is now its own nearest neighbor
    val hits = topk(storedAssigned).filter(col("query_id") === 1L)
      .orderBy(col("rank")).head()
    assert(hits.getAs[Long]("doc_id") == 5L)

    // PQ-style layout (an extra derived column) is refused
    val pqIdx = tmp("ivfpq") + "/idx"
    copyDir(idx, pqIdx)
    spark.read.parquet(s"$pqIdx/assigned").withColumn("pq_code", lit(1))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$pqIdx/assigned_tmp")
    val fs = fsOf(pqIdx)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pqIdx/assigned"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$pqIdx/assigned_tmp"),
      new org.apache.hadoop.fs.Path(s"$pqIdx/assigned"))
    intercept[IllegalArgumentException] {
      graft.similarity.Ivf.rectifyIndex(spark, pqIdx, corrected, "doc_id", "embedding")
    }
  }

  test("ivf-pq rectify: ADC search equals a rebuild with the same centroids and codebook") {
    import graft.similarity.{Ivf, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (centroids, assigned) = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val cb = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 2)
    val idx = tmp("ivfpq_rect") + "/idx"
    Ivf.writeIndex(centroids, Pq.encodeAssigned(assigned, "vec_id", "embedding", cb),
      "vec_id", "codes", idx)

    // the correction: docs 5 and 17 now carry OTHER documents' content,
    // so their corrected embeddings are other rows' vectors
    val donors = emb.filter(col("vec_id").isin(400L, 401L))
      .orderBy(col("vec_id"))
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    val corrected = Seq((5L, donors(0)), (17L, donors(1)))
      .toDF("vec_id", "embedding")
    val n = Pq.rectifyIvfPqIndex(spark, idx, corrected, "vec_id", "embedding", cb)
    assert(n == 2L)

    // rebuild: same centroids, same codebook, corrected vectors
    val correctedVecs = emb.as("v")
      .join(corrected.withColumnRenamed("embedding", "_new"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("_new"), col("embedding")).as("embedding"))
    val (lc, la) = Ivf.loadIndex(spark, idx)
    val rebuiltEnc = Pq.encodeAssigned(
      Ivf.assign(correctedVecs, "vec_id", "embedding", lc),
      "vec_id", "embedding", cb)
    assert(rowsOf(la.select(col("vec_id"), col("codes"), col("centroid_id"))) ==
      rowsOf(rebuiltEnc))

    // served search identical; a query AT doc 5's corrected vector finds it
    val qv = donors(0).map(_.toDouble)
    def adc(encDf: DataFrame) =
      Pq.searchIvfAdc(encDf, lc, "vec_id", "codes", qv, cb, k = 10, nprobe = 3)
    assert(rowsOf(adc(la)) == rowsOf(adc(rebuiltEnc)))
    assert(adc(la).collect().map(_.getLong(0)).toSet.contains(5L),
      "the rectified code word must be retrievable at its corrected vector")

    // replace-only: an id the index never held updates nothing
    val sig = fileSig(s"$idx/assigned")
    assert(Pq.rectifyIvfPqIndex(spark, idx,
      Seq((999999L, donors(0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cb) == 0L)
    assert(fileSig(s"$idx/assigned") == sig)

    // a PLAIN vector layout is refused here (Ivf.rectifyIndex's job)
    val plain = tmp("ivfplain_rect") + "/idx"
    Ivf.writeIndex(centroids, assigned.select(col("vec_id"), col("embedding"),
      col("centroid_id")), "vec_id", "embedding", plain)
    intercept[IllegalArgumentException] {
      Pq.rectifyIvfPqIndex(spark, plain, corrected, "vec_id", "embedding", cb)
    }
  }

  test("shards rectify: every shard_pos and content hash survives, audit holds, text replaced") {
    val docs = (1 to 80).map(i =>
      (i.toLong, s"src${i % 3}", s"original text $i")).toDF("doc_id", "source", "text")
    val dir = tmp("shards") + "/batch=0"
    graft.operators.Shards.write(docs, "doc_id", dir, 4, orderCols = Seq("source"))
    val before = spark.read.parquet(dir)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .collect().map(_.toString).toSet
    val hashBefore = rowsOf(graft.operators.Shards.manifest(spark, dir, "doc_id")
      .select(col("shard"), col("n_rows"), col("content_hash")))

    val corrected = Seq((10L, "CORRECTED ten"), (33L, "CORRECTED thirty three"))
      .toDF("doc_id", "text")
    val n = graft.operators.Shards.rectifyByKey(
      spark, dir, corrected, "doc_id", orderCols = Seq("source"))
    assert(n == 2L)

    val after = spark.read.parquet(dir)
    assert(after.select(col("doc_id"), col("shard"), col("shard_pos"))
      .collect().map(_.toString).toSet == before,
      "membership and positions must survive rectification exactly")
    assert(rowsOf(graft.operators.Shards.manifest(spark, dir, "doc_id")
      .select(col("shard"), col("n_rows"), col("content_hash"))) == hashBefore)
    assert(after.filter(col("doc_id") === 10L).head().getAs[String]("text")
      == "CORRECTED ten")
    assert(after.filter(col("doc_id") === 11L).head().getAs[String]("text")
      == "original text 11")

    // the in-place contract rests on corrected columns excluding the
    // order keys and layout columns — a frame carrying one is refused
    // (it would silently leave shard_pos inconsistent with the declared
    // order while the (pos, id) content-hash audit still passed)
    Seq(
      Seq((10L, "x", "s")).toDF("doc_id", "text", "source"),
      Seq((10L, "x", 3L)).toDF("doc_id", "text", "shard_pos")
    ).foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        graft.operators.Shards.rectifyByKey(
          spark, dir, bad, "doc_id", orderCols = Seq("source"))
      }
      assert(e.getMessage.contains("order/layout"))
    }
  }

  test("differential property: random corrected subsets — rectified store equals a rebuild, every seed") {
    // the Mondrian-differential methodology pointed at this round's
    // operator family: for seeded random correction sets (varying size,
    // content, and overlap with shared vocabulary), the RECTIFIED store
    // must be row-identical to a from-scratch build over the corrected
    // corpus, and serve identically — any drift in the staged
    // kept/re-derived split, the frozen-order keying, or the banded
    // re-derivation shows up as a seed-specific mismatch here
    val vocab = Seq("spark", "stream", "window", "filter", "shuffle",
      "join", "broadcast", "partition", "codegen", "parquet")
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      def sentence(id: Long): String =
        (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ") +
          s" token$id"
      val docs = (1 to 60).map(i => (i.toLong, sentence(i))).toDF("doc_id", "text")
      val nCorr = 3 + rnd.nextInt(8)
      val ids = rnd.shuffle((1 to 60).toList).take(nCorr).map(_.toLong)
      val corrected = ids.map(id => (id, sentence(id + 1000))).toDF("doc_id", "text")
      val correctedCorpus = docs
        .join(corrected.withColumnRenamed("text", "_new"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("_new"), col("text")).as("text"))

      // BM25: all three legs row-identical to the rebuild
      val idx = tmp(s"prop_bm25_$seed") + "/idx"
      graft.text.Bm25.writeSearchIndex(docs, "doc_id", col("text"), idx)
      assert(graft.text.Bm25.rectifySearchIndex(
        spark, idx, corrected, "doc_id", col("text")) == nCorr)
      val rebuilt = tmp(s"prop_bm25r_$seed") + "/idx"
      graft.text.Bm25.writeSearchIndex(correctedCorpus, "doc_id", col("text"), rebuilt)
      Seq("postings", "docs", "stats").foreach { leg =>
        assert(rowsOf(spark.read.parquet(s"$idx/$leg")) ==
          rowsOf(spark.read.parquet(s"$rebuilt/$leg")),
          s"seed $seed: bm25 $leg diverged from the rebuild")
      }

      // band index: banded rows and shingle sets identical to the rebuild
      val band = tmp(s"prop_band_$seed") + "/idx"
      graft.dedup.Dedup.writeBandIndex(
        graft.dedup.Dedup.buildBandIndex(docs, "doc_id", "text"), band)
      assert(graft.dedup.Dedup.rectifyBandIndex(corrected, "text", band) == nCorr)
      val bandR = tmp(s"prop_bandr_$seed") + "/idx"
      graft.dedup.Dedup.writeBandIndex(
        graft.dedup.Dedup.buildBandIndex(correctedCorpus, "doc_id", "text"), bandR)
      Seq("bands", "shingles").foreach { leg =>
        assert(rowsOf(spark.read.parquet(s"$band/$leg")) ==
          rowsOf(spark.read.parquet(s"$bandR/$leg")),
          s"seed $seed: band $leg diverged from the rebuild")
      }

      // exact prefix index: probes equal the rebuild's at the threshold
      // (sets re-key under the FROZEN order, so the postings legs may
      // order-differ from a fresh build — serving equality is the
      // contract, sets membership the stored pin)
      val ex = tmp(s"prop_exact_$seed") + "/idx"
      graft.dedup.SetSimJoin.writeIndex(setsOf(docs), "doc_id", "sh", 2, 5, ex)
      assert(graft.dedup.SetSimJoin.rectifyIndex(
        spark, ex, setsOf(corrected), "doc_id", "sh") == nCorr)
      val exR = tmp(s"prop_exactr_$seed") + "/idx"
      graft.dedup.SetSimJoin.writeIndex(
        setsOf(correctedCorpus), "doc_id", "sh", 2, 5, exR)
      assert(rowsOf(spark.read.parquet(s"$ex/sets").select(col("id"), col("sz"))) ==
        rowsOf(spark.read.parquet(s"$exR/sets").select(col("id"), col("sz"))),
        s"seed $seed: exact sets diverged from the rebuild")
      val probe = setsOf(corrected.select(
        (col("doc_id") + 5000).as("doc_id"), col("text")))
      assert(rowsOf(graft.dedup.SetSimJoin.searchIndex(spark, ex, probe, "doc_id", "sh")) ==
        rowsOf(graft.dedup.SetSimJoin.searchIndex(spark, exR, probe, "doc_id", "sh")),
        s"seed $seed: exact probes diverged from the rebuild")
    }
  }

  test("CurateCli.runRectify: every maintained leg serves the corrected corpus; pending-facts guard") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val state = tmp("sweep_state")
    val work = tmp("sweep_work")
    docs.write.parquet(s"$work/b0")
    val s0 = graft.cli.CurateCli.runIncremental(
      spark, s"$work/b0", state, nShards = 2,
      searchIndex = true, exactIndex = true, aggStats = true, profileStats = true)
    assert(s0.auditOk && s0.nFresh > 0)

    // corrected content for three admitted docs — includes a PII email the
    // sweep must redact exactly like ingest would have
    val subjects = spark.read.parquet(s"$state/corpus")
      .orderBy(col("doc_id")).limit(3).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val corrected = subjects.zipWithIndex.map { case (id, i) =>
      (id, s"corrected document $i contact me at user$i@example.com with " +
        s"spark window stream tokens repeated$i")
    }.toSeq.toDF("doc_id", "text")
    // one unmatched id must be reported, not inserted
    Seq((999999999L, "never admitted")).toDF("doc_id", "text")
      .unionByName(corrected).write.mode("overwrite").parquet(s"$work/corrected2")

    val s = graft.cli.CurateCli.runRectify(spark, s"$work/corrected2", state)
    assert(s.nRequested == 4 && s.nMatched == 3)
    assert(s.nCorpus == 3 && s.nSearch == 3 && s.nExact == 3 && s.nBand == 3)
    assert(s.nShards == 3 && s.nAggGroups > 0)

    val corpus = spark.read.parquet(s"$state/corpus")
    val r0 = corpus.filter(col("doc_id") === subjects(0)).head()
    assert(r0.getAs[String]("text").contains("corrected document 0"))
    assert(!r0.getAs[String]("text").contains("user0@example.com"),
      "rectified text must pass through the same PII redaction as ingest")
    assert(r0.getAs[Int]("n_tokens") > 0)

    // BM25 leg == rebuild over the corrected corpus
    val rebuilt = tmp("sweep_rebuild") + "/search"
    graft.text.Bm25.writeSearchIndex(corpus, "doc_id", col("text"), rebuilt)
    assert(rowsOf(spark.read.parquet(s"$state/search/stats")) ==
      rowsOf(spark.read.parquet(s"$rebuilt/stats")))
    val queries = Seq((1, "spark"), (2, "corrected")).toDF("query_id", "term")
    def serve(dir: String) = {
      val (p, st) = graft.text.Bm25.loadSearchIndex(spark, dir)
      graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 5)
    }
    assert(rowsOf(serve(s"$state/search")) == rowsOf(serve(rebuilt)))

    // agg leg == one-shot groupBy over the corrected corpus
    val served = graft.operators.AggStore.serve(spark, s"$state/agg")
      .select(col("source"), col("cnt"), col("sum"), col("min"), col("max"))
    val oneShot = graft.operators.AggStore.aggregate(
      corpus, Seq("source"), col("n_tokens").cast("long"))
      .select(col("source"), col("cnt"), col("sum"), col("min"), col("max"))
    assert(rowsOf(served) == rowsOf(oneShot))

    // shard read-back audit still holds: dense 0-based positions, one
    // file per shard
    val audit = graft.operators.Shards.readBackAudit(spark, s"$state/shards/batch=0")
    assert(audit.filter(col("files_in_shard") =!= 1).count() == 0)
    val posOk = audit.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("shard_pos")).as("mx"),
        countDistinct(col("shard_pos")).as("nd"))
      .filter(col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(posOk.count() == 0, "positions must stay dense and contiguous")

    // the rectify report exists with the sweep's numbers
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$state/rectify_report.json"))
    assert(report.contains("\"n_matched\":3") && report.contains("\"n_unmatched\":1"))

    // a crashed sweep's pending facts block a DIFFERENT rectification
    spark.read.parquet(s"$state/corpus")
      .join(broadcast(corrected.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        lit(123456L).as("_batch"))
      .write.mode("overwrite").parquet(s"$state/.rectify-facts")
    intercept[IllegalArgumentException] {
      graft.cli.CurateCli.runRectify(spark, s"$work/corrected2", state)
    }
    fsOf(state).delete(
      new org.apache.hadoop.fs.Path(s"$state/.rectify-facts"), true)

    // replaying the SAME completed sweep converges: content idempotent,
    // index/agg legs no-op on their applied batch ids
    val s2 = graft.cli.CurateCli.runRectify(spark, s"$work/corrected2", state)
    assert(s2.nMatched == 3 && s2.nSearch == 0 && s2.nExact == 0 &&
      s2.nBand == 0 && s2.nAggGroups == 0)
    assert(rowsOf(serve(s"$state/search")) == rowsOf(serve(rebuilt)))
    assert(rowsOf(graft.operators.AggStore.serve(spark, s"$state/agg")
      .select(col("source"), col("cnt"), col("sum"), col("min"), col("max"))) ==
      rowsOf(oneShot))
  }
}
