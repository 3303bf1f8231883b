package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.PartitionSwap

/** Store-level replays of the [[graft.operators.PartitionSwap]] crash
  * matrix for the multi-leg index commits: BM25 append and erase
  * (postings + docs + stats must never be observable half-swapped, in
  * either promote order) and the SetSimJoin epoch append (the old
  * "recover by rebuilding" mid-epoch window). Each test fabricates an
  * exact mid-commit state from the diff of a before/after clone, runs
  * recovery, and proves the index serves the PRE-operation results —
  * then replays the operation and proves convergence to the
  * post-operation index.
  */
class IndexCommitCrashSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"idxcrash_$tag").toString + "/idx"

  private def copyDir(src: String, dst: String): Unit =
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(dst),
      false, spark.sparkContext.hadoopConfiguration)

  private def files(leg: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(leg)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet
  }

  private def writeMarker(dir: String, batchId: Long, entries: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_batches/_pending")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write((batchId.toString +: entries).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  // ---------- BM25 ----------

  private val docsA = Seq(
    (1L, "spark streams data"), (2L, "spark spark window"),
    (3L, "hash join plan"), (4L, ""))
  private val docsB = Seq(
    (5L, "window stream stream spark"), (6L, "join data spark"))

  private def bm25Rows(dir: String): Seq[Seq[Any]] = {
    val q = Seq((1, "spark"), (2, "stream"), (3, "join")).toDF("query_id", "term")
    val (p, st) = graft.text.Bm25.loadSearchIndex(spark, dir)
    graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", q, topK = 5)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
  }

  private def bm25Stats(dir: String) =
    spark.read.parquet(s"$dir/stats").head()

  /** Build at `pre`, clone, append at the clone; return the clone plus
    * the append's delta entries and a stage-dir materializer.
    */
  private def bm25AppendFixture(): (String, String, Seq[String], Seq[String]) = {
    val pre = tmp("bm25pre")
    graft.text.Bm25.writeSearchIndex(
      docsA.toDF("doc_id", "text"), "doc_id", col("text"), pre)
    val full = tmp("bm25full")
    copyDir(pre, full)
    graft.text.Bm25.appendSearchIndex(
      docsB.toDF("doc_id", "text"), "doc_id", col("text"), full, Some(2L))
    val deltaPost = (files(s"$full/postings") -- files(s"$pre/postings")).toSeq.sorted
    val deltaDocs = (files(s"$full/docs") -- files(s"$pre/docs")).toSeq.sorted
    (pre, full, deltaPost, deltaDocs)
  }

  test("bm25 append crash AFTER postings deltas promoted, docs+stats still staged") {
    val (pre, full, deltaPost, deltaDocs) = bm25AppendFixture()
    val crash = tmp("bm25c1")
    copyDir(pre, crash)
    deltaPost.foreach(f => copyDir(s"$full/postings/$f", s"$crash/postings/$f"))
    deltaDocs.foreach(f => copyDir(s"$full/docs/$f", s"$crash/.swap-stage/docs/$f"))
    copyDir(s"$full/stats", s"$crash/.swap-stage/stats")
    writeMarker(crash, 2L,
      deltaPost.map("postings/" + _) ++ deltaDocs.map("docs/" + _) :+ "stats")
    graft.text.Bm25.recoverSearchIndex(spark, crash)
    assert(bm25Stats(crash) == bm25Stats(pre),
      "rollback must restore pre-append stats")
    assert(bm25Rows(crash) == bm25Rows(pre),
      "a recovered index must serve the exact pre-append results")
    // the replayed epoch converges to the batch-maintained index
    graft.text.Bm25.appendSearchIndex(
      docsB.toDF("doc_id", "text"), "doc_id", col("text"), crash, Some(2L))
    assert(bm25Stats(crash) == bm25Stats(full))
    assert(bm25Rows(crash) == bm25Rows(full))
  }

  test("bm25 append crash AFTER stats retired, promote never ran (the other order)") {
    val (pre, full, deltaPost, deltaDocs) = bm25AppendFixture()
    val crash = tmp("bm25c2")
    copyDir(pre, crash)
    deltaPost.foreach(f => copyDir(s"$full/postings/$f", s"$crash/postings/$f"))
    deltaDocs.foreach(f => copyDir(s"$full/docs/$f", s"$crash/docs/$f"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/stats"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/stats"))
    copyDir(s"$full/stats", s"$crash/.swap-stage/stats")
    writeMarker(crash, 2L,
      deltaPost.map("postings/" + _) ++ deltaDocs.map("docs/" + _) :+ "stats")
    graft.text.Bm25.recoverSearchIndex(spark, crash)
    assert(bm25Stats(crash) == bm25Stats(pre))
    assert(bm25Rows(crash) == bm25Rows(pre))
    graft.text.Bm25.appendSearchIndex(
      docsB.toDF("doc_id", "text"), "doc_id", col("text"), crash, Some(2L))
    assert(bm25Stats(crash) == bm25Stats(full))
    assert(bm25Rows(crash) == bm25Rows(full))
  }

  test("bm25 erase crash between postings promote and stats promote") {
    val all = (docsA ++ docsB).toDF("doc_id", "text")
    val pre = tmp("bm25e_pre")
    graft.text.Bm25.writeSearchIndex(all, "doc_id", col("text"), pre)
    val erased = tmp("bm25e_done")
    copyDir(pre, erased)
    val keys = Seq(2L, 4L).toDF("doc_id")
    graft.text.Bm25.eraseFromSearchIndex(spark, erased, keys, "doc_id")

    val crash = tmp("bm25e_crash")
    copyDir(pre, crash)
    // postings leg promoted (original retired); docs and stats staged
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/postings"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/postings"))
    copyDir(s"$erased/postings", s"$crash/postings")
    copyDir(s"$erased/docs", s"$crash/.swap-stage/docs")
    copyDir(s"$erased/stats", s"$crash/.swap-stage/stats")
    writeMarker(crash, 31L, Seq("postings", "docs", "stats"))
    graft.text.Bm25.recoverSearchIndex(spark, crash)
    assert(bm25Stats(crash) == bm25Stats(pre),
      "rollback must leave the fully-intact index — never purged " +
        "postings under pre-erase stats")
    assert(bm25Rows(crash) == bm25Rows(pre))
    // the replayed sweep converges, with NO caller-supplied count
    graft.text.Bm25.eraseFromSearchIndex(spark, crash, keys, "doc_id")
    assert(bm25Stats(crash) == bm25Stats(erased))
    assert(bm25Rows(crash) == bm25Rows(erased))
    // and a second replay is a value no-op
    assert(graft.text.Bm25.eraseFromSearchIndex(spark, crash, keys, "doc_id") == 0L)
    assert(bm25Stats(crash) == bm25Stats(erased))
  }

  // ---------- SetSimJoin ----------

  private def shingled(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").select(
      col("doc_id"),
      array_distinct(transform(
        graft.dedup.Dedup.wordShingles(col("text"), 3), x => md5(x))).as("_sh"))

  private val corpusA = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy cat today"),
    (3L, "completely different words about spark execution plans"))
  private val corpusB = Seq(
    (4L, "the quick brown fox jumps over the lazy dog today"),
    (5L, "unrelated streaming watermark state expiry semantics"))

  private def probeRows(dir: String): Seq[Seq[Any]] =
    graft.dedup.SetSimJoin
      .searchIndex(spark, dir, shingled(corpusA ++ corpusB), "doc_id", "_sh")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("setsim epoch append crash between the sets and postings legs rolls back") {
    val pre = tmp("ssj_pre")
    graft.dedup.SetSimJoin.writeIndex(shingled(corpusA), "doc_id", "_sh", 2, 5, pre)
    val full = tmp("ssj_full")
    copyDir(pre, full)
    graft.dedup.SetSimJoin.appendIndex(
      spark, full, shingled(corpusB), "doc_id", "_sh", Some(4L))
    val deltaSets = (files(s"$full/sets") -- files(s"$pre/sets")).toSeq.sorted
    val deltaPost = (files(s"$full/postings") -- files(s"$pre/postings")).toSeq.sorted
    assert(deltaSets.nonEmpty && deltaPost.nonEmpty)

    val crash = tmp("ssj_crash")
    copyDir(pre, crash)
    // sets deltas promoted; postings deltas still staged — the exact
    // mid-epoch window the old append documented as unrecoverable
    deltaSets.foreach(f => copyDir(s"$full/sets/$f", s"$crash/sets/$f"))
    deltaPost.foreach(f => copyDir(s"$full/postings/$f", s"$crash/.swap-stage/postings/$f"))
    writeMarker(crash, 4L, deltaSets.map("sets/" + _) ++ deltaPost.map("postings/" + _))
    graft.dedup.SetSimJoin.recoverIndex(spark, crash)
    assert(probeRows(crash) == probeRows(pre),
      "recovery must restore the exact pre-epoch index")
    // replay the epoch: converges to the batch-maintained index
    graft.dedup.SetSimJoin.appendIndex(
      spark, crash, shingled(corpusB), "doc_id", "_sh", Some(4L))
    assert(probeRows(crash) == probeRows(full))
    // applied-marker replay: a third call is a no-op
    graft.dedup.SetSimJoin.appendIndex(
      spark, crash, shingled(corpusB), "doc_id", "_sh", Some(4L))
    assert(probeRows(crash) == probeRows(full))
  }

  // ---------- atomic multi-leg erase (Erasure.eraseLegs) ----------

  private def bandRows(dir: String): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    // loadBandIndex IS the recovery-bearing load path under test
    val idx = graft.dedup.Dedup.loadBandIndex(spark, dir)
    (idx.bands.collect().map(_.toSeq).sortBy(_.toString).toSeq,
      idx.shingles.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("property: band-index erase killed at EVERY commit step serves pre or post, never mixed legs") {
    // the REAL multi-leg erase (bands partitioned by band + flat
    // shingles under ONE commit), interrupted before each filesystem
    // mutation of the swap: loadBandIndex recovery must then serve
    // EXACTLY the pre-erase or EXACTLY the post-erase index — a state
    // where one leg is purged and its sibling is not is precisely what
    // Fsck.bandIndex's legs_agree flags as corruption
    final case class Crash(step: Int) extends RuntimeException
    val corpus = (corpusA ++ corpusB).toDF("doc_id", "text")
    def build(tag: String): String = {
      val dir = tmp(s"blegs_$tag")
      graft.dedup.Dedup.writeBandIndex(
        graft.dedup.Dedup.buildBandIndex(corpus, "doc_id", "text"), dir)
      dir
    }
    val pre = build("pre")
    val preRows = bandRows(pre)
    val post = build("post")
    val keys = Seq(2L, 4L).toDF("doc_id")
    val nErased =
      graft.dedup.Dedup.eraseFromBandIndex(spark, post, keys, "doc_id")
    assert(nErased > 0L)
    val postRows = bandRows(post)
    assert(postRows != preRows)

    val legs = Seq(
      graft.operators.Erasure.Leg("bands", "doc_id", Seq("band")),
      graft.operators.Erasure.Leg("shingles", "doc_id"))
    var nSteps = 0
    val count = build("count")
    graft.operators.Erasure.eraseLegs(
      spark, count, keys, legs, i => nSteps = i + 1)
    assert(bandRows(count) == postRows)
    assert(nSteps >= 8, s"fixture must exercise every phase, got $nSteps")

    (0 until nSteps).foreach { k =>
      val dir = build(s"k$k")
      intercept[Crash] {
        graft.operators.Erasure.eraseLegs(
          spark, dir, keys, legs, i => if (i == k) throw Crash(i))
      }
      val recovered = bandRows(dir)
      assert(recovered == preRows || recovered == postRows,
        s"crash at step $k/$nSteps: index must be exactly PRE or POST")
      // the replayed sweep converges and a further replay is a no-op
      graft.dedup.Dedup.eraseFromBandIndex(spark, dir, keys, "doc_id")
      assert(bandRows(dir) == postRows,
        s"crash at step $k: replayed erase must converge to POST")
      assert(graft.dedup.Dedup.eraseFromBandIndex(spark, dir, keys, "doc_id") == 0L)
    }
  }

  test("setsim erase crash mid-swap rolls back both legs together; no-match sweep stays byte-identical") {
    final case class Crash(step: Int) extends RuntimeException
    val pre = tmp("ssje_pre")
    graft.dedup.SetSimJoin.writeIndex(
      shingled(corpusA ++ corpusB), "doc_id", "_sh", 2, 5, pre)
    val preRows = probeRows(pre)
    val post = tmp("ssje_post")
    copyDir(pre, post)
    val keys = Seq(2L, 4L).toDF("id")
    assert(graft.dedup.SetSimJoin.eraseFromIndex(spark, post, keys, "id") > 0L)
    val postRows = probeRows(post)
    assert(postRows != preRows)

    // kill between the two legs' promotes (sets promoted, postings not):
    // step 5 = pending marker + both retires done, first promote next
    val crash = tmp("ssje_crash")
    copyDir(pre, crash)
    intercept[Crash] {
      graft.operators.Erasure.eraseLegs(spark, crash, keys,
        Seq(graft.operators.Erasure.Leg("sets", "id"),
          graft.operators.Erasure.Leg("postings", "id")),
        i => if (i == 6) throw Crash(i))
    }
    graft.dedup.SetSimJoin.recoverIndex(spark, crash)
    assert(probeRows(crash) == preRows,
      "mid-swap crash must roll BOTH legs back — a sets-purged/" +
        "postings-intact index violates postings_subset_sets")
    assert(graft.dedup.SetSimJoin.eraseFromIndex(spark, crash, keys, "id") > 0L)
    assert(probeRows(crash) == postRows)

    // a sweep that matches nothing must leave every live file untouched
    val byteState = files(s"$post/sets") -> files(s"$post/postings")
    assert(graft.dedup.SetSimJoin.eraseFromIndex(
      spark, post, Seq(999L).toDF("id"), "id") == 0L)
    assert(files(s"$post/sets") -> files(s"$post/postings") == byteState)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$post/.swap-stage")),
      "no-match sweep must discard its stage")
  }

  // ---------- band-index append (Dedup.appendBandIndex) ----------

  test("band append crash AFTER band deltas promoted, shingles still staged") {
    // the store family's last plain two-job append is now a staged
    // commit: fabricate the worst mid-commit state (bands leg already
    // carries the batch, shingles leg does not — exactly the
    // legs-disagree corruption Fsck.bandIndex flags), recover through
    // the load path, and prove the index serves the exact pre-append
    // results before a replay converges
    import graft.dedup.Dedup
    val pre = tmp("bandapp_pre")
    Dedup.writeBandIndex(
      Dedup.buildBandIndex(corpusA.toDF("doc_id", "text"), "doc_id", "text"), pre)
    val preRows = bandRows(pre)
    val full = tmp("bandapp_full")
    copyDir(pre, full)
    val batch = corpusB.toDF("doc_id", "text")
    Dedup.appendBandIndex(batch, "text", full, Some(2L))
    val postRows = bandRows(full)
    assert(postRows != preRows)

    def bandDirs(dir: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/bands"))
        .map(_.getPath.getName).filter(_.startsWith("band=")).sorted.toSeq
    val deltaBands = bandDirs(full).flatMap { b =>
      (files(s"$full/bands/$b") -- files(s"$pre/bands/$b")).toSeq.sorted
        .map(f => s"bands/$b/$f")
    }
    val deltaSh = (files(s"$full/shingles") -- files(s"$pre/shingles"))
      .toSeq.sorted.map(f => s"shingles/$f")
    assert(deltaBands.nonEmpty && deltaSh.nonEmpty,
      "fixture must produce deltas on both legs")

    val crash = tmp("bandapp_crash")
    copyDir(pre, crash)
    deltaBands.foreach(e => copyDir(s"$full/$e", s"$crash/$e"))
    deltaSh.foreach(e => copyDir(s"$full/$e", s"$crash/.swap-stage/$e"))
    writeMarker(crash, 2L, deltaBands ++ deltaSh)

    // loadBandIndex IS the recovery-bearing load path: the promoted band
    // deltas (no retired counterpart) must be rolled back out
    assert(bandRows(crash) == preRows,
      "recovered index must serve the exact pre-append results")
    Dedup.appendBandIndex(batch, "text", crash, Some(2L))
    assert(bandRows(crash) == postRows,
      "replayed epoch must converge to the batch-maintained index")
    Dedup.appendBandIndex(batch, "text", crash, Some(2L))
    assert(bandRows(crash) == postRows,
      "replay of an applied epoch must be a no-op")
  }
}
