package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction (the `compact` maintenance verb): every serving
  * leg's file count drops back to the canonical sized layout while
  * serving stays value-identical, fsck audits clean afterwards, and
  * re-compacting is a stable fixed point. The crash-safety of each
  * rewrite rides the commit protocols PartitionSwapSpec exhausts.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).sortBy(_.toString).toSeq

  private def parquetFiles(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  test("compact verb: legs shrink, serving is identical, fsck clean, idempotent") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val work = Files.createTempDirectory("compact").toString
    val state = s"$work/state"
    (0 until 3).foreach { b =>
      docs.filter(col("doc_id") % 3 === b).write.parquet(s"$work/b$b")
      graft.cli.CurateCli.runIncremental(
        spark, s"$work/b$b", state, nShards = 2,
        searchIndex = true, exactIndex = true, aggStats = true)
    }

    val queries = Seq((1, "spark"), (2, "data"), (3, "stream"))
      .toDF("query_id", "term")
    def topk() = {
      val (p, st) = graft.text.Bm25.loadSearchIndex(spark, s"$state/search")
      rows(graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 10))
    }
    def exactProbe() = {
      val probes = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          array_distinct(transform(
            graft.dedup.Dedup.wordShingles(col("text"), 3), x => md5(x))).as("sh"))
        .withColumn("doc_id", col("doc_id") + 500000L)
      rows(graft.dedup.SetSimJoin
        .searchIndex(spark, s"$state/exact", probes, "doc_id", "sh")
        .select("id_l", "id_r", "inter", "union_sz"))
    }
    def bandProbe() = {
      val idx = graft.dedup.Dedup.loadBandIndex(spark, s"$state/index")
      rows(graft.dedup.Dedup.dedupAgainstCorpus(idx,
        docs.limit(10).withColumn("doc_id", col("doc_id") + 600000L),
        "text", 0.7, maxBucket = None)
        .select(col("doc_id"), col("is_dup")))
    }
    val (t0, e0, b0) = (topk(), exactProbe(), bandProbe())
    val filesBefore = Seq("search/postings", "index/bands", "exact/postings")
      .map(l => l -> parquetFiles(s"$state/$l")).toMap

    val legs = graft.cli.CurateCli.runCompact(spark, state, targetBytes = 8L << 20)
    assert(legs.map(_._1).toSet == Set("search", "band", "exact"),
      s"every maintained index leg must compact: $legs")
    legs.foreach { case (leg, before, after) =>
      assert(after <= before, s"$leg grew: $before -> $after")
    }
    assert(parquetFiles(s"$state/search/postings") <
      filesBefore("search/postings"),
      "three append epochs' postings deltas must collapse")

    assert(topk() == t0, "compaction must not change BM25 serving")
    assert(exactProbe() == e0, "compaction must not change exact-index probes")
    assert(bandProbe() == b0, "compaction must not change band-index dedup")
    val fsck = graft.operators.Fsck.state(spark, state)
    assert(fsck.forall(_.ok), s"fsck after compact: ${fsck.filterNot(_.ok)}")

    // fixed point: a second compaction neither grows nor changes serving
    val legs2 = graft.cli.CurateCli.runCompact(spark, state, targetBytes = 8L << 20)
    legs2.foreach { case (leg, before, after) =>
      assert(after == before, s"$leg must be a compaction fixed point: $legs2")
    }
    assert(topk() == t0)
  }

  test("a compaction killed mid-swap recovers to the exact pre state; re-run converges") {
    import graft.text.Bm25
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def copyDir(src: String, dst: String): Unit =
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(src),
        fs, new org.apache.hadoop.fs.Path(dst), false, true,
        spark.sparkContext.hadoopConfiguration)
    val work = Files.createTempDirectory("compact_crash").toString
    val pre = s"$work/pre"
    Bm25.writeSearchIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", col("text"), pre)
    Bm25.appendSearchIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", col("text"), pre)
    val queries = Seq((1, "spark"), (2, "data")).toDF("query_id", "term")
    def topk(dir: String) = {
      val (p, st) = Bm25.loadSearchIndex(spark, dir)
      rows(Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 5))
    }
    val served = topk(pre)
    // a completed compaction, to source the staged/promoted pieces
    val post = s"$work/post"
    copyDir(pre, post)
    Bm25.compactSearchIndex(spark, post, 8L << 20)

    // fabricate the mid-swap kill: postings retired AND promoted, docs
    // retired but its promote never ran, stats still staged — the worst
    // interleaving (one leg swapped, two not)
    val crash = s"$work/crash"
    copyDir(pre, crash)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$crash.retired"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/postings"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/postings"))
    copyDir(s"$post/postings", s"$crash/postings")
    fs.rename(new org.apache.hadoop.fs.Path(s"$crash/docs"),
      new org.apache.hadoop.fs.Path(s"$crash.retired/docs"))
    copyDir(s"$post/docs", s"$crash/.swap-stage/docs")
    copyDir(s"$post/stats", s"$crash/.swap-stage/stats")
    val marker = fs.create(new org.apache.hadoop.fs.Path(
      s"$crash/_batches/_pending"), true)
    marker.write("77\npostings\ndocs\nstats".getBytes("UTF-8"))
    marker.close()

    // recovery rolls the torn compaction back whole; serving is the
    // exact pre-compaction index
    Bm25.recoverSearchIndex(spark, crash)
    assert(topk(crash) == served,
      "a torn compaction must roll back to the pre state")
    assert(rows(spark.read.parquet(s"$crash/docs")) ==
      rows(spark.read.parquet(s"$pre/docs")))
    // and the re-run converges to the compacted layout, still serving
    // identically
    val (b, a) = Bm25.compactSearchIndex(spark, crash, 8L << 20)
    assert(a < b)
    assert(topk(crash) == served)
    assert(graft.operators.Fsck.searchIndex(spark, crash).forall(_.ok))
  }

  test("compaction markers are ephemeral: repeated compactions do not grow _batches/") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val work = Files.createTempDirectory("compact_markers").toString
    val state = s"$work/state"
    (0 until 2).foreach { b =>
      docs.filter(col("doc_id") % 2 === b).write.parquet(s"$work/b$b")
      graft.cli.CurateCli.runIncremental(
        spark, s"$work/b$b", state, nShards = 2,
        searchIndex = true, exactIndex = true)
    }
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markers(store: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$state/$store/_batches")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).toSet
    }
    val before = Seq("search", "exact", "index").map(markers)
    // three compaction rounds: a scheduled maintenance verb must not
    // accumulate one applied-marker file per invocation (round-9 ADVICE —
    // the small-file healer was itself a small-file producer)
    (0 until 3).foreach { _ =>
      graft.cli.CurateCli.runCompact(spark, state, targetBytes = 8L << 20)
    }
    val after = Seq("search", "exact", "index").map(markers)
    assert(after == before,
      s"compaction must leave the _batches namespaces unchanged: $before -> $after")
  }

  test("auto-compaction cadence: appends past compactAt self-heal mid-incremental, serving identical") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val work = Files.createTempDirectory("compact_auto").toString
    val auto = s"$work/auto"     // compactAt = 3: the cadence trips
    val manual = s"$work/manual" // compactAt huge: fragments accrete
    (0 until 6).foreach { b =>
      docs.filter(col("doc_id") % 6 === b).write.parquet(s"$work/b$b")
      Seq(auto -> 3, manual -> 1000).foreach { case (state, at) =>
        graft.cli.CurateCli.runIncremental(
          spark, s"$work/b$b", state, nShards = 2, compactAt = at,
          searchIndex = true, exactIndex = true)
      }
    }
    // the cadence actually fired: the auto store's legs are healed while
    // the manual one carries one delta file set per epoch
    assert(parquetFiles(s"$auto/search/postings") <
      parquetFiles(s"$manual/search/postings"),
      "the compactAt threshold must have compacted the postings leg in-run")
    assert(parquetFiles(s"$auto/exact/postings") <
      parquetFiles(s"$manual/exact/postings"))

    // and serving is value-identical between the self-healed store and
    // the fragmented one — compaction is a layout operation
    val queries = Seq((1, "spark"), (2, "data"), (3, "stream"))
      .toDF("query_id", "term")
    def topk(state: String) = {
      val (p, st) = graft.text.Bm25.loadSearchIndex(spark, s"$state/search")
      rows(graft.text.Bm25.retrieveTopKIndexed(p, st, "doc_id", queries, topK = 10))
    }
    def exactProbe(state: String) = {
      val probes = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          array_distinct(transform(
            graft.dedup.Dedup.wordShingles(col("text"), 3), x => md5(x))).as("sh"))
        .withColumn("doc_id", col("doc_id") + 500000L)
      rows(graft.dedup.SetSimJoin
        .searchIndex(spark, s"$state/exact", probes, "doc_id", "sh")
        .select("id_l", "id_r", "inter", "union_sz"))
    }
    assert(topk(auto) == topk(manual),
      "auto-compaction mid-incremental must not change BM25 serving")
    assert(exactProbe(auto) == exactProbe(manual),
      "auto-compaction mid-incremental must not change exact-index probes")
    val fsck = graft.operators.Fsck.state(spark, auto)
    assert(fsck.forall(_.ok), s"fsck after auto-compaction: ${fsck.filterNot(_.ok)}")
  }

  test("ivf compaction: appended cluster deltas collapse; probes identical") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (cents, assigned) = graft.similarity.Ivf.build(
      e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", k = 4, iters = 2)
    val dir = Files.createTempDirectory("compact_ivf").toString + "/dense"
    graft.similarity.Ivf.writeIndex(cents, assigned, "vec_id", "embedding", dir)
    Seq(1, 2).foreach { m =>
      graft.similarity.Ivf.appendIndex(
        e.filter(col("vec_id") % 3 === m), "vec_id", "embedding", dir)
    }
    val qv = e.orderBy("vec_id").head().getSeq[Float](1).map(_.toDouble).toSeq
    def probe() = {
      val (c, a) = graft.similarity.Ivf.loadIndex(spark, dir)
      rows(graft.similarity.Ivf.search(a, c, "vec_id", "embedding", qv,
        k = 10, nprobe = 2).select(col("vec_id")))
    }
    val before = probe()
    val (fb, fa) = graft.similarity.Ivf.compactIndex(spark, dir, 8L << 20)
    assert(fa < fb, s"appended cluster files must collapse ($fb -> $fa)")
    assert(probe() == before, "compaction must not change IVF probes")
    assert(graft.operators.Fsck.denseIndex(spark, dir).forall(_.ok))
  }
}
