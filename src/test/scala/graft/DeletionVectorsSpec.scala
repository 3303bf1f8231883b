package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cli.CurateCli
import graft.operators.{AggStore, DeletionVectors, Fsck}

/** Logical erasure ([[graft.operators.DeletionVectors]]): the O(request)
  * Art. 17 fast path. The mask must hide the subject from every read
  * that goes through it WITHOUT touching the stores (scores keep the
  * unsettled statistics — the documented eventual-consistency window),
  * the settle verb must converge through every crash point onto exactly
  * the physical sweep's end state, and fsck must report the pending
  * debt until then.
  */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"dv_$tag").toString

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String) =
    fsOf(p).exists(new org.apache.hadoop.fs.Path(p))

  private def copyDir(src: String, dst: String): Unit = {
    val fs = fsOf(src)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(dst),
      false, spark.sparkContext.hadoopConfiguration)
  }

  private final case class Crash(at: String) extends RuntimeException(at)
  private def killAt(fp: String): String => Unit =
    at => if (at == fp) throw Crash(at)

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"), col("lang"), col("text"))

  /** One corpus+search+agg state directory, built once, copied per case. */
  private lazy val goldenState: String = {
    val work = tmp("golden")
    docs.write.parquet(s"$work/b0")
    val s = CurateCli.runIncremental(
      spark, s"$work/b0", s"$work/state", nShards = 2,
      searchIndex = true, aggStats = true)
    assert(s.auditOk)
    s"$work/state"
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet

  test("mask subtracts after scoring: masked ids gone, survivors keep scores and dense ranks") {
    val work = tmp("mask")
    val state = s"$work/state"
    copyDir(goldenState, state)
    val corpus = spark.read.parquet(s"$state/corpus")
    val masked = corpus.filter(col("doc_id") % 11 === 0).select(col("doc_id"))
    val nMasked = DeletionVectors.append(spark, state, masked)
    assert(nMasked == masked.count())

    // corpus surface
    val served = DeletionVectors.maskServing(spark, state, corpus)
    assert(ids(served).intersect(ids(masked)).isEmpty)
    assert(served.count() == corpus.count() - nMasked)

    // index surface: scores of the survivors are IDENTICAL to the
    // unmasked retrieval's (mask-after-score — the stats have not
    // settled), ranks re-densify over the retained candidates
    val (postings, stats) =
      graft.text.Bm25.loadSearchIndex(spark, s"$state/search")
    val queries = Seq(1 -> "spark", 2 -> "data").toDF("query_id", "term")
    val dv = DeletionVectors.load(spark, state)
    val big = 100000
    val unmasked = graft.text.Bm25
      .retrieveTopKIndexed(postings, stats, "doc_id", queries, big)
    val withMask = graft.text.Bm25
      .retrieveTopKIndexed(postings, stats, "doc_id", queries, big,
        maskIds = dv)
    assert(ids(withMask.select("doc_id")).intersect(ids(masked)).isEmpty)
    val expect = unmasked
      .join(broadcast(masked), Seq("doc_id"), "left_anti")
      .select(col("query_id"), col("doc_id"), col("score"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = withMask
      .select(col("query_id"), col("doc_id"), col("score"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expect, "survivor (query, doc) -> score must be unchanged")
    val ranks = withMask.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn"))
      .collect()
    assert(ranks.forall(r => r.getLong(1) == r.getAs[Number]("mx").longValue()
      && r.getAs[Number]("mn").longValue() == 1L),
      "ranks must re-densify to 1..n per query")
  }

  test("append is idempotent and a torn vector is invisible") {
    val work = tmp("idem")
    val state = s"$work/state"
    copyDir(goldenState, state)
    val keys = spark.read.parquet(s"$state/corpus")
      .filter(col("doc_id") % 13 === 0).select(col("doc_id"))
    DeletionVectors.append(spark, state, keys)
    val (_, _, stamp0) = DeletionVectors.pending(spark, state)
    Thread.sleep(5)
    DeletionVectors.append(spark, state, keys) // replay: same directory
    assert(DeletionVectors.liveDirs(spark, state).size == 1)
    val (dirs, n, stamp) = DeletionVectors.pending(spark, state)
    assert(dirs == 1 && n == keys.count() && stamp.nonEmpty)
    assert(stamp == stamp0,
      "a redelivered request must not make the debt look younger")
    // a torn append (no _SUCCESS) must be invisible to load and pending
    val torn = s"$state/.dv/dv=deadbeef"
    keys.limit(2).withColumn("_stamp", lit(0L))
      .write.mode("overwrite").parquet(torn)
    fsOf(torn).delete(new org.apache.hadoop.fs.Path(s"$torn/_SUCCESS"), false)
    assert(DeletionVectors.liveDirs(spark, state).size == 1)
    assert(DeletionVectors.pending(spark, state)._1 == 1)
  }

  test("settle drives the physical sweep: stores purged, vectors retired, fsck settled") {
    val work = tmp("settle")
    val state = s"$work/state"
    copyDir(goldenState, state)
    val corpus = spark.read.parquet(s"$state/corpus")
    val keys = corpus.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
    keys.write.parquet(s"$work/keys")
    CurateCli.runEraseLogical(spark, s"$work/keys", state)

    // fsck reports the debt (not-settled) while serving stays masked
    val before = Fsck.dvDebt(spark, state)
    assert(before.exists(c => c.check == "no_settle_debt" && !c.ok))
    assert(before.exists(c => c.check == "no_pending_settle" && c.ok))

    val summary = CurateCli.runEraseSettle(spark, state)
    assert(summary.nonEmpty && summary.get.nKeys ==
      spark.read.parquet(s"$work/keys").count())
    // physical end state: corpus purged, agg exact, vectors gone
    val retained = spark.read.parquet(s"$state/corpus")
    assert(retained.join(
      spark.read.parquet(s"$work/keys"), Seq("doc_id"), "left_semi").isEmpty)
    val aggServe = AggStore.serve(spark, s"$state/agg")
      .select("source", "cnt", "sum").collect().map(_.toSeq).sortBy(_.toString)
    val oneShot = AggStore.aggregate(retained, Seq("source"),
      col("n_tokens").cast("long"))
      .select("source", "cnt", "sum").collect().map(_.toSeq).sortBy(_.toString)
    assert(aggServe.toSeq == oneShot.toSeq)
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    assert(!exists(s"$state/.settle-keys"))
    assert(Fsck.dvDebt(spark, state).forall(_.ok))
    assert(Fsck.state(spark, state).forall(_.ok))
    // nothing pending: a second settle is a no-op
    assert(CurateCli.runEraseSettle(spark, state).isEmpty)
  }

  test("settle killed at EVERY failpoint converges on replay; a post-snapshot vector survives") {
    Seq("settle-keys-captured", "erase-complete", "vectors-retired")
      .foreach { fp =>
        val work = tmp(s"kill_$fp")
        val state = s"$work/state"
        copyDir(goldenState, state)
        spark.read.parquet(s"$state/corpus")
          .filter(col("doc_id") % 7 === 0).select(col("doc_id"))
          .write.parquet(s"$work/keys")
        CurateCli.runEraseLogical(spark, s"$work/keys", state)
        assert(intercept[Crash] {
          CurateCli.runEraseSettle(spark, state, failpoint = killAt(fp))
        }.at == fp)
        // a crashed settle is auditable debt until healed
        assert(Fsck.dvDebt(spark, state).exists(!_.ok),
          s"crash at $fp: fsck must report the unsettled state")
        // a NEW erasure request arriving mid-crash must not be lost —
        // derived from a FRESH corpus read: at the later failpoints the
        // physical sweep already rewrote the corpus files, so a plan
        // captured before the crash would re-scan purged files
        spark.read.parquet(s"$state/corpus")
          .filter(col("doc_id") % 7 === 3).select(col("doc_id"))
          .write.parquet(s"$work/late_keys")
        CurateCli.runEraseLogical(spark, s"$work/late_keys", state)
        // replay heals: the snapshot's sweep completes and its vectors
        // retire; the post-snapshot vector still masks and still pends
        CurateCli.runEraseSettle(spark, state)
        val retained = spark.read.parquet(s"$state/corpus")
        assert(retained.join(spark.read.parquet(s"$work/keys"),
          Seq("doc_id"), "left_semi").isEmpty,
          s"crash at $fp: replay must purge the snapshot's keys")
        assert(!exists(s"$state/.settle-keys"), s"crash at $fp")
        // the snapshot is durable BEFORE every failpoint, so the replay
        // resumes the snapshot's sweep and the post-snapshot vector
        // survives it, still masking its ids
        val late = spark.read.parquet(s"$work/late_keys")
        assert(DeletionVectors.pending(spark, state)._1 >= 1,
          s"crash at $fp: the post-snapshot vector must survive")
        val served = DeletionVectors.maskServing(spark, state,
          spark.read.parquet(s"$state/corpus"))
        assert(served.join(late, Seq("doc_id"), "left_semi").isEmpty,
          s"crash at $fp: the late vector must still mask")
        // and the NEXT settle purges it physically
        CurateCli.runEraseSettle(spark, state)
        assert(spark.read.parquet(s"$state/corpus")
          .join(late, Seq("doc_id"), "left_semi").isEmpty)
        assert(DeletionVectors.pending(spark, state)._1 == 0)
        assert(Fsck.state(spark, state).forall(_.ok), s"crash at $fp")
      }
  }

  test("settle killed INSIDE the physical sweep converges on replay") {
    // the settle failpoint forwards into runErase, so a death between
    // the sweep's own legs leaves .settle-keys AND .erase-facts pending;
    // the replay resumes the SAME snapshot into the SAME sweep (content
    // ids match) and runErase's convergence machinery takes it home
    val work = tmp("kill_inner")
    val state = s"$work/state"
    copyDir(goldenState, state)
    spark.read.parquet(s"$state/corpus")
      .filter(col("doc_id") % 7 === 0).select(col("doc_id"))
      .write.parquet(s"$work/keys")
    CurateCli.runEraseLogical(spark, s"$work/keys", state)
    assert(intercept[Crash] {
      CurateCli.runEraseSettle(spark, state, failpoint = killAt("corpus-purged"))
    }.at == "corpus-purged")
    assert(exists(s"$state/.settle-keys") && exists(s"$state/.erase-facts"),
      "both captures must be pending after the in-sweep crash")
    CurateCli.runEraseSettle(spark, state)
    val keys = spark.read.parquet(s"$work/keys")
    assert(spark.read.parquet(s"$state/corpus")
      .join(keys, Seq("doc_id"), "left_semi").isEmpty)
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    assert(!exists(s"$state/.settle-keys") && !exists(s"$state/.erase-facts"))
    val agg = AggStore.serve(spark, s"$state/agg")
      .select("source", "cnt").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val oneShot = AggStore.aggregate(
      spark.read.parquet(s"$state/corpus"), Seq("source"),
      col("n_tokens").cast("long"))
      .select("source", "cnt").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(agg == oneShot, "agg must equal the one-shot over the retained corpus")
    assert(Fsck.state(spark, state).forall(_.ok))
  }

  test("subtract retires only covered keys and never loses a mask mid-crash") {
    val work = tmp("subtract")
    val state = s"$work/state"
    copyDir(goldenState, state)
    val corpus = spark.read.parquet(s"$state/corpus")
    val a = corpus.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val b = corpus.filter(col("doc_id") % 5 === 1).select(col("doc_id"))
    DeletionVectors.append(spark, state, a)
    DeletionVectors.append(spark, state, b)
    // settle only a's keys: a's vector deletes whole, b's is untouched
    DeletionVectors.subtract(spark, state, a)
    val (dirs, n, _) = DeletionVectors.pending(spark, state)
    assert(dirs == 1 && n == b.count())
    // partial coverage: retire half of b — the remainder must keep
    // masking (rewrite-then-delete, never delete-then-rewrite)
    val half = b.orderBy(col("doc_id")).limit((b.count() / 2).toInt)
    DeletionVectors.subtract(spark, state, half)
    val remaining = DeletionVectors.load(spark, state).get
    assert(ids(remaining) == ids(b) -- ids(half))
  }

  test("the dense serve path takes the mask: IVF search excludes masked ids, k results survive") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (centroids, assigned) =
      graft.similarity.Ivf.build(emb, "vec_id", "embedding", k = 4, iters = 2)
    val q = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).head().getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
    val unmasked = graft.similarity.Ivf
      .search(assigned, centroids, "vec_id", "embedding", q, k = 10, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // mask the top 3 unmasked hits: the masked serve must return the
    // SAME ranking with those ids removed and k still filled
    val maskSet = unmasked.take(3).map(_._1).toSet
    val mask = maskSet.toSeq.toDF("vec_id")
    val masked = graft.similarity.Ivf
      .search(assigned, centroids, "vec_id", "embedding", q, k = 10,
        nprobe = 4, maskIds = Some(mask))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(masked.length == 10, "k results must survive the mask")
    assert(!masked.exists(m => maskSet.contains(m._1)))
    assert(masked.map(_._1).take(7).toSeq ==
      unmasked.filterNot(m => maskSet.contains(m._1)).map(_._1).take(7).toSeq,
      "survivors keep their relative order and scores")
    // the batched path takes the same mask
    val qdf = Seq((1, q)).toDF("qid", "qvec")
    val multi = graft.similarity.Ivf
      .searchAll(assigned, centroids, "vec_id", "embedding", qdf,
        "qid", "qvec", k = 10, nprobe = 4, maskIds = Some(mask))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(multi.intersect(maskSet).isEmpty && multi.size == 10)
  }

  test("Art. 15 access discloses a pending logical erasure") {
    val work = tmp("access")
    val state = s"$work/state"
    copyDir(goldenState, state)
    spark.read.parquet(s"$state/corpus")
      .filter(col("doc_id") % 13 === 1).select(col("doc_id"))
      .write.parquet(s"$work/keys")
    CurateCli.runEraseLogical(spark, s"$work/keys", state)
    val s1 = CurateCli.runAccess(spark, s"$work/keys", state, s"$work/report")
    assert(s1.nMaskedPending == s1.nKeys,
      "every requested subject is pending logical erasure")
    assert(s1.nCorpus > 0, "the rows are still physically present pre-settle")
    CurateCli.runEraseSettle(spark, state)
    val s2 = CurateCli.runAccess(spark, s"$work/keys", state, s"$work/report2")
    assert(s2.nMaskedPending == 0L && s2.nCorpus == 0L,
      "post-settle: no pending mask, no rows")
  }

  test("the mask hint is size-aware: broadcast below the byte threshold, shuffle join above") {
    val work = tmp("hint")
    docs.limit(150).select(col("doc_id"), col("source"))
      .write.parquet(s"$work/data")
    DeletionVectors.append(spark, work,
      docs.limit(150).filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    val data = spark.read.parquet(s"$work/data")
    def plan(): String =
      DeletionVectors.maskServing(spark, work, data)
        .queryExecution.sparkPlan.toString
    def served(): Set[Long] =
      DeletionVectors.maskServing(spark, work, data)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // isolate the HINT's effect: with auto-broadcast off, only the
    // explicit hint can produce a broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // request-sized vector, default threshold: the hint forces broadcast
      assert(plan().contains("BroadcastHashJoin"),
        s"small mask must broadcast:\n${plan()}")
      val small = served()
      // force the "unbounded unsettled backlog" side: the hint is dropped
      // and the anti-join degrades to a shuffle join instead of a forced
      // driver-side broadcast
      spark.conf.set("graft.dv.broadcastMaxBytes", "0")
      val p = plan()
      assert(!p.contains("BroadcastHashJoin"),
        s"oversized mask must not force a broadcast:\n$p")
      assert(served() == small, "both sides of the switch serve identically")
    } finally {
      spark.conf.unset("graft.dv.broadcastMaxBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("subject-keyed erase verbs resolve through the owner mapping and converge") {
    val work = tmp("bysubject")
    val state = s"$work/state"
    copyDir(goldenState, state)
    val corpus = spark.read.parquet(s"$state/corpus")
    // owner mapping: 101 subjects, each owning many documents
    corpus.select((col("doc_id") % 101).as("subject_id"), col("doc_id"))
      .write.parquet(s"$work/mapping")
    Seq(7L, 13L).toDF("subject_id").write.parquet(s"$work/subjects")
    // materialized BEFORE the sweep: the physical erase rewrites the
    // corpus files, so a lazily-planned frame over them would re-scan
    // purged paths (the golden-state specs' fresh-read rule)
    val expectedIds = ids(corpus
      .filter(col("doc_id") % 101 === 7 || col("doc_id") % 101 === 13)
      .select(col("doc_id")))
    // logical: one vector covering every owned document
    val (n, _) = CurateCli.runEraseLogicalBySubject(
      spark, s"$work/subjects", s"$work/mapping", state)
    assert(n == expectedIds.size, "the vector must cover all owned docs")
    assert(ids(DeletionVectors.maskServing(spark, state, corpus)
      .select(col("doc_id"))).intersect(expectedIds).isEmpty)
    // Art. 15 by subject rides the same resolution: the disclosure
    // covers every owned document, all pending logical erasure
    val acc = CurateCli.runAccessBySubject(spark, s"$work/subjects",
      s"$work/mapping", state, s"$work/report")
    assert(acc.nKeys == expectedIds.size &&
      acc.nMaskedPending == expectedIds.size)
    // physical: a crash between resolve and sweep heals by replay (the
    // resolve re-lands the same content-addressed capture)
    assert(intercept[Crash] {
      CurateCli.runEraseBySubject(spark, s"$work/subjects",
        s"$work/mapping", state, failpoint = killAt("subject-resolved"))
    }.at == "subject-resolved")
    CurateCli.runEraseBySubject(
      spark, s"$work/subjects", s"$work/mapping", state)
    assert(ids(spark.read.parquet(s"$state/corpus").select(col("doc_id")))
      .intersect(expectedIds).isEmpty,
      "every document the subjects own must be physically gone")
    // settle retires the now-vacuous vector through the usual machinery
    CurateCli.runEraseSettle(spark, state)
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    assert(Fsck.state(spark, state).forall(_.ok))
  }

  test("vector-tree compaction: masks byte-identical, min stamps preserved, replays converge") {
    // VERDICT r11: nothing merged a tree's many small vectors — a
    // long-lived deployment with ongoing withdrawals grew dv=* dirs
    // without bound. compact merges each tree (global + per purpose)
    // into one vector, preserving the per-key MIN stamp (debt must not
    // look younger than its oldest capture).
    val work = tmp("compact")
    val data = docs.limit(300).select(col("doc_id"), col("source"))
    data.write.parquet(s"$work/data")
    // three overlapping global vectors + two purposes with two vectors
    (0 until 3).foreach { i =>
      DeletionVectors.append(spark, work,
        data.filter(col("doc_id") % 7 === i).select(col("doc_id")))
    }
    Seq("training", "ads").foreach { p =>
      (3 until 5).foreach { i =>
        DeletionVectors.append(spark, work,
          data.filter(col("doc_id") % 7 === i).select(col("doc_id")),
          purpose = Some(p))
      }
    }
    val beforeGlobal = ids(DeletionVectors.maskServing(spark, work,
      spark.read.parquet(s"$work/data")))
    val beforeTraining = ids(DeletionVectors.maskServing(spark, work,
      spark.read.parquet(s"$work/data"), purpose = Some("training")))
    val (dirsB, keysB, stampB) = DeletionVectors.pending(spark, work)
    assert(dirsB == 3)
    val censusB = DeletionVectors.pendingPurposeMasks(spark, work)
    assert(censusB.map(c => (c._1, c._2)).toSet ==
      Set(("training", 2), ("ads", 2)))

    val trees = CurateCli.runCompactVectors(spark, work)
    assert(trees.toSet == Set(("global", 3, 1),
      ("purpose=training", 2, 1), ("purpose=ads", 2, 1)))
    // mask results byte-identical; key census unchanged; the oldest
    // capture stamp survives the merge
    assert(ids(DeletionVectors.maskServing(spark, work,
      spark.read.parquet(s"$work/data"))) == beforeGlobal)
    assert(ids(DeletionVectors.maskServing(spark, work,
      spark.read.parquet(s"$work/data"), purpose = Some("training"))) ==
      beforeTraining)
    val (dirsA, keysA, stampA) = DeletionVectors.pending(spark, work)
    assert(dirsA == 1 && keysA == keysB && stampA == stampB,
      "compaction must preserve keys and the oldest debt stamp")
    assert(DeletionVectors.pendingPurposeMasks(spark, work)
      .map(c => (c._1, c._2, c._3)).toSet ==
      censusB.map(c => (c._1, 1, c._3)).toSet)
    // a second run is a no-op per tree (already one vector each)
    assert(CurateCli.runCompactVectors(spark, work).toSet ==
      Set(("global", 1, 1), ("purpose=training", 1, 1),
        ("purpose=ads", 1, 1)))
    // a promote that crashed before retiring its sources: re-add a
    // subset vector next to the compacted union — the replay recognizes
    // its own union (content-verified), retires the leftover, and the
    // mask is unchanged
    DeletionVectors.append(spark, work,
      data.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
    assert(DeletionVectors.pending(spark, work)._1 == 2)
    val again = CurateCli.runCompactVectors(spark, work)
    assert(again.contains(("global", 2, 1)))
    assert(ids(DeletionVectors.maskServing(spark, work,
      spark.read.parquet(s"$work/data"))) == beforeGlobal)
    assert(DeletionVectors.pending(spark, work)._2 == keysB)
    // the erase-settle path still retires through a compacted tree
    // (keys snapshotted durably first — the runEraseSettle contract: a
    // lazy frame reading the vectors must not feed their own deletion)
    DeletionVectors.loadGlobal(spark, work).get
      .write.mode("overwrite").parquet(s"$work/settled")
    DeletionVectors.subtract(spark, work,
      spark.read.parquet(s"$work/settled"))
    assert(DeletionVectors.pending(spark, work)._1 == 0)
  }

  test("compaction killed at every failpoint never under-masks and converges on replay") {
    // the crash-safety claim is a protocol argument ("over-masking only");
    // this matrix pins it: at each kill point the serve mask must be a
    // SUPERSET-or-equal of the true mask (erasure must never leak), and
    // the replay must land on the compacted end state byte-identically
    Seq("staged", "promoted").foreach { fp =>
      val work = tmp(s"ccrash_$fp")
      val data = docs.limit(200).select(col("doc_id"), col("source"))
      data.write.parquet(s"$work/data")
      (0 until 3).foreach { i =>
        DeletionVectors.append(spark, work,
          data.filter(col("doc_id") % 5 === i).select(col("doc_id")))
      }
      val trueMask = ids(spark.read.parquet(s"$work/data")
        .filter(col("doc_id") % 5 <= 2))
      def servedNow: Set[Long] = ids(DeletionVectors.maskServing(spark, work,
        spark.read.parquet(s"$work/data")))
      val full = ids(spark.read.parquet(s"$work/data"))
      assert(servedNow == full -- trueMask)
      assert(intercept[Crash] {
        DeletionVectors.compact(spark, work, failpoint = killAt(fp))
      }.at == fp)
      // mid-crash: whatever is live must mask AT LEAST the true mask
      assert((full -- servedNow).forall(trueMask.contains) &&
        trueMask.forall(id => !servedNow.contains(id)),
        s"kill at '$fp' must never serve a masked id")
      // replay converges: one vector, same mask, same key census
      val again = CurateCli.runCompactVectors(spark, work)
      assert(again.head._3 == 1)
      assert(servedNow == full -- trueMask)
      assert(DeletionVectors.pending(spark, work)._1 == 1)
      assert(DeletionVectors.pending(spark, work)._2 == trueMask.size)
    }
  }

  test("pending load is ONE scan: mask job count is independent of the vector count") {
    val work1 = tmp("scan1")
    val work4 = tmp("scan4")
    Seq(work1 -> 1, work4 -> 4).foreach { case (w, nv) =>
      docs.limit(200).select(col("doc_id"), col("source"))
        .write.parquet(s"$w/data")
      (0 until nv).foreach { i =>
        DeletionVectors.append(spark, w,
          docs.filter(col("doc_id") % 20 === i).select(col("doc_id")))
      }
    }
    def jobsIn(group: String)(body: => Unit): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try body finally sc.clearJobGroup()
      org.apache.spark.GraftListenerBus.waitUntilEmpty(sc)
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    def serve(w: String): Unit = {
      val out = DeletionVectors.maskServing(spark, w,
        spark.read.parquet(s"$w/data"))
      assert(out.count() > 0)
    }
    serve(work1); serve(work4) // warm footer/schema paths
    val j1 = jobsIn("dv-serve-1")(serve(work1))
    val j4 = jobsIn("dv-serve-4")(serve(work4))
    assert(j4 == j1,
      s"masked serve must not scale jobs with pending vectors ($j1 vs $j4)")
  }

  test("compaction cadence: appending verbs keep the vector trees bounded under a steady stream") {
    // VERDICT r12 ask #3: compact-vectors was manual-only — an unattended
    // deployment with a steady consent stream grows dv=* directories
    // until an operator notices the census. The appending verbs now
    // auto-compact a tree whose live count reaches graft.dv.compactAt,
    // under the state lease they already hold.
    import graft.policy.Consent
    spark.conf.set("graft.dv.compactAt", "3")
    try {
      val work = tmp("cadence")
      val state = s"$work/state"
      val consent = s"$work/consent"
      val subjects = (1L to 6L)
      Consent.init(spark, consent, subjects.toDF("subject_id")
        .withColumn("purpose", lit("training"))
        .withColumn("granted", lit(true))
        .withColumn("updated_at", lit(1L)))
      // six sequential one-subject withdrawals: each appends a distinct
      // purpose vector; the tree must never hold compactAt live vectors
      // after a verb returns, and every mask must survive the merges
      subjects.zipWithIndex.foreach { case (id, i) =>
        Consent.withdraw(spark, consent, Seq(id).toDF("subject_id"),
          "training", updatedAt = 2L + i, stateDir = Some(state))
        val (_, dirs, _) = DeletionVectors
          .pendingPurposeMasks(spark, state).head
        assert(dirs < 3,
          s"after withdrawal ${i + 1}: $dirs live vectors — cadence missed")
      }
      // two compactions ran (at counts 3 and 3 again); the final state is
      // the post-compact vector plus the sixth append, never >= 3
      val masks = DeletionVectors.pendingPurposeMasks(spark, state)
      assert(masks.map(m => (m._1, m._3)) == Seq(("training", 6L)),
        s"all six masks must survive the merges: $masks")
      assert(masks.head._2 < 3)
      // the GLOBAL tree gets the same cadence through erase-logical
      (10L to 12L).foreach { id =>
        Seq(id).toDF("doc_id").write.mode("overwrite")
          .parquet(s"$work/keys_$id")
        CurateCli.runEraseLogical(spark, s"$work/keys_$id", state)
      }
      val (gDirs, gKeys, _) = DeletionVectors.pending(spark, state)
      assert(gDirs == 1 && gKeys == 3L,
        s"global tree must have auto-compacted: $gDirs dirs, $gKeys keys")
    } finally spark.conf.unset("graft.dv.compactAt")
  }
}
