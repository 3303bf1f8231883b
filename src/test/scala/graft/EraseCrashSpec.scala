package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cli.CurateCli
import graft.operators.AggStore

/** Crash convergence of the data-subject-rights sweeps (the round-8/9
  * verdict hazards): an erase sweep killed between ANY two legs must
  * converge when re-run with the same keys file — in particular the agg
  * leg must NOT re-capture the subject's facts from the already-purged
  * corpus (which finds zero rows, subtracts nothing, and serves the
  * erased subject's stats forever) — and an erasure interleaved with a
  * CRASHED rectification must neither keep the subject's
  * pre-rectification facts on disk nor let the later heal resurrect
  * them into the agg store.
  */
class EraseCrashSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"erasecrash_$tag").toString

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

  private def aggRows(df: DataFrame): Seq[Seq[Any]] =
    df.select("source", "cnt", "sum", "min", "max")
      .collect().map(_.toSeq.toIndexedSeq).sortBy(_.toString).toSeq

  private def corpusOneShot(state: String): DataFrame =
    AggStore.aggregate(
      spark.read.parquet(s"$state/corpus"), Seq("source"),
      col("n_tokens").cast("long"))

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"), col("lang"), col("text"))

  /** One corpus+agg state directory, built once and copied per case. */
  private lazy val goldenState: String = {
    val work = tmp("golden")
    docs.write.parquet(s"$work/b0")
    val s = CurateCli.runIncremental(
      spark, s"$work/b0", s"$work/state", nShards = 2, aggStats = true)
    assert(s.auditOk)
    s"$work/state"
  }

  test("erase sweep killed at EVERY failpoint converges on replay; agg stays exact") {
    Seq("facts-captured", "rectify-facts-purged", "corpus-purged", "agg-erased")
      .foreach { fp =>
        val work = tmp(s"kill_$fp")
        val state = s"$work/state"
        copyDir(goldenState, state)
        spark.read.parquet(s"$state/corpus")
          .select(col("doc_id")).filter(col("doc_id") % 5 === 0)
          .write.parquet(s"$work/keys")
        // read back from the keys FILE: a lazy plan over the corpus would
        // re-scan the purged files after the sweep rewrites them
        val keys = spark.read.parquet(s"$work/keys")
        assert(intercept[Crash] {
          CurateCli.runErase(spark, s"$work/keys", state,
            failpoint = killAt(fp))
        }.at == fp)
        // the replay, same keys file, must converge to the one-sweep result
        CurateCli.runErase(spark, s"$work/keys", state)
        val retained = spark.read.parquet(s"$state/corpus")
        assert(retained.join(keys, Seq("doc_id"), "left_semi").isEmpty,
          s"crash at $fp: replay must purge the corpus")
        assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
          aggRows(corpusOneShot(state)),
          s"crash at $fp: replayed agg store must equal the one-shot " +
            "groupBy over the retained corpus")
        assert(!exists(s"$state/.erase-facts"),
          s"crash at $fp: the facts capture must be gone at sweep completion")
        val fsck = graft.operators.Fsck.state(spark, state)
        assert(fsck.filter(_.component == "agg").forall(_.ok),
          s"crash at $fp: fsck must audit the agg leg clean: " +
            fsck.filterNot(_.ok).mkString("; "))
      }
  }

  test("a DIFFERENT erasure is refused while a crashed sweep's facts are pending") {
    val work = tmp("refuse")
    val state = s"$work/state"
    copyDir(goldenState, state)
    spark.read.parquet(s"$state/corpus").select(col("doc_id"))
      .filter(col("doc_id") % 5 === 0).write.parquet(s"$work/keys")
    intercept[Crash] {
      CurateCli.runErase(spark, s"$work/keys", state,
        failpoint = killAt("corpus-purged"))
    }
    spark.read.parquet(s"$state/corpus").select(col("doc_id"))
      .limit(1).write.parquet(s"$work/other_keys")
    val e = intercept[IllegalArgumentException] {
      CurateCli.runErase(spark, s"$work/other_keys", state)
    }
    assert(e.getMessage.contains("re-run THAT sweep"))
    // healing the crashed sweep unblocks
    CurateCli.runErase(spark, s"$work/keys", state)
    CurateCli.runErase(spark, s"$work/other_keys", state)
    assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
      aggRows(corpusOneShot(state)))
  }

  test("rectify-crash -> erase -> rectify-heal equals erase+rectify on a twin, at every rectify failpoint") {
    Seq("facts-captured", "corpus-updated", "agg-updated").foreach { fp =>
      val work = tmp(s"ixl_$fp")
      val a = s"$work/a"
      val b = s"$work/b"
      copyDir(goldenState, a)
      copyDir(goldenState, b)
      // two admitted subjects, same source where possible: x is erased
      // mid-rectification, y only rectified
      val ids = spark.read.parquet(s"$a/corpus").select(col("doc_id"))
        .orderBy(col("doc_id")).limit(2).as[Long].collect()
      val (x, y) = (ids(0), ids(1))
      Seq((x, "corrected text for the erased subject spark spark"),
        (y, "corrected text for the retained subject stream stream"))
        .toDF("doc_id", "text")
        .write.parquet(s"$work/corrected")
      Seq(x).toDF("doc_id").write.parquet(s"$work/keys")

      // A: the rectification crashes mid-sweep, leaving pending facts
      assert(intercept[Crash] {
        CurateCli.runRectify(spark, s"$work/corrected", a,
          failpoint = killAt(fp))
      }.at == fp)
      assert(exists(s"$a/.rectify-facts/_SUCCESS"))
      // the erasure completes DURING the pending rectification
      val es = CurateCli.runErase(spark, s"$work/keys", a)
      assert(es.nCorpus <= 1L)
      // the subject's pre-rectification facts are gone from the capture
      // (personal-data removal), the other subject's survive for the heal
      val pending = spark.read.parquet(s"$a/.rectify-facts")
      assert(pending.filter(col("doc_id") === x).isEmpty,
        s"$fp: erased subject must be purged from the pending capture")
      assert(pending.filter(col("doc_id") === y).count() == 1L)
      // heal the crashed rectification (same corrected file)
      CurateCli.runRectify(spark, s"$work/corrected", a)
      assert(!exists(s"$a/.rectify-facts"))

      // B (twin): erase first, then a clean rectification
      CurateCli.runErase(spark, s"$work/keys", b)
      CurateCli.runRectify(spark, s"$work/corrected", b)

      def corpusRows(s: String) = spark.read.parquet(s"$s/corpus")
        .collect().map(_.toString).toSet
      assert(corpusRows(a) == corpusRows(b),
        s"$fp: interleaved corpus must equal the erase-then-rectify twin")
      assert(aggRows(AggStore.serve(spark, s"$a/agg")) ==
        aggRows(AggStore.serve(spark, s"$b/agg")),
        s"$fp: interleaved agg store must equal the erase-then-rectify twin")
      assert(aggRows(AggStore.serve(spark, s"$a/agg")) ==
        aggRows(corpusOneShot(a)),
        s"$fp: final agg store must equal the one-shot over the final corpus")
      assert(spark.read.parquet(s"$a/corpus")
        .filter(col("doc_id") === x).isEmpty)
    }
  }

  test("re-erasing the SAME key set after re-admission subtracts again (nonce-stamped capture)") {
    // the round-9 ADVICE high: with the agg-leg commit id derived purely
    // from the key set's CONTENT, a second erasure of the same keys —
    // after the subject's documents were re-admitted, a flow the
    // rectifySink scaladoc explicitly supports — silently no-ops
    // AggStore.erase on the first sweep's never-removed applied marker:
    // corpus and indexes purge, but the agg store serves the re-admitted
    // subject's stats forever while the sweep reports success. The
    // capture's fresh _nonce (reused by crash replays, new per sweep)
    // closes it.
    val work = tmp("readmit")
    val state = s"$work/state"
    copyDir(goldenState, state)
    spark.read.parquet(s"$state/corpus").select(col("doc_id"))
      .filter(col("doc_id") % 5 === 0).write.parquet(s"$work/keys")
    CurateCli.runErase(spark, s"$work/keys", state)
    assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
      aggRows(corpusOneShot(state)))

    // re-admit the erased subjects through the standard incremental path
    // (their band-index rows were erased too, so they are fresh again)
    docs.join(spark.read.parquet(s"$work/keys"), Seq("doc_id"), "left_semi")
      .write.parquet(s"$work/b_readmit")
    val s2 = CurateCli.runIncremental(
      spark, s"$work/b_readmit", state, nShards = 2, aggStats = true)
    assert(s2.nFresh > 0, "the erased documents must re-admit")
    assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
      aggRows(corpusOneShot(state)))

    // the SAME keys file again: the second sweep's agg subtraction must
    // APPLY, not no-op on the first sweep's marker
    CurateCli.runErase(spark, s"$work/keys", state)
    assert(spark.read.parquet(s"$state/corpus")
      .join(spark.read.parquet(s"$work/keys"), Seq("doc_id"), "left_semi")
      .isEmpty)
    assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
      aggRows(corpusOneShot(state)),
      "the re-admitted subject's stats must not survive the second sweep")
  }

  test("retention resumes a crashed sweep instead of abandoning its keys") {
    // simulate the crash window AFTER the expired batch directories were
    // dropped but BEFORE the erase sweep ran: the keys capture is the
    // only surviving record of what must be forgotten
    val work = tmp("retres")
    val state = s"$work/state"
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$work/b0")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$work/b1")
    Seq("b0", "b1").foreach { bn =>
      CurateCli.runIncremental(spark, s"$work/$bn", state, nShards = 2,
        aggStats = true)
    }
    val fs = fsOf(state)
    val batch0 = spark.read.parquet(s"$state/shards/batch=0")
      .select(col("doc_id"))
    batch0.write.parquet(s"$state/.retention-keys")
    val n0 = batch0.count()
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/shards/batch=0"), true)
    // the replayed retention finds nothing newly expired (keep=2 of the 1
    // remaining batch) but MUST resume the pending sweep first
    CurateCli.runRetention(spark, state, keepBatches = 2)
    assert(!exists(s"$state/.retention-keys"))
    val corpus = spark.read.parquet(s"$state/corpus")
    assert(corpus.filter(col("doc_id") % 2 === 0).isEmpty,
      "resumed retention must erase the dropped batch's documents")
    assert(corpus.count() > 0)
    assert(aggRows(AggStore.serve(spark, s"$state/agg")) ==
      aggRows(corpusOneShot(state)))
  }
}
