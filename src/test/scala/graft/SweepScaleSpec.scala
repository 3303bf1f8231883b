package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The round-9 verdict's one remaining linear-in-batches cost: sweep and
  * audit SPARK JOB COUNT over the per-batch shard tree must be
  * independent of how many batch directories accumulated. A year of
  * daily epochs must not mean ~365 sequential probe jobs per erase sweep
  * or a 365-leg union in fsck — one partitioned scan finds the touched
  * directories ([[graft.operators.Shards.touchedBatchDirs]] /
  * [[graft.operators.Shards.readBatches]]), and the rewrites then touch
  * only those. Driver-side FILE LISTINGS may still scale with the batch
  * count (bounded metadata, no data); jobs must not.
  */
class SweepScaleSpec extends SparkSpec {
  import graft.operators.Shards

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"), col("text"))

  private def jobsIn(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel = false)
    try body finally sc.clearJobGroup()
    org.apache.spark.GraftListenerBus.waitUntilEmpty(sc)
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  /** A state dir whose shards tree splits the SAME corpus into
    * `nBatches` directories, so only the directory COUNT varies between
    * compared runs — identical total data, identical touched set (the
    * keys all live in batch 0).
    */
  private def buildState(nBatches: Int): (String, String) = {
    val work = Files.createTempDirectory(s"sweepscale_$nBatches").toString
    val state = s"$work/state"
    (0 until nBatches).foreach { b =>
      Shards.write(
        docs.filter(pmod(col("doc_id"), lit(nBatches)) === b),
        "doc_id", s"$state/shards/batch=$b", 2, orderCols = Seq("source"))
    }
    // keys: a few subjects from batch 0 ONLY — the touched set is one
    // directory regardless of how many directories exist
    docs.filter(pmod(col("doc_id"), lit(nBatches)) === 0)
      .select(col("doc_id")).orderBy(col("doc_id")).limit(3)
      .write.parquet(s"$work/keys")
    (state, s"$work/keys")
  }

  test("fsck shards audit is ONE scan: job count equal at 2 and 8 batch directories") {
    val (state2, _) = buildState(2)
    val (state8, _) = buildState(8)
    // warm both trees' footer/schema paths so first-read jobs don't skew
    graft.operators.Fsck.shards(spark, s"$state2/shards")
    graft.operators.Fsck.shards(spark, s"$state8/shards")
    val j2 = jobsIn("fsck-shards-2") {
      assert(graft.operators.Fsck.shards(spark, s"$state2/shards").forall(_.ok))
    }
    val j8 = jobsIn("fsck-shards-8") {
      assert(graft.operators.Fsck.shards(spark, s"$state8/shards").forall(_.ok))
    }
    assert(j2 > 0, "the audit must actually run jobs")
    assert(j8 == j2,
      s"fsck shards jobs must not scale with batch directories: $j2 at 2 vs $j8 at 8")
  }

  test("erase sweep jobs scale with directories TOUCHED, not directories accumulated") {
    val (state3, keys3) = buildState(3)
    val (state9, keys9) = buildState(9)
    // same-shape warmup sweep on throwaway copies so codegen/footer
    // first-run jobs don't land in either measured count
    val (warmState, warmKeys) = buildState(3)
    graft.cli.CurateCli.runErase(spark, warmKeys, warmState)

    val j3 = jobsIn("erase-3") {
      graft.cli.CurateCli.runErase(spark, keys3, state3)
    }
    val j9 = jobsIn("erase-9") {
      graft.cli.CurateCli.runErase(spark, keys9, state9)
    }
    assert(j3 > 0)
    assert(j9 == j3,
      s"erase sweep jobs must not scale with batch directories: $j3 at 3 vs $j9 at 9")

    // and the sweep was REAL: the keys are gone from batch 0, the other
    // directories' audit contract still holds
    val back = Shards.readBatches(spark, s"$state9/shards",
      Shards.liveBatchDirs(spark, s"$state9/shards"))
    assert(back.join(spark.read.parquet(keys9), Seq("doc_id"), "left_semi")
      .isEmpty, "erased subjects must be gone from every batch directory")
    assert(graft.operators.Fsck.shards(spark, s"$state9/shards").forall(_.ok),
      "positions must re-close dense after the touched-directory rewrite")
  }

  test("touched-directory probe: untouched directories keep their files byte-identical") {
    val (state, keys) = buildState(6)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def census(b: Int): Seq[(String, Long, Long)] = {
      val it = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$state/shards/batch=$b"), true)
      val buf = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        buf += ((s.getPath.toString, s.getLen, s.getModificationTime))
      }
      buf.result().sortBy(_._1)
    }
    val before = (1 until 6).map(census)
    val touched = Shards.touchedBatchDirs(spark, s"$state/shards",
      spark.read.parquet(keys), "doc_id")
    assert(touched == Seq("batch=0"),
      s"keys live in batch 0 only; probe said $touched")
    graft.cli.CurateCli.runErase(spark, keys, state)
    assert((1 until 6).map(census) == before,
      "untouched batch directories must not be rewritten (not even a no-op swap)")
  }
}
