package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Fsck

/** The store auditor must pass a freshly-maintained state directory and
  * flag each class of inconsistency it exists for: tampered redundant
  * state (BM25 stats vs the docs leg), cross-leg membership drift (a
  * corpus purge that missed a serving leg), and unrecovered commit
  * markers.
  */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def buildState(): String = {
    val docsWithVec = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .join(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
    val batches = Files.createTempDirectory("fsck_b").toString
    val state = Files.createTempDirectory("fsck_s").toString
    docsWithVec.filter(col("doc_id") % 2 === 0).write.parquet(s"$batches/b0")
    docsWithVec.filter(col("doc_id") % 2 === 1).write.parquet(s"$batches/b1")
    Seq(s"$batches/b0", s"$batches/b1").foreach { b =>
      graft.cli.CurateCli.runIncremental(
        spark, b, state, nShards = 2, searchIndex = true,
        exactIndex = true, aggStats = true)
    }
    state
  }

  test("a freshly-maintained state directory audits clean; each corruption class flags") {
    val state = buildState()
    val clean = Fsck.state(spark, state)
    assert(clean.nonEmpty && clean.forall(_.ok),
      s"clean state must audit clean: ${clean.filterNot(_.ok)}")
    assert(clean.exists(c => c.component == "search" && c.check == "stats_exact"))
    assert(clean.exists(c => c.component == "exact" && c.check == "prefix_count_exact"))
    assert(clean.exists(c => c.component == "agg" && c.check == "cnt_equals_corpus"))
    assert(clean.exists(c => c.component == "band" && c.check == "signature_complete"))

    // partial signature: drop SOME of one doc's band rows (a torn append)
    val bandsDir = s"$state/index/bands"
    val victim = spark.read.parquet(bandsDir)
      .select(col("doc_id")).head().getLong(0)
    val pruned = Files.createTempDirectory("fsck_band").toString + "/bands"
    spark.read.parquet(bandsDir)
      .filter(!(col("doc_id") === victim && col("band") > 0))
      .write.partitionBy("band").parquet(pruned)
    val bfs = new org.apache.hadoop.fs.Path(bandsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    bfs.delete(new org.apache.hadoop.fs.Path(bandsDir), true)
    bfs.rename(new org.apache.hadoop.fs.Path(pruned),
      new org.apache.hadoop.fs.Path(bandsDir))
    assert(Fsck.state(spark, state).exists(c =>
      c.component == "band" && c.check == "signature_complete" && !c.ok),
      "a torn band signature must flag")

    // 1. tampered redundant state: corrupt the stored BM25 stats
    val scratch = Files.createTempDirectory("fsck_stats").toString
    spark.read.parquet(s"$state/search/stats")
      .withColumn("_n_docs", col("_n_docs") + 1.0)
      .write.mode("overwrite").parquet(scratch)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/search/stats"), true)
    fs.rename(new org.apache.hadoop.fs.Path(scratch),
      new org.apache.hadoop.fs.Path(s"$state/search/stats"))
    val tampered = Fsck.state(spark, state)
    assert(tampered.exists(c =>
      c.component == "search" && c.check == "stats_exact" && !c.ok),
      "a stats drift from the docs leg must flag")

    // 2. membership drift: purge the corpus WITHOUT sweeping the legs
    graft.operators.Erasure.eraseByKey(spark, s"$state/corpus",
      spark.read.parquet(s"$state/corpus").select(col("doc_id"))
        .filter(col("doc_id") % 5 === 0), "doc_id")
    val drifted = Fsck.state(spark, state)
    assert(drifted.exists(c =>
      c.check == "ids_subset_corpus" && !c.ok),
      "legs holding erased subjects must flag as orphans")
    assert(drifted.exists(c =>
      c.component == "agg" && c.check == "cnt_equals_corpus" && !c.ok),
      "the unswept agg total must disagree with the purged corpus")

    // 3. unrecovered commit debt: a stale pending marker
    val pend = fs.create(
      new org.apache.hadoop.fs.Path(s"$state/agg/_batches/_pending"), true)
    pend.write("999".getBytes); pend.close()
    assert(Fsck.state(spark, state).exists(c =>
      c.component == "agg" && c.check == "no_pending_marker" && !c.ok))

    // 4. crashed rectify sweep: a valid .rectify-facts capture (only a
    // crashed CurateCli.runRectify leaves one) flags as commit debt;
    // a capture without _SUCCESS (killed mid-write) stays clean here —
    // runRectify itself ignores and overwrites those
    assert(clean.exists(c =>
      c.component == "rectify" && c.check == "no_pending_sweep" && c.ok))
    spark.read.parquet(s"$state/corpus").limit(2)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        org.apache.spark.sql.functions.lit(42L).as("_batch"))
      .write.mode("overwrite").parquet(s"$state/.rectify-facts")
    val pendingRect = Fsck.state(spark, state)
    assert(pendingRect.exists(c =>
      c.component == "rectify" && c.check == "no_pending_sweep" && !c.ok &&
        c.detail.contains("42")),
      "a pending facts capture must flag with its batch id")
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/.rectify-facts/_SUCCESS"), false)
    assert(Fsck.state(spark, state).exists(c =>
      c.component == "rectify" && c.check == "no_pending_sweep" && c.ok),
      "a torn capture (no _SUCCESS) is not a pending sweep")
  }
}
