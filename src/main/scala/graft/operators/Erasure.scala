package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-erasure propagation (GDPR Art. 17) into persisted SERVING
  * stores — the derived-artifact half of the compliance story.
  * [[graft.pipeline.Snapshot.eraseKeys]] purges the bucketed RECORD
  * store; this module purges the doc-keyed rows of the serving indexes
  * built over the corpus (BM25 postings, SetSimJoin sets/postings, IVF
  * assignments — which also carry PQ codes — and the MinHash band
  * index), because erasure that leaves a subject's documents recoverable
  * from a postings index is not erasure. The reference's per-column
  * `retention_days` meta
  * (`/root/reference/dbt_project/models/staging/schema.yml:57-64`)
  * declares the obligation; its dbt models can only rebuild from
  * scratch — here every store erases in place.
  *
  * Mechanics shared by every leg: the erasure key set is REQUEST-sized
  * (a few ids to a few thousand), the store is corpus-sized — so the
  * purge is a broadcast LEFT ANTI join streamed through a narrow
  * scan→filter→write with NO shuffle. Each input file rewrites to its
  * own output file, so whatever clustering the store relies on
  * (term-sorted BM25 postings, key-sorted prefix postings,
  * centroid-partitioned IVF rows, band-partitioned band rows) survives
  * the rewrite untouched. At 100 TB an erasure sweep is one linear pass
  * per store — batch requests and amortize, exactly like compaction.
  *
  * Crash safety: every rewrite lands in `<live>__erasing`, then swaps by
  * retire/promote rename (`<live>` → `<live>__retired`, tmp → `<live>`,
  * delete retired) — the [[graft.cli.CurateCli]] compaction protocol, so
  * its existing `recoverRetired` startup recovery covers erasure crashes
  * too: a crash before the promote leaves the old store live or retired
  * (restorable), never half-rewritten.
  */
object Erasure {

  /** Restore a store whose rewrite crashed between retire and promote:
    * if `live` is gone and `<live>__retired` exists, the retired
    * directory IS the data. (Same contract as CurateCli.recoverRetired;
    * exposed here so library users of [[eraseByKey]] outside the CLI can
    * recover as well.)
    */
  def recoverRetired(spark: SparkSession, live: String): Unit = {
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retired = new org.apache.hadoop.fs.Path(s"${live}__retired")
    if (!fs.exists(livePath) && fs.exists(retired)) fs.rename(retired, livePath)
  }

  /** Rewrite `live` all-or-nothing: `write(tmp)` produces the new
    * content, then retire/promote renames swap it in. A crash before the
    * promote never loses the old data (see [[recoverRetired]]).
    */
  def rewriteSwap(spark: SparkSession, live: String, write: String => Unit): Unit = {
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"${live}__erasing")
    val old = new org.apache.hadoop.fs.Path(s"${live}__retired")
    fs.delete(tmp, true) // stale leftovers from a crashed run
    fs.delete(old, true)
    write(tmp.toString)
    fs.rename(livePath, old)
    fs.rename(tmp, livePath)
    fs.delete(old, true)
  }

  /** Count the store rows matching the erasure keys (the audit number an
    * erasure report carries), without rewriting anything.
    */
  def matchCount(spark: SparkSession, live: String, keys: DataFrame, idCol: String): Long =
    spark.read.parquet(live)
      .join(broadcast(keys.select(col(idCol)).distinct()), Seq(idCol), "left_semi")
      .count()

  /** Remove every row whose `idCol` appears in `keys` from the parquet
    * tree at `live` (flat, or hive-partitioned when `partitionCols` is
    * set — the rewrite re-declares the same partitioning so the layout
    * survives). No-op (and no swap) when no key matches, so sweeping a
    * store that never contained the subject leaves its files byte-
    * identical. Returns the number of rows erased.
    */
  def eraseByKey(
      spark: SparkSession,
      live: String,
      keys: DataFrame,
      idCol: String,
      partitionCols: Seq[String] = Nil
  ): Long = {
    val k = keys.select(col(idCol)).distinct()
    val hit = matchCount(spark, live, k, idCol)
    if (hit == 0L) return 0L
    rewriteSwap(spark, live, tmp => {
      val kept = spark.read.parquet(live)
        .join(broadcast(k), Seq(idCol), "left_anti")
      val w = kept.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp)
      // a fully-erased store must stay READABLE: Spark's writer emits a
      // schema-bearing empty file for an empty frame (ErasureSpec pins
      // it), so later loads see zero rows rather than a schema-inference
      // error. Guard by FILE LISTING, not a spark.read (which fires a
      // footer job per swept leg and eats the plan-guard job budget): if
      // a future Spark stops writing that file, fail here rather than
      // strand an unreadable store.
      val tp = new org.apache.hadoop.fs.Path(tmp)
      val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = tfs.listFiles(tp, true)
      var readable = false
      while (!readable && it.hasNext)
        readable = it.next().getPath.getName.endsWith(".parquet")
      require(readable,
        s"erasure staged ZERO parquet files for $live — the swapped store " +
          "would be unreadable; this Spark version no longer writes " +
          "schema-bearing empty files")
    })
    hit
  }
}
