package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Logical erasure — request-sized deletion vectors decoupling the
  * GDPR-erase SLA from store size.
  *
  * [[graft.cli.CurateCli.runErase]] is physically complete but its cost
  * scales with the rows it must REWRITE: every touched corpus partition,
  * every index leg, every matched shard directory. At 100 TB that is a
  * scheduled maintenance job, not an answer to "stop serving this
  * subject NOW". A deletion vector is the fast path the lakehouse
  * engines use for the same problem (Delta's deletion vectors, Iceberg's
  * delete files — public designs, re-expressed here over plain parquet):
  * the erase request's KEY SET lands as one tiny `_SUCCESS`-guarded
  * parquet under `<state>/.dv/dv=<contentId>/`, and every serving
  * surface subtracts the union of pending vectors with a broadcast
  * anti-join — O(request) writes, O(|result| + |request|) serve-time
  * cost, zero store rewrites. The leading dot keeps the directory
  * invisible to Spark's own file listing, so raw scans of sibling legs
  * never pick vectors up as data.
  *
  * Semantics served under a pending vector: masked ids are NEVER
  * returned, from the corpus or from any index — but aggregate ranking
  * statistics (BM25 N/avgdl/df, agg-store totals, the sketch profile)
  * still include them until the vector SETTLES through the physical
  * sweep ([[graft.cli.CurateCli.runEraseSettle]] snapshots the pending
  * keys and drives [[graft.cli.CurateCli.runErase]], which is where the
  * stats subtraction and the on-disk purge actually happen). That
  * eventual-consistency window is the documented contract, the same one
  * the sketch profile's staleness ledger already makes explicit — and
  * [[Fsck.dvDebt]] reports the pending debt (vector count, key count,
  * oldest capture stamp) so "without undue delay" is auditable, not
  * assumed.
  *
  * Crash safety is by construction rather than by protocol: a torn
  * vector write has no `_SUCCESS` and is invisible (the replay
  * overwrites the same content-derived directory); masking is a set
  * subtraction, so duplicate or overlapping vectors are harmless; and
  * [[subtract]] retires a settled vector by writing the REMAINDER to a
  * fresh content-addressed directory before deleting the old one — a
  * crash between the two leaves both live, which over-masks only ids
  * the physical sweep already purged.
  *
  * Writer discipline: like every maintained store in this engine, the
  * vector tree assumes ONE writer at a time (the CLI/sweep convention);
  * readers are always safe — they see `_SUCCESS`-complete vectors only.
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer deletes by rebuilding
  * anonymized models in place (the models/marts SQL layer); this module is the
  * incremental-store counterpart those rebuilds don't need but a
  * maintained 100 TB corpus does.
  */
object DeletionVectors {

  /** Vectors live under a dot-directory so sibling parquet scans of the
    * state directory never list them as data files.
    */
  private def dvRoot(outDir: String) = s"${outDir.stripSuffix("/")}/.dv"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Order-free content id of a key set — the [[PartitionSwap]] sweep-id
    * recipe (`bit_xor` of per-row xxhash64; `sum` overflows under ANSI):
    * the same request replayed lands in the same directory, so appends
    * are idempotent by construction.
    */
  def contentId(keys: DataFrame, idCol: String): Long =
    keys.select(col(idCol))
      .distinct()
      .agg(coalesce(bit_xor(xxhash64(col(idCol).cast("string"))), lit(0L))
        .as("h"))
      .head().getAs[Long]("h")

  /** Record a logical erasure: the distinct keys land as ONE parquet
    * vector at `dv=<contentId>` with a capture stamp per row (the fsck
    * debt-age signal). Returns the number of masked keys. Re-appending
    * the same key set overwrites the same directory — a no-op at serve,
    * and it KEEPS the original capture stamp: a redelivered request
    * must not make outstanding debt look younger than it is.
    */
  def append(
      spark: SparkSession,
      outDir: String,
      keys: DataFrame,
      idCol: String = "doc_id"
  ): Long = {
    val ks = keys.select(col(idCol)).distinct()
    val id = contentId(ks, idCol)
    val dir = s"${dvRoot(outDir)}/dv=${java.lang.Long.toHexString(id)}"
    val fs = fsOf(spark, dir)
    val stamp =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")))
        System.currentTimeMillis()
      else {
        val prior = spark.read.parquet(dir).agg(min(col("_stamp"))).head()
        if (prior.isNullAt(0)) System.currentTimeMillis() else prior.getLong(0)
      }
    // the prior read is materialized into a literal, so overwriting the
    // directory it came from is safe
    ks.withColumn("_stamp", lit(stamp))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).count()
  }

  /** `_SUCCESS`-complete vector directories (a torn append is invisible
    * until its replay overwrites it). The listing is request-scale —
    * one entry per pending erasure, not per corpus batch.
    */
  def liveDirs(spark: SparkSession, outDir: String): Seq[String] = {
    val root = dvRoot(outDir)
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("dv="))
        .map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.toString).sorted.toSeq
  }

  /** The union of pending vectors as one distinct key frame — ONE
    * multi-path read regardless of how many erasures are pending, never
    * a per-directory union reduce. None when nothing is masked, so the
    * serve path can skip the anti-join entirely.
    */
  def load(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id"
  ): Option[DataFrame] = {
    val dirs = liveDirs(spark, outDir)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select(col(idCol)).distinct())
  }

  /** Serve-side subtraction: a broadcast anti-join on the id column.
    * Vectors are request-sized by construction, so the mask never
    * shuffles the served frame.
    */
  def mask(df: DataFrame, dv: Option[DataFrame], idCol: String): DataFrame =
    dv match {
      case None => df
      case Some(d) =>
        val keys = d.select(col(d.columns.head).as(idCol)).distinct()
        df.join(broadcast(keys), Seq(idCol), "left_anti")
    }

  /** [[load]] + [[mask]] in one call — the serving view of any leg
    * under the state directory's pending vectors.
    */
  def maskServing(
      spark: SparkSession,
      outDir: String,
      df: DataFrame,
      idCol: String = "doc_id"
  ): DataFrame = mask(df, load(spark, outDir, idCol), idCol)

  /** Pending-debt summary for the auditor: (vector dirs, distinct keys,
    * oldest capture stamp in epoch millis).
    */
  def pending(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id"
  ): (Int, Long, Option[Long]) = {
    val dirs = liveDirs(spark, outDir)
    if (dirs.isEmpty) (0, 0L, None)
    else {
      val all = spark.read.parquet(dirs: _*)
      val row = all
        .agg(countDistinct(col(idCol)).as("n"), min(col("_stamp")).as("s"))
        .head()
      (dirs.size, row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)))
    }
  }

  /** Retire settled keys from every pending vector: a vector fully
    * covered by the settled set is deleted; a partially covered one is
    * rewritten (remainder keys, fresh content-addressed directory,
    * original stamps preserved) BEFORE the old directory goes, so a
    * crash anywhere leaves the mask a superset of what it must be —
    * over-masking only ids the physical sweep already purged. Replays
    * converge: the remainder write is idempotent and the old directory
    * delete is the last step per vector.
    */
  def subtract(
      spark: SparkSession,
      outDir: String,
      settled: DataFrame,
      idCol: String = "doc_id"
  ): Unit = {
    val fs = fsOf(spark, dvRoot(outDir))
    val keys = settled.select(col(settled.columns.head).as(idCol)).distinct()
    liveDirs(spark, outDir).foreach { dir =>
      val remainder = spark.read.parquet(dir)
        .join(broadcast(keys), Seq(idCol), "left_anti")
      if (remainder.isEmpty)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      else {
        val rid = contentId(remainder, idCol)
        // compare by directory NAME — liveDirs returns fs-qualified URIs,
        // so a raw-string compare against the rebuilt path never matches
        // and the "untouched vector" case would overwrite the directory
        // its own source is reading
        val rname = s"dv=${java.lang.Long.toHexString(rid)}"
        if (rname != new org.apache.hadoop.fs.Path(dir).getName) {
          remainder.select(col(idCol), col("_stamp"))
            .write.mode("overwrite").parquet(s"${dvRoot(outDir)}/$rname")
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        }
      }
    }
  }
}
