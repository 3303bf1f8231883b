package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared sizing helpers for the per-store index compactions
  * ([[graft.text.Bm25.compactSearchIndex]],
  * [[graft.dedup.SetSimJoin.compactIndex]],
  * [[graft.dedup.Dedup.compactBandIndex]],
  * [[graft.similarity.Ivf.compactIndex]]).
  *
  * Why compaction is a first-class maintenance verb at 100 TB: every
  * append epoch lands its rows as NEW part files in the live legs (the
  * crash protocols promote staged deltas by rename — rewriting the leg
  * per epoch would defeat incremental maintenance), so a year of daily
  * epochs turns each leg into hundreds of small files; scans then pay
  * per-file open/footer costs and lose row-group clustering (a term's
  * postings spread across every epoch's file instead of one contiguous
  * run). Compaction rewrites a leg's CURRENT rows through its canonical
  * layout into size-targeted files — content-identical, value-idempotent,
  * and committed under the same crash protocols as the appends.
  */
object Compact {

  /** Number of `.parquet` data files under `dir`, recursive. */
  def parquetFiles(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Partition count that lands `dir`'s current bytes in roughly
    * `targetBytes`-sized files.
    */
  def partsFor(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compact: targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }
}
