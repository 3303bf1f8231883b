package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the standard post-ingest maintenance pass: a
  * streaming sink or a fine-grained batch write leaves thousands of tiny
  * parquet files, and every downstream scan then pays per-file open cost
  * and loses row-group-sized reads. Compaction rewrites a directory into
  * ~`targetBytes`-sized files.
  *
  * Scale shape: ONE bounded driver step (the file listing — |files|
  * statuses, no data) sizes the output; the rewrite is a single
  * `repartition(n)` pass — a round-robin shuffle that also heals skewed
  * input files. Content is preserved exactly (same rows, any order);
  * compaction is a LAYOUT operation, not a semantic one — callers needing
  * deterministic order use [[Shards.write]] instead.
  *
  * These are the PRIMITIVES (rewrite into a NEW directory; the caller
  * owns the swap). The maintained serving stores each expose an atomic
  * store-level compaction on top — [[graft.text.Bm25.compactSearchIndex]],
  * [[graft.dedup.SetSimJoin.compactIndex]],
  * [[graft.dedup.Dedup.compactBandIndex]],
  * [[graft.similarity.Ivf.compactIndex]], composed by the CurateCli
  * `compact` verb — because every append epoch lands its rows as new
  * part files by design (the crash protocols promote staged deltas by
  * rename), so a year of daily epochs fragments each leg and spreads a
  * term's postings across every epoch's file. The store compactions
  * stage through these primitives and promote under the stores' own
  * commit protocols: content-identical, value-idempotent, crash-safe.
  */
object Compaction {

  /** Number of output files a directory should compact to. */
  def plannedFiles(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compaction: targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // a partitioned (nested) layout has NO top-level parquet files; sizing
    // it as 0 bytes would silently funnel the whole dataset through one
    // repartition(1) task — refuse instead (compact each partition dir)
    require(files.nonEmpty,
      s"compaction: no top-level parquet files in $dir — nested/partitioned " +
        "layouts must be compacted per partition directory")
    val totalBytes = files.map(_.getLen).sum
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `inDir` (flat parquet) as `outDir` with ~targetBytes files.
    * @return (input files, output files) actually observed
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long
  ): (Int, Int) =
    rewrite(spark, inDir, outDir, targetBytes, _.repartition(_))

  /** [[compact]] for CLUSTERED layouts (the stored-index family: BM25
    * postings term-clustered for row-group pruning, band/IVF tables keyed
    * by their probe column). A plain round-robin `repartition(n)` would
    * scatter each key across every output file and destroy the min/max
    * pruning the layout exists for; this variant hash-partitions on
    * `clusterCols` and sorts within partitions, so the compacted files
    * keep (in fact restore, after N appends) tight per-file key ranges.
    * Same bounded-listing sizing; key skew beyond targetBytes per key is
    * bounded by the key's own volume, the layout contract's grain.
    */
  def compactClustered(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      clusterCols: Seq[String]
  ): (Int, Int) = {
    require(clusterCols.nonEmpty,
      "compaction: clusterCols must be non-empty — use compact() for " +
        "round-robin layout")
    rewrite(spark, inDir, outDir, targetBytes,
      (df, n) => df
        .repartition(n, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*))
  }

  /** [[compact]] for HIVE-PARTITIONED layouts (`partitionBy` directories —
    * the IVF index's `assigned/centroid_id=N/` store): each append drops a
    * file set into every touched partition directory, so after N batches a
    * k-partition index carries up to k*N small files. This variant reads
    * the whole tree (partition columns come back as columns), hash-
    * partitions on the partition keys, and rewrites `partitionBy` the same
    * keys — every key lands in exactly one task, so the healed layout has
    * ONE file per partition directory and dynamic partition pruning keeps
    * working. Sizing walks the tree (bounded: |files| statuses, no data).
    */
  def compactPartitioned(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      partitionCols: Seq[String]
  ): (Int, Int) = {
    require(partitionCols.nonEmpty,
      "compaction: partitionCols must be non-empty — use compact() for " +
        "flat layouts")
    require(targetBytes > 0, s"compaction: targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      "compaction: refuse to overwrite the input in place — write to a new " +
        "directory and swap atomically at the catalog/manifest layer")
    // resolve the FileSystem PER DIRECTORY: binding it to inDir would make
    // the post-rewrite listing of a cross-filesystem outDir throw Wrong FS
    // after the full rewrite already ran
    def leafFiles(dir: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val path = new org.apache.hadoop.fs.Path(dir)
      val it = path.getFileSystem(conf).listFiles(path, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) buf += s
      }
      buf.result()
    }
    val in = leafFiles(inDir)
    require(in.nonEmpty, s"compaction: no parquet files under $inDir")
    val n = math.max(1,
      math.ceil(in.map(_.getLen).sum.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(n, partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)
    (in.length, leafFiles(outDir).length)
  }

  private def rewrite(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      layout: (DataFrame, Int) => DataFrame
  ): (Int, Int) = {
    // compare fully-qualified paths, not raw strings: 'dir/' vs 'dir',
    // relative vs absolute, or scheme-qualified aliases must not slip past
    // the guard and clobber the input mid-read
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      "compaction: refuse to overwrite the input in place — write to a new " +
        "directory and swap atomically at the catalog/manifest layer")
    val n = plannedFiles(spark, inDir, targetBytes)
    layout(spark.read.parquet(inDir), n)
      .write.mode("overwrite").parquet(outDir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def count(dir: String) = fs
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (count(inDir), count(outDir))
  }
}
