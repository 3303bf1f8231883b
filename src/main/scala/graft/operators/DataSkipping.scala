package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Closed lower/upper bound on one column, for box predicates over a
  * stats manifest. Bounds are plain literal values (int/long/double/
  * string/date) compared with the engine's own ordering.
  */
case class ColRange(name: String, lo: Any, hi: Any)

/** File-level data skipping — a per-file min/max stats manifest plus a
  * pruned read that opens ONLY the files whose value ranges overlap a box
  * predicate. This is the consumption side of [[ZOrder.cluster]]: after a
  * z-ordered (or range-clustered) write, every file is narrow on every
  * clustered column, so a manifest probe eliminates most of a 100 TB
  * table's files BEFORE any footer is opened — the data-skipping
  * technique behind Delta/Iceberg file statistics, without requiring a
  * table format.
  *
  * Spark's own parquet min/max pruning works at the ROW-GROUP level but
  * still lists and opens every file's footer per query; at millions of
  * files the listing alone dominates. The manifest is |files| rows —
  * bounded, cheap to store, maintained incrementally by
  * [[appendManifest]] in the same persist-and-append convention as the
  * band/BM25/IVF indexes.
  *
  * Scale shape: building the manifest scans only the stat columns (one
  * columnar projection + a groupBy on `_metadata.file_path`, map-side
  * combinable to |files| rows). The pruned read collects the surviving
  * file list — bounded by |files|, and by the SKIPPING itself: a selective
  * box over a clustered layout keeps a small fraction of files.
  */
object DataSkipping {

  /** Standard in-tree manifest location for a self-manifesting store
    * (shard directories, snapshot stores): a `_stats` subdirectory.
    * Parquet readers ignore underscore-prefixed paths, so the manifest
    * rides inside the data directory without polluting its scans.
    */
  val ManifestSubdir = "_stats"

  /** [[statsManifest]] over an already-constructed frame (must carry
    * `_metadata.file_path` — i.e. read straight from files): the hook for
    * incremental maintenance, where only a pruned slice of a store is
    * re-statted.
    */
  def statsOf(projected0: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "dataskipping: need at least one stat column")
    require(cols.distinct == cols, s"dataskipping: duplicate stat columns in $cols")
    val reserved = Seq("file", "n_rows")
    require(!cols.exists(reserved.contains),
      s"dataskipping: stat columns must not be named ${reserved.mkString("/")}")
    val projected = projected0
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"))
    }
    projected.groupBy(col("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-file stats over `cols` for the parquet directory `dir`:
    * `(file, n_rows, <c>_min, <c>_max, <c>_nulls ...)`. One projected
    * scan, aggregated to |files| rows. min/max ignore nulls (a file with
    * no non-null values has null min/max and is prunable by any range —
    * a range never matches null); `<c>_nulls` records how many there are.
    */
  def statsManifest(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(dir), cols)

  /** Materialize [[statsManifest]] at `manifestDir` (overwrite). */
  def writeManifest(
      spark: SparkSession, dir: String, cols: Seq[String], manifestDir: String): Unit =
    statsManifest(spark, dir, cols)
      .write.mode("overwrite").parquet(manifestDir)

  def loadManifest(spark: SparkSession, manifestDir: String): DataFrame =
    spark.read.parquet(manifestDir)

  /** Stat the files of `dir` that the stored manifest does not know yet
    * and append their rows — the daily-ingest maintenance step after new
    * files land (shard append, compaction output). Known files are
    * excluded by an anti-join against the stored manifest (no driver
    * list), and only the stat columns of the new files' rows are read.
    */
  def appendManifest(
      spark: SparkSession, dir: String, cols: Seq[String], manifestDir: String): Unit = {
    val known = broadcast(loadManifest(spark, manifestDir).select(col("file")))
    val projected = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .join(known, Seq("file"), "left_anti")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"))
    }
    projected.groupBy(col("file")).agg(aggs.head, aggs.tail: _*)
      .write.mode("append").parquet(manifestDir)
  }

  /** Read only the files whose `[min, max]` interval overlaps EVERY range
    * of `box`, with the residual filter applied on the survivors (overlap
    * is necessary, not sufficient). The overlap test runs engine-side on
    * the |files|-row manifest; the surviving paths are a bounded driver
    * collect (sorted, so the file list — and hence the plan — is
    * deterministic). An empty survivor set returns an empty frame with
    * the data schema.
    *
    * The driver-side path list is the one unbounded term here, so it is
    * guarded: at ~10⁶ files a collected path list is hundreds of MB of
    * driver heap, and a plan over that many explicit paths is its own
    * hazard. The survivor COUNT is checked engine-side first (one extra
    * aggregation over the |files|-row manifest — cheap) and the read
    * refuses above `maxFiles` with the remediation options spelled out. A
    * box selective enough to be worth a pruned read keeps a small
    * fraction of files; a box that keeps a million files should be a
    * plain partition-pruned scan instead.
    */
  def prunedRead(
      spark: SparkSession,
      dataDir: String,
      manifest: DataFrame,
      box: Seq[ColRange],
      maxFiles: Int = 100000
  ): DataFrame = {
    require(box.nonEmpty, "dataskipping: need at least one range")
    require(maxFiles > 0, s"dataskipping: maxFiles must be positive, got $maxFiles")
    box.foreach { r =>
      require(manifest.columns.contains(s"${r.name}_min"),
        s"dataskipping: manifest has no stats for column ${r.name}")
    }
    val keep = box.foldLeft(manifest) { (m, r) =>
      m.filter(
        col(s"${r.name}_min").isNotNull &&
          col(s"${r.name}_max") >= lit(r.lo) &&
          col(s"${r.name}_min") <= lit(r.hi))
    }
    // ONE action enforces the bound AND fetches the list: collecting
    // maxFiles+1 rows proves overflow without a separate count() pass —
    // a computed (unmaterialized) manifest lineage can be a full
    // projected scan, and two actions would run it twice. The exact
    // census is only computed on the (already-failing) overflow path,
    // where its diagnostic value is worth the second action.
    val fetched = keep.select(col("file")).limit(maxFiles + 1).collect()
    if (fetched.length > maxFiles) {
      val exact = keep.count()
      throw new IllegalArgumentException(
        s"requirement failed: dataskipping: box keeps $exact files " +
          s"(> maxFiles=$maxFiles) — the driver-side path list would not " +
          "be bounded. Tighten the box, re-cluster the layout into " +
          "fewer/larger files, read via partition pruning instead, or " +
          "raise maxFiles knowingly.")
    }
    val files = fetched.map(_.getString(0)).sorted
    // basePath: an explicit-path read of a hive-partitioned tree would
    // otherwise silently DROP the partition columns (shard=/bucket=)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
      else spark.read.option("basePath", dataDir).parquet(files: _*)
    box.foldLeft(base)((d, r) =>
      d.filter(col(r.name) >= lit(r.lo) && col(r.name) <= lit(r.hi)))
  }

  /** [[prunedRead]] against a store's own in-tree manifest
    * (`<dataDir>/_stats`, the [[ManifestSubdir]] convention emitted by
    * [[graft.operators.Shards.write]] and
    * [[graft.pipeline.Snapshot.writeStore]]).
    */
  def prunedReadSelf(
      spark: SparkSession,
      dataDir: String,
      box: Seq[ColRange],
      maxFiles: Int = 100000
  ): DataFrame =
    prunedRead(spark, dataDir,
      loadManifest(spark, s"$dataDir/$ManifestSubdir"), box, maxFiles)
}
