package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Storage-layout evidence: the partition-pruning behaviors a 100 TB
  * deployment depends on, pinned as plan assertions (the BucketingSpec
  * pattern). Events land date-partitioned; a day filter must prune at
  * PLANNING time, and a dimension-driven join must prune DYNAMICALLY —
  * without either, every query pays a full-table scan.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_by_date").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(d)
    d
  }

  test("static partition pruning: a day filter reaches the scan as a partition filter") {
    val back = spark.read.parquet(dir)
    val total = back.select(countDistinct(col("event_date"))).as[Long].head()
    assert(total > 1, "fixture must span multiple dates for pruning to mean anything")
    val oneDay = back.filter(col("event_date") === back.agg(min(col("event_date"))).head().getDate(0))
    val plan = oneDay.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters:") && plan.contains("event_date"),
      s"day filter did not reach the scan as a partition filter:\n$plan")
    // the pruned scan must read strictly fewer partitions than exist
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ == 1),
      s"expected exactly 1 of $total partitions selected, got $scanned")
  }

  test("dynamic partition pruning: a dimension filter prunes the fact scan at runtime") {
    // DPP is on by default; the suite shares one session, so no conf writes
    val fact = spark.read.parquet(dir)
    // tiny dimension: one row selecting one date
    val minDate = fact.agg(min(col("event_date"))).head().getDate(0)
    // the dimension must be a FILE source: a local relation folds its
    // filter away and DPP's selective-predicate heuristic never fires
    val dimDir = java.nio.file.Files.createTempDirectory("date_dim").toString
    fact.select(col("event_date").as("d_date")).distinct()
      .withColumn("tag", when(col("d_date") === minDate, "keep").otherwise("drop"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact
      .join(dim.filter(col("tag") === "keep"), fact("event_date") === dim("d_date"))
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning") || plan.contains("dynamicpruningexpression"),
      s"no dynamic-pruning subquery on the fact scan:\n$plan")
  }

  test("z-order clustering narrows per-file ranges on BOTH coordinates") {
    import graft.operators.ZOrder
    // two 5-bit coordinates of comparable cardinality, so the top z bits
    // alternate between dimensions and 8 range partitions split on both
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("event_id"),
        pmod(col("user_id"), lit(32)).cast("int").as("ub"),
        (dayofmonth(col("ts")) - lit(1)).cast("int").as("db"))
    val out = java.nio.file.Files.createTempDirectory("zorder_layout").toString
    ZOrder.cluster(ev, Seq(col("ub"), col("db")), bits = 5, numPartitions = 8)
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8, s"expected 8 clustered files, got ${files.length}")
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("ub"), max("ub"), min("db"), max("db")).head()
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    }
    // a 2-D box predicate (ub < 16 && db < 8 — 1/8 of the z space) must be
    // skippable by per-file min/max on the ORIGINAL columns: most files'
    // ranges don't overlap the box at all
    val overlapping = stats.count { case (ul, _, dl, _) => ul <= 15 && dl <= 7 }
    assert(overlapping <= files.length / 2,
      s"box query overlaps $overlapping of ${files.length} files: ${stats.toSeq}")
    // and the narrowing is on BOTH dimensions, not just a leading sort key
    val uSpan = stats.map { case (ul, uh, _, _) => uh - ul }.sum.toDouble / stats.length
    val dSpan = stats.map { case (_, _, dl, dh) => dh - dl }.sum.toDouble / stats.length
    assert(uSpan < 24, s"mean per-file ub span $uSpan not narrowed (global 31)")
    assert(dSpan < 24, s"mean per-file db span $dSpan not narrowed (global ~30)")
  }

  test("data skipping: manifest prunes files, results match a full scan") {
    import graft.operators.{ColRange, DataSkipping, ZOrder}
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("event_id"),
        pmod(col("user_id"), lit(32)).cast("int").as("ub"),
        (dayofmonth(col("ts")) - lit(1)).cast("int").as("db"))
    val out = java.nio.file.Files.createTempDirectory("zorder_skip").toString
    ZOrder.cluster(ev, Seq(col("ub"), col("db")), bits = 5, numPartitions = 8)
      .write.mode("overwrite").parquet(s"$out/data")
    DataSkipping.writeManifest(spark, s"$out/data", Seq("ub", "db"), s"$out/mf")
    val mf = DataSkipping.loadManifest(spark, s"$out/mf")

    // one manifest row per file, and the row count census adds up
    assert(mf.count() == 8, s"expected 8 manifest rows, got ${mf.count()}")
    val total = mf.agg(sum("n_rows")).head().getLong(0)
    assert(total == ev.count(), s"manifest rows $total != input ${ev.count()}")

    // the box must SKIP files (the layout test above proves ≤ half
    // overlap) and the pruned result must equal the full-scan filter
    val box = Seq(ColRange("ub", 0, 15), ColRange("db", 0, 7))
    val surviving = box.foldLeft(mf)((m, r) =>
      m.filter(col(s"${r.name}_max") >= lit(r.lo) && col(s"${r.name}_min") <= lit(r.hi)))
    assert(surviving.count() <= 4, s"box should skip files, kept ${surviving.count()}/8")
    val pruned = DataSkipping.prunedRead(spark, s"$out/data", mf, box)
      .orderBy("event_id").collect().toSeq
    val full = spark.read.parquet(s"$out/data")
      .filter(col("ub").between(0, 15) && col("db").between(0, 7))
      .orderBy("event_id").collect().toSeq
    assert(pruned == full, s"pruned read diverged: ${pruned.length} vs ${full.length} rows")

    // a box outside the value space returns empty with the data schema
    val none = DataSkipping.prunedRead(spark, s"$out/data", mf,
      Seq(ColRange("ub", 100, 200)))
    assert(none.count() == 0 && none.columns.toSeq ==
      spark.read.parquet(s"$out/data").columns.toSeq)
  }

  test("data skipping: append stats new files only, equal to a rebuild") {
    import graft.operators.DataSkipping
    val out = java.nio.file.Files.createTempDirectory("skip_append").toString
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), pmod(col("user_id"), lit(32)).cast("int").as("ub"))
    ev.filter(col("event_id") % 2 === 0).repartition(3)
      .write.mode("overwrite").parquet(s"$out/data")
    DataSkipping.writeManifest(spark, s"$out/data", Seq("ub"), s"$out/mf")
    val before = DataSkipping.loadManifest(spark, s"$out/mf").collect().toSet
    ev.filter(col("event_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(s"$out/data")
    DataSkipping.appendManifest(spark, s"$out/data", Seq("ub"), s"$out/mf")
    val appended = DataSkipping.loadManifest(spark, s"$out/mf").collect().toSet
    // old rows unchanged (append re-statted only unknown files) and the
    // result is exactly what a from-scratch build over all files produces
    assert(before.subsetOf(appended), "append rewrote existing manifest rows")
    val rebuilt = DataSkipping.statsManifest(spark, s"$out/data", Seq("ub"))
      .collect().toSet
    assert(appended == rebuilt,
      s"append != rebuild: ${appended.size} vs ${rebuilt.size} rows")
  }

  test("snapshot store: key-ranged pruned read opens only overlapping files") {
    import graft.pipeline.Snapshot
    import graft.operators.{ColRange, DataSkipping}
    // zero-padded keys so lexicographic string order == numeric order;
    // maxRecordsPerFile splits each bucket into KEY-contiguous files
    val rows = (0 until 2000).map(i => (f"K$i%05d", s"v$i", java.sql.Date.valueOf("2025-01-01")))
      .toDF("record_id", "payload", "updated_at")
    val store = java.nio.file.Files.createTempDirectory("snap_prune").toString + "/snap"
    Snapshot.writeStore(Snapshot.initial(rows, "record_id", "updated_at"),
      "record_id", store, buckets = 4, maxRecordsPerFile = 100L)

    // the write emitted its own complete manifest
    val mf = DataSkipping.loadManifest(
      spark, s"$store/${DataSkipping.ManifestSubdir}")
    val nFiles = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(nFiles >= 8, s"expected multi-file buckets, got $nFiles files")
    assert(mf.count() == nFiles, "manifest incomplete vs the written files")

    // a narrow key range must open only a fraction of the files...
    val box = Seq(ColRange("record_id", "K00100", "K00199"))
    val pruned = Snapshot.prunedLoad(spark, store, box)
    val opened = pruned
      .select(input_file_name()).distinct().count()
    assert(opened < nFiles / 2,
      s"key-range read opened $opened of $nFiles files — no skipping")
    // ...and return exactly what a full-store filter returns
    val got = pruned.select(col("record_id"), col("payload"))
      .orderBy("record_id").collect().toSeq
    val want = Snapshot.loadStore(spark, store)
      .filter(col("record_id").between("K00100", "K00199"))
      .select(col("record_id"), col("payload"))
      .orderBy("record_id").collect().toSeq
    assert(got == want && got.size == 100)

    // mergeStore keeps the manifest exact: touched-bucket rows re-statted,
    // untouched rows kept, no stale file entries
    val day2 = Seq(("K00150", "v2", java.sql.Date.valueOf("2025-01-05")),
      ("K99999", "new", java.sql.Date.valueOf("2025-01-05")))
      .toDF("record_id", "payload", "updated_at")
    Snapshot.mergeStore(spark, store, day2, "record_id", "updated_at",
      buckets = 4, maxRecordsPerFile = 100L)
    val mfAfter = DataSkipping.loadManifest(
      spark, s"$store/${DataSkipping.ManifestSubdir}")
    val rebuilt = DataSkipping.statsManifest(spark, store, Seq("record_id"))
    assert(mfAfter.collect().toSet == rebuilt.collect().toSet,
      "post-merge manifest differs from a from-scratch rebuild")
    // the pruned read still serves the merged truth
    val got2 = Snapshot.prunedLoad(spark, store, box)
      .filter(col("valid_to").isNull)
      .select(col("record_id"), col("payload"))
      .orderBy("record_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got2.count(_ == ("K00150", "v2")) == 1)
    assert(got2.length == 100)
  }

  test("pruned read refuses an unbounded driver file list (10k-file manifest)") {
    import graft.operators.{ColRange, DataSkipping}
    // artificial manifest: 10k files all overlapping the box — the
    // engine-side survivor count must trip BEFORE any path collect
    val mf = spark.range(10000).select(
      concat(lit("file:/fake/part-"), col("id")).as("file"),
      lit(100L).as("n_rows"),
      lit(0).as("k_min"), lit(9).as("k_max"), lit(0L).as("k_nulls"))
    val ex = intercept[IllegalArgumentException] {
      DataSkipping.prunedRead(spark, "/fake", mf,
        Seq(ColRange("k", 0, 9)), maxFiles = 1000)
    }
    assert(ex.getMessage.contains("maxFiles"), ex.getMessage)
    assert(ex.getMessage.contains("10000"), ex.getMessage)
  }
}
