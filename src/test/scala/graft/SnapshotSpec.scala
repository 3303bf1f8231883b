package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.pipeline.Snapshot
import graft.policy.{ColumnPolicy, MaskMethod, PolicyCatalog}

/** SCD-2 snapshot semantics (the reference's declared timestamp strategy)
  * and policy <-> StructField.metadata round-trip.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("timestamp-strategy snapshot: supersede on newer updated_at, keep history") {
    val day1 = Seq(
      ("R1", "v1", d("2025-01-01")),
      ("R2", "x1", d("2025-01-01"))
    ).toDF("record_id", "payload", "updated_at")
    val snap1 = Snapshot.initial(day1, "record_id", "updated_at")
    assert(Snapshot.current(snap1).count() == 2)

    val day2 = Seq(
      ("R1", "v2", d("2025-01-05")), // changed
      ("R2", "x1", d("2025-01-01")), // unchanged (same updated_at)
      ("R3", "new", d("2025-01-05")) // new key
    ).toDF("record_id", "payload", "updated_at")
    val snap2 = Snapshot.applyTimestampStrategy(snap1, day2, "record_id", "updated_at")

    val cur = Snapshot.current(snap2).orderBy("record_id").collect()
    assert(cur.map(_.getString(0)).toSeq == Seq("R1", "R2", "R3"))
    assert(cur.head.getAs[String]("payload") == "v2")

    // R1 history: v1 closed at v2's updated_at
    val r1 = snap2.filter($"record_id" === "R1").orderBy("valid_from").collect()
    assert(r1.length == 2)
    assert(r1(0).getAs[Date]("valid_to") == d("2025-01-05"))
    assert(r1(1).getAs[Date]("valid_to") == null)

    // as-of query sees v1 on Jan 2
    val asOf = Snapshot.asOf(snap2, lit(d("2025-01-02")))
      .filter($"record_id" === "R1").head()
    assert(asOf.getAs[String]("payload") == "v1")
  }

  test("stored snapshot: bucketed merge equals full apply, untouched buckets unwritten") {
    val day1 = Seq(
      ("R1", "v1", d("2025-01-01")), ("R2", "x1", d("2025-01-01")),
      ("R3", "y1", d("2025-01-01")), ("R4", "z1", d("2025-01-01")),
      ("R5", "w1", d("2025-01-01")), ("R6", "q1", d("2025-01-01"))
    ).toDF("record_id", "payload", "updated_at")
    val day2 = Seq(
      ("R1", "v2", d("2025-01-05")), // update
      ("R7", "new", d("2025-01-05")) // brand-new key (possibly new bucket)
    ).toDF("record_id", "payload", "updated_at")
    val buckets = 8
    val store = java.nio.file.Files.createTempDirectory("scd2_store").toString + "/snap"
    Snapshot.writeStore(Snapshot.initial(day1, "record_id", "updated_at"),
      "record_id", store, buckets)

    val touchedBuckets = day2
      .select(graft.operators.StableHash.bucket(col("record_id"), buckets))
      .distinct().collect().map(_.getInt(0)).toSet
    def fileState(): Map[String, (Long, Long)] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    val before = fileState()

    Snapshot.mergeStore(spark, store, day2, "record_id", "updated_at", buckets)

    // row-identical to the one-shot full apply over everything
    val expected = Snapshot.applyTimestampStrategy(
      Snapshot.initial(day1, "record_id", "updated_at"), day2,
      "record_id", "updated_at")
      .orderBy("record_id", "valid_from").collect().toSeq
    val got = Snapshot.loadStore(spark, store).drop("bucket")
      .select(expected.head.schema.fieldNames.map(col): _*)
      .orderBy("record_id", "valid_from").collect().toSeq
    assert(got == expected, s"merge diverged from full apply:\n$got\nvs\n$expected")

    // untouched buckets: the very same files, byte counts, mtimes
    val after = fileState()
    val untouchedBefore = before.filterNot { case (p, _) =>
      touchedBuckets.exists(b => p.contains(s"bucket=$b/")) }
    untouchedBefore.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"untouched bucket file rewritten: $p")
    }

    // empty batch is a no-op
    Snapshot.mergeStore(spark, store, day2.limit(0), "record_id", "updated_at", buckets)
    assert(fileState() == after, "empty-batch merge modified the store")
  }

  test("right-to-erasure: only touched buckets rewrite; emptied buckets vanish") {
    val rows = (1 to 40).map(i => (f"K$i%02d", s"payload$i"))
    val df = rows.toDF("record_id", "payload")
    val buckets = 8
    val store = java.nio.file.Files.createTempDirectory("erase_store").toString + "/s"
    Snapshot.writeStore(df, "record_id", store, buckets)

    def fileState(): Map[String, (Long, Long)] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    val before = fileState()

    // erase three subjects
    val victims = Seq("K01", "K17", "K33").toDF("record_id")
    val touched = victims
      .select(graft.operators.StableHash.bucket(col("record_id"), buckets))
      .distinct().collect().map(_.getInt(0)).toSet
    val n = Snapshot.eraseKeys(spark, store, victims, "record_id", buckets)
    assert(n == 3, s"erased $n")
    val got = Snapshot.loadStore(spark, store).select("record_id")
      .as[String].collect().toSet
    assert(got == rows.map(_._1).toSet -- Set("K01", "K17", "K33"))
    // untouched buckets byte-identical
    fileState().foreach { case (p, st) =>
      if (!touched.exists(b => p.contains(s"bucket=$b/")))
        assert(before.get(p).contains(st), s"untouched bucket rewritten: $p")
    }
    // pruned reads still exact through the refreshed manifest
    val pruned = Snapshot.prunedLoad(spark, store,
      Seq(graft.operators.ColRange("record_id", "K02", "K05")))
      .select("record_id").as[String].collect().toSet
    assert(pruned == Set("K02", "K03", "K04", "K05"))

    // erasing every key of one bucket removes its directory entirely
    val bucketOf = rows.map(_._1).groupBy(k =>
      Seq(k).toDF("record_id")
        .select(graft.operators.StableHash.bucket(col("record_id"), buckets))
        .head().getInt(0))
    val (b, keys) = bucketOf.head
    Snapshot.eraseKeys(spark, store,
      keys.toDF("record_id"), "record_id", buckets)
    assert(!new java.io.File(s"$store/bucket=$b").exists(),
      s"fully-erased bucket $b must not leave files behind")

    // erasing absent keys removes nothing
    val erased = Set("K01", "K17", "K33") ++ keys
    assert(Snapshot.eraseKeys(spark, store,
      Seq("NOPE").toDF("record_id"), "record_id", buckets) == 0L)
    assert(Snapshot.loadStore(spark, store).count() == (40 - erased.size).toLong)
  }

  test("stale-manifest crash window: dirty marker makes prunedLoad heal before pruning") {
    val rows = (1 to 40).map(i => (f"K$i%03d", s"v$i", d("2025-01-01")))
      .toDF("record_id", "payload", "updated_at")
    val batch = Seq(("K005", "v5b", d("2025-02-01")),
      ("K999", "new", d("2025-02-01"))).toDF("record_id", "payload", "updated_at")
    val store = java.nio.file.Files.createTempDirectory("scd2_heal").toString + "/snap"
    Snapshot.writeStore(Snapshot.initial(rows, "record_id", "updated_at"),
      "record_id", store, buckets = 4)
    Snapshot.mergeStore(spark, store, batch, "record_id", "updated_at", buckets = 4)
    val manifestDir = s"$store/${graft.operators.DataSkipping.ManifestSubdir}"
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val box = Seq(graft.operators.ColRange("record_id", "K000", "K010"))
    val healthy = Snapshot.prunedLoad(spark, store, box)
      .select("record_id").orderBy("record_id").collect().toSeq

    // simulate a merge that committed data but died before the manifest
    // refresh: dirty marker present (with the stat key), manifest GONE
    val marker = fs.create(
      new org.apache.hadoop.fs.Path(s"${manifestDir}__dirty"), true)
    marker.write("record_id".getBytes("UTF-8")); marker.close()
    fs.delete(new org.apache.hadoop.fs.Path(manifestDir), true)

    val healed = Snapshot.prunedLoad(spark, store, box)
      .select("record_id").orderBy("record_id").collect().toSeq
    assert(healed == healthy, "healed pruned read must equal the healthy one")
    assert(fs.exists(new org.apache.hadoop.fs.Path(manifestDir)),
      "heal must rebuild the manifest")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${manifestDir}__dirty")),
      "heal must clear the dirty marker")
    // explicit heal API is a no-op on the now-healthy store
    Snapshot.healManifest(spark, store, "record_id")
    assert(Snapshot.prunedLoad(spark, store, box)
      .select("record_id").orderBy("record_id").collect().toSeq == healthy)
  }

  test("policy round-trips through StructField.metadata") {
    val policies = PolicyCatalog.reference.policiesFor("stg_services_publics")
    val df = Seq(("a@b.fr", "x", 1.0)).toDF("contact_email", "city", "latitude")
    val tagged = PolicyCatalog.attach(df, policies)
    val back = PolicyCatalog.fromSchema(tagged)
    assert(back.keySet == Set("contact_email", "latitude"))
    assert(back("contact_email").anonymizationMethod.contains(MaskMethod.HashSha256))
    assert(back("latitude").kAnonymityTarget.contains(5))
    // untagged column stays clean
    assert(!tagged.schema("city").metadata.contains("pii"))
    // and the recovered map drives maskModel identically
    val masked = graft.masking.MaskModel.maskModel(df, back)
    assert(masked.head().getAs[String]("contact_email_anon").endsWith("@anonymized.gouv.fr"))
  }

  test("piiSummary counts PII columns and models") {
    assert(PolicyCatalog.reference.piiSummary == ((5, 1)))
  }

  test("not_null with where-filter (conditional dbt test)") {
    val df = Seq((1, Some("a@b.fr")), (1, None), (0, None))
      .toDF("has_email", "contact_email")
    val viol = graft.validate.Validate.notNullViolations(
      df, "contact_email", where = Some(col("has_email") === 1))
    assert(viol.count() == 1)
  }
}
