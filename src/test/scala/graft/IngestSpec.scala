package graft

import java.nio.file.Files

import graft.ingest.Ingest
import graft.masking.MaskModel
import graft.pipeline.Materialize
import graft.policy.{EngineConfig, PolicyCatalog}

/** Ingest path specs: JSONL flatten/rename, bad-record tolerance,
  * deterministic sampling, summary aggregates — plus the opt-in
  * aggregate_to_city masking method.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeJsonl(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-ingest").toFile
    val f = new java.io.File(dir, "data.jsonl")
    Files.writeString(f.toPath, lines.mkString("\n"))
    f.getAbsolutePath
  }

  test("readJsonl flattens nested geo/writeAddress/website and renames") {
    val path = writeJsonl(
      """{"id":"S1","name":"Mairie","parent_name":"Org","type":"mairie","contact_email":"a@b.fr","contact_phone":"+33 1 2","website":["https://w1.fr","https://w2.fr"],"writeAddress":{"streetAddress":"1 rue X","postalCode":"75001","addressLocality":"Paris"},"geo":{"latitude":48.85,"longitude":2.35,"commune":"Paris","insee_comm":"75056"},"update":"2025-01-01"}""",
      """{"id":"S2","name":"Pref"}""",
      """this is not json at all"""
    )
    val (df, corrupt) = Ingest.readJsonl(spark, path)
    assert(corrupt == 1)
    val rows = df.orderBy("service_id").collect()
    assert(rows.length == 2)
    val r = rows(0)
    assert(r.getAs[String]("service_id") == "S1")
    assert(r.getAs[String]("website") == "https://w1.fr") // first element
    assert(r.getAs[String]("street_address") == "1 rue X")
    assert(r.getAs[String]("city") == "Paris")
    assert(r.getAs[Double]("latitude") == 48.85)
    assert(r.getAs[String]("last_updated") == "2025-01-01")
    // sparse record: all nested fields null, no crash
    val s2 = rows(1)
    assert(s2.getAs[String]("service_name") == "Pref")
    assert(s2.isNullAt(s2.fieldIndex("latitude")))
  }

  test("deterministicSample returns exactly n rows, stable across runs") {
    val df = (1 to 100).toDF("x")
    val a = Ingest.deterministicSample(df, 10).collect().map(_.getInt(0)).toSeq
    val b = Ingest.deterministicSample(df, 10).collect().map(_.getInt(0)).toSeq
    assert(a.length == 10 && a == b)
  }

  test("summarize counts rows/presence/distinct org types") {
    val df = Seq(
      ("a@b.fr", "+33", "mairie"),
      (null, null, "mairie"),
      ("c@d.fr", null, "prefecture")
    ).toDF("contact_email", "contact_phone", "organization_type")
    val s = Ingest.summarize(df).head()
    assert(s.getAs[Long]("total_rows") == 3)
    assert(s.getAs[Long]("emails_present") == 2)
    assert(s.getAs[Long]("phones_present") == 1)
    assert(s.getAs[Long]("distinct_org_types") == 2)
  }

  test("exportReport writes readable JSON and CSV twins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_report").toString
    val report = Seq(
      ("stg_services_publics", "contact_email", "direct_identifier"),
      ("stg_services_publics", "latitude", "quasi_identifier")
    ).toDF("model_name", "column_name", "pii_type")
    Ingest.exportReport(report, dir)
    val js = spark.read.json(s"$dir/json")
    val cs = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(js.count() == 2 && cs.count() == 2)
    assert(cs.columns.sorted.toSeq == Seq("column_name", "model_name", "pii_type"))
  }

  test("piiScanCatalog walks registered tables and flags raw PII only") {
    Seq(("raw@real-domain.fr", "+33 1 23 45 67 89"))
      .toDF("contact_email", "contact_phone")
      .createOrReplaceTempView("scan_raw")
    Seq(("user_abc@anonymized.gouv.fr", "+33 1 XX XX XX XX"))
      .toDF("contact_email", "contact_phone")
      .createOrReplaceTempView("scan_clean")
    val hits = graft.validate.Validate.piiScanCatalog(spark, "scan_.*")
      .collect()
    assert(hits.map(_.getAs[String]("table_name")).toSet == Set("scan_raw"))
    assert(hits.length == 2) // raw email + raw phone
  }

  test("Materialize.asTable pins partitioned parquet; asView stays lazy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "part")
    val pinned = Materialize.asTable(df, s"$dir/t", partitionBy = Seq("part"))
    assert(pinned.count() == 3)
    // partition pruning: reading one partition touches one directory
    val pruned = pinned.filter($"part" === "a")
    assert(pruned.count() == 2)
    assert(new java.io.File(s"$dir/t/part=a").exists())
    val viewed = Materialize.asView(df.filter($"id" > 1), "mat_view")
    assert(viewed.count() == 2 && spark.catalog.tableExists("mat_view"))
  }

  test("aggregate_to_city: passthrough by default, city-coarsening when enabled") {
    val df = Seq(("10 rue de Paris", "Paris"), (null, "Lyon"))
      .toDF("street_address", "city")
    val policies = PolicyCatalog.reference.policiesFor("stg_services_publics")
    val off = MaskModel.maskModel(df, policies, EngineConfig())
    assert(off.collect()(0).getAs[String]("street_address_anon") == "10 rue de Paris")
    val on = MaskModel.maskModel(df, policies,
      EngineConfig(enableAggregateToCity = true))
    // Lyon row: street_address null -> stays null; Paris row -> "Paris"
    val byCity = on.collect().map(r =>
      (r.getAs[String]("city_anon"), r.getAs[String]("street_address_anon"))).toMap
    assert(byCity("Paris") == "Paris" && byCity("Lyon") == null)
  }
}
