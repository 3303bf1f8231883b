package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.policy.{ColumnPolicy, ColumnRetention, MaskMethod, PiiType, PolicyCatalog}

/** Column-level storage limitation (GDPR Art. 5.1.e): the reference's
  * `retention_days` meta executed. Pins the window boundary (day
  * `retention_days` retained, the day after expired), the conservative
  * NULL-timestamp rule, pass-through of ungoverned columns and rows, and
  * the audit report's exact counts.
  */
class ColumnRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = PolicyCatalog(Map("m" -> Map(
    "email" -> ColumnPolicy(
      pii = true, piiType = Some(PiiType.DirectIdentifier),
      anonymizationMethod = Some(MaskMethod.HashSha256),
      retentionDays = Some(730)),
    "phone" -> ColumnPolicy(
      pii = true, piiType = Some(PiiType.DirectIdentifier),
      anonymizationMethod = Some(MaskMethod.MaskPartial),
      retentionDays = Some(30)),
    // PII without a declared window: storage limitation has nothing to
    // enforce, the column passes through
    "address" -> ColumnPolicy(
      pii = true, piiType = Some(PiiType.QuasiIdentifier),
      anonymizationMethod = Some(MaskMethod.MaskPartial))
  )))

  private val asOf = to_date(lit("2026-01-01"))

  // ids 1-5: day-730 boundary, day-731, fresh, NULL ts, NULL cells
  private def fixture = Seq(
    (1L, Date.valueOf("2024-01-02"), "e1", "p1", "a1"), // exactly 730 days
    (2L, Date.valueOf("2024-01-01"), "e2", "p2", "a2"), // 731 days
    (3L, Date.valueOf("2025-12-31"), "e3", "p3", "a3"), // 1 day
    (4L, null.asInstanceOf[Date], "e4", "p4", "a4"),    // unprovable age
    (5L, Date.valueOf("2020-01-01"), null, null, null)  // nothing to expire
  ).toDF("id", "ts", "email", "phone", "address")

  test("expire: window boundary, null-ts conservatism, ungoverned pass-through") {
    val out = ColumnRetention.expire(fixture, "m", catalog, "ts", asOf)
    assert(out.schema == fixture.schema, "expiry must not change the schema")
    assert(out.count() == 5, "expiry suppresses cells, never rows")
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    // day 730 is INSIDE the email window; the 30-day phone window expired
    assert(byId(1L).getString(2) == "e1" && byId(1L).getString(3) == null)
    // day 731 is outside both
    assert(byId(2L).getString(2) == null && byId(2L).getString(3) == null)
    assert(byId(3L).getString(2) == "e3" && byId(3L).getString(3) == "p3")
    // NULL timestamp cannot prove recency: both governed cells expire
    assert(byId(4L).getString(2) == null && byId(4L).getString(3) == null)
    // address declares no window: survives everywhere, even at id 2/4
    assert(Seq(1L, 2L, 3L, 4L).forall(i => byId(i).getString(4) == s"a$i"))
    // ungoverned id/ts untouched
    assert(byId(2L).getDate(1) == Date.valueOf("2024-01-01"))
  }

  test("expiryReport: exact per-column counts; null cells count nowhere") {
    val rep = ColumnRetention
      .expiryReport(fixture, "m", catalog, "ts", asOf)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // email: expired = ids 2 (731d) + 4 (null ts); retained = 1, 3;
    // id 5's null cell counts in neither column
    assert(rep("email") == ((2L, 2L)))
    // phone(30d): only id 3 survives
    assert(rep("phone") == ((3L, 1L)))
    assert(!rep.contains("address"), "windowless columns have no report row")
  }

  test("expire ignores governed columns absent from the frame; missing ts refuses") {
    val slim = fixture.drop("phone")
    val out = ColumnRetention.expire(slim, "m", catalog, "ts", asOf)
    assert(out.columns.toSeq == slim.columns.toSeq)
    intercept[IllegalArgumentException] {
      ColumnRetention.expire(fixture, "m", catalog, "nope", asOf)
    }
    intercept[IllegalArgumentException] {
      // a model with no governed column in this frame has nothing to report
      ColumnRetention.expiryReport(fixture, "absent_model", catalog, "ts", asOf)
    }
  }

  test("retention reconciliation: the guard shape certifies, its absence or a widened window flips the gate") {
    import graft.plans.Lineage
    // a leaf with REAL column names: Seq.toDF roots lineage at the tuple
    // relation's _1/_2/... names, so the windows would never match — the
    // q_lineage re-rooting lesson, spec-side
    val lineageFixture = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      fixture.schema)
    val windows = Map("email" -> 730, "phone" -> 30)
    val guarded = ColumnRetention.expire(lineageFixture, "m", catalog, "ts", asOf)
      .select(col("id"), col("email"), col("phone"))
    assert(Lineage.retentionEnforced(guarded, windows))
    assert(Lineage.retentionMismatches(guarded, windows).forall(_._2.isEmpty))

    // the un-expired plan has raw value paths crossing NO guard
    val bare = lineageFixture.select(col("id"), col("email"), col("phone"))
    val mism = Lineage.retentionMismatches(bare, windows).toMap
    assert(mism("email") == Seq("email") && mism("phone") == Seq("phone"))
    assert(!Lineage.retentionEnforced(bare, windows))

    // a hand-written wider window does NOT discharge the declared one
    val widened = lineageFixture.select(col("id"),
      when(col("ts").isNotNull && datediff(asOf, col("ts")) <= 9999,
        col("email")).as("email"))
    assert(!Lineage.retentionEnforced(widened, Map("email" -> 730)))
    // with matching declaration it does (the kind carries the day count)
    assert(Lineage.retentionEnforced(widened, Map("email" -> 9999)))

    // downstream masking KEEPS the guard on the path (hash of an expired
    // email is still derived from expired data — and here it is guarded)
    val hashed = ColumnRetention.expire(lineageFixture, "m", catalog, "ts", asOf)
      .select(sha2(col("email"), 256).as("email_anon"))
    assert(Lineage.retentionEnforced(hashed, Map("email" -> 730)))
    // ...while a hash of the UNguarded raw column does not certify
    assert(!Lineage.retentionEnforced(
      lineageFixture.select(sha2(col("email"), 256).as("email_anon")),
      Map("email" -> 730)))

    // auxiliary one-bit channels pass without a guard: presence flags
    // survive expiry by design
    assert(Lineage.retentionEnforced(
      lineageFixture.select(col("email").isNotNull.cast("int").as("has_email")),
      Map("email" -> 730)))
  }

  test("the reference catalog now carries the schema.yml windows end-to-end") {
    // all five reference PII columns declare 730 (schema.yml:62,83,100,117,143)
    val pols = PolicyCatalog.reference.models("stg_services_publics")
    val withWindow = pols.collect {
      case (c, p) if p.pii && p.retentionDays.contains(730) => c
    }.toSet
    assert(withWindow == Set(
      "contact_email", "contact_phone", "street_address",
      "latitude", "longitude"))
  }
}
