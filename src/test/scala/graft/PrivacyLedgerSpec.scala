package graft

import java.nio.file.Files

import graft.policy.PrivacyLedger

/** The DP budget accountant ([[graft.policy.PrivacyLedger]]): spend
  * composes per dataset, a replayed release id never double-charges,
  * authorization refuses BEFORE the budget would be exceeded (equality
  * allowed), a torn charge is invisible until its retry, and the
  * advanced-composition report matches the DRV bound computed directly.
  */
class PrivacyLedgerSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("ledger").toString

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("charges compose per dataset and replays are no-ops") {
    val dir = tmp()
    assert(PrivacyLedger.charge(spark, dir, "a", "r1", 0.5))
    assert(PrivacyLedger.charge(spark, dir, "a", "r2", 0.25, delta = 1e-9))
    assert(PrivacyLedger.charge(spark, dir, "b", "r3", 1.0))
    assert(!PrivacyLedger.charge(spark, dir, "a", "r1", 0.5),
      "a replayed release id must not charge again")
    val (na, ea, da) = PrivacyLedger.spent(spark, dir, "a")
    assert(na == 2L && math.abs(ea - 0.75) < 1e-12 && math.abs(da - 1e-9) < 1e-21)
    val (nb, eb, _) = PrivacyLedger.spent(spark, dir, "b")
    assert(nb == 1L && eb == 1.0)
    assert(PrivacyLedger.spent(spark, dir, "missing") == ((0L, 0.0, 0.0)))
  }

  test("authorize refuses past the eps budget, allows equality, isolates datasets") {
    val dir = tmp()
    PrivacyLedger.charge(spark, dir, "a", "r1", 1.5)
    // equality is allowed: 1.5 + 0.5 == 2.0
    PrivacyLedger.authorize(spark, dir, "a", eps = 0.5, budgetEps = 2.0)
    val e = intercept[IllegalArgumentException] {
      PrivacyLedger.authorize(spark, dir, "a", eps = 0.6, budgetEps = 2.0)
    }
    assert(e.getMessage.contains("budget exhausted"))
    // another dataset's spend does not count against this one
    PrivacyLedger.authorize(spark, dir, "b", eps = 2.0, budgetEps = 2.0)
    // delta budget enforces independently
    PrivacyLedger.charge(spark, dir, "c", "rc", 0.1, delta = 1e-6)
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorize(spark, dir, "c", eps = 0.1, budgetEps = 10.0,
        delta = 1e-6, budgetDelta = 1.5e-6)
    }
  }

  test("a torn charge is invisible until its retry overwrites it") {
    val dir = tmp()
    PrivacyLedger.charge(spark, dir, "a", "r1", 0.5)
    // fabricate a crash: a second charge whose _SUCCESS never landed
    PrivacyLedger.charge(spark, dir, "a", "torn", 9.0)
    val entry = fsOf(dir)
      .listStatus(new org.apache.hadoop.fs.Path(s"$dir/ledger"))
      .map(_.getPath)
      .find(p => spark.read.parquet(p.toString)
        .filter(org.apache.spark.sql.functions.col("release_id") === "torn")
        .count() > 0).get
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(entry, "_SUCCESS"), false)
    val (n, e, _) = PrivacyLedger.spent(spark, dir, "a")
    assert(n == 1L && e == 0.5, "the torn charge must be invisible")
    // the retry re-lands the same entry and it counts exactly once
    assert(PrivacyLedger.charge(spark, dir, "a", "torn", 9.0))
    assert(PrivacyLedger.spent(spark, dir, "a") == ((2L, 9.5, 0.0)))
  }

  test("the auditor censuses the ledger: per-dataset spend rows, torn charges counted") {
    // the budget accountant is durable state — the same stance-needs-
    // census rule the admission log, registry history, and dead-letter
    // tree got. Informational rows: whether the spend is lawful is the
    // release policy's budget, passed per-release.
    val dir = tmp()
    assert(graft.operators.Fsck.ledgerCensus(spark, dir).isEmpty,
      "no ledger, no census rows")
    PrivacyLedger.charge(spark, dir, "a", "r1", 0.5)
    PrivacyLedger.charge(spark, dir, "a", "r2", 0.25, delta = 1e-9)
    PrivacyLedger.charge(spark, dir, "b", "r3", 1.0)
    // fabricate a crash: a charge whose _SUCCESS never landed
    PrivacyLedger.charge(spark, dir, "a", "torn", 9.0)
    val entry = fsOf(dir)
      .listStatus(new org.apache.hadoop.fs.Path(s"$dir/ledger"))
      .map(_.getPath)
      .find(p => spark.read.parquet(p.toString)
        .filter(org.apache.spark.sql.functions.col("release_id") === "torn")
        .count() > 0).get
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(entry, "_SUCCESS"), false)
    val checks = graft.operators.Fsck.ledgerCensus(spark, dir)
    assert(checks.forall(_.ok), "census rows are informational")
    val sa = checks.find(_.check == "spend_a").get
    assert(sa.detail.contains("2 release(s)") &&
      sa.detail.contains("0.7500"),
      s"dataset a spend row wrong: ${sa.detail}")
    assert(checks.find(_.check == "spend_b").get.detail
      .contains("1 release(s)"))
    assert(checks.find(_.check == "torn_charges").get.detail
      .contains("1 uncommitted"),
      "the auditor must see crash debris")
    assert(!checks.exists(_.check == "spend_missing"))
  }

  test("authorizeAndCharge: a crashed release's retry proceeds even at a full budget") {
    val dir = tmp()
    PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r1", eps = 2.0,
      budgetEps = 2.0)
    // the release crashed after charging; the retry must NOT refuse
    // itself against its own spend (the charge is the idempotency token)
    PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r1", eps = 2.0,
      budgetEps = 2.0)
    assert(PrivacyLedger.spent(spark, dir, "a") == ((1L, 2.0, 0.0)))
    // but a NEW release is refused — the budget really is spent
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r2", eps = 0.1,
        budgetEps = 2.0)
    }
  }

  test("authorize-then-charge is serialized: a concurrent release refuses instead of co-spending the budget") {
    // VERDICT r11: the read-check-write was not atomic across processes —
    // two releases could BOTH authorize under the remaining budget and
    // both charge, overspending epsilon. authorizeAndCharge now holds the
    // ledger directory's writer lease for the whole sequence.
    val dir = tmp()
    PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r1", eps = 1.0,
      budgetEps = 1.5)
    // another process is mid-release (its lease is live): this release
    // must refuse BEFORE authorizing, not race the budget check
    val fs = fsOf(dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/.lease"), true)
    out.write(s"other-writer|ledger-charge|${System.currentTimeMillis()}"
      .getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalStateException] {
      PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r2", eps = 0.5,
        budgetEps = 1.5)
    }
    assert(e.getMessage.contains("lease") &&
      e.getMessage.contains("other-writer"))
    assert(PrivacyLedger.spent(spark, dir, "a") == ((1L, 1.0, 0.0)),
      "the refused release must not have charged")
    // after the other writer finishes (lease released), the retry
    // re-authorizes against the NOW-durable spend and proceeds at the cap
    graft.operators.Lease.break(spark, dir)
    PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r2", eps = 0.5,
      budgetEps = 1.5)
    assert(PrivacyLedger.spent(spark, dir, "a") == ((2L, 1.5, 0.0)))
    // and past the cap the re-authorization refuses on the budget itself
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r3", eps = 0.1,
        budgetEps = 1.5)
    }
    assert(graft.operators.Lease.read(spark, dir).isEmpty,
      "a budget refusal must still release the lease")
  }

  test("release-id reuse with different accounting is refused, not silently no-opped") {
    val dir = tmp()
    PrivacyLedger.charge(spark, dir, "a", "r1", 0.5)
    // a true retry passes the verification
    assert(!PrivacyLedger.charge(spark, dir, "a", "r1", 0.5))
    // id reuse with a different eps / dataset would run an unauthorized
    // release against a stale charge — refuse loudly
    val e = intercept[IllegalArgumentException] {
      PrivacyLedger.charge(spark, dir, "a", "r1", 0.6)
    }
    assert(e.getMessage.contains("a new release needs a new id"))
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorizeAndCharge(spark, dir, "b", "r1", eps = 0.5,
        budgetEps = 10.0)
    }
    assert(PrivacyLedger.spent(spark, dir, "a") == ((1L, 0.5, 0.0)))
  }

  test("a charge-key collision is refused, never treated as a replay") {
    val dir = tmp()
    // fabricate the astronomically-unlikely event directly: an entry
    // already sitting at the directory r2's 8-byte md5 prefix addresses,
    // but recording a DIFFERENT release id with identical accounting
    import spark.implicits._
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest("r2".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    Seq(("a", "collider", 0.5, 0.0, 1L))
      .toDF("dataset", "release_id", "eps", "delta", "_stamp")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/ledger/charge=$key")
    val e = intercept[IllegalArgumentException] {
      PrivacyLedger.charge(spark, dir, "a", "r2", 0.5)
    }
    assert(e.getMessage.contains("charge-key collision"))
    // authorizeAndCharge routes through the same guard: the colliding id
    // must not ride the replay fast path into an unpaid release
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r2", eps = 0.5,
        budgetEps = 10.0)
    }
  }

  test("advanced composition admits a small-release schedule the basic sum refuses") {
    val dir = tmp()
    (1 to 28).foreach(i => PrivacyLedger.charge(spark, dir, "a", s"r$i", 0.04))
    // basic: 28 * 0.04 = 1.12 spent — the 29th release overflows eps=1.0
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorize(spark, dir, "a", eps = 0.04, budgetEps = 1.0)
    }
    // advanced at slack 1e-3: sqrt(2 ln 1e3 * 29 * 1.6e-3) + 29*0.04*(e^0.04-1)
    // ~= 0.80 + 0.047 — inside the same eps budget, paying the slack
    // against delta
    PrivacyLedger.authorize(spark, dir, "a", eps = 0.04, budgetEps = 1.0,
      budgetDelta = 1e-2, composition = "advanced", deltaSlack = 1e-3)
    val adv = PrivacyLedger.advancedEps(Seq.fill(29)(0.04), 1e-3)
    assert(adv < 1.0 && adv > 0.5)
    // the slack charges against the delta budget: too tight a delta
    // budget refuses even when the eps bound admits
    val e = intercept[IllegalArgumentException] {
      PrivacyLedger.authorize(spark, dir, "a", eps = 0.04, budgetEps = 1.0,
        budgetDelta = 1e-4, composition = "advanced", deltaSlack = 1e-3)
    }
    assert(e.getMessage.contains("advanced composition"))
    // and an unknown policy name fails loudly, not as "basic"
    intercept[IllegalArgumentException] {
      PrivacyLedger.authorize(spark, dir, "a", eps = 0.04, budgetEps = 1.0,
        composition = "renyi")
    }
    // the end-to-end verb takes the policy too
    PrivacyLedger.authorizeAndCharge(spark, dir, "a", "r29", eps = 0.04,
      budgetEps = 1.0, budgetDelta = 1e-2,
      composition = "advanced", deltaSlack = 1e-3)
    assert(PrivacyLedger.spent(spark, dir, "a")._1 == 29L)
  }

  test("advanced-composition report matches the DRV bound") {
    val dir = tmp()
    PrivacyLedger.charge(spark, dir, "a", "r1", 0.4)
    PrivacyLedger.charge(spark, dir, "a", "r2", 0.2)
    val row = PrivacyLedger.spentByDataset(spark, dir, deltaSlack = 1e-6)
      .filter(org.apache.spark.sql.functions.col("dataset") === "a")
      .head()
    val expected =
      math.sqrt(2 * math.log(1e6) * (0.4 * 0.4 + 0.2 * 0.2)) +
        (0.4 * (math.exp(0.4) - 1) + 0.2 * (math.exp(0.2) - 1))
    assert(math.abs(row.getAs[Double]("adv_eps") - expected) < 1e-9)
    assert(row.getAs[Long]("n_releases") == 2L)
  }
}
