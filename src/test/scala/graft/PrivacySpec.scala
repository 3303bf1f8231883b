package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.validate.{DpRelease, Privacy}

/** The privacy-audit layer beyond k-anonymity: l-diversity, t-closeness,
  * the re-identification risk census, and the two-sided-geometric DP count
  * release. Expectations are brute-forced in plain Scala over small crafted
  * tables, so every assertion is an independent replay, not a snapshot.
  */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  /** (group, sensitive) rows: g1 uniform over 3 values, g2 all one value,
    * g3 skewed 4:1:0, plus a NULL sensitive row that every audit skips.
    */
  private def crafted: DataFrame = {
    val rows =
      Seq.tabulate(9)(i => ("g1", s"v${i % 3}")) ++
        Seq.fill(6)(("g2", "v0")) ++
        (Seq.fill(4)(("g3", "v0")) :+ ("g3" -> "v1")) :+
        ("g2" -> null.asInstanceOf[String])
    rows.toDF("g", "s").repartition(5)
  }

  // ---- l-diversity ---------------------------------------------------------

  test("l-diversity: distinct sensitive counts and the violation filter") {
    val audit = Privacy
      .lDiversityAudit(crafted, col("g"), col("s"), l = 2, qiName = "g")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(audit("g1") == ((9L, 3L, true)))
    assert(audit("g2") == ((6L, 1L, false))) // null sensitive row skipped
    assert(audit("g3") == ((5L, 2L, true)))
    val viol = Privacy
      .lDiversityViolations(crafted, col("g"), col("s"), l = 2, qiName = "g")
      .collect()
    assert(viol.map(_.getString(0)).toSeq == Seq("g2"))
  }

  // ---- t-closeness ---------------------------------------------------------

  test("t-closeness: integer-exact TVD against a Scala replay") {
    val got = Privacy
      .tClosenessAudit(crafted, col("g"), col("s"), qiName = "g")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // global (nulls skipped): v0 9+6+4=... g1 has 3x v0,v1,v2; g2 6x v0;
    // g3 4x v0 + 1x v1 -> N=20, n(v0)=13, n(v1)=4, n(v2)=3
    val global = Map("v0" -> 13L, "v1" -> 4L, "v2" -> 3L)
    val groups = Map(
      "g1" -> Map("v0" -> 3L, "v1" -> 3L, "v2" -> 3L),
      "g2" -> Map("v0" -> 6L),
      "g3" -> Map("v0" -> 4L, "v1" -> 1L))
    val n = global.values.sum
    for ((g, dist) <- groups) {
      val ng = dist.values.sum
      val num = global.map { case (v, nv) =>
        math.abs(dist.getOrElse(v, 0L) * n - nv * ng)
      }.sum
      val want = num.toDouble / (2.0 * ng * n)
      val (gotNg, gotTvd) = got(g)
      assert(gotNg == ng, s"group $g size")
      assert(math.abs(gotTvd - want) < 1e-12, s"group $g: got $gotTvd want $want")
    }
    // bounds: every TVD in [0, 1]; the uniform-matching group is the closest
    assert(got.values.forall { case (_, t) => t >= 0.0 && t <= 1.0 })
  }

  test("t-closeness: a group mirroring the global distribution scores 0") {
    val df = Seq(
      ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("g", "s")
    val tvds = Privacy.tClosenessAudit(df, col("g"), col("s"), "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(tvds.values.forall(_ == 0.0))
  }

  // ---- re-identification risk ---------------------------------------------

  test("reid risk: census over multiple QI sets in one pass") {
    val df = Seq(
      ("75001", "A"), ("75001", "A"), ("75001", "B"),
      ("69002", "A"), ("69002", "A"),
      ("13003", "B")).toDF("postal", "org")
    val got = Privacy
      .reidRisk(
        df,
        Seq(
          Privacy.QiSet("postal", Seq(col("postal"))),
          Privacy.QiSet("postal_org", Seq(col("postal"), col("org")))),
        smallK = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // postal: groups {75001:3, 69002:2, 13003:1} -> 1 unique, 1 row below 2
    assert(got("postal") == ((6L, 3L, 1L, 1L, 1L)))
    // postal_org: {75001A:2, 75001B:1, 69002A:2, 13003B:1} -> 2 unique
    assert(got("postal_org") == ((6L, 4L, 2L, 2L, 1L)))
  }

  // ---- l-diversity enforcement ---------------------------------------------

  test("l-diversity enforcement: first passing rung, brute-forced floors") {
    import graft.validate.KAnonymity.Rung
    // fine groups mostly single-valued; coarse rung pools them
    val df = Seq(
      ("75001", "A"), ("75001", "A"), ("75002", "B"), ("75002", "B"),
      ("69001", "A"), ("69001", "C"), ("69002", "B"), ("69002", "C"))
      .toDF("postal", "org").repartition(3)
    val ladder = Seq(
      Rung("postal", col("postal")),
      Rung("dept", substring(col("postal"), 1, 2)),
      Rung("all", lit("ALL")))
    val floors = Privacy.probeDiversity(df, ladder, col("org"))
    // postal: every group 1-2 distinct; dept: 75 -> {A,B}, 69 -> {A,B,C};
    // all: {A,B,C}
    assert(floors == Seq((0, 4L, 1L), (1, 2L, 2L), (2, 1L, 3L)))
    val (rung2, out2) =
      Privacy.enforceLDiversity(df, ladder, col("org"), l = 2)
    assert(rung2 == 1 && out2.count() == 8)
    val (rung3, out3) =
      Privacy.enforceLDiversity(df, ladder, col("org"), l = 3)
    assert(rung3 == 2 && out3.count() == 8)
  }

  test("l-diversity enforcement: coarsest-rung fallback suppresses") {
    import graft.validate.KAnonymity.Rung
    // one diverse department, one hopeless one; no rung reaches l = 2
    val df = Seq(
      ("75001", "A"), ("75002", "B"), ("69001", "C"), ("69002", "C"))
      .toDF("postal", "org")
    val ladder = Seq(
      Rung("postal", col("postal")),
      Rung("dept", substring(col("postal"), 1, 2)))
    val (rung, out) = Privacy.enforceLDiversity(df, ladder, col("org"), l = 2)
    assert(rung == 1)
    // dept 75 has {A, B} (kept), dept 69 has {C} only (suppressed)
    val kept = out.select("qi_generalized").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(kept == Seq("75") && out.count() == 2)
  }

  // ---- DP release -----------------------------------------------------------

  test("dp noise: array-lookup form equals the CASE chain for all hashes") {
    val eps = 0.5
    val u = spark.range(5000)
      .select(graft.sketch.Hll.hash60(concat(lit("p"), col("id"))).as("u"))
    val both = u.select(
      DpRelease.geometricNoise(col("u"), eps).as("a"),
      DpRelease.geometricNoiseArray(col("u"), eps).as("b"))
    assert(both.filter(col("a") =!= col("b")).isEmpty)
    // and at the table edges: u = 0 maps to the head entry, u = 2^60 - 1
    // to the clipped tail, identically in both forms
    val edges = Seq(0L, (1L << 60) - 1).toDF("u").select(
      DpRelease.geometricNoise(col("u"), eps).as("a"),
      DpRelease.geometricNoiseArray(col("u"), eps).as("b"))
    assert(edges.filter(col("a") =!= col("b")).isEmpty)
  }

  test("dp sums: clamped contributions, reproducible noise, exact audit") {
    val df = Seq(
      ("x", 5L), ("x", 500L), ("x", -3L), // clamps: 5 + 50 + 0
      ("y", 10L), ("y", 20L)).toDF("k", "v")
    val rel = DpRelease
      .noisySums(df, col("k"), "k", col("v"), lo = 0L, hi = 50L,
        eps = 1.0, releaseSalt = "s")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rel.map(t => (t._1, t._2)).toSeq == Seq(("x", 55L), ("y", 30L)))
    assert(rel.forall { case (_, n, k, out) => out == n + k })
    val again = DpRelease
      .noisySums(df, col("k"), "k", col("v"), lo = 0L, hi = 50L,
        eps = 1.0, releaseSalt = "s")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rel.toSeq == again.toSeq)
    // eps / sensitivity below the table's floor must refuse loudly
    intercept[IllegalArgumentException] {
      DpRelease.noisySums(df, col("k"), "k", col("v"),
        lo = 0L, hi = 1000000L, eps = 1.0, releaseSalt = "s")
    }
  }


  test("dp thresholds: monotone, total, and symmetric in k") {
    for (eps <- Seq(0.25, 0.5, 1.0, 2.0)) {
      val ts = DpRelease.thresholds(eps)
      assert(ts.last._1 == (1L << 60), s"eps=$eps last threshold must cover")
      assert(ts.map(_._1).sliding(2).forall(p => p(0) <= p(1)), s"eps=$eps monotone")
      assert(ts.head._2 == 0, s"eps=$eps first (largest-mass) entry is k=0")
      // enumeration alternates -k, +k after the 0 head
      val ks = ts.map(_._2)
      assert(ks.tail.grouped(2).zipWithIndex.forall {
        case (Seq(a, b), i) => a == -(i + 1) && b == i + 1
        case (Seq(a), i)    => a == -(i + 1) || a == i + 1 // clipped tail
      }, s"eps=$eps enumeration order")
    }
  }

  test("dp noise: distribution over many keys matches the geometric law") {
    val eps = 1.0
    val alpha = math.exp(-eps)
    val p0 = (1 - alpha) / (1 + alpha)
    val n = 20000
    val u = spark.range(n.toLong)
      .select(graft.sketch.Hll.hash60(concat(lit("k"), col("id"))).as("u"))
    val noise = u.select(DpRelease.geometricNoise(col("u"), eps).as("k"))
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pHat0 = noise.getOrElse(0L, 0L).toDouble / n
    assert(math.abs(pHat0 - p0) < 0.02, s"P(0): got $pHat0 want $p0")
    val mean = noise.map { case (k, c) => k.toDouble * c }.sum / n
    assert(math.abs(mean) < 0.05, s"mean noise $mean")
    val pm1 = (noise.getOrElse(1L, 0L) + noise.getOrElse(-1L, 0L)).toDouble / n
    assert(math.abs(pm1 - 2 * p0 * alpha) < 0.02, s"P(|1|): got $pm1")
  }

  test("dp release: reproducible under the same salt, shifted under another") {
    val df = Seq.tabulate(100)(i => s"dept-${i % 10}").toDF("d")
    def release(salt: String) = DpRelease
      .noisyCounts(df, col("d"), "d", eps = 1.0, releaseSalt = salt)
      .orderBy("d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = release("s1")
    assert(a.toSeq == release("s1").toSeq, "same salt must reproduce")
    assert(a.map(_._2).toSeq == release("s2").map(_._2).toSeq, "exact counts stable")
    assert(a.map(_._3).toSeq != release("s2").map(_._3).toSeq,
      "a fresh salt must redraw the noise")
    assert(a.forall { case (_, n, k, rel) => rel == math.max(n + k, 0L) })
  }

  test("dp quantiles: tracks exact quantiles at eps=1 on 10k rows; reproducible") {
    // 10k uniform values: each HDR bucket holds ~dozens of rows, so the
    // +/- few geometric noise at eps=1 can move a pick by at most about
    // a bucket — the released quantile stays within ~2x the sketch's own
    // relative error of the true percentile
    val df = (0 until 10000).map(i => ((i * 37 % 10000) / 10.0 + 1.0)).toDF("v")
    def release(salt: String) = DpRelease
      .noisyQuantiles(df, col("v"), Seq(0.5, 0.9), Nil, eps = 1.0, releaseSalt = salt)
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val got = release("s1")
    assert(got == release("s1"), "same salt must reproduce")
    val expected = Map(0.5 -> 500.5, 0.9 -> 900.4)
    got.foreach { case (q, est) =>
      val truth = expected(q)
      assert(math.abs(est - truth) / truth < 0.02,
        s"q=$q: released $est too far from $truth")
    }
  }
}
