package graft

import org.apache.spark.sql.functions._

import graft.validate.KAnonymity
import graft.validate.KAnonymity.Rung

/** Generalize-to-k enforcement specs. */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private def ladderOf(zipCol: String) = Seq(
    Rung("zip", col(zipCol)),
    Rung("dept", substring(col(zipCol), 1, 2)),
    Rung("country", lit("FR"))
  )

  test("probe: one grouping-sets pass reports every rung's floor (null = its own group)") {
    // zips: 751xx x6 (two distinct), 920xx x3, null x2
    val zips = Seq("75101", "75101", "75101", "75102", "75102", "75102",
      "92001", "92001", "92001", null, null)
    val df = zips.zipWithIndex.map { case (z, i) => (i.toLong, z) }.toDF("id", "zip")
    val audits = KAnonymity.probe(df, ladderOf("zip"))
    assert(audits.map(_.label) == Seq("zip", "dept", "country"))
    assert(audits(0).nGroups == 4 && audits(0).minGroup == 2) // null group of 2
    assert(audits(1).nGroups == 3 && audits(1).minGroup == 2) // 75 x6, 92 x3, null x2
    assert(audits(2).nGroups == 1 && audits(2).minGroup == 11)
  }

  test("enforce picks the FIRST rung meeting k; rows keep their generalized value") {
    // zip groups of 3 < k=5; dept groups: 75 x6, 92 x6 -> rung 1
    val zips = (1 to 3).map(_ => "75101") ++ (1 to 3).map(_ => "75102") ++
      (1 to 3).map(_ => "92001") ++ (1 to 3).map(_ => "92002")
    val df = zips.zipWithIndex.map { case (z, i) => (i.toLong, z) }.toDF("id", "zip")
    val (rung, out) = KAnonymity.enforce(df, ladderOf("zip"), k = 5)
    assert(rung == 1)
    assert(out.count() == 12) // nothing suppressed
    val vals = out.select("qi_generalized").distinct().as[String].collect().toSet
    assert(vals == Set("75", "92"))
    val minG = out.groupBy("qi_generalized").count().agg(min("count")).as[Long].head()
    assert(minG >= 5)
  }

  test("enforce falls back to coarsest + suppression when no rung reaches k") {
    // 3 rows total: every rung (even 'FR') has a group of 3 < k=5
    val df = Seq((1L, "75101"), (2L, "92001"), (3L, "13001")).toDF("id", "zip")
    val (rung, out) = KAnonymity.enforce(df, ladderOf("zip"), k = 5)
    assert(rung == 2)
    assert(out.count() == 0) // the single FR group of 3 is suppressed
    // with a mixed case, only the small residual groups drop
    val df2 = ((1 to 6).map(i => (i.toLong, "75101")) ++ Seq((7L, null.asInstanceOf[String])))
      .toDF("id", "zip")
    val shortLadder = Seq(Rung("zip", col("zip"))) // no coarser escape
    val (r2, out2) = KAnonymity.enforce(df2, shortLadder, k = 5)
    assert(r2 == 0)
    assert(out2.count() == 6) // the null singleton suppressed, 75101 kept
    val left = out2.select("qi_generalized").distinct().as[String].collect().toSeq
    assert(left == Seq("75101"))
  }

  test("enforce refuses an output-column collision") {
    val df = Seq((1L, "75101")).toDF("id", "qi_generalized")
    val ex = intercept[IllegalArgumentException] {
      KAnonymity.enforce(df, Seq(Rung("z", col("qi_generalized"))), k = 1)
    }
    assert(ex.getMessage.contains("already exists"))
  }

  // ---- multi-QI lattice -------------------------------------------------

  import graft.validate.KAnonymity.QiDim

  private def twoDims(zipCol: String, orgCol: String) = Seq(
    QiDim("zip", Seq(col(zipCol), substring(col(zipCol), 1, 2), lit("FR"))),
    QiDim("org", Seq(col(orgCol), lit("ANY"))))

  test("probeLattice: one pass audits every lattice state; order is cost-then-enumeration") {
    // 6 rows: zips 751xx/920xx, orgs a/b
    val df = Seq(
      (1L, "75101", "a"), (2L, "75101", "a"), (3L, "75102", "b"),
      (4L, "92001", "a"), (5L, "92001", "b"), (6L, "92002", "b")
    ).toDF("id", "zip", "org")
    val (ordered, audits) = KAnonymity.probeLattice(df, twoDims("zip", "org"))
    assert(ordered == Seq(
      Seq(0, 0), Seq(0, 1), Seq(1, 0), Seq(1, 1), Seq(2, 0), Seq(2, 1)))
    // finest state: (75101,a) x2 and four singletons -> min 1, 5 groups
    assert(audits(Seq(0, 0)) == ((5L, 1L)))
    // (zip, ANY): zip groups 2/1/2/1 -> min 1
    assert(audits(Seq(0, 1)) == ((4L, 1L)))
    // (dept, org): (75,a)x2 (75,b)x1 (92,a)x1 (92,b)x2 -> min 1
    assert(audits(Seq(1, 0)) == ((4L, 1L)))
    // (dept, ANY): 75x3, 92x3
    assert(audits(Seq(1, 1)) == ((2L, 3L)))
    // (FR, org): a x3, b x3
    assert(audits(Seq(2, 0)) == ((2L, 3L)))
    assert(audits(Seq(2, 1)) == ((1L, 6L)))
  }

  test("enforceMulti picks the MINIMAL generalization whose joint floor reaches k") {
    // k=3: states (1,1) and (2,0) both reach 3 at cost 2; (1,1) wins the
    // enumeration tie-break (earlier dim stays finer... enumeration order)
    val df = Seq(
      (1L, "75101", "a"), (2L, "75101", "a"), (3L, "75102", "b"),
      (4L, "92001", "a"), (5L, "92001", "b"), (6L, "92002", "b")
    ).toDF("id", "zip", "org")
    val (levels, out) = KAnonymity.enforceMulti(df, twoDims("zip", "org"), k = 3)
    assert(levels == Seq(1, 1))
    assert(out.count() == 6)
    val floors = out.groupBy("zip_gen", "org_gen").count().agg(min("count")).as[Long].head()
    assert(floors >= 3)
    assert(out.columns.contains("zip_gen") && out.columns.contains("org_gen"))
    // and a finer k: the finest qualifying state is chosen, not the first
    // FOUND coarser one — k=1 must keep everything at (0,0)
    val (l1, _) = KAnonymity.enforceMulti(df, twoDims("zip", "org"), k = 1)
    assert(l1 == Seq(0, 0))
  }

  test("enforceMulti suppresses residual joint groups when no state reaches k") {
    // 7 rows, k=5: even (FR, ANY) has... 7 >= 5, so shrink: 3 rows only
    val small = Seq((1L, "75101", "a"), (2L, "92001", "b"), (3L, "13001", "a"))
      .toDF("id", "zip", "org")
    val (levels, out) = KAnonymity.enforceMulti(small, twoDims("zip", "org"), k = 5)
    assert(levels == Seq(2, 1)) // coarsest
    assert(out.count() == 0)    // the single (FR, ANY) group of 3 suppressed
    // mixed: one joint group >= k survives, the null-keyed singleton drops
    val mixed = ((1 to 5).map(i => (i.toLong, "75101", "a")) :+
      ((6L, null.asInstanceOf[String], "a")))
      .toDF("id", "zip", "org")
    val shortDims = Seq(
      QiDim("zip", Seq(col("zip"))), QiDim("org", Seq(col("org"))))
    val (l2, out2) = KAnonymity.enforceMulti(mixed, shortDims, k = 5)
    assert(l2 == Seq(0, 0))
    assert(out2.count() == 5)
  }

  // ---- staged lattice (> 64 states) -------------------------------------

  /** 5 x 4 x 4 = 80 lattice states — beyond the single-pass cap, so
    * enforceMulti must stage the walk.
    */
  private def bigDims = Seq(
    QiDim("zip", Seq(col("zip"), substring(col("zip"), 1, 4),
      substring(col("zip"), 1, 3), substring(col("zip"), 1, 2), lit("*"))),
    QiDim("org", Seq(col("org"), substring(col("org"), 1, 2),
      substring(col("org"), 1, 1), lit("ANY"))),
    QiDim("age", Seq(col("age"), (floor(col("age") / 10) * 10).cast("int"),
      (floor(col("age") / 40) * 40).cast("int"), lit(0))))

  private def bigDf = (0 until 120).map { i =>
    (i.toLong, f"AB${i % 60}%03d", s"O${i % 8}x", 20 + (i % 10))
  }.toDF("id", "zip", "org", "age")

  /** Brute-force replay: materialize every ladder column ONCE, then group
    * in plain Scala per state — the oracle the staged walk must match.
    */
  private def bruteForceChoice(
      df: org.apache.spark.sql.DataFrame,
      dims: Seq[QiDim],
      k: Int): Option[Seq[Int]] = {
    val flatCols = dims.zipWithIndex.flatMap { case (d, di) =>
      d.ladder.zipWithIndex.map { case (c, li) => c.as(s"d${di}_l$li") }
    }
    val colIdx: Map[(Int, Int), Int] = dims.zipWithIndex.flatMap { case (d, di) =>
      d.ladder.indices.map(li => (di, li))
    }.zipWithIndex.toMap
    val rows = df.select(flatCols: _*).collect().map(_.toSeq)
    val states = dims
      .map(_.ladder.indices.toSeq)
      .foldLeft(Seq(Seq.empty[Int]))((acc, ls) => acc.flatMap(s => ls.map(s :+ _)))
    states.sortBy(_.sum).find { st =>
      val sizes = rows
        .groupBy(r => st.zipWithIndex.map { case (l, d) => r(colIdx((d, l))) })
        .map(_._2.length)
      sizes.nonEmpty && sizes.min >= k
    }
  }

  test("enforceMulti stages an 80-state lattice and matches the brute-force optimum") {
    val df = bigDf
    // k=6: fine joint states are singleton-riddled (zip x org x age combos
    // over 120 rows), so the optimum sits several generalization steps in
    val expected = bruteForceChoice(df, bigDims, k = 6)
    assert(expected.nonEmpty, "test data must have a passing state")
    val (levels, out) = KAnonymity.enforceMulti(df, bigDims, k = 6)
    assert(Some(levels) == expected,
      s"staged walk chose $levels, brute force says $expected")
    assert(out.count() == 120) // nothing suppressed at a passing state
    val genCols = Seq("zip_gen", "org_gen", "age_gen").map(col)
    val floorG = out.groupBy(genCols: _*).count().agg(min("count")).as[Long].head()
    assert(floorG >= 6)
    // and a lower k agrees too (likely a different, finer chunk)
    val expected2 = bruteForceChoice(df, bigDims, k = 2)
    val (levels2, _) = KAnonymity.enforceMulti(df, bigDims, k = 2)
    assert(Some(levels2) == expected2)
  }

  test("staged walk: infeasible lattice exhausts every chunk, then suppresses") {
    // k exceeds the row count: even the fully-generalized single group of
    // 120 fails, so the exhaustive walk finds nothing and the fallback
    // suppresses everything (no coarsest-state short-circuit — it would
    // silently assume ladder monotonicity the <= 64 path doesn't)
    val (levels, out) = KAnonymity.enforceMulti(bigDf, bigDims, k = 121)
    assert(levels == Seq(4, 3, 3))
    assert(out.count() == 0)
  }

  test("probeStates chunk probe agrees with the one-pass full-lattice probe") {
    val df = Seq(
      (1L, "75101", "a"), (2L, "75101", "a"), (3L, "75102", "b"),
      (4L, "92001", "a"), (5L, "92001", "b"), (6L, "92002", "b")
    ).toDF("id", "zip", "org")
    val dims = twoDims("zip", "org")
    val (ordered, full) = KAnonymity.probeLattice(df, dims)
    // probe the same states in chunks of 2: every audit must be identical
    ordered.grouped(2).foreach { chunk =>
      val part = KAnonymity.probeStates(df, dims, chunk)
      chunk.foreach(st => assert(part(st) == full(st), s"state $st diverged"))
    }
  }

  test("enforceMulti with one dimension degenerates to the single-QI ladder") {
    val zips = (1 to 3).map(_ => "75101") ++ (1 to 3).map(_ => "75102") ++
      (1 to 3).map(_ => "92001") ++ (1 to 3).map(_ => "92002")
    val df = zips.zipWithIndex.map { case (z, i) => (i.toLong, z) }.toDF("id", "zip")
    val dims = Seq(QiDim("zip", ladderOf("zip").map(_.qi)))
    val (levels, out) = KAnonymity.enforceMulti(df, dims, k = 5)
    val (rung, outSingle) = KAnonymity.enforce(df, ladderOf("zip"), k = 5)
    assert(levels == Seq(rung))
    assert(out.select(col("zip_gen")).collect().toSeq.sortBy(_.toString) ==
      outSingle.select(col("qi_generalized")).collect().toSeq.sortBy(_.toString))
  }
}
