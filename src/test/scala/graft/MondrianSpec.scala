package graft

import org.apache.spark.sql.functions._

import graft.operators.Mondrian

/** Strict Mondrian k-anonymization (operators/Mondrian.scala): the
  * k-floor and partition invariants, the split rule's determinism, and
  * the degenerate shapes (unsplittable input, zero-range QIs, k larger
  * than the table). The engine-equality of the recursion itself is pinned
  * by q_mondrian's unrolled DuckDB twin.
  */
class MondrianSpec extends SparkSpec {
  import spark.implicits._

  private def customers = spark.read
    .parquet("/root/testdata/sf0.001/customer.parquet")
    .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))

  private val qis = Seq("c_nationkey", "c_acctbal")

  test("every published group holds at least k rows and they partition the table") {
    val k = 20
    val labeled = Mondrian.anonymize(customers, "c_custkey", qis, k)
    val ranges = Mondrian.groupRanges(labeled, "c_custkey", qis).collect()
    assert(ranges.nonEmpty)
    assert(ranges.forall(_.getAs[Long]("n_rows") >= k),
      "k-anonymity floor violated")
    assert(ranges.map(_.getAs[Long]("n_rows")).sum == customers.count(),
      "groups must partition the table")
    assert(labeled.select("c_custkey").distinct().count() == customers.count(),
      "no row may be duplicated or dropped")
    assert(ranges.length > 1, "sf0.001 customer at k=20 must actually split")
    // envelopes are honest: every row's QI lies inside its group's range
    val viol = labeled.groupBy("_gid")
      .agg(min(col("_q0")).as("lo0"), max(col("_q0")).as("hi0"),
        min(col("_q1")).as("lo1"), max(col("_q1")).as("hi1"),
        count(lit(1)).as("n"))
      .filter(col("lo0") > col("hi0") || col("lo1") > col("hi1") || col("n") < k)
    assert(viol.isEmpty)
  }

  test("the recursion is deterministic: two runs label identically") {
    val a = Mondrian.anonymize(customers, "c_custkey", qis, 20)
      .select("c_custkey", "_gid").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Mondrian.anonymize(customers, "c_custkey", qis, 20)
      .select("c_custkey", "_gid").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("k above half the table yields the single root group") {
    val n = customers.count()
    val ranges = Mondrian.groupRanges(
      Mondrian.anonymize(customers, "c_custkey", qis, (n / 2 + 1).toInt),
      "c_custkey", qis).collect()
    assert(ranges.length == 1 && ranges.head.getAs[Long]("n_rows") == n)
  }

  test("zero-range QIs never split; a widest-range split halves by rank") {
    // constant dim never chosen; the 0..99 dim splits 100 rows at rank 50
    val df = (0 until 100).map(i => (i.toLong, 7.0, i.toDouble)).toDF("id", "qa", "qb")
    val ranges = Mondrian.groupRanges(
      Mondrian.anonymize(df, "id", Seq("qa", "qb"), k = 25), "id", Seq("qa", "qb"))
      .orderBy("group_id").collect()
    assert(ranges.length == 4, "100 rows at k=25 must halve twice")
    assert(ranges.map(_.getAs[Long]("n_rows")).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(ranges.forall(r => r.getAs[Double]("qa_lo") == 7.0 &&
      r.getAs[Double]("qa_hi") == 7.0))
    // contiguous, non-overlapping qb envelopes — the bisection is by rank
    val bounds = ranges.map(r =>
      (r.getAs[Double]("qb_lo"), r.getAs[Double]("qb_hi"))).toSeq
    assert(bounds == Seq((0.0, 24.0), (25.0, 49.0), (50.0, 74.0), (75.0, 99.0)))
  }

  test("l-diversity guard blocks the split that would concentrate the sensitive value") {
    // qb is the widest QI, so the rank split sends rows 40..79 right —
    // and that side is all-"A": with l=3 the split must be refused and
    // the root published whole; with l=1 the guard is vacuous and the
    // same data splits into 4 groups of 20
    val df = (0 until 80).map { i =>
      val sv = if (i < 40) Seq("A", "B", "C")(i % 3) else "A"
      (i.toLong, i.toDouble, sv)
    }.toDF("id", "qb", "sv")
    val blocked = Mondrian.groupRanges(
      Mondrian.anonymize(df, "id", Seq("qb"), k = 20,
        sensitiveCol = Some("sv"), l = 3),
      "id", Seq("qb"), sensitiveCol = Some("sv")).collect()
    assert(blocked.length == 1, "the concentrating split must be refused")
    assert(blocked.head.getAs[Long]("n_rows") == 80L)
    assert(blocked.head.getAs[Long]("n_sensitive") == 3L)

    val vacuous = Mondrian.groupRanges(
      Mondrian.anonymize(df, "id", Seq("qb"), k = 20,
        sensitiveCol = Some("sv"), l = 1),
      "id", Seq("qb"), sensitiveCol = Some("sv"))
      .orderBy("group_id").collect()
    assert(vacuous.length == 4)
    assert(vacuous.map(_.getAs[Long]("n_rows")).toSeq == Seq(20L, 20L, 20L, 20L))
    // the all-"A" tail really is concentrated — the guard was load-bearing
    assert(vacuous.map(_.getAs[Long]("n_sensitive")).toSeq == Seq(3L, 3L, 1L, 1L))
  }

  test("t-closeness guard blocks the split that would skew the sensitive distribution") {
    // global distribution: 50 A / 30 B (p = 0.625 / 0.375). The rank
    // split on qb sends 0..39 left (20 A / 20 B -> TVD 0.125) and
    // 40..79 right (30 A / 10 B -> TVD 0.125): t = 0.1 refuses the root
    // split outright; t = 0.2 allows it, then blocks ONLY the right
    // child's follow-up (its left side 40..59 is all-A, TVD 0.375)
    // while the left child splits clean — all margins far from the
    // thresholds, so no boundary float sensitivity
    val df = (0 until 80).map { i =>
      val sv =
        if (i < 40) { if (i % 2 == 0) "A" else "B" }
        else if (i < 70) "A"
        else "B"
      (i.toLong, i.toDouble, sv)
    }.toDF("id", "qb", "sv")
    def groupsAt(t: Double) = Mondrian.groupRanges(
      Mondrian.anonymize(df, "id", Seq("qb"), k = 20,
        sensitiveCol = Some("sv"), maxTvd = Some(t)),
      "id", Seq("qb"), sensitiveCol = Some("sv"))
      .orderBy("group_id").collect()

    val tight = groupsAt(0.1)
    assert(tight.length == 1 && tight.head.getAs[Long]("n_rows") == 80L,
      "t=0.1 must refuse the root split (both children at TVD 0.125)")

    val loose = groupsAt(0.2)
    assert(loose.map(r => (r.getAs[Long]("group_id"), r.getAs[Long]("n_rows")))
      .toSeq == Seq((0L, 20L), (20L, 20L), (40L, 40L)),
      "t=0.2 must allow the balanced splits and block only the skewing one")
  }

  test("property: distributed recursion matches a sequential reference on random data") {
    // an independent ~30-line sequential Mondrian (depth-first recursion
    // instead of round-based iteration — the final partition is
    // order-independent because each split decision reads only its own
    // group plus the global ranges), with both guards, compared against
    // the distributed operator on seeded random datasets. Every float
    // the reference computes ((mx-mn)/g, c/n vs global) uses the same
    // IEEE ops as the operator, so agreement is exact, not approximate.
    final case class R(id: Long, qa: Double, qb: Double, sv: String)
    def reference(
        rows: Vector[R], k: Int, lOpt: Option[Int], tOpt: Option[Double]
    ): Set[Vector[Long]] = {
      val g1 = rows.map(_.qa).max - rows.map(_.qa).min
      val g2 = rows.map(_.qb).max - rows.map(_.qb).min
      val gDist = rows.groupBy(_.sv).view.mapValues(_.size.toLong).toMap
      val nTot = rows.size.toLong
      def tvdOk(side: Vector[R]): Boolean = tOpt.forall { t =>
        val n = side.size.toLong
        val cnts = side.groupBy(_.sv).view.mapValues(_.size.toLong).toMap
        val present = cnts.map { case (v, c) =>
          (BigInt(c) * nTot - BigInt(gDist(v)) * n).abs
        }.sum
        // keysIterator, NOT keys.map: mapping the key SET dedupes equal
        // global counts and silently inflates the absent mass
        val absent = BigInt(n) * (nTot - cnts.keysIterator.map(gDist).sum)
        (present + absent).toDouble <= 2.0 * t * n.toDouble * nTot.toDouble
      }
      def lOk(side: Vector[R]): Boolean =
        lOpt.forall(l => side.map(_.sv).distinct.size >= l)
      def split(g: Vector[R]): Vector[Vector[R]] = {
        if (g.size < 2 * k) return Vector(g)
        val nr1 = if (g1 > 0) (g.map(_.qa).max - g.map(_.qa).min) / g1 else 0.0
        val nr2 = if (g2 > 0) (g.map(_.qb).max - g.map(_.qb).min) / g2 else 0.0
        val best = math.max(nr1, nr2)
        if (!(best > 0)) return Vector(g)
        val sorted =
          if (nr1 == best) g.sortBy(r => (r.qa, r.id)) else g.sortBy(r => (r.qb, r.id))
        val (left, right) = sorted.splitAt(g.size / 2)
        if (!(lOk(left) && lOk(right) && tvdOk(left) && tvdOk(right))) Vector(g)
        else split(left) ++ split(right)
      }
      split(rows).map(_.map(_.id).sorted).toSet
    }

    for {
      seed <- Seq(1, 7, 42)
      (lOpt, tOpt) <- Seq(
        (None, None), (Some(3), None), (None, Some(0.22)), (Some(2), Some(0.3)))
    } {
      val rnd = new scala.util.Random(seed)
      val n = 150 + rnd.nextInt(150)
      val rows = Vector.tabulate(n) { i =>
        R(i.toLong, rnd.nextInt(40).toDouble,
          (rnd.nextInt(4000) / 7).toDouble, s"s${rnd.nextInt(6)}")
      }
      val expected = reference(rows, 12, lOpt, tOpt)
      val df = rows.map(r => (r.id, r.qa, r.qb, r.sv)).toDF("id", "qa", "qb", "sv")
      val labeled = Mondrian.anonymize(df, "id", Seq("qa", "qb"), k = 12,
        sensitiveCol = if (lOpt.isDefined || tOpt.isDefined) Some("sv") else None,
        l = lOpt.getOrElse(1), maxTvd = tOpt)
      val got = labeled.select("id", "_gid").collect()
        .groupBy(_.getLong(1)).values
        .map(_.map(_.getLong(0)).sorted.toVector).toSet
      assert(got == expected,
        s"seed=$seed l=$lOpt t=$tOpt: distributed partition diverges from reference")
    }
  }

  test("early-round rank: range-partitioned plan, bit-identical to the keyed window") {
    // round 0's _gid-keyed window is a SINGLE task sorting the whole
    // table (every row carries gid 0) — the scale-killer the r8 verdict
    // flagged. withRank must (a) produce exactly the keyed window's
    // ranks and (b) physically rank through the range-partitioned
    // (partition, group) window in early rounds, never a one-partition
    // sort of the data.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextDouble(), rnd.nextInt(2000))
    }
    val joined = rows.toDF("id", "_gid", "_q0", "_noise")
      .withColumn("_dim", lit(0))
      .withColumn("_cnt", lit(5000L))
    val sv = when(col("_dim") === 0, col("_q0")).otherwise(lit(null).cast("double"))

    // nRows above the bound forces the big-group plan; round 30 (groups
    // >= parallelism) and a small table each take the keyed window
    val big = Mondrian.RangeRankMinRows * 16
    val early = Mondrian.withRank(joined, sv, "id", round = 0, nRows = big)
    val late = Mondrian.withRank(joined, sv, "id", round = 30, nRows = big)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("_gid"), col("_rnk").cast("long"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(ranks(early) == ranks(late),
      "range-partitioned ranks must equal the keyed window's exactly")

    // plan shape: the big-group round-0 window partitions by
    // (_rpid, _gid) — cluster-width — and the data-sized sort is
    // range-partitioned
    val plan = early.queryExecution.executedPlan.toString
    assert(plan.contains("_rpid"),
      s"round-0 rank over a big table must go through the " +
        s"(partition, group) window:\n$plan")
    // late rounds keep the straight keyed window (no offset machinery),
    // and so does a table whose round-0 sort fits one healthy task —
    // the size-aware switch is what keeps small-scale runs on the
    // cheaper plan
    val latePlan = late.queryExecution.executedPlan.toString
    assert(!latePlan.contains("_rpid"))
    val small = Mondrian.withRank(joined, sv, "id", round = 0, nRows = 5000L)
    assert(!small.queryExecution.executedPlan.toString.contains("_rpid"))
    assert(ranks(small) == ranks(late))

    // ranks are longs on the range path: a >2^31-row round-0 group
    // cannot overflow (the keyed path would; it is never used there)
    assert(early.schema("_rnk").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("all-constant QIs and empty input both return the root labeling") {
    val const = (0 until 60).map(i => (i.toLong, 1.0, 2.0)).toDF("id", "qa", "qb")
    val r = Mondrian.groupRanges(
      Mondrian.anonymize(const, "id", Seq("qa", "qb"), k = 10), "id", Seq("qa", "qb"))
      .collect()
    assert(r.length == 1 && r.head.getAs[Long]("n_rows") == 60L)
    val empty = spark.emptyDataset[(Long, Double, Double)].toDF("id", "qa", "qb")
    assert(Mondrian.anonymize(empty, "id", Seq("qa", "qb"), 5).count() == 0L)
  }
}
