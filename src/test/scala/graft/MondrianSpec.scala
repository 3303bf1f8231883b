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
