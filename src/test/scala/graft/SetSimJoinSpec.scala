package graft

import org.apache.spark.sql.functions._

import graft.dedup.SetSimJoin

/** Exactness of the prefix-filtered set-similarity self-join: on every
  * synthetic corpus the operator must return EXACTLY the pairs a
  * brute-force all-pairs Jaccard scan accepts — prefix filtering and the
  * length filter are pruning-only, never lossy.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Seq[String])], num: Int, den: Int) =
    (for {
      (ia, sa) <- rows
      (ib, sb) <- rows
      if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      if union > 0 && inter * den >= union * num
    } yield (ia, ib, inter, union)).sortBy(p => (p._1, p._2))

  private def run(rows: Seq[(Long, Seq[String])], num: Int, den: Int) = {
    val df = rows.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    SetSimJoin
      .selfJoin(df, "id", "s", num, den)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq
  }

  test("matches brute force on a mixed corpus at 3/5") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "f"), // j = 4/6 = 0.666 >= 0.6
      3L -> Seq("a", "b", "x", "y", "z"), // j(1,3) = 2/8 = 0.25
      4L -> Seq("a", "b", "c", "d", "e"), // exact dup of 1
      5L -> Seq("q", "r", "s"),
      6L -> Seq("q", "r", "s", "t"), // j = 3/4 = 0.75
      7L -> Seq("lone")
    )
    assert(run(rows, 3, 5) == brute(rows, 3, 5))
  }

  test("threshold boundary is inclusive and integer-exact") {
    // j = 3/5 exactly: inter 3, union 5
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e")
    )
    // inter=3 union=5 -> 3*5 >= 5*3 accepted at 3/5
    assert(run(rows, 3, 5) == Seq((1L, 2L, 3, 5)))
    // rejected at 2/3: 3*3 < 5*2
    assert(run(rows, 2, 3).isEmpty)
  }

  test("randomized corpora: pruning is lossless at several thresholds") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"t$i")
    val rows: Seq[(Long, Seq[String])] = (0 until 60).map { i =>
      val base = rnd.shuffle(vocab).take(3 + rnd.nextInt(8))
      (i.toLong, base)
    }
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5), (1, 1)))
      assert(run(rows, num, den) == brute(rows, num, den), s"at $num/$den")
  }

  test("two-table join matches brute force across tables at several thresholds") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"t$i")
    def corpus(n: Int, offset: Int): Seq[(Long, Seq[String])] =
      (0 until n).map(i =>
        ((i + offset).toLong, rnd.shuffle(vocab).take(3 + rnd.nextInt(6))))
    val lrows = corpus(25, 0)
    val rrows = corpus(40, 1000)
    def bruteX(num: Int, den: Int) =
      (for {
        (il, sl) <- lrows
        (ir, sr) <- rrows
        inter = sl.toSet.intersect(sr.toSet).size
        union = sl.toSet.union(sr.toSet).size
        if union > 0 && inter * den >= union * num
      } yield (il, ir, inter, union)).sortBy(p => (p._1, p._2))
    for ((num, den) <- Seq((2, 5), (1, 2), (4, 5))) {
      val ldf = lrows.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
      val rdf = rrows.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
      val got = graft.dedup.SetSimJoin
        .join(ldf, rdf, "id", "s", num, den)
        .orderBy("id_l", "id_r")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSeq
      assert(got == bruteX(num, den), s"at $num/$den")
    }
  }

  test("stored prefix index: searchIndex equals brute force, unseen tokens safe") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 25).map(i => s"t$i")
    val corpus: Seq[(Long, Seq[String])] = (0 until 40).map(i =>
      (i.toLong, rnd.shuffle(vocab).take(3 + rnd.nextInt(6))))
    // batch shares some docs verbatim, plus one with tokens the corpus
    // has never seen (df 0 keys must not break the probe)
    val batch: Seq[(Long, Seq[String])] =
      Seq((1000L, corpus(3)._2), (1001L, corpus(7)._2 :+ "unseen-x"),
        (1002L, Seq("unseen-a", "unseen-b", "unseen-c")))
    val dir = java.nio.file.Files.createTempDirectory("ssidx").toString + "/idx"
    val cdf = corpus.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    val bdf = batch.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    graft.dedup.SetSimJoin.writeIndex(cdf, "id", "s", 1, 2, dir)
    val got = graft.dedup.SetSimJoin
      .searchIndex(spark, dir, bdf, "id", "s")
      .orderBy("id_l", "id_r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq
    val want = (for {
      (ib, sb) <- batch
      (ic, sc) <- corpus
      inter = sb.toSet.intersect(sc.toSet).size
      union = sb.toSet.union(sc.toSet).size
      if union > 0 && inter * 2 >= union * 1
    } yield (ib, ic, inter, union)).sortBy(p => (p._1, p._2))
    assert(got == want)
    // the verbatim copy must surface as an exact match
    assert(got.exists { case (l, r, i, u) => l == 1000L && r == 3L && i == u })
  }

  test("appendIndex: searches stay exact after appends; drift audit reports") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 25).map(i => s"t$i")
    def gen(n: Int, off: Int) = (0 until n).map(i =>
      ((i + off).toLong, rnd.shuffle(vocab).take(3 + rnd.nextInt(6))))
    val base = gen(25, 0)
    val appended = gen(15, 100) :+ (200L, Seq("novel-a", "novel-b", "t1"))
    val probes = gen(8, 5000)
    def df(rows: Seq[(Long, Seq[String])]) =
      rows.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    val dir = java.nio.file.Files.createTempDirectory("ssapp").toString + "/idx"
    graft.dedup.SetSimJoin.writeIndex(df(base), "id", "s", 1, 2, dir)
    graft.dedup.SetSimJoin.appendIndex(spark, dir, df(appended), "id", "s")

    val got = graft.dedup.SetSimJoin
      .searchIndex(spark, dir, df(probes), "id", "s")
      .orderBy("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val corpus = base ++ appended
    val want = (for {
      (ib, sb) <- probes
      (ic, sc) <- corpus
      inter = sb.toSet.intersect(sc.toSet).size
      union = sb.toSet.union(sc.toSet).size
      if union > 0 && inter * 2 >= union * 1
    } yield (ib, ic, inter, union)).sortBy(p => (p._1, p._2))
    assert(got == want, "appended index must stay exact at the threshold")

    val drift = graft.dedup.SetSimJoin.orderDrift(
      spark, dir, df(appended), "id", "s")
    // 2 novel tokens out of the appended batch's occurrences
    assert(drift > 0.0 && drift < 0.2, s"drift $drift")
    assert(graft.dedup.SetSimJoin.orderDrift(spark, dir, df(base), "id", "s") == 0.0)
  }

  test("skew guard: a degenerate near-identical corpus refuses loudly; below cap, bit-identical") {
    // 40 docs sharing one 5-token template (plus a unique token each):
    // every template token's prefix bucket holds ~all docs — the
    // quadratic shape the guard exists for
    val degenerate: Seq[(Long, Seq[String])] = (1L to 40L).map { i =>
      i -> (Seq("t1", "t2", "t3", "t4", "t5") :+ s"u$i")
    }
    val df = degenerate.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    val e = intercept[Exception] {
      SetSimJoin.selfJoin(df, "id", "s", 2, 5, maxPostingsPerKey = Some(10)).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("setsim skew guard"),
      s"expected the loud refusal, got: ${e.getMessage}")

    // a healthy corpus under the same cap: results identical to unguarded
    val healthy: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "f"),
      3L -> Seq("p", "q", "r", "s"),
      4L -> Seq("p", "q", "r", "s", "t"),
      5L -> Seq("x", "y", "z")
    )
    val hdf = healthy.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(
      rows(SetSimJoin.selfJoin(hdf, "id", "s", 2, 5, maxPostingsPerKey = Some(10))) ==
        rows(SetSimJoin.selfJoin(hdf, "id", "s", 2, 5)),
      "below the cap the guard must be value-invisible")
    // two-table and stored-index paths carry the same guard
    assert(
      SetSimJoin.join(hdf, hdf.withColumnRenamed("id", "id2")
          .withColumn("id", col("id2") + 100).drop("id2"),
        "id", "s", 2, 5, maxPostingsPerKey = Some(10)).count() ==
        SetSimJoin.join(hdf, hdf.withColumnRenamed("id", "id2")
            .withColumn("id", col("id2") + 100).drop("id2"),
          "id", "s", 2, 5).count())
  }

  test("skew report ranks the hottest prefix keys with their candidate-pair mass") {
    val rows: Seq[(Long, Seq[String])] = (1L to 12L).map { i =>
      i -> (Seq("hot1", "hot2") :+ s"u$i") // both hot tokens in every prefix
    }
    val df = rows.toDF("id", "s").select($"id", array_distinct($"s").as("s"))
    val rep = SetSimJoin.prefixSkewReport(df, "id", "s", 2, 5, topN = 3)
      .collect()
    assert(rep.length == 3)
    val top = rep.head
    assert(top.getAs[Long]("n_postings") == 12L,
      "the universal token must top the report")
    assert(top.getAs[Double]("est_pairs") == 12.0 * 11 / 2)
    // descending by postings
    val counts = rep.map(_.getAs[Long]("n_postings")).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("duplicate elements in the input column do not inflate sizes") {
    val df = Seq((1L, Seq("a", "a", "b")), (2L, Seq("b", "a")))
      .toDF("id", "s")
      .select($"id", array_distinct($"s").as("s"))
    val got = SetSimJoin.selfJoin(df, "id", "s", 1, 1).collect()
    assert(got.length == 1 && got.head.getInt(2) == 2 && got.head.getInt(3) == 2)
  }
}
