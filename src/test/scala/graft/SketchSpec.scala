package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.{Bloom, Cms, HdrHistogram, Hll}

/** The mergeable sketch layer: HLL distinct, count-min frequencies,
  * HDR-histogram quantiles, bloom membership. Each sketch pins (a) its
  * accuracy guarantee on real-ish data, (b) exact mergeability —
  * merge-of-parts == sketch-of-whole as DATA, not approximately — and
  * (c) the cross-engine hash contract where one exists.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def vals(n: Int): DataFrame =
    spark.range(n.toLong).select(concat(lit("value-"), col("id")).as("v"))

  // ---- shared hash contract ----------------------------------------------

  test("hash60: Spark SQL conv(md5) and the JVM digest path agree") {
    val samples = Seq("hello", "", "a", "Ünïcodé ✓", "0|shingle one two")
    val viaSql = samples.toDF("v")
      .select(Hll.hash60(col("v")).as("h"))
      .collect().map(_.getLong(0))
    val viaJvm = samples.map(s =>
      Bloom.hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    assert(viaSql.toSeq == viaJvm)
    // pinned value, cross-checked against DuckDB:
    //   cast('0x'||substr(md5('hello'),1,15) as bigint)
    assert(Bloom.hash60("hello".getBytes("UTF-8")) == 419982666956583591L)
  }

  // ---- HLL ---------------------------------------------------------------

  test("hll: estimate within 5% on 10k distinct values") {
    val est = Hll.estimate(Hll.sketch(vals(10000), col("v")))
      .head().getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05, s"est=$est")
  }

  test("hll: linear-counting regime is near-exact at small cardinality") {
    val est = Hll.estimate(Hll.sketch(vals(100), col("v")))
      .head().getDouble(0)
    assert(math.abs(est - 100.0) < 3.0, s"est=$est")
  }

  test("hll: duplicates do not move the sketch") {
    val once = Hll.sketch(vals(500), col("v"))
    val tripled = Hll.sketch(
      vals(500).unionAll(vals(500)).unionAll(vals(500)), col("v"))
    assert(once.except(tripled).isEmpty && tripled.except(once).isEmpty)
  }

  test("hll: merge of disjoint part sketches equals the whole-corpus sketch") {
    val whole = vals(4000)
    val parts = (0 until 4).map(i =>
      Hll.sketch(whole.filter(col("id") % 4 === i), col("v")))
    val merged = Hll.merge(parts.reduce(_ unionAll _))
    val direct = Hll.sketch(whole, col("v"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("hll: per-group sketch estimates per group") {
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("v"), col("id")).as("v"))
    val out = Hll.estimate(Hll.sketch(df, col("v"), Seq("g")), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("0", "1", "2"))
    out.values.foreach(e => assert(math.abs(e - 1000.0) / 1000.0 < 0.08))
  }

  test("hll: multi-column sketch pass equals per-column sketches") {
    val df = spark.range(2000).select(
      col("id"),
      (col("id") % 7).cast("string").as("cat"),
      when(col("id") % 5 === 0, lit(null)).otherwise(concat(lit("v"), col("id")))
        .as("sparse"))
    val multi = Hll.sketchColumns(df, Seq("id", "cat", "sparse"))
    Seq("id", "cat", "sparse").foreach { c =>
      val single = Hll.sketch(df, col(c).cast("string"))
      val slice = multi.filter(col("col_name") === c).select("bucket", "r")
      assert(slice.except(single).isEmpty && single.except(slice).isEmpty,
        s"column $c: multi-pass sketch differs from the direct sketch")
    }
    // null skipping matches count(distinct): 1600 non-null sparse values
    val est = Hll.estimate(
      multi.filter(col("col_name") === "sparse").select("bucket", "r"))
      .head().getDouble(0)
    assert(math.abs(est - 1600.0) / 1600.0 < 0.05, s"est=$est")
  }

  // ---- count-min ---------------------------------------------------------

  private def zipfTokens: DataFrame =
    // token-i appears (40 - i) times, i in 0..39 — known exact counts
    spark.range(40).select(col("id"), (lit(40) - col("id")).as("n"))
      .select(explode(sequence(lit(1L), col("n"))).as("rep"), col("id"))
      .select(concat(lit("tok"), col("id")).as("tok"))

  test("cms: never undercounts, and overcount is bounded by the guarantee") {
    val toks = zipfTokens
    val sk = Cms.sketch(toks, col("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val est = Cms.estimate(sk, exact, col("tok"))
      .withColumnRenamed("value", "tok")
    val joined = exact.join(est, Seq("tok")).collect()
    assert(joined.length == 40)
    joined.foreach { r =>
      val (ex, cm) = (r.getLong(1), r.getLong(2))
      assert(cm >= ex, s"${r.getString(0)}: cms $cm < exact $ex")
      // n = 820 instances, w = 1024: 2n/w bound ≈ 1.6 per row expectation;
      // allow generous slack — the INVARIANT here is no-undercount
      assert(cm - ex <= 50, s"${r.getString(0)}: overcount ${cm - ex}")
    }
  }

  test("cms: never-seen values estimate 0, not missing") {
    val sk = Cms.sketch(zipfTokens, col("tok"))
    val absent = Seq("absent-x", "absent-y", "tok3").toDF("tok")
    val est = Cms.estimate(sk, absent, col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set("absent-x", "absent-y", "tok3"),
      s"absent probes must not vanish: $est")
    // with w=1024 and 40 tokens, an absent value virtually always has at
    // least one empty cell -> exact 0; and it can NEVER undercount
    assert(est("absent-x") == 0L && est("absent-y") == 0L, est.toString)
    assert(est("tok3") >= 37L) // present token keeps its guarantee
  }

  test("cms: merge of slice sketches equals the whole-corpus sketch") {
    val toks = zipfTokens.withColumn("slice", monotonically_increasing_id() % 3)
    val parts = (0 until 3).map(i =>
      Cms.sketch(toks.filter(col("slice") === i), col("tok")))
    val merged = Cms.merge(parts.reduce(_ unionAll _))
    val direct = Cms.sketch(toks, col("tok"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("cms: join-size estimate never undercounts and is 0 for disjoint keys") {
    val a = (1 to 100).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")).toDF("k")
    val b = (50 to 150).map(i => s"k$i").toDF("k")
    val est = Cms
      .joinSizeEstimate(Cms.sketch(a, col("k")), Cms.sketch(b, col("k")))
      .collect()(0).getLong(0)
    val exact = a.join(b, Seq("k")).count()
    assert(est >= exact, s"inner-product estimate $est < exact $exact")
    assert(est <= exact + 100, s"overcount ${est - exact} implausibly large")

    val disjoint = Seq("z1", "z2").toDF("k")
    val zero = Cms
      .joinSizeEstimate(Cms.sketch(a, col("k")), Cms.sketch(disjoint, col("k")))
      .collect()(0).getLong(0)
    // 2 probe keys vs 1024 buckets: d=4 rows each have a collision-free
    // row with overwhelming probability -> min over the full spine is 0
    assert(zero >= 0L && zero <= 10L, s"disjoint estimate $zero")
  }

  // ---- HDR histogram -----------------------------------------------------

  test("hdr: bucket index is monotone and reconstruction is within 1/128") {
    val xs = Seq(0.0, 1e-6, 0.5, 1.0, 3.14159, 127.0, 128.0, 1000.5,
      123456.789, 8.6e8)
    val df = xs.toDF("x").select(
      col("x"),
      HdrHistogram.bucketIdx(col("x")).as("idx"))
    val rows = df.select(col("x"), col("idx"),
      HdrHistogram.bucketMid(col("idx")).as("mid")).collect()
    val idxs = rows.map(_.getLong(1))
    assert(idxs.toSeq == idxs.sorted.toSeq, "bucketIdx must be monotone")
    rows.foreach { r =>
      val (x, mid) = (r.getDouble(0), r.getDouble(2))
      if (x > 1e-4) // below the fixed-point scale the abs error dominates
        assert(math.abs(mid - x) / x <= 1.0 / 128 + 1e-6,
          s"x=$x mid=$mid")
    }
  }

  test("hdr: quantile estimates track exact percentiles within bucket error") {
    val df = spark.range(10000)
      .select((pow(col("id").cast("double") + 1.0, 1.5) / 7.0).as("x"))
    val sk = HdrHistogram.sketch(df, col("x"))
    val qs = Seq(0.5, 0.9, 0.99)
    val est = HdrHistogram.quantiles(sk, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = df.stat.approxQuantile("x", qs.toArray, 0.0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) / ex <= 1.0 / 128 + 1e-3,
        s"q=$q est=${est(q)} exact=$ex")
    }
  }

  test("hdr: percentile rank joins every row and tracks exact percent_rank") {
    val df = (1 to 2000).map(i => (i.toLong, (i * 13 % 2000) / 2.0 + 1.0)).toDF("id", "v")
    val sk = HdrHistogram.sketch(df, col("v"))
    val pr = HdrHistogram.percentileRank(sk, df, col("v"))
    assert(pr.count() == 2000, "self-normalization must keep every row")
    val rows = pr
      .withColumn("exact",
        org.apache.spark.sql.functions.percent_rank().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
      .select("pct_rank", "exact")
      .collect()
    rows.foreach { r =>
      val (est, ex) = (r.getDouble(0), r.getDouble(1))
      assert(est >= ex - 0.001, s"sketch rank $est below exact $ex")
      // bucket granularity: everything in a bucket takes the bucket-END
      // rank, so the estimate can lead exact by at most one bucket's mass
      assert(est - ex <= 0.02, s"sketch rank $est leads exact $ex too far")
    }
  }

  test("hdr: merge of part histograms equals the whole histogram") {
    val df = spark.range(5000).select((col("id") % 977).cast("double").as("x"))
    val parts = (0 until 5).map(i =>
      HdrHistogram.sketch(df.filter(col("id") % 5 === i), col("x")))
    val merged = HdrHistogram.merge(parts.reduce(_ unionAll _))
    val direct = HdrHistogram.sketch(df, col("x"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  // ---- bloom -------------------------------------------------------------

  test("bloom: zero false negatives; false-positive rate near the formula") {
    val members = vals(5000)
    val filter = Bloom.build(members, col("v"))
    val probeMembers = members
      .select(Bloom.mightContain(filter, Bloom.DefaultBits, Bloom.DefaultK)(col("v")).as("hit"))
      .filter(!col("hit")).count()
    assert(probeMembers == 0L, "bloom returned a false negative")
    val nonMembers = spark.range(20000)
      .select(concat(lit("absent-"), col("id")).as("v"))
    val fp = nonMembers
      .select(Bloom.mightContain(filter, Bloom.DefaultBits, Bloom.DefaultK)(col("v")).as("hit"))
      .filter(col("hit")).count()
    // k=7, m=2^21, n=5000 -> theoretical FP ~ 4e-13; anything beyond a
    // stray handful means the bit layout is broken
    assert(fp <= 2L, s"false-positive count $fp out of 20000")
  }

  test("bloom: OR-merge equals build over the union") {
    val a = vals(1000).filter(col("v").substr(7, 1) < lit("5"))
    val b = vals(1000).filter(col("v").substr(7, 1) >= lit("5"))
    val fa = Bloom.build(a, col("v"))
    val fb = Bloom.build(b, col("v"))
    val merged = fa.zip(fb).map { case (x, y) => x | y }
    val whole = Bloom.build(vals(1000), col("v"))
    assert(merged.toSeq == whole.toSeq)
  }

  test("bloom: bytes round-trip") {
    val bits = Array(0L, -1L, 123456789L, Long.MinValue)
    assert(Bloom.fromBytes(Bloom.toBytes(bits)).toSeq == bits.toSeq)
  }

  test("bloom decontamination is bit-identical to the exact path") {
    val d = Tables.docsForTest(spark)
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val bench = d.filter(col("doc_id") % 7 === 0)
    val exact = graft.text.Decontaminate
      .overlapStats(corpus, bench, "doc_id", col("text"), k = 5)
    val bloom = graft.text.Decontaminate
      .overlapStatsBloom(corpus, bench, "doc_id", col("text"), k = 5)
    assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty)
  }

  private object Tables {
    def docsForTest(s: org.apache.spark.sql.SparkSession): DataFrame =
      graft.queries.Tables.read(s, "/root/testdata/sf0.001", "documents")
  }
}
