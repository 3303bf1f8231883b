package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sketch.{Hll, Kmv}

/** KMV (k-minimum-values / bottom-k theta) sketch: exact determinism of the
  * bounded aggregate (k smallest DISTINCT hashes, any partitioning), exact
  * mergeability, estimate accuracy, and the pairwise-overlap estimator the
  * sketch exists for.
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  private def vals(n: Int, parts: Int = 7): DataFrame =
    spark.range(0, n.toLong, 1, parts)
      .select(concat(lit("value-"), col("id")).as("v"))

  /** brute-force k smallest distinct hash60 values via plain SQL. */
  private def bruteForce(df: DataFrame, k: Int): Seq[Long] =
    df.select(Hll.hash60(col("v")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .collect()
      .map(_.getLong(0))
      .toSeq

  test("kmv: sketch is exactly the k smallest distinct hashes, any partitioning") {
    for (parts <- Seq(1, 3, 13)) {
      val df = vals(2000, parts)
      val got = Kmv.sketch(df, col("v"), Nil, k = 64)
        .orderBy(col("h")).collect().map(_.getLong(0)).toSeq
      assert(got == bruteForce(df, 64), s"parts=$parts")
    }
  }

  test("kmv: duplicates do not move the sketch") {
    val once = Kmv.sketch(vals(500), col("v"), Nil, k = 32)
    val tripled = Kmv.sketch(
      vals(500).unionAll(vals(500)).unionAll(vals(500)), col("v"), Nil, k = 32)
    assert(once.except(tripled).isEmpty && tripled.except(once).isEmpty)
  }

  test("kmv: merge of part sketches equals the whole-corpus sketch") {
    val whole = vals(4000)
    val parts = (0 until 4).map(i =>
      Kmv.sketch(whole.filter(col("id") % 4 === i), col("v"), Nil, k = 64))
    val merged = Kmv.merge(parts.reduce(_ unionAll _), Nil, k = 64)
    val direct = Kmv.sketch(whole, col("v"), Nil, k = 64)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("kmv: estimate is exact below k and within 3/sqrt(k) above it") {
    val small = Kmv.distinctEstimate(
      Kmv.sketch(vals(100), col("v"), Nil, k = 256), Nil, k = 256)
      .head().getDouble(0)
    assert(small == 100.0, s"below-k estimate must be exact, got $small")
    val est = Kmv.distinctEstimate(
      Kmv.sketch(vals(10000), col("v"), Nil, k = 256), Nil, k = 256)
      .head().getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 3.0 / math.sqrt(256.0),
      s"est=$est")
  }

  test("kmv: per-group sketches stay within their group") {
    val df = spark.range(3000)
      .select(
        (col("id") % 3).cast("string").as("g"),
        concat(lit("value-"), col("id")).as("v"))
    val sk = Kmv.sketch(df, col("v"), Seq("g"), k = 16)
    val sizes = sk.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 16L))
    // each group's 16 rows are that group's own brute-force bottom-16
    for (g <- Seq("0", "1", "2")) {
      val got = sk.filter(col("g") === g).orderBy("h")
        .collect().map(_.getLong(1)).toSeq
      val want = bruteForce(df.filter(col("g") === g), 16)
      assert(got == want, s"group $g")
    }
  }

  test("kmv: pairwise overlap is exact when k covers the union") {
    // A = {0..599}, B = {400..999}: |A|=600, |B|=600, inter=200, union=1000
    val a = spark.range(0, 600).select(lit("a").as("source"),
      concat(lit("value-"), col("id")).as("v"))
    val b = spark.range(400, 1000).select(lit("b").as("source"),
      concat(lit("value-"), col("id")).as("v"))
    val sk = Kmv.sketch(a.unionAll(b), col("v"), Seq("source"), k = 1024)
    val r = Kmv.pairwiseOverlap(sk, "source", k = 1024).head()
    assert(r.getAs[Long]("kmv_window") == 1000L)
    assert(r.getAs[Long]("kmv_matches") == 200L)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("est_overlap") - 200.0) < 1e-9)
  }

  test("kmv: pairwise overlap estimates track truth at k << union") {
    val a = spark.range(0, 6000).select(lit("a").as("source"),
      concat(lit("value-"), col("id")).as("v"))
    val b = spark.range(4000, 10000).select(lit("b").as("source"),
      concat(lit("value-"), col("id")).as("v"))
    val sk = Kmv.sketch(a.unionAll(b), col("v"), Seq("source"), k = 256)
    val r = Kmv.pairwiseOverlap(sk, "source", k = 256).head()
    assert(r.getAs[Long]("kmv_window") == 256L)
    // true jaccard 0.2, true intersection 2000; 256-sample binomial noise
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.2) < 0.1,
      s"jaccard=${r.getAs[Double]("est_jaccard")}")
    assert(math.abs(r.getAs[Double]("est_overlap") - 2000.0) / 2000.0 < 0.5,
      s"overlap=${r.getAs[Double]("est_overlap")}")
  }

  test("kmv: aggregate agrees with the SQL row_number replay (oracle contract)") {
    val df = vals(3000, 11)
    val viaAgg = Kmv.sketch(df, col("v"), Nil, k = 128)
      .orderBy("h").collect().map(_.getLong(0)).toSeq
    val viaSql = df
      .select(Hll.hash60(col("v")).as("h")).distinct()
      .withColumn("rk", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rk") <= 128)
      .orderBy("h").collect().map(_.getLong(0)).toSeq
    assert(viaAgg == viaSql)
  }

  test("kmv: nulls are skipped, empty input yields an empty sketch") {
    val df = Seq(Some("x"), None, Some("y"), None).toDF("v")
    assert(Kmv.sketch(df, col("v"), Nil, k = 8).count() == 2)
    val empty = spark.emptyDataset[String].toDF("v")
    assert(Kmv.sketch(empty, col("v"), Nil, k = 8).count() == 0)
  }
}
