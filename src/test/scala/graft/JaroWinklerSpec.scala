package graft

import org.apache.spark.sql.functions._

import graft.text.JaroWinklerExpr

/** Golden vectors captured from DuckDB's `jaro_winkler_similarity` (the
  * oracle engine) — the compute must match them EXACTLY, not within an
  * epsilon: q_jaro_linkage hash-compares the raw doubles.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val golden = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0),
    ("aaapppp", "ap", 0.7857142857142857),
    ("duane", "dwayne", 0.8400000000000001))

  test("compute matches DuckDB golden vectors bit-for-bit") {
    golden.foreach { case (a, b, want) =>
      val got = JaroWinklerExpr.compute(a, b)
      assert(got == want, s"jw('$a','$b') = $got, want $want")
      // symmetry
      assert(JaroWinklerExpr.compute(b, a) == want)
    }
  }

  test("expression path (codegen) equals the JVM compute; nulls propagate") {
    val df = golden.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(JaroWinklerExpr.jaroWinkler($"a", $"b")).as[Double].collect()
    assert(got.toSeq == golden.map(_._3))
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinklerExpr.jaroWinkler($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
  }

  test("registered SQL function is reachable") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("select jaro_winkler('martha', 'marhta') as jw").head()
    assert(r.getDouble(0) == 0.9611111111111111)
  }

  test("boost applies only above 0.7 jaro and caps the prefix at 4") {
    // long shared prefix, low similarity tail: jaro <= 0.7 -> no boost
    val low = JaroWinklerExpr.compute("abcdzzzzzzzz", "abcdqqqqqqqqqqqq")
    val jaroOnly = low // by construction the value IS the unboosted jaro
    assert(low <= 0.7 + 1e-12 || low > jaroOnly)
    // prefix cap: 6 shared chars count as 4
    val a = "prefixaa"; val b = "prefixbb"
    val jw = JaroWinklerExpr.compute(a, b)
    // recompute jaro by removing the boost equation with p=4
    // jw = j + 4*0.1*(1-j)  =>  j = (jw - 0.4)/0.6
    val j = (jw - 0.4) / 0.6
    assert(j > 0.7 && jw > j)
  }
}
