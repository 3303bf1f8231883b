package graft

import org.apache.spark.sql.functions._

import graft.text.{HeavyHitters, MisraGriesSketch, TextAnalysis}

/** Misra-Gries candidate sketch + exact two-pass heavy hitters. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch: superset guarantee and estimate error bound across partitions") {
    val cap = 10
    // known distribution: 2 heavy, 3 medium, 300 singletons
    val toks =
      Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
        Seq.fill(60)("m1") ++ Seq.fill(50)("m2") ++ Seq.fill(40)("m3") ++
        (0 until 300).map(i => s"cold_$i")
    val n = toks.size.toLong
    val df = toks.toDF("tok").repartition(13) // force partial + merge path
    val row = df.agg(MisraGriesSketch.sketch($"tok", cap).as("s"))
      .select($"s.total", $"s.candidates").head()
    assert(row.getLong(0) == n)
    val est = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= cap)
    val trueCounts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (cap + 1L)
    // every token with true count > n/(c+1) must be present...
    trueCounts.filter(_._2 > bound).keys.foreach { k =>
      assert(est.contains(k), s"true heavy hitter $k missing from sketch")
    }
    // ...and every estimate is an undercount by at most n/(c+1)
    est.foreach { case (k, e) =>
      val t = trueCounts(k)
      assert(e <= t && e >= t - bound, s"estimate $e for $k outside [$t-$bound, $t]")
    }
  }

  test("two-pass heavy hitters: exact and deterministic on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = HeavyHitters.heavyHitterTokens(docs, col("text"), minFrac = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // driver-side exact replay
    val inst = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0))
    val minCount = math.ceil(inst.length * 0.01).toLong
    val expect = inst.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toSeq
      .sortBy { case (t, c) => (-c, t) }
    assert(got == expect, s"got ${got.take(5)}... expect ${expect.take(5)}...")
    assert(got.nonEmpty)
    // stable across runs (merge-order jitter must not reach the output)
    val again = HeavyHitters.heavyHitterTokens(docs, col("text"), minFrac = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(again == got)
  }

  test("tokens over 64KB survive partial-aggregate serialization") {
    // writeUTF would throw UTFDataFormatException here — the sketch must
    // shuffle arbitrarily long retained tokens (base64 blobs, minified JS)
    val big = "x" * 70000
    val df = (Seq.fill(50)(big) ++ Seq.fill(30)("small")).toDF("tok").repartition(7)
    val row = df.agg(MisraGriesSketch.sketch($"tok", 4).as("s"))
      .select($"s.total", $"s.candidates").head()
    assert(row.getLong(0) == 80L)
    val est = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.contains(big), "the 70KB heavy hitter must survive the shuffle")
  }

  test("degenerate inputs: empty corpus yields empty output; bad minFrac refused") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitterTokens(empty, col("text"), 0.5).count() == 0)
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitterTokens(empty, col("text"), 0.0)
    }
    // a threshold implying an unboundable candidate set is refused
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitterTokens(empty, col("text"), 1e-6)
    }
    intercept[IllegalArgumentException] {
      MisraGriesSketch.sketch(col("text"), 0)
    }
  }
}
