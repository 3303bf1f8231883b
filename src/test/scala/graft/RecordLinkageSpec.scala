package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("normalize lowercases and strips all non-[a-z0-9 ] chars") {
    val got = Seq("Brand#13", "A-B c_d 9!").toDF("s")
      .select(RecordLinkage.normalize($"s"))
      .as[String].collect().toSeq
    assert(got == Seq("brand13", "ab cd 9"))
  }

  test("editSim: identical=1, empty-vs-empty=1, disjoint tends to 0") {
    val got = Seq(("abc", "abc"), ("", ""), ("abc", "xyz"), ("abcd", "abce"))
      .toDF("a", "b")
      .select(RecordLinkage.editSim($"a", $"b").as("s"))
      .as[Double].collect().toSeq
    assert(got(0) == 1.0 && got(1) == 1.0 && got(2) == 0.0 && got(3) == 0.75)
  }

  test("link emits only same-block pairs, each once, with weighted score") {
    val df = Seq(
      (1L, "blk1", "acme corp", "Brand#1", 100.0),
      (2L, "blk1", "acme corp", "Brand#1", 100.5),
      (3L, "blk1", "zzzz ltd", "Brand#2", 900.0),
      (4L, "blk2", "acme corp", "Brand#1", 100.0)
    ).toDF("id", "blk", "name", "addr", "bal")
    val got = RecordLinkage
      .link(df, "id", Seq("blk"), "name", "addr", "bal", balTol = 1.0)
      .orderBy("id_a", "id_b")
      .collect()
    // block blk1 has 3 pairs; id 4 (blk2) pairs with nobody
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val p12 = got.head
    assert(p12.getDouble(2) == 1.0) // name_sim
    assert(p12.getDouble(3) == 1.0) // addr_sim
    assert(p12.getDouble(4) == 1.0) // bal_sim within tol
    assert(p12.getDouble(5) == 1.0) // 0.5 + 0.3 + 0.2
  }
}
