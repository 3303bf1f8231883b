package graft

import graft.text.BpeLearn

class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merges on a hand-checkable corpus") {
    // 5x "hug", 2x "pug", 3x "hugs": pair counts round 1:
    // (h,u)=8, (u,g)=10, (p,u)=2, (g,s)=3 -> merge (u,g)
    // round 2: (h,ug)=8, (p,ug)=2, (ug,s)=3 -> merge (h,ug)
    // round 3: (p,ug)=2, (hug,s)=3 -> merge (hug,s)
    val text = (Seq.fill(5)("hug") ++ Seq.fill(2)("pug") ++ Seq.fill(3)("hugs"))
      .mkString(" ")
    val got = BpeLearn
      .learn(Seq(text).toDF("text"), "text", numMerges = 3)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1, "u", "g", 10L),
      (2, "h", "ug", 8L),
      (3, "hug", "s", 3L)))
  }

  test("greedy left-to-right merging: aaa merges once, not twice") {
    // 4x "aaa": round 1 pair (a,a) has count 8 (two per word); after the
    // merge each word is [aa, a], so round 2's top pair is (aa, a) = 4
    val text = Seq.fill(4)("aaa").mkString(" ")
    val got = BpeLearn
      .learn(Seq(text).toDF("text"), "text", numMerges = 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(("a", "a", 8L), ("aa", "a", 4L)))
  }

  test("word frequency weights the pair counts; ties break lexicographically") {
    // "ab" x3 and "cd" x3: both pairs count 3; (a,b) < (c,d) wins rank 1
    val text = (Seq.fill(3)("ab") ++ Seq.fill(3)("cd")).mkString(" ")
    val got = BpeLearn
      .learn(Seq(text).toDF("text"), "text", numMerges = 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got == Seq((1, "a", "b"), (2, "c", "d")))
  }
}
