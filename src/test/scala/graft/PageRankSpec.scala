package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Fixed-iteration PageRank invariants on hand-built graphs. */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def rankMap(
      edges: Seq[(Long, Long)],
      nodes: Seq[Long],
      iters: Int = 20
  ): Map[Long, Double] =
    PageRank
      .ranks(edges.toDF("src", "dst"), nodes.toDF("id"), "id", iters = iters)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  test("a directed cycle is rank-uniform at exactly 1/n") {
    val n = 5L
    val edges = (0L until n).map(i => i -> ((i + 1) % n))
    val r = rankMap(edges, 0L until n)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12, r))
    // no dangling nodes -> total mass conserved
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("an authority pointed to by everyone outranks its spokes") {
    // star: 1..5 -> 0, plus 0 -> 1 so node 0 is not dangling
    val edges = (1L to 5L).map(_ -> 0L) :+ (0L -> 1L)
    val r = rankMap(edges, 0L to 5L)
    assert((2L to 5L).forall(i => r(0L) > r(i)),
      s"hub must outrank spokes: $r")
    assert(r(1L) > r(2L), "the hub's sole out-neighbor inherits its mass")
  }

  test("dangling and isolated nodes: teleport floor, leaked mass, stated convention") {
    // 0 -> 1 (1 is dangling: absorbs but never emits); 2 is isolated
    val r = rankMap(Seq(0L -> 1L), Seq(0L, 1L, 2L))
    val teleportFloor = 0.15 / 3.0
    // isolated node: exactly the teleport share, no incoming mass
    assert(math.abs(r(2L) - teleportFloor) < 1e-12)
    assert(r(1L) > r(0L), "the dangling sink still accumulates rank")
    // the documented convention: dangling mass LEAKS, total < 1
    assert(r.values.sum < 1.0 - 1e-6)
  }

  test("parallel edges weigh double") {
    // 0 sends to 1 twice and 2 once: 1 gets 2/3 of 0's emission
    val edges = Seq(0L -> 1L, 0L -> 1L, 0L -> 2L, 1L -> 0L, 2L -> 0L)
    val r = rankMap(edges, 0L to 2L)
    assert(r(1L) > r(2L), s"doubled edge must carry double mass: $r")
  }

  test("deterministic across runs and bounded iteration guard") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 2L)
    assert(rankMap(edges, 0L to 2L) == rankMap(edges, 0L to 2L))
    intercept[IllegalArgumentException] {
      PageRank.ranks(edges.toDF("src", "dst"),
        (0L to 2L).toDF("id"), "id", iters = 51)
    }
  }
}
