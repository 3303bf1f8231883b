package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Page et al., 1999) over an edge list — the
  * graph-centrality pass a curation pipeline runs over a document-similarity
  * or link graph to pick authoritative representatives (e.g. which page of
  * a near-duplicate web cluster to keep).
  *
  * Declarative formulation: each superstep is `edges ⋈ ranks → groupBy(dst)
  * sum`, so one iteration costs two keyed shuffles (contribution join +
  * sum), both map-side combined, and Catalyst plans the whole fixed-depth
  * loop as ONE job with zero driver-side actions — `iters` is a
  * hyperparameter, not a convergence loop, matching how production
  * PageRank actually runs (fixed sweep count per refresh). At very large
  * `iters` a caller would checkpoint every few supersteps to truncate
  * lineage; at the 5-15 sweeps that saturate top-k orderings the
  * declarative plan is the better trade (no materialization barrier).
  *
  * Convention, stated: dangling nodes (no out-edges) leak their damped
  * mass rather than redistributing it — every engine implements one of the
  * two standard conventions; this one keeps the superstep a pure
  * edges-join (no global dangling-sum term), and the oracle twin replays
  * it term for term. Ranks therefore sum to < 1 when dangling nodes
  * exist; relative ordering — the thing consumers use — is unaffected.
  */
object PageRank {

  /** @param edges directed edges `(src, dst)`; parallel edges count twice
    * @param nodes one row per node (`idCol`) — defines the rank domain,
    *              including isolated nodes
    * @return `(id, rank)` per node
    */
  def ranks(
      edges: DataFrame,
      nodes: DataFrame,
      idCol: String,
      iters: Int = 5,
      damping: Double = 0.85
  ): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"pagerank: iters must be in [1,50] (checkpoint beyond that), got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pagerank: damping must be in (0,1), got $damping")
    // scala-side constant so the oracle can embed the IDENTICAL double
    // literal: (1.0 - 0.85) in double != cast(decimal 0.15 as double)
    val teleport = 1.0 - damping
    val n1 = nodes.agg(count(lit(1)).cast("double").as("n"))
    val base = nodes.select(col(idCol).as("id")).crossJoin(broadcast(n1))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = base.select(col("id"), col("n"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(deg, Seq("src"))
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("sm"))
      ranks = base
        .join(contribs, Seq("id"), "left")
        .select(
          col("id"),
          col("n"),
          (lit(teleport) / col("n") +
            lit(damping) * coalesce(col("sm"), lit(0.0))).as("rank"))
    }
    ranks.select(col("id"), col("rank"))
  }

  /** DuckDB twin: the same supersteps unrolled as a CTE chain (the
    * k-means-replay technique). Caller supplies the names of a `graph`
    * CTE (`src`, `dst`) and a nodes relation with an `id`-aliased select.
    */
  def duckCtes(
      nodesSelect: String,
      iters: Int = 5,
      damping: Double = 0.85
  ): String = {
    val teleport = 1.0 - damping
    val steps = (1 to iters).map { k =>
      s"""pr_r$k as (
          select b.id, b.n,
            cast($teleport as double) / b.n +
              cast($damping as double) * coalesce(s.sm, 0.0) as rank
          from pr_base b left join (
            select g.dst as id, sum(r.rank / d.deg) as sm
            from graph g
            join pr_deg d using (src)
            join pr_r${k - 1} r on r.id = g.src
            group by g.dst) s using (id))"""
    }.mkString(",\n        ")
    s"""pr_n as (select cast(count(*) as double) as n from ($nodesSelect)),
        pr_base as (select id, pr_n.n from ($nodesSelect) cross join pr_n),
        pr_deg as (select src, count(*) as deg from graph group by src),
        pr_r0 as (select id, n, 1.0 / n as rank from pr_base),
        $steps"""
  }
}
