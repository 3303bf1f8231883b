package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity ENFORCEMENT — the step beyond
  * [[Validate.kAnonymityViolations]]'s detection (reference:
  * validate_anonymization.py:216-243 only reports): generalize a
  * quasi-identifier up a coarsening ladder until every group reaches size
  * k (global recoding), with last-resort suppression when even the
  * coarsest rung leaves small groups.
  *
  * The ladder is caller-supplied, ordered fine -> coarse (e.g. postal code
  * -> department -> region -> country; or geohash precision 5 -> 4 -> 3).
  * The chosen rung is the FIRST whose minimum group size is >= k — a
  * deterministic, data-dependent decision both engines can replay.
  *
  * Scale shape: ONE probe pass computes every rung's group-size floor
  * simultaneously via grouping sets (the Expand replicates rows |ladder|
  * times map-side, but partial aggregation collapses each set to its
  * groups before the single shuffle), then one narrow apply pass. The
  * fallback suppression adds one semi-join against the >= k groups of the
  * coarsest rung (broadcast-sized: the coarsest alphabet is small by
  * construction).
  */
object KAnonymity {

  /** One ladder rung: a display label and the coarsened quasi-identifier. */
  final case class Rung(label: String, qi: Column)

  /** Probe result for one rung: how many groups, and the smallest. */
  final case class RungAudit(rung: Int, label: String, nGroups: Long, minGroup: Long)

  /** Per-rung group-size floors in ONE grouping-sets aggregation. */
  def probe(df: DataFrame, ladder: Seq[Rung]): Seq[RungAudit] = {
    require(ladder.nonEmpty, "k-anonymity: ladder must not be empty")
    val n = ladder.size
    require(n <= 62, s"k-anonymity: ladder too deep ($n)")
    val materialized = df.select(
      ladder.zipWithIndex.map { case (r, i) => r.qi.as(s"_qi_$i") }: _*)
    // grouping_id bit i is SET when column i is NOT part of the grouping
    // set, so rung i's id has every bit set except its own
    def gidOf(i: Int): Long = ((1L << n) - 1) - (1L << (n - 1 - i))
    val groups = materialized
      .groupingSets(
        (0 until n).map(i => Seq(col(s"_qi_$i"))),
        (0 until n).map(i => col(s"_qi_$i")): _*)
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
    val byGid = groups
      .groupBy(col("_gid"))
      .agg(count(lit(1)).as("_groups"), min(col("_n")).as("_min"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    ladder.zipWithIndex.map { case (r, i) =>
      val (ng, mg) = byGid.getOrElse(gidOf(i), (0L, 0L))
      RungAudit(i, r.label, ng, mg)
    }
  }

  /** One quasi-identifier DIMENSION of a multi-QI lattice: a name (used
    * for the generalized output column `<name><suffix>`) and its
    * generalization ladder, ordered fine -> coarse (level 0 = finest).
    */
  final case class QiDim(name: String, ladder: Seq[Column])

  /** Joint group-size floors for EVERY state of the coarsening lattice
    * (the cartesian product of per-dimension ladder levels) in ONE
    * grouping-sets aggregation: all Σ|ladders| coarsened columns are
    * materialized once, each lattice state is one grouping set of
    * |dims| columns, and `grouping_id` routes each aggregated group to
    * its state. The Expand replicates rows |states| times map-side but
    * partial aggregation collapses them before the single shuffle — the
    * same shape as [[probe]], bounded by `require(states <= 64)`.
    *
    * @return (levels vector -> (nGroups, minGroup)), plus the state list
    *         in preference order: ascending total generalization, ties
    *         broken by the fine-first cartesian enumeration
    */
  def probeLattice(
      df: DataFrame,
      dims: Seq[QiDim]
  ): (Seq[Seq[Int]], Map[Seq[Int], (Long, Long)]) = {
    val states = latticeStates(dims)
    require(states.size <= 64,
      s"k-anonymity: lattice has ${states.size} states (max 64 per probe pass) — " +
        "use enforceMulti, which stages larger lattices automatically")
    (states.sortBy(_.sum), probeStates(df, dims, states))
  }

  /** All lattice states (one ladder level per dimension), in the stable
    * fine-first cartesian enumeration order.
    */
  private def latticeStates(dims: Seq[QiDim]): Seq[Seq[Int]] = {
    require(dims.nonEmpty, "k-anonymity: need at least one QI dimension")
    dims.foreach(d => require(d.ladder.nonEmpty, s"k-anonymity: empty ladder for ${d.name}"))
    dims
      .map(_.ladder.indices.toSeq)
      .foldLeft(Seq(Seq.empty[Int]))((acc, ls) => acc.flatMap(s => ls.map(s :+ _)))
  }

  /** ONE grouping-sets pass over an arbitrary subset of lattice states
    * (≤ 64 per pass — `grouping_id` is one bit per materialized ladder
    * column and Spark's Expand cost is linear in the state count). The
    * chunked building block behind [[probeLattice]] and the staged walk
    * in [[enforceMulti]].
    */
  def probeStates(
      df: DataFrame,
      dims: Seq[QiDim],
      states: Seq[Seq[Int]]
  ): Map[Seq[Int], (Long, Long)] = {
    require(states.nonEmpty, "k-anonymity: need at least one state to probe")
    require(states.size <= 64,
      s"k-anonymity: ${states.size} states in one probe pass (max 64)")
    val flat = dims.zipWithIndex.flatMap { case (d, di) =>
      d.ladder.zipWithIndex.map { case (c, li) => (s"_qi_${di}_$li", di, li, c) }
    }
    val n = flat.size
    require(n <= 62, s"k-anonymity: too many ladder columns ($n)")
    val flatIndex: Map[(Int, Int), Int] =
      flat.zipWithIndex.map { case ((_, di, li, _), i) => (di, li) -> i }.toMap
    // grouping_id bit (n-1-i) is SET when flat column i is NOT in the set
    def gidOf(levels: Seq[Int]): Long = {
      val included = levels.zipWithIndex.map { case (l, d) => flatIndex((d, l)) }.toSet
      (0 until n).foldLeft(0L)((acc, i) =>
        if (included(i)) acc else acc | (1L << (n - 1 - i)))
    }
    val materialized = df.select(flat.map { case (nm, _, _, c) => c.as(nm) }: _*)
    val groups = materialized
      .groupingSets(
        states.map(_.zipWithIndex.map { case (l, d) => col(s"_qi_${d}_$l") }),
        flat.map { case (nm, _, _, _) => col(nm) }: _*)
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
    val byGid = groups
      .groupBy(col("_gid"))
      .agg(count(lit(1)).as("_groups"), min(col("_n")).as("_min"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    states.map(st => st -> byGid.getOrElse(gidOf(st), (0L, 0L))).toMap
  }

  /** Multi-QI k-anonymity enforcement over a coarsening LATTICE: pick the
    * MINIMAL-generalization state (fewest total ladder steps; fine-first
    * tie-break) whose minimum JOINT group size reaches k — global optimum,
    * not a path-dependent greedy walk. Lattices of ≤ 64 states are probed
    * in ONE grouping-sets pass; larger lattices are probed in STAGED
    * level-order chunks of ≤ 64 states, stopping at the first chunk that
    * contains a passing state. Staging preserves the global optimum
    * because the walk visits states in exactly the preference order, and
    * it is EXHAUSTIVE — an infeasible lattice costs ceil(|lattice|/64)
    * bounded probe jobs before falling back (a coarsest-state
    * short-circuit would be cheaper there, but it silently assumes every
    * ladder rung is a true coarsening of the previous, and the ≤ 64 path
    * makes no such assumption — the two paths must agree for ANY ladder).
    * If no state reaches k, the coarsest state is applied and its
    * residual < k joint groups are SUPPRESSED, so the result always
    * satisfies k-anonymity on the generalized columns.
    *
    * @return (chosen level per dimension, input plus one generalized
    *         column `<name><suffix>` per dimension)
    */
  def enforceMulti(
      df: DataFrame,
      dims: Seq[QiDim],
      k: Int = 5,
      suffix: String = "_gen"
  ): (Seq[Int], DataFrame) = {
    require(k >= 1, s"k-anonymity: k must be >= 1, got $k")
    dims.foreach(d => require(!df.columns.contains(d.name + suffix),
      s"k-anonymity: column ${d.name + suffix} already exists"))
    val states = latticeStates(dims)
    val ordered = states.sortBy(_.sum) // stable: fine-first within equal cost
    def passes(a: (Long, Long)): Boolean = a._1 > 0 && a._2 >= k
    val chosen: Option[Seq[Int]] =
      if (ordered.size <= 64) {
        val audits = probeStates(df, dims, ordered)
        ordered.find(st => passes(audits(st)))
      } else {
        // staged walk: level-order chunks until the first pass —
        // ceil(|visited|/64) bounded probe jobs, never the whole lattice
        // when an early chunk passes. Deliberately NO coarsest-state
        // short-circuit: it would bet on ladder monotonicity that nothing
        // validates, and the ≤ 64 path doesn't bet on it either
        ordered
          .grouped(64)
          .flatMap { chunk =>
            val audits = probeStates(df, dims, chunk)
            chunk.find(st => passes(audits(st)))
          }
          .nextOption()
      }
    def apply(levels: Seq[Int]): DataFrame =
      dims.zip(levels).foldLeft(df) { case (acc, (d, l)) =>
        acc.withColumn(d.name + suffix, d.ladder(l))
      }
    chosen match {
      case Some(st) => (st, apply(st))
      case None =>
        val top = dims.map(_.ladder.size - 1)
        val out = apply(top)
        val genCols = dims.map(d => col(d.name + suffix))
        val ok = out
          .groupBy(genCols: _*)
          .agg(count(lit(1)).as("_gn"))
          .filter(col("_gn") >= k)
          .select(dims.zipWithIndex.map { case (d, i) =>
            col(d.name + suffix).as(s"_okv_$i")
          }: _*)
        val cond = dims.zipWithIndex
          .map { case (d, i) => out(d.name + suffix) <=> col(s"_okv_$i") }
          .reduce(_ && _)
        (top, out.join(ok, cond, "left_semi"))
    }
  }

  /** Enforce k-anonymity: returns the chosen rung index and the input with
    * `outCol` = the generalized quasi-identifier. If NO rung reaches k,
    * the coarsest rung is applied and its residual < k groups are
    * SUPPRESSED (dropped) — the standard generalization+suppression
    * guarantee: the result always satisfies k-anonymity on `outCol`.
    */
  def enforce(
      df: DataFrame,
      ladder: Seq[Rung],
      k: Int = 5,
      outCol: String = "qi_generalized"
  ): (Int, DataFrame) = {
    require(k >= 1, s"k-anonymity: k must be >= 1, got $k")
    require(!df.columns.contains(outCol), s"k-anonymity: column $outCol already exists")
    val audits = probe(df, ladder)
    audits.find(a => a.nGroups > 0 && a.minGroup >= k) match {
      case Some(a) => (a.rung, df.withColumn(outCol, ladder(a.rung).qi))
      case None =>
        val i = ladder.size - 1
        val out = df.withColumn(outCol, ladder(i).qi)
        val ok = out
          .groupBy(col(outCol))
          .agg(count(lit(1)).as("_gn"))
          .filter(col("_gn") >= k)
          .select(col(outCol).as("_okv"))
        (i, out.join(ok, out(outCol) <=> col("_okv"), "left_semi"))
    }
  }
}
