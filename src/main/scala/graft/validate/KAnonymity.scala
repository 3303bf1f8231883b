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
