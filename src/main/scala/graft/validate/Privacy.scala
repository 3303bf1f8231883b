package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-audit analytics beyond k-anonymity — the metrics a GDPR release
  * review asks for once group sizes alone pass (reference analogue: the
  * validation suite stops at k-anonymity, validate_anonymization.py:216-243;
  * these are the standard next rungs from the privacy literature).
  *
  *  - '''l-diversity''' (Machanavajjhala et al., ICDE 2006): a group of k
  *    records is still disclosive when they all share one sensitive value —
  *    audit the number of DISTINCT sensitive values per quasi-identifier
  *    group.
  *  - '''t-closeness''' (Li, Li & Venkatasubramanian, ICDE 2007): diversity
  *    is not enough when a group's sensitive DISTRIBUTION diverges from the
  *    corpus — audit the total variation distance per group, with an
  *    integer-exact numerator so the DuckDB oracle replays it bit-for-bit.
  *  - '''re-identification risk census''': the k-map-style counts a DPO
  *    reads before release — sample uniques, rows in small groups, the
  *    worst-case group — for several CANDIDATE quasi-identifier sets in one
  *    grouping-sets pass (the [[KAnonymity.probeStates]] shape).
  *
  * Scale shapes: every audit is one or two map-side-combined aggregations
  * over the input; nothing here keeps per-distinct-value state beyond the
  * (group, value) census that any honest audit needs, and the t-closeness
  * grid is |groups| x |sensitive alphabet| — the sensitive attribute is
  * categorical by assumption, so the global distribution is a broadcast.
  */
object Privacy {

  /** Per-group sensitive-value diversity: `(qiName, group_size,
    * distinct_sensitive, diverse_ok)`. NULL sensitive values are excluded
    * (matching SQL `count(distinct s)` semantics); `group_size` counts the
    * remaining rows.
    *
    * Two aggregations, both map-side combined: the `(group, value)` census,
    * then a per-group fold of it — no `count_distinct` hash state wider
    * than the census itself.
    */
  def lDiversityAudit(
      df: DataFrame,
      qi: Column,
      sensitive: Column,
      l: Int,
      qiName: String = "qi"
  ): DataFrame = {
    require(l >= 1, s"l-diversity: l must be >= 1, got $l")
    df.filter(sensitive.isNotNull)
      .groupBy(qi.as(qiName), sensitive.as("_s"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(qiName))
      .agg(
        sum(col("_n")).as("group_size"),
        count(lit(1)).as("distinct_sensitive"))
      .withColumn("diverse_ok", col("distinct_sensitive") >= l)
  }

  /** Only the groups violating distinct l-diversity. */
  def lDiversityViolations(
      df: DataFrame,
      qi: Column,
      sensitive: Column,
      l: Int,
      qiName: String = "qi"
  ): DataFrame =
    lDiversityAudit(df, qi, sensitive, l, qiName)
      .filter(!col("diverse_ok"))
      .drop("diverse_ok")

  /** Per-group t-closeness audit under total variation distance:
    * `(qiName, group_size, tvd)` with
    * `TVD(g) = (1/2) * sum_v | n_gv/N_g - n_v/N |`.
    *
    * Determinism contract: the numerator is computed as the INTEGER
    * `sum_v | n_gv*N - n_v*N_g |` in decimal(38,0) (exact to ~1e18 rows;
    * the products stay within 38 digits to ~1e12-row groups), and the only
    * floating-point step is the final division by `2*N_g*N` — one
    * round-to-nearest both engines perform identically on the same exact
    * integers.
    *
    * Values ABSENT from a group still contribute their full `n_v*N_g`
    * term — dropping them understates the distance exactly when it matters
    * (a group missing a common value is skewed, not close) — but the
    * groups-x-alphabet grid is never materialized: the absent-value mass
    * has the closed form `N_g*(N - sum of the group's present n_v)`, so
    * one broadcast equi-join over the census suffices. NULL sensitive
    * values are excluded as in [[lDiversityAudit]].
    */
  def tClosenessAudit(
      df: DataFrame,
      qi: Column,
      sensitive: Column,
      qiName: String = "qi"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gv = df
      .filter(sensitive.isNotNull)
      .groupBy(qi.as(qiName), sensitive.as("_s"))
      .agg(count(lit(1)).as("_ngv"))
    // global value distribution + corpus total, all census-sized: the
    // unpartitioned total window runs over the |alphabet|-row distribution
    // (the HdrHistogram global-window contract), never the corpus
    val v = gv
      .groupBy(col("_s"))
      .agg(sum(col("_ngv")).as("_nv"))
      .withColumn("_n", sum(col("_nv")).over(Window.partitionBy()))
    val dec = (c: Column) => c.cast("decimal(19,0)")
    // numerator split: values PRESENT in the group contribute
    // |ngv*N - nv*Ng| via the broadcast equi-join below; values ABSENT
    // contribute nv*Ng each, i.e. Ng*(N - sum of present nv) in total —
    // the same exact integer as the full groups-x-alphabet grid, without
    // materializing the grid (or its nested-loop join)
    val withNg = gv
      .join(broadcast(v), "_s")
      .withColumn("_ng", sum(col("_ngv")).over(Window.partitionBy(col(qiName))))
    withNg
      .groupBy(col(qiName))
      .agg(
        max(col("_ng")).as("_ng"),
        max(col("_n")).as("_n"),
        sum(abs(
          dec(col("_ngv")) * dec(col("_n")) - dec(col("_nv")) * dec(col("_ng"))))
          .as("_nump"),
        sum(col("_nv")).as("_nvp"))
      .select(
        col(qiName),
        col("_ng").as("group_size"),
        ((col("_nump") + dec(col("_ng")) * (dec(col("_n")) - dec(col("_nvp"))))
          .cast("double") /
          (lit(2.0) * col("_ng").cast("double") * col("_n").cast("double")))
          .as("tvd"))
  }

  /** Per-rung diversity floors — min distinct-sensitive count over the
    * rung's groups — for a whole generalization ladder in ONE
    * grouping-sets pass: each rung's `(qi, sensitive)` census is one
    * grouping set, a second census-sized fold counts distinct values per
    * group, and a third takes each rung's floor. The
    * [[KAnonymity.probe]] shape with the sensitive column riding along.
    */
  def probeDiversity(
      df: DataFrame,
      ladder: Seq[KAnonymity.Rung],
      sensitive: Column
  ): Seq[(Int, Long, Long)] = {
    require(ladder.nonEmpty, "l-diversity: ladder must not be empty")
    val n = ladder.size
    require(n <= 61, s"l-diversity: ladder too deep ($n)")
    val materialized = df
      .filter(sensitive.isNotNull)
      .select(
        (ladder.zipWithIndex.map { case (r, i) => r.qi.as(s"_qi_$i") } :+
          sensitive.as("_s")): _*)
    // flat column order: _qi_0 .. _qi_{n-1}, _s; rung i's grouping set is
    // {_qi_i, _s}, so its grouping_id clears bit (n - i) and bit 0
    def gidOf(i: Int): Long = ((1L << (n + 1)) - 1) - (1L << (n - i)) - 1L
    val census = materialized
      .groupingSets(
        (0 until n).map(i => Seq(col(s"_qi_$i"), col("_s"))),
        ((0 until n).map(i => col(s"_qi_$i")) :+ col("_s")): _*)
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
    val perGroup = census
      .groupBy((col("_gid") +: (0 until n).map(i => col(s"_qi_$i"))): _*)
      .agg(count(lit(1)).as("_distinct"))
    val byGid = perGroup
      .groupBy(col("_gid"))
      .agg(count(lit(1)).as("_groups"), min(col("_distinct")).as("_min"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    ladder.indices.map { i =>
      val (g, m) = byGid.getOrElse(gidOf(i), (0L, 0L))
      (i, g, m)
    }
  }

  /** l-diversity ENFORCEMENT over a generalization ladder — the
    * [[KAnonymity.enforce]] counterpart for diversity: generalize the
    * quasi-identifier up the (fine -> coarse) ladder until EVERY group's
    * sensitive attribute takes at least l distinct values; if even the
    * coarsest rung leaves non-diverse groups, those groups are SUPPRESSED
    * (semi-join on the diverse ones), so the result always satisfies
    * distinct l-diversity on `outCol`. Rows with a NULL sensitive value
    * are dropped first — they neither witness diversity nor deserve a
    * disclosive group.
    *
    * @return (chosen rung index, input plus `outCol`)
    */
  def enforceLDiversity(
      df: DataFrame,
      ladder: Seq[KAnonymity.Rung],
      sensitive: Column,
      l: Int = 3,
      outCol: String = "qi_generalized"
  ): (Int, DataFrame) = {
    require(l >= 1, s"l-diversity: l must be >= 1, got $l")
    require(!df.columns.contains(outCol), s"l-diversity: column $outCol already exists")
    val base = df.filter(sensitive.isNotNull)
    val audits = probeDiversity(base, ladder, sensitive)
    audits.find { case (_, g, m) => g > 0 && m >= l } match {
      case Some((i, _, _)) => (i, base.withColumn(outCol, ladder(i).qi))
      case None =>
        val i = ladder.size - 1
        val out = base.withColumn(outCol, ladder(i).qi)
        val ok = out
          .groupBy(col(outCol), sensitive.as("_s"))
          .agg(count(lit(1)).as("_n"))
          .groupBy(col(outCol))
          .agg(count(lit(1)).as("_d"))
          .filter(col("_d") >= l)
          .select(col(outCol).as("_okv"))
        (i, out.join(ok, out(outCol) <=> col("_okv"), "left_semi"))
    }
  }

  /** One CANDIDATE quasi-identifier set for the risk census. */
  final case class QiSet(label: String, cols: Seq[Column])

  /** Re-identification risk census over several candidate QI sets in ONE
    * grouping-sets aggregation: per set, total rows, group count, sample
    * uniques (size-1 groups — the records a linkage attack singles out),
    * rows in groups below `smallK`, and the smallest group. The Expand
    * replicates rows |sets| times map-side but partial aggregation
    * collapses each set to its groups before the single shuffle
    * ([[KAnonymity.probeStates]]'s shape); the second fold is
    * census-sized.
    *
    * Output: `(qi_set, n_rows, n_groups, n_unique_groups, rows_below_k,
    * min_group)`, one row per set.
    */
  def reidRisk(
      df: DataFrame,
      sets: Seq[QiSet],
      smallK: Int = 5
  ): DataFrame = {
    require(sets.nonEmpty, "reid risk: need at least one QI set")
    require(smallK >= 2, s"reid risk: smallK must be >= 2, got $smallK")
    val flat = sets.zipWithIndex.flatMap { case (s, si) =>
      s.cols.zipWithIndex.map { case (c, ci) => (s"_q_${si}_$ci", c) }
    }
    val nCols = flat.size
    require(nCols <= 62, s"reid risk: too many QI columns ($nCols)")
    // grouping_id bit (nCols-1-i) is SET when flat column i is NOT grouped
    val offsets = sets.map(_.cols.size).scanLeft(0)(_ + _)
    def gidOf(si: Int): Long = {
      val own = (offsets(si) until offsets(si + 1)).toSet
      (0 until nCols).foldLeft(0L)((acc, i) =>
        if (own(i)) acc else acc | (1L << (nCols - 1 - i)))
    }
    val mat = df.select(flat.map { case (nm, c) => c.as(nm) }: _*)
    val groups = mat
      .groupingSets(
        sets.zipWithIndex.map { case (s, si) =>
          s.cols.indices.map(ci => col(s"_q_${si}_$ci")).toSeq
        },
        flat.map { case (nm, _) => col(nm) }: _*)
      .agg(count(lit(1)).as("_gn"), grouping_id().as("_gid"))
    val label = sets.zipWithIndex
      .map { case (s, si) => (gidOf(si), s.label) }
      .foldLeft(lit(null).cast("string")) { case (acc, (gid, lbl)) =>
        when(col("_gid") === gid, lit(lbl)).otherwise(acc)
      }
    groups
      .select(label.as("qi_set"), col("_gn"))
      .groupBy(col("qi_set"))
      .agg(
        sum(col("_gn")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_gn") === 1L, 1L).otherwise(0L)).as("n_unique_groups"),
        sum(when(col("_gn") < smallK, col("_gn")).otherwise(0L))
          .as("rows_below_k"),
        min(col("_gn")).as("min_group"))
  }
}
