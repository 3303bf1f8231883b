package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strict Mondrian multidimensional k-anonymization (LeFevre, DeWitt,
  * Ramakrishnan, "Mondrian Multidimensional K-Anonymity", ICDE 2006):
  * recursively bisect the table on the quasi-identifier with the widest
  * normalized range until no group can split without dropping below `k`
  * rows, then generalize each QI to its group's `[lo, hi]` envelope.
  *
  * The reference VALIDATES k-anonymity after the fact
  * (validate_anonymization.py:216-243 — count quasi-identifier
  * combinations, flag groups under k); this operator PRODUCES the
  * k-anonymous generalization that check certifies, closing the loop:
  * anonymize → validate green by construction.
  *
  * Determinism contract (what makes the DuckDB twin possible):
  *
  *  - Dimension choice per group: argmax over QIs of
  *    `(max - min) / globalRange` (zero-range QIs score 0; ties go to
  *    the lowest QI index). A group is FINAL when it has fewer than
  *    `2k` rows or every QI's in-group range is zero. All inputs are
  *    doubles derived identically in both engines, and IEEE arithmetic
  *    is deterministic, so the comparisons agree bit-for-bit.
  *  - Split point: the median POSITION, not an interpolated median
  *    value — rows rank by `(value, id)` and the lower `floor(cnt/2)`
  *    go left. Rank splits sidestep the one cross-engine hazard of
  *    value-based medians (two engines interpolating `(a+b)/2` with
  *    differently-ordered operations can disagree by 1 ulp exactly when
  *    a data value sits on the boundary) and guarantee both children
  *    hold at least `k` rows whenever the parent holds `2k`.
  *  - Relabeling: unsplit `g → 3g`, left child `3g+1`, right `3g+2` —
  *    injective across a round (base-3 heap numbering), so labels never
  *    collide between split and unsplit groups. 39 rounds fit a signed
  *    long (3^39 < 2^62); rank-splits halve groups exactly, so rounds
  *    needed = ceil(log2(n/k)) — 39 covers any n/k below ~5·10^11.
  *
  * Scale shape: each round is one small per-group aggregate, a join of
  * the data against it (group-count-sized — AQE broadcasts it while it
  * fits and shuffle-joins on `_gid` once it doesn't), and ONE ranking
  * pass over the data whose physical plan adapts to the round
  * ([[withRank]]): early rounds — where a `_gid`-keyed window would
  * sort the whole table in a handful of tasks (round 0: exactly one) —
  * range-partition on the sort key and rank with per-partition offsets;
  * late rounds use the keyed window, whose tasks are already
  * cluster-width. O(log(n/k)) rounds, no driver-side row state; the
  * per-round `localCheckpoint` is load-bearing lineage truncation (the
  * connectedComponents lesson: an uncheckpointed loop doubles the plan
  * every round).
  */
object Mondrian {

  private def working(qiCols: Seq[String]): Seq[String] =
    qiCols.indices.map(i => s"_q$i") ++
      Seq("_gid", "_dim", "_cnt", "_rnk", "_gid2", "_side", "_ds", "_mds",
        "_sv", "_c", "_gc", "_n", "_nump", "_gcp", "_num", "_okf", "_mok",
        "_rsv", "_rpid", "_roff", "_rpc")

  /** A keyed `_gid` window is replaced by the range-partitioned rank
    * only while a single group's sort would EXCEED this many rows: the
    * distributed rank costs an extra range exchange + offsets pass per
    * round, which a one-task sort of a few thousand rows beats easily —
    * the hazard it exists for is the multi-gigabyte round-0 sort of a
    * cluster-scale table (straggler, then OOM, and past 2^31 rows an
    * int row_number overflow). 4M rows is comfortably inside one
    * healthy sort task and far below any of those cliffs.
    */
  private[graft] val RangeRankMinRows: Long = 1L << 22

  /** Rank every row within its `_gid` group by `(splitVal, idCol)` — the
    * median-split rank the relabel and the sensitive-side guards read.
    * Two physical plans, bit-identical ranks:
    *
    *  - BIG-GROUP rounds (fewer than `par` groups — `par` = the
    *    session's shuffle parallelism — while groups still hold more
    *    than [[RangeRankMinRows]] rows, estimated from `nRows / 2^round`
    *    since splits halve exactly): a window keyed on `_gid` alone
    *    would put the WHOLE table into at most `2^round` sort tasks —
    *    round 0 is literally ONE task sorting everything, a
    *    straggler-then-OOM at cluster scale. Instead the frame
    *    range-partitions on `(_gid, splitVal, id)` (each partition then
    *    holds a CONTIGUOUS run of each group's sort order), ranks
    *    within `(partition, group)` through a well-spread window, and
    *    adds the group's row count from all PRECEDING partitions.
    *    Because the partitioning is contiguous in the sort key, the
    *    offsets frame has at most `par + groups - 1` rows — a
    *    broadcast-sized cumulative sum, never driver-side row state.
    *    The persist pins the partition ids: the offsets pass and the
    *    rank pass must observe ONE layout. A side benefit: the
    *    composed rank is a LONG, so a round-0 "group" bigger than 2^31
    *    rows (a 100 TB table) cannot overflow `row_number`'s int.
    *  - SMALL-GROUP rounds (groups >= par, or every group under the
    *    bound): the keyed window's sort tasks are already healthy; use
    *    it directly — at test scale this is ALSO the faster plan, which
    *    is why the switch is size-aware rather than round-only.
    */
  private[graft] def withRank(
      joined: DataFrame,
      splitVal: Column,
      idCol: String,
      round: Int,
      nRows: Long,
      cacheOut: DataFrame => Unit = _ => ()
  ): DataFrame = {
    val spark = joined.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.getOrElse(spark.sparkContext.defaultParallelism)
    if (round >= 31 || (1L << round) >= par ||
      nRows / (1L << round) < RangeRankMinRows) {
      val w = Window.partitionBy(col("_gid")).orderBy(splitVal.asc, col(idCol).asc)
      joined.withColumn("_rnk", row_number().over(w))
    } else {
      // persisted, not checkpointed: materialization rides the caller's
      // first action (no extra eager pass per round) while still pinning
      // ONE partition layout for the offsets pass and the rank pass; the
      // handle goes to `cacheOut` so the caller unpersists at round end
      val ranged = joined
        .withColumn("_rsv", splitVal)
        .repartitionByRange(par, col("_gid"), col("_rsv"), col(idCol))
        .withColumn("_rpid", spark_partition_id())
        .persist()
      cacheOut(ranged)
      val cum = Window.partitionBy(col("_gid")).orderBy(col("_rpid").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged
        .groupBy(col("_rpid"), col("_gid"))
        .agg(count(lit(1L)).as("_rpc"))
        .withColumn("_roff", coalesce(sum(col("_rpc")).over(cum), lit(0L)))
        .select(col("_rpid"), col("_gid"), col("_roff"))
      val wp = Window.partitionBy(col("_rpid"), col("_gid"))
        .orderBy(col("_rsv").asc, col(idCol).asc)
      ranged.join(broadcast(offsets), Seq("_rpid", "_gid"))
        .withColumn("_rnk", row_number().over(wp) + col("_roff"))
        .drop("_rpid", "_rsv", "_roff")
    }
  }

  /** Label every row with its Mondrian group: returns `df`'s columns
    * plus `_q<i>` (the QIs cast to double — the values the split
    * decisions and [[groupRanges]] read) and the group label `_gid`.
    *
    * With `sensitiveCol` set, splits are additionally l-DIVERSITY
    * constrained (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    * k-Anonymity", ICDE 2006, §6's Mondrian adaptation): a group splits
    * only if BOTH candidate children retain at least `l` distinct
    * sensitive values; a group whose widest-dimension split would
    * concentrate the sensitive attribute becomes FINAL instead (the
    * conservative strict variant — no fallback to narrower dimensions,
    * which keeps the recursion replayable round-for-round). Every final
    * group then satisfies k-anonymity AND distinct-l-diversity, except
    * the root-inherited bound: a group can never offer more distinct
    * values than it inherited, so callers should check the published
    * `n_sensitive` floor on the output (a table with fewer than `l`
    * global sensitive values cannot be l-diverse at all).
    *
    * With `maxTvd` additionally set (requires `sensitiveCol`), splits
    * are t-CLOSENESS constrained (Li, Li, Venkatasubramanian,
    * "t-Closeness: Privacy Beyond k-Anonymity and l-Diversity", ICDE
    * 2007, with total variation distance as the ground metric): a split
    * is refused when either candidate child's sensitive distribution
    * sits more than `maxTvd` from the WHOLE TABLE's distribution — the
    * attacker's baseline — so no published group leaks much more about
    * the sensitive attribute than the table already does. The test
    * compares an integer-exact numerator against `t * 2nN` (one double
    * product), so no float-summation order enters control flow and the
    * recursion stays engine-replayable.
    */
  def anonymize(
      df: DataFrame,
      idCol: String,
      qiCols: Seq[String],
      k: Int,
      maxRounds: Int = 39,
      sensitiveCol: Option[String] = None,
      l: Int = 1,
      maxTvd: Option[Double] = None
  ): DataFrame = {
    require(k >= 1, s"mondrian: k must be positive, got $k")
    require(qiCols.nonEmpty, "mondrian: at least one quasi-identifier")
    require(l >= 1, s"mondrian: l must be positive, got $l")
    require(sensitiveCol.forall(df.columns.contains),
      s"mondrian: sensitive column ${sensitiveCol.orNull} not in input")
    require(maxTvd.isEmpty || sensitiveCol.isDefined,
      "mondrian: maxTvd needs a sensitive column")
    require(maxTvd.forall(t => t > 0.0 && t <= 1.0),
      s"mondrian: maxTvd must be in (0, 1], got ${maxTvd.orNull}")
    require(maxRounds >= 0 && maxRounds <= 39,
      s"mondrian: base-3 labels overflow a long past 39 rounds, got $maxRounds")
    val clash = df.columns.toSet.intersect(working(qiCols).toSet)
    require(clash.isEmpty,
      s"mondrian: input collides with working columns ${clash.mkString(",")}")

    var cur = df.select(
      df.columns.map(col) ++
        qiCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"_q$i") } :+
        lit(0L).as("_gid"): _*)

    // global ranges normalize the per-group ranges once, up front; the
    // total row count anchors the t-closeness reference distribution
    val gAggs = count(lit(1L)).as("_nt") +:
      qiCols.indices.flatMap(i => Seq(min(col(s"_q$i")), max(col(s"_q$i"))))
    val gRow = cur.agg(gAggs.head, gAggs.tail: _*).head()
    val nTotal = gRow.getLong(0)
    if (nTotal == 0L) return cur // empty input: zero groups, done
    val grange =
      qiCols.indices.map(i => gRow.getDouble(2 * i + 2) - gRow.getDouble(2 * i + 1))
    // the global sensitive distribution (t-closeness reference):
    // |distinct sensitive values| rows, pinned before the loop mutates
    // `cur`, materialized once
    val gdist = sensitiveCol.filter(_ => maxTvd.isDefined).map { sv =>
      cur.groupBy(col(sv).as("_sv")).agg(count(lit(1L)).as("_gc")).localCheckpoint()
    }

    var round = 0
    var splitting = true
    while (splitting && round < maxRounds) {
      val roundCaches = scala.collection.mutable.Buffer.empty[DataFrame]
      val statAggs = count(lit(1L)).as("_cnt") +: qiCols.indices.flatMap(i =>
        Seq(min(col(s"_q$i")).as(s"_mn$i"), max(col(s"_q$i")).as(s"_mx$i")))
      val stats = cur.groupBy("_gid").agg(statAggs.head, statAggs.tail: _*)
      val nr: Seq[Column] = qiCols.indices.map { i =>
        if (grange(i) > 0.0) (col(s"_mx$i") - col(s"_mn$i")) / lit(grange(i))
        else lit(0.0)
      }
      val best = if (nr.size == 1) nr.head else greatest(nr: _*)
      val pick = qiCols.indices.reverse.foldLeft(lit(-1)) { (acc, i) =>
        when(nr(i) === best, lit(i)).otherwise(acc)
      }
      val splitVal = qiCols.indices.reverse
        .foldLeft(lit(null).cast("double")) { (acc, i) =>
          when(col("_dim") === i, col(s"_q$i")).otherwise(acc)
        }

      val chose0 = stats.select(
        col("_gid"), col("_cnt"),
        when(col("_cnt") >= lit(2L * k) && best > lit(0.0), pick)
          .otherwise(lit(-1)).as("_dim"))

      val (chose, rankedReuse) = sensitiveCol match {
        case None => (chose0, None)
        case Some(sv) =>
          // sensitive-attribute guards: rank the would-split groups with
          // the SAME (value, id) order the relabel uses (the relabel
          // then REUSES these ranks — kept groups keep their dim, and
          // demoted groups never read the rank), then demote any
          // group whose weaker candidate side drops below l distinct
          // sensitive values — or, with maxTvd, whose side's sensitive
          // distribution strays more than t (total variation) from the
          // global reference. The TVD test compares an INTEGER-exact
          // numerator (sum |c*N - gc*n| over present values, plus n*(N -
          // sum gc) for the absent ones — hugeint-style, order-free)
          // against t * 2nN computed as one double product, so no
          // float-summation order ever enters control flow.
          // persisted for the round: the split gate AND the relabel both
          // read the ranked frame and the guard verdicts — without the
          // cache each action re-runs the guard aggregates (a full extra
          // pass per round, and the budgeted job count doubles)
          val ranked = withRank(cur.join(chose0, Seq("_gid")),
            splitVal, idCol, round, nTotal, roundCaches += _).persist()
          val sides = ranked.filter(col("_dim") >= 0)
            .groupBy(col("_gid"), col("_cnt"),
              (col("_rnk") <= floor(col("_cnt") / lit(2))).as("_side"),
              col(sv).as("_sv"))
            .agg(count(lit(1L)).as("_c"))
          val weaker = (maxTvd, gdist) match {
            case (Some(t), Some(gd)) =>
              val dec = "decimal(38,0)"
              // side totals are KNOWN from the rank split — floor(cnt/2)
              // left, the rest right — so no window/shuffle to derive them
              sides.join(gd, Seq("_sv"))
                .withColumn("_n",
                  when(col("_side"), floor(col("_cnt") / lit(2)))
                    .otherwise(col("_cnt") - floor(col("_cnt") / lit(2))))
                .groupBy("_gid", "_side")
                .agg(
                  count(lit(1L)).as("_ds"),
                  max(col("_n")).as("_n"),
                  sum(abs(col("_c").cast(dec) * lit(nTotal) -
                    col("_gc").cast(dec) * col("_n"))).as("_nump"),
                  sum(col("_gc")).as("_gcp"))
                .withColumn("_num",
                  col("_nump") +
                    col("_n").cast(dec) * (lit(nTotal) - col("_gcp")).cast(dec))
                .withColumn("_okf",
                  when(col("_num").cast("double") <=
                    lit(2.0 * t) * col("_n").cast("double") * lit(nTotal.toDouble),
                    lit(1)).otherwise(lit(0)))
                .groupBy("_gid")
                .agg(min(col("_ds")).as("_mds"), min(col("_okf")).as("_mok"))
            case _ =>
              sides.groupBy("_gid", "_side")
                .agg(count(lit(1L)).as("_ds"))
                .groupBy("_gid")
                .agg(min(col("_ds")).as("_mds"), min(lit(1)).as("_mok"))
          }
          val guarded = chose0.join(weaker, Seq("_gid"), "left")
            .select(col("_gid"), col("_cnt"),
              when(col("_dim") >= 0 && coalesce(col("_mds"), lit(0L)) >= l &&
                coalesce(col("_mok"), lit(1)) === 1,
                col("_dim")).otherwise(lit(-1)).as("_dim"))
            .persist()
          (guarded, Some(ranked))
      }

      if (chose.filter(col("_dim") >= 0).isEmpty) splitting = false
      else {
        // guard variants already ranked the rows for chose0's dims;
        // groups the guards kept have the SAME dim (so the same ranks),
        // and demoted groups take the `_dim < 0` branch without reading
        // `_rnk` — reusing the ranks saves a full per-round sort pass
        val rankedAll = rankedReuse match {
          case Some(r) => r.drop("_dim", "_cnt").join(chose, Seq("_gid"))
          case None =>
            withRank(cur.join(chose, Seq("_gid")), splitVal, idCol, round,
              nTotal, roundCaches += _)
        }
        cur = rankedAll
          .withColumn("_gid2",
            when(col("_dim") < 0, col("_gid") * 3)
              .when(col("_rnk") <= floor(col("_cnt") / lit(2)), col("_gid") * 3 + 1)
              .otherwise(col("_gid") * 3 + 2))
          .drop("_gid", "_dim", "_cnt", "_rnk")
          .withColumnRenamed("_gid2", "_gid")
          .localCheckpoint()
        round += 1
      }
      // the round's caches die with the round (the checkpoint above has
      // already materialized everything the next round reads)
      rankedReuse.foreach { r => r.unpersist(); chose.unpersist() }
      roundCaches.foreach(_.unpersist())
    }
    cur
  }

  /** The generalization a Mondrian labeling publishes: one row per
    * group — `group_id` (the group's minimum `idCol` — a deterministic,
    * engine-stable key), `n_rows` (>= k by construction), and each QI's
    * `[<qi>_lo, <qi>_hi]` envelope. Releasing envelopes instead of
    * values is what makes the table k-anonymous: every row inside a
    * group is indistinguishable on the QIs.
    */
  def groupRanges(
      labeled: DataFrame,
      idCol: String,
      qiCols: Seq[String],
      sensitiveCol: Option[String] = None
  ): DataFrame = {
    val aggs = (count(lit(1L)).as("n_rows") +:
      qiCols.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(s"_q$i")).as(s"${c}_lo"), max(col(s"_q$i")).as(s"${c}_hi"))
      }) ++
      sensitiveCol.map(sv => countDistinct(col(sv)).as("n_sensitive")).toSeq
    labeled.groupBy("_gid")
      .agg(min(col(idCol)).as("group_id"), aggs: _*)
      .drop("_gid")
  }
}
