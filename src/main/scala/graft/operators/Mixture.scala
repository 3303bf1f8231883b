package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-budget corpus mixture — the deterministic-prefix counterpart of
  * [[Mixer]]: where `targetMix` keeps each source at a RATE (hitting its
  * token budget in expectation), this operator admits each source's
  * documents in a deterministic pseudo-random order until the budget is
  * reached EXACTLY — "the first B tokens of web, the first B' of code" —
  * the standard way a pretraining run pins its mixture when the spec is
  * an absolute token count per source rather than a proportion.
  *
  * Admission rule: order each source's documents by `(md5(id), id)` (a
  * reproducible shuffle both engines can replay — md5 hex strings order
  * identically everywhere), and admit a document iff the running cost
  * total BEFORE it is below the source's budget. Budgets therefore
  * overshoot by at most ONE document and never undershoot while the
  * source still has data; re-running on the same corpus admits the same
  * set (resumable, join-stable — the [[Sampling]] determinism contract).
  *
  * Scale shape — the Mondrian rank lesson applied to running sums: a
  * window partitioned by source alone would sort EACH SOURCE in one
  * task (mixtures have few sources by nature, so that is a handful of
  * tasks for the whole corpus). Instead the frame range-partitions on
  * `(source, md5(id), id)` — every partition holds a contiguous run of
  * one or a few sources' admission order — computes per-(partition,
  * source) sums (at most `partitions + sources - 1` rows, a
  * broadcast-sized frame, because range partitions are contiguous),
  * cumulates them into per-partition offsets, and finishes with a
  * within-(partition, source) running sum. No data-sized single-task
  * sort anywhere; the one materialization (`localCheckpoint`) pins the
  * partition layout the offsets and the final pass must share.
  */
object Mixture {

  /** `df` plus `cum_before` — the exclusive running sum of `costCol`
    * within each `keyCol` group in `(ordCol, idCol)` order.
    */
  def exclusiveRunningSum(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      ordCol: Column,
      costCol: Column
  ): DataFrame = {
    val reserved = Seq("_ord", "_pid", "_cost", "_pc", "_off", "cum_before")
    require(!reserved.exists(df.columns.contains),
      s"mixture: input must not already have ${reserved.mkString("/")} columns")
    val spark = df.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.getOrElse(spark.sparkContext.defaultParallelism)
    val ranged = df
      .withColumn("_ord", ordCol)
      .withColumn("_cost", costCol.cast("long"))
      .repartitionByRange(par, col(keyCol), col("_ord"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val cum = Window.partitionBy(col(keyCol)).orderBy(col("_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("_pid"), col(keyCol))
      .agg(sum(col("_cost")).as("_pc"))
      .withColumn("_off", coalesce(sum(col("_pc")).over(cum), lit(0L)))
      .select(col("_pid"), col(keyCol), col("_off"))
    val within = Window.partitionBy(col("_pid"), col(keyCol))
      .orderBy(col("_ord").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), Seq("_pid", keyCol))
      .withColumn("cum_before",
        coalesce(sum(col("_cost")).over(within), lit(0L)) + col("_off"))
      .drop("_ord", "_pid", "_cost", "_off")
  }

  /** The budgeted mixture (class doc): rows of `df` whose source's
    * running cost stayed under its budget, plus `cum_before`. Sources
    * absent from `budgets` get `defaultBudget` (0 drops them — the
    * [[Mixer.targetMix]] unweighted-source semantics).
    */
  def budgeted(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      costCol: Column,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L
  ): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "mixture: budgets must be >= 0")
    val run = exclusiveRunningSum(
      df, sourceCol, idCol, md5(col(idCol).cast("string")), costCol)
    val budgetOf =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(
        element_at(typedLit(budgets), col(sourceCol).cast("string")),
        lit(defaultBudget))
    run.filter(col("cum_before") < budgetOf)
  }
}
