package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: sample each source down so the surviving corpus hits a
  * token budget at target source weights — the primitive behind every
  * "x% web, y% books, z% code" training-mix spec.
  *
  * For source s with actual token mass tok(s) and target weight w(s):
  *
  *   rate(s) = min(1, budgetTokens · w(s) / tok(s))
  *
  * then rows are kept by [[Sampling.stratifiedSample]]'s deterministic
  * md5 per-mille hash — reproducible, resumable, join-stable. Sources with
  * no weight are dropped (rate 0), and a source too small for its target
  * keeps everything (rate clamps at 1; the mix under-delivers that source
  * rather than inventing data — the caller sees it in the returned rates).
  *
  * Scale shape: ONE keyed aggregation over the corpus for the per-source
  * token masses (collected — it is |sources|-sized), then the narrow
  * hash-filter pass. Nothing else shuffles.
  */
object Mixer {

  /** Per-source keep rates for the target mix (driver-side; |sources| rows). */
  def mixRates(
      df: DataFrame,
      sourceCol: String,
      tokenCol: Column,
      weights: Map[String, Double],
      budgetTokens: Long
  ): Map[String, Double] = {
    require(budgetTokens > 0, "mixer: budgetTokens must be positive")
    require(weights.values.forall(_ >= 0), "mixer: weights must be >= 0")
    // an all-null token column (e.g. every row of a source has null text)
    // sums to NULL — treat as no mass, don't NPE on the driver; the source
    // key is stringified so a non-varchar source column (int source ids)
    // still maps onto the string-keyed weights instead of ClassCastException
    val toks = df
      .groupBy(col(sourceCol).cast("string").as("_src"))
      .agg(sum(tokenCol).cast("long").as("_tok"))
      .collect()
      .collect { case r if !r.isNullAt(0) && !r.isNullAt(1) =>
        r.getString(0) -> r.getLong(1)
      }
      .toMap
    weights.flatMap { case (s, w) =>
      toks.get(s).filter(_ > 0).map(t => s -> math.min(1.0, budgetTokens * w / t))
    }
  }

  /** Apply the target mix: returns the surviving rows plus `stratum` (the
    * source) and `mille` (the hash bucket that decided each row).
    *
    * ONE job: the per-source token masses and keep thresholds ride the
    * plan — a |sources|-sized aggregate joined to the literal weights and
    * BROADCAST back onto the corpus — instead of a driver-side collect
    * (the [[mixRates]] Map stays available as the audit surface). The
    * in-plan threshold `floor(min(1, budget·w/tok)·1000 + 0.5)` is the
    * same double arithmetic, association order and rounding as
    * [[mixRates]] + [[Sampling.stratifiedSample]]'s `(rate*1000).round`,
    * so the surviving row set is identical. Unweighted and zero-mass
    * sources drop via the inner join (the `defaultRate = 0` semantics).
    */
  def targetMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: Column,
      weights: Map[String, Double],
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, "mixer: budgetTokens must be positive")
    require(weights.values.forall(_ >= 0), "mixer: weights must be >= 0")
    val reserved = Seq("stratum", "mille", "_src", "_thresh", "_src_w", "_w")
    require(!reserved.exists(df.columns.contains),
      s"targetMix: input must not already have ${reserved.mkString("/")} columns")
    val spark = df.sparkSession
    import spark.implicits._
    val weightsDf = weights.toSeq.toDF("_src_w", "_w")
    val thresholds = df
      .groupBy(col(sourceCol).cast("string").as("_src"))
      .agg(sum(tokenCol).cast("long").as("_tok"))
      .filter(col("_tok") > 0)
      .join(weightsDf, col("_src") === col("_src_w"))
      .select(
        col("_src"),
        floor(
          least(lit(1.0), lit(budgetTokens.toDouble) * col("_w") / col("_tok"))
            * 1000 + 0.5)
          .cast("int").as("_thresh"))
    df.withColumn("stratum", col(sourceCol))
      .withColumn("mille", Sampling.hashMille(col(idCol)))
      .join(broadcast(thresholds), col("stratum").cast("string") === col("_src"))
      .filter(col("mille") < col("_thresh"))
      .drop("_src", "_thresh")
  }
}
