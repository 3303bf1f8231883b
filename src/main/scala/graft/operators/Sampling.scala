package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data curation: keep each
  * row with a per-stratum probability, decided by a content-stable hash of
  * the row id instead of a RNG.
  *
  * Why not `df.sample` / `rand()`: at 100 TB a sample must be REPRODUCIBLE
  * (same rows on re-run, resumable after failure, auditable) and
  * JOIN-STABLE (the same id sampled in two tables stays paired). An
  * md5-derived per-mille bucket gives both, is engine-portable (DuckDB
  * oracle computes the identical bucket), and the filter is a narrow
  * map-only pass — no shuffle, fully pushed into the scan stage.
  */
object Sampling {

  /** Engine-stable uniform per-mille bucket in [0, 1000); NULL ids hash
    * deterministically (as the empty string) instead of being dropped.
    */
  def hashMille(id: Column): Column = StableHash.bucket(id, 1000)

  /** @param df          input rows
    * @param idCol       row id (hash key — sampling is a pure function of it)
    * @param stratum     stratum label column (any expression)
    * @param rates       stratum label -> keep rate in [0,1]
    * @param defaultRate keep rate for labels absent from `rates`
    * @return rows surviving their stratum's rate, plus `stratum` and
    *         `mille` (the bucket that decided them — audit evidence)
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    // `stratum`/`mille` are OUTPUT contract columns — withColumn would
    // silently overwrite same-named caller columns (the AsOfJoin lesson)
    require(
      !df.columns.contains("stratum") && !df.columns.contains("mille"),
      "stratifiedSample: input must not already have `stratum`/`mille` columns")
    // integer thresholds (rate per mille) — a double comparison would
    // reintroduce cross-engine FP boundary surprises for rates like 0.07
    val thresh = rates.foldLeft(lit((defaultRate * 1000).round.toInt)) {
      case (acc, (label, rate)) =>
        when(stratum === label, lit((rate * 1000).round.toInt)).otherwise(acc)
    }
    df.withColumn("stratum", stratum)
      .withColumn("mille", hashMille(col(idCol)))
      .filter(col("mille") < thresh)
  }

  /** Deterministic weighted sampling without replacement, n per group —
    * the Efraimidis–Spirakis one-pass scheme (IPL 2006): each row draws
    * key `u^(1/w)` (equivalently ranked as `ln(u)/w`) and the n largest
    * keys per group win, which yields exactly the
    * probability-proportional-to-weight sample WITHOUT a global pass over
    * the weights. The curation use: sample training documents
    * proportional to quality/length weights, reproducibly.
    *
    * Determinism contract: `u = (md5Long(id)+1)/2^32 ∈ (0,1]` — a pure
    * function of the row id, so the sample is re-run-stable, join-stable
    * and engine-replayable (same md5 hash, exact power-of-two division;
    * the only float call is `ln`, whose ≥1-ulp-separated keys make a
    * cross-engine rank flip vanishingly unlikely, tie-broken by id
    * regardless).
    *
    * Rows with NULL or non-positive weight are EXCLUDED (a zero-weight
    * row must never be sampled; E-S keys are undefined there).
    *
    * Scale shape: narrow key computation + one keyed window rank bounded
    * by the largest group — same cost envelope as [[exactPerGroup]].
    */
  def weightedPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weight: Column,
      n: Int
  ): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("es_rank"),
      "weightedPerGroup: input must not already have an `es_rank` column")
    import org.apache.spark.sql.expressions.Window
    val u = (StableHash.md5Long(col(idCol)).cast("double") + 1.0) / 4294967296.0
    val key = log(u) / weight
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(key.desc, col(idCol))
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("es_rank", row_number().over(w))
      .filter(col("es_rank") <= n)
  }

  /** Exact-N-per-group balanced downsample: the `n` rows of each group with
    * the smallest (stable-hash, id) key — deterministic, engine-portable
    * (same md5 bucket a DuckDB twin computes), and join-stable like
    * [[stratifiedSample]]. Where the rate-based sampler keeps a
    * PROPORTIONAL slice, this caps every group at the same absolute budget
    * — the balanced-classes shape.
    *
    * The per-group cut is a keyed window rank, so the sort is bounded by
    * the largest group; at extreme group sizes pre-filter with
    * `stratifiedSample` first to shrink the window input.
    */
  def exactPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      n: Int
  ): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("_rk"),
      "exactPerGroup: input must not already have a `_rk` column")
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(StableHash.md5Long(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }
}
