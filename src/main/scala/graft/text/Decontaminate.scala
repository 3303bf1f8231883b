package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination: measure word n-gram overlap between each
  * corpus document and a benchmark/eval set — the standard train-test
  * contamination check an LLM data pipeline runs before training.
  *
  * For each corpus document: the number of its DISTINCT k-shingles that
  * occur anywhere in the benchmark set, and the overlap fraction. Documents
  * above a threshold get dropped (or flagged) by the caller.
  *
  * Scale shape: both sides explode to distinct shingles; the benchmark
  * side is then `distinct` — benchmark sets are orders of magnitude smaller
  * than the corpus, so Spark broadcasts the semi-join build side when it
  * fits and AQE falls back to a shuffled semi-join otherwise. The per-doc
  * totals and overlap counts come from the SAME exploded frame, so the
  * corpus text is shingled exactly once.
  */
object Decontaminate {

  /** Per-document distinct k-shingles, one row each. */
  private def explodedShingles(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame =
    df.select(
      col(idCol),
      explode(array_distinct(Dedup.wordShingles(textCol, k))).as("shingle"))

  /** @param corpus    documents to check
    * @param benchmark held-out set to protect
    * @return one row per corpus document: `n_shingles` (distinct),
    *         `n_overlap` (distinct shingles also present in the benchmark)
    *         and `overlap_frac` in [0,1]
    */
  def overlapStats(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame = {
    val corpusSh = explodedShingles(corpus, idCol, textCol, k)
    val benchSh = explodedShingles(benchmark, idCol, textCol, k)
      .select(col("shingle"))
      .distinct()
      .withColumn("_in_bench", lit(1))
    // single pass over the corpus shingles: the left join marks benchmark
    // hits and ONE aggregation produces both counts — a separate semi-join
    // + second groupBy would shingle (explode) the corpus twice and add a
    // third shuffle to re-join the two aggregates
    corpusSh
      .join(benchSh, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("_in_bench")).as("n_overlap"))
      .withColumn(
        "overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** [[overlapStats]] with a bloom prefilter on the corpus side — for the
    * regime where the benchmark's distinct-shingle set does NOT fit a
    * broadcast (so the exact path would shuffle the ENTIRE corpus shingle
    * stream into a semi-join). A [[graft.sketch.Bloom]] filter built from
    * the benchmark shingles (one bounded driver collect, 256 KiB at the
    * default geometry) rides into the corpus scan as a codegen'd probe;
    * only the ~FP·|corpus| + |true overlaps| candidate rows reach the
    * exact join. Bloom admits no false negatives and the surviving
    * candidates are confirmed exactly, so the result is BIT-IDENTICAL to
    * [[overlapStats]] — which is precisely what its oracle twin checks.
    *
    * Trade, stated: the corpus is shingled twice (one narrow pass for
    * per-doc totals + candidate counts, one for the candidate join input)
    * instead of shuffled once in full — the q_global_ids trade: narrow
    * re-scans are cheap at 100 TB, corpus-sized shuffles are not.
    */
  def overlapStatsBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int,
      mBits: Int = graft.sketch.Bloom.DefaultBits,
      kHashes: Int = graft.sketch.Bloom.DefaultK
  ): DataFrame = {
    import graft.sketch.Bloom
    val benchSh = explodedShingles(benchmark, idCol, textCol, k)
      .select(col("shingle"))
      .distinct()
    val filter = Bloom.build(benchSh, col("shingle"), mBits, kHashes)
    val flagged = explodedShingles(corpus, idCol, textCol, k)
      .withColumn("_cand",
        Bloom.mightContain(filter, mBits, kHashes)(col("shingle")))
    val totals = flagged
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = flagged
      .filter(col("_cand"))
      .join(benchSh, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    totals
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn(
        "overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }
}
