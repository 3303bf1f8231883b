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
}
