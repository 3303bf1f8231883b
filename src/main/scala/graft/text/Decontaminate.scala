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
    val overlap = corpusSh
      .join(benchSh, Seq("shingle"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    corpusSh
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
      .join(overlap, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn(
        "overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }
}
