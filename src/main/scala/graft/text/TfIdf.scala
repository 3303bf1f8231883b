package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the classic
  * relevance signal for training-data curation (topic balance, keyword
  * filtering, near-boilerplate detection).
  *
  *   tf(d, t)  = occurrences of t in d (whitespace tokens)
  *   idf(t)    = ln((N + 1) / (df(t) + 1))      (smoothed)
  *   score     = tf * idf
  *
  * Scale shape: two keyed aggregations (doc-term counts, then term doc
  * frequencies) and one join on `term`. The term-frequency side is
  * vocabulary-sized — orders of magnitude smaller than the corpus — so the
  * join broadcasts when it fits and AQE handles it otherwise; the final
  * per-document top-k is a keyed window over doc-term rows, never a global
  * sort. Head terms ("the") are hot join keys, but the tf side is already
  * aggregated per (doc, term), which caps the row count per key at N docs —
  * the same bound any inverted index lives with.
  */
object TfIdf {

  /** Doc-term frequencies: one row per (id, term) with count `tf`. */
  def termFrequencies(docsDf: DataFrame, idCol: String, textCol: Column): DataFrame =
    docsDf
      .select(col(idCol), explode(TextAnalysis.tokens(textCol)).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** One-job top-k terms per document by tf-idf: the corpus size N is a
    * single-row `count(*)` aggregate broadcast-cross-joined onto the scored
    * rows (the scalar-subquery pattern) — no driver pre-scan, and the
    * count-only branch prunes to a zero-column parquet scan.
    * Ties break lexicographically so the cut is deterministic.
    */
  def topTerms(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame = {
    val n = docsDf.agg(count(lit(1)).as("_n_docs"))
    topTermsOver(docsDf, idCol, textCol, k, col("_n_docs"),
      _.crossJoin(broadcast(n)))
  }

  /** Top-k terms per document by tf-idf; ties break lexicographically so
    * the cut is deterministic (and oracle-reproducible).
    *
    * @param nDocs corpus size N for the idf, pre-computed — for pipelines
    *              that amortize one stats pass across many scorers
    */
  def topTerms(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int,
      nDocs: Long
  ): DataFrame =
    topTermsOver(docsDf, idCol, textCol, k, lit(nDocs), identity)

  /** Shared tail; `n` is integral (literal or broadcast count column), so
    * both variants compute bit-identical double scores.
    */
  private def topTermsOver(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int,
      n: Column,
      attachStats: DataFrame => DataFrame
  ): DataFrame = {
    val tf = termFrequencies(docsDf, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    attachStats(tf.join(dfreq, "term"))
      .withColumn(
        "score",
        col("tf") * log((n + 1).cast("double") / (col("df") + 1)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }
}
