package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction + out-of-vocabulary scoring — the tokenizer-prep
  * step of a training-data pipeline: count corpus token frequencies, keep
  * tokens above a min-count floor, assign dense ids by (count desc, token),
  * then score each document by how much of it falls outside the vocabulary.
  *
  * Scale shape: the frequency count is one explode + hash-aggregate (map-side
  * combined, so the shuffle carries distinct tokens per partition, not token
  * occurrences). Id assignment is a global sort over the SURVIVING vocab only
  * — bounded by `maxSize`, not by corpus size — and a real vocabulary is
  * 10^4..10^6 rows, so the single-partition window is driver-scale by
  * construction, never corpus-scale. OOV scoring broadcasts the vocab into a
  * hash join against the exploded token stream.
  */
object Vocab {

  /** (token, n_occurrences, n_docs, vocab_id); ids dense from 0 by
    * (n_occurrences desc, token asc).
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 2L,
      maxSize: Int = 1 << 20
  ): DataFrame = {
    val counts = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col(idCol)).as("n_docs")
      )
      .filter(col("n_occurrences") >= minCount)
    counts
      .withColumn(
        "vocab_id",
        (row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("token"))
        ) - 1).cast("long")
      )
      .filter(col("vocab_id") < maxSize)
  }

  /** Per-document OOV stats against a built vocab:
    * (id, n_tokens, n_oov, oov_rate). `oov_rate` stays a raw double —
    * callers canonicalize for comparison.
    */
  def oovStats(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    toks
      .join(
        broadcast(vocab.select(col("token"), lit(1).as("_in_vocab"))),
        Seq("token"),
        "left"
      )
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("_in_vocab").isNull, 1)).as("n_oov")
      )
      .withColumn(
        "oov_rate",
        when(col("n_tokens") > 0, col("n_oov") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0))
      )
  }
}
