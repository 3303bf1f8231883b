package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram language-model surprisal scoring — the cheap statistical proxy
  * for "how unusual is this document relative to the corpus" that data
  * pipelines use for quality filtering before a real LM perplexity pass.
  *
  *   p(t)          = c(t) / N            (corpus unigram MLE; every token
  *                                        in the corpus has c(t) >= 1)
  *   surprisal(d)  = sum_t tf(d,t) * ln(N / c(t)) / len(d)
  *
  * i.e. the mean negative log-likelihood per token. Boilerplate-heavy
  * documents score low, rare-vocabulary documents score high.
  *
  * Scale shape: identical to [[TfIdf]] — doc-term counts, a vocabulary-
  * sized aggregate, one join on `term` (broadcast when the vocabulary
  * fits), and a final per-document aggregation. No global sorts.
  */
object LmScore {

  /** @param nTokens corpus token count N, pre-computed (one count job) so
    *                the plan stays a pure function of its inputs
    * @return one row per document with >=1 token: `n_tokens` (document
    *         length) and `surprisal` (mean -ln p per token)
    */
  def surprisal(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      nTokens: Long
  ): DataFrame = {
    val tf = TfIdf.termFrequencies(docsDf, idCol, textCol)
    val corpusCounts = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    tf.join(corpusCounts, "term")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * log(lit(nTokens.toDouble) / col("c"))) /
          sum(col("tf"))).as("surprisal")
      )
  }
}
