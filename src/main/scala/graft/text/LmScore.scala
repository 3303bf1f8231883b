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

  /** Interpolated-bigram surprisal — one order up from [[surprisal]]:
    *
    *   p(t2 | t1)    = λ · c(t1 t2) / c(t1 ·) + (1-λ) · c(t2) / N
    *   surprisal2(d) = mean over d's bigram occurrences of -ln p(t2|t1)
    *
    * where c(t1 t2) are corpus bigram counts, c(t1 ·) the bigram-start
    * (context) counts derived from them, and the unigram term is the same
    * MLE as [[surprisal]] — the standard fixed-weight Jelinek-Mercer
    * interpolation, so unseen-in-context tokens back off to their corpus
    * frequency instead of -ln 0.
    *
    * Documents with fewer than 2 tokens have no transitions and are
    * excluded. Scale shape: the bigram streams are [[TfIdf]]-shaped keyed
    * aggregations; the per-bigram stats join is vocabulary²-bounded and
    * shuffles on the bigram key — the same shape any distributed bigram LM
    * build has.
    */
  def bigramSurprisal(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      nTokens: Long,
      lambda: Double = 0.7
  ): DataFrame = {
    require(lambda > 0 && lambda < 1, "bigram surprisal: need 0 < lambda < 1")
    val toks = docsDf
      .filter(textCol.isNotNull)
      .select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
    // corpus unigram counts over ALL tokens (same stats surprisal() uses)
    val uni = toks
      .select(explode(col("_toks")).as("t2"))
      .groupBy(col("t2")).agg(sum(lit(1L)).as("c2"))
    val tf2 = toks
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol),
        explode(graft.dedup.WordShinglesExpr.wordShingles(col("_toks"), 2)).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("tf"))
    val c12 = tf2.groupBy(col("bigram")).agg(sum(col("tf")).as("c12"))
      .withColumn("t1", substring_index(col("bigram"), " ", 1))
      .withColumn("t2", substring_index(col("bigram"), " ", -1))
    val c1 = c12.groupBy(col("t1")).agg(sum(col("c12")).as("c1"))
    val bstats = c12.join(c1, "t1").join(uni, "t2")
      .select(col("bigram"), col("c12"), col("c1"), col("c2"))
    val p = lit(lambda) * col("c12") / col("c1") +
      (lit(1.0) - lit(lambda)) * col("c2") / lit(nTokens.toDouble)
    tf2.join(bstats, "bigram")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        (sum(col("tf") * -log(p)) / sum(col("tf"))).as("surprisal2"))
  }
}
