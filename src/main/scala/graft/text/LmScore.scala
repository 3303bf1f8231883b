package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * The corpus token count N comes in two flavours: the primary overloads
  * compute it IN-PLAN as a single-row aggregate broadcast-cross-joined onto
  * the fact side (the scalar-subquery pattern), so scoring is ONE job with
  * no driver pre-scan; the `nTokens: Long` overloads take a pre-computed N
  * for pipelines that amortize one corpus-stats pass across many scorers.
  */
object LmScore {

  /** One-job scoring: N is a single-row aggregate of the same doc-term
    * counts the score reads, broadcast against the fact side — no driver
    * pre-scan, and the tf shuffle is shared by all three consumers via
    * exchange reuse.
    *
    * @return one row per document with >=1 token: `n_tokens` (document
    *         length) and `surprisal` (mean -ln p per token)
    */
  def surprisal(docsDf: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val tf = TfIdf.termFrequencies(docsDf, idCol, textCol)
    val n = tf.agg(sum(col("tf")).cast("double").as("_n_corpus"))
    surprisalOverTf(tf, idCol, col("_n_corpus"), _.crossJoin(broadcast(n)))
  }

  /** @param nTokens corpus token count N, pre-computed (one count job) for
    *                pipelines that reuse one stats pass across scorers
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
    surprisalOverTf(tf, idCol, lit(nTokens.toDouble), identity)
  }

  /** Shared scoring tail: join corpus counts, attach N (either a literal or
    * a broadcast single-row aggregate), aggregate per document. Both
    * variants produce bit-identical doubles: `n` is the same exact-integer
    * value whether it arrives as a literal or a column.
    */
  private def surprisalOverTf(
      tf: DataFrame,
      idCol: String,
      n: Column,
      attachStats: DataFrame => DataFrame
  ): DataFrame = {
    val corpusCounts = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    attachStats(tf.join(corpusCounts, "term"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * log(n / col("c"))) /
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
    *
    * One-job variant: N = Σ c(t2) is a single-row aggregate of the unigram
    * counts the plan already computes, broadcast onto the scored rows.
    */
  def bigramSurprisal(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      lambda: Double
  ): DataFrame = {
    val parts = bigramParts(docsDf, idCol, textCol, lambda)
    val n = parts.uni.agg(sum(col("c2")).cast("double").as("_n_corpus"))
    parts.score(col("_n_corpus"), _.crossJoin(broadcast(n)))
  }

  /** Pre-computed-N variant (see [[surprisal]] for when to prefer it).
    * Distinctly named: an overload would let a legacy 4-arg Long call
    * silently widen nTokens into the in-plan variant's lambda parameter.
    */
  def bigramSurprisalWithN(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      nTokens: Long,
      lambda: Double = 0.7
  ): DataFrame =
    bigramParts(docsDf, idCol, textCol, lambda)
      .score(lit(nTokens.toDouble), identity)

  /** The shared bigram pipeline up to the per-(doc, bigram) scored join. */
  private case class BigramParts(
      tf2: DataFrame,
      bstats: DataFrame,
      uni: DataFrame,
      idCol: String,
      lambda: Double
  ) {
    def score(n: Column, attachStats: DataFrame => DataFrame): DataFrame = {
      val p = lit(lambda) * col("c12") / col("c1") +
        (lit(1.0) - lit(lambda)) * col("c2") / n
      attachStats(tf2.join(bstats, "bigram"))
        .groupBy(col(idCol))
        .agg(
          sum(col("tf")).as("n_bigrams"),
          (sum(col("tf") * -log(p)) / sum(col("tf"))).as("surprisal2"))
    }
  }

  private def bigramParts(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      lambda: Double
  ): BigramParts = {
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
    BigramParts(tf2, bstats, uni, idCol, lambda)
  }
}
