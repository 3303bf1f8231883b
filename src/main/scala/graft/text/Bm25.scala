package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 relevance scoring of a corpus against a fixed query-term set —
  * the standard retrieval/curation scorer (topic targeting, boilerplate
  * down-weighting) a training-data pipeline runs when selecting documents
  * for a domain mix.
  *
  *   idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
  *   score(d, q) = sum over t in q of
  *                   idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *
  * Scale shape: the `isin(queryTerms)` filter runs on the exploded token
  * stream BEFORE the first aggregation, so only query-term rows ever reach a
  * shuffle — the corpus-sized token stream stays a narrow codegen'd stage.
  * Document-frequency is |queryTerms| rows (broadcast join), document length
  * is a narrow map joined on the doc key. N and avgdl are passed in
  * pre-computed so the plan stays a pure function of its inputs (same
  * contract as [[TfIdf.topTerms]]).
  */
object Bm25 {

  /** Working/output names shared by both entry points — an idCol matching
    * any of them would be silently shadowed by a withColumn/select.
    */
  private val Reserved = Seq(
    "_toks", "term", "tf", "df", "dl", "_ts", "n_matched", "score",
    "query_id", "rank", "_rounded", "_n_docs", "_avgdl")

  /** Shared scoring pipeline: per-(doc, term) rows with the BM25 term score
    * `_ts`, the term pruned by `prune` BEFORE the first aggregation (so the
    * corpus-sized token stream never reaches a shuffle).
    *
    * `nDocs`/`avgDl` are Columns: either literals (pre-computed stats) or
    * the `_n_docs`/`_avgdl` fields of the broadcast single-row corpus
    * aggregate that `attachStats` cross-joins on. The two spellings carry
    * the same exact values, so scores are bit-identical doubles.
    */
  private def scoredDocTerms(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      prune: DataFrame => DataFrame,
      nDocs: Column,
      avgDl: Column,
      attachStats: DataFrame => DataFrame,
      k1: Double,
      b: Double
  ): DataFrame = {
    require(!Reserved.contains(idCol),
      s"bm25: idCol '$idCol' collides with a working column")
    val toks = docsDf.select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
    val dl = toks.select(col(idCol), size(col("_toks")).cast("long").as("dl"))
    val tf = prune(toks.select(col(idCol), explode(col("_toks")).as("term")))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // one row per (doc, term) -> count(*) is the document frequency
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      lit(1.0) +
        (nDocs - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * (lit(k1) + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgDl))
    attachStats(tf.join(dfreq, "term").join(dl, idCol))
      .withColumn("_ts", termScore)
  }

  /** In-plan corpus stats: ONE single-row aggregate (corpus size N and mean
    * document length) over the token stream, broadcast onto the scored rows
    * via the scalar-subquery pattern — same association order as the
    * driver-side `nToks.toDouble / n`, so the double value is identical.
    */
  private def corpusStats(docsDf: DataFrame, idCol: String, textCol: Column): DataFrame =
    docsDf
      .select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
      .agg(
        count(lit(1)).cast("double").as("_n_docs"),
        (sum(size(col("_toks"))).cast("double") / count(lit(1))).as("_avgdl"))

  /** One-job scoring: corpus stats computed in-plan (see [[corpusStats]]).
    *
    * @param queryTerms fixed query vocabulary (exact whitespace tokens)
    * @return one row per document matching at least one query term:
    *         `n_matched` (distinct query terms present) and `score`
    */
  def score(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val stats = corpusStats(docsDf, idCol, textCol)
    scoreOver(docsDf, idCol, textCol, queryTerms,
      col("_n_docs"), col("_avgdl"), _.crossJoin(broadcast(stats)), k1, b)
  }

  /** Pre-computed-stats variant, for pipelines that amortize one corpus
    * stats pass across many scorers.
    *
    * @param nDocs corpus size N
    * @param avgDl mean document length in tokens over the corpus
    */
  def score(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queryTerms: Seq[String],
      nDocs: Long,
      avgDl: Double,
      k1: Double,
      b: Double
  ): DataFrame =
    scoreOver(docsDf, idCol, textCol, queryTerms,
      lit(nDocs.toDouble), lit(avgDl), identity, k1, b)

  private def scoreOver(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queryTerms: Seq[String],
      nDocs: Column,
      avgDl: Column,
      attachStats: DataFrame => DataFrame,
      k1: Double,
      b: Double
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: query must have at least one term")
    require(b >= 0 && b <= 1, s"bm25: b must be in [0,1], got $b")
    require(k1 >= 0, s"bm25: k1 must be non-negative, got $k1")
    scoredDocTerms(docsDf, idCol, textCol,
      _.filter(col("term").isin(queryTerms: _*)), nDocs, avgDl, attachStats, k1, b)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_matched"),
        sum(col("_ts")).as("score"))
  }

  /** Multi-query top-k retrieval: rank every document against every query of
    * a query SET and keep the best `topK` per query — the batch "search
    * engine" shape (eval-set retrieval, domain-mix selection by prompt set).
    *
    * `queriesDf` is the exploded form (query_id, term), and is query-set
    * sized — explicitly broadcast, so the corpus-side token stream is pruned
    * by a broadcast semi-join BEFORE its first shuffle exactly like
    * [[score]]'s `isin`. The per-query ranking is a keyed window (never a
    * global sort). Ranking uses the floor-rounded score (6 decimals, the
    * [[graft.queries.Parity]] arithmetic) so the cut is reproducible across
    * engines and runs: a raw FP sum differs in last-ulp across addition
    * orders, and ranking on it would make top-k membership nondeterministic.
    */
  def retrieveTopK(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queriesDf: DataFrame,
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val stats = corpusStats(docsDf, idCol, textCol)
    retrieveTopKOver(docsDf, idCol, textCol, queriesDf,
      col("_n_docs"), col("_avgdl"), _.crossJoin(broadcast(stats)), topK, k1, b)
  }

  /** Pre-computed-stats variant (see [[score]]'s scalar overload). */
  def retrieveTopK(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queriesDf: DataFrame,
      nDocs: Long,
      avgDl: Double,
      topK: Int,
      k1: Double,
      b: Double
  ): DataFrame =
    retrieveTopKOver(docsDf, idCol, textCol, queriesDf,
      lit(nDocs.toDouble), lit(avgDl), identity, topK, k1, b)

  private def retrieveTopKOver(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      queriesDf: DataFrame,
      nDocs: Column,
      avgDl: Column,
      attachStats: DataFrame => DataFrame,
      topK: Int,
      k1: Double,
      b: Double
  ): DataFrame = {
    require(topK > 0, "bm25: topK must be positive")
    require(b >= 0 && b <= 1, s"bm25: b must be in [0,1], got $b")
    require(k1 >= 0, s"bm25: k1 must be non-negative, got $k1")
    val qTerms = queriesDf.select(col("term")).distinct()
    val perQueryDoc = scoredDocTerms(docsDf, idCol, textCol,
      _.join(broadcast(qTerms), "term"), nDocs, avgDl, attachStats, k1, b)
      .join(broadcast(queriesDf), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("_ts")).as("score"))
    rankPerQuery(perQueryDoc, idCol, topK)
  }

  /** Shared per-query ranking cut: floor-round in the double domain
    * (Parity.roundHalfUp's formula) so top-k membership is reproducible
    * across engines and FP summation orders, then a keyed window.
    */
  private def rankPerQuery(perQueryDoc: DataFrame, idCol: String, topK: Int): DataFrame = {
    val rounded = floor(col("score") * 1e6 + 0.5) / 1e6
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_rounded").desc, col(idCol))
    perQueryDoc
      .withColumn("_rounded", rounded)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol), col("n_matched"),
        col("_rounded").as("score"))
  }

  /** Persist a BM25 search index: `postings/` — one row per (doc, term)
    * carrying `tf` and the doc length `dl`, REPARTITIONED BY term and
    * sorted within partitions so a query-term probe prunes parquet row
    * groups via min/max statistics — and `stats/`, the one-row
    * (`_n_docs`, `_tot_tokens`, `_avgdl`) corpus aggregate. The
    * search-service leg of the index-persistence family (band index,
    * IVF, PQ, model): tokenize the corpus ONCE at build; retrieval reads
    * only the probed slice of the postings table and never touches
    * document text again.
    *
    * `_tot_tokens` exists for [[appendSearchIndex]]: counts and token
    * totals are integer-valued doubles, so a merged `_avgdl` =
    * merged-total / merged-count is BIT-IDENTICAL to a full rebuild —
    * appending never drifts from the from-scratch index.
    */
  def writeSearchIndex(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      dir: String
  ): Unit = {
    require(!Reserved.contains(idCol),
      s"bm25: idCol '$idCol' collides with a working column")
    writePostings(docsDf, idCol, textCol, dir, "overwrite")
    indexStats(docsDf, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The postings write shared by build (`overwrite`) and append. */
  private def writePostings(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      dir: String,
      mode: String
  ): Unit = {
    val toks = docsDf.select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
    val dl = toks.select(col(idCol), size(col("_toks")).cast("long").as("dl"))
    toks
      .select(col(idCol), explode(col("_toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
      .repartition(col("term"))
      .sortWithinPartitions(col("term"))
      .write.mode(mode).parquet(s"$dir/postings")
  }

  /** [[corpusStats]] plus the exact token total — the stored-stats schema
    * (same `_avgdl` association order, so the value is identical).
    */
  private def indexStats(docsDf: DataFrame, idCol: String, textCol: Column): DataFrame =
    docsDf
      .select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
      .agg(
        count(lit(1)).cast("double").as("_n_docs"),
        sum(size(col("_toks"))).cast("double").as("_tot_tokens"),
        (sum(size(col("_toks"))).cast("double") / count(lit(1))).as("_avgdl"))

  /** Append a new batch's postings to a stored index and merge the corpus
    * stats exactly — the daily-ingest shape (crawl increments land, the
    * serving index absorbs them without re-tokenizing the corpus). The
    * caller is responsible for batch ids being new to the index (run the
    * dedup gate first — the CurateCli ordering).
    *
    * Write order is postings first, then a temp-dir swap of `stats/`: a
    * crash between the two leaves retrieval serving slightly-stale
    * N/avgdl against complete postings (bounded score drift, no wrong
    * rows); a crash mid-swap leaves `stats_new/` complete on disk next to
    * the old `stats/` (or a missing `stats/` recoverable by renaming
    * `stats_new/` in). Re-running a partially-applied append would double
    * the batch's postings — recover by rebuilding, not re-appending.
    */
  def appendSearchIndex(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      dir: String
  ): Unit = {
    require(!Reserved.contains(idCol),
      s"bm25: idCol '$idCol' collides with a working column")
    val spark = docsDf.sparkSession
    val storedCols = spark.read.parquet(s"$dir/postings").columns
    require(storedCols.contains(idCol),
      s"bm25: stored postings carry ${storedCols.mkString(",")} — no '$idCol'")
    // one-row reads/aggs, driver-bounded by design
    val old = spark.read.parquet(s"$dir/stats").head()
    val batch = indexStats(docsDf, idCol, textCol).head()
    writePostings(docsDf, idCol, textCol, dir, "append")
    val n = old.getAs[Double]("_n_docs") + batch.getAs[Double]("_n_docs")
    val tot = old.getAs[Double]("_tot_tokens") + batch.getAs[Double]("_tot_tokens")
    import spark.implicits._
    Seq((n, tot, tot / n))
      .toDF("_n_docs", "_tot_tokens", "_avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats_new")
    val conf = spark.sparkContext.hadoopConfiguration
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(conf)
    fs.delete(statsPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats_new"), statsPath)
  }

  /** Right-to-erasure through the stored index: purge every posting of
    * the erased documents and decrement the corpus stats EXACTLY, so the
    * served index is value-identical to a rebuild over the retained
    * corpus ([[graft.operators.Erasure]] scaladoc: erasure that leaves a
    * subject's documents recoverable from a postings index is not
    * erasure).
    *
    * Stats exactness: a document's token total IS its `dl`, carried on
    * every one of its posting rows — one distinct (id, dl) row per
    * erased doc recovers the exact token decrement. Counts and totals
    * are integer-valued doubles, so `(_n_docs − e, _tot_tokens − etok,
    * tot/n)` is bit-identical to [[indexStats]] over the retained corpus
    * (the [[appendSearchIndex]] merge argument, run in reverse) — EXCEPT
    * for zero-token documents, which have no posting rows to count.
    * That is why the caller passes `nErased`, the number of erased ids
    * actually present in the indexed corpus: the corpus owner (e.g. the
    * CurateCli sweep) knows it from its own corpus purge.
    *
    * The postings rewrite is a broadcast anti-join — narrow, no shuffle,
    * term-clustering preserved file-for-file; the stats swap reuses the
    * append path's `stats_new` rename.
    */
  def eraseFromSearchIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      keys: DataFrame,
      idCol: String,
      nErased: Long
  ): Long = {
    import graft.operators.Erasure
    Erasure.recoverRetired(spark, s"$dir/postings")
    val k = keys.select(col(idCol)).distinct()
    val erasedTok = spark.read.parquet(s"$dir/postings")
      .join(broadcast(k), Seq(idCol), "left_semi")
      .select(col(idCol), col("dl")).distinct()
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    val removed = Erasure.eraseByKey(spark, s"$dir/postings", k, idCol)
    if (nErased == 0L && removed == 0L) return 0L
    val old = spark.read.parquet(s"$dir/stats").head()
    val n = old.getAs[Double]("_n_docs") - nErased.toDouble
    val tot = old.getAs[Double]("_tot_tokens") - erasedTok.toDouble
    require(n >= 0.0 && tot >= 0.0,
      s"bm25 erase: stats would go negative (n=$n tot=$tot) — nErased " +
        "must count only ids present in the indexed corpus")
    import spark.implicits._
    Seq((n, tot, if (n > 0.0) tot / n else 0.0))
      .toDF("_n_docs", "_tot_tokens", "_avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats_new")
    val conf = spark.sparkContext.hadoopConfiguration
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(conf)
    fs.delete(statsPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats_new"), statsPath)
    removed
  }

  /** Load an index written by [[writeSearchIndex]]: (postings, stats). */
  def loadSearchIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/stats"))

  /** [[retrieveTopK]] against a stored index: same output contract, same
    * BM25 arithmetic, same rounded-ranking cut — but the corpus text is
    * never read. The plan is: broadcast the query vocabulary onto the
    * postings scan (term-sorted files -> row-group pruning), recover each
    * query term's exact document frequency from its own pruned postings,
    * broadcast the one-row stats, score, and rank per query.
    */
  def retrieveTopKIndexed(
      postings: DataFrame,
      stats: DataFrame,
      idCol: String,
      queriesDf: DataFrame,
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(topK > 0, "bm25: topK must be positive")
    require(b >= 0 && b <= 1, s"bm25: b must be in [0,1], got $b")
    require(k1 >= 0, s"bm25: k1 must be non-negative, got $k1")
    require(!Reserved.contains(idCol),
      s"bm25: idCol '$idCol' collides with a working column")
    val qTerms = queriesDf.select(col("term")).distinct()
    val pruned = postings.join(broadcast(qTerms), "term")
    // df(t) over the pruned postings IS the exact document frequency:
    // every posting of a probed term survives the term join
    val dfreq = pruned.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      lit(1.0) +
        (col("_n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * (lit(k1) + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("_avgdl")))
    val perQueryDoc = pruned
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_ts", termScore)
      .join(broadcast(queriesDf), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("_ts")).as("score"))
    rankPerQuery(perQueryDoc, idCol, topK)
  }
}
