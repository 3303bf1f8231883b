package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse ranked lists from heterogeneous retrievers —
  * sparse lexical (BM25) and dense embedding (ANN) — with Reciprocal Rank
  * Fusion (Cormack/Clarke/Buettcher, SIGIR'09): each list contributes
  * `1 / (k0 + rank)` per document, summed across lists. RRF needs no score
  * calibration between retrievers (ranks only), which is why it is the
  * default fusion in RAG/retrieval stacks.
  *
  * Scale shape: fusion consumes ALREADY-RANKED lists (each |Q| x k rows,
  * not corpus-sized), so the fuse is a keyed aggregate plus a per-query
  * window over tiny inputs. The expensive legs stay in their own
  * scale-shaped operators ([[graft.text.Bm25.retrieveTopKIndexed]],
  * [[Ivf.searchAll]], [[Pq.searchAllAdc]]); this module only aligns and
  * sums their outputs.
  */
object Hybrid {

  /** Working/output names a list's id column must not collide with. */
  private val Reserved = Seq(
    "query_id", "rank", "cos_sim", "n_lists", "rrf_score",
    "_q", "_sim", "_top", "_r", "dst", "score")

  /** Parity.roundHalfUp's formula (see Bm25.rankPerQuery): engine-portable
    * rounding BEFORE any ranking cut so list membership is reproducible.
    */
  private def round6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Batched exact cosine top-k against a DRIVER-KNOWN query set — the
    * dense leg of a hybrid query when exactness matters (small |Q|, eval
    * harnesses, oracles). The queries are exploded as ONE literal array
    * (|Q| x dim, broadcast-free and codegen-folded), so the plan is a
    * narrow |Q|-way row multiplier over the corpus followed by a
    * [[TopKByScore]] bounded-heap aggregate: shuffle volume is
    * O(|Q| * k), never O(corpus). Ranking happens on the floor-rounded
    * cosine (ties by id asc) so the cut is engine-reproducible. For
    * corpus-scale query sets use [[Ivf.searchAll]] instead — a literal
    * query array must stay driver-sized.
    *
    * @param queries (query_id, query vector) pairs; ids must be distinct
    * @return (query_id, rank, idCol, cos_sim) with rank 1..k
    */
  def bruteForceTopKAll(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Int, Seq[Double])],
      k: Int
  ): DataFrame = {
    require(queries.nonEmpty, "hybrid: query set must be non-empty")
    require(queries.map(_._1).distinct.size == queries.size,
      "hybrid: query ids must be distinct")
    require(k > 0, s"hybrid: k must be positive, got $k")
    require(!Reserved.contains(idCol),
      s"hybrid: idCol '$idCol' collides with a working column")
    val qlit = typedLit(queries)
    corpus
      .select(col(idCol), explode(qlit).as("_q"), col(vecCol))
      .select(
        col("_q._1").as("query_id"),
        col(idCol),
        round6(Similarity.cosine(col(vecCol), col("_q._2"))).as("_sim"))
      .groupBy(col("query_id"))
      .agg(TopKByScore.topK(col(idCol), col("_sim"), k).as("_top"))
      .select(col("query_id"), inline(col("_top")))
      .select(col("query_id"), col("rank"), col("dst").as(idCol),
        col("score").as("cos_sim"))
  }

  /** Hybrid retrieval served entirely from PERSISTED indexes — the
    * production shape: the sparse leg probes a stored BM25 postings index
    * ([[graft.text.Bm25.retrieveTopKIndexed]] — term-pruned postings,
    * corpus text never read), the dense leg probes a stored IVF index
    * ([[Ivf.searchAll]] — cluster-partitioned files, only probed
    * clusters touched), and [[rrfFuse]] aligns the two ranked lists.
    * Query cost is bounded by pruned postings + probed clusters +
    * |Q| x kPerLeg fusion rows, independent of corpus size — the 100 TB
    * serving stack is three loads and two bounded probes.
    *
    * Both query frames must carry `query_id`, with aligned id values
    * (the same logical query on both legs). The dense leg's query_id and
    * id columns are cast to the sparse leg's types before fusion so the
    * union in [[rrfFuse]] never widens asymmetrically.
    *
    * @param idCol       the BM25 index's document-id column; also the
    *                    fused output's id name
    * @param denseIdCol  the IVF index's id column (renamed to `idCol`
    *                    in the fused output)
    * @param vecCol      vector column name in the stored IVF assignments
    * @param termQueries (query_id, term) rows — the sparse leg
    * @param vecQueries  (query_id, `vecQueryCol`) rows — the dense leg
    * @param kPerLeg     depth of each per-leg ranked list fed to fusion
    */
  def searchIndexed(
      spark: SparkSession,
      bm25Dir: String,
      ivfDir: String,
      idCol: String,
      denseIdCol: String,
      vecCol: String,
      termQueries: DataFrame,
      vecQueries: DataFrame,
      vecQueryCol: String,
      kPerLeg: Int,
      nprobe: Int = 2,
      k0: Int = 60,
      topK: Int
  ): DataFrame = {
    require(kPerLeg > 0, s"hybrid: kPerLeg must be positive, got $kPerLeg")
    val (postings, stats) = graft.text.Bm25.loadSearchIndex(spark, bm25Dir)
    val sparse = graft.text.Bm25
      .retrieveTopKIndexed(postings, stats, idCol, termQueries, kPerLeg)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col(idCol))
    val (centroids, assigned) = Ivf.loadIndex(spark, ivfDir)
    val qidType = sparse.schema("query_id").dataType
    val idType = sparse.schema(idCol).dataType
    val dense = Ivf
      .searchAll(assigned, centroids, denseIdCol, vecCol, vecQueries,
        "query_id", vecQueryCol, kPerLeg, nprobe)
      .select(
        col("query_id").cast(qidType).as("query_id"),
        col("rank").cast("int").as("rank"),
        col(denseIdCol).cast(idType).as(idCol))
    rrfFuse(Seq(sparse, dense), idCol, k0, topK)
  }

  /** Reciprocal Rank Fusion over ranked lists. Each input carries
    * (query_id, rank, idCol); a document's fused score is
    * `sum over lists of 1.0 / (k0 + rank)`. With the standard two legs the
    * FP sum is order-exact (double addition is commutative), and the final
    * cut ranks the floor-rounded score with an id tie-break, so fused
    * results are bit-reproducible across engines and runs.
    *
    * @param k0 the RRF damping constant (60 in the original paper)
    * @return (query_id, rank, idCol, n_lists, rrf_score), rank 1..topK
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      k0: Int = 60,
      topK: Int
  ): DataFrame = {
    require(lists.nonEmpty, "hybrid: need at least one ranked list")
    require(k0 > 0, s"hybrid: k0 must be positive, got $k0")
    require(topK > 0, s"hybrid: topK must be positive, got $topK")
    require(!Reserved.filterNot(_ == "rank").contains(idCol),
      s"hybrid: idCol '$idCol' collides with a working column")
    val contributions = lists
      .map(_.select(col("query_id"), col("rank"), col(idCol)))
      .reduce(_ union _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("_r").desc, col(idCol))
    contributions
      .groupBy(col("query_id"), col(idCol))
      .agg(
        count(lit(1)).as("n_lists"),
        sum(lit(1.0) / (col("rank") + lit(k0))).as("_rrf"))
      .withColumn("_r", round6(col("_rrf")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol),
        col("n_lists"), col("_r").as("rrf_score"))
  }
}
