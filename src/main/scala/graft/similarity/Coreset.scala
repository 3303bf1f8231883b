package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-balanced prototype selection ("coreset" subsampling): keep the
  * `perCluster` most-central members of each k-means cluster — the
  * diversity-preserving subsample of an embedding corpus. A uniform sample
  * follows the data's density and lets dominant clusters crowd out the
  * tail; selecting per cluster keeps representatives from every region of
  * the embedding space at a fixed total budget (k * perCluster).
  *
  * Scale shape: cluster assignment is the [[Ivf.build]] narrow
  * broadcast-literal argmin, and the per-cluster selection is the
  * [[TopKByScore]] bounded-heap partial aggregate — each partition forwards
  * at most `perCluster` candidates per cluster, so the shuffle carries
  * O(partitions * k * perCluster) rows regardless of corpus size (the
  * window-function form would shuffle and sort every row).
  */
object Coreset {

  /** (id, centroid_id, sq_dist, rank): the `perCluster` members of each
    * cluster nearest their centroid, rank 1.. by (sq_dist asc, id asc).
    */
  def prototypes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      iters: Int = 2,
      perCluster: Int = 10
  ): DataFrame = {
    val (_, assigned) = Ivf.build(df, idCol, vecCol, k, iters)
    // TopKByScore keeps the HIGHEST scores; negate the squared distance so
    // "closest to centroid" wins, with the heap's id-asc tie-break giving
    // the same deterministic order as (sq_dist asc, id asc)
    assigned
      .groupBy(col("centroid_id"))
      .agg(TopKByScore.topK(col(idCol), -col("_dist"), perCluster).as("_protos"))
      .select(col("centroid_id"), inline(col("_protos")))
      .select(
        col("dst").as(idCol),
        col("centroid_id"),
        (-col("score")).as("sq_dist"),
        col("rank")
      )
  }
}
