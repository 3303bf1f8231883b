package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup shape
  * (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the embeddings,
  * then compare pairs only WITHIN a cluster and drop every vector that is
  * too cosine-similar to a lower-id cluster member.
  *
  * This is the scale path for semantic dedup: the quadratic pairwise
  * compare is confined to one cluster, so total work is sum(|c|^2) instead
  * of n^2, and the cluster id is the sole shuffle key. At 100 TB you dial
  * `k` so the largest cluster fits one executor's pairwise budget
  * (k ~ n / desired_cluster_size); a skewed mega-cluster is the one hazard,
  * mitigated by raising k or salting the self-join like
  * [[graft.dedup.Dedup.selfJoinPairs]]. Cluster assignment reuses
  * [[Ivf.build]] — a narrow broadcast-literal argmin, no n*k shuffle.
  *
  * Keep rule: a vector is dropped iff some LOWER-id vector in the same
  * cluster has cosine >= eps. This deterministic lowest-id-wins variant of
  * the paper's keep-one-per-duplicate-group rule makes the operator
  * engine-reproducible (the paper keeps a random group member).
  */
object SemDedup {

  /** Per-vector dedup decision: (id, centroid_id, max_cos_lower, kept).
    *
    * `max_cos_lower` is the highest cosine between the vector and any
    * lower-id member of its cluster (null when it is the cluster's lowest
    * id), so the output carries the evidence for each drop, not just the
    * verdict.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      iters: Int = 2,
      eps: Double = 0.3
  ): DataFrame = {
    val (centroids, assigned) = Ivf.build(df, idCol, vecCol, k, iters)
    val slim = assigned.select(col(idCol), col(vecCol), col("centroid_id"))
    val l = slim.as("l")
    val r = slim.as("r")
    // Within-cluster pairs, oriented low-id -> high-id; only the higher id
    // can be dropped, so aggregate the max cosine onto the right side.
    val maxLower = l
      .join(
        r,
        col("l.centroid_id") === col("r.centroid_id") &&
          col(s"l.$idCol") < col(s"r.$idCol")
      )
      .select(
        col(s"r.$idCol").as(idCol),
        Similarity.cosine(col(s"l.$vecCol"), col(s"r.$vecCol")).as("cos")
      )
      .groupBy(col(idCol))
      .agg(max(col("cos")).as("max_cos_lower"))
    assigned
      .select(col(idCol), col("centroid_id"))
      .join(maxLower, Seq(idCol), "left")
      .select(
        col(idCol),
        col("centroid_id"),
        col("max_cos_lower"),
        (col("max_cos_lower").isNull || col("max_cos_lower") < eps)
          .as("kept")
      )
  }

  /** The deduplicated corpus: input rows whose dedup verdict is `kept`. */
  def dedupe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      iters: Int = 2,
      eps: Double = 0.3
  ): DataFrame =
    df.join(
      semanticDedup(df, idCol, vecCol, k, iters, eps)
        .filter(col("kept"))
        .select(col(idCol)),
      Seq(idCol)
    )
}
