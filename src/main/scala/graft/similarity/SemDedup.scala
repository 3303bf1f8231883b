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
  * (k ~ n / desired_cluster_size); a skewed MEGA-CLUSTER is the one hazard,
  * and two orthogonal guards bound it:
  *
  *   - `maxCompare = Some(m)`: each vector is compared only against the m
  *     LOWEST-id members of its cluster, so a cluster of size c costs
  *     c*m pairs instead of c^2/2 — linear in c. The recall cost is
  *     confined to duplicates whose only lower-id twin ranks beyond m
  *     (mega-clusters are near-degenerate, so the lowest-m members cover
  *     them well — the same trade [[graft.dedup.Dedup.capBuckets]] makes).
  *   - `salts > 1`: result-IDENTICAL redistribution — the right side takes
  *     a deterministic salt from its id, the left replicates to all salts,
  *     and the join key becomes (centroid_id, salt), so one hot cluster's
  *     pairwise work spreads across `salts` shuffle partitions instead of
  *     serializing on one task (the [[graft.dedup.Dedup.selfJoinPairs]]
  *     shape).
  *
  * Cluster assignment reuses [[Ivf.build]] — a narrow broadcast-literal
  * argmin, no n*k shuffle.
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
      eps: Double = 0.3,
      maxCompare: Option[Int] = None,
      salts: Int = 1
  ): DataFrame = {
    val (_, assigned) = Ivf.build(df, idCol, vecCol, k, iters)
    semanticDedupAssigned(assigned, idCol, vecCol, eps, maxCompare, salts)
  }

  /** [[semanticDedup]] over an ALREADY-ASSIGNED frame
    * (`idCol`, `vecCol`, `centroid_id`) — e.g. the `assigned` half of a
    * stored [[Ivf.writeIndex]]/[[Ivf.loadIndex]] index. The 100 TB run
    * builds its cluster index once (on a sample, via
    * [[Ivf.buildOnSample]]), persists it, and semantic-dedups every later
    * corpus snapshot from the stored assignment without re-running
    * k-means — and a loaded index is cluster-partitioned on disk, so the
    * within-cluster self-join reads co-located files.
    */
  def semanticDedupAssigned(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double = 0.3,
      maxCompare: Option[Int] = None,
      salts: Int = 1
  ): DataFrame = {
    require(salts >= 1, s"semdedup: salts must be >= 1, got $salts")
    maxCompare.foreach(m => require(m >= 1, s"semdedup: maxCompare must be >= 1, got $m"))
    require(assigned.columns.contains("centroid_id"),
      "semdedup: assigned frame must carry a centroid_id column")
    val slim = assigned.select(col(idCol), col(vecCol), col("centroid_id"))
    // mega-cluster guard 1: the comparison set (left side) is capped to the
    // m lowest-id members per cluster -> c*m pairs, linear in cluster size
    val compareSet = maxCompare match {
      case Some(m) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("centroid_id")).orderBy(col(idCol))
        slim.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= m).drop("_rk")
      case None => slim
    }
    // mega-cluster guard 2: salt the join key so one hot cluster's pairwise
    // work spreads over `salts` partitions (result-identical: each (l, r)
    // pair still meets exactly once, at r's deterministic salt)
    val (l, r, saltCond) =
      if (salts <= 1) (compareSet.as("l"), slim.as("r"), lit(true))
      else (
        compareSet
          .withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1)))).as("l"),
        slim.withColumn("_salt", pmod(xxhash64(col(idCol)), lit(salts))).as("r"),
        col("l._salt") === col("r._salt")
      )
    // Within-cluster pairs, oriented low-id -> high-id; only the higher id
    // can be dropped, so aggregate the max cosine onto the right side.
    val maxLower = l
      .join(
        r,
        col("l.centroid_id") === col("r.centroid_id") && saltCond &&
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
      eps: Double = 0.3,
      maxCompare: Option[Int] = None,
      salts: Int = 1
  ): DataFrame =
    df.join(
      semanticDedup(df, idCol, vecCol, k, iters, eps, maxCompare, salts)
        .filter(col("kept"))
        .select(col(idCol)),
      Seq(idCol)
    )
}
