package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Cross-source shingle-overlap matrix — how much distinct n-gram mass
  * each pair of corpus sources shares. The mix-design / leakage audit a
  * training pipeline runs before weighting sources: heavy overlap between
  * two sources means their nominal token counts double-count content (and
  * an eval source overlapping a train source is contamination).
  *
  * For each unordered source pair (a < b, lexicographic):
  * `n_a`/`n_b` distinct shingle counts, `n_shared`, and the set Jaccard
  * `n_shared / (n_a + n_b - n_shared)`.
  *
  * Scale shape: ONE distinct (source, shingle-md5) aggregation (the
  * shuffle moves fixed-width digests, map-side combined), then a
  * per-shingle `collect_set(source)` whose size is bounded by |sources| —
  * deliberately NOT a shingle self-join, which would put every occurrence
  * of a hot shingle through a join key. Pair expansion is ≤ |sources|²/2
  * per shingle and the final aggregate is |sources|²-row. Only observed
  * pairs appear (a pair with zero shared shingles has no row).
  */
object SourceOverlap {

  /** @param samplePerMille audit-scale knob: Some(p) keeps only shingles
    *        whose deterministic md5 bucket ([[StableHash]], the Sampling
    *        convention) falls below p of 1000 — sampling the SHINGLE
    *        universe, not documents, so every source pair is measured on
    *        the SAME sampled universe and the Jaccard estimate stays
    *        comparable across pairs (n_a/n_b/n_shared all scale by ~p/1000
    *        and the ratio is an unbiased estimate of the exact Jaccard).
    *        At 100 TB this divides the exploded-shingle shuffle by 1000/p;
    *        None (default) keeps the exact path the oracles replay.
    */
  def shingleOverlapMatrix(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      shingleK: Int = 3,
      samplePerMille: Option[Int] = None
  ): DataFrame = {
    samplePerMille.foreach(p =>
      require(p >= 1 && p <= 1000, s"sourceOverlap: samplePerMille must be in [1, 1000], got $p"))
    val exploded = docs
      .select(
        col(sourceCol).as("_src"),
        explode(
          array_distinct(
            transform(Dedup.wordShingles(col(textCol), shingleK), x => md5(x))))
          .as("_h"))
    val ss = samplePerMille
      .fold(exploded)(p => exploded.filter(StableHash.bucket(col("_h"), 1000) < p))
      .distinct()
    val totals = ss.groupBy(col("_src")).agg(count(lit(1)).as("n"))
    // per-shingle sorted source set -> ordered pairs (a < b)
    val srcs = col("_srcs")
    val pairs = ss
      .groupBy(col("_h"))
      .agg(sort_array(collect_set(col("_src"))).as("_srcs"))
      .select(
        explode(
          flatten(transform(srcs, (a, i) =>
            transform(
              slice(srcs, i + lit(2), greatest(size(srcs) - i - 1, lit(0))),
              b => struct(a.as("sa"), b.as("sb")))))).as("_p"))
      .select(col("_p.sa").as("sa"), col("_p.sb").as("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(totals.select(col("_src").as("sa"), col("n").as("n_a")), "sa")
      .join(totals.select(col("_src").as("sb"), col("n").as("n_b")), "sb")
      .select(
        col("sa").as("source_a"),
        col("sb").as("source_b"),
        col("n_a"), col("n_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
  }
}
