package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a signed-random-
  * projection (SRP) LSH-bucketed variant as the scale path.
  *
  * Scale design (100 TB / billions of vectors):
  *   - Brute force is a broadcast of the query vector + one narrow map +
  *     `ORDER BY LIMIT k` (Spark's TakeOrderedAndProject — no full sort,
  *     per-partition top-k then merge on the driver).
  *   - SRP-LSH computes a b-bit signature per vector (narrow, codegen'd
  *     arithmetic over literal hyperplanes), buckets by signature band, and
  *     only joins within buckets — the candidate join is the sole shuffle,
  *     keyed on band hash. Recall/cost trades via bits and bands.
  *   - All arithmetic uses higher-order functions (`zip_with`, `aggregate`)
  *     — no UDF serialization wall.
  */
object Similarity {

  /** Dot product of two `array<float/double>` columns — left-to-right fold,
    * deterministic. Backed by the native [[DotProductExpr]] (one fused
    * codegen loop); [[dotHof]] is the value-identical higher-order-function
    * formulation it replaced (kept for the parity spec).
    */
  def dot(a: Column, b: Column): Column = DotProductExpr.dot(a, b)

  /** HOF twin of [[dot]] — interpreted (CodegenFallback); spec reference. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Exact top-k by cosine against one query vector (given as a literal —
    * broadcast-safe, folded into codegen).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int
  ): DataFrame = {
    val q = typedLit(query)
    corpus
      .select(col(idCol), cosine(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic ±1 hyperplanes for SRP signatures (seeded). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** b-bit SRP signature: bit h = 1 iff dot(vec, hyperplane_h) > 0. */
  def srpSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, h) =>
        when(dot(vec, typedLit(p)) > 0, lit(1L << h)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** All-pairs near-neighbor candidates via SRP banding: signature split
    * into `bands` chunks; vectors sharing any chunk are candidates, then
    * exact cosine verifies. Same LSH join shape as MinHash dedup.
    */
  def srpCandidatePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int = 16,
      bands: Int = 4,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val bitsPerBand = bits / bands
    val mask = (1L << bitsPerBand) - 1
    val sig = srpSignature(col(vecCol), hyperplanes(bits, dim, seed))
    val withSig = df.select(col(idCol), col(vecCol), sig.as("sig"))
    val blocks = withSig.select(
      col(idCol),
      col(vecCol),
      posexplode(
        array((0 until bands).map(b => shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)
      ).as(Seq("band", "key"))
    )
    val l = blocks.as("l")
    val r = blocks.as("r")
    l.join(
      r,
      col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col(s"l.$idCol") < col(s"r.$idCol")
    ).select(
      col(s"l.$idCol").as("id_a"),
      col(s"r.$idCol").as("id_b"),
      cosine(col(s"l.$vecCol"), col(s"r.$vecCol")).as("cos_sim")
    ).groupBy(col("id_a"), col("id_b"))
      .agg(first(col("cos_sim")).as("cos_sim"))
  }

  /** k nearest neighbors for every vector among SRP candidates (approximate
    * kNN graph): candidates -> bounded-heap top-k per source id
    * ([[TopKByScore]], an `ObjectHashAggregateExec` with map-side partial
    * top-k — each partition forwards at most k pairs per source, vs the
    * window-function form that shuffles and sorts every candidate edge).
    */
  def annTopKGraph(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 16,
      bands: Int = 4,
      dim: Int = 64
  ): DataFrame = {
    val pairs = srpCandidatePairs(df, idCol, vecCol, bits, bands, dim)
    val sym = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("cos_sim"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), col("cos_sim")))
    sym
      .groupBy(col("src"))
      .agg(TopKByScore.topK(col("dst"), col("cos_sim"), k).as("nbrs"))
      .select(col("src"), inline(col("nbrs")))
      .select(col("src"), col("dst"), col("score").as("cos_sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (the dedup flavor): SRP
    * candidates filtered at a high similarity threshold. Defaults use 8-bit
    * band keys (32 bits / 4 bands): at 0.95 cosine the per-band collision
    * probability is ~0.43, so 4 bands still reach ~0.9 recall while keeping
    * 256 buckets per band — a 4-bit key (16 buckets) makes the candidate
    * join quadratic long before real scale.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      bits: Int = 32,
      bands: Int = 4,
      dim: Int = 64
  ): DataFrame =
    srpCandidatePairs(df, idCol, vecCol, bits = bits, bands = bands, dim = dim)
      .filter(col("cos_sim") >= threshold)
}
