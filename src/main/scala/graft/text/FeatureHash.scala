package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.Hll

/** Feature hashing (the "hashing trick": Weinberger, Dasgupta, Langford,
  * Smola & Attenberg, ICML 2009): tokens map to a fixed `d`-dimensional
  * vector with a hashed lane and a hashed ±1 sign — no vocabulary, no
  * fitting, no state. The signed variant keeps collisions unbiased
  * (E[collision contribution] = 0), which is why it is THE way to get
  * model-free text vectors at 100 TB: every document vectorizes
  * independently in one narrow pass, and the output feeds the
  * engine's vector stack (PCA moments, IVF, kNN, cosine near-dup)
  * without an embedding model in the loop.
  *
  * Determinism: lane and sign derive from the engine-portable 60-bit
  * md5 hash (the [[graft.sketch.Cms]] seeded-prefix convention), so any
  * md5-bearing engine replays the exact vectors.
  */
object FeatureHash {

  val DefaultDim = 32

  def lane(tok: Column, d: Int): Column =
    Hll.hash60(concat(lit("fh|"), tok)) % d

  /** +1/−1 from an independent hash (seed prefix differs). */
  def sign(tok: Column): Column =
    when(Hll.hash60(concat(lit("fhs|"), tok)) % 2 === 0, lit(1)).otherwise(lit(-1))

  /** Sparse form: one row per (id, lane) with the signed count sum —
    * zero lanes absent. One explode + one map-side-combined aggregation.
    */
  def vectorizeSparse(
      df: DataFrame,
      idCol: String,
      textCol: String,
      d: Int = DefaultDim
  ): DataFrame = {
    require(d >= 2 && d <= 4096, s"feature hash: d must be in [2,4096], got $d")
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("id"), lane(col("tok"), d).cast("int").as("lane"),
        sign(col("tok")).as("sgn"))
      .groupBy("id", "lane")
      .agg(sum(col("sgn")).cast("long").as("v"))
  }

  /** Dense array form for the vector stack: length-`d` double array per
    * id (zero-filled), assembled from the sparse rows with a map lookup
    * — no second corpus pass.
    */
  def vectorizeDense(
      df: DataFrame,
      idCol: String,
      textCol: String,
      d: Int = DefaultDim
  ): DataFrame =
    vectorizeSparse(df, idCol, textCol, d)
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("lane"), col("v")))).as("m"))
      .select(
        col("id").as(idCol),
        transform(sequence(lit(0), lit(d - 1)),
          i => coalesce(element_at(col("m"), i.cast("int")), lit(0L)).cast("double"))
          .as("features"))
}
