package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed
  * token-budget training sequences ("packs"), the GPT-style
  * concatenate-and-chunk shape.
  *
  * Scalable formulation: documents are spread over `buckets` independent
  * streams by a deterministic md5-derived bucket of the id, ordered by id
  * within each bucket, and cut by running token count — a document starts
  * pack `floor(tokens_before_it / budget)`. Exactly ONE shuffle (the keyed
  * window); no driver state; buckets bound window-partition size, so at
  * 100 TB you set `buckets` ≈ cluster parallelism and each stream packs
  * independently. Documents longer than the budget overflow their pack —
  * the downstream chunker splits them (standard concatenation semantics) —
  * rather than stalling the stream.
  *
  * The md5 bucket (not Spark's `hash`) keeps the assignment reproducible
  * across engines and Spark versions — the same trick the MinHash oracle
  * uses (docs/ROUND1.md #10).
  */
object SequencePacker {

  /** Engine-stable uniform bucket in [0, buckets) — shared md5 base hash
    * ([[graft.operators.StableHash]]).
    */
  def hashBucket(id: Column, buckets: Int): Column =
    graft.operators.StableHash.bucket(id, buckets)

  /** @param docsDf   input documents
    * @param idCol    unique document id (ordering + bucketing key)
    * @param nTokens  token-count column (e.g. [[TextAnalysis.tokenCount]])
    * @param budget   tokens per training sequence
    * @param buckets  independent packing streams (≈ cluster parallelism)
    * @return input plus `bucket`, `n_tokens`, `cum_tokens` (inclusive
    *         running total within the bucket) and `pack_id` (the sequence
    *         this document starts in; `(bucket, pack_id)` is the global
    *         sequence key)
    */
  def pack(
      docsDf: DataFrame,
      idCol: String,
      nTokens: Column,
      budget: Int,
      buckets: Int
  ): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    // output-contract columns must not silently replace caller columns
    val reserved = Seq("bucket", "n_tokens", "cum_tokens", "pack_id")
    require(
      !reserved.exists(docsDf.columns.contains),
      s"pack: input must not already have ${reserved.mkString("/")} columns")
    val w = Window
      .partitionBy(col("bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docsDf
      .withColumn("bucket", hashBucket(col(idCol), buckets))
      .withColumn("n_tokens", nTokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn(
        "pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("int"))
      // stamp the budget so chunks() can refuse a mismatched grid instead
      // of silently tiling the packs differently than they were cut
      .withMetadata(
        "pack_id",
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(BudgetMetaKey, budget.toLong).build())
  }

  private[text] val BudgetMetaKey = "graft.pack.budget"

  /** Chunk spans: one row per (document, pack) it occupies — the exact
    * shape a trainer consumes. A document starting at token offset
    * `cum - n` spans every pack boundary it crosses; `chunk_tokens` is its
    * token count inside that pack. Invariants (spec-pinned): chunk counts
    * per document sum to `n_tokens`, and every pack except each bucket's
    * last holds exactly `budget` tokens.
    *
    * Narrow on top of [[pack]]'s window output (an explode, no extra
    * shuffle). Zero-token documents occupy no pack and are dropped.
    */
  def chunks(packed: DataFrame, budget: Int): DataFrame = {
    // refuse a grid mismatch: tiling with a budget different from the one
    // pack() cut with would silently mis-size every training sequence
    val meta = packed.schema("pack_id").metadata
    if (meta.contains(BudgetMetaKey))
      require(
        meta.getLong(BudgetMetaKey) == budget.toLong,
        s"chunks: budget $budget != pack() budget ${meta.getLong(BudgetMetaKey)}")
    val start = col("cum_tokens") - col("n_tokens")
    packed
      .filter(col("n_tokens") > 0)
      .withColumn("pack_id",
        explode(
          sequence(
            floor(start / budget).cast("int"),
            floor((col("cum_tokens") - 1) / budget).cast("int"))))
      .withColumn(
        "chunk_tokens",
        (least(col("cum_tokens"), (col("pack_id") + 1).cast("long") * budget) -
          greatest(start, col("pack_id").cast("long") * budget)).cast("int"))
  }

  /** [[chunks]] plus the id payload each (document, pack) cell carries:
    * `chunk_ids` is the `chunk_tokens`-long slice of `idsCol` (a token-id
    * array, e.g. [[Bpe.bpeEncode]] output) that lands in that pack — the
    * row a trainer reads directly. REQUIRES `pack` to have been cut with
    * `nTokens = size(idsCol)`: the chunk grid and the array must agree, or
    * slices would silently mis-align (spec-pinned invariant: concatenating
    * a document's chunk_ids in pack order reproduces its full id array).
    *
    * Narrow on top of [[chunks]]'s explode — the slice is per-row
    * arithmetic, no extra shuffle.
    */
  def chunkSlices(packed: DataFrame, budget: Int, idsCol: String): DataFrame = {
    val start = col("cum_tokens") - col("n_tokens")
    chunks(packed, budget)
      .withColumn(
        "chunk_ids",
        slice(
          col(idsCol),
          (greatest(start, col("pack_id").cast("long") * budget) - start + 1).cast("int"),
          col("chunk_tokens")))
  }
}
