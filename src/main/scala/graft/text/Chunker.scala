package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping sliding-window chunking — the retrieval-corpus twin of
  * [[SequencePacker]]: each document is cut into chunks of `size` tokens
  * advancing by `stride` (< size ⇒ overlap), the standard prep for RAG /
  * embedding corpora where windows must overlap so no span straddles a
  * chunk boundary unseen.
  *
  * Chunk starts are 0, stride, 2·stride, …; the final start is the smallest
  * multiple of `stride` from which `size` tokens (or the document tail)
  * reach the end, so every token is covered and the last chunk may be
  * short. A purely narrow op: tokenize → explode the start sequence →
  * slice — no shuffle at any scale, and the per-row fan-out is bounded by
  * ceil(size/stride) · (n/size), linear in document length.
  */
object Chunker {

  /** @param size   chunk length in tokens
    * @param stride start-to-start advance in tokens (≤ size for gapless
    *               coverage; < size for overlap)
    * @return one row per chunk: `chunk_id` (0-based), `start_tok`,
    *         `chunk_tokens` (actual length) and `chunk_text`
    */
  def slidingChunks(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      size: Int,
      stride: Int
  ): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "chunker: need 0 < stride <= size")
    // output-contract / working names must not silently shadow the id key
    require(!Seq("_toks", "chunk_id", "start_tok", "chunk_tokens", "chunk_text").contains(idCol),
      s"chunker: idCol '$idCol' collides with an output column")
    val n = org.apache.spark.sql.functions.size(col("_toks"))
    val lastChunk = greatest(
      ceil((n - size).cast("double") / stride).cast("int"), lit(0))
    docsDf
      .filter(textCol.isNotNull && TextAnalysis.tokenCount(textCol) > 0)
      .select(col(idCol), TextAnalysis.tokens(textCol).as("_toks"))
      .withColumn("chunk_id", explode(sequence(lit(0), lastChunk)))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(size), n - col("chunk_id") * stride).cast("int").as("chunk_tokens"),
        concat_ws(" ",
          slice(col("_toks"), col("chunk_id") * stride + 1, lit(size))).as("chunk_text"))
  }
}
