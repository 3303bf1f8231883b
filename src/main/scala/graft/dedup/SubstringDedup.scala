package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level deduplication: find the maximal duplicated token spans in
  * every document — the span-granular dedup (vs whole-document MinHash) that
  * removes boilerplate passages repeated across a crawl while keeping the
  * unique remainder of each page.
  *
  * Method: every k-token window (shingle) is hashed; a shingle occurring more
  * than once corpus-wide marks its k-token span as duplicated; overlapping /
  * adjacent duplicated spans merge into maximal spans (gaps-and-islands over
  * a per-document keyed window).
  *
  * Scale shape: one narrow shingle+hash stage, ONE corpus-wide aggregation on
  * the 60-bit shingle hash (the only all-data shuffle — and it shuffles
  * 12-byte hash rows, not shingle text), a semi-join back (AQE broadcasts the
  * duplicated-hash side when it fits — it is bounded by the duplicated
  * vocabulary, not the corpus), and a per-document window for the merge.
  * The hash keeps shuffle bytes flat no matter how long the shingles are;
  * 60 bits keeps the arithmetic inside a signed long (Spark 4 ANSI overflow)
  * while making false collisions negligible, and the SAME hash is computed on
  * the oracle side so results stay bit-identical even if one occurred.
  */
object SubstringDedup {

  /** Engine-stable 60-bit shingle hash (15 hex chars of md5). */
  def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long")

  /** One row per k-shingle occurrence: (id, n_tokens, pos, h).
    * Documents shorter than k produce their single clamped whole-doc shingle
    * ([[WordShinglesExpr.compute]]); NULL/empty text is gated out (an empty
    * doc has no spans, and `least`/`greatest` null-skip would otherwise let
    * NULL rows corrupt the merge — docs/ROUND2.md #25).
    */
  private[dedup] def positionedShingles(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame =
    docsDf
      .filter(textCol.isNotNull && graft.text.TextAnalysis.tokenCount(textCol) > 0)
      .select(
        col(idCol),
        graft.text.TextAnalysis.tokenCount(textCol).as("n_tokens"),
        posexplode(Dedup.wordShingles(textCol, k)).as(Seq("pos", "shingle")))
      .select(col(idCol), col("n_tokens"), col("pos"), shingleHash(col("shingle")).as("h"))

  /** Maximal duplicated spans.
    *
    * @return one row per span: `span_id` (0-based within the document),
    *         `start_tok` / `end_tok` (inclusive token offsets), `n_tokens`
    *         (span width) and `n_shingles` (duplicated shingles merged in)
    */
  def duplicateSpans(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame = {
    require(k > 0, "substring dedup: k must be positive")
    require(!Seq("n_tokens", "pos", "shingle", "h", "_new", "span_id",
      "start_tok", "end_tok", "n_shingles").contains(idCol),
      s"substring dedup: idCol '$idCol' collides with a working column")
    val sh = positionedShingles(docsDf, idCol, textCol, k)
    val dup = sh
      .groupBy(col("h"))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > 1)
      .select(col("h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    sh.join(dup, Seq("h"), "leftsemi")
      .withColumn(
        "_new",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") - lag(col("pos"), 1).over(w) > k, 1).otherwise(0))
      .withColumn("span_id", (sum(col("_new")).over(run) - 1).cast("int"))
      .groupBy(col(idCol), col("span_id"))
      .agg(
        min(col("pos")).as("start_tok"),
        max(least(col("pos") + k - 1, col("n_tokens") - 1)).as("end_tok"),
        count(lit(1)).cast("int").as("n_shingles"))
      .withColumn("n_tokens", (col("end_tok") - col("start_tok") + 1).cast("int"))
  }

  /** Per-document summary: duplicated-token count and fraction (the usual
    * drop/keep signal). Documents with no duplicated span report 0.
    */
  def dupStats(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int
  ): DataFrame = {
    val spans = duplicateSpans(docsDf, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens")).cast("long").as("dup_tokens"))
    docsDf
      .filter(textCol.isNotNull)
      .select(col(idCol), graft.text.TextAnalysis.tokenCount(textCol).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn(
        "dup_frac",
        when(col("n_tokens") > 0, col("dup_tokens").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
  }
}
