package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every k-gram, slide a window of `w` consecutive
  * hashes, and select each window's minimum — ties to the RIGHTMOST position.
  * The selected (position, hash) set is a compact fingerprint that guarantees
  * any shared run of w+k-1 tokens between two documents shares at least one
  * fingerprint, at an expected density of 2/(w+1) — the local, position-aware
  * alternative to MinHash for plagiarism-style overlap detection.
  *
  * The min-with-rightmost-tie-break is folded into ONE comparable long:
  * `hash * 2^20 + (2^20-1 - pos)` — minimizing it minimizes (hash, -pos)
  * lexicographically, so a plain `min` aggregate does the whole selection and
  * the identical integer arithmetic runs on the oracle side. Bounds: 32-bit
  * md5-prefix hash * 2^20 < 2^52 stays inside a signed long (ANSI-safe);
  * positions are capped at 2^20-1 tokens per document (a 1M-token doc is
  * beyond any sane training-document length — split upstream).
  *
  * Scale shape: narrow shingle+hash stage, ONE per-document keyed window
  * (the sole shuffle), then a distinct on the selected rows. Window state is
  * bounded by `w`, partitions by document — no global ordering anywhere.
  */
object Winnow {

  private val PosCap = 1 << 20

  /** 32-bit md5-prefix k-gram hash — THE engine-stable base hash
    * ([[graft.dedup.Dedup.minhashBase]]), not a copy, so the cross-operator
    * hash compatibility cannot drift.
    */
  def gramHash(shingle: Column): Column = graft.dedup.Dedup.minhashBase(shingle)

  /** @param k token n-gram size
    * @param w window size in consecutive k-grams
    * @return one row per selected fingerprint: (id, pos, fp) where `pos` is
    *         the 0-based token offset of the selected k-gram and `fp` its
    *         32-bit hash; ordered selection, deduplicated
    */
  def fingerprints(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int,
      w: Int
  ): DataFrame = {
    require(k > 0 && w > 0, "winnow: k and w must be positive")
    require(!Seq("pos", "shingle", "fp", "_key", "_sel", "_full").contains(idCol),
      s"winnow: idCol '$idCol' collides with a working column")
    val grams = docsDf
      .filter(textCol.isNotNull && TextAnalysis.tokenCount(textCol) > 0)
      .select(
        col(idCol),
        posexplode(graft.dedup.Dedup.wordShingles(textCol, k)).as(Seq("pos", "shingle")))
      .select(
        col(idCol),
        col("pos"),
        // the fold is only injective below the position cap — beyond it the
        // key would alias into the previous hash's range and silently select
        // wrong grams, so overflow must FAIL, not corrupt (require() cannot
        // see data; this is the expression-level equivalent)
        when(col("pos") < PosCap,
          gramHash(col("shingle")) * PosCap + (lit(PosCap - 1) - col("pos")))
          .otherwise(raise_error(concat(
            lit("winnow: document exceeds 2^20 k-grams at "), col(idCol).cast("string"),
            lit(" — split upstream")))
            .cast("long"))
          .as("_key"))
    val win = Window
      .partitionBy(col(idCol))
      .orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    // a row starts a complete window (w grams), or — for documents with
    // fewer than w grams total — position 0 alone spans the whole document,
    // so short documents still yield their global-min fingerprint
    grams
      .select(
        col(idCol),
        min(col("_key")).over(win).as("_sel"),
        (count(lit(1)).over(win) === w ||
          (col("pos") === 0 && count(lit(1)).over(win) < w)).as("_full"))
      .filter(col("_full"))
      .select(
        col(idCol),
        (lit(PosCap - 1) - col("_sel") % PosCap).cast("int").as("pos"),
        floor(col("_sel") / PosCap).cast("long").as("fp"))
      .distinct()
  }

  /** Per-document fingerprint-set summary: selected-position count and an
    * order-insensitive SET digest (sum of distinct fp values mod 2^32 —
    * engine-portable). `n_fp` counts selected (pos, fp) rows; `fp_digest`
    * deliberately ignores multiplicity (a gram selected at several
    * positions contributes once), so two documents with equal fingerprint
    * SETS digest equal even when selection multiplicities differ.
    */
  def fingerprintDigest(
      docsDf: DataFrame,
      idCol: String,
      textCol: Column,
      k: Int,
      w: Int
  ): DataFrame =
    fingerprints(docsDf, idCol, textCol, k, w)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_fp"),
        (sum_distinct(col("fp")) % lit(4294967296L)).cast("long").as("fp_digest"))
}
