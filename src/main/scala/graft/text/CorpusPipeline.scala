package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** End-to-end training-corpus preparation: the composition a 100 TB text
  * pipeline actually runs — quality gate -> language filter -> PII
  * redaction -> exact dedup -> (optional) near-dup removal.
  *
  * Every stage is a narrow expression or a bounded-shuffle dedup from this
  * library; the output carries the quality/provenance columns so downstream
  * sampling can stratify.
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      maxRepetition: Double = 0.3,
      languages: Seq[String] = Seq("en"),
      nearDupJaccard: Option[Double] = None, // None = exact dedup only
      normalize: Boolean = false, // NFC + zero-width/whitespace cleanup first
      // distilled-model gate (LinearTextModel, min score): runs with the
      // heuristic gates as one narrow pass and adds a `model_score`
      // column — train on a sample, gate the corpus (the CCNet shape)
      modelGate: Option[(LinearTextModel.Model, Double)] = None
  )

  def prepare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config()
  ): DataFrame = {
    // one codegen'd traversal for all four signals (TextStatsExpr) — the
    // HOF formulation paid an interpreted pass per signal.
    // NULL text is gated out FIRST: the score formula's least/greatest
    // skip null operands (Spark null semantics), so a null-stats row would
    // otherwise score 0.9, langId would fall through to its otherwise
    // branch, and a null document could survive to the corpus. The
    // IsNotNull also pushes into the scan.
    // optional canonicalization BEFORE any hash-based stage: without NFC,
    // composed and decomposed spellings of the same text evade exact AND
    // near-dup removal (see TextNormalize) — opt-in so default-config
    // outputs stay byte-stable for the oracles
    val canonical =
      if (cfg.normalize)
        docs.withColumn(textCol, TextNormalize.clean(col(textCol)))
      else docs
    val scored = canonical
      .filter(col(textCol).isNotNull)
      .withColumn("_st", TextAnalysis.textStats(col(textCol)))
      .withColumn("quality_score", TextAnalysis.qualityScoreOfStats(col("_st")))
      .withColumn("repetition_ratio", TextAnalysis.repetitionRatioOfStats(col("_st")))
      .withColumn("lang_guess", TextAnalysis.langIdOfStats(col("_st")))
      .withColumn("n_tokens", TextAnalysis.tokenCountOfStats(col("_st")))
      .drop("_st")

    val modelScored = cfg.modelGate match {
      case None => scored
      case Some((m, _)) =>
        scored.withColumn("model_score", LinearTextModel.score(col(textCol), m))
    }
    val gated = modelScored.filter(
      col("quality_score") >= cfg.minQuality &&
        col("repetition_ratio") <= cfg.maxRepetition &&
        col("lang_guess").isin(cfg.languages: _*) &&
        cfg.modelGate.map { case (_, t) => col("model_score") >= t }
          .getOrElse(lit(true))
    )

    val redacted = gated.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    // exact dedup: keep the min-id representative per distinct content.
    // min_by(struct(*), id) hash-aggregates with map-side partial combine —
    // each partition forwards one candidate row per distinct hash, where
    // the window-ranked form shuffles and SORTS every row (and a
    // groupBy+self-join would compute the scored frame twice).
    val cols = redacted.columns
    val exactDeduped = redacted
      .groupBy(md5(col(textCol)).as("_h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_r"))
      .select(cols.map(c => col(s"_r.$c")): _*)

    cfg.nearDupJaccard match {
      case None => exactDeduped
      case Some(threshold) =>
        // near-dup removal: drop every doc clustered under a smaller id
        val pairs = Dedup.jaccardFilterPairs(
          Dedup.minhashCandidatePairs(exactDeduped, idCol, textCol,
            maxBucket = Some(256)),
          exactDeduped, idCol, textCol, threshold = threshold)
        val clusters = Dedup.connectedComponents(
          pairs.select(col("id_a"), col("id_b")))
        val drop = clusters.filter(col("id") =!= col("label"))
          .select(col("id").as(idCol))
        exactDeduped.join(drop, Seq(idCol), "left_anti")
    }
  }
}
