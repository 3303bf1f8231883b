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
      nearDupJaccard: Option[Double] = None // None = exact dedup only
  )

  def prepare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config()
  ): DataFrame = {
    val scored = docs
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("repetition_ratio", TextAnalysis.repetitionRatio(col(textCol)))
      .withColumn("lang_guess", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))

    val gated = scored.filter(
      col("quality_score") >= cfg.minQuality &&
        col("repetition_ratio") <= cfg.maxRepetition &&
        col("lang_guess").isin(cfg.languages: _*)
    )

    val redacted = gated.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    // exact dedup: keep the min-id representative per distinct content
    val keep = Dedup
      .exactDedup(redacted, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactDeduped = redacted.join(keep, idCol)

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
