package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ranked corpus selection: rank every document within its source
  * by floor-rounded quality score and expose decile + percentile position —
  * the "keep the top X% per source" primitive of corpus curation (ranking
  * per source keeps one noisy source from eating the global budget).
  *
  * Ranking is per-source, so the window sort is bounded by the largest
  * source, not the corpus; the rank key is the ROUNDED score with an id
  * tie-break, so the cut is engine-reproducible (raw-double ranking is
  * not). percent_rank = (rank-1)/(n-1) is a quotient of exact ints —
  * engine-exact.
  */
object QualitySelect {

  /** (id, group, q6, decile, pct): quality rank per group, best first
    * (decile 1 / pct 0.0 = best).
    */
  def ranks(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      groupCol: String = "source"
  ): DataFrame = {
    val q = when(col(textCol).isNull, lit(0.0)).otherwise(
      TextAnalysis.qualityScoreOfStats(TextAnalysis.textStats(col(textCol))))
    val q6 = floor(q * lit(1e6) + lit(0.5)) / lit(1e6)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("q6").desc, col(idCol))
    docs
      .select(col(idCol), col(groupCol), q6.as("q6"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pct", percent_rank().over(w))
  }

  /** The top `frac` (0..1] of each group by quality — pct is left in the
    * output so the caller can audit the cut.
    */
  def topFraction(
      docs: DataFrame,
      frac: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      groupCol: String = "source"
  ): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    docs.join(
      ranks(docs, idCol, textCol, groupCol)
        .filter(col("pct") <= frac)
        .select(col(idCol), col("pct")),
      idCol
    )
  }
}
