package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.dedup.{Dedup, SimHash64}
import graft.masking.Masking
import graft.policy.EngineConfig
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** SQL registration of the whole function library, so every operator is also
  * reachable from `spark.sql(...)` — the equivalent of the reference's macro
  * namespace. Expressions are the same Catalyst trees as the Column API
  * (no UDFs), so SQL and DataFrame users get identical plans.
  */
object GraftFunctions {

  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def e(col: Column): Expression = GraftColumnBridge.expression(col)

  def register(spark: SparkSession, cfg: EngineConfig = EngineConfig()): Unit = {
    val reg = spark.sessionState.functionRegistry

    def register1(name: String)(f: Column => Column): Unit =
      reg.createOrReplaceTempFunction(name, exprs => e(f(c(exprs.head))), "scala_udf")

    def register2(name: String)(f: (Column, Column) => Column): Unit =
      reg.createOrReplaceTempFunction(
        name, exprs => e(f(c(exprs(0)), c(exprs(1)))), "scala_udf")

    def register4(name: String)(f: (Column, Column, Column, Column) => Column): Unit =
      reg.createOrReplaceTempFunction(
        name, exprs => e(f(c(exprs(0)), c(exprs(1)), c(exprs(2)), c(exprs(3)))), "scala_udf")

    // masking library (SURVEY.md §2.1)
    register1("mask_email")(Masking.maskEmail(_, cfg.saltKey, cfg.outputDomain))
    register1("mask_phone")(Masking.maskPhone(_))
    register1("mask_coordinates")(Masking.maskCoordinates(_, cfg.gpsPrecision))
    register1("is_valid_email")(Masking.isValidEmail)
    register1("extract_email_domain")(Masking.extractEmailDomain)
    register1("extract_country_code")(Masking.extractCountryCode)
    register1("normalize_phone")(Masking.normalizePhone)
    register1("is_valid_phone")(Masking.isValidPhone)
    register2("are_valid_coordinates")(Masking.areValidCoordinates)
    register2("create_geohash")(Masking.createGeohash(_, _, cfg.gpsPrecision))
    register4("haversine_distance")(Masking.haversineDistance)

    // text analysis
    register1("graft_tokens")(TextAnalysis.tokens)
    register1("token_count")(TextAnalysis.tokenCount)
    register1("bpe_token_count")(TextAnalysis.bpeTokenCount)
    register1("lang_id")(TextAnalysis.langId)
    register1("quality_score")(TextAnalysis.qualityScore)
    register1("fingerprint_md5")(TextAnalysis.fingerprintMd5)
    register1("rolling_fingerprint")(TextAnalysis.rollingFingerprint)
    register1("nfc_normalize")(graft.text.TextNormalize.nfc)
    register1("clean_text")(graft.text.TextNormalize.clean(_))
    reg.createOrReplaceTempFunction(
      "text_stats",
      exprs => graft.text.TextStatsExpr(Cast(exprs.head, StringType)),
      "scala_udf")

    // dedup / similarity
    // Cast defers type resolution: SQL-side children arrive as unresolved
    // ColumnNode wrappers whose dataType isn't known at registration.
    reg.createOrReplaceTempFunction(
      "simhash64",
      exprs => SimHash64(Cast(exprs.head, ArrayType(StringType))),
      "scala_udf")
    register2("hamming_distance")(Dedup.hammingDistance)
    register2("jaccard")(Dedup.jaccard)
    register2("jaro_winkler")(graft.text.JaroWinklerExpr.jaroWinkler)
    register2("cosine_similarity")(Similarity.cosine)
    register2("dot_product")(Similarity.dot)
    register1("l2_norm")(Similarity.l2Norm)
    // aggregate: topk_by_score(id, score, k) with a foldable k
    reg.createOrReplaceTempFunction(
      "topk_by_score",
      exprs => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by_score requires a literal k, got $other")
        }
        graft.similarity.TopKByScore(
          Cast(exprs(0), org.apache.spark.sql.types.LongType),
          Cast(exprs(1), org.apache.spark.sql.types.DoubleType),
          k
        ).toAggregateExpression()
      },
      "scala_udf")
  }
}
