package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.masking.Masking._

/** Unit tests for the masking expression library (SURVEY.md §2.1), including
  * the DuckDB-verified golden vectors for the double-hex sha256 quirk
  * (SURVEY.md §7.1).
  */
class MaskingSpec extends SparkSpec {
  import spark.implicits._

  private val salt = "dev_salt_UNSAFE"

  test("maskEmail matches DuckDB to_hex(sha256(...)) double-hex golden vectors") {
    val df = Seq(
      "test1@example.fr",
      "secretariat.sg@hatvp.fr",
      "  UPPER@Ex.FR "
    ).toDF("e")
    val got = df.select(maskEmail(col("e"), salt)).as[String].collect().toSeq
    assert(
      got == Seq(
        // Golden values computed with DuckDB 1.0.0:
        //   concat('user_', substr(to_hex(sha256(lower(trim(e)) || salt)),1,16), '@anonymized.gouv.fr')
        "user_3438633363386233@anonymized.gouv.fr",
        "user_3363613430376138@anonymized.gouv.fr",
        "user_6539336165613232@anonymized.gouv.fr"
      )
    )
  }

  test("maskEmail is NULL on NULL and empty input (mask_email.sql:33)") {
    val df = Seq(Some(""), None, Some("a@b.fr")).toDF("e")
    val got = df.select(maskEmail(col("e"), salt)).collect().map(_.isNullAt(0)).toSeq
    assert(got == Seq(true, true, false))
  }

  test("maskPhone keeps 6 chars + ' XX XX XX XX' (mask_phone.sql:8-11)") {
    val df = Seq("+33 1 72 60 58 70", "  +33 1 72 60 58 70  ", "", "0612345678")
      .toDF("p")
    val got = df.select(maskPhone(col("p"))).collect().map(_.getString(0)).toSeq
    assert(got(0) == "+33 1  XX XX XX XX") // substr(,1,6) = "+33 1 " incl. space
    assert(got(1) == "+33 1  XX XX XX XX") // trimmed first
    assert(got(2) == null)                 // empty string -> NULL
    assert(got(3) == "061234 XX XX XX XX")
  }

  test("isValidEmail basic format predicate (mask_email.sql:71-77)") {
    val df = Seq("a@b.fr", "x@y", "a@b.@c", "a@.f", "ab.fr").toDF("e")
    val got = df.select(isValidEmail(col("e"))).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, false, false))
  }

  test("extractEmailDomain lowercases and guards on validity (mask_email.sql:94-108)") {
    val df = Seq("User@HATVP.FR", "nodomain").toDF("e")
    val got = df.select(extractEmailDomain(col("e"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("hatvp.fr", null))
  }

  test("extractCountryCode keeps through first space; '' when no space (mask_phone.sql:66-80)") {
    val df = Seq("+33 1 72", "+331234", "0612345678").toDF("p")
    val got = df.select(extractCountryCode(col("p"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("+33 ", "", null))
  }

  test("normalizePhone strips space dash dot lparen (mask_phone.sql:98-111)") {
    val df = Seq(" +33 (0)1-72.60 58 70 ").toDF("p")
    val got = df.select(normalizePhone(col("p"))).as[String].head()
    assert(got == "+330)172605870")
  }

  test("isValidPhone requires +/0 prefix and >=10 normalized chars (mask_phone.sql:128-139)") {
    val df = Seq("+33 1 72 60 58 70", "0612345678", "12345678901", "+33 1").toDF("p")
    val got = df.select(isValidPhone(col("p"))).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, false))
  }

  test("maskCoordinates = round(cast(x as DECIMAL(18,3)), 2) with half-up ties (SURVEY §7.2)") {
    val df = Seq(48.8566, -0.125, 2.3522, 49.0).toDF("x")
    val got = df
      .select(maskCoordinates(col("x")).cast("string"))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got == Seq("48.86", "-0.13", "2.35", "49.00"))
  }

  test("areValidCoordinates range predicate (mask_coordinates.sql:58-65)") {
    val df = Seq((48.85, 2.35), (91.0, 0.0), (0.0, -181.0)).toDF("lat", "lon")
    val got = df
      .select(areValidCoordinates(col("lat"), col("lon")))
      .collect()
      .map(_.getBoolean(0))
      .toSeq
    assert(got == Seq(true, false, false))
  }

  test("haversineDistance Paris-Marseille ~660km (mask_coordinates.sql:89-99)") {
    val df = Seq((48.8566, 2.3522, 43.2965, 5.3698)).toDF("a", "b", "c", "d")
    val km = df
      .select(haversineDistance(col("a"), col("b"), col("c"), col("d")))
      .as[Double]
      .head()
    assert(math.abs(km - 660.9) < 1.0)
  }

  test("createGeohash renders decimals with trailing zeros and skips NULLs like DuckDB concat") {
    val df = Seq(
      (Some(48.8566), Some(2.3522)),
      (Some(49.0), Some(-0.1)),
      (None: Option[Double], None: Option[Double])
    ).toDF("lat", "lon")
    val got = df
      .select(createGeohash(col("lat"), col("lon")))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got == Seq("geo_48.86_2.35", "geo_49.00_-0.10", "geo__"))
  }

  test("maskFullCoordinates emits typed NULL *_masked columns (mask_coordinates.sql:152-157)") {
    val df  = Seq((48.85, 2.35)).toDF("lat", "lon")
    val out = df.select(maskFullCoordinates("lat", "lon"): _*)
    assert(out.columns.toSeq == Seq("lat_masked", "lon_masked"))
    assert(out.collect().head == Row(null, null))
  }

  test("surrogateKey = md5 of string-cast key, dbt-utils null sentinel (stg_services_publics.sql:81)") {
    val df = Seq(Some("TEST001"), None).toDF("k")
    val got = df.select(surrogateKey(Seq(col("k")))).collect().map(_.getString(0)).toSeq
    // DuckDB: md5(coalesce(cast('TEST001' as varchar),'_dbt_utils_surrogate_key_null_'))
    assert(got.head == "d71a94c7e5e5c200a174c36b3d20439b")
    assert(got(1) == "f14cc5cdce0420f4a5a6b6d9d7b85f39") // md5('_dbt_utils_surrogate_key_null_')
  }
}
