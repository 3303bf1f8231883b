package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest path — Spark re-expression of the reference's Python loader
  * (reference: src/dbt_gdpr_anonymizer/scripts/download_data.py:66-148):
  * JSONL -> per-record flatten of nested `geo` / `writeAddress` objects and
  * the `website` array -> renamed flat table, with bad-record tolerance.
  *
  * The reference's per-record try/except-and-skip (download_data.py:114-118)
  * maps to Spark's PERMISSIVE JSON mode + `_corrupt_record` filtering — the
  * distributed equivalent of "skip and count parse failures". The HTTP fetch
  * itself (download_data.py:40-63) is out of engine scope (driver-side CLI
  * concern).
  */
object Ingest {

  /** The typed record contract (Pydantic ServicePublic,
    * download_data.py:20-37). */
  val rawSchema: StructType = StructType(
    Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("parent_name", StringType),
      StructField("type", StringType),
      StructField("contact_email", StringType),
      StructField("contact_phone", StringType),
      StructField("website", ArrayType(StringType)),
      StructField(
        "writeAddress",
        StructType(
          Seq(
            StructField("streetAddress", StringType),
            StructField("postalCode", StringType),
            StructField("addressLocality", StringType)
          )
        )
      ),
      StructField(
        "geo",
        StructType(
          Seq(
            StructField("latitude", DoubleType),
            StructField("longitude", DoubleType),
            StructField("commune", StringType),
            StructField("insee_comm", StringType)
          )
        )
      ),
      StructField("update", StringType),
      StructField("_corrupt_record", StringType)
    )
  )

  /** Flatten + rename (download_data.py:87-109). Works on any DataFrame with
    * the raw nested shape (from `readJsonl` or a test fixture).
    */
  def flatten(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("service_id"),
      col("name").as("service_name"),
      col("parent_name").as("parent_organization"),
      col("type").as("organization_type"),
      col("contact_email"),
      col("contact_phone"),
      // website[0] — reference takes the first element or NULL
      // (download_data.py:97-101); element_at is NULL-safe on NULL arrays.
      element_at(col("website"), 1).as("website"),
      col("writeAddress.streetAddress").as("street_address"),
      col("writeAddress.postalCode").as("postal_code"),
      col("writeAddress.addressLocality").as("city"),
      col("geo.commune").as("commune"),
      col("geo.latitude").as("latitude"),
      col("geo.longitude").as("longitude"),
      col("geo.insee_comm").as("insee_code"),
      col("update").as("last_updated")
    )

  /** JSONL -> flat services table. Returns (goodRows, corruptCount). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, Long) = {
    val raw = spark.read
      .schema(rawSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val corrupt = raw.filter(col("_corrupt_record").isNotNull).count()
    val good = flatten(raw.filter(col("_corrupt_record").isNull))
    (good, corrupt)
  }

  /** Deterministic exact-n sample (download_data.py:141-143 uses
    * `random_state=42`). Spark-side determinism via seeded `rand` sort; the
    * selected rows differ from pandas but the contract (reproducible exact-n
    * sample) is preserved (SURVEY.md §7.9).
    */
  def deterministicSample(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** CSV seed sink (download_data.py:135-148): header, UTF-8. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(path)

  /** Report sinks (export_pii_report.py:167-195): JSON + CSV twins. */
  def exportReport(df: DataFrame, outDir: String): Unit = {
    df.coalesce(1).write.mode("overwrite").json(s"$outDir/json")
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/csv")
  }

  /** Dataset summary aggregates (download_data.py:161-167). */
  def summarize(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      count(col("contact_email")).as("emails_present"),
      count(col("contact_phone")).as("phones_present"),
      countDistinct(col("organization_type")).as("distinct_org_types")
    )
}
