package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.masking.{MaskModel, Masking}
import graft.policy.{EngineConfig, PolicyCatalog}

/** The four-layer relational pipeline of the reference
  * (seed -> staging -> anonymized -> enriched -> mart), re-expressed as
  * composable `DataFrame => DataFrame` stages. The whole chain is a narrow
  * (map-only) transformation: scan -> project -> filter -> project, one
  * Spark stage, no shuffle — it scales linearly with input splits at any
  * data size (SURVEY.md §4).
  *
  * Audit-timestamp columns (`loaded_at`, `anonymized_at`, `mart_created_at`)
  * are nondeterministic in the reference (`current_timestamp`); stages accept
  * a `now` column so tests/oracle comparisons can pin or drop them
  * (SURVEY.md §7.5).
  */
object Pipeline {

  /** `stg_services_publics` (models/staging/stg_services_publics.sql:33-97):
    * typing casts, NOT NULL filter, surrogate key, presence flags.
    */
  def staging(raw: DataFrame, now: Column = current_timestamp()): DataFrame = {
    val cleaned = raw
      .select(
        col("service_id"),
        col("service_name"),
        col("parent_organization"),
        col("organization_type"),
        col("contact_email"),
        col("contact_phone"),
        col("website"),
        col("street_address"),
        col("postal_code"),
        col("city"),
        col("commune"),
        col("latitude").cast(DoubleType).as("latitude"),
        col("longitude").cast(DoubleType).as("longitude"),
        col("insee_code"),
        col("last_updated").cast(DateType).as("last_updated"),
        now.as("loaded_at")
      )
      .filter(col("service_id").isNotNull && col("service_name").isNotNull)

    cleaned.select(
      Masking.surrogateKey(Seq(col("service_id"))).as("service_key") +:
        cleaned.columns.map(col) :+
        when(col("contact_email").isNotNull, 1).otherwise(0).as("has_email") :+
        when(col("contact_phone").isNotNull, 1).otherwise(0).as("has_phone") :+
        when(col("street_address").isNotNull, 1).otherwise(0).as("has_address") :+
        when(col("latitude").isNotNull && col("longitude").isNotNull, 1)
          .otherwise(0).as("has_coordinates"): _*
    )
  }

  /** `int_services_anonymized`
    * (models/intermediate/privacy/int_services_anonymized.sql:41-50):
    * policy-driven `mask_model` + audit literals.
    */
  def anonymize(
      staged: DataFrame,
      catalog: PolicyCatalog = PolicyCatalog.reference,
      cfg: EngineConfig = EngineConfig(),
      now: Column = current_timestamp()
  ): DataFrame =
    MaskModel
      .maskModel(staged, catalog.policiesFor("stg_services_publics"), cfg)
      .withColumn("anonymized_at", now)
      .withColumn("anonymization_version", lit(cfg.projectVersion))
      .withColumn(
        "gps_anonymization_method",
        lit(s"round_${cfg.gpsPrecision}_decimals")
      )

  /** The 18-slug -> 8-bucket organization categorization
    * (int_services_enriched.sql:42-76). */
  def organizationCategory(orgType: Column): Column =
    when(
      orgType.isin(
        "administration-centrale-ou-ministere",
        "cabinet-ministeriel",
        "service-a-competence-nationale",
        "secretaire-d-etat",
        "service-deconcentre"
      ),
      "services_centraux"
    ).when(
      orgType.isin(
        "autorite-publique-independante",
        "autorite-administrative-independante"
      ),
      "autorites"
    ).when(
      orgType.isin("etablissement-public", "groupement-d-interet-public"),
      "operateurs"
    ).when(orgType === "etablissement-d-enseignement", "enseignement")
      .when(orgType === "ambassade-ou-mission-diplomatique", "diplomatie")
      .when(orgType.isin("institution-europeenne", "institution"), "institutions")
      .when(
        orgType === "conseil-comite-commission-organisme-consultatif",
        "instances_consultatives"
      )
      .otherwise("autres")

  /** `int_services_enriched` (int_services_enriched.sql:35-99): business
    * category, department code, geohash, post-anonymization quality flags.
    */
  def enrich(anonymized: DataFrame, gpsPrecision: Int = 2): DataFrame =
    anonymized
      .withColumn(
        "organization_category",
        organizationCategory(col("organization_type_anon"))
      )
      .withColumn(
        "department_code_anon",
        substring(col("postal_code_anon"), 1, 2)
      )
      .withColumn(
        "geohash_anon",
        Masking.createGeohash(
          col("latitude_anon"),
          col("longitude_anon"),
          gpsPrecision
        )
      )
      .withColumn(
        "is_email_properly_anonymized",
        when(col("contact_email_anon").like("%@anonymized.gouv.fr"), 1)
          .otherwise(0)
      )
      .withColumn(
        "is_phone_properly_anonymized",
        when(col("contact_phone_anon").like("%XX XX XX XX"), 1).otherwise(0)
      )

  /** The simplified department -> region mapping
    * (mart_services_open_data.sql:76-83). */
  def regionFromDepartment(dept: Column): Column =
    when(dept.isin("75", "77", "78", "91", "92", "93", "94", "95"), "Île-de-France")
      .when(dept.isin("59", "62"), "Hauts-de-France")
      .when(dept.isin("69", "01", "42", "63"), "Auvergne-Rhône-Alpes")
      .when(
        dept.isin("13", "83", "84", "04", "05", "06"),
        "Provence-Alpes-Côte d'Azur"
      )
      .when(dept.isin("33", "24", "40", "47", "64"), "Nouvelle-Aquitaine")
      .when(
        dept.isin("31", "09", "12", "32", "46", "65", "81", "82"),
        "Occitanie"
      )
      .otherwise("Autre région")

  /** `mart_services_open_data` (mart_services_open_data.sql:37-146):
    * `_anon -> business-name` renames, display labels, region map,
    * completeness score, publication filter.
    *
    * The reference reads the lateral alias `department_code` inside the same
    * SELECT (line 72 then 76-83); in the DataFrame API we reference the
    * source column directly (SURVEY.md §7.4).
    */
  def mart(
      enriched: DataFrame,
      cfg: EngineConfig = EngineConfig(),
      now: Column = current_timestamp()
  ): DataFrame = {
    val completeness =
      col("has_email_anon").cast(IntegerType) +
        col("has_phone_anon").cast(IntegerType) +
        col("has_address_anon").cast(IntegerType) +
        col("has_coordinates_anon").cast(IntegerType)

    enriched
      .select(
        col("service_id_anon").as("service_id"),
        col("service_name_anon").as("service_name"),
        col("parent_organization_anon").as("parent_organization"),
        col("organization_type_anon").as("organization_type"),
        when(col("organization_type_anon") === "ministere", "Ministère")
          .when(
            col("organization_type_anon") === "autorite-administrative-independante",
            "Autorité Indépendante"
          )
          .when(
            col("organization_type_anon") === "etablissement-public",
            "Établissement Public"
          )
          .when(col("organization_type_anon") === "service-central", "Service Central")
          .otherwise("Autre")
          .as("organization_type_label"),
        col("contact_email_anon").as("contact_email"),
        col("contact_phone_anon").as("contact_phone"),
        col("city_anon").as("city"),
        col("commune_anon").as("commune"),
        col("department_code_anon").as("department_code"),
        regionFromDepartment(col("department_code_anon")).as("region"),
        col("latitude_anon").as("latitude"),
        col("longitude_anon").as("longitude"),
        col("geohash_anon").as("geohash"),
        col("insee_code_anon").as("insee_code"),
        col("postal_code_anon").as("postal_code"),
        col("has_email_anon").as("has_email"),
        col("has_phone_anon").as("has_phone"),
        col("has_address_anon").as("has_address"),
        col("has_coordinates_anon").as("has_coordinates"),
        completeness.as("data_completeness_score"),
        when(completeness >= 3, "Complet")
          .when(completeness === 2, "Partiel")
          .otherwise("Minimal")
          .as("data_quality_level"),
        col("last_updated_anon").as("last_updated"),
        col("anonymized_at"),
        now.as("mart_created_at"),
        col("anonymization_version"),
        concat(lit("GDPR Anonymizer v"), col("anonymization_version"))
          .as("processing_pipeline"),
        lit("Conforme GDPR - Art. 4.5 (Pseudonymisation)").as("legal_status"),
        lit("Licence Ouverte / Open Licence").as("license")
      )
      .filter(
        col("service_name").isNotNull &&
          col("organization_type").isNotNull &&
          col("data_completeness_score") >= 1
      )
  }

  /** Full chain, seed -> mart. */
  def run(
      raw: DataFrame,
      catalog: PolicyCatalog = PolicyCatalog.reference,
      cfg: EngineConfig = EngineConfig(),
      now: Column = current_timestamp()
  ): DataFrame =
    mart(enrich(anonymize(staging(raw, now), catalog, cfg, now)), cfg, now)

  /** k-anonymous geographic release: Mondrian bounding boxes over the
    * STAGED (precise, pre-mask) coordinates, each holding at least `k`
    * services — higher location utility than the mart's uniform
    * coordinate rounding (`privacy__mask_coordinates` keeps ~1.1 km
    * everywhere; envelopes adapt to density) under the same k floor the
    * compliance gate enforces. Returns None when fewer than `k` services
    * have coordinates at all: the root group itself would violate the
    * floor, so there is nothing publishable.
    *
    * Output: `group_id` (min service_id), `n_rows` (>= k), and the
    * `[lat_lo, lat_hi] x [lon_lo, lon_hi]` box.
    */
  def geoRelease(staged: DataFrame, k: Int): Option[DataFrame] = {
    val src = staged
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select(col("service_id"), col("latitude"), col("longitude"))
    if (src.limit(k).count() < k) None
    else {
      val labeled = graft.operators.Mondrian.anonymize(
        src, "service_id", Seq("latitude", "longitude"), k)
      Some(
        graft.operators.Mondrian
          .groupRanges(labeled, "service_id", Seq("latitude", "longitude"))
          .select(
            col("group_id"),
            col("n_rows"),
            col("latitude_lo").as("lat_lo"),
            col("latitude_hi").as("lat_hi"),
            col("longitude_lo").as("lon_lo"),
            col("longitude_hi").as("lon_hi")))
    }
  }
}
