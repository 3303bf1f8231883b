package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.masking.Masking
import graft.pipeline.Pipeline
import graft.policy.PolicyCatalog
import graft.validate.Validate

/** The driver-contract query registry: every implemented operator from
  * SURVEY.md §2 (plus extensions) as a named Spark query with, where
  * SQL-expressible, a DuckDB oracle twin. Column names/types are aligned
  * between both sides; every query ends in a deterministic ORDER BY.
  */
object Registry {

  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String]
  )

  private val salt = OracleSql.salt

  // ---- pipeline-stage queries (SURVEY §2.1 #13-14, §2.2) -----------------

  private def stagedDf(s: SparkSession, dir: String): DataFrame =
    Pipeline.staging(Tables.services(s, dir))

  private def enrichedDf(s: SparkSession, dir: String): DataFrame =
    Pipeline.enrich(Pipeline.anonymize(stagedDf(s, dir), PolicyCatalog.reference))

  val pipelineQueries: ListMap[String, Q] = ListMap(
    "q_stage_services" -> Q(
      (s, dir) => stagedDf(s, dir).drop("loaded_at").orderBy("service_id"),
      Some(OracleSql.staging)
    ),
    "q_anonymize_services" -> Q(
      (s, dir) =>
        Pipeline
          .anonymize(stagedDf(s, dir), PolicyCatalog.reference)
          .drop("loaded_at_anon", "anonymized_at")
          .orderBy("service_id_anon"),
      Some(OracleSql.anonymize)
    ),
    "q_enrich_services" -> Q(
      (s, dir) =>
        enrichedDf(s, dir)
          .drop("loaded_at_anon", "anonymized_at")
          .orderBy("service_id_anon"),
      Some(OracleSql.enrich)
    ),
    "q_mart_services" -> Q(
      (s, dir) =>
        Pipeline
          .mart(enrichedDf(s, dir))
          .drop("anonymized_at", "mart_created_at")
          .orderBy("service_id"),
      Some(OracleSql.mart)
    ),
    // Column-level lineage of the published mart, read off the ANALYZED
    // Catalyst plan (graft.plans.Lineage): for every published column,
    // the services-level source columns whose values can flow into it —
    // the DPO's "where does this value come from" table, produced
    // without running a single job. The oracle is the EXPECTED lineage
    // as a literal table: any pipeline change that silently reroutes a
    // source column into a published one hash-fails here. (The services
    // relation is re-rooted as a leaf so lineage stops at the modeled
    // source boundary rather than collapsing into the synth view's key.)
    "q_lineage" -> Q(
      (s, dir) => {
        // re-root on an EMPTY relation with the services schema: lineage
        // is a property of the plan, not the data — zero rows touched,
        // zero jobs run
        val svc = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          Tables.services(s, dir).schema)
        val mart = Pipeline.mart(
          Pipeline.enrich(
            Pipeline.anonymize(Pipeline.staging(svc), PolicyCatalog.reference)))
        graft.plans.Lineage.report(mart).orderBy("out_col")
      },
      Some("""
        select * from (values
          ('anonymization_version', '', 0),
          ('anonymized_at', '', 0),
          ('city', 'city', 1),
          ('commune', 'commune', 1),
          ('contact_email', 'contact_email', 1),
          ('contact_phone', 'contact_phone', 1),
          ('data_completeness_score', 'contact_email,contact_phone,latitude,longitude,street_address', 5),
          ('data_quality_level', 'contact_email,contact_phone,latitude,longitude,street_address', 5),
          ('department_code', 'postal_code', 1),
          ('geohash', 'latitude,longitude', 2),
          ('has_address', 'street_address', 1),
          ('has_coordinates', 'latitude,longitude', 2),
          ('has_email', 'contact_email', 1),
          ('has_phone', 'contact_phone', 1),
          ('insee_code', 'insee_code', 1),
          ('last_updated', 'last_updated', 1),
          ('latitude', 'latitude', 1),
          ('legal_status', '', 0),
          ('license', '', 0),
          ('longitude', 'longitude', 1),
          ('mart_created_at', '', 0),
          ('organization_type', 'organization_type', 1),
          ('organization_type_label', 'organization_type', 1),
          ('parent_organization', 'parent_organization', 1),
          ('postal_code', 'postal_code', 1),
          ('processing_pipeline', '', 0),
          ('region', 'postal_code', 1),
          ('service_id', 'service_id', 1),
          ('service_name', 'service_name', 1)
        ) t(out_col, src_cols, n_src)
        order by out_col""")
    )
  )

  // ---- masking expression operators (SURVEY §2.1 #1-#12) -----------------

  val maskingQueries: ListMap[String, Q] = ListMap(
    "q_mask_email" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "customer")
          .select(
            col("c_custkey"),
            Masking.maskEmail(col("c_name"), salt).as("email_anon")
          )
          .orderBy("c_custkey"),
      Some(s"""
        select c_custkey,
          case when c_name is not null and c_name != ''
               then 'user_' || substr(to_hex(sha256(lower(trim(c_name)) || '$salt')), 1, 16) || '@anonymized.gouv.fr'
               else null end as email_anon
        from customer order by c_custkey""")
    ),
    "q_email_ops" -> Q(
      (s, dir) =>
        Tables
          .services(s, dir)
          .select(
            col("service_id"),
            col("contact_email"),
            Masking.isValidEmail(col("contact_email")).as("is_valid"),
            Masking.extractEmailDomain(col("contact_email")).as("email_domain")
          )
          .orderBy("service_id"),
      Some(s"""
        with services as (${ServicesSynth.sql})
        select service_id, contact_email,
          (contact_email like '%@%.%' and contact_email not like '%@%.@%'
           and length(contact_email) >= 5) as is_valid,
          case when (contact_email like '%@%.%' and contact_email not like '%@%.@%'
                     and length(contact_email) >= 5)
               then lower(substr(contact_email, instr(contact_email, '@') + 1))
               else null end as email_domain
        from services order by service_id""")
    ),
    "q_phone_ops" -> Q(
      (s, dir) =>
        Tables
          .services(s, dir)
          .select(
            col("service_id"),
            col("contact_phone"),
            Masking.maskPhone(col("contact_phone")).as("phone_anon"),
            Masking.extractCountryCode(col("contact_phone")).as("country_code"),
            Masking.normalizePhone(col("contact_phone")).as("phone_normalized"),
            Masking.isValidPhone(col("contact_phone")).as("is_valid")
          )
          .orderBy("service_id"),
      Some(s"""
        with services as (${ServicesSynth.sql})
        select service_id, contact_phone,
          case when contact_phone is not null and contact_phone != ''
               then substr(trim(contact_phone), 1, 6) || ' XX XX XX XX'
               else null end as phone_anon,
          case when contact_phone like '+%'
               then substr(contact_phone, 1, instr(contact_phone, ' '))
               else null end as country_code,
          replace(replace(replace(replace(trim(contact_phone), ' ', ''), '-', ''), '.', ''), '(', '') as phone_normalized,
          ((contact_phone like '+%' or contact_phone like '0%')
           and length(replace(replace(replace(replace(trim(contact_phone), ' ', ''), '-', ''), '.', ''), '(', '')) >= 10) as is_valid
        from services order by service_id""")
    ),
    "q_coords_ops" -> Q(
      (s, dir) =>
        Tables
          .services(s, dir)
          .select(
            col("service_id"),
            col("latitude"),
            col("longitude"),
            Masking.maskCoordinates(col("latitude")).as("latitude_anon"),
            Masking.maskCoordinates(col("longitude")).as("longitude_anon"),
            Masking
              .areValidCoordinates(col("latitude"), col("longitude"))
              .as("coords_valid"),
            Masking.createGeohash(col("latitude"), col("longitude")).as("geohash")
          )
          .select(col("*") +: Masking.maskFullCoordinates("latitude", "longitude"): _*)
          .orderBy("service_id"),
      Some(s"""
        with services as (${ServicesSynth.sql})
        select service_id, latitude, longitude,
          round(cast(latitude as numeric), 2) as latitude_anon,
          round(cast(longitude as numeric), 2) as longitude_anon,
          (latitude is not null and longitude is not null
           and latitude between -90 and 90 and longitude between -180 and 180) as coords_valid,
          concat('geo_', cast(round(cast(latitude as numeric), 2) as string), '_',
                 cast(round(cast(longitude as numeric), 2) as string)) as geohash,
          cast(null as double) as latitude_masked,
          cast(null as double) as longitude_masked
        from services order by service_id""")
    ),
    "q_haversine" -> Q(
      (s, dir) =>
        Tables
          .services(s, dir)
          .select(
            col("service_id"),
            Parity
              .roundHalfUp(
                Masking.haversineDistance(
                  lit(48.8566),
                  lit(2.3522),
                  col("latitude"),
                  col("longitude")
                ),
                3
              )
              .cast("decimal(12,3)")
              .as("dist_from_paris_km")
          )
          .orderBy("service_id"),
      Some(s"""
        with services as (${ServicesSynth.sql})
        select service_id,
          cast(${Parity.duckRound(
            "6371 * 2 * asin(sqrt(" +
              "pow(sin(radians((latitude - 48.8566)) / 2), 2) + " +
              "cos(radians(48.8566)) * cos(radians(latitude)) * " +
              "pow(sin(radians((longitude - 2.3522)) / 2), 2)))",
            3
          )} as decimal(12,3)) as dist_from_paris_km
        from services order by service_id""")
    ),
    "q_pii_report" -> Q(
      (s, _) => Validate.piiReport(s, PolicyCatalog.reference),
      Some("""
        select * from (
          select 'stg_services_publics' as model_name, 'contact_email' as column_name,
                 'direct_identifier' as pii_type, 'hash_sha256' as anonymization_method,
                 'legitimate_interest' as legal_basis, 'high' as sensitivity
          union all
          select 'stg_services_publics', 'contact_phone', 'direct_identifier',
                 'mask_partial', 'legitimate_interest', 'high'
          union all
          select 'stg_services_publics', 'latitude', 'quasi_identifier',
                 'round_2_decimals', 'legitimate_interest', 'medium'
          union all
          select 'stg_services_publics', 'longitude', 'quasi_identifier',
                 'round_2_decimals', 'legitimate_interest', 'medium'
          union all
          select 'stg_services_publics', 'street_address', 'quasi_identifier',
                 'aggregate_to_city', 'legitimate_interest', 'medium'
        ) r order by model_name, column_name""")
    ),
    "q_pii_discovery" -> Q(
      (s, dir) =>
        Validate
          .piiDiscovery(
            Tables.services(s, dir),
            Seq("service_name", "contact_email", "contact_phone",
              "street_address", "city"))
          .orderBy("col_name"),
      Some {
        val e = graft.text.TextAnalysis.RedactEmailPattern
        val p = graft.text.TextAnalysis.RedactPhonePattern
        val a = Validate.DiscoveryAddressPattern
        def row(c: String, first: Boolean) = {
          val alias = if (first)
            s"'$c' as col_name, count($c) as n_nonnull, " +
              s"count(case when regexp_matches($c, '$e') then 1 end) as n_email, " +
              s"count(case when regexp_matches($c, '$p') then 1 end) as n_phone, " +
              s"count(case when regexp_matches($c, '$a') then 1 end) as n_address"
          else
            s"'$c', count($c), " +
              s"count(case when regexp_matches($c, '$e') then 1 end), " +
              s"count(case when regexp_matches($c, '$p') then 1 end), " +
              s"count(case when regexp_matches($c, '$a') then 1 end)"
          s"select $alias from services"
        }
        val cols = Seq("service_name", "contact_email", "contact_phone",
          "street_address", "city")
        s"""
        with services as (${ServicesSynth.sql})
        ${cols.zipWithIndex.map { case (c, i) => row(c, i == 0) }
            .mkString("\n        union all\n        ")}
        order by col_name"""
      }
    )
  )

  // ---- validators / declarative tests (SURVEY §2.3-2.4) ------------------

  val validatorQueries: ListMap[String, Q] = ListMap(
    "q_quality_metrics" -> Q(
      (s, dir) =>
        Validate
          .qualityMetrics(enrichedDf(s, dir))
          .select(
            col("total_emails"),
            col("emails_properly_anonymized").cast("long").as("emails_properly_anonymized"),
            col("emails_improperly_anonymized").cast("long").as("emails_improperly_anonymized"),
            col("total_phones"),
            col("phones_properly_masked").cast("long").as("phones_properly_masked"),
            col("phones_improperly_masked").cast("long").as("phones_improperly_masked"),
            col("total_coords"),
            col("coords_properly_rounded").cast("long").as("coords_properly_rounded")
          ),
      Some(OracleSql.pipelineCtes + """
        select
          count(case when contact_email_anon is not null then 1 end) as total_emails,
          cast(sum(case when contact_email_anon like '%@anonymized.gouv.fr' then 1 else 0 end) as bigint) as emails_properly_anonymized,
          cast(sum(case when contact_email_anon is not null and contact_email_anon not like '%@anonymized.gouv.fr' then 1 else 0 end) as bigint) as emails_improperly_anonymized,
          count(case when contact_phone_anon is not null then 1 end) as total_phones,
          cast(sum(case when contact_phone_anon like '%XX XX XX XX' then 1 else 0 end) as bigint) as phones_properly_masked,
          cast(sum(case when contact_phone_anon is not null and contact_phone_anon not like '%XX XX XX XX' then 1 else 0 end) as bigint) as phones_improperly_masked,
          count(case when latitude_anon is not null and longitude_anon is not null then 1 end) as total_coords,
          cast(sum(case when latitude_anon is not null and longitude_anon is not null
                         and (latitude_anon * 100) = floor(latitude_anon * 100)
                         and (longitude_anon * 100) = floor(longitude_anon * 100)
                    then 1 else 0 end) as bigint) as coords_properly_rounded
        from enriched""")
    ),
    // Column-level storage limitation (GDPR Art. 5.1.e): the reference
    // declares retention_days: 730 on every PII column (schema.yml:62
    // et al.) but never executes it — ColumnRetention.expire does, as a
    // pure projection over the staged scan (zero shuffle, zero extra
    // jobs): a PII cell whose row's last_updated falls strictly outside
    // the column's window as of the pinned audit date is suppressed,
    // while the row and its non-PII facts survive. The twin replays the
    // per-cell case-whens in DuckDB — day 730 itself retained, day 731
    // expired, row counts unchanged.
    "q_retention_expire" -> Q(
      (s, dir) => {
        import graft.policy.ColumnRetention
        ColumnRetention
          .expire(stagedDf(s, dir), "stg_services_publics",
            PolicyCatalog.reference, "last_updated",
            to_date(lit("2027-06-30")))
          .select(
            col("service_id"), col("contact_email"), col("contact_phone"),
            col("street_address"), col("latitude"), col("longitude"),
            col("last_updated"))
          .orderBy("service_id")
      },
      Some(OracleSql.pipelineCtes + """
        select service_id,
          case when last_updated is not null
                and date_diff('day', last_updated, date '2027-06-30') <= 730
               then contact_email end as contact_email,
          case when last_updated is not null
                and date_diff('day', last_updated, date '2027-06-30') <= 730
               then contact_phone end as contact_phone,
          case when last_updated is not null
                and date_diff('day', last_updated, date '2027-06-30') <= 730
               then street_address end as street_address,
          case when last_updated is not null
                and date_diff('day', last_updated, date '2027-06-30') <= 730
               then latitude end as latitude,
          case when last_updated is not null
                and date_diff('day', last_updated, date '2027-06-30') <= 730
               then longitude end as longitude,
          last_updated
        from staged
        order by service_id""")
    ),
    // Storage-limitation certificate (the retention analogue of
    // q_release_cert's masking/method bits): per retention_days-governed
    // PII column, whether the RELEASED plan provably crosses that
    // column's declared retention guard on every value-bearing path —
    // Lineage.retentionEnforced over the expire()d staging plan,
    // re-rooted at the modeled source boundary (the q_lineage pattern:
    // zero rows touched, zero jobs run; the oracle is the expected
    // certificate as a literal table, so a pipeline change that drops or
    // widens a window hash-fails here).
    "q_retention_cert" -> Q(
      (s, dir) => {
        import graft.policy.{ColumnRetention, PolicyCatalog}
        val svc = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          Tables.services(s, dir).schema)
        val released = ColumnRetention.expire(
          Pipeline.staging(svc), "stg_services_publics",
          PolicyCatalog.reference, "last_updated", to_date(lit("2027-06-30")))
        val windows = PolicyCatalog.reference.models("stg_services_publics")
          .collect { case (c, p) if p.pii && p.retentionDays.isDefined =>
            c -> p.retentionDays.get }
        val flagged = graft.plans.Lineage
          .retentionMismatches(released, windows.toMap)
          .flatMap(_._2).toSet
        import s.implicits._
        windows.toSeq.sortBy(_._1)
          .map { case (c, d) => (c, d, if (flagged(c)) 0 else 1) }
          .toDF("column_name", "retention_days", "window_enforced")
      },
      Some("""
        select * from (values
          ('contact_email', 730, 1),
          ('contact_phone', 730, 1),
          ('latitude', 730, 1),
          ('longitude', 730, 1),
          ('street_address', 730, 1))
          t(column_name, retention_days, window_enforced)
        order by column_name""")
    ),
    "q_k_anonymity" -> Q(
      (s, dir) =>
        Validate
          .kAnonymityViolations(
            stagedDf(s, dir).filter(col("postal_code").isNotNull),
            "postal_code",
            5
          )
          .orderBy(col("group_size"), col("postal_code")),
      Some(OracleSql.pipelineCtes + """
        select postal_code, count(*) as group_size
        from staged
        where postal_code is not null
        group by postal_code
        having count(*) < 5
        order by group_size, postal_code""")
    ),
    "q_k_enforce" -> Q(
      (s, dir) => {
        val dept = substring(col("postal_code"), 1, 2)
        val ladder = Seq(
          graft.validate.KAnonymity.Rung("postal_code", col("postal_code")),
          graft.validate.KAnonymity.Rung("department", dept),
          graft.validate.KAnonymity.Rung("region", Pipeline.regionFromDepartment(dept)),
          graft.validate.KAnonymity.Rung("country", lit("FR"))
        )
        val (rung, out) =
          graft.validate.KAnonymity.enforce(stagedDf(s, dir), ladder, k = 5)
        out
          .groupBy(col("qi_generalized"))
          .agg(count(lit(1)).as("group_size"))
          .select(lit(rung).as("rung"), col("qi_generalized"), col("group_size"))
          .orderBy("qi_generalized")
      },
      // The oracle replays the ladder choice: per-rung group floors in
      // CTEs, first rung with min >= 5 wins, that rung's groups emitted
      // (with the coarsest-rung fallback also suppressing < k residues)
      Some(OracleSql.pipelineCtes + """
        , g0 as (select postal_code as v, count(*) as n from staged group by 1),
        g1 as (select substr(postal_code, 1, 2) as v, count(*) as n from staged group by 1),
        g2 as (select case
             when substr(postal_code,1,2) in ('75','77','78','91','92','93','94','95') then 'Île-de-France'
             when substr(postal_code,1,2) in ('59','62') then 'Hauts-de-France'
             when substr(postal_code,1,2) in ('69','01','42','63') then 'Auvergne-Rhône-Alpes'
             when substr(postal_code,1,2) in ('13','83','84','04','05','06') then 'Provence-Alpes-Côte d''Azur'
             when substr(postal_code,1,2) in ('33','24','40','47','64') then 'Nouvelle-Aquitaine'
             when substr(postal_code,1,2) in ('31','09','12','32','46','65','81','82') then 'Occitanie'
             else 'Autre région' end as v, count(*) as n from staged group by 1),
        g3 as (select 'FR' as v, count(*) as n from staged group by 1),
        choice as (select case when (select min(n) from g0) >= 5 then 0
                               when (select min(n) from g1) >= 5 then 1
                               when (select min(n) from g2) >= 5 then 2
                               else 3 end as rung),
        sel as (
          select 0 as rung, v, n from g0 union all
          select 1 as rung, v, n from g1 union all
          select 2 as rung, v, n from g2 union all
          select 3 as rung, v, n from g3
        )
        select cast(sel.rung as int) as rung, v as qi_generalized,
               cast(n as bigint) as group_size
        from sel join choice on sel.rung = choice.rung
        where sel.rung < 3 or n >= 5
        order by qi_generalized""")
    ),
    "q_k_enforce_multi" -> Q(
      (s, dir) => {
        val dept = substring(col("postal_code"), 1, 2)
        val dims = Seq(
          graft.validate.KAnonymity.QiDim("postal", Seq(
            col("postal_code"), dept, Pipeline.regionFromDepartment(dept), lit("FR"))),
          graft.validate.KAnonymity.QiDim("orgtype", Seq(
            col("organization_type"), lit("ANY"))))
        val (levels, out) =
          graft.validate.KAnonymity.enforceMulti(stagedDf(s, dir), dims, k = 5)
        out
          .groupBy(col("postal_gen"), col("orgtype_gen"))
          .agg(count(lit(1)).as("group_size"))
          .select(
            lit(levels.head).as("postal_level"),
            lit(levels(1)).as("orgtype_level"),
            col("postal_gen"), col("orgtype_gen"), col("group_size"))
          .orderBy("postal_gen", "orgtype_gen")
      },
      // Replays the 4x2 lattice (postal: code->dept->region->country x
      // org_type: raw->ANY): per-state min JOINT group size in CTEs, the
      // chosen state is the first with min >= 5 in ascending-total-
      // generalization order — (0,0),(0,1),(1,0),(1,1),(2,0),(2,1),(3,0),
      // (3,1) — matching enforceMulti's cost-then-enumeration order, with
      // the coarsest state suppressing < k residues when nothing qualifies
      Some(OracleSql.pipelineCtes + """
        , lv as (
          select postal_code as p0, substr(postal_code, 1, 2) as p1,
            case
             when substr(postal_code,1,2) in ('75','77','78','91','92','93','94','95') then 'Île-de-France'
             when substr(postal_code,1,2) in ('59','62') then 'Hauts-de-France'
             when substr(postal_code,1,2) in ('69','01','42','63') then 'Auvergne-Rhône-Alpes'
             when substr(postal_code,1,2) in ('13','83','84','04','05','06') then 'Provence-Alpes-Côte d''Azur'
             when substr(postal_code,1,2) in ('33','24','40','47','64') then 'Nouvelle-Aquitaine'
             when substr(postal_code,1,2) in ('31','09','12','32','46','65','81','82') then 'Occitanie'
             else 'Autre région' end as p2,
            'FR' as p3,
            organization_type as o0, 'ANY' as o1
          from staged
        ),
        g as (
          select s, v1, v2, count(*) as n from (
            select 0 as s, p0 as v1, o0 as v2 from lv union all
            select 1, p0, o1 from lv union all
            select 2, p1, o0 from lv union all
            select 3, p1, o1 from lv union all
            select 4, p2, o0 from lv union all
            select 5, p2, o1 from lv union all
            select 6, p3, o0 from lv union all
            select 7, p3, o1 from lv
          ) group by s, v1, v2
        ),
        floors as (select s, min(n) as mn from g group by s),
        choice as (
          select case
            when (select mn from floors where s = 0) >= 5 then 0
            when (select mn from floors where s = 1) >= 5 then 1
            when (select mn from floors where s = 2) >= 5 then 2
            when (select mn from floors where s = 3) >= 5 then 3
            when (select mn from floors where s = 4) >= 5 then 4
            when (select mn from floors where s = 5) >= 5 then 5
            when (select mn from floors where s = 6) >= 5 then 6
            when (select mn from floors where s = 7) >= 5 then 7
            else 8 end as c)
        select
          cast(case least(c, 7)
            when 0 then 0 when 1 then 0 when 2 then 1 when 3 then 1
            when 4 then 2 when 5 then 2 when 6 then 3 else 3 end as int) as postal_level,
          cast(case least(c, 7)
            when 0 then 0 when 1 then 1 when 2 then 0 when 3 then 1
            when 4 then 0 when 5 then 1 when 6 then 0 else 1 end as int) as orgtype_level,
          v1 as postal_gen, v2 as orgtype_gen,
          cast(n as bigint) as group_size
        from g cross join choice
        where s = least(c, 7) and (c < 8 or n >= 5)
        order by postal_gen, orgtype_gen""")
    ),
    "q_no_pii_in_mart" -> Q(
      (s, dir) =>
        Validate
          .assertNoPiiInMart(
            Pipeline.mart(enrichedDf(s, dir)).drop("anonymized_at", "mart_created_at")
          )
          .orderBy("column_name", "value"),
      Some(OracleSql.pipelineCtes + """
        select * from (
          select 'mart_services_open_data' as table_name, 'contact_email' as column_name,
                 contact_email as value, 'Non-anonymized email detected' as issue_type
          from mart
          where contact_email is not null and contact_email not like '%@anonymized.gouv.fr'
          union all
          select 'mart_services_open_data', 'contact_phone', contact_phone,
                 'Non-masked phone number detected'
          from mart
          where contact_phone is not null and contact_phone not like '%XX%'
          union all
          select 'mart_services_open_data', 'latitude/longitude',
                 concat(cast(latitude as string), ', ', cast(longitude as string)),
                 'GPS coordinates too precise'
          from mart
          where latitude is not null and longitude is not null
            and (length(split_part(cast(latitude as string), '.', 2)) > 2
                 or length(split_part(cast(longitude as string), '.', 2)) > 2)
        ) v order by column_name, value""")
    ),
    "q_schema_tests" -> Q(
      (s, dir) => {
        val staged = stagedDf(s, dir)
        val unique = Validate
          .uniquenessViolations(staged, "service_id")
          .select(
            lit("unique_service_id").as("test_name"),
            col("service_id").cast("string").as("value")
          )
        val notnull = Validate
          .notNullViolations(staged, "last_updated")
          .select(
            lit("not_null_last_updated").as("test_name"),
            col("service_id").cast("string").as("value")
          )
        val accepted = Validate
          .acceptedValuesViolations(staged, "has_email", Seq(0, 1))
          .select(
            lit("accepted_values_has_email").as("test_name"),
            col("service_id").cast("string").as("value")
          )
        val range = Validate
          .acceptedRangeViolations(staged, "latitude", -90, 90)
          .select(
            lit("accepted_range_latitude").as("test_name"),
            col("service_id").cast("string").as("value")
          )
        unique
          .unionAll(notnull)
          .unionAll(accepted)
          .unionAll(range)
          .orderBy("test_name", "value")
      },
      Some(OracleSql.pipelineCtes + """
        select * from (
          select 'unique_service_id' as test_name, cast(service_id as string) as value
          from (select service_id from staged where service_id is not null
                group by service_id having count(*) > 1) u
          union all
          select 'not_null_last_updated', cast(service_id as string)
          from staged where last_updated is null
          union all
          select 'accepted_values_has_email', cast(service_id as string)
          from staged where has_email is not null and has_email not in (0, 1)
          union all
          select 'accepted_range_latitude', cast(service_id as string)
          from staged where latitude < -90 or latitude > 90
        ) v order by test_name, value""")
    )
  )

  // ---- relational / aggregate operators on the TPC-H-ish tables ----------

  val relationalQueries: ListMap[String, Q] = ListMap(
    "q1_agg" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_base_price"),
            sum(
              col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
            ).cast("decimal(38,4)").as("sum_disc_price"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        select l_returnflag, l_linestatus,
          cast(sum(cast(l_quantity as decimal(18,2))) as decimal(38,2)) as sum_qty,
          cast(sum(cast(l_extendedprice as decimal(18,2))) as decimal(38,2)) as sum_base_price,
          cast(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as decimal(38,4)) as sum_disc_price,
          count(*) as count_order
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus""")
    ),
    "q_conditional_agg" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("o_totalprice") > 100000, 1).otherwise(0))
              .cast("long")
              .as("n_big"),
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
              .cast("long")
              .as("n_finished")
          )
          .orderBy("o_orderpriority"),
      Some("""
        select o_orderpriority,
          count(*) as n_orders,
          cast(sum(case when o_totalprice > 100000 then 1 else 0 end) as bigint) as n_big,
          cast(sum(case when o_orderstatus = 'F' then 1 else 0 end) as bigint) as n_finished
        from orders
        group by o_orderpriority
        order by o_orderpriority""")
    ),
    "q_distinct_sample" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "customer")
          .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "0")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey"),
      Some("""
        select c_custkey, c_name, c_mktsegment
        from customer
        where substr(md5(cast(c_custkey as string)), 1, 1) = '0'
        order by c_custkey""")
    ),
    "q_union_distinct" -> Q(
      (s, dir) => {
        val c = Tables.read(s, dir, "customer").select(col("c_mktsegment").as("v")).distinct()
        val o = Tables.read(s, dir, "orders").select(col("o_orderpriority").as("v")).distinct()
        c.unionAll(o).orderBy("v").limit(100)
      },
      Some("""
        select v from (
          select distinct c_mktsegment as v from customer
          union all
          select distinct o_orderpriority as v from orders
        ) u order by v limit 100""")
    ),
    "q_star_join" -> Q(
      (s, dir) => {
        // classic star join: fact (orders) x broadcast dims (customer, nation)
        val o = Tables.read(s, dir, "orders")
        val c = Tables.read(s, dir, "customer")
        val n = Tables.read(s, dir, "nation")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("total_price"),
            countDistinct(col("o_custkey")).as("n_customers")
          )
          .orderBy("n_name", "c_mktsegment")
      },
      Some("""
        select n_name, c_mktsegment,
          count(*) as n_orders,
          cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(38,2)) as total_price,
          count(distinct o_custkey) as n_customers
        from orders
        join customer on o_custkey = c_custkey
        join nation on c_nationkey = n_nationkey
        group by n_name, c_mktsegment
        order by n_name, c_mktsegment""")
    ),
    "q_window_funcs" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.read(s, dir, "customer")
          .withColumn("bal", col("c_acctbal").cast("decimal(18,2)"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("bal").desc, col("c_custkey"))
        c.select(
            col("c_mktsegment"),
            col("c_custkey"),
            col("bal"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            sum(col("bal")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("decimal(38,2)").as("running_bal")
          )
          .filter(col("rn") <= 5)
          .orderBy("c_mktsegment", "rn")
      },
      Some("""
        select * from (
          select c_mktsegment, c_custkey,
            cast(c_acctbal as decimal(18,2)) as bal,
            row_number() over (partition by c_mktsegment
                               order by cast(c_acctbal as decimal(18,2)) desc, c_custkey) as rn,
            rank() over (partition by c_mktsegment
                         order by cast(c_acctbal as decimal(18,2)) desc, c_custkey) as rnk,
            cast(sum(cast(c_acctbal as decimal(18,2))) over (
              partition by c_mktsegment
              order by cast(c_acctbal as decimal(18,2)) desc, c_custkey
              rows unbounded preceding) as decimal(38,2)) as running_bal
          from customer
        ) t where rn <= 5
        order by c_mktsegment, rn""")
    ),
    "q_events_hourly" -> Q(
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type")
          )
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value")
          )
          .orderBy("hour", "event_type"),
      Some("""
        select cast(date_trunc('hour', ts) as timestamp) as hour, event_type,
          count(*) as n,
          cast(sum(cast(value as decimal(18,2))) as decimal(38,2)) as total_value
        from events
        group by 1, 2
        order by 1, 2""")
    ),
    "q_rollup_agg" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("sum_qty")
          )
          .orderBy(
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first
          ),
      Some("""
        select l_returnflag, l_linestatus, count(*) as n,
          cast(sum(cast(l_quantity as decimal(18,2))) as decimal(38,2)) as sum_qty
        from lineitem
        group by rollup(l_returnflag, l_linestatus)
        order by l_returnflag asc nulls first, l_linestatus asc nulls first""")
    ),
    "q_semi_anti_join" -> Q(
      (s, dir) => {
        val c = Tables.read(s, dir, "customer")
        val o = Tables.read(s, dir, "orders")
          .filter(col("o_totalprice") > 150000)
        val semi = c
          .join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(lit("has_big_order").as("side"), col("c_custkey"))
        val anti = c
          .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(lit("no_big_order").as("side"), col("c_custkey"))
        semi.unionAll(anti).orderBy("side", "c_custkey")
      },
      Some("""
        select * from (
          select 'has_big_order' as side, c_custkey from customer c
          where exists (select 1 from orders o
                        where o.o_custkey = c.c_custkey and o.o_totalprice > 150000)
          union all
          select 'no_big_order', c_custkey from customer c
          where not exists (select 1 from orders o
                            where o.o_custkey = c.c_custkey and o.o_totalprice > 150000)
        ) v order by side, c_custkey""")
    ),
    "q_scalar_subquery" -> Q(
      (s, dir) => {
        // scalar threshold via exact max (avg(decimal) returns decimal in
        // Spark but double in DuckDB — a cross-engine typing trap)
        val c = Tables.read(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal").cast("decimal(12,2)").as("bal"))
        val stats = c.agg((max(col("bal")) - lit(1000)).cast("decimal(12,2)").as("threshold"))
        c.crossJoin(broadcast(stats))
          .filter(col("bal") > col("threshold"))
          .select(col("c_custkey"), col("bal"), col("threshold"))
          .orderBy("c_custkey")
      },
      Some("""
        select c_custkey, cast(c_acctbal as decimal(12,2)) as bal,
               (select cast(max(cast(c_acctbal as decimal(12,2))) - 1000 as decimal(12,2)) from customer) as threshold
        from customer
        where cast(c_acctbal as decimal(12,2)) >
              (select cast(max(cast(c_acctbal as decimal(12,2))) - 1000 as decimal(12,2)) from customer)
        order by c_custkey""")
    ),
    "q_cube_agg" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("total")
          )
          .orderBy(
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first
          ),
      Some("""
        select o_orderstatus, o_orderpriority, count(*) as n,
          cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(38,2)) as total
        from orders
        group by cube(o_orderstatus, o_orderpriority)
        order by o_orderstatus asc nulls first, o_orderpriority asc nulls first""")
    ),
    "q_pivot" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(
            col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("f_cnt"),
            coalesce(col("O"), lit(0L)).as("o_cnt"),
            coalesce(col("P"), lit(0L)).as("p_cnt")
          )
          .orderBy("o_orderpriority"),
      Some("""
        select o_orderpriority,
          count(case when o_orderstatus = 'F' then 1 end) as f_cnt,
          count(case when o_orderstatus = 'O' then 1 end) as o_cnt,
          count(case when o_orderstatus = 'P' then 1 end) as p_cnt
        from orders
        group by o_orderpriority
        order by o_orderpriority""")
    ),
    "q_percentiles" -> Q(
      (s, dir) =>
        Tables
          .read(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            Parity.roundHalfUp(expr("percentile(l_quantity, 0.5)"), 6)
              .cast("decimal(18,6)").as("p50"),
            Parity.roundHalfUp(expr("percentile(l_quantity, 0.95)"), 6)
              .cast("decimal(18,6)").as("p95")
          )
          .orderBy("l_returnflag"),
      Some(s"""
        select l_returnflag,
          cast(${Parity.duckRound("quantile_cont(l_quantity, 0.5)", 6)} as decimal(18,6)) as p50,
          cast(${Parity.duckRound("quantile_cont(l_quantity, 0.95)", 6)} as decimal(18,6)) as p95
        from lineitem
        group by l_returnflag
        order by l_returnflag""")
    ),
    "q_set_ops" -> Q(
      (s, dir) => {
        val custNations  = Tables.read(s, dir, "customer")
          .select(col("c_nationkey").as("nationkey")).distinct()
        val suppNations  = Tables.read(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey")).distinct()
        val both    = custNations.intersect(suppNations)
          .select(lit("both").as("side"), col("nationkey"))
        val custOnly = custNations.except(suppNations)
          .select(lit("customer_only").as("side"), col("nationkey"))
        both.unionAll(custOnly).orderBy("side", "nationkey")
      },
      Some("""
        select * from (
          select 'both' as side, nationkey from (
            select distinct c_nationkey as nationkey from customer
            intersect
            select distinct s_nationkey from supplier
          ) a
          union all
          select 'customer_only', nationkey from (
            select distinct c_nationkey as nationkey from customer
            except
            select distinct s_nationkey from supplier
          ) b
        ) u order by side, nationkey""")
    ),
    "q_snapshot_scd2" -> Q(
      (s, dir) => {
        val src = Tables
          .read(s, dir, "orders")
          .groupBy(
            col("o_custkey").as("record_id"),
            col("o_orderdate").as("updated_at")
          )
          .agg(max(col("o_totalprice")).as("payload"))
        graft.pipeline.Snapshot
          .initial(src, "record_id", "updated_at")
          .orderBy("record_id", "updated_at")
      },
      Some("""
        with src as (
          select o_custkey as record_id, o_orderdate as updated_at,
                 max(o_totalprice) as payload
          from orders group by 1, 2
        )
        select record_id, updated_at, payload,
          cast(updated_at as timestamp) as valid_from,
          cast(lead(updated_at) over (partition by record_id order by updated_at) as timestamp) as valid_to
        from src order by record_id, updated_at""")
    ),
    "q_scd2_merge" -> Q(
      (s, dir) => {
        // stored-snapshot twin of q_snapshot_scd2: bootstrap the bucketed
        // store from pre-1996 history, merge the rest as one daily-ingest
        // batch (reads + rewrites ONLY its touched buckets), read back —
        // the twin is the ONE-SHOT full build, so the incremental merge
        // must reproduce it exactly. Build jobs are bounded (PlanGuard
        // exemption: a |buckets| collect + the staged store writes).
        val src = Tables.read(s, dir, "orders")
          .groupBy(
            col("o_custkey").as("record_id"),
            col("o_orderdate").as("updated_at"))
          .agg(max(col("o_totalprice")).as("payload"))
        val cut = to_timestamp(lit("1996-01-01"))
        val store = s"${sys.props("java.io.tmpdir")}/graft_scd2_${math.abs(dir.hashCode)}"
        graft.pipeline.Snapshot.initStore(
          src.filter(col("updated_at") < cut), "record_id", "updated_at",
          store, buckets = 8)
        graft.pipeline.Snapshot.mergeStore(
          s, store, src.filter(col("updated_at") >= cut),
          "record_id", "updated_at", buckets = 8)
        graft.pipeline.Snapshot.loadStore(s, store)
          .drop("bucket")
          .orderBy("record_id", "updated_at")
      },
      Some("""
        with src as (
          select o_custkey as record_id, o_orderdate as updated_at,
                 max(o_totalprice) as payload
          from orders group by 1, 2
        )
        select record_id, updated_at, payload,
          cast(updated_at as timestamp) as valid_from,
          cast(lead(updated_at) over (partition by record_id order by updated_at) as timestamp) as valid_to
        from src order by record_id, updated_at""")
    ),
    // Incrementally-maintained materialized aggregate (AggStore): two
    // batch merges + a deliberate replay over the bucketed algebraic
    // state, served back — the twin is the ONE-SHOT groupBy over orders,
    // so the maintained store must reproduce it exactly (associative
    // cnt/sum/min/max merges; avg derived at read). Build jobs bounded
    // (PlanGuard exemption: touched-bucket collects + staged writes).
    "q_agg_store" -> Q(
      (s, dir) => {
        import graft.operators.AggStore
        val store = s"${sys.props("java.io.tmpdir")}/graft_aggstore_${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        val src = Tables.read(s, dir, "orders")
        val groups = Seq("o_orderstatus", "o_orderpriority")
        def states(pred: org.apache.spark.sql.Column) =
          AggStore.aggregate(src.filter(pred), groups,
            col("o_totalprice").cast("decimal(18,2)"))
        AggStore.merge(s, store,
          states(col("o_orderkey") % 2 === 0), groups, buckets = 4, batchId = 1L)
        AggStore.merge(s, store,
          states(col("o_orderkey") % 2 =!= 0), groups, buckets = 4, batchId = 2L)
        // replay of batch 1: the marker makes it a no-op, never a double-add
        AggStore.merge(s, store,
          states(col("o_orderkey") % 2 === 0), groups, buckets = 4, batchId = 1L)
        AggStore.serve(s, store)
          .select(
            col("o_orderstatus"), col("o_orderpriority"),
            col("cnt"),
            col("sum").cast("decimal(38,2)").as("total"),
            col("min").cast("decimal(18,2)").as("min_price"),
            col("max").cast("decimal(18,2)").as("max_price"),
            (col("sum").cast("double") / col("cnt").cast("double")).as("avg_price"))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""
        select o_orderstatus, o_orderpriority,
          count(o_totalprice) as cnt,
          cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(38,2)) as total,
          cast(min(o_totalprice) as decimal(18,2)) as min_price,
          cast(max(o_totalprice) as decimal(18,2)) as max_price,
          cast(sum(cast(o_totalprice as decimal(18,2))) as double)
            / cast(count(o_totalprice) as double) as avg_price
        from orders
        group by o_orderstatus, o_orderpriority
        order by o_orderstatus, o_orderpriority""")
    ),
    // GDPR erasure through the maintained aggregate (AggStore.erase):
    // two batch merges build the store, then a subject's facts are
    // erased — cnt/sum by exact subtraction from the erased facts'
    // states, min/max by touched-group rebuild from the retained facts,
    // each cross-checking the other — and a deliberate REPLAY of the
    // erase batch proves idempotence. The twin is the one-shot groupBy
    // over the RETAINED orders, so the erased store must reproduce it
    // exactly: erased subjects leave no trace in the served stats. Build
    // jobs bounded (PlanGuard exemption).
    "q_agg_store_erase" -> Q(
      (s, dir) => {
        import graft.operators.AggStore
        val store =
          s"${sys.props("java.io.tmpdir")}/graft_aggerase_${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        val src = Tables.read(s, dir, "orders")
        val groups = Seq("o_orderstatus", "o_orderpriority")
        val value = col("o_totalprice").cast("decimal(18,2)")
        def states(pred: org.apache.spark.sql.Column) =
          AggStore.aggregate(src.filter(pred), groups, value)
        AggStore.merge(s, store,
          states(col("o_orderkey") % 2 === 0), groups, buckets = 4, batchId = 1L)
        AggStore.merge(s, store,
          states(col("o_orderkey") % 2 =!= 0), groups, buckets = 4, batchId = 2L)
        val erased = src.filter(col("o_custkey") % 13 === 0)
        val retained = src.filter(col("o_custkey") % 13 =!= 0)
        AggStore.erase(s, store, erased, groups, value,
          buckets = 4, batchId = 3L, retainedFacts = Some(retained))
        // replay of the erase: the applied marker makes it a no-op
        AggStore.erase(s, store, erased, groups, value,
          buckets = 4, batchId = 3L, retainedFacts = Some(retained))
        AggStore.serve(s, store)
          .select(
            col("o_orderstatus"), col("o_orderpriority"),
            col("cnt"),
            col("sum").cast("decimal(38,2)").as("total"),
            col("min").cast("decimal(18,2)").as("min_price"),
            col("max").cast("decimal(18,2)").as("max_price"),
            (col("sum").cast("double") / col("cnt").cast("double")).as("avg_price"))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""
        select o_orderstatus, o_orderpriority,
          count(o_totalprice) as cnt,
          cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(38,2)) as total,
          cast(min(o_totalprice) as decimal(18,2)) as min_price,
          cast(max(o_totalprice) as decimal(18,2)) as max_price,
          cast(sum(cast(o_totalprice as decimal(18,2))) as double)
            / cast(count(o_totalprice) as double) as avg_price
        from orders
        where o_custkey % 13 <> 0
        group by o_orderstatus, o_orderpriority
        order by o_orderstatus, o_orderpriority""")
    ),
    "q_sessionize" -> Q(
      (s, dir) =>
        graft.streaming.StreamingPipeline
          .sessionizeBatch(
            Tables.events(s, dir)
              .withColumn("value", col("value").cast("decimal(18,2)")),
            gapMs = 30L * 60 * 1000,
            tieBreak = Seq("event_id")
          )
          .withColumn("total_value", col("total_value").cast("decimal(38,2)"))
          .orderBy("user_id", "session_start"),
      Some("""
        with w as (
          select user_id, ts, event_id, value,
            case when lag(ts) over (partition by user_id order by ts, event_id) is null
                   or epoch_ms(ts) - epoch_ms(lag(ts) over (partition by user_id order by ts, event_id)) > 1800000
                 then 1 else 0 end as is_new
          from events
        ),
        s as (
          select user_id, ts, value,
            sum(is_new) over (partition by user_id order by ts, event_id
                              rows unbounded preceding) as session_idx
          from w
        )
        select user_id,
          cast(min(ts) as timestamp) as session_start,
          cast(max(ts) as timestamp) as session_end,
          count(*) as n_events,
          cast(sum(cast(value as decimal(18,2))) as decimal(38,2)) as total_value
        from s
        group by user_id, session_idx
        order by user_id, session_start""")
    ),
    "q_funnel" -> Q(
      (s, dir) =>
        graft.operators.Funnel
          .conversions(Tables.events(s, dir), Seq("view", "click", "purchase"))
          .orderBy("user_id"),
      // Stepwise replay: t_i = min event of step i strictly after the
      // user's t_{i-1} — epoch-millis bigints, engine-exact.
      Some("""
        with t0 as (
          select user_id, min(epoch_ms(ts)) as t_view
          from events where event_type = 'view' group by user_id
        ),
        t1 as (
          select e.user_id, min(epoch_ms(e.ts)) as t_click
          from events e join t0 using (user_id)
          where e.event_type = 'click' and epoch_ms(e.ts) > t0.t_view
          group by e.user_id
        ),
        t2 as (
          select e.user_id, min(epoch_ms(e.ts)) as t_purchase
          from events e join t1 using (user_id)
          where e.event_type = 'purchase' and epoch_ms(e.ts) > t1.t_click
          group by e.user_id
        )
        select t0.user_id, t0.t_view, t1.t_click, t2.t_purchase,
          cast(1 + (case when t1.t_click is not null then 1 else 0 end)
                 + (case when t2.t_purchase is not null then 1 else 0 end) as int) as steps_completed
        from t0
        left join t1 using (user_id)
        left join t2 using (user_id)
        order by user_id"""),
    ),
    "q_funnel_report" -> Q(
      (s, dir) =>
        graft.operators.Funnel
          .report(Tables.events(s, dir), Seq("view", "click", "purchase"))
          .select(
            col("step"),
            col("event_type"),
            col("n_users"),
            graft.queries.Parity.roundHalfUp(col("conversion"), 6)
              .cast("decimal(9,6)").as("conversion")
          )
          .orderBy("step"),
      Some(s"""
        with t0 as (
          select user_id, min(epoch_ms(ts)) as t_view
          from events where event_type = 'view' group by user_id
        ),
        t1 as (
          select e.user_id, min(epoch_ms(e.ts)) as t_click
          from events e join t0 using (user_id)
          where e.event_type = 'click' and epoch_ms(e.ts) > t0.t_view
          group by e.user_id
        ),
        t2 as (
          select e.user_id, min(epoch_ms(e.ts)) as t_purchase
          from events e join t1 using (user_id)
          where e.event_type = 'purchase' and epoch_ms(e.ts) > t1.t_click
          group by e.user_id
        ),
        c as (
          select (select count(*) from t0) as n0,
                 (select count(*) from t1) as n1,
                 (select count(*) from t2) as n2
        )
        select step, event_type, n_users,
          cast(${Parity.duckRound("conv", 6)} as decimal(9,6)) as conversion
        from (
          select cast(0 as int) as step, 'view' as event_type, n0 as n_users,
                 cast(1.0 as double) as conv from c
          union all
          select 1, 'click', n1,
            case when n0 > 0 then cast(n1 as double) / cast(n0 as double) else 0.0 end from c
          union all
          select 2, 'purchase', n2,
            case when n1 > 0 then cast(n2 as double) / cast(n1 as double) else 0.0 end from c
        )
        order by step"""),
    ),
    "q_retention" -> Q(
      (s, dir) =>
        graft.operators.Retention
          .cohortRetention(Tables.events(s, dir))
          .select(
            col("cohort_day"),
            col("day_offset"),
            col("n_active"),
            col("cohort_size"),
            graft.queries.Parity.roundHalfUp(col("retention"), 6)
              .cast("decimal(9,6)").as("retention")
          )
          .orderBy("cohort_day", "day_offset"),
      Some(s"""
        with first as (
          select user_id, min(cast(ts as date)) as cohort_day
          from events group by user_id
        ),
        sizes as (
          select cohort_day, count(*) as cohort_size from first group by cohort_day
        ),
        active as (
          select distinct user_id, cast(ts as date) as day from events
        ),
        cells as (
          select f.cohort_day,
            cast(date_diff('day', f.cohort_day, a.day) as int) as day_offset,
            count(distinct a.user_id) as n_active
          from active a join first f using (user_id)
          group by f.cohort_day, day_offset
        )
        select c.cohort_day, c.day_offset, c.n_active, s.cohort_size,
          cast(${Parity.duckRound(
            "cast(n_active as double) / cast(cohort_size as double)", 6
          )} as decimal(9,6)) as retention
        from cells c join sizes s using (cohort_day)
        order by cohort_day, day_offset"""),
    ),
    "q_transitions" -> Q(
      (s, dir) =>
        graft.operators.Transitions
          .transitionMatrix(Tables.events(s, dir))
          .select(
            col("prev_type"),
            col("next_type"),
            col("n"),
            graft.queries.Parity.roundHalfUp(col("p"), 6)
              .cast("decimal(9,6)").as("p")
          )
          .orderBy("prev_type", "next_type"),
      Some(s"""
        with pairs as (
          select lag(event_type) over (partition by user_id order by ts, event_id) as prev_type,
                 event_type as next_type
          from events
        ),
        counts as (
          select prev_type, next_type, count(*) as n
          from pairs where prev_type is not null
          group by prev_type, next_type
        )
        select prev_type, next_type, n,
          cast(${Parity.duckRound(
            "cast(n as double) / cast(sum(n) over (partition by prev_type) as double)", 6
          )} as decimal(9,6)) as p
        from counts
        order by prev_type, next_type"""),
    ),
    "q_corr_matrix" -> Q(
      (s, dir) =>
        graft.operators.Stats
          .corrMatrix(
            Tables.read(s, dir, "lineitem"),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .select(
            col("col_a"),
            col("col_b"),
            col("n"),
            graft.queries.Parity.roundHalfUp(col("corr"), 6)
              .cast("decimal(9,6)").as("corr")
          )
          .orderBy("col_a", "col_b"),
      // Same moment sums + closed form on both engines (not each engine's
      // own corr() recurrence); the 6-decimal round absorbs the sub-1e-9
      // summation-order jitter of the raw sums (kmeans-avg precedent).
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val pairs = for {
          i <- cols.indices; j <- (i + 1) until cols.size
        } yield (cols(i), cols(j))
        val moments =
          Seq("count(*) as n") ++
            cols.flatMap(c => Seq(s"sum($c) as s_$c", s"sum($c*$c) as ss_$c")) ++
            pairs.map { case (a, b) => s"sum($a*$b) as sp_${a}_$b" }
        def corrExpr(a: String, b: String) = {
          val va = s"(n*ss_$a - s_$a*s_$a)"
          val vb = s"(n*ss_$b - s_$b*s_$b)"
          val cov = s"(n*sp_${a}_$b - s_$a*s_$b)"
          s"case when $va > 0 and $vb > 0 then $cov / (sqrt($va) * sqrt($vb)) end"
        }
        val branches = pairs.zipWithIndex.map { case ((a, b), i) =>
          val head = if (i == 0)
            s"'$a' as col_a, '$b' as col_b, n, cast(${Parity.duckRound(corrExpr(a, b), 6)} as decimal(9,6)) as corr"
          else
            s"'$a', '$b', n, cast(${Parity.duckRound(corrExpr(a, b), 6)} as decimal(9,6))"
          s"select $head from m"
        }
        s"""
        with m as (select ${moments.mkString(", ")} from lineitem)
        ${branches.mkString("\n        union all\n        ")}
        order by col_a, col_b"""
      }
    ),
    "q_key_skew" -> Q(
      (s, dir) =>
        graft.operators.Skew
          .keySkew(Tables.read(s, dir, "lineitem"), "l_suppkey", topN = 10)
          .select(
            col("key"),
            col("n"),
            graft.queries.Parity.roundHalfUp(col("share"), 6)
              .cast("decimal(9,6)").as("share"),
            col("rank")
          )
          .orderBy("rank"),
      Some(s"""
        with counts as (
          select cast(l_suppkey as varchar) as key, count(*) as n
          from lineitem group by 1
        ),
        total as (select sum(n) as t from counts),
        top as (select key, n from counts order by n desc, key limit 10)
        select key, n,
          cast(${Parity.duckRound(
            "cast(n as double) / cast(t as double)", 6)} as decimal(9,6)) as share,
          cast(row_number() over (order by n desc, key) as int) as rank
        from top, total
        order by rank"""),
    ),
    "q_topk_revenue" -> Q(
      (s, dir) => {
        val customer = Tables.read(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val orders = Tables.read(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val lineitem = Tables.read(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        // classic shipping-priority shape: two equi-joins (dimension sides
        // broadcast at their size), partial-agg revenue, and a top-10 on the
        // FLOOR-ROUNDED revenue so the cut is engine-reproducible
        lineitem
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("_rev"))
          .select(
            col("l_orderkey"),
            col("o_orderdate"),
            col("o_orderpriority"),
            graft.queries.Parity.roundHalfUp(col("_rev"), 4)
              .cast("decimal(18,4)").as("revenue")
          )
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""
        with agg as (
          select l_orderkey, o_orderdate, o_orderpriority,
            sum(l_extendedprice * (cast(1.0 as double) - l_discount)) as rev
          from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          where c_mktsegment = 'BUILDING'
            and o_orderdate < timestamp '1998-01-01'
            and l_shipdate > timestamp '1998-01-01'
          group by l_orderkey, o_orderdate, o_orderpriority
        )
        select l_orderkey, o_orderdate, o_orderpriority,
          cast(${Parity.duckRound("rev", 4)} as decimal(18,4)) as revenue
        from agg
        order by revenue desc, l_orderkey limit 10"""),
    ),
    "q_sliding_window" -> Q(
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(
            window(col("ts"), "2 hours", "1 hour").as("w"),
            col("event_type")
          )
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value")
          )
          .select(
            col("w.start").as("w_start"),
            col("w.end").as("w_end"),
            col("event_type"),
            col("n"),
            col("total_value")
          )
          .orderBy("w_start", "event_type"),
      Some("""
        with e2 as (
          select cast(date_trunc('hour', ts) as timestamp) as w_start, event_type, value
          from events
          union all
          select cast(date_trunc('hour', ts) as timestamp) - interval 1 hour, event_type, value
          from events
        )
        select w_start, w_start + interval 2 hour as w_end, event_type,
          count(*) as n,
          cast(sum(cast(value as decimal(18,2))) as decimal(38,2)) as total_value
        from e2
        group by w_start, event_type
        order by w_start, event_type""")
    ),
    "q_asof_join" -> Q(
      (s, dir) => {
        // point-in-time join: each event gets the user's latest order state
        // at or before the event timestamp (no future leakage)
        val orderState = Tables
          .read(s, dir, "orders")
          .groupBy(
            col("o_custkey").as("user_id"),
            col("o_orderdate").cast("timestamp").as("ots")
          )
          .agg(max(col("o_totalprice")).as("last_price"))
        graft.operators.AsOfJoin
          .asOf(
            Tables.events(s, dir).select("event_id", "user_id", "ts"),
            orderState,
            keyCols = Seq("user_id"),
            leftTs = "ts",
            rightTs = "ots",
            payloadCols = Seq("last_price")
          )
          .orderBy("event_id")
      },
      Some("""
        with r as (
          select o_custkey as user_id, cast(o_orderdate as timestamp) as ots,
                 max(o_totalprice) as last_price
          from orders group by 1, 2
        )
        select e.event_id, e.user_id, cast(e.ts as timestamp) as ts,
               r.ots as asof_ts, r.last_price
        from events e asof left join r
          on e.user_id = r.user_id and cast(e.ts as timestamp) >= r.ots
        order by e.event_id""")
    ),
    "q_range_join" -> Q(
      (s, dir) => {
        // balance bands per nation: customers joined to the deterministic
        // acctbal interval of each nation via bucketized range join
        // integer band bounds: exact in both engines (computed doubles vs
        // decimals disagree by 1 ulp at boundaries — a parity hazard)
        val bands = Tables
          .read(s, dir, "nation")
          .select(
            col("n_name"),
            (col("n_nationkey") * 450 - 1000).cast("long").as("lo"),
            (col("n_nationkey") * 450 - 551).cast("long").as("hi")
          )
        graft.operators.RangeJoin
          .pointInInterval(
            Tables.read(s, dir, "customer")
              .select(col("c_custkey"), col("c_acctbal").cast("decimal(12,2)").as("bal")),
            bands,
            xCol = "bal",
            startCol = "lo",
            endCol = "hi",
            bucketWidth = 450.0
          )
          .select(col("c_custkey"), col("bal"), col("n_name"), col("lo"))
          .orderBy("c_custkey", "n_name")
      },
      Some("""
        with bands as (
          select n_name,
            cast(n_nationkey * 450 - 1000 as bigint) as lo,
            cast(n_nationkey * 450 - 551 as bigint) as hi
          from nation
        )
        select c.c_custkey, cast(c.c_acctbal as decimal(12,2)) as bal, b.n_name, b.lo
        from customer c
        join bands b on cast(c.c_acctbal as decimal(12,2)) between b.lo and b.hi
        order by c.c_custkey, b.n_name""")
    ),
    "q_events_json" -> Q(
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(
            col("event_id"),
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k")
          )
          .orderBy("event_id"),
      Some("""
        select event_id, event_type,
          cast(json_extract_string(props, '$.k') as int) as k
        from events
        order by event_id""")
    ),
    // Rolling z-score anomaly detection: hourly counts per event_type
    // scored against the trailing 24h baseline of the same series (range
    // frame over epoch-hours, so silent hours age out on the clock). The
    // baseline keeps exact integer sums; mean/variance derive in one
    // closed-form double expression both engines replay bit-for-bit.
    "q_anomaly" -> Q(
      (s, dir) =>
        anomalyProjection(
          graft.operators.Anomaly.hourlyZScores(
            Tables.events(s, dir), "ts", Seq("event_type"),
            baselineHours = 24, minBaseline = 12, zThreshold = 3.0)),
      Some(anomalyOracleSql)
    ),
    // The same scores SERVED from the incrementally-maintained hourly
    // store: two disjoint batches merge in (plus a deliberate replay of
    // the second, which the batch-id marker must no-op), then scoring
    // reads ONLY the store — count merging, exactly-once, and serving
    // identity are all under the hash check. Store build jobs bounded
    // (PlanGuardSpec exemption).
    "q_anomaly_serving" -> Q(
      (s, dir) => {
        import graft.operators.{Anomaly, EventStatsStore}
        val out =
          s"${sys.props("java.io.tmpdir")}/graft_evstats_${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(out), true)
        val ev = Tables.events(s, dir)
        def hourlyOf(batch: org.apache.spark.sql.DataFrame) =
          Anomaly.hourlyCounts(batch, "ts", Seq("event_type"))
        EventStatsStore.merge(
          s, out, hourlyOf(ev.filter(col("event_id") % 2 === 0)),
          Seq("event_type"), batchId = 1L)
        EventStatsStore.merge(
          s, out, hourlyOf(ev.filter(col("event_id") % 2 =!= 0)),
          Seq("event_type"), batchId = 2L)
        // replayed epoch: must be a no-op or counts double
        EventStatsStore.merge(
          s, out, hourlyOf(ev.filter(col("event_id") % 2 =!= 0)),
          Seq("event_type"), batchId = 2L)
        anomalyProjection(
          EventStatsStore.score(
            s, out, Seq("event_type"), new java.sql.Timestamp(0L),
            baselineHours = 24, minBaseline = 12, zThreshold = 3.0))
      },
      Some(anomalyOracleSql)
    ),
    // Stream-stream attribution join run on its batch twin: view ->
    // purchase pairs of the same user within 1 hour. The streaming form
    // (StreamingPipeline.attributionJoin) is the IDENTICAL plan with
    // watermark-bounded state; watermarks are no-ops on batch, so the
    // oracle pins the shared join semantics.
    "q_attribution" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.streaming.StreamingPipeline
          .attributionJoin(
            ev.filter(col("event_type") === "view")
              .select(col("user_id"), col("ts"), col("event_id")),
            ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id")),
            "user_id", attributionWindow = "1 hour")
          .orderBy("imp_id", "conv_id")
      },
      Some("""
        select i.user_id, i.event_id as imp_id, c.event_id as conv_id,
          cast(i.ts as timestamp) as imp_ts,
          cast(c.ts as timestamp) as conv_ts,
          cast(floor(epoch(c.ts)) as bigint)
            - cast(floor(epoch(i.ts)) as bigint) as latency_s
        from events i join events c
          on i.user_id = c.user_id
         and i.event_type = 'view' and c.event_type = 'purchase'
         and i.ts <= c.ts and c.ts <= i.ts + interval 1 hour
        order by imp_id, conv_id""")
    ),
    // Storage-limitation retention: expire day partitions older than the
    // cutoff as a DIRECTORY DELETE (zero data rewrites), then read back
    // — the oracle recomputes the kept slice from the raw events, so a
    // partition deleted too eagerly or leaked past the cutoff hash-fails.
    // Store build bounded (PlanGuardSpec exemption).
    "q_retention_ttl" -> Q(
      (s, dir) => {
        import graft.operators.{Anomaly, EventStatsStore, Ttl}
        val out =
          s"${sys.props("java.io.tmpdir")}/graft_ttl_${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(out), true)
        EventStatsStore.merge(
          s, out,
          Anomaly.hourlyCounts(Tables.events(s, dir), "ts", Seq("event_type")),
          Seq("event_type"), batchId = 1L)
        Ttl.expireDayPartitions(s, out, "day", "2024-01-15")
        EventStatsStore.load(s, out)
          .select(col("event_type"), col("hour"), col("n"))
          .orderBy("event_type", "hour")
      },
      Some("""
        select event_type, cast(date_trunc('hour', ts) as timestamp) as hour,
          count(*) as n
        from events
        where cast(ts as date) >= date '2024-01-15'
        group by 1, 2
        order by 1, 2""")
    ),
    // Pseudonym key rotation: re-key a published artifact from salt A to
    // salt B through a mapping table (raw PII touched once, publish
    // re-keyed by join) — the oracle computes the salt-B publish
    // DIRECTLY, so rotate(publish(A)) == publish(B) is hash-checked.
    "q_rotate_pseudonyms" -> Q(
      (s, dir) => {
        import graft.masking.{Masking, Rotation}
        val svc = Tables.services(s, dir)
        val saltB = "rotated_salt_2026"
        val published = svc.select(
          col("service_id"),
          Masking.maskEmail(col("contact_email"), salt).as("email_anon"))
        val map = Rotation.mapping(
          svc, col("contact_email"),
          (c, sl) => Masking.maskEmail(c, sl), salt, saltB)
        Rotation.rotate(published, "email_anon", map).orderBy("service_id")
      },
      Some(s"""
        with services as (${ServicesSynth.sql})
        select service_id,
          case when contact_email is not null and contact_email != ''
               then 'user_' || substr(to_hex(sha256(lower(trim(contact_email)) || 'rotated_salt_2026')), 1, 16) || '@anonymized.gouv.fr'
               else null end as email_anon
        from services order by service_id""")
    ),
    // Lineage across a multi-table pipeline: the star join's outputs
    // traced through both joins to their owning base tables (count(*)
    // correctly depends on NO column). Same literal-expected-table gate
    // as q_lineage.
    "q_lineage_join" -> Q(
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
        val c = Tables.read(s, dir, "customer")
        val n = Tables.read(s, dir, "nation")
        val frame = o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("total_price"),
            countDistinct(col("o_custkey")).as("n_customers"))
        graft.plans.Lineage.report(frame).orderBy("out_col")
      },
      Some("""
        select * from (values
          ('c_mktsegment', 'c_mktsegment', 1),
          ('n_customers', 'o_custkey', 1),
          ('n_name', 'n_name', 1),
          ('n_orders', '', 0),
          ('total_price', 'o_totalprice', 1)
        ) t(out_col, src_cols, n_src)
        order by out_col""")
    ),
    // One-row release certificate: the go/no-go record a publication
    // review files — row count, k-anonymity floor over the published
    // grouping, residual-PII scan, completeness — all validators
    // composed into one hash-checked row (single-row broadcast crosses,
    // the scalar-subquery pattern).
    "q_release_cert" -> Q(
      (s, dir) => {
        val mart = Pipeline
          .mart(enrichedDf(s, dir))
          .drop("anonymized_at", "mart_created_at")
        val base = mart.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("contact_email").isNotNull &&
            !col("contact_email").endsWith("@anonymized.gouv.fr"), 1L)
            .otherwise(0L)).as("pii_email_violations"),
          Parity.roundHalfUp(avg(col("data_completeness_score")), 4)
            .cast("decimal(9,4)").as("avg_completeness"))
        val kFloor = mart.groupBy(col("organization_type"))
          .agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("min_group_size"))
        // plan-level masking gate (zero jobs): 1 iff NO published column
        // carries a raw PII path past the approved maskers — the
        // data-side validators above check published VALUES, this checks
        // the published PLAN; the certificate needs both
        val piiCols = PolicyCatalog.reference.models.values
          .flatMap(_.collect { case (n, p) if p.pii => n }).toSet
        val allMasked =
          if (graft.plans.Lineage.allPiiMasked(mart, piiCols)) 1 else 0
        // the per-method bit: every sanitized PII path must use the kind
        // its policy DECLARES (round where hash_sha256 was declared
        // certifies as "masked" but is not the promised protection) —
        // Lineage.methodsReconcile, plan-sized, zero jobs
        val declaredMethods = PolicyCatalog.reference.models.values
          .flatMap(_.collect {
            case (n, p) if p.pii && p.anonymizationMethod.isDefined =>
              n -> p.anonymizationMethod.get.name
          }).toMap
        val methodsOk =
          if (graft.plans.Lineage.methodsReconcile(mart, declaredMethods)) 1 else 0
        base
          .crossJoin(broadcast(kFloor))
          .withColumn("k5_ok",
            when(col("min_group_size") >= 5, 1).otherwise(0))
          .withColumn("all_pii_masked", lit(allMasked))
          .withColumn("methods_reconcile", lit(methodsOk))
      },
      Some(OracleSql.pipelineCtes + """
        , base as (
          select count(*) as n_rows,
            sum(case when contact_email is not null
                      and contact_email not like '%@anonymized.gouv.fr'
                     then 1 else 0 end) as pii_email_violations,
            cast(floor(avg(data_completeness_score) * 10000 + 0.5) / 10000.0
                 as decimal(9,4)) as avg_completeness
          from mart
        ),
        kf as (
          select min(n) as min_group_size from (
            select count(*) as n from mart group by organization_type)
        )
        select cast(n_rows as bigint) as n_rows,
          cast(pii_email_violations as bigint) as pii_email_violations,
          avg_completeness,
          cast(min_group_size as bigint) as min_group_size,
          cast(case when min_group_size >= 5 then 1 else 0 end as int) as k5_ok,
          cast(1 as int) as all_pii_masked,
          cast(1 as int) as methods_reconcile
        from base cross join kf""")
    ),
    // Lineage-based PII exposure audit: which published columns
    // STRUCTURALLY depend on PII-tagged sources — strictly stronger than
    // the name-level PiiLeakLinter (substring(contact_email) under an
    // innocent alias is caught here). The expected exposure is the
    // oracle: a new derivation quietly reaching PII hash-fails the gate.
    "q_pii_lineage" -> Q(
      (s, dir) => {
        val cat = PolicyCatalog.reference
        val pii = cat.models.values
          .flatMap(_.collect { case (n, p) if p.pii => n }).toSet
        val svc = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          Tables.services(s, dir).schema)
        val mart = Pipeline.mart(
          Pipeline.enrich(Pipeline.anonymize(Pipeline.staging(svc), cat)))
        graft.plans.Lineage.maskedPiiExposure(mart, pii).orderBy("out_col")
      },
      // every PII dependency of the published mart flows through an
      // approved masking node, so raw_pii_sources is empty and
      // all_pii_masked is 1 on EVERY row — a derivation bypassing the
      // maskers (the substring leak) would surface here and hash-fail
      Some("""
        select * from (values
          ('anonymization_version', '', 0, '', 1),
          ('anonymized_at', '', 0, '', 1),
          ('city', '', 0, '', 1),
          ('commune', '', 0, '', 1),
          ('contact_email', 'contact_email', 1, '', 1),
          ('contact_phone', 'contact_phone', 1, '', 1),
          ('data_completeness_score', 'contact_email,contact_phone,latitude,longitude,street_address', 1, '', 1),
          ('data_quality_level', 'contact_email,contact_phone,latitude,longitude,street_address', 1, '', 1),
          ('department_code', '', 0, '', 1),
          ('geohash', 'latitude,longitude', 1, '', 1),
          ('has_address', 'street_address', 1, '', 1),
          ('has_coordinates', 'latitude,longitude', 1, '', 1),
          ('has_email', 'contact_email', 1, '', 1),
          ('has_phone', 'contact_phone', 1, '', 1),
          ('insee_code', '', 0, '', 1),
          ('last_updated', '', 0, '', 1),
          ('latitude', 'latitude', 1, '', 1),
          ('legal_status', '', 0, '', 1),
          ('license', '', 0, '', 1),
          ('longitude', 'longitude', 1, '', 1),
          ('mart_created_at', '', 0, '', 1),
          ('organization_type', '', 0, '', 1),
          ('organization_type_label', '', 0, '', 1),
          ('parent_organization', '', 0, '', 1),
          ('postal_code', '', 0, '', 1),
          ('processing_pipeline', '', 0, '', 1),
          ('region', '', 0, '', 1),
          ('service_id', '', 0, '', 1),
          ('service_name', '', 0, '', 1)
        ) t(out_col, pii_sources, derives_from_pii, raw_pii_sources, all_pii_masked)
        order by out_col""")
    ),
    // Declared-method lineage reconciliation as a REPORT: for every
    // published mart column, the PII sources whose sanitized paths use a
    // kind the policy's declared anonymization_method does not allow
    // (Lineage.methodMismatches — per-path signatures, zero jobs, the
    // q_pii_lineage LocalRelation shape). The literal oracle pins EVERY
    // column at methods_ok=1 with no mismatch sources: a masking change
    // that swaps a weaker sanitizer under a declared method hash-fails
    // here column-by-column, not just in the one-bit certificate.
    "q_method_lineage" -> Q(
      (s, dir) => {
        import s.implicits._
        val cat = PolicyCatalog.reference
        val declared = cat.models.values.flatMap(_.collect {
          case (n, p) if p.pii && p.anonymizationMethod.isDefined =>
            n -> p.anonymizationMethod.get.name
        }).toMap
        val svc = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          Tables.services(s, dir).schema)
        val mart = Pipeline.mart(
          Pipeline.enrich(Pipeline.anonymize(Pipeline.staging(svc), cat)))
        graft.plans.Lineage.methodMismatches(mart, declared)
          .map { case (out, bad) =>
            (out, bad.mkString(","), if (bad.isEmpty) 1 else 0)
          }
          .toDF("out_col", "method_mismatch_sources", "methods_ok")
          .orderBy("out_col")
      },
      Some("""
        select * from (values
          ('anonymization_version', '', 1),
          ('anonymized_at', '', 1),
          ('city', '', 1),
          ('commune', '', 1),
          ('contact_email', '', 1),
          ('contact_phone', '', 1),
          ('data_completeness_score', '', 1),
          ('data_quality_level', '', 1),
          ('department_code', '', 1),
          ('geohash', '', 1),
          ('has_address', '', 1),
          ('has_coordinates', '', 1),
          ('has_email', '', 1),
          ('has_phone', '', 1),
          ('insee_code', '', 1),
          ('last_updated', '', 1),
          ('latitude', '', 1),
          ('legal_status', '', 1),
          ('license', '', 1),
          ('longitude', '', 1),
          ('mart_created_at', '', 1),
          ('organization_type', '', 1),
          ('organization_type_label', '', 1),
          ('parent_organization', '', 1),
          ('postal_code', '', 1),
          ('processing_pipeline', '', 1),
          ('region', '', 1),
          ('service_id', '', 1),
          ('service_name', '', 1)
        ) t(out_col, method_mismatch_sources, methods_ok)
        order by out_col""")
    ),
    // Right-to-erasure (GDPR Art. 17) through the bucketed store: build,
    // erase a deterministic subject set touching only their buckets, and
    // read back — the oracle is simply the source minus the erased keys,
    // so a single surviving row hash-fails. Store build jobs bounded
    // (PlanGuardSpec exemption).
    "q_erasure" -> Q(
      (s, dir) => {
        import graft.pipeline.Snapshot
        val out =
          s"${sys.props("java.io.tmpdir")}/graft_erase_${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(out), true)
        val cust = Tables.read(s, dir, "customer")
        Snapshot.writeStore(cust, "c_custkey", out, buckets = 8)
        Snapshot.eraseKeys(
          s, out,
          cust.filter(col("c_custkey") % 97 === 0).select(col("c_custkey")),
          "c_custkey", buckets = 8)
        Snapshot.loadStore(s, out).drop("bucket").orderBy("c_custkey")
      },
      Some("""
        select * from customer
        where c_custkey % 97 <> 0
        order by c_custkey""")
    ),
    // Grid-bucketed spatial self-join: which services sit within 500 km
    // of each other — 3x3 cell-neighborhood equi-join + exact haversine
    // verify, never a cartesian (the naive theta-join is the
    // BroadcastNestedLoopJoin the plan gate bans).
    "q_geo_join" -> Q(
      (s, dir) =>
        graft.operators.SpatialJoin
          .withinRadius(
            Tables.services(s, dir), "service_id", "latitude", "longitude",
            radiusKm = 500.0, cellDeg = 10.0, maxAbsLat = 60.0)
          .select(
            col("id_a"), col("id_b"),
            Parity.roundHalfUp(col("dist_km"), 3).cast("decimal(12,3)").as("dist_km"))
          .orderBy("id_a", "id_b"),
      Some(s"""
        with services as (${ServicesSynth.sql}),
        p as (
          select service_id as id,
            cast(latitude as double) as lat, cast(longitude as double) as lon,
            cast(floor(cast(latitude as double) / 10.0) as bigint) as cla,
            ((cast(floor((cast(longitude as double) + 180.0) / 10.0) as bigint) % 36) + 36) % 36 as clo
          from services
          where latitude is not null and longitude is not null
            and latitude between -90 and 90 and longitude between -180 and 180
            and abs(cast(latitude as double)) <= 60.0
        ),
        probe as (
          select id, lat, lon, cla + d.i as cla,
            (((clo + d.j) % 36) + 36) % 36 as clo
          from p, (select a.i, b.j
                   from (select unnest([-1, 0, 1]) as i) a,
                        (select unnest([-1, 0, 1]) as j) b) d
        ),
        pairs as (
          select a.id as id_a, b.id as id_b,
            6371 * 2 * asin(sqrt(
              pow(sin(radians(b.lat - a.lat) / 2), 2) +
              cos(radians(a.lat)) * cos(radians(b.lat)) *
              pow(sin(radians(b.lon - a.lon) / 2), 2))) as dist
          from probe a join p b
            on a.cla = b.cla and a.clo = b.clo and a.id < b.id
        )
        select id_a, id_b,
          cast(${Parity.duckRound("dist", 3)} as decimal(12,3)) as dist_km
        from pairs
        where dist <= 500.0
        order by id_a, id_b""")
    ),
    // CUSUM changepoint chart (Page '54): the cumulative deviation walk
    // S_t locates level SHIFTS the hourly z-detectors cannot see; argmax
    // |S_t| (earliest on ties) estimates the changepoint, the normalized
    // range is the evidence. Pure window algebra — no recursion.
    "q_changepoint" -> Q(
      (s, dir) =>
        graft.operators.Anomaly
          .changepoint(Tables.events(s, dir), "ts", Seq("event_type"))
          .select(
            col("event_type"),
            col("cp_hour"),
            col("n_hours"),
            Parity.roundHalfUp(col("s_max_abs"), 4).cast("decimal(18,4)").as("s_max_abs"),
            Parity.roundHalfUp(col("s_range"), 4).cast("decimal(18,4)").as("s_range"),
            Parity.roundHalfUp(col("stat"), 4).cast("decimal(18,4)").as("stat")
          )
          .orderBy("event_type"),
      Some(s"""
        with hourly as (
          select event_type, cast(date_trunc('hour', ts) as timestamp) as hour,
            count(*) as n
          from events group by 1, 2
        ),
        idx as (
          select *, cast(epoch(hour) as bigint) // 3600 as hr_idx from hourly
        ),
        tot as (
          select event_type, hour, hr_idx, n,
            sum(n) over (partition by event_type) as t_sum,
            sum(n*n) over (partition by event_type) as t_sumsq,
            count(n) over (partition by event_type) as t_cnt
          from idx
        ),
        sw as (
          select *,
            sum(cast(n as double) - cast(t_sum as double) / cast(t_cnt as double))
              over (partition by event_type order by hr_idx
                    rows between unbounded preceding and current row) as s,
            sqrt(greatest(
              cast(t_sumsq as double) / cast(t_cnt as double)
                - (cast(t_sum as double) / cast(t_cnt as double))
                * (cast(t_sum as double) / cast(t_cnt as double)),
              0.0)) as sd
          from tot
        ),
        r as (
          select *,
            max(s) over (partition by event_type) as s_max,
            min(s) over (partition by event_type) as s_min,
            row_number() over (partition by event_type
                               order by abs(s) desc, hr_idx) as rn
          from sw
        )
        select event_type, hour as cp_hour, t_cnt as n_hours,
          cast(${Parity.duckRound("abs(s)", 4)} as decimal(18,4)) as s_max_abs,
          cast(${Parity.duckRound("s_max - s_min", 4)} as decimal(18,4)) as s_range,
          case when sd > 0.0
               then cast(${Parity.duckRound(
                 "(s_max - s_min) / (sd * sqrt(cast(t_cnt as double)))", 4)}
                 as decimal(18,4)) end as stat
        from r
        where rn = 1
        order by event_type""")
    ),
    // Seasonal null model: baseline is the SAME hour-of-day over the
    // trailing week — diurnal traffic's 9am surge is not an anomaly just
    // because nights are quiet. Same exact-sums algebra, frame over
    // epoch-days within the (type, hour-of-day) series.
    "q_anomaly_seasonal" -> Q(
      (s, dir) =>
        graft.operators.Anomaly
          .seasonalZScores(
            Tables.events(s, dir), "ts", Seq("event_type"),
            baselineDays = 7, minBaseline = 3, zThreshold = 3.0)
          .select(
            col("event_type"),
            col("hour"),
            col("hod"),
            col("n"),
            col("base_cnt"),
            Parity.roundHalfUp(col("mean_n"), 4).cast("decimal(18,4)").as("mean_n"),
            Parity.roundHalfUp(col("z"), 4).cast("decimal(18,4)").as("z"),
            col("is_anomaly")
          )
          .orderBy("event_type", "hour"),
      Some(s"""
        with hourly as (
          select event_type, cast(date_trunc('hour', ts) as timestamp) as hour,
            count(*) as n
          from events group by 1, 2
        ),
        idx as (
          select *, cast(date_part('hour', hour) as int) as hod,
            cast(epoch(hour) as bigint) // 86400 as day_idx
          from hourly
        ),
        w as (
          select event_type, hour, hod, n,
            count(n) over win as base_cnt,
            sum(n) over win as base_sum,
            sum(n*n) over win as base_sumsq
          from idx
          window win as (partition by event_type, hod order by day_idx
                         range between 7 preceding and 1 preceding)
        ),
        scored as (
          select event_type, hour, hod, n, base_cnt,
            cast(base_sum as double) / cast(base_cnt as double) as mean,
            sqrt(greatest(
              cast(base_sumsq as double) / cast(base_cnt as double)
                - (cast(base_sum as double) / cast(base_cnt as double))
                * (cast(base_sum as double) / cast(base_cnt as double)),
              0.0)) as sd
          from w
        )
        select event_type, hour, hod, n, base_cnt,
          case when base_cnt >= 3
               then cast(${Parity.duckRound("mean", 4)} as decimal(18,4)) end as mean_n,
          case when base_cnt >= 3 and sd > 0.0
               then cast(${Parity.duckRound("(cast(n as double) - mean) / sd", 4)} as decimal(18,4)) end as z,
          case when base_cnt >= 3 and sd > 0.0
               then cast(case when abs((cast(n as double) - mean) / sd) >= 3.0
                              then 1 else 0 end as int) end as is_anomaly
        from scored
        order by event_type, hour""")
    )
  )

  private def anomalyProjection(scored: DataFrame): DataFrame =
    scored
      .select(
        col("event_type"),
        col("hour"),
        col("n"),
        col("base_cnt"),
        Parity.roundHalfUp(col("mean_n"), 4).cast("decimal(18,4)").as("mean_n"),
        Parity.roundHalfUp(col("z"), 4).cast("decimal(18,4)").as("z"),
        col("is_anomaly")
      )
      .orderBy("event_type", "hour")

  // lazy: referenced by the relationalQueries ListMap initializer above
  private lazy val anomalyOracleSql: String =
    s"""
        with hourly as (
          select event_type, cast(date_trunc('hour', ts) as timestamp) as hour,
            count(*) as n
          from events group by 1, 2
        ),
        idx as (
          select *, cast(epoch(hour) as bigint) // 3600 as hr_idx from hourly
        ),
        w as (
          select event_type, hour, n,
            count(n) over win as base_cnt,
            sum(n) over win as base_sum,
            sum(n*n) over win as base_sumsq
          from idx
          window win as (partition by event_type order by hr_idx
                         range between 24 preceding and 1 preceding)
        ),
        scored as (
          select event_type, hour, n, base_cnt,
            cast(base_sum as double) / cast(base_cnt as double) as mean,
            sqrt(greatest(
              cast(base_sumsq as double) / cast(base_cnt as double)
                - (cast(base_sum as double) / cast(base_cnt as double))
                * (cast(base_sum as double) / cast(base_cnt as double)),
              0.0)) as sd
          from w
        )
        select event_type, hour, n, base_cnt,
          case when base_cnt >= 12
               then cast(${Parity.duckRound("mean", 4)} as decimal(18,4)) end as mean_n,
          case when base_cnt >= 12 and sd > 0.0
               then cast(${Parity.duckRound("(cast(n as double) - mean) / sd", 4)} as decimal(18,4)) end as z,
          case when base_cnt >= 12 and sd > 0.0
               then cast(case when abs((cast(n as double) - mean) / sd) >= 3.0
                              then 1 else 0 end as int) end as is_anomaly
        from scored
        order by event_type, hour"""

  val all: ListMap[String, Q] =
    (pipelineQueries ++ maskingQueries ++ validatorQueries ++
      relationalQueries ++ ExtensionQueries.all ++ SketchQueries.all ++
      PrivacyQueries.all)
      .map { case (k, q) => k -> Canon.wrap(k, q) }
}
