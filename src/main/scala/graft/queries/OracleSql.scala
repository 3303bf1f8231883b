package graft.queries

/** DuckDB oracle SQL for the pipeline-stage queries — the hand-written twin
  * of what dbt would compile from the reference's models (DuckDB dialect;
  * runs only in the driver's oracle, never in Spark). The `services` CTE is
  * the shared dialect-neutral synth SQL ([[ServicesSynth]]), so both engines
  * derive identical inputs.
  *
  * Audit timestamp columns (`loaded_at`, `anonymized_at`, `mart_created_at`)
  * are nondeterministic `current_timestamp` in the reference and are excluded
  * from compared outputs (SURVEY.md §7.5).
  */
object OracleSql {

  val salt = "dev_salt_UNSAFE"

  /** CTE chain: services -> cleaned -> staged -> anonymized -> enriched -> mart.
    * Mirrors stg_services_publics.sql / int_services_anonymized.sql /
    * int_services_enriched.sql / mart_services_open_data.sql.
    */
  val pipelineCtes: String = s"""
with services as (${ServicesSynth.sql}),
cleaned as (
  select service_id, service_name, parent_organization, organization_type,
         contact_email, contact_phone, website, street_address, postal_code,
         city, commune,
         cast(latitude as double) as latitude,
         cast(longitude as double) as longitude,
         insee_code,
         cast(last_updated as date) as last_updated
  from services
  where service_id is not null and service_name is not null
),
staged as (
  select md5(coalesce(cast(service_id as string), '_dbt_utils_surrogate_key_null_')) as service_key,
         cleaned.*,
         case when contact_email is not null then 1 else 0 end as has_email,
         case when contact_phone is not null then 1 else 0 end as has_phone,
         case when street_address is not null then 1 else 0 end as has_address,
         case when latitude is not null and longitude is not null then 1 else 0 end as has_coordinates
  from cleaned
),
anonymized as (
  select
    service_key as service_key_anon,
    service_id as service_id_anon,
    service_name as service_name_anon,
    parent_organization as parent_organization_anon,
    organization_type as organization_type_anon,
    case when contact_email is not null and contact_email != ''
         then 'user_' || substr(to_hex(sha256(lower(trim(contact_email)) || '$salt')), 1, 16) || '@anonymized.gouv.fr'
         else null end as contact_email_anon,
    case when contact_phone is not null and contact_phone != ''
         then substr(trim(contact_phone), 1, 6) || ' XX XX XX XX'
         else null end as contact_phone_anon,
    website as website_anon,
    street_address as street_address_anon,
    postal_code as postal_code_anon,
    city as city_anon,
    commune as commune_anon,
    round(cast(latitude as numeric), 2) as latitude_anon,
    round(cast(longitude as numeric), 2) as longitude_anon,
    insee_code as insee_code_anon,
    last_updated as last_updated_anon,
    has_email as has_email_anon,
    has_phone as has_phone_anon,
    has_address as has_address_anon,
    has_coordinates as has_coordinates_anon,
    '1.0.0' as anonymization_version,
    'round_2_decimals' as gps_anonymization_method
  from staged
),
enriched as (
  select
    anonymized.*,
    case
      when organization_type_anon in (
        'administration-centrale-ou-ministere', 'cabinet-ministeriel',
        'service-a-competence-nationale', 'secretaire-d-etat',
        'service-deconcentre') then 'services_centraux'
      when organization_type_anon in (
        'autorite-publique-independante',
        'autorite-administrative-independante') then 'autorites'
      when organization_type_anon in (
        'etablissement-public', 'groupement-d-interet-public') then 'operateurs'
      when organization_type_anon = 'etablissement-d-enseignement' then 'enseignement'
      when organization_type_anon = 'ambassade-ou-mission-diplomatique' then 'diplomatie'
      when organization_type_anon in ('institution-europeenne', 'institution') then 'institutions'
      when organization_type_anon = 'conseil-comite-commission-organisme-consultatif' then 'instances_consultatives'
      else 'autres'
    end as organization_category,
    substr(postal_code_anon, 1, 2) as department_code_anon,
    concat('geo_',
           cast(round(cast(latitude_anon as numeric), 2) as string), '_',
           cast(round(cast(longitude_anon as numeric), 2) as string)) as geohash_anon,
    case when contact_email_anon like '%@anonymized.gouv.fr' then 1 else 0 end as is_email_properly_anonymized,
    case when contact_phone_anon like '%XX XX XX XX' then 1 else 0 end as is_phone_properly_anonymized
  from anonymized
),
mart as (
  select * from (
    select
      service_id_anon as service_id,
      service_name_anon as service_name,
      parent_organization_anon as parent_organization,
      organization_type_anon as organization_type,
      case when organization_type_anon = 'ministere' then 'Ministère'
           when organization_type_anon = 'autorite-administrative-independante' then 'Autorité Indépendante'
           when organization_type_anon = 'etablissement-public' then 'Établissement Public'
           when organization_type_anon = 'service-central' then 'Service Central'
           else 'Autre' end as organization_type_label,
      contact_email_anon as contact_email,
      contact_phone_anon as contact_phone,
      city_anon as city,
      commune_anon as commune,
      department_code_anon as department_code,
      case when department_code_anon in ('75','77','78','91','92','93','94','95') then 'Île-de-France'
           when department_code_anon in ('59','62') then 'Hauts-de-France'
           when department_code_anon in ('69','01','42','63') then 'Auvergne-Rhône-Alpes'
           when department_code_anon in ('13','83','84','04','05','06') then 'Provence-Alpes-Côte d''Azur'
           when department_code_anon in ('33','24','40','47','64') then 'Nouvelle-Aquitaine'
           when department_code_anon in ('31','09','12','32','46','65','81','82') then 'Occitanie'
           else 'Autre région' end as region,
      latitude_anon as latitude,
      longitude_anon as longitude,
      geohash_anon as geohash,
      insee_code_anon as insee_code,
      postal_code_anon as postal_code,
      has_email_anon as has_email,
      has_phone_anon as has_phone,
      has_address_anon as has_address,
      has_coordinates_anon as has_coordinates,
      (cast(has_email_anon as int) + cast(has_phone_anon as int) +
       cast(has_address_anon as int) + cast(has_coordinates_anon as int)) as data_completeness_score,
      case when (cast(has_email_anon as int) + cast(has_phone_anon as int) +
                 cast(has_address_anon as int) + cast(has_coordinates_anon as int)) >= 3 then 'Complet'
           when (cast(has_email_anon as int) + cast(has_phone_anon as int) +
                 cast(has_address_anon as int) + cast(has_coordinates_anon as int)) = 2 then 'Partiel'
           else 'Minimal' end as data_quality_level,
      last_updated_anon as last_updated,
      anonymization_version,
      'GDPR Anonymizer v' || anonymization_version as processing_pipeline,
      'Conforme GDPR - Art. 4.5 (Pseudonymisation)' as legal_status,
      'Licence Ouverte / Open Licence' as license
    from enriched
  ) m
  where service_name is not null
    and organization_type is not null
    and data_completeness_score >= 1
)
"""

  val staging: String    = pipelineCtes + "\nselect * from staged order by service_id"
  val anonymize: String  = pipelineCtes + "\nselect * from anonymized order by service_id_anon"
  val enrich: String     = pipelineCtes + "\nselect * from enriched order by service_id_anon"
  val mart: String       = pipelineCtes + "\nselect * from mart order by service_id"
}
