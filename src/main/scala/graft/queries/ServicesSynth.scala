package graft.queries

/** Deterministic synthesized `services` source table, derived from the
  * driver's `customer` parquet (FIXTURES.md §3: the reference's input schema
  * doesn't exist in /root/testdata, so pipeline queries exercise the same
  * operators on an analogous, deterministically-derived table).
  *
  * The SQL below is deliberately written in the dialect subset common to
  * Spark SQL and DuckDB (`cast(.. as string)`, `||` null-propagating concat,
  * `lpad`, `make_date`, simple CASE), so the exact same text is run by the
  * Spark side (as a temp-view query) and embedded as a CTE in the DuckDB
  * oracle — both engines derive bit-identical inputs.
  *
  * Numeric hygiene for cross-engine parity (SURVEY.md §7.2-7.3): doubles are
  * produced as integer/1000.0, whose shortest decimal representation has at
  * most 3 fractional digits — so double->DECIMAL(18,3) casts and
  * double->string rendering agree between Spark (Java shortest-repr +
  * HALF_UP) and DuckDB (binary-value nearest).
  *
  * NULL / empty-string / unknown-slug cases are injected at fixed moduli to
  * exercise every masking guard and the fail-open dispatcher branch.
  */
object ServicesSynth {

  val sql: String = """
select
  cast(c_custkey as string) as service_id,
  case when c_custkey % 41 = 0 then null else c_name end as service_name,
  case when c_custkey % 11 = 0 then null else 'Org ' || cast(c_custkey % 7 as string) end as parent_organization,
  case cast(c_custkey % 18 as int)
    when 0 then 'administration-centrale-ou-ministere'
    when 1 then 'cabinet-ministeriel'
    when 2 then 'service-a-competence-nationale'
    when 3 then 'secretaire-d-etat'
    when 4 then 'service-deconcentre'
    when 5 then 'autorite-publique-independante'
    when 6 then 'autorite-administrative-independante'
    when 7 then 'etablissement-public'
    when 8 then 'groupement-d-interet-public'
    when 9 then 'etablissement-d-enseignement'
    when 10 then 'ambassade-ou-mission-diplomatique'
    when 11 then 'institution-europeenne'
    when 12 then 'institution'
    when 13 then 'conseil-comite-commission-organisme-consultatif'
    when 14 then 'ministere'
    when 15 then 'service-central'
    when 16 then 'unknown-slug'
    else null
  end as organization_type,
  case when c_custkey % 13 = 0 then null
       when c_custkey % 13 = 1 then ''
       else 'user' || cast(c_custkey as string) || '@example' || cast(c_custkey % 5 as string) || '.fr'
  end as contact_email,
  case when c_custkey % 17 = 0 then null
       when c_custkey % 17 = 1 then ''
       else '+33 ' || cast(1 + c_custkey % 9 as string) || ' ' || lpad(cast(c_custkey % 100 as string), 2, '0') || ' 45 67 89'
  end as contact_phone,
  case when c_custkey % 3 = 0 then null else 'https://ex' || cast(c_custkey % 10 as string) || '.fr' end as website,
  case when c_custkey % 7 = 0 then null else cast(1 + c_custkey % 120 as string) || ' rue de Paris' end as street_address,
  case when c_custkey % 23 = 0 then null else lpad(cast(c_custkey % 96 as string), 2, '0') || lpad(cast(c_custkey % 1000 as string), 3, '0') end as postal_code,
  case when c_custkey % 19 = 0 then null else 'Ville ' || cast(c_custkey % 50 as string) end as city,
  case when c_custkey % 29 = 0 then null else 'Commune ' || cast(c_custkey % 50 as string) end as commune,
  case when c_custkey % 31 = 0 then null else cast((c_custkey * 7919) % 180001 - 90000 as double) / 1000.0 end as latitude,
  case when c_custkey % 37 = 0 then null else cast((c_custkey * 104729) % 360001 - 180000 as double) / 1000.0 end as longitude,
  cast(10000 + c_custkey % 89999 as string) as insee_code,
  make_date(2025, 1 + cast(c_custkey % 12 as int), 1 + cast(c_custkey % 28 as int)) as last_updated
from customer
"""
}
