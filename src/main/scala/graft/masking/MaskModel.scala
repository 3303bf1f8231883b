package graft.masking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.policy.{ColumnPolicy, EngineConfig, MaskMethod}

/** The metadata-driven whole-relation masking compiler — the Spark
  * re-expression of `privacy__mask_model` + `privacy__mask_column`
  * (reference: dbt_project/macros/privacy/mask_model.sql:1-23,
  * mask_columns.sql:1-30).
  *
  * Semantics preserved exactly (SURVEY.md §7.6-7.8):
  *   - The column set comes from the input DataFrame's *physical schema*
  *     (`adapter.get_columns_in_relation`, mask_model.sql:9), never from the
  *     policy: physical columns without a policy flow through.
  *   - Every output column is renamed `<col>_anon`, including the fail-open
  *     passthrough branch (mask_columns.sql:23-29) — this is load-bearing for
  *     every downstream layer.
  *   - Unknown / unimplemented methods (`aggregate_to_city`) fall open to
  *     passthrough, bug-compatible with the reference dispatcher.
  *
  * This emits a single narrow `select` — no shuffle, fully inside
  * whole-stage codegen, scales linearly with input splits.
  */
object MaskModel {

  /** `privacy__mask_column` (mask_columns.sql:7-29): route one column on its
    * policy's anonymization method; alias `<name>_anon` in every branch.
    */
  def maskColumn(
      name: String,
      dataType: DataType,
      policy: Option[ColumnPolicy],
      cfg: EngineConfig,
      availableColumns: Set[String] = Set.empty
  ): Column = {
    val method = policy.flatMap(_.anonymizationMethod)
    val masked = method match {
      case Some(MaskMethod.MaskPartial) =>
        Masking.maskPhone(col(name))
      case Some(MaskMethod.HashSha256) =>
        Masking.maskEmail(col(name), cfg.saltKey, cfg.outputDomain)
      case Some(MaskMethod.Round2Decimals) =>
        Masking.maskCoordinates(col(name), cfg.gpsPrecision)
      case Some(MaskMethod.Suppress) =>
        lit(null).cast(dataType)
      case Some(MaskMethod.AggregateToCity)
          if cfg.enableAggregateToCity && availableColumns.contains("city") =>
        // Opt-in implementation of the reference's declared-but-unwired
        // method (SURVEY.md §2.6): coarsen the address to the city.
        when(col(name).isNotNull, col("city")).otherwise(lit(null).cast(dataType))
      case _ =>
        // No method, AggregateToCity (no dispatcher branch in the
        // reference), or unknown method: fail-open passthrough.
        col(name)
    }
    masked.as(name + "_anon")
  }

  /** `privacy__mask_model` (mask_model.sql:9-21): one `SELECT` over the
    * physical columns, each dispatched through [[maskColumn]].
    */
  def maskModel(
      df: DataFrame,
      policies: Map[String, ColumnPolicy],
      cfg: EngineConfig = EngineConfig()
  ): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      maskColumn(f.name, f.dataType, policies.get(f.name), cfg,
        df.columns.toSet)
    }: _*)
}
