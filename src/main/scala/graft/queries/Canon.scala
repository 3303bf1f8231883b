package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Canonicalization of compared query outputs for the driver's hash gate.
  *
  * The driver reads the Spark result back from parquet and the oracle result
  * from DuckDB, sorts columns by name, and hashes the values. DECIMAL columns
  * take different representations through those two paths (parquet
  * decimal128 -> python `decimal.Decimal` vs DuckDB's native fetch), so every
  * compared DECIMAL column is cast to STRING on both sides: Spark's
  * decimal->string and DuckDB's decimal->varchar both print the plain
  * full-scale form ("1.50"), making the hashed bytes identical.
  *
  * The values themselves already match — round 1 showed rows/schema green and
  * a scale-sensitive str() compare green on all of these — only the
  * representation the hasher sees differed. Raw DOUBLE columns are left
  * untouched: both paths surface them as float64 and round-1 queries with
  * double outputs (q_ann_topk_graph, q_asof_join, q_stage_services) hashed
  * green.
  *
  * One map drives BOTH the Spark-side projection and the DuckDB-side SQL
  * wrapper, so the two sides cannot drift.
  */
object Canon {

  /** query name -> decimal columns of the compared output to stringify. */
  val stringCols: Map[String, Seq[String]] = Map(
    "q1_agg" -> Seq("sum_qty", "sum_base_price", "sum_disc_price"),
    "q_haversine" -> Seq("dist_from_paris_km"),
    "q_coords_ops" -> Seq("latitude_anon", "longitude_anon"),
    "q_anonymize_services" -> Seq("latitude_anon", "longitude_anon"),
    "q_enrich_services" -> Seq("latitude_anon", "longitude_anon"),
    "q_mart_services" -> Seq("latitude", "longitude"),
    "q_percentiles" -> Seq("p50", "p95"),
    "q_window_funcs" -> Seq("bal", "running_bal"),
    "q_sessionize" -> Seq("total_value"),
    "q_sliding_window" -> Seq("total_value"),
    "q_embed_norms" -> Seq("l2_norm"),
    "q_embed_topk" -> Seq("cos_sim"),
    "q_ann_ivf" -> Seq("cos_sim"),
    "q_ann_ivf_multi" -> Seq("cos_sim"),
    "q_embed_near_dup" -> Seq("cos_sim"),
    "q_ngram_jaccard" -> Seq("jaccard"),
    "q_ssjoin" -> Seq("jaccard"),
    "q_decontam_pairs" -> Seq("jaccard"),
    "q_ssjoin_indexed" -> Seq("jaccard"),
    "q_record_linkage" -> Seq("name_sim", "addr_sim", "score"),
    "q_dedup_incremental" -> Seq("jaccard"),
    "q_dedup_indexed" -> Seq("jaccard"),
    "q_pq_codes" -> Seq("adc_dist"),
    "q_ann_ivfpq" -> Seq("adc_dist", "cos_sim"),
    "q_ann_ivfpq_multi" -> Seq("adc_dist"),
    "q_cluster_drift" -> Seq("psi"),
    "q_quality_model" -> Seq("model_score", "quality_score"),
    "q_source_overlap" -> Seq("jaccard"),
    "q_range_join" -> Seq("bal"),
    "q_star_join" -> Seq("total_price"),
    "q_scalar_subquery" -> Seq("bal", "threshold"),
    "q_rollup_agg" -> Seq("sum_qty"),
    "q_cube_agg" -> Seq("total"),
    "q_events_hourly" -> Seq("total_value"),
    "q_text_quality" -> Seq("mean_token_len", "punct_ratio", "quality_score"),
    "q_text_repetition" -> Seq("repetition_ratio"),
    "q_multimodal_features" -> (0 until 8).map(j => s"f$j"),
    "q_corpus_prepare" -> Seq("quality_score", "repetition_ratio"),
    "q_embed_quantize" -> Seq("scale_q", "recon_err"),
    "q_tfidf_topk" -> Seq("score"),
    "q_decontaminate" -> Seq("overlap_frac"),
    "q_lm_surprisal" -> Seq("surprisal"),
    "q_bm25" -> Seq("score"),
    "q_drift_psi" -> Seq("psi"),
    "q_bm25_topk" -> Seq("score"),
    "q_bm25_indexed" -> Seq("score"),
    "q_compact_serve" -> Seq("score"),
    "q_erasure_indexes" -> Seq("score"),
    "q_erase_logical" -> Seq("score"),
    "q_rectify" -> Seq("score"),
    "q_agg_store" -> Seq("total", "min_price", "max_price"),
    "q_agg_store_erase" -> Seq("total", "min_price", "max_price"),
    "q_erasure_exact" -> Seq("jaccard"),
    "q_hybrid_rrf" -> Seq("rrf_score"),
    "q_hybrid_indexed" -> Seq("rrf_score"),
    "q_lm_bigram" -> Seq("surprisal2"),
    "q_char_entropy" -> Seq("entropy"),
    "q_substring_stats" -> Seq("dup_frac"),
    "q_semdedup" -> Seq("max_cos_lower"),
    "q_semdedup_guarded" -> Seq("max_cos_lower"),
    "q_coreset" -> Seq("sq_dist"),
    "q_dedup_best" -> Seq("rep_quality"),
    "q_funnel_report" -> Seq("conversion"),
    "q_retention" -> Seq("retention"),
    "q_transitions" -> Seq("p"),
    "q_quality_rank" -> Seq("q6", "pct"),
    "q_corr_matrix" -> Seq("corr"),
    "q_key_skew" -> Seq("share"),
    "q_topk_revenue" -> Seq("revenue"),
    "q_vocab_oov" -> Seq("oov_rate"),
    "q_bloom_decontam" -> Seq("overlap_frac"),
    "q_pagerank" -> Seq("pagerank"),
    "q_hll_distinct" -> Seq("est_distinct"),
    "q_profile_approx" -> Seq("est_distinct"),
    "q_hll_merged" -> Seq("est_merged", "est_direct"),
    "q_hdr_quantiles" -> Seq("est"),
    "q_anomaly" -> Seq("mean_n", "z"),
    "q_anomaly_serving" -> Seq("mean_n", "z"),
    "q_anomaly_seasonal" -> Seq("mean_n", "z"),
    "q_changepoint" -> Seq("s_max_abs", "s_range", "stat"),
    "q_geo_join" -> Seq("dist_km"),
    "q_release_cert" -> Seq("avg_completeness"),
    "q_dp_quantiles" -> Seq("est_dp", "est_exact"),
    "q_dp_budget" -> Seq("spent_eps", "spent_delta", "adv_eps", "remaining_eps"),
    "q_consent_dp_release" -> Seq("spent_eps"),
    "q_pct_rank" -> Seq("pct_rank", "exact_pr"),
    "q_t_closeness" -> Seq("tvd"),
    "q_reid_risk" -> Seq("pct_unique"),
    "q_kmv_overlap" -> Seq("est_jaccard", "est_overlap"),
    "q_anon_utility" -> Seq("avg_group_size", "discernibility")
  )

  /** Spark side: in-place string cast of the named columns. */
  def df(d: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(d)((acc, c) => acc.withColumn(c, col(c).cast("string")))

  /** Oracle side: wrap the base SQL, replacing the named columns with their
    * varchar casts (column ORDER changes; the driver sorts by name).
    */
  def sql(base: String, cols: Seq[String]): String = {
    val casts = cols.map(c => s"cast($c as varchar) as $c").mkString(", ")
    s"select * exclude (${cols.mkString(", ")}), $casts from (\n$base\n) __canon"
  }

  def wrap(name: String, q: Registry.Q): Registry.Q =
    stringCols.get(name) match {
      case Some(cols) =>
        Registry.Q((s, dir) => df(q.fn(s, dir), cols), q.oracle.map(sql(_, cols)))
      case None => q
    }
}
