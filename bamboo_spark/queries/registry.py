"""The driver-contract registry: queries() and oracle_sql() dicts over every family module.

Split from the original single-module registry (round 7); behavior is
identical -- the package ``__init__`` stitches one shared namespace so
cross-family references resolve exactly as in the single module.
"""

from __future__ import annotations

import functools as _functools
import math  # noqa: F401 — used by registry helpers

from bamboo_spark.operators._num import round_half_away as _round_half_away

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from bamboo_spark.operators import bpe, dedup, multimodal, pack, scale, similarity, text
from bamboo_spark.operators._cache import (
    release_caches as _release_caches,
    tracked_persist as _tracked_persist,
)

from bamboo_spark.queries._core import TABLES, load  # noqa: F401


def _with_cache_discipline(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Drain operator-internal persists left by PREVIOUS registry queries
    before building the next one. A query's own caches are load-bearing
    until its caller materializes the returned (lazy) DataFrame, so they
    can't be dropped here — but with this wrapper a sequential sweep of
    the whole registry (the driver's correctness gate, a long-lived
    session) keeps at most ONE query's caches live at a time instead of
    accumulating all of them. Callers that want zero residue call
    ``bamboo_spark.operators._cache.release_caches()`` after their last
    materialization, as bench.py does."""

    @_functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _release_caches()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _with_cache_discipline(fn)
        for name, fn in _queries_raw().items()
    }


def _queries_raw() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q_top_customers": q_top_customers,
        "q_order_count_distribution": q_order_count_distribution,
        "q_big_orders_having": q_big_orders_having,
        "q_shipmode_priority": q_shipmode_priority,
        "q_orders_priority": q_orders_priority,
        "q_events_hourly": q_events_hourly,
        "q_events_moving_avg": q_events_moving_avg,
        "q_events_stats": q_events_stats,
        "q_pivot_event_values": q_pivot_event_values,
        "q_sessionize": q_sessionize,
        "q_setops_users": q_setops_users,
        "q_flatten_embeddings": q_flatten_embeddings,
        "q_flatten_lineitem_wide": q_flatten_lineitem_wide,
        "q_events_props_json": q_events_props_json,
        "q_semi_anti_parts": q_semi_anti_parts,
        "q_rollup_revenue": q_rollup_revenue,
        "q_price_quantiles": q_price_quantiles,
        "q_stratified_sample": q_stratified_sample,
        "q_promo_revenue": q_promo_revenue,
        "q_top_supplier": q_top_supplier,
        "q_small_qty_revenue": q_small_qty_revenue,
        "q_large_volume_customers": q_large_volume_customers,
        "q_disjunctive_join": q_disjunctive_join,
        "q_rich_idle_customers": q_rich_idle_customers,
        "q_part_rank_ntile": q_part_rank_ntile,
        "q_cube_revenue": q_cube_revenue,
        "q_events_asof_click": q_events_asof_click,
        "q4_order_priority": q4_order_priority,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "q10_returned_items": q10_returned_items,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "q_quantity_range_buckets": q_quantity_range_buckets,
        "tfidf_top_terms": q_tfidf_top_terms,
        "inverted_index": q_inverted_index,
        "token_heavy_hitters": q_token_heavy_hitters,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_normalized": q_dedup_normalized,
        "dedup_components": q_dedup_components,
        "dedup_components_converged": q_dedup_components_converged,
        "dedup_components_contraction": q_dedup_components_contraction,
        "simhash_signatures": q_simhash_signatures,
        "near_dup_embeddings": q_near_dup_embeddings,
        "near_dup_exact": q_near_dup_exact,
        "ann_pairs": q_ann_pairs,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
        "ann_ivf_int8": q_ann_ivf_int8,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_int8": q_ann_topk_ivf_int8,
        "embedding_quantize": q_embedding_quantize,
        "embedding_projection": q_embedding_projection,
        "label_centroids": q_label_centroids,
        "pack_chunks": q_pack_chunks,
        "curation_pipeline": q_curation_pipeline,
        "near_dup_text_join": q_near_dup_text_join,
        "q_window_analytics": q_window_analytics,
        "q_approx_sketches": q_approx_sketches,
        "q_corpus_mix": q_corpus_mix,
        "dedup_incremental": q_dedup_incremental,
        "q_split_assign": q_split_assign,
        "q_events_funnel": q_events_funnel,
        "q_retention_cohorts": q_retention_cohorts,
        "q_session_stats": q_session_stats,
        "q_grouping_sets_revenue": q_grouping_sets_revenue,
        "q_events_props_variant": q_events_props_variant,
        "text_stats": q_text_stats,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "pii_scrub": q_pii_scrub,
        "contamination": q_contamination,
        "repetition_stats": q_repetition_stats,
        "quality_filter": q_quality_filter,
        "dedup_canonical": q_dedup_canonical,
        "paragraph_dedup": q_paragraph_dedup,
        "dsir_weights": q_dsir_weights,
        "bigram_surprisal": q_bigram_surprisal,
        "ann_topk_pq": q_ann_topk_pq,
        "events_interval_join": q_events_interval_join,
        "pq_codes": q_pq_codes,
        "ann_topk_ivfpq": q_ann_topk_ivfpq,
        "key_skew_profile": q_key_skew_profile,
        "token_zipf": q_token_zipf,
        "curation_pipeline_v2": q_curation_pipeline_v2,
        "embedding_norms": q_embedding_norms,
        "paragraph_dedup_incremental": q_paragraph_dedup_incremental,
        "adaptive_length_filter": q_adaptive_length_filter,
        "dedup_containment": q_dedup_containment,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "source_quality_report": q_source_quality_report,
        "snapshot_diff": q_snapshot_diff,
        "user_state_intervals": q_user_state_intervals,
        "event_transitions": q_event_transitions,
        "pit_enrich": q_pit_enrich,
        "cdc_upsert": q_cdc_upsert,
        "record_linkage": q_record_linkage,
        "bm25_scores": q_bm25_scores,
        "embedding_drift": q_embedding_drift,
        "events_rolling_rate": q_events_rolling_rate,
        "event_paths": q_event_paths,
        "diversity_sample": q_diversity_sample,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        "record_linkage_incremental": q_record_linkage_incremental,
        "fk_integrity": q_fk_integrity,
        "entity_clusters": q_entity_clusters,
        "value_outliers": q_value_outliers,
        "corpus_fingerprint": q_corpus_fingerprint,
        "token_pmi": q_token_pmi,
        "ann_recall": q_ann_recall,
        "conversion_lag": q_conversion_lag,
        "quality_deciles": q_quality_deciles,
        "embedding_covariance": q_embedding_covariance,
        "embedding_pca": q_embedding_pca,
        "dup_triangles": q_dup_triangles,
        "label_bridges": q_label_bridges,
        "dup_pagerank": q_dup_pagerank,
        "dup_degree_stats": q_dup_degree_stats,
        "dup_neighbor_jaccard": q_dup_neighbor_jaccard,
        "dup_kcore": q_dup_kcore,
        "winnow_dedup": q_winnow_dedup,
        "k_anonymity": q_k_anonymity,
        "events_seasonal_baseline": q_events_seasonal_baseline,
        "dedup_components_incremental": q_dedup_components_incremental,
        "curation_pipeline_v3": q_curation_pipeline_v3,
        "leakage_safe_split": q_leakage_safe_split,
        "export_manifest": q_export_manifest,
        "user_trajectory_pairs": q_user_trajectory_pairs,
        "token_cms_counts": q_token_cms_counts,
        "zorder_layout": q_zorder_layout,
        "lang_nb_confusion": q_lang_nb_confusion,
        "nb_roc": q_nb_roc,
        "km_retention": q_km_retention,
        "source_term_js": q_source_term_js,
        "events_trend": q_events_trend,
        "nb_calibration": q_nb_calibration,
        "chi2_terms": q_chi2_terms,
        "event_seq_ngrams": q_event_seq_ngrams,
        "pareto_frontier": q_pareto_frontier,
        "gini_concentration": q_gini_concentration,
        "benford_dq": q_benford_dq,
        "events_autocorrelation": q_events_autocorrelation,
        "changepoint_cusum": q_changepoint_cusum,
        "text_readability": q_text_readability,
        "vocab_growth": q_vocab_growth,
        "negative_sampling_table": q_negative_sampling_table,
        "rollup_incremental": q_rollup_incremental,
        "data_mixture_plan": q_data_mixture_plan,
        "mixture_sample": q_mixture_sample,
        "distinct_hll_monitor": q_distinct_hll_monitor,
        "event_user_overlap_kmv": q_event_user_overlap_kmv,
        "forget_users": q_forget_users,
        "events_debounce": q_events_debounce,
        "token_drift_cms": q_token_drift_cms,
        "dq_report": q_dq_report,
        "label_propagation": q_label_propagation,
        "length_bucket_efficiency": q_length_bucket_efficiency,
        "contrastive_negatives": q_contrastive_negatives,
        "type_distinct_hll": q_type_distinct_hll,
        "market_basket": q_market_basket,
        "audio_window_features": q_audio_window_features,
        "dedup_funnel_stats": q_dedup_funnel_stats,
        "join_size_cms": q_join_size_cms,
        "rake_keywords": q_rake_keywords,
        "doc_novelty": q_doc_novelty,
        "sampled_quantiles": q_sampled_quantiles,
        "grouped_sampled_quantiles": q_grouped_sampled_quantiles,
        "psi_drift": q_psi_drift,
        "bpe_fertility": q_bpe_fertility,
        "dup_clustering_coeff": q_dup_clustering_coeff,
        "props_key_profile": q_props_key_profile,
        "simhash_distance_curve": q_simhash_distance_curve,
        "cluster_purity": q_cluster_purity,
        "market_concentration_hhi": q_market_concentration_hhi,
        "ngram_diversity": q_ngram_diversity,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_stock": q11_important_stock,
        "q16_parts_supplier_rel": q16_parts_supplier_rel,
        "q20_excess_stock": q20_excess_stock,
        "dedup_threshold_curve": q_dedup_threshold_curve,
        "abc_analysis": q_abc_analysis,
        "user_event_entropy": q_user_event_entropy,
        "markov_surprisal": q_markov_surprisal,
        "nb_kappa": q_nb_kappa,
        "textrank_keywords": q_textrank_keywords,
        "token_burstiness": q_token_burstiness,
        "contamination_winnow": q_contamination_winnow,
        "sessionize_native": q_sessionize_native,
        "curriculum_order": q_curriculum_order,
        "mixture_temperature": q_mixture_temperature,
        "hypertable_rollup": q_hypertable_rollup,
        "wau_mau_stickiness": q_wau_mau_stickiness,
        "ship_latency_percentiles": q_ship_latency_percentiles,
        "session_depth_distribution": q_session_depth_distribution,
        "token_coverage_curve": q_token_coverage_curve,
        "dedup_bytes_saved": q_dedup_bytes_saved,
        "shard_skew_report": q_shard_skew_report,
        "orders_backlog_monthly": q_orders_backlog_monthly,
        "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
        "markov_stationary": q_markov_stationary,
        "padding_waste_curve": q_padding_waste_curve,
        "lsh_tuning_grid": q_lsh_tuning_grid,
        "dup_rate_by_length_band": q_dup_rate_by_length_band,
        "ivf_margin_profile": q_ivf_margin_profile,
        "minhash_recall": q_minhash_recall,
        "orders_rfm": q_orders_rfm,
        "events_gap_histogram": q_events_gap_histogram,
        "token_budget_cap": q_token_budget_cap,
        "events_anomaly": q_events_anomaly,
        "corpus_summary": q_corpus_summary,
        "pack_per_source": q_pack_per_source,
        "length_histogram": q_length_histogram,
        "near_dup_sources": q_near_dup_sources,
        "split_leakage": q_split_leakage,
        "multimodal_dedup": q_multimodal_dedup,
        "chunk_documents": q_chunk_documents,
        "minhash_incremental": q_minhash_incremental,
        "dedup_bloom_incremental": q_dedup_bloom_incremental,
        "dedup_bloom_sharded": q_dedup_bloom_sharded,
        "semantic_dedup": q_semantic_dedup,
        "duplicate_spans": q_duplicate_spans,
        "cap_per_domain": q_cap_per_domain,
        "token_entropy": q_token_entropy,
        "unigram_surprisal": q_unigram_surprisal,
        "shard_manifest": q_shard_manifest,
        "weighted_sample": q_weighted_sample,
        "table_profile": q_table_profile,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
    }


def oracle_sql() -> Dict[str, str]:
    return {
        "q1_pricing_summary": Q1_SQL,
        "q3_shipping_priority": Q3_SQL,
        "q5_region_revenue": Q5_SQL,
        "q6_forecast_revenue": Q6_SQL,
        "q_top_customers": Q_TOP_CUSTOMERS_SQL,
        "q_order_count_distribution": Q_ORDER_DIST_SQL,
        "q_big_orders_having": Q_BIG_ORDERS_SQL,
        "q_shipmode_priority": Q_SHIPMODE_SQL,
        "q_orders_priority": Q_ORDERS_PRIORITY_SQL,
        "q_events_hourly": Q_EVENTS_HOURLY_SQL,
        "q_events_moving_avg": Q_EVENTS_MOVING_AVG_SQL,
        "q_events_stats": Q_EVENTS_STATS_SQL,
        "q_pivot_event_values": Q_PIVOT_SQL,
        "q_sessionize": Q_SESSIONIZE_SQL,
        "q_setops_users": Q_SETOPS_SQL,
        "q_flatten_embeddings": Q_FLATTEN_EMB_SQL,
        "q_flatten_lineitem_wide": Q_FLATTEN_WIDE_SQL,
        "q_events_props_json": Q_EVENTS_PROPS_SQL,
        "q_semi_anti_parts": Q_SEMI_ANTI_SQL,
        "q_rollup_revenue": Q_ROLLUP_SQL,
        "q_price_quantiles": Q_QUANTILES_SQL,
        "q_stratified_sample": _stratified_sql(),
        "q_promo_revenue": Q_PROMO_SQL,
        "q_top_supplier": Q_TOP_SUPPLIER_SQL,
        "q_small_qty_revenue": Q_SMALL_QTY_SQL,
        "q_large_volume_customers": Q_LARGE_VOLUME_SQL,
        "q_disjunctive_join": Q_DISJUNCTIVE_SQL,
        "q_rich_idle_customers": Q_RICH_IDLE_SQL,
        "q_part_rank_ntile": Q_PART_RANK_SQL,
        "q_cube_revenue": Q_CUBE_SQL,
        "q_events_asof_click": Q_ASOF_SQL,
        "q4_order_priority": Q4_SQL,
        "q7_volume_shipping": Q7_SQL,
        "q8_market_share": Q8_SQL,
        "q10_returned_items": Q10_SQL,
        "q21_waiting_suppliers": Q21_SQL,
        "q_quantity_range_buckets": Q_RANGE_BUCKETS_SQL,
        "tfidf_top_terms": Q_TFIDF_SQL,
        "inverted_index": Q_INVERTED_INDEX_SQL,
        "token_heavy_hitters": Q_HEAVY_HITTERS_SQL,
        "dedup_exact": Q_DEDUP_EXACT_SQL,
        "dedup_jaccard": dedup.jaccard_pairs_duck(threshold=0.8),
        # minhash-LSH verifies candidates with the exact jaccard, so the
        # oracle is the exact pairwise join at the same threshold
        "dedup_minhash": dedup.jaccard_pairs_duck(threshold=0.7),
        "dedup_simhash": dedup.simhash_pairs_duck(max_hamming=2),
        "dedup_normalized": Q_DEDUP_NORM_SQL.format(
            norm=text.normalize_text_duck("text")
        ),
        "dedup_components": dedup.components_duck(
            dedup.jaccard_pairs_duck(threshold=0.7), iterations=4
        ),
        "dedup_components_converged": dedup.components_fixpoint_duck(
            dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "dedup_components_contraction": dedup.components_fixpoint_duck(
            dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "simhash_signatures": _simhash_signatures_duck(),
        # the default near-dup path is trained IVF + multiprobe; the
        # oracle replays the k-means training (decimal-exact means)
        "near_dup_embeddings": similarity.ivf_pairs_duck(
            threshold=0.4, n_probe=2, bucket_cap=256
        ),
        "near_dup_exact": similarity.cosine_pairs_duck(threshold=0.4),
        "ann_pairs": similarity.ann_pairs_duck(threshold=0.4, dim=64, n_planes=12),
        "ann_topk": similarity.topk_neighbors_duck(query_ids_below=10, k=5),
        "ann_ivf": similarity.ivf_pairs_duck(threshold=0.4),
        "ann_ivf_multiprobe": similarity.ivf_pairs_duck(threshold=0.4, n_probe=2),
        "ann_ivf_int8": similarity.ivf_pairs_duck(threshold=0.4, int8_verify=True),
        "ann_topk_ivf": similarity.topk_neighbors_ivf_duck(
            query_ids_below=10, k=5, n_probe=2
        ),
        "pq_codes": similarity.pq_codes_duck(
            m=PQ_M, n_codes=PQ_CODES, iterations=PQ_ITERS
        ),
        "ann_topk_ivfpq": similarity.topk_neighbors_ivfpq_duck(
            query_ids_below=10, k=5, m=PQ_M, n_codes=PQ_CODES,
            iterations=PQ_ITERS, coarse_iterations=COARSE_ITERS,
            n_probe=2, rerank=30,
        ),
        "ann_topk_pq": similarity.topk_neighbors_pq_duck(
            query_ids_below=10, k=5, m=PQ_M, n_codes=PQ_CODES,
            iterations=PQ_ITERS, rerank=30
        ),
        "ann_topk_ivf_int8": similarity.topk_neighbors_ivf_duck(
            query_ids_below=10, k=5, n_probe=2, int8_verify=True
        ),
        "embedding_quantize": similarity.quantize_embeddings_duck(),
        "embedding_projection": similarity.random_projection_duck(dim=64, out_dim=16),
        "label_centroids": Q_LABEL_CENTROIDS_SQL,
        "pack_chunks": pack.pack_chunks_duck(context_len=2048),
        "curation_pipeline": Q_CURATION_SQL.format(
            lang=text.lang_id_duck("text"),
            quality=text.quality_score_duck("text"),
            norm=text.normalize_text_duck("text"),
        ),
        "near_dup_text_join": Q_NEAR_DUP_TEXT_JOIN_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "q_window_analytics": Q_WINDOW_ANALYTICS_SQL,
        # q_approx_sketches: deliberately NO oracle — sketches are
        # engine-specific; error-bounded against exact answers in pytest
        "q_corpus_mix": Q_CORPUS_MIX_SQL.format(
            lang=text.lang_id_duck("text"),
            bucket=text.stable_sample_pct_duck("doc_id"),
        ),
        "dedup_incremental": Q_DEDUP_INCREMENTAL_SQL.format(
            norm=text.normalize_text_duck("text")
        ),
        "q_split_assign": Q_SPLIT_ASSIGN_SQL.format(
            bucket=text.stable_sample_pct_duck("doc_id")
        ),
        "q_events_funnel": Q_EVENTS_FUNNEL_SQL,
        "q_retention_cohorts": Q_RETENTION_SQL,
        "q_session_stats": Q_SESSION_STATS_SQL,
        "q_grouping_sets_revenue": Q_GROUPING_SETS_SQL,
        "q_events_props_variant": Q_EVENTS_PROPS_VARIANT_SQL,
        "text_stats": Q_TEXT_STATS_SQL.format(
            lang=text.lang_id_duck("text"), quality=text.quality_score_duck("text")
        ),
        "token_counts": Q_TOKEN_COUNTS_SQL.format(bpe=text.bpe_token_count_duck("text")),
        "doc_fingerprint": Q_FINGERPRINT_SQL.format(fp=text.fingerprint_duck()),
        "pii_scrub": Q_PII_SCRUB_SQL.format(
            scrub=text.scrub_pii_duck("r"), cnt=text.pii_count_duck("r")
        ),
        "contamination": Q_CONTAMINATION_SQL.format(
            sh=text.word_shingles_duck("string_split(text, ' ')", 4)
        ),
        "chunk_documents": pack.chunk_documents_duck(chunk_tokens=64, stride=48),
        "minhash_incremental": dedup.minhash_incremental_duck(
            split_id=250, threshold=0.7
        ),
        "dedup_bloom_incremental": dedup.bloom_dedup_incremental_duck(
            text.fingerprint_duck(), split_id=250
        ),
        "dedup_bloom_sharded": dedup.bloom_dedup_incremental_duck(
            text.fingerprint_duck(), split_id=250
        ),
        "semantic_dedup": similarity.semantic_dedup_duck(threshold=0.4),
        "duplicate_spans": dedup.duplicate_spans_duck(ngram=5, min_df=2),
        "cap_per_domain": Q_CAP_PER_DOMAIN_SQL,
        "token_entropy": Q_TOKEN_ENTROPY_SQL,
        "unigram_surprisal": Q_UNIGRAM_SURPRISAL_SQL,
        "shard_manifest": pack.shard_manifest_duck(shard_tokens=4096),
        "weighted_sample": Q_WEIGHTED_SAMPLE_SQL,
        "table_profile": Q_TABLE_PROFILE_SQL,
        "repetition_stats": Q_REPETITION_SQL.format(
            sh2=text.word_shingles_duck("toks", 2),
            sh3=text.word_shingles_duck("toks", 3),
        ),
        "quality_filter": text.gopher_filter_duck(),
        "paragraph_dedup": dedup.segment_dedup_duck(block_tokens=20),
        "paragraph_dedup_incremental": dedup.segment_dedup_incremental_duck(
            split_id=250, block_tokens=20
        ),
        "dsir_weights": Q_DSIR_SQL,
        "events_interval_join": Q_INTERVAL_JOIN_SQL,
        "key_skew_profile": Q_KEY_SKEW_SQL.format(n=10),
        "token_zipf": Q_TOKEN_ZIPF_SQL.format(n=50),
        "embedding_norms": Q_EMBEDDING_NORMS_SQL,
        "adaptive_length_filter": Q_ADAPTIVE_LENGTH_SQL,
        "dedup_containment": dedup.containment_pairs_duck(threshold=0.5),
        "dedup_cluster_sizes": """
with labels as (select * from ({fix}) f),
s as (select component, count(*) cluster_size from labels group by component)
select cluster_size::BIGINT cluster_size, count(*)::BIGINT n_clusters
from s group by cluster_size order by cluster_size
""".format(fix=dedup.components_fixpoint_duck(dedup.jaccard_pairs_duck(threshold=0.7))),
        "multimodal_dedup": Q_MULTIMODAL_DEDUP_SQL,
        "source_quality_report": Q_SOURCE_QUALITY_SQL.format(
            gopher=text.gopher_filter_duck()
        ),
        "snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
        "user_state_intervals": Q_USER_STATE_SQL,
        "event_transitions": Q_EVENT_TRANSITIONS_SQL,
        "pit_enrich": Q_PIT_ENRICH_SQL,
        "cdc_upsert": Q_CDC_UPSERT_SQL,
        "record_linkage": Q_RECORD_LINKAGE_SQL,
        "bm25_scores": Q_BM25_SQL,
        "embedding_drift": Q_EMBEDDING_DRIFT_SQL,
        "events_rolling_rate": Q_EVENTS_ROLLING_RATE_SQL,
        "event_paths": Q_EVENT_PATHS_SQL,
        "diversity_sample": _diversity_sample_duck(),
        "bpe_merges": bpe.bpe_duck(6),
        "bpe_token_counts": bpe.bpe_encode_duck(6),
        "record_linkage_incremental": Q_RECORD_LINKAGE_INC_SQL,
        "fk_integrity": Q_FK_INTEGRITY_SQL,
        "entity_clusters": _entity_clusters_duck(),
        "value_outliers": Q_VALUE_OUTLIERS_SQL,
        "corpus_fingerprint": Q_CORPUS_FINGERPRINT_SQL,
        "token_pmi": Q_TOKEN_PMI_SQL,
        "ann_recall": _ann_recall_duck(),
        "conversion_lag": Q_CONVERSION_LAG_SQL,
        "quality_deciles": _quality_deciles_duck(),
        "embedding_covariance": similarity.embedding_covariance_duck(),
        "dup_triangles": _dup_triangles_duck(),
        "label_bridges": Q_LABEL_BRIDGES_SQL,
        "dup_pagerank": _dup_pagerank_duck(),
        "dup_degree_stats": _dup_degree_stats_duck(),
        "dup_neighbor_jaccard": _dup_neighbor_jaccard_duck(),
        "dup_kcore": _dup_kcore_duck(),
        "winnow_dedup": _winnow_dedup_duck(),
        "k_anonymity": Q_K_ANONYMITY_SQL,
        "events_seasonal_baseline": Q_EVENTS_SEASONAL_BASELINE_SQL,
        "dedup_components_incremental": _dedup_components_inc_duck(),
        "leakage_safe_split": _leakage_safe_split_duck(),
        "minhash_recall": _minhash_recall_duck(),
        "orders_rfm": Q_ORDERS_RFM_SQL,
        "events_gap_histogram": Q_EVENTS_GAP_HIST_SQL,
        "curation_pipeline_v3": Q_CURATED_CTES.format(
            gopher=text.gopher_filter_duck(),
            segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
            norm=text.normalize_text_duck("text"),
            fixpoint=dedup.components_fixpoint_duck(
                "select doc_a, doc_b from lk_pairs"
            ).strip(),
        ) + Q_CURATION_V3_TAIL,
        "export_manifest": _export_manifest_duck(),
        "user_trajectory_pairs": Q_USER_TRAJECTORY_SQL,
        "token_cms_counts": _token_cms_counts_duck(),
        "zorder_layout": _zorder_layout_duck(),
        "lang_nb_confusion": Q_LANG_NB_SQL,
        "nb_roc": Q_NB_ROC_SQL,
        "km_retention": Q_KM_RETENTION_SQL,
        "source_term_js": Q_SOURCE_TERM_JS_SQL,
        "events_trend": Q_EVENTS_TREND_SQL,
        "nb_calibration": Q_NB_CALIBRATION_SQL,
        "chi2_terms": Q_CHI2_TERMS_SQL,
        "event_seq_ngrams": Q_EVENT_SEQ_NGRAMS_SQL,
        "pareto_frontier": Q_PARETO_FRONTIER_SQL,
        "gini_concentration": Q_GINI_CONCENTRATION_SQL,
        "benford_dq": Q_BENFORD_DQ_SQL,
        "events_autocorrelation": Q_EVENTS_AUTOCORRELATION_SQL,
        "changepoint_cusum": Q_CHANGEPOINT_CUSUM_SQL,
        "text_readability": Q_TEXT_READABILITY_SQL,
        "vocab_growth": Q_VOCAB_GROWTH_SQL,
        "negative_sampling_table": Q_NEGATIVE_SAMPLING_SQL,
        "rollup_incremental": Q_ROLLUP_INCREMENTAL_SQL,
        "data_mixture_plan": Q_DATA_MIXTURE_SQL,
        "mixture_sample": Q_MIXTURE_SAMPLE_SQL,
        "distinct_hll_monitor": _distinct_hll_duck(),
        "event_user_overlap_kmv": _event_user_overlap_kmv_duck(),
        "forget_users": Q_FORGET_USERS_SQL,
        "events_debounce": Q_EVENTS_DEBOUNCE_SQL,
        "token_drift_cms": _token_drift_cms_duck(),
        "dq_report": Q_DQ_REPORT_SQL,
        "label_propagation": _label_propagation_duck(),
        "length_bucket_efficiency": Q_LENGTH_BUCKET_SQL,
        "contrastive_negatives": Q_CONTRASTIVE_NEG_SQL,
        "type_distinct_hll": _type_distinct_hll_duck(),
        "market_basket": Q_MARKET_BASKET_SQL,
        "audio_window_features": Q_AUDIO_WINDOWS_SQL,
        "dedup_funnel_stats": _dedup_funnel_duck(),
        "join_size_cms": _join_size_cms_duck(),
        "rake_keywords": Q_RAKE_SQL,
        "doc_novelty": Q_DOC_NOVELTY_SQL,
        "sampled_quantiles": _sampled_quantiles_duck(),
        "grouped_sampled_quantiles": _grouped_sampled_quantiles_duck(),
        "psi_drift": Q_PSI_DRIFT_SQL,
        "bpe_fertility": _bpe_fertility_duck(),
        "dup_clustering_coeff": _dup_clustering_coeff_duck(),
        "props_key_profile": Q_PROPS_KEY_PROFILE_SQL,
        "simhash_distance_curve": _simhash_distance_curve_duck(),
        "cluster_purity": _cluster_purity_duck(),
        "market_concentration_hhi": Q_MARKET_HHI_SQL,
        "ngram_diversity": Q_NGRAM_DIVERSITY_SQL,
        "q2_min_cost_supplier": Q2_MIN_COST_SQL,
        "q9_product_profit": Q9_PROFIT_SQL,
        "q11_important_stock": Q11_STOCK_SQL,
        "q16_parts_supplier_rel": Q16_PARTS_SQL,
        "q20_excess_stock": Q20_EXCESS_SQL,
        "dedup_threshold_curve": _dedup_threshold_curve_duck(),
        "abc_analysis": Q_ABC_ANALYSIS_SQL,
        "user_event_entropy": Q_USER_EVENT_ENTROPY_SQL,
        "markov_surprisal": _markov_surprisal_duck(),
        "nb_kappa": _nb_kappa_duck(),
        "textrank_keywords": _textrank_duck(),
        "token_burstiness": _token_burstiness_duck(),
        "contamination_winnow": _contamination_winnow_duck(),
        "sessionize_native": Q_SESSIONIZE_NATIVE_SQL,
        "curriculum_order": _curriculum_duck(),
        "mixture_temperature": Q_MIXTURE_TEMPERATURE_SQL,
        "hypertable_rollup": Q_HYPERTABLE_SQL,
        "wau_mau_stickiness": Q_WAU_MAU_SQL,
        "ship_latency_percentiles": Q_SHIP_LATENCY_SQL,
        "session_depth_distribution": Q_SESSION_DEPTH_SQL,
        "token_coverage_curve": _token_coverage_duck(),
        "dedup_bytes_saved": _dedup_bytes_saved_duck(),
        "shard_skew_report": _shard_skew_duck(),
        "orders_backlog_monthly": Q_ORDERS_BACKLOG_SQL,
        "events_dow_hour_heatmap": Q_DOW_HOUR_SQL,
        "markov_stationary": _markov_stationary_duck(),
        "padding_waste_curve": _padding_waste_duck(),
        "lsh_tuning_grid": _lsh_tuning_sql(),
        "dup_rate_by_length_band": _dup_rate_by_length_band_duck(),
        "ivf_margin_profile": _ivf_margin_profile_duck(),
        "token_budget_cap": Q_TOKEN_BUDGET_SQL,
        "events_anomaly": Q_EVENTS_ANOMALY_SQL,
        "corpus_summary": Q_CORPUS_SUMMARY_SQL.format(
            quality=text.quality_score_duck("text")
        ),
        "pack_per_source": Q_PACK_PER_SOURCE_SQL,
        "length_histogram": Q_LENGTH_HISTOGRAM_SQL,
        "near_dup_sources": Q_NEAR_DUP_SOURCES_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "split_leakage": Q_SPLIT_LEAKAGE_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7),
            bucket=text.stable_sample_pct_duck("doc_id"),
        ),
        "curation_pipeline_v2": Q_CURATION_V2_SQL.format(
            gopher=text.gopher_filter_duck(),
            segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
            norm=text.normalize_text_duck("text"),
            quality=text.quality_score_duck("text"),
        ),
        "bigram_surprisal": Q_BIGRAM_SURPRISAL_SQL.format(
            sh2=text.word_shingles_duck("toks", 2),
            lam=0.75,
            one_m_lam=0.25,
        ),
        "dedup_canonical": dedup.canonical_docs_duck(
            dedup.jaccard_pairs_duck(threshold=0.7),
            text.quality_score_duck("text"),
        ),
        "multimodal_decode": Q_MULTIMODAL_SQL,
        "multimodal_features": Q_MULTIMODAL_FEATURES_SQL.format(
            dmax=multimodal.FEATURE_DIM - 1
        ),
        "multimodal_resize": Q_MULTIMODAL_RESIZE_SQL,
        "multimodal_frames": Q_MULTIMODAL_FRAMES_SQL,
    }
