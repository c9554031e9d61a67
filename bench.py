"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with a noop-format write
(counts can short-circuit column reads; noop cannot). A warmup run of a
trivial query absorbs JVM/codegen startup so per-query numbers measure
the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bamboo_spark import queries as _q
from bamboo_spark.session import get_spark

# headline set: scan+agg, joins, window, explode, dedup family,
# similarity, text analysis — the SURVEY §2 + north-star surface
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q_top_customers",
    "q_order_count_distribution",
    "q_big_orders_having",
    "q_shipmode_priority",
    "q_events_hourly",
    "q_events_moving_avg",
    "q_events_stats",
    "q_pivot_event_values",
    "q_sessionize",
    "q_orders_priority",
    "q_setops_users",
    "q_events_props_json",
    "q_flatten_embeddings",
    "q_flatten_lineitem_wide",
    "q_semi_anti_parts",
    "q_rollup_revenue",
    "q_price_quantiles",
    "q_stratified_sample",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_normalized",
    "dedup_components",
    "dedup_components_converged",
    "dedup_components_contraction",
    "simhash_signatures",
    "near_dup_embeddings",
    "near_dup_exact",
    "ann_pairs",
    "ann_topk",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "ann_ivf_int8",
    "ann_topk_ivf",
    "ann_topk_ivf_int8",
    "embedding_quantize",
    "embedding_projection",
    "label_centroids",
    "pack_chunks",
    "curation_pipeline",
    "near_dup_text_join",
    "q_window_analytics",
    "q_approx_sketches",
    "q_corpus_mix",
    "dedup_incremental",
    "q_split_assign",
    "q_events_funnel",
    "q_retention_cohorts",
    "q_session_stats",
    "q_grouping_sets_revenue",
    "q_events_props_variant",
    "text_stats",
    "token_counts",
    "doc_fingerprint",
    "pii_scrub",
    "contamination",
    "repetition_stats",
    "chunk_documents",
    "minhash_incremental",
    "dedup_bloom_incremental",
    "dedup_bloom_sharded",
    "semantic_dedup",
    "duplicate_spans",
    "cap_per_domain",
    "token_entropy",
    "unigram_surprisal",
    "shard_manifest",
    "weighted_sample",
    "table_profile",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "q_promo_revenue",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_large_volume_customers",
    "q_disjunctive_join",
    "q_rich_idle_customers",
    "q_part_rank_ntile",
    "q_cube_revenue",
    "q_events_asof_click",
    "q_quantity_range_buckets",
    "tfidf_top_terms",
    "inverted_index",
    "token_heavy_hitters",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "quality_filter",
    "dedup_canonical",
    "paragraph_dedup",
    "dsir_weights",
    "bigram_surprisal",
    "ann_topk_pq",
    "pq_codes",
    "events_interval_join",
    "key_skew_profile",
    "token_zipf",
    "curation_pipeline_v2",
    "embedding_norms",
    "paragraph_dedup_incremental",
    "adaptive_length_filter",
    "dedup_containment",
    "dedup_cluster_sizes",
    "multimodal_dedup",
    "source_quality_report",
    "snapshot_diff",
    "user_state_intervals",
    "ann_topk_ivfpq",
    "token_budget_cap",
    "events_anomaly",
    "corpus_summary",
    "near_dup_sources",
    "split_leakage",
    "pack_per_source",
    "length_histogram",
    "event_transitions",
    "pit_enrich",
    "cdc_upsert",
    "record_linkage",
    "bm25_scores",
    "embedding_drift",
    "events_rolling_rate",
    "event_paths",
    "diversity_sample",
    "bpe_merges",
    "bpe_token_counts",
    "record_linkage_incremental",
    "fk_integrity",
    "entity_clusters",
    "value_outliers",
    "corpus_fingerprint",
    "token_pmi",
    "ann_recall",
    "conversion_lag",
    "quality_deciles",
    "embedding_covariance",
    "embedding_pca",
    "dup_triangles",
    "label_bridges",
    "dup_pagerank",
    "dedup_components_incremental",
    "curation_pipeline_v3",
    "leakage_safe_split",
    "minhash_recall",
    "orders_rfm",
    "events_gap_histogram",
    "export_manifest",
    "user_trajectory_pairs",
    "token_cms_counts",
    "zorder_layout",
    "lang_nb_confusion",
    "rollup_incremental",
    "data_mixture_plan",
    "mixture_sample",
    "distinct_hll_monitor",
    "event_user_overlap_kmv",
    "forget_users",
    "events_debounce",
    "token_drift_cms",
    "dq_report",
    "label_propagation",
    "length_bucket_efficiency",
    "contrastive_negatives",
    "type_distinct_hll",
    "market_basket",
    "audio_window_features",
    "dedup_funnel_stats",
    "join_size_cms",
    "rake_keywords",
    "doc_novelty",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bamboo_spark_bench")

    # Bench the RAW registry (no per-query cache drain): within one
    # sweep, Spark's CacheManager substitutes an already-persisted
    # identical subplan into later queries (the dedup family shares its
    # hashed shingle sets this way) — that intra-sweep reuse is a real
    # pipeline win and is what this benchmark measures. The driver's
    # correctness gate uses the wrapped `queries()`, which drains caches
    # between queries so a full-registry sweep holds at most one
    # query's caches; bench records its mode in the payload so the two
    # numbers are never silently compared.
    registry = _q._queries_raw()

    # Warmup at the smallest SF: load the JVM machinery every timed
    # query shares — parser/analyzer/codegen classes, the Arrow +
    # Python-worker pool (mapInPandas/applyInPandas paths), shuffle and
    # broadcast plumbing, parquet footer caches. These are one-time
    # per-process costs that amortize to zero on any real corpus; at
    # sf0.1 they would otherwise be charged to whichever queries happen
    # to run first (measured: q1 3.7 s cold vs 0.4 s warm on the same
    # data). Timings below still include each query's OWN plan analysis
    # and codegen compile — only process-global warmup is excluded.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from bamboo_spark.operators import release_caches as _rc

    for wq in ("q1_pricing_summary", "q5_region_revenue", "simhash_signatures",
               "near_dup_embeddings", "pack_chunks"):
        try:
            materialize(registry[wq](spark, warm_dir))
        except Exception:
            pass
    _rc()

    release_caches = _rc

    # LOCKSTEP GUARD: the bench must cover the ENTIRE registry at HEAD.
    # BENCH_QUERIES is only an ordering preference (cache-coherent query
    # families run adjacent); anything the registry grew since is
    # appended automatically, and a stale name fails the sweep loudly.
    stale = [k for k in BENCH_QUERIES if k not in registry]
    if stale:
        raise SystemExit("bench: stale BENCH_QUERIES entries: %s" % stale)
    bench_list = BENCH_QUERIES + sorted(
        k for k in registry if k not in BENCH_QUERIES
    )
    assert len(bench_list) == len(registry), "bench/registry drift"

    cold = {}
    for name in bench_list:
        start = time.perf_counter()
        materialize(registry[name](spark, sf_dir))
        cold[name] = round(time.perf_counter() - start, 3)
    # release after the sweep, not per-query (see registry note above):
    # no lingering cached RDDs in a long-lived session, intra-sweep
    # CacheManager reuse preserved
    release_caches()

    # WARM RETIME PASS — the HEADLINE numbers (round 12, verdict ask):
    # the cold sweep's first-touch times carry intra-sweep cache
    # contention this box's noise band amplifies 3-5x (r11:
    # soft_dedup_weights 18.88 s cold vs 5.96 s warm with zero code
    # changes), which made every round's top-N a ghost hunt. Every
    # query above the floor is re-timed once, ISOLATED (caches drained
    # first, so nothing borrowed from a sibling's build), in the same
    # warm session; its headline number is the warm time. Sub-floor
    # queries keep their sweep time — sub-second cold/warm deltas are
    # noise, and the floor keeps the pass bounded. The cold sweep
    # (with its real intra-family cache-reuse wins) stays in
    # BENCH_DETAIL.json for anyone studying pipeline-mode behavior.
    RETIME_FLOOR_S = 1.0
    warm = {}
    for name, t in cold.items():
        if t <= RETIME_FLOOR_S:
            continue
        release_caches()
        start = time.perf_counter()
        materialize(registry[name](spark, sf_dir))
        warm[name] = round(time.perf_counter() - start, 3)
    release_caches()

    timings = {k: warm.get(k, v) for k, v in cold.items()}
    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # full per-query detail always lands in BENCH_DETAIL.json next to this
    # script; the stdout line must stay comfortably inside the driver's
    # 2000-char tail-capture window (round 2's 77-query line at 3 decimals
    # overflowed it), so it elides to the slowest queries when needed.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_sweep": cold,
                "warm_retimes": warm,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )

    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_val,
        "n_queries": len(timings),
        "timing_mode": "warm-isolated-retime-above-%.0fs" % RETIME_FLOOR_S,
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1700:
        slowest = dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:30]
        )
        payload["queries"] = {k: round(v, 2) for k, v in slowest.items()}
        payload["queries_elided"] = len(timings) - len(slowest)
        payload["detail_file"] = "BENCH_DETAIL.json"
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
