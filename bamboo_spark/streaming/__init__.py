"""Structured Streaming surface (capability extension; the reference is
batch-only — SURVEY.md §1.3 end).

The flatten planner emits only stateless ``select``/``explode`` chains,
so it applies to streaming DataFrames unmodified (`flatten_stream`).
Windowed aggregation with watermarks covers the late-data rollup shape;
`sessionize_stream` shows the stateful custom-operator escape hatch
(applyInPandasWithState) the engine reserves for semantics Spark's
built-ins can't express.
"""

from bamboo_spark.streaming.core import (
    asof_attribute_stream,
    bloom_guard_stream,
    bm25_stream,
    cdc_upsert_stream,
    cms_stream,
    contamination_stream,
    dedup_stream_simhash,
    drift_stream,
    sessionize_stream_tws,
    transitions_stream,
    dedup_stream,
    debounce_stream,
    dq_stream,
    flatten_stream,
    funnel_stream,
    hll_stream,
    interval_attribution_stream,
    linkage_stream,
    minhash_pairs_stream,
    pack_stream,
    profile_stream,
    psi_stream,
    quality_gate_stream,
    sample_stream,
    segment_bloom_guard_stream,
    session_window_stream,
    sessionize_stream,
    windowed_counts,
)

__all__ = [
    "asof_attribute_stream",
    "bloom_guard_stream",
    "bm25_stream",
    "cdc_upsert_stream",
    "cms_stream",
    "contamination_stream",
    "dedup_stream",
    "debounce_stream",
    "dq_stream",
    "dedup_stream_simhash",
    "drift_stream",
    "flatten_stream",
    "funnel_stream",
    "hll_stream",
    "interval_attribution_stream",
    "linkage_stream",
    "minhash_pairs_stream",
    "pack_stream",
    "profile_stream",
    "psi_stream",
    "quality_gate_stream",
    "sample_stream",
    "segment_bloom_guard_stream",
    "session_window_stream",
    "sessionize_stream",
    "sessionize_stream_tws",
    "transitions_stream",
    "windowed_counts",
]
