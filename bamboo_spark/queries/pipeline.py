"""Training-data pipeline composition: curation, mixture/curriculum, packing/chunking, sampling/capping, splits, export manifests, layout.

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


STRATA_RATES = {"src0": 80, "src1": 50, "src2": 20}  # keep-% per source stratum


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the corpus-mixing operator of
    a training-data pipeline: keep N% per source stratum, hash-stable
    (md5 of doc_id) so the sample is reproducible across runs/engines
    and can be diffed or joined back. Narrow projection + filter: no
    shuffle except the cosmetic sort; at 100 TB this runs at scan speed.
    Unknown strata default to keep-10%."""
    d = load(spark, sf_dir, "documents")
    bucket = text.stable_sample_pct("doc_id")
    rate = F.lit(10)
    for src, pct in STRATA_RATES.items():
        rate = F.when(F.col("source") == src, F.lit(pct)).otherwise(rate)
    return (
        d.where(bucket < rate)
        .select("doc_id", "source", bucket.alias("bucket"))
    )


def _stratified_sql() -> str:
    cases = " ".join(
        "when source = '%s' then %d" % (s, p) for s, p in STRATA_RATES.items()
    )
    b = text.stable_sample_pct_duck("doc_id")
    return (
        "select doc_id, source, %s bucket from documents "
        "where %s < (case %s else 10 end) order by doc_id" % (b, b, cases)
    )


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest: docs -> fixed-token-budget output shards via the
    distributed two-phase prefix scan (no global window; only P shard
    totals reach the driver) - the writer-side plan for emitting the
    corpus as N-token files."""
    d = load(spark, sf_dir, "documents")
    return pack.shard_manifest(d, shard_tokens=4096)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per stratum
    (Efraimidis-Spirakis A-ES): key = ln(u)/w with u derived from
    md5(doc_id) - longer documents (w = n_chars) are proportionally
    likelier to survive, the sample is reproducible across runs and
    engines, and selection is one scan-speed projection + a per-stratum
    top-k window (no rand(), no global sort). The standard
    quality/length-weighted subsampling shape."""
    d = load(spark, sf_dir, "documents")
    u = (
        "(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) + 1)"
        " / 4294967297.0"
    )
    key = "round(ln(%s) / cast(n_chars as double), 9)" % u
    staged = d.selectExpr("doc_id", "source", "n_chars", "%s as es_key" % key)
    return scale.ranked_head(
        staged,
        "source",
        [F.col("es_key").desc(), F.col("doc_id").asc()],
        cap=5,
    ).select("source", "rank", "doc_id", "n_chars", "es_key")


Q_WEIGHTED_SAMPLE_SQL = """
with staged as (
  select doc_id, source, n_chars,
         round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
                  / 4294967297.0) / n_chars::DOUBLE, 9) es_key
  from documents
)
select source, rank, doc_id, n_chars, es_key from (
  select *, row_number() over (partition by source
                               order by es_key desc, doc_id asc) rank
  from staged
) where rank <= 5
order by source, rank
"""


def q_cap_per_domain(
    spark: SparkSession, sf_dir: str, hot_min: int | None = None
) -> DataFrame:
    """Per-source head-capping (C4/RefinedWeb-style domain capping): keep
    a deterministic hash-ordered sample of at most 10 docs per source so
    head domains cannot dominate the training mix. Rank order is
    md5-derived, so the kept set is unbiased, reproducible, and
    engine-independent.

    Scale: ``scale.ranked_head`` — the rank filter plans as a Partial
    WindowGroupLimit BELOW the shuffle (per-partition partial top-k),
    so a hot source ships at most cap x map_partitions rows to its
    reducer, never its raw count (plan-pinned, tests/test_plans.py).
    ``hot_min`` additionally engages the exact two-pass hash-range
    pre-filter (``scale.hash_ranked_head``) for keys beyond it — same
    output, proven on a skewed fixture in tests/test_scale.py."""
    d = load(spark, sf_dir, "documents")
    rk = text.md5_int60_sql("cast(doc_id as string)")
    staged = d.select("source", "doc_id").withColumn("_rk", F.expr(rk))
    return scale.hash_ranked_head(
        staged,
        "source",
        "_rk",
        hash_max=2**60,
        cap=10,
        hot_min=hot_min,
        tiebreak_cols=["doc_id"],
    ).select("source", "rank", "doc_id")


Q_CAP_PER_DOMAIN_SQL = """
select source, rank, doc_id from (
  select source, doc_id,
         row_number() over (partition by source
                            order by {rk} asc, doc_id asc)::BIGINT rank
  from documents
) where rank <= 10
""".format(rk="(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)")


def q_token_budget_cap(
    spark: SparkSession, sf_dir: str, hot_min: int | None = None
) -> DataFrame:
    """Token-BUDGET domain capping: keep a deterministic hash-ordered
    slice of each source worth ≤ ~3000 training tokens (first doc past
    the line still kept — budget is on the exclusive prefix). The mix
    knob that actually matters downstream is tokens, not doc counts.
    ``hot_min`` engages the exact weighted hash-range pre-filter so a
    billion-doc source never funnels through one window sort."""
    d = load(spark, sf_dir, "documents")
    rk = text.md5_int60_sql("cast(doc_id as string)")
    staged = d.selectExpr(
        "source",
        "doc_id",
        "cast(size(split(text, ' ')) as bigint) as n_tokens",
    ).withColumn("_rk", F.expr(rk))
    return scale.budget_head(
        staged,
        "source",
        "_rk",
        "n_tokens",
        budget=3000,
        hot_min=hot_min,
        hash_max=2**60,
        tiebreak_cols=["doc_id"],
        cum_col="cum_tokens",
    ).select("source", "doc_id", "n_tokens", "cum_tokens")


Q_TOKEN_BUDGET_SQL = """
select source, doc_id, n_tokens, cum_tokens from (
  select source, doc_id, n_tokens,
         sum(n_tokens) over (partition by source
                             order by {rk} asc, doc_id asc
                             rows unbounded preceding)::BIGINT cum_tokens
  from (
    select source, doc_id,
           len(string_split(text, ' '))::BIGINT n_tokens
    from documents
  )
) where cum_tokens - n_tokens < 3000
order by source, doc_id
""".format(rk="(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)")


def q_pack_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sequence packing: each source lays out its own docs
    and cuts its own 512-token context windows (chunk ids restart per
    source) — the per-dataset shard-building shape. Fully distributed:
    the per-(source, shard) totals prefix-sum in a ≤``shards``-row
    window per source; NOTHING reaches the driver (the global packer's
    P-row driver fold disappears)."""
    d = load(spark, sf_dir, "documents")
    return pack.pack_chunks_per_key(d, "source", context_len=512)


Q_PACK_PER_SOURCE_SQL = """
with c as (
  select source, doc_id, len(string_split(text, ' '))::BIGINT n_tokens
  from documents
),
o as (
  select source, doc_id, n_tokens,
         coalesce(sum(n_tokens) over (partition by source order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::BIGINT
           start_offset
  from c
)
select source, doc_id, n_tokens, start_offset,
       (start_offset // 512)::BIGINT chunk_id,
       ((start_offset + n_tokens - 1) // 512)::BIGINT last_chunk_id,
       ((start_offset // 512) != ((start_offset + n_tokens - 1) // 512))::BIGINT
         straddles
from o order by source, doc_id
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (context-window prep ahead of
    tokenization): pure split + sequence + posexplode + slice - one
    scan, no shuffle, parallel at any corpus size."""
    d = load(spark, sf_dir, "documents")
    return pack.chunk_documents(d, chunk_tokens=64, stride=48)


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split leakage audit: near-dup pairs that CROSS the
    deterministic train/val/test boundary — each held-out doc paired
    with its training-set near-duplicate and the similarity. A non-empty
    result means the benchmark leaks: the held-out doc's content is
    effectively in the training mix and its eval number is
    memorization, not generalization. Composes the hash-stable split
    (no rand(), docs never migrate) with the MinHash-LSH + exact-verify
    pair path; the split labels are a scan-speed projection joined onto
    the (small by construction) pair set."""
    d = load(spark, sf_dir, "documents")
    b = text.stable_sample_pct("doc_id")
    labeled = d.select(
        "doc_id",
        F.when(b < 90, F.lit("train")).otherwise(F.lit("heldout")).alias("split"),
    )
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    j = pairs.join(
        labeled.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
        "doc_a",
    ).join(
        labeled.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
        "doc_b",
    )
    leaked = j.where(F.col("split_a") != F.col("split_b"))
    return leaked.select(
        F.when(F.col("split_a") == "heldout", F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("heldout_doc"),
        F.when(F.col("split_a") == "heldout", F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("train_doc"),
        "jaccard",
    )


Q_SPLIT_LEAKAGE_SQL = """
with p as ({pairs}),
lab as (
  select doc_id,
         case when {bucket} < 90 then 'train' else 'heldout' end split
  from documents
)
select case when a.split = 'heldout' then p.doc_a else p.doc_b end heldout_doc,
       case when a.split = 'heldout' then p.doc_b else p.doc_a end train_doc,
       p.jaccard
from p
join lab a on a.doc_id = p.doc_a
join lab b on b.doc_id = p.doc_b
where a.split != b.split
order by heldout_doc, train_doc
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from the hash-stable md5
    bucket (90/5/5): reproducible across runs/engines, no rand(), and a
    document can never migrate between splits when the corpus grows —
    the property leakage-free eval requires. One scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    b = text.stable_sample_pct("doc_id")
    split = (
        F.when(b < 90, F.lit("train")).when(b < 95, F.lit("val")).otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split"))


Q_SPLIT_ASSIGN_SQL = """
select doc_id,
       case when {bucket} < 90 then 'train'
            when {bucket} < 95 then 'val'
            else 'test' end split
from documents
"""


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): global token offsets via a
    distributed two-phase prefix scan — per-shard windows + P-row shard
    bases — never a single-partition global window. The oracle computes
    the same offsets with one global window; outputs match bit-for-bit
    (integer arithmetic)."""
    d = load(spark, sf_dir, "documents")
    return pack.pack_chunks(d, context_len=2048)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pass: quality scoring → threshold filter →
    normalized-text dedup (keep lowest id) — the cleaning pipeline a
    training corpus runs before tokenization, as ONE plan: a single
    scan-side projection computes all stats, one shuffle deduplicates."""
    d = load(spark, sf_dir, "documents")
    staged = d.selectExpr("doc_id", "text", "split(text, ' ') as __toks")
    scored = staged.select(
        "doc_id",
        "text",
        F.expr("cast(size(__toks) as bigint)").alias("n_tokens"),
        F.expr(text.lang_id_sql("__toks")).alias("lang_pred"),
        F.expr(text.quality_score_sql("__toks")).alias("quality"),
    ).where(F.col("quality") >= 0.4)
    w = Window.partitionBy(text.normalize_text("text")).orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "lang_pred", "quality")
    )


Q_CURATION_SQL = """
with s as (
  select doc_id, text,
         len(string_split(text, ' '))::BIGINT n_tokens,
         {lang} lang_pred,
         {quality} quality
  from documents
),
f as (select * from s where quality >= 0.4),
d as (
  select *, row_number() over (partition by {norm} order by doc_id) rn from f
)
select doc_id, n_tokens, lang_pred, quality from d where rn = 1
"""


def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 curation pipeline, composed end-to-end as ONE plan:
    Gopher-rules quality filter (scan-speed, zero shuffle) →
    paragraph-level exact dedup with reassembly (digest-keyed,
    map-combined) → normalized-text exact dedup over the REASSEMBLED
    text (catches docs that became identical once their boilerplate
    segments were stripped). Output per surviving doc: token count of
    the cleaned text, how many segments survived, and the re-scored
    quality. Every stage is the registry operator itself, so the oracle
    is the same three stages composed in SQL."""
    d = load(spark, sf_dir, "documents")
    flags = text.gopher_filter(d)
    kept = d.join(flags.where(F.col("keep") == 1).select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    sd = dedup.segment_dedup(kept, block_tokens=20)
    surv = sd.where(F.col("n_kept") > 0).selectExpr(
        "doc_id", "dedup_text as text", "n_kept"
    )
    w = Window.partitionBy(text.normalize_text("text")).orderBy("doc_id")
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
            "n_kept",
            text.quality_score("text").alias("quality"),
        )
    )


Q_CURATION_V2_SQL = """
with g as ({gopher}),
kept as (
  select d.doc_id, d.text from documents d join g using (doc_id)
  where g.keep = 1
),
sd as ({segment}),
surv as (
  select doc_id, dedup_text as "text", n_kept from sd where n_kept > 0
),
n as (
  select *, row_number() over (partition by {norm} order by doc_id) rn
  from surv
)
select doc_id, len(string_split(text, ' '))::BIGINT n_tokens, n_kept,
       {quality} quality
from n where rn = 1 order by doc_id
"""


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus subsampling: IVF-cluster the embedding
    space (shared quantizer) and keep a deterministic hash-ordered head
    of ≤ 4 vectors per cluster — the semantic-diversity counterpart of
    per-domain capping (a uniform sample over-represents dense modes;
    this caps every semantic neighborhood equally, the SemDeDup-paper
    sampling companion).

    Scale: assignment is a broadcast-centroid GEMM (no shuffle beyond
    the agg), and the per-cluster head is ``scale.hash_ranked_head`` —
    partial top-k below the shuffle, so a megacluster ships cap ×
    map_partitions rows, never its raw size."""
    e = load(spark, sf_dir, "embeddings")
    cents = ivf_quantizer(spark, sf_dir)
    assign = similarity.ivf_assign(e, cents, n_probe=1)
    rk = text.md5_int60_sql("cast(vec_id as string)")
    staged = assign.withColumn("_rk", F.expr(rk))
    return (
        scale.hash_ranked_head(
            staged,
            "centroid",
            "_rk",
            hash_max=2**60,
            cap=4,
            tiebreak_cols=["vec_id"],
        )
        .select(
            F.col("centroid").cast("bigint").alias("centroid"),
            "rank",
            "vec_id",
        )
        .orderBy("centroid", "rank")
    )


def _diversity_sample_duck() -> str:
    return (
        similarity._kmeans_duck_ctes(None, COARSE_ITERS)
        + """,
scored as (
  select e.vec_id, c.cid,
         round(list_dot_product(e.v, c.cv) / (e.n * c.cn), 6) s
  from e cross join cf c
),
assign as (
  select vec_id, cid from (
    select *, row_number() over (partition by vec_id
                                 order by s desc, cid asc) r
    from scored
  ) where r <= 1
)
select cid::BIGINT centroid, rank, vec_id from (
  select cid, vec_id,
         row_number() over (
           partition by cid
           order by (('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT) asc,
                    vec_id asc)::BIGINT rank
  from assign
) where rank <= 4 order by centroid, rank
"""
    )


_CURATED_CACHE: Dict[str, DataFrame] = {}


def _curated_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared master-curation chain (v3 stages through golden
    records): Gopher filter → paragraph dedup with reassembly →
    normalized exact dedup → fuzzy-title entity resolution → keep the
    min-id representative per entity. Returns (doc_id, text).

    Memoized per corpus dir (the `ivf_quantizer` discipline): both
    consumers — ``curation_pipeline_v3`` and ``export_manifest`` — run
    the SAME chain, and its most expensive stage (the eagerly-executed
    ER fixpoint inside ``connected_components_converged``) lives in
    checkpointed RDDs on the returned plan, so rebuilding the plan per
    consumer re-runs the whole fixpoint for bit-identical results.
    Deterministic chain → reuse is result-invisible; the oracle replays
    every stage regardless."""
    key = sf_dir.rstrip("/")
    got = _CURATED_CACHE.get(key)
    if got is not None:
        return got
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents")
    flags = text.gopher_filter(d)
    kept = d.join(
        flags.where(F.col("keep") == 1).select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    sd = dedup.segment_dedup(kept, block_tokens=20)
    surv = sd.where(F.col("n_kept") > 0).selectExpr(
        "doc_id", "dedup_text as text"
    )
    # min-id representative per normalized key as a MAX-STRUCT AGGREGATE
    # (the engine's canonical argmax shape, pinned at test_plans.py) —
    # map-side combinable, no per-key sort, unlike a row_number window.
    cleaned = _tracked_persist(
        surv.groupBy(text.normalize_text("text").alias("_nk"))
        .agg(F.min(F.struct("doc_id", "text")).alias("_rep"))
        .select(F.col("_rep.doc_id").alias("doc_id"), F.col("_rep.text").alias("text"))
    )
    keyed = cleaned.select(
        "doc_id", F.lower(F.substring("text", 1, 32)).alias("tk")
    )
    pairs = linkage.edit_distance_pairs(keyed, "doc_id", "tk", max_dist=2).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = dedup.connected_components_converged(pairs)
    drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    out = cleaned.join(drop, "doc_id", "left_anti")
    _CURATED_CACHE[key] = out
    return out


def q_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full master pipeline, composed end-to-end: Gopher quality
    filter → paragraph dedup with reassembly → normalized exact dedup →
    fuzzy-title ENTITY RESOLUTION over the cleaned text (PassJoin
    edit-distance pairs d≤2 on 32-char keys → converged components →
    keep the min-id golden record per entity) → per-source corpus
    report (docs kept, total tokens). Six engine operators as ONE
    lazily-composed program; the oracle replays every stage (brute
    pairs + recursive-CTE fixpoint for the ER stage), so the
    composition — not just the parts — is value-gated."""
    from bamboo_spark.operators import linkage

    final = _curated_final(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        final.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr("size(split(text, ' '))"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .orderBy("source")
    )


Q_CURATED_CTES = """
with g as ({gopher}),
kept as (
  select d.doc_id, d.text from documents d join g using (doc_id)
  where g.keep = 1
),
sd as ({segment}),
surv as (
  select doc_id, dedup_text as "text" from sd where n_kept > 0
),
nrm as (
  select *, row_number() over (partition by {norm} order by doc_id) rn
  from surv
),
cleaned as (select doc_id, text from nrm where rn = 1),
keyed as (
  select doc_id, lower(substring(text, 1, 32)) tk,
         length(lower(substring(text, 1, 32))) ln
  from cleaned
),
lk_pairs as (
  select a.doc_id doc_a, b.doc_id doc_b
  from keyed a join keyed b
    on a.doc_id < b.doc_id and abs(a.ln - b.ln) <= 2
  where levenshtein(a.tk, b.tk) <= 2
),
comp as materialized (
{fixpoint}
),
dropd as (select doc_id from comp where doc_id != component),
final as (
  select c.doc_id, c.text from cleaned c
  where c.doc_id not in (select doc_id from dropd)
)"""


Q_CURATION_V3_TAIL = """
select d.source, count(*)::BIGINT n_docs,
       sum(len(string_split(f.text, ' ')))::BIGINT n_tokens
from final f join documents d using (doc_id)
group by d.source order by d.source
"""


def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full export program: master curation (v3 golden records) →
    hash-stable 90% train slice → fixed-token-budget shard manifest
    (2048-token output files) — the last mile of a training-data
    pipeline, from raw corpus to "which file does each doc land in and
    at what offset", as ONE lazily-composed plan. The manifest's prefix
    scan is the distributed two-phase form (P shard totals to the
    driver, no global window); the oracle replays every stage including
    the ER fixpoint and the global-window manifest."""
    final = _curated_final(spark, sf_dir)
    train = final.where(text.stable_sample_pct("doc_id") < 90)
    return pack.shard_manifest(train, shard_tokens=2048).orderBy("doc_id")


def _export_manifest_duck() -> str:
    ctes = Q_CURATED_CTES.format(
        gopher=text.gopher_filter_duck(),
        segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
        norm=text.normalize_text_duck("text"),
        fixpoint=dedup.components_fixpoint_duck(
            "select doc_a, doc_b from lk_pairs"
        ).strip(),
    )
    mani = pack.shard_manifest_duck(shard_tokens=2048, src="train").strip()
    assert mani.startswith("with ")
    return (
        ctes
        + """,
train as (
  select doc_id, text from final where {b} < 90
),
""".format(b=text.stable_sample_pct_duck("doc_id"))
        + mani[len("with "):]
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test assignment: the split hash is taken
    on the DUPLICATE-CLUSTER representative, not the doc — every member
    of a near-dup cluster (MinHash pairs → converged components) lands
    in the same split, so the leakage ``split_leakage`` audits is
    structurally impossible. Singletons hash on themselves; the 90/5/5
    bucketing is the same md5-stable rule as ``q_split_assign``, so
    growing the corpus never migrates an existing cluster.

    Scale: pairs + components are the existing operators; the split
    itself is one equi-join on ``doc_id`` plus a scan-speed projection
    over coalesce(component, doc_id). The component map has one row per
    doc that appears in ANY near-dup pair — data-sized on a web corpus —
    so the join strategy is deliberately left to AQE: it broadcasts only
    when the map actually fits, and shuffles otherwise."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.minhash_lsh_pairs(d, threshold=0.7).select("doc_a", "doc_b")
    )
    comp = dedup.connected_components_converged(pairs)
    anchored = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "split_key",
            F.coalesce(F.col("component"), F.col("doc_id")),
        )
        .withColumn("_b", text.stable_sample_pct("split_key"))
    )
    split = (
        F.when(F.col("_b") < 90, F.lit("train"))
        .when(F.col("_b") < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return anchored.select(
        "doc_id", "split_key", split.alias("split")
    ).orderBy("doc_id")


def _leakage_safe_split_duck() -> str:
    fix = dedup.components_fixpoint_duck(
        dedup.jaccard_pairs_duck(threshold=0.7).strip().rstrip(";")
    ).strip()
    b = text.stable_sample_pct_duck("split_key")
    return """
with comp as materialized (
{fix}
),
anch as (
  select d.doc_id, coalesce(c.component, d.doc_id) split_key
  from documents d left join comp c using (doc_id)
)
select doc_id, split_key,
       case when {b} < 90 then 'train'
            when {b} < 95 then 'val' else 'test' end split
from anch order by doc_id
""".format(fix=fix, b=b)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data-layout planner: Morton-interleave (user_id, event
    time) into a 32-bit z-key, assign each row to one of 256 files by
    the key's top 8 bits, and emit the per-file manifest (row count +
    min/max of BOTH dimensions). Because the z-curve shares bits
    round-robin, every file covers a tight rectangle in (user, time) —
    a scan filtering on EITHER column prunes most files from the
    manifest alone. That is the OPTIMIZE ZORDER layout pass a 100 TB
    table runs before heavy multi-dimension read traffic; a plain sort
    clusters only its leading column.

    Scale: one 1-row stats aggregate broadcast back, then scan-speed
    integer bit math for key + file assignment (no UDF, codegen-
    friendly), one 256-key aggregate for the manifest. The real write
    would range-partition on zkey; the manifest here IS the proof of
    layout quality and the oracle replays the keys bit-for-bit."""
    from bamboo_spark.operators import scale

    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    stats = e.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("us").alias("t_lo"),
        F.max("us").alias("t_hi"),
    )
    # the 32-step bit-interleave expression below is the heavy part and
    # fuses into the scan stage — spread a single-split scan first
    # (no-op on parallel input; guide §2.5)
    keyed = scale.fan_out(e, "event_id").crossJoin(F.broadcast(stats)).withColumn(
        "zkey",
        scale.zorder_key(
            ["user_id", "us"], ["u_lo", "t_lo"], ["u_hi", "t_hi"], bits=16
        ),
    )
    return (
        keyed.withColumn("file_id", F.expr("cast(shiftright(zkey, 24) as int)"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("user_id").cast("bigint").alias("u_min"),
            F.max("user_id").cast("bigint").alias("u_max"),
            F.min("us").cast("bigint").alias("t_min"),
            F.max("us").cast("bigint").alias("t_max"),
        )
        .orderBy("file_id")
    )


def _zorder_layout_duck() -> str:
    from bamboo_spark.operators import scale

    z = scale.zorder_key_duck(
        ["user_id", "us"], ["u_lo", "t_lo"], ["u_hi", "t_hi"], bits=16
    )
    return """
with e as (
  select event_id, user_id, epoch_us(ts) us from events
),
s as (
  select min(user_id) u_lo, max(user_id) u_hi,
         min(us) t_lo, max(us) t_hi from e
),
k as (select user_id, us, {z} zkey from e cross join s)
select (zkey >> 24)::INT file_id, count(*)::BIGINT n_rows,
       min(user_id)::BIGINT u_min, max(user_id)::BIGINT u_max,
       min(us)::BIGINT t_min, max(us)::BIGINT t_max
from k group by 1 order by 1
""".format(z=z)


def q_negative_sampling_table(
    spark: SparkSession, sf_dir: str, top_v: int = 1000
) -> DataFrame:
    """Word2vec-style negative-sampling table: the ``top_v`` most
    frequent tokens with sampling probability proportional to
    count^0.75 (the Mikolov smoothing that keeps rare-word negatives
    reachable), plus each token's half-open cumulative range in
    micro-units — ready for "draw u ~ uniform(0, total); binary-search
    the range" samplers on any engine.

    Determinism: counts are exact integers; count^0.75 is one pow on
    identical doubles, quantized to integer micro-units BEFORE the
    normalizing sum and prefix ranges (quantize-then-sum), so ranges
    are exact integers; rank ties break on the token string.

    Scale shape: one map-combined token count is the only data-sized
    shuffle; the top-V cap is a TakeOrdered (never a global sort); the
    prefix window runs over the V-row table only."""
    d = load(spark, sf_dir, "documents").select("text")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(top_v)
    )
    wgt = counts.select(
        "t",
        "n",
        F.round(F.pow(F.col("n").cast("double"), F.lit(0.75)) * 1e6, 0)
        .cast("long")
        .alias("wu"),
    )
    tot = wgt.agg(F.sum("wu").alias("_tot"))
    wr = Window.orderBy(F.col("n").desc(), "t")
    wcum = Window.orderBy(F.col("n").desc(), "t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        wgt.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(wr).cast("bigint").alias("rank"),
            F.col("t").alias("token"),
            "n",
            F.round(F.col("wu").cast("double") / F.col("_tot"), 6).alias(
                "p"
            ),
            F.coalesce(F.sum("wu").over(wcum), F.lit(0))
            .cast("bigint")
            .alias("cum_lo"),
            (
                F.coalesce(F.sum("wu").over(wcum), F.lit(0)) + F.col("wu")
            )
            .cast("bigint")
            .alias("cum_hi"),
        )
        .orderBy("rank")
    )


Q_NEGATIVE_SAMPLING_SQL = """
with tok as (
  select t from (
    select unnest(string_split(text, ' ')) t from documents
  ) where t <> ''
),
counts as (
  select t, count(*)::BIGINT n from tok group by t
  order by n desc, t limit 1000
),
wgt as (
  select t, n, round(pow(n::DOUBLE, 0.75) * 1e6, 0)::BIGINT wu from counts
),
tot as (select sum(wu) tw from wgt),
ranked as (
  select row_number() over (order by n desc, t) rnk, t, n, wu,
         coalesce(sum(wu) over (order by n desc, t
                                rows between unbounded preceding
                                and 1 preceding), 0) cum_lo
  from wgt
)
select rnk::BIGINT rank, t token, n,
       round(wu::DOUBLE / tot.tw, 6) p,
       cum_lo::BIGINT cum_lo, (cum_lo + wu)::BIGINT cum_hi
from ranked cross join tot order by rank
"""


def q_data_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planner: allocate a global token budget (10% of
    the corpus here) across sources by TEMPERATURE-SCALED size
    (weight ∝ sqrt(n_tokens), the multilingual-sampling alpha=0.5 rule
    that up-weights small sources against head domination), capped at
    each source's available tokens. Emits per source: docs, tokens, the
    integer weight, the allocated token budget, and the sampling rate a
    downstream `stable_sample_pct` filter would apply.

    All integer math: weights quantize to micro-units (sqrt is IEEE
    correctly-rounded, so identical in both engines), the allocation is
    exact integer proportional division in decimal(38,0) — no float
    accumulation anywhere, so the plan is bit-stable.

    Scale: one map-combined per-source aggregate (sources are few by
    definition), two 1-row scalar broadcasts. The plan's sampling rates
    feed the existing hash-stable samplers — planner and executor stay
    decoupled exactly like a real curation run."""
    d = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("tk")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tk").cast("bigint").alias("n_tokens"),
    )
    per = per.withColumn(
        "weight_u",
        F.expr("cast(round(sqrt(cast(n_tokens as double)) * 1e6, 0) as bigint)"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_nt"), F.sum("weight_u").alias("_sw")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight_u",
            F.expr(
                "least(cast((cast(_nt div 10 as decimal(38,0)) * weight_u)"
                " div _sw as bigint), n_tokens)"
            ).alias("alloc_tokens"),
        )
        .withColumn(
            "sample_rate",
            F.round(
                F.col("alloc_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


Q_DATA_MIXTURE_SQL = """
with per as (
  select source, count(*)::BIGINT n_docs,
         sum(len(string_split(text, ' ')))::BIGINT n_tokens
  from documents group by source
),
w as (
  select *, round(sqrt(n_tokens::DOUBLE) * 1e6, 0)::BIGINT weight_u from per
),
tot as (select sum(n_tokens) _nt, sum(weight_u) _sw from w)
select source, n_docs, n_tokens, weight_u,
       least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
             n_tokens) alloc_tokens,
       round(least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
                   n_tokens)::DOUBLE / n_tokens::DOUBLE, 6) sample_rate
from w cross join tot
order by source
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner → executor composition: take `data_mixture_plan`'s
    per-source token allocations, convert each to a parts-per-million
    sampling rate, apply it with the md5-stable document sampler
    (ppm-grained twin of ``stable_sample_pct``), and report achieved
    docs/tokens against the allocation. The whole mixture build — size
    stats, temperature weights, integer budget split, deterministic
    per-doc keep/drop — is ONE lazy plan, and the oracle replays every
    stage including which exact documents survive.

    Scale: the plan side is #sources rows; the executor side is a
    scan-speed hash filter (the same rows survive on any cluster, any
    partitioning, any run — resumable and diffable by construction).
    Achieved tokens track the allocation only in expectation
    (sampling is by doc, the budget is tokens), which is exactly how a
    real mixture run behaves — the report makes the drift visible."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("tk")
    )
    plan = q_data_mixture_plan(spark, sf_dir).select(
        "source", "n_tokens", "alloc_tokens"
    )
    rated = plan.withColumn(
        "rate_ppm",
        F.expr(
            "cast((cast(alloc_tokens as decimal(38,0)) * 1000000)"
            " div n_tokens as bigint)"
        ),
    )
    bucket = F.expr(
        "pmod(cast(conv(substr(md5(concat('mix:', cast(doc_id as string))),"
        " 1, 8), 16, 10) as bigint), 1000000)"
    )
    kept = (
        d.join(F.broadcast(rated), "source")
        .where(bucket < F.col("rate_ppm"))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum("tk").cast("bigint").alias("n_tokens_kept"),
            F.max("alloc_tokens").cast("bigint").alias("alloc_tokens"),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("alloc_tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


Q_MIXTURE_SAMPLE_SQL = """
with per as (
  select source, sum(len(string_split(text, ' ')))::BIGINT n_tokens
  from documents group by source
),
w as (
  select *, round(sqrt(n_tokens::DOUBLE) * 1e6, 0)::BIGINT weight_u from per
),
tot as (select sum(n_tokens) _nt, sum(weight_u) _sw from w),
rated as (
  select source, n_tokens,
         least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
               n_tokens) alloc_tokens
  from w cross join tot
),
rp as (
  select *, ((alloc_tokens::HUGEINT * 1000000) // n_tokens)::BIGINT rate_ppm
  from rated
),
d as (
  select doc_id, source, len(string_split(text, ' '))::BIGINT tk
  from documents
),
kept as (
  select d.*, r.alloc_tokens
  from d join rp r using (source)
  where (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT
         % 1000000) < r.rate_ppm
)
select source, count(*)::BIGINT n_docs_kept,
       sum(tk)::BIGINT n_tokens_kept,
       max(alloc_tokens)::BIGINT alloc_tokens,
       round(sum(tk)::DOUBLE / max(alloc_tokens)::DOUBLE, 6) utilization
from kept group by source order by source
"""


def q_length_bucket_efficiency(
    spark: SparkSession, sf_dir: str, batch_size: int = 32
) -> DataFrame:
    """Sequence-length bucketing report: assign every document to a
    power-of-two token-length bucket (integer bit-length math — no
    float log2) and, per bucket, compute the padding waste of batching
    at ``batch_size`` with the bucket's cap as the padded length,
    versus the padding the same docs would cost in UNbucketed global
    batches padded to the corpus max. The classic throughput lever for
    training on variable-length sequences — this report quantifies the
    win before any data moves.

    All integer arithmetic: padded slots = ceil(n/B)*B*cap, waste =
    slots - real tokens. One doc-keyed projection + one bucket-keyed
    map-combined aggregate + a 1-row global broadcast; output is
    |buckets| rows."""
    d = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("len")
    ).where(F.col("len") > 0)
    b = d.withColumn(
        "bucket", F.expr("cast(length(bin(len)) - 1 as int)")
    ).withColumn("cap", F.expr("cast(shiftleft(1, bucket + 1) - 1 as bigint)"))
    per = b.groupBy("bucket", "cap").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("n_tokens"),
    )
    g = d.agg(
        F.max("len").alias("_gmax"), F.count(F.lit(1)).alias("_gn"),
        F.sum("len").alias("_gtok"),
    )
    bs = F.lit(batch_size)
    batches = F.expr("cast(ceil(n_docs / %d.0) as bigint)" % batch_size)
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "bucket",
            "cap",
            "n_docs",
            "n_tokens",
            (batches * bs * F.col("cap") - F.col("n_tokens"))
            .cast("bigint")
            .alias("bucketed_waste"),
            # the same docs' share of the unbucketed padding bill:
            # every doc pads to the global max
            (F.col("n_docs") * F.col("_gmax") - F.col("n_tokens"))
            .cast("bigint")
            .alias("unbucketed_waste"),
        )
        .orderBy("bucket")
    )


Q_LENGTH_BUCKET_SQL = """
with d as (
  select len(string_split(text, ' '))::BIGINT l from documents
  where len(string_split(text, ' ')) > 0
),
b as (
  select l, (length(bin(l)) - 1)::INT bucket,
         ((1::BIGINT << (length(bin(l)))) - 1)::BIGINT cap
  from d
),
per as (
  select bucket, cap, count(*)::BIGINT n_docs, sum(l)::BIGINT n_tokens
  from b group by 1, 2
),
g as (select max(l) _gmax from d)
select bucket, cap, n_docs, n_tokens,
       (ceil(n_docs / 32.0)::BIGINT * 32 * cap - n_tokens)::BIGINT
         bucketed_waste,
       (n_docs * _gmax - n_tokens)::BIGINT unbucketed_waste
from per cross join g
order by bucket
"""


def q_curriculum_order(
    spark: SparkSession, sf_dir: str, bands: int = 8
) -> DataFrame:
    """Curriculum schedule over the corpus: each doc gets an integer
    difficulty in ppm — its LEXICAL DIVERSITY (type-token ratio:
    distinct tokens per token, the easy→hard signal of
    length/diversity curricula; corpus-rarity surprisal is the other
    classic signal but degenerates on this testdata's dense 31-token
    vocabulary, where no token is rare) — and docs are binned into
    fixed difficulty BANDS. Value-domain bins, NOT ntile: an
    equal-frequency rank would need a global sort; fixed bands bin
    each doc independently and the schedule grid is ``bands`` rows no
    matter the corpus size. Output per band: docs unlocked at that
    difficulty, their token mass, mean difficulty, and the cumulative
    corpus fraction available once training reaches the band — the
    pacing table an easy-to-hard curriculum sampler consumes.

    Scale: one tokenize scan → per-doc aggregate (no explode shuffle:
    TTR computes inside one higher-order expression per doc) →
    ``bands``-row grid; the only window runs over that grid. Exact
    integer arithmetic end-to-end (counts + ``div``) — no float parity
    hazard."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = d.select(
        F.expr(
            "size(filter(split(text, ' '), x -> x != ''))"
        ).alias("n_tok"),
        F.expr(
            "size(array_distinct(filter(split(text, ' '), x -> x != '')))"
        ).alias("n_distinct"),
    ).where(F.col("n_tok") > 0).select(
        "n_tok",
        F.expr(
            "(1000000 * cast(n_distinct as bigint)) div n_tok"
        ).alias("difficulty_ppm"),
    )
    banded = per_doc.select(
        "n_tok",
        "difficulty_ppm",
        F.expr(
            "least(cast(difficulty_ppm * %d div 1000000 as int), %d)"
            % (bands, bands - 1)
        ).alias("band"),
    )
    grid = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.expr("sum(difficulty_ppm) div count(1)")
        .cast("bigint")
        .alias("mean_difficulty_ppm"),
    )
    # the cumulative window runs over the <= `bands`-row grid only
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    total = grid.agg(F.sum("n_docs").alias("_tot"))
    return (
        grid.withColumn("cum_docs", F.sum("n_docs").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("band").cast("int").alias("band"),
            "n_docs",
            "n_tokens",
            "mean_difficulty_ppm",
            F.expr("(1000000 * cum_docs) div _tot")
            .cast("bigint")
            .alias("cum_corpus_ppm"),
        )
        .orderBy("band")
    )


def _curriculum_duck(bands: int = 8) -> str:
    """Oracle builder sharing ``q_curriculum_order``'s ``bands``
    default — generated so a non-default band count keeps oracle
    parity (same discipline as ``_markov_surprisal_duck``)."""
    return """
with per_doc as (
  select len(list_filter(string_split(text, ' '), x -> x <> '')) n_tok,
         len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
           n_distinct
  from documents
),
scored as (
  select n_tok,
         (1000000 * n_distinct::BIGINT) // n_tok difficulty_ppm
  from per_doc where n_tok > 0
),
banded as (
  select n_tok, difficulty_ppm,
         least((difficulty_ppm * {b}) // 1000000, {bm1}) band
  from scored
),
grid as (
  select band, count(*)::BIGINT n_docs, sum(n_tok)::BIGINT n_tokens,
         (sum(difficulty_ppm) // count(*))::BIGINT mean_difficulty_ppm
  from banded group by band
)
select band::INT band, n_docs, n_tokens, mean_difficulty_ppm,
       ((1000000 * sum(n_docs) over (
           order by band rows between unbounded preceding and current row))
        // (select sum(n_docs) from grid))::BIGINT cum_corpus_ppm
from grid
order by band
""".format(b=int(bands), bm1=int(bands) - 1)


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual sampling
    rule p_s ∝ n_s^(1/T)) at T ∈ {1, 2, 4}: T=1 is proportional
    sampling, larger T flattens toward uniform, protecting low-resource
    sources. Per (T, source): the sampling weight in ppm and the
    implied epochs over the source for one corpus-sized pass (×1000 —
    values over 1000 mean the source repeats, the overfitting signal
    mixture designers watch).

    The exponents are sqrt CHAINS — n, sqrt(n), sqrt(sqrt(n)) — because
    IEEE-754 sqrt is correctly rounded, so both engines produce
    bit-equal weights where a libm pow(x, 0.25) need not; weights then
    QUANTIZE to integer micro-units BEFORE the normalizer sum (a raw
    double sum is addition-order-dependent, and round 10's regenerated
    data landed floor(epochs) exactly on an ulp boundary — 999 vs
    1000), so every downstream quantity is exact integer math in both
    engines.

    Scale: one map-combined count aggregate; the grid is |sources| × 3
    rows and everything downstream is grid-sized."""
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    t_grid = spark.range(1).select(
        F.explode(
            F.array(F.lit(1), F.lit(2), F.lit(4))
        ).alias("temperature")
    )
    scaled = src.crossJoin(F.broadcast(t_grid)).select(
        "source",
        F.col("temperature").cast("int").alias("temperature"),
        "n_docs",
        F.round(
            F.when(
                F.col("temperature") == 1, F.col("n_docs").cast("double")
            )
            .when(
                F.col("temperature") == 2,
                F.sqrt(F.col("n_docs").cast("double")),
            )
            .otherwise(F.sqrt(F.sqrt(F.col("n_docs").cast("double"))))
            * 1e6,
            0,
        )
        .cast("decimal(38,0)")
        .alias("wu"),
    )
    z = scaled.groupBy("temperature").agg(
        F.sum("wu").alias("_z"),
        F.sum("n_docs").cast("decimal(38,0)").alias("_tot"),
    )
    return (
        scaled.join(F.broadcast(z), "temperature")
        .select(
            "temperature",
            "source",
            "n_docs",
            F.expr("cast((1000000 * wu) div _z as bigint)").alias(
                "weight_ppm"
            ),
            F.expr(
                "cast((1000 * wu * _tot) div (_z * n_docs) as bigint)"
            ).alias("epochs_x1000"),
        )
        .orderBy("temperature", "source")
    )


Q_MIXTURE_TEMPERATURE_SQL = """
with src as (
  select source, count(*)::BIGINT n_docs from documents group by source
),
tg as (select unnest([1, 2, 4]) temperature),
scaled as (
  select source, temperature, n_docs,
         round(case when temperature = 1 then n_docs::DOUBLE
                    when temperature = 2 then sqrt(n_docs::DOUBLE)
                    else sqrt(sqrt(n_docs::DOUBLE)) end * 1e6, 0)::HUGEINT wu
  from src cross join tg
),
z as (
  select temperature, sum(wu) _z, sum(n_docs)::HUGEINT _tot
  from scaled group by temperature
)
select s.temperature::INT temperature, s.source, s.n_docs,
       ((1000000 * s.wu) // z._z)::BIGINT weight_ppm,
       ((1000 * s.wu * z._tot) // (z._z * s.n_docs))::BIGINT epochs_x1000
from scaled s join z using (temperature)
order by temperature, source
"""


_PAD_CONTEXTS = (512, 1024, 2048, 4096, 8192)


def q_padding_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length padding-waste curve — the table that decides a
    training run's sequence length: for each candidate context L, if
    every document were chunked to ≤L tokens and each final chunk
    padded to L (the no-packing baseline), how many slot-tokens exist,
    and what fraction is padding. Read together with
    ``q_length_bucket_efficiency`` (the packed variant) it quantifies
    exactly what sequence packing buys at each L.

    Exact integers: per doc, padded slots = ceil(n_tok/L)·L =
    ((n_tok + L - 1) div L)·L; waste_ppm is an integer-ppm division.

    Scale: one scan computes per-doc token counts; the L-grid is a
    broadcast literal array, so the expansion is 5 rows per doc
    FOLDED by partial aggregation map-side — the shuffle carries ≤5
    rows per mapper."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            F.size(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("n_tok")
        )
        .where(F.col("n_tok") > 0)
    )
    grid = toks.select(
        "n_tok",
        F.explode(
            F.array(*[F.lit(c) for c in _PAD_CONTEXTS])
        ).alias("context_len"),
    )
    return (
        grid.groupBy("context_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum(
                F.expr("((n_tok + context_len - 1) div context_len) * context_len")
            )
            .cast("bigint")
            .alias("padded_tokens"),
        )
        .select(
            F.col("context_len").cast("int").alias("context_len"),
            "n_docs",
            "total_tokens",
            "padded_tokens",
            F.expr(
                "(1000000 * (padded_tokens - total_tokens)) div padded_tokens"
            )
            .cast("bigint")
            .alias("waste_ppm"),
        )
        .orderBy("context_len")
    )


def _padding_waste_duck(contexts=_PAD_CONTEXTS) -> str:
    return """
with t as (
  select len(list_filter(string_split(text, ' '), x -> x <> '')) n_tok
  from documents
),
g as (
  select n_tok, unnest([{cs}]) context_len from t where n_tok > 0
),
agg as (
  select context_len, count(*)::BIGINT n_docs,
         sum(n_tok)::BIGINT total_tokens,
         sum(((n_tok + context_len - 1) // context_len)
             * context_len)::BIGINT padded_tokens
  from g group by context_len
)
select context_len::INT context_len, n_docs, total_tokens, padded_tokens,
       ((1000000 * (padded_tokens - total_tokens))
        // padded_tokens)::BIGINT waste_ppm
from agg order by context_len
""".format(cs=", ".join(str(c) for c in contexts))


def q_shard_skew_report(
    spark: SparkSession, sf_dir: str, n_shards: int = 32
) -> DataFrame:
    """Shard-assignment skew audit for the hash layout a writer would
    use (``pmod(xxhash-style md5 bucket, n_shards)``... here the
    engine's md5-derived bucket, replayable in both engines): per
    shard, row count, exact byte size of the text payload, and the
    per-mille deviation from the mean shard bytes. The table you check
    BEFORE writing a 100 TB corpus into ``n_shards`` hash buckets —
    one hot shard means one straggler task for every downstream
    consumer.

    Scale: one map-combined aggregate to an ``n_shards``-row grid; the
    deviation window runs over the grid."""
    d = load(spark, sf_dir, "documents").select(
        F.expr(
            "pmod(cast(conv(substr(md5(cast(doc_id as string)), 1, 15), "
            "16, 10) as bigint), %d)" % n_shards
        ).alias("shard"),
        F.length("text").cast("bigint").alias("nb"),
    )
    grid = d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nb").cast("bigint").alias("text_bytes"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        grid.withColumn("_tot", F.sum("text_bytes").over(w))
        .withColumn("_k", F.count(F.lit(1)).over(w))
        .select(
            "shard",
            "n_docs",
            "text_bytes",
            F.expr(
                "(1000 * text_bytes * _k) div _tot - 1000"
            )
            .cast("bigint")
            .alias("dev_permille"),
        )
        .orderBy("shard")
    )


def _shard_skew_duck(n_shards: int = 32) -> str:
    return """
with d as (
  select ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % {n} shard,
         length(text)::BIGINT nb
  from documents
),
grid as (
  select shard, count(*)::BIGINT n_docs, sum(nb)::BIGINT text_bytes
  from d group by shard
)
select shard, n_docs, text_bytes,
       ((1000 * text_bytes * count(*) over ()) // sum(text_bytes) over ()
        - 1000)::BIGINT dev_permille
from grid order by shard
""".format(n=n_shards)


def q_mixture_plan(
    spark: SparkSession, sf_dir: str, budget_permille: int = 500
) -> DataFrame:
    """DATA-MIXTURE allocation plan — the static mixing step of a
    training pipeline (the temperature-sampling rule of multilingual
    pretraining + Hamilton's largest-remainder apportionment): per
    source, available whitespace tokens; a target share ∝
    sqrt(available) (τ=2 temperature — boosts low-resource sources);
    and the EXACT integer token quota for a budget of
    ``budget_permille``/1000 of the corpus, apportioned by largest
    remainder so quotas sum to the budget exactly. Emits the
    actionable numbers: quota, capped flag (quota exceeds
    availability — iterate externally), and per-source sampling rate
    in ppm.

    Determinism contract: sqrt is IEEE-correctly-rounded (identical in
    both engines) and is quantized to integer micro-units BEFORE any
    sum, so every downstream quantity — shares, floors, remainders,
    ranks, quotas — is exact integer math; remainder ties break on
    source name.

    Scale: one map-combined token-count aggregate is the only
    data-sized shuffle; the apportionment runs on the per-source grid
    (sources, not rows). The ``// W`` floor and ``% W`` remainder stay
    in decimal(38) — token budgets × weight units overflow int64 at
    corpus scale."""
    d = load(spark, sf_dir, "documents").select("source", "text")
    avail = (
        d.select(
            "source",
            F.size(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").cast("bigint").alias("avail"))
    )
    tot = avail.agg(F.sum("avail").cast("decimal(38,0)").alias("_tot"))
    w = avail.select(
        "source",
        "avail",
        F.round(F.sqrt(F.col("avail").cast("double")) * 1e6, 0)
        .cast("decimal(38,0)")
        .alias("wu"),
    )
    wsum = w.agg(F.sum("wu").alias("_w"))
    g = (
        w.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(wsum))
        .select(
            "source",
            "avail",
            "wu",
            F.expr(
                "cast((_tot * {bp}) div 1000 as decimal(38,0))".format(
                    bp=int(budget_permille)
                )
            ).alias("_budget"),
            F.col("_w"),
        )
        .select(
            "source",
            "avail",
            F.col("_budget"),
            F.expr("cast((_budget * wu) div _w as bigint)").alias("_floor"),
            F.expr("cast((_budget * wu) % _w as decimal(38,0))").alias(
                "_rem"
            ),
        )
    )
    wr = Window.orderBy(F.col("_rem").desc(), F.col("source").asc())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # the grid is sources-sized (bounded); the global windows run over
    # it only — never over row-level data
    return (
        g.select(
            "source",
            "avail",
            "_floor",
            F.row_number().over(wr).alias("_rk"),
            (F.col("_budget").cast("bigint") - F.sum("_floor").over(wall))
            .alias("_leftover"),
        )
        .select(
            "source",
            "avail",
            (
                F.col("_floor")
                + F.when(F.col("_rk") <= F.col("_leftover"), 1).otherwise(0)
            ).cast("bigint").alias("quota"),
        )
        .select(
            "source",
            "avail",
            "quota",
            (F.col("quota") > F.col("avail")).alias("capped"),
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr("cast((quota * 1000000) div avail as bigint)"),
            ).alias("sample_rate_ppm"),
        )
        .orderBy("source")
    )


Q_MIXTURE_PLAN_SQL = """
with d as (
  select source,
         len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT n_tok
  from documents
),
avail as (select source, sum(n_tok)::BIGINT avail from d group by source),
w as (
  select source, avail,
         round(sqrt(avail::DOUBLE) * 1e6, 0)::HUGEINT wu
  from avail
),
g as (
  select source, avail,
         ((select sum(avail)::HUGEINT from avail) * 500 // 1000) as b,
         ((select sum(avail)::HUGEINT from avail) * 500 // 1000) * wu
           // (select sum(wu) from w) as fl,
         ((select sum(avail)::HUGEINT from avail) * 500 // 1000) * wu
           % (select sum(wu) from w) as rem
  from w
),
r as (
  select source, avail, b, fl,
         row_number() over (order by rem desc, source asc) rk,
         (b - sum(fl) over ()) leftover
  from g
),
q as (
  select source, avail,
         (fl + case when rk <= leftover then 1 else 0 end)::BIGINT quota
  from r
)
select source, avail, quota,
       (quota > avail) capped,
       least(1000000, quota * 1000000 // avail)::BIGINT sample_rate_ppm
from q order by source
"""
