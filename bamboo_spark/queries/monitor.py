"""Data-quality and observability: profiles, DQ reports, drift/PSI, skew, outliers, integrity, concentration, classifier evaluation.

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


def q_table_profile(
    spark: SparkSession, sf_dir: str, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Data-quality profile of the events table: per-column null count
    and distinct count, plus row total - the monitoring scan a pipeline
    runs on every ingest batch. ONE pass: count(col) and
    count(distinct col) fold into a single aggregate (Spark plans
    multi-distinct via expand, still one scan), emitted long so the
    driver can diff profiles across batches.

    ``approx=True`` is the 100 TB mode: HLL++
    ``approx_count_distinct(rsd)`` replaces each exact distinct, so the
    plan loses the Expand (row x N_cols blowup) entirely — one plain
    map-combined aggregate whose state is N_cols sketches, constant
    regardless of cardinality. The exact default stays the oracle-gated
    form; the approx twin is error-bound-tested in pytest (like
    q_approx_sketches)."""
    e = load(spark, sf_dir, "events")
    cols = ["user_id", "event_type", "value"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("%s_nulls" % c))
        if approx:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).cast("bigint").alias(
                    "%s_distinct" % c
                )
            )
        else:
            aggs.append(
                F.count_distinct(F.col(c)).cast("bigint").alias("%s_distinct" % c)
            )
    return e.agg(*aggs)


Q_TABLE_PROFILE_SQL = """
select count(*)::BIGINT n_rows,
       (count(*) - count(user_id))::BIGINT user_id_nulls,
       count(distinct user_id)::BIGINT user_id_distinct,
       (count(*) - count(event_type))::BIGINT event_type_nulls,
       count(distinct event_type)::BIGINT event_type_distinct,
       (count(*) - count(value))::BIGINT value_nulls,
       count(distinct value)::BIGINT value_distinct
from events
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str, top_n: int = 10) -> DataFrame:
    """Join-key skew diagnostic: the ``top_n`` hottest user_ids with
    their event counts and corpus share — the pre-flight check before
    any user-keyed join/window at scale (a 5% hot key means salting,
    AQE skew-join, or a key blacklist BEFORE the shuffle, not after it
    times out). One map-combined count agg + a partial top-k
    (TakeOrdered, never a global sort) + a 1-row total broadcast."""
    e = load(spark, sf_dir, "events")
    # persisted: counts feeds both the scalar total and the top-k
    counts = _tracked_persist(
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(top_n)
    return top.crossJoin(F.broadcast(total)).select(
        "user_id",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
    )


Q_KEY_SKEW_SQL = """
with c as (select user_id, count(*) cnt from events group by user_id),
t as (select sum(cnt)::DOUBLE total from c)
select user_id, cnt::BIGINT cnt, round(cnt / total, 6) as "share"
from c cross join t
order by cnt desc, user_id asc limit {n}
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot promotion audit: diff two table versions
    (simulated here: v1 = docs with id < 250, every 7th doc carrying a
    'v1 ' edit marker, v2 = raw docs with id >= 100) and count per
    (source, status) — added / removed / changed / unchanged. Only
    32-byte digests shuffle into the full outer join; content never
    does."""
    d = load(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") < 250).select(
        "doc_id",
        "source",
        F.expr(
            "case when doc_id % 7 = 0 then concat('v1 ', text) else text end"
        ).alias("text"),
    )
    new = d.where(F.col("doc_id") >= 100).select("doc_id", "source", "text")
    diff = scale.snapshot_diff(old, new)
    return (
        diff.groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select("source", "status", "n")
    )


Q_SNAPSHOT_DIFF_SQL = """
with old as (
  select doc_id, source,
         case when doc_id % 7 = 0 then 'v1 ' || text else text end as "text"
  from documents where doc_id < 250
),
new as (
  select doc_id, source, text from documents where doc_id >= 100
),
j as (
  select coalesce(n.doc_id, o.doc_id) doc_id,
         coalesce(n.source, o.source) source,
         case when o.doc_id is null then 'added'
              when n.doc_id is null then 'removed'
              when md5(o.text) != md5(n.text) then 'changed'
              else 'unchanged' end status
  from old o full outer join new n on o.doc_id = n.doc_id
)
select source, status, count(*)::BIGINT n
from j group by source, status order by source, status
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2-bucketed token-length histogram — the length
    distribution a curation dashboard plots (truncation spikes show as
    a bucket wall; boilerplate shows as one dominant bucket). Pure
    integer bucket math (floor(log2) via bit length is engine-exact on
    positive counts) and one map-combined aggregate."""
    d = load(spark, sf_dir, "documents")
    lens = d.selectExpr(
        "source",
        "cast(size(split(text, ' ')) as bigint) as n",
    ).selectExpr(
        "source",
        # floor(log2(n)) as the bucket; n >= 1 always (split of any
        # string yields at least one token)
        "cast(floor(log2(n)) as bigint) as bucket",
        "n",
    )
    return lens.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n").cast("bigint").alias("min_tokens"),
        F.max("n").cast("bigint").alias("max_tokens"),
    )


Q_LENGTH_HISTOGRAM_SQL = """
with l as (
  select source, len(string_split(text, ' '))::BIGINT n from documents
)
select source, floor(log2(n))::BIGINT bucket,
       count(*)::BIGINT n_docs,
       min(n)::BIGINT min_tokens, max(n)::BIGINT max_tokens
from l group by source, bucket order by source, bucket
"""


def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health card: doc/token totals, token-count
    median/p95, exact mean quality, and language-mix entropy — the
    number a pipeline dashboard plots per snapshot. Everything reduces
    map-side; the entropy sums per-language nano-unit terms (exact
    longs, order-independent) so the single row is bit-stable across
    partitionings and engines."""
    d = load(spark, sf_dir, "documents")
    # persisted: staged feeds the base agg, the lang histogram, AND the
    # lang total — unpersisted, the scan + quality projection runs 3x
    staged = _tracked_persist(
        d.selectExpr(
            "lang",
            "cast(size(split(text, ' ')) as bigint) as n_tokens",
            "%s as quality" % text.quality_score_sql("split(text, ' ')"),
        )
    )
    base = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 4).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 4).alias("p95_tokens"),
        F.round(
            F.sum(F.round(F.col("quality") * 1e6, 0).cast("long")).cast("double")
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    lang_terms = (
        staged.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(staged.agg(F.count(F.lit(1)).cast("double").alias("_n"))))
        .select(
            F.round(
                F.round(
                    -(F.col("c") / F.col("_n")) * F.log(F.col("c") / F.col("_n")), 9
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("t")
        )
    )
    entropy = lang_terms.agg(
        F.round(F.sum("t").cast("double") / 1e9, 6).alias("lang_entropy")
    )
    return base.crossJoin(F.broadcast(entropy))


Q_CORPUS_SUMMARY_SQL = """
with s as (
  select lang, len(string_split(text, ' '))::BIGINT n_tokens, {quality} quality
  from documents
),
base as (
  select count(*)::BIGINT n_docs, sum(n_tokens)::BIGINT total_tokens,
         round(quantile_cont(n_tokens, 0.5), 4) p50_tokens,
         round(quantile_cont(n_tokens, 0.95), 4) p95_tokens,
         round(sum(round(quality * 1e6, 0)::BIGINT)::DOUBLE / 1e6 / count(*), 6)
           mean_quality
  from s
),
lc as (select lang, count(*)::DOUBLE c from s group by lang),
tot as (select count(*)::DOUBLE n from s),
terms as (
  select round(round(-(c / n) * ln(c / n), 9) * 1e9, 0)::BIGINT t
  from lc cross join tot
),
ent as (select round(sum(t)::DOUBLE / 1e9, 6) lang_entropy from terms)
select base.*, ent.lang_entropy from base cross join ent
"""


def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation audit: keep rate, mean quality, and the
    drop-reason histogram (exploded from the Gopher filter's audit
    string) — the report a data lead reads before committing
    thresholds. One scan-speed flag projection + two map-combined
    aggregates keyed on (source[, reason]); mean quality sums exact
    micro-units so the report is partitioning-independent."""
    d = load(spark, sf_dir, "documents")
    # persisted: flags feeds the per-source base agg AND the reason
    # histogram — unpersisted, the whole gopher projection runs twice
    flags = _tracked_persist(
        text.gopher_filter(d).join(d.select("doc_id", "source"), "doc_id")
    )
    base = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.round(F.col("quality") * 1e6, 0).cast("long")).cast("double")
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    reasons = (
        flags.where(F.col("keep") == 0)
        .select("source", F.explode(F.split("drop_reasons", ",")).alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("reason", "cnt"))
                    ),
                    lambda s: F.concat_ws(":", s["reason"], s["cnt"].cast("string")),
                ),
                " ",
            ).alias("drop_histogram")
        )
    )
    return base.join(reasons, "source", "left").select(
        "source",
        "n_docs",
        "n_kept",
        "mean_quality",
        F.coalesce("drop_histogram", F.lit("")).alias("drop_histogram"),
    )


Q_SOURCE_QUALITY_SQL = """
with g as ({gopher}),
f as (
  select g.*, d.source from g join documents d using (doc_id)
),
base as (
  select source, count(*)::BIGINT n_docs, sum(keep)::BIGINT n_kept,
         round(sum(round(quality * 1e6, 0)::BIGINT)::DOUBLE / 1e6 / count(*), 6)
           mean_quality
  from f group by source
),
r as (
  select source, unnest(string_split(drop_reasons, ',')) reason
  from f where keep = 0
),
rc as (select source, reason, count(*)::BIGINT cnt from r group by 1, 2),
hist as (
  select source,
         array_to_string(
           list(reason || ':' || cnt order by reason, cnt), ' ') drop_histogram
  from rc group by source
)
select base.source, n_docs, n_kept, mean_quality,
       coalesce(drop_histogram, '') drop_histogram
from base left join hist using (source)
order by source
"""


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse: for each FK
    edge (orders→customer, lineitem→orders, customer→nation,
    supplier→nation, nation→region), the row count, orphan count
    (child keys with no parent), and null-key count — the pre-flight
    check before any join-heavy pipeline trusts its dimensions.

    Each edge is one LEFT ANTI join on the key; parents are dimension
    tables and broadcast (orders→customer's parent is the largest at
    1.5M rows per TPC-H SF — still broadcastable; at bigger parents the
    anti join shuffles on the key, which is the right plan anyway).
    Output is one row per edge — the grid a data-quality dashboard
    polls."""
    specs = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for edge, child, ck, parent, pk in specs:
        c = load(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = (
            c.where(F.col("k").isNotNull())
            .join(F.broadcast(p), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
        )
        stats = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("k").isNull().cast("bigint"))
            .cast("bigint")
            .alias("null_keys"),
        )
        row = (
            stats.crossJoin(orphans)
            .select(
                F.lit(edge).alias("fk_edge"),
                "n_rows",
                "orphans",
                "null_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


Q_FK_INTEGRITY_SQL = """
select 'customer->nation' fk_edge, count(*)::BIGINT n_rows,
       count(*) filter (c_nationkey is not null and c_nationkey not in
         (select n_nationkey from nation))::BIGINT orphans,
       count(*) filter (c_nationkey is null)::BIGINT null_keys
from customer
union all
select 'lineitem->orders', count(*)::BIGINT,
       count(*) filter (l_orderkey is not null and l_orderkey not in
         (select o_orderkey from orders))::BIGINT,
       count(*) filter (l_orderkey is null)::BIGINT
from lineitem
union all
select 'nation->region', count(*)::BIGINT,
       count(*) filter (n_regionkey is not null and n_regionkey not in
         (select r_regionkey from region))::BIGINT,
       count(*) filter (n_regionkey is null)::BIGINT
from nation
union all
select 'orders->customer', count(*)::BIGINT,
       count(*) filter (o_custkey is not null and o_custkey not in
         (select c_custkey from customer))::BIGINT,
       count(*) filter (o_custkey is null)::BIGINT
from orders
union all
select 'supplier->nation', count(*)::BIGINT,
       count(*) filter (s_nationkey is not null and s_nationkey not in
         (select n_nationkey from nation))::BIGINT,
       count(*) filter (s_nationkey is null)::BIGINT
from supplier
order by fk_edge
"""


def q_value_outliers(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Robust per-group outlier audit (Tukey fences): per event type,
    exact quartiles of ``value``, the 1.5·IQR fences, and how many
    events fall outside them — the monitoring grid that catches a
    misbehaving emitter (a client suddenly logging milliseconds instead
    of seconds) without being blinded by the outliers themselves, the
    way mean/std z-scores are.

    One percentile aggregate over the tiny type domain, broadcast
    back, one map-side fence count — two scans, no window, nothing
    data-sized collected. ``approx=True`` is the 100 TB mode: exact
    ``percentile`` holds every group value in one aggregation buffer,
    ``approx_percentile`` is a mergeable sketch with map-side partials
    (same plan otherwise; error-bound-tested in pytest, the exact mode
    stays the oracle-gated one)."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    pf = "approx_percentile(value, %s, 10000)" if approx else "percentile(value, %s)"
    g = e.groupBy("event_type").agg(
        F.round(F.expr(pf % "0.25"), 4).alias("q1"),
        F.round(F.expr(pf % "0.5"), 4).alias("median"),
        F.round(F.expr(pf % "0.75"), 4).alias("q3"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        e.join(F.broadcast(g), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("q1").alias("q1"),
            F.first("median").alias("median"),
            F.first("q3").alias("q3"),
            F.first("n").alias("n"),
            F.sum(((F.col("value") < lo) | (F.col("value") > hi)).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


Q_VALUE_OUTLIERS_SQL = """
with g as (
  select event_type,
         round(quantile_cont(value, 0.25), 4) q1,
         round(quantile_cont(value, 0.5), 4) median,
         round(quantile_cont(value, 0.75), 4) q3,
         count(*)::BIGINT n
  from events group by event_type
)
select e.event_type, any_value(q1) q1, any_value(median) median,
       any_value(q3) q3, any_value(n) n,
       sum((e.value < q1 - 1.5 * (q3 - q1)
            or e.value > q3 + 1.5 * (q3 - q1))::BIGINT)::BIGINT n_outliers
from events e join g using (event_type)
group by e.event_type order by e.event_type
"""


def q_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent corpus identity: per source, a commutative
    content fingerprint (sum of 60-bit md5 slices of doc_id∥digest,
    mod 2⁶⁰), row count, and byte total — the cheap equality check two
    clusters (or two snapshot versions) run before trusting they hold
    the SAME corpus, without moving any content. Commutative sum ⇒
    partitioning/order can't change it; doc_id is folded in so a swap
    of two docs' texts can't cancel out.

    One scan, one map-combined aggregate — at 100 TB this is the
    cheapest possible full-corpus integrity pass."""
    d = load(spark, sf_dir, "documents")
    h = F.expr(
        "conv(substring(md5(concat(cast(doc_id as string), ':', md5(text))), 1, 15), 16, 10)"
    ).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
            # sum in decimal(38,0): the 60-bit addends overflow a long
            # within ~16 rows (Spark ANSI would raise; DuckDB promotes
            # to HUGEINT — decimal keeps both engines exact)
            F.pmod(
                F.sum(h.cast("decimal(38,0)")),
                F.lit(2**60).cast("decimal(38,0)"),
            )
            .cast("bigint")
            .alias("fingerprint"),
        )
        .orderBy("source")
    )


Q_CORPUS_FINGERPRINT_SQL = """
select source, count(*)::BIGINT n_docs,
       sum(length(text))::BIGINT n_chars,
       (sum(('0x' || substr(md5(doc_id::VARCHAR || ':' || md5(text)), 1, 15))::BIGINT)
        % (1::BIGINT << 60))::BIGINT fingerprint
from documents
group by source order by source
"""


_KANON_K = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the corpus under two quasi-identifier
    generalization levels (Sweeney's model): treating (lang, source,
    length-bucket) — and the coarser (lang, wide-bucket) — as the
    quasi-identifiers a re-identification join would use, report per
    level how many equivalence classes exist, the anonymity floor
    k_min (the smallest class), and how many ROWS sit in classes
    smaller than k=5 — the release-gate number for publishing corpus
    slices with per-document metadata attached.

    Scale shape: each level is one map-combined hash aggregate over
    the QID tuple followed by a 5-row scalar rollup — no windows, no
    joins, no distincts; the union of levels is two scans Catalyst can
    share. Adding a generalization level is O(one more agg)."""
    d = load(spark, sf_dir, "documents")

    def level(name, cols):
        groups = d.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
        return groups.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_groups"),
            F.min("n").alias("k_min"),
            F.sum((F.col("n") < _KANON_K).cast("bigint")).alias(
                "at_risk_groups"
            ),
            F.sum(
                F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0)
            ).alias("rows_at_risk"),
        )

    fine = level(
        "lang_source_len500",
        [
            F.col("lang"),
            F.col("source"),
            F.expr("n_chars div 500").alias("lb"),
        ],
    )
    coarse = level(
        "lang_len2000", [F.col("lang"), F.expr("n_chars div 2000").alias("lb")]
    )
    return fine.unionByName(coarse).orderBy("level")


Q_K_ANONYMITY_SQL = """
with fine as (
  select lang, source, n_chars // 500 lb, count(*) n
  from documents group by 1, 2, 3
),
coarse as (
  select lang, n_chars // 2000 lb, count(*) n from documents group by 1, 2
)
select 'lang_source_len500' as "level", count(*) n_groups, min(n) k_min,
       sum((n < {k})::BIGINT) at_risk_groups,
       sum(case when n < {k} then n else 0 end) rows_at_risk
from fine
union all
select 'lang_len2000' as "level", count(*), min(n),
       sum((n < {k})::BIGINT),
       sum(case when n < {k} then n else 0 end)
from coarse
order by "level"
""".format(k=_KANON_K)


def q_lang_nb_confusion(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Multinomial Naive Bayes language classifier (McCallum & Nigam
    1998), trained and resubstitution-evaluated on the corpus in ONE
    composed plan: per-(lang, token) counts with Laplace smoothing →
    per-token class log-likelihoods → per-doc argmax → confusion matrix
    (true_lang, pred_lang, n_docs). The classifier-based filter stage
    of a curation pipeline (fastText-style lang-ID/quality gates) in
    its closed-form, oracle-checkable reduction.

    Determinism: every log-probability quantizes to INTEGER micro-nats
    (round(ln(p) * 1e6)) before any sum — per-doc scores are exact
    integer sums (order-independent, engine-exact), and the argmax
    tie-breaks on the class name, so the prediction is bit-stable in
    both engines (the PageRank integer-quantization pattern).

    Scale: token stream aggregates once into the (lang, token) count
    table; the dense likelihood table is |vocab| x |classes| rows —
    vocab-bounded state, broadcast for scoring (``top_v`` caps it with
    an OOV floor per class, the `unigram_surprisal` pattern); scoring
    is the token scan x |classes| (a handful of langs), all map-
    combined aggregates; no window anywhere. The train/score halves are
    the reusable :mod:`bamboo_spark.operators.classify` API."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    likelihoods, classes = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    likelihoods = _tracked_persist(likelihoods)
    pred = classify.nb_classify(
        d, likelihoods, classes, text_col="text", id_col="doc_id",
        out_col="pred_lang",
    )
    return (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


Q_LANG_NB_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
pred as (
  select doc_id, lang pred_lang from (
    select doc_id, lang,
           row_number() over (partition by doc_id
                              order by score desc, lang desc) rn
    from scp
  ) where rn = 1
)
select d.lang true_lang, p.pred_lang, count(*)::BIGINT n_docs
from d join pred p using (doc_id)
group by 1, 2 order by 1, 2
"""


def q_nb_roc(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Per-class one-vs-rest ROC/AUC evaluation of the Naive Bayes
    language classifier — the threshold-tuning companion to the argmax
    confusion matrix (``lang_nb_confusion``): before a curation
    pipeline gates on "classifier says en with margin >= m", this is
    the curve that picks m. The detector score for class c is the
    MARGIN score_c - max of other-class scores (calibration-free
    multiclass-to-binary reduction); AUC is the binned trapezoid over
    1-nat margin buckets clamped to [-50, 50] (ties within a bucket
    midrank, the Mann-Whitney convention).

    Determinism: scores are exact integer micro-nat sums (the NB
    contract), buckets are floor(margin/1e6) clamped — integer
    arithmetic end to end; the AUC numerator sums bucket-count
    products exactly and divides once at the end.

    Scale shape: scoring is the token scan x |classes|; the margin
    self-join is doc-keyed with a |classes|-bounded expansion; the ROC
    histogram is |classes| x 101 rows, so the cumulative window and
    the trapezoid rollup run over a METADATA-sized table — no window
    ever touches the document stream."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    lik, cls = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    lik = _tracked_persist(lik)
    sc = _tracked_persist(
        classify.nb_scores(d, lik, cls, text_col="text", id_col="doc_id")
    )
    other = sc.select(
        F.col("doc_id").alias("_d"),
        F.col("label").alias("_l"),
        F.col("score").alias("_s"),
    )
    marg = (
        sc.join(
            other,
            (F.col("doc_id") == F.col("_d")) & (F.col("label") != F.col("_l")),
        )
        .groupBy("doc_id", "label")
        .agg((F.max("score") - F.max("_s")).alias("margin"))
    )
    lab = marg.join(d.select("doc_id", "lang"), "doc_id").select(
        "label",
        F.greatest(
            F.lit(-50),
            F.least(
                F.lit(50),
                F.floor(F.col("margin") / F.lit(1000000.0)).cast("bigint"),
            ),
        ).alias("bucket"),
        (F.col("lang") == F.col("label")).cast("bigint").alias("p"),
    )
    hist = lab.groupBy("label", "bucket").agg(
        F.sum("p").alias("pos_n"),
        F.sum(F.lit(1) - F.col("p")).alias("neg_n"),
    )
    w = Window.partitionBy("label").orderBy(F.col("bucket").desc())
    cum = hist.withColumn("ctp", F.sum("pos_n").over(w))
    per = cum.groupBy("label").agg(
        F.sum("pos_n").alias("pos"),
        F.sum("neg_n").alias("neg"),
        F.sum(
            F.col("neg_n") * (F.lit(2) * F.col("ctp") - F.col("pos_n"))
        ).alias("num"),
    )
    return per.select(
        "label",
        "pos",
        "neg",
        F.when(
            (F.col("pos") > 0) & (F.col("neg") > 0),
            F.round(
                F.col("num") / (F.lit(2.0) * F.col("pos") * F.col("neg")), 6
            ),
        ).alias("auc"),
    ).orderBy("label")


Q_NB_ROC_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
marg as (
  select a.doc_id, a.lang as "label", a.score - max(b.score) margin
  from scp a join scp b on a.doc_id = b.doc_id and a.lang <> b.lang
  group by a.doc_id, a.lang, a.score
),
lab as (
  select m."label",
         greatest(-50, least(50, floor(m.margin / 1000000.0)::BIGINT)) bucket,
         (d.lang = m."label")::BIGINT p
  from marg m join d on d.doc_id = m.doc_id
),
hist as (
  select "label", bucket, sum(p) pos_n, sum(1 - p) neg_n
  from lab group by 1, 2
),
cum as (
  select *, sum(pos_n) over (partition by "label" order by bucket desc) ctp
  from hist
),
per as (
  select "label", sum(pos_n) pos, sum(neg_n) neg,
         sum(neg_n * (2 * ctp - pos_n)) num
  from cum group by 1
)
select "label", pos, neg,
       case when pos > 0 and neg > 0
            then round(num::DOUBLE / (2.0 * pos * neg), 6) end auc
from per order by "label"
"""


def q_nb_calibration(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Reliability diagram + Brier score for the Naive Bayes language
    classifier — per confidence decile, does a "90% sure" prediction
    actually hit 90%? The third leg of the classifier-eval family
    (confusion matrix -> threshold curve -> calibration): a gate that
    keeps docs "where classifier confidence >= c" is only as good as
    the calibration of c. Confidence is the softmax posterior of the
    argmax class, computed overflow-safe relative to the max score
    (exp of non-positive micro-nat deltas).

    Determinism: scores are exact integer micro-nats, so the softmax
    inputs are identical doubles in both engines; per-doc confidence
    and Brier contributions quantize to integer micro/nano units
    before the bin sums (the engine's quantize-then-sum rule).

    Scale shape: scoring is the token scan x |classes|; the max /
    softmax / argmax reductions are doc-keyed aggregates that reuse
    one shuffle partitioning; the decile table is 10 rows. No window
    touches the doc stream (argmax is a max-struct aggregate)."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    lik, cls = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    lik = _tracked_persist(lik)
    sc = _tracked_persist(
        classify.nb_scores(d, lik, cls, text_col="text", id_col="doc_id")
    )
    agg1 = sc.groupBy("doc_id").agg(
        F.max("score").alias("ms"),
        F.max(F.struct(F.col("score").alias("sc"), F.col("label").alias("cl")))
        .alias("b"),
    )
    den = (
        sc.join(agg1, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.exp((F.col("score") - F.col("ms")) / F.lit(1e6))).alias(
                "inv"
            ),
            F.max(F.col("b.cl")).alias("pred"),
        )
    )
    pd_ = den.join(d.select("doc_id", "lang"), "doc_id").select(
        (F.lit(1.0) / F.col("inv")).alias("p"),
        (F.col("pred") == F.col("lang")).cast("bigint").alias("ok"),
    )
    binned = pd_.select(
        F.least(F.lit(9), F.floor(F.col("p") * 10).cast("bigint")).alias(
            "bin"
        ),
        F.expr("cast(round(p * 1e6, 0) as bigint)").alias("conf_u"),
        "ok",
        F.expr(
            "cast(round((p - ok) * (p - ok) * 1e9, 0) as bigint)"
        ).alias("b_u"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("conf_u") / (F.count(F.lit(1)) * F.lit(1e6)), 6)
            .alias("avg_conf"),
            F.round(F.sum("ok") / F.count(F.lit(1)).cast("double"), 6)
            .alias("accuracy"),
            F.round(F.sum("b_u") / (F.count(F.lit(1)) * F.lit(1e9)), 6)
            .alias("brier"),
        )
        .orderBy("bin")
    )


Q_NB_CALIBRATION_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
mx as (select doc_id, max(score) ms from scp group by doc_id),
pred as (
  select doc_id, lang pred_lang from (
    select doc_id, lang,
           row_number() over (partition by doc_id
                              order by score desc, lang desc) rn
    from scp
  ) where rn = 1
),
den as (
  select s.doc_id, sum(exp((s.score - m.ms) / 1e6)) inv
  from scp s join mx m using (doc_id) group by s.doc_id
),
per_doc as (
  select 1.0 / den.inv p,
         (pred.pred_lang = d.lang)::BIGINT ok
  from den join pred using (doc_id) join d using (doc_id)
),
binned as (
  select least(9, floor(p * 10)::BIGINT) bin,
         round(p * 1e6, 0)::BIGINT conf_u, ok,
         round((p - ok) * (p - ok) * 1e9, 0)::BIGINT b_u
  from per_doc
)
select bin, count(*) n_docs,
       round(sum(conf_u) / (count(*) * 1e6), 6) avg_conf,
       round(sum(ok) / count(*)::DOUBLE, 6) accuracy,
       round(sum(b_u) / (count(*) * 1e9), 6) brier
from binned group by bin order by bin
"""


def q_pareto_frontier(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = 256,
    max_survivors: int = 1_000_000,
) -> DataFrame:
    """Exact 2-D skyline (Pareto frontier) of suppliers: maximize
    total revenue, minimize average ship delay — the supplier-review
    query "who is strictly better on BOTH axes". A supplier is on the
    frontier iff no other supplier has >= revenue AND <= delay with
    at least one strict. The same operator shape answers "which
    sources give the most tokens at the least dup rate" in curation.

    Determinism: revenue is exact integer cents (quantize-then-sum),
    avg delay is an exact integer floor-division to micro-days, so
    dominance compares integers — no float ulp can flip the frontier.

    Scale shape (grid-prune + exact finish): the fact join and the
    per-supplier aggregate are the only data-sized shuffles. Pruning
    buckets revenue into ``buckets`` equi-width integer bins (range
    from one 1-row broadcast agg); a point dominated by ANY strictly
    higher bucket's min-delay representative is provably off the
    frontier, so the exact sorted prefix-min pass runs only on the
    survivors — at most ~(buckets + |frontier|) points for correlated
    data. An anti-correlated worst case keeps O(n) survivors — that
    cost is INTRINSIC to exact skylines — so the prune is guarded:
    survivors are persisted, counted (a metadata-sized action over the
    per-supplier frame), and if the count exceeds ``max_survivors`` the
    query raises rather than silently planning a near-global sorted
    window; callers on adversarial data should quantize an axis or
    accept an approximate frontier. The oracle is the naive NOT-EXISTS
    dominance anti-join, so the prune's losslessness is value-gated,
    not asserted."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_c"),
        "l_shipdate",
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_suppkey",
            "rev_c",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("delay_d"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum("rev_c").alias("rev_c"),
            F.sum("delay_d").alias("sd"),
            F.count(F.lit(1)).alias("nli"),
        )
        .select(
            "l_suppkey",
            "rev_c",
            F.expr(
                "cast((cast(sd as decimal(38,0)) * 1000000) div nli"
                " as bigint)"
            ).alias("delay_u"),
        )
    )
    rng = per.agg(F.min("rev_c").alias("lo"), F.max("rev_c").alias("hi"))
    # integer-exact bucket id: W = (hi-lo) div buckets + 1; b = (rev-lo) div W
    per2 = per.crossJoin(F.broadcast(rng)).select(
        "l_suppkey",
        "rev_c",
        "delay_u",
        F.expr(
            "cast((rev_c - lo) div ((hi - lo) div {b} + 1) as bigint)".format(
                b=buckets
            )
        ).alias("b"),
    )
    bmin = per2.groupBy("b").agg(F.min("delay_u").alias("m"))
    wb = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    above = bmin.select("b", F.min("m").over(wb).alias("above_min"))
    sv = _tracked_persist(
        per2.join(F.broadcast(above), "b", "left").where(
            F.col("above_min").isNull()
            | (F.col("above_min") > F.col("delay_u"))
        )
    )
    n_sv = sv.count()
    if n_sv > max_survivors:
        raise RuntimeError(
            "pareto frontier: bucket prune left %d survivors "
            "(> max_survivors=%d) — anti-correlated axes make the exact "
            "skyline O(n); quantize an axis or raise the guard"
            % (n_sv, max_survivors)
        )
    pts = sv.select("rev_c", "delay_u").distinct()
    wp = Window.orderBy(F.col("rev_c").desc(), F.col("delay_u")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        pts.withColumn("mp", F.min("delay_u").over(wp))
        .where(F.col("mp").isNull() | (F.col("mp") > F.col("delay_u")))
        .select("rev_c", "delay_u")
    )
    return (
        sv.join(sky, ["rev_c", "delay_u"])
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("delay_u") / F.lit(1e6), 6).alias("avg_delay_days"),
            "rev_c",
        )
        .orderBy(F.col("rev_c").desc(), "suppkey")
        .drop("rev_c")
    )


Q_PARETO_FRONTIER_SQL = """
with li as (
  select l_orderkey, l_suppkey,
         round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT rev_c,
         l_shipdate
  from lineitem
),
j as (
  select li.l_suppkey,
         li.rev_c,
         (li.l_shipdate::DATE - o.o_orderdate::DATE) delay_d
  from li join orders o on li.l_orderkey = o.o_orderkey
),
per as (
  select l_suppkey suppkey, sum(rev_c)::BIGINT rev_c,
         (sum(delay_d)::HUGEINT * 1000000 // count(*))::BIGINT delay_u
  from j group by l_suppkey
),
sky as (
  select * from per p where not exists (
    select 1 from per q
    where q.rev_c >= p.rev_c and q.delay_u <= p.delay_u
      and (q.rev_c > p.rev_c or q.delay_u < p.delay_u))
)
select suppkey, round(rev_c / 100.0, 2) revenue,
       round(delay_u / 1e6, 6) avg_delay_days
from sky order by rev_c desc, suppkey
"""


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of three concentration axes — revenue per
    customer, events per user, tokens per document — the "how skewed
    is this corpus/workload" monitor that decides whether salting,
    capping, or mixture re-weighting is worth running at all (Gini ~0:
    don't bother; ~0.6+: hot keys dominate).

    Exact, not sketched: Gini = sum_ij |y_i - y_j| / (2 n S), and the
    pairwise sum collapses over the DISTINCT-VALUE histogram to
    2 * sum_v c_v * (v * cl_v - sl_v) with cl/sl = count/sum of
    strictly smaller values — integers end to end (decimal(38,0)
    products), ONE double division per dimension, round(6).

    Scale shape: each dimension is one map-combined per-key aggregate
    (the only data-sized shuffles) followed by a value-histogram
    aggregate; the prefix sums over the histogram run through
    ``scale.sharded_prefix_sums`` — range-sharded windows plus
    driver-prefix-summed shard bases (the ``pack.token_offsets``
    shape) — so NO single-partition sort/window exists even when the
    "histogram" is all-distinct (per-customer revenue in cents is);
    the final reduce is 1 row per dimension."""
    dec = "decimal(38,0)"

    def gini(vals: DataFrame, dim: str) -> DataFrame:
        h = (
            vals.groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("cv", (F.col("c") * F.col("v")).cast("bigint"))
        )
        hp = scale.sharded_prefix_sums(h, "v", ["c", "cv"])
        h2 = hp.select(
            F.col("v").cast(dec).alias("v"),
            F.col("c").cast(dec).alias("c"),
            F.col("pre_c").cast(dec).alias("cl"),
            F.col("pre_cv").cast(dec).alias("sl"),
        )
        return h2.agg(
            F.sum(F.col("c")).cast("bigint").alias("n_keys"),
            F.sum(F.col("c") * F.col("v")).cast("bigint").alias("total_v"),
            F.round(
                (
                    F.lit(2)
                    * F.sum(
                        F.col("c") * (F.col("v") * F.col("cl") - F.col("sl"))
                    )
                ).cast("double")
                / (
                    F.lit(2)
                    * F.sum(F.col("c"))
                    * F.sum(F.col("c") * F.col("v"))
                ).cast("double"),
                6,
            ).alias("gini"),
        ).select(F.lit(dim).alias("dimension"), "n_keys", "total_v", "gini")

    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("v")
    )
    e = load(spark, sf_dir, "events")
    user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    d = load(spark, sf_dir, "documents")
    doc = d.select(
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("v")
    )
    return (
        gini(cust.select("v"), "customer_revenue_cents")
        .unionAll(gini(user.select("v"), "user_events"))
        .unionAll(gini(doc, "doc_tokens"))
        .orderBy("dimension")
    )


Q_GINI_CONCENTRATION_SQL = """
with cust as (
  select sum(round(o_totalprice * 100, 0)::BIGINT) v
  from orders group by o_custkey
),
usr as (select count(*)::BIGINT v from events group by user_id),
doc as (
  select len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT v
  from documents
),
g_c as (
  select v::HUGEINT v, count(*)::HUGEINT c from cust group by 1
),
g_u as (
  select v::HUGEINT v, count(*)::HUGEINT c from usr group by 1
),
g_d as (
  select v::HUGEINT v, count(*)::HUGEINT c from doc group by 1
),
p_c as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_c window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
p_u as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_u window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
p_d as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_d window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
r as (
  select 'customer_revenue_cents' dimension, sum(c)::BIGINT n_keys,
         sum(c * v)::BIGINT total_v,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6) gini
  from p_c
  union all
  select 'user_events', sum(c)::BIGINT, sum(c * v)::BIGINT,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6)
  from p_u
  union all
  select 'doc_tokens', sum(c)::BIGINT, sum(c * v)::BIGINT,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6)
  from p_d
)
select * from r order by dimension
"""


def q_benford_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance test on order totals — the
    classic fabricated-data / broken-generator detector for any
    positive, scale-spanning money column. Per digit 1..9: observed
    count, observed frequency, Benford expectation log10(1+1/d), and
    the signed gap in basis points. A synthetic or truncated price
    column shows up as a flat (or spiky) first-digit histogram.

    Determinism: the first digit comes from the DECIMAL STRING of the
    exact integer cents (never float log10 of the value, whose
    power-of-ten boundaries ulp-drift); counts are integers; the two
    divisions are one-per-row on a 9-row table, round(6).

    Scale shape: one map-combined 9-group aggregate over the scan is
    the entire query — the digit extraction is a scan-speed
    projection, the result is 9 rows."""
    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    dig = o.where(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    g = dig.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = g.agg(F.sum("n_obs").alias("_tot"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("_tot"), 6).alias(
                "freq"
            ),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
            .alias("expected"),
            F.round(
                (
                    F.col("n_obs").cast("double") / F.col("_tot")
                    - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
                )
                * 10000,
                2,
            ).alias("gap_bps"),
        )
        .orderBy("digit")
    )


Q_BENFORD_DQ_SQL = """
with c as (
  select round(o_totalprice * 100, 0)::BIGINT cents from orders
),
dig as (
  select substr(cents::VARCHAR, 1, 1)::BIGINT digit
  from c where cents > 0
),
g as (select digit, count(*)::BIGINT n_obs from dig group by digit),
tot as (select sum(n_obs) t from g)
select digit, n_obs,
       round(n_obs::DOUBLE / tot.t, 6) freq,
       round(log10(1.0 + 1.0 / digit), 6) expected,
       round((n_obs::DOUBLE / tot.t - log10(1.0 + 1.0 / digit)) * 10000,
             2) gap_bps
from g cross join tot order by digit
"""


def q_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: a deterministic 2% slice of
    customers files deletion requests (md5-stable selection — the same
    users every run, so the audit is replayable), and the deletion
    propagates through the foreign-key chain customer → orders →
    lineitem. Emits per-table (tbl, n_before, n_deleted, n_after) —
    the compliance report a deletion job publishes before the write.

    Scale: each hop is a key equi-join (semi-join shape); the deletion
    key sets are request-sized, so AQE broadcasts them; counts are
    map-combined. The actual delete would be the same plan with
    anti-joins feeding a rewrite — audit and executor share the plan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    bucket = F.expr(
        "pmod(cast(conv(substr(md5(concat('forget:', cast(c_custkey as"
        " string))), 1, 8), 16, 10) as bigint), 100)"
    )
    del_c = c.where(bucket < 2).select("c_custkey")
    del_o = o.join(del_c, o.o_custkey == del_c.c_custkey, "left_semi").select(
        "o_orderkey"
    )

    def audit(tbl: str, df: DataFrame, deleted: DataFrame) -> DataFrame:
        n_b = df.agg(F.count(F.lit(1)).alias("n_before"))
        n_d = deleted.agg(F.count(F.lit(1)).alias("n_deleted"))
        return (
            n_b.crossJoin(n_d)
            .select(
                F.lit(tbl).alias("tbl"),
                F.col("n_before").cast("bigint").alias("n_before"),
                F.col("n_deleted").cast("bigint").alias("n_deleted"),
                (F.col("n_before") - F.col("n_deleted"))
                .cast("bigint")
                .alias("n_after"),
            )
        )

    del_l = l.join(del_o, l.l_orderkey == del_o.o_orderkey, "left_semi")
    return (
        audit("customer", c, del_c)
        .unionByName(
            audit(
                "orders",
                o,
                o.join(del_c, o.o_custkey == del_c.c_custkey, "left_semi"),
            )
        )
        .unionByName(audit("lineitem", l, del_l))
        .orderBy("tbl")
    )


Q_FORGET_USERS_SQL = """
with del_c as (
  select c_custkey from customer
  where (('0x' || substr(md5('forget:' || c_custkey::VARCHAR), 1, 8))::BIGINT
         % 100) < 2
),
del_o as (
  select o_orderkey from orders
  where o_custkey in (select c_custkey from del_c)
),
a as (
  select 'customer' tbl, (select count(*) from customer)::BIGINT n_before,
         (select count(*) from del_c)::BIGINT n_deleted
  union all
  select 'orders', (select count(*) from orders)::BIGINT,
         (select count(*) from del_o)::BIGINT
  union all
  select 'lineitem', (select count(*) from lineitem)::BIGINT,
         (select count(*) from lineitem
          where l_orderkey in (select o_orderkey from del_o))::BIGINT
)
select tbl, n_before, n_deleted, (n_before - n_deleted)::BIGINT n_after
from a order by tbl
"""


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/Great-Expectations
    shape) over the orders table, compiled to minimal passes: all
    row-level rules — not-null, range, regexp, allow-list — fold into
    ONE map-combined aggregate over one scan (adding a rule never adds
    a pass); `unique` adds one key hash-aggregate and `references` one
    anti-join against the DISTINCT customer keys (AQE broadcasts).
    Output: one row per rule with violation counts and a pass flag —
    the contract gate a 100 TB ingest runs before publishing a batch.
    """
    from bamboo_spark.operators import dq

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rules = [
        dq.not_null("o_custkey"),
        dq.in_range("o_totalprice", 0.0, 600000.0),
        dq.regexp("o_orderpriority", "[1-5]-[A-Z ]+"),
        dq.in_set("o_orderstatus", ["O", "F", "P"]),
        dq.unique("o_orderkey"),
        dq.references("o_custkey", c, "c_custkey"),
    ]
    return dq.dq_report(o, rules)


Q_DQ_REPORT_SQL = """
with base as (
  select count(*) n_rows,
         sum(case when o_custkey is null then 1 else 0 end) v_nn,
         sum(case when o_totalprice is not null
                   and (o_totalprice < 0.0 or o_totalprice > 600000.0)
              then 1 else 0 end) v_rg,
         sum(case when o_orderpriority is not null
                   and not regexp_full_match(o_orderpriority, '([1-5]-[A-Z ]+)')
              then 1 else 0 end) v_re,
         sum(case when o_orderstatus is not null
                   and o_orderstatus not in ('O', 'F', 'P')
              then 1 else 0 end) v_in
  from orders
),
uq as (
  select coalesce(sum(c), 0) v from (
    select count(*) c from orders group by o_orderkey having count(*) > 1
  )
),
rf as (
  select count(*) v from orders
  where o_custkey is not null
    and o_custkey not in (select distinct c_custkey from customer)
),
rep as (
  select 'not_null(o_custkey)' as "rule", 'not_null' kind,
         n_rows, v_nn n_violations from base
  union all
  select 'range(o_totalprice,[0.0,600000.0])', 'range', n_rows, v_rg from base
  union all
  select 'regexp(o_orderpriority)', 'regexp', n_rows, v_re from base
  union all
  select 'in_set(o_orderstatus)', 'in_set', n_rows, v_in from base
  union all
  select 'unique(o_orderkey)', 'unique', n_rows, (select v from uq) from base
  union all
  select 'references(o_custkey->c_custkey)', 'references', n_rows,
         (select v from rf) from base
)
select "rule", kind, n_rows::BIGINT n_rows, n_violations::BIGINT n_violations,
       (n_violations = 0)::INT pass
from rep order by "rule"
"""


def q_market_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation: HHI of
    supplier revenue shares (Σ shareᵢ², reported in ppm — 1e6 = one
    supplier owns the market; the antitrust 0.15/0.25 bands scale to
    150k/250k ppm). Gini (``gini_concentration``) asks "how unequal";
    HHI asks "how few players" — the capping/mixture planner reads it
    per data-source the same way: one source at HHI 400k+ dominates
    the mix and needs a cap before training.

    Exact: per-supplier revenue in integer cents, Σrev² and T² in
    decimal(38,0), ONE integer division — hhi_ppm = 1e6·Σrev² div T².

    Scale: the lineitem→supplier join + per-supplier aggregate are the
    data-sized shuffles; per-nation rollups are |nations|-sized."""
    dec = "decimal(38,0)"
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_c"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rev_c").alias("rev"))
    )
    agg = per.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
        F.sum(F.col("rev").cast(dec) * F.col("rev").cast(dec)).alias("sq"),
    )
    return (
        agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "revenue_cents",
            F.expr(
                "cast((sq * 1000000) div (cast(revenue_cents as"
                " decimal(38,0)) * revenue_cents) as bigint)"
            ).alias("hhi_ppm"),
        )
        .orderBy("nation")
    )


Q_MARKET_HHI_SQL = """
with li as (
  select l_suppkey,
         round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT rev_c
  from lineitem
),
per as (
  select s.s_nationkey, li.l_suppkey, sum(rev_c)::HUGEINT rev
  from li join supplier s on li.l_suppkey = s.s_suppkey
  group by 1, 2
),
agg as (
  select s_nationkey, count(*)::BIGINT n_suppliers,
         sum(rev)::BIGINT revenue_cents,
         sum(rev * rev) sq
  from per group by 1
)
select n.n_name nation, n_suppliers, revenue_cents,
       ((sq * 1000000) // (revenue_cents::HUGEINT * revenue_cents))::BIGINT
         hhi_ppm
from agg join nation n on agg.s_nationkey = n.n_nationkey
order by nation
"""


def q_props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profile: for every top-level key of the
    events JSON ``props`` payload — presence count and ppm, JSON-null
    count, and exact distinct-value count. The DQ lens a pipeline
    points at an unmodeled JSON column BEFORE writing extraction code:
    which keys exist, how sparse, how wide. (``table_profile``'s
    semi-structured sibling; at 100 TB swap the exact distinct for the
    ``type_distinct_hll`` registers — same plan shape.)

    Spark parses once via from_json to map<string,string> + explode;
    the oracle walks json_keys. Both count a key present even when its
    value is JSON null, and both see the null value as SQL NULL."""
    e = load(spark, sf_dir, "events").select("props")
    n = e.agg(F.count(F.lit(1)).alias("nr"))
    kv = e.select(
        F.explode(F.expr("from_json(props, 'map<string,string>')")).alias(
            "pkey", "val"
        )
    )
    return (
        kv.groupBy("pkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_present"),
            F.sum(F.col("val").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null_value"),
            F.countDistinct("val").cast("bigint").alias("n_distinct"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "pkey",
            "n_present",
            "n_null_value",
            "n_distinct",
            F.expr(
                "cast((cast(n_present as decimal(38,0)) * 1000000)"
                " div nr as bigint)"
            ).alias("presence_ppm"),
        )
        .orderBy("pkey")
    )


Q_PROPS_KEY_PROFILE_SQL = """
with t as (select props from events),
n as (select count(*) nr from t),
kv as (
  select u.pkey, json_extract_string(props, '$.' || u.pkey) val
  from t, unnest(json_keys(props)) as u(pkey)
)
select pkey, count(*)::BIGINT n_present,
       sum((val is null)::INT)::BIGINT n_null_value,
       count(distinct val)::BIGINT n_distinct,
       ((count(*)::HUGEINT * 1000000) // any_value(n.nr))::BIGINT
         presence_ppm
from kv cross join n
group by pkey order by pkey
"""


def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto-class) customer segmentation: class A = customers
    covering the top 80% of revenue, B = next 15%, C = the tail — the
    inventory-management classic, and in a data pipeline the "which
    20% of sources carry 80% of tokens" capping decision. One row per
    class with exact customer counts, revenue, and share in ppm.

    Class boundaries are value-based (every customer with the same
    revenue gets the same class — deterministic under ties), computed
    from the DISTINCT-REVENUE histogram: revenue strictly above value
    v is T − prefix(v) − c_v·v, and the strict-prefix sums come from
    ``scale.sharded_prefix_sums`` — NO single-partition window even
    though per-customer revenue is ~all-distinct (the
    ``gini_concentration`` lesson). Everything is integer: the 80/95%
    cuts compare 20·above vs 4·T and 20·above vs 1·T."""
    dec = "decimal(38,0)"
    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("v")
        )
    )
    h = (
        per.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cv", (F.col("c") * F.col("v")).cast("bigint"))
    )
    hp = scale.sharded_prefix_sums(h, "v", ["c", "cv"])
    tot = hp.agg(
        F.sum(F.col("cv").cast(dec)).alias("t")
    )
    cls = hp.crossJoin(F.broadcast(tot)).select(
        "v",
        "c",
        "cv",
        # revenue strictly ABOVE this value (desc-order prefix)
        (F.col("t") - F.col("pre_cv").cast(dec) - F.col("cv").cast(dec))
        .alias("above"),
        "t",
    ).select(
        "v",
        "c",
        "cv",
        F.when(F.lit(20) * F.col("above") < F.lit(16) * F.col("t"), "A")
        .when(F.lit(20) * F.col("above") < F.lit(19) * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    out = cls.groupBy("abc_class").agg(
        F.sum("c").cast("bigint").alias("n_customers"),
        F.sum(F.col("cv").cast(dec)).cast("bigint").alias("revenue_cents"),
    )
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_customers",
            "revenue_cents",
            F.expr(
                "cast((cast(revenue_cents as decimal(38,0)) * 1000000)"
                " div t as bigint)"
            ).alias("revenue_share_ppm"),
        )
        .orderBy("abc_class")
    )


Q_ABC_ANALYSIS_SQL = """
with per as (
  select o_custkey, sum(round(o_totalprice * 100, 0)::BIGINT) v
  from orders group by 1
),
h as (
  select v, count(*)::HUGEINT c, (count(*)::HUGEINT * v) cv
  from per group by v
),
hp as (
  select v, c, cv,
         coalesce(sum(cv) over (order by v rows between unbounded preceding
                                and 1 preceding), 0) pre_cv
  from h
),
tot as (select sum(cv) t from h),
cls as (
  select v, c, cv,
         case when 20 * (t - pre_cv - cv) < 16 * t then 'A'
              when 20 * (t - pre_cv - cv) < 19 * t then 'B'
              else 'C' end abc_class
  from hp cross join tot
)
select abc_class, sum(c)::BIGINT n_customers, sum(cv)::BIGINT revenue_cents,
       ((sum(cv)::HUGEINT * 1000000) // any_value(t))::BIGINT
         revenue_share_ppm
from cls cross join tot
group by abc_class order by abc_class
"""


def q_psi_drift(
    spark: SparkSession, sf_dir: str, bins: int = 10
) -> DataFrame:
    """Population Stability Index between two halves of the corpus —
    the standard distribution-drift score (credit-scoring lineage;
    PSI = Σ (p_i − q_i)·ln(p_i/q_i) over fixed bins; < 0.1 stable,
    > 0.2 investigate) for scalar columns, here demonstrated on order
    value and document token count split by id parity (the stand-in
    for yesterday/today snapshots). The scalar sibling of
    ``embedding_drift``: the monitor that catches "the new crawl's
    docs are suddenly short" before training does.

    Determinism: equi-width integer bins from one 1-row min/max agg
    (the ``pareto_frontier`` bucket rule); Laplace-smoothed bin shares
    p, q from exact counts; each bin's PSI term is quantized to
    micro-units BEFORE the sum (the ``km_retention`` ln rule), so the
    total is an exact integer sum in both engines.

    Scale: per dimension, one data-sized aggregate (value → bin →
    count-per-(bin, half)); everything after runs on the <= ``bins``-row
    grid."""
    dec = "decimal(38,0)"

    def psi(vals: DataFrame, dim: str) -> DataFrame:
        rng = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        b = vals.crossJoin(F.broadcast(rng)).select(
            F.expr(
                "cast((v - lo) div ((hi - lo) div {b} + 1) as int)".format(
                    b=bins
                )
            ).alias("bin"),
            "side",
        )
        g = b.groupBy("bin").agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cb"),
        )
        tot = g.agg(
            F.sum("ca").alias("na"),
            F.sum("cb").alias("nb"),
            F.count(F.lit(1)).alias("k"),
        )
        term = (
            g.crossJoin(F.broadcast(tot))
            .select(
                "ca",
                "cb",
                "na",
                "nb",
                F.expr(
                    "round((((ca + 1) / cast(na + k as double))"
                    "      - ((cb + 1) / cast(nb + k as double)))"
                    " * ln(((ca + 1) / cast(na + k as double))"
                    "      / ((cb + 1) / cast(nb + k as double)))"
                    " * 1e6, 0)"
                )
                .cast("long")
                .alias("t_u"),
            )
        )
        return term.agg(
            F.lit(dim).alias("dimension"),
            F.sum(F.col("ca").cast(dec)).cast("bigint").alias("n_a"),
            F.sum(F.col("cb").cast(dec)).cast("bigint").alias("n_b"),
            F.round(F.sum("t_u") / F.lit(1e6), 6).alias("psi"),
        )

    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.expr("pmod(o_orderkey, 2)").cast("int").alias("side"),
    )
    d = load(spark, sf_dir, "documents").select(
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        )
        .cast("long")
        .alias("v"),
        F.expr("pmod(doc_id, 2)").cast("int").alias("side"),
    )
    return (
        psi(o, "order_value_cents")
        .unionAll(psi(d, "doc_tokens"))
        .orderBy("dimension")
    )


Q_PSI_DRIFT_SQL = """
with o as (
  select round(o_totalprice * 100, 0)::BIGINT v,
         (o_orderkey % 2)::INT side from orders
),
d as (
  select len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT v,
         (doc_id % 2)::INT side from documents
),
ro as (select min(v) lo, max(v) hi from o),
rd as (select min(v) lo, max(v) hi from d),
go as (
  select ((v - lo) // ((hi - lo) // 10 + 1)) bn,
         sum(case when side = 0 then 1 else 0 end) ca,
         sum(case when side = 1 then 1 else 0 end) cb
  from o cross join ro group by 1
),
gd as (
  select ((v - lo) // ((hi - lo) // 10 + 1)) bn,
         sum(case when side = 0 then 1 else 0 end) ca,
         sum(case when side = 1 then 1 else 0 end) cb
  from d cross join rd group by 1
),
t_o as (
  select ca, cb,
         sum(ca) over () na, sum(cb) over () nb, count(*) over () k
  from go
),
t_d as (
  select ca, cb,
         sum(ca) over () na, sum(cb) over () nb, count(*) over () k
  from gd
),
p_o as (
  select sum(ca)::BIGINT n_a, sum(cb)::BIGINT n_b,
         sum(round((((ca + 1) / (na + k)::DOUBLE)
                    - ((cb + 1) / (nb + k)::DOUBLE))
               * ln(((ca + 1) / (na + k)::DOUBLE)
                    / ((cb + 1) / (nb + k)::DOUBLE))
               * 1e6, 0)::BIGINT) t_u
  from t_o
),
p_d as (
  select sum(ca)::BIGINT n_a, sum(cb)::BIGINT n_b,
         sum(round((((ca + 1) / (na + k)::DOUBLE)
                    - ((cb + 1) / (nb + k)::DOUBLE))
               * ln(((ca + 1) / (na + k)::DOUBLE)
                    / ((cb + 1) / (nb + k)::DOUBLE))
               * 1e6, 0)::BIGINT) t_u
  from t_d
)
select 'doc_tokens' dimension, n_a, n_b, round(t_u / 1e6, 6) psi from p_d
union all
select 'order_value_cents', n_a, n_b, round(t_u / 1e6, 6) from p_o
order by dimension
"""


def q_nb_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the Naive Bayes language classifier — chance-
    corrected agreement (Cohen 1960): po = observed agreement, pe =
    expected agreement from the marginals, kappa = (po-pe)/(1-pe). The
    one-number answer to "is this classifier better than its class
    prior" that accuracy alone fakes on skewed label mixes — the gate a
    curation pipeline checks before trusting classifier-filtered data.

    Built on the SAME confusion matrix as ``lang_nb_confusion`` (one
    composed plan); all products are exact decimal(38,0) integers
    (n² at 10¹¹ docs overflows a long), ONE double division per
    statistic, round(6). Degenerate single-class corpora (pe = 1) are
    out of contract.

    Scale: everything after the confusion matrix is |langs|²-sized."""
    dec = "decimal(38,0)"
    cm = _tracked_persist(q_lang_nb_confusion(spark, sf_dir))
    tot = cm.agg(
        F.sum("n_docs").alias("n"),
        F.sum(
            F.when(
                F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")
            ).otherwise(F.lit(0))
        ).alias("agree"),
    )
    r = cm.groupBy("true_lang").agg(F.sum("n_docs").alias("nr"))
    c = cm.groupBy("pred_lang").agg(F.sum("n_docs").alias("nc"))
    s = (
        r.join(c, r.true_lang == c.pred_lang)
        .agg(
            F.coalesce(
                F.sum(F.col("nr").cast(dec) * F.col("nc").cast(dec)),
                F.lit(0).cast(dec),
            ).alias("sv")
        )
    )
    nd = F.col("n").cast(dec)
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("agree").cast("bigint").alias("n_agree"),
        F.round(
            F.col("agree").cast("double") / F.col("n").cast("double"), 6
        ).alias("po"),
        F.round(F.col("sv").cast("double") / (nd * nd).cast("double"), 6).alias(
            "pe"
        ),
        F.round(
            (F.col("agree").cast(dec) * nd - F.col("sv")).cast("double")
            / (nd * nd - F.col("sv")).cast("double"),
            6,
        ).alias("kappa"),
    )
