"""Text analysis: token stats, TF-IDF/BM25, surprisal/entropy, readability, BPE, keyword extraction, record linkage.

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
from bamboo_spark._localdf import local_df as _local_df


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return text.add_text_stats(d)


Q_TEXT_STATS_SQL = """
select doc_id,
       len(string_split(text, ' '))::BIGINT n_tokens,
       length(text)::BIGINT n_chars,
       round(len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' '))::DOUBLE, 6) distinct_ratio,
       {lang} lang_pred,
       {quality} quality
from documents order by doc_id
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_expr())


Q_FINGERPRINT_SQL = """
select doc_id, {fp} fingerprint from documents order by doc_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: URLs, emails, phone numbers →
    typed placeholders, plus a per-doc hit count — pure regexp_replace/
    regexp_count (codegen, scan-speed; backslash-free patterns so the
    Spark and DuckDB regex literals are byte-identical). The synthetic
    corpus carries no PII, so the query plants a deterministic
    id-derived contact line first — the redaction itself is what's
    value-checked."""
    d = load(spark, sf_dir, "documents")
    raw = (
        "concat('contact user', cast(doc_id as string), "
        "'@mail.example.com or visit https://example.org/d/', "
        "cast(doc_id as string), ' call 555-', "
        "lpad(cast(doc_id % 1000 as string), 3, '0'), '-0199 ', text)"
    )
    return d.selectExpr(
        "doc_id",
        "%s as scrubbed" % text.scrub_pii_sql(raw),
        "cast(%s as bigint) as n_pii" % text.pii_count_sql(raw),
    )


Q_PII_SCRUB_SQL = """
with raw as (
  select doc_id,
         'contact user' || doc_id::VARCHAR ||
         '@mail.example.com or visit https://example.org/d/' ||
         doc_id::VARCHAR || ' call 555-' ||
         lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199 ' || text r
  from documents
)
select doc_id, {scrub} scrubbed, ({cnt})::BIGINT n_pii
from raw order by doc_id
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution (bits) - the
    low-entropy signal quality filters use to drop templated/repetitive
    docs. One doc_id-keyed two-level aggregate, map-combined:
    H = log2(n) - sum(c*log2(c))/n over per-token counts c."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr("doc_id", "explode(split(text, ' ')) as t")
    per = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .select("doc_id", "n_tokens", "n_distinct", "entropy")
    )


Q_TOKEN_ENTROPY_SQL = """
with tok as (select doc_id, unnest(string_split(text, ' ')) t from documents),
per as (select doc_id, t, count(*) c from tok group by doc_id, t)
select doc_id, sum(c)::BIGINT n_tokens, count(*)::BIGINT n_distinct,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) entropy
from per group by doc_id
order by doc_id
"""


def q_unigram_surprisal(
    spark: SparkSession, sf_dir: str, top_v: int | None = None
) -> DataFrame:
    """CCNet-style unigram LM quality score: train a unigram model on
    the corpus itself (token -> ln(count/total)), then score each doc
    by its mean token log-probability. Low |lp_mean| = common/templated
    text, high = rare-token-heavy - the standard perplexity-filter
    signal, reduced to its shuffle-friendly unigram core. Two aggs (one
    token-keyed, one doc-keyed) + a vocab lookup join; the vocab table
    is far smaller than the token stream, so Catalyst broadcasts it.

    The corpus total is a SCALAR AGGREGATE joined back via a broadcast
    cross join (one row) - never a global window, so no stage is ever
    single-partition. With ``top_v`` set, the vocab is capped to the V
    most frequent tokens (deterministic count-desc/token-asc order) and
    every other token scores at the OOV floor ln(1/total): that bounds
    the broadcast at 100 TB where the distinct-token table is billions
    of rows. Default (gate form) is the full self-trained vocab, which
    keeps the oracle closed-form. Per-token lp rounds to 9 (same value
    both engines), the doc mean to 6 (absorbs float sum-order
    differences)."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr("doc_id", "explode(split(text, ' ')) as t")
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("_corpus_total"))
    if top_v is None:
        lp = counts.crossJoin(F.broadcast(total)).select(
            "t",
            F.round(
                F.log(F.col("c").cast("double") / F.col("_corpus_total")), 9
            ).alias("lp"),
        )
        # full-vocab path: leave the lookup-join strategy to Catalyst/AQE
        # (a self-trained vocab can outgrow a forced broadcast)
        scored = tok.join(lp, "t")
    else:
        kept = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_v)
        lp = kept.crossJoin(F.broadcast(total)).select(
            "t",
            F.round(
                F.log(F.col("c").cast("double") / F.col("_corpus_total")), 9
            ).alias("lp"),
        )
        floor = total.select(
            F.round(F.log(F.lit(1.0) / F.col("_corpus_total")), 9).alias("_oov_lp")
        )
        scored = (
            tok.join(F.broadcast(lp), "t", "left")
            .crossJoin(F.broadcast(floor))
            .withColumn("lp", F.coalesce("lp", "_oov_lp"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("lp_mean"),
        )
        .select("doc_id", "n_tokens", "lp_mean")
    )


Q_UNIGRAM_SURPRISAL_SQL = """
with tok as (select doc_id, unnest(string_split(text, ' ')) as t from documents),
counts as (select t, count(*) c from tok group by t),
lp as (select t, round(ln(c::DOUBLE / (sum(c) over ())::DOUBLE), 9) lp from counts)
select doc_id, count(*)::BIGINT n_tokens, round(avg(lp), 6) lp_mean
from tok join lp using (t)
group by doc_id
"""


def q_dsir_weights(
    spark: SparkSession, sf_dir: str, top_v: int | None = None, alpha: float = 0.5
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, reduced to its
    unigram core): treat the lang='en' slice as the target domain,
    estimate smoothed unigram distributions for target and raw corpus,
    and score every doc by its summed token log-likelihood ratio
    ln p_T(t) - ln p_R(t). High dsir_logw = looks like the target
    domain — the importance-resampling signal for data selection.

    One token-keyed aggregate computes BOTH distributions (c_raw =
    count, c_target = conditional sum — no second pass over the token
    stream), the three totals are a scalar aggregate broadcast back via
    cross join (never a global window), and the per-doc score is one
    doc-keyed agg. With ``top_v`` the vocab caps at the V most frequent
    tokens and everything else scores at the closed-form OOV floor
    ln((R+aV)/(T+aV)) — the bounded-broadcast shape for a
    billions-of-tokens vocab at 100 TB. Laplace-style ``alpha``
    smoothing keeps target-absent tokens finite."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr(
        "doc_id",
        "cast(lang = 'en' as long) as is_t",
        "explode(split(text, ' ')) as t",
    )
    counts = tok.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("c_r"),
        F.sum("is_t").cast("double").alias("c_t"),
    )
    tot = counts.agg(
        F.sum("c_r").alias("_r_tot"),
        F.sum("c_t").alias("_t_tot"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    a = F.lit(float(alpha))
    # per-token LLR in integer NANO-units: round-9 absorbs last-ulp libm
    # differences, and summing longs (not doubles) makes the per-doc
    # reduction exact and order-independent — bit-identical on any
    # partitioning and in the oracle
    llr_expr = (
        F.round(
            F.round(
                F.log((F.col("c_t") + a) / (F.col("_t_tot") + a * F.col("_v")))
                - F.log((F.col("c_r") + a) / (F.col("_r_tot") + a * F.col("_v"))),
                9,
            )
            * F.lit(1e9),
            0,
        )
        .cast("long")
        .alias("llr")
    )
    if top_v is None:
        llr = counts.crossJoin(F.broadcast(tot)).select("t", llr_expr)
        scored = tok.join(llr, "t")
    else:
        kept = counts.orderBy(F.col("c_r").desc(), F.col("t").asc()).limit(top_v)
        llr = kept.crossJoin(F.broadcast(tot)).select("t", llr_expr)
        floor = tot.select(
            F.round(
                F.round(
                    F.log(
                        (F.col("_r_tot") + a * F.col("_v"))
                        / (F.col("_t_tot") + a * F.col("_v"))
                    ),
                    9,
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("_oov_llr")
        )
        scored = (
            tok.join(F.broadcast(llr), "t", "left")
            .crossJoin(F.broadcast(floor))
            .withColumn("llr", F.coalesce("llr", "_oov_llr"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("llr").cast("double") / F.lit(1e9), 6).alias("dsir_logw"),
        )
        .select("doc_id", "n_tokens", "dsir_logw")
    )


Q_DSIR_SQL = """
with tok as (
  select doc_id, (lang = 'en')::int is_t, unnest(string_split(text, ' ')) t
  from documents
),
counts as (
  select t, count(*)::DOUBLE c_r, sum(is_t)::DOUBLE c_t from tok group by t
),
tot as (
  select sum(c_r) r_tot, sum(c_t) t_tot, count(*)::DOUBLE v from counts
),
llr as (
  select t, round(round(ln((c_t + 0.5) / (t_tot + 0.5 * v))
                      - ln((c_r + 0.5) / (r_tot + 0.5 * v)), 9)
                  * 1e9, 0)::BIGINT llr
  from counts, tot
)
select doc_id, count(*)::BIGINT n_tokens,
       round(sum(llr)::DOUBLE / 1e9, 6) dsir_logw
from tok join llr using (t)
group by doc_id order by doc_id
"""


def q_bigram_surprisal(
    spark: SparkSession, sf_dir: str, lam: float = 0.75, top_v: int | None = None
) -> DataFrame:
    """KenLM-lite perplexity filter: an interpolated bigram LM trained
    on the corpus itself — p(w|u) = lam * c(uw)/c(u) + (1-lam) *
    c(w)/N — scoring each doc by mean bigram log-probability. The
    stronger cousin of ``unigram_surprisal``: templated text scores
    near 0, incoherent token salad scores very negative.

    Shape: bigrams come from array expressions (no window, no
    self-join for adjacency), both count tables are map-combined aggs,
    the model joins are token-/bigram-keyed hash joins (AQE broadcasts
    the vocab side while it fits), and the per-doc reduction sums exact
    integer nano-units so the result is partitioning-independent.

    ``top_v`` caps the BIGRAM table at the V most frequent bigrams
    (deterministic count-desc/bigram-asc TakeOrdered); an out-of-vocab
    bigram backs off to the unigram half of the interpolation,
    ln((1-lam)·c(w)/N) — the bounded-broadcast shape at 100 TB where
    the distinct-bigram table is far larger than the token vocab.
    Default (gate form) is the full closed-form model."""
    d = load(spark, sf_dir, "documents")
    sh2 = text.word_shingles_sql("split(text, ' ')", 2)
    big = d.selectExpr("doc_id", "explode(%s) as bg" % sh2)
    uni = (
        d.selectExpr("explode(split(text, ' ')) as t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    n_tot = uni.agg(F.sum("c1").alias("_n")).select(
        F.col("_n").cast("double").alias("_n")
    )
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    if top_v is not None:
        c2 = c2.orderBy(F.col("c2").desc(), F.col("bg").asc()).limit(top_v)
    lm = (
        c2.selectExpr("bg", "c2", "split(bg, ' ')[0] as prev", "split(bg, ' ')[1] as cur")
        .join(uni.select(F.col("t").alias("prev"), F.col("c1").alias("c_prev")), "prev")
        .join(uni.select(F.col("t").alias("cur"), F.col("c1").alias("c_cur")), "cur")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "bg",
            F.round(
                F.round(
                    F.log(
                        F.lit(float(lam)) * F.col("c2") / F.col("c_prev")
                        + F.lit(1.0 - float(lam)) * F.col("c_cur") / F.col("_n")
                    ),
                    9,
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    if top_v is None:
        scored = big.join(lm, "bg")
    else:
        # OOV bigram → unigram backoff ln((1-lam)·c(cur)/N); the uni
        # table is token-vocab-sized (broadcastable long after the
        # bigram table isn't)
        floor = (
            uni.crossJoin(F.broadcast(n_tot))
            .select(
                F.col("t").alias("cur"),
                F.round(
                    F.round(
                        F.log(
                            F.lit(1.0 - float(lam)) * F.col("c1") / F.col("_n")
                        ),
                        9,
                    )
                    * F.lit(1e9),
                    0,
                )
                .cast("long")
                .alias("_oov_lp"),
            )
        )
        scored = (
            big.join(F.broadcast(lm), "bg", "left")
            .withColumn("cur", F.expr("split(bg, ' ')[1]"))
            .join(F.broadcast(floor), "cur")
            .withColumn("lp", F.coalesce("lp", "_oov_lp"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("lp").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
            ).alias("lp_mean"),
        )
        .select("doc_id", "n_bigrams", "lp_mean")
    )


Q_BIGRAM_SURPRISAL_SQL = """
with docs_t as (select doc_id, string_split(text, ' ') toks from documents),
big as (
  select doc_id, unnest({sh2}) bg from docs_t
),
uni as (
  select t, count(*)::DOUBLE c1
  from (select unnest(toks) t from docs_t) group by t
),
tot as (select sum(c1) n from uni),
c2 as (select bg, count(*)::DOUBLE c2 from big group by bg),
lm as (
  select c2.bg,
         round(round(ln({lam} * c2.c2 / pu.c1 + {one_m_lam} * cu.c1 / tot.n), 9)
               * 1e9, 0)::BIGINT lp
  from c2
  join uni pu on pu.t = string_split(c2.bg, ' ')[1]
  join uni cu on cu.t = string_split(c2.bg, ' ')[2]
  cross join tot
)
select doc_id, count(*)::BIGINT n_bigrams,
       round(sum(lp)::DOUBLE / 1e9 / count(*), 6) lp_mean
from big join lm using (bg)
group by doc_id order by doc_id
"""


def q_token_zipf(spark: SparkSession, sf_dir: str, top_n: int = 50) -> DataFrame:
    """Corpus token-frequency (Zipf) curve: the ``top_n`` most frequent
    tokens with rank, count, share, and cumulative share — the vocab
    health monitor (a too-flat head = templated corpus; a cum_share
    that saturates early = low diversity). The distributed part is one
    map-combined token count + a partial top-k; the cumulative sum runs
    driver-side over exactly ``top_n`` collected rows (metadata-sized —
    never a single-partition window over the full vocab)."""
    d = load(spark, sf_dir, "documents")
    # persisted: the token-count shuffle feeds two actions (total +
    # top-N) — without it the corpus explode/agg executes twice
    counts = _tracked_persist(
        d.selectExpr("explode(split(text, ' ')) as t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c")).collect()[0][0]
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_n).collect()

    def r6(x: float) -> float:
        return _round_half_away(x, 6)

    rows, cum = [], 0
    for i, r in enumerate(top):
        cum += r["c"]
        rows.append(
            (
                i + 1,
                r["t"],
                int(r["c"]),
                r6(r["c"] / float(total)),
                r6(cum / float(total)),
            )
        )
    return _local_df(
        spark, rows, "rank long, token string, c long, share double, cum_share double"
    )


Q_TOKEN_ZIPF_SQL = """
with tok as (select unnest(string_split(text, ' ')) t from documents),
c as (select t, count(*) c from tok group by t),
tot as (select sum(c)::DOUBLE total from c),
top as (
  select t, c, row_number() over (order by c desc, t asc) rank
  from c order by c desc, t asc limit {n}
)
select rank::BIGINT rank, t token, c::BIGINT c,
       round(c / total, 6) as "share",
       round((sum(c) over (order by rank))::DOUBLE / total, 6) cum_share
from top cross join tot
order by rank
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style repetition filters):
    duplicate bigram/trigram fraction + the hottest trigram's
    multiplicity. Bigram stats are pure array expressions (scan-speed);
    the trigram multiplicity needs a per-(doc, gram) count — both aggs
    key on doc_id first, so the shuffle is map-combined and
    skew-free."""
    d = load(spark, sf_dir, "documents")
    sh2 = text.word_shingles_sql("toks", 2)
    sh3 = text.word_shingles_sql("toks", 3)
    staged = d.selectExpr("doc_id", "split(text, ' ') as toks")
    big = staged.selectExpr(
        "doc_id",
        "size(%s) as n2" % sh2,
        "size(array_distinct(%s)) as d2" % sh2,
    )
    tri = staged.selectExpr("doc_id", "explode(%s) as t" % sh3)
    s3 = (
        tri.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n3"),
            F.count(F.lit(1)).alias("d3"),
            F.max("c").alias("max_rep"),
        )
    )
    return big.join(s3, "doc_id").selectExpr(
        "doc_id",
        "round(1.0 - cast(d2 as double) / cast(n2 as double), 6)"
        " as dup_bigram_frac",
        "round(1.0 - cast(d3 as double) / cast(n3 as double), 6)"
        " as dup_trigram_frac",
        "cast(max_rep as bigint) as max_trigram_reps",
    )


Q_REPETITION_SQL = """
with toks as (select doc_id, string_split(text, ' ') toks from documents),
b as (
  select doc_id, len({sh2}) n2, len(list_distinct({sh2})) d2 from toks
),
t3 as (select doc_id, unnest({sh3}) t from toks),
per as (select doc_id, t, count(*) c from t3 group by doc_id, t),
s3 as (
  select doc_id, sum(c) n3, count(*) d3, max(c) max_rep from per group by doc_id
)
select b.doc_id,
       round(1.0 - d2::DOUBLE / n2::DOUBLE, 6) dup_bigram_frac,
       round(1.0 - d3::DOUBLE / n3::DOUBLE, 6) dup_trigram_frac,
       max_rep::BIGINT max_trigram_reps
from b join s3 using (doc_id)
order by doc_id
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules composite quality filter: every doc with its stats,
    a keep flag, and a drop_reasons audit trail. Pure scan-speed
    per-row arithmetic — zero shuffles, column-pruned to
    (doc_id, text); at 100 TB this runs at parquet-read throughput."""
    d = load(spark, sf_dir, "documents")
    return text.gopher_filter(d)


def q_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE length filter: each doc is judged against
    its own source's p05/p95 token-count band instead of one global
    threshold (a fixed cut that suits web text amputates code or chat
    transcripts; per-stratum quantiles track each distribution). Exact
    interpolated percentiles (matches quantile_cont) per source — a
    map-combined agg over sources — then a broadcast join back; flags,
    not deletion, so thresholds stay auditable. At 100 TB switch the
    percentile to the mergeable t-digest sketch, same plan shape."""
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    bounds = lens.groupBy("source").agg(
        F.round(F.expr("percentile(n_tokens, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 4).alias("hi"),
    )
    return lens.join(F.broadcast(bounds), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "lo",
        "hi",
        ((F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")))
        .cast("int")
        .alias("keep"),
    )


Q_ADAPTIVE_LENGTH_SQL = """
with l as (
  select doc_id, source, len(string_split(text, ' '))::BIGINT n_tokens
  from documents
),
b as (
  select source,
         round(quantile_cont(n_tokens, 0.05), 4) lo,
         round(quantile_cont(n_tokens, 0.95), 4) hi
  from l group by source
)
select doc_id, l.source, n_tokens, lo, hi,
       (n_tokens >= lo and n_tokens <= hi)::INT keep
from l join b using (source) order by doc_id
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and BPE-style
    pre-tokens (letter runs / digits / punctuation) — the
    tokens-per-doc accounting a training-data pipeline budgets with."""
    d = load(spark, sf_dir, "documents")
    ws = text.token_count("text")
    bpe = text.bpe_token_count("text")
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(
            F.length("text").cast("double") / F.greatest(bpe, F.lit(1)).cast("double"),
            6,
        ).alias("chars_per_token"),
    )


Q_TOKEN_COUNTS_SQL = """
select doc_id,
       len(string_split(text, ' '))::BIGINT ws_tokens,
       {bpe} bpe_tokens,
       round(length(text)::DOUBLE / greatest({bpe}, 1)::DOUBLE, 6) chars_per_token
from documents order by doc_id
"""


# ============================================= text corpus analytics


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-document top-3 terms by tf·ln(N/df). Three shuffles,
    each on a small key domain: (doc_id, token) for tf, token for df,
    doc_id for the top-k window. df is joined back via broadcast (the
    vocabulary is tiny relative to the corpus — at 100 TB you'd still
    broadcast the df table or store it as a dict sketch). N rides along
    as a broadcast scalar, not a driver-side collect."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("nd").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.where(F.col("doc_id") < 100)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("doc_id", "rn", "token", "tf", "df", "tfidf")
    )


Q_TFIDF_SQL = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) token from documents
),
tf as (select doc_id, token, count(*) tf from tok group by 1, 2),
df as (select token, count(*) df from tf group by 1),
n as (select count(*) nd from documents)
select doc_id, rn, token, tf, df, tfidf
from (
  select doc_id, token, tf, df,
         round(tf::DOUBLE * ln(nd::DOUBLE / df::DOUBLE), 6) tfidf,
         row_number() over (partition by doc_id
                            order by round(tf::DOUBLE * ln(nd::DOUBLE / df::DOUBLE), 6) desc,
                                     token asc)::BIGINT rn
  from tf join df using (token) cross join n
  where doc_id < 100
)
where rn <= 3
order by doc_id, rn
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → document frequency + the
    head of its postings list (10 smallest doc_ids, comma-joined so the
    value hash is engine-neutral). The postings head is taken with a
    per-token window BEFORE the list aggregation, so no executor ever
    materializes a full posting list — the pattern that survives tokens
    appearing in billions of documents."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    df_ = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    head = (
        tok.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .groupBy("token")
        .agg(
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "postings_head"
            )
        )
    )
    return (
        df_.join(head, "token")
        .select("token", "df", "postings_head")
    )


Q_INVERTED_INDEX_SQL = """
with tok as (
  select distinct doc_id, unnest(string_split(text, ' ')) token from documents
),
df as (select token, count(*) df from tok group by 1),
head as (
  select token, string_agg(doc_id::VARCHAR, ',' order by doc_id) postings_head
  from (
    select token, doc_id,
           row_number() over (partition by token order by doc_id asc) rn
    from tok
  )
  where rn <= 10
  group by token
)
select token, df, postings_head
from df join head using (token)
order by token
"""


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters: top-10 tokens by corpus frequency.
    Exact counts via one (lang, token) shuffle — the key domain is
    |langs|×|vocab|, tiny regardless of corpus size, which is why exact
    beats a sketch here; swap in a count-min merge only if the vocab
    itself stops fitting."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 10)
        .select("lang", "rn", "token", "n")
    )


Q_HEAVY_HITTERS_SQL = """
select lang, rn, token, n
from (
  select lang, token, count(*) n,
         row_number() over (partition by lang
                            order by count(*) desc, token asc)::BIGINT rn
  from (select lang, unnest(string_split(text, ' ')) token from documents)
  group by lang, token
)
where rn <= 10
order by lang, rn
"""


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over fuzzy keys: all document pairs whose
    normalized 32-char title keys are within 3 Levenshtein edits —
    typo-tolerant record linkage (the dedup family catches rewrites;
    this catches TYPOS: OCR noise, fat-fingered titles, mojibake).

    Candidates come from PassJoin segment pigeonholing
    (:func:`bamboo_spark.operators.linkage.edit_distance_pairs`): each
    key is cut into d+1 segments, and a pair within d edits must share
    one segment VERBATIM at a ±d-shifted position — an exact-match
    equi-join that stays selective even on low-entropy corpora where
    q-gram prefixes collapse. Every candidate is verified with the
    banded O(d·n) ``levenshtein(a, b, 3)``. The oracle is the
    brute-force n² join — pruning is provably lossless, so they must
    agree exactly."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    return linkage.edit_distance_pairs(
        d, "doc_id", "title_key", max_dist=3
    ).orderBy("id_a", "id_b")


def q_record_linkage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy-key ingest: a NEW batch (doc_id >= 250) is
    linked against the stored corpus (doc_id < 250) by 32-char title
    key within 3 edits — the append-only twin of ``record_linkage``.
    Only the corpus's SEGMENT INDEX participates (persist it bucketed
    by (len, seg_no, content) in production); each ingest cuts O(batch)
    probes and equi-joins the index — the corpus is never re-paired.
    Oracle = brute-force new × corpus join; pruning is lossless."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    new = d.where(F.col("doc_id") >= 250)
    corpus = d.where(F.col("doc_id") < 250)
    return linkage.edit_distance_join(
        new, corpus, "doc_id", "title_key", max_dist=3
    ).orderBy("id_new", "id_corpus")


Q_RECORD_LINKAGE_INC_SQL = """
with k as (
  select doc_id as id, lower(substring(text, 1, 32)) as tk,
         length(lower(substring(text, 1, 32))) as ln
  from documents where text is not null
)
select n.id id_new, c.id id_corpus, levenshtein(n.tk, c.tk)::INT dist
from (select * from k where id >= 250) n
join (select * from k where id < 250) c
  on abs(n.ln - c.ln) <= 3
where levenshtein(n.tk, c.tk) <= 3
order by id_new, id_corpus
"""


Q_RECORD_LINKAGE_SQL = """
with k as (
  select doc_id as id, lower(substring(text, 1, 32)) as tk,
         length(lower(substring(text, 1, 32))) as ln
  from documents where text is not null
)
select a.id id_a, b.id id_b, levenshtein(a.tk, b.tk)::INT dist
from k a join k b
  on a.id < b.id and abs(a.ln - b.ln) <= 3
where levenshtein(a.tk, b.tk) <= 3
order by id_a, id_b
"""


_BM25_TERMS = ["hash", "join", "scan", "filter", "merge", "broadcast"]


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed search query —
    the retrieval scorer for corpus curation (rank training docs by
    closeness to a target domain) and for eval-set mining. Okapi
    parameters k1=1.2, b=0.75.

    Scale shape: the query's term list is a literal broadcast (an IN
    filter pushed into the token explode, so only matching-term rows
    survive the first aggregate); df comes off the tiny per-term table;
    N and avgdl ride one scalar aggregate broadcast back. Per-term
    scores round to 9 decimals and sum in integer nano-units, so the
    result is partitioning-independent and the oracle replays it
    bit-for-bit. Nothing doc-sized is ever collected or broadcast."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.size(F.split("text", " "))).cast("double").alias("_sdl"),
    )
    tf = (
        toks.where(F.col("token").isin(_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        9,
    )
    denom = F.col("tf") + 1.2 * (
        1.0 - 0.75 + 0.75 * F.col("dl") / (F.col("_sdl") / F.col("_n"))
    )
    term_score = F.round(idf * (F.col("tf") * 2.2) / denom, 9)
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            F.round(term_score * 1e9, 0).cast("long").alias("_nano"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(F.sum("_nano").cast("double") / 1e9, 6).alias("bm25"),
        )
        .orderBy("doc_id")
    )


Q_BM25_SQL = """
with toks as (
  select doc_id, unnest(string_split(text, ' ')) token from documents
),
dl as (select doc_id, len(string_split(text, ' ')) dl from documents),
stats as (
  select count(*)::DOUBLE n, sum(len(string_split(text, ' ')))::DOUBLE sdl
  from documents
),
tf as (
  select doc_id, token, count(*)::DOUBLE tf from toks
  where token in ({terms}) group by doc_id, token
),
dfreq as (select token, count(*)::DOUBLE df from tf group by token),
t as (
  select tf.doc_id,
         round(round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)), 9)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (s.sdl / s.n))),
               9) w
  from tf
  join dfreq d using (token)
  join dl on tf.doc_id = dl.doc_id
  cross join stats s
)
select doc_id, count(*)::BIGINT n_terms,
       round(sum(round(w * 1e9, 0)::BIGINT)::DOUBLE / 1e9, 6) bm25
from t group by doc_id order by doc_id
""".format(terms=", ".join("'%s'" % t for t in _BM25_TERMS))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training on-engine: the first 6 BPE merges over the
    corpus (Sennrich-style), trained on the vocabulary-bounded
    word-count table — see :mod:`bamboo_spark.operators.bpe`. Each
    round is one map-combined pair-count aggregate plus a 1-row argmax
    collect; merge application is a literal ``replace`` inside codegen.
    The oracle replays every round (same argmax tiebreak, same greedy
    left-to-right merge), so the learned merge table is value-checked,
    not just shape-checked."""
    d = load(spark, sf_dir, "documents")
    return bpe.bpe_train(d, "text", n_merges=6)


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-encode composition: per doc, whitespace words vs BPE
    tokens under the 6 learned merges — the honest corpus token budget
    (see :func:`bamboo_spark.operators.bpe.bpe_encode_counts`).
    Encoding is a broadcast join against the trained vocab table — the
    word-cache amortization a tokenizer service relies on; the corpus
    is scanned once."""
    d = load(spark, sf_dir, "documents")
    return bpe.bpe_encode_counts(d, "text", n_merges=6)


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: fuzzy-key pairs (PassJoin edit
    join, d ≤ 3 on 32-char title keys) → converged connected components
    → per-entity golden-record pick (lowest id = the component label).
    The composition a master-data pipeline runs: block, match, cluster,
    survivorship — each stage one of this engine's operators, the whole
    chain one Catalyst plan per superstep.

    Output: one row per doc that matched anything — (doc_id, entity_id,
    cluster_size, is_canonical). The oracle replays the brute-force
    pair join + a recursive-CTE transitive closure — candidate pruning
    AND the iterative clustering both land on the provable fixpoint."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    pairs = linkage.edit_distance_pairs(
        d, "doc_id", "title_key", max_dist=3
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = dedup.connected_components_converged(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            F.col("component").alias("entity_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("component")).cast("int").alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


def _entity_clusters_duck() -> str:
    pairs_cte = """
select a.id doc_a, b.id doc_b
from (select doc_id as id, lower(substring(text, 1, 32)) tk,
             length(lower(substring(text, 1, 32))) ln
      from documents where text is not null) a
join (select doc_id as id, lower(substring(text, 1, 32)) tk,
             length(lower(substring(text, 1, 32))) ln
      from documents where text is not null) b
  on a.id < b.id and abs(a.ln - b.ln) <= 3
where levenshtein(a.tk, b.tk) <= 3
"""
    fix = dedup.components_fixpoint_duck(pairs_cte).strip()
    # a CTE body may carry its own WITH RECURSIVE — nest the fixpoint
    # statement whole
    return """
with comp as materialized (
%s
)
select doc_id, component entity_id,
       (count(*) over (partition by component))::BIGINT cluster_size,
       (doc_id = component)::INT is_canonical
from comp order by doc_id
""" % fix


_PMI_TOP_V = 40


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence PMI over the top-V vocabulary: for every
    pair of top-40 tokens co-occurring in ≥ 5 documents,
    ln(N·c(a,b) / (c(a)·c(b))) on document-level presence — the
    collocation/phrase-mining signal (high PMI = the pair is a unit:
    "merge join", "hash join") and a redundancy feature for corpus
    analysis.

    Scale: the vocabulary is capped to top-V BEFORE any pairing (V
    broadcast as a literal-sized table), docs project to their ≤ V
    distinct top tokens, and pairs explode per doc as C(V,2)-bounded
    combinations — never token² over the corpus. Counts are exact
    integers; the log lands on round-9 so the oracle hash can gate
    it."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    ).where(F.col("t") != "")
    topv = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "t")
        .limit(_PMI_TOP_V)
    )
    ft = toks.join(F.broadcast(topv), "t")
    a = ft.select("doc_id", F.col("t").alias("ta"), F.col("df").alias("dfa"))
    b = ft.select("doc_id", F.col("t").alias("tb"), F.col("df").alias("dfb"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ab"),
            F.first("dfa").alias("dfa"),
            F.first("dfb").alias("dfb"),
        )
        .where(F.col("n_ab") >= 5)
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    pmi = F.round(
        F.log(
            F.col("_n")
            * F.col("n_ab").cast("double")
            / (F.col("dfa").cast("double") * F.col("dfb").cast("double"))
        ),
        9,
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .select("ta", "tb", "n_ab", pmi.alias("pmi"))
        .orderBy("ta", "tb")
    )


Q_TOKEN_PMI_SQL = """
with toks as (
  select distinct doc_id, t from (
    select doc_id, unnest(string_split(text, ' ')) t from documents
  ) where t != ''
),
topv as (
  select t, count(*)::BIGINT df from toks group by t
  order by df desc, t limit {v}
),
ft as (select toks.doc_id, toks.t, topv.df from toks join topv using (t)),
pairs as (
  select a.t ta, b.t tb, count(*)::BIGINT n_ab,
         any_value(a.df) dfa, any_value(b.df) dfb
  from ft a join ft b on a.doc_id = b.doc_id and a.t < b.t
  group by a.t, b.t
  having count(*) >= 5
),
n as (select count(*)::DOUBLE nn from documents)
select ta, tb, n_ab,
       round(ln(nn * n_ab::DOUBLE / (dfa::DOUBLE * dfb::DOUBLE)), 9) pmi
from pairs cross join n
order by ta, tb
""".format(v=_PMI_TOP_V)


def q_quality_deciles(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Global quality-score decile bucketing: exact decile thresholds
    of the Gopher-style quality score broadcast back over the corpus,
    then per (source, decile) counts — the "where does each source sit
    in the global quality distribution" grid that decides per-source
    sampling temperature.

    One global percentile aggregate (a 9-number broadcast), one
    scan-speed bucket assignment, one map-combined count. ``approx=
    True`` is the 100 TB mode: the exact ``percentile`` buffers every
    score in one reducer, ``approx_percentile`` is a mergeable sketch
    with map-side partials — the assignment pass is unchanged
    (error-bound-tested in pytest; exact mode stays oracle-gated)."""
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "source", text.quality_score("text").alias("q"))
    pf = "approx_percentile(q, %s, 10000)" if approx else "percentile(q, %s)"
    ths = scored.agg(
        *[
            F.round(F.expr(pf % (i / 10.0)), 6).alias("t%d" % i)
            for i in range(1, 10)
        ]
    )
    dec = F.lit(1)
    for i in range(1, 10):
        dec = dec + (F.col("q") >= F.col("t%d" % i)).cast("int")
    return (
        scored.crossJoin(F.broadcast(ths))
        .select("source", dec.cast("bigint").alias("decile"))
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("source", "decile")
    )


def q_chi2_terms(spark: SparkSession, sf_dir: str, top_k: int = 10) -> DataFrame:
    """Chi-square feature selection: the ``top_k`` most discriminative
    terms per language by the classic 2x2 chi-square statistic over
    DOCUMENT frequency (does this term appear in a doc, not how
    often). This is the standard term-selection step before training
    any text classifier, and doubles as a corpus-QA lens: a term whose
    chi2 explodes for one source/lang is a template artifact.

    Determinism: A/B/C/D are exact integer doc counts; the chi2
    numerator n*(AD-BC)^2 and denominator (A+B)(C+D)(A+C)(B+D) are
    exact decimal(38,0) products (n^5 fits: 10^7 docs -> 10^35), cast
    to double for ONE final division (the ``events_trend`` overflow
    rule), quantized to micro-units for the rank order so ties break
    on the term string identically in both engines.

    Scale shape: one distinct over (doc_id, lang, term) — the only
    doc-sized shuffle — then everything is vocabulary-sized: the
    (lang, term) grid aggregates map-combined, lang totals broadcast
    as |langs| rows, and the top-k per lang is ``ranked_head``'s
    partial WindowGroupLimit below the exchange, never a full sort."""
    from bamboo_spark.operators import scale

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = (
        d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    lt = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    t_tot = lt.groupBy("term").agg(F.sum("a").alias("df_total"))
    l_tot = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_tot = d.agg(F.count(F.lit(1)).alias("n"))
    dec = "decimal(38,0)"
    g = (
        lt.join(t_tot, "term")
        .where(F.col("df_total") >= 5)
        .join(F.broadcast(l_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "lang",
            "term",
            "a",
            "df_total",
            F.col("a").cast(dec).alias("da"),
            (F.col("df_total") - F.col("a")).cast(dec).alias("db"),
            (F.col("n_l") - F.col("a")).cast(dec).alias("dc"),
            (F.col("n") - F.col("n_l") - F.col("df_total") + F.col("a"))
            .cast(dec)
            .alias("dd"),
            F.col("n").cast(dec).alias("dn"),
        )
    )
    num = (
        F.col("dn")
        * (F.col("da") * F.col("dd") - F.col("db") * F.col("dc"))
        * (F.col("da") * F.col("dd") - F.col("db") * F.col("dc"))
    )
    den = (
        (F.col("da") + F.col("db"))
        * (F.col("dc") + F.col("dd"))
        * (F.col("da") + F.col("dc"))
        * (F.col("db") + F.col("dd"))
    )
    scored = g.select(
        "lang",
        "term",
        F.col("a").alias("df_lang"),
        "df_total",
        F.round(num.cast("double") / den.cast("double") * F.lit(1e6), 0)
        .cast("bigint")
        .alias("chi2_u"),
    )
    top = scale.ranked_head(
        scored,
        "lang",
        [F.col("chi2_u").desc(), F.col("term")],
        top_k,
        "rnk",
    )
    return top.select(
        "lang",
        "rnk",
        "term",
        "df_lang",
        "df_total",
        F.round(F.col("chi2_u") / F.lit(1e6), 6).alias("chi2"),
    ).orderBy("lang", "rnk")


Q_CHI2_TERMS_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select distinct doc_id, lang, t term
  from (select doc_id, lang, unnest(string_split(text, ' ')) t from d)
  where t <> ''
),
lt as (select lang, term, count(*)::BIGINT a from tok group by lang, term),
tt as (select term, sum(a)::BIGINT df_total from lt group by term),
ltot as (select lang, count(*)::BIGINT n_l from d group by lang),
ntot as (select count(*)::BIGINT n from d),
g as (
  select lt.lang, lt.term, lt.a, tt.df_total,
         lt.a::HUGEINT da, (tt.df_total - lt.a)::HUGEINT db,
         (ltot.n_l - lt.a)::HUGEINT dc,
         (ntot.n - ltot.n_l - tt.df_total + lt.a)::HUGEINT dd,
         ntot.n::HUGEINT dn
  from lt join tt using (term) join ltot using (lang) cross join ntot
  where tt.df_total >= 5
),
scored as (
  select lang, term, a df_lang, df_total,
         round((dn * (da * dd - db * dc) * (da * dd - db * dc))::DOUBLE
               / ((da + db) * (dc + dd) * (da + dc) * (db + dd))::DOUBLE
               * 1e6, 0)::BIGINT chi2_u
  from g
),
top as (
  select lang, term, df_lang, df_total, chi2_u,
         row_number() over (partition by lang
                            order by chi2_u desc, term) rnk
  from scored
)
select lang, rnk::BIGINT rnk, term, df_lang, df_total,
       round(chi2_u / 1e6, 6) chi2
from top where rnk <= 10 order by lang, rnk
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per (lang, source) — the curation
    lens that separates prose from boilerplate/code soup. Per doc:
    words (non-empty tokens), sentences (runs of .!? — floor 1),
    syllables (runs of [aeiouy] in the lowercased text — the standard
    cheap heuristic), then FRE = 206.835 - 1.015*(W/S) - 84.6*(Y/W).
    Grouped: doc counts, average words, average FRE, and the share of
    "plain English" docs (FRE >= 60) — a ready-made quality gate.

    Determinism: the three per-doc counts are exact integers, so the
    per-doc FRE doubles are bit-identical in both engines; each is
    quantized to integer micro-units BEFORE the group sums
    (quantize-then-sum), and each output divides exact integers once,
    round(6).

    Scale shape: pure scan-speed projection (regexp counts per row)
    into one map-combined aggregate over the small (lang, source)
    grid; no shuffle carries text."""
    d = load(spark, sf_dir, "documents").select(
        "lang", "source", F.lower(F.col("text")).alias("t")
    )
    per = d.select(
        "lang",
        "source",
        F.greatest(
            F.lit(1),
            F.size(F.filter(F.split("t", " "), lambda x: x != F.lit(""))),
        )
        .cast("bigint")
        .alias("w"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(t, '[.!?]+', 0)")),
        )
        .cast("bigint")
        .alias("s"),
        F.size(F.expr("regexp_extract_all(t, '[aeiouy]+', 0)"))
        .cast("bigint")
        .alias("y"),
    )
    scored = per.select(
        "lang",
        "source",
        "w",
        F.round(
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("w").cast("double") / F.col("s").cast("double"))
                - F.lit(84.6)
                * (F.col("y").cast("double") / F.col("w").cast("double"))
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("fre_u"),
    )
    return (
        scored.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_words"),
            F.round(
                F.sum("fre_u") / (F.count(F.lit(1)) * F.lit(1e6)), 6
            ).alias("avg_fre"),
            F.round(
                F.sum(
                    F.when(F.col("fre_u") >= 60000000, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("plain_share"),
        )
        .orderBy("lang", "source")
    )


Q_TEXT_READABILITY_SQL = """
with d as (select lang, source, lower(text) t from documents),
per as (
  select lang, source,
         greatest(1, len(list_filter(string_split(t, ' '),
                                     x -> x <> '')))::BIGINT w,
         greatest(1, len(regexp_extract_all(t, '[.!?]+')))::BIGINT s,
         len(regexp_extract_all(t, '[aeiouy]+'))::BIGINT y
  from d
),
scored as (
  select lang, source, w,
         round((206.835 - 1.015 * (w::DOUBLE / s::DOUBLE)
                - 84.6 * (y::DOUBLE / w::DOUBLE)) * 1e6, 0)::BIGINT fre_u
  from per
)
select lang, source, count(*)::BIGINT n_docs,
       round(sum(w)::DOUBLE / count(*), 6) avg_words,
       round(sum(fre_u) / (count(*) * 1e6), 6) avg_fre,
       round(sum(case when fre_u >= 60000000 then 1 else 0 end)::DOUBLE
             / count(*), 6) plain_share
from scored group by lang, source order by lang, source
"""


def q_vocab_growth(
    spark: SparkSession, sf_dir: str, n_buckets: int = 50
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct tokens
    vs cumulative token volume over ``n_buckets`` doc-id slices, plus
    the fitted Heaps exponent beta (slope of the log-log OLS). The
    corpus-scaling monitor that answers "does more data still buy new
    vocabulary, or are we re-crawling the same text?" — a flattening
    curve (beta -> 0) at the corpus tail is a staleness signal.

    Determinism: a token's arrival slice is the bucket of its MIN
    doc_id (an exact integer aggregate); bucket ids are integer range
    buckets from a 1-row broadcast min/max; cumulative sums are
    integers; the log-log regression quantizes ln(x)/ln(y) to integer
    micro-units per bucket BEFORE the OLS sufficient statistics, so
    the double sums never see order-dependent addition.

    Scale shape: the token scan and its min-doc_id aggregate are the
    only data-sized shuffles; everything after lives on the
    ``n_buckets``-row curve (prefix windows + one tiny OLS reduce,
    broadcast back as one row)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    rng = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    bexpr = "cast((doc_id - lo) div ((hi - lo) div {b} + 1) as bigint)".format(
        b=n_buckets
    )
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    toks_per_bucket = (
        tok.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    first_doc = tok.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    new_per_bucket = (
        first_doc.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    docs_per_bucket = (
        d.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        docs_per_bucket.join(toks_per_bucket, "b", "left")
        .join(new_per_bucket, "b", "left")
        .select(
            "b",
            F.sum("n_docs").over(wc).alias("cum_docs"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))
            .over(wc)
            .alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(wc)
            .alias("cum_vocab"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("new_vocab"),
        )
    )
    dec = "decimal(38,0)"
    pts = curve.where(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).select(
        F.round(F.log(F.col("cum_tokens").cast("double")) * 1e6, 0)
        .cast("long")
        .cast(dec)
        .alias("lx"),
        F.round(F.log(F.col("cum_vocab").cast("double")) * 1e6, 0)
        .cast("long")
        .cast(dec)
        .alias("ly"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    ).select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).cast("double"),
            6,
        ).alias("heaps_beta")
    )
    return (
        curve.crossJoin(F.broadcast(ols))
        .select(
            F.col("b").alias("bucket"),
            "cum_docs",
            "cum_tokens",
            "cum_vocab",
            "new_vocab",
            "heaps_beta",
        )
        .orderBy("bucket")
    )


Q_VOCAB_GROWTH_SQL = """
with d as (select doc_id, text from documents),
rng as (select min(doc_id) lo, max(doc_id) hi from d),
tok as (
  select doc_id, t from (
    select doc_id, unnest(string_split(text, ' ')) t from d
  ) where t <> ''
),
tb as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_tok
  from tok cross join rng group by 1
),
fd as (select t, min(doc_id) doc_id from tok group by t),
nb as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_new
  from fd cross join rng group by 1
),
db as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_docs
  from d cross join rng group by 1
),
curve as (
  select db.b,
         sum(db.n_docs) over w cum_docs,
         sum(coalesce(tb.n_tok, 0)) over w cum_tokens,
         sum(coalesce(nb.n_new, 0)) over w cum_vocab,
         coalesce(nb.n_new, 0) new_vocab
  from db left join tb using (b) left join nb using (b)
  window w as (order by db.b rows between unbounded preceding
               and current row)
),
pts as (
  select round(ln(cum_tokens::DOUBLE) * 1e6, 0)::HUGEINT lx,
         round(ln(cum_vocab::DOUBLE) * 1e6, 0)::HUGEINT ly
  from curve where cum_tokens > 0 and cum_vocab > 0
),
ols as (
  select round((count(*)::HUGEINT * sum(lx * ly) - sum(lx) * sum(ly))::DOUBLE
               / (count(*)::HUGEINT * sum(lx * lx)
                  - sum(lx) * sum(lx))::DOUBLE, 6) heaps_beta
  from pts
)
select b bucket, cum_docs::BIGINT cum_docs, cum_tokens::BIGINT cum_tokens,
       cum_vocab::BIGINT cum_vocab, new_vocab, ols.heaps_beta
from curve cross join ols order by bucket
"""


_JS_TOP_V = 2000


def q_source_term_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the distribution-shift matrix behind data-mixture
    decisions (Lin 1991): which sources are near-duplicates of each
    other's vocabulary and which contribute genuinely different text.
    The vocabulary is capped at the global top-``_JS_TOP_V`` tokens
    (count desc, token asc — deterministic); everything else collapses
    into a per-source ``<oov>`` bucket so every distribution is
    complete and the comparison grid is dense.

    Determinism: each term's JS contribution quantizes to integer
    NANO-units before the sum (probabilities are identical doubles in
    both engines — same counts, same division), so the per-pair total
    is an exact integer sum; round(6) once at the end.

    Scale shape: the token stream aggregates ONCE into (source, token)
    counts; everything after runs on the capped (V+1) x |sources| grid
    and its (V+1) x |sources|^2 pair expansion — metadata-sized for
    any real source count. Adding a source is O(grid), not O(corpus).
    """
    d = load(spark, sf_dir, "documents").select("source", "text")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    counts = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    top = (
        counts.groupBy("t")
        .agg(F.sum("c").alias("cn"))
        .orderBy(F.col("cn").desc(), F.col("t").asc())
        .limit(_JS_TOP_V)
        .select("t", F.lit(1).alias("_keep"))
    )
    mapped = (
        counts.join(F.broadcast(top), "t", "left")
        .select(
            "source",
            F.when(F.col("_keep").isNotNull(), F.col("t"))
            .otherwise(F.lit("<oov>"))
            .alias("t2"),
            "c",
        )
        .groupBy("source", "t2")
        .agg(F.sum("c").alias("c"))
    )
    tot = mapped.groupBy("source").agg(F.sum("c").alias("tot"))
    grid_t = mapped.select("t2").distinct()
    sources = tot
    dense = (
        grid_t.crossJoin(sources)
        .join(F.broadcast(mapped), ["source", "t2"], "left")
        .select(
            "source",
            "t2",
            (F.coalesce(F.col("c"), F.lit(0)) / F.col("tot")).alias("p"),
        )
    )
    a = dense.select(
        F.col("source").alias("source_a"), "t2", F.col("p").alias("pa")
    )
    b = dense.select(
        F.col("source").alias("source_b"), "t2", F.col("p").alias("pb")
    )
    # both sides are the (V+1) x |sources| grid — bounded by the
    # _JS_TOP_V cap, so the forced broadcast is size-safe by design
    pairs = a.join(F.broadcast(b), "t2").where(
        F.col("source_a") < F.col("source_b")
    )
    term = pairs.select(
        "source_a",
        "source_b",
        F.expr(
            "cast(round(0.5 * ("
            " case when pa > 0 then pa * ln(pa / ((pa + pb) / 2)) else 0 end"
            " + case when pb > 0 then pb * ln(pb / ((pa + pb) / 2)) else 0 end"
            ") * 1e9, 0) as bigint)"
        ).alias("u"),
    )
    return (
        term.groupBy("source_a", "source_b")
        .agg(F.round(F.sum("u") / F.lit(1e9), 6).alias("js_nats"))
        .orderBy("source_a", "source_b")
    )


Q_SOURCE_TERM_JS_SQL = f"""
with d as (select source, text from documents),
tok as (select source, unnest(string_split(text, ' ')) t from d),
tk as (select source, t from tok where t <> ''),
counts as (select source, t, count(*) c from tk group by 1, 2),
top as (
  select t, 1 as keep_ from (
    select t, sum(c) cn from counts group by t
    order by cn desc, t asc limit {_JS_TOP_V}
  )
),
mapped as (
  select source, case when top.keep_ is not null then counts.t
                      else '<oov>' end t2, sum(c) c
  from counts left join top on top.t = counts.t
  group by 1, 2
),
tot as (select source, sum(c) tot from mapped group by source),
grid_t as (select distinct t2 from mapped),
dense as (
  select tot.source, grid_t.t2,
         coalesce(m.c, 0) / tot.tot::DOUBLE p
  from grid_t cross join tot
  left join mapped m on m.source = tot.source and m.t2 = grid_t.t2
),
pairs as (
  select a.source source_a, b.source source_b, a.t2, a.p pa, b.p pb
  from dense a join dense b on a.t2 = b.t2 and a.source < b.source
),
term as (
  select source_a, source_b,
         round(0.5 * (
           case when pa > 0 then pa * ln(pa / ((pa + pb) / 2)) else 0 end
           + case when pb > 0 then pb * ln(pb / ((pa + pb) / 2)) else 0 end
         ) * 1e9, 0)::BIGINT u
  from pairs
)
select source_a, source_b, round(sum(u) / 1e9, 6) js_nats
from term group by 1, 2 order by 1, 2
"""


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") — corpus-level: candidate
    phrases are maximal stopword-free token runs (the islands between
    stopword delimiters), each word scores degree/frequency over the
    whole corpus, a phrase scores the sum of its words' scores, and the
    top 15 phrases by score come back with their occurrence counts.
    The metadata-enrichment stage that tags corpora with salient
    phrases — no model, pure counting.

    Determinism: word scores quantize to integer micro-units
    (degree*1e6 div freq) BEFORE summing, so phrase scores are exact
    integer sums and the ranking is engine-stable. Phrase building uses
    the classic gaps-and-islands running stopword count — a per-doc
    window, bounded per key; word stats are one vocab-bounded aggregate
    broadcast back; the top-15 is TakeOrderedAndProject."""
    sw = ("the", "a", "of", "and", "to")
    sw_list = ", ".join("'%s'" % s for s in sw)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "w"),
        )
        .where(F.col("w") != "")
        .withColumn("is_sw", F.expr("w in (%s)" % sw_list))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    isl = tok.withColumn(
        "isl", F.sum(F.col("is_sw").cast("int")).over(wdoc)
    ).where(~F.col("is_sw"))
    phr = isl.groupBy("doc_id", "isl").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(pos, w))), x -> x.w)"
        ).alias("words")
    )
    phr = _tracked_persist(
        phr.select(
            F.array_join("words", " ").alias("phrase"),
            F.size("words").alias("n_words"),
            F.explode("words").alias("w"),
        )
    )
    stats = (
        phr.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("degree"),
        )
        .select(
            "w",
            F.expr(
                "cast((cast(degree as decimal(38,0)) * 1000000) div freq"
                " as bigint)"
            ).alias("score_u"),
        )
    )
    scored = (
        phr.join(F.broadcast(stats), "w")
        .groupBy("phrase", "n_words")
        .agg(
            F.sum("score_u").alias("_tot"),
            F.count(F.lit(1)).alias("_wocc"),
        )
        # _tot summed over ALL occurrences of the phrase; one
        # occurrence's score = _tot / (occurrences); occurrences =
        # _wocc / n_words (each occurrence contributes n_words rows)
        .select(
            "phrase",
            F.col("n_words").cast("int").alias("n_words"),
            F.expr("cast(_tot div (_wocc div n_words) as bigint)").alias(
                "score_u"
            ),
            F.expr("cast(_wocc div n_words as bigint)").alias("n_occurrences"),
        )
        .orderBy(F.col("score_u").desc(), F.col("phrase").asc())
        .limit(15)
    )
    return scored


Q_RAKE_SQL = """
with tok as (
  select doc_id, w, pos,
         (w in ('the', 'a', 'of', 'and', 'to')) is_sw
  from (
    select doc_id,
           unnest(string_split(text, ' ')) w,
           generate_subscripts(string_split(text, ' '), 1) pos
    from documents
  ) where w <> ''
),
isl as (
  select doc_id, w, pos, is_sw,
         sum(is_sw::INT) over (partition by doc_id order by pos) isl
  from tok
),
phr0 as (
  select doc_id, isl,
         string_agg(w, ' ' order by pos) phrase,
         count(*) n_words
  from isl where not is_sw
  group by doc_id, isl
),
occ as (
  select phrase, n_words, unnest(string_split(phrase, ' ')) w from phr0
),
stats as (
  select w,
         ((sum(n_words)::HUGEINT * 1000000) // count(*))::BIGINT score_u
  from occ group by w
),
scored as (
  select o.phrase, o.n_words::INT n_words,
         (sum(s.score_u) // (count(*) // o.n_words))::BIGINT score_u,
         (count(*) // o.n_words)::BIGINT n_occurrences
  from occ o join stats s using (w)
  group by o.phrase, o.n_words
)
select phrase, n_words, score_u, n_occurrences
from scored order by score_u desc, phrase asc limit 15
"""


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram diversity for n = 1..4: distinct/total ratio in
    ppm — the distribution-collapse detector (the corpus-level
    statistic behind Self-BLEU): synthetic or template-heavy data shows
    diversity falling off a cliff as n grows, while organic text decays
    smoothly. The one-page answer to "did our generation/dedup pipeline
    collapse the long tail".

    One tokenize scan emits every n-gram TAGGED with its n (nested
    transform over the four sizes — slices are O(n) with n <= 4
    constant), then ONE (n, gram)-keyed aggregate pair. Only gram
    strings shuffle, same as the inverted index."""
    d = scale.fan_out(
        load(spark, sf_dir, "documents"), "doc_id"
    ).select(
        F.expr(
            "filter(split(text, ' '), x -> x != '')"
        ).alias("t")
    )
    grams = d.select(
        F.explode(
            F.expr(
                "flatten(transform(array(1, 2, 3, 4), n ->"
                " transform(sequence(1, greatest(size(t) - n + 1, 0)),"
                "   i -> named_struct('n', n,"
                "        'g', array_join(slice(t, i, n), ' ')))))"
            )
        ).alias("ng")
    ).select(F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    return (
        grams.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.countDistinct("g").cast("bigint").alias("distinct_ngrams"),
        )
        .select(
            F.col("n").cast("int").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            F.expr(
                "cast((cast(distinct_ngrams as decimal(38,0)) * 1000000)"
                " div total_ngrams as bigint)"
            ).alias("diversity_ppm"),
        )
        .orderBy("n")
    )


Q_NGRAM_DIVERSITY_SQL = """
with toks as (
  select list_filter(string_split(text, ' '), x -> x <> '') t
  from documents
),
grams as (
  select u.n, array_to_string(t[i : i + u.n - 1], ' ') g
  from toks,
       unnest([1, 2, 3, 4]) as u(n),
       lateral unnest(range(1, greatest(len(t) - u.n + 1, 0) + 1)) as r(i)
)
select n::INT n, count(*)::BIGINT total_ngrams,
       count(distinct g)::BIGINT distinct_ngrams,
       ((count(distinct g)::HUGEINT * 1000000) // count(*))::BIGINT
         diversity_ppm
from grams group by n order by n
"""


def q_markov_surprisal(
    spark: SparkSession, sf_dir: str, top_k: int = 25, min_pairs: int = 10
) -> DataFrame:
    """Sequence-perplexity anomaly ranking: score every user's event
    stream under the corpus's own first-order transition model
    (``event_transitions``) and rank by average per-step surprisal —
    the sequence-model form of bot/abuse detection (scripted flows ride
    high-probability edges → low surprisal; erratic or adversarial
    flows take rare transitions → high). Exactly the perplexity-filter
    shape LLM pipelines apply to text, applied to behavior.

    Determinism: each transition's −ln p quantizes to integer
    micro-nats; per-user scores are exact integer sums with an integer
    division for the mean; ties rank by user_id.

    Scale: the transition matrix is a ≤T² grid broadcast to the pair
    stream; pairs come from the same user-keyed lag window as
    ``event_transitions``; the ranking is a partial top-k."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pr = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .select("user_id", "prev_type", "event_type")
    )
    m = (
        pr.groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mt = m.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    sur = m.join(F.broadcast(mt), "prev_type").select(
        "prev_type",
        "event_type",
        F.expr(
            "cast(round(-ln(n / cast(_tot as double)) * 1e6, 0) as bigint)"
        ).alias("s_u"),
    )
    return (
        pr.join(F.broadcast(sur), ["prev_type", "event_type"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_steps"),
            F.sum("s_u").alias("_sum"),
        )
        .where(F.col("n_steps") >= min_pairs)
        .select(
            "user_id",
            "n_steps",
            F.expr(
                "cast(cast(_sum as decimal(38,0)) div n_steps as bigint)"
            ).alias("avg_surprisal_micro"),
        )
        .orderBy(F.col("avg_surprisal_micro").desc(), "user_id")
        .limit(top_k)
    )


def _markov_surprisal_duck(top_k: int = 25, min_pairs: int = 10) -> str:
    return """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
p as (
  select user_id,
         lag(event_type) over (partition by user_id
                               order by us, event_id) prev_type,
         event_type
  from e
),
pr as (select * from p where prev_type is not null),
m as (
  select prev_type, event_type, count(*) n from pr group by 1, 2
),
mt as (select prev_type, sum(n) tot from m group by 1),
sur as (
  select m.prev_type, m.event_type,
         round(-ln(m.n / mt.tot::DOUBLE) * 1e6, 0)::BIGINT s_u
  from m join mt using (prev_type)
)
select user_id, count(*)::BIGINT n_steps,
       (sum(s_u)::HUGEINT // count(*))::BIGINT avg_surprisal_micro
from pr join sur using (prev_type, event_type)
group by user_id
having count(*) >= {mp}
order by avg_surprisal_micro desc, user_id limit {k}
""".format(mp=min_pairs, k=top_k)


def q_bpe_fertility(
    spark: SparkSession, sf_dir: str, n_merges: int = 6
) -> DataFrame:
    """Tokenizer fertility per language — BPE tokens per whitespace
    word under the corpus-trained merges, the metric that decides
    whether a tokenizer is FAIR across languages (fertility 2x on one
    lang = that lang pays double the context budget per word; the
    standard multilingual-tokenizer audit). Also reports the distinct
    word-type count per lang (coverage of the trained vocab).

    Same trained-vocab amortization as ``bpe_token_counts``: encoding
    is a word -> segment-count broadcast join (the tokenizer-service
    word cache), never a re-application of merges per occurrence.
    Fertility is exact integer ppm (decimal product before the
    division). One corpus scan + one |langs|-row aggregate."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    _, vocab = bpe._train(d, "text", n_merges)
    enc = vocab.select("w", F.size("syms").cast("bigint").alias("n_sub"))
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    return (
        toks.join(F.broadcast(enc), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe"),
            F.countDistinct("w").cast("bigint").alias("n_types"),
        )
        .select(
            "lang",
            "n_words",
            "n_bpe",
            F.expr(
                "cast((cast(n_bpe as decimal(38,0)) * 1000000)"
                " div n_words as bigint)"
            ).alias("fertility_ppm"),
            "n_types",
        )
        .orderBy("lang")
    )


def _bpe_fertility_duck(n_merges: int = 6) -> str:
    train = bpe.bpe_duck(n_merges)
    ctes = train.rsplit("\nselect * from", 1)[0]
    return (
        ctes
        + """
, enc as (select w, len(s)::BIGINT n_sub from w{R})
select lang, count(*)::BIGINT n_words, sum(n_sub)::BIGINT n_bpe,
       ((sum(n_sub)::HUGEINT * 1000000) // count(*))::BIGINT fertility_ppm,
       count(distinct w)::BIGINT n_types
from (select lang, unnest(string_split(text, ' ')) w from documents)
join enc using (w)
where length(w) > 0
group by lang order by lang
""".format(R=n_merges)
    )


_TEXTRANK_ITERS = 6


def q_textrank_keywords(
    spark: SparkSession, sf_dir: str, top_v: int = 128, top_k: int = 25
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — adjacent-token edges weighted
    by corpus co-occurrence count, scores from 6 damped power
    iterations. The graph-centrality complement to ``rake_keywords``
    (degree/frequency) and ``tfidf_top_terms`` (rarity): a token ranks
    high when its NEIGHBORS are central, which surfaces the corpus's
    topical skeleton rather than its frequency spikes.

    Determinism is the ``dup_pagerank`` integer-nano-unit pattern:
    per-edge contribution floor(0.85 · (s·w div wdeg)) — exact,
    order-independent sums, identical longs in both engines every
    iteration; the oracle unrolls the same 6 supersteps as CTEs.

    Scale: the only doc-sized work is the adjacent-pair explode + one
    count aggregate. The graph is capped at ``top_v`` vocabulary nodes
    (top-v by count via partial top-k, semi-join both endpoints), so
    iteration state is <= top_v rows and every join broadcasts."""
    d = scale.fan_out(
        load(spark, sf_dir, "documents"), "doc_id"
    ).select(F.split("text", " ").alias("t"))
    # adjacent pairs via zip_with over two slices — one pass per row,
    # measured 4-6x faster than index-lambda transform at sf0.1 (slices
    # are O(len) once; per-element array indexing paths are not)
    pairs = (
        d.select(
            F.expr(
                "filter(zip_with(slice(t, 1, size(t) - 1),"
                " slice(t, 2, size(t) - 1),"
                " (x, y) -> named_struct('a', least(x, y),"
                "           'b', greatest(x, y))),"
                " s -> length(s.a) >= 3 and length(s.b) >= 3"
                "  and s.a != s.b)"
            ).alias("ps")
        )
        .select(F.explode("ps").alias("p"))
        .select("p.a", "p.b")
    )
    tokens = d.select(F.explode("t").alias("token")).where(
        F.length("token") >= 3
    )
    # the <= top_v-row vocab comes to the driver as LITERALS (bounded
    # model state by construction — the cap IS the contract): isin()
    # filters replace the two broadcast semi-joins, so the corpus is
    # touched by exactly two jobs (this token count + the pair count
    # below) with no broadcast exchanges and no checkpoint job
    vocab_rows = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(top_v)
        .select("token")
        .collect()
    )
    vocab_list = [r["token"] for r in vocab_rows]
    if not vocab_list:
        return _local_df(
            spark, [], "token string, score_nano long, wdeg bigint"
        )
    e0 = (
        pairs.where(
            F.col("a").isin(vocab_list) & F.col("b").isin(vocab_list)
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # ---- power iteration ON THE DRIVER (r13): the capped graph is
    # <= top_v·(top_v-1)/2 weighted edges REGARDLESS of corpus size, so
    # the 6 unrolled supersteps were ~18 metadata-sized Spark jobs whose
    # launch overhead dwarfed their work (profiler: 7.5 s build, 34
    # jobs). Collect the edge grid once and run the identical integer
    # recurrence in Python: (s*w) // wdeg on non-negative longs equals
    # Spark's `div`; 0.85 * x for x < 2^53 is the same single-rounded
    # IEEE binary64 product in CPython and the JVM; floor matches —
    # scores are bit-identical to the distributed unroll
    # (oracle-parity-verified at sf0.001 and sf0.01). Guide-§5 driver
    # role: bounded model state only, every corpus-sized aggregate
    # stays in Spark.
    from collections import defaultdict

    half = [(r["a"], r["b"], int(r["w"])) for r in e0.collect()]
    edges_sym = half + [(b, a, w) for a, b, w in half]
    wdeg: dict = defaultdict(int)
    for a, _b, w in edges_sym:
        wdeg[a] += w
    base = 150_000_000
    score = {a: 10**9 for a in wdeg}
    for _ in range(_TEXTRANK_ITERS):
        in_sum: dict = defaultdict(int)
        for a, b, w in edges_sym:
            in_sum[b] += math.floor(0.85 * ((score[a] * w) // wdeg[a]))
        score = {a: base + in_sum.get(a, 0) for a in wdeg}
    out_rows = [(a, score[a], wdeg[a]) for a in sorted(wdeg)]
    return (
        _local_df(
            spark, out_rows, "token string, score_nano long, wdeg bigint"
        )
        .orderBy(F.col("score_nano").desc(), "token")
        .limit(top_k)
    )


def _textrank_duck(top_v: int = 128, top_k: int = 25) -> str:
    sql = """
with toks as (select string_split(text, ' ') t from documents),
pr0 as (
  select least(t[i], t[i + 1]) a, greatest(t[i], t[i + 1]) b
  from toks, unnest(range(1, greatest(len(t), 1))) u(i)
  where len(t[i]) >= 3 and len(t[i + 1]) >= 3 and t[i] <> t[i + 1]
),
vocab as (
  select tok from (
    select tok, count(*) c
    from (select unnest(t) tok from toks)
    where len(tok) >= 3
    group by tok order by c desc, tok limit {v}
  )
),
e0 as (
  select a, b, count(*)::BIGINT w
  from pr0
  join vocab va on va.tok = pr0.a
  join vocab vb on vb.tok = pr0.b
  group by 1, 2
),
e as materialized (
  select a, b, w from e0 union all select b, a, w from e0
),
deg as materialized (select a, sum(w)::BIGINT wdeg from e group by a),
p0 as materialized (select a, 1000000000::BIGINT s, wdeg from deg)
""".format(v=top_v)
    prev = "p0"
    for i in range(1, _TEXTRANK_ITERS + 1):
        sql += """,
c{i} as materialized (
  select e.b dst, sum(floor(0.85 * ((p.s * e.w) // p.wdeg))::BIGINT) in_sum
  from {prev} p join e on e.a = p.a
  group by e.b
),
p{i} as materialized (
  select deg.a, (150000000 + coalesce(c{i}.in_sum, 0))::BIGINT s, deg.wdeg
  from deg left join c{i} on c{i}.dst = deg.a
)""".format(i=i, prev=prev)
        prev = "p%d" % i
    sql += """
select a token, s score_nano, wdeg::BIGINT wdeg
from {last} order by s desc, token limit {k}
""".format(last=prev, k=top_k)
    return sql


def q_token_burstiness(
    spark: SparkSession, sf_dir: str, top_v: int = 200
) -> DataFrame:
    """Token burstiness profile (Church & Gale 1995): for the ``top_v``
    highest-frequency tokens, the document frequency, total frequency,
    mean occurrences per containing document (ppm), and the Fano factor
    (variance/mean of the per-containing-doc count). Fano ~ 1 means
    Poisson-like content words; Fano >> 1 means the token CLUMPS —
    boilerplate, templates, navigation chrome — which is exactly the
    vocabulary a dedup/quality pass should inspect first, and a signal
    TF-IDF misses (a bursty token can have middling global counts).

    Determinism: tf/df/Σc² are exact integers (sums of squares in
    decimal(38,0) — the long-wrap rule); Fano = (df·Σc² - tf²)/(df·tf)
    is a ratio of exact integers, ONE double division, round(6).

    Scale: one (token, doc) aggregate (the doc-sized shuffle), one
    map-combined per-token rollup, partial top-k. No windows."""
    dec = "decimal(38,0)"
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    per = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    st = per.groupBy("token").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("ss"),
    )
    top = st.orderBy(F.col("tf").desc(), "token").limit(top_v)
    d_ = lambda c: F.col(c).cast(dec)  # noqa: E731
    return top.select(
        "token",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("(tf * 1000000) div n_docs").cast("bigint").alias("rate_ppm"),
        F.round(
            (d_("n_docs") * F.col("ss") - d_("tf") * d_("tf")).cast("double")
            / (d_("n_docs") * d_("tf")).cast("double"),
            6,
        ).alias("fano"),
    ).orderBy(F.col("tf").desc(), "token")


def _token_burstiness_duck(top_v: int = 200) -> str:
    """Oracle builder sharing ``q_token_burstiness``'s defaults — the
    ``top_v`` limit is generated, not hardcoded, so a non-default
    argument keeps oracle parity (same discipline as
    ``_markov_surprisal_duck``)."""
    return """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) tk from documents
),
per as (
  select tk, doc_id, count(*) c from tok where tk <> '' group by 1, 2
),
st as (
  select tk, sum(c)::HUGEINT tf, count(*)::HUGEINT n_docs,
         sum(c::HUGEINT * c) ss
  from per group by tk
),
top as (select * from st order by tf desc, tk limit {v})
select tk token, tf::BIGINT tf, n_docs::BIGINT n_docs,
       ((tf * 1000000) // n_docs)::BIGINT rate_ppm,
       round((n_docs * ss - tf * tf)::DOUBLE / (n_docs * tf)::DOUBLE, 6) fano
from top order by tf desc, token
""".format(v=int(top_v))


_COVERAGE_KS = (1000, 4000, 16000, 64000)


def q_token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the vocab-size design table for a
    tokenizer: for each candidate vocab size K, what fraction of all
    corpus token OCCURRENCES the top-K types cover (ppm). The knee of
    this curve is where growing the vocab stops paying; the residual
    (1 − coverage) is exactly the byte-fallback traffic a BPE with
    that vocab budget would carry.

    Scale: one map-combined token count; ranking touches only the
    top-K_max types (partial top-k ``limit``), so the cumulative
    window runs over a CONSTANT-bounded frame (≤64k rows), never the
    full vocab; totals ride a broadcast 1-row frame. Integer-exact
    ppm."""
    d = load(spark, sf_dir, "documents")
    counts = _tracked_persist(
        d.selectExpr("explode(split(text, ' ')) as t")
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("_tot"),
        F.count(F.lit(1)).cast("bigint").alias("_vocab"),
    )
    kmax = max(_COVERAGE_KS)
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(kmax)
    w = Window.orderBy(F.col("c").desc(), F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("t").asc()))
        .alias("r"),
        F.sum("c").over(w).alias("cum"),
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k) for k in _COVERAGE_KS])
        ).alias("top_k")
    )
    return (
        ranked.crossJoin(F.broadcast(grid))
        .where(F.col("r") <= F.col("top_k"))
        .groupBy("top_k")
        .agg(F.max("cum").cast("bigint").alias("tokens_covered"))
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("top_k").cast("int").alias("top_k"),
            "tokens_covered",
            F.expr("(1000000 * tokens_covered) div _tot")
            .cast("bigint")
            .alias("coverage_ppm"),
            F.col("_vocab").alias("vocab_size"),
        )
        .orderBy("top_k")
    )


def _token_coverage_duck(ks=_COVERAGE_KS) -> str:
    return """
with counts as (
  select t, count(*)::BIGINT c from (
    select unnest(string_split(text, ' ')) t from documents
  ) where t <> '' group by t
),
tot as (
  select sum(c)::BIGINT tt, count(*)::BIGINT vocab from counts
),
ranked as (
  select row_number() over (order by c desc, t asc) r,
         sum(c) over (order by c desc, t asc
                      rows between unbounded preceding and current row) cum
  from counts
  order by c desc, t asc limit {kmax}
),
grid as (select unnest([{ks}]) top_k)
select top_k::INT top_k,
       max(cum)::BIGINT tokens_covered,
       ((1000000 * max(cum)) // (select tt from tot))::BIGINT coverage_ppm,
       (select vocab from tot)::BIGINT vocab_size
from ranked join grid on r <= top_k
group by top_k order by top_k
""".format(kmax=max(ks), ks=", ".join(str(k) for k in ks))


def q_dedup_bytes_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage impact of dedup, in BYTES (counts alone undersell it —
    duplicated docs skew long): per stage, duplicate groups, docs
    removed, and bytes saved keeping one representative per group
    (min-id rule). 'exact' groups byte-identical texts; 'normalized'
    groups on the lowercase/collapsed form, where the survivor's own
    length differs from its twins'.

    Scale: two map-combined digest aggregates (md5 / normalized md5
    keys — never raw text) and a 2-row union; the representative's
    length rides a min_by aggregate, not a window."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("nb"), "text"
    )
    ex = d.groupBy(F.md5("text").alias("_k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nb").alias("b"),
        F.min_by("nb", "doc_id").alias("rep_b"),
    )
    nm = d.groupBy(text.normalize_text("text").alias("_k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nb").alias("b"),
        F.min_by("nb", "doc_id").alias("rep_b"),
    )

    def roll(g, stage):
        dup = g.where(F.col("n") > 1)
        return dup.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("dup_groups"),
            F.sum(F.col("n") - 1).cast("bigint").alias("docs_removed"),
            F.sum(F.col("b") - F.col("rep_b"))
            .cast("bigint")
            .alias("bytes_saved"),
        )

    total = d.agg(F.sum("nb").alias("_tb"))
    return (
        roll(ex, "1_exact")
        .unionByName(roll(nm, "2_normalized"))
        .crossJoin(F.broadcast(total))
        .select(
            "stage",
            "dup_groups",
            "docs_removed",
            "bytes_saved",
            F.expr("(1000000 * bytes_saved) div _tb")
            .cast("bigint")
            .alias("saved_ppm"),
        )
        .orderBy("stage")
    )


def _dedup_bytes_saved_duck() -> str:
    norm = text.normalize_text_duck("text")
    return """
with d as (
  select doc_id, length(text)::BIGINT nb, text from documents
),
ex as (
  select md5(text) _k, count(*) n, sum(nb)::BIGINT b,
         arg_min(nb, doc_id)::BIGINT rep_b
  from d group by 1
),
nm as (
  select {norm} _k, count(*) n, sum(nb)::BIGINT b,
         arg_min(nb, doc_id)::BIGINT rep_b
  from d group by 1
),
tot as (select sum(nb)::BIGINT tb from d),
rolled as (
  select '1_exact' stage, count(*)::BIGINT dup_groups,
         sum(n - 1)::BIGINT docs_removed,
         sum(b - rep_b)::BIGINT bytes_saved
  from ex where n > 1
  union all
  select '2_normalized', count(*)::BIGINT, sum(n - 1)::BIGINT,
         sum(b - rep_b)::BIGINT
  from nm where n > 1
)
select stage, dup_groups, docs_removed, bytes_saved,
       ((1000000 * bytes_saved) // (select tb from tot))::BIGINT saved_ppm
from rolled order by stage
""".format(norm=norm)
