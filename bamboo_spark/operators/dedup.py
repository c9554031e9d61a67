"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the 100 TB shapes):

* **exact**: hash-groupBy on the dedup key — one shuffle, map-side
  partial aggregation, AQE coalescing. Never a distinct-then-join.
* **jaccard (exact similarity join)**: inverted index on shingles —
  explode distinct shingles, self-join on shingle, count intersections
  per pair, compute |A∩B| / (|A|+|B|-|A∩B|). Shuffle is keyed by
  shingle; hot shingles are the skew risk → AQE skew-join is on, and a
  frequency cap (`max_shingle_df`) can drop ubiquitous shingles — set
  None for oracle-exact runs.
* **MinHash-LSH**: per-doc minhash signature (one explode + 128
  map-side-combined ``min`` aggregates — a single shuffle), banded into
  (band, hash) buckets; only bucket collisions generate candidates, then
  candidates are **verified with the exact Jaccard**, so LSH only prunes
  work — the output equals the exact join's output with probability
  1 - (1 - s^r)^b (r=2, b=64: a true 0.7-similar pair is missed with
  p < 2e-19). This is the standard web-scale near-dup pipeline shape.
* **SimHash**: 60-bit signature from md5 token hashes (cross-engine
  deterministic); pairs within Hamming distance d found by pigeonhole
  banding (d+1 bands → at least one band exactly equal), then exact
  ``bit_count(xor)`` verification — exact, not probabilistic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from bamboo_spark.operators.text import (
    md5_int60_duck,
    md5_int60_sql,
    word_shingles_duck,
    word_shingles_sql,
)

# ---------------------------------------------------------------- exact


def dedup_exact(df: DataFrame, key: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact key. One hash-aggregate shuffle."""
    return (
        df.groupBy(key)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


# ------------------------------------------------------- exact jaccard join


def _shingle_sets(df: DataFrame, k: int = 3) -> DataFrame:
    sh = word_shingles_sql("split(text, ' ')", k)
    return df.select(
        "doc_id", F.expr("array_distinct(%s)" % sh).alias("shingles")
    ).where(F.size("shingles") > 0)


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    Returns (doc_a, doc_b, jaccard) for pairs ≥ threshold, doc_a < doc_b.
    """
    sets = _shingle_sets(df, k)
    inv = sets.select(
        "doc_id",
        F.size("shingles").alias("n"),
        F.explode("shingles").alias("sh"),
    )
    if max_shingle_df is not None:
        freq = inv.groupBy("sh").count().where(F.col("count") <= max_shingle_df)
        inv = inv.join(F.broadcast(freq.select("sh")), "sh")
    # both sides of the self-join read this; persist so shingling runs once
    inv = inv.persist()
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
        )
    )
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        6,
    )
    return (
        inter.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_duck(threshold: float = 0.8, k: int = 3) -> str:
    """DuckDB oracle: brute-force exact pairwise Jaccard (same result)."""
    sh = word_shingles_duck("string_split(text, ' ')", k)
    return """
with sets as (
  select doc_id, list_distinct({sh}) shingles from documents
  where len(list_distinct({sh})) > 0
),
ex as (select doc_id, len(shingles) n, unnest(shingles) sh from sets),
inter as (
  select a.doc_id doc_a, b.doc_id doc_b, count(*) cnt,
         any_value(a.n) na, any_value(b.n) nb
  from ex a join ex b on a.sh = b.sh and a.doc_id < b.doc_id
  group by 1, 2
)
select doc_a, doc_b,
       round(cnt::DOUBLE / (na + nb - cnt)::DOUBLE, 6) as jaccard
from inter
where round(cnt::DOUBLE / (na + nb - cnt)::DOUBLE, 6) >= {t}
""".format(sh=sh, t=threshold)


# ------------------------------------------------------------ minhash lsh


def minhash_signatures(df: DataFrame, num_hashes: int = 128, k: int = 3) -> DataFrame:
    """One row per doc with `num_hashes` minhash values.

    Implementation: explode distinct shingles once, then `num_hashes`
    map-side-combined min() aggregates — a single shuffle keyed by
    doc_id, no repeated array traversals.
    """
    sets = _shingle_sets(df, k)
    ex = sets.select("doc_id", F.explode("shingles").alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias("mh%d" % i)
        for i in range(num_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 128,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Candidate generation by banded minhash + exact Jaccard verify.

    Output is identical to ``jaccard_pairs(df, threshold)`` (up to the
    negligible LSH miss probability) — the verification step recomputes
    the true Jaccard for every candidate pair.
    """
    num_bands = num_hashes // rows_per_band
    sets = _shingle_sets(df, k).persist()  # reused: signatures + verify
    ex = sets.select("doc_id", F.explode("shingles").alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias("mh%d" % i)
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("mh%d" % (b * rows_per_band + r))
                                for r in range(rows_per_band)
                            ]
                        ).alias("h"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.h").persist()
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = (
        candidates.join(sets.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("shingles", "sa")
        .join(sets.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("shingles", "sb")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


# --------------------------------------------------------------- simhash

SIMHASH_BITS = 60


def simhash_docs(df: DataFrame) -> DataFrame:
    """60-bit SimHash per doc over distinct whitespace tokens.

    bit j = 1  iff  2 * (#tokens with md5-bit j set) > #tokens.
    Derived entirely from md5 → reproducible in the DuckDB oracle.
    """
    tok = df.select(
        "doc_id", F.explode(F.expr("array_distinct(split(text, ' '))")).alias("t")
    ).select("doc_id", F.expr(md5_int60_sql("t")).alias("v"))
    sums = [
        F.sum(F.expr("(v >> %d) & 1" % j)).alias("s%d" % j) for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *sums)
    sim = " + ".join(
        "(case when 2 * s%d > n then cast(%d as bigint) else cast(0 as bigint) end)"
        % (j, 1 << j)
        for j in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", F.expr(sim).alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Pairs within `max_hamming` via pigeonhole banding (exact).

    Splitting 60 bits into (max_hamming + 1) bands guarantees any pair
    with ≤ max_hamming differing bits agrees on ≥ 1 whole band; the
    bucket join therefore finds *every* qualifying pair, and the
    bit_count(xor) filter is exact verification (no false negatives).
    """
    n_bands = max_hamming + 1
    band_bits = SIMHASH_BITS // n_bands
    sh = simhash_docs(df)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            "(simhash >> %d) & %d" % (b * band_bits, (1 << band_bits) - 1)
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key").persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("bigint")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_duck(max_hamming: int = 2) -> str:
    sums = ", ".join("sum((v >> %d) & 1) s%d" % (j, j) for j in range(SIMHASH_BITS))
    sim = " + ".join(
        "(case when 2 * s%d > n then %d::BIGINT else 0::BIGINT end)" % (j, 1 << j)
        for j in range(SIMHASH_BITS)
    )
    return """
with tok as (
  select doc_id, unnest(list_distinct(string_split(text, ' '))) t from documents
),
tv as (select doc_id, {v} v from tok),
agg as (select doc_id, count(*) n, {sums} from tv group by doc_id),
sh as (select doc_id, {sim} as simhash from agg)
select a.doc_id doc_a, b.doc_id doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT as hamming
from sh a join sh b on a.doc_id < b.doc_id
where bit_count(xor(a.simhash, b.simhash)) <= {d}
""".format(v=md5_int60_duck("t"), sums=sums, sim=sim, d=max_hamming)
