"""Multimodal (binary-column) queries: decode/features/resize/frame-sampling plumbing and audio window features.

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


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over the binary payload column — the media
    twin of exact text dedup (identical images/audio dedupe by payload
    digest regardless of filename/metadata). One hash-keyed
    map-combined aggregate; digests, not payloads, shuffle."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return (
        d.groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        )
        .select("keep_id", "n_dups", "total_bytes")
    )


Q_MULTIMODAL_DEDUP_SQL = """
select min(doc_id) keep_id, count(*)::BIGINT n_dups,
       sum(octet_length(encode(text)))::BIGINT total_bytes
from documents
group by md5(text) order by keep_id
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media plumbing end-to-end: text → binary payload → media struct →
    Arrow-batched mapInPandas decode (stubbed codec, real pipeline)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    media = multimodal.as_media(d, "payload", mime="text/plain")
    decoded = multimodal.decode_media(
        media.select("doc_id", F.col("media.data").alias("data"))
    )
    return decoded


Q_MULTIMODAL_SQL = """
select doc_id,
       octet_length(encode(text))::BIGINT byte_size,
       md5(text) md5,
       (('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::BIGINT fake_width,
       (('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::BIGINT fake_height
from documents order by doc_id
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → fixed-width feature vector via Arrow-batched
    mapInPandas (deterministic md5 'model'; see
    multimodal.extract_features). Exploded to scalars for the driver's
    value-hash (array cells hash engine-specifically)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    feats = multimodal.extract_features(d)
    return feats.select(
        "doc_id", F.posexplode("features").alias("idx", "feature")
    ).select(
        "doc_id", F.col("idx").cast("bigint").alias("idx"), "feature"
    )


Q_MULTIMODAL_FEATURES_SQL = """
select doc_id, i::BIGINT idx,
       round((('0x' || substr(md5(text), 2*i + 1, 2))::BIGINT)::DOUBLE / 255.0, 6) feature
from documents, generate_series(0, {dmax}) t(i)
order by doc_id, idx
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, value-gated: the deterministic fake emits the
    payload's md5 digest tiled to the target byte size, so the full
    resized payload is oracle-reproducible (hex-string space — DuckDB
    has no blob substr). Proves batch shape + schema + payload bytes,
    not just row counts."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    resized = multimodal.resize_media(d, width=8, height=8)
    return resized.select(
        "doc_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.lower(F.hex("data")).alias("data_hex"),
    )


Q_MULTIMODAL_RESIZE_SQL = """
select doc_id, 8::BIGINT width, 8::BIGINT height,
       substr(repeat(md5(text), 5), 1, 128) data_hex
from documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, value-gated: evenly spaced byte offsets
    over the payload plus the 16-byte frame slice at each — the demuxer
    contract with the decode step stubbed. Frames compared as hex."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    frames = multimodal.sample_frames(d, n_frames=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "byte_offset",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


Q_MULTIMODAL_FRAMES_SQL = """
with p as (
  select doc_id, octet_length(encode(text)) n, lower(hex(encode(text))) hx
  from documents
),
f as (
  select doc_id, i frame_idx,
         least(i * greatest(1, n // 4), greatest(0, n - 1)) as bo, hx
  from p, generate_series(0, 3) t(i)
)
select doc_id, frame_idx::BIGINT frame_idx, bo::BIGINT byte_offset,
       substr(hx, 2 * bo + 1, 32) frame_hex
from f
"""


def q_audio_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed signal-feature extraction — the audio-modality
    front-end (framing → per-frame energy → zero-crossing rate, the
    mel-spectrogram precursors) with the document text's byte codes
    standing in as the PCM samples (a real codec swaps in at the decode
    step; the windowing/feature math is the part that must be right).
    Per doc: frame count, the peak-energy frame and its exact integer
    energy, and the total zero-crossing count over centered samples.

    Every feature is EXACT integer arithmetic over ascii codes (sum of
    squared centered samples; sign-change counts), computed with
    higher-order array functions — JVM-side, no UDF, no float — so the
    DuckDB oracle replays frame-for-frame. Frames: 32 samples, hop 16
    (50% overlap).

    Scale: one scan; per-row work is O(len), SINGLE-PASS by
    construction — Catalyst does not CSE across lambda invocations, so
    each frame is sliced exactly ONCE (nested transform binds the slice
    to a lambda variable) and peak/argmax/zcr fold in ONE ``aggregate``
    over the frame structs (no ``array_max`` re-scan inside a
    per-element lambda, which would be O(frames²)); nothing shuffles
    but the final per-doc rows."""
    from bamboo_spark.operators import scale

    frame, hop = 32, 16
    # single-row-group test parquet = ONE scan split, and the whole
    # per-sample HOF chain fuses into that stage — spread it first
    # (no-op on already-parallel input; guide §2.5)
    d = scale.fan_out(
        load(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.expr("transform(split(text, ''), ch -> ascii(ch) - 96)").alias("s"),
    ).where(F.size("s") >= frame)
    # slice each frame ONCE (outer transform), then compute features
    # over the bound lambda variable f — references to f are array
    # lookups, never slice re-evaluations
    win = (
        "transform("
        " transform(sequence(0, cast((size(s) - %d) / %d as int)),"
        "           w -> slice(s, w * %d + 1, %d)),"
        " f -> named_struct("
        "  'e', aggregate(f, 0L, (a, x) -> a + x * x),"
        # Spark array indexing is 0-based: pairs (f[i-1], f[i]) for
        # i in 1..31 == the oracle's 1-based pairs (1,2)..(31,32)
        "  'z', aggregate(sequence(1, %d), 0L, (a, i) ->"
        "    a + if(sign(f[i - 1]) * sign(f[i]) < 0, 1, 0))))"
        % (frame, hop, hop, frame, frame - 1)
    )
    w = d.select("doc_id", F.expr(win).alias("wins"))
    # one fold carrying (best energy, its first index, cursor, zcr sum):
    # strict > keeps the FIRST frame attaining the max, matching the
    # oracle's first-position rule
    st = (
        "aggregate(wins,"
        " named_struct('be', -1L, 'bi', -1, 'cur', 0, 'zs', 0L),"
        " (a, x) -> named_struct("
        "  'be', if(x.e > a.be, x.e, a.be),"
        "  'bi', if(x.e > a.be, a.cur, a.bi),"
        "  'cur', a.cur + 1,"
        "  'zs', a.zs + x.z))"
    )
    return (
        w.select(
            "doc_id",
            F.expr("size(wins)").cast("bigint").alias("n_frames"),
            F.expr(st).alias("_st"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.col("_st.be").cast("bigint").alias("peak_energy"),
            F.col("_st.bi").cast("int").alias("peak_frame"),
            F.col("_st.zs").cast("bigint").alias("total_zcr"),
        )
        .orderBy("doc_id")
    )


Q_AUDIO_WINDOWS_SQL = """
with d as (
  select doc_id,
         [ascii(c) - 96 for c in string_split(text, '')] s
  from documents
),
k as (select doc_id, s from d where len(s) >= 32),
w as (
  select doc_id,
         [struct_pack(
            e := list_sum([x * x for x in s[wi * 16 + 1 : wi * 16 + 32]]),
            z := list_sum([case when sign(s[wi * 16 + i - 1])
                                     * sign(s[wi * 16 + i]) < 0
                                then 1 else 0 end
                           for i in range(2, 33)])
          ) for wi in range(0, ((len(s) - 32) // 16) + 1)] wins
  from k
),
p as (
  select doc_id, wins, list_max([x.e for x in wins]) pe from w
)
select doc_id, len(wins)::BIGINT n_frames,
       pe::BIGINT peak_energy,
       (list_position([x.e for x in wins], pe) - 1)::INT peak_frame,
       list_sum([x.z for x in wins])::BIGINT total_zcr
from p order by doc_id
"""


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the binary payload
    column — the image-dedup shape (pHash): payload → 8×8 grid →
    mean-threshold bits → four 16-bit bands, candidates from banded
    equi-joins (pigeonhole: close hashes agree on ≥1 band), verified by
    exact hamming distance over bit_count(xor). All integer, all
    JVM-side codegen (operators/multimodal.py:phash_bands/phash_pairs);
    the grid is the deterministic md5 fake this container's codec-less
    environment allows — a real deployment swaps only the grid step.

    Scale: signatures shuffle (16 bytes/doc), payloads never; the four
    band joins are hash equi-joins, so 100 TB of images dedups at the
    cost of banding a 64-bit signature table — never a pairwise
    compare."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    # persist: the four band joins consume the signature table 8 times
    # (2 sides x 4 bands); 5 long columns per doc, never the payloads.
    sig = _tracked_persist(multimodal.phash_bands(d))
    return multimodal.phash_pairs(sig, max_hamming=8)


Q_MULTIMODAL_PHASH_SQL = """
with cells as (
  select doc_id, i,
         ('0x' || substr(repeat(md5(text), 4), 2*i + 1, 2))::BIGINT cv
  from documents, generate_series(0, 63) t(i)
), tot as (
  select doc_id, sum(cv) s from cells group by doc_id
), bits as (
  select c.doc_id, c.i,
         case when 64 * c.cv > t.s then 1 else 0 end bv
  from cells c join tot t using (doc_id)
), hashes as (
  select doc_id,
         sum(case when i < 16 then bv << (i % 16) else 0 end)::BIGINT h0,
         sum(case when i between 16 and 31 then bv << (i % 16) else 0 end)::BIGINT h1,
         sum(case when i between 32 and 47 then bv << (i % 16) else 0 end)::BIGINT h2,
         sum(case when i >= 48 then bv << (i % 16) else 0 end)::BIGINT h3
  from bits group by doc_id
), cand as (
  select distinct a.doc_id da, b.doc_id db,
         a.h0 a0, a.h1 a1, a.h2 a2, a.h3 a3,
         b.h0 b0, b.h1 b1, b.h2 b2, b.h3 b3
  from hashes a join hashes b
    on a.doc_id < b.doc_id
   and (a.h0 = b.h0 or a.h1 = b.h1 or a.h2 = b.h2 or a.h3 = b.h3)
)
select da doc_a, db doc_b,
       (bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)))::BIGINT hamming
from cand
where bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
      + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 8
order by doc_a, doc_b
"""
