"""Multimodal columns: binary payloads + typed metadata.

Convention: a media column is ``struct<data: binary, meta: struct<mime:
string, width: int, height: int, duration_ms: bigint>>``. Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the Spark
plumbing (schema, batch shape, partition-parallel decode) is real; the
actual codec calls are stubbed behind ``_decode_stub`` because no
image/audio libraries ship in this container (swap in PIL/torchaudio by
replacing one function).

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; keep them in
their own column family (no pushdown needed), partition by content hash
for even sizes, and decode with ``mapInPandas`` so each task streams
Arrow batches instead of collecting rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def as_media(df: DataFrame, binary_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a raw binary column into the media struct convention."""
    return df.withColumn(
        "media",
        F.struct(
            F.col(binary_col).alias("data"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("bigint").alias("duration_ms"),
            ).alias("meta"),
        ),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. REPLACE with a real codec (PIL etc.)
    in production; everything around it is production-shaped."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "byte_size": len(payload),
        "md5": digest,
        "fake_width": int(digest[:4], 16) % 1024,
        "fake_height": int(digest[4:8], 16) % 1024,
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_size", T.LongType(), True),
        T.StructField("md5", T.StringType(), True),
        T.StructField("fake_width", T.LongType(), True),
        T.StructField("fake_height", T.LongType(), True),
    ]
)


def decode_media(df: DataFrame, id_col: str = "doc_id", data_col: str = "data") -> DataFrame:
    """Partition-parallel decode via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[data_col]):
                rec = _decode_stub(bytes(payload))
                rec[id_col] = int(doc_id)
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(run, DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Feature extraction over binary payloads: Arrow-batched
    mapInPandas producing a FEATURE_DIM-dim double vector per payload.

    The "model" is a deterministic md5-derived embedding (byte i of the
    digest scaled to [0,1], rounded half-away at 6 decimals) so the
    whole pipeline — binary column in, fixed-width vector column out,
    ready for the similarity operators — is exercised end-to-end AND
    byte-reproducible in the DuckDB oracle. Swap the digest for a real
    encoder (CLIP etc.) without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[data_col]):
                h = hashlib.md5(bytes(payload)).digest()
                vec = [
                    # floor(x*1e6+0.5)/1e6 == SQL ROUND(x, 6) for x >= 0,
                    # applied to the same double (h/255.0) the oracle rounds
                    int((h[i] / 255.0) * 1e6 + 0.5) / 1e6
                    for i in range(FEATURE_DIM)
                ]
                ids.append(int(doc_id))
                feats.append(vec)
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return df.select(id_col, data_col).mapInPandas(run, FEATURES_SCHEMA)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    data_col: str = "data",
    real_codec: bool = False,
) -> DataFrame:
    """Resize plumbing: mapInPandas with (id, resized binary, meta)
    output. The pixel transform needs an image library that doesn't
    ship in this container — ``real_codec=True`` raises
    NotImplementedError at the first batch; the default deterministic
    fake emits the payload's md5 tiled to the target byte size so batch
    shapes, schema, and partition behavior are testable.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "no image codec in this environment; install PIL and "
                    "replace the fake branch with Image.open(...).resize(...)"
                )
            ids, blobs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[data_col]):
                digest = hashlib.md5(bytes(payload)).digest()
                blobs.append((digest * (target // len(digest) + 1))[:target])
                ids.append(int(doc_id))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "data": blobs,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

    return df.select(id_col, data_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Frame sampling plumbing for video payloads: one output row per
    (doc, frame_idx) with the frame's byte offset — evenly spaced over
    the payload, the same contract a real demuxer would fill. The frame
    *decode* is the stubbed step; offsets/slicing are real so the
    explode shape, schema, and ordering are testable.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("byte_offset", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[data_col]):
                raw = bytes(payload)
                step = max(1, len(raw) // max(1, n_frames))
                for i in range(n_frames):
                    off = min(i * step, max(0, len(raw) - 1))
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "byte_offset": off,
                            "frame": raw[off : off + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, data_col).mapInPandas(run, out_schema)


PHASH_CELLS = 64      # 8x8 grid -> one bit per cell
PHASH_BAND_BITS = 16  # 4 bands of 16 bits: LSH-joinable SMALLINT range


def phash_bands(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """PERCEPTUAL-HASH signature for a binary media payload — the
    image-dedup primitive (pHash/aHash family): decode to a small
    luminance grid, threshold each cell against the grid mean, pack the
    64 bits. Near-duplicate images differ in a few bits, so dedup is
    banded LSH on hash slices + a hamming verify — the classic
    signature shape at 100 TB (images never pairwise-compare).

    Codec note: the GRID here is the deterministic fake (payload md5
    tiled to 64 bytes — this container ships no image library); a real
    deployment replaces only the grid step with an Arrow-batched decode
    (see ``decode_media``). Everything downstream — thresholding, bit
    packing, banding, hamming — is real, runs entirely JVM-side in
    whole-stage codegen (no Python), and is what actually has to scale.

    Output: (id, b0..b3) — four 16-bit band ints. ``phash_pairs`` joins
    them; ``b0..b3`` also store compactly for incremental probes.

    Expression-shape note: ``cells`` / ``total`` / ``bits`` are bound as
    HIGHER-ORDER-FUNCTION lambda variables (``transform(array(x), v ->
    ...)`` is Spark's let-binding), NOT as projection aliases.
    CollapseProject inlines deterministic aliases into their consumers,
    and an array expression inlined inside a ``transform`` lambda body
    is re-evaluated PER ELEMENT — the unrolled first cut of this
    function did exactly that (64 × 64 re-evaluations of a 64-term md5
    grid, ×4 bands, ×8 plan copies under ``phash_pairs``) and cost
    ~40 ms/row interpreted. Lambda variables are evaluated once per
    binding regardless of how many times the body references them.
    """
    zero = F.lit(0).cast("long")
    rep = F.repeat(F.md5(F.col(data_col)), 4)  # 128 hex chars = 64 bytes

    def _cells(h):
        return F.transform(
            F.sequence(F.lit(0), F.lit(PHASH_CELLS - 1)),
            lambda i: F.conv(F.substr(h, i * 2 + 1, F.lit(2)), 16, 10).cast(
                "long"
            ),
        )
    # bit weights as literals (shiftleft needs a Python int for the
    # shift amount; an integer multiply is exact and identical:
    # bit << i == bit * 2^i)
    weights = F.array(
        *[F.lit(1 << i).cast("long") for i in range(PHASH_BAND_BITS)]
    )

    def _pack(bits, b):
        sl = F.slice(bits, b * PHASH_BAND_BITS + 1, PHASH_BAND_BITS)
        return F.aggregate(
            F.zip_with(sl, weights, lambda x, w: x * w),
            zero,
            lambda a, x: a + x,
        )

    # let h = hex; let cs = cells(h); let tot = sum(cs);
    # let bits = [64*c > tot : c in cs] in struct(pack(bits, 0..3)) —
    # bit_i is the exact integer mean threshold 64*cell_i > sum(cells).
    sig = F.element_at(
        F.transform(
            F.array(rep),
            lambda h: F.element_at(
                F.transform(
                    F.array(_cells(h)),
                    lambda cs: _sig_from_cells(cs, zero, _pack),
                ),
                F.lit(1),
            ),
        ),
        F.lit(1),
    )
    out = df.select(F.col(id_col), sig.alias("_sig"))
    return out.select(
        id_col,
        *[
            F.col("_sig.b%d" % b).alias("b%d" % b)
            for b in range(PHASH_CELLS // PHASH_BAND_BITS)
        ],
    )


def _sig_from_cells(cs, zero, _pack):
    """Inner let-chain of ``phash_bands``: tot, bits, packed bands."""
    return F.element_at(
        F.transform(
            F.array(F.aggregate(cs, zero, lambda a, x: a + x)),
            lambda tot: F.element_at(
                F.transform(
                    F.array(
                        F.transform(
                            cs,
                            lambda c: F.when(
                                c * PHASH_CELLS > tot,
                                F.lit(1).cast("long"),
                            ).otherwise(zero),
                        )
                    ),
                    lambda bits: F.struct(
                        *[
                            _pack(bits, b).alias("b%d" % b)
                            for b in range(
                                PHASH_CELLS // PHASH_BAND_BITS
                            )
                        ]
                    ),
                ),
                F.lit(1),
            ),
        ),
        F.lit(1),
    )


def phash_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 8
) -> DataFrame:
    """Near-duplicate pairs from pHash signatures: candidates = UNION
    of four equi-joins (one per band), verify ``hamming(a, b) <=
    max_hamming`` via bit_count(xor) over the bands. Equi-joins only —
    never a cartesian of the image table with itself.

    RECALL CONTRACT: with 4 bands of 16 bits, pigeonhole guarantees a
    clean (equal) band only for hamming <= 3 — those pairs are found
    EXACTLY. For hamming 4..8 banding is a HEURISTIC: differing bits
    that spread across all four bands (e.g. 2+2+2+2) agree on no band
    and the pair is missed; real near-duplicate pHashes concentrate
    their differing bits (local image edits perturb adjacent DCT
    cells), which is why 4x16 banding is the standard pHash-LSH
    trade-off. Callers needing exact recall at the default
    ``max_hamming=8`` should multiprobe or widen bands; callers
    needing a guarantee as-is should pass ``max_hamming=3``.
    (tests/test_multimodal.py pins both sides of this contract with a
    brute-force differential.)

    Exactly-once emission instead of dedup: band j's join additionally
    requires bands 0..j-1 UNEQUAL, so a pair agreeing on multiple bands
    is emitted only by its first agreeing band — no pair-level
    ``dropDuplicates`` shuffle. The hamming verify runs INSIDE each
    join branch (whole-stage codegen filter on the join output), so
    band-collision noise — the dominant volume when signatures are
    uncorrelated — is discarded before any exchange."""
    bands = [c for c in sig.columns if c != id_col]
    a = sig.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(b).alias("a_%s" % b) for b in bands],
    )
    b_ = sig.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(b).alias("b_%s" % b) for b in bands],
    )
    hamming = None
    for b in bands:
        h = F.bit_count(
            F.col("a_%s" % b).bitwiseXOR(F.col("b_%s" % b))
        ).cast("long")
        hamming = h if hamming is None else hamming + h
    out = None
    for j, b in enumerate(bands):
        cond = (F.col("a_%s" % b) == F.col("b_%s" % b)) & (
            F.col("doc_a") < F.col("doc_b")
        )
        for prev in bands[:j]:
            cond = cond & (
                F.col("a_%s" % prev) != F.col("b_%s" % prev)
            )
        branch = (
            a.join(b_, cond)
            .select("doc_a", "doc_b", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
        )
        out = branch if out is None else out.unionByName(branch)
    return out
