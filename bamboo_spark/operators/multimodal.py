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
