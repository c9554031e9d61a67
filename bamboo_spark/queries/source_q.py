"""§2 source-decoder roundtrip queries: every reference ingest format —
Avro containers (S2/S3), PBD protobuf containers (S4), Arrow (S5), live
Python objects (S6) — exercised END-TO-END as oracle-gated registry
entries. Each query encodes a deterministic, SIZE-BOUNDED slice of
``orders`` to the format under a fresh tempfile, reads it back through
the public ``from_*`` API (with a clusion include/exclude so the
decode-time pruning path runs), and returns a DataFrame the DuckDB
oracle reproduces straight from the parquet table — so the driver's
hash-equality gate covers the decoders themselves, not just their unit
tests.

Semantic corners pinned (reference files cited per query): Avro
enum→string and nullable-union decode (reference
python/bamboo_tests/avro_tests.py:174-197), deflate codec; PBD proto2
default fill for absent optional fields (reference
python/bamboo_tests/pbd_tests.py:62-67) plus wire-skip of an excluded
field planted with invalid UTF-8 (pbd_tests.py clusion pushdown — if
exclusion ever materialized the bytes, the decode would raise and the
gate would fail); Arrow unsigned/half-float/dictionary widening;
from_object nested-list flatten (broadcast semantics, core.py:30-33).

Scale notes: the ENCODE side is fixture generation and is bounded by
``o_orderkey <= 4000`` (≤ ~4k rows at every SF — a fixed cap, not a
fraction of the table), so the driver-side collect can never grow with
the dataset. The DECODE side is the product surface and is fully
distributed: from_avro/from_pbd split container blocks across
executors (mapInArrow), from_arrow enters through Spark's Arrow
exchange. Working files are fresh ``tempfile`` paths per invocation
(driver-local scratch, OS-reaped).
"""

from __future__ import annotations

import os
import struct
import tempfile


def _fixture_path(suffix: str) -> str:
    """Race-free scratch path for a roundtrip fixture: a fresh private
    mkdtemp (same /tmp lifecycle as the table_q lifecycle queries) —
    tempfile.mktemp is deprecated and TOCTOU-racy."""
    return os.path.join(
        tempfile.mkdtemp(prefix="bamboo_src_"), "fixture" + suffix
    )

from pyspark.sql import DataFrame, SparkSession, functions as F

from bamboo_spark.queries._core import load  # noqa: F401

_SLICE = "o_orderkey <= 4000"


def _order_slice(spark: SparkSession, sf_dir: str):
    """The shared fixture slice, collected driver-side (bounded: the
    key cap makes this ≤ ~4k rows at any SF) and sorted for
    deterministic encode order."""
    rows = (
        load(spark, sf_dir, "orders")
        .where(_SLICE)
        .select(
            F.col("o_orderkey").cast("bigint").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
            F.expr(
                "cast(round(o_totalprice * 100, 0) as bigint)"
            ).alias("cents"),
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r.k)


# ------------------------------------------------------------------ S2 avro


def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro container roundtrip (from_avro, reference core.py:36-38 /
    avro_direct.cpp): enum field decodes to its symbol string,
    ["null","double"] union decodes to a nullable double, deflate
    blocks decompress, and an EXPLICIT INCLUDE prunes the planted
    ``secret`` field at decode time (reference avro clusion surface,
    avro_tests.py:174-197). The decode is executor-parallel over
    container blocks."""
    from bamboo_spark.sources._avro_py import write_container
    from bamboo_spark.sources.avro import from_avro

    rows = _order_slice(spark, sf_dir)
    schema = {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "status",
                "type": {
                    "type": "enum",
                    "name": "Status",
                    "symbols": ["F", "O", "P"],
                },
            },
            {"name": "price", "type": ["null", "double"]},
            {"name": "prio", "type": "string"},
            {"name": "secret", "type": "string"},
        ],
    }
    records = [
        {
            "k": r.k,
            "status": r.status,
            # every 5th key exercises the null union branch
            "price": None if r.k % 5 == 0 else float(r.price),
            "prio": r.prio,
            "secret": "redact-%d" % r.k,
        }
        for r in rows
    ]
    path = _fixture_path(".avro")
    write_container(path, schema, records, codec="deflate")
    ds = from_avro(
        path, include=["k", "status", "price", "prio"], spark=spark
    )
    return ds.df.select("k", "status", "price", "prio").orderBy("k")


SOURCE_AVRO_SQL = """
select o_orderkey::BIGINT as k,
       o_orderstatus as status,
       case when o_orderkey %% 5 = 0 then NULL else o_totalprice end
         as price,
       o_orderpriority as prio
from orders
where %s
order by 1
""" % _SLICE


# ------------------------------------------------------------------- S4 pbd
# Minimal protobuf wire/descriptor encoder (public wire format) — the
# fixture side of the roundtrip; the decoder under test is
# bamboo_spark.sources._pbd_py (reference pbd.cpp / pbd.hpp).


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(number: int, wire: int) -> bytes:
    return _varint((number << 3) | wire)


def _ld(number: int, payload: bytes) -> bytes:
    return _tag(number, 2) + _varint(len(payload)) + payload


def _field_desc(
    name: str,
    number: int,
    ftype: int,
    label: int = 1,
    default: str = "",
) -> bytes:
    out = _ld(1, name.encode()) + _tag(3, 0) + _varint(number)
    out += _tag(4, 0) + _varint(label) + _tag(5, 0) + _varint(ftype)
    if default:
        out += _ld(7, default.encode())  # FieldDescriptorProto.default_value
    return out


def _pbd_container(message_desc: bytes, root: str, records: list) -> bytes:
    fdp = _ld(2, b"t") + _ld(4, message_desc)  # package "t" + message
    out = bytearray(b"\x00\x00\x10\xbd\x01")
    out += _varint(1) + _varint(len(fdp)) + fdp
    out += _varint(len(root)) + root.encode()
    for r in records:
        out += _varint(len(r)) + r
    return bytes(out)


def source_pbd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PBD protobuf-container roundtrip (from_pbd, reference pbd.cpp):
    two's-complement int64, ZIGZAG sint64 (negative cents), strings,
    proto2 DEFAULT FILL for an omitted optional field (reference
    pbd_tests.py:62-67 — ``sd`` decodes to its descriptor default), and
    decode-time clusion PUSHDOWN: the excluded ``junk`` field carries
    invalid UTF-8, so if exclusion ever parsed instead of wire-skipped
    it (reference pbd.cpp:50-83), the decode — and this gate — would
    fail. Record splits decode executor-parallel."""
    from bamboo_spark.sources.pbd import from_pbd

    rows = _order_slice(spark, sf_dir)
    desc = bytearray(_ld(1, b"Order"))
    for fd in (
        _field_desc("k", 1, 3),                 # int64
        _field_desc("cents", 2, 18),            # sint64 (zigzag)
        _field_desc("status", 3, 9),            # string
        _field_desc("prio", 4, 9, default="unspecified"),
        _field_desc("junk", 5, 12),             # bytes — excluded
    ):
        desc += _ld(2, fd)
    records = []
    for r in rows:
        cents = r.cents * (-1 if r.k % 2 == 0 else 1)
        rec = (
            _tag(1, 0) + _varint(r.k & ((1 << 64) - 1))
            + _tag(2, 0) + _varint((cents << 1) ^ (cents >> 63))
            + _ld(3, r.status.encode())
        )
        if r.k % 3 != 0:  # every 3rd record omits prio → default fill
            rec += _ld(4, r.prio.encode())
        rec += _ld(5, b"\xff\xfe\xff")  # invalid UTF-8: must be skipped
        records.append(rec)
    path = _fixture_path(".pbd")
    with open(path, "wb") as fh:
        fh.write(_pbd_container(bytes(desc), "t.Order", records))
    ds = from_pbd(path, exclude=["junk"], spark=spark)
    return ds.df.select("k", "cents", "status", "prio").orderBy("k")


SOURCE_PBD_SQL = """
select o_orderkey::BIGINT as k,
       cast(round(o_totalprice * 100, 0) as BIGINT)
         * (case when o_orderkey %% 2 = 0 then -1 else 1 end) as cents,
       o_orderstatus as status,
       case when o_orderkey %% 3 = 0 then 'unspecified'
            else o_orderpriority end as prio
from orders
where %s
order by 1
""" % _SLICE


# ----------------------------------------------------------------- S5 arrow


def source_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow ingestion roundtrip (from_arrow, reference core.py:27-29):
    types Spark's Arrow bridge rejects natively must WIDEN — uint32 →
    long, uint8 → short, float16 → float, dictionary<string> → string
    (bamboo_spark.sources.arrow._widen). Values are integer-exact
    (half-floats hold ints < 2048 exactly), so the final cast to stable
    SQL types is lossless and the oracle reproduces them from parquet
    directly."""
    import numpy as np
    import pyarrow as pa

    from bamboo_spark.sources.arrow import from_arrow

    rows = _order_slice(spark, sf_dir)
    table = pa.table(
        {
            "k": pa.array([r.k for r in rows], pa.uint32()),
            "ck": pa.array([r.k % 200 for r in rows], pa.uint8()),
            "qty": pa.array(
                np.array([r.k % 1000 for r in rows], dtype=np.float16)
            ),
            "status": pa.array(
                [r.status for r in rows], pa.string()
            ).dictionary_encode(),
            "tag": pa.array([r.prio for r in rows], pa.large_string()),
        }
    )
    ds = from_arrow(table, spark=spark)
    return (
        ds.df.select(
            F.col("k").cast("bigint").alias("k"),
            F.col("ck").cast("bigint").alias("ck"),
            F.col("qty").cast("double").alias("qty"),
            "status",
            "tag",
        )
        .orderBy("k")
    )


SOURCE_ARROW_SQL = """
select o_orderkey::BIGINT as k,
       (o_orderkey %% 200)::BIGINT as ck,
       cast(o_orderkey %% 1000 as DOUBLE) as qty,
       o_orderstatus as status,
       o_orderpriority as tag
from orders
where %s
order by 1
""" % _SLICE


# ---------------------------------------------------------------- S6 object


def source_object_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-object ingestion + flatten roundtrip (from_object, reference
    core.py:30-33): nested records with a LIST child flatten with the
    reference's broadcast semantics — parent scalars repeat once per
    list element (nodes.py flatten). Each order carries
    ``(k % 3) + 1`` synthetic lines; the oracle replays the expansion
    with generate_series."""
    from bamboo_spark.sources.obj import from_object

    rows = _order_slice(spark, sf_dir)
    objs = [
        {
            "k": r.k,
            "status": r.status,
            "lines": [
                {"n": i, "amt": r.k * 10 + i}
                for i in range(1, (r.k % 3) + 2)
            ],
        }
        for r in rows
    ]
    flat = from_object(objs, spark=spark).flatten().df
    return flat.select("k", "status", "n", "amt").orderBy("k", "n")


SOURCE_OBJECT_SQL = """
with expanded as (
  select o_orderkey::BIGINT as k,
         o_orderstatus as status,
         unnest(generate_series(1, (o_orderkey %% 3) + 1))::BIGINT as n
  from orders
  where %s
)
select k, status, n, (k * 10 + n)::BIGINT as amt
from expanded
order by 1, 3
""" % _SLICE
