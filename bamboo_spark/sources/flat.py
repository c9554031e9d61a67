"""Flat-file pass-through sources: CSV, ORC, Parquet, line-text.

The reference has no flat-format readers (its five sources are JSON,
Avro×2, PBD, Arrow, Python objects — SURVEY §2 S1-S6); these are
Spark-native extensions so a pipeline built on this engine can ingest
the formats a real lake actually contains, with the same ``Dataset``
handle and clusion-based column selection as every other source.

Scale notes:
* CSV/ORC/Parquet all go through ``spark.read`` so scans are
  distributed, splittable (ORC/Parquet stripe/row-group level; CSV by
  byte ranges for uncompressed files), and get Catalyst column pruning.
  ORC/Parquet additionally push predicates and nested-schema pruning
  into the reader.
* CSV schema inference costs one extra pass over the data — at 100 TB
  pass an explicit ``schema`` (DDL string) instead; ``inferSchema`` is
  the convenience default to mirror the reference's inference-first
  ethos.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession

from bamboo_spark.dataset import Dataset


def _session(spark: Optional[SparkSession]) -> SparkSession:
    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()
    return spark


def read_csv(
    path: str,
    spark: Optional[SparkSession] = None,
    header: bool = True,
    schema: Optional[str] = None,
    **options: Any,
) -> Dataset:
    """CSV → Dataset. ``schema`` (DDL string) skips the inference pass;
    without it ``inferSchema`` runs (fine at test scale, explicit schema
    at lake scale)."""
    spark = _session(spark)
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    for key, value in options.items():
        reader = reader.option(key, value)
    return Dataset(reader.csv(path))


def read_orc(
    path: str, spark: Optional[SparkSession] = None, **options: Any
) -> Dataset:
    """ORC → Dataset (predicate pushdown + nested schema pruning, same
    as Parquet)."""
    spark = _session(spark)
    reader = spark.read
    for key, value in options.items():
        reader = reader.option(key, value)
    return Dataset(reader.orc(path))


def read_parquet(
    path: str, spark: Optional[SparkSession] = None, **options: Any
) -> Dataset:
    """Parquet → Dataset — the primary lake format; scans split at
    row-group level and dictionary/stats pushdown is automatic."""
    spark = _session(spark)
    reader = spark.read
    for key, value in options.items():
        reader = reader.option(key, value)
    return Dataset(reader.parquet(path))


def read_xml(
    path: str,
    spark: Optional[SparkSession] = None,
    row_tag: str = "row",
    schema: Optional[str] = None,
    **options: Any,
) -> Dataset:
    """XML → Dataset via Spark 4's built-in XML source: one row per
    ``row_tag`` element, nested elements inferred as structs/arrays —
    so XML feeds exactly like JSON does and ``flatten`` applies
    unchanged. ``schema`` (DDL) skips inference at lake scale.

    Scale: the reader splits files at element boundaries like the JSON
    line reader splits at newlines; inference samples, then the real
    scan is distributed and column-pruned."""
    spark = _session(spark)
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for key, value in options.items():
        reader = reader.option(key, value)
    return Dataset(reader.load(path))


def read_text(
    path: str,
    spark: Optional[SparkSession] = None,
    line_name: str = "value",
    **options: Any,
) -> Dataset:
    """Line-delimited text → single-column Dataset (the raw-document
    ingest path for a text pipeline; one row per line)."""
    spark = _session(spark)
    reader = spark.read
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.text(path)
    if line_name != "value":
        df = df.withColumnRenamed("value", line_name)
    return Dataset(df)


# ------------------------------------------------ federated mixed-format read
#
# A real lake directory is rarely one format: historical parquet next to
# a JSONL drop next to an Avro export of the same logical table, with
# columns appearing/disappearing across eras. ``read_union`` reads each
# file with its format's reader and reconciles the branches into ONE
# DataFrame: union by COLUMN NAME (order-independent), missing columns
# null-filled, and primitive type drift healed by widening to the least
# common supertype (int → bigint → double; anything + string → string;
# date → timestamp). Struct/array drift is NOT silently coerced — that
# is schema evolution the owner must resolve, so it raises.

_WIDEN_ORDER = [
    "boolean",
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
    "date",
    "timestamp_ntz",
    "timestamp",
    "string",
]


# max integer digits a value of the type may need, for sizing the
# decimal that must hold it losslessly (bigint: 9223372036854775807 has
# 19 digits; boolean widens as 0/1)
_INT_DIGITS = {"boolean": 1, "tinyint": 3, "smallint": 5, "int": 10, "bigint": 19}


def _widen_decimal(a, b):
    """Least common decimal supertype: keeps max integer digits AND max
    scale of the two sides (lossless), raising when that exceeds
    decimal's 38-digit ceiling instead of silently truncating scale."""
    from pyspark.sql import types as T

    d, o = (a, b) if isinstance(a, T.DecimalType) else (b, a)
    if isinstance(o, T.DecimalType):
        ip = max(a.precision - a.scale, b.precision - b.scale)
        sc = max(a.scale, b.scale)
    elif o.simpleString() in ("float", "double"):
        # fractional binary floats have no exact decimal supertype
        return T.DoubleType()
    elif o.simpleString() == "string":
        return T.StringType()
    elif o.simpleString() in _INT_DIGITS:
        ip = max(d.precision - d.scale, _INT_DIGITS[o.simpleString()])
        sc = d.scale
    else:
        raise TypeError(
            "read_union: cannot reconcile %s with %s"
            % (a.simpleString(), b.simpleString())
        )
    if ip + sc > 38:
        raise TypeError(
            "read_union: no decimal can hold both %s and %s losslessly "
            "(needs %d integer digits + scale %d > 38); cast upstream"
            % (a.simpleString(), b.simpleString(), ip, sc)
        )
    return T.DecimalType(ip + sc, sc)


def _widen(a, b):
    from pyspark.sql import types as T

    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        return _widen_decimal(a, b)
    sa, sb = a.simpleString(), b.simpleString()
    sa = "decimal" if sa.startswith("decimal") else sa
    sb = "decimal" if sb.startswith("decimal") else sb
    if sa in _WIDEN_ORDER and sb in _WIDEN_ORDER:
        # date/timestamp only widen among themselves or to string
        temporal = {"date", "timestamp", "timestamp_ntz"}
        numeric_bool = set(_WIDEN_ORDER[:8])
        if (sa in temporal) != (sb in temporal) and "string" not in (sa, sb):
            raise TypeError(
                "read_union: cannot reconcile %s with %s" % (sa, sb)
            )
        if (sa in numeric_bool) != (sb in numeric_bool) and "string" not in (
            sa,
            sb,
        ):
            raise TypeError(
                "read_union: cannot reconcile %s with %s" % (sa, sb)
            )
        wide = _WIDEN_ORDER[max(_WIDEN_ORDER.index(sa), _WIDEN_ORDER.index(sb))]
        return getattr(
            T,
            {
                "boolean": "BooleanType",
                "tinyint": "ByteType",
                "smallint": "ShortType",
                "int": "IntegerType",
                "bigint": "LongType",
                "float": "FloatType",
                "double": "DoubleType",
                "date": "DateType",
                "timestamp_ntz": "TimestampNTZType",
                "timestamp": "TimestampType",
                "string": "StringType",
            }[wide],
        )()
    raise TypeError(
        "read_union: cannot reconcile complex types %s and %s "
        "(schema evolution on nested columns must be resolved upstream)"
        % (a.simpleString(), b.simpleString())
    )


_EXT_READERS = {
    ".parquet": lambda sp, p: sp.read.parquet(p),
    ".orc": lambda sp, p: sp.read.orc(p),
    ".json": lambda sp, p: sp.read.json(p),
    ".jsonl": lambda sp, p: sp.read.json(p),
    ".csv": lambda sp, p: sp.read.option("header", True)
    .option("inferSchema", True)
    .csv(p),
    ".xml": lambda sp, p: sp.read.format("xml")
    .option("rowTag", "row")
    .load(p),
    ".txt": lambda sp, p: sp.read.text(p).withColumnRenamed(
        "value", "text"
    ),
}


def read_union(
    paths,
    spark: Optional[SparkSession] = None,
) -> Dataset:
    """Read a MIXED-FORMAT file set as one logical table: format per
    file by extension (.parquet/.orc/.json/.jsonl/.csv; .avro via the
    engine's own reader), union by name with null-fill for missing
    columns, primitive type drift widened (see module notes), complex
    drift raised.

    Scale: each branch is that format's ordinary distributed scan with
    its own pushdown; the union is a plan-level concatenation (no
    shuffle). Casting to the widened schema is scan-speed. At lake
    scale, prefer grouping many same-format files into ONE branch
    (glob) so the reader plans a single multi-file scan — this helper
    accepts globs per entry for exactly that reason."""
    import os as _os

    from pyspark.sql import functions as F

    spark = _session(spark)
    if isinstance(paths, str):
        paths = [paths]
    branches = []
    for p in paths:
        ext = _os.path.splitext(p.rstrip("/"))[1].lower()
        if ext == ".avro":
            from bamboo_spark.sources.avro import read_avro_py

            branches.append(read_avro_py(p, spark=spark).df)
        elif ext in _EXT_READERS:
            branches.append(_EXT_READERS[ext](spark, p))
        else:
            raise ValueError("read_union: unknown format for %r" % p)
    if not branches:
        raise ValueError("read_union: no inputs")
    # reconcile the target schema: per column name (first-seen order),
    # widened over every branch that has it
    target = {}
    order = []
    for b in branches:
        for f in b.schema.fields:
            if f.name not in target:
                target[f.name] = f.dataType
                order.append(f.name)
            else:
                target[f.name] = _widen(target[f.name], f.dataType)
    out = None
    for b in branches:
        have = {f.name for f in b.schema.fields}
        cols = [
            (
                F.col(n).cast(target[n])
                if n in have
                else F.lit(None).cast(target[n])
            ).alias(n)
            for n in order
        ]
        sel = b.select(*cols)
        out = sel if out is None else out.unionByName(sel)
    return Dataset(out)
