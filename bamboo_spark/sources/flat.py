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
