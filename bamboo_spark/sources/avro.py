"""``from_avro`` — Avro container files → Dataset.

Two paths:

* **Connector path** (preferred at scale): ``spark.read.format("avro")``
  when the spark-avro module is on the classpath — distributed decode,
  nullable unions → nullable fields, enum → string, pushdown via the
  read-time clusion projection.
* **Pure-Python fallback**: a minimal Avro container decoder (null/deflate
  codecs) feeding the object-inference path — correctness parity for the
  reference's semantics (enum → symbol, fixed/bytes → bytes, nullable
  union → nulls; reference avro_tests.py:145-197) when no connector jar
  is available. Fine for tests; not the 100 TB path.

Read-time ``include``/``exclude`` follow the reference's pushdown
semantics (avro_direct.cpp:107-166): applied as a nested projection that
Catalyst pushes into the scan on the connector path, and applied after
decode on the fallback path.
"""

from __future__ import annotations

import io
from typing import Any, Optional, Union

from pyspark.sql import SparkSession

from pyspark.sql import types as T

from bamboo_spark.dataset import Dataset
from bamboo_spark.projection import apply_column_filter
from bamboo_spark.sources._avro_py import avro_to_spark, decode_container
from bamboo_spark.sources.obj import DEFAULT_COLUMN, _normalize


def _connector_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent___probe")
    except Exception as exc:  # noqa: BLE001
        message = str(exc)
        if "Failed to find the data source: avro" in message or "AVRO" in message and "find" in message:
            return False
    return True


def read_avro(
    path: str,
    include: Any = None,
    exclude: Any = None,
    spark: Optional[SparkSession] = None,
) -> Dataset:
    """Distributed Avro file read (requires the spark-avro module)."""
    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()
    df = spark.read.format("avro").load(path)
    return Dataset(apply_column_filter(df, include, exclude))


def from_avro(
    source: Union[bytes, io.IOBase, str, Any],
    include: Any = None,
    exclude: Any = None,
    spark: Optional[SparkSession] = None,
) -> Dataset:
    """Decode one Avro container stream (reference core.py:36-38)."""
    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()
    if isinstance(source, str):
        with open(source, "rb") as fh:
            data = fh.read()
    elif hasattr(source, "read"):
        data = source.read()
    else:
        data = bytes(source)
    records, avro_schema = decode_container(data)
    dtype = avro_to_spark(avro_schema)
    # schema-first, like the reference's pre-typed tree
    # (avro_direct.cpp:81-105): all-null typed columns stay typed
    if isinstance(dtype, T.StructType):
        schema = dtype
        rows = [_normalize(rec, dtype, True) for rec in records]
    else:
        schema = T.StructType([T.StructField(DEFAULT_COLUMN, dtype, True)])
        rows = [(_normalize(rec, dtype, True),) for rec in records]
    ds = Dataset(spark.createDataFrame(rows, schema))
    if include is not None or exclude is not None:
        ds = ds.select_columns(include, exclude)
    return ds
