"""``from_arrow`` — Arrow IPC streams / tables → Dataset.

The reference walks Arrow arrays into its node tree with per-type
visitors (cpp/src/arrow.cpp:23-326). Arrow already *is* Spark's interior
interchange format, so here ingestion is a type-widening cast plus
``spark.createDataFrame`` (Arrow-backed, zero row-at-a-time work):

* dictionary<T>  → T (decoded values; reference ENUM → string semantics,
  arrow_tests.py:224-229 keeps nulls)
* uint8/16/32   → int16/int32/int64 (next wider signed, as spark-avro
  and parquet readers do)
* uint64        → decimal(20,0) (the only lossless container)
* float16      → float32 (Spark has no half float — documented widening)
* large_string/large_binary/large_list → regular variants
* date/time/timestamp/decimal pass through natively — a capability
  extension; the reference raises NotImplemented on them
  (cpp/src/arrow.cpp:205-222).
"""

from __future__ import annotations

import io
from typing import Any, Optional, Union

import pyarrow as pa
from pyspark.sql import SparkSession

from bamboo_spark.dataset import Dataset


def _widen(t: pa.DataType) -> pa.DataType:
    if pa.types.is_dictionary(t):
        return _widen(t.value_type)
    if pa.types.is_uint8(t):
        return pa.int16()
    if pa.types.is_uint16(t):
        return pa.int32()
    if pa.types.is_uint32(t):
        return pa.int64()
    if pa.types.is_uint64(t):
        return pa.decimal128(20, 0)
    if pa.types.is_float16(t):
        return pa.float32()
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_fixed_size_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return pa.list_(_widen(t.value_type))
    if pa.types.is_list(t):
        return pa.list_(_widen(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _widen(f.type), f.nullable) for f in t])
    if pa.types.is_map(t):
        return pa.map_(_widen(t.key_type), _widen(t.item_type))
    return t


def _widen_table(table: pa.Table) -> pa.Table:
    target = pa.schema(
        [pa.field(f.name, _widen(f.type), f.nullable) for f in table.schema]
    )
    if target == table.schema:
        return table
    return table.cast(target)


def from_arrow(
    source: Union[pa.Table, pa.RecordBatchReader, bytes, io.IOBase, Any],
    spark: Optional[SparkSession] = None,
) -> Dataset:
    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()
    if isinstance(source, pa.Table):
        table = source
    elif isinstance(source, pa.RecordBatchReader):
        table = source.read_all()
    else:
        if hasattr(source, "read"):
            source = source.read()
        table = pa.ipc.open_stream(pa.BufferReader(source)).read_all()
    table = _widen_table(table)
    return Dataset(spark.createDataFrame(table))
