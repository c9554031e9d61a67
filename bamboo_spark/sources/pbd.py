"""``from_pbd`` — length-prefixed protobuf records (PBD format) → Dataset.

The PBD container (reference cpp/src/pbd.cpp, pbd.hpp) is: an embedded
``FileDescriptorSet`` followed by length-prefixed protobuf messages.
The Spark-native scale path is ``spark.read.format("protobuf")`` /
``F.from_protobuf`` (Spark 3.4+), which honors proto2 default-value
semantics. Neither the spark-protobuf module nor a protobuf runtime is
available in this container, so this source ships as a pure-Python
wire-format decoder (see _pbd_py) covering the subset the reference
exercises: varint/zigzag/fixed scalars, length-delimited fields, packed
and unpacked repeated fields, nested messages, enums, and proto2
default-value fill for missing fields (pbd.cpp:233-278).
"""

from __future__ import annotations

import io
from typing import Any, Optional, Union

from pyspark.sql import SparkSession, types as T

from bamboo_spark.dataset import Dataset


def from_pbd(
    source: Union[bytes, io.IOBase, str, Any],
    include: Any = None,
    exclude: Any = None,
    spark: Optional[SparkSession] = None,
) -> Dataset:
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

    from bamboo_spark.sources._pbd_py import decode_pbd
    from bamboo_spark.sources.obj import DEFAULT_COLUMN, _normalize

    records, dtype = decode_pbd(data)
    if isinstance(dtype, T.StructType):
        rows = [_normalize(rec, dtype, True) for rec in records]
        ds = Dataset(spark.createDataFrame(rows, dtype))
    else:
        schema = T.StructType([T.StructField(DEFAULT_COLUMN, dtype, True)])
        ds = Dataset(
            spark.createDataFrame([(_normalize(r, dtype, True),) for r in records], schema)
        )
    if include is not None or exclude is not None:
        ds = ds.select_columns(include, exclude)
    return ds
