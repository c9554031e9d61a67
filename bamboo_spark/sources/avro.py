"""``from_avro`` — Avro container files → Dataset.

Two paths:

* **Connector path** (preferred at scale): ``spark.read.format("avro")``
  when the spark-avro module is on the classpath — distributed decode,
  nullable unions → nullable fields, enum → string, pushdown via the
  read-time clusion projection.
* **Pure-Python fallback** (this module's ``from_avro``): a minimal Avro
  container decoder (null/deflate codecs) with the same execution shape
  as the connector — the driver scans only block *headers*, and the
  value decode runs on executors inside ``mapInArrow`` over block
  ranges (Avro blocks are the spec's independent decode unit).

Read-time ``include``/``exclude`` follow the reference's pushdown
semantics (avro_direct.cpp:107-166): pruned at decode time — excluded
fields are walked but never materialized (``_avro_py._skip_value``) and
the output schema is pruned with the exact rule the Catalyst nested
projection uses (projection.prune_schema), so both paths select the
same columns.
"""

from __future__ import annotations

import io
import os
from typing import Any, Callable, Iterator, List, Optional, Tuple, Union

from pyspark.sql import SparkSession, types as T

from bamboo_spark.clusions import ColumnFilter
from bamboo_spark.dataset import Dataset
from bamboo_spark.projection import apply_column_filter, prune_schema
from bamboo_spark.sources._avro_py import (
    AvroDecodeError,
    avro_to_spark,
    decode_block,
    scan_blocks,
    scan_blocks_stream,
    scan_header,
    scan_header_stream,
)
from bamboo_spark.sources._stream import ChunkedReader, drain_or_spill
from bamboo_spark.sources.obj import DEFAULT_COLUMN

# Records per decode task, upper bound (see pbd.py for rationale).
_TARGET_RECORDS_PER_SPLIT = 2048

# bytes/stream sources at or under this are broadcast; larger ones are
# spilled to $BAMBOO_SPARK_SPILL_DIR (see pbd.py for the rationale and
# the cluster-visibility caveat).
_BROADCAST_MAX = 64 << 20


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


def _make_decoder(
    avro_schema: Any,
    codec: str,
    out_schema: T.StructType,
    record_root: bool,
    fltr: Optional[ColumnFilter],
    implicit_root: bool,
    path: Optional[str],
    bc: Any,
    writer_schema: Any = None,
) -> Callable[[Iterator[Any]], Iterator[Any]]:
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(out_schema)
    names = [f.name for f in out_schema.fields]

    def fn(batches: Iterator[Any]) -> Iterator[Any]:
        import pyarrow as pa

        from bamboo_spark.sources._avro_py import decode_block_resolved

        for batch in batches:
            offs = batch.column(0).to_pylist()
            sizes = batch.column(1).to_pylist()
            counts = batch.column(2).to_pylist()
            for off, size, n in zip(offs, sizes, counts):
                if path is not None:
                    with open(path, "rb") as fh:
                        fh.seek(off)
                        payload = fh.read(size)
                else:
                    payload = bc.value[off : off + size]
                if writer_schema is not None:
                    records = decode_block_resolved(
                        payload, n, codec, writer_schema, avro_schema,
                        fltr, implicit_root,
                    )
                else:
                    records = decode_block(
                        payload, n, codec, avro_schema, fltr, implicit_root
                    )
                if record_root:
                    arrays = [
                        pa.array(
                            [r[nm] for r in records], type=arrow_schema.field(i).type
                        )
                        for i, nm in enumerate(names)
                    ]
                else:
                    arrays = [pa.array(records, type=arrow_schema.field(0).type)]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return fn


def from_avro(
    source: Union[bytes, io.IOBase, str, Any],
    include: Any = None,
    exclude: Any = None,
    spark: Optional[SparkSession] = None,
    reader_schema: Any = None,
) -> Dataset:
    """Decode one Avro container stream (reference core.py:36-38).

    ``reader_schema`` (Avro schema JSON) decodes the file under an
    explicit READER schema instead of the file's writer schema, with
    spec resolution rules (field matching by name, default fill,
    numeric promotions, enum fallback) — the reference's reader-vs-
    writer resolution surface (avro_direct.cpp:107-166) for one file.
    """
    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()

    # conflict validation first (raises ClusionError before any Spark job)
    fltr = ColumnFilter.parse(include, exclude)
    has_filter = include is not None or exclude is not None
    implicit_root = fltr.include.explicit or fltr.include.is_nothing()

    spill_dir = os.environ.get("BAMBOO_SPARK_SPILL_DIR", "")
    master = spark.sparkContext.master or "local"
    path: Optional[str] = None
    data: Optional[bytes] = None
    if isinstance(source, str):
        path = os.path.abspath(source)
    elif hasattr(source, "read"):
        data, path = drain_or_spill(source, _BROADCAST_MAX, spill_dir, master)
    else:
        data = bytes(source)
        if len(data) > _BROADCAST_MAX:
            data, path = drain_or_spill(
                io.BytesIO(data), _BROADCAST_MAX, spill_dir, master
            )

    if path is not None:
        # bounded-memory metadata pass: header + block-header hops in
        # O(buffer) chunks, payloads seek-skipped (see pbd.py)
        with open(path, "rb") as fh:
            reader = ChunkedReader(fh, error_cls=AvroDecodeError)
            avro_schema, codec, sync, pos = scan_header_stream(reader)
            all_blocks = scan_blocks_stream(reader, sync)
    else:
        avro_schema, codec, sync, pos = scan_header(data)
        all_blocks = scan_blocks(data, pos, sync)
    writer_schema = None
    if reader_schema is not None:
        import json as _json

        if _json.dumps(reader_schema, sort_keys=True) != _json.dumps(
            avro_schema, sort_keys=True
        ):
            writer_schema = avro_schema
            avro_schema = reader_schema
    dtype = avro_to_spark(avro_schema)
    record_root = isinstance(dtype, T.StructType)
    if record_root:
        out_schema = (
            prune_schema(dtype, fltr, implicit_root) if has_filter else dtype
        )
        assert isinstance(out_schema, T.StructType)
    else:
        out_schema = T.StructType([T.StructField(DEFAULT_COLUMN, dtype, True)])

    blocks = [b for b in all_blocks if b[2] > 0]
    total = sum(n for _, _, n in blocks)
    if total == 0:
        return Dataset(spark.createDataFrame([], out_schema))

    n_splits = min(
        max(spark.sparkContext.defaultParallelism, 1),
        max(1, -(-total // _TARGET_RECORDS_PER_SPLIT)),
        len(blocks),
    )
    bc = None if path is not None else spark.sparkContext.broadcast(data)
    block_df = spark.createDataFrame(
        blocks,
        T.StructType(
            [
                T.StructField("off", T.LongType()),
                T.StructField("size", T.LongType()),
                T.StructField("n", T.LongType()),
            ]
        ),
    ).repartition(n_splits)
    decoded = block_df.mapInArrow(
        _make_decoder(
            avro_schema,
            codec,
            out_schema,
            record_root,
            fltr if (record_root and has_filter) else None,
            implicit_root,
            path,
            bc,
            writer_schema,
        ),
        out_schema,
    )
    ds = Dataset(decoded)
    if has_filter and not record_root:
        ds = ds.select_columns(include, exclude)
    return ds


# above this many files the driver-side header sweep for schema merging
# moves into a Spark job (headers are metadata-sized; payloads untouched)
_MERGE_DRIVER_MAX_FILES = 64


def _scan_file_header(path: str):
    """Header-only metadata read: magic + meta map + sync, via bounded
    chunked reads — block payloads are never touched."""
    with open(path, "rb") as fh:
        reader = ChunkedReader(fh, error_cls=AvroDecodeError)
        return scan_header_stream(reader)


def read_avro_py(
    paths: Union[str, list],
    include: Any = None,
    exclude: Any = None,
    spark: Optional[SparkSession] = None,
    merge_schemas: bool = True,
) -> Dataset:
    """Distributed MULTI-FILE Avro read without the connector jar — the
    many-files scale path for the pure-Python decoder. One decode task
    per file; each task parses its own header and block index and
    decodes with the clusion-pruned reader — no file bytes pass through
    the driver (the driver reads only per-file *headers*, and only their
    metadata maps at that). For one huge file use ``from_avro``, which
    splits by blocks.

    Schema evolution (Avro spec "Schema Resolution"; reference analogue
    avro_direct.cpp:107-166): with ``merge_schemas=True`` (default) the
    per-file writer schemas are union-merged into one reader schema
    (added fields default-fill or become nullable, numerics widen along
    int→long→float→double, enum symbol sets union) and every file's
    blocks decode against it — old files fill defaults for new fields,
    new files wire-skip nothing the reader wants. With
    ``merge_schemas=False`` the first file's schema is the reader schema
    and other files resolve against it (writer-only fields wire-skip).
    The header sweep runs on the driver below %d files and as a Spark
    metadata job above (schema JSONs, not file bytes, are collected).
    """ % _MERGE_DRIVER_MAX_FILES
    import glob as _glob
    import json as _json
    from functools import reduce

    from bamboo_spark.sources._avro_py import merge_avro_schemas

    if spark is None:
        from bamboo_spark.session import get_spark

        spark = get_spark()
    if isinstance(paths, str):
        files = sorted(os.path.abspath(p) for p in _glob.glob(paths)) or [
            os.path.abspath(paths)
        ]
    else:
        files = [os.path.abspath(p) for p in paths]
    if not files:
        raise ValueError("read_avro_py: no input files")

    fltr = ColumnFilter.parse(include, exclude)
    has_filter = include is not None or exclude is not None
    implicit_root = fltr.include.explicit or fltr.include.is_nothing()

    avro_schema, _codec0, _sync0, _pos0 = _scan_file_header(files[0])
    if merge_schemas and len(files) > 1:
        if len(files) <= _MERGE_DRIVER_MAX_FILES:
            uniq = {}
            for p in files:
                s = _scan_file_header(p)[0]
                uniq.setdefault(_json.dumps(s, sort_keys=True), s)
        else:
            schema_df = spark.createDataFrame(
                [(f,) for f in files],
                T.StructType([T.StructField("path", T.StringType())]),
            ).repartition(min(len(files), 256))

            def _headers(batches):
                import pyarrow as pa

                for batch in batches:
                    out = []
                    for p in batch.column(0).to_pylist():
                        s = _scan_file_header(p)[0]
                        out.append(_json.dumps(s, sort_keys=True))
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(out)], names=["schema_json"]
                    )

            # distinct() BEFORE collect: 100k files usually hold a
            # handful of schema versions — only those reach the driver
            keys = set(
                r.schema_json
                for r in schema_df.mapInArrow(_headers, "schema_json string")
                .distinct()
                .collect()
            )
            uniq = {k: _json.loads(k) for k in sorted(keys)}
        avro_schema = reduce(merge_avro_schemas, uniq.values())
    dtype = avro_to_spark(avro_schema)
    record_root = isinstance(dtype, T.StructType)
    if record_root:
        out_schema = prune_schema(dtype, fltr, implicit_root) if has_filter else dtype
    else:
        out_schema = T.StructType([T.StructField(DEFAULT_COLUMN, dtype, True)])
    schema_key = _json.dumps(avro_schema, sort_keys=True)

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema_ref = to_arrow_schema(out_schema)
    names = [f.name for f in out_schema.fields]
    use_filter = record_root and has_filter

    reader_schema = avro_schema

    def fn(batches):
        import pyarrow as pa

        from bamboo_spark.sources._avro_py import decode_block_resolved

        for batch in batches:
            for p in batch.column(0).to_pylist():
                with open(p, "rb") as fh:
                    data = fh.read()
                f_schema, f_codec, f_sync, f_pos = scan_header(data)
                same = _json.dumps(f_schema, sort_keys=True) == schema_key
                records = []
                for off, size, n in scan_blocks(data, f_pos, f_sync):
                    if same:
                        records.extend(
                            decode_block(
                                data[off : off + size],
                                n,
                                f_codec,
                                f_schema,
                                fltr if use_filter else None,
                                implicit_root,
                            )
                        )
                    else:
                        # evolved file: resolve writer layout against the
                        # merged reader schema (promotions, default fill,
                        # writer-only wire-skip)
                        records.extend(
                            decode_block_resolved(
                                data[off : off + size],
                                n,
                                f_codec,
                                f_schema,
                                reader_schema,
                                fltr if use_filter else None,
                                implicit_root,
                            )
                        )
                if record_root:
                    arrays = [
                        pa.array(
                            [r[nm] for r in records],
                            type=arrow_schema_ref.field(i).type,
                        )
                        for i, nm in enumerate(names)
                    ]
                else:
                    arrays = [pa.array(records, type=arrow_schema_ref.field(0).type)]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema_ref)

    path_df = spark.createDataFrame(
        [(f,) for f in files], T.StructType([T.StructField("path", T.StringType())])
    ).repartition(len(files))
    ds = Dataset(path_df.mapInArrow(fn, out_schema))
    if has_filter and not record_root:
        ds = ds.select_columns(include, exclude)
    return ds
