"""``bamboo_published``: the published table as a FIRST-CLASS Spark
data source (PySpark 4 Python DataSource API) — batch and streaming.

    from bamboo_spark.sources.published import register
    register(spark)

    # batch: manifest-resolved snapshot, index-driven FILE SKIPPING
    # pushed into Spark's own planning (EqualTo -> per-file blooms,
    # range filters -> per-file min/max; filters are re-applied by
    # Spark row-side, so skipping is purely an optimization)
    spark.read.format("bamboo_published").load(table_dir)

    # streaming: offsets ARE snapshot versions; each micro-batch is
    # exactly the files APPENDED between two committed versions (the
    # read_appends delta algebra — pure rewrites contribute nothing,
    # histories that folded undelivered appends raise rather than
    # deliver wrong rows). Exactly-once composes from version
    # monotonicity + Spark's offset log.
    (spark.readStream.format("bamboo_published")
        .option("startingVersion", "0")   # 0 = full history; default =
        .load(table_dir)                  # current version (new rows only)
        .writeStream...)

Executors read their assigned parquet file with pyarrow and return
Arrow RecordBatches straight into Spark's columnar pipeline (no
row-at-a-time Python). Hive partition-column values are parsed from
the file path and attached as constant Arrow columns, so partitioned
snapshots round-trip with the writer's types (the manifest schema
governs, exactly as in ``read_published``).

Backend note: executors open data files directly, so this source
supports plain paths and ``file:`` URIs (the local-cluster shapes);
remote-URI tables should use ``read_published`` (JVM readers) — the
constructor raises up front rather than failing task-side.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def _local_path(table_dir: str) -> str:
    if table_dir.startswith("file:"):
        p = table_dir[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        return p
    if "://" in table_dir:
        raise ValueError(
            "bamboo_published reads files executor-side with pyarrow; "
            "remote URI %r is not supported — use read_published()"
            % table_dir
        )
    return table_dir


def _manifest(table_dir: str) -> dict:
    import os

    with open(os.path.join(_local_path(table_dir), "manifest.json")) as fh:
        return json.load(fh)


@dataclass
class _FilePartition(InputPartition):
    """One task = one data file (+ its path-borne partition values)."""

    path: str            # absolute local path
    rel: str             # manifest-relative path (carries col=val segs)
    schema_json: str
    partition_by: tuple


def _partition_values(rel: str, partition_by) -> dict:
    out = {}
    for seg in rel.split("/"):
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k in partition_by:
                out[k] = v
    return out


def _arrow_batches(part: _FilePartition):
    """Arrow RecordBatches for one file, aligned to the MANIFEST schema
    (missing columns -> null, schema-merge semantics; partition
    columns -> constants parsed from the path, cast to the declared
    type). Runs on executors."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(json.loads(part.schema_json))
    arrow_schema = to_arrow_schema(spark_schema)
    pvals = _partition_values(part.rel, set(part.partition_by))
    tbl = pq.read_table(part.path)
    n = tbl.num_rows
    cols = []
    for field in arrow_schema:
        if field.name in tbl.column_names:
            cols.append(tbl[field.name].cast(field.type))
        elif field.name in pvals:
            scalar = pa.scalar(pvals[field.name], type=pa.string()).cast(
                field.type
            )
            cols.append(pa.chunked_array([[scalar.as_py()] * n], field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    out = pa.table(cols, schema=arrow_schema)
    for batch in out.to_batches():
        yield batch


class _PublishedBatchReader(DataSourceReader):
    """Safe default reader: scans the committed snapshot's full file
    list. Deliberately does NOT implement ``pushFilters`` — Spark
    caches a pushed-down scan inside a shared DataFrame's plan, so a
    later UNFILTERED action on the same DataFrame would silently reuse
    the pruned file list (observed on 4.1: correct count, then a
    groupBy returning one file's rows). Index-driven skipping is the
    opt-in reader below, or ``read_published(skip=..., skip_eq=...)``."""

    def __init__(self, table_dir: str, schema: StructType):
        self._dir = _local_path(table_dir)
        self._schema = schema
        self._eq: dict = {}
        self._lo: dict = {}
        self._hi: dict = {}

    def partitions(self) -> List[InputPartition]:
        import os

        from bamboo_spark.operators.publish import (
            _PosixFS,
            _prune_eq,
            _resolve_entry,
        )

        man = _manifest(self._dir)
        fs = _PosixFS()
        res = _resolve_entry(fs, self._dir, man)
        files = res["files"]
        if self._eq:
            files = _prune_eq(res, files, self._eq)
        if self._lo or self._hi:
            stats = res["file_stats"]
            cols = set(self._lo) | set(self._hi)

            def _keep(f: str) -> bool:
                st = stats.get(f) or {}
                for c in cols:
                    mm = st.get(c)
                    if mm is None:
                        continue
                    mn, mx = mm
                    lo, hi = self._lo.get(c), self._hi.get(c)
                    try:
                        if (hi is not None and mn > hi) or (
                            lo is not None and mx < lo
                        ):
                            return False
                    except TypeError:
                        pass
                return True

            files = [f for f in files if _keep(f)]
        parts = tuple(man.get("partition_by") or [])
        return [
            _FilePartition(
                path=os.path.join(self._dir, f),
                rel=f,
                schema_json=man["schema"],
                partition_by=parts,
            )
            for f in files
        ]

    def read(self, partition: _FilePartition):
        return _arrow_batches(partition)


class _PublishedPushdownReader(_PublishedBatchReader):
    """Opt-in (``.option("pushdown", "true")``): equality/range
    predicates prune the FILE LIST via the segment sidecars' per-file
    blooms and min/max — Spark still re-applies every filter row-side
    (we report them all unsupported), so pruning is purely an
    optimization and bloom false positives are harmless.

    SHARP EDGE (why this is opt-in): use a FRESH ``load()`` per query.
    Spark caches the pushed-down scan inside a DataFrame's plan and
    reuses it for later actions on the SAME DataFrame without
    re-calling pushFilters — an unfiltered action after a filtered one
    would read only the previously-pruned files."""

    def pushFilters(self, filters):
        self._eq, self._lo, self._hi = {}, {}, {}
        for f in filters:
            try:
                col = f.attribute[0] if len(f.attribute) == 1 else None
            except Exception:
                col = None
            if col is not None:
                if isinstance(f, EqualTo):
                    self._eq[col] = f.value
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._lo[col] = f.value
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._hi[col] = f.value
            yield f  # unsupported: Spark keeps the row-side filter


class _PublishedStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, options: dict):
        self._dir = _local_path(table_dir)
        # Spark normalizes option keys to lowercase — look up both
        sv = "latest"
        for k, v in (options or {}).items():
            if str(k).lower() == "startingversion":
                sv = v
        if sv == "latest":
            self._start = int(_manifest(self._dir)["version"])
        else:
            self._start = int(sv)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": int(_manifest(self._dir)["version"])}

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        import os

        from bamboo_spark.operators.publish import (
            _PosixFS,
            _append_delta_files,
        )

        man = _manifest(self._dir)
        files, schema_json, _ = _append_delta_files(
            _PosixFS(),
            self._dir,
            man,
            int(start["version"]),
            int(end["version"]),
        )
        parts = tuple(man.get("partition_by") or [])
        return [
            _FilePartition(
                path=os.path.join(self._dir, f),
                rel=f,
                schema_json=schema_json,
                partition_by=parts,
            )
            for f in files
        ]

    def read(self, partition: _FilePartition):
        return _arrow_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing table-side

    def stop(self) -> None:
        pass


class PublishedTableDataSource(DataSource):
    """``format("bamboo_published")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "bamboo_published"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "bamboo_published: pass the table dir via .load(path)"
            )
        return path

    def schema(self) -> StructType:
        man = _manifest(self._table_dir())
        return StructType.fromJson(json.loads(man["schema"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return _PublishedPushdownReader(self._table_dir(), schema)
        return _PublishedBatchReader(self._table_dir(), schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _PublishedStreamReader(self._table_dir(), dict(self.options))


def register(spark) -> None:
    """Register the ``bamboo_published`` format on this session (and
    enable Python-source filter pushdown, which the reader needs for
    its index-driven file skipping — a runtime-settable SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PublishedTableDataSource)
