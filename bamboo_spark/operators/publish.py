"""Atomic table publishing: the snapshot-commit core of a table format.

Plain `df.write.parquet(dir)` has no commit point — a reader listing
the directory mid-write sees partial files, and a failed job leaves a
corrupt mix. Table formats (Iceberg/Delta) fix this with ONE idea:
readers never list directories; they read a MANIFEST, and a commit is
one atomic swap of that manifest. This module is that idea reduced to
its core:

* ``atomic_publish(df, table_dir)`` writes data files into a
  version-private directory (``_v<N>/``), then commits by atomically
  replacing ``manifest.json``. Readers observe the old snapshot or the
  new one, never a mix; a crashed write leaves an orphan ``_v<N>``
  directory and an untouched manifest (still-consistent table).
* ``read_published(spark, table_dir)`` loads exactly the committed
  snapshot's files.
* ``vacuum(table_dir, keep)`` removes uncommitted/superseded version
  directories — safe because the manifest is the only source of truth.

Filesystem backends: a PLAIN path uses POSIX ``os.replace`` (atomic
within a filesystem); a URI path (``file:``, ``hdfs:``, ``s3a:`` …)
routes every metadata operation through Hadoop's ``FileSystem`` /
``FileContext`` JVM API — the same protocol, committed by
``FileContext.rename(OVERWRITE)`` (atomic on HDFS and local). On
object stores whose rename is copy+delete the manifest file is small
and the manifest POINTER remains the single commit point: a reader
sees the complete old manifest or the complete new one, because the
copy happens under a temporary name and the final PUT is
last-writer-wins on the whole object.

Scale notes: the data write is an ordinary distributed parquet job;
only the manifest swap is driver-side, and the manifest holds file
PATHS (metadata-sized). The row count is captured with
``DataFrame.observe`` DURING the snapshot write — one pass, no
re-scan. The manifest also records row count and schema, giving
readers a free contract check.
"""

from __future__ import annotations

import json
import os

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


class _PosixFS:
    """Local-path backend: stdlib calls, ``os.replace`` commit."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def mkdirs(self, d: str) -> None:
        os.makedirs(d, exist_ok=True)

    def listdir(self, d: str) -> List[str]:
        return os.listdir(d)

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def replace_with(self, content: str, dst: str, tmp_suffix: str) -> None:
        tmp = dst + tmp_suffix
        with open(tmp, "w") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, dst)  # THE commit point

    def rmtree(self, d: str) -> None:
        import shutil

        shutil.rmtree(d)

    def walk_files(self, d: str) -> List[str]:
        """All file paths under ``d``, relative to it (posix slashes)."""
        out = []
        for root, _dirs, files in os.walk(d):
            rel = os.path.relpath(root, d)
            for f in files:
                out.append(f if rel == "." else "%s/%s" % (rel.replace(os.sep, "/"), f))
        return out


class _HadoopFS:
    """URI backend: Hadoop ``FileSystem`` for IO + listing,
    ``FileContext.rename(OVERWRITE)`` for the atomic manifest swap."""

    def __init__(self, uri: str, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._juri = self._jvm.java.net.URI.create(uri)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._juri, self._conf
        )
        self._gw = spark.sparkContext._gateway

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def join(self, *parts: str) -> str:
        return "/".join(x.rstrip("/") for x in parts[:-1]) + "/" + parts[-1]

    def mkdirs(self, d: str) -> None:
        self._fs.mkdirs(self._path(d))

    def listdir(self, d: str) -> List[str]:
        return [
            s.getPath().getName()
            for s in self._fs.listStatus(self._path(d))
        ]

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._path(p))
        baos = self._jvm.java.io.ByteArrayOutputStream()
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            stream, baos, self._conf, True
        )
        return baos.toString("UTF-8")

    def replace_with(self, content: str, dst: str, tmp_suffix: str) -> None:
        tmp = dst + tmp_suffix
        out = self._fs.create(self._path(tmp), True)
        out.write(bytearray(content.encode("utf-8")))
        out.hsync()
        out.close()
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._juri, self._conf
        )
        rename_cls = getattr(
            self._jvm.org.apache.hadoop.fs, "Options$Rename"
        )
        opts = self._gw.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(self._path(tmp), self._path(dst), opts)  # THE commit

    def rmtree(self, d: str) -> None:
        self._fs.delete(self._path(d), True)

    def walk_files(self, d: str) -> List[str]:
        base = self._fs.getFileStatus(self._path(d)).getPath().toString()
        it = self._fs.listFiles(self._path(d), True)
        out = []
        while it.hasNext():
            p = it.next().getPath().toString()
            out.append(p[len(base) + 1:])
        return out


def _is_uri(p: str) -> bool:
    head = p.split("://", 1)[0] if "://" in p else ""
    return bool(head) and head.isalnum() or p.startswith("file:")


def _fs_for(table_dir: str, spark: Optional[SparkSession] = None):
    if not _is_uri(table_dir):
        return _PosixFS()
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "publish: a URI table_dir needs an active SparkSession "
            "(the Hadoop FileSystem API lives in the JVM)"
        )
    return _HadoopFS(table_dir, spark)


def _manifest_path(table_dir: str, fs) -> str:
    return fs.join(table_dir, _MANIFEST)


def current_version(
    table_dir: str, spark: Optional[SparkSession] = None
) -> int:
    """Committed snapshot version, 0 if the table doesn't exist yet."""
    fs = _fs_for(table_dir, spark)
    try:
        return int(json.loads(fs.read_text(_manifest_path(table_dir, fs)))["version"])
    except Exception:
        return 0


def _read_manifest(table_dir: str, fs) -> Optional[dict]:
    try:
        return json.loads(fs.read_text(_manifest_path(table_dir, fs)))
    except Exception:
        return None


def atomic_publish(
    df: DataFrame,
    table_dir: str,
    partition_by=None,
) -> int:
    """Write ``df`` as the table's next snapshot and commit it
    atomically. Returns the committed version number. The manifest row
    count is observed during the write — no second scan.

    ``partition_by`` hive-partitions the snapshot's data files
    (``_v<N>/col=val/part-*.parquet``); the manifest records the
    partition columns and readers restore them via a basePath-anchored
    read, so PARTITION PRUNING works on the published table exactly as
    on a hive layout while file resolution still goes only through the
    manifest.

    TIME TRAVEL: the manifest carries a ``snapshots`` map with every
    still-live committed version's file list/row count/schema. Because
    the history rides the SAME atomically-swapped manifest, it can
    never disagree with the commit it describes — a version appears in
    history iff its publish committed. ``read_published(version=k)``
    reads any retained snapshot; ``vacuum`` prunes history entries
    whose data directories it deletes."""
    from pyspark.sql import Observation, functions as F

    fs = _fs_for(table_dir, df.sparkSession)
    fs.mkdirs(table_dir)
    prev = _read_manifest(table_dir, fs)
    # next version must clear BOTH the committed manifest and any
    # orphan _v<K> left by a writer that died before its commit
    orphans = [
        int(d[2:])
        for d in fs.listdir(table_dir)
        if d.startswith("_v") and d[2:].isdigit()
    ]
    committed = int(prev["version"]) if prev else 0
    version = max([committed] + orphans) + 1
    vdir = fs.join(table_dir, "_v%d" % version)
    obs = Observation()
    writer = df.observe(obs, F.count(F.lit(1)).alias("n")).write
    parts = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ) if partition_by else []
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(vdir)
    n_rows = int(obs.get["n"])
    files = sorted(
        "_v%d/%s" % (version, f)
        for f in fs.walk_files(vdir)
        if f.endswith(".parquet")
    )
    entry = {
        "files": files,
        "n_rows": n_rows,
        "schema": df.schema.json(),
        "partition_by": parts,
    }
    history = dict(prev.get("snapshots", {})) if prev else {}
    # heal pre-history manifests: retain the previous current snapshot
    if prev and str(prev["version"]) not in history:
        history[str(prev["version"])] = {
            "files": prev["files"],
            "n_rows": prev["n_rows"],
            "schema": prev["schema"],
        }
    history[str(version)] = entry
    manifest = {"version": version, "snapshots": history, **entry}
    fs.replace_with(
        json.dumps(manifest),
        _manifest_path(table_dir, fs),
        ".tmp.%d" % version,
    )
    return version


def read_published(
    spark: SparkSession, table_dir: str, version: Optional[int] = None
) -> DataFrame:
    """Read exactly the committed snapshot's manifest-listed files —
    the latest by default, or any retained ``version`` (time travel).
    Raises KeyError for a version never committed or already
    vacuumed."""
    fs = _fs_for(table_dir, spark)
    manifest = json.loads(fs.read_text(_manifest_path(table_dir, fs)))
    if version is None or int(version) == int(manifest["version"]):
        entry = manifest
    else:
        snaps = manifest.get("snapshots", {})
        if str(version) not in snaps:
            raise KeyError(
                "version %s is not a retained snapshot (have: %s)"
                % (version, sorted(int(v) for v in snaps))
            )
        entry = snaps[str(version)]
    paths = [fs.join(table_dir, f) for f in entry["files"]]
    if not paths:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(entry["schema"]))
        )
    reader = spark.read
    if entry.get("partition_by"):
        # anchor partition discovery at the snapshot dir so the
        # col=val path segments come back as columns
        vprefix = entry["files"][0].split("/", 1)[0]
        reader = reader.option("basePath", fs.join(table_dir, vprefix))
    return reader.parquet(*paths)


def snapshots(
    table_dir: str, spark: Optional[SparkSession] = None
) -> List[dict]:
    """Retained snapshot metadata, oldest first:
    [{version, n_rows, n_files, is_current}]."""
    fs = _fs_for(table_dir, spark)
    manifest = json.loads(fs.read_text(_manifest_path(table_dir, fs)))
    cur = int(manifest["version"])
    out = []
    for v, e in sorted(
        manifest.get("snapshots", {}).items(), key=lambda kv: int(kv[0])
    ):
        out.append(
            {
                "version": int(v),
                "n_rows": int(e["n_rows"]),
                "n_files": len(e["files"]),
                "is_current": int(v) == cur,
            }
        )
    return out


def published_rows(
    table_dir: str, spark: Optional[SparkSession] = None
) -> int:
    """The committed snapshot's row count — from the manifest alone."""
    fs = _fs_for(table_dir, spark)
    return int(json.loads(fs.read_text(_manifest_path(table_dir, fs)))["n_rows"])


def vacuum(
    table_dir: str, keep: int = 2, spark: Optional[SparkSession] = None
) -> List[str]:
    """Delete version directories older than the newest ``keep`` that
    are NOT the committed one, and prune their time-travel history
    entries (one atomic manifest rewrite BEFORE the data deletes, so a
    reader never resolves a vacuumed snapshot). Returns the removed
    directory names. Safe by construction: readers resolve files only
    through the manifest, so an uncommitted or superseded ``_v<N>`` is
    garbage."""
    fs = _fs_for(table_dir, spark)
    manifest = _read_manifest(table_dir, fs)
    committed = int(manifest["version"]) if manifest else 0
    versions = sorted(
        int(d[2:])
        for d in fs.listdir(table_dir)
        if d.startswith("_v") and d[2:].isdigit()
    )
    doomed = [
        v
        for v in (versions[:-keep] if keep else versions)
        if v != committed
    ]
    if not doomed:
        return []
    if manifest and manifest.get("snapshots"):
        pruned = {
            v: e
            for v, e in manifest["snapshots"].items()
            if int(v) not in doomed
        }
        if pruned != manifest["snapshots"]:
            manifest["snapshots"] = pruned
            fs.replace_with(
                json.dumps(manifest),
                _manifest_path(table_dir, fs),
                ".tmp.vac",
            )
    removed = []
    for v in doomed:
        fs.rmtree(fs.join(table_dir, "_v%d" % v))
        removed.append("_v%d" % v)
    return removed


def compact(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
) -> int:
    """Small-file compaction: republish the CURRENT snapshot's rows as
    a new version with ~``target_files`` data files (one file per
    partition value when the table is hive-partitioned). Readers never
    see a half-compacted table — the rewrite is an ordinary versioned
    publish committed by the same atomic manifest swap, and the
    pre-compaction version stays readable (time travel) until
    ``vacuum`` reclaims it.

    The ingest pattern this serves: many small appended publishes
    (micro-batch ``foreachBatch`` publishes, ``merge_publish`` deltas)
    accumulate file counts that degrade planning at 100 TB — the
    task-per-file floor and driver listing memory both scale with file
    count, not bytes. A periodic ``compact()`` keeps files
    O(partitions), and because it is just publish-over-read it
    inherits crash consistency for free (a dead compactor leaves only
    an orphan ``_v<K>`` dir the next publish skips past and vacuum
    removes)."""
    from pyspark.sql import functions as F

    cur = read_published(spark, table_dir)
    fs = _fs_for(table_dir, spark)
    manifest = json.loads(fs.read_text(_manifest_path(table_dir, fs)))
    parts = manifest.get("partition_by") or []
    if parts:
        out = cur.repartition(*[F.col(c) for c in parts])
    else:
        out = cur.repartition(target_files)
    return atomic_publish(out, table_dir, partition_by=parts or None)


def merge_publish(
    changes: DataFrame,
    table_dir: str,
    key_cols,
    version_cols,
    op_col: Optional[str] = None,
    delete_op: str = "delete",
) -> int:
    """MERGE INTO with snapshot isolation: apply a CDC change batch
    onto the committed snapshot (``scale.cdc_apply`` — last-writer-wins
    upserts + tombstone deletes in ONE map-combined max-struct
    aggregate, no window) and publish the result as the next version.
    Readers see the pre-merge or post-merge snapshot, never a mix, and
    time travel retains the pre-merge version. First merge into an
    empty table is a plain insert of the change batch's payload.

    Single-writer contract (same as ``atomic_publish``); the merge
    rewrites the table — the right shape while snapshots are
    repartition-light; at petabyte scale a format keeps deltas and
    compacts, which is ``cdc_apply`` run lazily instead of eagerly."""
    from bamboo_spark.operators.scale import cdc_apply

    spark = changes.sparkSession
    fs = _fs_for(table_dir, spark)
    if _read_manifest(table_dir, fs) is None:
        # empty table: insert the non-tombstone changes; the snapshot
        # KEEPS the version columns (cdc_apply needs them on the base
        # side of the next merge), dropping only the op marker
        from pyspark.sql import functions as F

        base = changes
        if op_col:
            base = base.where(F.col(op_col) != delete_op).drop(op_col)
        return atomic_publish(base, table_dir)
    base = read_published(spark, table_dir)
    merged = cdc_apply(
        base,
        changes,
        key_cols,
        version_cols if not isinstance(version_cols, str) else [version_cols],
        op_col=op_col,
        delete_op=delete_op,
    )
    return atomic_publish(merged, table_dir)


def diff_versions(
    spark: SparkSession,
    table_dir: str,
    old_version: int,
    new_version: Optional[int] = None,
    id_col: str = "id",
    content_col: Optional[str] = None,
) -> DataFrame:
    """Audit what changed between two retained snapshots: per id,
    'added' / 'removed' / 'changed' / 'unchanged' via
    ``scale.snapshot_diff`` (digest-only shuffle). ``content_col``
    defaults to every non-id column packed into one struct, so any
    payload change counts as 'changed'."""
    from pyspark.sql import functions as F

    from bamboo_spark.operators.scale import snapshot_diff

    old = read_published(spark, table_dir, version=old_version)
    new = read_published(spark, table_dir, version=new_version)
    if content_col is None:
        content_col = "_payload"
        pack = lambda df: df.select(  # noqa: E731
            F.col(id_col),
            F.to_json(
                F.struct(*[c for c in df.columns if c != id_col])
            ).alias("_payload"),
        )
        old, new = pack(old), pack(new)
    return snapshot_diff(old, new, id_col=id_col, content_col=content_col)
