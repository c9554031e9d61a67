"""Atomic table publishing: the snapshot-commit core of a table format.

Plain `df.write.parquet(dir)` has no commit point — a reader listing
the directory mid-write sees partial files, and a failed job leaves a
corrupt mix. Table formats (Iceberg/Delta) fix this with ONE idea:
readers never list directories; they read a MANIFEST, and a commit is
one atomic swap of that manifest. This module is that idea reduced to
its core, POSIX-rename edition:

* ``atomic_publish(df, table_dir)`` writes data files into a
  version-private directory (``_v<N>/``), then commits by atomically
  replacing ``manifest.json`` (os.replace — atomic on POSIX within a
  filesystem). Readers observe the old snapshot or the new one, never
  a mix; a crashed write leaves an orphan ``_v<N>`` directory and an
  untouched manifest (still-consistent table).
* ``read_published(spark, table_dir)`` loads exactly the committed
  snapshot's files.
* ``vacuum(table_dir, keep)`` removes uncommitted/superseded version
  directories — safe because the manifest is the only source of truth.

Scale notes: the data write is an ordinary distributed parquet job;
only the manifest swap is driver-side, and the manifest holds file
PATHS (metadata-sized). On object stores without atomic rename the
same protocol rides a conditional PUT — the shape is identical. The
manifest also records row count and schema, giving readers a free
contract check.
"""

from __future__ import annotations

import json
import os

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def current_version(table_dir: str) -> int:
    """Committed snapshot version, 0 if the table doesn't exist yet."""
    try:
        with open(_manifest_path(table_dir)) as fh:
            return int(json.load(fh)["version"])
    except (OSError, ValueError, KeyError):
        return 0


def atomic_publish(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the table's next snapshot and commit it
    atomically. Returns the committed version number."""
    os.makedirs(table_dir, exist_ok=True)
    # next version must clear BOTH the committed manifest and any
    # orphan _v<K> left by a writer that died before its commit
    orphans = [
        int(d[2:])
        for d in os.listdir(table_dir)
        if d.startswith("_v") and d[2:].isdigit()
    ]
    version = max([current_version(table_dir)] + orphans) + 1
    vdir = os.path.join(table_dir, "_v%d" % version)
    df.write.parquet(vdir)
    files = sorted(
        os.path.join("_v%d" % version, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet")
    )
    n_rows = df.sparkSession.read.parquet(vdir).count()
    manifest = {
        "version": version,
        "files": files,
        "n_rows": n_rows,
        "schema": df.schema.json(),
    }
    tmp = _manifest_path(table_dir) + ".tmp.%d" % version
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _manifest_path(table_dir))  # THE commit point
    return version


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read exactly the committed snapshot (manifest-listed files)."""
    with open(_manifest_path(table_dir)) as fh:
        manifest = json.load(fh)
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    if not paths:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(manifest["schema"]))
        )
    return spark.read.parquet(*paths)


def published_rows(table_dir: str) -> int:
    """The committed snapshot's row count — from the manifest alone."""
    with open(_manifest_path(table_dir)) as fh:
        return int(json.load(fh)["n_rows"])


def vacuum(table_dir: str, keep: int = 2) -> List[str]:
    """Delete version directories older than the newest ``keep`` that
    are NOT the committed one. Returns the removed directory names.
    Safe by construction: readers resolve files only through the
    manifest, so an uncommitted or superseded ``_v<N>`` is garbage."""
    import shutil

    committed = current_version(table_dir)
    removed = []
    versions = sorted(
        int(d[2:])
        for d in os.listdir(table_dir)
        if d.startswith("_v") and d[2:].isdigit()
    )
    for v in versions[:-keep] if keep else versions:
        if v != committed:
            shutil.rmtree(os.path.join(table_dir, "_v%d" % v))
            removed.append("_v%d" % v)
    return removed
