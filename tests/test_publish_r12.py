"""Round-12 ADVICE fixes: exact streaming-CDF column resolution across
rename-then-compact histories (mirroring read_changes' walked-entry
evolution detection + field-id continuity refusal), routine reclaim of
a lost dv-delete race's staging artifacts, and in-lease resolution of
``tag_version(version=None)``.

Reference parity: the reference (mvilim/bamboo) has no table format;
this suite pins the Delta-CDF-style contracts re-expressed Spark-first.
"""

import threading
import time
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from bamboo_spark.operators import publish as P
from bamboo_spark.operators.publish import (
    append_publish,
    atomic_publish,
    compact,
    delete_publish,
    read_published,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _fs():
    return P._PosixFS()


# ------------------------------------------------- CDF across rename+compact


def test_cdf_delta_resolves_pre_compact_files_of_renamed_table(
    spark, tmp_path
):
    """ADVICE r11 (medium): a CDF plan whose range delivers PRE-COMPACT
    files of a formerly-renamed table must resolve their physical
    columns from the WALKED entries — the post-compact planning
    manifest has schema_evolved cleared, and resolving against it alone
    yields fields=None (identity), silently reading the renamed column
    as NULL."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 5).coalesce(1), d)       # v1 phys "v"
    P.rename_column(d, "v", "amount", spark=spark)          # v2
    compact(spark, d)                                       # v3 dataChange=False
    fs = _fs()
    man = P._read_manifest(d, fs)
    assert not man.get("schema_evolved")  # compact cleared the flag
    plan = P._cdf_delta(fs, d, man, 0, 3)
    inserts = [p for p in plan if p["kind"] == "insert"]
    assert len(inserts) == 1  # v1's file; v2/v3 contribute nothing
    fields = dict(inserts[0]["fields"] or ())
    assert fields.get("amount") == "v", (
        "pre-compact file must resolve logical 'amount' to physical "
        "'v'; got fields=%r" % (inserts[0]["fields"],)
    )


def test_cdf_stream_catching_up_across_rename_then_compact(
    spark, tmp_path
):
    """End-to-end through the bamboo_published streaming source: a
    readChangeFeed stream starting at 0 on a rename-then-compacted
    table delivers the pre-rename inserts with the renamed column's
    DATA under the new name (not NULL)."""
    from bamboo_spark.sources.published import register

    register(spark)
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    atomic_publish(_rows(spark, 0, 5).coalesce(1), d)       # v1
    P.rename_column(d, "v", "amount", spark=spark)          # v2
    compact(spark, d)                                       # v3
    seen = []

    def sink(batch_df, bid):
        seen.extend(
            (r["_commit_version"], r["_change_type"], r["k"], r["amount"])
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("bamboo_published")
        .option("startingVersion", "0")
        .option("readChangeFeed", "true")
        .load(d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(seen) == [(1, "insert", k, k * 10) for k in range(5)]


def test_cdf_delta_refuses_broken_id_space(spark, tmp_path):
    """A full rewrite that re-assigned field ids (drop a middle column,
    then compact re-stamps positionally) makes exact cross-era
    resolution impossible — the CDF planner must refuse like
    read_changes does, not guess."""
    d = str(tmp_path / "t")
    atomic_publish(
        spark.range(0, 5).select(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            (F.col("id") * 3).alias("c"),
        ).coalesce(1),
        d,
    )                                                       # v1 ids a:1 b:2 c:3
    P.drop_column(d, "b", spark=spark)                      # v2 ids a:1 c:3
    compact(spark, d)                                       # v3 ids a:1 c:2 (!)
    fs = _fs()
    man = P._read_manifest(d, fs)
    with pytest.raises(ValueError, match="re-assigned field ids"):
        P._cdf_delta(fs, d, man, 0, 3)
    # the batch CDF refuses the same range identically
    with pytest.raises(ValueError, match="re-assigned field ids"):
        P.read_changes(spark, d, from_version=0, to_version=3)


# -------------------------------------------------- dv race staging reclaim


def test_dv_retry_conflict_reclaims_staging(spark, tmp_path, monkeypatch):
    """ADVICE r11 (low): a dv-delete attempt that loses its optimistic
    race must reclaim its claimed ``_v<N>`` staging dir + ``.claim``
    marker before the retry — lost races are ROUTINE under the bounded
    retry, and leaking one orphan dir per attempt until vacuum's TTL
    ages it out bloats contended tables."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 300).coalesce(1), d)
    orig_build = P._dv_build
    state = {"raced": False}

    def racing_build(*a, **kw):
        out = orig_build(*a, **kw)
        if not state["raced"]:
            state["raced"] = True
            delete_publish(spark, d, "k % 5 = 1", delete_vectors=True)
        return out

    monkeypatch.setattr(P, "_dv_build", racing_build)
    ver = delete_publish(spark, d, "k % 5 = 0", delete_vectors=True)
    monkeypatch.undo()
    assert state["raced"] and ver == 3
    # no stray claim markers, and every _v dir is referenced (v1 data
    # seg + the two committed dv sidecar dirs) — the failed attempt's
    # staging dir was reclaimed at conflict time, not left for vacuum
    names = sorted(x.name for x in Path(d).iterdir())
    assert not [n for n in names if n.endswith(".claim")], names
    vdirs = [n for n in names if n.startswith("_v")]
    assert len(vdirs) == 3, (
        "expected exactly 3 referenced _v dirs (data seg + 2 dv "
        "commits); orphan staging leaked: %s" % vdirs
    )
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == [k for k in range(300) if k % 5 not in (0, 1)]


# ------------------------------------------------------- tag_version(None)


def test_tag_version_default_resolves_inside_lease(spark, tmp_path):
    """ADVICE r11 (low): ``tag_version(version=None)`` means "tag the
    CURRENT version" — resolved from the in-lease re-read, so a
    concurrent data commit that lands while the tagger waits for the
    lease is what gets tagged, not the pre-lease snapshot."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 10), d)                  # v1
    fs = _fs()
    lease = P._Lease(fs, d).acquire()
    err = []

    def tagger():
        try:
            P.tag_version(d, "cur", spark=spark)
        except Exception as e:  # pragma: no cover - diagnostic
            err.append(e)

    t = threading.Thread(target=tagger)
    t.start()
    # the tagger has pre-read v1 and is polling for the lease; commit
    # v2 under the held lease, then release it to let the tagger in
    time.sleep(0.5)
    atomic_publish(_rows(spark, 0, 20), d, _lease=lease)    # v2
    lease.release()
    t.join()
    assert not err
    man = P._read_manifest(d, fs)
    assert man["version"] == 3  # v3 = the tag's metadata commit
    assert (man.get("tags") or {}).get("cur") == 2, man.get("tags")
