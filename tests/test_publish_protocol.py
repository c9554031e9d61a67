"""Commit-protocol hardening: CAS-validated manifest swap (a
TTL-evicted writer can never clobber a committed snapshot), ABA-safe
lease breaking, lease scoping for maintenance ops, strict schema type
checking, and table-meta carry-forward through every publish flavor."""

import json
import os
import time

import pytest

from bamboo_spark.operators import publish as P
from bamboo_spark.operators.publish import (
    ConcurrentWriteError,
    append_publish,
    atomic_publish,
    compact,
    compact_partitions,
    current_version,
    delete_publish,
    optimize_table,
    read_published,
    replace_partitions_publish,
    table_meta,
    vacuum,
)


def _backdate_lock(table_dir, by_ms=400_000):
    lock = os.path.join(table_dir, "_commit.lock")
    old = time.time() - by_ms / 1000.0
    os.utime(lock, (old, old))


@pytest.mark.parametrize("backend", ["posix", "hadoop-file-uri"])
def test_evicted_writer_commit_raises_and_breaker_snapshot_survives(
    spark, tmp_path, backend
):
    """THE lost-update scenario: writer A acquires the lease and starts
    a long write; the lease expires (backdated lock); writer B breaks
    the stale lock and commits; A finishes and tries to swap the
    manifest built against the pre-B version — the CAS must make A
    RAISE, and B's committed snapshot must survive with the version
    number moving only forward. Exercised through BOTH filesystem
    backends (the Hadoop JVM path is what hdfs:// tables take)."""
    local = str(tmp_path / "tbl")
    t = "file://" + local if backend == "hadoop-file-uri" else local
    atomic_publish(spark.range(5).selectExpr("id", "id as x"), t)  # v1
    fs = P._fs_for(t, spark)

    # writer A: lease acquired, snapshot plan built against v1
    lease_a = P._Lease(fs, t).acquire()
    prev_a = P._read_manifest(t, fs)
    version_a = P._next_version(fs, t, prev_a)

    # A's lease expires mid-write (the lock file is local under both
    # backends here; file: routes its METADATA ops through the JVM)
    _backdate_lock(local)

    # writer B: breaks the stale lock and commits the next version
    v_b = append_publish(spark.range(3).selectExpr("id", "id as x"), t)
    assert v_b == 2 and current_version(t) == 2

    # A finishes its write and tries to commit → must raise, not clobber
    entry_a = {
        "files": [],
        "n_rows": 0,
        "size_bytes": 0,
        "file_sizes": {},
        "schema": prev_a["schema"],
        "partition_by": [],
    }
    with pytest.raises(ConcurrentWriteError):
        P._commit(fs, t, prev_a, version_a, entry_a, lease=lease_a)

    # B's snapshot is intact; version never went backwards
    assert current_version(t) == 2
    assert read_published(spark, t).count() == 8
    # A's release must not delete B's (or a later writer's) lock:
    # the lock was A's once, but the break replaced it
    lease_a.release()


def test_still_mine_false_after_break(spark, tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(t, exist_ok=True)
    fs = P._PosixFS()
    a = P._Lease(fs, t).acquire()
    assert a.still_mine()
    _backdate_lock(t)
    b = P._Lease(fs, t).acquire()  # breaks A's stale lock
    assert b.still_mine() and not a.still_mine()
    a.release()  # must NOT remove B's lock
    assert b.still_mine()
    b.release()


def test_strict_append_rejects_type_change(spark, tmp_path):
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(4).selectExpr("id", "cast(id as double) as amount"), t
    )
    # same column NAMES, retyped amount → strict mode must refuse
    bad = spark.range(2).selectExpr("id", "cast(id as string) as amount")
    with pytest.raises(ValueError, match="types"):
        append_publish(bad, t)
    # identical schema still appends fine
    ok = spark.range(2).selectExpr("id", "cast(id as double) as amount")
    assert append_publish(ok, t) == 2


def test_meta_carries_through_maintenance_commits(spark, tmp_path):
    """A streaming sink's exactly-once HWM (manifest meta) must survive
    compact()/optimize_table — a maintenance commit that erased it
    would make the next replayed batch double-append."""
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(10).selectExpr("id", "id % 3 as g"),
        t,
        meta={"last_bid": 7},
    )
    append_publish(
        spark.range(5).selectExpr("id", "id % 3 as g"),
        t,
        meta={"last_bid": 8},
    )
    assert table_meta(t)["last_bid"] == 8
    compact(spark, t)  # maintenance passes no meta
    assert table_meta(t)["last_bid"] == 8, "compact erased the HWM"
    optimize_table(spark, t, stats_cols=["id"])
    assert table_meta(t)["last_bid"] == 8
    # an explicit meta write still overrides per-key and adds new keys
    append_publish(
        spark.range(2).selectExpr("id", "id % 3 as g"),
        t,
        meta={"last_bid": 9, "owner": "ingest"},
    )
    m = table_meta(t)
    assert m["last_bid"] == 9 and m["owner"] == "ingest"


def test_publish_stream_hwm_survives_compact(spark, tmp_path):
    """End-to-end ADVICE scenario: publish_stream batches, a compact()
    between them, then a REPLAYED batch id — the replay must still be
    skipped (no double rows)."""
    t = str(tmp_path / "tbl")

    def run_batch(df, bid):
        # publish_stream's exact sink contract, batch ids under our
        # control (foreachBatch ids aren't replayable in a unit test)
        hwm = table_meta(t, spark).get("last_bid")
        if hwm is not None and int(bid) <= int(hwm):
            return
        append_publish(df, t, meta={"last_bid": int(bid)})

    run_batch(spark.range(4).selectExpr("id"), 0)
    run_batch(spark.range(4, 7).selectExpr("id"), 1)
    assert read_published(spark, t).count() == 7
    compact(spark, t)  # maintenance between micro-batches
    run_batch(spark.range(4, 7).selectExpr("id"), 1)  # replayed batch
    assert read_published(spark, t).count() == 7, "replay double-appended"
    run_batch(spark.range(7, 9).selectExpr("id"), 2)  # stream continues
    assert read_published(spark, t).count() == 9


def test_maintenance_ops_respect_held_lease(spark, tmp_path, monkeypatch):
    """vacuum / compact_partitions / delete_publish now take the table
    lease — with another writer holding it they must refuse, not race.
    (Commit waits shrink so refusal is fast; production keeps 30 s to
    ride out committer pile-ups.)"""
    monkeypatch.setattr(P, "_COMMIT_WAIT_MS", 500)
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(10).selectExpr("id", "cast(id % 2 as string) as g"),
        t,
        partition_by="g",
    )
    fs = P._PosixFS()
    other = P._Lease(fs, t).acquire()
    try:
        with pytest.raises(ConcurrentWriteError):
            vacuum(t, keep=1)
        with pytest.raises(ConcurrentWriteError):
            compact_partitions(spark, t, min_files=1)
        with pytest.raises(ConcurrentWriteError):
            delete_publish(spark, t, "id = 3")
    finally:
        other.release()
    # and with the lease free they all work
    assert delete_publish(spark, t, "id = 3") == 2
    assert read_published(spark, t).count() == 9


def test_compact_partitions_commit_is_atomic_with_resolve(spark, tmp_path):
    """compact_partitions holds ONE lease across snapshot-resolve and
    rewrite: its internal replace_partitions_publish must reuse the
    outer lease (no deadlock, exactly one new version)."""
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(6).selectExpr("id", "cast(id % 2 as string) as g"),
        t,
        partition_by="g",
    )
    append_publish(
        spark.range(6, 12).selectExpr("id", "cast(id % 2 as string) as g"), t
    )
    v = compact_partitions(spark, t, min_files=2)
    assert v == 3
    assert read_published(spark, t).count() == 12
    # lock released afterwards
    assert not os.path.exists(os.path.join(t, "_commit.lock"))


# ---------------------------------------------------------------- segments


def _manifest_bytes(t):
    return os.path.getsize(os.path.join(t, "manifest.json"))


def test_segmented_manifest_stays_small_under_append_loop(spark, tmp_path):
    """The scale contract of the segmented manifest: the TOP manifest's
    byte size stays ~constant as appended versions (and files)
    accumulate — per-file detail lives in per-version sidecars, so a
    1M-file table's per-commit metadata IO is O(batch), not O(table)."""
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(8).selectExpr("id", "id as x").repartition(4), t
    )
    vacuum_keep_sizes = []
    for i in range(8):
        append_publish(
            spark.range(8).selectExpr("id", "id as x").repartition(4), t
        )
        vacuum(t, keep=2)  # steady-state retention, as deployed
        vacuum_keep_sizes.append(_manifest_bytes(t))
    # 4 files per version x 9 versions: manifest growth must NOT track
    # file count — allow bookkeeping drift, forbid O(files) growth
    assert vacuum_keep_sizes[-1] < vacuum_keep_sizes[0] * 2
    # per-file detail is really in the sidecars
    man = json.load(open(os.path.join(t, "manifest.json")))
    assert man.get("files") is None and man.get("segments")
    assert read_published(spark, t).count() == 8 * 9
    # and commit IO is O(delta): the latest version dir's sidecar lists
    # only ITS files
    seg = json.load(
        open(os.path.join(t, "_v%d" % man["version"], "_seg.json"))
    )
    assert len(seg["files"]) == 4


def test_segmented_time_travel_and_replace(spark, tmp_path):
    t = str(tmp_path / "tbl")
    import pyspark.sql.functions as F

    df = spark.range(30).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    atomic_publish(df, t, partition_by="k")
    append_publish(
        spark.range(30, 36).select(
            (F.col("id") % 3).cast("string").alias("k"),
            F.col("id").alias("v"),
        ),
        t,
    )
    repl = spark.createDataFrame(
        [("1", 1000)], "k string, v long"
    )
    v3 = replace_partitions_publish(repl, t, values=["1"])
    assert v3 == 3
    cur = read_published(spark, t)
    assert cur.where("k = '1'").count() == 1
    # k=0: 10+2, k=2: 10+2 carried; k=1 replaced by a single row
    assert cur.count() == 12 + 12 + 1
    # time travel still resolves every retained snapshot exactly
    assert read_published(spark, t, version=1).count() == 30
    assert read_published(spark, t, version=2).count() == 36


def test_segment_prune_drops_fully_replaced_versions(spark, tmp_path):
    """After a partition's files are all replaced, the segment that
    owned only those files leaves the snapshot's segment list and its
    entries leave 'removed' — the manifest doesn't accumulate tombstone
    lists over the table's lifetime."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    base = spark.range(10).select(
        F.lit("a").alias("k"), F.col("id").alias("v")
    ).coalesce(1)
    atomic_publish(base, t, partition_by="k")
    # append a second version touching ONLY k=b
    append_publish(
        spark.range(5).select(
            F.lit("b").alias("k"), F.col("id").alias("v")
        ).coalesce(1),
        t,
    )
    # replace k=b entirely: _v2's segment is fully shadowed → pruned
    replace_partitions_publish(
        spark.createDataFrame([("b", 99)], "k string, v long"),
        t,
        values=["b"],
    )
    man = json.load(open(os.path.join(t, "manifest.json")))
    assert "_v2" not in (man.get("segments") or [])
    assert man.get("removed") == []
    got = read_published(spark, t)
    assert got.count() == 11
    assert got.where("k = 'b'").count() == 1


def test_legacy_inline_manifest_migrates_on_next_commit(spark, tmp_path):
    """A table whose manifest predates segmentation (inline file list)
    keeps reading, and the FIRST new commit migrates it to segment
    sidecars without changing any snapshot's content."""
    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(12).selectExpr("id", "id as x"), t)
    # rewrite the manifest into the legacy inline format
    fs = P._PosixFS()
    man = P._read_manifest(t, fs)
    res = P._resolve_entry(fs, t, man)
    legacy_entry = {
        "files": res["files"],
        "file_sizes": res["file_sizes"],
        "n_rows": man["n_rows"],
        "size_bytes": man["size_bytes"],
        "schema": man["schema"],
        "partition_by": man.get("partition_by") or [],
    }
    legacy = {
        "version": 1,
        "snapshots": {"1": legacy_entry},
        **legacy_entry,
    }
    os.remove(os.path.join(t, "_v1", "_seg.json"))
    fs.replace_with(json.dumps(legacy), os.path.join(t, "manifest.json"), ".tmp")
    assert read_published(spark, t).count() == 12  # legacy read works
    v2 = append_publish(spark.range(12, 20).selectExpr("id", "id as x"), t)
    assert v2 == 2
    man2 = json.load(open(os.path.join(t, "manifest.json")))
    assert man2.get("files") is None  # migrated to segments
    assert set(man2["segments"]) == {"_v1", "_v2"}
    assert os.path.exists(os.path.join(t, "_v1", "_seg.json"))
    assert read_published(spark, t).count() == 20
    assert read_published(spark, t, version=2).count() == 20


def test_segmented_stats_skipping_still_prunes(spark, tmp_path):
    from bamboo_spark.operators.publish import (
        collect_file_stats,
        publish_clustered,
    )

    t = str(tmp_path / "tbl")
    publish_clustered(
        spark.range(10000).selectExpr("id", "id as v"), t, "v",
        target_files=10,
    )
    full = read_published(spark, t)
    pruned = read_published(spark, t, skip={"v": (0, 500)})
    # skipping is conservative: the pruned read is a SUPERSET of the
    # matching rows and reads strictly fewer files
    assert (
        pruned.where("v <= 500").count()
        == full.where("v <= 500").count()
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # stats survive an append (per-segment sidecars)
    append_publish(spark.range(10000, 10100).selectExpr("id", "id as v"), t)
    collect_file_stats(t, ["v"], spark)
    pruned2 = read_published(spark, t, skip={"v": (0, 500)})
    assert len(pruned2.inputFiles()) < len(
        read_published(spark, t).inputFiles()
    )


# ---------------------------------------------------------- write-time stats


@pytest.mark.parametrize("backend", ["posix", "hadoop-file-uri"])
def test_write_time_stats_prune_on_both_backends(spark, tmp_path, backend):
    """stats_cols= on the publish records per-file min/max during the
    commit via a distributed job — so skip= prunes files on a Hadoop
    ``file:`` URI table too (where the old driver footer loop returned
    no stats and skipping silently degraded to a no-op)."""
    local = str(tmp_path / "tbl")
    t = "file://" + local if backend == "hadoop-file-uri" else local
    from bamboo_spark.operators.publish import publish_clustered

    publish_clustered(
        spark.range(8000).selectExpr("id", "id as v"), t, "v",
        target_files=8,
    )
    full = read_published(spark, t)
    pruned = read_published(spark, t, skip={"v": (0, 400)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert (
        pruned.where("v <= 400").count()
        == full.where("v <= 400").count()
    )


def test_append_write_time_stats_cover_only_new_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(100).selectExpr("id", "id as v").coalesce(1), t,
        stats_cols=["v"],
    )
    append_publish(
        spark.range(100, 200).selectExpr("id", "id as v").coalesce(1), t,
        stats_cols=["v"],
    )
    man = json.load(open(os.path.join(t, "manifest.json")))
    for seg in man["segments"]:
        s = json.load(open(os.path.join(t, seg, "_seg.json")))
        assert s.get("file_stats"), "segment %s missing write-time stats" % seg
        for f in s["files"]:
            assert f in s["file_stats"]
    # range skip over the appended half opens only its file
    pruned = read_published(spark, t, skip={"v": (150, None)})
    assert len(pruned.inputFiles()) == 1


def test_write_time_stats_on_partition_column(spark, tmp_path):
    """Partition columns are path-borne, but under a basePath-anchored
    read they are real attributes — write-time stats must cover them so
    a day-bounded skip prunes without any partition_by-specific code."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(40).select(
        F.concat(F.lit("2024-01-0"), (F.col("id") % 4 + 1)).alias("d"),
        F.col("id").alias("v"),
    )
    atomic_publish(df, t, partition_by="d", stats_cols=["d"])
    pruned = read_published(
        spark, t, skip={"d": ("2024-01-03", "2024-01-04")}
    )
    assert set(
        r[0] for r in pruned.select("d").distinct().collect()
    ) == {"2024-01-03", "2024-01-04"}
    full = read_published(spark, t)
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_collect_file_stats_distributed_on_hadoop_backend(spark, tmp_path):
    """Post-hoc backfill also works on the Hadoop URI backend now."""
    local = str(tmp_path / "tbl")
    t = "file://" + local
    from bamboo_spark.operators.publish import collect_file_stats

    atomic_publish(
        spark.range(4000).selectExpr("id", "id as v")
        .repartitionByRange(4, "v").sortWithinPartitions("v"),
        t,
    )
    n = collect_file_stats(t, ["v"], spark)
    assert n >= 4
    full = read_published(spark, t)
    pruned = read_published(spark, t, skip={"v": (0, 200)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())


# ------------------------------------------------- optimistic concurrency


def _seed_days(spark, t):
    import pyspark.sql.functions as F

    df = spark.range(20).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
        F.col("id").alias("v"),
    )
    atomic_publish(df, t, partition_by="k")


def test_disjoint_append_merges_into_moved_manifest(spark, tmp_path,
                                                    monkeypatch):
    """An append whose data write raced a concurrent commit REBASES:
    both snapshots' rows land, nothing raises (appends commute)."""
    t = str(tmp_path / "tbl")
    _seed_days(spark, t)
    injected = {"done": False}
    orig = P._scan_written

    def hook(fs, vdir, vname):
        if not injected["done"]:
            injected["done"] = True
            # a concurrent writer commits BETWEEN our base read and our
            # commit (we are mid-write right now)
            repl = spark.createDataFrame([("b", 777)], "k string, v long")
            replace_partitions_publish(repl, t, values=["b"])
        return orig(fs, vdir, vname)

    monkeypatch.setattr(P, "_scan_written", hook)
    v = append_publish(
        spark.createDataFrame([("a", 555)], "k string, v long"), t
    )
    monkeypatch.setattr(P, "_scan_written", orig)
    assert v == 3  # rebased onto the replace's version 2
    got = read_published(spark, t)
    assert got.where("v = 555").count() == 1  # our append landed
    assert got.where("v = 777").count() == 1  # their replace survived
    assert got.where("k = 'b'").count() == 1  # replace semantics intact


def test_disjoint_replace_merges_into_moved_manifest(spark, tmp_path,
                                                     monkeypatch):
    """replace on partition 'a' racing an append into partition 'b':
    disjoint partitions — both commits land exactly."""
    t = str(tmp_path / "tbl")
    _seed_days(spark, t)
    injected = {"done": False}
    orig = P._scan_written

    def hook(fs, vdir, vname):
        if not injected["done"]:
            injected["done"] = True
            append_publish(
                spark.createDataFrame([("b", 888)], "k string, v long"), t
            )
        return orig(fs, vdir, vname)

    monkeypatch.setattr(P, "_scan_written", hook)
    v = replace_partitions_publish(
        spark.createDataFrame([("a", 111)], "k string, v long"),
        t,
        values=["a"],
    )
    monkeypatch.setattr(P, "_scan_written", orig)
    assert v == 3
    got = read_published(spark, t)
    assert got.where("k = 'a'").count() == 1   # replace applied
    assert got.where("v = 111").count() == 1
    assert got.where("v = 888").count() == 1   # concurrent append kept
    assert P._read_manifest(t, P._PosixFS())["n_rows"] == got.count()


def test_same_partition_conflict_raises_not_drops(spark, tmp_path,
                                                  monkeypatch):
    """A concurrent commit into the partition being replaced is a REAL
    conflict: merging would silently drop its rows, so the replace must
    raise and leave the concurrent commit intact."""
    t = str(tmp_path / "tbl")
    _seed_days(spark, t)
    injected = {"done": False}
    orig = P._scan_written

    def hook(fs, vdir, vname):
        if not injected["done"]:
            injected["done"] = True
            append_publish(
                spark.createDataFrame([("a", 999)], "k string, v long"), t
            )
        return orig(fs, vdir, vname)

    monkeypatch.setattr(P, "_scan_written", hook)
    with pytest.raises(ConcurrentWriteError):
        replace_partitions_publish(
            spark.createDataFrame([("a", 111)], "k string, v long"),
            t,
            values=["a"],
        )
    monkeypatch.setattr(P, "_scan_written", orig)
    got = read_published(spark, t)
    assert got.where("v = 999").count() == 1  # their append survived
    assert got.where("v = 111").count() == 0  # our replace NOT committed


def test_two_thread_disjoint_replaces_both_commit(spark, tmp_path):
    """The VERDICT scenario verbatim: two writers on different
    partition values run CONCURRENTLY (threads, shared session) — both
    commits land; the commit lease only serializes the sub-second
    swaps."""
    import threading

    t = str(tmp_path / "tbl")
    _seed_days(spark, t)
    errs = []

    def do(day, val):
        try:
            replace_partitions_publish(
                spark.createDataFrame([(day, val)], "k string, v long"),
                t,
                values=[day],
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append((day, e))

    th = [
        threading.Thread(target=do, args=("a", 100)),
        threading.Thread(target=do, args=("b", 200)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    assert current_version(t) == 3  # two commits, monotonic versions
    got = read_published(spark, t)
    assert got.count() == 2
    assert {
        (r["k"], r["v"]) for r in got.collect()
    } == {("a", 100), ("b", 200)}


def test_ingest_concurrent_with_maintenance(spark, tmp_path, monkeypatch):
    """publish_stream-shaped append lands WHILE compact_partitions is
    folding a different partition: the compaction rebases and both
    survive — the 'streaming ingest + nightly optimize' deployment."""
    t = str(tmp_path / "tbl")
    import pyspark.sql.functions as F

    # fragment partition a across two appends; b has one file
    for lo in (0, 10):
        append_publish(
            spark.range(lo, lo + 10).select(
                F.lit("a").alias("k"), F.col("id").alias("v")
            ).coalesce(1),
            t,
            partition_by="k",
        )
    append_publish(
        spark.range(100, 105).select(
            F.lit("b").alias("k"), F.col("id").alias("v")
        ).coalesce(1),
        t,
    )
    injected = {"done": False}
    orig = P._scan_written

    def hook(fs, vdir, vname):
        if not injected["done"]:
            injected["done"] = True
            # ingest commits a batch into UNTOUCHED partition b while
            # the compactor is mid-rewrite of partition a
            append_publish(
                spark.createDataFrame([("b", 500)], "k string, v long"), t
            )
        return orig(fs, vdir, vname)

    monkeypatch.setattr(P, "_scan_written", hook)
    v = compact_partitions(spark, t, values=["a"])
    monkeypatch.setattr(P, "_scan_written", orig)
    assert v is not None
    got = read_published(spark, t)
    assert got.where("k = 'a'").count() == 20  # compaction exact
    assert got.where("v = 500").count() == 1   # concurrent batch kept
    a_files = [f for f in P.live_files(t, spark) if "k=a" in f]
    assert len(a_files) == 1  # folded


# --------------------------------------------------------- bloom skipping


def test_bloom_positions_python_matches_spark(spark):
    """The pure-Python position function and the Spark expression must
    agree bit-for-bit — the driver plans with one, executors built with
    the other."""
    import pyspark.sql.functions as F

    vals = ["alpha", "beta", "42", "x y"]
    m, k = P._BLOOM_M, P._BLOOM_K
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for i in range(k):
        pos = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("s"), F.lit(":%d" % i))), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ).cast("int")
        got = {
            r["s"]: r["p"] for r in df.select("s", pos.alias("p")).collect()
        }
        for v in vals:
            assert got[v] == P._bloom_positions_py(v, m, k)[i], (v, i)


def test_skip_eq_bloom_prunes_point_lookup(spark, tmp_path):
    """user_id = X on UNCLUSTERED data: min/max can't prune (every file
    spans the id range), the bloom can."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    # ids shuffled so every file's min/max covers ~the whole range
    df = spark.range(4000).select(
        F.xxhash64("id").alias("shuffle_key"),
        F.col("id").alias("user_id"),
        (F.col("id") * 3).alias("v"),
    ).repartition(8, "shuffle_key").drop("shuffle_key")
    atomic_publish(df, t, stats_cols=["user_id"], bloom_cols=["user_id"])
    full = read_published(spark, t)
    assert len(full.inputFiles()) == 8
    pruned = read_published(spark, t, skip_eq={"user_id": 1234})
    # one value lives in exactly one file; bloom fpp may keep ~1 extra
    assert len(pruned.inputFiles()) <= 2
    assert pruned.where("user_id = 1234").count() == 1


def test_point_delete_rewrites_only_matching_files(spark, tmp_path):
    """VERDICT done-criterion: an indexed point delete rewrites ONLY
    the files that contain matches; untouched files carry by reference
    (audited via the manifest file list), and the result is row-exact."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(4000).select(
        F.xxhash64("id").alias("sk"),
        F.col("id").alias("user_id"),
        (F.col("id") * 3).alias("v"),
    ).repartition(8, "sk").drop("sk")
    atomic_publish(df, t, bloom_cols=["user_id"])
    before = set(P.live_files(t, spark))
    assert len(before) == 8
    v = delete_publish(
        spark, t, "user_id = 77", point={"user_id": 77}
    )
    assert v == 2
    after = set(P.live_files(t, spark))
    rewritten_away = before - after
    # the value lives in one file; bloom fpp may admit ~1 false pos,
    # but false-positive candidate files contain no matches and are NOT
    # rewritten
    assert len(rewritten_away) == 1
    assert before & after == before - rewritten_away  # rest carried
    got = read_published(spark, t)
    assert got.where("user_id = 77").count() == 0
    assert got.count() == 3999
    assert P._read_manifest(t, P._PosixFS())["n_rows"] == 3999


def test_point_delete_conservative_without_blooms(spark, tmp_path):
    """No blooms recorded → every file is a candidate (conservative),
    but still only files CONTAINING matches are rewritten."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("v")
    ).repartitionByRange(4, "user_id")
    atomic_publish(df, t)  # no indexes at all
    before = set(P.live_files(t, spark))
    v = delete_publish(spark, t, "user_id = 99", point={"user_id": 99})
    assert v == 2
    after = set(P.live_files(t, spark))
    assert len(before - after) == 1  # range-partitioned: 1 file matched
    got = read_published(spark, t)
    assert got.count() == 1999 and got.where("user_id = 99").count() == 0


def test_collect_file_blooms_backfill(spark, tmp_path):
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(3000).select(
        F.xxhash64("id").alias("sk"), F.col("id").alias("user_id")
    ).repartition(6, "sk").drop("sk")
    atomic_publish(df, t)
    from bamboo_spark.operators.publish import collect_file_blooms

    n = collect_file_blooms(t, ["user_id"], spark)
    assert n == 6
    pruned = read_published(spark, t, skip_eq={"user_id": 500})
    assert len(pruned.inputFiles()) <= 2
    assert pruned.where("user_id = 500").count() == 1


def test_optimize_table_refreshes_blooms(spark, tmp_path):
    t = str(tmp_path / "tbl")
    atomic_publish(
        spark.range(100).selectExpr("id as user_id", "id * 2 as v"), t
    )
    out = optimize_table(spark, t, bloom_cols=["user_id"], min_files=99)
    assert out["bloom_files"] >= 1
    pruned = read_published(spark, t, skip_eq={"user_id": 5})
    assert pruned.where("user_id = 5").count() == 1


# -------------------------------------------------- restore / read_appends


def test_restore_table_is_metadata_only_rollback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(10).selectExpr("id", "id as v"), t)   # v1
    append_publish(spark.range(10, 15).selectExpr("id", "id as v"), t)  # v2
    delete_publish(spark, t, "id < 3")                               # v3
    assert read_published(spark, t).count() == 12
    from bamboo_spark.operators.publish import restore_table

    v4 = restore_table(t, 2, spark)
    assert v4 == 4
    got = read_published(spark, t)
    assert got.count() == 15  # pre-delete content, re-cited by reference
    # the bad version stays readable for the post-mortem
    assert read_published(spark, t, version=3).count() == 12
    # restore wrote no data files: the restored entry's segments are a
    # subset of dirs that already existed
    man = P._read_manifest(t, P._PosixFS())
    assert man.get("restored_from") == 2
    assert set(man["segments"]) <= {"_v1", "_v2", "_v3"}


def test_read_appends_exact_delta(spark, tmp_path):
    from bamboo_spark.operators.publish import read_appends

    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(10).selectExpr("id"), t)        # v1
    append_publish(spark.range(10, 14).selectExpr("id"), t)    # v2
    append_publish(spark.range(14, 20).selectExpr("id"), t)    # v3
    delta = read_appends(spark, t, from_version=1)
    assert sorted(r["id"] for r in delta.collect()) == list(range(10, 20))
    d23 = read_appends(spark, t, from_version=2, to_version=3)
    assert sorted(r["id"] for r in d23.collect()) == list(range(14, 20))
    assert read_appends(spark, t, 3, 3).count() == 0


def test_read_appends_across_compaction_and_refusals(spark, tmp_path):
    from bamboo_spark.operators.publish import read_appends

    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(10).selectExpr("id"), t)        # v1
    append_publish(spark.range(10, 14).selectExpr("id"), t)    # v2
    compact(spark, t)                                          # v3 folds v2
    # the compaction is marked dataChange=false and the pre-fold files
    # are still retained, so the exact delta KEEPS delivering — from
    # the original v2 files, no duplicates, no over-delivery
    d = read_appends(spark, t, from_version=1)
    assert sorted(r["id"] for r in d.collect()) == [10, 11, 12, 13]
    # append AFTER the fold: delta spans the compaction, both appends
    append_publish(spark.range(20, 22).selectExpr("id"), t)    # v4
    d = read_appends(spark, t, from_version=1)
    assert sorted(r["id"] for r in d.collect()) == [10, 11, 12, 13, 20, 21]
    d = read_appends(spark, t, from_version=3)
    assert sorted(r["id"] for r in d.collect()) == [20, 21]
    # deletes are never an append delta
    delete_publish(spark, t, "id = 20")                        # v5
    with pytest.raises(ValueError, match="shrank|append-only"):
        read_appends(spark, t, from_version=3)


def test_heartbeat_keeps_live_writer_from_eviction(spark, tmp_path):
    """A live long holder's heartbeat refreshes the lock mtime, so a
    contender NEVER breaks it inside the TTL window — eviction is for
    crashed writers only. (Without the heartbeat this exact sequence
    breaks the lock: see test_still_mine_false_after_break.)"""
    import time

    t = str(tmp_path / "tbl")
    os.makedirs(t, exist_ok=True)
    fs = P._PosixFS()
    holder = P._Lease(fs, t, ttl_ms=1_000, heartbeat=True).acquire()
    try:
        time.sleep(2.5)  # well past the 1 s TTL
        with pytest.raises(ConcurrentWriteError):
            P._Lease(fs, t, ttl_ms=1_000).acquire()
        assert holder.still_mine()
    finally:
        holder.release()
    # released: the next writer acquires immediately
    P._Lease(fs, t, ttl_ms=1_000).acquire().release()


def test_read_appends_across_schema_merge(spark, tmp_path):
    """An append that widened the schema: the delta reads with the
    WIDENED schema (old snapshots' absent column never leaks in)."""
    from bamboo_spark.operators.publish import read_appends

    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(6).selectExpr("id"), t)            # v1
    append_publish(
        spark.range(6, 9).selectExpr("id", "id * 2 as extra"),
        t,
        schema_mode="merge",
    )                                                             # v2
    d = read_appends(spark, t, from_version=1)
    assert sorted(d.columns) == ["extra", "id"]
    assert d.count() == 3 and d.where("extra is null").count() == 0


def test_restore_then_append_continues(spark, tmp_path):
    """Life after a rollback: the restored snapshot is an ordinary
    version — appends continue, deltas stay exact, vacuum keeps every
    dir the restored snapshot cites."""
    from bamboo_spark.operators.publish import read_appends, restore_table

    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(10).selectExpr("id"), t)           # v1
    append_publish(spark.range(10, 14).selectExpr("id"), t)       # v2
    restore_table(t, 1, spark)                                    # v3 = v1
    append_publish(spark.range(50, 53).selectExpr("id"), t)       # v4
    got = read_published(spark, t)
    assert sorted(r["id"] for r in got.collect()) == list(range(10)) + [
        50, 51, 52
    ]
    d = read_appends(spark, t, from_version=3)
    assert sorted(r["id"] for r in d.collect()) == [50, 51, 52]
    vacuum(t, keep=1, spark=spark)
    assert read_published(spark, t).count() == 13  # v1's dir survived


def test_skip_and_skip_eq_compose(spark, tmp_path):
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    from bamboo_spark.operators.publish import publish_clustered

    df = spark.range(4000).select(
        F.col("id").alias("v"), (F.col("id") % 997).alias("uid")
    )
    publish_clustered(df, t, "v", target_files=8)
    from bamboo_spark.operators.publish import collect_file_blooms

    collect_file_blooms(t, ["uid"], spark)
    both = read_published(
        spark, t, skip={"v": (0, 500)}, skip_eq={"uid": 123}
    )
    full = read_published(spark, t)
    assert len(both.inputFiles()) <= 1
    assert (
        both.where("v <= 500 and uid = 123").count()
        == full.where("v <= 500 and uid = 123").count()
    )
