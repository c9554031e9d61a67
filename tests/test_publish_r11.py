"""Round-11 merge-on-read scale surface: DISTRIBUTED delete vectors
(v2 — executor-written parquet sidecar datasets + a file-level manifest
of refs; row positions never pass through the driver), the un-forced
source-side join in ``merge_into``'s full-sync clause, insert-only
merge cardinality semantics, and exact ``read_appends`` column
resolution across rename + compact histories.

Reference parity: the reference (mvilim/bamboo) has no table format;
this suite pins the Delta/Iceberg deletion-vector design re-expressed
Spark-first (Delta deletion vectors / Iceberg v2 position deletes)."""

import json
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from bamboo_spark.operators import publish as P
from bamboo_spark.operators.publish import (
    append_publish,
    atomic_publish,
    clone_table,
    compact,
    delete_publish,
    merge_into,
    read_published,
    vacuum,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _fs():
    return P._PosixFS()


# ---------------------------------------------------------------- v2 format


def test_dv_v2_manifest_holds_refs_not_positions(spark, tmp_path):
    """A predicate dv-delete commits a FILE-LEVEL manifest ({rel:
    {ds, n}}) whose positions live in an executor-written parquet
    sidecar dataset — the driver-side JSON never contains a row
    position."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 3000).repartition(4), d)
    delete_publish(spark, d, "k % 3 = 0", delete_vectors=True)

    man = P._read_manifest(d, _fs())
    dv = P._load_dv(_fs(), d, man)
    assert dv, "delete_vectors=True must commit a dv manifest"
    for rel, v in dv.items():
        assert isinstance(v, dict) and set(v) >= {"ds", "n"}, v
        assert (Path(d) / v["ds"]).is_dir()
    assert man["dv_rows"] == 1000
    assert man["n_rows"] == 2000
    # masked read parity
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == [k for k in range(3000) if k % 3 != 0]
    # sidecar rows carry the join keys + the PACKED bitmap chunks
    # (round 12: positions pack 1024-per-row instead of row-per-pos)
    import pyarrow.parquet as pq

    ds = next(iter(dv.values()))["ds"]
    t = pq.read_table(str(Path(d) / ds))
    assert set(t.column_names) == {
        "_dv_file", "_dv_base", "_dv_sfx", "_dv_chunk", "_dv_bits"
    }
    assert t.num_rows <= 4 * 3  # ≤ ceil(750/1024)+1 chunks per file x 4


def test_dv_second_delete_merges_sidecars(spark, tmp_path):
    """A second dv-delete UNIONs per-file with the existing vectors —
    the new sidecar holds the merged state for touched files and the
    manifest's counts stay exact."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 1000), d)
    delete_publish(spark, d, "k % 5 = 0", delete_vectors=True)   # 200
    delete_publish(spark, d, "k % 7 = 0", delete_vectors=True)   # +~114
    expect = [k for k in range(1000) if k % 5 != 0 and k % 7 != 0]
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == expect
    man = P._read_manifest(d, _fs())
    assert man["n_rows"] == len(expect)
    assert man["dv_rows"] == 1000 - len(expect)
    # overlapping predicate (k%35==0 already gone): no double count
    delete_publish(spark, d, "k % 35 = 0", delete_vectors=True)
    assert P._read_manifest(d, _fs()) == man  # no-op: nothing fresh


def test_predicate_dv_delete_never_collects_rows(spark, tmp_path, monkeypatch):
    """The r10 verdict's #1: a predicate delete matching ~33% of a
    table must NOT materialize row addresses on the driver. Every
    ``collect()`` on the dv write path is file-level — bounded by the
    file count, not the matched-row count."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 6000).repartition(6), d)
    # patch the CLASSIC DataFrame (it overrides the ABC's collect)
    from pyspark.sql.classic.dataframe import DataFrame

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    delete_publish(spark, d, "k % 3 = 0", delete_vectors=True)  # 2000 rows
    monkeypatch.undo()
    nf = len(P.live_files(d))
    assert sizes, "expected file-level collects on the dv path"
    assert max(sizes) <= max(nf, 8), (
        "a collect returned %d rows — row addresses leaked onto the "
        "driver (files: %d)" % (max(sizes), nf)
    )
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == [k for k in range(6000) if k % 3 != 0]


def test_legacy_v1_dv_manifest_still_reads_and_upgrades(spark, tmp_path):
    """v1 dv manifests (positions inline in the JSON) keep reading, and
    a new dv commit on top of one merges the legacy positions into v2
    sidecars."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 500), d)
    delete_publish(spark, d, "k % 7 = 0", delete_vectors=True)
    fs = _fs()
    man = P._read_manifest(d, fs)
    dv = P._load_dv(fs, d, man)
    # rewrite the committed dv manifest in the LEGACY v1 shape
    # (positions unpacked from the committed bitmap sidecars)
    v1 = {rel: [] for rel in dv}
    for r in P._dv_positions_df(spark, fs, d, dv).collect():
        v1[r._dv_file].append(int(r._dv_pos))
    v1 = {rel: sorted(ps) for rel, ps in v1.items()}
    (Path(d) / man["dv"]).write_text(json.dumps(v1))
    P._DV_CACHE.clear()
    man2 = P._read_manifest(d, fs)
    assert all(
        isinstance(v, list) for v in P._load_dv(fs, d, man2).values()
    )
    expect1 = [k for k in range(500) if k % 7 != 0]
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == expect1
    # a further dv-delete merges v1 positions into v2 sidecars
    delete_publish(spark, d, "k % 11 = 0", delete_vectors=True)
    expect2 = [k for k in expect1 if k % 11 != 0]
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == expect2
    man3 = P._read_manifest(d, _fs())
    assert man3["dv_rows"] == 500 - len(expect2)


def test_dv_on_partitioned_evolved_table(spark, tmp_path):
    """dv-delete + masked reads compose with hive partitioning AND
    metadata-only renames: the predicate references the renamed column,
    positions resolve against the physically-named files."""
    d = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        (F.col("id") % 4).cast("string").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    atomic_publish(df, d, partition_by="p")
    P.rename_column(d, "v", "amount", spark=spark)
    delete_publish(spark, d, "amount % 20 = 0", delete_vectors=True)
    expect = [(k, k * 10) for k in range(400) if (k * 10) % 20 != 0]
    got = sorted(
        (r.k, r.amount) for r in read_published(spark, d).collect()
    )
    assert got == expect
    # the Python DataSource applies the same mask executor-side
    from bamboo_spark.sources.published import register

    register(spark)
    got2 = sorted(
        (r.k, r.amount)
        for r in spark.read.format("bamboo_published").load(d).collect()
    )
    assert got2 == expect


def test_clone_externalizes_v2_dv_and_diverges(spark, tmp_path):
    """A shallow clone of a dv'd table re-cites the v2 sidecars as
    EXTERNAL refs (zero copy) — and further dv-deletes on the clone
    merge against them without touching the source."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    atomic_publish(_rows(spark, 0, 600), src)
    delete_publish(spark, src, "k % 11 = 0", delete_vectors=True)
    clone_table(spark, src, dst)
    man = P._read_manifest(dst, _fs())
    for v in P._load_dv(_fs(), dst, man).values():
        assert isinstance(v, dict) and P._is_ext(v["ds"]), v
        assert "key" in v
    base = [k for k in range(600) if k % 11 != 0]
    assert sorted(r.k for r in read_published(spark, dst).collect()) == base
    # diverge: more dv-deletes on the CLONE only
    delete_publish(spark, dst, "k % 13 = 0", delete_vectors=True)
    assert sorted(
        r.k for r in read_published(spark, dst).collect()
    ) == [k for k in base if k % 13 != 0]
    assert sorted(
        r.k for r in read_published(spark, src).collect()
    ) == base  # source untouched


def test_vacuum_keeps_dv_sidecar_segments(spark, tmp_path):
    """A later commit's dv manifest cites sidecar DATASETS in older
    version dirs (untouched files keep their refs) — vacuum must treat
    those dirs as referenced even when no retained snapshot cites a
    DATA file in them."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 100), d)                     # v1
    append_publish(_rows(spark, 100, 150), d)                   # v2
    delete_publish(spark, d, "k % 10 = 0", delete_vectors=True)  # v3: dv-only dir
    append_publish(_rows(spark, 150, 160), d)                   # v4 carries dv
    removed = vacuum(d, keep=0, spark=spark)
    man = P._read_manifest(d, _fs())
    dv_segs = {
        v["ds"].split("/", 1)[0]
        for v in P._load_dv(_fs(), d, man).values()
        if isinstance(v, dict)
    }
    assert dv_segs and not (dv_segs & set(removed)), (removed, dv_segs)
    # the dv-delete (v3) precedes the 150..159 append (v4): only
    # multiples of 10 among the first 150 rows are gone
    expect = [k for k in range(150) if k % 10 != 0] + list(range(150, 160))
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == expect


# ----------------------------------------------------- merge_into semantics


def test_merge_into_nmbs_no_forced_source_broadcast():
    """r10 verdict #2: the not-matched-by-source clause's advertised
    use is full-table sync — the source key set is table-sized there,
    and a forced broadcast hint is a driver OOM at scale. Source-text
    pin (the join itself is internal to the op): no broadcast hint may
    wrap the source side."""
    import inspect

    src = inspect.getsource(merge_into)
    assert "broadcast(src_keys" not in src


def test_merge_into_full_sync_without_broadcastable_source(spark, tmp_path):
    """Full-sync semantics survive with size-based broadcasting OFF —
    proving no hint is needed for correctness and AQE may freely pick
    the join strategy."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 300), d)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        source = _rows(spark, 100, 350)  # keep 100..299, insert 300..349
        merge_into(
            source, d, "k",
            when_matched_update={"v": "s.v"},
            when_not_matched_insert=True,
            when_not_matched_by_source_delete=True,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == list(range(100, 350))


def test_merge_into_insert_only_allows_duplicate_source_matches(
    spark, tmp_path
):
    """Delta semantics: the cardinality violation only exists for
    UPDATE/DELETE clauses — an insert-only merge with a source that
    matches one target row many times is legal (matched rows are
    untouched) and must not pay the dup-check aggregate."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 10), d)
    dup_src = _rows(spark, 5, 20).unionAll(_rows(spark, 5, 8))
    merge_into(dup_src, d, "k", when_not_matched_insert=True)
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == list(range(20))
    # with an update clause the same source still raises
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(
            dup_src, d, "k", when_matched_update={"v": "s.v"}
        )


def test_merge_into_dv_masked_matching_at_scale_shape(spark, tmp_path):
    """merge_into on a table with existing v2 vectors: dv'd rows never
    match (they re-insert), fired updates delete-by-vector + rewrite."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 200), d)
    delete_publish(spark, d, "k < 50", delete_vectors=True)
    src = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(
        src, d, "k",
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,
    )
    rows = {r.k: r.v for r in read_published(spark, d).collect()}
    assert len(rows) == 200
    assert all(rows[k] == -1 for k in range(100))       # 0..49 re-inserted
    assert all(rows[k] == k * 10 for k in range(100, 200))


# ----------------------------------------- append deltas across evolution


def test_read_appends_across_rename_then_compact(spark, tmp_path):
    """ADVICE r10 (medium): files appended BEFORE a rename and dropped
    by a LATER compact must deliver the renamed column's DATA (resolved
    from the entry that appended them), not silent NULLs from the final
    entry's resolution."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 10), d)                  # v1
    append_publish(_rows(spark, 10, 15), d)                 # v2
    P.rename_column(d, "v", "amount", spark=spark)          # v3
    compact(spark, d)                                       # v4 dataChange=False
    out = P.read_appends(spark, d, from_version=1).collect()
    assert sorted((r.k, r.amount) for r in out) == [
        (k, k * 10) for k in range(10, 15)
    ]


def test_stream_appends_across_rename_then_compact(spark, tmp_path):
    """Same contract through the bamboo_published streaming source."""
    from bamboo_spark.sources.published import register

    register(spark)
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    atomic_publish(_rows(spark, 0, 10), d)                  # v1
    seen = []

    def sink(batch_df, bid):
        seen.extend((r["k"], r["amount"]) for r in batch_df.collect())

    append_publish(_rows(spark, 10, 15), d)                 # v2
    P.rename_column(d, "v", "amount", spark=spark)          # v3
    compact(spark, d)                                       # v4
    q = (
        spark.readStream.format("bamboo_published")
        .option("startingVersion", "1")
        .load(d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(seen) == [(k, k * 10) for k in range(10, 15)]


def test_stream_change_feed_on_evolved_table(spark, tmp_path):
    """r10 verdict #5: readChangeFeed through the DataSource now works
    on schema-evolved tables — inserts written under the OLD physical
    name surface under the current logical name, dv deletes resolve by
    row address."""
    from bamboo_spark.sources.published import register

    register(spark)
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    atomic_publish(_rows(spark, 0, 5), d)                   # v1
    P.rename_column(d, "v", "amount", spark=spark)          # v2
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
        assert sorted(seen) == [
            (1, "insert", k, k * 10) for k in range(5)
        ]
        delete_publish(spark, d, "amount = 20", delete_vectors=True)  # v3
        q.processAllAvailable()
        assert sorted(seen)[5:] == [(3, "delete", 2, 20)]
    finally:
        q.stop()


def test_read_changes_exact_after_v2_dv_deletes(spark, tmp_path):
    """Batch CDF over v2 vectors: the newly-deleted positions come from
    a distributed sidecar diff, value-exact."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 100), d)                      # v1
    delete_publish(spark, d, "k % 4 = 0", delete_vectors=True)   # v2
    delete_publish(spark, d, "k % 4 = 1", delete_vectors=True)   # v3
    ch = P.read_changes(spark, d, from_version=1).collect()
    by_v = {}
    for r in ch:
        assert r._change_type == "delete"
        by_v.setdefault(r._commit_version, []).append(r.k)
    assert sorted(by_v[2]) == [k for k in range(100) if k % 4 == 0]
    assert sorted(by_v[3]) == [k for k in range(100) if k % 4 == 1]


def test_concurrent_metadata_ops_compose(spark, tmp_path):
    """ADVICE r10: tag/constraint mutations apply INSIDE the commit
    lease against the fresh manifest — two concurrent single-key ops
    both land (the old pre-lease dict computation last-writer-won)."""
    import threading

    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 10), d)
    errs = []

    def add_tag(name):
        try:
            P.tag_version(d, name, spark=spark)
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [
        threading.Thread(target=add_tag, args=("t%d" % i,))
        for i in range(4)
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    man = P._read_manifest(d, _fs())
    assert set(man.get("tags") or {}) == {"t0", "t1", "t2", "t3"}
    # constraints interleave with tags without clobbering either dict
    P.add_constraint(d, "k_nonneg", "k >= 0", spark=spark)
    P.tag_version(d, "after", spark=spark)
    man = P._read_manifest(d, _fs())
    assert set(man["constraints"]) == {"k_nonneg"}
    assert "after" in man["tags"] and "t0" in man["tags"]


def test_backfill_stats_and_blooms_on_evolved_table(spark, tmp_path):
    """r10 verdict #4: stats/bloom backfills on a RENAMED table resolve
    the logical index column to each file's physical name by field id
    instead of refusing — and the recorded indexes actually prune."""
    d = str(tmp_path / "t")
    # two appends -> files with disjoint k/v ranges (prunable by stats)
    atomic_publish(_rows(spark, 0, 100).coalesce(1), d)
    append_publish(_rows(spark, 1000, 1100).coalesce(1), d)
    P.rename_column(d, "v", "amount", spark=spark)
    n_stats = P.collect_file_stats(d, ["amount"], spark=spark)
    n_blooms = P.collect_file_blooms(d, ["k"], spark=spark)
    assert n_stats >= 2 and n_blooms >= 2
    fs = _fs()
    man = P._read_manifest(d, fs)
    res = P._resolve_entry(fs, d, man)
    # stats rekeyed to the LOGICAL name at read time, per file
    assert all("amount" in st for st in res["file_stats"].values())
    mins = sorted(st["amount"][0] for st in res["file_stats"].values())
    assert mins == [0, 10000]
    # min/max actually prune: a bound excluding the low file keeps ONE
    pruned = [
        f
        for f, st in res["file_stats"].items()
        if st["amount"][1] >= 10000
    ]
    assert len(pruned) == 1
    # bloom prune on the renamed-table's untouched column still works
    kept = P._prune_eq(res, res["files"], {"k": 1050})
    assert len(kept) == 1
    # and the skip= read path returns exact rows under the bound
    got = sorted(
        r.k
        for r in P.read_published(
            spark, d, skip={"amount": (10000, None)}
        )
        .where("amount >= 10000")
        .collect()
    )
    assert got == list(range(1000, 1100))


def test_merge_into_schema_evolution_adds_columns(spark, tmp_path):
    """r10 verdict #6 (Delta withSchemaEvolution parity): a source
    carrying NEW columns widens the table in the same merge commit —
    inserts carry them, updates take them only when assigned, files
    written before the widening read them as NULL."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 10), d)
    src = spark.range(5, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).alias("v"),
        F.lit("x").alias("tag"),
    )
    with pytest.raises(ValueError, match="schema_evolution=True"):
        merge_into(src, d, "k", when_matched_update={"v": "s.v"})
    merge_into(
        src, d, "k",
        when_matched_update={"v": "s.v", "tag": "s.tag"},
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    rows = {r.k: (r.v, r.tag) for r in read_published(spark, d).collect()}
    assert len(rows) == 15
    assert all(rows[k] == (k * 10, None) for k in range(5))    # untouched
    assert all(rows[k] == (k * 100, "x") for k in range(5, 15))
    # the widened schema is the committed contract: strict merges now
    # REQUIRE the new column, and field ids extended (not re-assigned)
    man = P._read_manifest(d, _fs())
    assert man["field_ids"] == {"k": 1, "v": 2, "tag": 3}
    src2 = spark.range(0, 2).select(
        F.col("id").alias("k"),
        F.lit(0).cast("long").alias("v"),
        F.lit("y").alias("tag"),
    )
    merge_into(src2, d, "k", when_matched_update={"tag": "s.tag"})
    rows = {r.k: r.tag for r in read_published(spark, d).collect()}
    assert rows[0] == "y" and rows[1] == "y" and rows[7] == "x"


def test_merge_into_schema_evolution_guards(spark, tmp_path):
    """Type changes and retired-name resurrection refuse; an update
    clause NOT assigning the added column leaves it NULL on updated
    rows (no target value existed)."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 6), d)
    retype = spark.range(0, 3).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="type change"):
        merge_into(retype, d, "k", schema_evolution=True)
    P.rename_column(d, "v", "amount", spark=spark)  # retires "v"
    resurrect = spark.range(0, 3).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("amount"),
        F.lit(1).cast("long").alias("v"),
    )
    with pytest.raises(ValueError, match="resurrect"):
        merge_into(resurrect, d, "k", schema_evolution=True)
    # widen on an ALREADY-evolved table: ids extend past the rename
    src = spark.range(4, 8).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("amount"),
        F.lit(7).cast("long").alias("w"),
    )
    merge_into(
        src, d, "k",
        when_matched_update={"amount": "s.amount + 1"},  # w NOT assigned
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    rows = {r.k: (r.amount, r.w) for r in read_published(spark, d).collect()}
    assert rows[4] == (41, None) and rows[5] == (51, None)  # updated
    assert rows[6] == (60, 7) and rows[7] == (70, 7)        # inserted
    assert rows[0] == (0, None)                             # untouched


def test_read_changes_under_end_schema_after_rename(spark, tmp_path):
    """Batch CDF emits under the END-version schema (Delta contract):
    pre-rename inserts and their later dv deletes surface the renamed
    column's DATA (field-id resolution), never a half-null union of
    old and new names."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 6), d)                        # v1
    P.rename_column(d, "v", "amount", spark=spark)               # v2
    append_publish(
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("amount")
        ),
        d,
    )                                                            # v3
    delete_publish(spark, d, "amount = 20", delete_vectors=True)  # v4
    ch = P.read_changes(spark, d, from_version=0).collect()
    assert sorted(ch[0].asDict()) == [
        "_change_type", "_commit_version", "amount", "k"
    ]
    got = sorted(
        (r._commit_version, r._change_type, r.k, r.amount) for r in ch
    )
    expect = sorted(
        [(1, "insert", k, k * 10) for k in range(6)]
        + [(3, "insert", k, k * 10) for k in range(6, 9)]
        + [(4, "delete", 2, 20)]
    )
    assert got == expect


def test_compact_delete_vectors_folds_sidecars(spark, tmp_path):
    """dv MINOR COMPACTION (Iceberg's rewrite-position-deletes): K dv
    commits leave K sidecar datasets; one dataChange=false commit folds
    them to one — reads identical, incremental readers skip it, vacuum
    reclaims the old dv-only dirs."""
    d = str(tmp_path / "t")
    # range-clustered files so each delete touches a DIFFERENT file —
    # the touched-only rewrite then leaves refs spanning several
    # datasets (a predicate hitting every file would collapse them)
    atomic_publish(
        _rows(spark, 0, 1000).repartitionByRange(4, "k"), d
    )                                                             # v1
    delete_publish(spark, d, "k < 100", delete_vectors=True)      # v2
    delete_publish(spark, d, "k >= 900", delete_vectors=True)     # v3
    append_publish(_rows(spark, 1000, 1010), d)                   # v4
    delete_publish(
        spark, d, "k between 400 and 420", delete_vectors=True
    )                                                             # v5
    fs = _fs()
    man = P._read_manifest(d, fs)
    before = {
        v["ds"] for v in P._load_dv(fs, d, man).values()
        if isinstance(v, dict)
    }
    assert len(before) >= 2  # several sidecar datasets accumulated
    expect = sorted(
        r.k for r in read_published(spark, d).collect()
    )
    ver = P.compact_delete_vectors(d, spark=spark)                # v6
    assert ver == 6
    man = P._read_manifest(d, fs)
    dv = P._load_dv(fs, d, man)
    after = {v["ds"] for v in dv.values()}
    assert len(after) == 1 and not (after & before)
    assert sorted(r.k for r in read_published(spark, d).collect()) == expect
    # idempotent: a second fold is a no-op
    assert P.compact_delete_vectors(d, spark=spark) is None
    # incremental readers treat the fold as dataChange=false: an
    # appends stream across it raises nothing and delivers nothing new
    assert P.read_appends(
        spark, d, from_version=5, ignore_deletes=False
    ).count() == 0
    assert P.read_changes(spark, d, from_version=5).count() == 0
    # history labels it and keeps counters flat
    h = {r.version: r for r in P.table_history(spark, d).collect()}
    assert h[6].operation == "compact_dv"
    assert h[6].data_change is False and h[6].n_rows == h[5].n_rows
    # vacuum now reclaims the superseded dv-only dirs
    removed = vacuum(d, keep=0, spark=spark)
    assert {"_v2", "_v3", "_v5"} <= set(removed), removed
    assert sorted(r.k for r in read_published(spark, d).collect()) == expect


def test_compact_delete_vectors_folds_clone_external_refs(spark, tmp_path):
    """Folding a CLONE's externally-referenced vectors localizes them:
    the clone stops depending on the source's dv sidecars (its data
    refs still pin the source snapshot, as documented)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    atomic_publish(_rows(spark, 0, 400), src)
    delete_publish(spark, src, "k % 4 = 0", delete_vectors=True)
    clone_table(spark, src, dst)
    ver = P.compact_delete_vectors(dst, spark=spark)
    assert ver == 2
    fs = _fs()
    dv = P._load_dv(fs, dst, P._read_manifest(dst, fs))
    assert all(
        isinstance(v, dict) and not P._is_ext(v["ds"]) for v in dv.values()
    )
    assert sorted(r.k for r in read_published(spark, dst).collect()) == [
        k for k in range(400) if k % 4 != 0
    ]


def test_merge_incremental_schema_evolution(spark, tmp_path):
    """CDC form of schema evolution: a LWW batch carrying a NEW column
    widens the table in the same merge-on-read commit; earlier rows
    read it as NULL; a batch missing table columns NULL-fills."""
    from bamboo_spark.operators.publish import merge_publish_incremental

    d = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "k long, v long, ver long"
    )
    merge_publish_incremental(b1, d, "k", "ver")
    b2 = spark.createDataFrame(
        [(2, 21, 2, "x"), (3, 30, 1, "y")],
        "k long, v long, ver long, tag string",
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_publish_incremental(b2, d, "k", "ver")
    merge_publish_incremental(b2, d, "k", "ver", schema_evolution=True)
    rows = {
        r.k: (r.v, r.tag) for r in read_published(spark, d).collect()
    }
    assert rows == {1: (10, None), 2: (21, "x"), 3: (30, "y")}
    # a later batch missing the widened column NULL-fills it
    b3 = spark.createDataFrame([(1, 11, 3)], "k long, v long, ver long")
    merge_publish_incremental(b3, d, "k", "ver", schema_evolution=True)
    rows = {
        r.k: (r.v, r.tag) for r in read_published(spark, d).collect()
    }
    assert rows[1] == (11, None) and rows[2] == (21, "x")
    man = P._read_manifest(d, _fs())
    assert man["field_ids"]["tag"] == 4  # fresh id past (k, v, ver)


def test_dv_masked_read_plans_hash_join(spark, tmp_path):
    """The merge-on-read mask must plan as a HASH anti-join on the file
    basename (suffix guard as a residual condition) — never a
    BroadcastNestedLoop/cartesian of rows x positions."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 2000).repartition(4), d)
    delete_publish(spark, d, "k % 3 = 0", delete_vectors=True)
    df = P.read_published(spark, d)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_dv_delete_retries_commuting_conflict(spark, tmp_path, monkeypatch):
    """Concurrent dv-deletes COMMUTE (erasing a row twice is a no-op):
    when another dv commit lands between a delete's sidecar build and
    its lease, the delete retries against the fresh snapshot instead of
    surfacing ConcurrentWriteError — both deletions land."""
    d = str(tmp_path / "t")
    atomic_publish(_rows(spark, 0, 300).coalesce(1), d)
    orig_build = P._dv_build
    state = {"raced": False}

    def racing_build(*a, **kw):
        out = orig_build(*a, **kw)
        if not state["raced"]:
            state["raced"] = True
            # a competing writer's dv commit on the SAME file, landing
            # after this one built its refs but before its lease
            delete_publish(spark, d, "k % 5 = 1", delete_vectors=True)
        return out

    monkeypatch.setattr(P, "_dv_build", racing_build)
    ver = delete_publish(spark, d, "k % 5 = 0", delete_vectors=True)
    monkeypatch.undo()
    assert state["raced"] and ver == 3  # v2 = the racer, v3 = retried
    got = sorted(r.k for r in read_published(spark, d).collect())
    assert got == [k for k in range(300) if k % 5 not in (0, 1)]
    man = P._read_manifest(d, _fs())
    assert man["n_rows"] == len(got) and man["dv_rows"] == 300 - len(got)


def test_diff_versions_aligns_renamed_columns(spark, tmp_path):
    """diff_versions compares snapshots under the NEW schema by field
    id: a rename alone marks nothing 'changed'; real value changes and
    later-added columns classify correctly."""
    d = str(tmp_path / "t")
    atomic_publish(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "id long, v long"
        ),
        d,
    )                                                            # v1
    P.rename_column(d, "v", "amount", spark=spark)               # v2
    merge_into(
        spark.createDataFrame(
            [(2, 99), (4, 40)], "id long, amount long"
        ),
        d,
        "id",
        when_matched_update={"amount": "s.amount"},
        when_not_matched_insert=True,
    )                                                            # v3
    out = {
        r.id: r.status
        for r in P.diff_versions(spark, d, 1, 3, id_col="id").collect()
    }
    assert out == {
        1: "unchanged",  # a rename alone is not a change
        2: "changed",
        3: "unchanged",
        4: "added",
    }
