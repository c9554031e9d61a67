"""Randomized LEDGER test for the table format: a seeded walk over the
full op mix — append, dv-delete, rewrite-delete, partition compaction,
full compaction, restore, vacuum — tracking the expected row multiset
in plain Python after every commit and asserting the committed
snapshot reads back EXACTLY that multiset (and that the manifest's
n_rows agrees). This is the bookkeeping differential: any drift in
n_rows math, dv carry/fold, segment shadowing, or restore/vacuum
interaction shows up as a multiset mismatch at the op that broke it."""

import random
from collections import Counter

import pytest

from pyspark.sql import functions as F

from bamboo_spark.operators.publish import (
    append_publish,
    atomic_publish,
    compact,
    compact_partitions,
    current_version,
    delete_publish,
    published_rows,
    read_published,
    restore_table,
    vacuum,
)

KEYS = ["a", "b", "c"]


def _read_multiset(spark, t) -> Counter:
    return Counter(
        (r["k"], r["v"]) for r in read_published(spark, t).collect()
    )


def _df(spark, rows):
    return spark.createDataFrame(list(rows), "k string, v long")


@pytest.mark.parametrize("seed,partitioned", [(7, True), (23, False)])
def test_random_op_walk_ledger_exact(spark, tmp_path, seed, partitioned):
    rng = random.Random(seed)
    t = str(tmp_path / "tbl")
    nxt = [0]

    def fresh_rows(n):
        out = [(rng.choice(KEYS), nxt[0] + i) for i in range(n)]
        nxt[0] += n
        return out

    rows = fresh_rows(8)
    atomic_publish(
        _df(spark, rows), t, partition_by="k" if partitioned else None
    )
    expected = Counter(rows)
    history = {current_version(t): Counter(expected)}

    def check(tag):
        got = _read_multiset(spark, t)
        assert got == expected, (tag, got, expected)
        assert published_rows(t) == sum(expected.values()), tag

    check("init")
    ops = ["append", "dv_delete", "rw_delete", "compact", "restore"]
    for step in range(14):
        op = rng.choice(ops)
        if op == "append":
            rows = fresh_rows(rng.randint(1, 5))
            append_publish(_df(spark, rows).coalesce(1), t)
            expected.update(rows)
        elif op == "dv_delete":
            live = [kv for kv, c in expected.items() if c > 0]
            if not live:
                continue
            k, v = rng.choice(live)
            got = delete_publish(
                spark, t, "v = %d" % v, delete_vectors=True
            )
            if got is not None or expected[(k, v)]:
                del expected[(k, v)]
        elif op == "rw_delete":
            live = [kv for kv, c in expected.items() if c > 0]
            if not live:
                continue
            k, v = rng.choice(live)
            delete_publish(spark, t, "v = %d" % v)
            del expected[(k, v)]
        elif op == "compact":
            if partitioned:
                compact_partitions(spark, t, min_files=2)
            else:
                compact(spark, t)
        elif op == "restore":
            # only versions still retained (vacuum may have pruned)
            retained = [
                ver for ver in history if ver != current_version(t)
            ]
            if not retained:
                continue
            target = rng.choice(retained)
            try:
                restore_table(t, target)
            except KeyError:
                history.pop(target, None)  # pruned by a vacuum below
                continue
            expected = Counter(history[target])
        history[current_version(t)] = Counter(expected)
        check("step %d %s" % (step, op))
        if rng.random() < 0.25:
            vacuum(t, keep=3)
            # versions may have left history; our map can keep stale
            # entries (restore handles KeyError) — reads must be exact
            check("step %d vacuum" % step)
    # final: compaction folds everything and the ledger still holds
    if partitioned:
        compact_partitions(spark, t, min_files=1)
    else:
        compact(spark, t)
    check("final compact")
    vacuum(t, keep=1)
    check("final vacuum")
