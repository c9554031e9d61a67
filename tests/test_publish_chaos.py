"""Concurrency chaos: several writer threads hammer ONE table through
the public API; the final state must exactly equal the ledger of
commits that REPORTED success — the table format's whole contract
(no lost updates, no phantom rows, monotonic versions, readable
history) under real thread interleaving, not injected schedules."""

import threading

import pyspark.sql.functions as F

from bamboo_spark.operators.publish import (
    ConcurrentWriteError,
    append_publish,
    atomic_publish,
    compact_partitions,
    current_version,
    published_rows,
    read_published,
    snapshots,
    vacuum,
)


def test_concurrent_writers_ledger_exact(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # seed: 4 partitions, 40 rows
    atomic_publish(
        spark.range(40).select(
            (F.col("id") % 4).cast("string").alias("k"),
            F.col("id").alias("v"),
        ),
        t,
        partition_by="k",
    )
    ledger = []          # (thread, rows_added) for SUCCESSFUL commits
    errors = []
    lock = threading.Lock()

    def appender(tid, part, n_batches, rows_per_batch):
        # each appender owns ONE partition value — disjoint writers,
        # every commit should land (rebase, never conflict)
        base = 1000 * (tid + 1)
        for b in range(n_batches):
            lo = base + b * rows_per_batch
            df = spark.createDataFrame(
                [(part, lo + i) for i in range(rows_per_batch)],
                "k string, v long",
            )
            try:
                append_publish(df, t)
                with lock:
                    ledger.append((tid, rows_per_batch))
            except ConcurrentWriteError as e:
                with lock:
                    errors.append((tid, e))
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append((tid, e))

    def maintainer():
        # periodic compaction: allowed to lose optimistic races (a
        # conflict is a correct outcome), never to corrupt
        for _ in range(3):
            try:
                compact_partitions(spark, t, min_files=2)
            except ConcurrentWriteError:
                pass

    threads = [
        threading.Thread(target=appender, args=(i, str(i), 4, 5))
        for i in range(4)
    ] + [threading.Thread(target=maintainer)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors, errors[:3]
    expected = 40 + sum(n for _, n in ledger)
    got = read_published(spark, t)
    assert got.count() == expected
    assert published_rows(t) == expected  # manifest bookkeeping exact
    # every appender's rows are all present exactly once
    for tid in range(4):
        base = 1000 * (tid + 1)
        assert (
            got.where(
                (F.col("v") >= base) & (F.col("v") < base + 1000)
            ).count()
            == 20
        )
    # versions moved monotonically: one commit per success + seed +
    # however many compactions landed
    n_compactions = current_version(t) - 1 - len(ledger)
    assert 0 <= n_compactions <= 3
    # history stays readable and vacuum stays safe afterwards
    for s in snapshots(t, spark):
        assert read_published(spark, t, version=s["version"]).count() >= 0
    vacuum(t, keep=1, spark=spark)
    assert read_published(spark, t).count() == expected
