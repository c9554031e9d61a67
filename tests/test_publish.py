"""Atomic snapshot publishing: commit isolation, crash consistency,
vacuum safety."""

import os

from bamboo_spark.operators.publish import (
    atomic_publish,
    current_version,
    published_rows,
    read_published,
    vacuum,
)


def test_publish_and_read_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = atomic_publish(spark.range(10).selectExpr("id", "id * 2 as x"), t)
    assert v1 == 1 and current_version(t) == 1
    assert published_rows(t) == 10
    assert read_published(spark, t).count() == 10

    v2 = atomic_publish(spark.range(25).selectExpr("id", "id * 3 as x"), t)
    assert v2 == 2
    got = read_published(spark, t)
    assert got.count() == 25
    # new snapshot's content, not a mix
    assert got.selectExpr("max(x)").collect()[0][0] == 72


def test_crashed_write_leaves_consistent_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    atomic_publish(spark.range(5), t)
    # simulate a writer that died after data files landed but BEFORE
    # the manifest swap: drop orphan files into _v2 by hand
    spark.range(999).write.parquet(os.path.join(t, "_v2"))
    # readers still see v1, row-exact
    assert current_version(t) == 1
    assert read_published(spark, t).count() == 5
    # the next publish does not collide with the orphan
    v = atomic_publish(spark.range(7), t)
    assert v >= 2 and read_published(spark, t).count() == 7


def test_vacuum_never_touches_committed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for n in (3, 4, 5):
        atomic_publish(spark.range(n), t)
    removed = vacuum(t, keep=1)
    assert "_v3" in removed or "_v1" in removed or removed
    # committed snapshot survives and still reads exactly
    assert read_published(spark, t).count() == 5
    assert not os.path.exists(os.path.join(t, "_v1"))
