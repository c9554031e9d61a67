"""Scale utilities: skew-salted joins and partitioned parquet sinks.

These are the knobs a 100 TB deployment reaches for when AQE's
automatic handling isn't enough: AQE skew-join splits oversized
*partitions* after the shuffle, but a single pathological key still
lands every row on one reducer — salting spreads one key across
``salt`` reducers at the cost of replicating the other side.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F

SALT = "__bamboo_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Union[str, Sequence[str]],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the ``skewed`` side.

    Each skewed-side row gets a deterministic salt in [0, salt) derived
    from a whole-row hash (so one hot key fans out over ``salt``
    reducers), and ``other`` is replicated ``salt`` times with every
    salt value. The join keys become (key..., salt), then the salt
    column is dropped — result rows are identical to the unsalted join.

    Cost model: shuffle volume grows by (salt × |other|); pick
    ``salt`` ≈ (hot-key row count) / (target rows per reducer) and keep
    ``other`` the smaller side. For broadcast-able ``other`` prefer
    ``F.broadcast`` — salting is for the mid-size case where neither
    broadcast nor AQE saves you.
    """
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left; got %r" % how)
    salted = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    replicated = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted.join(replicated, keys + [SALT], how)
    return out.drop(SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Union[str, Sequence[str]],
    num_buckets: int = 32,
    sort_by: Optional[Union[str, Sequence[str]]] = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed-table sink — the co-located-join primitive.

    Both sides of a recurring big join written with the SAME
    (bucket_by, num_buckets) hash-partition their data at WRITE time;
    a later join on the bucket keys then reads bucket i against bucket
    i directly — NO Exchange on either side at read time (the shuffle
    was paid once, at ingest). ``sort_by`` additionally orders rows
    within each bucket so the join can sort-merge without sorting.
    tests/test_scale.py pins the exchange-free plan.

    Bucketing goes through the catalog (``saveAsTable``): bucket
    metadata lives in the table definition, which is what lets the
    planner trust the layout. Pick num_buckets so one bucket of the
    BIGGER table fits an executor core's working set (~100-500 MB).
    """
    keys: List[str] = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort_by is not None:
        sorts: List[str] = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Optional[Sequence[str]] = None,
    target_files_per_partition: int = 1,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned columnar sink with small-file control.

    A naive ``df.write.partitionBy(k)`` emits one file per (task ×
    partition value) — at 1000 tasks × 1000 values that's 1M tiny
    files. Repartitioning on the partition columns first routes each
    value to ``target_files_per_partition`` tasks, so file count is
    O(values × target), independent of upstream parallelism.
    """
    writer = df
    if partition_by:
        cols = [F.col(c) for c in partition_by]
        if target_files_per_partition > 1:
            # spread each partition value over a few tasks to bound
            # file size without reintroducing the small-file explosion
            cols = cols + [
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns]),
                    F.lit(target_files_per_partition),
                )
            ]
        writer = df.repartition(*cols)
    w = writer.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
