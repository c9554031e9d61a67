"""Streaming operators: flatten-on-stream, watermark windowed aggs.

Scale notes: stateless flatten streams shuffle-free; the windowed agg
shuffles on (window, keys) with state in the state store — size
watermarks to bound state, and partition the source by key to keep
state access local.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from bamboo_spark.clusions import ColumnFilter
from bamboo_spark.flatten import FlattenStrategy, JoinType, Part, build, plan
from bamboo_spark.naming import NameStrategy


def flatten_stream(
    sdf: DataFrame,
    flatten_strategy: FlattenStrategy = FlattenStrategy.FLATTEN_ALL,
    name_strategy: NameStrategy = NameStrategy.CONCATENATE_CONFLICTS,
    join: JoinType = JoinType.INNER,
    include: Any = None,
    exclude: Any = None,
) -> DataFrame:
    """Apply the bamboo flatten planner to a *streaming* DataFrame.

    Identical plan generation as Dataset.flatten — explode/select are
    stateless, so the same physical operators run per micro-batch
    (MULTI_INDEX naming is excluded: no pandas boundary on a stream).
    """
    if name_strategy is NameStrategy.MULTI_INDEX:
        raise ValueError("MULTI_INDEX naming requires a pandas sink; streams use flat names")
    from pyspark.sql import types as T

    fltr = ColumnFilter.parse(include, exclude)
    implicit_root = fltr.include.explicit or fltr.include.is_nothing()
    root_type = T.StructType(sdf.schema.fields)
    part = plan(root_type, fltr, flatten_strategy, implicit_root)
    out, _labels = build(sdf, root_type, part, join, name_strategy)
    return out


def windowed_counts(
    sdf: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with late-data watermark — the streaming
    twin of queries.q_events_hourly."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
        )
    )
