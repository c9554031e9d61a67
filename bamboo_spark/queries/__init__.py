"""The query registry — every operator surfaced as a (Spark fn, oracle
SQL) pair for the driver's DuckDB hash-equality gate.

Conventions (driver contract, __spark_entry__.py):
* each Spark query takes (spark, sf_dir) and returns a DataFrame;
* the oracle is ANSI-ish SQL DuckDB runs over the same parquet views;
* column NAMES and TYPES match exactly (aggregates aliased on both
  sides; counts cast to BIGINT; float results rounded identically so
  cross-engine ulp noise can't flip the value hash);
* ORDER doesn't matter (driver compare is order-insensitive) but
  deterministic queries order anyway for humans.

Scale annotations sit on each query: broadcast hints on dimension
tables, single-shuffle aggregations, skew notes. These run unchanged on
a real cluster — nothing here depends on local[*].
"""

from bamboo_spark.queries import _core, tpch, relational, dedup_q  # noqa: E402
from bamboo_spark.queries import events_q, similarity_q, text_q  # noqa: E402
from bamboo_spark.queries import sketch_q, pipeline, monitor  # noqa: E402
from bamboo_spark.queries import multimodal_q, analytics_q  # noqa: E402
from bamboo_spark.queries import table_q, source_q  # noqa: E402
from bamboo_spark.queries import registry  # noqa: E402

_MODULES = [
    _core, tpch, relational, events_q, dedup_q, similarity_q,
    text_q, sketch_q, pipeline, monitor, multimodal_q, analytics_q,
    table_q, source_q, registry,
]

# One shared namespace, exactly as when this was a single module: every
# top-level name from every family module is visible (a) as an
# attribute of ``bamboo_spark.queries`` and (b) inside every family
# module, so call-time cross-family references resolve unchanged.
_NS = {}
for _m in _MODULES:
    _NS.update(
        {_k: _v for _k, _v in vars(_m).items() if not _k.startswith("__")}
    )
for _m in _MODULES:
    for _k, _v in _NS.items():
        _m.__dict__.setdefault(_k, _v)
globals().update(_NS)
del _m, _k, _v
