"""Session-lifetime cache discipline for operator-internal persists.

Several dedup operators persist an intermediate (hashed shingle sets,
band tables) that is consumed by two downstream branches of the SAME
returned plan — the persist is load-bearing (it halves the expensive
shingle/signature work), but the DataFrame outlives the operator call,
so the operator itself can never safely unpersist it.

``tracked_persist`` registers every such cache; ``release_caches()``
unpersists all of them — call it after the consuming query has been
materialized (bench.py does, per query; long-lived sessions should too).
Blocks are evicted LRU under memory pressure either way; this just
returns the memory promptly instead of letting caches accumulate over a
multi-query session.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_LIVE: List[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    _LIVE.append(out)
    return out


def release_caches() -> None:
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
