"""Registry-wide physical-plan audit.

Builds every registry query at a small SF, counts the plan nodes that
matter for 100 TB behavior, and writes ``PLANS.json`` (per-query node
counts) plus a rolled-up summary. Enforces two global invariants and
exits non-zero on violation:

* NO ``CartesianProduct`` anywhere (a data-sized cross join would be a
  scale cliff; 1-row broadcast cross joins plan as
  ``BroadcastNestedLoopJoin`` and are allowed);
* NO ``BatchEvalPython`` (row-at-a-time Python UDF) anywhere — Python
  stages must be Arrow-vectorized (``ArrowEvalPython`` / ``MapInPandas``
  / ``FlatMapGroupsInPandas``).

Per-query pins live in tests/test_plans.py; this sweep is the net that
catches a regression in a query nobody wrote a pin for. Run:

    python tools/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bamboo_spark import queries as q
from bamboo_spark.session import get_spark

PATTERNS = {
    "shuffle_exchanges": r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "broadcast_exchanges": r"BroadcastExchange",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "bnl_joins": r"BroadcastNestedLoopJoin",
    "cartesian_products": r"CartesianProduct",
    "windows": r"\bWindow\b",
    "window_group_limits": r"WindowGroupLimit",
    "row_python": r"BatchEvalPython",
    "arrow_python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow",
    "partial_topk": r"TakeOrderedAndProject",
    "generates": r"Generate\b",
    # informational: single-partition exchanges — final 1-row reduces
    # and grid-sized global windows plan these legitimately; a spike on
    # a query whose docstring doesn't claim a bounded grid is a bug
    "single_partition_exchanges": r"Exchange SinglePartition",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("bamboo_plan_sweep")
    registry = q._queries_raw()
    report, errors = {}, {}
    for name in sorted(registry):
        try:
            df = registry[name](spark, sf_dir)
            s = df._jdf.queryExecution().executedPlan().toString()
            report[name] = {
                k: len(re.findall(p, s)) for k, p in PATTERNS.items()
            }
        except Exception as exc:  # pragma: no cover — sweep must finish
            errors[name] = "%s: %s" % (type(exc).__name__, str(exc)[:200])
        from bamboo_spark.operators import release_caches

        release_caches()
    cart = sorted(n for n, c in report.items() if c["cartesian_products"])
    rowpy = sorted(n for n, c in report.items() if c["row_python"])
    summary = {
        "n_queries": len(report),
        "n_errors": len(errors),
        "totals": {
            k: sum(c[k] for c in report.values()) for k in PATTERNS
        },
        "cartesian_offenders": cart,
        "row_python_offenders": rowpy,
        "errors": errors,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.json",
    )
    with open(out, "w") as fh:
        json.dump({"summary": summary, "queries": report}, fh, indent=1)
    print(json.dumps(summary["totals"]))
    print(
        "queries=%d errors=%d cartesian=%s row_python=%s -> %s"
        % (len(report), len(errors), cart or "none", rowpy or "none", out)
    )
    if cart or rowpy or errors:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
