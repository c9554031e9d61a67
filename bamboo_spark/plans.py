"""Plan auditing as a user API: assert the physical-plan properties
that make a pipeline survive a 100× scale-up, in the pipeline's own
code instead of only in this repo's test suite.

The engine's internal discipline (tests/test_plans.py) pins pushed
filters, broadcast joins, partial top-k rewrites, and the absence of
cartesian products for every registry query. ``audit_plan`` exposes the
same checks so a user can gate THEIR composed job the same way::

    from bamboo_spark.plans import audit_plan
    audit_plan(df)                     # no cartesian/NLJ anywhere
    audit_plan(df, require=["BroadcastHashJoin"])
    audit_plan(df, forbid=["Exchange"])         # shuffle-free contract
    violations = audit_plan(df, raise_on_violation=False)

Checks run against BOTH the formatted explain (node names, PushedFilters,
ReadSchema) and the executed-plan tree string (codegen markers live only
there), so any token visible in either is addressable.
"""

from __future__ import annotations

import re

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame

#: plan fragments that signal an accidental O(n·m) blowup — forbidden by
#: default; pass ``forbid=[]`` to opt out
DEFAULT_FORBID = ("CartesianProduct", "BroadcastNestedLoopJoin")


class PlanViolation(AssertionError):
    """Raised when a plan audit fails; ``.violations`` lists findings."""

    def __init__(self, violations: List[str]):
        super().__init__(
            "plan audit failed:\n  - " + "\n  - ".join(violations)
        )
        self.violations = violations


def plan_text(df: DataFrame) -> str:
    """Formatted explain + executed-plan tree, concatenated."""
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = df._jdf.queryExecution().executedPlan().toString()
    return formatted + "\n" + tree


def audit_plan(
    df: DataFrame,
    forbid: Sequence[str] = DEFAULT_FORBID,
    require: Sequence[str] = (),
    pushed_filter_cols: Sequence[str] = (),
    max_exchanges: Optional[int] = None,
    raise_on_violation: bool = True,
) -> List[str]:
    """Audit ``df``'s physical plan; returns the violation list (empty =
    clean). With ``raise_on_violation`` (default) a non-empty list
    raises :class:`PlanViolation` instead.

    * ``forbid`` — substrings that must NOT appear (default: the
      cartesian/nested-loop blowups);
    * ``require`` — substrings that MUST appear (e.g.
      ``"BroadcastHashJoin"``, ``"WindowGroupLimit"``,
      ``"TakeOrderedAndProject"``);
    * ``pushed_filter_cols`` — column names that must appear inside the
      scan's ``PushedFilters`` list (predicate actually reached the
      reader);
    * ``max_exchanges`` — ceiling on shuffle count in the executed tree
      (AQE reuse may merge them at runtime; this counts planned ones).
    """
    text = plan_text(df)
    violations: List[str] = []
    for frag in forbid:
        if frag in text:
            violations.append("forbidden plan node present: %s" % frag)
    for frag in require:
        if frag not in text:
            violations.append("required plan node missing: %s" % frag)
    if pushed_filter_cols:
        if "PushedFilters" not in text:
            violations.append("no PushedFilters section in plan")
        else:
            # a multi-scan plan has one PushedFilters section per scan —
            # a column pushed at ANY scan satisfies the check
            pushed = " ".join(
                part.split("\n", 1)[0]
                for part in text.split("PushedFilters")[1:]
            )
            for col in pushed_filter_cols:
                if col not in pushed:
                    violations.append(
                        "filter on %r not pushed to the scan" % col
                    )
    if max_exchanges is not None:
        tree = df._jdf.queryExecution().executedPlan().toString()
        # the documented ceiling is on SHUFFLES: broadcast exchanges
        # move only the (small) build side and reused exchanges re-read
        # a prior shuffle's output, so neither counts against it
        n = len(re.findall(r"(?<![A-Za-z])Exchange(?![A-Za-z])", tree))
        if n > max_exchanges:
            violations.append(
                "%d shuffle exchanges in executed plan (max %d)"
                % (n, max_exchanges)
            )
    if violations and raise_on_violation:
        raise PlanViolation(violations)
    return violations
