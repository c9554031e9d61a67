"""Declarative data-quality checks compiled to ONE aggregation pass.

The Deequ/Great-Expectations shape re-expressed Spark-first: a check
suite is a list of rules; every row-level rule compiles to a 0/1
indicator column and the whole suite evaluates as a SINGLE map-combined
aggregate over one scan — adding a rule never adds a pass. Set-level
rules (uniqueness, referential integrity) compile to their own
aggregate-shaped subplans and union into the same report.

Report schema: one row per rule —
(rule, kind, n_rows bigint, n_violations bigint, pass int).

Rule kinds:
* ``not_null(col)`` — col IS NULL counts as a violation;
* ``range(col, lo, hi)`` — non-null values outside [lo, hi];
* ``regexp(col, pattern)`` — non-null values NOT fully matching;
* ``in_set(col, values)`` — non-null values outside the allow-list;
* ``unique(cols)`` — rows belonging to a duplicated key group
  (set-level: one extra hash-aggregate on the key);
* ``references(col, other_df, other_col)`` — non-null values with no
  match in the other table's key column (set-level: one anti-join
  against the DISTINCT key set, which AQE broadcasts when small).

Scale: row-level rules ride one scan (indicators are scan-speed
expressions inside whole-stage codegen); `unique` shuffles the key
once; `references` shuffles/broadcasts the distinct key set only. The
report is |rules| rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


class Rule:
    """One compiled rule: a name, a kind, and either an indicator
    column (row-level) or a report-builder (set-level)."""

    def __init__(self, name: str, kind: str, indicator: Optional[Column] = None,
                 builder=None):
        self.name = name
        self.kind = kind
        self.indicator = indicator
        self.builder = builder


def not_null(col: str) -> Rule:
    return Rule(
        "not_null(%s)" % col,
        "not_null",
        F.col(col).isNull().cast("bigint"),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        "range(%s,[%s,%s])" % (col, lo, hi),
        "range",
        (
            F.col(col).isNotNull()
            & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))
        ).cast("bigint"),
    )


def regexp(col: str, pattern: str) -> Rule:
    return Rule(
        "regexp(%s)" % col,
        "regexp",
        (
            F.col(col).isNotNull() & ~F.col(col).rlike("^(%s)$" % pattern)
        ).cast("bigint"),
    )


def in_set(col: str, values: Sequence) -> Rule:
    return Rule(
        "in_set(%s)" % col,
        "in_set",
        (F.col(col).isNotNull() & ~F.col(col).isin(list(values))).cast(
            "bigint"
        ),
    )


def unique(cols) -> Rule:
    cols = [cols] if isinstance(cols, str) else list(cols)
    name = "unique(%s)" % ",".join(cols)

    def build(df: DataFrame) -> DataFrame:
        total = df.agg(F.count(F.lit(1)).alias("n_rows"))
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") > 1)
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n_violations"))
        )
        return total.crossJoin(dup)

    return Rule(name, "unique", builder=build)


def references(col: str, other: DataFrame, other_col: str) -> Rule:
    name = "references(%s->%s)" % (col, other_col)

    def build(df: DataFrame) -> DataFrame:
        total = df.agg(F.count(F.lit(1)).alias("n_rows"))
        keys = other.select(F.col(other_col).alias("_k")).distinct()
        orphans = (
            df.where(F.col(col).isNotNull())
            .join(keys, F.col(col) == F.col("_k"), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        return total.crossJoin(orphans)

    return Rule(name, "references", builder=build)


def dq_report(df: DataFrame, rules: List[Rule]) -> DataFrame:
    """Evaluate the suite. All row-level rules fold into ONE aggregate
    over one scan; each set-level rule contributes its own aggregate;
    the union is the |rules|-row report."""
    if not rules:
        raise ValueError("dq_report: empty rule list")
    row_rules = [r for r in rules if r.indicator is not None]
    parts: List[DataFrame] = []
    if row_rules:
        # ONE aggregate row carrying every rule's violation sum, then
        # exploded into per-rule report rows — a union of per-rule
        # selects would re-plan the aggregate (and the scan) per branch
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(r.indicator).alias("_v%d" % i)
                for i, r in enumerate(row_rules)
            ],
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    F.coalesce(F.col("_v%d" % i), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        parts.append(
            agg.select(F.explode(rows).alias("_r")).select("_r.*")
        )
    for r in rules:
        if r.builder is not None:
            rep = r.builder(df)
            parts.append(
                rep.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    F.coalesce(F.col("n_violations"), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "pass", (F.col("n_violations") == 0).cast("int")
    ).orderBy("rule")
