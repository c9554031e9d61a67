"""The flatten planner — bamboo's single relational operator, Spark-first.

Semantics (reference python/bamboo/nodes.py:299-390; SURVEY.md §2 F1-F4):

* One repetition path per flatten. At any record, at most one child subtree
  may contain a list to be exploded; more than one is an error
  (``Attempted to flatten conflicting lists``) under FLATTEN_ALL, a
  drop-all-list-subtrees fallback under FLATTEN_AVAILABLE, and under
  FLATTEN_EXPLICIT only explicitly included lists explode at all.
* Scalars alongside an exploded list are broadcast (repeated) to the list's
  cardinality — exactly Spark's correlated ``explode``.
* JoinType.INNER (default): null/empty lists and null records on the path
  contribute no rows (``explode``). JoinType.OUTER is our working extension
  (``explode_outer``) of the reference's declared-but-NotImplementedError
  variant (nodes.py:326-327).
* All-null columns (NullType ≈ IncompleteNode) vanish from the output
  (nodes.py:384-385).
* Unflattened lists contribute nothing (no row multiplication, no column).

Scale notes (100 TB): the plan is emitted as ``select`` + ``explode``
chains only — Catalyst turns it into GenerateExec inside whole-stage
codegen, column-prunes the generator input, and pushes the nested-field
projection into the Parquet reader (``nestedSchemaPruning``). No Python
executes per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame, functions as F, types as T

from bamboo_spark.clusions import ColumnFilter
from bamboo_spark.naming import NameStrategy, column_names
from bamboo_spark.schema import ELEM, dtype_at, is_incomplete


class FlattenStrategy(Enum):
    FLATTEN_EXPLICIT = 1
    FLATTEN_AVAILABLE = 2
    FLATTEN_ALL = 3


class JoinType(Enum):
    INNER = 1
    OUTER = 2


LogicalPath = Tuple[str, ...]


@dataclass
class Part:
    """Planner intermediate: columns found in a subtree + the (single)
    chain of arrays that must explode for them — the symbolic analogue of
    the reference's PartialFlatten (nodes.py:244-262)."""

    columns: List[Tuple[List[str], LogicalPath]] = dc_field(default_factory=list)
    chain: List[LogicalPath] = dc_field(default_factory=list)

    @property
    def has_explode(self) -> bool:
        return bool(self.chain)

    def is_empty(self) -> bool:
        return not self.columns


def plan(
    dtype: T.DataType,
    fltr: ColumnFilter,
    strategy: FlattenStrategy,
    implicit_include: bool,
    prefix: LogicalPath = (),
) -> Part:
    inc, exc = fltr.include, fltr.exclude
    included = inc.explicit or (implicit_include and not exc.explicit)

    if is_incomplete(dtype):
        return Part()

    if isinstance(dtype, (T.ArrayType, T.MapType)):
        if isinstance(dtype, T.ArrayType):
            element = dtype.elementType
        else:
            element = T.StructType(
                [
                    T.StructField("key", dtype.keyType, False),
                    T.StructField("value", dtype.valueType, dtype.valueContainsNull),
                ]
            )
        explode_this = strategy in (
            FlattenStrategy.FLATTEN_ALL,
            FlattenStrategy.FLATTEN_AVAILABLE,
        ) or (strategy is FlattenStrategy.FLATTEN_EXPLICIT and inc.explicit)
        if not explode_this:
            return Part()
        sub = plan(element, fltr, strategy, included, prefix + (ELEM,))
        if sub.is_empty():
            return Part()
        return Part(sub.columns, [prefix] + sub.chain)

    if isinstance(dtype, T.StructType):
        parts: List[Part] = []
        for f in dtype.fields:
            child = plan(
                f.dataType, fltr.child(f.name), strategy, included, prefix + (f.name,)
            )
            if not child.is_empty():
                child = Part(
                    [(names + [f.name], ref) for names, ref in child.columns],
                    child.chain,
                )
                parts.append(child)
        with_lists = [p for p in parts if p.has_explode]
        if len(with_lists) > 1:
            if strategy is FlattenStrategy.FLATTEN_AVAILABLE:
                parts = [p for p in parts if not p.has_explode]
                with_lists = []
            else:
                conflicts = ", ".join(
                    ".".join(t for t in p.chain[0] if t != ELEM) for p in with_lists
                )
                raise ValueError(
                    "Attempted to flatten conflicting lists: %s" % conflicts
                )
        out = Part()
        out.chain = with_lists[0].chain if with_lists else []
        for p in parts:
            out.columns.extend(p.columns)
        return out

    # primitive leaf
    if included:
        return Part([([], prefix)], [])
    return Part()


# ---------------------------------------------------------------------------
# physical construction


_ALIAS = "__bamboo_x%d"


def _ref(
    logical: LogicalPath, chain: List[LogicalPath], upto: int
) -> Tuple[Optional[int], LogicalPath]:
    """Resolve a logical path against the explode chain: find the deepest
    exploded array (index < upto) whose element domain is an ancestor."""
    for i in range(min(upto, len(chain)) - 1, -1, -1):
        anc = chain[i] + (ELEM,)
        if logical[: len(anc)] == anc:
            return i, logical[len(anc) :]
    return None, logical


def quote_col(name: str) -> str:
    """Backtick-quote a column name for F.col: embedded backticks double
    (Spark's escape), and anything beyond a plain identifier is quoted
    so dots/spaces/operators can't be misparsed as field access."""
    import re

    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        return name
    return "`%s`" % name.replace("`", "``")


def _col_expr(base: Optional[int], rel: LogicalPath) -> Column:
    if base is None:
        expr = F.col(quote_col(rel[0]))
        rel = rel[1:]
    else:
        expr = F.col(_ALIAS % base)
    for token in rel:
        expr = expr.getField(token)
    return expr


def build(
    df: DataFrame,
    root_type: T.DataType,
    part: Part,
    join: JoinType,
    name_strategy: NameStrategy,
    name_seed: Tuple[str, ...] = (),
):
    """Emit the select/explode chain for a planned flatten.

    Returns (spark DataFrame, pandas column labels or None). The DataFrame
    carries resolved string names except under MULTI_INDEX, where columns
    get positional names and the tuple labels apply at the pandas boundary.
    """
    gen = F.explode if join is JoinType.INNER else F.explode_outer

    cur = df
    for i, apath in enumerate(part.chain):
        base, rel = _ref(apath, part.chain, i)
        expr = _col_expr(base, rel)
        if isinstance(dtype_at(root_type, apath), T.MapType):
            expr = F.map_entries(expr)
        cur = cur.select("*", gen(expr).alias(_ALIAS % i))

    names = [list(n) + list(name_seed) for n, _ in part.columns]
    resolved = column_names(name_strategy, names)

    exprs = []
    pandas_labels = None
    if name_strategy is NameStrategy.MULTI_INDEX:
        pandas_labels = list(resolved)
        out_names = ["c%d" % i for i in range(len(resolved))]
    else:
        out_names = list(resolved)

    for (names_lf, logical), out in zip(part.columns, out_names):
        base, rel = _ref(logical, part.chain, len(part.chain))
        exprs.append(_col_expr(base, rel).alias(out))

    if not exprs:
        # no columns survive: empty frame with no columns, preserving the
        # reference's `flatten([]) == {}` behavior (node_tests.py:232-235)
        return cur.select().limit(0), pandas_labels
    return cur.select(*exprs), pandas_labels
