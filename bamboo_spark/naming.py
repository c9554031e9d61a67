"""Column-name resolution for flatten output.

Parity with the reference's ``column_names`` algorithm
(reference python/bamboo/nodes.py:156-241, tests node_tests.py:37-89).

Paths arrive *leaf-first* (``['leaf', 'parent', 'grandparent', ...]``).

* CONCATENATE_CONFLICTS          — leaf name; on collision keep prepending
  parent segments (joined by ``_``) until unique, but only when the popped
  segments actually differ between the colliding names.
* CONCATENATE_CONFLICTS_VERBOSE  — same, but prepend every popped segment.
* CONCATENATE_ALWAYS             — full path, outermost-first, ``_``-joined.
* MULTI_INDEX                    — tuples (outermost-first) padded with ``''``
  to equal length (for a pandas MultiIndex at the toPandas boundary).

Degenerate duplicates (identical full paths) raise ``ValueError`` — the
engine must refuse rather than silently aliasing.
"""

from __future__ import annotations

from enum import Enum
from typing import List, Sequence, Tuple, Union

NAME_SEPARATOR = "_"


class NameStrategy(Enum):
    CONCATENATE_CONFLICTS = 1
    CONCATENATE_CONFLICTS_VERBOSE = 2
    CONCATENATE_ALWAYS = 3
    MULTI_INDEX = 4


Name = Union[str, Tuple[str, ...]]


def column_names(strategy: NameStrategy, names: Sequence[Sequence[str]]) -> List[Name]:
    resolved = _column_names(strategy, [list(n) for n in names])
    if len(resolved) != len(set(resolved)):
        raise ValueError("Resolved names were not unique: %r" % (resolved,))
    return resolved


def _column_names(strategy: NameStrategy, names: List[List[str]]) -> List[Name]:
    if strategy is NameStrategy.MULTI_INDEX:
        width = max((len(n) for n in names), default=0)
        return [tuple(reversed(n)) + ("",) * (width - len(n)) for n in names]
    if strategy is NameStrategy.CONCATENATE_ALWAYS:
        return [NAME_SEPARATOR.join(reversed(n)) for n in names]
    if strategy in (
        NameStrategy.CONCATENATE_CONFLICTS,
        NameStrategy.CONCATENATE_CONFLICTS_VERBOSE,
    ):
        verbose = strategy is NameStrategy.CONCATENATE_CONFLICTS_VERBOSE
        return _resolve_conflicts(names, verbose)
    raise AssertionError("Unrecognized name strategy: %r" % (strategy,))


def _resolve_conflicts(names: List[List[str]], verbose: bool) -> List[str]:
    # state per column: (resolved-so-far, remaining outer segments leaf→root)
    state = [[n[0] if n else "", list(n[1:])] for n in names]
    while True:
        groups: dict[str, list] = {}
        for entry in state:
            groups.setdefault(entry[0], []).append(entry)
        progressed = False
        for group in groups.values():
            if len(group) <= 1:
                continue
            popped = [e[1].pop(0) if e[1] else "" for e in group]
            if any(e[1] or p for e, p in zip(group, popped)):
                progressed = True
            if len(set(popped)) > 1 or verbose:
                for prefix, entry in zip(popped, group):
                    if entry[0] == "":
                        entry[0] = prefix
                    elif prefix != "":
                        entry[0] = prefix + NAME_SEPARATOR + entry[0]
        if not progressed:
            break
    return [entry[0] for entry in state]
