"""Column in/ex-clusion ("clusion") path tries.

Parity with the reference's dotted-path selection language
(reference python/bamboo/clusions.py, python/bamboo_tests/clusion_tests.py):

* ``'a.b.c'``          — one dotted path; the final segment is *explicit*.
* ``['a.b', 'x']``     — union of paths (tries are merged; explicit flags OR).
* ``{'a.b': 'c'}``     — nested form; values are parsed recursively.
* ``{}`` / ``[]``      — an *explicit empty* clusion (selects the node itself).
* ``None``             — no selection at all.
* ``''``               — error (empty field names are not allowed).

A node that is both explicitly included and explicitly excluded is an error
(reference clusions.py:112-113, columns.hpp:415-417).

At 100 TB these tries matter because they become ``select()`` projections
*before* any wide operator runs — Catalyst's nested-schema pruning pushes
them into the Parquet/ORC reader so excluded subtrees are never read.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Optional, Tuple


class ClusionError(ValueError):
    """Raised for malformed clusions or include/exclude conflicts."""


class Clusion:
    """A trie over field names; ``explicit`` marks a selected node."""

    __slots__ = ("explicit", "children")

    def __init__(self, explicit: bool = False, children: Optional[dict] = None):
        self.explicit = explicit
        self.children: dict[str, "Clusion"] = children or {}

    # -- construction ------------------------------------------------------
    @classmethod
    def empty(cls) -> "Clusion":
        return cls(False, {})

    @classmethod
    def explicit_leaf(cls) -> "Clusion":
        return cls(True, {})

    def merged(self, other: "Clusion") -> "Clusion":
        out = Clusion(self.explicit or other.explicit)
        for name in set(self.children) | set(other.children):
            a = self.children.get(name)
            b = other.children.get(name)
            if a is not None and b is not None:
                out.children[name] = a.merged(b)
            else:
                child = a if a is not None else b
                out.children[name] = Clusion(child.explicit, dict(child.children))
        return out

    # -- queries -----------------------------------------------------------
    def child(self, name: str) -> "Clusion":
        return self.children.get(name, _NOTHING)

    def is_nothing(self) -> bool:
        return not self.explicit and not self.children

    def paths(self, prefix: Tuple[str, ...] = ()) -> Iterator[Tuple[str, ...]]:
        """Yield every explicit path in the trie (for diagnostics)."""
        if self.explicit:
            yield prefix
        for name, sub in self.children.items():
            yield from sub.paths(prefix + (name,))

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Clusion)
            and self.explicit == other.explicit
            and self.children == other.children
        )

    def __repr__(self) -> str:
        return f"Clusion({self.explicit}, {self.children!r})"


_NOTHING = Clusion(False, {})


def _parse_path(path: str) -> Clusion:
    node = Clusion.explicit_leaf()
    for segment in reversed(path.split(".")):
        if segment == "":
            raise ClusionError("Empty field names are not allowed in clusion %r" % path)
        node = Clusion(False, {segment: node})
    return node


def parse_clusions(spec: Any) -> Clusion:
    """Parse a clusion spec (str / list / set / dict / None) into a trie."""
    if spec is None:
        return Clusion.empty()
    if isinstance(spec, str):
        return _parse_path(spec)
    if isinstance(spec, (list, tuple, set, frozenset)):
        items = [parse_clusions(item) for item in spec]
        if not items:
            return Clusion.explicit_leaf()
        out = items[0]
        for item in items[1:]:
            out = out.merged(item)
        return out
    if isinstance(spec, Mapping):
        if not spec:
            return Clusion.explicit_leaf()
        out = Clusion.empty()
        for key, value in spec.items():
            if not isinstance(key, str):
                raise ClusionError("Clusion dict keys must be strings, got %r" % (key,))
            # graft the parsed value under the (possibly dotted) key path
            prefix = _parse_path(key)
            # the deepest node of the prefix becomes the parsed value
            node = prefix
            while node.children:
                name, child = next(iter(node.children.items()))
                if not child.children:
                    node.children[name] = parse_clusions(value)
                    break
                node = child
            out = out.merged(prefix)
        return out
    raise ClusionError("Unsupported clusion spec of type %s: %r" % (type(spec), spec))


class ColumnFilter:
    """Combined include/exclude tries with conflict validation.

    Mirrors the reference's ``convert_clusions`` / ``ColumnFilter``
    (clusions.py:91-115): a node explicitly included *and* explicitly
    excluded raises.
    """

    __slots__ = ("include", "exclude")

    def __init__(self, include: Clusion, exclude: Clusion):
        self.include = include
        self.exclude = exclude
        _validate(include, exclude, ())

    @classmethod
    def parse(cls, include: Any, exclude: Any) -> "ColumnFilter":
        return cls(parse_clusions(include), parse_clusions(exclude))

    def child(self, name: str) -> "ColumnFilter":
        out = object.__new__(ColumnFilter)
        out.include = self.include.child(name)
        out.exclude = self.exclude.child(name)
        return out


def _validate(include: Clusion, exclude: Clusion, path: Tuple[str, ...]) -> None:
    if include.explicit and exclude.explicit:
        raise ClusionError(
            "Cannot both include and exclude a field: %s" % (".".join(path) or "<root>")
        )
    for name in set(include.children) & set(exclude.children):
        _validate(include.children[name], exclude.children[name], path + (name,))
