"""Clusion parser parity — reference python/bamboo_tests/clusion_tests.py."""

import pytest

from bamboo_spark.clusions import Clusion, ClusionError, ColumnFilter, parse_clusions


def C(explicit, children=None):
    return Clusion(explicit, children or {})


def test_str():
    assert parse_clusions("a") == C(False, {"a": C(True)})


def test_list():
    assert parse_clusions(["a", "b"]) == C(False, {"a": C(True), "b": C(True)})


def test_separators():
    assert parse_clusions("a.b.c") == C(
        False, {"a": C(False, {"b": C(False, {"c": C(True)})})}
    )


def test_merging():
    c = parse_clusions([{"a": {"b": {}}}, {"a": {"b": {"c": {}}}}])
    assert c == C(False, {"a": C(False, {"b": C(True, {"c": C(True)})})})


def test_merging_with_separators():
    c = parse_clusions(["a.b.c", "a.b.d"])
    assert c == C(
        False, {"a": C(False, {"b": C(False, {"c": C(True), "d": C(True)})})}
    )


def test_dict():
    assert parse_clusions({"a": "b"}) == C(False, {"a": C(False, {"b": C(True)})})


def test_dict_with_separators():
    c = parse_clusions({"a.b": "c"})
    assert c == C(False, {"a": C(False, {"b": C(False, {"c": C(True)})})})


def test_empty_dict():
    assert parse_clusions({}) == C(True)


def test_empty_str():
    with pytest.raises(Exception):
        parse_clusions("")


def test_empty_list():
    assert parse_clusions([]) == C(True)


def test_none():
    assert parse_clusions(None) == C(False)


def test_conflict_same_node():
    with pytest.raises(ClusionError):
        ColumnFilter.parse("a", "a")


def test_exclude_with_deeper_reinclude_ok():
    fltr = ColumnFilter.parse("oa.ia", "oa")
    assert fltr.include.child("oa").child("ia").explicit
    assert fltr.exclude.child("oa").explicit
