"""Name-resolution parity — reference python/bamboo_tests/node_tests.py:37-89."""

import pytest

from bamboo_spark.naming import NameStrategy, column_names

CC = NameStrategy.CONCATENATE_CONFLICTS
CCV = NameStrategy.CONCATENATE_CONFLICTS_VERBOSE
CA = NameStrategy.CONCATENATE_ALWAYS
MI = NameStrategy.MULTI_INDEX


def test_single_resolution():
    for strategy in (CC, CCV, CA):
        assert column_names(strategy, [["a"]]) == ["a"]


def test_simple_resolution():
    for strategy in (CC, CCV, CA):
        assert column_names(strategy, [["a"], ["b"]]) == ["a", "b"]


def test_partial_conflict_resolution():
    names = [["a", "a"], ["a", "b"], ["c", "d"]]
    assert column_names(CC, names) == ["a_a", "b_a", "c"]
    assert column_names(CCV, names) == ["a_a", "b_a", "c"]
    assert column_names(CA, names) == ["a_a", "b_a", "d_c"]


def test_overlapping_names():
    names = [["b"], ["b", "a"], ["b", "a", "z"]]
    for strategy in (CC, CCV, CA):
        assert column_names(strategy, names) == ["b", "a_b", "z_a_b"]


def test_exact_match():
    with pytest.raises(ValueError):
        column_names(CC, [["b"], ["b"]])


def test_verbose_conflict_resolution():
    names = [["d", "c", "a"], ["d", "c", "b"]]
    assert column_names(CC, names) == ["a_d", "b_d"]
    assert column_names(CCV, names) == ["a_c_d", "b_c_d"]
    assert column_names(CA, names) == ["a_c_d", "b_c_d"]


def test_tuple_naming():
    assert column_names(MI, [["c", "a"], ["b"]]) == [("a", "c"), ("b", "")]
