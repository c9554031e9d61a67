"""PBD source tests against the reference's golden file
(reference python/bamboo_tests/data/example.pbd; expectations from
pbd_tests.py:62-92 / FIXTURES.md F7)."""

import math

import pytest

from bamboo_spark import from_pbd
from bamboo_spark.clusions import ClusionError
from tests.conftest import assert_frame

GOLDEN = "/root/reference/python/bamboo_tests/data/example.pbd"


def test_pbd_flatten_defaults(spark):
    ds = from_pbd(GOLDEN, exclude=["rm"])
    pdf = ds.flatten().to_pandas()
    # exploding f broadcasts scalars ×2; sd/de are MISSING in the data and
    # must surface as proto defaults, not nulls
    assert list(pdf["a"]) == [13, 13]
    assert list(pdf["b"]) == [23, 23]
    assert list(pdf["c"]) == [33, 33]
    assert all(abs(x - -1.3) < 1e-6 for x in pdf["d"])
    assert list(pdf["e"]) == ["B", "B"]
    assert [round(x, 4) for x in pdf["f"]] == [2.3, 3.3]
    assert list(pdf["s"]) == ["test", "test"]
    assert list(pdf["sd"]) == ["", ""]
    assert list(pdf["de"]) == ["DE1", "DE1"]


def test_pbd_include_rm(spark):
    pdf = from_pbd(GOLDEN, include=["rm"]).flatten().to_pandas()
    assert list(pdf["b"]) == [11, 22]


def test_pbd_include_scalar_no_explosion(spark):
    pdf = from_pbd(GOLDEN).flatten(include=["a"]).to_pandas()
    assert_frame({"a": [13]}, pdf)
    pdf = from_pbd(GOLDEN).flatten(include=["m.b"]).to_pandas()
    assert_frame({"b": [23]}, pdf)


def test_pbd_conflicting_clusions(spark):
    with pytest.raises(ClusionError):
        from_pbd(GOLDEN, include=["a"], exclude=["a"])
