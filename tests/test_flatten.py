"""Flatten semantic parity — the 12 judge-checkable behaviors of
SURVEY.md §2, sourced from reference python/bamboo_tests/node_tests.py
and json_tests.py. All inputs go through from_object (the reference's
pure-Python path)."""

import math

import pytest

from bamboo_spark import (
    Dataset,
    FlattenStrategy,
    JoinType,
    NameStrategy,
    from_object,
)
from tests.conftest import assert_frame

NAN = float("nan")


class SimpleObject:
    def __init__(self, value):
        self.value = value


class ListObject:
    def __init__(self, values):
        self.values = values


@pytest.fixture(scope="module", autouse=True)
def _spark(spark):
    return spark


def flat(obj, **kwargs):
    return from_object(obj).flatten(**kwargs).to_pandas()


def test_readme_flatten_broadcast(spark):
    # SURVEY behavior 1 (README.md:66-75, json_tests.py:51-57)
    rows = [{"a": None, "b": [1, 2], "c": [5, 6]}, {"a": -1.0, "b": [3, 4], "c": [7, 8]}]
    pdf = flat(rows, include=["a", "b"])
    assert_frame({"a": [NAN, NAN, -1.0, -1.0], "b": [1, 2, 3, 4]}, pdf)


def test_conflicting_lists_error(spark):
    # behavior 2
    rows = [{"a": None, "b": [1, 2], "c": [5, 6]}]
    with pytest.raises(ValueError, match="conflicting lists"):
        flat(rows, include=["b", "c"])


def test_excluded_lists_are_ignored(spark):
    # behavior 3 (node_tests.py:225-230)
    rows = [{"a": None, "b": [2, 3], "c": [-2, -3]}, {"a": 1, "b": [2, 4], "c": [-2, -4]}]
    pdf = flat(rows, include=["a"])
    assert list(pdf.columns) == ["a"]
    assert len(pdf) == 2
    pdf = flat(rows, include=["b"])
    assert_frame({"b": [2, 3, 2, 4]}, pdf)


def test_nested_list_multiplication(spark):
    # behavior 4 (node_tests.py:119-129) via attribute-objects
    a = SimpleObject(1.0)
    b = SimpleObject(None)
    c = ListObject([a, b])
    c_a = ListObject([c, c])
    d = {"a": c_a, "b": 3}
    pdf = flat(d, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame(
        {"a_values_values_value": [1.0, NAN, 1.0, NAN], "b": [3, 3, 3, 3]}, pdf
    )


def test_null_record_prunes_rows(spark):
    # behavior 5 (node_tests.py:131-139)
    d = [{"b": [1.0, 1.0, 1.0]}, None]
    c = {"d": d, "e": 2.0}
    pdf = flat(c, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"d_b": [1.0, 1.0, 1.0], "e": [2.0, 2.0, 2.0]}, pdf)


def test_null_list_inner_semantics(spark):
    # F3 (node_tests.py:151-159)
    d = [{"b": [1.0, 1.0, 5.0], "c": 2.0}, {"b": None, "c": 3.0}]
    c = {"d": d, "e": 4.0}
    pdf = flat(c, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame(
        {"d_b": [1.0, 1.0, 5.0], "d_c": [2.0, 2.0, 2.0], "e": [4.0, 4.0, 4.0]}, pdf
    )


def test_outer_join_extension(spark):
    # our working JoinType.OUTER (reference raises NotImplementedError)
    d = [{"b": [1.0], "c": 2.0}, {"b": None, "c": 3.0}]
    c = {"d": d}
    pdf = flat(c, join=JoinType.OUTER, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"d_b": [1.0, NAN], "d_c": [2.0, 3.0]}, pdf)


def test_null_primitive_kept(spark):
    # node_tests.py test_null_primitive — floats: null → NaN either way
    d = [{"b": [1.0, 1.0, None]}, {"b": [1.0, 1.0, None]}]
    c = {"d": d, "e": 2.0}
    pdf = flat(c, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame(
        {"d_b": [1.0, 1.0, NAN, 1.0, 1.0, NAN], "e": [2.0] * 6}, pdf
    )


def test_mixed_schema_union(spark):
    # behavior 6 (node_tests.py:202-208)
    rows = [{"a": 1.0, "b": 2.0}, {"a": 3.0, "c": 4.0}]
    pdf = flat(rows, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"a": [1.0, 3.0], "b": [2.0, NAN], "c": [NAN, 4.0]}, pdf)


def test_all_null_field_dropped(spark):
    # behavior 7 (node_tests.py:171-183)
    d = {"a": SimpleObject(1), "b": SimpleObject(None)}
    pdf = flat(d, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"a_value": [1]}, pdf)


def test_simple_flatten(spark):
    d = {"a": SimpleObject(1), "b": SimpleObject(2)}
    pdf = flat(d, name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"a_value": [1], "b_value": [2]}, pdf)


def test_strings(spark):
    pdf = flat(SimpleObject("a"), name_strategy=NameStrategy.CONCATENATE_ALWAYS)
    assert_frame({"value": ["a"]}, pdf)


def test_flatten_available_drops_conflicts(spark):
    # F11 (node_tests.py:192-200)
    d = {"a": [1, 2], "b": [3, 4], "c": 1}
    with pytest.raises(ValueError):
        flat(d)
    pdf = flat(d, flatten_strategy=FlattenStrategy.FLATTEN_AVAILABLE)
    assert_frame({"c": [1]}, pdf)


def test_flatten_explicit_only_included_lists(spark):
    d = {"a": [1, 2], "c": 5}
    pdf = flat(
        d,
        flatten_strategy=FlattenStrategy.FLATTEN_EXPLICIT,
        include=["a", "c"],
    )
    assert_frame({"a": [1, 2], "c": [5, 5]}, pdf)
    # without explicit include, the list contributes nothing
    pdf = flat(d, flatten_strategy=FlattenStrategy.FLATTEN_EXPLICIT, include=["c"])
    assert_frame({"c": [5]}, pdf)


def test_include_exclude_conflict(spark):
    with pytest.raises(ValueError):
        flat({"a": 1, "b": 2}, include={"a"}, exclude={"a"})


def test_exclude(spark):
    pdf = flat({"a": 1, "b": 2}, exclude={"b"})
    assert_frame({"a": [1]}, pdf)


def test_multi_index_naming(spark):
    ff = from_object({"a": {"c": 1}, "b": 2}).flatten(
        name_strategy=NameStrategy.MULTI_INDEX
    )
    pdf = ff.to_pandas()
    assert list(pdf.columns) == [("a", "c"), ("b", "")]
    assert list(pdf[("a", "c")]) == [1]


def test_empty_dataset(spark):
    pdf = flat([])
    assert len(pdf.columns) == 0
    assert len(pdf) == 0


def test_prim_only(spark):
    # behavior 8 — reference names the column None; ours uses 'value'
    pdf = flat([1, 2, 3])
    assert_frame({"value": [1, 2, 3]}, pdf)


def test_navigation_flatten(spark):
    # node_tests.py test_attr
    a = SimpleObject(1.0)
    b = SimpleObject(None)
    c = ListObject([a, b])
    d = SimpleObject(c)
    ds = from_object(d)
    pdf = ds.value.values.value.flatten().to_pandas()
    assert_frame({"value": [1.0, NAN]}, pdf)


def test_flatten_list_with_attr_objects(spark):
    # node_tests.py test_flatten_list: leaf 'value' + scalar 'b'
    a = SimpleObject(1.0)
    b = SimpleObject(None)
    c = ListObject([a, b])
    d = {"a": c, "b": 3}
    pdf = flat(d)
    assert_frame({"value": [1.0, NAN], "b": [3, 3]}, pdf)


def test_deep_name_conflict(spark):
    # F5: oa/ob with same inner names
    d = {"oa": {"ia": 1, "ib": 2}, "ob": {"ia": 3, "ib": 4}}
    pdf = flat(d)
    assert_frame({"oa_ia": [1], "oa_ib": [2], "ob_ia": [3], "ob_ib": [4]}, pdf)
    pdf = flat(d, exclude="oa")
    assert_frame({"ia": [3], "ib": [4]}, pdf)
    pdf = flat(d, exclude="oa", include=[{}, "oa.ia"])
    assert_frame({"oa_ia": [1], "ob_ia": [3], "ib": [4]}, pdf)


def test_info_rendering(spark):
    # node_tests.py:237-250
    c = {"d": [{"b": [1.0, 1.0, 1.0]}, {"b": [1.0]}], "e": 2.0}
    ds = from_object(c)
    assert str(ds) == "- d []\n    - b []float64\n- e float64"


def test_mismatched_primitive_types(spark):
    with pytest.raises(ValueError, match="Mismatched primitive types"):
        from_object([{"a": 1}, {"a": "x"}])


def test_inconsistent_schema(spark):
    with pytest.raises(ValueError, match="Inconsistent schema"):
        from_object([{"a": [1]}, {"a": {"b": 1}}])


def test_to_arrow_sink(spark):
    import pyarrow as pa

    from bamboo_spark import from_object

    tbl = from_object([{"a": 1, "xs": [1, 2]}, {"a": 2, "xs": [3]}]).to_arrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.column_names == ["a", "xs"]
    assert sorted(tbl.column("a").to_pylist()) == [1, 1, 2]
    assert tbl.column("xs").to_pylist() == [1, 2, 3] or sorted(
        tbl.column("xs").to_pylist()
    ) == [1, 2, 3]
