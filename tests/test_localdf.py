"""Focused tests for the r13 second-pass internals: the Arrow-batch
local_df builder (value/schema fidelity vs the classic createDataFrame
path) and the load() relation memo (metadata-only reuse)."""

import pytest

from pyspark.sql import functions as F

from bamboo_spark._localdf import local_df


CASES = [
    ("strings_null", [("a", "b"), ("c", None)], "x string, y string"),
    ("longs_null", [(1, None), (2, 3)], "x long, y long"),
    (
        "mixed",
        [("f", 1, 2.5, True), ("g", None, None, None)],
        "a string, b long, c double, d boolean",
    ),
    ("array_col", [(1, [1, 2, 3]), (2, [])], "a long, b array<long>"),
    ("ints", [(0, 5), (1, 7)], "cid int, pos int"),
    ("empty", [], "a string, b long"),
]


@pytest.mark.parametrize("name,rows,schema", CASES, ids=[c[0] for c in CASES])
def test_local_df_matches_classic_builder(spark, name, rows, schema):
    ref = spark.createDataFrame(rows, schema)
    got = local_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert sorted(map(str, got.collect())) == sorted(map(str, ref.collect()))


def test_local_df_struct_type_schema(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    got = local_df(spark, [(1, "a"), (2, None)], schema)
    assert [f.name for f in got.schema.fields] == ["k", "v"]
    assert got.where(F.col("v").isNull()).count() == 1


def test_local_df_falls_back_on_unconvertible_rows(spark):
    # a value pyarrow cannot coerce (pa.array raises on an arbitrary
    # object) must land on the classic builder path and reproduce its
    # semantics exactly — here the classic path stringifies the object
    class Odd:
        def __str__(self):
            return "odd"

    ref = spark.createDataFrame([(Odd(),)], "a string").collect()
    got = local_df(spark, [(Odd(),)], "a string").collect()
    assert got == ref == [pytest.approx(r) for r in ref]
    assert got[0]["a"] == "odd"


def test_load_memoizes_relation_per_session(spark):
    from bamboo_spark.queries._core import load, _load_fresh

    sf = "/root/testdata/sf0.001"
    a = load(spark, sf, "orders")
    b = load(spark, sf, "orders")
    assert a is b  # metadata memo: same resolved relation object
    c = _load_fresh(spark, sf, "orders")
    assert c is not a  # helper subtrees get fresh expr-ids on demand
    # values are identical either way
    assert a.count() == c.count()


def test_local_df_dict_rows_bind_by_name(spark):
    # r14 (ADVICE): zip(*rows) over dict rows used to transpose KEYS.
    # Mapping rows must bind by field name regardless of key order,
    # exactly like the classic builder's dict semantics.
    schema = "a string, b string, c long"
    rows = [
        {"a": "x", "b": "y", "c": 1},
        {"c": 2, "a": "p", "b": "q"},  # shuffled key order
    ]
    ref = spark.createDataFrame(rows, schema)
    got = local_df(spark, rows, schema)
    assert got.schema == ref.schema
    assert sorted(map(str, got.collect())) == sorted(map(str, ref.collect()))
    # all-string-width trap from the advice: keys must NOT become values
    vals = {r["a"] for r in got.collect()}
    assert vals == {"x", "p"}


def test_local_df_wide_rows_raise_like_classic(spark):
    # rows wider than the schema must reproduce the classic builder's
    # length-mismatch error, not silently drop trailing columns
    rows = [("a", 1, "extra")]
    schema = "x string, y long"
    with pytest.raises(Exception):
        spark.createDataFrame(rows, schema).collect()
    with pytest.raises(Exception):
        local_df(spark, rows, schema).collect()


def test_local_df_nullability_enforced_like_classic(spark):
    # None in a non-nullable field: the classic builder raises; the
    # Arrow path must not build a frame whose schema claims no nulls
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    rows = [(None, "a")]
    with pytest.raises(Exception):
        spark.createDataFrame(rows, schema).collect()
    with pytest.raises(Exception):
        local_df(spark, rows, schema).collect()


def test_load_memo_evicts_stale_applications(spark):
    from bamboo_spark.queries import _core

    sf = "/root/testdata/sf0.001"
    a = load_df = _core.load(spark, sf, "orders")
    app_id = spark.sparkContext.applicationId
    # plant an entry from a "stopped" session
    _core._LOAD_MEMO[("dead-app", sf, "orders")] = load_df
    _core.load(spark, sf, "nation")  # any miss evicts foreign app ids
    assert ("dead-app", sf, "orders") not in _core._LOAD_MEMO
    assert all(k[0] == app_id for k in _core._LOAD_MEMO)
    assert _core.load(spark, sf, "orders") is a  # live entries survive
