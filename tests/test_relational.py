"""Relational pass-through surface on Dataset (SURVEY §7.5): thin,
Catalyst-planned delegations."""

from pyspark.sql import functions as F

from bamboo_spark import Dataset, from_object


def test_filter_select_orderby(spark):
    ds = from_object([{"a": i, "b": i % 2} for i in range(10)])
    out = (
        ds.where(F.col("b") == 0)
        .select("a")
        .order_by(F.col("a").desc())
        .limit(2)
        .df.collect()
    )
    assert [r.a for r in out] == [8, 6]


def test_join_and_setops(spark):
    left = from_object([{"k": 1, "x": "a"}, {"k": 2, "x": "b"}])
    right = from_object([{"k": 2, "y": "z"}])
    joined = left.join(right, "k").df
    assert joined.count() == 1
    u = left.select("k").union(right.select("k")).distinct().df
    assert sorted(r.k for r in u.collect()) == [1, 2]
    s = left.select("k").subtract(right.select("k")).df
    assert [r.k for r in s.collect()] == [1]


def test_groupby_agg(spark):
    ds = from_object([{"g": i % 3, "v": float(i)} for i in range(9)])
    rows = (
        ds.group_by("g").agg(F.sum("v").alias("s")).orderBy("g").collect()
    )
    assert [r.s for r in rows] == [9.0, 12.0, 15.0]


def test_navigation_still_works_with_getitem(spark):
    ds = from_object({"select": {"inner": 1}})
    pdf = ds["select"].flatten().to_pandas()
    assert list(pdf["inner"]) == [1]
