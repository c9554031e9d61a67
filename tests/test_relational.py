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


def test_approx_sketches_error_bounds(spark):
    # q_approx_sketches has no DuckDB oracle by design (sketches are
    # engine-specific); bound HLL++ and quantile-sketch error against
    # the exact answers instead
    from pyspark.sql import functions as F

    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    approx = {r["o_orderpriority"]: r for r in q.q_approx_sketches(spark, sf).collect()}
    o = q.load(spark, sf, "orders")
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, a in approx.items():
        e = exact[k]
        assert abs(a["approx_customers"] - e["customers"]) <= 0.1 * e["customers"] + 2
        assert abs(a["approx_median_price"] - e["median_price"]) <= 0.05 * e["median_price"]
