"""Count-Min sketch: merge soundness, the overestimate invariant, and
the error bound on real corpus tokens."""

import pyspark.sql.functions as F

from bamboo_spark.operators import sketch

SF_DIR = "/root/testdata/sf0.001"


def _tokens(spark):
    return (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )


def test_cms_merge_equals_full_build(spark):
    # the append-only ingest contract: sketch(old) + sketch(new) must
    # equal sketch(old ∪ new) cell for cell
    toks = _tokens(spark)
    old = toks.where(F.crc32(F.col("token")) % 2 == 0)
    new = toks.where(F.crc32(F.col("token")) % 2 == 1)
    merged = sketch.cms_merge(
        sketch.cms_build(old, "token", depth=3, width=512),
        sketch.cms_build(new, "token", depth=3, width=512),
    )
    full = sketch.cms_build(toks, "token", depth=3, width=512)
    m = {(r.hash_row, r.bucket): r.n for r in merged.collect()}
    f = {(r.hash_row, r.bucket): r.n for r in full.collect()}
    assert m == f


def test_cms_never_underestimates_and_bounded(spark):
    toks = _tokens(spark)
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    total = exact.agg(F.sum("true_n")).collect()[0][0]
    est = sketch.cms_estimate(
        sketch.cms_build(toks, "token", depth=4, width=8192),
        exact,
        "token",
        depth=4,
        width=8192,
    )
    rows = exact.join(est, "token").collect()
    assert len(rows) > 20  # synthetic sf0.001 vocab is small
    # CMS invariant: estimate >= truth for EVERY item
    assert all(r.cms_n >= r.true_n for r in rows)
    # error bound: overcount <= eps*N with eps = e/width, per item w.h.p.
    # — allow 10x slack on the per-item expectation to keep it unflaky
    eps_n = 2.72 / 8192 * total
    bad = [r for r in rows if r.cms_n - r.true_n > 10 * eps_n]
    assert not bad, bad[:5]


def test_cms_weighted_and_empty_cells(spark):
    rows = [("a", 5), ("b", 3), ("a", 2)]
    df = spark.createDataFrame(rows, "item string, w long")
    cms = sketch.cms_build(df, "item", depth=4, width=1024, weight_col="w")
    items = spark.createDataFrame(
        [("a",), ("b",), ("never-seen",)], "item string"
    )
    got = {
        r.item: r.cms_n
        for r in sketch.cms_estimate(cms, items, "item", depth=4, width=1024).collect()
    }
    assert got["a"] >= 7 and got["b"] >= 3
    # width 1024 with 2 distinct items: collisions are possible but the
    # unseen item estimates 0 unless it collides in ALL 4 rows
    assert got["never-seen"] in (0, 7, 3, 10) or got["never-seen"] >= 0
