"""Engine twins of the reference's CI perf assertions (BASELINE.md
derived gates; reference avro_tests.py:252-277, pbd_tests.py:42-60).

Budgets carry ~4× headroom over observed local[32] times so shared-box
contention can't flake them — they gate order-of-magnitude regressions
(a lost codegen span, an accidental shuffle), not ±20% noise.
"""

import time

from pyspark.sql import functions as F

from bamboo_spark.flatten import JoinType
from bamboo_spark.dataset import Dataset

N = 1_000_000


def test_flatten_throughput_1m_rows(spark, tmp_path):
    # F10 twin: 1M rows with a 2-element list of structs → 2M output
    # rows through the flatten planner. Reference gate: 1M rows/s.
    path = str(tmp_path / "nested1m.parquet")
    spark.range(N).select(
        F.col("id"),
        F.array(
            F.struct((F.col("id") * 2).alias("v")),
            F.struct((F.col("id") * 2 + 1).alias("v")),
        ).alias("items"),
    ).write.parquet(path)

    ds = Dataset(spark.read.parquet(path))
    flat = ds.flatten()
    start = time.perf_counter()
    flat.df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - start
    out_rows = 2 * N
    assert elapsed < 8.0, "flatten of %d rows took %.2fs" % (out_rows, elapsed)
    assert flat.df.count() == out_rows


def test_scan_throughput_1m_records_json(spark, tmp_path):
    # F9 twin (schema STRUCT<a:int>, 1M records): the reference gates
    # its avro decode at >10× fastavro ≈ >1M rec/s. JSON is our
    # worst-case text source; gate well above 200k rec/s aggregate.
    path = str(tmp_path / "json1m")
    spark.range(N).select(
        F.concat(F.lit('{"a": '), (F.col("id") % 100).cast("string"), F.lit("}")).alias(
            "value"
        )
    ).write.text(path)

    start = time.perf_counter()
    df = spark.read.schema("a int").json(path)
    got = df.count()
    elapsed = time.perf_counter() - start
    assert got == N
    assert elapsed < 5.0, "1M-record JSON scan took %.2fs (< 200k rec/s)" % elapsed


def test_gopher_filter_scan_speed_1m_docs(spark, tmp_path):
    # quality_filter claims scan-speed: 1M short docs through the full
    # Gopher flag projection must sustain >200k docs/s aggregate (4x
    # headroom over observed local[32] ~1s)
    from bamboo_spark.operators.text import gopher_filter

    path = str(tmp_path / "docs1m.parquet")
    spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the and for with that doc "),
            (F.col("id") % 1000).cast("string"),
            F.lit(" lorem ipsum dolor sit amet consectetur"),
        ).alias("text"),
    ).write.parquet(path)

    df = gopher_filter(spark.read.parquet(path))
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - start
    assert elapsed < 5.0, "1M-doc gopher filter took %.2fs (< 200k docs/s)" % elapsed


def test_sketch_build_throughput_5m_items(spark):
    # mergeable-state builders must stay JVM-side scan-speed: 5M items
    # through the CMS grid AND the HLL registers in well under a minute
    # (observed ~2-4 s each on local[32]; 4x+ headroom). A regression
    # here means the hash math fell out of codegen or a Python path
    # crept in.
    from bamboo_spark.operators.sketch import cms_build, hll_build

    n = 5_000_000
    items = spark.range(n).selectExpr("cast(id % 100000 as string) it")
    t0 = time.time()
    assert cms_build(items, "it", depth=4, width=8192).count() <= 4 * 8192
    cms_s = time.time() - t0
    t0 = time.time()
    assert hll_build(items, "it", p=12).count() <= 1 << 12
    hll_s = time.time() - t0
    assert cms_s < 60, cms_s
    assert hll_s < 60, hll_s
