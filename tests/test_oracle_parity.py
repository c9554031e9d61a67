"""Local replica of the driver's correctness gate: run every registry
query on Spark AND its oracle SQL on DuckDB over the same parquet, then
compare row count, column names/dtypes, and values (order-insensitive).

Default scale: sf0.001 for speed; set BAMBOO_PARITY_SF=sf0.01 to match
the driver's gate exactly.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

from bamboo_spark.queries import TABLES, oracle_sql, queries

SF_DIR = "/root/testdata/%s" % os.environ.get("BAMBOO_PARITY_SF", "sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            "create view %s as select * from '%s/%s.parquet'" % (t, SF_DIR, t)
        )
    yield con
    con.close()


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf) and len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    sql = oracle_sql().get(name)
    if sql is None:
        pytest.skip("no oracle for %s (rows-only check)" % name)
    sdf = queries()[name](spark, SF_DIR)
    got = canonical(sdf.toPandas())
    want = canonical(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), "row count: spark=%d duck=%d" % (len(got), len(want))
    for col in got.columns:
        g, w = got[col], want[col]
        for i, (gv, wv) in enumerate(zip(g, w)):
            g_nan = gv is None or (isinstance(gv, float) and math.isnan(gv))
            w_nan = wv is None or (isinstance(wv, float) and math.isnan(wv))
            if g_nan or w_nan:
                assert g_nan and w_nan, (name, col, i, gv, wv)
            elif isinstance(gv, float) or isinstance(wv, float):
                assert float(gv) == float(wv), (name, col, i, gv, wv)
            else:
                assert gv == wv, (name, col, i, gv, wv)
