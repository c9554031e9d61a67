"""Sequence-packing operator tests: the distributed two-phase prefix
scan must equal the naive global-window cumsum on arbitrary inputs
(sparse/dense/duplicate-free ids, zero-token docs, shard counts that
don't divide n)."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window, functions as F

from bamboo_spark.operators import pack


def _naive_offsets(rows):
    rows = sorted(rows)
    out = {}
    acc = 0
    for i, n in rows:
        out[i] = (n, acc)
        acc += n
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 500)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
)
def test_token_offsets_matches_naive_cumsum(spark, rows, shards):
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = pack.token_offsets(
        df, id_col="doc_id", count_expr=F.col("n"), shards=shards
    ).collect()
    expected = _naive_offsets(rows)
    assert len(got) == len(expected)
    for r in got:
        n, start = expected[r["doc_id"]]
        assert (r["n_tokens"], r["start_offset"]) == (n, start), r


def test_pack_chunks_straddle_bookkeeping(spark):
    # docs of 10 tokens each, context 25: doc 2 spans tokens 20..29 →
    # straddles chunks 0→1; doc 5 spans 50..59 → chunks 2→2 (no straddle)
    df = spark.createDataFrame(
        [(i, "w " * 9 + "w") for i in range(6)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pack.pack_chunks(df, context_len=25).collect()}
    assert rows[0]["chunk_id"] == 0 and rows[0]["straddles"] == 0
    assert rows[2]["chunk_id"] == 0 and rows[2]["last_chunk_id"] == 1
    assert rows[2]["straddles"] == 1
    assert rows[5]["chunk_id"] == 2 and rows[5]["straddles"] == 0
