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


def test_shard_manifest_agrees_with_pack_chunks(spark):
    # same prefix-scan machinery, two consumers: with equal budgets the
    # manifest's shard assignment must equal pack_chunks' chunk spans
    from bamboo_spark.operators import pack

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = {
        r["doc_id"]: (r["chunk_id"], r["last_chunk_id"], r["straddles"])
        for r in pack.pack_chunks(docs, context_len=4096).collect()
    }
    manifest = {
        r["doc_id"]: (r["shard_id"], r["spans_shards"], r["shard_offset"], r["n_tokens"])
        for r in pack.shard_manifest(docs, shard_tokens=4096).collect()
    }
    assert set(chunks) == set(manifest)
    for d, (first, last, straddles) in chunks.items():
        shard, spans, off, n = manifest[d]
        assert shard == first
        assert spans == straddles == (1 if last != first else 0)
        assert 0 <= off < 4096


def test_chunk_documents_is_streaming_safe(spark, tmp_path):
    # pure projection + explode: applies to a stream unmodified and
    # emits the same rows the batch computes
    import time as _t

    from bamboo_spark.operators.pack import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r["doc_id"], r["chunk_id"]): r["n_chunk_tokens"]
        for r in chunk_documents(docs, chunk_tokens=64, stride=48).collect()
    }
    d = str(tmp_path / "replay")
    docs.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    out = chunk_documents(stream, chunk_tokens=64, stride=48)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("chunk_t").outputMode("append").start()
    try:
        deadline = _t.time() + 60
        while _t.time() < deadline:
            if spark.sql("select count(*) c from chunk_t").collect()[0].c >= len(batch):
                break
            _t.sleep(0.5)
        got = {
            (r["doc_id"], r["chunk_id"]): r["n_chunk_tokens"]
            for r in spark.sql("select * from chunk_t").collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest as _pytest

    from bamboo_spark.operators.pack import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=0)
