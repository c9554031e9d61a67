"""Empty-input robustness: every operator family must return an empty
(or well-defined) result on an empty table — not raise. Classic crash
source (the round-3 advisor found exactly this in topk_neighbors_ivf's
empty query slice)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dedup_family_empty(spark, empty_docs):
    from bamboo_spark.operators import dedup

    assert dedup.jaccard_pairs(empty_docs, 0.7).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs, 0.7).count() == 0
    assert dedup.simhash_pairs(empty_docs, max_hamming=2).count() == 0
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components_converged(pairs).count() == 0
    labels = spark.createDataFrame([], "doc_id long, component long")
    assert dedup.components_incremental(labels, pairs).count() == 0


def test_linkage_empty(spark):
    from bamboo_spark.operators.linkage import (
        edit_distance_join,
        edit_distance_pairs,
    )

    e = spark.createDataFrame([], "id long, k string")
    one = spark.createDataFrame([(1, "abc")], "id long, k string")
    assert edit_distance_pairs(e, "id", "k", 2).count() == 0
    assert edit_distance_join(e, one, "id", "k", 2).count() == 0
    assert edit_distance_join(one, e, "id", "k", 2).count() == 0


def test_bpe_empty(spark, empty_docs):
    from bamboo_spark.operators.bpe import bpe_encode_counts, bpe_train

    assert bpe_train(empty_docs, "text", 3).count() == 0
    assert bpe_encode_counts(empty_docs, "text", 3).count() == 0


def test_cdc_and_scale_empty(spark):
    from bamboo_spark.operators.scale import cdc_apply, snapshot_diff

    base = spark.createDataFrame([], "k long, ver long, v string")
    chg = spark.createDataFrame([], "k long, ver long, v string, op string")
    assert cdc_apply(base, chg, "k", ["ver"], op_col="op").count() == 0
    d = spark.createDataFrame([], "doc_id long, source string, text string")
    assert snapshot_diff(d, d).count() == 0


def test_text_and_pack_empty(spark, empty_docs):
    from bamboo_spark.operators import pack, text

    assert text.add_text_stats(empty_docs).count() == 0
    assert text.gopher_filter(empty_docs).count() == 0
    assert (
        pack.chunk_documents(empty_docs, chunk_tokens=8, stride=4).count()
        == 0
    )


def test_similarity_empty(spark):
    from bamboo_spark.operators import similarity

    e = spark.createDataFrame([], "vec_id long, embedding array<double>, label string")
    assert similarity.embedding_moments(e).count() == 0
    with pytest.raises(ValueError, match="empty"):
        similarity.embedding_covariance(e)
