"""Multimodal plumbing: the Spark-side contracts (schema, batch shape,
row multiplicity, determinism) are real; codecs are stubbed
(reference has no multimodal surface — this is north-star extension
coverage; see SURVEY.md §2 end note).
"""

import pytest
from pyspark.sql import functions as F

from bamboo_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, b"hello world"), (2, b"x" * 1000), (3, b"")]
    return spark.createDataFrame(rows, "doc_id long, data binary")


def test_extract_features_shape_and_determinism(spark, media_df):
    out = multimodal.extract_features(media_df).collect()
    assert len(out) == 3
    for r in out:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
    again = multimodal.extract_features(media_df).collect()
    assert sorted(map(tuple, ((r.doc_id, tuple(r.features)) for r in out))) == sorted(
        map(tuple, ((r.doc_id, tuple(r.features)) for r in again))
    )


def test_resize_fake_produces_target_bytes(spark, media_df):
    out = {r.doc_id: r for r in multimodal.resize_media(media_df, 8, 4).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.width, r.height) == (8, 4)
        assert len(r.data) == 8 * 4


def test_resize_real_codec_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        multimodal.resize_media(media_df, 8, 4, real_codec=True).collect()


def test_sample_frames_multiplicity_and_offsets(spark, media_df):
    out = multimodal.sample_frames(media_df, n_frames=4).toPandas()
    # one row per (doc, frame); empty payload still yields frame rows
    assert len(out) == 3 * 4
    g = out[out.doc_id == 2].sort_values("frame_idx")
    assert list(g.frame_idx) == [0, 1, 2, 3]
    assert list(g.byte_offset) == [0, 250, 500, 750]
    assert all(len(f) <= 16 for f in g.frame)


def test_media_struct_roundtrip(spark, media_df):
    m = multimodal.as_media(media_df, "data", mime="image/png")
    row = m.where(F.col("doc_id") == 1).select("media").first().media
    assert row.meta.mime == "image/png"
    assert bytes(row.data) == b"hello world"
