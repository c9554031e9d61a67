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


def _phash_brute(payloads):
    """Independent python reimplementation of the phash signature +
    pair semantics (md5 grid, integer mean threshold, hamming<=8)."""
    import hashlib

    sigs = {}
    for doc_id, payload in payloads:
        hexs = hashlib.md5(payload).hexdigest() * 4
        cells = [int(hexs[2 * i : 2 * i + 2], 16) for i in range(64)]
        tot = sum(cells)
        bits = [1 if 64 * c > tot else 0 for c in cells]
        sigs[doc_id] = bits
    pairs = []
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ba, bb = sigs[a], sigs[b]
            # candidate iff some 16-bit band agrees
            band_eq = any(
                ba[s : s + 16] == bb[s : s + 16] for s in (0, 16, 32, 48)
            )
            ham = sum(x != y for x, y in zip(ba, bb))
            if band_eq and ham <= 8:
                pairs.append((a, b, ham))
    return sorted(pairs)


def test_phash_pairs_match_brute_force(spark):
    payloads = [(i, b"doc-%d" % (i % 7)) for i in range(1, 21)]
    df = spark.createDataFrame(payloads, "doc_id: long, data: binary")
    sig = multimodal.phash_bands(df)
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in multimodal.phash_pairs(sig, max_hamming=8).collect()
    )
    exp = _phash_brute(payloads)
    assert got == exp
    # exact duplicates (i % 7 collisions) must appear with hamming 0
    assert (1, 8, 0) in got
    # exactly-once emission: no pair twice even though exact dups agree
    # on all four bands
    assert len(got) == len(set((a, b) for a, b, _ in got))


def test_phash_pairs_recall_contract_crafted_signatures(spark):
    """r10 verdict #3: the banding recall contract, pinned with a
    brute-force differential on CRAFTED signatures. 4x16-bit bands
    guarantee a clean band only for hamming <= 3 (pigeonhole); spreads
    that touch all four bands (2+2+2+2) are legitimately missed at the
    default max_hamming=8 — the documented LSH trade-off."""

    def flip(sig, positions):
        # sig = [b0, b1, b2, b3] 16-bit band ints; flip global bit p
        out = list(sig)
        for p in positions:
            out[p // 16] ^= 1 << (p % 16)
        return out

    base = [0x1234, 0x5678, 0x9ABC, 0x0DEF]
    docs = {
        1: base,
        2: flip(base, [0, 17, 35]),          # hamming 3 spread 1+1+1+0
        3: flip(base, [5, 6, 7]),            # hamming 3 in one band
        4: flip(base, [8, 9, 10, 11, 12, 13, 14, 15]),  # 8 in one band
        5: flip(base, [0, 1, 16, 17, 32, 33, 48, 49]),  # 2+2+2+2 spread
        6: flip(base, [0, 1, 2, 3, 16, 17, 18, 19]),    # 4+4+0+0
    }
    sig = spark.createDataFrame(
        [(i, *[int(b) for b in s]) for i, s in sorted(docs.items())],
        "doc_id long, b0 long, b1 long, b2 long, b3 long",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.phash_pairs(sig, max_hamming=8).collect()
    }

    def ham(a, b):
        return sum(
            bin(x ^ y).count("1") for x, y in zip(docs[a], docs[b])
        )

    def band_eq(a, b):
        return any(x == y for x, y in zip(docs[a], docs[b]))

    ids = sorted(docs)
    brute = {
        (a, b): ham(a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(a, b) <= 8
    }
    # banding finds exactly the pairs sharing a clean band
    assert got == {p: h for p, h in brute.items() if band_eq(*p)}
    # the GUARANTEE: every hamming<=3 pair is found, any spread
    for p, h in brute.items():
        if h <= 3:
            assert p in got, (p, h)
    # the documented heuristic gap: 2+2+2+2 at hamming 8 is missed...
    assert (1, 5) in brute and (1, 5) not in got
    # ...while 8-bits-one-band and 4+4 spreads are found
    assert got[(1, 4)] == 8 and got[(1, 6)] == 8
