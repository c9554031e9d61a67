"""Property-based differential tests (hypothesis) — a step beyond the
reference's golden-value-only strategy (SURVEY §5): each operator is
checked against an independent pure-Python oracle on randomized inputs,
so the Spark implementation and the SQL oracle can't share a bug.

Examples are capped low (Spark round-trip per example ~0.5 s); the
generators bias toward collisions (tiny vocabularies, short docs) where
the interesting behavior lives.
"""

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st

from bamboo_spark.operators import dedup
from bamboo_spark.operators.similarity import quantize_embeddings

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    print_blob=True,
)

WORDS = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab → dense collisions

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


def shingle_set(text: str, k: int = 3) -> frozenset:
    toks = text.split(" ")
    if len(toks) < k:
        return frozenset()
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


def brute_jaccard_pairs(texts, threshold):
    sets = {i: shingle_set(t) for i, t in enumerate(texts)}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        if not sets[a] or not sets[b]:
            continue
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        j = int(j * 1e6 + 0.5) / 1e6  # round half-away, positive domain
        if j >= threshold:
            out[(a, b)] = j
    return out


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.5, 0.8, 1.0]))
def test_jaccard_pairs_matches_bruteforce(spark, texts, threshold):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(df, threshold=threshold).collect()
    }
    assert got == brute_jaccard_pairs(texts, threshold)


@settings(**SETTINGS)
@given(texts=docs_strategy)
def test_minhash_lsh_matches_bruteforce(spark, texts):
    # 64 hashes / r=2: miss probability for a 0.5-similar pair is
    # (1 - 0.25)^32 ≈ 1e-4 per pair — negligible over these run counts
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(df, threshold=0.5, num_hashes=64).collect()
    }
    assert got == brute_jaccard_pairs(texts, 0.5)


def py_simhash(text: str) -> int:
    toks = sorted(set(text.split(" ")))
    if not toks:
        return 0
    vals = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    sim = 0
    for j in range(60):
        ones = sum((v >> j) & 1 for v in vals)
        if 2 * ones > len(vals):
            sim |= 1 << j
    return sim


@settings(**SETTINGS)
@given(texts=docs_strategy, d=st.sampled_from([0, 2, 4]))
def test_simhash_pairs_matches_python(spark, texts, d):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_pairs(df, max_hamming=d).collect()
    }
    sims = {i: py_simhash(t) for i, t in enumerate(texts)}
    want = {}
    for a, b in combinations(sorted(sims), 2):
        h = bin(sims[a] ^ sims[b]).count("1")
        if h <= d:
            want[(a, b)] = h
    assert got == want


edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
).map(lambda es: [(min(a, b), max(a, b)) for a, b in es])


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(**SETTINGS)
@given(edges=edges_strategy)
def test_components_match_unionfind(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # 13 nodes → diameter < 13; K=13 guarantees convergence
    got = {
        r.doc_id: r.component
        for r in dedup.connected_components(df, iterations=13).collect()
    }
    assert got == union_find(edges)


flatten_rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        st.lists(st.integers(0, 99), min_size=0, max_size=4),
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(rows=flatten_rows_strategy)
def test_flatten_broadcast_invariants(spark, rows):
    """The core flatten contract on randomized rows: output cardinality
    is Σ|b| (inner join drops empty lists), scalars broadcast in order,
    and include=['a'] suppresses all multiplication."""
    from bamboo_spark.dataset import Dataset

    df = spark.createDataFrame(rows, "a double, b array<bigint>")
    ds = Dataset(df)
    flat = ds.flatten().to_pandas()
    want_rows = sum(len(b) for _, b in rows)
    assert len(flat) == want_rows
    want_a, want_b = [], []
    for a, b in rows:
        want_a.extend([a] * len(b))
        want_b.extend(b)
    got_a = [None if v != v else v for v in flat["a"]]  # NaN→None
    assert got_a == want_a and list(flat["b"]) == want_b

    only_a = ds.flatten(include=["a"]).to_pandas()
    assert len(only_a) == len(rows)  # no multiplication from b
    assert list(only_a.columns) == ["a"]


vectors_strategy = st.lists(
    st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=4, max_size=4
    ),
    min_size=1,
    max_size=6,
)


@settings(**SETTINGS)
@given(vecs=vectors_strategy)
def test_quantize_bounds_and_reconstruction(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = quantize_embeddings(df).collect()
    assert len(rows) == 4 * len(vecs)
    for r in rows:
        assert -127 <= r.q <= 127
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.pos] = r
    import numpy as np

    for i, v in enumerate(vecs):
        arr = np.array(v, dtype=np.float32).astype(np.float64)
        scale = max(np.abs(arr).max(), 1e-30) / 127.0
        for pos, r in by_vec[i].items():
            # reconstruction error bounded by half a quantization step
            assert r.err <= scale / 2 + 1e-6, (i, pos, r.err, scale)
