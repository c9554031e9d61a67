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


# ------------------------------------------------------ flatten core
#
# Differential test of the one relational operator the reference is
# built around: random nested schemas (respecting the one-repetition-
# path rule) and random values — from_object().flatten() must equal an
# independent pure-Python flattener implementing the documented
# semantics: scalars broadcast over the exploded list, null records
# yield null leaves (or drop the row when the repetition path runs
# through them), engine drops all-null columns.


@st.composite
def _nested_schema(draw, depth=0, allow_list=True, path=()):
    kinds = ["int", "str", "bool"]
    if depth < 3:
        kinds = kinds + ["record"]
        if allow_list:
            kinds = kinds + ["list", "list"]
    kind = draw(st.sampled_from(kinds))
    if kind == "record":
        n = draw(st.integers(1, 3))
        listful = draw(st.integers(0, n - 1)) if allow_list else -1
        fields = []
        for i in range(n):
            fields.append(
                (
                    "f%d" % i,
                    draw(
                        _nested_schema(
                            depth=depth + 1,
                            allow_list=(i == listful),
                            path=path + ("f%d" % i,),
                        )
                    ),
                )
            )
        return ("record", fields)
    if kind == "list":
        return ("list", draw(_nested_schema(depth=depth + 1, allow_list=True, path=path)))
    return (kind,)


def _value_of(draw, schema, nullable=True):
    kind = schema[0]
    if kind == "record":
        if nullable and not _has_list(schema) and draw(st.integers(0, 5)) == 0:
            return None
        return {name: _value_of(draw, sub, nullable=True) for name, sub in schema[1]}
    if kind == "list":
        return [
            _value_of(draw, schema[1], nullable=True)
            for _ in range(draw(st.integers(1, 3)))
        ]
    if nullable and draw(st.integers(0, 5)) == 0:
        return None
    if kind == "int":
        return draw(st.integers(-100, 100))
    if kind == "str":
        return draw(st.sampled_from(["x", "y", "zz"]))
    return draw(st.booleans())


def _has_list(schema):
    if schema[0] == "list":
        return True
    if schema[0] == "record":
        return any(_has_list(sub) for _, sub in schema[1])
    return False


@st.composite
def _schema_and_rows(draw):
    fields = draw(_nested_schema(depth=1, allow_list=True, path=()))
    if fields[0] != "record":
        fields = ("record", [("f0", fields)])
    rows = [
        _value_of(draw, fields, nullable=False) for _ in range(draw(st.integers(1, 4)))
    ]
    return fields, rows


def _ref_flatten(value, schema, path=()):
    """Independent flattener: list of {col_name: scalar} rows (INNER)."""
    kind = schema[0]
    if kind == "record":
        if value is None:
            if _has_list(schema):
                return []  # repetition path runs through a null record
            return [dict(_null_leaves(schema, path))]
        parts = [
            _ref_flatten(value.get(name), sub, path + (name,))
            for name, sub in schema[1]
        ]
        # exactly one part may have != 1 rows (the list-bearing child)
        out = [{}]
        for rows in parts:
            if not rows:
                return []
            if len(rows) == 1:
                out = [dict(o, **rows[0]) for o in out]
            else:
                out = [dict(o, **r) for o in out for r in rows]
        return out
    if kind == "list":
        if value is None:
            return []
        out = []
        for item in value:
            out.extend(_ref_flatten(item, schema[1], path))
        return out
    return [{"_".join(path): value}]


def _null_leaves(schema, path):
    kind = schema[0]
    if kind == "record":
        for name, sub in schema[1]:
            yield from _null_leaves(sub, path + (name,))
    elif kind == "list":
        yield from _null_leaves(schema[1], path)
    else:
        yield ("_".join(path), None)


@settings(**SETTINGS)
@given(data=_schema_and_rows())
def test_flatten_matches_reference_semantics(spark, data):
    from collections import Counter

    from bamboo_spark import NameStrategy, from_object

    schema, rows = data
    expected_rows = []
    for row in rows:
        expected_rows.extend(_ref_flatten(row, schema))
    # engine drops all-null columns (NullType from inference): mirror it
    all_cols = sorted({c for r in expected_rows for c in r})
    live = [c for c in all_cols if any(r.get(c) is not None for r in expected_rows)]
    # zero live columns → the engine's zero-column frame has zero rows
    want = (
        Counter(tuple((c, repr(r.get(c))) for c in live) for r in expected_rows)
        if live
        else Counter()
    )

    pdf = (
        from_object(rows, spark=spark)
        .flatten(name_strategy=NameStrategy.CONCATENATE_ALWAYS)
        .to_pandas()
    )
    assert sorted(pdf.columns) == live, (sorted(pdf.columns), live)
    got = Counter(
        tuple(
            (c, repr(None if pd_isna(v) else _canon(v)))
            for c, v in sorted(row.items())
        )
        for row in pdf.to_dict("records")
    )
    assert got == want


def pd_isna(v):
    import pandas as pd

    try:
        return v is None or pd.isna(v)
    except (TypeError, ValueError):
        return False


def _canon(v):
    # pandas widens nullable int columns to float; undo for comparison
    if isinstance(v, float) and v.is_integer():
        return int(v)
    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


@settings(**SETTINGS)
@given(
    n_toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=6),
    chunk=st.sampled_from([8, 16]),
    stride=st.sampled_from([4, 8, 12]),
)
def test_chunk_documents_covers_every_token(spark, n_toks, chunk, stride):
    # every token of every doc appears in at least one chunk; chunks
    # except the first start exactly stride tokens after their
    # predecessor; reassembling chunk[overlap:] tails reconstructs the doc
    if stride >= chunk:
        stride = chunk // 2
    from bamboo_spark.operators.pack import chunk_documents

    rows = [
        (i, " ".join("t%d_%d" % (i, j) for j in range(n)))
        for i, n in enumerate(n_toks)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, stride=stride)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
    overlap = chunk - stride
    for i, n in enumerate(n_toks):
        toks = ["t%d_%d" % (i, j) for j in range(n)]
        chunks = [got[i][c] for c in sorted(got[i])]
        # reconstruction: first chunk + stride-tails of the rest
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            assert c[:overlap] == rebuilt[-overlap:]  # exact overlap
            rebuilt.extend(c[overlap:])
        assert rebuilt == toks
        for c in chunks:
            assert len(c) <= chunk


def test_scrub_pii_idempotent_and_complete():
    # scrubbing twice changes nothing; scrubbed text holds no PII hits
    import duckdb

    from bamboo_spark.operators.text import pii_count_duck, scrub_pii_duck

    con = duckdb.connect()
    samples = [
        "mail me at a.b+c%d@ex-ample.co.uk now",
        "http://x.org/a_b-c/d and https://y.io/z?not=matched",
        "call 555-123-4567 or 011-222-3333 ext 9",
        "mixed: u1@a.bc https://h.st/p 999-888-7777 tail",
        "no pii here at all",
    ]
    for s in samples:
        once, n = con.execute(
            "select {sc}, {ct} from (select ? r)".format(
                sc=scrub_pii_duck("r"), ct=pii_count_duck("r")
            ),
            [s],
        ).fetchone()
        twice = con.execute(
            "select {sc} from (select ? r)".format(sc=scrub_pii_duck("r")), [once]
        ).fetchone()[0]
        assert twice == once
        n_after = con.execute(
            "select {ct} from (select ? r)".format(ct=pii_count_duck("r")), [once]
        ).fetchone()[0]
        assert n_after == 0
        if "no pii" not in s:
            assert n > 0


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_contraction_components_match_union_find(spark, edges):
    # large-star/small-star contraction vs a pure-Python union-find on
    # random multigraphs (self-loops included — must be ignored)
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
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
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components_contraction(pairs).collect()
    }
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200),
    probes=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50),
    log_bits=st.integers(min_value=3, max_value=16),
    num_hashes=st.integers(min_value=1, max_value=8),
)
def test_bloom_core_never_false_negative(keys, probes, log_bits, num_hashes):
    # pure-numpy invariant behind bloom_dedup_incremental's exactness:
    # an inserted key ALWAYS probes positive, for any filter geometry
    # (false positives are allowed — the verify join removes them)
    import numpy as np

    num_bits = 1 << log_bits
    h = np.array(keys, dtype=np.int64)
    bitmap = dedup._bloom_hits(h, None, num_bits, num_hashes)
    if len(keys):
        assert dedup._bloom_hits(h, bitmap, num_bits, num_hashes).all()
    # and probing never crashes / returns the right shape on arbitrary keys
    q = np.array(probes, dtype=np.int64)
    res = dedup._bloom_hits(q, bitmap, num_bits, num_hashes)
    assert res.shape == (len(probes),) and res.dtype == bool


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=60, unique=True,
    ),
    num_shards=st.integers(min_value=1, max_value=5),
)
def test_sharded_bloom_never_false_negative(spark, keys, num_shards):
    # every inserted key must survive the sharded build+probe round
    # trip, for any shard count — shard routing (high hash bits) and
    # bit positions (low bits) must agree between build and probe
    from pyspark.sql import functions as F

    from bamboo_spark.operators.dedup import bloom_build_sharded, bloom_filter_sharded

    df = spark.createDataFrame([(k,) for k in keys], "k long").withColumn(
        "h", F.xxhash64("k")
    )
    maps = bloom_build_sharded(df.select("h"), num_shards, num_bits=1 << 10)
    kept = bloom_filter_sharded(df, maps, num_shards, num_bits=1 << 10)
    assert {r["k"] for r in kept.collect()} == set(keys)


def _py_segment_dedup(docs, B):
    """Pure-Python reference for segment_dedup: first occurrence by
    (doc_id, blk_idx) over exact block content."""
    blocks = []
    for doc_id in sorted(docs):
        toks = docs[doc_id].split(" ")
        for i in range(0, (len(toks) + B - 1) // B):
            blocks.append((doc_id, i, " ".join(toks[i * B : (i + 1) * B])))
    first = {}
    for doc_id, i, blk in blocks:
        first.setdefault(blk, (doc_id, i))
    out = {}
    for doc_id in sorted(docs):
        mine = [(i, b) for d, i, b in blocks if d == doc_id]
        kept = [b for i, b in mine if first[b] == (doc_id, i)]
        out[doc_id] = (len(mine), len(kept), " ".join(kept))
    return out


def test_segment_dedup_matches_python_reference(spark):
    import random

    from bamboo_spark.operators.dedup import segment_dedup

    rng = random.Random(7)
    vocab = ["w%d" % i for i in range(12)]
    for trial in range(3):
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for i in range(1, 16)
        }
        B = rng.choice([3, 5, 8])
        sdf = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
            for r in segment_dedup(sdf, block_tokens=B).collect()
        }
        assert got == _py_segment_dedup(docs, B), (trial, B)


def test_containment_matches_python_reference(spark):
    import random

    from bamboo_spark.operators.dedup import containment_pairs

    rng = random.Random(11)
    vocab = ["t%d" % i for i in range(10)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for i in range(1, 14)
    }
    k, t = 3, 0.5

    def shingles(txt):
        toks = txt.split(" ")
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }

    want = {}
    for a, ta in docs.items():
        for b, tb in docs.items():
            if a == b:
                continue
            sa, sb = shingles(ta), shingles(tb)
            if not sa:
                continue
            c = round(len(sa & sb) / len(sa), 6)
            if c >= t:
                want[(a, b)] = c
    sdf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(sdf, threshold=t, max_shingle_df=None).collect()
    }
    assert got == want


def test_budget_head_prefilter_randomized_equivalence(spark):
    # random keys/weights/hashes: the weighted pre-filter path must
    # equal the plain windowed budget slice on every draw
    import random

    from pyspark.sql import functions as F

    from bamboo_spark.operators.scale import budget_head

    rng = random.Random(23)
    for trial in range(3):
        rows = [
            (
                "k%d" % rng.randint(0, 4),
                rng.randint(0, 2**40),
                rng.randint(0, 9),
                i,
            )
            for i in range(800)
        ]
        df = spark.createDataFrame(rows, "k string, h long, w long, id long")
        budget = rng.choice([5, 17, 40])
        kw = dict(
            key_cols="k", hash_col="h", weight_col="w", budget=budget,
            tiebreak_cols=["id"],
        )
        plain = {
            (r["k"], r["id"], r["cum_weight"])
            for r in budget_head(df, **kw).collect()
        }
        pre = {
            (r["k"], r["id"], r["cum_weight"])
            for r in budget_head(
                df, hot_min=50, hash_max=2**40, buckets=64, **kw
            ).collect()
        }
        assert plain == pre, (trial, budget)


@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_mixture_temperature_matches_python(spark, tmp_path_factory, counts):
    """Differential: temperature weights/epochs vs a pure-Python oracle
    on randomized per-source counts. sqrt chains are IEEE
    correctly-rounded, so python math.sqrt replays Spark's F.sqrt
    bit-for-bit; weights then quantize to integer micro-units BEFORE
    the normalizer sum (round 10: a raw double normalizer sum is
    addition-order-dependent and flipped a floor at an ulp boundary on
    regenerated data), so every downstream quantity is exact integer
    math the Python model replays with // ."""
    import math

    from bamboo_spark import queries as q

    rows = [
        (i * 1000 + j, "txt", "en", "s%d" % i, 3)
        for i, c in enumerate(counts)
        for j in range(c)
    ]
    d = str(tmp_path_factory.mktemp("mixprop"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = q.q_mixture_temperature(spark, d).collect()
    n = {"s%d" % i: c for i, c in enumerate(counts)}
    tot = sum(n.values())

    def _round_half_up(x: float) -> int:
        return math.floor(x + 0.5)

    for temp, f in ((1, lambda x: float(x)),
                    (2, lambda x: math.sqrt(x)),
                    (4, lambda x: math.sqrt(math.sqrt(x)))):
        wu = {s: _round_half_up(f(v) * 1e6) for s, v in n.items()}
        z = sum(wu[s] for s in sorted(wu))
        got = {r["source"]: r for r in out if r["temperature"] == temp}
        assert set(got) == set(n)
        for s, r in got.items():
            assert r["n_docs"] == n[s]
            assert r["weight_ppm"] == (1000000 * wu[s]) // z, (s, temp)
            assert r["epochs_x1000"] == (1000 * wu[s] * tot) // (
                z * n[s]
            ), (s, temp)


@given(texts=docs_strategy)
@settings(**SETTINGS)
def test_curriculum_bands_match_python(spark, tmp_path_factory, texts):
    """Differential: the TTR banding grid vs a pure-Python oracle on
    randomized tiny-vocab docs (integer-exact end to end, so equality
    is strict)."""
    from collections import defaultdict

    from bamboo_spark import queries as q

    rows = [
        (i, t, "en", "src", len(t)) for i, t in enumerate(texts)
    ]
    d = str(tmp_path_factory.mktemp("currprop"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r["band"]: r for r in q.q_curriculum_order(spark, d).collect()}

    grid = defaultdict(lambda: [0, 0, 0])  # n_docs, n_tokens, sum_dppm
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        if not toks:
            continue
        n_tok, n_distinct = len(toks), len(set(toks))
        dppm = (1000000 * n_distinct) // n_tok
        band = min(dppm * 8 // 1000000, 7)
        g = grid[band]
        g[0] += 1
        g[1] += n_tok
        g[2] += dppm
    assert set(out) == set(grid)
    total = sum(g[0] for g in grid.values())
    cum = 0
    for band in sorted(grid):
        n_docs, n_tokens, sum_d = grid[band]
        cum += n_docs
        r = out[band]
        assert r["n_docs"] == n_docs
        assert r["n_tokens"] == n_tokens
        assert r["mean_difficulty_ppm"] == sum_d // n_docs
        assert r["cum_corpus_ppm"] == (1000000 * cum) // total
