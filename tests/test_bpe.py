"""BPE trainer: differential test vs an independent pure-Python
reference (dict-of-tuples implementation, no string/replace tricks) on
random corpora and on the real documents table."""

import random
from collections import Counter

import pytest

from bamboo_spark.operators.bpe import bpe_train

SF_DIR = "/root/testdata/sf0.001"


def _py_bpe(word_counts, n_merges):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # argmax: count desc, pair lexicographic asc
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


@pytest.mark.parametrize("seed,n_merges", [(3, 5), (9, 8)])
def test_bpe_train_matches_python_reference_random(spark, seed, n_merges):
    rng = random.Random(seed)
    docs = []
    for _ in range(40):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(1, 12))
        ]
        docs.append(" ".join(words))
    wc = Counter(w for t in docs for w in t.split(" ") if w)
    expected = _py_bpe(wc, n_merges)

    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(df, "text", n_merges).orderBy("rank").collect()
    ]
    assert got == expected


def test_bpe_train_real_docs_and_early_stop(spark):
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    wc = Counter(
        w
        for r in docs.select("text").collect()
        for w in (r.text or "").split(" ")
        if w
    )
    expected = _py_bpe(wc, 4)
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(docs, "text", 4).orderBy("rank").collect()
    ]
    assert got == expected

    # early stop: single-char words have no pairs at all
    tiny = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_train(tiny, "text", 3).count() == 0

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(tiny, "text", 0)


def test_bpe_train_quote_and_special_chars(spark):
    # words containing single quotes exercise the literal-escaping path
    # in the merge expressions; punctuation exercises non-alpha symbols
    docs = [
        "don't don't don't can't",
        "o'clock o'clock don't",
        "a.b a.b a.b c,d",
    ]
    wc = Counter(w for t in docs for w in t.split(" ") if w)
    expected = _py_bpe(wc, 5)
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(df, "text", 5).orderBy("rank").collect()
    ]
    assert got == expected
    # the quote characters must survive into the learned merges
    assert any("'" in m[1] or "'" in m[2] or "'" in m[3] for m in got)


def test_bpe_train_backslash_words(spark):
    # a corpus word containing a backslash exercises the Spark-side
    # literal escaping (Spark SQL treats \ as an escape in string
    # literals; DuckDB does not) — the merge expressions must still
    # parse AND produce the same merges as the pure-Python reference
    docs = [
        r"a\b a\b a\b c\\d",
        r"a\b c\\d path\to path\to",
    ]
    wc = Counter(w for t in docs for w in t.split(" ") if w)
    expected = _py_bpe(wc, 4)
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(df, "text", 4).orderBy("rank").collect()
    ]
    assert got == expected
    assert any("\\" in m[3] for m in got)
