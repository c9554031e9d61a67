"""Edit-distance similarity join: differential test vs a brute-force
pure-Python DP on randomized corpora (planted typos, exact dups, short
and empty keys), plus edge/validation cases and a plan audit."""

import random

import pytest
from pyspark.sql import functions as F

from bamboo_spark.operators.linkage import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, ka) in enumerate(rows):
        for ib, kb in rows[i + 1 :]:
            if ka is None or kb is None:
                continue
            if abs(len(ka) - len(kb)) > d:
                continue
            dist = _lev(ka, kb)
            if dist <= d:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, dist))
    return out


def _mutate(rng, s, n_edits):
    s = list(s)
    for _ in range(n_edits):
        op = rng.choice("ids") if s else "i"
        pos = rng.randrange(len(s) + (op == "i"))
        if op == "i":
            s.insert(pos, rng.choice("abcdef "))
        elif op == "d":
            del s[pos]
        else:
            s[pos] = rng.choice("abcdef ")
    return "".join(s)


@pytest.mark.parametrize("seed,d", [(7, 2), (11, 3), (13, 1), (17, 4)])
def test_edit_pairs_match_bruteforce_random(spark, seed, d):
    rng = random.Random(seed)
    base = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randrange(0, 40)))
        for _ in range(30)
    ]
    rows = []
    rid = 0
    for s in base:
        rows.append((rid, s))
        rid += 1
        # planted near-dup within d edits, and one just past d
        rows.append((rid, _mutate(rng, s, rng.randrange(0, d + 1))))
        rid += 1
        rows.append((rid, _mutate(rng, s, d + 1 + rng.randrange(3))))
        rid += 1
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "k", max_dist=d).collect()
    }
    assert got == _brute(rows, d)


def test_edit_pairs_null_and_exact_and_short(spark):
    rows = [
        (1, "hello world"),
        (2, "hello world"),  # exact dup -> dist 0
        (3, None),  # never matches
        (4, "ab"),  # shorter than q
        (5, "abc"),
        (6, ""),  # empty matches short keys within d
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "k", max_dist=2).collect()
    }
    assert got == _brute(rows, 2)
    assert (1, 2, 0) in got and (4, 5, 1) in got and (4, 6, 2) in got


def test_edit_pairs_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, "id", "k", max_dist=0)


def test_record_linkage_plan_no_cartesian(spark):
    from bamboo_spark import queries as q

    df = q.queries()["record_linkage"](spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _brute_cross(new_rows, corpus_rows, d):
    out = set()
    for ia, ka in new_rows:
        for ib, kb in corpus_rows:
            if ka is None or kb is None:
                continue
            if abs(len(ka) - len(kb)) > d:
                continue
            dist = _lev(ka, kb)
            if dist <= d:
                out.add((ia, ib, dist))
    return out


@pytest.mark.parametrize("seed,d", [(21, 2), (23, 3)])
def test_edit_join_matches_bruteforce_random(spark, seed, d):
    rng = random.Random(seed)
    corpus = []
    for i in range(50):
        corpus.append(
            (i, "".join(rng.choice("abcde ") for _ in range(rng.randrange(0, 30))))
        )
    new_rows = []
    for j in range(40):
        base = rng.choice(corpus)[1]
        new_rows.append((j, _mutate(rng, base, rng.randrange(0, d + 3))))
    ndf = spark.createDataFrame(new_rows, "id long, k string")
    cdf = spark.createDataFrame(corpus, "id long, k string")
    from bamboo_spark.operators.linkage import edit_distance_join

    got = {
        (r.id_new, r.id_corpus, r.dist)
        for r in edit_distance_join(ndf, cdf, "id", "k", max_dist=d).collect()
    }
    assert got == _brute_cross(new_rows, corpus, d)


def test_edit_pairs_unicode_codepoint_semantics(spark):
    # levenshtein must count CODEPOINTS (matching the pure-Python DP),
    # not bytes — multibyte keys exercise the whole pipeline
    rows = [
        (1, "héllo wörld"),
        (2, "hèllo wörld"),   # 1 substitution
        (3, "héllo wörld!!"), # 2 insertions
        (4, "naïve café"),
        (5, "naive cafe"),    # 2 substitutions
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "k", max_dist=2).collect()
    }
    assert got == _brute(rows, 2)
    assert (1, 2, 1) in got and (1, 3, 2) in got and (4, 5, 2) in got


def test_user_trajectory_hot_user_bounded_and_correct(spark, tmp_path):
    # a pathological "bot" user with many events: only its 32
    # time-earliest events may shape the trajectory, and the result must
    # equal the Python reference computed on exactly that prefix
    import datetime

    from bamboo_spark import queries as q

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # bot: 500 events, event types cycle a/b/c/d -> trajectory is the
    # first 32 by (ts, event_id)
    for i in range(500):
        rows.append(
            (eid, base + datetime.timedelta(seconds=i), 1, "abcd"[i % 4] + "x", 0.0, "{}")
        )
        eid += 1
    # twin bot: same first-32 cadence (pairs with user 1 at distance 0)
    for i in range(40):
        rows.append(
            (eid, base + datetime.timedelta(seconds=i), 2, "abcd"[i % 4] + "y", 0.0, "{}")
        )
        eid += 1
    # unrelated user: constant type (distance > 3 from the bots)
    for i in range(40):
        rows.append(
            (eid, base + datetime.timedelta(seconds=i), 3, "zzz", 0.0, "{}")
        )
        eid += 1
    sdf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sdf.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = [
        (r.id_a, r.id_b, r.dist)
        for r in q.q_user_trajectory_pairs(spark, str(tmp_path)).collect()
    ]
    # both bots share the exact 32-step prefix "abcd"*8 -> distance 0;
    # user 3's "z"*32 is 24+ edits away from either
    assert got == [(1, 2, 0)]
