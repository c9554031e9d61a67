"""Relational pass-through surface on Dataset (SURVEY §7.5): thin,
Catalyst-planned delegations."""

from pyspark.sql import functions as F

from bamboo_spark import Dataset, from_object


def test_filter_select_orderby(spark):
    ds = from_object([{"a": i, "b": i % 2} for i in range(10)])
    out = (
        ds.where(F.col("b") == 0)
        .select("a")
        .order_by(F.col("a").desc())
        .limit(2)
        .df.collect()
    )
    assert [r.a for r in out] == [8, 6]


def test_join_and_setops(spark):
    left = from_object([{"k": 1, "x": "a"}, {"k": 2, "x": "b"}])
    right = from_object([{"k": 2, "y": "z"}])
    joined = left.join(right, "k").df
    assert joined.count() == 1
    u = left.select("k").union(right.select("k")).distinct().df
    assert sorted(r.k for r in u.collect()) == [1, 2]
    s = left.select("k").subtract(right.select("k")).df
    assert [r.k for r in s.collect()] == [1]


def test_groupby_agg(spark):
    ds = from_object([{"g": i % 3, "v": float(i)} for i in range(9)])
    rows = (
        ds.group_by("g").agg(F.sum("v").alias("s")).orderBy("g").collect()
    )
    assert [r.s for r in rows] == [9.0, 12.0, 15.0]


def test_navigation_still_works_with_getitem(spark):
    ds = from_object({"select": {"inner": 1}})
    pdf = ds["select"].flatten().to_pandas()
    assert list(pdf["inner"]) == [1]


def test_approx_sketches_error_bounds(spark):
    # q_approx_sketches has no DuckDB oracle by design (sketches are
    # engine-specific); bound HLL++ and quantile-sketch error against
    # the exact answers instead
    from pyspark.sql import functions as F

    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    approx = {r["o_orderpriority"]: r for r in q.q_approx_sketches(spark, sf).collect()}
    o = q.load(spark, sf, "orders")
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, a in approx.items():
        e = exact[k]
        assert abs(a["approx_customers"] - e["customers"]) <= 0.1 * e["customers"] + 2
        assert abs(a["approx_median_price"] - e["median_price"]) <= 0.05 * e["median_price"]


def test_unigram_surprisal_top_v_semantics(spark):
    # capped-vocab mode: with top_v >= |vocab| the result equals the
    # full-vocab gate form; with a small cap, docs made of out-of-vocab
    # tokens score exactly the OOV floor ln(1/total)
    import math

    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    full = {r["doc_id"]: r for r in q.q_unigram_surprisal(spark, sf).collect()}
    wide = {
        r["doc_id"]: r
        for r in q.q_unigram_surprisal(spark, sf, top_v=10**6).collect()
    }
    assert set(full) == set(wide)
    for k in full:
        assert full[k]["n_tokens"] == wide[k]["n_tokens"]
        assert abs(full[k]["lp_mean"] - wide[k]["lp_mean"]) < 1e-9

    capped = q.q_unigram_surprisal(spark, sf, top_v=5)
    tok = q.load(spark, sf, "documents").selectExpr(
        "doc_id", "explode(split(text, ' ')) as t"
    )
    total = tok.count()
    top5 = {
        r["t"]
        for r in tok.groupBy("t")
        .count()
        .orderBy(F.col("count").desc(), F.col("t").asc())
        .limit(5)
        .collect()
    }
    floor = round(math.log(1.0 / total), 9)
    # a doc with zero in-vocab tokens must sit exactly at the floor
    oov_docs = {
        r["doc_id"]
        for r in tok.groupBy("doc_id")
        .agg(F.max(F.col("t").isin(top5).cast("int")).alias("any_iv"))
        .where("any_iv = 0")
        .collect()
    }
    got = {r["doc_id"]: r["lp_mean"] for r in capped.collect()}
    for d in oov_docs:
        assert abs(got[d] - round(floor, 6)) < 1e-6, (d, got[d], floor)


def test_table_profile_approx_mode(spark):
    # the 100 TB monitoring twin: HLL distinct counts within rsd-bound
    # error of the exact profile, same schema, and a plan with no
    # Expand node (the exact multi-distinct's row x N_cols blowup)
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    exact = q.q_table_profile(spark, sf).collect()[0]
    approx_df = q.q_table_profile(spark, sf, approx=True, rsd=0.02)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    a = approx_df.collect()[0]
    assert set(a.asDict()) == set(exact.asDict())
    assert a["n_rows"] == exact["n_rows"]
    for c in ("user_id", "event_type", "value"):
        assert a["%s_nulls" % c] == exact["%s_nulls" % c]
        err = abs(a["%s_distinct" % c] - exact["%s_distinct" % c])
        assert err <= 0.1 * exact["%s_distinct" % c] + 2


def test_gopher_filter_reasons(spark):
    from bamboo_spark.operators.text import gopher_filter

    docs = spark.createDataFrame(
        [
            # 2 words -> too_few_words; also low diversity is NOT
            # triggered (distinct ratio 1.0); quality low (short, no
            # stopwords) -> low_quality too
            (1, "alpha beta"),
            # 40 distinct-ish words incl stopwords, mean len in range
            (2, "the and for with that " + " ".join("w%d" % i for i in range(35))),
            # heavy repetition -> low_diversity
            (3, " ".join(["dup"] * 60)),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert "too_few_words" in out[1]["drop_reasons"]
    assert out[1]["keep"] == 0
    assert out[2]["keep"] == 1 and out[2]["drop_reasons"] == ""
    assert "low_diversity" in out[3]["drop_reasons"]


def test_dsir_top_v_full_vocab_equals_exact(spark):
    # with top_v >= |vocab| the capped path must equal the closed form
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: r["dsir_logw"]
        for r in q.q_dsir_weights(spark, sf).collect()
    }
    capped = {
        r["doc_id"]: r["dsir_logw"]
        for r in q.q_dsir_weights(spark, sf, top_v=10**6).collect()
    }
    assert exact == capped


def test_dsir_target_docs_score_higher(spark):
    # sanity: the target-domain (en) docs should average a higher
    # importance weight than non-target docs
    from pyspark.sql import functions as F

    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    d = q.load(spark, sf, "documents").select("doc_id", "lang")
    w = q.q_dsir_weights(spark, sf).join(d, "doc_id")
    rows = (
        w.groupBy(F.col("lang") == "en")
        .agg(F.avg(F.col("dsir_logw") / F.col("n_tokens")).alias("m"))
        .collect()
    )
    m = {r[0]: r["m"] for r in rows}
    assert m[True] > m[False]


def test_bigram_surprisal_top_v_semantics(spark):
    # with top_v >= |bigram vocab| the capped path equals the closed
    # form; with a tiny cap, OOV bigrams score the unigram backoff
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    full = {r["doc_id"]: r for r in q.q_bigram_surprisal(spark, sf).collect()}
    wide = {
        r["doc_id"]: r
        for r in q.q_bigram_surprisal(spark, sf, top_v=10**6).collect()
    }
    assert set(full) == set(wide)
    for k in full:
        assert full[k]["n_bigrams"] == wide[k]["n_bigrams"]
        assert abs(full[k]["lp_mean"] - wide[k]["lp_mean"]) < 1e-9

    capped = {
        r["doc_id"]: r
        for r in q.q_bigram_surprisal(spark, sf, top_v=10).collect()
    }
    # same docs, generally lower (more surprising) scores under backoff
    assert set(capped) == set(full)
    worse = sum(
        1 for k in full if capped[k]["lp_mean"] <= full[k]["lp_mean"] + 1e-9
    )
    assert worse >= 0.9 * len(full)


def test_approx_modes_within_error_bounds(spark):
    # the 100 TB approx modes (mergeable sketches instead of
    # buffer-everything exact percentiles) must land near their exact
    # twins: quantile values within the t-digest accuracy at 10k, and
    # decile assignment counts shifting only at bucket boundaries
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"

    ex = q.q_conversion_lag(spark, sf).collect()[0]
    ap = q.q_conversion_lag(spark, sf, approx=True).collect()[0]
    assert ap.n_converted == ex.n_converted
    # approx_percentile is nearest-rank (an actual element), exact is
    # interpolated — with few converted users the values differ, but
    # the RANKS must sandwich: each approx quantile sits between the
    # exact quantiles one step below/above its target
    assert ap.p50_sec <= ap.p90_sec <= ap.p99_sec
    assert 0 <= ap.p50_sec <= ex.p90_sec
    assert ex.p50_sec <= ap.p90_sec <= ex.p99_sec * 1.5
    assert ap.p99_sec >= ex.p90_sec

    exo = {r.event_type: r for r in q.q_value_outliers(spark, sf).collect()}
    apo = {
        r.event_type: r
        for r in q.q_value_outliers(spark, sf, approx=True).collect()
    }
    assert set(exo) == set(apo)
    for t in exo:
        assert apo[t].n == exo[t].n
        for c in ("q1", "median", "q3"):
            assert abs(apo[t][c] - exo[t][c]) <= max(
                0.1 * abs(exo[t][c]), 0.5
            ), (t, c)

    exp = {r.p_brand: r for r in q.q_price_quantiles(spark, sf).collect()}
    app = {
        r.p_brand: r
        for r in q.q_price_quantiles(spark, sf, approx=True).collect()
    }
    assert set(exp) == set(app)
    for b in exp:
        assert app[b].n_parts == exp[b].n_parts
        for c in ("median_price", "p90_price"):
            assert abs(app[b][c] - exp[b][c]) <= max(
                0.1 * abs(exp[b][c]), 50.0
            ), (b, c, app[b][c], exp[b][c])

    exd = {(r.source, r.decile): r.n for r in q.q_quality_deciles(spark, sf).collect()}
    apd = {
        (r.source, r.decile): r.n
        for r in q.q_quality_deciles(spark, sf, approx=True).collect()
    }
    # total docs preserved; per-cell drift bounded (boundary shifts only)
    assert sum(exd.values()) == sum(apd.values())
    n_total = sum(exd.values())
    drift = sum(abs(apd.get(k, 0) - exd.get(k, 0)) for k in set(exd) | set(apd))
    assert drift <= max(0.2 * n_total, 8), drift


def test_orders_rfm_approx_mode(spark):
    # the 100 TB mode: mergeable approx_percentile cutoffs instead of
    # the single-reducer exact percentile. Terciles only shift where a
    # customer sits exactly at a cutoff, so the 27-cell counts must
    # agree up to boundary drift and preserve the customer total
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    ex = {(r.r, r.f, r.m): r.n_customers for r in q.q_orders_rfm(spark, sf).collect()}
    ap = {
        (r.r, r.f, r.m): r.n_customers
        for r in q.q_orders_rfm(spark, sf, approx=True).collect()
    }
    assert sum(ex.values()) == sum(ap.values())
    n_total = sum(ex.values())
    drift = sum(abs(ap.get(k, 0) - ex.get(k, 0)) for k in set(ex) | set(ap))
    assert drift <= max(0.2 * n_total, 8), drift
    # the approx plan must NOT contain the exact percentile aggregate
    s = q.q_orders_rfm(spark, sf, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in s or "ApproximatePercentile" in s


def test_events_gap_histogram_integer_buckets(spark):
    # buckets at exact powers of two and their +-1 neighbors: integer
    # bit-length math, no float log2 — both engines must agree
    import duckdb

    rows = []
    for k in (0, 1, 5, 20, 40):
        p = 1 << k
        for g in (p - 1, p, p + 1):
            if g > 0:
                rows.append(g)
    sdf = spark.createDataFrame([(g,) for g in rows], "gap_s long")
    got = {
        r.gap_s: r.bucket
        for r in sdf.selectExpr(
            "gap_s",
            "case when gap_s <= 0 then -1"
            " else cast(length(bin(gap_s)) - 1 as int) end bucket",
        ).collect()
    }
    con = duckdb.connect()
    want = {
        g: con.sql(
            "select case when %d <= 0 then -1"
            " else (length(bin(%d)) - 1)::INT end" % (g, g)
        ).fetchone()[0]
        for g in rows
    }
    con.close()
    assert got == want
    # and both equal the mathematical floor(log2)
    for g in rows:
        assert got[g] == g.bit_length() - 1, (g, got[g])


def test_lang_nb_classifier_properties(spark):
    # resubstitution accuracy on the synthetic corpus: langs have
    # disjoint-ish token distributions, so the diagonal must dominate
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.q_lang_nb_confusion(spark, sf).collect()
    total = sum(r.n_docs for r in rows)
    n_docs = spark.read.parquet(sf + "/documents.parquet").count()
    # every doc classified exactly once (the synthetic corpus's lang
    # labels share one vocab, so accuracy is chance there — the
    # separability check runs on the fixture below)
    assert total == n_docs
    labels = {r.true_lang for r in rows}
    assert {r.pred_lang for r in rows} <= labels

    # on a token-separable fixture the classifier must be perfect
    import tempfile

    fix = [
        (1, "aa", "alpha beta beta gamma"),
        (2, "aa", "beta alpha alpha"),
        (3, "bb", "delta epsilon delta"),
        (4, "bb", "epsilon epsilon delta zeta"),
        (5, "aa", "gamma alpha beta"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            fix, "doc_id long, lang string, text string"
        ).coalesce(1).write.parquet(td + "/documents.parquet")
        sep = q.q_lang_nb_confusion(spark, td).collect()
        got = {(r.true_lang, r.pred_lang): r.n_docs for r in sep}
        assert got == {("aa", "aa"): 3, ("bb", "bb"): 2}

    # top_v caps the vocab (OOV floor per class) — still a valid
    # classifier, predictions over the same label set
    capped = q.q_lang_nb_confusion(spark, sf, top_v=20).collect()
    assert sum(r.n_docs for r in capped) == total
    assert {r.pred_lang for r in capped} <= {r.true_lang for r in rows}

    # plan discipline: scores are integer sums + max(struct) argmax —
    # no window in the whole composed plan
    s = (
        q.q_lang_nb_confusion(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in s


def test_rollup_incremental_merge_is_exercised(spark):
    # the cutoff lands mid-day, so the boundary day must have partials
    # on BOTH sides — the merge is a real sum, not a disjoint union
    from pyspark.sql import functions as F

    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    e = q.load(spark, sf, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("us"),
    )
    mx = e.agg(F.max("us").alias("m")).collect()[0].m
    cut = mx - 7 * 86400 * 1_000_000
    both = (
        e.withColumn("new", F.col("us") >= F.lit(cut))
        .groupBy("day")
        .agg(F.countDistinct("new").alias("sides"))
        .where(F.col("sides") == 2)
        .count()
    )
    assert both >= 1  # at least the boundary day straddles the cut
    # and the merged rollup equals the one-pass aggregate (also the
    # oracle's statement, asserted here in-engine for the test suite)
    merged = q.q_rollup_incremental(spark, sf)
    direct = (
        q.load(spark, sf, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("cast(round(value * 1e6, 0) as bigint)"))
            .cast("bigint")
            .alias("total_v_u"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("first_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("last_us"),
        )
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_data_mixture_plan_invariants(spark):
    from bamboo_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.q_data_mixture_plan(spark, sf).collect()
    assert len(rows) >= 2
    total_tokens = sum(r.n_tokens for r in rows)
    budget = total_tokens // 10
    # never allocate more than available, nor exceed the global budget
    assert all(0 <= r.alloc_tokens <= r.n_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) <= budget
    # temperature sampling: smaller sources get a HIGHER sampling rate
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    rates = [r.sample_rate for r in by_size]
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:]))


def test_dq_rules_catch_violations(spark):
    # synthetic frame with KNOWN violations of every rule kind
    from bamboo_spark.operators import dq

    df = spark.createDataFrame(
        [
            (1, "A", 10.0, "ok"),
            (2, None, -5.0, "ok"),       # null key, negative value
            (3, "B", 20.0, "bad word"),  # regexp violation
            (3, "C", 30.0, "ok"),        # duplicate id
            (4, "Z", 40.0, "ok"),        # Z not in allow-list, orphan ref
        ],
        "id long, k string, v double, s string",
    )
    ref = spark.createDataFrame([("A",), ("B",), ("C",)], "key string")
    rules = [
        dq.not_null("k"),
        dq.in_range("v", 0.0, 100.0),
        dq.regexp("s", "[a-z]+"),
        dq.in_set("k", ["A", "B", "C"]),
        dq.unique("id"),
        dq.references("k", ref, "key"),
    ]
    got = {r.rule: (r.n_violations, r.pass_ if hasattr(r, "pass_") else r["pass"]) for r in dq.dq_report(df, rules).collect()}
    assert got["not_null(k)"] == (1, 0)
    assert got["range(v,[0.0,100.0])"] == (1, 0)
    assert got["regexp(s)"] == (1, 0)
    assert got["in_set(k)"] == (1, 0)
    assert got["unique(id)"] == (2, 0)   # both rows of the dup group
    assert got["references(k->key)"] == (1, 0)

    # one-pass discipline: the row-level rules produce ONE aggregate —
    # a single scan of the input in the plan
    row_only = dq.dq_report(df, rules[:4])
    s = row_only._jdf.queryExecution().executedPlan().toString()
    assert s.count("ExistingRDD") == 1, s

    # clean table passes everything
    clean = dq.dq_report(ref, [dq.not_null("key"), dq.unique("key")])
    assert all(r["pass"] == 1 for r in clean.collect())


def test_audio_window_features_linear_on_long_doc(spark, tmp_path):
    # regression pin for the O(frames^2) form (array_max inside a
    # per-frame lambda + slice rebuilt per pair step): a 120k-sample
    # doc has ~7.5k frames — quadratic is ~56M lambda evals per
    # expression and visibly hangs; the single-pass form finishes in
    # seconds. Values are cross-checked exactly on a small prefix.
    import os
    import time

    from bamboo_spark.queries import q_audio_window_features

    rnd_text = "".join(
        "abcdefghijklmnopqrstuvwxyz"[(i * i + 3 * i) % 26]
        for i in range(120_000)
    )
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, rnd_text), (2, rnd_text[:64])], "doc_id long, text string"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    t0 = time.time()
    rows = {
        r["doc_id"]: r.asDict()
        for r in q_audio_window_features(spark, d).collect()
    }
    assert time.time() - t0 < 60, "quadratic frame work is back"
    assert rows[1]["n_frames"] == (120_000 - 32) // 16 + 1
    # exact value check on the short doc: frames at offsets 0 and 16
    s = [ord(c) - 96 for c in rnd_text[:64]]
    frames = [s[off : off + 32] for off in (0, 16, 32)]
    energies = [sum(x * x for x in f) for f in frames]
    zcr = sum(
        1
        for f in frames
        for i in range(1, 32)
        if (f[i - 1] > 0) != (f[i] > 0) and f[i - 1] != 0 and f[i] != 0
    )
    assert rows[2]["n_frames"] == 3
    assert rows[2]["peak_energy"] == max(energies)
    assert rows[2]["peak_frame"] == energies.index(max(energies))
    assert rows[2]["total_zcr"] == zcr


def test_pareto_frontier_guard_fires_on_anti_correlated(spark, tmp_path):
    # anti-correlated axes (revenue UP => delay UP) put every supplier
    # on the frontier — the bucket prune cannot help (intrinsic to
    # exact skylines), so the survivor guard must fail loudly instead
    # of planning a near-global sorted window
    import os

    import pytest as _pt

    from bamboo_spark.queries import q_pareto_frontier

    n = 64
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [
            (i, i, float(100 + 10 * i), 0.0, "1995-01-%02d" % (i % 28 + 1))
            for i in range(n)
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_discount double, l_shipdate string",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(i, "1995-01-01") for i in range(n)],
        "o_orderkey long, o_orderdate string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    # delay grows with revenue: shipdate day = i % 28 + 1 isn't enough;
    # rebuild with delay strictly increasing in revenue
    import shutil

    shutil.rmtree(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [
            (i, i, float(100 + 10 * i), 0.0, "1995-%02d-%02d" % (i // 28 + 1, i % 28 + 1))
            for i in range(n)
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_discount double, l_shipdate string",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    with _pt.raises(RuntimeError, match="max_survivors"):
        q_pareto_frontier(spark, d, max_survivors=10).collect()
    # and with the guard raised, the exact frontier is the full set
    out = q_pareto_frontier(spark, d, max_survivors=10_000)
    assert out.count() == n
