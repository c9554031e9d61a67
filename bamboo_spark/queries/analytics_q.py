"""Round-8 analytics additions: interval concurrency, attribution,
k-hop graph reach, bipartite projection, reconciliation DQ, cohort LTV,
hash-split A/B lift, robust (MAD) outliers, fingerprint-collision audit.

Same driver contract as every family module: each query is a
(Spark fn, DuckDB oracle) pair with aligned column names/types; scale
notes on each docstring say why the plan survives 100×."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from bamboo_spark.operators import dedup
from bamboo_spark.operators._cache import tracked_persist as _tracked_persist
from bamboo_spark.operators.text import (
    md5_int60_duck,
    md5_int60_sql,
    word_shingles_duck,
    word_shingles_sql,
)

from bamboo_spark.queries._core import load
from bamboo_spark._localdf import local_df as _local_df


# --------------------------------------------------------------- events


def q_events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per day: each event opens a 5-minute
    active window; the classic +1/−1 boundary sweep (running sum over
    sorted endpoints) gives the maximum number of simultaneously-open
    windows — the load-profile query behind capacity planning.

    Scale: the sweep needs a SORT, which would be a global single-key
    cliff — so it runs PER DAY PARTITION (window partitionBy day), the
    natural time-series shard: each day's endpoint list sorts
    independently, no cross-day state (windows are clipped to their
    start day by construction). Ties order (+1 before −1) so touching
    intervals count as overlapping in both engines."""
    win_us = 300 * 1_000_000
    e = load(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"),
        F.date_format("ts", "yyyy-MM-dd").alias("db"),
    )
    pts = e.select(
        "db", F.col("us").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        e.select(
            "db",
            (F.col("us") + F.lit(win_us)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("db")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("r", F.sum("delta").over(w))
    return (
        run.groupBy("db")
        .agg(
            F.max("r").cast("bigint").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_events"),
        )
        .select(
            F.col("db").alias("day_bucket"), "peak_concurrency", "n_events"
        )
        .orderBy("day_bucket")
    )


Q_CONCURRENCY_SQL = """
with ev as (
  select epoch_us(ts) us, strftime(ts, '%Y-%m-%d') db from events
),
pts as (
  select db, us t, 1 delta from ev
  union all
  select db, us + 300000000 t, -1 delta from ev
),
run as (
  select db, delta,
         sum(delta) over (
           partition by db order by t asc, delta desc
           rows between unbounded preceding and current row
         ) r
  from pts
)
select db as day_bucket, max(r)::BIGINT peak_concurrency,
       sum(case when delta = 1 then 1 else 0 end)::BIGINT n_events
from run group by db order by db
"""


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the SAME
    user's latest click within the preceding hour; revenue, conversion
    counts, and mean click→purchase lag roll up by the attributed
    click's hour-of-day (integer µs arithmetic — engine-exact;
    unattributed purchases land in bucket −1).

    Scale: the purchase↔click pairing is the bucketized range join
    (purchases probe 2 fixed epoch-hour buckets), never a per-user
    cross product; the last-touch pick is a map-combined ``max`` per
    purchase; the final rollup is a 25-row grid."""
    win_us = 3600 * 1_000_000
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        "value",
    )
    c = (
        e.where(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("c_us"))
        .withColumn("bucket", F.expr("c_us div %d" % win_us))
    )
    probes = p.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr("p_us div %d" % win_us),
                F.expr("p_us div %d - 1" % win_us),
            )
        ),
    )
    best = (
        probes.join(c, ["user_id", "bucket"])
        .where(
            (F.col("c_us") <= F.col("p_us"))
            & (F.col("c_us") > F.col("p_us") - win_us)
        )
        .groupBy("event_id")
        .agg(F.max("c_us").alias("c_us"))
    )
    att = p.join(best, "event_id", "left").select(
        F.coalesce(
            F.expr("pmod(c_us div 3600000000, 24)"), F.lit(-1)
        )
        .cast("bigint")
        .alias("att_hour"),
        "value",
        F.expr("(p_us - c_us) div 1000000").alias("lag_sec"),
    )
    return (
        att.groupBy("att_hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum("value"), 2).alias("attributed_revenue"),
            F.round(F.avg("lag_sec"), 3).alias("avg_lag_sec"),
        )
        .orderBy("att_hour")
    )


Q_ATTRIBUTION_SQL = """
with p as (
  select event_id, user_id, epoch_us(ts) p_us, value from events
  where event_type = 'purchase'
),
c as (
  select user_id, epoch_us(ts) c_us from events where event_type = 'click'
),
best as (
  select p.event_id, p.p_us, p.value, max(c.c_us) c_us
  from p left join c
    on c.user_id = p.user_id
   and c.c_us <= p.p_us and c.c_us > p.p_us - 3600000000
  group by p.event_id, p.p_us, p.value
)
select coalesce((c_us // 3600000000) % 24, -1)::BIGINT att_hour,
       count(*)::BIGINT n_conversions,
       round(sum(value), 2) attributed_revenue,
       round(avg((p_us - c_us) // 1000000), 3) avg_lag_sec
from best group by 1 order by 1
"""


# ---------------------------------------------------------------- graph


def q_dup_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reach on the near-duplicate graph: for each document, how
    many documents are within ≤2 edges — the blast-radius metric for a
    dedup decision (removing a high-reach doc's cluster touches far
    more corpus than its degree suggests). Top 20 by reach.

    Scale: symmetrized edge list, ONE self-equi-join for the 2-hop
    frontier, distinct, count — no BFS driver loop, no cartesian; the
    joins shuffle on node id, so skew follows hub degree. This oracle
    variant runs the pair builder LOSSLESS (``max_shingle_df=None``)
    so DuckDB's brute-force Jaccard matches exactly — the family-wide
    pattern (see dedup_q) — which means hot shingles are NOT capped
    here; the at-scale configuration passes a finite ``max_shingle_df``
    to bound hub degree before the self-join."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    sym = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    two = (
        sym.alias("e1")
        .join(sym.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
    )
    reach = (
        sym.unionAll(two)
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("reach_2hop"))
    )
    return (
        reach.select(F.col("src").alias("doc_id"), "reach_2hop")
        .orderBy(F.col("reach_2hop").desc(), F.col("doc_id"))
        .limit(20)
    )


def _dup_khop_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    return """
with pr as materialized (
{pairs}
),
sym as (
  select doc_a src, doc_b dst from pr
  union all
  select doc_b src, doc_a dst from pr
),
two as (
  select e1.src, e2.dst from sym e1 join sym e2 on e1.dst = e2.src
),
reach as (
  select src, count(distinct dst)::BIGINT reach_2hop from (
    select src, dst from sym
    union all
    select src, dst from two
  ) u
  where src <> dst
  group by src
)
select src doc_id, reach_2hop from reach
order by reach_2hop desc, doc_id limit 20
""".format(pairs=pairs.strip())


# ----------------------------------------------------------- relational


def q_supplier_coproduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection: the supplier–supplier co-supply graph
    (edge weight = parts both can supply, from the derived partsupp),
    top 25 pairs. The co-occurrence projection is the shape behind
    'users who bought X', co-citation, and co-curation graphs.

    Scale: partsupp groups by part (4 suppliers each), pairs via a
    bounded per-part combination (C(4,2)=6 rows per part — NEVER a
    data-sized cross join), then one count aggregate on (s1, s2)."""
    from bamboo_spark.queries.tpch import _partsupp

    ps = _partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    pairs = (
        ps.alias("x")
        .join(ps.alias("y"), "ps_partkey")
        .where(F.col("x.ps_suppkey") < F.col("y.ps_suppkey"))
        .select(
            F.col("x.ps_suppkey").alias("s1"),
            F.col("y.ps_suppkey").alias("s2"),
        )
    )
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_parts"))
        .orderBy(F.col("shared_parts").desc(), "s1", "s2")
        .limit(25)
    )


def _supplier_coproduction_duck() -> str:
    from bamboo_spark.queries.tpch import _PARTSUPP_DUCK

    return """
with {ps}
select x.ps_suppkey s1, y.ps_suppkey s2,
       count(*)::BIGINT shared_parts
from partsupp x join partsupp y
  on x.ps_partkey = y.ps_partkey and x.ps_suppkey < y.ps_suppkey
group by 1, 2
order by shared_parts desc, s1, s2 limit 25
""".format(ps=_PARTSUPP_DUCK.strip())


def q_reconciliation_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse reconciliation DQ: per order, the lineitem-computed
    total ``round(Σ extprice·(1−disc)·(1+tax), 2)`` vs the order
    header's ``o_totalprice``, rolled into relative-error bands (≤0.5%,
    ≤5%, >5%, no lineitems) — the fact-vs-header audit every pipeline
    runs after a backfill.

    Scale: one map-combined per-order aggregate over lineitem, one
    broadcast-sized band rollup; header join shuffles on orderkey."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("computed")
        )
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_totalprice", "computed"
    )
    band = F.when(F.col("computed").isNull(), "no_lineitems").otherwise(
        F.when(
            F.abs(F.col("computed") - F.col("o_totalprice"))
            <= 0.005 * F.col("o_totalprice"),
            "ok_0.5pct",
        )
        .when(
            F.abs(F.col("computed") - F.col("o_totalprice"))
            <= 0.05 * F.col("o_totalprice"),
            "warn_5pct",
        )
        .otherwise("bad_gt5pct")
    )
    agg = j.select(band.alias("band")).groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    total = agg.agg(F.sum("n_orders").alias("t"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "band",
            "n_orders",
            F.round(F.col("n_orders") / F.col("t"), 4).alias("pct"),
        )
        .orderBy("band")
    )


Q_RECONCILIATION_SQL = """
with li as (
  select l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           computed
  from lineitem group by l_orderkey
),
j as (
  select o.o_totalprice, li.computed
  from orders o left join li on li.l_orderkey = o.o_orderkey
),
b as (
  select case
    when computed is null then 'no_lineitems'
    when abs(computed - o_totalprice) <= 0.005 * o_totalprice
      then 'ok_0.5pct'
    when abs(computed - o_totalprice) <= 0.05 * o_totalprice
      then 'warn_5pct'
    else 'bad_gt5pct' end band
  from j
)
select band, count(*)::BIGINT n_orders,
       round(count(*) / (sum(count(*)) over ()), 4) pct
from b group by band order by band
"""


def q_cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value cohort matrix: customers cohorted by
    first-order month, revenue and order counts accumulated per
    (cohort, months-since-cohort) cell — the classic LTV triangle.
    Month math is INTEGER (year·12+month), identical in both engines.

    Scale: one min-aggregate per customer (map-combined), one
    broadcast-back join, one grid-sized (months²/2) rollup."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("midx"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("midx").alias("cidx"))
    j = o.join(first_m, "o_custkey")
    return (
        j.select(
            F.format_string(
                "%04d-%02d",
                F.expr("cidx div 12"),
                F.expr("cidx % 12 + 1"),
            ).alias("cohort_month"),
            (F.col("midx") - F.col("cidx")).cast("bigint").alias("age_months"),
            "o_totalprice",
        )
        .groupBy("cohort_month", "age_months")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .orderBy("cohort_month", "age_months")
    )


Q_COHORT_LTV_SQL = """
with o as (
  select o_custkey, o_totalprice,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 midx
  from orders
),
f as (select o_custkey, min(midx) cidx from o group by o_custkey)
select printf('%04d-%02d', cidx // 12, cidx % 12 + 1) cohort_month,
       (midx - cidx)::BIGINT age_months,
       round(sum(o_totalprice), 2) revenue,
       count(*)::BIGINT n_orders
from o join f using (o_custkey)
group by 1, 2 order by 1, 2
"""


def q_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split A/B readout: users assigned to arms by a
    CROSS-ENGINE-STABLE md5 hash of user_id (the same salt-free split a
    training-data ablation uses), conversion = any purchase event; one
    row with per-arm rates, absolute lift, and the two-proportion
    z-score. All floats derive from integer counts in a fixed
    expression order, rounded — engine-exact.

    Scale: two map-combined distinct-user aggregates and a 1-row
    combine; the hash split needs no coordination (stable everywhere,
    the property that matters for reproducible holdouts)."""
    e = load(spark, sf_dir, "events")
    arm = F.expr(
        "pmod(%s, 2)" % md5_int60_sql("cast(user_id as string)")
    )
    users = (
        e.select("user_id")
        .distinct()
        .withColumn("arm", arm)
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    j = users.join(conv.select("user_id", "is_conv"), "user_id", "left")
    g = j.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when((F.col("arm") == 0) & F.col("is_conv").isNotNull(), 1)
              .otherwise(0)).cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when((F.col("arm") == 1) & F.col("is_conv").isNotNull(), 1)
              .otherwise(0)).cast("bigint").alias("conv_b"),
    )
    # a saturated arm (p̂ pooled = 0 or 1) has a zero denominator — the
    # z-score is undefined there; NULL in both engines, never an error
    # (Spark runs ANSI: a plain divide would raise DIVIDE_BY_ZERO)
    stats = g.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("try_divide(cast(conv_a as double), n_a)").alias("pa"),
        F.expr("try_divide(cast(conv_b as double), n_b)").alias("pb"),
        F.expr(
            "try_divide(cast(conv_a + conv_b as double), n_a + n_b)"
        ).alias("pp"),
    ).withColumn(
        "denom",
        F.sqrt(
            F.col("pp")
            * (1 - F.col("pp"))
            * (
                F.expr("try_divide(1.0d, n_a)")
                + F.expr("try_divide(1.0d, n_b)")
            )
        ),
    )
    return stats.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round("pa", 6).alias("rate_a"),
        F.round("pb", 6).alias("rate_b"),
        F.round(F.col("pb") - F.col("pa"), 6).alias("lift"),
        F.when(
            F.col("denom") > 0,
            F.round((F.col("pb") - F.col("pa")) / F.col("denom"), 4),
        ).alias("z_score"),
    )


Q_AB_LIFT_SQL = """
with u as (
  select distinct user_id from events
),
arms as (
  select user_id, {arm} % 2 arm from u
),
c as (
  select distinct user_id from events where event_type = 'purchase'
),
j as (
  select a.arm, (c.user_id is not null)::INT is_conv
  from arms a left join c on c.user_id = a.user_id
),
g as (
  select
    sum(case when arm = 0 then 1 else 0 end)::BIGINT n_a,
    sum(case when arm = 0 then is_conv else 0 end)::BIGINT conv_a,
    sum(case when arm = 1 then 1 else 0 end)::BIGINT n_b,
    sum(case when arm = 1 then is_conv else 0 end)::BIGINT conv_b
  from j
),
st as (
  select n_a, conv_a, n_b, conv_b,
         conv_a / n_a pa, conv_b / n_b pb,
         (conv_a + conv_b) / (n_a + n_b) pp
  from g
),
d as (
  select *, sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) denom from st
)
select n_a, conv_a, n_b, conv_b,
       round(pa, 6) rate_a,
       round(pb, 6) rate_b,
       round(pb - pa, 6) lift,
       case when denom > 0 then round((pb - pa) / denom, 4) end z_score
from d
""".format(arm=md5_int60_duck("user_id::VARCHAR"))


def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median + MAD (median
    absolute deviation) of event value, and the count beyond the
    3·1.4826·MAD fence — the z-score variant that a heavy-tailed column
    doesn't break. The fence is rounded to 6 dp in BOTH engines before
    comparing, so an ulp of interpolation drift can't flip a borderline
    row.

    Scale: two grid-sized exact-percentile aggregates (types ≈ 5
    groups) with a broadcast join back — value rows shuffle once per
    pass, state is the per-group percentile buffer."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    fenced = dev.join(F.broadcast(mad), "event_type").withColumn(
        "fence", F.round(F.lit(3 * 1.4826) * F.col("mad"), 6)
    )
    return (
        fenced.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.col("fence"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


Q_OUTLIERS_MAD_SQL = """
with med as (
  select event_type, quantile_cont(value, 0.5) med
  from events group by event_type
),
dev as (
  select e.event_type, e.value, m.med, abs(e.value - m.med) adev
  from events e join med m using (event_type)
),
mad as (
  select event_type, quantile_cont(adev, 0.5) mad from dev
  group by event_type
),
f as (
  select d.event_type, d.adev, d.med, m.mad,
         round(3 * 1.4826 * m.mad, 6) fence
  from dev d join mad m using (event_type)
)
select event_type, count(*)::BIGINT n,
       round(any_value(med), 6) med,
       round(any_value(mad), 6) mad,
       sum(case when adev > fence then 1 else 0 end)::BIGINT n_outliers
from f group by event_type order by event_type
"""


# ------------------------------------------------------------------ text


def q_fingerprint_collision_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fingerprint-space audit: per source, distinct 3-word shingles vs
    distinct 60-bit md5 fingerprints of those shingles — observed
    collisions (distinct shingles − distinct hashes) against the
    birthday-bound expectation d²/2⁶¹. The sanity check behind every
    hash-fingerprinted dedup/contamination operator: it proves (with
    numbers, not faith) that 60-bit ids don't alias at corpus scale.

    Scale: shingles explode map-side and aggregate by (source, gram) —
    two count-distincts per source over the same exploded frame; no
    joins, no driver collection beyond the per-source grid."""
    d = load(spark, sf_dir, "documents").select("source", "text")
    sh = d.select(
        "source",
        F.explode(
            F.expr(word_shingles_sql("split(text, ' ')", 3))
        ).alias("gram"),
    ).withColumn("h", F.expr(md5_int60_sql("gram")))
    return (
        sh.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.countDistinct("gram").cast("bigint").alias("d_grams"),
            F.countDistinct("h").cast("bigint").alias("d_hashes"),
        )
        .select(
            "source",
            "n_grams",
            "d_grams",
            "d_hashes",
            (F.col("d_grams") - F.col("d_hashes"))
            .cast("bigint")
            .alias("n_collisions"),
            F.round(
                F.col("d_grams")
                * F.col("d_grams")
                / F.lit(float(2 ** 61)),
                8,
            ).alias("expected_collisions"),
        )
        .orderBy("source")
    )


def _fingerprint_audit_duck() -> str:
    sh = word_shingles_duck("string_split(\"text\", ' ')", 3)
    return """
with sh as (
  select source, unnest({sh}) gram from documents
),
h as (
  select source, gram, {h} h from sh
)
select source, count(*)::BIGINT n_grams,
       count(distinct gram)::BIGINT d_grams,
       count(distinct h)::BIGINT d_hashes,
       (count(distinct gram) - count(distinct h))::BIGINT n_collisions,
       round(count(distinct gram)::DOUBLE * count(distinct gram)
             / 2305843009213693952.0, 8) expected_collisions
from h group by source order by source
""".format(sh=sh, h=md5_int60_duck("gram"))


def q_attribution_position_based(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based (U-shaped) attribution: every purchase's credit
    splits 40/20/40 across the same user's clicks in the preceding
    hour — first touch 0.4, last touch 0.4, the middle split evenly
    (1 click takes 1.0, 2 take 0.5/0.5). Credited revenue and
    fractional conversions roll up by click hour-of-day. The
    multi-touch generalization of ``attribution_last_touch``; exact
    rational credits, rounded identically in both engines.

    Scale: same bucketized range join (2 probe buckets per purchase),
    then ONE purchase-keyed window pair (row_number + count — bounded
    per purchase, never global), and a 24-row rollup."""
    win_us = 3600 * 1_000_000
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_us"), "value"
    )
    c = (
        e.where(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("c_us"))
        .withColumn("bucket", F.expr("c_us div %d" % win_us))
    )
    probes = p.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr("p_us div %d" % win_us),
                F.expr("p_us div %d - 1" % win_us),
            )
        ),
    )
    hits = probes.join(c, ["user_id", "bucket"]).where(
        (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - win_us)
    )
    w = Window.partitionBy("event_id").orderBy("c_us")
    wn = Window.partitionBy("event_id")
    ranked = hits.select(
        "event_id",
        "value",
        "c_us",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rk") == 1, F.lit(0.4))
        .when(F.col("rk") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.select(
            F.expr("pmod(c_us div 3600000000, 24)")
            .cast("bigint")
            .alias("att_hour"),
            credit.alias("credit"),
            (credit * F.col("value")).alias("cv"),
        )
        .groupBy("att_hour")
        .agg(
            F.round(F.sum("credit"), 4).alias("credited_conversions"),
            F.round(F.sum("cv"), 2).alias("credited_revenue"),
        )
        .orderBy("att_hour")
    )


Q_ATTRIBUTION_POS_SQL = """
with p as (
  select event_id, user_id, epoch_us(ts) p_us, value from events
  where event_type = 'purchase'
),
c as (
  select user_id, epoch_us(ts) c_us from events where event_type = 'click'
),
hits as (
  select p.event_id, p.value, c.c_us
  from p join c
    on c.user_id = p.user_id
   and c.c_us <= p.p_us and c.c_us > p.p_us - 3600000000
),
ranked as (
  select event_id, value, c_us,
         row_number() over (partition by event_id order by c_us) rk,
         count(*) over (partition by event_id) n
  from hits
),
cr as (
  select (c_us // 3600000000) % 24 att_hour, value,
         case when n = 1 then 1.0
              when n = 2 then 0.5
              when rk = 1 then 0.4
              when rk = n then 0.4
              else 0.2 / (n - 2) end credit
  from ranked
)
select att_hour::BIGINT att_hour,
       round(sum(credit), 4) credited_conversions,
       round(sum(credit * value), 2) credited_revenue
from cr group by 1 order by 1
"""


_MRE_ITERS = 15


def q_attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov (removal-effect) attribution — the data-driven
    multi-touch model: user journeys (event sequences truncated at the
    first purchase) become a first-order chain with START / channel /
    conv / null states; each channel's credit is how much the
    START→conv absorption probability DROPS when that channel's state
    is removed (transitions into it redirected to null). Credits
    normalize into shares and split total purchase revenue.

    Determinism: absorption probabilities run as ``_MRE_ITERS``
    unrolled value-iteration steps in INTEGER nano-units with per-edge
    floor quantization — ``v'(s) = Σ_t floor(c(s,t)·val(t) div r(s))``
    — the ``markov_stationary``/``pagerank`` trick, so both engines
    land on identical longs (truncation beyond N steps is identical
    too, so parity holds by construction). int64 headroom: val ≤ 1e9,
    so per-edge counts up to ~9e9 are safe; beyond that the multiply
    needs decimal(38).

    Scale: ONE user-keyed window chain builds the journey edges;
    everything after is a (scenarios × |states|²) grid — ≤ a few
    hundred rows regardless of corpus size — iterated with lineage
    cuts. The only data-sized shuffle is the per-user lag."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    # first purchase per user (exact tie-break on event_id)
    firstp = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min(F.struct("us", "event_id")).alias("pk"),
        )
        .select(
            "user_id",
            F.col("pk.us").alias("p_us"),
            F.col("pk.event_id").alias("p_eid"),
        )
    )
    # NO broadcast hint on firstp: it is one row per CONVERTING USER —
    # users-sized, which a forced broadcast would driver-materialize
    # (OOM at 100×). The join key is user_id, the same key the journey
    # window below shuffles on, so AQE plans this as one user-keyed
    # exchange reused by the window.
    j = (
        e.join(firstp, "user_id", "left")
        .where(
            F.col("p_us").isNull()
            | (F.col("us") < F.col("p_us"))
            | ((F.col("us") == F.col("p_us"))
               & (F.col("event_id") <= F.col("p_eid")))
        )
        .withColumn(
            "cur",
            F.when(F.col("event_type") == "purchase", "conv").otherwise(
                F.col("event_type")
            ),
        )
    )
    j = _tracked_persist(j)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    edges1 = j.withColumn(
        "prev", F.coalesce(F.lag("cur").over(w), F.lit("START"))
    ).select(F.col("prev").alias("s"), F.col("cur").alias("t"))
    wd = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    edges2 = (
        j.where(F.col("p_us").isNull())  # non-converting journeys
        .withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select(F.col("cur").alias("s"), F.lit("null").alias("t"))
    )
    mat = (
        edges1.unionAll(edges2)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    totals = mat.groupBy("s").agg(F.sum("c").cast("long").alias("r"))
    mat = _tracked_persist(mat.join(totals, "s"))
    scen = mat.select(F.col("s").alias("ch")).where(
        F.col("ch") != "START"
    ).distinct().select(
        F.concat(F.lit("rm_"), F.col("ch")).alias("scenario"), "ch"
    ).unionAll(
        _local_df(spark, [("full", None)], "scenario string, ch string")
    )
    # consumed exactly once (the driver collect below) — no persist
    ms = (
        scen.crossJoin(mat).where(
            F.col("ch").isNull()
            | ((F.col("s") != F.col("ch")) & (F.col("t") != F.col("ch")))
        ).select("scenario", "s", "t", "c", "r")
    )
    # ---- value iteration ON THE DRIVER (r13 optimization): the grid is
    # (scenarios × |states|²) ≤ a few hundred rows REGARDLESS of corpus
    # size (states = event types + START/conv/null), so the 15 unrolled
    # supersteps were ~45 metadata-sized Spark jobs whose launch
    # overhead dwarfed their work. Collect the grid once and run the
    # identical integer recurrence in Python — Python ints are exact and
    # `(c * val) // r` on non-negative longs equals Spark's `div`, so
    # the fixpoint values are bit-identical to the distributed unroll
    # (oracle-parity-verified). This is the guide-§5-sanctioned driver
    # role: no data-sized work, only the bounded model state.
    from collections import defaultdict

    grid = ms.select("scenario", "s", "t", "c", "r").collect()
    edges_by_scen: dict = defaultdict(list)
    for g in grid:
        edges_by_scen[g["scenario"]].append(
            (g["s"], g["t"], int(g["c"]), int(g["r"]))
        )
    val: dict = {}
    for _ in range(_MRE_ITERS):
        new_val: dict = {}
        for scen_name, es in edges_by_scen.items():
            acc: dict = defaultdict(int)
            for s_st, t_st, c_n, r_n in es:
                if t_st == "conv":
                    tv = 1_000_000_000
                elif t_st == "null":
                    tv = 0
                else:
                    tv = val.get((scen_name, t_st), 0)
                acc[s_st] += (c_n * tv) // r_n
            for s_st, m in acc.items():
                new_val[(scen_name, s_st)] = m
        val = new_val
    p_rows = [
        (scen_name, val[(scen_name, "START")])
        for scen_name in sorted(edges_by_scen)
        if (scen_name, "START") in val
    ]
    p = _local_df(spark, p_rows, "scenario string, v long")
    fullp = p.where(F.col("scenario") == "full").select(
        F.col("v").alias("fp")
    )
    rev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).agg(F.sum("value").alias("tv"))
    eff = (
        p.where(F.col("scenario") != "full")
        .select(
            F.expr("substring(scenario, 4)").alias("channel"),
            F.col("v").alias("pv"),
        )
        .crossJoin(F.broadcast(fullp))
        .select("channel", (F.col("fp") - F.col("pv")).alias("re"), "fp")
    )
    wall = Window.partitionBy()
    out = eff.withColumn("sre", F.sum("re").over(wall)).crossJoin(
        F.broadcast(rev)
    )
    return out.select(
        "channel",
        F.when(
            F.col("fp") > 0, F.round(F.col("re") / F.col("fp"), 6)
        ).alias("removal_effect"),
        F.when(
            F.col("sre") > 0, F.round(F.col("re") / F.col("sre"), 6)
        ).alias("attribution_share"),
        F.when(
            F.col("sre") > 0,
            F.round(F.col("re") / F.col("sre") * F.col("tv"), 2),
        ).alias("attributed_revenue"),
    ).orderBy("channel")


def _attribution_markov_duck(iters: int = _MRE_ITERS) -> str:
    sql = """
with ev as materialized (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
fp as materialized (
  select user_id, min(us) p_us,
         min(event_id) filter (
           where us = (select min(u2.us) from ev u2
                       where u2.user_id = ev.user_id
                         and u2.event_type = 'purchase')
         ) p_eid
  from ev where event_type = 'purchase' group by user_id
),
j as materialized (
  select e.user_id, e.event_id, e.us,
         case when e.event_type = 'purchase' then 'conv'
              else e.event_type end cur,
         f.p_us
  from ev e left join fp f on f.user_id = e.user_id
  where f.p_us is null or e.us < f.p_us
     or (e.us = f.p_us and e.event_id <= f.p_eid)
),
e1 as (
  select coalesce(lag(cur) over (partition by user_id
                                 order by us, event_id), 'START') s,
         cur t
  from j
),
e2 as (
  select cur s, 'null' t from (
    select cur, row_number() over (partition by user_id
                                   order by us desc, event_id desc) rn
    from j where p_us is null
  ) where rn = 1
),
mat0 as materialized (
  select s, t, count(*)::BIGINT c
  from (select * from e1 union all select * from e2) group by 1, 2
),
tot as materialized (select s, sum(c)::BIGINT r from mat0 group by s),
scen as materialized (
  select 'rm_' || s scenario, s ch from (
    select distinct s from mat0 where s <> 'START'
  )
  union all
  select 'full', null
),
ms as materialized (
  select scen.scenario, m.s, m.t, m.c, tot.r
  from scen cross join mat0 m join tot on tot.s = m.s
  where scen.ch is null or (m.s <> scen.ch and m.t <> scen.ch)
),
v0 as materialized (
  select distinct scenario, s t, 0::BIGINT v from ms
)"""
    prev = "v0"
    for i in range(1, iters + 1):
        sql += """,
v{i} as materialized (
  select ms.scenario, ms.s t,
         sum((ms.c * case when ms.t = 'conv' then 1000000000
                          when ms.t = 'null' then 0
                          else coalesce(p.v, 0) end) // ms.r)::BIGINT v
  from ms left join {prev} p
    on p.scenario = ms.scenario and p.t = ms.t
  group by 1, 2
)""".format(i=i, prev=prev)
        prev = "v%d" % i
    sql += """,
pp as (select scenario, v from {last} where t = 'START'),
fullp as (select v fp from pp where scenario = 'full'),
eff as (
  select substring(scenario, 4) channel,
         (select fp from fullp) - v re,
         (select fp from fullp) fp
  from pp where scenario <> 'full'
),
rev as (select sum(value) tv from events where event_type = 'purchase')
select channel,
       case when fp > 0 then round(re / fp, 6) end removal_effect,
       case when (select sum(re) from eff) > 0
            then round(re / (select sum(re) from eff), 6)
       end attribution_share,
       case when (select sum(re) from eff) > 0
            then round(re / (select sum(re) from eff)
                       * (select tv from rev), 2)
       end attributed_revenue
from eff order by channel
""".format(last=prev)
    return sql
