"""General relational analytics: flatten/JSON access, set ops, rollup/cube/grouping sets, quantiles, window analytics, range buckets.

Split from the original single-module registry (round 7); behavior is
identical -- the package ``__init__`` stitches one shared namespace so
cross-family references resolve exactly as in the single module.
"""

from __future__ import annotations

import functools as _functools
import math  # noqa: F401 — used by registry helpers

from bamboo_spark.operators._num import round_half_away as _round_half_away

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from bamboo_spark.operators import bpe, dedup, multimodal, pack, scale, similarity, text
from bamboo_spark.operators._cache import (
    release_caches as _release_caches,
    tracked_persist as _tracked_persist,
)

from bamboo_spark.queries._core import TABLES, load  # noqa: F401
from bamboo_spark._localdf import local_df as _local_df


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function shape: per-nation top-3 by balance. Single
    shuffle on the partition key; rank ties broken by key for
    determinism."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select(
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            "rank",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


Q_TOP_CUSTOMERS_SQL = """
select c_nationkey::BIGINT nationkey, rank::BIGINT rank, c_custkey,
       round(c_acctbal, 2) acctbal
from (
  select *, row_number() over (partition by c_nationkey
                               order by c_acctbal desc, c_custkey asc) rank
  from customer
)
where rank <= 3
order by nationkey, rank
"""


def q_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


Q_ORDERS_PRIORITY_SQL = """
select o_orderpriority,
       count(*) n_orders,
       round(avg(o_totalprice), 4) avg_price,
       count(distinct o_custkey) n_customers
from orders
group by o_orderpriority
order by o_orderpriority
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join + two-level aggregation — the
    distribution of orders-per-customer including zero-order customers
    (the left outer join is the point; an inner join silently drops
    them). Two shuffles: custkey, then the count histogram."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col) skips nulls
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q_ORDER_DIST_SQL = """
select c_count, count(*) custdist
from (
  select c_custkey, count(o_orderkey) c_count
  from customer left outer join orders on c_custkey = o_custkey
  group by c_custkey
)
group by c_count
order by custdist desc, c_count desc
"""


def q_big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING shape (TPC-H Q18 core): orders whose total
    quantity exceeds a threshold. HAVING is a post-aggregate filter —
    it cannot push below the aggregation, but the aggregate itself is
    map-side combinable so the filter sees one row per group."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )


Q_BIG_ORDERS_SQL = """
select l_orderkey, round(sum(l_quantity), 2) total_qty
from lineitem
group by l_orderkey
having round(sum(l_quantity), 2) > 150
order by total_qty desc, l_orderkey
"""


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside
    SUM) — per line status, how many high- vs low-priority order lines
    shipped. The CASE rides inside the map-side partial aggregate, so
    both counters come out of one shuffle."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("bigint").alias("high_line_count"),
            F.sum(1 - high).cast("bigint").alias("low_line_count"),
        )
    )


Q_SHIPMODE_SQL = """
select l_linestatus,
       sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 1 else 0 end)::BIGINT high_line_count,
       sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 0 else 1 end)::BIGINT low_line_count
from lineitem join orders on l_orderkey = o_orderkey
group by l_linestatus order by l_linestatus
"""


def q_setops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation surface: purchasers who never hit an error."""
    e = load(spark, sf_dir, "events")
    purchasers = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = e.where(F.col("event_type") == "error").select("user_id").distinct()
    return purchasers.subtract(erroring)


Q_SETOPS_SQL = """
select distinct user_id from events where event_type = 'purchase'
except
select distinct user_id from events where event_type = 'error'
order by user_id
"""


def q_flatten_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flatten operator over real array data: posexplode ≈
    bamboo's list flatten with position (GenerateExec, no Python)."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 5)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )


Q_FLATTEN_EMB_SQL = """
select vec_id, (i - 1)::BIGINT pos, round(embedding[i]::DOUBLE, 6) val
from (
  select vec_id, embedding, unnest(generate_series(1, len(embedding))) i
  from embeddings where vec_id < 5
)
"""


def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column: parse the JSON props payload, bucket by
    the extracted field — the from_json ingestion path applied to a
    column instead of a document."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q_EVENTS_PROPS_SQL = """
select (json_extract_string(props, '$.k')::BIGINT) % 10 k_bucket, count(*) n
from events group by 1 order by k_bucket
"""


def q_flatten_lineitem_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten throughput at table scale: explode a 4-wide measure
    array over every lineitem row (sf0.1 → 2.4M output rows). This is
    the engine twin of the reference's F10 flatten perf gate
    (pbd_tests.py:58-60, 1M rows < 1 s): GenerateExec inside
    whole-stage codegen, no shuffle — output rows stream straight from
    the scan."""
    l = load(spark, sf_dir, "lineitem")
    measures = F.array("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.posexplode(measures).alias("pos", "val"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("val").cast("double"), 4).alias("val"),
    )


Q_FLATTEN_WIDE_SQL = """
select l_orderkey, l_linenumber,
       unnest([0, 1, 2, 3])::BIGINT pos,
       round(unnest([l_quantity, l_extendedprice, l_discount, l_tax])::DOUBLE, 4) val
from lineitem
"""


def q_semi_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join surface: per-brand counts of parts that DO ship
    (left semi against lineitem) and parts that never shipped (left
    anti). Both plan as one shuffle each on partkey with the join
    reduced map-side; no row explosion — the semi/anti forms never
    duplicate the left side, which is the point at 100 TB (an inner
    join + distinct would shuffle the full match multiplicity).
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").select("l_partkey")
    shipped = p.join(l, p.p_partkey == l.l_partkey, "left_semi")
    never = p.join(l, p.p_partkey == l.l_partkey, "left_anti")
    agg = lambda df, name: df.groupBy("p_brand").agg(  # noqa: E731
        F.count(F.lit(1)).alias(name)
    )
    return (
        agg(shipped, "n_shipped")
        .join(agg(never, "n_never"), "p_brand", "full_outer")
        .select(
            "p_brand",
            F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
            F.coalesce("n_never", F.lit(0)).alias("n_never"),
        )
    )


Q_SEMI_ANTI_SQL = """
with shipped as (
  select p_brand, count(*) n_shipped from part
  where p_partkey in (select l_partkey from lineitem)
  group by p_brand
),
never as (
  select p_brand, count(*) n_never from part
  where p_partkey not in (select l_partkey from lineitem)
  group by p_brand
)
select coalesce(s.p_brand, n.p_brand) p_brand,
       coalesce(n_shipped, 0) n_shipped,
       coalesce(n_never, 0) n_never
from shipped s full outer join never n on s.p_brand = n.p_brand
order by p_brand
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate surface: ROLLUP over (returnflag,
    linestatus) — subtotals and a grand total in one pass. Spark plans
    this as Expand (one row per grouping set) + a single hash
    aggregate: one shuffle regardless of hierarchy depth.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


Q_ROLLUP_SQL = """
select coalesce(l_returnflag, 'ALL') returnflag,
       coalesce(l_linestatus, 'ALL') linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
       count(*) n_rows
from lineitem
group by rollup (l_returnflag, l_linestatus)
order by returnflag, linestatus
"""


def q_price_quantiles(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Exact quantile surface: per-brand median/p90 of part retail
    price via ``percentile`` (exact, interpolated — matches DuckDB's
    ``quantile_cont``). ``approx=True`` is the 100 TB mode
    (``approx_percentile``: mergeable sketch, map-side partials —
    error-bound-tested in pytest; exact mode stays the oracle-gated
    one)."""
    p = load(spark, sf_dir, "part")
    pf = (
        "approx_percentile(p_retailprice, %s, 10000)"
        if approx
        else "percentile(p_retailprice, %s)"
    )
    return (
        p.groupBy("p_brand")
        .agg(
            F.round(F.expr(pf % "0.5"), 4).alias("median_price"),
            F.round(F.expr(pf % "0.9"), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


Q_QUANTILES_SQL = """
select p_brand,
       round(quantile_cont(p_retailprice, 0.5), 4) median_price,
       round(quantile_cont(p_retailprice, 0.9), 4) p90_price,
       count(*) n_parts
from part group by p_brand order by p_brand
"""


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beside the rollup/cube twins): per-flag,
    per-status, and grand-total aggregates in ONE pass over lineitem —
    the planner expands the sets without re-scanning, vs three separate
    scans+unions. grouping_id disambiguates the null produced by set
    expansion from a genuine null key."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


Q_GROUPING_SETS_SQL = """
select l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
       count(*) n_rows,
       grouping(l_returnflag, l_linestatus)::BIGINT gid
from lineitem
group by grouping sets ((l_returnflag), (l_linestatus), ())
"""


def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type: parse the
    JSON payload once into a variant (binary-encoded, no re-parse per
    field access), extract typed fields with try_variant_get. The
    shredded-access pattern is the at-scale JSON story — one parse, many
    cheap typed extractions. Oracle uses DuckDB's JSON extraction on
    the same payload."""
    e = load(spark, sf_dir, "events")
    v = e.select(F.parse_json(F.col("props")).alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.select((k % F.lit(10)).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("k").cast("double")), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


Q_EVENTS_PROPS_VARIANT_SQL = """
with x as (
  select cast(json_extract(props, '$.k') as bigint) k from events
)
select k % 10 k_bucket, count(*) n,
       round(avg(k::DOUBLE), 6) avg_k, max(k) max_k
from x group by 1
"""


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function sweep over each customer's order history in one
    window pass: lag/lead navigation, running first/last in frame, and
    the two normalized ranks. One shuffle on the partition key; every
    function shares the same sort so no second Exchange appears."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = F.round("o_totalprice", 2)
    return o.select(
        "o_custkey",
        "o_orderkey",
        price.alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(wf), 2).alias("first_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


Q_WINDOW_ANALYTICS_SQL = """
select o_custkey, o_orderkey,
       round(o_totalprice, 2) price,
       round(lag(o_totalprice) over w, 2) prev_price,
       round(lead(o_totalprice) over w, 2) next_price,
       round(first_value(o_totalprice) over
             (w rows between unbounded preceding and current row), 2) first_price,
       round(percent_rank() over w, 6) pct_rank,
       round(cume_dist() over w, 6) cume
from orders
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
"""


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: per-language sampling rates applied
    with the hash-stable bucket (md5 of doc_id), the reproducible way a
    training mix is rebalanced — same docs selected on every run,
    cluster, and engine; no rand(). One scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    staged = d.selectExpr("doc_id", "split(text, ' ') as __toks")
    lang = F.expr(text.lang_id_sql("__toks"))
    rate = F.when(lang == "en", F.lit(80)).otherwise(F.lit(40))
    return (
        staged.select("doc_id", lang.alias("lang_pred"), rate.alias("rate"))
        .where(text.stable_sample_pct("doc_id") < F.col("rate"))
        .select("doc_id", "lang_pred", F.col("rate").cast("bigint").alias("rate"))
    )


Q_CORPUS_MIX_SQL = """
with s as (
  select doc_id, {lang} lang_pred from documents
),
r as (
  select doc_id, lang_pred,
         (case when lang_pred = 'en' then 80 else 40 end)::BIGINT rate
  from s
)
select doc_id, lang_pred, rate from r
where {bucket} < rate
"""


def q_part_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface: dense_rank + ntile quartile per brand
    over retail price, top-5 rows kept. One shuffle on the partition
    key; ntile is computed over the full partition before the row_number
    filter (quartiles describe the whole brand, not the top-5)."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.dense_rank().over(w).cast("bigint").alias("drank"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .where(F.col("rn") <= 5)
    )


Q_PART_RANK_SQL = """
select p_brand, p_partkey, price, rn, drank, quartile
from (
  select p_brand, p_partkey, round(p_retailprice, 2) price,
         row_number() over w::BIGINT rn,
         dense_rank() over w::BIGINT drank,
         ntile(4) over w::BIGINT quartile
  from part
  window w as (partition by p_brand order by p_retailprice desc, p_partkey asc)
)
where rn <= 5 order by p_brand, rn
"""


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate: all 4 grouping sets of (returnflag, linestatus)
    in one pass with grouping_id() disambiguating subtotal rows from
    data rows. Spark expands the cube map-side, so it is still a single
    shuffle — the expansion multiplies partial-agg rows, not scan rows."""
    l = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.round(F.sum(disc), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q_CUBE_SQL = """
select l_returnflag, l_linestatus,
       grouping(l_returnflag, l_linestatus)::BIGINT gid,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
       count(*) n_lines
from lineitem
group by cube(l_returnflag, l_linestatus)
order by gid, l_returnflag, l_linestatus
"""


BUCKET_DIM = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 25.0),
    ("high", 25.0, 40.0),
    ("bulk", 40.0, 51.0),
]


def q_quantity_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: fact rows land in [lo, hi) buckets of a
    broadcast dimension. Spark plans this as BroadcastNestedLoopJoin —
    each task streams its lineitem partition against the 4-row bucket
    table, so cost is scan-linear and there is no shuffle before the
    final 4-group aggregate. (With thousands of buckets you'd binary-
    search via a sorted-array UDF or width_bucket instead; the point
    here is the non-equi join surface.)"""
    l = load(spark, sf_dir, "lineitem")
    b = _local_df(spark, BUCKET_DIM, "label string, lo double, hi double")
    return (
        l.join(
            F.broadcast(b),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


Q_RANGE_BUCKETS_SQL = """
select label, count(*) n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
from lineitem
join (values {rows}) b(label, lo, hi)
  on l_quantity >= lo and l_quantity < hi
group by label order by label
""".format(
    rows=", ".join("('%s', %s, %s)" % t for t in BUCKET_DIM)
)


def _quality_deciles_duck() -> str:
    qd = text.quality_score_duck("text")
    ths = ", ".join(
        "round(quantile_cont(q, %s), 6) t%d" % (i / 10.0, i)
        for i in range(1, 10)
    )
    dec = " + ".join("(q >= t%d)::INT" % i for i in range(1, 10))
    return """
with scored as (
  select doc_id, source, {qd} q from documents
),
ths as (select {ths} from scored)
select source, (1 + {dec})::BIGINT decile, count(*)::BIGINT n
from scored cross join ths
group by source, decile order by source, decile
""".format(qd=qd, ths=ths, dec=dec)


def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance via MERGEABLE partial
    state — the lambda-architecture shape: the last 7 days of events
    are the "new batch", everything older is the "stored rollup", and
    each side reduces to per-(day, event_type) partial states (count,
    integer micro-value sum, min/max event time) that MERGE by
    sum/sum/min/min — never re-reading the historical corpus. The
    cutoff deliberately lands mid-day, so the boundary day has partials
    on BOTH sides and the merge is exercised, not just a union.

    The oracle is the FULL recompute over all events — equality proves
    merge soundness (partial states form a commutative monoid). Values
    sum as integer micro-units (a float sum would be order-dependent).

    Scale: at 100 TB the stored side is day-partitioned partial-state
    parquet that never rescans; each refresh aggregates only the new
    batch and merges |days x types| rows — this query IS that plan with
    both sides derived from one table."""
    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.expr("cast(round(value * 1e6, 0) as bigint)").alias("v_u"),
    )
    mx = e.agg(F.max("us").alias("_m"))
    tagged = e.crossJoin(F.broadcast(mx)).withColumn(
        "_new", F.col("us") >= F.col("_m") - F.lit(7 * 86400 * 1_000_000)
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_u").alias("sv"),
            F.min("us").alias("lo"),
            F.max("us").alias("hi"),
        )

    stored = partials(tagged.where(~F.col("_new")))
    fresh = partials(tagged.where(F.col("_new")))
    return (
        stored.unionByName(fresh)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("sv").cast("bigint").alias("total_v_u"),
            F.min("lo").cast("bigint").alias("first_us"),
            F.max("hi").cast("bigint").alias("last_us"),
        )
        .orderBy("day", "event_type")
    )


Q_ROLLUP_INCREMENTAL_SQL = """
select strftime(ts, '%Y-%m-%d') as "day", event_type,
       count(*)::BIGINT n_events,
       sum(round(value * 1e6, 0)::BIGINT)::BIGINT total_v_u,
       min(epoch_us(ts))::BIGINT first_us,
       max(epoch_us(ts))::BIGINT last_us
from events
group by 1, 2 order by 1, 2
"""


def _label_propagation_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7).strip().rstrip(";")
    seed_b = text.stable_sample_pct_duck("doc_id")
    return """
with p as materialized (
{pairs}
),
edges as (
  select doc_a, doc_b from p
  union all
  select doc_b, doc_a from p
),
seeds as (
  select doc_id, lang as "label", 'seed' origin from documents
  where {b} < 10
),
v1 as (
  select e.doc_a doc_id, s."label", count(*) cnt
  from edges e join seeds s on s.doc_id = e.doc_b
  where e.doc_a not in (select doc_id from seeds)
  group by 1, 2
),
n1 as (
  select doc_id, "label", 'round1' origin from (
    select doc_id, "label",
           row_number() over (partition by doc_id
                              order by cnt desc, "label" asc) rn
    from v1
  ) where rn = 1
),
l1 as (
  select doc_id, "label", origin from seeds
  union all
  select doc_id, "label", origin from n1
),
v2 as (
  select e.doc_a doc_id, l."label", count(*) cnt
  from edges e join l1 l on l.doc_id = e.doc_b
  where e.doc_a not in (select doc_id from l1)
  group by 1, 2
),
n2 as (
  select doc_id, "label", 'round2' origin from (
    select doc_id, "label",
           row_number() over (partition by doc_id
                              order by cnt desc, "label" asc) rn
    from v2
  ) where rn = 1
)
select doc_id, "label", origin from l1
union all
select doc_id, "label", origin from n2
order by doc_id
""".format(pairs=pairs, b=seed_b)


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the memorization/templating
    signal: the fraction of a doc's distinct 3-gram shingles that occur
    in NO other document (novel in bps, integer-exact). Low novelty =
    boilerplate/template/near-copy even when no single pair crosses the
    dedup threshold; high novelty = unique content worth keeping. The
    per-doc complement of the corpus-level duplication metrics.

    One (gram → doc count) hash-aggregate over 8-byte xxhash shingles
    (text never shuffles), then a per-doc rollup counting grams whose
    corpus count is 1. Output: (doc_id, n_grams, n_novel, novelty_bps).

    DuckDB cannot replay xxhash64, so the oracle hashes nothing: it
    computes the same counts over the RAW shingle strings — equality
    proves the hashed path loses no grams (the engine's standard
    hashed-vs-raw oracle shape, same as the Jaccard family)."""
    from bamboo_spark.operators import scale

    # spread the single-split scan before the gram/hash compute fused
    # into its stage (guide §2.5; no-op on already-parallel input)
    d = scale.fan_out(
        load(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    grams = _tracked_persist(
        d.select(
            "doc_id",
            F.explode(
                # guard: Spark's sequence(1, 0) is DESCENDING [1, 0],
                # not empty — short docs must yield no grams explicitly
                F.expr(
                    "if(size(split(text, ' ')) < 3,"
                    " cast(array() as array<bigint>),"
                    " array_distinct(transform("
                    "  sequence(1, size(split(text, ' ')) - 2),"
                    "  i -> xxhash64(concat_ws(' ',"
                    "    slice(split(text, ' '), i, 3))))))"
                )
            ).alias("g"),
        )
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_bps",
            F.expr("cast((10000 * n_novel) div n_grams as bigint)"),
        )
        .orderBy("doc_id")
    )


Q_DOC_NOVELTY_SQL = """
with toks as (
  select doc_id, string_split(text, ' ') t from documents
),
grams as (
  select distinct doc_id,
         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] g
  from toks, unnest(range(1, greatest(len(t) - 1, 1))) as u(i)
),
dfc as (select g, count(*) df from grams group by g)
select doc_id, count(*)::BIGINT n_grams,
       sum((df = 1)::BIGINT)::BIGINT n_novel,
       ((10000 * sum((df = 1)::BIGINT)) // count(*))::BIGINT novelty_bps
from grams join dfc using (g)
group by doc_id order by doc_id
"""


def _nb_kappa_duck() -> str:
    return """
with cm as (
%s
),
t as (
  select sum(n_docs) n,
         sum(case when true_lang = pred_lang then n_docs else 0 end) agree
  from cm
),
r as (select true_lang k, sum(n_docs) nr from cm group by 1),
c as (select pred_lang k, sum(n_docs) nc from cm group by 1),
s as (select coalesce(sum(r.nr::HUGEINT * c.nc), 0) sv from r join c using (k))
select t.n::BIGINT n_docs, t.agree::BIGINT n_agree,
       round(t.agree::DOUBLE / t.n::DOUBLE, 6) po,
       round(s.sv::DOUBLE / (t.n::HUGEINT * t.n)::DOUBLE, 6) pe,
       round((t.agree::HUGEINT * t.n - s.sv)::DOUBLE
             / ((t.n::HUGEINT * t.n) - s.sv)::DOUBLE, 6) kappa
from t cross join s
""" % Q_LANG_NB_SQL


def q_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency profile per order priority: late-ish rate and
    EXACT p50/p90/p99 latency days via the nearest-rank rule — computed
    on the (priority, delay-days) GRID, never a data-sized sort: delay
    days live in a small integer domain, so per-priority counts roll up
    to a grid, the cumulative runs over the grid, and the percentile is
    the smallest delay whose cumulative count reaches ceil(q·n). This
    is how exact percentiles survive 100 TB — the alternative (sort
    each group, row_number) shuffles and sorts every row; the grid
    shape shuffles |priorities|×|delay domain| cells.

    Both engines agree bit-for-bit: integer days, integer ranks,
    nearest-rank (an actual element, the engine's pinned convention —
    see ``approx_percentile`` gotcha)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("int").alias("dd"),
    )
    grid = d.groupBy("o_orderpriority", "dd").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("dd")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("o_orderpriority")
    cum = grid.select(
        "o_orderpriority",
        "dd",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    pick = lambda q: F.min(  # noqa: E731 — nearest-rank: ceil(q*n)
        F.when(
            F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("dd")
        )
    )
    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("bigint").alias("n_items"),
            pick(50).cast("bigint").alias("p50_days"),
            pick(90).cast("bigint").alias("p90_days"),
            pick(99).cast("bigint").alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


Q_SHIP_LATENCY_SQL = """
with d as (
  select o_orderpriority,
         date_diff('day', o_orderdate, l_shipdate)::INT dd
  from lineitem join orders on l_orderkey = o_orderkey
),
grid as (
  select o_orderpriority, dd, count(*)::BIGINT c
  from d group by 1, 2
),
cum as (
  select o_orderpriority, dd,
         sum(c) over (partition by o_orderpriority order by dd
                      rows between unbounded preceding and current row) cum,
         sum(c) over (partition by o_orderpriority) n
  from grid
)
select o_orderpriority, max(n)::BIGINT n_items,
       min(case when cum * 100 >= 50 * n then dd end)::BIGINT p50_days,
       min(case when cum * 100 >= 90 * n then dd end)::BIGINT p90_days,
       min(case when cum * 100 >= 99 * n then dd end)::BIGINT p99_days
from cum group by o_orderpriority
order by o_orderpriority
"""


def q_orders_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog by month: orders OPEN from their order date
    until their last lineitem ships; per month, how many opened, how
    many closed, and the backlog at month end (cumulative opened −
    closed). The classic operations dashboard — a growing backlog with
    flat openings means fulfillment is falling behind.

    Scale: close date is one per-order max aggregate (map-combined);
    open/close events roll straight to a ≤|months| grid, and the
    cumulative window runs over that grid only. Order keys never sort
    globally."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    closed = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_d")
    )
    spans = o.join(closed, o.o_orderkey == closed.l_orderkey, "inner")
    opens = spans.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.lit(1).alias("op"),
        F.lit(0).alias("cl"),
    )
    closes = spans.select(
        F.date_format("close_d", "yyyy-MM").alias("m"),
        F.lit(0).alias("op"),
        F.lit(1).alias("cl"),
    )
    grid = (
        opens.unionByName(closes)
        .groupBy("m")
        .agg(
            F.sum("op").cast("bigint").alias("opened"),
            F.sum("cl").cast("bigint").alias("closed"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.select(
            F.col("m").alias("month"),
            "opened",
            "closed",
            (F.sum("opened").over(w) - F.sum("closed").over(w))
            .cast("bigint")
            .alias("backlog_end"),
        )
        .orderBy("month")
    )


Q_ORDERS_BACKLOG_SQL = """
with closed as (
  select l_orderkey, max(l_shipdate) close_d from lineitem group by 1
),
spans as (
  select o_orderdate, close_d
  from orders join closed on o_orderkey = l_orderkey
),
ev as (
  select strftime(o_orderdate, '%Y-%m') m, 1 op, 0 cl from spans
  union all
  select strftime(close_d, '%Y-%m') m, 0 op, 1 cl from spans
),
grid as (
  select m, sum(op)::BIGINT opened, sum(cl)::BIGINT closed
  from ev group by m
)
select m as "month", opened, closed,
       (sum(opened) over (order by m rows between unbounded preceding
                          and current row)
        - sum(closed) over (order by m rows between unbounded preceding
                            and current row))::BIGINT backlog_end
from grid order by "month"
"""
