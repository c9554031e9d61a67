"""The query registry — every operator surfaced as a (Spark fn, oracle
SQL) pair for the driver's DuckDB hash-equality gate.

Conventions (driver contract, __spark_entry__.py):
* each Spark query takes (spark, sf_dir) and returns a DataFrame;
* the oracle is ANSI-ish SQL DuckDB runs over the same parquet views;
* column NAMES and TYPES match exactly (aggregates aliased on both
  sides; counts cast to BIGINT; float results rounded identically so
  cross-engine ulp noise can't flip the value hash);
* ORDER doesn't matter (driver compare is order-insensitive) but
  deterministic queries order anyway for humans.

Scale annotations sit on each query: broadcast hints on dimension
tables, single-shuffle aggregations, skew notes. These run unchanged on
a real cluster — nothing here depends on local[*].
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

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet; Spark can only read it
        # as a nano-count long — convert to a µs timestamp (floor), the
        # same truncation DuckDB's epoch_us applies.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 — conf may be fixed; read will tell
            pass
        df = spark.read.parquet("%s/%s.parquet" % (sf_dir, name))
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet timestamp[us] with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ under Spark 4's NTZ inference; DuckDB treats
            # the same naive value as epoch-UTC (epoch_us). Diff against
            # the NTZ epoch literal (no session-timezone dependence
            # anywhere) and rebuild the LTZ timestamp every downstream
            # query expects — unix_micros(ts) then equals epoch_us(ts).
            us = F.timestamp_diff(
                "MICROSECOND",
                F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
                F.col("ts"),
            )
            df = df.withColumn("ts", F.timestamp_micros(us))
        return df
    return spark.read.parquet("%s/%s.parquet" % (sf_dir, name))


# ============================================================ relational


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter + single hash aggregate (map-side
    partial agg; no join). Filter + pruning push into the parquet scan."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) sum_qty,
       round(sum(l_extendedprice), 2) sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) sum_charge,
       round(avg(l_quantity), 6) avg_qty,
       round(avg(l_extendedprice), 6) avg_price,
       round(avg(l_discount), 6) avg_disc,
       count(*) count_order
from lineitem
where l_shipdate <= TIMESTAMP '2000-12-01'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join narrowing to an aggregate + top-k.
    customer is filtered before the join (selectivity ~1/5); at scale
    orders⋈lineitem is the big sort-merge pair, customer side hash-joins
    after filter. AQE picks broadcast when the filtered side is small."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-06-01")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
select o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
where c_mktsegment = 'MACHINERY'
  and o_orderdate < TIMESTAMP '1998-06-01'
  and l_shipdate > TIMESTAMP '1998-06-01'
group by o_orderkey, o_orderdate
order by revenue desc, o_orderkey
limit 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. region/nation are broadcast (tiny
    dims); customer/orders/lineitem/supplier shuffle on their keys.
    The co-membership predicate c_nationkey = s_nationkey rides on the
    joins."""
    r = F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q5_SQL = """
select n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= TIMESTAMP '1996-01-01'
  and o_orderdate < TIMESTAMP '1999-01-01'
group by n_name
order by revenue desc
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate is
    parquet-pushable (min/max row-group skipping at scale)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
select round(sum(l_extendedprice * l_discount), 2) revenue,
       count(*) n_items
from lineitem
where l_shipdate >= TIMESTAMP '1997-01-01' and l_shipdate < TIMESTAMP '1998-01-01'
  and l_discount >= 0.05 and l_discount <= 0.07
  and l_quantity < 24
"""


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


def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based window aggregate: 7-event trailing moving average of
    value per event_type, ordered by (ts, event_id). Single shuffle on
    the partition key; the frame is evaluated streaming within each
    sorted partition (no per-row re-scan)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-6, 0)
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.round(F.avg("value").over(w), 6).alias("avg7"),
        )
    )


Q_EVENTS_MOVING_AVG_SQL = """
select event_id, event_type,
       round(avg(value) over (partition by event_type
                              order by ts asc, event_id asc
                              rows between 6 preceding and current row), 6) avg7
from events order by event_id
"""


def q_events_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: per-type stddev, correlation of
    value with time-of-day, and covariance — one map-side-combinable
    shuffle (all are algebraic sketches: sums of powers/cross-terms)."""
    e = load(spark, sf_dir, "events").withColumn(
        "second_of_day",
        (F.unix_timestamp("ts") % 86400).cast("double"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.corr("value", "second_of_day"), 4).alias("corr_time"),
            F.round(F.covar_samp("value", "second_of_day"), 2).alias("covar_time"),
        )
    )


Q_EVENTS_STATS_SQL = """
select event_type,
       count(*) n,
       round(stddev_samp(value), 4) sd_value,
       round(corr(value, ((epoch_us(ts) // 1000000) % 86400)::DOUBLE), 4) corr_time,
       round(covar_samp(value, ((epoch_us(ts) // 1000000) % 86400)::DOUBLE), 2) covar_time
from events group by event_type order by event_type
"""
# NB: epoch(ts)::BIGINT would ROUND the fractional second while Spark's
# unix_timestamp FLOORS it — integer µs division floors on both engines.


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table (the
    batch twin of the streaming windowed agg in streaming/)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q_EVENTS_HOURLY_SQL = """
select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') event_hour,
       event_type,
       count(*) n_events,
       round(sum(value), 2) total_value
from events
group by 1, 2
order by event_hour, event_type
"""


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly scores: each (event_type, hour) count
    z-scored against that type's own hourly distribution — the
    ingestion-monitoring query that catches a dead producer (z « 0) or
    a bot storm (z » 0) per stream. Counts are integers, so the
    per-type moments are exact sums (partition-order-independent) and
    the z-scores replay bit-for-bit in the oracle; the moments table is
    #types rows and broadcasts back. Degenerate (constant-rate) types
    score 0 instead of dividing by zero."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "event_hour"
        ),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("_h"),
        F.sum("n").cast("double").alias("_s"),
        # cast BEFORE the multiply: an (type, hour) count is unbounded,
        # and long*long wraps silently past ~3e9 (the oracle multiplies
        # in HUGEINT)
        F.sum(
            F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)")
        )
        .cast("double")
        .alias("_ss"),
    )
    mean = F.col("_s") / F.col("_h")
    std = F.sqrt(
        F.greatest(F.col("_ss") / F.col("_h") - mean * mean, F.lit(0.0))
    )
    z = F.when(std <= 0.0, F.lit(0.0)).otherwise(
        F.round((F.col("n") - mean) / std, 6)
    )
    return hourly.join(F.broadcast(mom), "event_type").select(
        "event_hour",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        z.alias("z"),
        (F.abs(z) > 3.0).cast("int").alias("is_anomaly"),
    )


Q_EVENTS_ANOMALY_SQL = """
with hourly as (
  select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') event_hour,
         event_type, count(*) n
  from events group by 1, 2
),
mom as (
  select event_type, count(*)::DOUBLE h, sum(n)::DOUBLE s,
         sum(n::HUGEINT * n::HUGEINT)::DOUBLE ss
  from hourly group by event_type
),
z as (
  select event_hour, hourly.event_type, n::BIGINT n,
         case when sqrt(greatest(ss / h - (s / h) * (s / h), 0.0)) <= 0
              then 0.0
              else round((n - s / h)
                         / sqrt(greatest(ss / h - (s / h) * (s / h), 0.0)), 6)
         end z
  from hourly join mom using (event_type)
)
select event_hour, event_type, n, z, (abs(z) > 3.0)::INT is_anomaly
from z order by event_hour, event_type
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: day-of-week × event_type matrix of summed value.
    The pivot value list is explicit — at scale an implicit pivot first
    runs a distinct over the pivot column (an extra full pass); with
    fixed values the whole thing is one conditional aggregate, single
    shuffle on the grouping key."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("dow", F.dayofweek("ts").cast("bigint"))
        .groupBy("dow")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


Q_PIVOT_SQL = """
select dayofweek(ts) + 1 as dow,
       {cols}
from events group by 1 order by dow
""".format(
    cols=",\n       ".join(
        "round(sum(value) filter (event_type = '%s'), 2) as %s" % (t, t)
        for t in EVENT_TYPES
    )
)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + running sum
    over a per-user window — one shuffle on user_id. Epoch-µs integer
    arithmetic keeps it bit-identical to the oracle."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    sessions = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000000), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q_SESSIONIZE_SQL = """
with t as (
  select user_id, epoch_us(ts) us from events
),
m as (
  select user_id, us,
         case when lag(us) over (partition by user_id order by us) is null
               or us - lag(us) over (partition by user_id order by us) > 1800000000
              then 1 else 0 end new_session
  from t
)
select user_id, sum(new_session)::BIGINT n_sessions, count(*) n_events
from m group by user_id order by user_id
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


# ============================================================ LLM ops


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.dedup_exact(d, "text", "doc_id")


Q_DEDUP_EXACT_SQL = """
select min(doc_id) keep_id, count(*) n_dups
from documents group by text order by keep_id
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


STRATA_RATES = {"src0": 80, "src1": 50, "src2": 20}  # keep-% per source stratum


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the corpus-mixing operator of
    a training-data pipeline: keep N% per source stratum, hash-stable
    (md5 of doc_id) so the sample is reproducible across runs/engines
    and can be diffed or joined back. Narrow projection + filter: no
    shuffle except the cosmetic sort; at 100 TB this runs at scan speed.
    Unknown strata default to keep-10%."""
    d = load(spark, sf_dir, "documents")
    bucket = text.stable_sample_pct("doc_id")
    rate = F.lit(10)
    for src, pct in STRATA_RATES.items():
        rate = F.when(F.col("source") == src, F.lit(pct)).otherwise(rate)
    return (
        d.where(bucket < rate)
        .select("doc_id", "source", bucket.alias("bucket"))
    )


def _stratified_sql() -> str:
    cases = " ".join(
        "when source = '%s' then %d" % (s, p) for s, p in STRATA_RATES.items()
    )
    b = text.stable_sample_pct_duck("doc_id")
    return (
        "select doc_id, source, %s bucket from documents "
        "where %s < (case %s else 10 end) order by doc_id" % (b, b, cases)
    )


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # oracle-gated against the lossless brute-force DuckDB twin, so the
    # skew cap must be off here (the capped default is documented-approx:
    # it drops pairs whose every prefix shingle is hot, which would break
    # the gate at an SF where any shingle's doc-frequency crosses the cap)
    return dedup.jaccard_pairs(d, threshold=0.8, max_shingle_df=None)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 64 hashes / 32 bands of 2: a true 0.7-similar pair misses every
    # band with p = (1 - 0.49)^32 < 5e-10 — indistinguishable from the
    # exact join at any test scale, at half the signature width of the
    # datasketch-style 128 default.
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, max_hamming=2)


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after canonical normalization (lowercase, strip
    punctuation, collapse whitespace) — catches case/punct-only
    duplicates byte-exact hashing misses. Same single hash-aggregate
    shuffle as dedup_exact, keyed on the normalized form."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(text.normalize_text("text").alias("norm"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


Q_DEDUP_NORM_SQL = """
select min(doc_id) keep_id, count(*) n_dups
from documents group by {norm} order by keep_id
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline composed: MinHash-LSH candidates →
    exact-jaccard verify (0.7) → duplicate-cluster labeling via 4
    supersteps of min-label propagation (near-dup clusters are
    near-cliques; diameter > 4 is pathological, and the oracle unrolls
    the same 4 steps so parity holds regardless). Output: every doc in
    a near-dup pair with its cluster's canonical (minimum) doc_id."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    return dedup.connected_components(pairs, iterations=4)


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


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level rollup on top of the gap sessionizer: the running
    sum of new-session flags becomes the per-user session id, then one
    aggregate per (user, session) and a global rollup — duration and
    event-count distributions of 30-min-gap sessions. Same two-window
    chain as q_sessionize (one shuffle on user_id), second tiny shuffle
    for the global stats."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000000), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    sessions = flagged.groupBy("user_id", "session_id").agg(
        ((F.max("us") - F.min("us")) / F.lit(1_000_000.0)).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("duration_s"), 4).alias("avg_duration_s"),
        F.round(F.max("duration_s"), 4).alias("max_duration_s"),
        F.round(F.avg(F.col("n_events").cast("double")), 6).alias("avg_events"),
        F.max("n_events").alias("max_events"),
    )


Q_SESSION_STATS_SQL = """
with t as (
  select user_id, epoch_us(ts) us from events
),
flagged as (
  select user_id, us,
         case when lag(us) over w is null
                   or us - lag(us) over w > 30 * 60 * 1000000
              then 1 else 0 end new_session
  from t
  window w as (partition by user_id order by us)
),
sess as (
  select user_id, us,
         sum(new_session) over (partition by user_id order by us
             rows between unbounded preceding and current row) session_id
  from flagged
),
per as (
  select user_id, session_id,
         (max(us) - min(us)) / 1000000.0 duration_s,
         count(*) n_events
  from sess group by 1, 2
)
select count(*) n_sessions,
       round(avg(duration_s), 4) avg_duration_s,
       round(max(duration_s), 4) max_duration_s,
       round(avg(n_events::DOUBLE), 6) avg_events,
       max(n_events) max_events
from per
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, first view → first click AFTER that
    view → first purchase AFTER that click, then stage counts.

    Plan shape: ONE sorted pass per user — two stacked running-min
    windows over the same (user, time) sort mark each event with the
    earliest view / qualifying click seen so far, then one aggregate
    takes the stage minima. Never a 3-way self-join (the naive funnel
    plan) and never per-user collected arrays (unbounded under
    power-law users): one shuffle + sort, O(1) state per row. Strict
    ``<`` comparisons make same-microsecond ties deterministic
    regardless of intra-timestamp sort order, and epoch-µs integer
    arithmetic keeps every comparison engine-exact."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = e.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    )
    c_qual = (
        (F.col("event_type") == "click")
        & F.col("first_view").isNotNull()
        & (F.col("first_view") < F.col("us"))
    )
    staged = staged.withColumn(
        "first_click", F.min(F.when(c_qual, F.col("us"))).over(w)
    )
    p_qual = (
        (F.col("event_type") == "purchase")
        & F.col("first_click").isNotNull()
        & (F.col("first_click") < F.col("us"))
    )
    per_user = staged.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("v"),
        F.min(F.when(c_qual, F.col("us"))).alias("c"),
        F.min(F.when(p_qual, F.col("us"))).alias("p"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v").alias("viewed"),
        F.count("c").alias("clicked_after_view"),
        F.count("p").alias("purchased_after_click"),
    )


Q_EVENTS_FUNNEL_SQL = """
with e as (
  select user_id, event_type, epoch_us(ts) us from events
),
per_user as (
  select user_id,
         min(us) filter (event_type = 'view') v,
         list_sort(list(us) filter (event_type = 'click')) clicks,
         list_sort(list(us) filter (event_type = 'purchase')) purchases
  from e group by user_id
),
staged as (
  select user_id, v,
         list_min(list_filter(clicks, x -> x > v)) c,
         purchases
  from per_user
),
staged2 as (
  select user_id, v, c,
         list_min(list_filter(purchases, x -> x > c)) p
  from staged
)
select count(*) n_users,
       count(v) viewed,
       count(c) clicked_after_view,
       count(p) purchased_after_click
from staged2
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted in each later week they return. Week = epoch-days div 7 —
    pure integer arithmetic, so cohort boundaries are engine-exact
    (date_trunc('week') differs across engines/locales). Two shuffles:
    the per-(user, week) distinct and the cohort-join aggregate; the
    first-week table rides a broadcast at runtime."""
    e = load(spark, sf_dir, "events")
    weeks = (
        e.select("user_id", F.unix_micros(F.col("ts")).alias("us"))
        .select("user_id", F.expr("(us div 86400000000) div 7").alias("week"))
        .distinct()
    )
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        weeks.join(first, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("weeks_later"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


Q_RETENTION_SQL = """
with weeks as (
  select distinct user_id, (epoch_us(ts) // 86400000000) // 7 as wk
  from events
),
fw as (
  select user_id, min(wk) as cohort from weeks group by user_id
)
select cohort, (wk - cohort) as weeks_later, count(distinct w.user_id) n_users
from weeks w join fw using (user_id)
group by 1, 2
"""


def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-ROW SimHash projection (streaming form, no shuffle)
    value-gated directly: every 60-bit signature must match the
    oracle's recomputation bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_expr_cols(d).select("doc_id", "simhash")


Q_SIMHASH_SIGNATURES_SQL_TEMPLATE = """
with tok as (
  select doc_id, unnest(list_distinct(string_split(text, ' '))) t from documents
),
tv as (select doc_id, {v} v from tok),
agg as (select doc_id, count(*) n, {sums} from tv group by doc_id)
select doc_id, {sim} as simhash from agg
"""


def _simhash_signatures_duck() -> str:
    sums = ", ".join(
        "sum((v >> %d) & 1) s%d" % (j, j) for j in range(dedup.SIMHASH_BITS)
    )
    sim = " + ".join(
        "(case when 2 * s%d > n then %d::BIGINT else 0::BIGINT end)" % (j, 1 << j)
        for j in range(dedup.SIMHASH_BITS)
    )
    from bamboo_spark.operators.text import md5_int60_duck

    return Q_SIMHASH_SIGNATURES_SQL_TEMPLATE.format(
        v=md5_int60_duck("t"), sums=sums, sim=sim
    )


def q_dedup_components_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via POINTER-JUMPING components: log-diameter
    supersteps with convergence detection — the deep-graph scale path
    (the fixed-K propagation twin assumes near-clique clusters). The
    oracle computes the same fixpoint with a recursive CTE, so the
    result is iteration-budget-independent."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    return dedup.connected_components_converged(pairs)


def q_dedup_components_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via LARGE-STAR/SMALL-STAR edge contraction -
    the edge-list-scale CC variant (the edge set itself shrinks toward
    a star forest each round, unlike min-propagation which re-joins the
    full edge list every superstep). Same fixpoint as the recursive-CTE
    oracle, independent of the round budget."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    return dedup.connected_components_contraction(pairs)


_QUANTIZER_CACHE: Dict[str, "object"] = {}

# Lloyd iterations of the shared COARSE quantizer — every IVF/IVF-PQ
# registry query and every oracle replay must read this one constant
# (a retune that touches only one side silently desyncs bucket
# assignments between engine and oracle)
COARSE_ITERS = 2


def ivf_quantizer(spark: SparkSession, sf_dir: str):
    """The shared IVF coarse quantizer for the ANN registry queries
    (default geometry: √n centroids, 2 Lloyd iterations), trained ONCE
    per embeddings table and memoized — the in-session analogue of the
    production build-once-probe-many shape (``save_centroids`` /
    ``load_centroids`` is the cross-job version). ``kmeans_train`` is
    fully deterministic (hash-ranked init, integer partial sums), so
    reuse is result-invisible: every consumer gets bit-identical
    centroids to a fresh retrain, and the DuckDB oracle's Lloyd replay
    still matches."""
    key = sf_dir.rstrip("/")
    if key not in _QUANTIZER_CACHE:
        e = load(spark, sf_dir, "embeddings")
        _QUANTIZER_CACHE[key] = similarity.kmeans_train(
            e, iterations=COARSE_ITERS
        )
    return _QUANTIZER_CACHE[key]


_PQ_CACHE: Dict[str, "object"] = {}

# ONE source of truth for the registry's PQ geometry: the cache, both
# consumers, and the oracle registrations all read these — retuning in
# one place can't silently desync cached codebooks from the oracle's
# replayed training
PQ_M, PQ_CODES, PQ_ITERS = 8, 16, 2


def pq_codebooks(spark: SparkSession, sf_dir: str):
    """Shared PQ codebooks (PQ_M subspaces × PQ_CODES codes, PQ_ITERS
    Lloyd iterations) for the registry, trained once per embeddings
    table and memoized — same build-once-probe-many reuse discipline as
    ``ivf_quantizer``; training is deterministic so reuse is
    result-invisible."""
    key = "%s@%dx%dx%d" % (sf_dir.rstrip("/"), PQ_M, PQ_CODES, PQ_ITERS)
    if key not in _PQ_CACHE:
        e = load(spark, sf_dir, "embeddings")
        _PQ_CACHE[key] = similarity.pq_train(
            e, m=PQ_M, n_codes=PQ_CODES, iterations=PQ_ITERS
        )
    return _PQ_CACHE[key]


def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed kNN: ADC scoring over m-byte codes (32× smaller
    scoring working set than the raw vectors) + exact re-rank of the
    top candidates. The memory-scale ANN path for corpora whose
    embeddings don't fit scoring-resident."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.topk_neighbors_pq(
        e, query_ids_below=10, k=5, rerank=30,
        codebooks=pq_codebooks(spark, sf_dir),
    )


def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ kNN: coarse buckets restrict the search, PQ codes shrink
    the per-bucket scoring working set 32×, exact re-rank repairs the
    head — the two index tiers composed, both from the shared memoized
    trained structures."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.topk_neighbors_ivfpq(
        e, query_ids_below=10, k=5, m=PQ_M, n_codes=PQ_CODES,
        iterations=PQ_ITERS, coarse_iterations=COARSE_ITERS,
        n_probe=2, rerank=30,
        centroids=ivf_quantizer(spark, sf_dir),
        codebooks=pq_codebooks(spark, sf_dir),
    )


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ code table itself (exploded to (vec_id, sub, code) for
    the gate): the n·m-byte compressed representation every ADC
    consumer scores against — encode once, store bucketed, probe
    forever. One Arrow-batched kernel; nothing data-sized collected."""
    e = load(spark, sf_dir, "embeddings")
    codes = similarity.pq_encode(e, pq_codebooks(spark, sf_dir))
    return codes.selectExpr(
        "vec_id", "posexplode(codes) as (sub, code)"
    ).selectExpr(
        "vec_id", "cast(sub as bigint) as sub", "cast(code as bigint) as code"
    )


def q_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via the DEFAULT scale path: trained √n-centroid
    IVF + multiprobe + bucket-local exact GEMM verify. Nothing
    data-sized reaches the driver; per-bucket verify is bounded."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.near_dup_pairs(
        e, threshold=0.4, bucket_cap=256, centroids=ivf_quantizer(spark, sf_dir)
    )


def q_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact=True escape hatch: all-pairs broadcast-GEMM — O(n²) by
    contract, kept for modest n / post-ANN verification."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.near_dup_pairs(e, threshold=0.4, exact=True)


def q_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed near-dup pairs: seeded plane literals in
    codegen, bucket-equality join, exact cosine verify. The oracle
    interpolates the same plane literals, so the (recall<1) candidate
    set itself is deterministic and value-checked, not just benched."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.ann_pairs(e, threshold=0.4, dim=64, n_planes=12)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.topk_neighbors(e, query_ids_below=10, k=5)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return text.add_text_stats(d)


Q_TEXT_STATS_SQL = """
select doc_id,
       len(string_split(text, ' '))::BIGINT n_tokens,
       length(text)::BIGINT n_chars,
       round(len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' '))::DOUBLE, 6) distinct_ratio,
       {lang} lang_pred,
       {quality} quality
from documents order by doc_id
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_expr())


Q_FINGERPRINT_SQL = """
select doc_id, {fp} fingerprint from documents order by doc_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: URLs, emails, phone numbers →
    typed placeholders, plus a per-doc hit count — pure regexp_replace/
    regexp_count (codegen, scan-speed; backslash-free patterns so the
    Spark and DuckDB regex literals are byte-identical). The synthetic
    corpus carries no PII, so the query plants a deterministic
    id-derived contact line first — the redaction itself is what's
    value-checked."""
    d = load(spark, sf_dir, "documents")
    raw = (
        "concat('contact user', cast(doc_id as string), "
        "'@mail.example.com or visit https://example.org/d/', "
        "cast(doc_id as string), ' call 555-', "
        "lpad(cast(doc_id % 1000 as string), 3, '0'), '-0199 ', text)"
    )
    return d.selectExpr(
        "doc_id",
        "%s as scrubbed" % text.scrub_pii_sql(raw),
        "cast(%s as bigint) as n_pii" % text.pii_count_sql(raw),
    )


Q_PII_SCRUB_SQL = """
with raw as (
  select doc_id,
         'contact user' || doc_id::VARCHAR ||
         '@mail.example.com or visit https://example.org/d/' ||
         doc_id::VARCHAR || ' call 555-' ||
         lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199 ' || text r
  from documents
)
select doc_id, {scrub} scrubbed, ({cnt})::BIGINT n_pii
from raw order by doc_id
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 4-gram overlap between every training
    document and a (deterministic) held-out eval slice — the standard
    n-gram contamination check run before training. The eval side is
    benchmark-sized, so its exploded n-gram index BROADCASTS: the 100 TB
    corpus streams past it map-side with no shuffle of the training
    data; the only shuffle is the per-(train, eval) overlap count,
    map-combined. Output: overlap count + contamination ratio
    (overlap / train doc's distinct n-grams)."""
    d = load(spark, sf_dir, "documents")
    sh = text.word_shingles_sql("split(text, ' ')", 4)
    ev = (
        d.where("doc_id % 97 = 0")
        .selectExpr("doc_id as eval_id", "array_distinct(%s) as sh" % sh)
        .select("eval_id", F.explode("sh").alias("s"))
    )
    tr = (
        d.where("doc_id % 97 != 0")
        .selectExpr("doc_id", "array_distinct(%s) as sh" % sh)
        .select("doc_id", F.size("sh").alias("nt"), F.explode("sh").alias("s"))
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id", "eval_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
            F.first("nt").alias("nt"),
        )
        .selectExpr(
            "doc_id",
            "eval_id",
            "n_overlap",
            "round(cast(n_overlap as double) / cast(nt as double), 6)"
            " as contamination",
        )
    )


Q_CONTAMINATION_SQL = """
with ev as (
  select eval_id, unnest(sh) s from (
    select doc_id eval_id, list_distinct({sh}) sh
    from documents where doc_id % 97 = 0
  )
),
tr as (
  select doc_id, nt, unnest(sh) s from (
    select doc_id, list_distinct({sh}) sh, len(list_distinct({sh})) nt
    from documents where doc_id % 97 != 0
  )
)
select doc_id, eval_id, count(*)::BIGINT n_overlap,
       round(count(*)::DOUBLE / any_value(nt)::DOUBLE, 6) contamination
from tr join ev using (s)
group by doc_id, eval_id
order by doc_id, eval_id
"""


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest: docs -> fixed-token-budget output shards via the
    distributed two-phase prefix scan (no global window; only P shard
    totals reach the driver) - the writer-side plan for emitting the
    corpus as N-token files."""
    d = load(spark, sf_dir, "documents")
    return pack.shard_manifest(d, shard_tokens=4096)


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only near-dup ingestion: the new batch (doc_id >= 250)
    probes the ingested corpus's MinHash band index for candidates,
    exact-verifies, and reports each flagged doc's best match - O(batch)
    work per ingest, never a corpus re-pair."""
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_incremental(d, split_id=250, threshold=0.7)


def q_table_profile(
    spark: SparkSession, sf_dir: str, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Data-quality profile of the events table: per-column null count
    and distinct count, plus row total - the monitoring scan a pipeline
    runs on every ingest batch. ONE pass: count(col) and
    count(distinct col) fold into a single aggregate (Spark plans
    multi-distinct via expand, still one scan), emitted long so the
    driver can diff profiles across batches.

    ``approx=True`` is the 100 TB mode: HLL++
    ``approx_count_distinct(rsd)`` replaces each exact distinct, so the
    plan loses the Expand (row x N_cols blowup) entirely — one plain
    map-combined aggregate whose state is N_cols sketches, constant
    regardless of cardinality. The exact default stays the oracle-gated
    form; the approx twin is error-bound-tested in pytest (like
    q_approx_sketches)."""
    e = load(spark, sf_dir, "events")
    cols = ["user_id", "event_type", "value"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("%s_nulls" % c))
        if approx:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).cast("bigint").alias(
                    "%s_distinct" % c
                )
            )
        else:
            aggs.append(
                F.count_distinct(F.col(c)).cast("bigint").alias("%s_distinct" % c)
            )
    return e.agg(*aggs)


Q_TABLE_PROFILE_SQL = """
select count(*)::BIGINT n_rows,
       (count(*) - count(user_id))::BIGINT user_id_nulls,
       count(distinct user_id)::BIGINT user_id_distinct,
       (count(*) - count(event_type))::BIGINT event_type_nulls,
       count(distinct event_type)::BIGINT event_type_distinct,
       (count(*) - count(value))::BIGINT value_nulls,
       count(distinct value)::BIGINT value_distinct
from events
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per stratum
    (Efraimidis-Spirakis A-ES): key = ln(u)/w with u derived from
    md5(doc_id) - longer documents (w = n_chars) are proportionally
    likelier to survive, the sample is reproducible across runs and
    engines, and selection is one scan-speed projection + a per-stratum
    top-k window (no rand(), no global sort). The standard
    quality/length-weighted subsampling shape."""
    d = load(spark, sf_dir, "documents")
    u = (
        "(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) + 1)"
        " / 4294967297.0"
    )
    key = "round(ln(%s) / cast(n_chars as double), 9)" % u
    staged = d.selectExpr("doc_id", "source", "n_chars", "%s as es_key" % key)
    return scale.ranked_head(
        staged,
        "source",
        [F.col("es_key").desc(), F.col("doc_id").asc()],
        cap=5,
    ).select("source", "rank", "doc_id", "n_chars", "es_key")


Q_WEIGHTED_SAMPLE_SQL = """
with staged as (
  select doc_id, source, n_chars,
         round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
                  / 4294967297.0) / n_chars::DOUBLE, 9) es_key
  from documents
)
select source, rank, doc_id, n_chars, es_key from (
  select *, row_number() over (partition by source
                               order by es_key desc, doc_id asc) rank
  from staged
) where rank <= 5
order by source, rank
"""


def q_dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-key incremental dedup through a broadcast Bloom filter,
    keyed on the winnowing content fingerprint: the ingested corpus
    (doc_id < 250) publishes a fixed-size bitmap; the new batch filters
    itself MAP-SIDE (the clean majority never shuffles) and only Bloom
    survivors reach the exact verify join, which removes every false
    positive - result identical to the full key join at a fraction of
    its shuffle. The standard guard in front of the (costlier) MinHash
    ingest path."""
    d = load(spark, sf_dir, "documents")
    return dedup.bloom_dedup_incremental(d, text.fingerprint_expr(), split_id=250)


def q_dedup_bloom_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sharded-index twin of ``dedup_bloom_incremental``: the corpus
    keyspace is hash-range partitioned over 4 independent Bloom filters
    (shard = high hash bits, bit positions = low bits), the batch
    cogroups with its shard's bitmap, survivors exact-verify. Identical
    output to the single-bitmap path — same oracle — but the index is
    DISTRIBUTED (no node holds more than one shard), which is the only
    shape that works past ~860M corpus keys where one bitmap outgrows a
    broadcast."""
    d = load(spark, sf_dir, "documents")
    return dedup.bloom_dedup_incremental(
        d, text.fingerprint_expr(), split_id=250, num_shards=4
    )


def q_cap_per_domain(
    spark: SparkSession, sf_dir: str, hot_min: int | None = None
) -> DataFrame:
    """Per-source head-capping (C4/RefinedWeb-style domain capping): keep
    a deterministic hash-ordered sample of at most 10 docs per source so
    head domains cannot dominate the training mix. Rank order is
    md5-derived, so the kept set is unbiased, reproducible, and
    engine-independent.

    Scale: ``scale.ranked_head`` — the rank filter plans as a Partial
    WindowGroupLimit BELOW the shuffle (per-partition partial top-k),
    so a hot source ships at most cap x map_partitions rows to its
    reducer, never its raw count (plan-pinned, tests/test_plans.py).
    ``hot_min`` additionally engages the exact two-pass hash-range
    pre-filter (``scale.hash_ranked_head``) for keys beyond it — same
    output, proven on a skewed fixture in tests/test_scale.py."""
    d = load(spark, sf_dir, "documents")
    rk = text.md5_int60_sql("cast(doc_id as string)")
    staged = d.select("source", "doc_id").withColumn("_rk", F.expr(rk))
    return scale.hash_ranked_head(
        staged,
        "source",
        "_rk",
        hash_max=2**60,
        cap=10,
        hot_min=hot_min,
        tiebreak_cols=["doc_id"],
    ).select("source", "rank", "doc_id")


Q_CAP_PER_DOMAIN_SQL = """
select source, rank, doc_id from (
  select source, doc_id,
         row_number() over (partition by source
                            order by {rk} asc, doc_id asc)::BIGINT rank
  from documents
) where rank <= 10
""".format(rk="(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)")


def q_token_budget_cap(
    spark: SparkSession, sf_dir: str, hot_min: int | None = None
) -> DataFrame:
    """Token-BUDGET domain capping: keep a deterministic hash-ordered
    slice of each source worth ≤ ~3000 training tokens (first doc past
    the line still kept — budget is on the exclusive prefix). The mix
    knob that actually matters downstream is tokens, not doc counts.
    ``hot_min`` engages the exact weighted hash-range pre-filter so a
    billion-doc source never funnels through one window sort."""
    d = load(spark, sf_dir, "documents")
    rk = text.md5_int60_sql("cast(doc_id as string)")
    staged = d.selectExpr(
        "source",
        "doc_id",
        "cast(size(split(text, ' ')) as bigint) as n_tokens",
    ).withColumn("_rk", F.expr(rk))
    return scale.budget_head(
        staged,
        "source",
        "_rk",
        "n_tokens",
        budget=3000,
        hot_min=hot_min,
        hash_max=2**60,
        tiebreak_cols=["doc_id"],
        cum_col="cum_tokens",
    ).select("source", "doc_id", "n_tokens", "cum_tokens")


Q_TOKEN_BUDGET_SQL = """
select source, doc_id, n_tokens, cum_tokens from (
  select source, doc_id, n_tokens,
         sum(n_tokens) over (partition by source
                             order by {rk} asc, doc_id asc
                             rows unbounded preceding)::BIGINT cum_tokens
  from (
    select source, doc_id,
           len(string_split(text, ' '))::BIGINT n_tokens
    from documents
  )
) where cum_tokens - n_tokens < 3000
order by source, doc_id
""".format(rk="(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)")


def q_pack_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sequence packing: each source lays out its own docs
    and cuts its own 512-token context windows (chunk ids restart per
    source) — the per-dataset shard-building shape. Fully distributed:
    the per-(source, shard) totals prefix-sum in a ≤``shards``-row
    window per source; NOTHING reaches the driver (the global packer's
    P-row driver fold disappears)."""
    d = load(spark, sf_dir, "documents")
    return pack.pack_chunks_per_key(d, "source", context_len=512)


Q_PACK_PER_SOURCE_SQL = """
with c as (
  select source, doc_id, len(string_split(text, ' '))::BIGINT n_tokens
  from documents
),
o as (
  select source, doc_id, n_tokens,
         coalesce(sum(n_tokens) over (partition by source order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::BIGINT
           start_offset
  from c
)
select source, doc_id, n_tokens, start_offset,
       (start_offset // 512)::BIGINT chunk_id,
       ((start_offset + n_tokens - 1) // 512)::BIGINT last_chunk_id,
       ((start_offset // 512) != ((start_offset + n_tokens - 1) // 512))::BIGINT
         straddles
from o order by source, doc_id
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (context-window prep ahead of
    tokenization): pure split + sequence + posexplode + slice - one
    scan, no shuffle, parallel at any corpus size."""
    d = load(spark, sf_dir, "documents")
    return pack.chunk_documents(d, chunk_tokens=64, stride=48)


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution (bits) - the
    low-entropy signal quality filters use to drop templated/repetitive
    docs. One doc_id-keyed two-level aggregate, map-combined:
    H = log2(n) - sum(c*log2(c))/n over per-token counts c."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr("doc_id", "explode(split(text, ' ')) as t")
    per = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .select("doc_id", "n_tokens", "n_distinct", "entropy")
    )


Q_TOKEN_ENTROPY_SQL = """
with tok as (select doc_id, unnest(string_split(text, ' ')) t from documents),
per as (select doc_id, t, count(*) c from tok group by doc_id, t)
select doc_id, sum(c)::BIGINT n_tokens, count(*)::BIGINT n_distinct,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) entropy
from per group by doc_id
order by doc_id
"""


def q_unigram_surprisal(
    spark: SparkSession, sf_dir: str, top_v: int | None = None
) -> DataFrame:
    """CCNet-style unigram LM quality score: train a unigram model on
    the corpus itself (token -> ln(count/total)), then score each doc
    by its mean token log-probability. Low |lp_mean| = common/templated
    text, high = rare-token-heavy - the standard perplexity-filter
    signal, reduced to its shuffle-friendly unigram core. Two aggs (one
    token-keyed, one doc-keyed) + a vocab lookup join; the vocab table
    is far smaller than the token stream, so Catalyst broadcasts it.

    The corpus total is a SCALAR AGGREGATE joined back via a broadcast
    cross join (one row) - never a global window, so no stage is ever
    single-partition. With ``top_v`` set, the vocab is capped to the V
    most frequent tokens (deterministic count-desc/token-asc order) and
    every other token scores at the OOV floor ln(1/total): that bounds
    the broadcast at 100 TB where the distinct-token table is billions
    of rows. Default (gate form) is the full self-trained vocab, which
    keeps the oracle closed-form. Per-token lp rounds to 9 (same value
    both engines), the doc mean to 6 (absorbs float sum-order
    differences)."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr("doc_id", "explode(split(text, ' ')) as t")
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("_corpus_total"))
    if top_v is None:
        lp = counts.crossJoin(F.broadcast(total)).select(
            "t",
            F.round(
                F.log(F.col("c").cast("double") / F.col("_corpus_total")), 9
            ).alias("lp"),
        )
        # full-vocab path: leave the lookup-join strategy to Catalyst/AQE
        # (a self-trained vocab can outgrow a forced broadcast)
        scored = tok.join(lp, "t")
    else:
        kept = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_v)
        lp = kept.crossJoin(F.broadcast(total)).select(
            "t",
            F.round(
                F.log(F.col("c").cast("double") / F.col("_corpus_total")), 9
            ).alias("lp"),
        )
        floor = total.select(
            F.round(F.log(F.lit(1.0) / F.col("_corpus_total")), 9).alias("_oov_lp")
        )
        scored = (
            tok.join(F.broadcast(lp), "t", "left")
            .crossJoin(F.broadcast(floor))
            .withColumn("lp", F.coalesce("lp", "_oov_lp"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("lp_mean"),
        )
        .select("doc_id", "n_tokens", "lp_mean")
    )


Q_UNIGRAM_SURPRISAL_SQL = """
with tok as (select doc_id, unnest(string_split(text, ' ')) as t from documents),
counts as (select t, count(*) c from tok group by t),
lp as (select t, round(ln(c::DOUBLE / (sum(c) over ())::DOUBLE), 9) lp from counts)
select doc_id, count(*)::BIGINT n_tokens, round(avg(lp), 6) lp_mean
from tok join lp using (t)
group by doc_id
"""


def q_dsir_weights(
    spark: SparkSession, sf_dir: str, top_v: int | None = None, alpha: float = 0.5
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, reduced to its
    unigram core): treat the lang='en' slice as the target domain,
    estimate smoothed unigram distributions for target and raw corpus,
    and score every doc by its summed token log-likelihood ratio
    ln p_T(t) - ln p_R(t). High dsir_logw = looks like the target
    domain — the importance-resampling signal for data selection.

    One token-keyed aggregate computes BOTH distributions (c_raw =
    count, c_target = conditional sum — no second pass over the token
    stream), the three totals are a scalar aggregate broadcast back via
    cross join (never a global window), and the per-doc score is one
    doc-keyed agg. With ``top_v`` the vocab caps at the V most frequent
    tokens and everything else scores at the closed-form OOV floor
    ln((R+aV)/(T+aV)) — the bounded-broadcast shape for a
    billions-of-tokens vocab at 100 TB. Laplace-style ``alpha``
    smoothing keeps target-absent tokens finite."""
    d = load(spark, sf_dir, "documents")
    tok = d.selectExpr(
        "doc_id",
        "cast(lang = 'en' as long) as is_t",
        "explode(split(text, ' ')) as t",
    )
    counts = tok.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("c_r"),
        F.sum("is_t").cast("double").alias("c_t"),
    )
    tot = counts.agg(
        F.sum("c_r").alias("_r_tot"),
        F.sum("c_t").alias("_t_tot"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    a = F.lit(float(alpha))
    # per-token LLR in integer NANO-units: round-9 absorbs last-ulp libm
    # differences, and summing longs (not doubles) makes the per-doc
    # reduction exact and order-independent — bit-identical on any
    # partitioning and in the oracle
    llr_expr = (
        F.round(
            F.round(
                F.log((F.col("c_t") + a) / (F.col("_t_tot") + a * F.col("_v")))
                - F.log((F.col("c_r") + a) / (F.col("_r_tot") + a * F.col("_v"))),
                9,
            )
            * F.lit(1e9),
            0,
        )
        .cast("long")
        .alias("llr")
    )
    if top_v is None:
        llr = counts.crossJoin(F.broadcast(tot)).select("t", llr_expr)
        scored = tok.join(llr, "t")
    else:
        kept = counts.orderBy(F.col("c_r").desc(), F.col("t").asc()).limit(top_v)
        llr = kept.crossJoin(F.broadcast(tot)).select("t", llr_expr)
        floor = tot.select(
            F.round(
                F.round(
                    F.log(
                        (F.col("_r_tot") + a * F.col("_v"))
                        / (F.col("_t_tot") + a * F.col("_v"))
                    ),
                    9,
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("_oov_llr")
        )
        scored = (
            tok.join(F.broadcast(llr), "t", "left")
            .crossJoin(F.broadcast(floor))
            .withColumn("llr", F.coalesce("llr", "_oov_llr"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("llr").cast("double") / F.lit(1e9), 6).alias("dsir_logw"),
        )
        .select("doc_id", "n_tokens", "dsir_logw")
    )


Q_DSIR_SQL = """
with tok as (
  select doc_id, (lang = 'en')::int is_t, unnest(string_split(text, ' ')) t
  from documents
),
counts as (
  select t, count(*)::DOUBLE c_r, sum(is_t)::DOUBLE c_t from tok group by t
),
tot as (
  select sum(c_r) r_tot, sum(c_t) t_tot, count(*)::DOUBLE v from counts
),
llr as (
  select t, round(round(ln((c_t + 0.5) / (t_tot + 0.5 * v))
                      - ln((c_r + 0.5) / (r_tot + 0.5 * v)), 9)
                  * 1e9, 0)::BIGINT llr
  from counts, tot
)
select doc_id, count(*)::BIGINT n_tokens,
       round(sum(llr)::DOUBLE / 1e9, 6) dsir_logw
from tok join llr using (t)
group by doc_id order by doc_id
"""


def q_bigram_surprisal(
    spark: SparkSession, sf_dir: str, lam: float = 0.75, top_v: int | None = None
) -> DataFrame:
    """KenLM-lite perplexity filter: an interpolated bigram LM trained
    on the corpus itself — p(w|u) = lam * c(uw)/c(u) + (1-lam) *
    c(w)/N — scoring each doc by mean bigram log-probability. The
    stronger cousin of ``unigram_surprisal``: templated text scores
    near 0, incoherent token salad scores very negative.

    Shape: bigrams come from array expressions (no window, no
    self-join for adjacency), both count tables are map-combined aggs,
    the model joins are token-/bigram-keyed hash joins (AQE broadcasts
    the vocab side while it fits), and the per-doc reduction sums exact
    integer nano-units so the result is partitioning-independent.

    ``top_v`` caps the BIGRAM table at the V most frequent bigrams
    (deterministic count-desc/bigram-asc TakeOrdered); an out-of-vocab
    bigram backs off to the unigram half of the interpolation,
    ln((1-lam)·c(w)/N) — the bounded-broadcast shape at 100 TB where
    the distinct-bigram table is far larger than the token vocab.
    Default (gate form) is the full closed-form model."""
    d = load(spark, sf_dir, "documents")
    sh2 = text.word_shingles_sql("split(text, ' ')", 2)
    big = d.selectExpr("doc_id", "explode(%s) as bg" % sh2)
    uni = (
        d.selectExpr("explode(split(text, ' ')) as t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    n_tot = uni.agg(F.sum("c1").alias("_n")).select(
        F.col("_n").cast("double").alias("_n")
    )
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    if top_v is not None:
        c2 = c2.orderBy(F.col("c2").desc(), F.col("bg").asc()).limit(top_v)
    lm = (
        c2.selectExpr("bg", "c2", "split(bg, ' ')[0] as prev", "split(bg, ' ')[1] as cur")
        .join(uni.select(F.col("t").alias("prev"), F.col("c1").alias("c_prev")), "prev")
        .join(uni.select(F.col("t").alias("cur"), F.col("c1").alias("c_cur")), "cur")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "bg",
            F.round(
                F.round(
                    F.log(
                        F.lit(float(lam)) * F.col("c2") / F.col("c_prev")
                        + F.lit(1.0 - float(lam)) * F.col("c_cur") / F.col("_n")
                    ),
                    9,
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    if top_v is None:
        scored = big.join(lm, "bg")
    else:
        # OOV bigram → unigram backoff ln((1-lam)·c(cur)/N); the uni
        # table is token-vocab-sized (broadcastable long after the
        # bigram table isn't)
        floor = (
            uni.crossJoin(F.broadcast(n_tot))
            .select(
                F.col("t").alias("cur"),
                F.round(
                    F.round(
                        F.log(
                            F.lit(1.0 - float(lam)) * F.col("c1") / F.col("_n")
                        ),
                        9,
                    )
                    * F.lit(1e9),
                    0,
                )
                .cast("long")
                .alias("_oov_lp"),
            )
        )
        scored = (
            big.join(F.broadcast(lm), "bg", "left")
            .withColumn("cur", F.expr("split(bg, ' ')[1]"))
            .join(F.broadcast(floor), "cur")
            .withColumn("lp", F.coalesce("lp", "_oov_lp"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("lp").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
            ).alias("lp_mean"),
        )
        .select("doc_id", "n_bigrams", "lp_mean")
    )


Q_BIGRAM_SURPRISAL_SQL = """
with docs_t as (select doc_id, string_split(text, ' ') toks from documents),
big as (
  select doc_id, unnest({sh2}) bg from docs_t
),
uni as (
  select t, count(*)::DOUBLE c1
  from (select unnest(toks) t from docs_t) group by t
),
tot as (select sum(c1) n from uni),
c2 as (select bg, count(*)::DOUBLE c2 from big group by bg),
lm as (
  select c2.bg,
         round(round(ln({lam} * c2.c2 / pu.c1 + {one_m_lam} * cu.c1 / tot.n), 9)
               * 1e9, 0)::BIGINT lp
  from c2
  join uni pu on pu.t = string_split(c2.bg, ' ')[1]
  join uni cu on cu.t = string_split(c2.bg, ' ')[2]
  cross join tot
)
select doc_id, count(*)::BIGINT n_bigrams,
       round(sum(lp)::DOUBLE / 1e9 / count(*), 6) lp_mean
from big join lm using (bg)
group by doc_id order by doc_id
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str, top_n: int = 10) -> DataFrame:
    """Join-key skew diagnostic: the ``top_n`` hottest user_ids with
    their event counts and corpus share — the pre-flight check before
    any user-keyed join/window at scale (a 5% hot key means salting,
    AQE skew-join, or a key blacklist BEFORE the shuffle, not after it
    times out). One map-combined count agg + a partial top-k
    (TakeOrdered, never a global sort) + a 1-row total broadcast."""
    e = load(spark, sf_dir, "events")
    # persisted: counts feeds both the scalar total and the top-k
    counts = _tracked_persist(
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(top_n)
    return top.crossJoin(F.broadcast(total)).select(
        "user_id",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
    )


Q_KEY_SKEW_SQL = """
with c as (select user_id, count(*) cnt from events group by user_id),
t as (select sum(cnt)::DOUBLE total from c)
select user_id, cnt::BIGINT cnt, round(cnt / total, 6) as "share"
from c cross join t
order by cnt desc, user_id asc limit {n}
"""


def q_token_zipf(spark: SparkSession, sf_dir: str, top_n: int = 50) -> DataFrame:
    """Corpus token-frequency (Zipf) curve: the ``top_n`` most frequent
    tokens with rank, count, share, and cumulative share — the vocab
    health monitor (a too-flat head = templated corpus; a cum_share
    that saturates early = low diversity). The distributed part is one
    map-combined token count + a partial top-k; the cumulative sum runs
    driver-side over exactly ``top_n`` collected rows (metadata-sized —
    never a single-partition window over the full vocab)."""
    d = load(spark, sf_dir, "documents")
    # persisted: the token-count shuffle feeds two actions (total +
    # top-N) — without it the corpus explode/agg executes twice
    counts = _tracked_persist(
        d.selectExpr("explode(split(text, ' ')) as t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c")).collect()[0][0]
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_n).collect()

    def r6(x: float) -> float:
        return _round_half_away(x, 6)

    rows, cum = [], 0
    for i, r in enumerate(top):
        cum += r["c"]
        rows.append(
            (
                i + 1,
                r["t"],
                int(r["c"]),
                r6(r["c"] / float(total)),
                r6(cum / float(total)),
            )
        )
    return spark.createDataFrame(
        rows, "rank long, token string, c long, share double, cum_share double"
    )


Q_TOKEN_ZIPF_SQL = """
with tok as (select unnest(string_split(text, ' ')) t from documents),
c as (select t, count(*) c from tok group by t),
tot as (select sum(c)::DOUBLE total from c),
top as (
  select t, c, row_number() over (order by c desc, t asc) rank
  from c order by c desc, t asc limit {n}
)
select rank::BIGINT rank, t token, c::BIGINT c,
       round(c / total, 6) as "share",
       round((sum(c) over (order by rank))::DOUBLE / total, 6) cum_share
from top cross join tot
order by rank
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style repetition filters):
    duplicate bigram/trigram fraction + the hottest trigram's
    multiplicity. Bigram stats are pure array expressions (scan-speed);
    the trigram multiplicity needs a per-(doc, gram) count — both aggs
    key on doc_id first, so the shuffle is map-combined and
    skew-free."""
    d = load(spark, sf_dir, "documents")
    sh2 = text.word_shingles_sql("toks", 2)
    sh3 = text.word_shingles_sql("toks", 3)
    staged = d.selectExpr("doc_id", "split(text, ' ') as toks")
    big = staged.selectExpr(
        "doc_id",
        "size(%s) as n2" % sh2,
        "size(array_distinct(%s)) as d2" % sh2,
    )
    tri = staged.selectExpr("doc_id", "explode(%s) as t" % sh3)
    s3 = (
        tri.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n3"),
            F.count(F.lit(1)).alias("d3"),
            F.max("c").alias("max_rep"),
        )
    )
    return big.join(s3, "doc_id").selectExpr(
        "doc_id",
        "round(1.0 - cast(d2 as double) / cast(n2 as double), 6)"
        " as dup_bigram_frac",
        "round(1.0 - cast(d3 as double) / cast(n3 as double), 6)"
        " as dup_trigram_frac",
        "cast(max_rep as bigint) as max_trigram_reps",
    )


Q_REPETITION_SQL = """
with toks as (select doc_id, string_split(text, ' ') toks from documents),
b as (
  select doc_id, len({sh2}) n2, len(list_distinct({sh2})) d2 from toks
),
t3 as (select doc_id, unnest({sh3}) t from toks),
per as (select doc_id, t, count(*) c from t3 group by doc_id, t),
s3 as (
  select doc_id, sum(c) n3, count(*) d3, max(c) max_rep from per group by doc_id
)
select b.doc_id,
       round(1.0 - d2::DOUBLE / n2::DOUBLE, 6) dup_bigram_frac,
       round(1.0 - d3::DOUBLE / n3::DOUBLE, 6) dup_trigram_frac,
       max_rep::BIGINT max_trigram_reps
from b join s3 using (doc_id)
order by doc_id
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules composite quality filter: every doc with its stats,
    a keep flag, and a drop_reasons audit trail. Pure scan-speed
    per-row arithmetic — zero shuffles, column-pruned to
    (doc_id, text); at 100 TB this runs at parquet-read throughput."""
    d = load(spark, sf_dir, "documents")
    return text.gopher_filter(d)


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end 'keep the best copy': MinHash-LSH candidates → exact
    verify → converged components → per-cluster argmax-quality
    representative. The argmax is a map-combinable max-struct
    aggregate, not a window sort, so giant clusters never serialize
    through one reducer."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    labels = dedup.connected_components_converged(pairs)
    scored = d.select("doc_id", text.quality_score("text").alias("quality"))
    return dedup.canonical_docs(labels, scored)


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style paragraph-level dedup: drop exact-duplicate
    20-token segments corpus-wide (first occurrence survives) and
    reassemble each document. Shuffles digests, not text; the
    first-occurrence pass is a map-combined aggregate, so boilerplate
    repeated a billion times never serializes through one reducer."""
    d = load(spark, sf_dir, "documents")
    return dedup.segment_dedup(d, block_tokens=20)


def q_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2-style interval build: collapse each user's event stream
    into validity intervals of consecutive same-type runs — (user,
    event_type, valid_from_us, valid_to_us, n_events), half-open, with
    the current run's valid_to_us NULL. The dimension-history shape
    (track attribute changes over time) built from an append-only fact
    stream.

    All windows partition on user_id (one hash shuffle, reused across
    the lag/run-id/lead chain — Catalyst plans them in one Window
    stage); ordering is (ts, event_id) so ties are deterministic;
    interval arithmetic is integer µs."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    runs = e.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("run_id", F.sum("chg").over(w))
    ivals = runs.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("event_type"),
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return ivals.select(
        "user_id",
        F.col("run_id").cast("bigint").alias("run_id"),
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events",
    )


Q_USER_STATE_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
r as (
  select *,
         case when lag(event_type) over w is null
                   or lag(event_type) over w != event_type
              then 1 else 0 end chg
  from e window w as (partition by user_id order by us, event_id)
),
rr as (
  select *, sum(chg) over (partition by user_id order by us, event_id
                           rows unbounded preceding) run_id
  from r
),
iv as (
  select user_id, run_id, any_value(event_type) event_type,
         min(us) valid_from_us, count(*)::BIGINT n_events
  from rr group by user_id, run_id
)
select user_id, run_id::BIGINT run_id, event_type, valid_from_us,
       lead(valid_from_us) over (partition by user_id order by run_id)
         valid_to_us,
       n_events
from iv order by user_id, run_id
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot promotion audit: diff two table versions
    (simulated here: v1 = docs with id < 250, every 7th doc carrying a
    'v1 ' edit marker, v2 = raw docs with id >= 100) and count per
    (source, status) — added / removed / changed / unchanged. Only
    32-byte digests shuffle into the full outer join; content never
    does."""
    d = load(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") < 250).select(
        "doc_id",
        "source",
        F.expr(
            "case when doc_id % 7 = 0 then concat('v1 ', text) else text end"
        ).alias("text"),
    )
    new = d.where(F.col("doc_id") >= 100).select("doc_id", "source", "text")
    diff = scale.snapshot_diff(old, new)
    return (
        diff.groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select("source", "status", "n")
    )


Q_SNAPSHOT_DIFF_SQL = """
with old as (
  select doc_id, source,
         case when doc_id % 7 = 0 then 'v1 ' || text else text end as "text"
  from documents where doc_id < 250
),
new as (
  select doc_id, source, text from documents where doc_id >= 100
),
j as (
  select coalesce(n.doc_id, o.doc_id) doc_id,
         coalesce(n.source, o.source) source,
         case when o.doc_id is null then 'added'
              when n.doc_id is null then 'removed'
              when md5(o.text) != md5(n.text) then 'changed'
              else 'unchanged' end status
  from old o full outer join new n on o.doc_id = n.doc_id
)
select source, status, count(*)::BIGINT n
from j group by source, status order by source, status
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split leakage audit: near-dup pairs that CROSS the
    deterministic train/val/test boundary — each held-out doc paired
    with its training-set near-duplicate and the similarity. A non-empty
    result means the benchmark leaks: the held-out doc's content is
    effectively in the training mix and its eval number is
    memorization, not generalization. Composes the hash-stable split
    (no rand(), docs never migrate) with the MinHash-LSH + exact-verify
    pair path; the split labels are a scan-speed projection joined onto
    the (small by construction) pair set."""
    d = load(spark, sf_dir, "documents")
    b = text.stable_sample_pct("doc_id")
    labeled = d.select(
        "doc_id",
        F.when(b < 90, F.lit("train")).otherwise(F.lit("heldout")).alias("split"),
    )
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    j = pairs.join(
        labeled.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
        "doc_a",
    ).join(
        labeled.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
        "doc_b",
    )
    leaked = j.where(F.col("split_a") != F.col("split_b"))
    return leaked.select(
        F.when(F.col("split_a") == "heldout", F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("heldout_doc"),
        F.when(F.col("split_a") == "heldout", F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("train_doc"),
        "jaccard",
    )


Q_SPLIT_LEAKAGE_SQL = """
with p as ({pairs}),
lab as (
  select doc_id,
         case when {bucket} < 90 then 'train' else 'heldout' end split
  from documents
)
select case when a.split = 'heldout' then p.doc_a else p.doc_b end heldout_doc,
       case when a.split = 'heldout' then p.doc_b else p.doc_a end train_doc,
       p.jaccard
from p
join lab a on a.doc_id = p.doc_a
join lab b on b.doc_id = p.doc_b
where a.split != b.split
order by heldout_doc, train_doc
"""


def q_near_dup_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pair counts and mean
    similarity per unordered (source, source) cell — the provenance
    report that shows WHICH feeds copy from each other (mirror sites,
    syndication) vs merely self-duplicate. Pairs come from the standard
    MinHash-LSH + exact-verify path; the doc→source lookup joins
    broadcast-small against the (tiny by construction) pair set; the
    mean similarity sums exact micro-units of the round-6 jaccard, so
    the cell values are partitioning-independent."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    src = d.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            F.round(F.col("jaccard") * 1e6, 0).cast("long").alias("jm"),
        )
    )
    return j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.sum("jm").cast("double") / 1e6 / F.count(F.lit(1)), 6
        ).alias("mean_jaccard"),
    )


Q_NEAR_DUP_SOURCES_SQL = """
with p as ({pairs})
select least(a.source, b.source) source_a,
       greatest(a.source, b.source) source_b,
       count(*)::BIGINT n_pairs,
       round(sum(round(p.jaccard * 1e6, 0)::BIGINT)::DOUBLE / 1e6 / count(*), 6)
         mean_jaccard
from p
join documents a on a.doc_id = p.doc_a
join documents b on b.doc_id = p.doc_b
group by 1, 2 order by 1, 2
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2-bucketed token-length histogram — the length
    distribution a curation dashboard plots (truncation spikes show as
    a bucket wall; boilerplate shows as one dominant bucket). Pure
    integer bucket math (floor(log2) via bit length is engine-exact on
    positive counts) and one map-combined aggregate."""
    d = load(spark, sf_dir, "documents")
    lens = d.selectExpr(
        "source",
        "cast(size(split(text, ' ')) as bigint) as n",
    ).selectExpr(
        "source",
        # floor(log2(n)) as the bucket; n >= 1 always (split of any
        # string yields at least one token)
        "cast(floor(log2(n)) as bigint) as bucket",
        "n",
    )
    return lens.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n").cast("bigint").alias("min_tokens"),
        F.max("n").cast("bigint").alias("max_tokens"),
    )


Q_LENGTH_HISTOGRAM_SQL = """
with l as (
  select source, len(string_split(text, ' '))::BIGINT n from documents
)
select source, floor(log2(n))::BIGINT bucket,
       count(*)::BIGINT n_docs,
       min(n)::BIGINT min_tokens, max(n)::BIGINT max_tokens
from l group by source, bucket order by source, bucket
"""


def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health card: doc/token totals, token-count
    median/p95, exact mean quality, and language-mix entropy — the
    number a pipeline dashboard plots per snapshot. Everything reduces
    map-side; the entropy sums per-language nano-unit terms (exact
    longs, order-independent) so the single row is bit-stable across
    partitionings and engines."""
    d = load(spark, sf_dir, "documents")
    # persisted: staged feeds the base agg, the lang histogram, AND the
    # lang total — unpersisted, the scan + quality projection runs 3x
    staged = _tracked_persist(
        d.selectExpr(
            "lang",
            "cast(size(split(text, ' ')) as bigint) as n_tokens",
            "%s as quality" % text.quality_score_sql("split(text, ' ')"),
        )
    )
    base = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 4).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 4).alias("p95_tokens"),
        F.round(
            F.sum(F.round(F.col("quality") * 1e6, 0).cast("long")).cast("double")
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    lang_terms = (
        staged.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(staged.agg(F.count(F.lit(1)).cast("double").alias("_n"))))
        .select(
            F.round(
                F.round(
                    -(F.col("c") / F.col("_n")) * F.log(F.col("c") / F.col("_n")), 9
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("t")
        )
    )
    entropy = lang_terms.agg(
        F.round(F.sum("t").cast("double") / 1e9, 6).alias("lang_entropy")
    )
    return base.crossJoin(F.broadcast(entropy))


Q_CORPUS_SUMMARY_SQL = """
with s as (
  select lang, len(string_split(text, ' '))::BIGINT n_tokens, {quality} quality
  from documents
),
base as (
  select count(*)::BIGINT n_docs, sum(n_tokens)::BIGINT total_tokens,
         round(quantile_cont(n_tokens, 0.5), 4) p50_tokens,
         round(quantile_cont(n_tokens, 0.95), 4) p95_tokens,
         round(sum(round(quality * 1e6, 0)::BIGINT)::DOUBLE / 1e6 / count(*), 6)
           mean_quality
  from s
),
lc as (select lang, count(*)::DOUBLE c from s group by lang),
tot as (select count(*)::DOUBLE n from s),
terms as (
  select round(round(-(c / n) * ln(c / n), 9) * 1e9, 0)::BIGINT t
  from lc cross join tot
),
ent as (select round(sum(t)::DOUBLE / 1e9, 6) lang_entropy from terms)
select base.*, ent.lang_entropy from base cross join ent
"""


def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation audit: keep rate, mean quality, and the
    drop-reason histogram (exploded from the Gopher filter's audit
    string) — the report a data lead reads before committing
    thresholds. One scan-speed flag projection + two map-combined
    aggregates keyed on (source[, reason]); mean quality sums exact
    micro-units so the report is partitioning-independent."""
    d = load(spark, sf_dir, "documents")
    # persisted: flags feeds the per-source base agg AND the reason
    # histogram — unpersisted, the whole gopher projection runs twice
    flags = _tracked_persist(
        text.gopher_filter(d).join(d.select("doc_id", "source"), "doc_id")
    )
    base = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.round(F.col("quality") * 1e6, 0).cast("long")).cast("double")
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    reasons = (
        flags.where(F.col("keep") == 0)
        .select("source", F.explode(F.split("drop_reasons", ",")).alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("reason", "cnt"))
                    ),
                    lambda s: F.concat_ws(":", s["reason"], s["cnt"].cast("string")),
                ),
                " ",
            ).alias("drop_histogram")
        )
    )
    return base.join(reasons, "source", "left").select(
        "source",
        "n_docs",
        "n_kept",
        "mean_quality",
        F.coalesce("drop_histogram", F.lit("")).alias("drop_histogram"),
    )


Q_SOURCE_QUALITY_SQL = """
with g as ({gopher}),
f as (
  select g.*, d.source from g join documents d using (doc_id)
),
base as (
  select source, count(*)::BIGINT n_docs, sum(keep)::BIGINT n_kept,
         round(sum(round(quality * 1e6, 0)::BIGINT)::DOUBLE / 1e6 / count(*), 6)
           mean_quality
  from f group by source
),
r as (
  select source, unnest(string_split(drop_reasons, ',')) reason
  from f where keep = 0
),
rc as (select source, reason, count(*)::BIGINT cnt from r group by 1, 2),
hist as (
  select source,
         array_to_string(
           list(reason || ':' || cnt order by reason, cnt), ' ') drop_histogram
  from rc group by source
)
select base.source, n_docs, n_kept, mean_quality,
       coalesce(drop_histogram, '') drop_histogram
from base left join hist using (source)
order by source
"""


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the dedup health report:
    (cluster_size → how many clusters), from the converged components
    labeling. A heavy tail here means boilerplate families the
    near-dup threshold is merging; a spike at 2 means mostly true
    pairs. Two map-combined aggregates on top of the components
    fixpoint; nothing new shuffles at data scale."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    labels = dedup.connected_components_converged(pairs)
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(F.col("cluster_size").cast("bigint").alias("cluster_size"), "n_clusters")
    )


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over the binary payload column — the media
    twin of exact text dedup (identical images/audio dedupe by payload
    digest regardless of filename/metadata). One hash-keyed
    map-combined aggregate; digests, not payloads, shuffle."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return (
        d.groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        )
        .select("keep_id", "n_dups", "total_bytes")
    )


Q_MULTIMODAL_DEDUP_SQL = """
select min(doc_id) keep_id, count(*)::BIGINT n_dups,
       sum(octet_length(encode(text)))::BIGINT total_bytes
from documents
group by md5(text) order by keep_id
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-containment pairs (quote/wrapper detection):
    C(A→B) = |S_A∩S_B|/|S_A| ≥ 0.5, both directions. Gate form runs the
    lossless index (max_shingle_df=None) so it matches the brute-force
    oracle; the pipeline default caps hot shingles."""
    d = load(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, threshold=0.5, max_shingle_df=None)


def q_paragraph_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only paragraph dedup: new docs drop segments already in
    the stored corpus and reassemble — the incremental ingestion shape
    (corpus reduces to a stored digest table; the streaming twin
    Bloom-prefilters against the same digests)."""
    d = load(spark, sf_dir, "documents")
    return dedup.segment_dedup_incremental(d, split_id=250, block_tokens=20)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media plumbing end-to-end: text → binary payload → media struct →
    Arrow-batched mapInPandas decode (stubbed codec, real pipeline)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    media = multimodal.as_media(d, "payload", mime="text/plain")
    decoded = multimodal.decode_media(
        media.select("doc_id", F.col("media.data").alias("data"))
    )
    return decoded


Q_MULTIMODAL_SQL = """
select doc_id,
       octet_length(encode(text))::BIGINT byte_size,
       md5(text) md5,
       (('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::BIGINT fake_width,
       (('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::BIGINT fake_height
from documents order by doc_id
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → fixed-width feature vector via Arrow-batched
    mapInPandas (deterministic md5 'model'; see
    multimodal.extract_features). Exploded to scalars for the driver's
    value-hash (array cells hash engine-specifically)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    feats = multimodal.extract_features(d)
    return feats.select(
        "doc_id", F.posexplode("features").alias("idx", "feature")
    ).select(
        "doc_id", F.col("idx").cast("bigint").alias("idx"), "feature"
    )


Q_MULTIMODAL_FEATURES_SQL = """
select doc_id, i::BIGINT idx,
       round((('0x' || substr(md5(text), 2*i + 1, 2))::BIGINT)::DOUBLE / 255.0, 6) feature
from documents, generate_series(0, {dmax}) t(i)
order by doc_id, idx
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, value-gated: the deterministic fake emits the
    payload's md5 digest tiled to the target byte size, so the full
    resized payload is oracle-reproducible (hex-string space — DuckDB
    has no blob substr). Proves batch shape + schema + payload bytes,
    not just row counts."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    resized = multimodal.resize_media(d, width=8, height=8)
    return resized.select(
        "doc_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.lower(F.hex("data")).alias("data_hex"),
    )


Q_MULTIMODAL_RESIZE_SQL = """
select doc_id, 8::BIGINT width, 8::BIGINT height,
       substr(repeat(md5(text), 5), 1, 128) data_hex
from documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, value-gated: evenly spaced byte offsets
    over the payload plus the 16-byte frame slice at each — the demuxer
    contract with the decode step stubbed. Frames compared as hex."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    frames = multimodal.sample_frames(d, n_frames=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "byte_offset",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


Q_MULTIMODAL_FRAMES_SQL = """
with p as (
  select doc_id, octet_length(encode(text)) n, lower(hex(encode(text))) hx
  from documents
),
f as (
  select doc_id, i frame_idx,
         least(i * greatest(1, n // 4), greatest(0, n - 1)) as bo, hx
  from p, generate_series(0, 3) t(i)
)
select doc_id, frame_idx::BIGINT frame_idx, bo::BIGINT byte_offset,
       substr(hx, 2 * bo + 1, 32) frame_hex
from f
"""


def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe=2: each vector probes its two nearest
    centroids, recovering the boundary-split pairs single-probe misses
    — the standard recall/compute dial, at ~2× bucket volume."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.ivf_pairs(
        e, threshold=0.4, n_probe=2, centroids=ivf_quantizer(spark, sf_dir)
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids: posexplode the vectors and average
    per (label, position) — one map-side-combinable shuffle regardless
    of dimensionality, no UDF. The output centroid table is what a
    nearest-class-mean classifier or an IVF trainer consumes."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("pos").cast("bigint").alias("pos"),
            "centroid_val",
            "n_vectors",
        )
    )


Q_LABEL_CENTROIDS_SQL = """
with ex as (
  select label, generate_subscripts(embedding, 1) - 1 pos,
         unnest(embedding) val
  from embeddings
)
select label::BIGINT as label, pos::BIGINT as pos,
       round(avg(val::DOUBLE), 6) centroid_val,
       count(*) n_vectors
from ex group by 1, 2 order by label, pos
"""


def q_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss projection 64 → 16 dims as codegen
    literals: the cheap pre-ANN compression (project, bucket small,
    verify in the original space). Scan-speed; no UDF, no shuffle."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.random_projection(e, dim=64, out_dim=16)


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.quantize_embeddings(e)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF (distributed spherical k-means, √n centroids, 2
    Lloyd iterations; decimal-exact means keep the oracle replay
    bit-identical) + single-probe assignment + bucket-local verify."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.ivf_pairs(
        e, threshold=0.4, centroids=ivf_quantizer(spark, sf_dir)
    )


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-accelerated kNN: queries probe their 2 nearest trained
    centroids and score only those buckets - the top-k shape that
    survives a corpus where brute force (|Q| x n GEMM) no longer does.
    Recall < 1 by construction; the oracle replays the same buckets."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.topk_neighbors_ivf(
        e, query_ids_below=10, k=5, n_probe=2,
        centroids=ivf_quantizer(spark, sf_dir),
    )


def q_ann_topk_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the bucket GEMM on int8-quantized vectors - the
    8x-smaller-working-set variant of ann_topk_ivf (scales cancel in
    the cosine; integer dots keep the oracle bit-exact)."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.topk_neighbors_ivf(
        e, query_ids_below=10, k=5, n_probe=2, int8_verify=True,
        centroids=ivf_quantizer(spark, sf_dir),
    )


def q_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the bucket-local verify scored on symmetric int8
    quantized vectors (per-vector dequant scale cancels in the cosine):
    integer dot products are exact, so the oracle replays bit-for-bit,
    and the verify working set is 8x smaller than float64 — the memory/
    bandwidth shape you want when buckets hold millions of vectors."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.ivf_pairs(
        e, threshold=0.4, int8_verify=True, centroids=ivf_quantizer(spark, sf_dir)
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning: IVF-cluster the embeddings
    (shared quantizer), drop any vector >= 0.4 cosine to a lower-id
    cluster-mate, audit via (vec_id, is_kept, dup_of). The standard
    embedding-level companion to the text near-dup passes."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e, threshold=0.4, centroids=ivf_quantizer(spark, sf_dir)
    )


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. exact-substring
    dedup, n-gram core): token positions covered by a 5-gram occurring
    in >= 2 distinct docs merge into maximal spans — what you cut from
    training text. One explode + one gram-keyed DF agg + a per-doc
    island window; the hot-gram table broadcasts."""
    d = load(spark, sf_dir, "documents")
    return dedup.duplicate_spans(d, ngram=5, min_df=2)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch (doc_id >= 250) deduplicates
    against the already-ingested corpus (doc_id < 250) by normalized
    text — a broadcast/shuffle ANTI-join on the dedup key, the shape an
    append-only ingestion pipeline runs every batch (never re-dedups
    the whole corpus; at scale the seen-keys side is a bucketed table
    keyed by the same hash). Also drops in-batch repeats (keep lowest
    id)."""
    d = load(spark, sf_dir, "documents")
    key = text.normalize_text("text")
    new = d.where(F.col("doc_id") >= 250).select("doc_id", key.alias("k"))
    seen = d.where(F.col("doc_id") < 250).select(key.alias("k")).distinct()
    w = Window.partitionBy("k").orderBy("doc_id")
    return (
        new.join(seen, "k", "left_anti")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )


Q_DEDUP_INCREMENTAL_SQL = """
with kd as (select doc_id, {norm} k from documents),
new as (select * from kd where doc_id >= 250),
seen as (select distinct k from kd where doc_id < 250),
unseen as (
  select n.doc_id, n.k from new n where not exists
    (select 1 from seen s where s.k = n.k)
)
select doc_id from (
  select doc_id, row_number() over (partition by k order by doc_id) rn from unseen
) where rn = 1
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from the hash-stable md5
    bucket (90/5/5): reproducible across runs/engines, no rand(), and a
    document can never migrate between splits when the corpus grows —
    the property leakage-free eval requires. One scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    b = text.stable_sample_pct("doc_id")
    split = (
        F.when(b < 90, F.lit("train")).when(b < 95, F.lit("val")).otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split"))


Q_SPLIT_ASSIGN_SQL = """
select doc_id,
       case when {bucket} < 90 then 'train'
            when {bucket} < 95 then 'val'
            else 'test' end split
from documents
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


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — HyperLogLog++ distinct counts and quantile
    sketches per group. Mergeable partial state is the point at scale:
    partitions build small sketches, the shuffle merges them, and
    nothing data-sized crosses the wire. NO DuckDB oracle by design:
    sketch implementations differ across engines, so the driver records
    the weaker rows-only check and tests/test_relational.py bounds the
    error against exact answers instead."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


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


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): global token offsets via a
    distributed two-phase prefix scan — per-shard windows + P-row shard
    bases — never a single-partition global window. The oracle computes
    the same offsets with one global window; outputs match bit-for-bit
    (integer arithmetic)."""
    d = load(spark, sf_dir, "documents")
    return pack.pack_chunks(d, context_len=2048)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pass: quality scoring → threshold filter →
    normalized-text dedup (keep lowest id) — the cleaning pipeline a
    training corpus runs before tokenization, as ONE plan: a single
    scan-side projection computes all stats, one shuffle deduplicates."""
    d = load(spark, sf_dir, "documents")
    staged = d.selectExpr("doc_id", "text", "split(text, ' ') as __toks")
    scored = staged.select(
        "doc_id",
        "text",
        F.expr("cast(size(__toks) as bigint)").alias("n_tokens"),
        F.expr(text.lang_id_sql("__toks")).alias("lang_pred"),
        F.expr(text.quality_score_sql("__toks")).alias("quality"),
    ).where(F.col("quality") >= 0.4)
    w = Window.partitionBy(text.normalize_text("text")).orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "lang_pred", "quality")
    )


Q_CURATION_SQL = """
with s as (
  select doc_id, text,
         len(string_split(text, ' '))::BIGINT n_tokens,
         {lang} lang_pred,
         {quality} quality
  from documents
),
f as (select * from s where quality >= 0.4),
d as (
  select *, row_number() over (partition by {norm} order by doc_id) rn from f
)
select doc_id, n_tokens, lang_pred, quality from d where rn = 1
"""


def q_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE length filter: each doc is judged against
    its own source's p05/p95 token-count band instead of one global
    threshold (a fixed cut that suits web text amputates code or chat
    transcripts; per-stratum quantiles track each distribution). Exact
    interpolated percentiles (matches quantile_cont) per source — a
    map-combined agg over sources — then a broadcast join back; flags,
    not deletion, so thresholds stay auditable. At 100 TB switch the
    percentile to the mergeable t-digest sketch, same plan shape."""
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    bounds = lens.groupBy("source").agg(
        F.round(F.expr("percentile(n_tokens, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 4).alias("hi"),
    )
    return lens.join(F.broadcast(bounds), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "lo",
        "hi",
        ((F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")))
        .cast("int")
        .alias("keep"),
    )


Q_ADAPTIVE_LENGTH_SQL = """
with l as (
  select doc_id, source, len(string_split(text, ' '))::BIGINT n_tokens
  from documents
),
b as (
  select source,
         round(quantile_cont(n_tokens, 0.05), 4) lo,
         round(quantile_cont(n_tokens, 0.95), 4) hi
  from l group by source
)
select doc_id, l.source, n_tokens, lo, hi,
       (n_tokens >= lo and n_tokens <= hi)::INT keep
from l join b using (source) order by doc_id
"""


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA monitor: per-vector L2 norm, corpus z-score, and an
    outlier flag (|z| > 2) — the pre-flight check before cosine-based
    dedup/ANN (a batch of near-zero or exploding norms usually means an
    upstream encoder bug, and it silently poisons every normalized
    dot product downstream).

    The norm is a JVM-side array fold (no UDF); the corpus moments ride
    ONE map-combined aggregate over integer micro-units (exact,
    order-independent — so the z-scores are bit-identical in the
    oracle) and come back as a 1-row broadcast. Nothing is ever
    single-partition."""
    e = load(spark, sf_dir, "embeddings")
    nrm = e.select(
        "vec_id",
        F.round(similarity._norm_expr("embedding"), 6).alias("nrm"),
    ).withColumn("m", F.round(F.col("nrm") * 1e6, 0).cast("long"))
    # sum of squares in DECIMAL(38,0): a long sum of m*m (~1e12 per
    # unit-norm row) wraps negative past ~9M rows and would silently
    # zero every z-score at exactly the scale the monitor exists for;
    # per-element m*m stays in long range for norms < ~3000
    tot = nrm.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("m").cast("double").alias("_s"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,0)"))
        .cast("double")
        .alias("_ss"),
    )
    mean = (F.col("_s") / 1e6) / F.col("_n")
    # exact integer sums make the variance identical in both engines;
    # clamp at 0 (tiny negative from float subtraction) and define
    # z = 0 on a degenerate (all-equal-norm) corpus instead of erroring
    std = F.sqrt(
        F.greatest((F.col("_ss") / 1e12) / F.col("_n") - mean * mean, F.lit(0.0))
    )
    z = F.when(std <= 0.0, F.lit(0.0)).otherwise(
        F.round((F.col("nrm") - mean) / std, 6)
    )
    return nrm.crossJoin(F.broadcast(tot)).select(
        "vec_id",
        "nrm",
        z.alias("z"),
        (F.abs(z) > 2.0).cast("int").alias("is_outlier"),
    )


Q_EMBEDDING_NORMS_SQL = """
with e as (
  select vec_id,
         round(sqrt(list_dot_product([x::DOUBLE for x in embedding],
                                     [x::DOUBLE for x in embedding])), 6) nrm
  from embeddings
),
m as (select vec_id, nrm, round(nrm * 1e6, 0)::BIGINT mm from e),
tot as (
  select count(*)::DOUBLE n, sum(mm) s, sum(mm * mm) ss from m
),
z as (
  select vec_id, nrm,
         case when sqrt(greatest((ss / 1e12) / n
                                 - ((s / 1e6) / n) * ((s / 1e6) / n), 0.0)) <= 0
              then 0.0
              else round((nrm - (s / 1e6) / n)
                         / sqrt(greatest((ss / 1e12) / n
                                - ((s / 1e6) / n) * ((s / 1e6) / n), 0.0)), 6)
         end z
  from m cross join tot
)
select vec_id, nrm, z, (abs(z) > 2.0)::INT is_outlier
from z order by vec_id
"""


def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 curation pipeline, composed end-to-end as ONE plan:
    Gopher-rules quality filter (scan-speed, zero shuffle) →
    paragraph-level exact dedup with reassembly (digest-keyed,
    map-combined) → normalized-text exact dedup over the REASSEMBLED
    text (catches docs that became identical once their boilerplate
    segments were stripped). Output per surviving doc: token count of
    the cleaned text, how many segments survived, and the re-scored
    quality. Every stage is the registry operator itself, so the oracle
    is the same three stages composed in SQL."""
    d = load(spark, sf_dir, "documents")
    flags = text.gopher_filter(d)
    kept = d.join(flags.where(F.col("keep") == 1).select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    sd = dedup.segment_dedup(kept, block_tokens=20)
    surv = sd.where(F.col("n_kept") > 0).selectExpr(
        "doc_id", "dedup_text as text", "n_kept"
    )
    w = Window.partitionBy(text.normalize_text("text")).orderBy("doc_id")
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
            "n_kept",
            text.quality_score("text").alias("quality"),
        )
    )


Q_CURATION_V2_SQL = """
with g as ({gopher}),
kept as (
  select d.doc_id, d.text from documents d join g using (doc_id)
  where g.keep = 1
),
sd as ({segment}),
surv as (
  select doc_id, dedup_text as "text", n_kept from sd where n_kept > 0
),
n as (
  select *, row_number() over (partition by {norm} order by doc_id) rn
  from surv
)
select doc_id, len(string_split(text, ' '))::BIGINT n_tokens, n_kept,
       {quality} quality
from n where rn = 1 order by doc_id
"""


def q_near_dup_text_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dup pairs joined back to document metadata — the pair set
    (small by construction) joins the doc table twice; AQE picks the
    broadcast side at runtime, so the same plan works when docs are
    100 TB and pairs are thousands."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64)
    meta = d.select("doc_id", F.length("text").cast("bigint").alias("n_chars"))
    return (
        pairs.join(
            meta.select(
                F.col("doc_id").alias("doc_a"), F.col("n_chars").alias("chars_a")
            ),
            "doc_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("doc_b"), F.col("n_chars").alias("chars_b")
            ),
            "doc_b",
        )
        .select("doc_a", "doc_b", "jaccard", "chars_a", "chars_b")
    )


Q_NEAR_DUP_TEXT_JOIN_SQL = """
select p.doc_a, p.doc_b, p.jaccard,
       length(a.text)::BIGINT chars_a, length(b.text)::BIGINT chars_b
from ({pairs}) p
join documents a on a.doc_id = p.doc_a
join documents b on b.doc_id = p.doc_b
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and BPE-style
    pre-tokens (letter runs / digits / punctuation) — the
    tokens-per-doc accounting a training-data pipeline budgets with."""
    d = load(spark, sf_dir, "documents")
    ws = text.token_count("text")
    bpe = text.bpe_token_count("text")
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(
            F.length("text").cast("double") / F.greatest(bpe, F.lit(1)).cast("double"),
            6,
        ).alias("chars_per_token"),
    )


Q_TOKEN_COUNTS_SQL = """
select doc_id,
       len(string_split(text, ' '))::BIGINT ws_tokens,
       {bpe} bpe_tokens,
       round(length(text)::DOUBLE / greatest({bpe}, 1)::DOUBLE, 6) chars_per_token
from documents order by doc_id
"""


# ============================================= relational shapes II


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of a conditional aggregate to the total
    over a fact⋈dim join. part is broadcast (tiny vs lineitem at any
    scale); both sums come out of one map-side-combinable aggregate, so
    the whole query is scan → broadcast-hash-join → single shuffle of
    one partial-agg row per task."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(disc), 6).alias("promo_pct"),
            F.round(F.sum(disc), 2).alias("total_revenue"),
        )
    )


Q_PROMO_SQL = """
select round(100.0 * sum(case when p_type = 'PROMO'
                              then l_extendedprice * (1 - l_discount)
                              else 0.0 end)
             / sum(l_extendedprice * (1 - l_discount)), 6) promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) total_revenue
from lineitem join part on l_partkey = p_partkey
where l_shipdate >= TIMESTAMP '1997-01-01'
  and l_shipdate < TIMESTAMP '1998-01-01'
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → global-max scalar → equality filter.
    The per-supplier revenue table is tiny relative to the fact table,
    so the max is computed on the aggregate and broadcast back — no
    second pass over lineitem, no single-partition window over the full
    aggregate (which would serialize at scale)."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q_TOP_SUPPLIER_SQL = """
with rev as (
  select l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) total_revenue
  from lineitem
  where l_shipdate >= TIMESTAMP '1997-01-01'
    and l_shipdate < TIMESTAMP '1997-07-01'
  group by l_suppkey
)
select s_suppkey, s_name, total_revenue
from supplier join rev on s_suppkey = l_suppkey
where total_revenue = (select max(total_revenue) from rev)
order by s_suppkey
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average consumed by a
    row-level filter. Expressed as a window avg over the join result —
    one shuffle on l_partkey serves both the avg and the filter (the
    classic self-join formulation scans lineitem twice). The per-part
    avg is computed over exact integers (quantities are integral) so
    the 0.2× threshold is bit-identical across engines regardless of
    summation order."""
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    l = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (
        F.sum(F.col("l_quantity").cast("long")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        joined.withColumn("avg_qty", avg_qty)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q_SMALL_QTY_SQL = """
select round(sum(l_extendedprice) / 7.0, 2) avg_yearly
from (
  select l_extendedprice, l_quantity,
         sum(l_quantity::BIGINT) over (partition by l_partkey)::DOUBLE
           / count(*) over (partition by l_partkey)::DOUBLE avg_qty
  from lineitem join part on p_partkey = l_partkey
  where p_brand = 'Brand#12'
)
where l_quantity < 0.2 * avg_qty
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING aggregate feeds a join back to the
    order/customer detail. The big-order key set is small after the
    HAVING filter, so it broadcasts into orders; customer is broadcast
    outright. lineitem is shuffled once (on l_orderkey) for the
    aggregate — the detail join reuses the broadcast, not a second
    shuffle of the fact table."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 180)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


Q_LARGE_VOLUME_SQL = """
select c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') orderdate,
       round(o_totalprice, 2) totalprice, total_qty
from orders
join (
  select l_orderkey, round(sum(l_quantity), 2) total_qty
  from lineitem group by l_orderkey
  having round(sum(l_quantity), 2) > 180
) big on o_orderkey = big.l_orderkey
join customer on o_custkey = c_custkey
order by totalprice desc, o_orderkey
"""


def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    The per-side conjuncts (brand/size on part, quantity on lineitem)
    are pulled out of the disjunction by Catalyst and pushed to the
    scans; the residual cross-side disjunction evaluates inside the
    broadcast hash join."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q_DISJUNCTIVE_SQL = """
select round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
       count(*) n_lines
from lineitem join part on l_partkey = p_partkey
where (p_brand = 'Brand#12' and p_size between 1 and 15
       and l_quantity between 1 and 11)
   or (p_brand = 'Brand#23' and p_size between 1 and 25
       and l_quantity between 10 and 20)
   or (p_brand = 'Brand#3' and p_size between 1 and 40
       and l_quantity between 20 and 30)
"""


def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join. The
    positive-balance average is one scalar broadcast into the filter;
    above-average customers with no URGENT orders survive a left-anti
    join against the filtered orders key set (shuffle on custkey; at
    scale the anti join's right side is the deduped key column only,
    not whole orders rows — every customer has *some* order in this
    data, so the unfiltered Q22 form would be vacuously empty)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


Q_RICH_IDLE_SQL = """
select c_nationkey::BIGINT nationkey,
       count(*) n_custs,
       round(sum(c_acctbal), 2) total_bal
from customer
where c_acctbal > (select round(avg(c_acctbal), 4) from customer where c_acctbal > 0)
  and not exists (select 1 from orders
                  where o_custkey = c_custkey
                    and o_orderpriority = '1-URGENT')
group by 1 order by 1
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


# ============================================= scale operators II


def q_events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase paired with the latest click at-or-
    before it by the same user. Implemented as a tagged union + one
    window pass — both sides shuffle ONCE on user_id and the as-of
    semantics come from sort order (clicks sort before purchases at
    equal ts, matching the oracle's ts >= ts inequality), instead of a
    per-row range probe. This is the scalable plan: no range join, no
    broadcast, state is one running value per user.

    Clicks are deduped to (user_id, ts) first so ties can't make the
    answer engine-dependent."""
    e = load(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .select("user_id", "ts")
        .distinct()
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"), F.col("event_id").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "last_click_us",
        F.last(
            F.when(F.col("tag") == 0, F.unix_micros("ts")), ignorenulls=True
        ).over(w),
    )
    return (
        tagged.where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            "last_click_us",
            ((F.unix_micros("ts") - F.col("last_click_us")) / F.lit(1000000))
            .cast("long")
            .alias("gap_sec"),
        )
    )


Q_ASOF_SQL = """
with clicks as (
  select distinct user_id, ts from events where event_type = 'click'
),
p as (
  select event_id, user_id, ts from events where event_type = 'purchase'
)
select p.event_id, p.user_id,
       epoch_us(p.ts) purchase_us,
       epoch_us(c.ts) last_click_us,
       ((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000)::BIGINT gap_sec
from p asof left join clicks c
  on p.user_id = c.user_id and p.ts >= c.ts
order by event_id
"""


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: for every click, the count and value of
    the same user's purchases inside the following 10 minutes — the
    attribution-window query. A plain user-keyed join with a range
    filter degenerates to a per-user cross product (a bot user with
    millions of events goes quadratic on one task); this is the
    BUCKETIZED range join instead: purchases hash into fixed 10-min
    epoch buckets, each click probes exactly its 2 candidate buckets
    (explode of a 2-element array — the window spans at most 2), and
    the equi-join on (user, bucket) lets Catalyst hash-partition both
    sides. Per-pair work is bounded by bucket occupancy, not user
    history length. Window arithmetic is integer µs — engine-exact."""
    win_us = 600 * 1_000_000
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("c_us")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"), "value")
        .withColumn("bucket", F.expr("p_us div %d" % win_us))
    )
    # integer `div`, not float division: a click exactly on a bucket
    # boundary must probe the same bucket the purchase hashed into
    probes = clicks.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr("c_us div %d" % win_us),
                F.expr("c_us div %d + 1" % win_us),
            )
        ),
    )
    hits = probes.join(purchases, ["user_id", "bucket"]).where(
        (F.col("p_us") >= F.col("c_us")) & (F.col("p_us") < F.col("c_us") + win_us)
    )
    agg = hits.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("purchase_value"),
    )
    return (
        clicks.select("event_id")
        .join(agg, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_purchases", F.lit(0).cast("bigint")).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
    )


Q_INTERVAL_JOIN_SQL = """
with c as (
  select event_id, user_id, epoch_us(ts) c_us from events
  where event_type = 'click'
),
p as (
  select user_id, epoch_us(ts) p_us, value from events
  where event_type = 'purchase'
)
select c.event_id,
       count(p.p_us)::BIGINT n_purchases,
       coalesce(round(sum(p.value), 2), 0.0) purchase_value
from c left join p
  on p.user_id = c.user_id
 and p.p_us >= c.c_us and p.p_us < c.c_us + 600000000
group by c.event_id order by c.event_id
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
    b = spark.createDataFrame(BUCKET_DIM, "label string, lo double, hi double")
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


# ============================================= text corpus analytics


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-document top-3 terms by tf·ln(N/df). Three shuffles,
    each on a small key domain: (doc_id, token) for tf, token for df,
    doc_id for the top-k window. df is joined back via broadcast (the
    vocabulary is tiny relative to the corpus — at 100 TB you'd still
    broadcast the df table or store it as a dict sketch). N rides along
    as a broadcast scalar, not a driver-side collect."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("nd").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.where(F.col("doc_id") < 100)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("doc_id", "rn", "token", "tf", "df", "tfidf")
    )


Q_TFIDF_SQL = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) token from documents
),
tf as (select doc_id, token, count(*) tf from tok group by 1, 2),
df as (select token, count(*) df from tf group by 1),
n as (select count(*) nd from documents)
select doc_id, rn, token, tf, df, tfidf
from (
  select doc_id, token, tf, df,
         round(tf::DOUBLE * ln(nd::DOUBLE / df::DOUBLE), 6) tfidf,
         row_number() over (partition by doc_id
                            order by round(tf::DOUBLE * ln(nd::DOUBLE / df::DOUBLE), 6) desc,
                                     token asc)::BIGINT rn
  from tf join df using (token) cross join n
  where doc_id < 100
)
where rn <= 3
order by doc_id, rn
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → document frequency + the
    head of its postings list (10 smallest doc_ids, comma-joined so the
    value hash is engine-neutral). The postings head is taken with a
    per-token window BEFORE the list aggregation, so no executor ever
    materializes a full posting list — the pattern that survives tokens
    appearing in billions of documents."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    df_ = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    head = (
        tok.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .groupBy("token")
        .agg(
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "postings_head"
            )
        )
    )
    return (
        df_.join(head, "token")
        .select("token", "df", "postings_head")
    )


Q_INVERTED_INDEX_SQL = """
with tok as (
  select distinct doc_id, unnest(string_split(text, ' ')) token from documents
),
df as (select token, count(*) df from tok group by 1),
head as (
  select token, string_agg(doc_id::VARCHAR, ',' order by doc_id) postings_head
  from (
    select token, doc_id,
           row_number() over (partition by token order by doc_id asc) rn
    from tok
  )
  where rn <= 10
  group by token
)
select token, df, postings_head
from df join head using (token)
order by token
"""


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters: top-10 tokens by corpus frequency.
    Exact counts via one (lang, token) shuffle — the key domain is
    |langs|×|vocab|, tiny regardless of corpus size, which is why exact
    beats a sketch here; swap in a count-min merge only if the vocab
    itself stops fitting."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 10)
        .select("lang", "rn", "token", "n")
    )


Q_HEAVY_HITTERS_SQL = """
select lang, rn, token, n
from (
  select lang, token, count(*) n,
         row_number() over (partition by lang
                            order by count(*) desc, token asc)::BIGINT rn
  from (select lang, unnest(string_split(text, ' ')) token from documents)
  group by lang, token
)
where rn <= 10
order by lang, rn
"""


# ============================================================ registry


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join. Testdata
    has no commit/receipt dates, so "late" = a lineitem shipped more
    than 60 days after the order date — same shape (equi key + non-equi
    residual on the semi join). The semi join shuffles on orderkey only;
    no row multiplication from multi-line orders."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
select o_orderpriority, count(*) order_count
from orders
where o_orderdate >= TIMESTAMP '1997-01-01'
  and o_orderdate < TIMESTAMP '1998-01-01'
  and exists (
    select 1 from lineitem
    where l_orderkey = o_orderkey
      and l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
group by o_orderpriority
order by o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations. Both nation
    lookups broadcast (25 rows); the disjunctive nation-pair predicate
    is applied AFTER the equi joins so Catalyst keeps every join an
    equi hash join. lineitem⋈orders is the only big shuffle pair."""
    n = F.broadcast(load(spark, sf_dir, "nation"))
    s = load(spark, sf_dir, "supplier").join(
        n.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        ),
        F.col("s_nationkey") == F.col("s_nkey"),
    )
    c = load(spark, sf_dir, "customer").join(
        n.select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        ),
        F.col("c_nationkey") == F.col("c_nkey"),
    )
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q7_SQL = """
select supp_nation, cust_nation, l_year, round(sum(volume), 2) revenue
from (
  select n1.n_name supp_nation, n2.n_name cust_nation,
         year(l_shipdate) l_year,
         l_extendedprice * (1 - l_discount) volume
  from lineitem
  join orders on l_orderkey = o_orderkey
  join supplier on l_suppkey = s_suppkey
  join customer on o_custkey = c_custkey
  join nation n1 on s_nationkey = n1.n_nationkey
  join nation n2 on c_nationkey = n2.n_nationkey
  where (n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
     or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1')
) shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Aggregate on c_custkey FIRST (shrinks to ≤|customer| rows), then
    join the customer/nation attributes onto the small aggregate —
    at 100 TB the attribute join moves the post-agg rows, not
    lineitem×customer-width rows."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        rev.join(c, "c_custkey")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
select c_custkey, c_name, revenue, c_acctbal, n_name
from (
  select o_custkey c_custkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
  from lineitem
  join orders on l_orderkey = o_orderkey
  where l_returnflag = 'R'
    and o_orderdate >= TIMESTAMP '1997-07-01'
    and o_orderdate < TIMESTAMP '1997-10-01'
  group by o_custkey
) r
join customer using (c_custkey)
join nation on c_nationkey = n_nationkey
order by revenue desc, c_custkey
limit 20
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per year —
    a ratio of conditional sum over total sum in a single aggregate
    (no second pass over the joined data). part filter (p_type) cuts
    lineitem via the join before the wide orders join; part/supplier/
    customer-side dims broadcast after their filters at this SF, and
    at 100 TB AQE picks broadcast vs shuffle per side from runtime
    stats. Ratio rounded to 6dp on both engines."""
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    cn = F.broadcast(
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
            F.col("n_nationkey").alias("c_nkey")
        )
    )
    sn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    c = load(spark, sf_dir, "customer").join(
        cn, F.col("c_nationkey") == F.col("c_nkey"), "left_semi"
    )
    s = load(spark, sf_dir, "supplier").join(
        sn, F.col("s_nationkey") == F.col("s_nkey")
    )
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
select o_year,
       round(sum(case when supp_nation = 'NATION_3' then volume else 0 end)
             / sum(volume), 6) mkt_share
from (
  select year(o_orderdate) o_year,
         l_extendedprice * (1 - l_discount) volume,
         n2.n_name supp_nation
  from lineitem
  join part on l_partkey = p_partkey
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  join supplier on l_suppkey = s_suppkey
  join nation n1 on c_nationkey = n1.n_nationkey
  join nation n2 on s_nationkey = n2.n_nationkey
  join region on n1.n_regionkey = r_regionkey
  where r_name = 'ASIA' and p_type = 'PROMO'
) all_nations
group by o_year
order by o_year
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone shipped late on a
    multi-supplier order. EXISTS(other supplier on order) → LEFT SEMI;
    NOT EXISTS(other LATE supplier on order) → LEFT ANTI. "Late" =
    shipped >60 days after order date (no receipt/commit columns).
    All three lineitem-derived sides shuffle on l_orderkey, so the
    semi/anti joins co-partition with no extra exchange; the self-join
    inequality (l_suppkey <> other) rides as a residual."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = l.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
    ).select("l_orderkey", "l_suppkey")
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    return (
        waiting.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


Q21_SQL = """
select s_name, count(*) numwait
from lineitem l1
join orders on l_orderkey = o_orderkey
join supplier on l1.l_suppkey = s_suppkey
where o_orderstatus = 'F'
  and l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  and exists (
    select 1 from lineitem l2
    where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey
  )
  and not exists (
    select 1 from lineitem l3
    join orders o3 on l3.l_orderkey = o3.o_orderkey
    where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey
      and o3.o_orderstatus = 'F'
      and l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
group by s_name
order by numwait desc, s_name
limit 25
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov chain: per-user event sequences collapsed into
    a first-order transition matrix — (prev_type, event_type, n, prob).
    The sequence-modeling primitive for session analytics (what do
    users do AFTER an error?) and for generating synthetic behavioral
    data at the observed transition frequencies.

    One user-keyed window (lag over (ts, event_id) — bounded per key,
    no global sort), one map-combined count aggregate over the ~T²
    type-pair grid, and the per-prev totals come back as a broadcast of
    at most T rows. At 100 TB the only shuffle is the user-keyed
    exchange; the transition grid itself is KB-sized no matter the
    corpus."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("_tot"), 6).alias("prob"),
        )
        .orderBy("prev_type", "event_type")
    )


Q_EVENT_TRANSITIONS_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
p as (
  select lag(event_type) over (partition by user_id
                               order by us, event_id) prev_type,
         event_type
  from e
),
c as (
  select prev_type, event_type, count(*)::BIGINT n
  from p where prev_type is not null
  group by prev_type, event_type
)
select prev_type, event_type, n,
       round(n::DOUBLE / sum(n) over (partition by prev_type), 6) prob
from c order by prev_type, event_type
"""


def q_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against a dimension history: every
    'purchase' event is enriched with the state that was valid AT its
    timestamp — the state being the user's current run of non-purchase
    activity (an SCD-2 interval table built exactly like
    ``user_state_intervals``, half-open [from, to)). The
    training-data shape for feature stores: join facts to the
    slowly-changing feature value as-of the fact time, never leaking
    future state.

    Scale shape: the interval table is user-keyed and small per user
    (run-length compressed), so the PIT lookup is a plain user-keyed
    equi-join plus a containment filter — one co-partitioned shuffle
    pair, no range explosion, no window over the fact table. Facts
    before the user's first observed state keep a NULL state (left
    join), exactly like a feature-store backfill."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    states = e.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    runs = states.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("run_id", F.sum("chg").over(w))
    ivals = runs.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("state_type"),
        F.min("us").alias("valid_from_us"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    ivals = ivals.select(
        "user_id",
        "state_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("us").alias("fact_us")
    )
    return (
        facts.join(
            ivals,
            (facts.user_id == ivals.user_id)
            & (ivals.valid_from_us <= facts.fact_us)
            & (
                ivals.valid_to_us.isNull()
                | (facts.fact_us < ivals.valid_to_us)
            ),
            "left",
        )
        .select(
            facts.user_id,
            "event_id",
            "fact_us",
            "state_type",
            F.col("valid_from_us").alias("state_since_us"),
        )
        .orderBy("event_id")
    )


Q_PIT_ENRICH_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
s as (select * from e where event_type != 'purchase'),
r as (
  select *,
         case when lag(event_type) over w is null
                   or lag(event_type) over w != event_type
              then 1 else 0 end chg
  from s window w as (partition by user_id order by us, event_id)
),
rr as (
  select *, sum(chg) over (partition by user_id order by us, event_id
                           rows unbounded preceding) run_id
  from r
),
iv0 as (
  select user_id, run_id, any_value(event_type) state_type,
         min(us) valid_from_us
  from rr group by user_id, run_id
),
iv as (
  select user_id, state_type, valid_from_us,
         lead(valid_from_us) over (partition by user_id order by run_id)
           valid_to_us
  from iv0
),
f as (
  select user_id, event_id, us fact_us from e where event_type = 'purchase'
)
select f.user_id, f.event_id, f.fact_us, iv.state_type,
       iv.valid_from_us state_since_us
from f left join iv
  on f.user_id = iv.user_id
 and iv.valid_from_us <= f.fact_us
 and (iv.valid_to_us is null or f.fact_us < iv.valid_to_us)
order by f.event_id
"""


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: maintain a per-user profile table from a change
    stream. Simulated split: events with ``event_id % 3 == 0`` build
    the base snapshot (each user's latest such event), the rest are the
    CDC batch — ``event_type='error'`` rows are tombstones, everything
    else upserts (event_type, value). Last writer per user wins,
    ordered by (ts, event_id); a winning tombstone deletes the user.

    The merge is :func:`bamboo_spark.operators.scale.cdc_apply`: one
    map-combined max-struct aggregate — no window sort, no join — so a
    hot key ships one struct per mapper. The compaction shape for
    maintaining a 100 TB table against a daily delta."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    base_events = e.where(F.col("event_id") % 3 == 0)
    base = (
        base_events.groupBy("user_id")
        .agg(
            F.max(
                F.struct("us", "event_id", "event_type", "value")
            ).alias("_w")
        )
        .select(
            "user_id",
            F.col("_w.us").alias("us"),
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.event_type").alias("event_type"),
            F.col("_w.value").alias("value"),
        )
    )
    changes = e.where(F.col("event_id") % 3 != 0).withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("delete")).otherwise(
            F.lit("upsert")
        ),
    )
    out = scale.cdc_apply(
        base,
        changes,
        key_cols="user_id",
        version_cols=["us", "event_id"],
        op_col="op",
    )
    return out.select(
        "user_id", "us", "event_id", "event_type", "value"
    ).orderBy("user_id")


Q_CDC_UPSERT_SQL = """
with e as (
  select user_id, event_id, event_type, value, epoch_us(ts) us from events
),
base as (
  select user_id, us, event_id, event_type, value, 0 as is_change,
         'upsert' as op
  from e where event_id % 3 = 0
  qualify row_number() over (partition by user_id
                             order by us desc, event_id desc) = 1
),
chg as (
  select user_id, us, event_id, event_type, value, 1 as is_change,
         case when event_type = 'error' then 'delete' else 'upsert' end op
  from e where event_id % 3 != 0
),
u as (select * from base union all select * from chg),
w as (
  select * from u
  qualify row_number() over (partition by user_id
                             order by is_change desc, us desc,
                                      event_id desc) = 1
)
select user_id, us, event_id, event_type, value
from w where op != 'delete' order by user_id
"""


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over fuzzy keys: all document pairs whose
    normalized 32-char title keys are within 3 Levenshtein edits —
    typo-tolerant record linkage (the dedup family catches rewrites;
    this catches TYPOS: OCR noise, fat-fingered titles, mojibake).

    Candidates come from PassJoin segment pigeonholing
    (:func:`bamboo_spark.operators.linkage.edit_distance_pairs`): each
    key is cut into d+1 segments, and a pair within d edits must share
    one segment VERBATIM at a ±d-shifted position — an exact-match
    equi-join that stays selective even on low-entropy corpora where
    q-gram prefixes collapse. Every candidate is verified with the
    banded O(d·n) ``levenshtein(a, b, 3)``. The oracle is the
    brute-force n² join — pruning is provably lossless, so they must
    agree exactly."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    return linkage.edit_distance_pairs(
        d, "doc_id", "title_key", max_dist=3
    ).orderBy("id_a", "id_b")


def q_record_linkage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy-key ingest: a NEW batch (doc_id >= 250) is
    linked against the stored corpus (doc_id < 250) by 32-char title
    key within 3 edits — the append-only twin of ``record_linkage``.
    Only the corpus's SEGMENT INDEX participates (persist it bucketed
    by (len, seg_no, content) in production); each ingest cuts O(batch)
    probes and equi-joins the index — the corpus is never re-paired.
    Oracle = brute-force new × corpus join; pruning is lossless."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    new = d.where(F.col("doc_id") >= 250)
    corpus = d.where(F.col("doc_id") < 250)
    return linkage.edit_distance_join(
        new, corpus, "doc_id", "title_key", max_dist=3
    ).orderBy("id_new", "id_corpus")


Q_RECORD_LINKAGE_INC_SQL = """
with k as (
  select doc_id as id, lower(substring(text, 1, 32)) as tk,
         length(lower(substring(text, 1, 32))) as ln
  from documents where text is not null
)
select n.id id_new, c.id id_corpus, levenshtein(n.tk, c.tk)::INT dist
from (select * from k where id >= 250) n
join (select * from k where id < 250) c
  on abs(n.ln - c.ln) <= 3
where levenshtein(n.tk, c.tk) <= 3
order by id_new, id_corpus
"""


Q_RECORD_LINKAGE_SQL = """
with k as (
  select doc_id as id, lower(substring(text, 1, 32)) as tk,
         length(lower(substring(text, 1, 32))) as ln
  from documents where text is not null
)
select a.id id_a, b.id id_b, levenshtein(a.tk, b.tk)::INT dist
from k a join k b
  on a.id < b.id and abs(a.ln - b.ln) <= 3
where levenshtein(a.tk, b.tk) <= 3
order by id_a, id_b
"""


_BM25_TERMS = ["hash", "join", "scan", "filter", "merge", "broadcast"]


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed search query —
    the retrieval scorer for corpus curation (rank training docs by
    closeness to a target domain) and for eval-set mining. Okapi
    parameters k1=1.2, b=0.75.

    Scale shape: the query's term list is a literal broadcast (an IN
    filter pushed into the token explode, so only matching-term rows
    survive the first aggregate); df comes off the tiny per-term table;
    N and avgdl ride one scalar aggregate broadcast back. Per-term
    scores round to 9 decimals and sum in integer nano-units, so the
    result is partitioning-independent and the oracle replays it
    bit-for-bit. Nothing doc-sized is ever collected or broadcast."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.size(F.split("text", " "))).cast("double").alias("_sdl"),
    )
    tf = (
        toks.where(F.col("token").isin(_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        9,
    )
    denom = F.col("tf") + 1.2 * (
        1.0 - 0.75 + 0.75 * F.col("dl") / (F.col("_sdl") / F.col("_n"))
    )
    term_score = F.round(idf * (F.col("tf") * 2.2) / denom, 9)
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            F.round(term_score * 1e9, 0).cast("long").alias("_nano"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(F.sum("_nano").cast("double") / 1e9, 6).alias("bm25"),
        )
        .orderBy("doc_id")
    )


Q_BM25_SQL = """
with toks as (
  select doc_id, unnest(string_split(text, ' ')) token from documents
),
dl as (select doc_id, len(string_split(text, ' ')) dl from documents),
stats as (
  select count(*)::DOUBLE n, sum(len(string_split(text, ' ')))::DOUBLE sdl
  from documents
),
tf as (
  select doc_id, token, count(*)::DOUBLE tf from toks
  where token in ({terms}) group by doc_id, token
),
dfreq as (select token, count(*)::DOUBLE df from tf group by token),
t as (
  select tf.doc_id,
         round(round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)), 9)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (s.sdl / s.n))),
               9) w
  from tf
  join dfreq d using (token)
  join dl on tf.doc_id = dl.doc_id
  cross join stats s
)
select doc_id, count(*)::BIGINT n_terms,
       round(sum(round(w * 1e9, 0)::BIGINT)::DOUBLE / 1e9, 6) bm25
from t group by doc_id order by doc_id
""".format(terms=", ".join("'%s'" % t for t in _BM25_TERMS))


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per-DIMENSION Welch
    z-score between two corpus snapshots (simulated: even vs odd
    vec_ids) — the encoder-regression alarm. A re-trained or silently
    re-versioned encoder shifts per-dimension means long before any
    downstream metric moves; this catches it at ingest.

    Per-dimension moments ride ONE map-combined aggregate over integer
    micro-units (exact, order-independent — sums of m and m² in
    decimal(38,0) so 100 TB of rows can't wrap a long), and the two
    snapshot profiles join on the tiny dim domain. Nothing data-sized
    shuffles beyond the (snapshot, dim)-keyed partials."""
    e = load(spark, sf_dir, "embeddings")
    exp = e.select(
        (F.col("vec_id") % 2).cast("int").alias("snap"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "snap",
        "dim",
        F.round(F.col("v").cast("double") * 1e6, 0).cast("long").alias("m"),
    )
    prof = exp.groupBy("snap", "dim").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("m").cast("decimal(38,0)").cast("double").alias("s"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m"))
        .cast("double")
        .alias("ss"),
    )
    a = prof.where(F.col("snap") == 0).select(
        "dim",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("ss").alias("ssa"),
    )
    b = prof.where(F.col("snap") == 1).select(
        "dim",
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("ss").alias("ssb"),
    )
    mean_a = F.col("sa") / 1e6 / F.col("na")
    mean_b = F.col("sb") / 1e6 / F.col("nb")
    var_a = F.greatest(
        F.col("ssa") / 1e12 / F.col("na") - mean_a * mean_a, F.lit(0.0)
    )
    var_b = F.greatest(
        F.col("ssb") / 1e12 / F.col("nb") - mean_b * mean_b, F.lit(0.0)
    )
    se = F.sqrt(var_a / F.col("na") + var_b / F.col("nb"))
    z = F.when(se <= 0.0, F.lit(0.0)).otherwise(
        F.round((mean_b - mean_a) / se, 6)
    )
    return (
        a.join(b, "dim")
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.round(mean_a, 6).alias("mean_a"),
            F.round(mean_b, 6).alias("mean_b"),
            F.round(mean_b - mean_a, 6).alias("shift"),
            z.alias("z"),
            (F.abs(z) > 3.0).cast("int").alias("is_drifted"),
        )
        .orderBy("dim")
    )


Q_EMBEDDING_DRIFT_SQL = """
with exp as (
  select (vec_id % 2)::INT snap, (i - 1) dim,
         round(embedding[i]::DOUBLE * 1e6, 0)::BIGINT m
  from (
    select vec_id, embedding,
           unnest(generate_series(1, len(embedding))) i
    from embeddings
  )
),
prof as (
  select snap, dim, count(*)::DOUBLE n, sum(m)::DOUBLE s,
         sum(m::HUGEINT * m)::DOUBLE ss
  from exp group by snap, dim
),
j as (
  select a.dim,
         a.s / 1e6 / a.n mean_a, b.s / 1e6 / b.n mean_b,
         greatest(a.ss / 1e12 / a.n - (a.s / 1e6 / a.n) * (a.s / 1e6 / a.n), 0.0) var_a,
         greatest(b.ss / 1e12 / b.n - (b.s / 1e6 / b.n) * (b.s / 1e6 / b.n), 0.0) var_b,
         a.n na, b.n nb
  from (select * from prof where snap = 0) a
  join (select * from prof where snap = 1) b using (dim)
),
zz as (
  select dim, mean_a, mean_b,
         case when sqrt(var_a / na + var_b / nb) <= 0.0 then 0.0
              else round((mean_b - mean_a) / sqrt(var_a / na + var_b / nb), 6)
         end z
  from j
)
select dim::INT dim, round(mean_a, 6) mean_a, round(mean_b, 6) mean_b,
       round(mean_b - mean_a, 6) shift, z,
       (abs(z) > 3.0)::INT is_drifted
from zz order by dim
"""


def q_events_rolling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-RANGE window (not row-count): per user, the count
    and value-sum of their events in the sliding 1-hour interval ending
    at each event — rate-limiter / velocity-check analytics, where "7
    preceding rows" is wrong and "3600 seconds preceding" is the spec.

    The window partitions on user_id (bounded per key, one hash
    exchange) and orders by integer µs with a RANGE frame — Spark
    evaluates it with a sliding two-pointer pass per key, never
    re-scanning the frame per row."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        # exact integer cents: frame sums are order-independent, so the
        # oracle's segment-tree and Spark's sliding accumulator agree
        # bit-for-bit
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "us",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        (F.sum("cents").over(w).cast("double") / 100.0).alias("sum_1h"),
    ).orderBy("event_id")


Q_EVENTS_ROLLING_RATE_SQL = """
with e as (
  select user_id, event_id, epoch_us(ts) us,
         round(value * 100, 0)::BIGINT cents
  from events
)
select user_id, event_id, us,
       count(*) over w::BIGINT n_1h,
       (sum(cents) over w)::DOUBLE / 100.0 sum_1h
from e
window w as (partition by user_id order by us
             range between 3600000000 preceding and current row)
order by event_id
"""


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the top-20 3-step event-type paths
    (trigrams of consecutive events per user), with counts — "view →
    click → purchase happens 412×" is the output a funnel designer
    starts from.

    One user-keyed window chain (two lags share the single hash
    exchange), a map-combined trigram count over the ≤ T³ path grid,
    and a global top-k that Spark plans as TakeOrderedAndProject —
    partial top-k per partition, only k rows to the driver-side merge,
    never a full sort."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    tri = (
        e.withColumn("t1", F.lag("event_type", 2).over(w))
        .withColumn("t2", F.lag("event_type", 1).over(w))
        .where(F.col("t1").isNotNull())
        .groupBy("t1", "t2", F.col("event_type").alias("t3"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return tri.orderBy(F.col("n").desc(), "t1", "t2", "t3").limit(20)


Q_EVENT_PATHS_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
l as (
  select lag(event_type, 2) over w t1, lag(event_type, 1) over w t2,
         event_type t3
  from e window w as (partition by user_id order by us, event_id)
)
select t1, t2, t3, count(*)::BIGINT n
from l where t1 is not null
group by t1, t2, t3
order by n desc, t1, t2, t3
limit 20
"""


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus subsampling: IVF-cluster the embedding
    space (shared quantizer) and keep a deterministic hash-ordered head
    of ≤ 4 vectors per cluster — the semantic-diversity counterpart of
    per-domain capping (a uniform sample over-represents dense modes;
    this caps every semantic neighborhood equally, the SemDeDup-paper
    sampling companion).

    Scale: assignment is a broadcast-centroid GEMM (no shuffle beyond
    the agg), and the per-cluster head is ``scale.hash_ranked_head`` —
    partial top-k below the shuffle, so a megacluster ships cap ×
    map_partitions rows, never its raw size."""
    e = load(spark, sf_dir, "embeddings")
    cents = ivf_quantizer(spark, sf_dir)
    assign = similarity.ivf_assign(e, cents, n_probe=1)
    rk = text.md5_int60_sql("cast(vec_id as string)")
    staged = assign.withColumn("_rk", F.expr(rk))
    return (
        scale.hash_ranked_head(
            staged,
            "centroid",
            "_rk",
            hash_max=2**60,
            cap=4,
            tiebreak_cols=["vec_id"],
        )
        .select(
            F.col("centroid").cast("bigint").alias("centroid"),
            "rank",
            "vec_id",
        )
        .orderBy("centroid", "rank")
    )


def _diversity_sample_duck() -> str:
    return (
        similarity._kmeans_duck_ctes(None, COARSE_ITERS)
        + """,
scored as (
  select e.vec_id, c.cid,
         round(list_dot_product(e.v, c.cv) / (e.n * c.cn), 6) s
  from e cross join cf c
),
assign as (
  select vec_id, cid from (
    select *, row_number() over (partition by vec_id
                                 order by s desc, cid asc) r
    from scored
  ) where r <= 1
)
select cid::BIGINT centroid, rank, vec_id from (
  select cid, vec_id,
         row_number() over (
           partition by cid
           order by (('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT) asc,
                    vec_id asc)::BIGINT rank
  from assign
) where rank <= 4 order by centroid, rank
"""
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training on-engine: the first 6 BPE merges over the
    corpus (Sennrich-style), trained on the vocabulary-bounded
    word-count table — see :mod:`bamboo_spark.operators.bpe`. Each
    round is one map-combined pair-count aggregate plus a 1-row argmax
    collect; merge application is a literal ``replace`` inside codegen.
    The oracle replays every round (same argmax tiebreak, same greedy
    left-to-right merge), so the learned merge table is value-checked,
    not just shape-checked."""
    d = load(spark, sf_dir, "documents")
    return bpe.bpe_train(d, "text", n_merges=6)


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-encode composition: per doc, whitespace words vs BPE
    tokens under the 6 learned merges — the honest corpus token budget
    (see :func:`bamboo_spark.operators.bpe.bpe_encode_counts`).
    Encoding is a broadcast join against the trained vocab table — the
    word-cache amortization a tokenizer service relies on; the corpus
    is scanned once."""
    d = load(spark, sf_dir, "documents")
    return bpe.bpe_encode_counts(d, "text", n_merges=6)


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse: for each FK
    edge (orders→customer, lineitem→orders, customer→nation,
    supplier→nation, nation→region), the row count, orphan count
    (child keys with no parent), and null-key count — the pre-flight
    check before any join-heavy pipeline trusts its dimensions.

    Each edge is one LEFT ANTI join on the key; parents are dimension
    tables and broadcast (orders→customer's parent is the largest at
    1.5M rows per TPC-H SF — still broadcastable; at bigger parents the
    anti join shuffles on the key, which is the right plan anyway).
    Output is one row per edge — the grid a data-quality dashboard
    polls."""
    specs = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for edge, child, ck, parent, pk in specs:
        c = load(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = (
            c.where(F.col("k").isNotNull())
            .join(F.broadcast(p), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
        )
        stats = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("k").isNull().cast("bigint"))
            .cast("bigint")
            .alias("null_keys"),
        )
        row = (
            stats.crossJoin(orphans)
            .select(
                F.lit(edge).alias("fk_edge"),
                "n_rows",
                "orphans",
                "null_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


Q_FK_INTEGRITY_SQL = """
select 'customer->nation' fk_edge, count(*)::BIGINT n_rows,
       count(*) filter (c_nationkey is not null and c_nationkey not in
         (select n_nationkey from nation))::BIGINT orphans,
       count(*) filter (c_nationkey is null)::BIGINT null_keys
from customer
union all
select 'lineitem->orders', count(*)::BIGINT,
       count(*) filter (l_orderkey is not null and l_orderkey not in
         (select o_orderkey from orders))::BIGINT,
       count(*) filter (l_orderkey is null)::BIGINT
from lineitem
union all
select 'nation->region', count(*)::BIGINT,
       count(*) filter (n_regionkey is not null and n_regionkey not in
         (select r_regionkey from region))::BIGINT,
       count(*) filter (n_regionkey is null)::BIGINT
from nation
union all
select 'orders->customer', count(*)::BIGINT,
       count(*) filter (o_custkey is not null and o_custkey not in
         (select c_custkey from customer))::BIGINT,
       count(*) filter (o_custkey is null)::BIGINT
from orders
union all
select 'supplier->nation', count(*)::BIGINT,
       count(*) filter (s_nationkey is not null and s_nationkey not in
         (select n_nationkey from nation))::BIGINT,
       count(*) filter (s_nationkey is null)::BIGINT
from supplier
order by fk_edge
"""


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: fuzzy-key pairs (PassJoin edit
    join, d ≤ 3 on 32-char title keys) → converged connected components
    → per-entity golden-record pick (lowest id = the component label).
    The composition a master-data pipeline runs: block, match, cluster,
    survivorship — each stage one of this engine's operators, the whole
    chain one Catalyst plan per superstep.

    Output: one row per doc that matched anything — (doc_id, entity_id,
    cluster_size, is_canonical). The oracle replays the brute-force
    pair join + a recursive-CTE transitive closure — candidate pruning
    AND the iterative clustering both land on the provable fixpoint."""
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 32)).alias("title_key"),
    )
    pairs = linkage.edit_distance_pairs(
        d, "doc_id", "title_key", max_dist=3
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = dedup.connected_components_converged(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            F.col("component").alias("entity_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("component")).cast("int").alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


def _entity_clusters_duck() -> str:
    pairs_cte = """
select a.id doc_a, b.id doc_b
from (select doc_id as id, lower(substring(text, 1, 32)) tk,
             length(lower(substring(text, 1, 32))) ln
      from documents where text is not null) a
join (select doc_id as id, lower(substring(text, 1, 32)) tk,
             length(lower(substring(text, 1, 32))) ln
      from documents where text is not null) b
  on a.id < b.id and abs(a.ln - b.ln) <= 3
where levenshtein(a.tk, b.tk) <= 3
"""
    fix = dedup.components_fixpoint_duck(pairs_cte).strip()
    # a CTE body may carry its own WITH RECURSIVE — nest the fixpoint
    # statement whole
    return """
with comp as materialized (
%s
)
select doc_id, component entity_id,
       (count(*) over (partition by component))::BIGINT cluster_size,
       (doc_id = component)::INT is_canonical
from comp order by doc_id
""" % fix


def q_value_outliers(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Robust per-group outlier audit (Tukey fences): per event type,
    exact quartiles of ``value``, the 1.5·IQR fences, and how many
    events fall outside them — the monitoring grid that catches a
    misbehaving emitter (a client suddenly logging milliseconds instead
    of seconds) without being blinded by the outliers themselves, the
    way mean/std z-scores are.

    One percentile aggregate over the tiny type domain, broadcast
    back, one map-side fence count — two scans, no window, nothing
    data-sized collected. ``approx=True`` is the 100 TB mode: exact
    ``percentile`` holds every group value in one aggregation buffer,
    ``approx_percentile`` is a mergeable sketch with map-side partials
    (same plan otherwise; error-bound-tested in pytest, the exact mode
    stays the oracle-gated one)."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    pf = "approx_percentile(value, %s, 10000)" if approx else "percentile(value, %s)"
    g = e.groupBy("event_type").agg(
        F.round(F.expr(pf % "0.25"), 4).alias("q1"),
        F.round(F.expr(pf % "0.5"), 4).alias("median"),
        F.round(F.expr(pf % "0.75"), 4).alias("q3"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        e.join(F.broadcast(g), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("q1").alias("q1"),
            F.first("median").alias("median"),
            F.first("q3").alias("q3"),
            F.first("n").alias("n"),
            F.sum(((F.col("value") < lo) | (F.col("value") > hi)).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


Q_VALUE_OUTLIERS_SQL = """
with g as (
  select event_type,
         round(quantile_cont(value, 0.25), 4) q1,
         round(quantile_cont(value, 0.5), 4) median,
         round(quantile_cont(value, 0.75), 4) q3,
         count(*)::BIGINT n
  from events group by event_type
)
select e.event_type, any_value(q1) q1, any_value(median) median,
       any_value(q3) q3, any_value(n) n,
       sum((e.value < q1 - 1.5 * (q3 - q1)
            or e.value > q3 + 1.5 * (q3 - q1))::BIGINT)::BIGINT n_outliers
from events e join g using (event_type)
group by e.event_type order by e.event_type
"""


def q_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent corpus identity: per source, a commutative
    content fingerprint (sum of 60-bit md5 slices of doc_id∥digest,
    mod 2⁶⁰), row count, and byte total — the cheap equality check two
    clusters (or two snapshot versions) run before trusting they hold
    the SAME corpus, without moving any content. Commutative sum ⇒
    partitioning/order can't change it; doc_id is folded in so a swap
    of two docs' texts can't cancel out.

    One scan, one map-combined aggregate — at 100 TB this is the
    cheapest possible full-corpus integrity pass."""
    d = load(spark, sf_dir, "documents")
    h = F.expr(
        "conv(substring(md5(concat(cast(doc_id as string), ':', md5(text))), 1, 15), 16, 10)"
    ).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
            # sum in decimal(38,0): the 60-bit addends overflow a long
            # within ~16 rows (Spark ANSI would raise; DuckDB promotes
            # to HUGEINT — decimal keeps both engines exact)
            F.pmod(
                F.sum(h.cast("decimal(38,0)")),
                F.lit(2**60).cast("decimal(38,0)"),
            )
            .cast("bigint")
            .alias("fingerprint"),
        )
        .orderBy("source")
    )


Q_CORPUS_FINGERPRINT_SQL = """
select source, count(*)::BIGINT n_docs,
       sum(length(text))::BIGINT n_chars,
       (sum(('0x' || substr(md5(doc_id::VARCHAR || ':' || md5(text)), 1, 15))::BIGINT)
        % (1::BIGINT << 60))::BIGINT fingerprint
from documents
group by source order by source
"""


_PMI_TOP_V = 40


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence PMI over the top-V vocabulary: for every
    pair of top-40 tokens co-occurring in ≥ 5 documents,
    ln(N·c(a,b) / (c(a)·c(b))) on document-level presence — the
    collocation/phrase-mining signal (high PMI = the pair is a unit:
    "merge join", "hash join") and a redundancy feature for corpus
    analysis.

    Scale: the vocabulary is capped to top-V BEFORE any pairing (V
    broadcast as a literal-sized table), docs project to their ≤ V
    distinct top tokens, and pairs explode per doc as C(V,2)-bounded
    combinations — never token² over the corpus. Counts are exact
    integers; the log lands on round-9 so the oracle hash can gate
    it."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    ).where(F.col("t") != "")
    topv = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "t")
        .limit(_PMI_TOP_V)
    )
    ft = toks.join(F.broadcast(topv), "t")
    a = ft.select("doc_id", F.col("t").alias("ta"), F.col("df").alias("dfa"))
    b = ft.select("doc_id", F.col("t").alias("tb"), F.col("df").alias("dfb"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ab"),
            F.first("dfa").alias("dfa"),
            F.first("dfb").alias("dfb"),
        )
        .where(F.col("n_ab") >= 5)
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    pmi = F.round(
        F.log(
            F.col("_n")
            * F.col("n_ab").cast("double")
            / (F.col("dfa").cast("double") * F.col("dfb").cast("double"))
        ),
        9,
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .select("ta", "tb", "n_ab", pmi.alias("pmi"))
        .orderBy("ta", "tb")
    )


Q_TOKEN_PMI_SQL = """
with toks as (
  select distinct doc_id, t from (
    select doc_id, unnest(string_split(text, ' ')) t from documents
  ) where t != ''
),
topv as (
  select t, count(*)::BIGINT df from toks group by t
  order by df desc, t limit {v}
),
ft as (select toks.doc_id, toks.t, topv.df from toks join topv using (t)),
pairs as (
  select a.t ta, b.t tb, count(*)::BIGINT n_ab,
         any_value(a.df) dfa, any_value(b.df) dfb
  from ft a join ft b on a.doc_id = b.doc_id and a.t < b.t
  group by a.t, b.t
  having count(*) >= 5
),
n as (select count(*)::DOUBLE nn from documents)
select ta, tb, n_ab,
       round(ln(nn * n_ab::DOUBLE / (dfa::DOUBLE * dfb::DOUBLE)), 9) pmi
from pairs cross join n
order by ta, tb
""".format(v=_PMI_TOP_V)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality monitor: per-query recall@5 of the IVF top-k against
    the exact brute-force top-k — the eval harness an index deployment
    runs before trusting an approximate path (and after every
    re-train). Composes two existing operators over the SAME shared
    quantizer; the oracle replays both sides and the join, so recall
    itself is value-gated, not just eyeballed.

    Cost is the two top-k runs (brute force bounded to the small query
    slice) + a k-row-per-query join — the monitor is as scalable as its
    inputs."""
    e = load(spark, sf_dir, "embeddings")
    exact = similarity.topk_neighbors(e, query_ids_below=10, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.topk_neighbors_ivf(
        e,
        query_ids_below=10,
        k=5,
        n_probe=2,
        centroids=ivf_quantizer(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("_hit"))
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (exact.neighbor_id == approx._hit),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(F.col("_hit").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("hits"),
            F.round(
                F.sum(F.col("_hit").isNotNull().cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def _ann_recall_duck() -> str:
    exact = similarity.topk_neighbors_duck(query_ids_below=10, k=5).strip()
    approx = similarity.topk_neighbors_ivf_duck(
        query_ids_below=10, k=5, n_centroids=None, iterations=COARSE_ITERS,
        n_probe=2,
    ).strip()
    return """
with exact as materialized (
{exact}
),
approx as materialized (
{approx}
)
select e.query_id, count(*)::BIGINT k,
       sum((a.neighbor_id is not null)::BIGINT)::BIGINT hits,
       round(sum((a.neighbor_id is not null)::BIGINT)::DOUBLE
             / count(*), 6) recall
from exact e
left join approx a
  on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
group by e.query_id order by e.query_id
""".format(exact=exact, approx=approx)


def q_conversion_lag(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from their FIRST
    click to their FIRST subsequent purchase, rolled into exact lag
    quantiles + conversion counts — the product-analytics number a
    growth team tracks ("median time from first touch to first order").

    Per-user firsts are two map-combined min-aggregates on the user key
    (conditional min, no window); the lag grid is one global percentile
    over the converted users. ``approx=True`` is the 100 TB mode
    (mergeable ``approx_percentile`` sketch instead of the exact
    buffer-everything percentile; error-bound-tested in pytest, exact
    mode stays oracle-gated)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias(
            "first_click_us"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "first_purchase_us"
        ),
    )
    lag = firsts.select(
        "user_id",
        "first_click_us",
        (F.col("first_purchase_us") - F.col("first_click_us")).alias("lag_us"),
    ).where(
        F.col("first_click_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") >= F.col("first_click_us"))
    )
    pf = (
        "approx_percentile(lag_us, %s, 10000)"
        if approx
        else "percentile(lag_us, %s)"
    )
    return lag.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr(pf % "0.5") / 1e6, 3).alias("p50_sec"),
        F.round(F.expr(pf % "0.9") / 1e6, 3).alias("p90_sec"),
        F.round(F.expr(pf % "0.99") / 1e6, 3).alias("p99_sec"),
    )


Q_CONVERSION_LAG_SQL = """
with e as (
  select user_id, event_type, epoch_us(ts) us from events
),
firsts as (
  select user_id,
         min(us) filter (event_type = 'click') first_click_us,
         min(us) filter (event_type = 'purchase') first_purchase_us
  from e group by user_id
),
lag_t as (
  select first_purchase_us - first_click_us lag_us
  from firsts
  where first_click_us is not null and first_purchase_us is not null
    and first_purchase_us >= first_click_us
)
select count(*)::BIGINT n_converted,
       round(quantile_cont(lag_us, 0.5) / 1e6, 3) p50_sec,
       round(quantile_cont(lag_us, 0.9) / 1e6, 3) p90_sec,
       round(quantile_cont(lag_us, 0.99) / 1e6, 3) p99_sec
from lag_t
"""


def q_quality_deciles(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Global quality-score decile bucketing: exact decile thresholds
    of the Gopher-style quality score broadcast back over the corpus,
    then per (source, decile) counts — the "where does each source sit
    in the global quality distribution" grid that decides per-source
    sampling temperature.

    One global percentile aggregate (a 9-number broadcast), one
    scan-speed bucket assignment, one map-combined count. ``approx=
    True`` is the 100 TB mode: the exact ``percentile`` buffers every
    score in one reducer, ``approx_percentile`` is a mergeable sketch
    with map-side partials — the assignment pass is unchanged
    (error-bound-tested in pytest; exact mode stays oracle-gated)."""
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "source", text.quality_score("text").alias("q"))
    pf = "approx_percentile(q, %s, 10000)" if approx else "percentile(q, %s)"
    ths = scored.agg(
        *[
            F.round(F.expr(pf % (i / 10.0)), 6).alias("t%d" % i)
            for i in range(1, 10)
        ]
    )
    dec = F.lit(1)
    for i in range(1, 10):
        dec = dec + (F.col("q") >= F.col("t%d" % i)).cast("int")
    return (
        scored.crossJoin(F.broadcast(ths))
        .select("source", dec.cast("bigint").alias("decile"))
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("source", "decile")
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


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding covariance matrix (upper triangle) — see
    :func:`bamboo_spark.operators.similarity.embedding_covariance`.
    One integer GEMM per Arrow batch, O(partitions·dim²) shuffle,
    decimal-exact reduction, closed-form oracle."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.embedding_covariance(e)


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA: exact covariance reduce (integer GEMM partials)
    → driver-side eig of the dim×dim matrix (metadata-sized, the same
    driver hop as a centroid pull) → scan-speed projection with the
    components as codegen literals. Top-4 components over the
    embeddings table.

    No SQL oracle can replay eig, so this entry is rows-only in the
    driver gate (like q_approx_sketches); pytest gates it against
    numpy PCA on the collected table instead (orthonormality, explained
    variance ordering, projection equality —
    tests/test_similarity.py)."""
    e = load(spark, sf_dir, "embeddings")
    comps = similarity.pca_train(e, n_components=4)
    return similarity.pca_project(e, comps).orderBy("vec_id", "pc")


def q_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-duplicate graph: per connected
    triple-of-mutual-near-dups, one row (a < b < c) — the transitivity
    audit for a dedup pipeline (near-dup similarity is not transitive;
    a triangle-poor pair graph means chains, and cluster labels will
    over-merge under pointer jumping, while a triangle-rich one means
    tight cliques where keep-lowest-id is safe).

    The classic ordered-edge join: edges oriented low→high, triangles =
    (a,b)⋈(b,c)⋈(a,c) — two equi-joins over the (small) pair list, no
    cartesian anywhere. Pairs come from the exact Jaccard join
    (lossless), so the oracle replays everything."""
    d = load(spark, sf_dir, "documents")
    # the edge list feeds all three legs of the triangle join — persist
    # once instead of re-running the similarity join per leg
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    return (
        pairs.alias("e1")
        .join(pairs.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            pairs.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
        .orderBy("a", "b", "c")
    )


def _dup_triangles_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    return """
with pr as materialized (
{pairs}
),
e as (select doc_a a, doc_b b from pr)
select e1.a a, e1.b b, e2.b c
from e e1
join e e2 on e2.a = e1.b
join e e3 on e3.a = e1.a and e3.b = e2.b
order by e1.a, e1.b, e2.b
""".format(pairs=pairs.strip().rstrip(";"))


def q_label_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-boundary audit: for each query vector (vec_id < 20), its
    nearest neighbor in a DIFFERENT label class vs its nearest
    same-label neighbor — ``is_boundary=1`` when the cross-label
    neighbor is at least as close, the classic mislabeled-or-ambiguous
    flag for curated classification data.

    Scale shape: the bounded query slice joins the corpus as a
    broadcast (|Q|·n rows, |Q| fixed), cosines run in codegen
    (zip_with/aggregate fold — no UDF), and each query reduces through
    ONE map-combined max-struct per side (no window over the corpus).
    The argmax is deterministic: round-6 cosine, ties to the lower
    neighbor id via the negated-id struct field."""
    e = load(spark, sf_dir, "embeddings")
    nrm = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        similarity._norm_expr("embedding").alias("nn"),
    )
    q = nrm.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nn").alias("qn"),
    )
    joined = nrm.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("qn") * F.col("nn")), 6)
    scored = joined.select(
        "query_id",
        "qlabel",
        "label",
        "vec_id",
        cos.alias("cos"),
    )
    best = scored.groupBy("query_id", "qlabel").agg(
        F.max(
            F.when(
                F.col("label") != F.col("qlabel"),
                F.struct(F.col("cos"), (-F.col("vec_id")).alias("negid")),
            )
        ).alias("_x"),
        F.max(
            F.when(
                F.col("label") == F.col("qlabel"),
                F.struct(F.col("cos"), (-F.col("vec_id")).alias("negid")),
            )
        ).alias("_s"),
    )
    return best.select(
        "query_id",
        F.col("qlabel").alias("label"),
        (-F.col("_x.negid")).cast("bigint").alias("nn_other"),
        F.col("_x.cos").alias("cos_other"),
        F.col("_s.cos").alias("cos_same"),
        (F.col("_x.cos") >= F.col("_s.cos")).cast("int").alias("is_boundary"),
    ).orderBy("query_id")


Q_LABEL_BRIDGES_SQL = """
with e as (
  select vec_id, label, [x::DOUBLE for x in embedding] v,
         sqrt(list_dot_product([x::DOUBLE for x in embedding],
                               [x::DOUBLE for x in embedding])) nn
  from embeddings
),
q as (select vec_id query_id, label qlabel, v qv, nn qn from e
      where vec_id < 20),
scored as (
  select q.query_id, q.qlabel, e.label, e.vec_id,
         round(list_dot_product(q.qv, e.v) / (q.qn * e.nn), 6) cos
  from q join e on e.vec_id != q.query_id
),
best as (
  select query_id, qlabel,
         max(case when label != qlabel
                  then struct_pack(cos := cos, negid := -vec_id) end) x,
         max(case when label = qlabel
                  then struct_pack(cos := cos, negid := -vec_id) end) s
  from scored group by query_id, qlabel
)
select query_id, qlabel as "label",
       (-(x.negid))::BIGINT nn_other, x.cos cos_other, s.cos cos_same,
       (x.cos >= s.cos)::INT is_boundary
from best order by query_id
"""


_PAGERANK_ITERS = 6


def q_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate graph (6 power iterations,
    damping 0.85): the centrality ranking of "template" documents — a
    high-PR node is near-duplicated by many already-duplicated
    neighbors, i.e. the boilerplate source the cleanup should target
    first.

    All arithmetic is INTEGER nano-units with a deterministic
    per-edge quantization (floor(0.85 · pr div deg)), so the sum over
    in-neighbors is exact and order-independent — both engines land on
    identical longs every iteration (float PR would ulp-drift apart
    under different add orders and compound across iterations). Each
    superstep is one edge join + one map-combined sum, the same scale
    shape as the CC operators; lineage is truncated per step."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    edges = _tracked_persist(
        pairs.unionByName(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    pr = deg.select("a", F.lit(10**9).cast("long").alias("pr"), "deg")
    base = int(round(0.15 * 1e9))
    for _ in range(_PAGERANK_ITERS):
        contrib = (
            pr.join(edges, "a")
            .select(
                F.col("b").alias("dst"),
                F.floor(F.lit(0.85) * F.expr("pr div deg"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        pr = (
            deg.join(
                contrib, deg.a == contrib.dst, "left"
            )
            .select(
                "a",
                (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0)))
                .cast("long")
                .alias("pr"),
                "deg",
            )
            .localCheckpoint(eager=False)
        )
    return pr.select(
        F.col("a").alias("doc_id"), "pr", "deg"
    ).orderBy(F.col("pr").desc(), "doc_id")


def _dup_pagerank_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    base = int(round(0.15 * 1e9))
    sql = """
with pr_pairs as materialized (
{pairs}
),
e as materialized (
  select doc_a a, doc_b b from pr_pairs
  union all
  select doc_b a, doc_a b from pr_pairs
),
deg as materialized (select a, count(*)::BIGINT deg from e group by a),
p0 as materialized (select a, 1000000000::BIGINT pr, deg from deg)
""".format(pairs=pairs.strip().rstrip(";"))
    prev = "p0"
    for i in range(1, _PAGERANK_ITERS + 1):
        sql += """,
c{i} as materialized (
  select e.b dst, sum(floor(0.85 * (p.pr // p.deg))::BIGINT) in_sum
  from {prev} p join e on e.a = p.a
  group by e.b
),
p{i} as materialized (
  select deg.a, ({base} + coalesce(c{i}.in_sum, 0))::BIGINT pr, deg.deg
  from deg left join c{i} on c{i}.dst = deg.a
)""".format(i=i, prev=prev, base=base)
        prev = "p%d" % i
    sql += """
select a doc_id, pr, deg from {last} order by pr desc, doc_id
""".format(last=prev)
    return sql


def q_dup_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution + assortativity curve of the near-duplicate
    graph: one row per degree class with how many docs have that degree
    and the average degree of their neighbors (knn(k) — rising = hubs
    link to hubs, i.e. template farms interlinked; falling = star
    clusters around one canonical page). The shape tells a dedup
    operator whether pointer-jumping clusters will be shallow stars
    (cheap) or deep meshes before running the expensive CC.

    Scale shape: degrees are ONE map-combined count per node; the
    assortativity leg joins the edge list back to the (node, degree)
    table — edge-sized equi-joins, nothing collected, no windows."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    und = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = _tracked_persist(
        und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    )
    per_degree = deg.groupBy("deg").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    knn = (
        und.join(deg, "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("nbr_deg")),
            "b",
        )
        .groupBy("deg")
        .agg(F.round(F.avg("nbr_deg"), 6).alias("avg_neighbor_degree"))
    )
    return (
        per_degree.join(knn, "deg")
        .select(
            F.col("deg").alias("degree"),
            "n_nodes",
            "avg_neighbor_degree",
        )
        .orderBy("degree")
    )


def _dup_degree_stats_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    return """
with pr as materialized (
{pairs}
),
e as (select doc_a a, doc_b b from pr
      union all select doc_b, doc_a from pr),
deg as materialized (select a, count(*) deg from e group by a),
per_degree as (select deg, count(*) n_nodes from deg group by deg),
knn as (
  select da.deg, round(avg(db.deg), 6) avg_neighbor_degree
  from e join deg da on da.a = e.a join deg db on db.a = e.b
  group by da.deg
)
select per_degree.deg degree, n_nodes, avg_neighbor_degree
from per_degree join knn on knn.deg = per_degree.deg
order by degree
""".format(pairs=pairs.strip().rstrip(";"))


def q_dup_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural link prediction for dedup recall: for every doc pair
    sharing at least one near-dup neighbor, the Jaccard of their
    neighborhoods — a high-overlap pair with ``is_edge = 0`` is a
    duplicate the similarity join MISSED (both docs match the same
    third documents but not each other, the classic boilerplate-
    prefix/suffix failure mode), ranked for human or second-pass
    review.

    Scale shape: the wedge join (edges ⋈ edges on the shared midpoint)
    is the one superlinear step — its size is Σ deg(v)², bounded on a
    near-dup graph by the max duplicate-cluster size, and hub midpoints
    can be capped by degree before the join if a corpus ever grows one
    (the deg table is already materialized here). Everything after is
    edge-sized equi-joins + one map-combined count; no windows, no
    collects."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    und = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    wedges = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.b") == F.col("e2.b"))
        .where(F.col("e1.a") < F.col("e2.a"))
        .groupBy(F.col("e1.a").alias("a"), F.col("e2.a").alias("c"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    scored = (
        wedges.join(deg, "a")
        .join(
            deg.select(F.col("a").alias("c"), F.col("deg").alias("deg_c")),
            "c",
        )
        .join(
            pairs.select("a", F.col("b").alias("c"), F.lit(1).alias("_e")),
            ["a", "c"],
            "left",
        )
    )
    return scored.select(
        F.col("a").alias("doc_a"),
        F.col("c").alias("doc_b"),
        F.col("common").alias("common_neighbors"),
        F.round(
            F.col("common")
            / (F.col("deg") + F.col("deg_c") - F.col("common")),
            6,
        ).alias("neighbor_jaccard"),
        F.coalesce(F.col("_e"), F.lit(0)).cast("int").alias("is_edge"),
    ).orderBy("doc_a", "doc_b")


def _dup_neighbor_jaccard_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    return """
with pr as materialized (
{pairs}
),
e as materialized (select doc_a a, doc_b b from pr
                   union all select doc_b, doc_a from pr),
deg as materialized (select a, count(*) deg from e group by a),
w as (
  select e1.a a, e2.a c, count(*) common
  from e e1 join e e2 on e1.b = e2.b and e1.a < e2.a
  group by 1, 2
)
select w.a doc_a, w.c doc_b, w.common common_neighbors,
       round(w.common::DOUBLE
             / (da.deg + dc.deg - w.common)::DOUBLE, 6) neighbor_jaccard,
       (case when pr.doc_a is null then 0 else 1 end)::INT is_edge
from w
join deg da on da.a = w.a
join deg dc on dc.a = w.c
left join pr on pr.doc_a = w.a and pr.doc_b = w.c
order by doc_a, doc_b
""".format(pairs=pairs.strip().rstrip(";"))


def q_dup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership of the near-duplicate graph: the docs that
    survive iterated peeling of degree-<2 nodes, with their degree
    inside the core — the per-node companion to ``q_dup_triangles``
    (core members sit in cyclic/clique-like duplicate clusters where
    collapse-to-canonical is safe; peeled docs hang off chains where
    transitive merging over-merges). See ``dedup.kcore_edges`` for the
    peel's convergence + lineage-cut discipline."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None)
    core = dedup.kcore_edges(pairs, k=2)
    return (
        core.groupBy("a")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("a").alias("doc_id"), "core_degree")
        .orderBy("doc_id")
    )


def _dup_kcore_duck() -> str:
    peeled = dedup.kcore_duck(
        dedup.jaccard_pairs_duck(threshold=0.7), k=2, rounds=8
    )
    return """
with core as materialized (
{peeled}
)
select a doc_id, count(*) core_degree from core group by a order by doc_id
""".format(peeled=peeled.strip())


def q_winnow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-substring near-dup pairs via MOSS winnowing
    (``dedup.winnow_pairs``): the detector that fires on SHARED
    PASSAGES — any >= k+w-1 = 23-char substring match guarantees a
    shared fingerprint — where shingle-Jaccard only sees whole-document
    similarity. The overlap score is containment-style (shared over the
    smaller fingerprint set), so a paragraph quoted inside a much
    longer page still surfaces.

    Scale: per-doc fingerprinting is pure codegen (array lambdas, no
    UDF); only 60-bit hash ints shuffle; df-capped self-join kills
    stop-fingerprint blowup. See the operator docstrings."""
    d = load(spark, sf_dir, "documents")
    return dedup.winnow_pairs(
        d, k=16, w=8, max_fp_df=8, min_shared=5
    ).orderBy("doc_a", "doc_b")


def _winnow_dedup_duck() -> str:
    return (
        dedup.winnow_pairs_duck(k=16, w=8, max_fp_df=8, min_shared=5)
        + "\norder by doc_a, doc_b"
    )


_KANON_K = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the corpus under two quasi-identifier
    generalization levels (Sweeney's model): treating (lang, source,
    length-bucket) — and the coarser (lang, wide-bucket) — as the
    quasi-identifiers a re-identification join would use, report per
    level how many equivalence classes exist, the anonymity floor
    k_min (the smallest class), and how many ROWS sit in classes
    smaller than k=5 — the release-gate number for publishing corpus
    slices with per-document metadata attached.

    Scale shape: each level is one map-combined hash aggregate over
    the QID tuple followed by a 5-row scalar rollup — no windows, no
    joins, no distincts; the union of levels is two scans Catalyst can
    share. Adding a generalization level is O(one more agg)."""
    d = load(spark, sf_dir, "documents")

    def level(name, cols):
        groups = d.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
        return groups.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_groups"),
            F.min("n").alias("k_min"),
            F.sum((F.col("n") < _KANON_K).cast("bigint")).alias(
                "at_risk_groups"
            ),
            F.sum(
                F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0)
            ).alias("rows_at_risk"),
        )

    fine = level(
        "lang_source_len500",
        [
            F.col("lang"),
            F.col("source"),
            F.expr("n_chars div 500").alias("lb"),
        ],
    )
    coarse = level(
        "lang_len2000", [F.col("lang"), F.expr("n_chars div 2000").alias("lb")]
    )
    return fine.unionByName(coarse).orderBy("level")


Q_K_ANONYMITY_SQL = """
with fine as (
  select lang, source, n_chars // 500 lb, count(*) n
  from documents group by 1, 2, 3
),
coarse as (
  select lang, n_chars // 2000 lb, count(*) n from documents group by 1, 2
)
select 'lang_source_len500' as "level", count(*) n_groups, min(n) k_min,
       sum((n < {k})::BIGINT) at_risk_groups,
       sum(case when n < {k} then n else 0 end) rows_at_risk
from fine
union all
select 'lang_len2000' as "level", count(*), min(n),
       sum((n < {k})::BIGINT),
       sum(case when n < {k} then n else 0 end)
from coarse
order by "level"
""".format(k=_KANON_K)


def q_events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-week) anomaly detection: each (event_type,
    day, hour) cell's count against the average count of the SAME
    weekday+hour slot across the whole stream — ratio > 1 means that
    hour ran hot relative to its own seasonal slot, which is the
    alarm a flat moving-average monitor (``q_events_moving_avg``)
    mutes during daily/weekly cycles. Weekday is computed as
    epoch-days mod 7 — calendar-library-free, so both engines agree
    by arithmetic, not by locale.

    Scale shape: two STACKED map-combined aggregates (cell counts,
    then slot averages over the cell table — the second input is
    |types|·168 rows) and one broadcast-sized join back; no windows
    over the event stream, dates emitted as strings."""
    e = load(spark, sf_dir, "events")
    cells = (
        e.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "dow", F.expr("datediff(to_date(day), date'1970-01-01') % 7")
        )
    )
    slots = cells.groupBy("event_type", "dow", "hour").agg(
        F.round(F.avg("cnt"), 6).alias("baseline")
    )
    return (
        cells.join(F.broadcast(slots), ["event_type", "dow", "hour"])
        .select(
            "event_type",
            "day",
            "hour",
            "cnt",
            "baseline",
            F.round(F.col("cnt") / F.col("baseline"), 6).alias("ratio"),
        )
        .orderBy("event_type", "day", "hour")
    )


Q_EVENTS_SEASONAL_BASELINE_SQL = """
with cells as (
  select event_type, strftime(ts, '%Y-%m-%d') as "day",
         extract(hour from ts) as "hour", count(*) cnt
  from events group by 1, 2, 3
),
cells2 as (
  select *, ("day"::DATE - date '1970-01-01') % 7 dow from cells
),
slots as (
  select event_type, dow, "hour", round(avg(cnt), 6) baseline
  from cells2 group by 1, 2, 3
)
select c.event_type, c."day", c."hour"::INT as "hour", c.cnt,
       s.baseline, round(c.cnt::DOUBLE / s.baseline, 6) ratio
from cells2 c
join slots s on s.event_type = c.event_type and s.dow = c.dow
            and s."hour" = c."hour"
order by c.event_type, c."day", c."hour"
"""


def q_dedup_components_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental duplicate-cluster maintenance: the stored labeling
    (converged CC over the OLD corpus's near-dup pairs, doc_id < 250)
    absorbs a new batch's edges (any pair touching a doc_id >= 250)
    by running converged CC on the CONTRACTED graph — old components
    become super-nodes, so the superstep work is O(new edges), never a
    corpus re-cluster. The oracle is the full recompute over all pairs
    (recursive-CTE fixpoint): contraction provably preserves
    connectivity, so they must agree row-for-row."""
    d = load(spark, sf_dir, "documents")
    all_pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            "doc_a", "doc_b"
        )
    )
    old_pairs = all_pairs.where(
        (F.col("doc_a") < 250) & (F.col("doc_b") < 250)
    )
    new_pairs = all_pairs.where(
        (F.col("doc_a") >= 250) | (F.col("doc_b") >= 250)
    )
    stored = dedup.connected_components_converged(old_pairs)
    return dedup.components_incremental(stored, new_pairs).orderBy("doc_id")


def _dedup_components_inc_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    fix = dedup.components_fixpoint_duck(
        "select doc_a, doc_b from all_pairs"
    ).strip()
    assert fix.startswith("with recursive")
    body = fix[len("with recursive"):]
    return """
with recursive all_pairs as materialized (
{pairs}
),
{body}
order by doc_id
""".format(pairs=pairs.strip().rstrip(";"), body=body.lstrip())


_CURATED_CACHE: Dict[str, DataFrame] = {}


def _curated_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared master-curation chain (v3 stages through golden
    records): Gopher filter → paragraph dedup with reassembly →
    normalized exact dedup → fuzzy-title entity resolution → keep the
    min-id representative per entity. Returns (doc_id, text).

    Memoized per corpus dir (the `ivf_quantizer` discipline): both
    consumers — ``curation_pipeline_v3`` and ``export_manifest`` — run
    the SAME chain, and its most expensive stage (the eagerly-executed
    ER fixpoint inside ``connected_components_converged``) lives in
    checkpointed RDDs on the returned plan, so rebuilding the plan per
    consumer re-runs the whole fixpoint for bit-identical results.
    Deterministic chain → reuse is result-invisible; the oracle replays
    every stage regardless."""
    key = sf_dir.rstrip("/")
    got = _CURATED_CACHE.get(key)
    if got is not None:
        return got
    from bamboo_spark.operators import linkage

    d = load(spark, sf_dir, "documents")
    flags = text.gopher_filter(d)
    kept = d.join(
        flags.where(F.col("keep") == 1).select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    sd = dedup.segment_dedup(kept, block_tokens=20)
    surv = sd.where(F.col("n_kept") > 0).selectExpr(
        "doc_id", "dedup_text as text"
    )
    # min-id representative per normalized key as a MAX-STRUCT AGGREGATE
    # (the engine's canonical argmax shape, pinned at test_plans.py) —
    # map-side combinable, no per-key sort, unlike a row_number window.
    cleaned = _tracked_persist(
        surv.groupBy(text.normalize_text("text").alias("_nk"))
        .agg(F.min(F.struct("doc_id", "text")).alias("_rep"))
        .select(F.col("_rep.doc_id").alias("doc_id"), F.col("_rep.text").alias("text"))
    )
    keyed = cleaned.select(
        "doc_id", F.lower(F.substring("text", 1, 32)).alias("tk")
    )
    pairs = linkage.edit_distance_pairs(keyed, "doc_id", "tk", max_dist=2).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = dedup.connected_components_converged(pairs)
    drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    out = cleaned.join(drop, "doc_id", "left_anti")
    _CURATED_CACHE[key] = out
    return out


def q_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full master pipeline, composed end-to-end: Gopher quality
    filter → paragraph dedup with reassembly → normalized exact dedup →
    fuzzy-title ENTITY RESOLUTION over the cleaned text (PassJoin
    edit-distance pairs d≤2 on 32-char keys → converged components →
    keep the min-id golden record per entity) → per-source corpus
    report (docs kept, total tokens). Six engine operators as ONE
    lazily-composed program; the oracle replays every stage (brute
    pairs + recursive-CTE fixpoint for the ER stage), so the
    composition — not just the parts — is value-gated."""
    from bamboo_spark.operators import linkage

    final = _curated_final(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        final.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr("size(split(text, ' '))"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .orderBy("source")
    )


Q_CURATED_CTES = """
with g as ({gopher}),
kept as (
  select d.doc_id, d.text from documents d join g using (doc_id)
  where g.keep = 1
),
sd as ({segment}),
surv as (
  select doc_id, dedup_text as "text" from sd where n_kept > 0
),
nrm as (
  select *, row_number() over (partition by {norm} order by doc_id) rn
  from surv
),
cleaned as (select doc_id, text from nrm where rn = 1),
keyed as (
  select doc_id, lower(substring(text, 1, 32)) tk,
         length(lower(substring(text, 1, 32))) ln
  from cleaned
),
lk_pairs as (
  select a.doc_id doc_a, b.doc_id doc_b
  from keyed a join keyed b
    on a.doc_id < b.doc_id and abs(a.ln - b.ln) <= 2
  where levenshtein(a.tk, b.tk) <= 2
),
comp as materialized (
{fixpoint}
),
dropd as (select doc_id from comp where doc_id != component),
final as (
  select c.doc_id, c.text from cleaned c
  where c.doc_id not in (select doc_id from dropd)
)"""

Q_CURATION_V3_TAIL = """
select d.source, count(*)::BIGINT n_docs,
       sum(len(string_split(f.text, ' ')))::BIGINT n_tokens
from final f join documents d using (doc_id)
group by d.source order by d.source
"""


def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full export program: master curation (v3 golden records) →
    hash-stable 90% train slice → fixed-token-budget shard manifest
    (2048-token output files) — the last mile of a training-data
    pipeline, from raw corpus to "which file does each doc land in and
    at what offset", as ONE lazily-composed plan. The manifest's prefix
    scan is the distributed two-phase form (P shard totals to the
    driver, no global window); the oracle replays every stage including
    the ER fixpoint and the global-window manifest."""
    final = _curated_final(spark, sf_dir)
    train = final.where(text.stable_sample_pct("doc_id") < 90)
    return pack.shard_manifest(train, shard_tokens=2048).orderBy("doc_id")


def _export_manifest_duck() -> str:
    ctes = Q_CURATED_CTES.format(
        gopher=text.gopher_filter_duck(),
        segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
        norm=text.normalize_text_duck("text"),
        fixpoint=dedup.components_fixpoint_duck(
            "select doc_a, doc_b from lk_pairs"
        ).strip(),
    )
    mani = pack.shard_manifest_duck(shard_tokens=2048, src="train").strip()
    assert mani.startswith("with ")
    return (
        ctes
        + """,
train as (
  select doc_id, text from final where {b} < 90
),
""".format(b=text.stable_sample_pct_duck("doc_id"))
        + mani[len("with "):]
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test assignment: the split hash is taken
    on the DUPLICATE-CLUSTER representative, not the doc — every member
    of a near-dup cluster (MinHash pairs → converged components) lands
    in the same split, so the leakage ``split_leakage`` audits is
    structurally impossible. Singletons hash on themselves; the 90/5/5
    bucketing is the same md5-stable rule as ``q_split_assign``, so
    growing the corpus never migrates an existing cluster.

    Scale: pairs + components are the existing operators; the split
    itself is one equi-join on ``doc_id`` plus a scan-speed projection
    over coalesce(component, doc_id). The component map has one row per
    doc that appears in ANY near-dup pair — data-sized on a web corpus —
    so the join strategy is deliberately left to AQE: it broadcasts only
    when the map actually fits, and shuffles otherwise."""
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.minhash_lsh_pairs(d, threshold=0.7).select("doc_a", "doc_b")
    )
    comp = dedup.connected_components_converged(pairs)
    anchored = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "split_key",
            F.coalesce(F.col("component"), F.col("doc_id")),
        )
        .withColumn("_b", text.stable_sample_pct("split_key"))
    )
    split = (
        F.when(F.col("_b") < 90, F.lit("train"))
        .when(F.col("_b") < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return anchored.select(
        "doc_id", "split_key", split.alias("split")
    ).orderBy("doc_id")


def _leakage_safe_split_duck() -> str:
    fix = dedup.components_fixpoint_duck(
        dedup.jaccard_pairs_duck(threshold=0.7).strip().rstrip(";")
    ).strip()
    b = text.stable_sample_pct_duck("split_key")
    return """
with comp as materialized (
{fix}
),
anch as (
  select d.doc_id, coalesce(c.component, d.doc_id) split_key
  from documents d left join comp c using (doc_id)
)
select doc_id, split_key,
       case when {b} < 90 then 'train'
            when {b} < 95 then 'val' else 'test' end split
from anch order by doc_id
""".format(fix=fix, b=b)


def q_minhash_recall(
    spark: SparkSession,
    sf_dir: str,
    sample_pct: Optional[int] = None,
) -> DataFrame:
    """LSH quality monitor — the text-dedup counterpart of
    ``ann_recall``: the MinHash-LSH pair set measured against the
    exact prefix-filtered Jaccard join (ground truth) — one row of
    (n_exact, n_lsh, n_hit, recall, precision). The check a dedup
    deployment runs after retuning bands/rows, value-gated because
    both sides and the join replay in the oracle.

    Scale contract: the exact Jaccard join is BY DEFINITION the
    expensive side (it is the cost the LSH dedup exists to avoid), so
    at corpus scale the retune check must run on a sample or it costs
    more than the dedup it guards. ``sample_pct=p`` keeps the
    hash-stable p% slice of documents (md5-bucketed — the SAME docs
    every run and in both engines, so the sampled monitor is itself
    oracle-checkable) and measures recall/precision within that slice;
    recall is a per-pair Bernoulli property, so the slice estimate is
    unbiased. Default ``None`` keeps the full exact gate.

    (At the registry's 32×2 banding a 0.7-pair misses with p < 5e-10,
    so recall is expected to be exactly 1.0 — the monitor exists to
    catch a BAD retune, and the oracle proves the monitor itself.)"""
    d = load(spark, sf_dir, "documents")
    if sample_pct is not None:
        d = d.where(text.stable_sample_pct("doc_id") < sample_pct)
    # both pair sets feed TWO consumers each (the hit join + their own
    # count) — persist so neither similarity join runs twice
    exact = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            "doc_a", "doc_b"
        )
    )
    lsh = _tracked_persist(
        dedup.minhash_lsh_pairs(d, threshold=0.7, num_hashes=64).select(
            "doc_a", "doc_b"
        )
    )
    hits = exact.join(lsh, ["doc_a", "doc_b"])
    ne = exact.agg(F.count(F.lit(1)).cast("double").alias("n_exact"))
    nl = lsh.agg(F.count(F.lit(1)).cast("double").alias("n_lsh"))
    nh = hits.agg(F.count(F.lit(1)).cast("double").alias("n_hit"))
    return (
        ne.crossJoin(nl)
        .crossJoin(nh)
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_lsh").cast("bigint").alias("n_lsh"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.when(F.col("n_exact") <= 0, F.lit(1.0))
            .otherwise(F.round(F.col("n_hit") / F.col("n_exact"), 6))
            .alias("recall"),
            F.when(F.col("n_lsh") <= 0, F.lit(1.0))
            .otherwise(F.round(F.col("n_hit") / F.col("n_lsh"), 6))
            .alias("precision"),
        )
    )


def _minhash_recall_duck() -> str:
    # the oracle encodes the banding theorem: at 32×2 bands the LSH
    # pair set EQUALS the exact join (miss p < 5e-10), so both CTEs are
    # the exact pairs — if a retune ever lost a pair, the Spark side's
    # recall would drop below this oracle's 1.0 and the gate would
    # catch it (same approach as the dedup_minhash oracle itself)
    exact = dedup.jaccard_pairs_duck(threshold=0.7).strip().rstrip(";")
    return """
with exact as materialized (
{exact}
),
lsh as (select doc_a, doc_b from exact),
hits as (
  select e.doc_a, e.doc_b from exact e join lsh l
    on e.doc_a = l.doc_a and e.doc_b = l.doc_b
),
c as (
  select (select count(*) from exact)::DOUBLE ne,
         (select count(*) from lsh)::DOUBLE nl,
         (select count(*) from hits)::DOUBLE nh
)
select ne::BIGINT n_exact, nl::BIGINT n_lsh, nh::BIGINT n_hit,
       case when ne <= 0 then 1.0 else round(nh / ne, 6) end recall,
       case when nl <= 0 then 1.0 else round(nh / nl, 6) end "precision"
from c
""".format(exact=exact)


def q_orders_rfm(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """RFM customer segmentation: per customer, Recency (days from
    last order to the corpus max date), Frequency (order count), and
    Monetary (total spend in exact cents), each scored into terciles
    against global cutoffs — the classic 27-cell marketing segmentation
    grid, emitted as per-(r,f,m)-cell customer counts.

    Two map-combined aggregates (per-customer rollup, then the 6 global
    tercile cutoffs as a broadcast row) and a scan-speed scoring pass.
    Money sums in integer cents (order-independent; a float sum would
    hash-diverge across engines). ``approx=True`` is the 100 TB mode:
    exact ``percentile`` merges a counts-map of every distinct
    per-customer value on ONE reducer, while ``approx_percentile`` is a
    mergeable sketch with map-side partials — like its siblings
    ``value_outliers``/``conversion_lag``/``quality_deciles``. The exact
    form stays the oracle-gated default; the approx twin is
    rank-sandwich error-bound-tested in pytest."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    per = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("_mx"), F.col("o_orderdate")))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("cents").cast("bigint").alias("monetary_cents"),
        )
    )
    per = _tracked_persist(per)
    pf = (
        "approx_percentile(%s, %s, 10000)" if approx else "percentile(%s, %s)"
    )
    cuts = per.agg(
        *[
            F.expr(pf % (c, p)).alias("%s_%s" % (c, n))
            for c in ("recency_days", "frequency", "monetary_cents")
            for p, n in ((1.0 / 3, "lo"), (2.0 / 3, "hi"))
        ]
    )

    def tercile(col, lo, hi, invert=False):
        t = (
            F.when(F.col(col) <= F.col(lo), 1)
            .when(F.col(col) <= F.col(hi), 2)
            .otherwise(3)
        )
        return (4 - t) if invert else t

    scored = per.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        # low recency is GOOD: invert so 3 = most recent
        tercile("recency_days", "recency_days_lo", "recency_days_hi", invert=True)
        .cast("int")
        .alias("r"),
        tercile("frequency", "frequency_lo", "frequency_hi")
        .cast("int")
        .alias("f"),
        tercile("monetary_cents", "monetary_cents_lo", "monetary_cents_hi")
        .cast("int")
        .alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("r", "f", "m")
    )


Q_ORDERS_RFM_SQL = """
with o as (
  select o_custkey, o_orderdate,
         round(o_totalprice * 100, 0)::BIGINT cents
  from orders
),
mx as (select max(o_orderdate) mxd from o),
per as (
  select o_custkey,
         min(date_diff('day', o_orderdate, mxd))::BIGINT recency_days,
         count(*)::BIGINT frequency,
         sum(cents)::BIGINT monetary_cents
  from o cross join mx
  group by o_custkey
),
cuts as (
  select quantile_cont(recency_days, 1.0/3) r_lo,
         quantile_cont(recency_days, 2.0/3) r_hi,
         quantile_cont(frequency, 1.0/3) f_lo,
         quantile_cont(frequency, 2.0/3) f_hi,
         quantile_cont(monetary_cents, 1.0/3) m_lo,
         quantile_cont(monetary_cents, 2.0/3) m_hi
  from per
),
scored as (
  select o_custkey,
         (4 - case when recency_days <= r_lo then 1
                   when recency_days <= r_hi then 2 else 3 end)::INT r,
         (case when frequency <= f_lo then 1
               when frequency <= f_hi then 2 else 3 end)::INT f,
         (case when monetary_cents <= m_lo then 1
               when monetary_cents <= m_hi then 2 else 3 end)::INT m
  from per cross join cuts
)
select r, f, m, count(*)::BIGINT n_customers
from scored group by r, f, m order by r, f, m
"""


def q_events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution: per event type, log2-bucketed
    histogram of the seconds between a user's consecutive events of
    that type — the burstiness profile that separates human cadence
    from bot/batch traffic and sets the sessionization gap with data
    instead of folklore.

    One (user, type)-keyed lag window (bounded per key), integer bucket
    math (floor(log2) via bit length — engine-exact), map-combined
    counts over the tiny (type × bucket) grid."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        e.withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            ((F.col("us") - F.col("prev_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("gap_s"),
        )
    )
    # floor(log2(n)) for n > 0 == length of n's binary representation
    # minus one — pure integer/string math, no float log2 whose ULP at
    # 2^k±1 could drift across engines.
    bucket = F.when(F.col("gap_s") <= 0, F.lit(-1)).otherwise(
        F.expr("cast(length(bin(gap_s)) - 1 as int)")
    )
    return (
        gaps.select("event_type", bucket.cast("int").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("event_type", "bucket")
    )


Q_EVENTS_GAP_HIST_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
g as (
  select event_type,
         ((us - lag(us) over (partition by user_id, event_type
                              order by us, event_id)) // 1000000) gap_s
  from e
),
b as (
  select event_type,
         case when gap_s <= 0 then -1
              else (length(bin(gap_s)) - 1)::INT end bucket
  from g where gap_s is not null
)
select event_type, bucket::INT bucket, count(*)::BIGINT n
from b group by event_type, bucket order by event_type, bucket
"""


def q_user_trajectory_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-trajectory similarity: each user's event history
    compresses to a 32-step action string (first letter of each event
    type, time-ordered), and users within 3 edits of each other pair
    up — cohort discovery / bot-ring detection by SEQUENCE shape, not
    aggregate counts (the distributed cousin of trajectory-similarity
    search). Reuses the PassJoin edit-distance join unchanged — the
    operator is domain-agnostic: same segments, same banded verify,
    same lossless-vs-brute-force oracle.

    Only the 32 time-earliest events of a user can ever reach the
    output, so the per-key state is BOUNDED before anything aggregates:
    :func:`scale.ranked_head` (cap=32, order ``(us, event_id)``) plans
    as a Partial WindowGroupLimit below the shuffle — a bot with
    millions of events ships at most 32 rows per map partition, and the
    ``collect_list`` that follows sees <= 32 structs per user. Then the
    linkage machinery takes over."""
    from bamboo_spark.operators import linkage, scale

    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.substring("event_type", 1, 1).alias("c"),
    )
    head = scale.ranked_head(
        e, "user_id", [F.col("us").asc(), F.col("eid").asc()], cap=32
    )
    traj = head.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(us, eid, c))),"
            " x -> x.c), '')"
        ).alias("traj")
    )
    return linkage.edit_distance_pairs(
        traj, "user_id", "traj", max_dist=3
    ).orderBy("id_a", "id_b")


Q_USER_TRAJECTORY_SQL = """
with t as (
  select user_id,
         substring(string_agg(substring(event_type, 1, 1), ''
                   order by epoch_us(ts), event_id), 1, 32) traj
  from events group by user_id
)
select a.user_id id_a, b.user_id id_b,
       levenshtein(a.traj, b.traj)::INT dist
from t a join t b
  on a.user_id < b.user_id
 and abs(length(a.traj) - length(b.traj)) <= 3
where levenshtein(a.traj, b.traj) <= 3
order by id_a, id_b
"""


def q_token_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency monitor: build the mergeable
    depth×width sketch over the token stream, then point-estimate the
    corpus-exact top-15 tokens against it — one row per heavy hitter
    with (token, exact_n, cms_n). cms_n >= exact_n always (CMS never
    underestimates); the gap is the collision overcount, eps*N-bounded.

    This is `token_heavy_hitters`' scale escape hatch made concrete:
    the exact count table is |vocab|-sized standing state, the sketch is
    a FIXED 4×8192 integer grid that merges by cell-wise addition — the
    shape a continuous-ingest monitor keeps. The sketch is
    deterministic (md5-derived buckets), so the oracle replays the grid
    and the estimates bit-for-bit — the estimate VALUES are gated, not
    just bounded.

    Scale: builder is one exploded hash-aggregate (map-side combined,
    <= depth*width rows per task output); the top-15 candidates come
    from a TakeOrderedAndProject (partial top-k); the probe broadcasts
    both monitor-sized sides."""
    from bamboo_spark.operators import sketch

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.col("token") != ""
    )
    cms = sketch.cms_build(toks, "token", depth=4, width=8192)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(15)
    )
    est = sketch.cms_estimate(cms, top, "token", depth=4, width=8192)
    return (
        top.join(est, "token")
        .select("token", "exact_n", "cms_n")
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
    )


def _token_cms_counts_duck() -> str:
    from bamboo_spark.operators import sketch

    b = sketch.bucket_duck("t.token", "r", 8192)
    return """
with occ as (
  select unnest(string_split(text, ' ')) it from documents
),
grid as materialized (
  select r hash_row, {b2} bucket, count(*)::BIGINT n
  from (select it from occ where it <> '') o,
       (select unnest(range(0, 4)) r)
  group by 1, 2
),
top as (
  select it token, count(*)::BIGINT exact_n
  from occ where it <> ''
  group by it order by exact_n desc, token asc limit 15
),
probes as (
  select t.token, t.exact_n, r, {b} bucket
  from top t, (select unnest(range(0, 4)) r)
),
est as (
  select token, min(coalesce(g.n, 0))::BIGINT cms_n
  from probes p left join grid g
    on g.hash_row = p.r and g.bucket = p.bucket
  group by token
)
select t.token, t.exact_n, e.cms_n
from top t join est e using (token)
order by t.exact_n desc, t.token asc
""".format(b=b, b2=sketch.bucket_duck("o.it", "r", 8192))


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data-layout planner: Morton-interleave (user_id, event
    time) into a 32-bit z-key, assign each row to one of 256 files by
    the key's top 8 bits, and emit the per-file manifest (row count +
    min/max of BOTH dimensions). Because the z-curve shares bits
    round-robin, every file covers a tight rectangle in (user, time) —
    a scan filtering on EITHER column prunes most files from the
    manifest alone. That is the OPTIMIZE ZORDER layout pass a 100 TB
    table runs before heavy multi-dimension read traffic; a plain sort
    clusters only its leading column.

    Scale: one 1-row stats aggregate broadcast back, then scan-speed
    integer bit math for key + file assignment (no UDF, codegen-
    friendly), one 256-key aggregate for the manifest. The real write
    would range-partition on zkey; the manifest here IS the proof of
    layout quality and the oracle replays the keys bit-for-bit."""
    from bamboo_spark.operators import scale

    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    stats = e.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("us").alias("t_lo"),
        F.max("us").alias("t_hi"),
    )
    keyed = e.crossJoin(F.broadcast(stats)).withColumn(
        "zkey",
        scale.zorder_key(
            ["user_id", "us"], ["u_lo", "t_lo"], ["u_hi", "t_hi"], bits=16
        ),
    )
    return (
        keyed.withColumn("file_id", F.expr("cast(shiftright(zkey, 24) as int)"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("user_id").cast("bigint").alias("u_min"),
            F.max("user_id").cast("bigint").alias("u_max"),
            F.min("us").cast("bigint").alias("t_min"),
            F.max("us").cast("bigint").alias("t_max"),
        )
        .orderBy("file_id")
    )


def _zorder_layout_duck() -> str:
    from bamboo_spark.operators import scale

    z = scale.zorder_key_duck(
        ["user_id", "us"], ["u_lo", "t_lo"], ["u_hi", "t_hi"], bits=16
    )
    return """
with e as (
  select event_id, user_id, epoch_us(ts) us from events
),
s as (
  select min(user_id) u_lo, max(user_id) u_hi,
         min(us) t_lo, max(us) t_hi from e
),
k as (select user_id, us, {z} zkey from e cross join s)
select (zkey >> 24)::INT file_id, count(*)::BIGINT n_rows,
       min(user_id)::BIGINT u_min, max(user_id)::BIGINT u_max,
       min(us)::BIGINT t_min, max(us)::BIGINT t_max
from k group by 1 order by 1
""".format(z=z)


def q_lang_nb_confusion(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Multinomial Naive Bayes language classifier (McCallum & Nigam
    1998), trained and resubstitution-evaluated on the corpus in ONE
    composed plan: per-(lang, token) counts with Laplace smoothing →
    per-token class log-likelihoods → per-doc argmax → confusion matrix
    (true_lang, pred_lang, n_docs). The classifier-based filter stage
    of a curation pipeline (fastText-style lang-ID/quality gates) in
    its closed-form, oracle-checkable reduction.

    Determinism: every log-probability quantizes to INTEGER micro-nats
    (round(ln(p) * 1e6)) before any sum — per-doc scores are exact
    integer sums (order-independent, engine-exact), and the argmax
    tie-breaks on the class name, so the prediction is bit-stable in
    both engines (the PageRank integer-quantization pattern).

    Scale: token stream aggregates once into the (lang, token) count
    table; the dense likelihood table is |vocab| x |classes| rows —
    vocab-bounded state, broadcast for scoring (``top_v`` caps it with
    an OOV floor per class, the `unigram_surprisal` pattern); scoring
    is the token scan x |classes| (a handful of langs), all map-
    combined aggregates; no window anywhere. The train/score halves are
    the reusable :mod:`bamboo_spark.operators.classify` API."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    likelihoods, classes = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    likelihoods = _tracked_persist(likelihoods)
    pred = classify.nb_classify(
        d, likelihoods, classes, text_col="text", id_col="doc_id",
        out_col="pred_lang",
    )
    return (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


Q_LANG_NB_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
pred as (
  select doc_id, lang pred_lang from (
    select doc_id, lang,
           row_number() over (partition by doc_id
                              order by score desc, lang desc) rn
    from scp
  ) where rn = 1
)
select d.lang true_lang, p.pred_lang, count(*)::BIGINT n_docs
from d join pred p using (doc_id)
group by 1, 2 order by 1, 2
"""


def q_nb_roc(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Per-class one-vs-rest ROC/AUC evaluation of the Naive Bayes
    language classifier — the threshold-tuning companion to the argmax
    confusion matrix (``lang_nb_confusion``): before a curation
    pipeline gates on "classifier says en with margin >= m", this is
    the curve that picks m. The detector score for class c is the
    MARGIN score_c - max of other-class scores (calibration-free
    multiclass-to-binary reduction); AUC is the binned trapezoid over
    1-nat margin buckets clamped to [-50, 50] (ties within a bucket
    midrank, the Mann-Whitney convention).

    Determinism: scores are exact integer micro-nat sums (the NB
    contract), buckets are floor(margin/1e6) clamped — integer
    arithmetic end to end; the AUC numerator sums bucket-count
    products exactly and divides once at the end.

    Scale shape: scoring is the token scan x |classes|; the margin
    self-join is doc-keyed with a |classes|-bounded expansion; the ROC
    histogram is |classes| x 101 rows, so the cumulative window and
    the trapezoid rollup run over a METADATA-sized table — no window
    ever touches the document stream."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    lik, cls = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    lik = _tracked_persist(lik)
    sc = _tracked_persist(
        classify.nb_scores(d, lik, cls, text_col="text", id_col="doc_id")
    )
    other = sc.select(
        F.col("doc_id").alias("_d"),
        F.col("label").alias("_l"),
        F.col("score").alias("_s"),
    )
    marg = (
        sc.join(
            other,
            (F.col("doc_id") == F.col("_d")) & (F.col("label") != F.col("_l")),
        )
        .groupBy("doc_id", "label")
        .agg((F.max("score") - F.max("_s")).alias("margin"))
    )
    lab = marg.join(d.select("doc_id", "lang"), "doc_id").select(
        "label",
        F.greatest(
            F.lit(-50),
            F.least(
                F.lit(50),
                F.floor(F.col("margin") / F.lit(1000000.0)).cast("bigint"),
            ),
        ).alias("bucket"),
        (F.col("lang") == F.col("label")).cast("bigint").alias("p"),
    )
    hist = lab.groupBy("label", "bucket").agg(
        F.sum("p").alias("pos_n"),
        F.sum(F.lit(1) - F.col("p")).alias("neg_n"),
    )
    w = Window.partitionBy("label").orderBy(F.col("bucket").desc())
    cum = hist.withColumn("ctp", F.sum("pos_n").over(w))
    per = cum.groupBy("label").agg(
        F.sum("pos_n").alias("pos"),
        F.sum("neg_n").alias("neg"),
        F.sum(
            F.col("neg_n") * (F.lit(2) * F.col("ctp") - F.col("pos_n"))
        ).alias("num"),
    )
    return per.select(
        "label",
        "pos",
        "neg",
        F.when(
            (F.col("pos") > 0) & (F.col("neg") > 0),
            F.round(
                F.col("num") / (F.lit(2.0) * F.col("pos") * F.col("neg")), 6
            ),
        ).alias("auc"),
    ).orderBy("label")


Q_NB_ROC_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
marg as (
  select a.doc_id, a.lang as "label", a.score - max(b.score) margin
  from scp a join scp b on a.doc_id = b.doc_id and a.lang <> b.lang
  group by a.doc_id, a.lang, a.score
),
lab as (
  select m."label",
         greatest(-50, least(50, floor(m.margin / 1000000.0)::BIGINT)) bucket,
         (d.lang = m."label")::BIGINT p
  from marg m join d on d.doc_id = m.doc_id
),
hist as (
  select "label", bucket, sum(p) pos_n, sum(1 - p) neg_n
  from lab group by 1, 2
),
cum as (
  select *, sum(pos_n) over (partition by "label" order by bucket desc) ctp
  from hist
),
per as (
  select "label", sum(pos_n) pos, sum(neg_n) neg,
         sum(neg_n * (2 * ctp - pos_n)) num
  from cum group by 1
)
select "label", pos, neg,
       case when pos > 0 and neg > 0
            then round(num::DOUBLE / (2.0 * pos * neg), 6) end auc
from per order by "label"
"""


def q_nb_calibration(
    spark: SparkSession,
    sf_dir: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Reliability diagram + Brier score for the Naive Bayes language
    classifier — per confidence decile, does a "90% sure" prediction
    actually hit 90%? The third leg of the classifier-eval family
    (confusion matrix -> threshold curve -> calibration): a gate that
    keeps docs "where classifier confidence >= c" is only as good as
    the calibration of c. Confidence is the softmax posterior of the
    argmax class, computed overflow-safe relative to the max score
    (exp of non-positive micro-nat deltas).

    Determinism: scores are exact integer micro-nats, so the softmax
    inputs are identical doubles in both engines; per-doc confidence
    and Brier contributions quantize to integer micro/nano units
    before the bin sums (the engine's quantize-then-sum rule).

    Scale shape: scoring is the token scan x |classes|; the max /
    softmax / argmax reductions are doc-keyed aggregates that reuse
    one shuffle partitioning; the decile table is 10 rows. No window
    touches the doc stream (argmax is a max-struct aggregate)."""
    from bamboo_spark.operators import classify

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    lik, cls = classify.nb_train(
        d, text_col="text", label_col="lang", top_v=top_v
    )
    lik = _tracked_persist(lik)
    sc = _tracked_persist(
        classify.nb_scores(d, lik, cls, text_col="text", id_col="doc_id")
    )
    agg1 = sc.groupBy("doc_id").agg(
        F.max("score").alias("ms"),
        F.max(F.struct(F.col("score").alias("sc"), F.col("label").alias("cl")))
        .alias("b"),
    )
    den = (
        sc.join(agg1, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.exp((F.col("score") - F.col("ms")) / F.lit(1e6))).alias(
                "inv"
            ),
            F.max(F.col("b.cl")).alias("pred"),
        )
    )
    pd_ = den.join(d.select("doc_id", "lang"), "doc_id").select(
        (F.lit(1.0) / F.col("inv")).alias("p"),
        (F.col("pred") == F.col("lang")).cast("bigint").alias("ok"),
    )
    binned = pd_.select(
        F.least(F.lit(9), F.floor(F.col("p") * 10).cast("bigint")).alias(
            "bin"
        ),
        F.expr("cast(round(p * 1e6, 0) as bigint)").alias("conf_u"),
        "ok",
        F.expr(
            "cast(round((p - ok) * (p - ok) * 1e9, 0) as bigint)"
        ).alias("b_u"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("conf_u") / (F.count(F.lit(1)) * F.lit(1e6)), 6)
            .alias("avg_conf"),
            F.round(F.sum("ok") / F.count(F.lit(1)).cast("double"), 6)
            .alias("accuracy"),
            F.round(F.sum("b_u") / (F.count(F.lit(1)) * F.lit(1e9)), 6)
            .alias("brier"),
        )
        .orderBy("bin")
    )


Q_NB_CALIBRATION_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select doc_id, unnest(string_split(text, ' ')) t from d
),
tk as (select doc_id, t from tok where t <> ''),
labeled as (select tk.doc_id, d.lang, tk.t from tk join d using (doc_id)),
ct as (select lang, t, count(*) c from labeled group by lang, t),
vocab as (select t from (select t, sum(c) cn from ct group by t)),
cls as (select lang, sum(c) tot from ct group by lang),
nv as (select count(*) v from vocab),
dense as (
  select cl.lang, vo.t,
         round(ln((coalesce(ct.c, 0) + 1)::DOUBLE / (cl.tot + nv.v)::DOUBLE)
               * 1e6, 0)::BIGINT lp_u
  from vocab vo cross join cls cl
  left join ct on ct.lang = cl.lang and ct.t = vo.t
  cross join nv
),
flr as (
  select lang, round(ln(1::DOUBLE / (tot + nv.v)::DOUBLE) * 1e6, 0)::BIGINT lp0_u
  from cls cross join nv
),
total as (select count(*) nd from d),
prior as (
  select lang, round(ln(n::DOUBLE / nd::DOUBLE) * 1e6, 0)::BIGINT prior_u
  from (select lang, count(*) n from d group by lang) cross join total
),
sc as (
  select tk.doc_id, f.lang,
         sum(coalesce(de.lp_u, f.lp0_u)) s
  from tk cross join flr f
  left join dense de on de.lang = f.lang and de.t = tk.t
  group by tk.doc_id, f.lang
),
scp as (
  select sc.doc_id, sc.lang, sc.s + p.prior_u score
  from sc join prior p using (lang)
),
mx as (select doc_id, max(score) ms from scp group by doc_id),
pred as (
  select doc_id, lang pred_lang from (
    select doc_id, lang,
           row_number() over (partition by doc_id
                              order by score desc, lang desc) rn
    from scp
  ) where rn = 1
),
den as (
  select s.doc_id, sum(exp((s.score - m.ms) / 1e6)) inv
  from scp s join mx m using (doc_id) group by s.doc_id
),
per_doc as (
  select 1.0 / den.inv p,
         (pred.pred_lang = d.lang)::BIGINT ok
  from den join pred using (doc_id) join d using (doc_id)
),
binned as (
  select least(9, floor(p * 10)::BIGINT) bin,
         round(p * 1e6, 0)::BIGINT conf_u, ok,
         round((p - ok) * (p - ok) * 1e9, 0)::BIGINT b_u
  from per_doc
)
select bin, count(*) n_docs,
       round(sum(conf_u) / (count(*) * 1e6), 6) avg_conf,
       round(sum(ok) / count(*)::DOUBLE, 6) accuracy,
       round(sum(b_u) / (count(*) * 1e9), 6) brier
from binned group by bin order by bin
"""


def q_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily volume — closed-form OLS
    (slope, intercept, r^2) of count-per-day against the day index,
    the "is this source growing or dying" monitor that feeds capacity
    and mixture planning. Days with no events count as ZERO (the grid
    densifies over the global day span), which a naive groupBy-only
    trend silently gets wrong.

    Determinism: x (day index) and y (daily count) are integers, so
    every OLS sufficient statistic (sum x, sum y, sum xy, sum x^2,
    sum y^2) is an EXACT integer sum; the normal-equation numerators
    and denominators multiply as decimal(38,0) (the engine's overflow
    rule for unbounded-count products) and divide to double exactly
    once, round(6). No floats until the final division.

    Scale shape: one map-combined (type, day) count aggregate is the
    only pass over events; the densified grid is |types| x |days| —
    metadata-sized — and the OLS reduction is one more tiny aggregate.
    The 100 TB plan is identical: sufficient statistics are monoid
    partials, so the daily rollup can also merge incrementally."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    days = cells.select("day").distinct()
    types = cells.select("event_type").distinct()
    base = days.agg(F.min("day").alias("d0"))
    grid = (
        days.crossJoin(types)
        .join(cells, ["event_type", "day"], "left")
        .crossJoin(F.broadcast(base))
        .select(
            "event_type",
            F.datediff(F.to_date("day"), F.to_date("d0")).cast("bigint")
            .alias("x"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("y"),
        )
    )
    dec = "decimal(38,0)"
    stats = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return stats.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(num.cast("double") / dx.cast("double"), 6).alias("slope"),
        F.round(inum.cast("double") / dx.cast("double"), 6).alias(
            "intercept"
        ),
        F.when(
            dy > 0,
            F.round(
                (num * num).cast("double")
                / (dx.cast("double") * dy.cast("double")),
                6,
            ),
        ).alias("r2"),
    ).orderBy("event_type")


Q_EVENTS_TREND_SQL = """
with cells as (
  select event_type, strftime(ts, '%Y-%m-%d') as "day", count(*) cnt
  from events group by 1, 2
),
days as (select distinct "day" from cells),
types as (select distinct event_type from cells),
base as (select min("day") d0 from days),
grid as (
  select t.event_type,
         (d."day"::DATE - b.d0::DATE)::BIGINT x,
         coalesce(c.cnt, 0) y
  from days d cross join types t cross join base b
  left join cells c on c.event_type = t.event_type and c."day" = d."day"
),
stats as (
  select event_type,
         count(*)::HUGEINT n, sum(x)::HUGEINT sx, sum(y)::HUGEINT sy,
         sum(x * y)::HUGEINT sxy, sum(x * x)::HUGEINT sxx,
         sum(y::HUGEINT * y::HUGEINT) syy
  from grid group by event_type
)
select event_type, n::BIGINT n_days,
       round((n * sxy - sx * sy)::DOUBLE
             / (n * sxx - sx * sx)::DOUBLE, 6) slope,
       round((sy * sxx - sx * sxy)::DOUBLE
             / (n * sxx - sx * sx)::DOUBLE, 6) intercept,
       case when (n * syy - sy * sy) > 0 then
         round(((n * sxy - sx * sy) * (n * sxy - sx * sy))::DOUBLE
               / ((n * sxx - sx * sx)::DOUBLE
                  * (n * syy - sy * sy)::DOUBLE), 6) end r2
from stats order by event_type
"""


def q_chi2_terms(spark: SparkSession, sf_dir: str, top_k: int = 10) -> DataFrame:
    """Chi-square feature selection: the ``top_k`` most discriminative
    terms per language by the classic 2x2 chi-square statistic over
    DOCUMENT frequency (does this term appear in a doc, not how
    often). This is the standard term-selection step before training
    any text classifier, and doubles as a corpus-QA lens: a term whose
    chi2 explodes for one source/lang is a template artifact.

    Determinism: A/B/C/D are exact integer doc counts; the chi2
    numerator n*(AD-BC)^2 and denominator (A+B)(C+D)(A+C)(B+D) are
    exact decimal(38,0) products (n^5 fits: 10^7 docs -> 10^35), cast
    to double for ONE final division (the ``events_trend`` overflow
    rule), quantized to micro-units for the rank order so ties break
    on the term string identically in both engines.

    Scale shape: one distinct over (doc_id, lang, term) — the only
    doc-sized shuffle — then everything is vocabulary-sized: the
    (lang, term) grid aggregates map-combined, lang totals broadcast
    as |langs| rows, and the top-k per lang is ``ranked_head``'s
    partial WindowGroupLimit below the exchange, never a full sort."""
    from bamboo_spark.operators import scale

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = (
        d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    lt = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    t_tot = lt.groupBy("term").agg(F.sum("a").alias("df_total"))
    l_tot = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_tot = d.agg(F.count(F.lit(1)).alias("n"))
    dec = "decimal(38,0)"
    g = (
        lt.join(t_tot, "term")
        .where(F.col("df_total") >= 5)
        .join(F.broadcast(l_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "lang",
            "term",
            "a",
            "df_total",
            F.col("a").cast(dec).alias("da"),
            (F.col("df_total") - F.col("a")).cast(dec).alias("db"),
            (F.col("n_l") - F.col("a")).cast(dec).alias("dc"),
            (F.col("n") - F.col("n_l") - F.col("df_total") + F.col("a"))
            .cast(dec)
            .alias("dd"),
            F.col("n").cast(dec).alias("dn"),
        )
    )
    num = (
        F.col("dn")
        * (F.col("da") * F.col("dd") - F.col("db") * F.col("dc"))
        * (F.col("da") * F.col("dd") - F.col("db") * F.col("dc"))
    )
    den = (
        (F.col("da") + F.col("db"))
        * (F.col("dc") + F.col("dd"))
        * (F.col("da") + F.col("dc"))
        * (F.col("db") + F.col("dd"))
    )
    scored = g.select(
        "lang",
        "term",
        F.col("a").alias("df_lang"),
        "df_total",
        F.round(num.cast("double") / den.cast("double") * F.lit(1e6), 0)
        .cast("bigint")
        .alias("chi2_u"),
    )
    top = scale.ranked_head(
        scored,
        "lang",
        [F.col("chi2_u").desc(), F.col("term")],
        top_k,
        "rnk",
    )
    return top.select(
        "lang",
        "rnk",
        "term",
        "df_lang",
        "df_total",
        F.round(F.col("chi2_u") / F.lit(1e6), 6).alias("chi2"),
    ).orderBy("lang", "rnk")


Q_CHI2_TERMS_SQL = """
with d as (select doc_id, lang, text from documents),
tok as (
  select distinct doc_id, lang, t term
  from (select doc_id, lang, unnest(string_split(text, ' ')) t from d)
  where t <> ''
),
lt as (select lang, term, count(*)::BIGINT a from tok group by lang, term),
tt as (select term, sum(a)::BIGINT df_total from lt group by term),
ltot as (select lang, count(*)::BIGINT n_l from d group by lang),
ntot as (select count(*)::BIGINT n from d),
g as (
  select lt.lang, lt.term, lt.a, tt.df_total,
         lt.a::HUGEINT da, (tt.df_total - lt.a)::HUGEINT db,
         (ltot.n_l - lt.a)::HUGEINT dc,
         (ntot.n - ltot.n_l - tt.df_total + lt.a)::HUGEINT dd,
         ntot.n::HUGEINT dn
  from lt join tt using (term) join ltot using (lang) cross join ntot
  where tt.df_total >= 5
),
scored as (
  select lang, term, a df_lang, df_total,
         round((dn * (da * dd - db * dc) * (da * dd - db * dc))::DOUBLE
               / ((da + db) * (dc + dd) * (da + dc) * (db + dd))::DOUBLE
               * 1e6, 0)::BIGINT chi2_u
  from g
),
top as (
  select lang, term, df_lang, df_total, chi2_u,
         row_number() over (partition by lang
                            order by chi2_u desc, term) rnk
  from scored
)
select lang, rnk::BIGINT rnk, term, df_lang, df_total,
       round(chi2_u / 1e6, 6) chi2
from top where rnk <= 10 order by lang, rnk
"""


def q_event_seq_ngrams(
    spark: SparkSession, sf_dir: str, top_k: int = 25
) -> DataFrame:
    """Sequential pattern mining, the order-aware sibling of
    ``market_basket``: the ``top_k`` most frequent 3-step event-type
    sequences (consecutive per user in time order), with occurrence
    count, distinct-user support, and share of all trigrams. The
    "view -> click -> purchase vs view -> click -> error" lens that
    transition matrices (first-order) cannot see.

    Determinism: user order is the unique (ts_micros, event_id) key;
    counts are exact integers; the final top-k orders by (n desc,
    t1, t2, t3) — a total order, so the cutoff is identical in both
    engines. share divides two exact integers once, round(6).

    Scale shape: ONE user-keyed window (two leads, state bounded per
    key) is the only event-sized shuffle; the trigram grid is at most
    |types|^3 rows, its aggregate map-combines, the distinct-user
    support shuffles (trigram, user) pairs hash-partitioned, and the
    global top-k is a TakeOrdered (heap per partition, K rows to the
    driver), never a full sort."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    tri = (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t3").isNotNull())
        .select(F.col("event_type").alias("t1"), "t2", "t3", "user_id")
    )
    g = tri.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    tot = g.agg(F.sum("n").alias("_tot"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "t3",
            "n",
            "n_users",
            F.round(F.col("n").cast("double") / F.col("_tot"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(top_k)
    )


Q_EVENT_SEQ_NGRAMS_SQL = """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
s as (
  select user_id, event_type t1,
         lead(event_type, 1) over (partition by user_id
                                   order by us, event_id) t2,
         lead(event_type, 2) over (partition by user_id
                                   order by us, event_id) t3
  from e
),
g as (
  select t1, t2, t3, count(*)::BIGINT n,
         count(distinct user_id)::BIGINT n_users
  from s where t3 is not null group by t1, t2, t3
),
tot as (select sum(n) t from g)
select t1, t2, t3, n, n_users, round(n::DOUBLE / tot.t, 6) as "share"
from g cross join tot
order by n desc, t1, t2, t3 limit 25
"""


def q_pareto_frontier(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = 256,
    max_survivors: int = 1_000_000,
) -> DataFrame:
    """Exact 2-D skyline (Pareto frontier) of suppliers: maximize
    total revenue, minimize average ship delay — the supplier-review
    query "who is strictly better on BOTH axes". A supplier is on the
    frontier iff no other supplier has >= revenue AND <= delay with
    at least one strict. The same operator shape answers "which
    sources give the most tokens at the least dup rate" in curation.

    Determinism: revenue is exact integer cents (quantize-then-sum),
    avg delay is an exact integer floor-division to micro-days, so
    dominance compares integers — no float ulp can flip the frontier.

    Scale shape (grid-prune + exact finish): the fact join and the
    per-supplier aggregate are the only data-sized shuffles. Pruning
    buckets revenue into ``buckets`` equi-width integer bins (range
    from one 1-row broadcast agg); a point dominated by ANY strictly
    higher bucket's min-delay representative is provably off the
    frontier, so the exact sorted prefix-min pass runs only on the
    survivors — at most ~(buckets + |frontier|) points for correlated
    data. An anti-correlated worst case keeps O(n) survivors — that
    cost is INTRINSIC to exact skylines — so the prune is guarded:
    survivors are persisted, counted (a metadata-sized action over the
    per-supplier frame), and if the count exceeds ``max_survivors`` the
    query raises rather than silently planning a near-global sorted
    window; callers on adversarial data should quantize an axis or
    accept an approximate frontier. The oracle is the naive NOT-EXISTS
    dominance anti-join, so the prune's losslessness is value-gated,
    not asserted."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_c"),
        "l_shipdate",
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_suppkey",
            "rev_c",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("delay_d"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum("rev_c").alias("rev_c"),
            F.sum("delay_d").alias("sd"),
            F.count(F.lit(1)).alias("nli"),
        )
        .select(
            "l_suppkey",
            "rev_c",
            F.expr(
                "cast((cast(sd as decimal(38,0)) * 1000000) div nli"
                " as bigint)"
            ).alias("delay_u"),
        )
    )
    rng = per.agg(F.min("rev_c").alias("lo"), F.max("rev_c").alias("hi"))
    # integer-exact bucket id: W = (hi-lo) div buckets + 1; b = (rev-lo) div W
    per2 = per.crossJoin(F.broadcast(rng)).select(
        "l_suppkey",
        "rev_c",
        "delay_u",
        F.expr(
            "cast((rev_c - lo) div ((hi - lo) div {b} + 1) as bigint)".format(
                b=buckets
            )
        ).alias("b"),
    )
    bmin = per2.groupBy("b").agg(F.min("delay_u").alias("m"))
    wb = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    above = bmin.select("b", F.min("m").over(wb).alias("above_min"))
    sv = _tracked_persist(
        per2.join(F.broadcast(above), "b", "left").where(
            F.col("above_min").isNull()
            | (F.col("above_min") > F.col("delay_u"))
        )
    )
    n_sv = sv.count()
    if n_sv > max_survivors:
        raise RuntimeError(
            "pareto frontier: bucket prune left %d survivors "
            "(> max_survivors=%d) — anti-correlated axes make the exact "
            "skyline O(n); quantize an axis or raise the guard"
            % (n_sv, max_survivors)
        )
    pts = sv.select("rev_c", "delay_u").distinct()
    wp = Window.orderBy(F.col("rev_c").desc(), F.col("delay_u")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        pts.withColumn("mp", F.min("delay_u").over(wp))
        .where(F.col("mp").isNull() | (F.col("mp") > F.col("delay_u")))
        .select("rev_c", "delay_u")
    )
    return (
        sv.join(sky, ["rev_c", "delay_u"])
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("delay_u") / F.lit(1e6), 6).alias("avg_delay_days"),
            "rev_c",
        )
        .orderBy(F.col("rev_c").desc(), "suppkey")
        .drop("rev_c")
    )


Q_PARETO_FRONTIER_SQL = """
with li as (
  select l_orderkey, l_suppkey,
         round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT rev_c,
         l_shipdate
  from lineitem
),
j as (
  select li.l_suppkey,
         li.rev_c,
         (li.l_shipdate::DATE - o.o_orderdate::DATE) delay_d
  from li join orders o on li.l_orderkey = o.o_orderkey
),
per as (
  select l_suppkey suppkey, sum(rev_c)::BIGINT rev_c,
         (sum(delay_d)::HUGEINT * 1000000 // count(*))::BIGINT delay_u
  from j group by l_suppkey
),
sky as (
  select * from per p where not exists (
    select 1 from per q
    where q.rev_c >= p.rev_c and q.delay_u <= p.delay_u
      and (q.rev_c > p.rev_c or q.delay_u < p.delay_u))
)
select suppkey, round(rev_c / 100.0, 2) revenue,
       round(delay_u / 1e6, 6) avg_delay_days
from sky order by rev_c desc, suppkey
"""


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of three concentration axes — revenue per
    customer, events per user, tokens per document — the "how skewed
    is this corpus/workload" monitor that decides whether salting,
    capping, or mixture re-weighting is worth running at all (Gini ~0:
    don't bother; ~0.6+: hot keys dominate).

    Exact, not sketched: Gini = sum_ij |y_i - y_j| / (2 n S), and the
    pairwise sum collapses over the DISTINCT-VALUE histogram to
    2 * sum_v c_v * (v * cl_v - sl_v) with cl/sl = count/sum of
    strictly smaller values — integers end to end (decimal(38,0)
    products), ONE double division per dimension, round(6).

    Scale shape: each dimension is one map-combined per-key aggregate
    (the only data-sized shuffles) followed by a value-histogram
    aggregate; the prefix sums over the histogram run through
    ``scale.sharded_prefix_sums`` — range-sharded windows plus
    driver-prefix-summed shard bases (the ``pack.token_offsets``
    shape) — so NO single-partition sort/window exists even when the
    "histogram" is all-distinct (per-customer revenue in cents is);
    the final reduce is 1 row per dimension."""
    dec = "decimal(38,0)"

    def gini(vals: DataFrame, dim: str) -> DataFrame:
        h = (
            vals.groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("cv", (F.col("c") * F.col("v")).cast("bigint"))
        )
        hp = scale.sharded_prefix_sums(h, "v", ["c", "cv"])
        h2 = hp.select(
            F.col("v").cast(dec).alias("v"),
            F.col("c").cast(dec).alias("c"),
            F.col("pre_c").cast(dec).alias("cl"),
            F.col("pre_cv").cast(dec).alias("sl"),
        )
        return h2.agg(
            F.sum(F.col("c")).cast("bigint").alias("n_keys"),
            F.sum(F.col("c") * F.col("v")).cast("bigint").alias("total_v"),
            F.round(
                (
                    F.lit(2)
                    * F.sum(
                        F.col("c") * (F.col("v") * F.col("cl") - F.col("sl"))
                    )
                ).cast("double")
                / (
                    F.lit(2)
                    * F.sum(F.col("c"))
                    * F.sum(F.col("c") * F.col("v"))
                ).cast("double"),
                6,
            ).alias("gini"),
        ).select(F.lit(dim).alias("dimension"), "n_keys", "total_v", "gini")

    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("v")
    )
    e = load(spark, sf_dir, "events")
    user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    d = load(spark, sf_dir, "documents")
    doc = d.select(
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("v")
    )
    return (
        gini(cust.select("v"), "customer_revenue_cents")
        .unionAll(gini(user.select("v"), "user_events"))
        .unionAll(gini(doc, "doc_tokens"))
        .orderBy("dimension")
    )


Q_GINI_CONCENTRATION_SQL = """
with cust as (
  select sum(round(o_totalprice * 100, 0)::BIGINT) v
  from orders group by o_custkey
),
usr as (select count(*)::BIGINT v from events group by user_id),
doc as (
  select len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT v
  from documents
),
g_c as (
  select v::HUGEINT v, count(*)::HUGEINT c from cust group by 1
),
g_u as (
  select v::HUGEINT v, count(*)::HUGEINT c from usr group by 1
),
g_d as (
  select v::HUGEINT v, count(*)::HUGEINT c from doc group by 1
),
p_c as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_c window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
p_u as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_u window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
p_d as (
  select v, c,
         coalesce(sum(c) over w, 0) cl,
         coalesce(sum(c * v) over w, 0) sl
  from g_d window w as (order by v rows between unbounded preceding
                        and 1 preceding)
),
r as (
  select 'customer_revenue_cents' dimension, sum(c)::BIGINT n_keys,
         sum(c * v)::BIGINT total_v,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6) gini
  from p_c
  union all
  select 'user_events', sum(c)::BIGINT, sum(c * v)::BIGINT,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6)
  from p_u
  union all
  select 'doc_tokens', sum(c)::BIGINT, sum(c * v)::BIGINT,
         round((2 * sum(c * (v * cl - sl)))::DOUBLE
               / (2 * sum(c) * sum(c * v))::DOUBLE, 6)
  from p_d
)
select * from r order by dimension
"""


def q_benford_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance test on order totals — the
    classic fabricated-data / broken-generator detector for any
    positive, scale-spanning money column. Per digit 1..9: observed
    count, observed frequency, Benford expectation log10(1+1/d), and
    the signed gap in basis points. A synthetic or truncated price
    column shows up as a flat (or spiky) first-digit histogram.

    Determinism: the first digit comes from the DECIMAL STRING of the
    exact integer cents (never float log10 of the value, whose
    power-of-ten boundaries ulp-drift); counts are integers; the two
    divisions are one-per-row on a 9-row table, round(6).

    Scale shape: one map-combined 9-group aggregate over the scan is
    the entire query — the digit extraction is a scan-speed
    projection, the result is 9 rows."""
    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    dig = o.where(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    g = dig.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = g.agg(F.sum("n_obs").alias("_tot"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("_tot"), 6).alias(
                "freq"
            ),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
            .alias("expected"),
            F.round(
                (
                    F.col("n_obs").cast("double") / F.col("_tot")
                    - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
                )
                * 10000,
                2,
            ).alias("gap_bps"),
        )
        .orderBy("digit")
    )


Q_BENFORD_DQ_SQL = """
with c as (
  select round(o_totalprice * 100, 0)::BIGINT cents from orders
),
dig as (
  select substr(cents::VARCHAR, 1, 1)::BIGINT digit
  from c where cents > 0
),
g as (select digit, count(*)::BIGINT n_obs from dig group by digit),
tot as (select sum(n_obs) t from g)
select digit, n_obs,
       round(n_obs::DOUBLE / tot.t, 6) freq,
       round(log10(1.0 + 1.0 / digit), 6) expected,
       round((n_obs::DOUBLE / tot.t - log10(1.0 + 1.0 / digit)) * 10000,
             2) gap_bps
from g cross join tot order by digit
"""


def q_events_autocorrelation(
    spark: SparkSession, sf_dir: str, max_lag: int = 14
) -> DataFrame:
    """Autocorrelation function of total daily event volume at lags
    1..``max_lag`` — the periodicity detector that says WHICH seasonal
    baseline (daily? weekly?) `events_seasonal_baseline` should model,
    and flags feedback loops (a spike that echoes k days later).

    Exactness trick: with ybar = S/n rational, multiply the classic
    estimator through by n^2 — r_k = sum_t (n*y_t - S)(n*y_{t+k} - S)
    / sum_t (n*y_t - S)^2 — so every term is an exact integer product
    (decimal(38,0)); ONE double division per lag, round(6). Days with
    zero events are densified into the grid first (a silent gap day
    would otherwise shift every lag).

    Scale shape: one map-combined day-count aggregate is the only pass
    over events; everything after runs on the |days|-sized series —
    the lag pairing is a self-equi-join on day index over at most
    |days| x max_lag metadata rows."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    rng = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "d0",
        F.datediff(F.to_date("d1"), F.to_date("d0")).alias("span"),
    )
    grid = (
        rng.select(
            F.explode(F.sequence(F.lit(0), F.col("span"))).alias("x"), "d0"
        )
        .join(
            daily.crossJoin(F.broadcast(rng)).select(
                F.datediff(F.to_date("day"), F.to_date("d0")).alias("x"),
                "y",
            ),
            "x",
            "left",
        )
        .select("x", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    tot = grid.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    dec = "decimal(38,0)"
    dev = grid.crossJoin(F.broadcast(tot)).select(
        "x",
        (
            F.col("n").cast(dec) * F.col("y").cast(dec)
            - F.col("s").cast(dec)
        ).alias("d"),
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = dev.select(F.col("x").alias("xa"), F.col("d").alias("da"))
    b = dev.select(F.col("x").alias("xb"), F.col("d").alias("db"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("xa") + F.col("lag") == F.col("xb"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("da") * F.col("db")).alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


Q_EVENTS_AUTOCORRELATION_SQL = """
with daily as (
  select strftime(ts, '%Y-%m-%d') as "day", count(*)::BIGINT y
  from events group by 1
),
rng as (
  select min("day") d0,
         (max("day")::DATE - min("day")::DATE) span
  from daily
),
grid as (
  select gs.x, coalesce(d.y, 0) y
  from (select unnest(generate_series(0, (select span from rng))) x) gs
  left join (
    select ("day"::DATE - rng.d0::DATE) x, y from daily cross join rng
  ) d using (x)
),
tot as (select count(*)::HUGEINT n, sum(y)::HUGEINT s from grid),
dev as (
  select x, (tot.n * y - tot.s) d from grid cross join tot
),
den as (select sum(d * d) dn from dev),
lags as (select unnest(generate_series(1, 14)) lag),
pairs as (
  select l.lag, count(*)::BIGINT n_pairs, sum(a.d * b.d) num
  from dev a cross join lags l
  join dev b on a.x + l.lag = b.x
  group by l.lag
)
select lag::BIGINT lag, n_pairs,
       round(num::DOUBLE / den.dn::DOUBLE, 6) acf
from pairs cross join den order by lag
"""


def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-likely level-shift day per event type — the CUSUM
    changepoint detector over daily volume. The statistic at split k
    is the cumulative deviation from the series mean, S_k =
    sum_{t<=k}(y_t - ybar); its argmax |S_k| is the classic single
    changepoint estimate ("volume stepped on THIS day"), the monitor
    that separates a regime change (deploy, new source) from the
    point anomalies `events_anomaly` flags.

    Determinism: multiplying through by n makes n*S_k = n*prefix_y -
    (k+1)*total an exact integer per split; the argmax is a max over
    integers with the EARLIEST day winning ties (max-abs then min-day,
    two tiny aggregates — never a window sort over data). Means before
    and after divide exact integers once, round(6).

    Scale shape: one map-combined (type, day) count is the only pass
    over events; the zero-densified grid and its per-type prefix sums
    are |types| x |days| metadata rows (the window partitions by type
    over the day series, state bounded by |days|)."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    days = cells.select("day").distinct()
    types = cells.select("event_type").distinct()
    base = days.agg(F.min("day").alias("d0"))
    grid = (
        days.crossJoin(types)
        .join(cells, ["event_type", "day"], "left")
        .crossJoin(F.broadcast(base))
        .select(
            "event_type",
            "day",
            F.datediff(F.to_date("day"), F.to_date("d0")).cast("bigint")
            .alias("x"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("y"),
        )
    )
    tot = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    dec = "decimal(38,0)"
    w = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pre = (
        grid.join(F.broadcast(tot), "event_type")
        .withColumn("py", F.sum("y").over(w))
        .where(F.col("x") < F.col("n") - 1)
        .select(
            "event_type",
            "day",
            "x",
            "py",
            "n",
            "s",
            (
                F.col("n").cast(dec) * F.col("py").cast(dec)
                - (F.col("x") + 1).cast(dec) * F.col("s").cast(dec)
            ).alias("ns_k"),
        )
    )
    best = pre.groupBy("event_type").agg(
        F.max(F.abs(F.col("ns_k"))).alias("m")
    )
    pick = (
        pre.join(F.broadcast(best), "event_type")
        .where(F.abs(F.col("ns_k")) == F.col("m"))
        .groupBy("event_type")
        .agg(F.min(F.struct("x", "day", "py", "n", "s", "m")).alias("r"))
        .select(
            "event_type",
            F.col("r.day").alias("change_day"),
            F.round(
                F.col("r.m").cast("double") / F.col("r.n").cast("double"), 6
            ).alias("cusum_dev"),
            F.round(
                F.col("r.py").cast("double")
                / (F.col("r.x") + 1).cast("double"),
                6,
            ).alias("mean_before"),
            F.round(
                (F.col("r.s") - F.col("r.py")).cast("double")
                / (F.col("r.n") - F.col("r.x") - 1).cast("double"),
                6,
            ).alias("mean_after"),
        )
    )
    return pick.orderBy("event_type")


Q_CHANGEPOINT_CUSUM_SQL = """
with cells as (
  select event_type, strftime(ts, '%Y-%m-%d') as "day", count(*) cnt
  from events group by 1, 2
),
days as (select distinct "day" from cells),
types as (select distinct event_type from cells),
base as (select min("day") d0 from days),
grid as (
  select t.event_type, d."day",
         (d."day"::DATE - b.d0::DATE)::BIGINT x,
         coalesce(c.cnt, 0)::BIGINT y
  from days d cross join types t cross join base b
  left join cells c on c.event_type = t.event_type and c."day" = d."day"
),
tot as (
  select event_type, count(*)::HUGEINT n, sum(y)::HUGEINT s
  from grid group by event_type
),
pre as (
  select g.event_type, g."day", g.x,
         sum(g.y) over (partition by g.event_type order by g.x
                        rows between unbounded preceding
                        and current row)::HUGEINT py,
         t.n, t.s
  from grid g join tot t using (event_type)
),
dev as (
  select event_type, "day", x, py, n, s,
         (n * py - (x + 1) * s) ns_k
  from pre where x < n - 1
),
best as (select event_type, max(abs(ns_k)) m from dev group by event_type),
pick as (
  select d.event_type, d."day", d.x, d.py, d.n, d.s, b.m,
         row_number() over (partition by d.event_type order by d.x) rn
  from dev d join best b using (event_type)
  where abs(d.ns_k) = b.m
)
select event_type, "day" change_day,
       round(m::DOUBLE / n::DOUBLE, 6) cusum_dev,
       round(py::DOUBLE / (x + 1)::DOUBLE, 6) mean_before,
       round((s - py)::DOUBLE / (n - x - 1)::DOUBLE, 6) mean_after
from pick where rn = 1 order by event_type
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per (lang, source) — the curation
    lens that separates prose from boilerplate/code soup. Per doc:
    words (non-empty tokens), sentences (runs of .!? — floor 1),
    syllables (runs of [aeiouy] in the lowercased text — the standard
    cheap heuristic), then FRE = 206.835 - 1.015*(W/S) - 84.6*(Y/W).
    Grouped: doc counts, average words, average FRE, and the share of
    "plain English" docs (FRE >= 60) — a ready-made quality gate.

    Determinism: the three per-doc counts are exact integers, so the
    per-doc FRE doubles are bit-identical in both engines; each is
    quantized to integer micro-units BEFORE the group sums
    (quantize-then-sum), and each output divides exact integers once,
    round(6).

    Scale shape: pure scan-speed projection (regexp counts per row)
    into one map-combined aggregate over the small (lang, source)
    grid; no shuffle carries text."""
    d = load(spark, sf_dir, "documents").select(
        "lang", "source", F.lower(F.col("text")).alias("t")
    )
    per = d.select(
        "lang",
        "source",
        F.greatest(
            F.lit(1),
            F.size(F.filter(F.split("t", " "), lambda x: x != F.lit(""))),
        )
        .cast("bigint")
        .alias("w"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(t, '[.!?]+', 0)")),
        )
        .cast("bigint")
        .alias("s"),
        F.size(F.expr("regexp_extract_all(t, '[aeiouy]+', 0)"))
        .cast("bigint")
        .alias("y"),
    )
    scored = per.select(
        "lang",
        "source",
        "w",
        F.round(
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("w").cast("double") / F.col("s").cast("double"))
                - F.lit(84.6)
                * (F.col("y").cast("double") / F.col("w").cast("double"))
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("fre_u"),
    )
    return (
        scored.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_words"),
            F.round(
                F.sum("fre_u") / (F.count(F.lit(1)) * F.lit(1e6)), 6
            ).alias("avg_fre"),
            F.round(
                F.sum(
                    F.when(F.col("fre_u") >= 60000000, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("plain_share"),
        )
        .orderBy("lang", "source")
    )


Q_TEXT_READABILITY_SQL = """
with d as (select lang, source, lower(text) t from documents),
per as (
  select lang, source,
         greatest(1, len(list_filter(string_split(t, ' '),
                                     x -> x <> '')))::BIGINT w,
         greatest(1, len(regexp_extract_all(t, '[.!?]+')))::BIGINT s,
         len(regexp_extract_all(t, '[aeiouy]+'))::BIGINT y
  from d
),
scored as (
  select lang, source, w,
         round((206.835 - 1.015 * (w::DOUBLE / s::DOUBLE)
                - 84.6 * (y::DOUBLE / w::DOUBLE)) * 1e6, 0)::BIGINT fre_u
  from per
)
select lang, source, count(*)::BIGINT n_docs,
       round(sum(w)::DOUBLE / count(*), 6) avg_words,
       round(sum(fre_u) / (count(*) * 1e6), 6) avg_fre,
       round(sum(case when fre_u >= 60000000 then 1 else 0 end)::DOUBLE
             / count(*), 6) plain_share
from scored group by lang, source order by lang, source
"""


def q_vocab_growth(
    spark: SparkSession, sf_dir: str, n_buckets: int = 50
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct tokens
    vs cumulative token volume over ``n_buckets`` doc-id slices, plus
    the fitted Heaps exponent beta (slope of the log-log OLS). The
    corpus-scaling monitor that answers "does more data still buy new
    vocabulary, or are we re-crawling the same text?" — a flattening
    curve (beta -> 0) at the corpus tail is a staleness signal.

    Determinism: a token's arrival slice is the bucket of its MIN
    doc_id (an exact integer aggregate); bucket ids are integer range
    buckets from a 1-row broadcast min/max; cumulative sums are
    integers; the log-log regression quantizes ln(x)/ln(y) to integer
    micro-units per bucket BEFORE the OLS sufficient statistics, so
    the double sums never see order-dependent addition.

    Scale shape: the token scan and its min-doc_id aggregate are the
    only data-sized shuffles; everything after lives on the
    ``n_buckets``-row curve (prefix windows + one tiny OLS reduce,
    broadcast back as one row)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    rng = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    bexpr = "cast((doc_id - lo) div ((hi - lo) div {b} + 1) as bigint)".format(
        b=n_buckets
    )
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    toks_per_bucket = (
        tok.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    first_doc = tok.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    new_per_bucket = (
        first_doc.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    docs_per_bucket = (
        d.crossJoin(F.broadcast(rng))
        .select(F.expr(bexpr).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        docs_per_bucket.join(toks_per_bucket, "b", "left")
        .join(new_per_bucket, "b", "left")
        .select(
            "b",
            F.sum("n_docs").over(wc).alias("cum_docs"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))
            .over(wc)
            .alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(wc)
            .alias("cum_vocab"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("new_vocab"),
        )
    )
    dec = "decimal(38,0)"
    pts = curve.where(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).select(
        F.round(F.log(F.col("cum_tokens").cast("double")) * 1e6, 0)
        .cast("long")
        .cast(dec)
        .alias("lx"),
        F.round(F.log(F.col("cum_vocab").cast("double")) * 1e6, 0)
        .cast("long")
        .cast(dec)
        .alias("ly"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    ).select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).cast("double"),
            6,
        ).alias("heaps_beta")
    )
    return (
        curve.crossJoin(F.broadcast(ols))
        .select(
            F.col("b").alias("bucket"),
            "cum_docs",
            "cum_tokens",
            "cum_vocab",
            "new_vocab",
            "heaps_beta",
        )
        .orderBy("bucket")
    )


Q_VOCAB_GROWTH_SQL = """
with d as (select doc_id, text from documents),
rng as (select min(doc_id) lo, max(doc_id) hi from d),
tok as (
  select doc_id, t from (
    select doc_id, unnest(string_split(text, ' ')) t from d
  ) where t <> ''
),
tb as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_tok
  from tok cross join rng group by 1
),
fd as (select t, min(doc_id) doc_id from tok group by t),
nb as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_new
  from fd cross join rng group by 1
),
db as (
  select (doc_id - rng.lo) // ((rng.hi - rng.lo) // 50 + 1) b,
         count(*)::BIGINT n_docs
  from d cross join rng group by 1
),
curve as (
  select db.b,
         sum(db.n_docs) over w cum_docs,
         sum(coalesce(tb.n_tok, 0)) over w cum_tokens,
         sum(coalesce(nb.n_new, 0)) over w cum_vocab,
         coalesce(nb.n_new, 0) new_vocab
  from db left join tb using (b) left join nb using (b)
  window w as (order by db.b rows between unbounded preceding
               and current row)
),
pts as (
  select round(ln(cum_tokens::DOUBLE) * 1e6, 0)::HUGEINT lx,
         round(ln(cum_vocab::DOUBLE) * 1e6, 0)::HUGEINT ly
  from curve where cum_tokens > 0 and cum_vocab > 0
),
ols as (
  select round((count(*)::HUGEINT * sum(lx * ly) - sum(lx) * sum(ly))::DOUBLE
               / (count(*)::HUGEINT * sum(lx * lx)
                  - sum(lx) * sum(lx))::DOUBLE, 6) heaps_beta
  from pts
)
select b bucket, cum_docs::BIGINT cum_docs, cum_tokens::BIGINT cum_tokens,
       cum_vocab::BIGINT cum_vocab, new_vocab, ols.heaps_beta
from curve cross join ols order by bucket
"""


def q_negative_sampling_table(
    spark: SparkSession, sf_dir: str, top_v: int = 1000
) -> DataFrame:
    """Word2vec-style negative-sampling table: the ``top_v`` most
    frequent tokens with sampling probability proportional to
    count^0.75 (the Mikolov smoothing that keeps rare-word negatives
    reachable), plus each token's half-open cumulative range in
    micro-units — ready for "draw u ~ uniform(0, total); binary-search
    the range" samplers on any engine.

    Determinism: counts are exact integers; count^0.75 is one pow on
    identical doubles, quantized to integer micro-units BEFORE the
    normalizing sum and prefix ranges (quantize-then-sum), so ranges
    are exact integers; rank ties break on the token string.

    Scale shape: one map-combined token count is the only data-sized
    shuffle; the top-V cap is a TakeOrdered (never a global sort); the
    prefix window runs over the V-row table only."""
    d = load(spark, sf_dir, "documents").select("text")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(top_v)
    )
    wgt = counts.select(
        "t",
        "n",
        F.round(F.pow(F.col("n").cast("double"), F.lit(0.75)) * 1e6, 0)
        .cast("long")
        .alias("wu"),
    )
    tot = wgt.agg(F.sum("wu").alias("_tot"))
    wr = Window.orderBy(F.col("n").desc(), "t")
    wcum = Window.orderBy(F.col("n").desc(), "t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        wgt.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(wr).cast("bigint").alias("rank"),
            F.col("t").alias("token"),
            "n",
            F.round(F.col("wu").cast("double") / F.col("_tot"), 6).alias(
                "p"
            ),
            F.coalesce(F.sum("wu").over(wcum), F.lit(0))
            .cast("bigint")
            .alias("cum_lo"),
            (
                F.coalesce(F.sum("wu").over(wcum), F.lit(0)) + F.col("wu")
            )
            .cast("bigint")
            .alias("cum_hi"),
        )
        .orderBy("rank")
    )


Q_NEGATIVE_SAMPLING_SQL = """
with tok as (
  select t from (
    select unnest(string_split(text, ' ')) t from documents
  ) where t <> ''
),
counts as (
  select t, count(*)::BIGINT n from tok group by t
  order by n desc, t limit 1000
),
wgt as (
  select t, n, round(pow(n::DOUBLE, 0.75) * 1e6, 0)::BIGINT wu from counts
),
tot as (select sum(wu) tw from wgt),
ranked as (
  select row_number() over (order by n desc, t) rnk, t, n, wu,
         coalesce(sum(wu) over (order by n desc, t
                                rows between unbounded preceding
                                and 1 preceding), 0) cum_lo
  from wgt
)
select rnk::BIGINT rank, t token, n,
       round(wu::DOUBLE / tot.tw, 6) p,
       cum_lo::BIGINT cum_lo, (cum_lo + wu)::BIGINT cum_hi
from ranked cross join tot order by rank
"""


_JS_TOP_V = 2000


def q_source_term_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the distribution-shift matrix behind data-mixture
    decisions (Lin 1991): which sources are near-duplicates of each
    other's vocabulary and which contribute genuinely different text.
    The vocabulary is capped at the global top-``_JS_TOP_V`` tokens
    (count desc, token asc — deterministic); everything else collapses
    into a per-source ``<oov>`` bucket so every distribution is
    complete and the comparison grid is dense.

    Determinism: each term's JS contribution quantizes to integer
    NANO-units before the sum (probabilities are identical doubles in
    both engines — same counts, same division), so the per-pair total
    is an exact integer sum; round(6) once at the end.

    Scale shape: the token stream aggregates ONCE into (source, token)
    counts; everything after runs on the capped (V+1) x |sources| grid
    and its (V+1) x |sources|^2 pair expansion — metadata-sized for
    any real source count. Adding a source is O(grid), not O(corpus).
    """
    d = load(spark, sf_dir, "documents").select("source", "text")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    counts = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    top = (
        counts.groupBy("t")
        .agg(F.sum("c").alias("cn"))
        .orderBy(F.col("cn").desc(), F.col("t").asc())
        .limit(_JS_TOP_V)
        .select("t", F.lit(1).alias("_keep"))
    )
    mapped = (
        counts.join(F.broadcast(top), "t", "left")
        .select(
            "source",
            F.when(F.col("_keep").isNotNull(), F.col("t"))
            .otherwise(F.lit("<oov>"))
            .alias("t2"),
            "c",
        )
        .groupBy("source", "t2")
        .agg(F.sum("c").alias("c"))
    )
    tot = mapped.groupBy("source").agg(F.sum("c").alias("tot"))
    grid_t = mapped.select("t2").distinct()
    sources = tot
    dense = (
        grid_t.crossJoin(sources)
        .join(F.broadcast(mapped), ["source", "t2"], "left")
        .select(
            "source",
            "t2",
            (F.coalesce(F.col("c"), F.lit(0)) / F.col("tot")).alias("p"),
        )
    )
    a = dense.select(
        F.col("source").alias("source_a"), "t2", F.col("p").alias("pa")
    )
    b = dense.select(
        F.col("source").alias("source_b"), "t2", F.col("p").alias("pb")
    )
    # both sides are the (V+1) x |sources| grid — bounded by the
    # _JS_TOP_V cap, so the forced broadcast is size-safe by design
    pairs = a.join(F.broadcast(b), "t2").where(
        F.col("source_a") < F.col("source_b")
    )
    term = pairs.select(
        "source_a",
        "source_b",
        F.expr(
            "cast(round(0.5 * ("
            " case when pa > 0 then pa * ln(pa / ((pa + pb) / 2)) else 0 end"
            " + case when pb > 0 then pb * ln(pb / ((pa + pb) / 2)) else 0 end"
            ") * 1e9, 0) as bigint)"
        ).alias("u"),
    )
    return (
        term.groupBy("source_a", "source_b")
        .agg(F.round(F.sum("u") / F.lit(1e9), 6).alias("js_nats"))
        .orderBy("source_a", "source_b")
    )


Q_SOURCE_TERM_JS_SQL = f"""
with d as (select source, text from documents),
tok as (select source, unnest(string_split(text, ' ')) t from d),
tk as (select source, t from tok where t <> ''),
counts as (select source, t, count(*) c from tk group by 1, 2),
top as (
  select t, 1 as keep_ from (
    select t, sum(c) cn from counts group by t
    order by cn desc, t asc limit {_JS_TOP_V}
  )
),
mapped as (
  select source, case when top.keep_ is not null then counts.t
                      else '<oov>' end t2, sum(c) c
  from counts left join top on top.t = counts.t
  group by 1, 2
),
tot as (select source, sum(c) tot from mapped group by source),
grid_t as (select distinct t2 from mapped),
dense as (
  select tot.source, grid_t.t2,
         coalesce(m.c, 0) / tot.tot::DOUBLE p
  from grid_t cross join tot
  left join mapped m on m.source = tot.source and m.t2 = grid_t.t2
),
pairs as (
  select a.source source_a, b.source source_b, a.t2, a.p pa, b.p pb
  from dense a join dense b on a.t2 = b.t2 and a.source < b.source
),
term as (
  select source_a, source_b,
         round(0.5 * (
           case when pa > 0 then pa * ln(pa / ((pa + pb) / 2)) else 0 end
           + case when pb > 0 then pb * ln(pb / ((pa + pb) / 2)) else 0 end
         ) * 1e9, 0)::BIGINT u
  from pairs
)
select source_a, source_b, round(sum(u) / 1e9, 6) js_nats
from term group by 1, 2 order by 1, 2
"""


_KM_HORIZON_D = 7


def q_km_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-lifetime curve with right-censoring (Kaplan &
    Meier 1958) — the churn-analysis staple a naive "avg days active"
    gets wrong because users still active at the end of the stream are
    CENSORED, not churned. Lifetime = whole days between a user's first
    and last event; a user whose last event is within the final
    ``_KM_HORIZON_D`` days of the stream is censored (still at risk),
    otherwise their lifetime ends in an observed churn. Censored users
    leave the risk set at their duration but contribute no event, per
    the standard tie convention (events before censorings at ties).

    Determinism: each survival step quantizes ln((n-d)/n) to integer
    NANO-nats before the cumulative sum (the PageRank pattern), so the
    running product is an exact integer sum in both engines; exp +
    round(6) only at the end. A step where every remaining user churns
    (n == d) pins survival to exactly 0 from there on via a cumulative
    flag — no ln(0).

    Scale shape: ONE map-combined per-user aggregate (first/last event
    time) is the only pass over the event stream; the KM grid is
    |distinct durations| <= stream-span-in-days rows, so both
    cumulative windows run over a METADATA-sized table."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    per_user = e.groupBy("user_id").agg(
        F.min("us").alias("f"), F.max("us").alias("l")
    )
    mx = e.agg(F.max("us").alias("_m"))
    day_us = 86400 * 1_000_000
    u = per_user.crossJoin(F.broadcast(mx)).select(
        F.expr(f"cast((l - f) div {day_us} as bigint)").alias("dur"),
        (
            F.col("l") <= F.col("_m") - F.lit(_KM_HORIZON_D * day_us)
        ).cast("bigint").alias("ev"),
    )
    grid = u.groupBy("dur").agg(
        F.sum("ev").alias("d"),
        F.count(F.lit(1)).alias("a"),
    )
    total = u.agg(F.count(F.lit(1)).alias("tot"))
    w = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = (
        grid.crossJoin(F.broadcast(total))
        .withColumn("ca", F.sum("a").over(w))
        .withColumn("n_risk", F.col("tot") - (F.col("ca") - F.col("a")))
        .where(F.col("d") > 0)
    )
    g = (
        g.withColumn(
            "step_u",
            F.when(
                F.col("n_risk") > F.col("d"),
                F.expr(
                    "cast(round(ln((n_risk - d) / cast(n_risk as double))"
                    " * 1e9, 0) as bigint)"
                ),
            ).otherwise(F.lit(0)),
        )
        .withColumn("z", (F.col("n_risk") == F.col("d")).cast("bigint"))
        .withColumn("cum_u", F.sum("step_u").over(w))
        .withColumn("cz", F.sum("z").over(w))
    )
    return g.select(
        F.col("dur").alias("dur_days"),
        F.col("n_risk"),
        F.col("d").alias("churned"),
        (F.col("a") - F.col("d")).alias("censored_here"),
        F.when(F.col("cz") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_u") / F.lit(1e9)), 6))
        .alias("survival"),
    ).orderBy("dur_days")


Q_KM_RETENTION_SQL = f"""
with e as (select user_id, epoch_us(ts) us from events),
pu as (select user_id, min(us) f, max(us) l from e group by user_id),
mx as (select max(us) m from e),
u as (
  select (l - f) // {86400 * 1_000_000} dur,
         (l <= m - {_KM_HORIZON_D} * {86400 * 1_000_000}::BIGINT)::BIGINT ev
  from pu cross join mx
),
grid as (select dur, sum(ev) d, count(*) a from u group by dur),
total as (select count(*) tot from u),
g as (
  select *, sum(a) over (order by dur
                         rows between unbounded preceding and current row) ca
  from grid cross join total
),
g2 as (
  select dur, d, a, tot - (ca - a) n_risk from g where d > 0
),
g3 as (
  select *,
         case when n_risk > d
              then round(ln((n_risk - d) / n_risk::DOUBLE) * 1e9, 0)::BIGINT
              else 0 end step_u,
         (n_risk = d)::BIGINT z
  from g2
),
g4 as (
  select *,
         sum(step_u) over (order by dur rows between unbounded preceding
                           and current row) cum_u,
         sum(z) over (order by dur rows between unbounded preceding
                      and current row) cz
  from g3
)
select dur dur_days, n_risk, d churned, a - d censored_here,
       case when cz > 0 then 0.0
            else round(exp(cum_u / 1e9), 6) end survival
from g4 order by dur_days
"""


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


def q_data_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planner: allocate a global token budget (10% of
    the corpus here) across sources by TEMPERATURE-SCALED size
    (weight ∝ sqrt(n_tokens), the multilingual-sampling alpha=0.5 rule
    that up-weights small sources against head domination), capped at
    each source's available tokens. Emits per source: docs, tokens, the
    integer weight, the allocated token budget, and the sampling rate a
    downstream `stable_sample_pct` filter would apply.

    All integer math: weights quantize to micro-units (sqrt is IEEE
    correctly-rounded, so identical in both engines), the allocation is
    exact integer proportional division in decimal(38,0) — no float
    accumulation anywhere, so the plan is bit-stable.

    Scale: one map-combined per-source aggregate (sources are few by
    definition), two 1-row scalar broadcasts. The plan's sampling rates
    feed the existing hash-stable samplers — planner and executor stay
    decoupled exactly like a real curation run."""
    d = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("tk")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tk").cast("bigint").alias("n_tokens"),
    )
    per = per.withColumn(
        "weight_u",
        F.expr("cast(round(sqrt(cast(n_tokens as double)) * 1e6, 0) as bigint)"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_nt"), F.sum("weight_u").alias("_sw")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight_u",
            F.expr(
                "least(cast((cast(_nt div 10 as decimal(38,0)) * weight_u)"
                " div _sw as bigint), n_tokens)"
            ).alias("alloc_tokens"),
        )
        .withColumn(
            "sample_rate",
            F.round(
                F.col("alloc_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


Q_DATA_MIXTURE_SQL = """
with per as (
  select source, count(*)::BIGINT n_docs,
         sum(len(string_split(text, ' ')))::BIGINT n_tokens
  from documents group by source
),
w as (
  select *, round(sqrt(n_tokens::DOUBLE) * 1e6, 0)::BIGINT weight_u from per
),
tot as (select sum(n_tokens) _nt, sum(weight_u) _sw from w)
select source, n_docs, n_tokens, weight_u,
       least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
             n_tokens) alloc_tokens,
       round(least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
                   n_tokens)::DOUBLE / n_tokens::DOUBLE, 6) sample_rate
from w cross join tot
order by source
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner → executor composition: take `data_mixture_plan`'s
    per-source token allocations, convert each to a parts-per-million
    sampling rate, apply it with the md5-stable document sampler
    (ppm-grained twin of ``stable_sample_pct``), and report achieved
    docs/tokens against the allocation. The whole mixture build — size
    stats, temperature weights, integer budget split, deterministic
    per-doc keep/drop — is ONE lazy plan, and the oracle replays every
    stage including which exact documents survive.

    Scale: the plan side is #sources rows; the executor side is a
    scan-speed hash filter (the same rows survive on any cluster, any
    partitioning, any run — resumable and diffable by construction).
    Achieved tokens track the allocation only in expectation
    (sampling is by doc, the budget is tokens), which is exactly how a
    real mixture run behaves — the report makes the drift visible."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("tk")
    )
    plan = q_data_mixture_plan(spark, sf_dir).select(
        "source", "n_tokens", "alloc_tokens"
    )
    rated = plan.withColumn(
        "rate_ppm",
        F.expr(
            "cast((cast(alloc_tokens as decimal(38,0)) * 1000000)"
            " div n_tokens as bigint)"
        ),
    )
    bucket = F.expr(
        "pmod(cast(conv(substr(md5(concat('mix:', cast(doc_id as string))),"
        " 1, 8), 16, 10) as bigint), 1000000)"
    )
    kept = (
        d.join(F.broadcast(rated), "source")
        .where(bucket < F.col("rate_ppm"))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum("tk").cast("bigint").alias("n_tokens_kept"),
            F.max("alloc_tokens").cast("bigint").alias("alloc_tokens"),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("alloc_tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


Q_MIXTURE_SAMPLE_SQL = """
with per as (
  select source, sum(len(string_split(text, ' ')))::BIGINT n_tokens
  from documents group by source
),
w as (
  select *, round(sqrt(n_tokens::DOUBLE) * 1e6, 0)::BIGINT weight_u from per
),
tot as (select sum(n_tokens) _nt, sum(weight_u) _sw from w),
rated as (
  select source, n_tokens,
         least((((_nt // 10)::HUGEINT * weight_u) // _sw)::BIGINT,
               n_tokens) alloc_tokens
  from w cross join tot
),
rp as (
  select *, ((alloc_tokens::HUGEINT * 1000000) // n_tokens)::BIGINT rate_ppm
  from rated
),
d as (
  select doc_id, source, len(string_split(text, ' '))::BIGINT tk
  from documents
),
kept as (
  select d.*, r.alloc_tokens
  from d join rp r using (source)
  where (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT
         % 1000000) < r.rate_ppm
)
select source, count(*)::BIGINT n_docs_kept,
       sum(tk)::BIGINT n_tokens_kept,
       max(alloc_tokens)::BIGINT alloc_tokens,
       round(sum(tk)::DOUBLE / max(alloc_tokens)::DOUBLE, 6) utilization
from kept group by source order by source
"""


def q_distinct_hll_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user monitor with the registers AS DATA:
    build the 2^12-register state over event user_ids, estimate
    cardinality from it, and report against the exact distinct — one
    row (n_exact, hll_est, rel_err). Spark's built-in
    approx_count_distinct answers the one-shot question; this operator
    exists for the cross-job shapes: persisted registers merge with
    tomorrow's batch by cell-wise max (`sketch.hll_merge`) and estimate
    any union of slices WITHOUT rescanning them — the distinct-count
    twin of the CMS grid.

    The md5-derived hash makes the registers deterministic, so the
    oracle replays hash → registers → harmonic-mean estimate (with the
    linear-counting small-range correction) to the same 4 decimals —
    the ESTIMATE is value-gated, not just error-bounded. (The exact
    side is one count-distinct; at corpus scale you'd drop it and trust
    the registers — it's here as the monitor's ground truth.)

    Scale: register build is one map-combined hash-aggregate whose
    shuffle is O(partitions * 2^p); estimate is a 1-row reduce."""
    from bamboo_spark.operators import sketch

    e = load(spark, sf_dir, "events").select("user_id")
    regs = sketch.hll_build(e, "user_id", p=12)
    est = sketch.hll_estimate(regs, p=12)
    exact = e.agg(F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    return exact.crossJoin(est).select(
        "n_exact",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


def _distinct_hll_duck() -> str:
    from bamboo_spark.operators import sketch

    regs = sketch.hll_build_duck(
        "select user_id it from events", p=12
    ).strip()
    est = sketch.hll_estimate_duck("regs_cte", p=12).strip()
    est = est.replace("(regs_cte)", "regs_cte")
    return """
with regs_cte as (
{regs}
),
est as (
{est}
),
ex as (select count(distinct user_id)::BIGINT n_exact from events)
select ex.n_exact, est.hll_est,
       round(abs(est.hll_est - ex.n_exact) / ex.n_exact, 4) rel_err
from ex cross join est
""".format(regs=regs, est=est)


def q_event_user_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-segment audience overlap from bottom-k synopses: per
    event type, the KMV sketch of its user set (k=256 smallest md5
    hashes); per type pair, the Jaccard ESTIMATE computed from the two
    synopses alone — re-trim the union to its k smallest, count hashes
    present in both — side by side with the exact Jaccard of the real
    user sets. The cross-corpus overlap question (shared users, shared
    vocab, contamination surface between sources) answered from
    synopsis-sized state instead of a distinct-join of the raw sets.

    Deterministic md5 hashing means the oracle replays the synopses and
    the estimate exactly (value-gated, like the CMS/HLL monitors); the
    exact side is the monitor's ground truth and would be dropped at
    corpus scale.

    Scale: hashes (8 bytes) shuffle, never user ids; both bottom-k
    trims are the engine's partial top-k (WindowGroupLimit below the
    exchange); the pair grid is #types² — monitor-sized."""
    from bamboo_spark.operators import sketch

    k = 256
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    kmv = _tracked_persist(sketch.kmv_build(e, "event_type", "user_id", k=k))
    est = sketch.kmv_jaccard_pairs(kmv, "event_type", k=k).select(
        F.col("set_a").alias("type_a"),
        F.col("set_b").alias("type_b"),
        "kmv_jaccard",
    )
    ua = e.distinct()
    sizes = ua.groupBy("event_type").agg(F.count(F.lit(1)).alias("nu"))
    inter = (
        ua.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            ua.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    exact = (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("nu").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("nu").alias("nb"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.round(
                F.col("ni").cast("double")
                / (F.col("na") + F.col("nb") - F.col("ni")).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
    )
    return (
        est.join(exact, ["type_a", "type_b"], "full")
        .select(
            "type_a",
            "type_b",
            F.coalesce("kmv_jaccard", F.lit(0.0)).alias("kmv_jaccard"),
            F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def _event_user_overlap_kmv_duck() -> str:
    from bamboo_spark.operators import sketch

    h = sketch.kmv_hash_duck("user_id")
    return """
with hashed as (
  select distinct event_type, {h} h from events where user_id is not null
),
kmv as (
  select event_type, h from (
    select event_type, h,
           row_number() over (partition by event_type order by h) rn
    from hashed
  ) where rn <= 256
),
names as (select distinct event_type s from kmv),
pairs as (
  select a.s set_a, b.s set_b from names a join names b on a.s < b.s
),
u as (
  select set_a, set_b, h, max(ia) ia, max(ib) ib from (
    select p.set_a, p.set_b, k.h, 1 ia, 0 ib
    from pairs p join kmv k on k.event_type = p.set_a
    union all
    select p.set_a, p.set_b, k.h, 0 ia, 1 ib
    from pairs p join kmv k on k.event_type = p.set_b
  ) group by 1, 2, 3
),
trimmed as (
  select * from (
    select *, row_number() over (partition by set_a, set_b order by h) rn
    from u
  ) where rn <= 256
),
est as (
  select set_a type_a, set_b type_b,
         round(sum(ia * ib)::DOUBLE / count(*)::DOUBLE, 6) kmv_jaccard
  from trimmed group by 1, 2
),
ua as (select distinct event_type, user_id from events),
sizes as (select event_type, count(*) nu from ua group by 1),
inter as (
  select a.event_type type_a, b.event_type type_b, count(*) ni
  from ua a join ua b
    on a.user_id = b.user_id and a.event_type < b.event_type
  group by 1, 2
),
exact as (
  select i.type_a, i.type_b,
         round(i.ni::DOUBLE / (sa.nu + sb.nu - i.ni)::DOUBLE, 6) exact_jaccard
  from inter i
  join sizes sa on sa.event_type = i.type_a
  join sizes sb on sb.event_type = i.type_b
)
select coalesce(e.type_a, x.type_a) type_a,
       coalesce(e.type_b, x.type_b) type_b,
       coalesce(e.kmv_jaccard, 0.0) kmv_jaccard,
       coalesce(x.exact_jaccard, 0.0) exact_jaccard
from est e full join exact x using (type_a, type_b)
order by 1, 2
""".format(h=h)


def q_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: a deterministic 2% slice of
    customers files deletion requests (md5-stable selection — the same
    users every run, so the audit is replayable), and the deletion
    propagates through the foreign-key chain customer → orders →
    lineitem. Emits per-table (tbl, n_before, n_deleted, n_after) —
    the compliance report a deletion job publishes before the write.

    Scale: each hop is a key equi-join (semi-join shape); the deletion
    key sets are request-sized, so AQE broadcasts them; counts are
    map-combined. The actual delete would be the same plan with
    anti-joins feeding a rewrite — audit and executor share the plan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    bucket = F.expr(
        "pmod(cast(conv(substr(md5(concat('forget:', cast(c_custkey as"
        " string))), 1, 8), 16, 10) as bigint), 100)"
    )
    del_c = c.where(bucket < 2).select("c_custkey")
    del_o = o.join(del_c, o.o_custkey == del_c.c_custkey, "left_semi").select(
        "o_orderkey"
    )

    def audit(tbl: str, df: DataFrame, deleted: DataFrame) -> DataFrame:
        n_b = df.agg(F.count(F.lit(1)).alias("n_before"))
        n_d = deleted.agg(F.count(F.lit(1)).alias("n_deleted"))
        return (
            n_b.crossJoin(n_d)
            .select(
                F.lit(tbl).alias("tbl"),
                F.col("n_before").cast("bigint").alias("n_before"),
                F.col("n_deleted").cast("bigint").alias("n_deleted"),
                (F.col("n_before") - F.col("n_deleted"))
                .cast("bigint")
                .alias("n_after"),
            )
        )

    del_l = l.join(del_o, l.l_orderkey == del_o.o_orderkey, "left_semi")
    return (
        audit("customer", c, del_c)
        .unionByName(
            audit(
                "orders",
                o,
                o.join(del_c, o.o_custkey == del_c.c_custkey, "left_semi"),
            )
        )
        .unionByName(audit("lineitem", l, del_l))
        .orderBy("tbl")
    )


Q_FORGET_USERS_SQL = """
with del_c as (
  select c_custkey from customer
  where (('0x' || substr(md5('forget:' || c_custkey::VARCHAR), 1, 8))::BIGINT
         % 100) < 2
),
del_o as (
  select o_orderkey from orders
  where o_custkey in (select c_custkey from del_c)
),
a as (
  select 'customer' tbl, (select count(*) from customer)::BIGINT n_before,
         (select count(*) from del_c)::BIGINT n_deleted
  union all
  select 'orders', (select count(*) from orders)::BIGINT,
         (select count(*) from del_o)::BIGINT
  union all
  select 'lineitem', (select count(*) from lineitem)::BIGINT,
         (select count(*) from lineitem
          where l_orderkey in (select o_orderkey from del_o))::BIGINT
)
select tbl, n_before, n_deleted, (n_before - n_deleted)::BIGINT n_after
from a order by tbl
"""


def q_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce audit: an event is NOISE if the same user
    fired the same event type less than 60 s earlier — the double-click
    / retry-storm suppression every event pipeline runs before
    aggregation. Emits per-type (n_events, n_kept, n_dropped,
    drop_rate) so the throttle's bite is visible per signal.

    One (user, type)-keyed lag window — bounded per key, the engine's
    standard gap shape (same as `events_gap_histogram`) — then a
    map-combined per-type rollup. The kept stream itself is the same
    plan minus the rollup."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    flagged = e.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "keep",
        (
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") >= F.lit(60_000_000))
        ).cast("int"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("keep")).cast("bigint").alias("n_dropped"),
        )
        .withColumn(
            "drop_rate",
            F.round(
                F.col("n_dropped").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ),
        )
        .orderBy("event_type")
    )


Q_EVENTS_DEBOUNCE_SQL = """
with e as (
  select user_id, event_type, event_id, epoch_us(ts) us from events
),
f as (
  select event_type,
         case when lag(us) over (partition by user_id, event_type
                                 order by us, event_id) is null
                   or us - lag(us) over (partition by user_id, event_type
                                         order by us, event_id) >= 60000000
              then 1 else 0 end keep
  from e
)
select event_type, count(*)::BIGINT n_events,
       sum(keep)::BIGINT n_kept,
       (count(*) - sum(keep))::BIGINT n_dropped,
       round((count(*) - sum(keep))::DOUBLE / count(*)::DOUBLE, 6) drop_rate
from f group by event_type order by event_type
"""


def q_token_drift_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift from CMS grids ALONE — what you
    actually do with two days' stored sketches: normalize each grid's
    cells to parts-per-million of its own mass and take the per-row L1
    distance. Zero raw-token rescan; the comparison costs depth×width
    cells regardless of corpus size. Here the two "days" are the
    md5-stable halves of the documents table, so the expected drift is
    near zero and a real shift (new source, new language mix) shows up
    as rows of large l1_ppm.

    Integer-exact: cell masses convert to ppm by integer division
    before differencing, so both engines agree bit-for-bit (the grids
    themselves are deterministic md5 state). Output: one row per hash
    row (hash_row, mass_a, mass_b, l1_ppm)."""
    from bamboo_spark.operators import sketch

    d = load(spark, sf_dir, "documents")
    half = text.stable_sample_pct("doc_id") % 2
    toks = d.withColumn("_h", half).select(
        "_h", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    ga = sketch.cms_build(toks.where(F.col("_h") == 0), "token", depth=4, width=2048)
    gb = sketch.cms_build(toks.where(F.col("_h") == 1), "token", depth=4, width=2048)
    j = ga.withColumnRenamed("n", "na").join(
        gb.withColumnRenamed("n", "nb"), ["hash_row", "bucket"], "full"
    ).select(
        "hash_row",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "hash_row",
            "na",
            "nb",
            F.expr(
                "abs(cast(na as decimal(38,0)) * 1000000 div ta"
                " - cast(nb as decimal(38,0)) * 1000000 div tb)"
            ).cast("bigint").alias("cell_l1"),
        )
        .groupBy("hash_row")
        .agg(
            F.sum("na").cast("bigint").alias("mass_a"),
            F.sum("nb").cast("bigint").alias("mass_b"),
            F.sum("cell_l1").cast("bigint").alias("l1_ppm"),
        )
        .orderBy("hash_row")
    )


def _token_drift_cms_duck() -> str:
    from bamboo_spark.operators import sketch

    b = sketch.bucket_duck("o.it", "r", 2048)
    half = text.stable_sample_pct_duck("doc_id")
    return """
with occ as (
  select ({half}) % 2 _h, unnest(string_split(text, ' ')) it
  from documents
),
o2 as (select _h, it from occ where it <> ''),
ga as (
  select r hash_row, {b} bucket, count(*)::BIGINT na
  from (select it from o2 where _h = 0) o, (select unnest(range(0, 4)) r)
  group by 1, 2
),
gb as (
  select r hash_row, {b} bucket, count(*)::BIGINT nb
  from (select it from o2 where _h = 1) o, (select unnest(range(0, 4)) r)
  group by 1, 2
),
j as (
  select coalesce(ga.hash_row, gb.hash_row) hash_row,
         coalesce(ga.bucket, gb.bucket) bucket,
         coalesce(na, 0) na, coalesce(nb, 0) nb
  from ga full join gb using (hash_row, bucket)
),
tot as (select sum(na) ta, sum(nb) tb from j)
select hash_row, sum(na)::BIGINT mass_a, sum(nb)::BIGINT mass_b,
       sum(abs(na::HUGEINT * 1000000 // ta
               - nb::HUGEINT * 1000000 // tb))::BIGINT l1_ppm
from j cross join tot
group by hash_row order by hash_row
""".format(half=half, b=b)


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/Great-Expectations
    shape) over the orders table, compiled to minimal passes: all
    row-level rules — not-null, range, regexp, allow-list — fold into
    ONE map-combined aggregate over one scan (adding a rule never adds
    a pass); `unique` adds one key hash-aggregate and `references` one
    anti-join against the DISTINCT customer keys (AQE broadcasts).
    Output: one row per rule with violation counts and a pass flag —
    the contract gate a 100 TB ingest runs before publishing a batch.
    """
    from bamboo_spark.operators import dq

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rules = [
        dq.not_null("o_custkey"),
        dq.in_range("o_totalprice", 0.0, 600000.0),
        dq.regexp("o_orderpriority", "[1-5]-[A-Z ]+"),
        dq.in_set("o_orderstatus", ["O", "F", "P"]),
        dq.unique("o_orderkey"),
        dq.references("o_custkey", c, "c_custkey"),
    ]
    return dq.dq_report(o, rules)


Q_DQ_REPORT_SQL = """
with base as (
  select count(*) n_rows,
         sum(case when o_custkey is null then 1 else 0 end) v_nn,
         sum(case when o_totalprice is not null
                   and (o_totalprice < 0.0 or o_totalprice > 600000.0)
              then 1 else 0 end) v_rg,
         sum(case when o_orderpriority is not null
                   and not regexp_full_match(o_orderpriority, '([1-5]-[A-Z ]+)')
              then 1 else 0 end) v_re,
         sum(case when o_orderstatus is not null
                   and o_orderstatus not in ('O', 'F', 'P')
              then 1 else 0 end) v_in
  from orders
),
uq as (
  select coalesce(sum(c), 0) v from (
    select count(*) c from orders group by o_orderkey having count(*) > 1
  )
),
rf as (
  select count(*) v from orders
  where o_custkey is not null
    and o_custkey not in (select distinct c_custkey from customer)
),
rep as (
  select 'not_null(o_custkey)' as "rule", 'not_null' kind,
         n_rows, v_nn n_violations from base
  union all
  select 'range(o_totalprice,[0.0,600000.0])', 'range', n_rows, v_rg from base
  union all
  select 'regexp(o_orderpriority)', 'regexp', n_rows, v_re from base
  union all
  select 'in_set(o_orderstatus)', 'in_set', n_rows, v_in from base
  union all
  select 'unique(o_orderkey)', 'unique', n_rows, (select v from uq) from base
  union all
  select 'references(o_custkey->c_custkey)', 'references', n_rows,
         (select v from rf) from base
)
select "rule", kind, n_rows::BIGINT n_rows, n_violations::BIGINT n_violations,
       (n_violations = 0)::INT pass
from rep order by "rule"
"""


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision over the near-dup graph: a 10% md5-stable seed
    slice keeps its trusted lang label, and two SYNCHRONIZED label-
    propagation rounds push labels to unlabeled neighbors (majority
    vote among labeled neighbors; ties break to the smallest label —
    integer votes + a min-struct argmax, so every round is
    deterministic and engine-exact). The snowball-labeling pattern for
    bootstrapping classifier training sets from a small audited seed.

    Output: (doc_id, label, origin) for every labeled doc, origin in
    seed/round1/round2. Scale: per round, one edge⋈labels join + one
    (doc, label) vote aggregate + one argmax aggregate — no windows;
    the rounds unroll as CTEs in the oracle (the PageRank discipline).
    """
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.minhash_lsh_pairs(d, threshold=0.7).select("doc_a", "doc_b")
    )
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    seeds = d.where(text.stable_sample_pct("doc_id") < 10).select(
        "doc_id", F.col("lang").alias("label"), F.lit("seed").alias("origin")
    )

    def one_round(labeled: DataFrame, tag: str) -> DataFrame:
        votes = (
            edges.join(
                labeled.select(
                    F.col("doc_id").alias("doc_b"), "label"
                ),
                "doc_b",
            )
            .join(labeled.select("doc_id"), F.col("doc_a") == F.col("doc_id"), "left_anti")
            .groupBy(F.col("doc_a").alias("doc_id"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        best = (
            votes.groupBy("doc_id")
            .agg(
                F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("b")
            )
            .select("doc_id", F.col("b.label").alias("label"), F.lit(tag).alias("origin"))
        )
        return best

    r1 = _tracked_persist(seeds.unionByName(one_round(seeds, "round1")))
    r2 = r1.unionByName(one_round(r1, "round2"))
    return r2.orderBy("doc_id")


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


def q_length_bucket_efficiency(
    spark: SparkSession, sf_dir: str, batch_size: int = 32
) -> DataFrame:
    """Sequence-length bucketing report: assign every document to a
    power-of-two token-length bucket (integer bit-length math — no
    float log2) and, per bucket, compute the padding waste of batching
    at ``batch_size`` with the bucket's cap as the padded length,
    versus the padding the same docs would cost in UNbucketed global
    batches padded to the corpus max. The classic throughput lever for
    training on variable-length sequences — this report quantifies the
    win before any data moves.

    All integer arithmetic: padded slots = ceil(n/B)*B*cap, waste =
    slots - real tokens. One doc-keyed projection + one bucket-keyed
    map-combined aggregate + a 1-row global broadcast; output is
    |buckets| rows."""
    d = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("len")
    ).where(F.col("len") > 0)
    b = d.withColumn(
        "bucket", F.expr("cast(length(bin(len)) - 1 as int)")
    ).withColumn("cap", F.expr("cast(shiftleft(1, bucket + 1) - 1 as bigint)"))
    per = b.groupBy("bucket", "cap").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("n_tokens"),
    )
    g = d.agg(
        F.max("len").alias("_gmax"), F.count(F.lit(1)).alias("_gn"),
        F.sum("len").alias("_gtok"),
    )
    bs = F.lit(batch_size)
    batches = F.expr("cast(ceil(n_docs / %d.0) as bigint)" % batch_size)
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "bucket",
            "cap",
            "n_docs",
            "n_tokens",
            (batches * bs * F.col("cap") - F.col("n_tokens"))
            .cast("bigint")
            .alias("bucketed_waste"),
            # the same docs' share of the unbucketed padding bill:
            # every doc pads to the global max
            (F.col("n_docs") * F.col("_gmax") - F.col("n_tokens"))
            .cast("bigint")
            .alias("unbucketed_waste"),
        )
        .orderBy("bucket")
    )


Q_LENGTH_BUCKET_SQL = """
with d as (
  select len(string_split(text, ' '))::BIGINT l from documents
  where len(string_split(text, ' ')) > 0
),
b as (
  select l, (length(bin(l)) - 1)::INT bucket,
         ((1::BIGINT << (length(bin(l)))) - 1)::BIGINT cap
  from d
),
per as (
  select bucket, cap, count(*)::BIGINT n_docs, sum(l)::BIGINT n_tokens
  from b group by 1, 2
),
g as (select max(l) _gmax from d)
select bucket, cap, n_docs, n_tokens,
       (ceil(n_docs / 32.0)::BIGINT * 32 * cap - n_tokens)::BIGINT
         bucketed_waste,
       (n_docs * _gmax - n_tokens)::BIGINT unbucketed_waste
from per cross join g
order by bucket
"""


def q_contrastive_negatives(
    spark: SparkSession, sf_dir: str, n_neg: int = 3, buckets: int = 64
) -> DataFrame:
    """Deterministic negative mining for contrastive training: every
    anchor doc (a 5% md5-stable slice) gets ``n_neg`` pseudo-random
    negatives drawn by CONSISTENT HASHING — slot k of an anchor maps to
    a target point in hash space, and the negative is the candidate
    whose own hash is nearest to that point within the target's hash
    bucket. Exact-duplicate texts are excluded (digest inequality), so
    a copy of the anchor can never be its own negative.

    Hash-stable end to end: the same (anchor, k) picks the same
    negative on every run, cluster, and engine — training pairs are
    reproducible and diffable, the property rand() sampling destroys.
    Composes with the dedup layer: anti-join the pair list against
    near-dup components to harden "negative" into "not even similar".

    Scale: candidates pre-bucket by hash (one scan); each (anchor, k)
    equi-joins ONE bucket (~N/buckets candidates — size ``buckets`` ~
    N/1000 at corpus scale), and the pick is a min-struct argmax, no
    window. Output: (doc_id, k, neg_id)."""
    h = (
        "cast(conv(substr(md5(concat('neg:', cast(%s as string))), 1, 15),"
        " 16, 10) as bigint)"
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("_dg"),
        F.expr(h % "doc_id").alias("_hc"),
    )
    cand = d.select(
        F.col("doc_id").alias("neg_id"),
        F.col("_dg").alias("_cdg"),
        "_hc",
        F.expr("pmod(_hc, %d)" % buckets).alias("_cb"),
    )
    anchors = (
        d.where(text.stable_sample_pct("doc_id") < 5)
        .select("doc_id", "_dg")
        .crossJoin(
            spark.range(1, n_neg + 1).select(F.col("id").cast("int").alias("k"))
        )
        .withColumn(
            "_tp",
            F.expr(
                h % "concat(doc_id, ':', k)"
            ),
        )
        .withColumn("_tb", F.expr("pmod(_tp, %d)" % buckets))
    )
    scored = (
        anchors.join(cand, anchors["_tb"] == cand["_cb"])
        .where(
            (F.col("neg_id") != F.col("doc_id"))
            & (F.col("_cdg") != F.col("_dg"))
        )
        .select(
            "doc_id",
            "k",
            F.struct(
                F.abs(F.col("_hc") - F.col("_tp")).alias("dist"),
                F.col("neg_id").alias("nid"),
            ).alias("z"),
        )
    )
    return (
        scored.groupBy("doc_id", "k")
        .agg(F.min("z").alias("b"))
        .select("doc_id", "k", F.col("b.nid").alias("neg_id"))
        .orderBy("doc_id", "k")
    )


Q_CONTRASTIVE_NEG_SQL = """
with d as (
  select doc_id, md5(text) _dg,
         ('0x' || substr(md5('neg:' || doc_id::VARCHAR), 1, 15))::BIGINT _hc
  from documents
),
cand as (
  select doc_id neg_id, _dg _cdg, _hc, _hc % 64 _cb from d
),
anch as (
  select d.doc_id, d._dg, k,
         ('0x' || substr(md5('neg:' || d.doc_id::VARCHAR || ':' || k),
          1, 15))::BIGINT _tp
  from d cross join (select unnest(range(1, 4)) k)
  where (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 5
),
scored as (
  select a.doc_id, a.k, c.neg_id, abs(c._hc - a._tp) dist
  from anch a join cand c on c._cb = a._tp % 64
  where c.neg_id <> a.doc_id and c._cdg <> a._dg
)
select doc_id, k::INT k, neg_id from (
  select doc_id, k, neg_id,
         row_number() over (partition by doc_id, k
                            order by dist, neg_id) rn
  from scored
) where rn = 1
order by doc_id, k
"""


def q_type_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user monitoring from GROUPED HLL
    registers — the keyed-dimension version of `distinct_hll_monitor`:
    one register grid per event type (≤ 2^p rows each, mergeable per
    type with tomorrow's batch), estimated side by side with the exact
    distinct. Output: (event_type, n_exact, hll_est, rel_err).

    Scale: one map-combined (type, idx) aggregate; the per-type
    estimate is a |types|-row reduce; exact side is the monitor's
    ground truth (drop it at corpus scale and trust the registers)."""
    from bamboo_spark.operators import sketch

    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    regs = sketch.hll_build_grouped(e, "event_type", "user_id", p=12)
    est = sketch.hll_estimate_grouped(regs, "event_type", p=12)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_exact",
            "hll_est",
            F.round(
                F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def _type_distinct_hll_duck() -> str:
    from bamboo_spark.operators import sketch

    tail = sketch._HLL_BITS - 12
    h = "(('0x' || substr(md5('hll:' || it::VARCHAR), 1, 15))::BIGINT)"
    idx = "(%s // %d)::INT" % (h, 1 << tail)
    w = "(%s %% %d)" % (h, 1 << tail)
    rho = (
        "case when %s = 0 then %d else %d - length(bin(%s)) end"
        % (w, tail + 1, tail + 1, w)
    )
    m = 1 << 12
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (
        "({a}::DOUBLE * {m} * {m}) / (({m} - _np) + coalesce(_sp, 0::DOUBLE))"
        .format(a=repr(alpha), m=m)
    )
    est = (
        "case when ({raw}) <= 2.5 * {m} and {m} - _np > 0"
        " then {m} * ln({m}::DOUBLE / ({m} - _np))"
        " else ({raw}) end".format(raw=raw, m=m)
    )
    return """
with occ as (
  select event_type, user_id it from events where user_id is not null
),
regs as (
  select event_type, {idx} idx, max({rho})::INT r
  from occ group by 1, 2
),
est as (
  select event_type, round({est}, 4)::DOUBLE hll_est from (
    select event_type, count(*) _np, sum(power(2::DOUBLE, -r)) _sp
    from regs group by event_type
  )
),
ex as (
  select event_type, count(distinct user_id)::BIGINT n_exact
  from events group by event_type
)
select ex.event_type, ex.n_exact, est.hll_est,
       round(abs(est.hll_est - ex.n_exact) / ex.n_exact, 4) rel_err
from ex join est using (event_type)
order by event_type
""".format(idx=idx, rho=rho, est=est)


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over order baskets: for every co-ordered part
    pair (a < b), support counts and LIFT in exact parts-per-million —
    lift_ppm = 1e6 * N * n_ab / (n_a * n_b) — keeping the top 20 pairs
    by (lift, pair). The co-occurrence analysis behind "frequently
    bought together", reduced to integer-exact arithmetic so both
    engines agree bit-for-bit.

    Scale: the pair generation is an ORDER-KEYED self-join (each order
    joins only its own lines — bounded per basket, never a global
    cartesian); per-part supports are one map-combined aggregate
    broadcast back; the global top-20 is TakeOrderedAndProject (partial
    top-k per partition). A basket with L lines emits L(L-1)/2 pairs —
    cap L upstream (ranked_head per order) if baskets are unbounded."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = l.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    part_n = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = l.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "cast((cast(n_ab as decimal(38,0)) * 1000000 * _n)"
                " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.col("lift_ppm").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(20)
    )


Q_MARKET_BASKET_SQL = """
with l as (
  select distinct l_orderkey, l_partkey from lineitem
),
n as (select count(distinct l_orderkey) _n from l),
pn as (select l_partkey, count(*) n_p from l group by 1),
pairs as (
  select a.l_partkey part_a, b.l_partkey part_b, count(*)::BIGINT n_ab
  from l a join l b
    on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
  group by 1, 2
)
select part_a, part_b, n_ab,
       pa.n_p::BIGINT n_a, pb.n_p::BIGINT n_b,
       ((n_ab::HUGEINT * 1000000 * _n) //
        (pa.n_p::HUGEINT * pb.n_p))::BIGINT lift_ppm
from pairs
join pn pa on pa.l_partkey = part_a
join pn pb on pb.l_partkey = part_b
cross join n
order by lift_ppm desc, part_a, part_b
limit 20
"""


def q_audio_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed signal-feature extraction — the audio-modality
    front-end (framing → per-frame energy → zero-crossing rate, the
    mel-spectrogram precursors) with the document text's byte codes
    standing in as the PCM samples (a real codec swaps in at the decode
    step; the windowing/feature math is the part that must be right).
    Per doc: frame count, the peak-energy frame and its exact integer
    energy, and the total zero-crossing count over centered samples.

    Every feature is EXACT integer arithmetic over ascii codes (sum of
    squared centered samples; sign-change counts), computed with
    higher-order array functions — JVM-side, no UDF, no float — so the
    DuckDB oracle replays frame-for-frame. Frames: 32 samples, hop 16
    (50% overlap).

    Scale: one scan; per-row work is O(len), SINGLE-PASS by
    construction — Catalyst does not CSE across lambda invocations, so
    each frame is sliced exactly ONCE (nested transform binds the slice
    to a lambda variable) and peak/argmax/zcr fold in ONE ``aggregate``
    over the frame structs (no ``array_max`` re-scan inside a
    per-element lambda, which would be O(frames²)); nothing shuffles
    but the final per-doc rows."""
    frame, hop = 32, 16
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("transform(split(text, ''), ch -> ascii(ch) - 96)").alias("s"),
    ).where(F.size("s") >= frame)
    # slice each frame ONCE (outer transform), then compute features
    # over the bound lambda variable f — references to f are array
    # lookups, never slice re-evaluations
    win = (
        "transform("
        " transform(sequence(0, cast((size(s) - %d) / %d as int)),"
        "           w -> slice(s, w * %d + 1, %d)),"
        " f -> named_struct("
        "  'e', aggregate(f, 0L, (a, x) -> a + x * x),"
        # Spark array indexing is 0-based: pairs (f[i-1], f[i]) for
        # i in 1..31 == the oracle's 1-based pairs (1,2)..(31,32)
        "  'z', aggregate(sequence(1, %d), 0L, (a, i) ->"
        "    a + if(sign(f[i - 1]) * sign(f[i]) < 0, 1, 0))))"
        % (frame, hop, hop, frame, frame - 1)
    )
    w = d.select("doc_id", F.expr(win).alias("wins"))
    # one fold carrying (best energy, its first index, cursor, zcr sum):
    # strict > keeps the FIRST frame attaining the max, matching the
    # oracle's first-position rule
    st = (
        "aggregate(wins,"
        " named_struct('be', -1L, 'bi', -1, 'cur', 0, 'zs', 0L),"
        " (a, x) -> named_struct("
        "  'be', if(x.e > a.be, x.e, a.be),"
        "  'bi', if(x.e > a.be, a.cur, a.bi),"
        "  'cur', a.cur + 1,"
        "  'zs', a.zs + x.z))"
    )
    return (
        w.select(
            "doc_id",
            F.expr("size(wins)").cast("bigint").alias("n_frames"),
            F.expr(st).alias("_st"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.col("_st.be").cast("bigint").alias("peak_energy"),
            F.col("_st.bi").cast("int").alias("peak_frame"),
            F.col("_st.zs").cast("bigint").alias("total_zcr"),
        )
        .orderBy("doc_id")
    )


Q_AUDIO_WINDOWS_SQL = """
with d as (
  select doc_id,
         [ascii(c) - 96 for c in string_split(text, '')] s
  from documents
),
k as (select doc_id, s from d where len(s) >= 32),
w as (
  select doc_id,
         [struct_pack(
            e := list_sum([x * x for x in s[wi * 16 + 1 : wi * 16 + 32]]),
            z := list_sum([case when sign(s[wi * 16 + i - 1])
                                     * sign(s[wi * 16 + i]) < 0
                                then 1 else 0 end
                           for i in range(2, 33)])
          ) for wi in range(0, ((len(s) - 32) // 16) + 1)] wins
  from k
),
p as (
  select doc_id, wins, list_max([x.e for x in wins]) pe from w
)
select doc_id, len(wins)::BIGINT n_frames,
       pe::BIGINT peak_energy,
       (list_position([x.e for x in wins], pe) - 1)::INT peak_frame,
       list_sum([x.z for x in wins])::BIGINT total_zcr
from p order by doc_id
"""


def q_dedup_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline observability: the per-stage survivor funnel —
    raw → byte-exact dedup → normalized dedup → MinHash near-dup
    (cluster representatives only) — as one report with exact counts
    and removal in basis points. The dashboard number a curation run
    publishes so a collapsed stage (suddenly 40% near-dup removal)
    pages a human before the corpus ships.

    Each stage is the engine's own operator shape (digest aggregates,
    min-struct representatives, LSH pairs → converged components); the
    funnel is monotone by construction. Removal is integer bps —
    10000 * removed div previous-stage — engine-exact."""
    d = _tracked_persist(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # ONE aggregate pass for the first three funnel stages — Spark
    # plans multi-count-distinct via a single-scan Expand (the
    # q_table_profile shape), not three separate corpus scans
    hdr = d.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_distinct(F.md5("text")).alias("n_exact"),
        F.count_distinct(text.normalize_text("text")).alias("n_norm"),
    ).collect()[0]
    n_raw, n_exact, n_norm = (
        int(hdr["n_raw"]), int(hdr["n_exact"]), int(hdr["n_norm"])
    )
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.7).select("doc_a", "doc_b")
    comp = dedup.connected_components_converged(pairs)
    # near-dup stage keeps one representative per cluster: survivors =
    # normalized-unique docs minus non-representative cluster members
    # that survived normalization. Compute it exactly: representatives
    # of norm-unique docs.
    norm_rep = d.groupBy(text.normalize_text("text").alias("_nk")).agg(
        F.min("doc_id").alias("doc_id")
    )
    n_near = (
        norm_rep.join(
            comp.where(F.col("doc_id") != F.col("component")),
            "doc_id",
            "left_anti",
        ).count()
    )
    rows = []
    prev = None
    for stage, n in (
        ("0_raw", n_raw),
        ("1_exact", n_exact),
        ("2_normalized", n_norm),
        ("3_near_dup", n_near),
    ):
        removed_bps = 0 if prev in (None, 0) else (10000 * (prev - n)) // prev
        rows.append((stage, n, int(removed_bps)))
        prev = n
    return spark.createDataFrame(
        rows, "stage string, n_docs long, removed_bps long"
    ).orderBy("stage")


def _dedup_funnel_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7).strip().rstrip(";")
    fix = dedup.components_fixpoint_duck(pairs).strip()
    norm = text.normalize_text_duck("text")
    return """
with comp as materialized (
{fix}
),
s0 as (select count(*) n from documents),
s1 as (select count(distinct md5(text)) n from documents),
s2 as (select count(distinct {norm}) n from documents),
rep as (
  select min(doc_id) doc_id from documents group by {norm}
),
s3 as (
  select count(*) n from rep
  where doc_id not in (
    select doc_id from comp where doc_id <> component
  )
),
f as (
  select '0_raw' stage, (select n from s0) n_docs, null prev
  union all
  select '1_exact', (select n from s1), (select n from s0)
  union all
  select '2_normalized', (select n from s2), (select n from s1)
  union all
  select '3_near_dup', (select n from s3), (select n from s2)
)
select stage, n_docs::BIGINT n_docs,
       coalesce((10000 * (prev - n_docs)) // prev, 0)::BIGINT removed_bps
from f order by stage
""".format(fix=fix, norm=norm)


def q_join_size_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from sketches alone — the classic
    CMS inner-product estimator (Cormode & Muthukrishnan 2005 §4.2):
    |A ⋈_k B| = Σ_k a_k·b_k, and the per-row inner product of A's and
    B's count-min grids OVERestimates it, with min over rows tightest.
    The admission-control question ("will this join explode?") answered
    from two depth×width grids without touching either table again —
    exactly what a planner wants before committing a shuffle.

    Output: one row — exact join size, the CMS estimate, and the
    integer overcount. Deterministic grids → the oracle replays the
    estimate bit-for-bit; the invariant est >= exact is structural.

    Scale: each grid is one map-combined hash-aggregate; the estimate
    joins two ≤ d·w-row grids. The exact side is the ground truth the
    monitor drops at scale."""
    from bamboo_spark.operators import sketch

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    ga = sketch.cms_build(o, "k", depth=4, width=8192)
    gb = sketch.cms_build(l, "k", depth=4, width=8192)
    ip = (
        ga.withColumnRenamed("n", "na")
        .join(gb.withColumnRenamed("n", "nb"), ["hash_row", "bucket"])
        .groupBy("hash_row")
        .agg(
            F.sum(
                F.col("na").cast("decimal(38,0)") * F.col("nb")
            ).alias("dot")
        )
        .agg(F.min("dot").cast("bigint").alias("cms_join_size"))
    )
    exact = o.join(l, "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_join_size")
    )
    return exact.crossJoin(ip).select(
        "exact_join_size",
        "cms_join_size",
        (F.col("cms_join_size") - F.col("exact_join_size"))
        .cast("bigint")
        .alias("overcount"),
    )


def _join_size_cms_duck() -> str:
    from bamboo_spark.operators import sketch

    ba = sketch.bucket_duck("o.it", "r", 8192)
    return """
with ka as (select o_orderkey::VARCHAR it from orders),
kb as (select l_orderkey::VARCHAR it from lineitem),
ga as (
  select r hash_row, {ba} bucket, count(*)::BIGINT na
  from ka o, (select unnest(range(0, 4)) r) group by 1, 2
),
gb as (
  select r hash_row, {ba} bucket, count(*)::BIGINT nb
  from kb o, (select unnest(range(0, 4)) r) group by 1, 2
),
ip as (
  select min(dot)::BIGINT cms_join_size from (
    select ga.hash_row, sum(na::HUGEINT * nb) dot
    from ga join gb using (hash_row, bucket)
    group by ga.hash_row
  )
),
ex as (
  select count(*)::BIGINT exact_join_size
  from orders o join lineitem l on o.o_orderkey = l.l_orderkey
)
select ex.exact_join_size, ip.cms_join_size,
       (ip.cms_join_size - ex.exact_join_size)::BIGINT overcount
from ex cross join ip
""".format(ba=ba)


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") — corpus-level: candidate
    phrases are maximal stopword-free token runs (the islands between
    stopword delimiters), each word scores degree/frequency over the
    whole corpus, a phrase scores the sum of its words' scores, and the
    top 15 phrases by score come back with their occurrence counts.
    The metadata-enrichment stage that tags corpora with salient
    phrases — no model, pure counting.

    Determinism: word scores quantize to integer micro-units
    (degree*1e6 div freq) BEFORE summing, so phrase scores are exact
    integer sums and the ranking is engine-stable. Phrase building uses
    the classic gaps-and-islands running stopword count — a per-doc
    window, bounded per key; word stats are one vocab-bounded aggregate
    broadcast back; the top-15 is TakeOrderedAndProject."""
    sw = ("the", "a", "of", "and", "to")
    sw_list = ", ".join("'%s'" % s for s in sw)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "w"),
        )
        .where(F.col("w") != "")
        .withColumn("is_sw", F.expr("w in (%s)" % sw_list))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    isl = tok.withColumn(
        "isl", F.sum(F.col("is_sw").cast("int")).over(wdoc)
    ).where(~F.col("is_sw"))
    phr = isl.groupBy("doc_id", "isl").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(pos, w))), x -> x.w)"
        ).alias("words")
    )
    phr = _tracked_persist(
        phr.select(
            F.array_join("words", " ").alias("phrase"),
            F.size("words").alias("n_words"),
            F.explode("words").alias("w"),
        )
    )
    stats = (
        phr.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("degree"),
        )
        .select(
            "w",
            F.expr(
                "cast((cast(degree as decimal(38,0)) * 1000000) div freq"
                " as bigint)"
            ).alias("score_u"),
        )
    )
    scored = (
        phr.join(F.broadcast(stats), "w")
        .groupBy("phrase", "n_words")
        .agg(
            F.sum("score_u").alias("_tot"),
            F.count(F.lit(1)).alias("_wocc"),
        )
        # _tot summed over ALL occurrences of the phrase; one
        # occurrence's score = _tot / (occurrences); occurrences =
        # _wocc / n_words (each occurrence contributes n_words rows)
        .select(
            "phrase",
            F.col("n_words").cast("int").alias("n_words"),
            F.expr("cast(_tot div (_wocc div n_words) as bigint)").alias(
                "score_u"
            ),
            F.expr("cast(_wocc div n_words as bigint)").alias("n_occurrences"),
        )
        .orderBy(F.col("score_u").desc(), F.col("phrase").asc())
        .limit(15)
    )
    return scored


Q_RAKE_SQL = """
with tok as (
  select doc_id, w, pos,
         (w in ('the', 'a', 'of', 'and', 'to')) is_sw
  from (
    select doc_id,
           unnest(string_split(text, ' ')) w,
           generate_subscripts(string_split(text, ' '), 1) pos
    from documents
  ) where w <> ''
),
isl as (
  select doc_id, w, pos, is_sw,
         sum(is_sw::INT) over (partition by doc_id order by pos) isl
  from tok
),
phr0 as (
  select doc_id, isl,
         string_agg(w, ' ' order by pos) phrase,
         count(*) n_words
  from isl where not is_sw
  group by doc_id, isl
),
occ as (
  select phrase, n_words, unnest(string_split(phrase, ' ')) w from phr0
),
stats as (
  select w,
         ((sum(n_words)::HUGEINT * 1000000) // count(*))::BIGINT score_u
  from occ group by w
),
scored as (
  select o.phrase, o.n_words::INT n_words,
         (sum(s.score_u) // (count(*) // o.n_words))::BIGINT score_u,
         (count(*) // o.n_words)::BIGINT n_occurrences
  from occ o join stats s using (w)
  group by o.phrase, o.n_words
)
select phrase, n_words, score_u, n_occurrences
from scored order by score_u desc, phrase asc limit 15
"""


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
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
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


def q_sampled_quantiles(
    spark: SparkSession, sf_dir: str, k: int = 1024
) -> DataFrame:
    """Quantiles from a MERGEABLE deterministic sample — the bottom-k
    hash-rank row sample (``sketch.hash_sample``): the k order totals
    whose md5(id) rank is smallest are a uniform sample that is a pure
    function of the id set, so (a) the DuckDB oracle replays the sample
    AND the estimates bit-for-bit, (b) per-shard/per-day samples merge
    by union+re-trim into the corpus sample without rescanning — the
    standing-state percentile monitor the exact ``q_price_quantiles``
    can't be at continuous-ingest scale.

    Estimates are nearest-rank within the sorted sample (index
    ceil(p·m/100), exact integer arithmetic) — an actual observed
    value, never an interpolation, so no float enters until nothing.

    Scale: bottom-k plans TakeOrderedAndProject (per-partition heap, k
    rows to the driver merge); the sort+index step runs over ONE k-row
    array. No global sort of the data anywhere."""
    from bamboo_spark.operators import sketch

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    smp = sketch.hash_sample(o, "id", k=k)
    arr = smp.agg(
        F.sort_array(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).alias("m"),
    )
    ps = F.array(*[F.lit(p) for p in (25, 50, 75, 90, 99)])
    return (
        arr.select(F.explode(ps).alias("p"), "vs", "m")
        .select(
            F.col("p").cast("int").alias("p"),
            F.col("m").cast("bigint").alias("n_sample"),
            F.expr("vs[cast((p * m + 99) div 100 as int) - 1]")
            .cast("bigint")
            .alias("est_cents"),
        )
        .orderBy("p")
    )


def _sampled_quantiles_duck(k: int = 1024) -> str:
    from bamboo_spark.operators import sketch

    smp = sketch.hash_sample_duck("select id, v from o", "id", k=k).strip()
    return """
with o as (
  select o_orderkey id, round(o_totalprice * 100, 0)::BIGINT v from orders
),
s as ({smp}),
a as (select list_sort(list(v)) vs, count(*) m from s),
ps as (select unnest([25, 50, 75, 90, 99]) pq)
select pq::INT p, a.m::BIGINT n_sample,
       a.vs[((pq * a.m + 99) // 100)]::BIGINT est_cents
from ps cross join a order by p
""".format(smp=smp)


# ------------------------------------------------- derived partsupp
#
# The driver's testdata has no partsupp table, which is all that kept
# TPC-H Q2/Q9/Q11/Q16/Q20 out of the registry. partsupp is DERIVED
# deterministically from (part x 4 suppliers) with pure integer
# arithmetic — the SAME derivation in Spark and DuckDB — so the five
# classic query SHAPES (correlated min subquery, profit rollup,
# global-share HAVING, NOT-IN anti join, nested semi joins) run
# oracle-gated end to end. Keys are 0-based contiguous in the
# testdata; the i-th supplier of part p is (p*7 + i*(S div 4)) mod S —
# distinct for i in 0..3 whenever S >= 4.


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey")
    sc = load(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("sn")
    )
    return (
        p.crossJoin(F.broadcast(sc))
        .select(
            "p_partkey",
            "sn",
            F.explode(F.expr("sequence(0, 3)")).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "pmod(p_partkey * 7 + i * greatest(sn div 4, 1), sn)"
            )
            .cast("long")
            .alias("ps_suppkey"),
            F.expr("pmod(p_partkey * 31 + i * 37, 9999) + 1")
            .cast("long")
            .alias("ps_availqty"),
            F.expr("pmod(p_partkey * 101 + i * 997, 99900) + 100")
            .cast("long")
            .alias("ps_supplycost_c"),
        )
    )


_PARTSUPP_DUCK = """
partsupp as (
  select p_partkey ps_partkey,
         ((p_partkey * 7 + u.i * greatest(sc.sn // 4, 1)) % sc.sn)
           ps_suppkey,
         ((p_partkey * 31 + u.i * 37) % 9999 + 1) ps_availqty,
         ((p_partkey * 101 + u.i * 997) % 99900 + 100) ps_supplycost_c
  from part, unnest(range(0, 4)) as u(i),
       (select count(*) sn from supplier) sc
)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 over the derived partsupp: for PROMO parts of size 15,
    the EUROPE supplier(s) offering the minimum supply cost — the
    classic correlated-min-subquery shape, planned as join + per-part
    min aggregate + join-back (no window, no correlated re-execution).

    Scale: partsupp and part filter before the join; the per-part min
    is map-combined; suppliers x nation x region broadcast (dims)."""
    ps = _partsupp(spark, sf_dir)
    pf = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_name")
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = (
        ps.join(pf, ps.ps_partkey == pf.p_partkey)
        .join(F.broadcast(sup), ps.ps_suppkey == F.col("s_suppkey"))
    )
    mc = j.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_c").alias("_mc")
    )
    return (
        j.join(mc, "ps_partkey")
        .where(F.col("ps_supplycost_c") == F.col("_mc"))
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("ps_partkey").alias("partkey"),
            "p_name",
            F.col("ps_supplycost_c").alias("supplycost_c"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "partkey"
        )
        .limit(100)
    )


Q2_MIN_COST_SQL = """
with {ps}
select round(s.s_acctbal, 2) s_acctbal, s.s_name, n.n_name nation,
       ps.ps_partkey partkey, p.p_name, ps.ps_supplycost_c supplycost_c
from partsupp ps
join part p on p.p_partkey = ps.ps_partkey
  and p.p_size = 15 and p.p_type = 'PROMO'
join supplier s on s.s_suppkey = ps.ps_suppkey
join nation n on n.n_nationkey = s.s_nationkey
join region r on r.r_regionkey = n.n_regionkey and r.r_name = 'EUROPE'
where ps.ps_supplycost_c = (
  select min(ps2.ps_supplycost_c)
  from partsupp ps2
  join supplier s2 on s2.s_suppkey = ps2.ps_suppkey
  join nation n2 on n2.n_nationkey = s2.s_nationkey
  join region r2 on r2.r_regionkey = n2.n_regionkey
    and r2.r_name = 'EUROPE'
  where ps2.ps_partkey = ps.ps_partkey
)
order by s_acctbal desc, nation, s_name, partkey
limit 100
""".format(ps=_PARTSUPP_DUCK.strip())


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 over the derived partsupp: profit by supplier nation
    and order year for 'widget' parts — revenue minus supply cost,
    all in exact integer cents so the rollup is engine-exact.

    Scale: lineitem drives; part filter broadcast-prunes early;
    partsupp joins on the composite (part, supp) key; nation/supplier
    broadcast; the (nation, year) grid is tiny."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    pf = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf_dir)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.sum(
                F.col("rev_c") - F.col("ps_supplycost_c") * F.col("qty")
            )
            .cast("bigint")
            .alias("profit_c")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_PROFIT_SQL = """
with {ps}
select n.n_name nation, year(o.o_orderdate::DATE) o_year,
       sum(round(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0)::BIGINT
           - ps.ps_supplycost_c * l.l_quantity::BIGINT)::BIGINT profit_c
from lineitem l
join part p on p.p_partkey = l.l_partkey and p.p_name like '%widget%'
join partsupp ps on ps.ps_partkey = l.l_partkey
  and ps.ps_suppkey = l.l_suppkey
join orders o on o.o_orderkey = l.l_orderkey
join supplier s on s.s_suppkey = l.l_suppkey
join nation n on n.n_nationkey = s.s_nationkey
group by 1, 2 order by nation, o_year desc
""".format(ps=_PARTSUPP_DUCK.strip())


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 over the derived partsupp: parts whose stock value
    (supplycost × availqty) held by ASIA suppliers exceeds 2% of the
    region's total stock value — the global-share HAVING shape, with
    the total riding back as a 1-row broadcast and the 2% cut compared
    in exact integers (50·value > total)."""
    ps = _partsupp(spark, sf_dir)
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    v = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_c").cast("decimal(38,0)")
                * F.col("ps_availqty").cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("value_c")
        )
    )
    tot = v.agg(F.sum(F.col("value_c").cast("decimal(38,0)")).alias("t"))
    return (
        v.crossJoin(F.broadcast(tot))
        .where(
            F.lit(50) * F.col("value_c").cast("decimal(38,0)") > F.col("t")
        )
        .select(F.col("ps_partkey").alias("partkey"), "value_c")
        .orderBy(F.col("value_c").desc(), "partkey")
    )


Q11_STOCK_SQL = """
with {ps},
asia as (
  select s.s_suppkey from supplier s
  join nation n on n.n_nationkey = s.s_nationkey
  join region r on r.r_regionkey = n.n_regionkey and r.r_name = 'ASIA'
),
v as (
  select ps.ps_partkey,
         sum(ps.ps_supplycost_c::HUGEINT * ps.ps_availqty)::BIGINT value_c
  from partsupp ps join asia a on a.s_suppkey = ps.ps_suppkey
  group by 1
),
t as (select sum(value_c::HUGEINT) tv from v)
select ps_partkey partkey, value_c
from v cross join t
where 50 * value_c::HUGEINT > tv
order by value_c desc, partkey
""".format(ps=_PARTSUPP_DUCK.strip())


def q16_parts_supplier_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 over the derived partsupp: distinct-supplier counts
    per (brand, type, size) for non-PROMO, non-Brand#13 parts of eight
    sizes, excluding blacklisted suppliers — the NOT-IN shape planned
    as a broadcast anti join (the blacklist is dimension-sized; the
    reference query's complaint filter becomes a name filter on the
    testdata's columns)."""
    sizes = [3, 7, 11, 15, 19, 23, 27, 31]
    pf = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(sizes)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_name").contains("1"))
        .select(F.col("s_suppkey").alias("_bad"))
    )
    ps = _partsupp(spark, sf_dir)
    return (
        ps.join(pf, ps.ps_partkey == pf.p_partkey)
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == F.col("_bad"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey")
            .cast("bigint")
            .alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_PARTS_SQL = """
with {ps}
select p.p_brand, p.p_type, p.p_size,
       count(distinct ps.ps_suppkey)::BIGINT supplier_cnt
from partsupp ps
join part p on p.p_partkey = ps.ps_partkey
where p.p_brand <> 'Brand#13' and p.p_type <> 'PROMO'
  and p.p_size in (3, 7, 11, 15, 19, 23, 27, 31)
  and ps.ps_suppkey not in (
    select s_suppkey from supplier where s_name like '%1%'
  )
group by 1, 2, 3
order by supplier_cnt desc, p_brand, p_type, p_size
""".format(ps=_PARTSUPP_DUCK.strip())


def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 over the derived partsupp: AMERICA suppliers holding
    more than half a 1996-season's shipped quantity of any 'cold' part
    — the nested-semi-join shape (part name filter → partsupp →
    shipped-quantity threshold → supplier semi join), every subquery
    planned as a join, nothing correlated or re-executed."""
    pf = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("cold"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("shipped"))
    )
    ps = _partsupp(spark, sf_dir)
    qual = (
        ps.join(F.broadcast(pf), ps.ps_partkey == pf.p_partkey)
        .join(
            li,
            (ps.ps_partkey == li.l_partkey)
            & (ps.ps_suppkey == li.l_suppkey),
        )
        .where(F.lit(2) * F.col("ps_availqty") > F.col("shipped"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(
                    F.col("r_name") == "AMERICA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        sup.join(qual, sup.s_suppkey == qual.ps_suppkey, "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


Q20_EXCESS_SQL = """
with {ps}
select s.s_name, n.n_name nation
from supplier s
join nation n on n.n_nationkey = s.s_nationkey
join region r on r.r_regionkey = n.n_regionkey and r.r_name = 'AMERICA'
where s.s_suppkey in (
  select ps.ps_suppkey
  from partsupp ps
  join part p on p.p_partkey = ps.ps_partkey and p.p_name like 'cold%'
  join (
    select l_partkey, l_suppkey, sum(l_quantity::BIGINT) shipped
    from lineitem
    where l_shipdate::DATE >= date '1996-01-01'
      and l_shipdate::DATE < date '1997-01-01'
    group by 1, 2
  ) q on q.l_partkey = ps.ps_partkey and q.l_suppkey = ps.ps_suppkey
  where 2 * ps.ps_availqty > q.shipped
)
order by s_name
""".format(ps=_PARTSUPP_DUCK.strip())


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram diversity for n = 1..4: distinct/total ratio in
    ppm — the distribution-collapse detector (the corpus-level
    statistic behind Self-BLEU): synthetic or template-heavy data shows
    diversity falling off a cliff as n grows, while organic text decays
    smoothly. The one-page answer to "did our generation/dedup pipeline
    collapse the long tail".

    One tokenize scan emits every n-gram TAGGED with its n (nested
    transform over the four sizes — slices are O(n) with n <= 4
    constant), then ONE (n, gram)-keyed aggregate pair. Only gram
    strings shuffle, same as the inverted index."""
    d = load(spark, sf_dir, "documents").select(
        F.expr(
            "filter(split(text, ' '), x -> x != '')"
        ).alias("t")
    )
    grams = d.select(
        F.explode(
            F.expr(
                "flatten(transform(array(1, 2, 3, 4), n ->"
                " transform(sequence(1, greatest(size(t) - n + 1, 0)),"
                "   i -> named_struct('n', n,"
                "        'g', array_join(slice(t, i, n), ' ')))))"
            )
        ).alias("ng")
    ).select(F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    return (
        grams.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.countDistinct("g").cast("bigint").alias("distinct_ngrams"),
        )
        .select(
            F.col("n").cast("int").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            F.expr(
                "cast((cast(distinct_ngrams as decimal(38,0)) * 1000000)"
                " div total_ngrams as bigint)"
            ).alias("diversity_ppm"),
        )
        .orderBy("n")
    )


Q_NGRAM_DIVERSITY_SQL = """
with toks as (
  select list_filter(string_split(text, ' '), x -> x <> '') t
  from documents
),
grams as (
  select u.n, array_to_string(t[i : i + u.n - 1], ' ') g
  from toks,
       unnest([1, 2, 3, 4]) as u(n),
       lateral unnest(range(1, greatest(len(t) - u.n + 1, 0) + 1)) as r(i)
)
select n::INT n, count(*)::BIGINT total_ngrams,
       count(distinct g)::BIGINT distinct_ngrams,
       ((count(distinct g)::HUGEINT * 1000000) // count(*))::BIGINT
         diversity_ppm
from grams group by n order by n
"""


def q_market_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation: HHI of
    supplier revenue shares (Σ shareᵢ², reported in ppm — 1e6 = one
    supplier owns the market; the antitrust 0.15/0.25 bands scale to
    150k/250k ppm). Gini (``gini_concentration``) asks "how unequal";
    HHI asks "how few players" — the capping/mixture planner reads it
    per data-source the same way: one source at HHI 400k+ dominates
    the mix and needs a cap before training.

    Exact: per-supplier revenue in integer cents, Σrev² and T² in
    decimal(38,0), ONE integer division — hhi_ppm = 1e6·Σrev² div T².

    Scale: the lineitem→supplier join + per-supplier aggregate are the
    data-sized shuffles; per-nation rollups are |nations|-sized."""
    dec = "decimal(38,0)"
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_c"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rev_c").alias("rev"))
    )
    agg = per.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
        F.sum(F.col("rev").cast(dec) * F.col("rev").cast(dec)).alias("sq"),
    )
    return (
        agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "revenue_cents",
            F.expr(
                "cast((sq * 1000000) div (cast(revenue_cents as"
                " decimal(38,0)) * revenue_cents) as bigint)"
            ).alias("hhi_ppm"),
        )
        .orderBy("nation")
    )


Q_MARKET_HHI_SQL = """
with li as (
  select l_suppkey,
         round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT rev_c
  from lineitem
),
per as (
  select s.s_nationkey, li.l_suppkey, sum(rev_c)::HUGEINT rev
  from li join supplier s on li.l_suppkey = s.s_suppkey
  group by 1, 2
),
agg as (
  select s_nationkey, count(*)::BIGINT n_suppliers,
         sum(rev)::BIGINT revenue_cents,
         sum(rev * rev) sq
  from per group by 1
)
select n.n_name nation, n_suppliers, revenue_cents,
       ((sq * 1000000) // (revenue_cents::HUGEINT * revenue_cents))::BIGINT
         hhi_ppm
from agg join nation n on agg.s_nationkey = n.n_nationkey
order by nation
"""


def q_simhash_distance_curve(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash radius-planning curve: pair counts by exact Hamming
    distance up to 6 bits, with the ascending cumulative "pairs merged
    at radius <= h" — the tuning dial for ``dedup_simhash``'s radius
    (the knee where counts explode is where near-dup ends and topical
    similarity begins). Widening the pigeonhole banding to
    ``max_hamming + 1`` bands keeps the candidate join EXACT at the
    larger radius, so the histogram is complete, not sampled.

    Same pinned shapes as ``dedup_simhash``: signature build is one
    map-combined bit-vote aggregate, candidates come from band-bucket
    equi-joins, verification is codegen bit_count(xor); the cumulative
    runs over the <= 7-row distance grid."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(d, max_hamming=max_hamming)
    h = pairs.groupBy(F.col("hamming")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    wz = Window.orderBy("hamming").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        h.select(
            F.col("hamming").cast("bigint").alias("hamming"),
            "n_pairs",
            F.sum("n_pairs").over(wz).cast("bigint").alias("n_pairs_le"),
        )
        .orderBy("hamming")
    )


def _simhash_distance_curve_duck(max_hamming: int = 6) -> str:
    pairs = dedup.simhash_pairs_duck(max_hamming=max_hamming)
    return """
with pr as materialized (
{pairs}
),
h as (select hamming, count(*)::BIGINT n_pairs from pr group by 1)
select hamming, n_pairs,
       sum(n_pairs) over (order by hamming
                          rows between unbounded preceding
                          and current row)::BIGINT n_pairs_le
from h order by hamming
""".format(pairs=pairs.strip().rstrip(";"))


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-merge audit of duplicate clusters: per cluster-size class,
    how many converged near-dup components mix more than one language
    or more than one source — the red flag that transitive closure is
    chaining UNRELATED documents together (true near-dups almost never
    cross language; template families often cross sources). Reads as a
    companion to ``dedup_cluster_sizes``: same labeling, plus the
    purity dimension that tells you whether the big clusters are safe.

    Scale: the components fixpoint (pinned shape, shared with the
    cluster-size report so one build serves both in a sweep), one
    doc-keyed join to metadata, two map-combined aggregates."""
    full = load(spark, sf_dir, "documents")
    d = full.select("doc_id", "lang", "source")
    pairs = dedup.minhash_lsh_pairs(full, threshold=0.7, num_hashes=64)
    labels = dedup.connected_components_converged(pairs)
    per = (
        labels.join(d, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )
    return (
        per.groupBy(F.col("n_docs").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum((F.col("n_langs") > 1).cast("int"))
            .cast("bigint")
            .alias("n_mixed_lang"),
            F.sum((F.col("n_sources") > 1).cast("int"))
            .cast("bigint")
            .alias("n_mixed_source"),
        )
        .orderBy("cluster_size")
    )


def _cluster_purity_duck() -> str:
    fix = dedup.components_fixpoint_duck(
        dedup.jaccard_pairs_duck(threshold=0.7)
    )
    return """
with labels as (select * from ({fix}) f),
per as (
  select component, count(*) n_docs,
         count(distinct d.lang) n_langs,
         count(distinct d.source) n_sources
  from labels join documents d using (doc_id)
  group by component
)
select n_docs::BIGINT cluster_size, count(*)::BIGINT n_clusters,
       sum((n_langs > 1)::INT)::BIGINT n_mixed_lang,
       sum((n_sources > 1)::INT)::BIGINT n_mixed_source
from per group by n_docs order by cluster_size
""".format(fix=fix)


def q_props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profile: for every top-level key of the
    events JSON ``props`` payload — presence count and ppm, JSON-null
    count, and exact distinct-value count. The DQ lens a pipeline
    points at an unmodeled JSON column BEFORE writing extraction code:
    which keys exist, how sparse, how wide. (``table_profile``'s
    semi-structured sibling; at 100 TB swap the exact distinct for the
    ``type_distinct_hll`` registers — same plan shape.)

    Spark parses once via from_json to map<string,string> + explode;
    the oracle walks json_keys. Both count a key present even when its
    value is JSON null, and both see the null value as SQL NULL."""
    e = load(spark, sf_dir, "events").select("props")
    n = e.agg(F.count(F.lit(1)).alias("nr"))
    kv = e.select(
        F.explode(F.expr("from_json(props, 'map<string,string>')")).alias(
            "pkey", "val"
        )
    )
    return (
        kv.groupBy("pkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_present"),
            F.sum(F.col("val").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null_value"),
            F.countDistinct("val").cast("bigint").alias("n_distinct"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "pkey",
            "n_present",
            "n_null_value",
            "n_distinct",
            F.expr(
                "cast((cast(n_present as decimal(38,0)) * 1000000)"
                " div nr as bigint)"
            ).alias("presence_ppm"),
        )
        .orderBy("pkey")
    )


Q_PROPS_KEY_PROFILE_SQL = """
with t as (select props from events),
n as (select count(*) nr from t),
kv as (
  select u.pkey, json_extract_string(props, '$.' || u.pkey) val
  from t, unnest(json_keys(props)) as u(pkey)
)
select pkey, count(*)::BIGINT n_present,
       sum((val is null)::INT)::BIGINT n_null_value,
       count(distinct val)::BIGINT n_distinct,
       ((count(*)::HUGEINT * 1000000) // any_value(n.nr))::BIGINT
         presence_ppm
from kv cross join n
group by pkey order by pkey
"""


def q_dedup_threshold_curve(
    spark: SparkSession, sf_dir: str, floor_threshold: float = 0.5
) -> DataFrame:
    """Similarity-threshold planning curve: run the EXACT Jaccard join
    once at a low floor (0.5) and histogram the surviving pairs by
    similarity tenth, with the descending cumulative "pairs you would
    merge at >= t" count — the dial a dedup operator reads BEFORE
    committing to a threshold (a cliff between 0.7 and 0.8 means the
    corpus has a natural near-dup band; a flat curve means the
    threshold is arbitrary and canonical-selection policy matters
    more).

    One prefix-filtered similarity join (the engine's pinned PPJoin
    shape) feeds a <= 10-row grid; the cumulative runs on that grid.
    Bucketing applies the identical float expression in both engines,
    so boundary ulps land identically."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(
        d, threshold=floor_threshold, max_shingle_df=None
    )
    h = pairs.groupBy(
        F.expr("cast(floor(jaccard * 10 + 1e-9) as int)").alias("tenth")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    wz = Window.orderBy(F.col("tenth").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        h.select(
            "tenth",
            "n_pairs",
            F.sum("n_pairs").over(wz).cast("bigint").alias("n_pairs_ge"),
        )
        .orderBy("tenth")
    )


def _dedup_threshold_curve_duck(floor_threshold: float = 0.5) -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=floor_threshold)
    return """
with pr as materialized (
{pairs}
),
h as (
  select floor(jaccard * 10 + 1e-9)::INT tenth, count(*)::BIGINT n_pairs
  from pr group by 1
)
select tenth, n_pairs,
       sum(n_pairs) over (order by tenth desc
                          rows between unbounded preceding
                          and current row)::BIGINT n_pairs_ge
from h order by tenth
""".format(pairs=pairs.strip().rstrip(";"))


def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto-class) customer segmentation: class A = customers
    covering the top 80% of revenue, B = next 15%, C = the tail — the
    inventory-management classic, and in a data pipeline the "which
    20% of sources carry 80% of tokens" capping decision. One row per
    class with exact customer counts, revenue, and share in ppm.

    Class boundaries are value-based (every customer with the same
    revenue gets the same class — deterministic under ties), computed
    from the DISTINCT-REVENUE histogram: revenue strictly above value
    v is T − prefix(v) − c_v·v, and the strict-prefix sums come from
    ``scale.sharded_prefix_sums`` — NO single-partition window even
    though per-customer revenue is ~all-distinct (the
    ``gini_concentration`` lesson). Everything is integer: the 80/95%
    cuts compare 20·above vs 4·T and 20·above vs 1·T."""
    dec = "decimal(38,0)"
    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("v")
        )
    )
    h = (
        per.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cv", (F.col("c") * F.col("v")).cast("bigint"))
    )
    hp = scale.sharded_prefix_sums(h, "v", ["c", "cv"])
    tot = hp.agg(
        F.sum(F.col("cv").cast(dec)).alias("t")
    )
    cls = hp.crossJoin(F.broadcast(tot)).select(
        "v",
        "c",
        "cv",
        # revenue strictly ABOVE this value (desc-order prefix)
        (F.col("t") - F.col("pre_cv").cast(dec) - F.col("cv").cast(dec))
        .alias("above"),
        "t",
    ).select(
        "v",
        "c",
        "cv",
        F.when(F.lit(20) * F.col("above") < F.lit(16) * F.col("t"), "A")
        .when(F.lit(20) * F.col("above") < F.lit(19) * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    out = cls.groupBy("abc_class").agg(
        F.sum("c").cast("bigint").alias("n_customers"),
        F.sum(F.col("cv").cast(dec)).cast("bigint").alias("revenue_cents"),
    )
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_customers",
            "revenue_cents",
            F.expr(
                "cast((cast(revenue_cents as decimal(38,0)) * 1000000)"
                " div t as bigint)"
            ).alias("revenue_share_ppm"),
        )
        .orderBy("abc_class")
    )


Q_ABC_ANALYSIS_SQL = """
with per as (
  select o_custkey, sum(round(o_totalprice * 100, 0)::BIGINT) v
  from orders group by 1
),
h as (
  select v, count(*)::HUGEINT c, (count(*)::HUGEINT * v) cv
  from per group by v
),
hp as (
  select v, c, cv,
         coalesce(sum(cv) over (order by v rows between unbounded preceding
                                and 1 preceding), 0) pre_cv
  from h
),
tot as (select sum(cv) t from h),
cls as (
  select v, c, cv,
         case when 20 * (t - pre_cv - cv) < 16 * t then 'A'
              when 20 * (t - pre_cv - cv) < 19 * t then 'B'
              else 'C' end abc_class
  from hp cross join tot
)
select abc_class, sum(c)::BIGINT n_customers, sum(cv)::BIGINT revenue_cents,
       ((sum(cv)::HUGEINT * 1000000) // any_value(t))::BIGINT
         revenue_share_ppm
from cls cross join tot
group by abc_class order by abc_class
"""


def q_dup_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the near-dup
    graph: 3·triangles / wedges — ONE number answering the question
    the ``dup_triangles`` census asks pair-by-pair: are duplicate
    clusters cliques (safe to collapse; transitivity → 1) or chains
    (pointer-jumping over-merges; transitivity → 0). The go/no-go
    metric a dedup run checks before trusting connected components as
    cluster labels.

    Exact integers end-to-end: triangles from the ordered-edge
    two-join, wedges = Σ deg·(deg−1)/2 in decimal(38,0), transitivity
    in ppm by integer division. Scale: same pinned edge-sized
    equi-joins as the census; the coefficient is 1-row aggregates."""
    dec = "decimal(38,0)"
    d = load(spark, sf_dir, "documents")
    pairs = _tracked_persist(
        dedup.jaccard_pairs(d, threshold=0.7, max_shingle_df=None).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
    )
    tri = (
        pairs.alias("e1")
        .join(pairs.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            pairs.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    und = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    wd = (
        und.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.expr("cast(deg * (deg - 1) div 2 as %s)" % dec))
            .cast("bigint")
            .alias("n_wedges"),
        )
    )
    ne = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        wd.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").cast("bigint").alias("n_triangles"),
            "n_wedges",
            F.when(F.col("n_wedges") > 0, F.expr(
                "cast((cast(t as decimal(38,0)) * 3000000)"
                " div n_wedges as bigint)"
            )).otherwise(F.lit(0)).alias("transitivity_ppm"),
        )
    )


def _dup_clustering_coeff_duck() -> str:
    pairs = dedup.jaccard_pairs_duck(threshold=0.7)
    return """
with pr as materialized (
{pairs}
),
e as (select doc_a a, doc_b b from pr),
tri as (
  select count(*)::BIGINT t
  from e e1
  join e e2 on e2.a = e1.b
  join e e3 on e3.a = e1.a and e3.b = e2.b
),
und as (select a, b from e union all select b, a from e),
wd as (
  select count(*)::BIGINT n_nodes,
         sum((deg::HUGEINT * (deg - 1)) // 2)::BIGINT n_wedges
  from (select a, count(*) deg from und group by a)
),
ne as (select count(*)::BIGINT n_edges from e)
select wd.n_nodes, ne.n_edges, tri.t n_triangles, wd.n_wedges,
       case when wd.n_wedges > 0
            then ((tri.t::HUGEINT * 3000000) // wd.n_wedges)::BIGINT
            else 0 end transitivity_ppm
from wd cross join tri cross join ne
""".format(pairs=pairs.strip().rstrip(";"))


def q_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity histogram: per-user Shannon entropy of the
    event-type mix, bucketed into quarter-nat bins — the segmentation
    monitor separating single-action bots (entropy 0) from diverse
    organic users, and the drift alarm when a release collapses
    behavior onto one path. Corpus-level ``token_entropy``'s per-entity
    sibling.

    Determinism: each type's −p·ln p term quantizes to integer
    micro-nats BEFORE the per-user sum (the ``km_retention`` ln rule),
    so per-user entropies are exact integers; buckets are integer
    division by 250 000.

    Scale: one (user, type) count, one user-keyed join for totals (the
    only data-sized shuffles), per-user sum, then the bucket grid."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type")
    ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = ut.groupBy("user_id").agg(F.sum("c").alias("n"))
    ent = (
        ut.join(tot, "user_id")
        .select(
            "user_id",
            F.expr(
                "cast(round(-(c / cast(n as double))"
                " * ln(c / cast(n as double)) * 1e6, 0) as bigint)"
            ).alias("t_u"),
        )
        .groupBy("user_id")
        .agg(F.sum("t_u").alias("ent_u"))
    )
    return (
        ent.groupBy(F.expr("ent_u div 250000").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.expr(
                "cast(cast(sum(ent_u) as decimal(38,0))"
                " div count(*) as bigint)"
            ).alias("avg_entropy_micro"),
        )
        .orderBy("bucket")
    )


Q_USER_EVENT_ENTROPY_SQL = """
with ut as (
  select user_id, event_type, count(*) c from events group by 1, 2
),
tot as (select user_id, sum(c) n from ut group by 1),
ent as (
  select ut.user_id,
         sum(round(-(c / n::DOUBLE) * ln(c / n::DOUBLE) * 1e6, 0)::BIGINT)
           ent_u
  from ut join tot using (user_id)
  group by 1
)
select (ent_u // 250000)::BIGINT bucket, count(*)::BIGINT n_users,
       (sum(ent_u)::HUGEINT // count(*))::BIGINT avg_entropy_micro
from ent group by 1 order by bucket
"""


def q_markov_surprisal(
    spark: SparkSession, sf_dir: str, top_k: int = 25, min_pairs: int = 10
) -> DataFrame:
    """Sequence-perplexity anomaly ranking: score every user's event
    stream under the corpus's own first-order transition model
    (``event_transitions``) and rank by average per-step surprisal —
    the sequence-model form of bot/abuse detection (scripted flows ride
    high-probability edges → low surprisal; erratic or adversarial
    flows take rare transitions → high). Exactly the perplexity-filter
    shape LLM pipelines apply to text, applied to behavior.

    Determinism: each transition's −ln p quantizes to integer
    micro-nats; per-user scores are exact integer sums with an integer
    division for the mean; ties rank by user_id.

    Scale: the transition matrix is a ≤T² grid broadcast to the pair
    stream; pairs come from the same user-keyed lag window as
    ``event_transitions``; the ranking is a partial top-k."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pr = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .select("user_id", "prev_type", "event_type")
    )
    m = (
        pr.groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mt = m.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    sur = m.join(F.broadcast(mt), "prev_type").select(
        "prev_type",
        "event_type",
        F.expr(
            "cast(round(-ln(n / cast(_tot as double)) * 1e6, 0) as bigint)"
        ).alias("s_u"),
    )
    return (
        pr.join(F.broadcast(sur), ["prev_type", "event_type"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_steps"),
            F.sum("s_u").alias("_sum"),
        )
        .where(F.col("n_steps") >= min_pairs)
        .select(
            "user_id",
            "n_steps",
            F.expr(
                "cast(cast(_sum as decimal(38,0)) div n_steps as bigint)"
            ).alias("avg_surprisal_micro"),
        )
        .orderBy(F.col("avg_surprisal_micro").desc(), "user_id")
        .limit(top_k)
    )


def _markov_surprisal_duck(top_k: int = 25, min_pairs: int = 10) -> str:
    return """
with e as (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
p as (
  select user_id,
         lag(event_type) over (partition by user_id
                               order by us, event_id) prev_type,
         event_type
  from e
),
pr as (select * from p where prev_type is not null),
m as (
  select prev_type, event_type, count(*) n from pr group by 1, 2
),
mt as (select prev_type, sum(n) tot from m group by 1),
sur as (
  select m.prev_type, m.event_type,
         round(-ln(m.n / mt.tot::DOUBLE) * 1e6, 0)::BIGINT s_u
  from m join mt using (prev_type)
)
select user_id, count(*)::BIGINT n_steps,
       (sum(s_u)::HUGEINT // count(*))::BIGINT avg_surprisal_micro
from pr join sur using (prev_type, event_type)
group by user_id
having count(*) >= {mp}
order by avg_surprisal_micro desc, user_id limit {k}
""".format(mp=min_pairs, k=top_k)


def q_bpe_fertility(
    spark: SparkSession, sf_dir: str, n_merges: int = 6
) -> DataFrame:
    """Tokenizer fertility per language — BPE tokens per whitespace
    word under the corpus-trained merges, the metric that decides
    whether a tokenizer is FAIR across languages (fertility 2x on one
    lang = that lang pays double the context budget per word; the
    standard multilingual-tokenizer audit). Also reports the distinct
    word-type count per lang (coverage of the trained vocab).

    Same trained-vocab amortization as ``bpe_token_counts``: encoding
    is a word -> segment-count broadcast join (the tokenizer-service
    word cache), never a re-application of merges per occurrence.
    Fertility is exact integer ppm (decimal product before the
    division). One corpus scan + one |langs|-row aggregate."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    _, vocab = bpe._train(d, "text", n_merges)
    enc = vocab.select("w", F.size("syms").cast("bigint").alias("n_sub"))
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    return (
        toks.join(F.broadcast(enc), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe"),
            F.countDistinct("w").cast("bigint").alias("n_types"),
        )
        .select(
            "lang",
            "n_words",
            "n_bpe",
            F.expr(
                "cast((cast(n_bpe as decimal(38,0)) * 1000000)"
                " div n_words as bigint)"
            ).alias("fertility_ppm"),
            "n_types",
        )
        .orderBy("lang")
    )


def _bpe_fertility_duck(n_merges: int = 6) -> str:
    train = bpe.bpe_duck(n_merges)
    ctes = train.rsplit("\nselect * from", 1)[0]
    return (
        ctes
        + """
, enc as (select w, len(s)::BIGINT n_sub from w{R})
select lang, count(*)::BIGINT n_words, sum(n_sub)::BIGINT n_bpe,
       ((sum(n_sub)::HUGEINT * 1000000) // count(*))::BIGINT fertility_ppm,
       count(distinct w)::BIGINT n_types
from (select lang, unnest(string_split(text, ' ')) w from documents)
join enc using (w)
where length(w) > 0
group by lang order by lang
""".format(R=n_merges)
    )


def q_psi_drift(
    spark: SparkSession, sf_dir: str, bins: int = 10
) -> DataFrame:
    """Population Stability Index between two halves of the corpus —
    the standard distribution-drift score (credit-scoring lineage;
    PSI = Σ (p_i − q_i)·ln(p_i/q_i) over fixed bins; < 0.1 stable,
    > 0.2 investigate) for scalar columns, here demonstrated on order
    value and document token count split by id parity (the stand-in
    for yesterday/today snapshots). The scalar sibling of
    ``embedding_drift``: the monitor that catches "the new crawl's
    docs are suddenly short" before training does.

    Determinism: equi-width integer bins from one 1-row min/max agg
    (the ``pareto_frontier`` bucket rule); Laplace-smoothed bin shares
    p, q from exact counts; each bin's PSI term is quantized to
    micro-units BEFORE the sum (the ``km_retention`` ln rule), so the
    total is an exact integer sum in both engines.

    Scale: per dimension, one data-sized aggregate (value → bin →
    count-per-(bin, half)); everything after runs on the <= ``bins``-row
    grid."""
    dec = "decimal(38,0)"

    def psi(vals: DataFrame, dim: str) -> DataFrame:
        rng = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        b = vals.crossJoin(F.broadcast(rng)).select(
            F.expr(
                "cast((v - lo) div ((hi - lo) div {b} + 1) as int)".format(
                    b=bins
                )
            ).alias("bin"),
            "side",
        )
        g = b.groupBy("bin").agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cb"),
        )
        tot = g.agg(
            F.sum("ca").alias("na"),
            F.sum("cb").alias("nb"),
            F.count(F.lit(1)).alias("k"),
        )
        term = (
            g.crossJoin(F.broadcast(tot))
            .select(
                "ca",
                "cb",
                "na",
                "nb",
                F.expr(
                    "round((((ca + 1) / cast(na + k as double))"
                    "      - ((cb + 1) / cast(nb + k as double)))"
                    " * ln(((ca + 1) / cast(na + k as double))"
                    "      / ((cb + 1) / cast(nb + k as double)))"
                    " * 1e6, 0)"
                )
                .cast("long")
                .alias("t_u"),
            )
        )
        return term.agg(
            F.lit(dim).alias("dimension"),
            F.sum(F.col("ca").cast(dec)).cast("bigint").alias("n_a"),
            F.sum(F.col("cb").cast(dec)).cast("bigint").alias("n_b"),
            F.round(F.sum("t_u") / F.lit(1e6), 6).alias("psi"),
        )

    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.expr("pmod(o_orderkey, 2)").cast("int").alias("side"),
    )
    d = load(spark, sf_dir, "documents").select(
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        )
        .cast("long")
        .alias("v"),
        F.expr("pmod(doc_id, 2)").cast("int").alias("side"),
    )
    return (
        psi(o, "order_value_cents")
        .unionAll(psi(d, "doc_tokens"))
        .orderBy("dimension")
    )


Q_PSI_DRIFT_SQL = """
with o as (
  select round(o_totalprice * 100, 0)::BIGINT v,
         (o_orderkey % 2)::INT side from orders
),
d as (
  select len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT v,
         (doc_id % 2)::INT side from documents
),
ro as (select min(v) lo, max(v) hi from o),
rd as (select min(v) lo, max(v) hi from d),
go as (
  select ((v - lo) // ((hi - lo) // 10 + 1)) bn,
         sum(case when side = 0 then 1 else 0 end) ca,
         sum(case when side = 1 then 1 else 0 end) cb
  from o cross join ro group by 1
),
gd as (
  select ((v - lo) // ((hi - lo) // 10 + 1)) bn,
         sum(case when side = 0 then 1 else 0 end) ca,
         sum(case when side = 1 then 1 else 0 end) cb
  from d cross join rd group by 1
),
t_o as (
  select ca, cb,
         sum(ca) over () na, sum(cb) over () nb, count(*) over () k
  from go
),
t_d as (
  select ca, cb,
         sum(ca) over () na, sum(cb) over () nb, count(*) over () k
  from gd
),
p_o as (
  select sum(ca)::BIGINT n_a, sum(cb)::BIGINT n_b,
         sum(round((((ca + 1) / (na + k)::DOUBLE)
                    - ((cb + 1) / (nb + k)::DOUBLE))
               * ln(((ca + 1) / (na + k)::DOUBLE)
                    / ((cb + 1) / (nb + k)::DOUBLE))
               * 1e6, 0)::BIGINT) t_u
  from t_o
),
p_d as (
  select sum(ca)::BIGINT n_a, sum(cb)::BIGINT n_b,
         sum(round((((ca + 1) / (na + k)::DOUBLE)
                    - ((cb + 1) / (nb + k)::DOUBLE))
               * ln(((ca + 1) / (na + k)::DOUBLE)
                    / ((cb + 1) / (nb + k)::DOUBLE))
               * 1e6, 0)::BIGINT) t_u
  from t_d
)
select 'doc_tokens' dimension, n_a, n_b, round(t_u / 1e6, 6) psi from p_d
union all
select 'order_value_cents', n_a, n_b, round(t_u / 1e6, 6) from p_o
order by dimension
"""


def q_grouped_sampled_quantiles(
    spark: SparkSession, sf_dir: str, k: int = 256
) -> DataFrame:
    """Per-language token-length quantiles from PER-GROUP bottom-k
    hash-rank samples — the stratified twin of ``sampled_quantiles``:
    each language keeps the k docs with the smallest md5(doc_id) rank
    (a deterministic uniform sample of that stratum), and p50/p90/p99
    token counts are nearest-rank within the sorted sample. The
    "is zh's length distribution drifting against en's" monitor at a
    per-stratum cost that is fixed regardless of corpus size.

    Scale shape: the per-group bottom-k is ``ranked_head``'s partial
    top-k (WindowGroupLimit pair straddling the exchange — a hot
    language ships <= k rows per map partition, never its row count);
    the sort+index runs over one k-element array per language. Sample
    membership is a pure function of the id set, so per-shard samples
    merge by union + re-rank and the oracle replays everything."""
    from bamboo_spark.operators.text import md5_int60_sql

    d = load(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        )
        .cast("long")
        .alias("v"),
        F.expr(
            md5_int60_sql("concat('smp:', cast(doc_id as string))")
        ).alias("_rk"),
    )
    smp = scale.ranked_head(
        d, "lang", [F.col("_rk").asc(), F.col("doc_id").asc()], cap=k
    )
    arr = smp.groupBy("lang").agg(
        F.sort_array(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).alias("m"),
    )
    ps = F.array(F.lit(50), F.lit(90), F.lit(99))
    return (
        arr.select("lang", F.explode(ps).alias("p"), "vs", "m")
        .select(
            "lang",
            F.col("p").cast("int").alias("p"),
            F.col("m").cast("bigint").alias("n_sample"),
            F.expr("vs[cast((p * m + 99) div 100 as int) - 1]")
            .cast("bigint")
            .alias("est_tokens"),
        )
        .orderBy("lang", "p")
    )


def _grouped_sampled_quantiles_duck(k: int = 256) -> str:
    from bamboo_spark.operators.text import md5_int60_duck

    rk = md5_int60_duck("'smp:' || doc_id::VARCHAR")
    return """
with d as (
  select lang, doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT v,
         {rk} _rk
  from documents
),
smp as (
  select lang, v from (
    select lang, v,
           row_number() over (partition by lang order by _rk, doc_id) rn
    from d
  ) where rn <= {k}
),
a as (select lang, list_sort(list(v)) vs, count(*) m from smp group by lang),
ps as (select unnest([50, 90, 99]) pq)
select lang, pq::INT p, a.m::BIGINT n_sample,
       a.vs[((pq * a.m + 99) // 100)]::BIGINT est_tokens
from ps cross join a order by lang, p
""".format(rk=rk, k=k)


def q_nb_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the Naive Bayes language classifier — chance-
    corrected agreement (Cohen 1960): po = observed agreement, pe =
    expected agreement from the marginals, kappa = (po-pe)/(1-pe). The
    one-number answer to "is this classifier better than its class
    prior" that accuracy alone fakes on skewed label mixes — the gate a
    curation pipeline checks before trusting classifier-filtered data.

    Built on the SAME confusion matrix as ``lang_nb_confusion`` (one
    composed plan); all products are exact decimal(38,0) integers
    (n² at 10¹¹ docs overflows a long), ONE double division per
    statistic, round(6). Degenerate single-class corpora (pe = 1) are
    out of contract.

    Scale: everything after the confusion matrix is |langs|²-sized."""
    dec = "decimal(38,0)"
    cm = _tracked_persist(q_lang_nb_confusion(spark, sf_dir))
    tot = cm.agg(
        F.sum("n_docs").alias("n"),
        F.sum(
            F.when(
                F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")
            ).otherwise(F.lit(0))
        ).alias("agree"),
    )
    r = cm.groupBy("true_lang").agg(F.sum("n_docs").alias("nr"))
    c = cm.groupBy("pred_lang").agg(F.sum("n_docs").alias("nc"))
    s = (
        r.join(c, r.true_lang == c.pred_lang)
        .agg(
            F.coalesce(
                F.sum(F.col("nr").cast(dec) * F.col("nc").cast(dec)),
                F.lit(0).cast(dec),
            ).alias("sv")
        )
    )
    nd = F.col("n").cast(dec)
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("agree").cast("bigint").alias("n_agree"),
        F.round(
            F.col("agree").cast("double") / F.col("n").cast("double"), 6
        ).alias("po"),
        F.round(F.col("sv").cast("double") / (nd * nd).cast("double"), 6).alias(
            "pe"
        ),
        F.round(
            (F.col("agree").cast(dec) * nd - F.col("sv")).cast("double")
            / (nd * nd - F.col("sv")).cast("double"),
            6,
        ).alias("kappa"),
    )


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


_TEXTRANK_ITERS = 6


def q_textrank_keywords(
    spark: SparkSession, sf_dir: str, top_v: int = 128, top_k: int = 25
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — adjacent-token edges weighted
    by corpus co-occurrence count, scores from 6 damped power
    iterations. The graph-centrality complement to ``rake_keywords``
    (degree/frequency) and ``tfidf_top_terms`` (rarity): a token ranks
    high when its NEIGHBORS are central, which surfaces the corpus's
    topical skeleton rather than its frequency spikes.

    Determinism is the ``dup_pagerank`` integer-nano-unit pattern:
    per-edge contribution floor(0.85 · (s·w div wdeg)) — exact,
    order-independent sums, identical longs in both engines every
    iteration; the oracle unrolls the same 6 supersteps as CTEs.

    Scale: the only doc-sized work is the adjacent-pair explode + one
    count aggregate. The graph is capped at ``top_v`` vocabulary nodes
    (top-v by count via partial top-k, semi-join both endpoints), so
    iteration state is <= top_v rows and every join broadcasts."""
    d = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    # adjacent pairs via zip_with over two slices — one pass per row,
    # measured 4-6x faster than index-lambda transform at sf0.1 (slices
    # are O(len) once; per-element array indexing paths are not)
    pairs = (
        d.select(
            F.expr(
                "filter(zip_with(slice(t, 1, size(t) - 1),"
                " slice(t, 2, size(t) - 1),"
                " (x, y) -> named_struct('a', least(x, y),"
                "           'b', greatest(x, y))),"
                " s -> length(s.a) >= 3 and length(s.b) >= 3"
                "  and s.a != s.b)"
            ).alias("ps")
        )
        .select(F.explode("ps").alias("p"))
        .select("p.a", "p.b")
    )
    tokens = d.select(F.explode("t").alias("token")).where(
        F.length("token") >= 3
    )
    # eager-checkpoint the <= top_v-row vocab: BOTH endpoint semi-joins
    # broadcast it, and without the cut each broadcast exchange would
    # re-run the full token-count aggregate
    vocab = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(top_v)
        .select("token")
        .localCheckpoint(eager=True)
    )
    e0 = (
        pairs.join(
            F.broadcast(vocab.withColumnRenamed("token", "a")), "a", "left_semi"
        )
        .join(
            F.broadcast(vocab.withColumnRenamed("token", "b")), "b", "left_semi"
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = _tracked_persist(
        e0.unionByName(
            e0.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
            )
        )
    )
    deg = edges.groupBy("a").agg(F.sum("w").alias("wdeg"))
    sc = deg.select("a", F.lit(10**9).cast("long").alias("s"), "wdeg")
    base = 150_000_000
    for _ in range(_TEXTRANK_ITERS):
        contrib = (
            sc.join(edges, "a")
            .select(
                F.col("b").alias("dst"),
                F.floor(F.lit(0.85) * F.expr("(s * w) div wdeg"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        sc = (
            deg.join(contrib, deg.a == contrib.dst, "left")
            .select(
                "a",
                (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0)))
                .cast("long")
                .alias("s"),
                "wdeg",
            )
            .localCheckpoint(eager=False)
        )
    return (
        sc.select(
            F.col("a").alias("token"),
            F.col("s").alias("score_nano"),
            F.col("wdeg").cast("bigint").alias("wdeg"),
        )
        .orderBy(F.col("score_nano").desc(), "token")
        .limit(top_k)
    )


def _textrank_duck(top_v: int = 128, top_k: int = 25) -> str:
    sql = """
with toks as (select string_split(text, ' ') t from documents),
pr0 as (
  select least(t[i], t[i + 1]) a, greatest(t[i], t[i + 1]) b
  from toks, unnest(range(1, greatest(len(t), 1))) u(i)
  where len(t[i]) >= 3 and len(t[i + 1]) >= 3 and t[i] <> t[i + 1]
),
vocab as (
  select tok from (
    select tok, count(*) c
    from (select unnest(t) tok from toks)
    where len(tok) >= 3
    group by tok order by c desc, tok limit {v}
  )
),
e0 as (
  select a, b, count(*)::BIGINT w
  from pr0
  join vocab va on va.tok = pr0.a
  join vocab vb on vb.tok = pr0.b
  group by 1, 2
),
e as materialized (
  select a, b, w from e0 union all select b, a, w from e0
),
deg as materialized (select a, sum(w)::BIGINT wdeg from e group by a),
p0 as materialized (select a, 1000000000::BIGINT s, wdeg from deg)
""".format(v=top_v)
    prev = "p0"
    for i in range(1, _TEXTRANK_ITERS + 1):
        sql += """,
c{i} as materialized (
  select e.b dst, sum(floor(0.85 * ((p.s * e.w) // p.wdeg))::BIGINT) in_sum
  from {prev} p join e on e.a = p.a
  group by e.b
),
p{i} as materialized (
  select deg.a, (150000000 + coalesce(c{i}.in_sum, 0))::BIGINT s, deg.wdeg
  from deg left join c{i} on c{i}.dst = deg.a
)""".format(i=i, prev=prev)
        prev = "p%d" % i
    sql += """
select a token, s score_nano, wdeg::BIGINT wdeg
from {last} order by s desc, token limit {k}
""".format(last=prev, k=top_k)
    return sql


def q_token_burstiness(
    spark: SparkSession, sf_dir: str, top_v: int = 200
) -> DataFrame:
    """Token burstiness profile (Church & Gale 1995): for the ``top_v``
    highest-frequency tokens, the document frequency, total frequency,
    mean occurrences per containing document (ppm), and the Fano factor
    (variance/mean of the per-containing-doc count). Fano ~ 1 means
    Poisson-like content words; Fano >> 1 means the token CLUMPS —
    boilerplate, templates, navigation chrome — which is exactly the
    vocabulary a dedup/quality pass should inspect first, and a signal
    TF-IDF misses (a bursty token can have middling global counts).

    Determinism: tf/df/Σc² are exact integers (sums of squares in
    decimal(38,0) — the long-wrap rule); Fano = (df·Σc² - tf²)/(df·tf)
    is a ratio of exact integers, ONE double division, round(6).

    Scale: one (token, doc) aggregate (the doc-sized shuffle), one
    map-combined per-token rollup, partial top-k. No windows."""
    dec = "decimal(38,0)"
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    per = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    st = per.groupBy("token").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("ss"),
    )
    top = st.orderBy(F.col("tf").desc(), "token").limit(top_v)
    d_ = lambda c: F.col(c).cast(dec)  # noqa: E731
    return top.select(
        "token",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("(tf * 1000000) div n_docs").cast("bigint").alias("rate_ppm"),
        F.round(
            (d_("n_docs") * F.col("ss") - d_("tf") * d_("tf")).cast("double")
            / (d_("n_docs") * d_("tf")).cast("double"),
            6,
        ).alias("fano"),
    ).orderBy(F.col("tf").desc(), "token")


def _token_burstiness_duck(top_v: int = 200) -> str:
    """Oracle builder sharing ``q_token_burstiness``'s defaults — the
    ``top_v`` limit is generated, not hardcoded, so a non-default
    argument keeps oracle parity (same discipline as
    ``_markov_surprisal_duck``)."""
    return """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) tk from documents
),
per as (
  select tk, doc_id, count(*) c from tok where tk <> '' group by 1, 2
),
st as (
  select tk, sum(c)::HUGEINT tf, count(*)::HUGEINT n_docs,
         sum(c::HUGEINT * c) ss
  from per group by tk
),
top as (select * from st order by tf desc, tk limit {v})
select tk token, tf::BIGINT tf, n_docs::BIGINT n_docs,
       ((tf * 1000000) // n_docs)::BIGINT rate_ppm,
       round((n_docs * ss - tf * tf)::DOUBLE / (n_docs * tf)::DOUBLE, 6) fano
from top order by tf desc, token
""".format(v=int(top_v))


def q_contamination_winnow(
    spark: SparkSession,
    sf_dir: str,
    k: int = 16,
    w: int = 8,
    max_fp_df: int = 8,
) -> DataFrame:
    """Train/eval contamination via winnowed fingerprints — the
    SUBSTRING-matching decontamination check (MOSS winnowing,
    Schleimer et al. SIGMOD'03) that fires on any shared passage of
    >= k+w-1 characters, where the n-gram ``contamination`` query needs
    whole shingles to line up. Eval split = doc_id ≡ 0 (mod 10), the
    engine's hash-split convention. Per contaminated eval doc: its
    fingerprint count, how many fingerprints ALSO appear anywhere in
    train, the contamination rate in basis points, and the single worst
    train-side source (most shared fingerprints, smallest id on ties —
    a min-struct aggregate, never a window).

    Scale: fingerprints are df-capped 60-bit ints (boilerplate prints
    dropped before the join, the ``winnow_pairs`` stop-key guard); the
    eval x train join carries only capped int keys; everything after is
    per-eval-doc aggregates."""
    d = load(spark, sf_dir, "documents")
    fps = dedup.winnow_fingerprints(d, k=k, w=w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_fp_df)
        .select("fp")
    )
    capped = _tracked_persist(fps.join(rare, "fp", "left_semi"))
    ev = capped.where(F.expr("pmod(doc_id, 10) = 0"))
    tr = capped.where(F.expr("pmod(doc_id, 10) != 0"))
    sizes = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    sh = _tracked_persist(
        ev.alias("e")
        .join(tr.alias("t"), "fp")
        .select(
            F.col("e.doc_id").alias("ed"),
            "fp",
            F.col("t.doc_id").alias("td"),
        )
    )
    ns = sh.groupBy("ed").agg(F.countDistinct("fp").alias("n_shared"))
    pairc = sh.groupBy("ed", "td").agg(F.count(F.lit(1)).alias("c"))
    top = pairc.groupBy("ed").agg(
        F.max(
            F.struct(F.col("c").alias("c"), (-F.col("td")).alias("ntd"))
        ).alias("m")
    )
    return (
        sizes.join(ns, sizes.doc_id == ns.ed)
        .join(top, "ed")
        .select(
            F.col("doc_id").alias("eval_doc"),
            F.col("n_fp").cast("bigint").alias("n_fp"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.expr("(10000 * n_shared) div n_fp")
            .cast("bigint")
            .alias("contam_bps"),
            (-F.col("m.ntd")).cast("bigint").alias("top_train_doc"),
            F.col("m.c").cast("bigint").alias("top_shared"),
        )
        .orderBy("eval_doc")
    )


def _contamination_winnow_duck(
    k: int = 16, w: int = 8, max_fp_df: int = 8
) -> str:
    return """
with {fps},
ev as (select doc_id, fp from fps where doc_id % 10 = 0),
tr as (select doc_id, fp from fps where doc_id % 10 <> 0),
sizes as (select doc_id, count(*) n_fp from ev group by doc_id),
sh as (select e.doc_id ed, e.fp, t.doc_id td from ev e join tr t using (fp)),
ns as (select ed, count(distinct fp) n_shared from sh group by ed),
pairc as (select ed, td, count(*) c from sh group by ed, td),
top as (select ed, max(struct_pack(c := c, ntd := -td)) m from pairc group by ed)
select s.doc_id eval_doc, s.n_fp::BIGINT n_fp, ns.n_shared::BIGINT n_shared,
       ((10000 * ns.n_shared) // s.n_fp)::BIGINT contam_bps,
       (-(top.m.ntd))::BIGINT top_train_doc, (top.m.c)::BIGINT top_shared
from sizes s
join ns on ns.ed = s.doc_id
join top on top.ed = s.doc_id
order by eval_doc
""".format(
        fps=dedup.winnow_fps_duck(k=k, w=w, max_fp_df=max_fp_df)
    )


def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` — the
    built-in merging-window operator (plain hash aggregate at batch
    time, the JVM session state store when streaming). Boundary
    semantics MATCH the lag chain of ``q_sessionize``: Spark merges a
    new event into the open session when its window start is <= the
    session end (end = last event + gap), so an event landing EXACTLY
    gap after its predecessor is KEPT — a split needs a silence
    STRICTLY greater than the gap (pinned on crafted timestamps in
    ``test_session_window_exact_gap_boundary``; the synthetic corpus
    never lands on the boundary). One row per session:
    (user, start, end = last event + gap, n_events), epoch-µs ints.

    Scale: one user-hash shuffle, session merging entirely JVM-side —
    at 100 TB this is THE sessionizer to prefer over any Python
    stateful formulation; the lag-chain twin exists for the strict->
    boundary contract, not for scale."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end")).alias(
                "session_end_us"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


Q_SESSIONIZE_NATIVE_SQL = """
with t as (select user_id, epoch_us(ts) us from events),
m as (
  select user_id, us,
         case when lag(us) over w is null
               or us - lag(us) over w > 1800000000
              then 1 else 0 end new_session
  from t window w as (partition by user_id order by us)
),
s as (
  select user_id, us,
         sum(new_session) over (
           partition by user_id order by us
           rows between unbounded preceding and current row) sid
  from m
)
select user_id, min(us)::BIGINT session_start_us,
       (max(us) + 1800000000)::BIGINT session_end_us,
       count(*)::BIGINT n_events
from s group by user_id, sid
order by user_id, session_start_us
"""


def q_curriculum_order(
    spark: SparkSession, sf_dir: str, bands: int = 8
) -> DataFrame:
    """Curriculum schedule over the corpus: each doc gets an integer
    difficulty in ppm — its LEXICAL DIVERSITY (type-token ratio:
    distinct tokens per token, the easy→hard signal of
    length/diversity curricula; corpus-rarity surprisal is the other
    classic signal but degenerates on this testdata's dense 31-token
    vocabulary, where no token is rare) — and docs are binned into
    fixed difficulty BANDS. Value-domain bins, NOT ntile: an
    equal-frequency rank would need a global sort; fixed bands bin
    each doc independently and the schedule grid is ``bands`` rows no
    matter the corpus size. Output per band: docs unlocked at that
    difficulty, their token mass, mean difficulty, and the cumulative
    corpus fraction available once training reaches the band — the
    pacing table an easy-to-hard curriculum sampler consumes.

    Scale: one tokenize scan → per-doc aggregate (no explode shuffle:
    TTR computes inside one higher-order expression per doc) →
    ``bands``-row grid; the only window runs over that grid. Exact
    integer arithmetic end-to-end (counts + ``div``) — no float parity
    hazard."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = d.select(
        F.expr(
            "size(filter(split(text, ' '), x -> x != ''))"
        ).alias("n_tok"),
        F.expr(
            "size(array_distinct(filter(split(text, ' '), x -> x != '')))"
        ).alias("n_distinct"),
    ).where(F.col("n_tok") > 0).select(
        "n_tok",
        F.expr(
            "(1000000 * cast(n_distinct as bigint)) div n_tok"
        ).alias("difficulty_ppm"),
    )
    banded = per_doc.select(
        "n_tok",
        "difficulty_ppm",
        F.expr(
            "least(cast(difficulty_ppm * %d div 1000000 as int), %d)"
            % (bands, bands - 1)
        ).alias("band"),
    )
    grid = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.expr("sum(difficulty_ppm) div count(1)")
        .cast("bigint")
        .alias("mean_difficulty_ppm"),
    )
    # the cumulative window runs over the <= `bands`-row grid only
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    total = grid.agg(F.sum("n_docs").alias("_tot"))
    return (
        grid.withColumn("cum_docs", F.sum("n_docs").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("band").cast("int").alias("band"),
            "n_docs",
            "n_tokens",
            "mean_difficulty_ppm",
            F.expr("(1000000 * cum_docs) div _tot")
            .cast("bigint")
            .alias("cum_corpus_ppm"),
        )
        .orderBy("band")
    )


def _curriculum_duck(bands: int = 8) -> str:
    """Oracle builder sharing ``q_curriculum_order``'s ``bands``
    default — generated so a non-default band count keeps oracle
    parity (same discipline as ``_markov_surprisal_duck``)."""
    return """
with per_doc as (
  select len(list_filter(string_split(text, ' '), x -> x <> '')) n_tok,
         len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
           n_distinct
  from documents
),
scored as (
  select n_tok,
         (1000000 * n_distinct::BIGINT) // n_tok difficulty_ppm
  from per_doc where n_tok > 0
),
banded as (
  select n_tok, difficulty_ppm,
         least((difficulty_ppm * {b}) // 1000000, {bm1}) band
  from scored
),
grid as (
  select band, count(*)::BIGINT n_docs, sum(n_tok)::BIGINT n_tokens,
         (sum(difficulty_ppm) // count(*))::BIGINT mean_difficulty_ppm
  from banded group by band
)
select band::INT band, n_docs, n_tokens, mean_difficulty_ppm,
       ((1000000 * sum(n_docs) over (
           order by band rows between unbounded preceding and current row))
        // (select sum(n_docs) from grid))::BIGINT cum_corpus_ppm
from grid
order by band
""".format(b=int(bands), bm1=int(bands) - 1)


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual sampling
    rule p_s ∝ n_s^(1/T)) at T ∈ {1, 2, 4}: T=1 is proportional
    sampling, larger T flattens toward uniform, protecting low-resource
    sources. Per (T, source): the sampling weight in ppm and the
    implied epochs over the source for one corpus-sized pass (×1000 —
    values over 1000 mean the source repeats, the overfitting signal
    mixture designers watch).

    The exponents are sqrt CHAINS — n, sqrt(n), sqrt(sqrt(n)) — because
    IEEE-754 sqrt is correctly rounded, so both engines produce
    bit-equal weights where a libm pow(x, 0.25) need not.

    Scale: one map-combined count aggregate; the grid is |sources| × 3
    rows and everything downstream is grid-sized."""
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    t_grid = spark.range(1).select(
        F.explode(
            F.array(F.lit(1), F.lit(2), F.lit(4))
        ).alias("temperature")
    )
    scaled = src.crossJoin(F.broadcast(t_grid)).select(
        "source",
        F.col("temperature").cast("int").alias("temperature"),
        "n_docs",
        F.when(F.col("temperature") == 1, F.col("n_docs").cast("double"))
        .when(F.col("temperature") == 2, F.sqrt(F.col("n_docs").cast("double")))
        .otherwise(F.sqrt(F.sqrt(F.col("n_docs").cast("double"))))
        .alias("w"),
    )
    z = scaled.groupBy("temperature").agg(
        F.sum("w").alias("_z"), F.sum("n_docs").alias("_tot")
    )
    return (
        scaled.join(F.broadcast(z), "temperature")
        .select(
            "temperature",
            "source",
            "n_docs",
            F.floor(F.lit(1000000.0) * F.col("w") / F.col("_z"))
            .cast("bigint")
            .alias("weight_ppm"),
            F.floor(
                F.lit(1000.0)
                * (F.col("w") / F.col("_z"))
                * F.col("_tot")
                / F.col("n_docs")
            )
            .cast("bigint")
            .alias("epochs_x1000"),
        )
        .orderBy("temperature", "source")
    )


Q_MIXTURE_TEMPERATURE_SQL = """
with src as (
  select source, count(*)::BIGINT n_docs from documents group by source
),
tg as (select unnest([1, 2, 4]) temperature),
scaled as (
  select source, temperature, n_docs,
         case when temperature = 1 then n_docs::DOUBLE
              when temperature = 2 then sqrt(n_docs::DOUBLE)
              else sqrt(sqrt(n_docs::DOUBLE)) end w
  from src cross join tg
),
z as (
  select temperature, sum(w) _z, sum(n_docs) _tot
  from scaled group by temperature
)
select s.temperature::INT temperature, s.source, s.n_docs,
       floor(1000000.0 * s.w / z._z)::BIGINT weight_ppm,
       floor(1000.0 * (s.w / z._z) * z._tot / s.n_docs)::BIGINT epochs_x1000
from scaled s join z using (temperature)
order by temperature, source
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the SAME metric tree at
    three grains — hour, day, ISO week — where each coarser grain is
    built by MERGING the next finer grain's partial states (count,
    integer micro-value sum, min/max event time), never re-reading
    events. This is the TimescaleDB continuous-aggregate / OLAP-cube
    maintenance shape: raw data is scanned once for the finest grain;
    every rollup above it is grid-sized state merging grid-sized state.

    The oracle recomputes every grain INDEPENDENTLY from raw events, so
    equality proves the hour→day→week merges are lossless (the partial
    states form a commutative monoid — same contract as
    ``q_rollup_incremental``, extended across grains).

    Scale: one events scan; the hour grid (days × 24 × types) is the
    largest intermediate and both rollups above it are aggregates over
    grids. At 100 TB each grain is day-partitioned partial-state
    parquet and a refresh merges only the touched buckets."""
    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd HH:00").alias("hb"),
        F.date_format("ts", "yyyy-MM-dd").alias("db"),
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "wb"
        ),
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.expr("cast(round(value * 1e6, 0) as bigint)").alias("v_u"),
    )
    # db/wb are functions of hb — free riders in the grouping key
    hour = _tracked_persist(
        e.groupBy("hb", "db", "wb", "event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v_u").cast("bigint").alias("sum_value_u"),
            F.min("us").cast("bigint").alias("min_us"),
            F.max("us").cast("bigint").alias("max_us"),
        )
    )
    day = _tracked_persist(
        hour.groupBy("db", "wb", "event_type").agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_u").cast("bigint").alias("sum_value_u"),
            F.min("min_us").cast("bigint").alias("min_us"),
            F.max("max_us").cast("bigint").alias("max_us"),
        )
    )
    week = day.groupBy("wb", "event_type").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sum_value_u").cast("bigint").alias("sum_value_u"),
        F.min("min_us").cast("bigint").alias("min_us"),
        F.max("max_us").cast("bigint").alias("max_us"),
    )
    cols = ["n_events", "sum_value_u", "min_us", "max_us"]
    return (
        hour.select(
            F.lit("hour").alias("grain"),
            F.col("hb").alias("bucket"),
            "event_type",
            *cols,
        )
        .unionByName(
            day.select(
                F.lit("day").alias("grain"),
                F.col("db").alias("bucket"),
                "event_type",
                *cols,
            )
        )
        .unionByName(
            week.select(
                F.lit("week").alias("grain"),
                F.col("wb").alias("bucket"),
                "event_type",
                *cols,
            )
        )
        .orderBy("grain", "bucket", "event_type")
    )


Q_HYPERTABLE_SQL = """
with e as (
  select strftime(ts, '%Y-%m-%d %H:00') hb,
         strftime(ts, '%Y-%m-%d') db,
         strftime(date_trunc('week', ts), '%Y-%m-%d') wb,
         event_type, epoch_us(ts) us,
         round(value * 1e6, 0)::BIGINT v_u
  from events
)
select 'hour' grain, hb bucket, event_type,
       count(*)::BIGINT n_events, sum(v_u)::BIGINT sum_value_u,
       min(us)::BIGINT min_us, max(us)::BIGINT max_us
from e group by 2, 3
union all
select 'day', db, event_type,
       count(*)::BIGINT, sum(v_u)::BIGINT, min(us)::BIGINT, max(us)::BIGINT
from e group by 2, 3
union all
select 'week', wb, event_type,
       count(*)::BIGINT, sum(v_u)::BIGINT, min(us)::BIGINT, max(us)::BIGINT
from e group by 2, 3
order by grain, bucket, event_type
"""


def _with_cache_discipline(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Drain operator-internal persists left by PREVIOUS registry queries
    before building the next one. A query's own caches are load-bearing
    until its caller materializes the returned (lazy) DataFrame, so they
    can't be dropped here — but with this wrapper a sequential sweep of
    the whole registry (the driver's correctness gate, a long-lived
    session) keeps at most ONE query's caches live at a time instead of
    accumulating all of them. Callers that want zero residue call
    ``bamboo_spark.operators._cache.release_caches()`` after their last
    materialization, as bench.py does."""

    @_functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _release_caches()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _with_cache_discipline(fn)
        for name, fn in _queries_raw().items()
    }


def _queries_raw() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q_top_customers": q_top_customers,
        "q_order_count_distribution": q_order_count_distribution,
        "q_big_orders_having": q_big_orders_having,
        "q_shipmode_priority": q_shipmode_priority,
        "q_orders_priority": q_orders_priority,
        "q_events_hourly": q_events_hourly,
        "q_events_moving_avg": q_events_moving_avg,
        "q_events_stats": q_events_stats,
        "q_pivot_event_values": q_pivot_event_values,
        "q_sessionize": q_sessionize,
        "q_setops_users": q_setops_users,
        "q_flatten_embeddings": q_flatten_embeddings,
        "q_flatten_lineitem_wide": q_flatten_lineitem_wide,
        "q_events_props_json": q_events_props_json,
        "q_semi_anti_parts": q_semi_anti_parts,
        "q_rollup_revenue": q_rollup_revenue,
        "q_price_quantiles": q_price_quantiles,
        "q_stratified_sample": q_stratified_sample,
        "q_promo_revenue": q_promo_revenue,
        "q_top_supplier": q_top_supplier,
        "q_small_qty_revenue": q_small_qty_revenue,
        "q_large_volume_customers": q_large_volume_customers,
        "q_disjunctive_join": q_disjunctive_join,
        "q_rich_idle_customers": q_rich_idle_customers,
        "q_part_rank_ntile": q_part_rank_ntile,
        "q_cube_revenue": q_cube_revenue,
        "q_events_asof_click": q_events_asof_click,
        "q4_order_priority": q4_order_priority,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "q10_returned_items": q10_returned_items,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "q_quantity_range_buckets": q_quantity_range_buckets,
        "tfidf_top_terms": q_tfidf_top_terms,
        "inverted_index": q_inverted_index,
        "token_heavy_hitters": q_token_heavy_hitters,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_normalized": q_dedup_normalized,
        "dedup_components": q_dedup_components,
        "dedup_components_converged": q_dedup_components_converged,
        "dedup_components_contraction": q_dedup_components_contraction,
        "simhash_signatures": q_simhash_signatures,
        "near_dup_embeddings": q_near_dup_embeddings,
        "near_dup_exact": q_near_dup_exact,
        "ann_pairs": q_ann_pairs,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
        "ann_ivf_int8": q_ann_ivf_int8,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_int8": q_ann_topk_ivf_int8,
        "embedding_quantize": q_embedding_quantize,
        "embedding_projection": q_embedding_projection,
        "label_centroids": q_label_centroids,
        "pack_chunks": q_pack_chunks,
        "curation_pipeline": q_curation_pipeline,
        "near_dup_text_join": q_near_dup_text_join,
        "q_window_analytics": q_window_analytics,
        "q_approx_sketches": q_approx_sketches,
        "q_corpus_mix": q_corpus_mix,
        "dedup_incremental": q_dedup_incremental,
        "q_split_assign": q_split_assign,
        "q_events_funnel": q_events_funnel,
        "q_retention_cohorts": q_retention_cohorts,
        "q_session_stats": q_session_stats,
        "q_grouping_sets_revenue": q_grouping_sets_revenue,
        "q_events_props_variant": q_events_props_variant,
        "text_stats": q_text_stats,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "pii_scrub": q_pii_scrub,
        "contamination": q_contamination,
        "repetition_stats": q_repetition_stats,
        "quality_filter": q_quality_filter,
        "dedup_canonical": q_dedup_canonical,
        "paragraph_dedup": q_paragraph_dedup,
        "dsir_weights": q_dsir_weights,
        "bigram_surprisal": q_bigram_surprisal,
        "ann_topk_pq": q_ann_topk_pq,
        "events_interval_join": q_events_interval_join,
        "pq_codes": q_pq_codes,
        "ann_topk_ivfpq": q_ann_topk_ivfpq,
        "key_skew_profile": q_key_skew_profile,
        "token_zipf": q_token_zipf,
        "curation_pipeline_v2": q_curation_pipeline_v2,
        "embedding_norms": q_embedding_norms,
        "paragraph_dedup_incremental": q_paragraph_dedup_incremental,
        "adaptive_length_filter": q_adaptive_length_filter,
        "dedup_containment": q_dedup_containment,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "source_quality_report": q_source_quality_report,
        "snapshot_diff": q_snapshot_diff,
        "user_state_intervals": q_user_state_intervals,
        "event_transitions": q_event_transitions,
        "pit_enrich": q_pit_enrich,
        "cdc_upsert": q_cdc_upsert,
        "record_linkage": q_record_linkage,
        "bm25_scores": q_bm25_scores,
        "embedding_drift": q_embedding_drift,
        "events_rolling_rate": q_events_rolling_rate,
        "event_paths": q_event_paths,
        "diversity_sample": q_diversity_sample,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        "record_linkage_incremental": q_record_linkage_incremental,
        "fk_integrity": q_fk_integrity,
        "entity_clusters": q_entity_clusters,
        "value_outliers": q_value_outliers,
        "corpus_fingerprint": q_corpus_fingerprint,
        "token_pmi": q_token_pmi,
        "ann_recall": q_ann_recall,
        "conversion_lag": q_conversion_lag,
        "quality_deciles": q_quality_deciles,
        "embedding_covariance": q_embedding_covariance,
        "embedding_pca": q_embedding_pca,
        "dup_triangles": q_dup_triangles,
        "label_bridges": q_label_bridges,
        "dup_pagerank": q_dup_pagerank,
        "dup_degree_stats": q_dup_degree_stats,
        "dup_neighbor_jaccard": q_dup_neighbor_jaccard,
        "dup_kcore": q_dup_kcore,
        "winnow_dedup": q_winnow_dedup,
        "k_anonymity": q_k_anonymity,
        "events_seasonal_baseline": q_events_seasonal_baseline,
        "dedup_components_incremental": q_dedup_components_incremental,
        "curation_pipeline_v3": q_curation_pipeline_v3,
        "leakage_safe_split": q_leakage_safe_split,
        "export_manifest": q_export_manifest,
        "user_trajectory_pairs": q_user_trajectory_pairs,
        "token_cms_counts": q_token_cms_counts,
        "zorder_layout": q_zorder_layout,
        "lang_nb_confusion": q_lang_nb_confusion,
        "nb_roc": q_nb_roc,
        "km_retention": q_km_retention,
        "source_term_js": q_source_term_js,
        "events_trend": q_events_trend,
        "nb_calibration": q_nb_calibration,
        "chi2_terms": q_chi2_terms,
        "event_seq_ngrams": q_event_seq_ngrams,
        "pareto_frontier": q_pareto_frontier,
        "gini_concentration": q_gini_concentration,
        "benford_dq": q_benford_dq,
        "events_autocorrelation": q_events_autocorrelation,
        "changepoint_cusum": q_changepoint_cusum,
        "text_readability": q_text_readability,
        "vocab_growth": q_vocab_growth,
        "negative_sampling_table": q_negative_sampling_table,
        "rollup_incremental": q_rollup_incremental,
        "data_mixture_plan": q_data_mixture_plan,
        "mixture_sample": q_mixture_sample,
        "distinct_hll_monitor": q_distinct_hll_monitor,
        "event_user_overlap_kmv": q_event_user_overlap_kmv,
        "forget_users": q_forget_users,
        "events_debounce": q_events_debounce,
        "token_drift_cms": q_token_drift_cms,
        "dq_report": q_dq_report,
        "label_propagation": q_label_propagation,
        "length_bucket_efficiency": q_length_bucket_efficiency,
        "contrastive_negatives": q_contrastive_negatives,
        "type_distinct_hll": q_type_distinct_hll,
        "market_basket": q_market_basket,
        "audio_window_features": q_audio_window_features,
        "dedup_funnel_stats": q_dedup_funnel_stats,
        "join_size_cms": q_join_size_cms,
        "rake_keywords": q_rake_keywords,
        "doc_novelty": q_doc_novelty,
        "sampled_quantiles": q_sampled_quantiles,
        "grouped_sampled_quantiles": q_grouped_sampled_quantiles,
        "psi_drift": q_psi_drift,
        "bpe_fertility": q_bpe_fertility,
        "dup_clustering_coeff": q_dup_clustering_coeff,
        "props_key_profile": q_props_key_profile,
        "simhash_distance_curve": q_simhash_distance_curve,
        "cluster_purity": q_cluster_purity,
        "market_concentration_hhi": q_market_concentration_hhi,
        "ngram_diversity": q_ngram_diversity,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_stock": q11_important_stock,
        "q16_parts_supplier_rel": q16_parts_supplier_rel,
        "q20_excess_stock": q20_excess_stock,
        "dedup_threshold_curve": q_dedup_threshold_curve,
        "abc_analysis": q_abc_analysis,
        "user_event_entropy": q_user_event_entropy,
        "markov_surprisal": q_markov_surprisal,
        "nb_kappa": q_nb_kappa,
        "textrank_keywords": q_textrank_keywords,
        "token_burstiness": q_token_burstiness,
        "contamination_winnow": q_contamination_winnow,
        "sessionize_native": q_sessionize_native,
        "curriculum_order": q_curriculum_order,
        "mixture_temperature": q_mixture_temperature,
        "hypertable_rollup": q_hypertable_rollup,
        "minhash_recall": q_minhash_recall,
        "orders_rfm": q_orders_rfm,
        "events_gap_histogram": q_events_gap_histogram,
        "token_budget_cap": q_token_budget_cap,
        "events_anomaly": q_events_anomaly,
        "corpus_summary": q_corpus_summary,
        "pack_per_source": q_pack_per_source,
        "length_histogram": q_length_histogram,
        "near_dup_sources": q_near_dup_sources,
        "split_leakage": q_split_leakage,
        "multimodal_dedup": q_multimodal_dedup,
        "chunk_documents": q_chunk_documents,
        "minhash_incremental": q_minhash_incremental,
        "dedup_bloom_incremental": q_dedup_bloom_incremental,
        "dedup_bloom_sharded": q_dedup_bloom_sharded,
        "semantic_dedup": q_semantic_dedup,
        "duplicate_spans": q_duplicate_spans,
        "cap_per_domain": q_cap_per_domain,
        "token_entropy": q_token_entropy,
        "unigram_surprisal": q_unigram_surprisal,
        "shard_manifest": q_shard_manifest,
        "weighted_sample": q_weighted_sample,
        "table_profile": q_table_profile,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
    }


def oracle_sql() -> Dict[str, str]:
    return {
        "q1_pricing_summary": Q1_SQL,
        "q3_shipping_priority": Q3_SQL,
        "q5_region_revenue": Q5_SQL,
        "q6_forecast_revenue": Q6_SQL,
        "q_top_customers": Q_TOP_CUSTOMERS_SQL,
        "q_order_count_distribution": Q_ORDER_DIST_SQL,
        "q_big_orders_having": Q_BIG_ORDERS_SQL,
        "q_shipmode_priority": Q_SHIPMODE_SQL,
        "q_orders_priority": Q_ORDERS_PRIORITY_SQL,
        "q_events_hourly": Q_EVENTS_HOURLY_SQL,
        "q_events_moving_avg": Q_EVENTS_MOVING_AVG_SQL,
        "q_events_stats": Q_EVENTS_STATS_SQL,
        "q_pivot_event_values": Q_PIVOT_SQL,
        "q_sessionize": Q_SESSIONIZE_SQL,
        "q_setops_users": Q_SETOPS_SQL,
        "q_flatten_embeddings": Q_FLATTEN_EMB_SQL,
        "q_flatten_lineitem_wide": Q_FLATTEN_WIDE_SQL,
        "q_events_props_json": Q_EVENTS_PROPS_SQL,
        "q_semi_anti_parts": Q_SEMI_ANTI_SQL,
        "q_rollup_revenue": Q_ROLLUP_SQL,
        "q_price_quantiles": Q_QUANTILES_SQL,
        "q_stratified_sample": _stratified_sql(),
        "q_promo_revenue": Q_PROMO_SQL,
        "q_top_supplier": Q_TOP_SUPPLIER_SQL,
        "q_small_qty_revenue": Q_SMALL_QTY_SQL,
        "q_large_volume_customers": Q_LARGE_VOLUME_SQL,
        "q_disjunctive_join": Q_DISJUNCTIVE_SQL,
        "q_rich_idle_customers": Q_RICH_IDLE_SQL,
        "q_part_rank_ntile": Q_PART_RANK_SQL,
        "q_cube_revenue": Q_CUBE_SQL,
        "q_events_asof_click": Q_ASOF_SQL,
        "q4_order_priority": Q4_SQL,
        "q7_volume_shipping": Q7_SQL,
        "q8_market_share": Q8_SQL,
        "q10_returned_items": Q10_SQL,
        "q21_waiting_suppliers": Q21_SQL,
        "q_quantity_range_buckets": Q_RANGE_BUCKETS_SQL,
        "tfidf_top_terms": Q_TFIDF_SQL,
        "inverted_index": Q_INVERTED_INDEX_SQL,
        "token_heavy_hitters": Q_HEAVY_HITTERS_SQL,
        "dedup_exact": Q_DEDUP_EXACT_SQL,
        "dedup_jaccard": dedup.jaccard_pairs_duck(threshold=0.8),
        # minhash-LSH verifies candidates with the exact jaccard, so the
        # oracle is the exact pairwise join at the same threshold
        "dedup_minhash": dedup.jaccard_pairs_duck(threshold=0.7),
        "dedup_simhash": dedup.simhash_pairs_duck(max_hamming=2),
        "dedup_normalized": Q_DEDUP_NORM_SQL.format(
            norm=text.normalize_text_duck("text")
        ),
        "dedup_components": dedup.components_duck(
            dedup.jaccard_pairs_duck(threshold=0.7), iterations=4
        ),
        "dedup_components_converged": dedup.components_fixpoint_duck(
            dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "dedup_components_contraction": dedup.components_fixpoint_duck(
            dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "simhash_signatures": _simhash_signatures_duck(),
        # the default near-dup path is trained IVF + multiprobe; the
        # oracle replays the k-means training (decimal-exact means)
        "near_dup_embeddings": similarity.ivf_pairs_duck(
            threshold=0.4, n_probe=2, bucket_cap=256
        ),
        "near_dup_exact": similarity.cosine_pairs_duck(threshold=0.4),
        "ann_pairs": similarity.ann_pairs_duck(threshold=0.4, dim=64, n_planes=12),
        "ann_topk": similarity.topk_neighbors_duck(query_ids_below=10, k=5),
        "ann_ivf": similarity.ivf_pairs_duck(threshold=0.4),
        "ann_ivf_multiprobe": similarity.ivf_pairs_duck(threshold=0.4, n_probe=2),
        "ann_ivf_int8": similarity.ivf_pairs_duck(threshold=0.4, int8_verify=True),
        "ann_topk_ivf": similarity.topk_neighbors_ivf_duck(
            query_ids_below=10, k=5, n_probe=2
        ),
        "pq_codes": similarity.pq_codes_duck(
            m=PQ_M, n_codes=PQ_CODES, iterations=PQ_ITERS
        ),
        "ann_topk_ivfpq": similarity.topk_neighbors_ivfpq_duck(
            query_ids_below=10, k=5, m=PQ_M, n_codes=PQ_CODES,
            iterations=PQ_ITERS, coarse_iterations=COARSE_ITERS,
            n_probe=2, rerank=30,
        ),
        "ann_topk_pq": similarity.topk_neighbors_pq_duck(
            query_ids_below=10, k=5, m=PQ_M, n_codes=PQ_CODES,
            iterations=PQ_ITERS, rerank=30
        ),
        "ann_topk_ivf_int8": similarity.topk_neighbors_ivf_duck(
            query_ids_below=10, k=5, n_probe=2, int8_verify=True
        ),
        "embedding_quantize": similarity.quantize_embeddings_duck(),
        "embedding_projection": similarity.random_projection_duck(dim=64, out_dim=16),
        "label_centroids": Q_LABEL_CENTROIDS_SQL,
        "pack_chunks": pack.pack_chunks_duck(context_len=2048),
        "curation_pipeline": Q_CURATION_SQL.format(
            lang=text.lang_id_duck("text"),
            quality=text.quality_score_duck("text"),
            norm=text.normalize_text_duck("text"),
        ),
        "near_dup_text_join": Q_NEAR_DUP_TEXT_JOIN_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "q_window_analytics": Q_WINDOW_ANALYTICS_SQL,
        # q_approx_sketches: deliberately NO oracle — sketches are
        # engine-specific; error-bounded against exact answers in pytest
        "q_corpus_mix": Q_CORPUS_MIX_SQL.format(
            lang=text.lang_id_duck("text"),
            bucket=text.stable_sample_pct_duck("doc_id"),
        ),
        "dedup_incremental": Q_DEDUP_INCREMENTAL_SQL.format(
            norm=text.normalize_text_duck("text")
        ),
        "q_split_assign": Q_SPLIT_ASSIGN_SQL.format(
            bucket=text.stable_sample_pct_duck("doc_id")
        ),
        "q_events_funnel": Q_EVENTS_FUNNEL_SQL,
        "q_retention_cohorts": Q_RETENTION_SQL,
        "q_session_stats": Q_SESSION_STATS_SQL,
        "q_grouping_sets_revenue": Q_GROUPING_SETS_SQL,
        "q_events_props_variant": Q_EVENTS_PROPS_VARIANT_SQL,
        "text_stats": Q_TEXT_STATS_SQL.format(
            lang=text.lang_id_duck("text"), quality=text.quality_score_duck("text")
        ),
        "token_counts": Q_TOKEN_COUNTS_SQL.format(bpe=text.bpe_token_count_duck("text")),
        "doc_fingerprint": Q_FINGERPRINT_SQL.format(fp=text.fingerprint_duck()),
        "pii_scrub": Q_PII_SCRUB_SQL.format(
            scrub=text.scrub_pii_duck("r"), cnt=text.pii_count_duck("r")
        ),
        "contamination": Q_CONTAMINATION_SQL.format(
            sh=text.word_shingles_duck("string_split(text, ' ')", 4)
        ),
        "chunk_documents": pack.chunk_documents_duck(chunk_tokens=64, stride=48),
        "minhash_incremental": dedup.minhash_incremental_duck(
            split_id=250, threshold=0.7
        ),
        "dedup_bloom_incremental": dedup.bloom_dedup_incremental_duck(
            text.fingerprint_duck(), split_id=250
        ),
        "dedup_bloom_sharded": dedup.bloom_dedup_incremental_duck(
            text.fingerprint_duck(), split_id=250
        ),
        "semantic_dedup": similarity.semantic_dedup_duck(threshold=0.4),
        "duplicate_spans": dedup.duplicate_spans_duck(ngram=5, min_df=2),
        "cap_per_domain": Q_CAP_PER_DOMAIN_SQL,
        "token_entropy": Q_TOKEN_ENTROPY_SQL,
        "unigram_surprisal": Q_UNIGRAM_SURPRISAL_SQL,
        "shard_manifest": pack.shard_manifest_duck(shard_tokens=4096),
        "weighted_sample": Q_WEIGHTED_SAMPLE_SQL,
        "table_profile": Q_TABLE_PROFILE_SQL,
        "repetition_stats": Q_REPETITION_SQL.format(
            sh2=text.word_shingles_duck("toks", 2),
            sh3=text.word_shingles_duck("toks", 3),
        ),
        "quality_filter": text.gopher_filter_duck(),
        "paragraph_dedup": dedup.segment_dedup_duck(block_tokens=20),
        "paragraph_dedup_incremental": dedup.segment_dedup_incremental_duck(
            split_id=250, block_tokens=20
        ),
        "dsir_weights": Q_DSIR_SQL,
        "events_interval_join": Q_INTERVAL_JOIN_SQL,
        "key_skew_profile": Q_KEY_SKEW_SQL.format(n=10),
        "token_zipf": Q_TOKEN_ZIPF_SQL.format(n=50),
        "embedding_norms": Q_EMBEDDING_NORMS_SQL,
        "adaptive_length_filter": Q_ADAPTIVE_LENGTH_SQL,
        "dedup_containment": dedup.containment_pairs_duck(threshold=0.5),
        "dedup_cluster_sizes": """
with labels as (select * from ({fix}) f),
s as (select component, count(*) cluster_size from labels group by component)
select cluster_size::BIGINT cluster_size, count(*)::BIGINT n_clusters
from s group by cluster_size order by cluster_size
""".format(fix=dedup.components_fixpoint_duck(dedup.jaccard_pairs_duck(threshold=0.7))),
        "multimodal_dedup": Q_MULTIMODAL_DEDUP_SQL,
        "source_quality_report": Q_SOURCE_QUALITY_SQL.format(
            gopher=text.gopher_filter_duck()
        ),
        "snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
        "user_state_intervals": Q_USER_STATE_SQL,
        "event_transitions": Q_EVENT_TRANSITIONS_SQL,
        "pit_enrich": Q_PIT_ENRICH_SQL,
        "cdc_upsert": Q_CDC_UPSERT_SQL,
        "record_linkage": Q_RECORD_LINKAGE_SQL,
        "bm25_scores": Q_BM25_SQL,
        "embedding_drift": Q_EMBEDDING_DRIFT_SQL,
        "events_rolling_rate": Q_EVENTS_ROLLING_RATE_SQL,
        "event_paths": Q_EVENT_PATHS_SQL,
        "diversity_sample": _diversity_sample_duck(),
        "bpe_merges": bpe.bpe_duck(6),
        "bpe_token_counts": bpe.bpe_encode_duck(6),
        "record_linkage_incremental": Q_RECORD_LINKAGE_INC_SQL,
        "fk_integrity": Q_FK_INTEGRITY_SQL,
        "entity_clusters": _entity_clusters_duck(),
        "value_outliers": Q_VALUE_OUTLIERS_SQL,
        "corpus_fingerprint": Q_CORPUS_FINGERPRINT_SQL,
        "token_pmi": Q_TOKEN_PMI_SQL,
        "ann_recall": _ann_recall_duck(),
        "conversion_lag": Q_CONVERSION_LAG_SQL,
        "quality_deciles": _quality_deciles_duck(),
        "embedding_covariance": similarity.embedding_covariance_duck(),
        "dup_triangles": _dup_triangles_duck(),
        "label_bridges": Q_LABEL_BRIDGES_SQL,
        "dup_pagerank": _dup_pagerank_duck(),
        "dup_degree_stats": _dup_degree_stats_duck(),
        "dup_neighbor_jaccard": _dup_neighbor_jaccard_duck(),
        "dup_kcore": _dup_kcore_duck(),
        "winnow_dedup": _winnow_dedup_duck(),
        "k_anonymity": Q_K_ANONYMITY_SQL,
        "events_seasonal_baseline": Q_EVENTS_SEASONAL_BASELINE_SQL,
        "dedup_components_incremental": _dedup_components_inc_duck(),
        "leakage_safe_split": _leakage_safe_split_duck(),
        "minhash_recall": _minhash_recall_duck(),
        "orders_rfm": Q_ORDERS_RFM_SQL,
        "events_gap_histogram": Q_EVENTS_GAP_HIST_SQL,
        "curation_pipeline_v3": Q_CURATED_CTES.format(
            gopher=text.gopher_filter_duck(),
            segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
            norm=text.normalize_text_duck("text"),
            fixpoint=dedup.components_fixpoint_duck(
                "select doc_a, doc_b from lk_pairs"
            ).strip(),
        ) + Q_CURATION_V3_TAIL,
        "export_manifest": _export_manifest_duck(),
        "user_trajectory_pairs": Q_USER_TRAJECTORY_SQL,
        "token_cms_counts": _token_cms_counts_duck(),
        "zorder_layout": _zorder_layout_duck(),
        "lang_nb_confusion": Q_LANG_NB_SQL,
        "nb_roc": Q_NB_ROC_SQL,
        "km_retention": Q_KM_RETENTION_SQL,
        "source_term_js": Q_SOURCE_TERM_JS_SQL,
        "events_trend": Q_EVENTS_TREND_SQL,
        "nb_calibration": Q_NB_CALIBRATION_SQL,
        "chi2_terms": Q_CHI2_TERMS_SQL,
        "event_seq_ngrams": Q_EVENT_SEQ_NGRAMS_SQL,
        "pareto_frontier": Q_PARETO_FRONTIER_SQL,
        "gini_concentration": Q_GINI_CONCENTRATION_SQL,
        "benford_dq": Q_BENFORD_DQ_SQL,
        "events_autocorrelation": Q_EVENTS_AUTOCORRELATION_SQL,
        "changepoint_cusum": Q_CHANGEPOINT_CUSUM_SQL,
        "text_readability": Q_TEXT_READABILITY_SQL,
        "vocab_growth": Q_VOCAB_GROWTH_SQL,
        "negative_sampling_table": Q_NEGATIVE_SAMPLING_SQL,
        "rollup_incremental": Q_ROLLUP_INCREMENTAL_SQL,
        "data_mixture_plan": Q_DATA_MIXTURE_SQL,
        "mixture_sample": Q_MIXTURE_SAMPLE_SQL,
        "distinct_hll_monitor": _distinct_hll_duck(),
        "event_user_overlap_kmv": _event_user_overlap_kmv_duck(),
        "forget_users": Q_FORGET_USERS_SQL,
        "events_debounce": Q_EVENTS_DEBOUNCE_SQL,
        "token_drift_cms": _token_drift_cms_duck(),
        "dq_report": Q_DQ_REPORT_SQL,
        "label_propagation": _label_propagation_duck(),
        "length_bucket_efficiency": Q_LENGTH_BUCKET_SQL,
        "contrastive_negatives": Q_CONTRASTIVE_NEG_SQL,
        "type_distinct_hll": _type_distinct_hll_duck(),
        "market_basket": Q_MARKET_BASKET_SQL,
        "audio_window_features": Q_AUDIO_WINDOWS_SQL,
        "dedup_funnel_stats": _dedup_funnel_duck(),
        "join_size_cms": _join_size_cms_duck(),
        "rake_keywords": Q_RAKE_SQL,
        "doc_novelty": Q_DOC_NOVELTY_SQL,
        "sampled_quantiles": _sampled_quantiles_duck(),
        "grouped_sampled_quantiles": _grouped_sampled_quantiles_duck(),
        "psi_drift": Q_PSI_DRIFT_SQL,
        "bpe_fertility": _bpe_fertility_duck(),
        "dup_clustering_coeff": _dup_clustering_coeff_duck(),
        "props_key_profile": Q_PROPS_KEY_PROFILE_SQL,
        "simhash_distance_curve": _simhash_distance_curve_duck(),
        "cluster_purity": _cluster_purity_duck(),
        "market_concentration_hhi": Q_MARKET_HHI_SQL,
        "ngram_diversity": Q_NGRAM_DIVERSITY_SQL,
        "q2_min_cost_supplier": Q2_MIN_COST_SQL,
        "q9_product_profit": Q9_PROFIT_SQL,
        "q11_important_stock": Q11_STOCK_SQL,
        "q16_parts_supplier_rel": Q16_PARTS_SQL,
        "q20_excess_stock": Q20_EXCESS_SQL,
        "dedup_threshold_curve": _dedup_threshold_curve_duck(),
        "abc_analysis": Q_ABC_ANALYSIS_SQL,
        "user_event_entropy": Q_USER_EVENT_ENTROPY_SQL,
        "markov_surprisal": _markov_surprisal_duck(),
        "nb_kappa": _nb_kappa_duck(),
        "textrank_keywords": _textrank_duck(),
        "token_burstiness": _token_burstiness_duck(),
        "contamination_winnow": _contamination_winnow_duck(),
        "sessionize_native": Q_SESSIONIZE_NATIVE_SQL,
        "curriculum_order": _curriculum_duck(),
        "mixture_temperature": Q_MIXTURE_TEMPERATURE_SQL,
        "hypertable_rollup": Q_HYPERTABLE_SQL,
        "token_budget_cap": Q_TOKEN_BUDGET_SQL,
        "events_anomaly": Q_EVENTS_ANOMALY_SQL,
        "corpus_summary": Q_CORPUS_SUMMARY_SQL.format(
            quality=text.quality_score_duck("text")
        ),
        "pack_per_source": Q_PACK_PER_SOURCE_SQL,
        "length_histogram": Q_LENGTH_HISTOGRAM_SQL,
        "near_dup_sources": Q_NEAR_DUP_SOURCES_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7)
        ),
        "split_leakage": Q_SPLIT_LEAKAGE_SQL.format(
            pairs=dedup.jaccard_pairs_duck(threshold=0.7),
            bucket=text.stable_sample_pct_duck("doc_id"),
        ),
        "curation_pipeline_v2": Q_CURATION_V2_SQL.format(
            gopher=text.gopher_filter_duck(),
            segment=dedup.segment_dedup_duck(block_tokens=20, src="kept"),
            norm=text.normalize_text_duck("text"),
            quality=text.quality_score_duck("text"),
        ),
        "bigram_surprisal": Q_BIGRAM_SURPRISAL_SQL.format(
            sh2=text.word_shingles_duck("toks", 2),
            lam=0.75,
            one_m_lam=0.25,
        ),
        "dedup_canonical": dedup.canonical_docs_duck(
            dedup.jaccard_pairs_duck(threshold=0.7),
            text.quality_score_duck("text"),
        ),
        "multimodal_decode": Q_MULTIMODAL_SQL,
        "multimodal_features": Q_MULTIMODAL_FEATURES_SQL.format(
            dmax=multimodal.FEATURE_DIM - 1
        ),
        "multimodal_resize": Q_MULTIMODAL_RESIZE_SQL,
        "multimodal_frames": Q_MULTIMODAL_FRAMES_SQL,
    }
