"""TPC-H query shapes (all 22, incl. the derived deterministic partsupp for Q2/Q9/Q11/Q16/Q20).

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
    # fresh (non-memoized) relations: the derived-partsupp subtree
    # coexists with its consumers' OWN part/supplier loads in one plan
    # (Q9 joins supplier again); sharing the memoized relation's expr
    # ids there trips Spark's ambiguous-self-join detection
    from bamboo_spark.queries._core import _load_fresh

    p = _load_fresh(spark, sf_dir, "part").select("p_partkey")
    sc = _load_fresh(spark, sf_dir, "supplier").agg(
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
