"""Event/behavioral analytics: sessionization, funnels, retention, transitions, time series (trend/seasonality/ACF/CUSUM), CDC/PIT, hypertable rollups.

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
    # persisted: FOUR branches consume the distinct basket table (order
    # count, part supports, both self-join sides) and the broadcast
    # subtrees would otherwise re-run the scan+distinct shuffle each
    l = _tracked_persist(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).distinct()
    )
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


def q_wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — the engagement ratio
    every activity dashboard leads with: monthly active users, total
    user-days (Σ daily actives), active days in the month, and
    stickiness = avg-DAU / MAU in ppm. A falling ratio with flat MAU
    means the same users show up less often — invisible to either
    count alone.

    Exact integers end to end: stickiness_ppm =
    (1e6 · user_days) div (n_days · mau) — no float division, so both
    engines land on identical longs.

    Scale: two count-distinct aggregates keyed by (month, day) and
    month — the classic two-level rollup; the join is grid-sized
    (months). No windows, no skew (user_id is the distinct target, not
    a key)."""
    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        "user_id",
    )
    daily = e.groupBy("month", "d").agg(
        F.count_distinct("user_id").alias("dau")
    )
    per_month = daily.groupBy("month").agg(
        F.sum("dau").cast("bigint").alias("user_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    mau = e.groupBy("month").agg(
        F.count_distinct("user_id").cast("bigint").alias("mau")
    )
    return (
        per_month.join(mau, "month")
        .select(
            "month",
            "mau",
            "user_days",
            "n_days",
            F.expr("(1000000 * user_days) div (n_days * mau)")
            .cast("bigint")
            .alias("stickiness_ppm"),
        )
        .orderBy("month")
    )


Q_WAU_MAU_SQL = """
with e as (
  select strftime(ts, '%Y-%m') mo, strftime(ts, '%Y-%m-%d') d, user_id
  from events
),
daily as (
  select mo, d, count(distinct user_id) dau from e group by mo, d
),
per_month as (
  select mo, sum(dau)::BIGINT user_days, count(*)::BIGINT n_days
  from daily group by mo
),
mau as (
  select mo, count(distinct user_id)::BIGINT mau from e group by mo
)
select per_month.mo as "month", mau, user_days, n_days,
       ((1000000 * user_days) // (n_days * mau))::BIGINT stickiness_ppm
from per_month join mau using (mo)
order by "month"
"""


def q_events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the load-pattern grid
    behind capacity planning and anomaly baselining: per (dow, hour)
    cell, event count, exact micro-value sum, and the cell's share of
    all traffic in ppm. Deviations from this grid are what
    ``q_events_anomaly``'s baseline keys on.

    Engine-exact: dow normalized to 0=Sunday in both engines (Spark
    ``dayofweek``-1, DuckDB ``dow``), value summed in ×1e6 integer
    units, share as integer-ppm division.

    Scale: ONE map-combined aggregate to a ≤168-row grid; the share
    window runs over the grid only."""
    e = load(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
        F.expr("cast(round(value * 1e6, 0) as bigint)").alias("v_u"),
    )
    grid = e.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v_u").cast("bigint").alias("sum_value_u"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        grid.withColumn("_tot", F.sum("n_events").over(w))
        .select(
            "dow",
            "hr",
            "n_events",
            "sum_value_u",
            F.expr("(1000000 * n_events) div _tot")
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("dow", "hr")
    )


Q_DOW_HOUR_SQL = """
with g as (
  select dayofweek(ts)::INT as "dow", hour(ts)::INT hr,
         count(*)::BIGINT n_events,
         sum(round(value * 1e6, 0)::BIGINT)::BIGINT sum_value_u
  from events group by 1, 2
)
select "dow", hr, n_events, sum_value_u,
       ((1000000 * n_events) // sum(n_events) over ())::BIGINT share_ppm
from g order by "dow", hr
"""


_MARKOV_ITERS = 8


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — where
    user behavior settles: the long-run share of time spent in each
    event type if users keep following the observed transition matrix
    (the PageRank-without-teleport of ``q_event_transitions``'s edge
    list). The gap between stationary share and raw frequency flags
    absorbing-ish states (types users funnel into and stay).

    Determinism: the power iteration runs in INTEGER nano-units with
    per-edge quantization — s'_j = Σ_i floor(s_i · c_ij div r_i) — the
    same order-independent trick as ``q_dup_pagerank``, so 8 unrolled
    iterations land on identical longs in both engines (float power
    iteration would ulp-drift under different add orders).

    Scale: the lag chain is one per-user window over events (the
    ``q_event_transitions`` shape); everything after is a |types|²
    grid — each superstep joins a k-row vector to a k²-row matrix."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    edges = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    edges = _tracked_persist(edges)
    totals = edges.groupBy("prev_type").agg(
        F.sum("c").cast("long").alias("r")
    )
    mat = edges.join(totals, "prev_type")
    # ---- power iteration ON THE DRIVER (r13 optimization): the
    # transition grid is |types|² rows regardless of corpus size, so
    # the 8 unrolled supersteps were ~16 metadata-sized Spark jobs of
    # pure launch overhead. Collect the grid once and run the identical
    # integer recurrence in Python — `(s * c) // r` on non-negative
    # longs equals Spark's `div`, sums are exact ints, so the result is
    # bit-identical to the distributed unroll (oracle-parity-verified).
    from collections import defaultdict

    grid = [
        (g["prev_type"], g["event_type"], int(g["c"]), int(g["r"]))
        for g in mat.select("prev_type", "event_type", "c", "r").collect()
    ]
    prev_types = sorted({p for p, _, _, _ in grid})
    k = len(prev_types)
    s_vec = {p: 10**9 // k for p in prev_types}
    for _ in range(_MARKOV_ITERS):
        new_vec: dict = defaultdict(int)
        for p, et, c_n, r_n in grid:
            if p in s_vec:
                new_vec[et] += (s_vec[p] * c_n) // r_n
        s_vec = dict(new_vec)
    s = _local_df(
        spark, sorted(s_vec.items()), "t string, s long"
    )
    return s.select(
        F.col("t").alias("event_type"), F.col("s").alias("stationary_nano")
    ).orderBy(F.col("stationary_nano").desc(), "event_type")


def _markov_stationary_duck(iters: int = _MARKOV_ITERS) -> str:
    sql = """
with ev as materialized (
  select user_id, event_id, event_type, epoch_us(ts) us from events
),
lagd as (
  select lag(event_type) over (partition by user_id
                               order by us, event_id) prev_type,
         event_type
  from ev
),
mat as materialized (
  select prev_type, event_type, count(*)::BIGINT c
  from lagd where prev_type is not null
  group by 1, 2
),
tot as materialized (
  select prev_type, sum(c)::BIGINT r from mat group by prev_type
),
kk as (select count(*)::BIGINT k from tot),
s0 as materialized (
  select prev_type t, (1000000000 // (select k from kk))::BIGINT s from tot
)"""
    prev = "s0"
    for i in range(1, iters + 1):
        sql += """,
s{i} as materialized (
  select mat.event_type t, sum((p.s * mat.c) // tot.r)::BIGINT s
  from {prev} p
  join mat on mat.prev_type = p.t
  join tot on tot.prev_type = p.t
  group by mat.event_type
)""".format(i=i, prev=prev)
        prev = "s%d" % i
    sql += """
select t event_type, s stationary_nano
from {last} order by stationary_nano desc, event_type
""".format(last=prev)
    return sql


def q_session_depth_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-depth histogram: how many 30-min-gap sessions contain
    exactly 1, 2, 3… events (capped into a 1..9, 10+ tail band) — the
    engagement-depth curve behind ``q_session_stats``'s averages (two
    corpora can share a mean depth while one is all bounce + power
    users). Share in ppm per band.

    Scale: the gap sessionizer's one user-keyed window chain (one
    shuffle), a per-(user, session) count, then a ≤10-row grid; the
    share window runs over the grid."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("session_id", F.sum("new_session").over(w))
    depth = flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    grid = depth.select(
        F.least(F.col("n_events").cast("int"), F.lit(10)).alias("depth_band")
    ).groupBy("depth_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        grid.withColumn("_tot", F.sum("n_sessions").over(wall))
        .select(
            "depth_band",
            "n_sessions",
            F.expr("(1000000 * n_sessions) div _tot")
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("depth_band")
    )


Q_SESSION_DEPTH_SQL = """
with e as (
  select user_id, event_id, epoch_us(ts) us from events
),
flagged as (
  select user_id, us,
         case when lag(us) over (partition by user_id
                                 order by us, event_id) is null
                   or us - lag(us) over (partition by user_id
                                         order by us, event_id)
                      > 30 * 60 * 1000000
              then 1 else 0 end new_session
  from e
),
sess as (
  select user_id,
         sum(new_session) over (partition by user_id order by us
                                rows between unbounded preceding
                                and current row) session_id
  from flagged
),
depth as (
  select user_id, session_id, count(*) n_events
  from sess group by 1, 2
),
grid as (
  select least(n_events, 10)::INT depth_band,
         count(*)::BIGINT n_sessions
  from depth group by 1
)
select depth_band, n_sessions,
       ((1000000 * n_sessions) // sum(n_sessions) over ())::BIGINT share_ppm
from grid order by depth_band
"""
