"""Window / time-series layer (SURVEY.md §2.7, §2.9 batch equivalents).

This is the analytics the reference's warehouse was built FOR
("long-term historical analysis ... of orbital decay mechanics",
reference README.md:4, README.md:71): per-entity ordered windows,
deltas via lag, running aggregates, top-k per group, daily tumbling
rollups, sessionization, as-of enrichment joins.

The ``events`` table stands in for ``fact_telemetry`` (user_id ≈
norad_id, ts ≈ epoch_utc, value ≈ mean_motion — FIXTURES.md §A role
mapping).

Scale notes: every window partitions by the entity key (one shuffle,
then linear in-partition work); hot entities are AQE-skew-handled.
Daily rollups pre-aggregate map-side. No driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import register
from .common import dec, dsum, t

# --- flagship: per-entity decay indicator (lag + windowed delta) -------------
DECAY_ORACLE = """
    WITH deltas AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6))
             - LAG(CAST(value AS DECIMAL(18,6)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      FROM events
    )
    SELECT user_id,
           COUNT(delta) AS n_deltas,
           CAST(SUM(delta) AS DOUBLE) / COUNT(delta) AS decay_rate
    FROM deltas
    WHERE delta IS NOT NULL
    GROUP BY user_id
    ORDER BY decay_rate, user_id
    LIMIT 20
"""


@register("decay_indicator", oracle=DECAY_ORACLE)
def decay_indicator(spark, sf_dir):
    """Per-satellite orbital-decay indicator (SURVEY.md §7 flagship):
    lag(mean_motion) per entity over epoch order → mean delta → top-k
    most-negative (decaying) entities."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = dec("value", 18, 6)
    deltas = e.select(
        "user_id", (v - F.lag(v).over(w)).alias("delta")
    ).where(F.col("delta").isNotNull())
    return (
        deltas.groupBy("user_id")
        .agg(
            F.count("delta").alias("n_deltas"),
            (F.sum("delta").cast("double") / F.count("delta")).alias("decay_rate"),
        )
        .orderBy(F.asc("decay_rate"), F.asc("user_id"))
        .limit(20)
    )


# --- running (cumulative) aggregate ------------------------------------------
@register(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def running_customer_spend(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 14, 2)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


# --- top-k per group (window + rank; §2.7) -----------------------------------
@register(
    "top_orders_per_status",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def top_orders_per_status(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# --- rank family over entity history ------------------------------------------
# Unregistered (round 3): subsumed by stats.ntile_lead_lag_orders, which
# carries the official CORRECTNESS row for the rank/ntile/lead family.
# Kept as a callable for tests and ad-hoc use.
def rank_functions(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    w_qty = Window.partitionBy("l_suppkey").orderBy(F.desc("l_quantity"))
    w_tile = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_quantity"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    w_time = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w_qty).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_qty).cast("bigint").alias("drnk"),
        F.ntile(4).over(w_tile).cast("bigint").alias("quartile"),
        F.lead("l_quantity").over(w_time).alias("next_qty"),
    )


# --- daily tumbling rollup (weather-grain; §2.9 batch equivalent) ------------
@register(
    "tumbling_daily_value",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_daily_value(spark, sf_dir):
    # F.window('ts','1 day') in batch — the same operator the streaming
    # path uses with a watermark (streaming/incremental.py).
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 18, 6).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --- sessionization (session_window batch; §2.9) ------------------------------
@register(
    "session_windows",
    oracle="""
    WITH flagged AS (
      -- >= matches Spark's half-open session windows exactly: an event
      -- at precisely prev_ts + gap begins a NEW session ([start, end)
      -- does not contain its end) — same boundary convention as the
      -- dynamic_gap_sessions oracle
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), grouped AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM grouped GROUP BY user_id, session_id
    """,
)
def session_windows(spark, sf_dir):
    # Spark's native session_window merges events with < gap spacing —
    # identical islands to the lag/cumsum formulation the oracle uses.
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


# --- date-grain enrichment join (J5: telemetry × daily weather) --------------
@register(
    "daily_enrichment_join",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS day_avg
      FROM events GROUP BY 1
    )
    SELECT e.event_id, d.day, d.day_avg
    FROM events e JOIN daily d ON CAST(date_trunc('day', e.ts) AS DATE) = d.day
    WHERE e.event_type = 'click'
    """,
)
def daily_enrichment_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (F.sum(dec("value", 18, 6)).cast("double") / F.count(F.lit(1))).alias(
                "day_avg"
            )
        )
    )
    return (
        e.where(F.col("event_type") == "click")
        .withColumn("day", F.to_date("ts"))
        .join(F.broadcast(daily), "day")
        .select("event_id", "day", "day_avg")
    )


# --- as-of join (nearest prior observation; J5 as-of variant) ----------------
@register(
    "asof_join_latest_purchase",
    oracle="""
    WITH purchases AS (
      -- tie-stable: collapse equal-ts purchases to MAX(event_id) so the
      -- ASOF join (arbitrary row among ts ties) is deterministic and
      -- matches Spark's last-over-ascending-p_event tie-break
      SELECT user_id, ts AS p_ts, MAX(event_id) AS p_event
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ), clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           p.p_event AS last_purchase_event
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.p_ts <= c.ts
    """,
)
def asof_join_latest_purchase(spark, sf_dir):
    """As-of join: for each click, the user's latest purchase at-or-before.

    Spark has no native as-of join; the scalable composition is
    union-tag → single window pass (last non-null over time order) —
    ONE shuffle on the entity key, no range explosion, no per-group
    pandas. (The DuckDB oracle uses its native ASOF JOIN.)

    Tie semantics: a purchase at exactly click-ts counts (<=); among
    equal-ts purchases the max event_id wins, mirroring ASOF's
    greatest-match rule deterministically.
    """
    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.col("event_id").alias("p_event"),
        F.lit(None).cast("long").alias("c_event"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("long").alias("p_event"),
        F.col("event_id").alias("c_event"),
    )
    # purchases sort before clicks at equal ts (side=0 < 1) so an
    # equal-ts purchase is visible to the click, matching ASOF <=.
    unioned = purchases.withColumn("side", F.lit(0)).unionByName(
        clicks.withColumn("side", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side", "p_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_purchase_event", F.last("p_event", True).over(w))
        .where(F.col("side") == 1)
        .select(
            F.col("c_event").alias("event_id"), "user_id", "last_purchase_event"
        )
    )


# --- bounded window frames: trailing ROWS + time RANGE (§2.7) ---------------
@register(
    "moving_avg_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS trailing4_avg,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_30d
    FROM orders
    """,
)
def moving_avg_spend(spark, sf_dir):
    """Bounded window frames, both kinds: a trailing-4 ROWS frame
    (order + tiebreak → deterministic row set) and a 30-day RANGE frame
    over the µs epoch (peer rows included by value, deterministic under
    ties by construction). Spark's rangeBetween takes numeric offsets,
    so the time range rides unix_micros — same 2.592e12 µs constant as
    the oracle. Frame sums go through the decimal cast (exact within
    any frame)."""
    o = t(spark, sf_dir, "orders")
    rows_w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    range_w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400 * 1000000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(rows_w).cast("double")
            / F.count(F.lit(1)).over(rows_w)
        ).alias("trailing4_avg"),
        F.sum(dec("o_totalprice")).over(range_w).cast("double").alias(
            "sum_30d"
        ),
    )


# --- sequential custom operator: applyInPandas EWMA (§2.10) ------------------
@register(
    "ewma_anomaly_by_user",
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    -- NB: scalar folds only. A single struct-state fold
    -- ((acc,x) -> CASE ... {'e':..., 'c':...}) hits a DuckDB
    -- vectorization bug: the same query returns different anomaly
    -- counts with vs without an outer filter. Per-prefix scalar
    -- list_reduce is O(n^2) but bit-identical to the sequential
    -- kernel and stable.
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(vals, (a, v) -> 0.875 * a + 0.125 * v)
               AS final_ewma,
           CAST(len(list_filter(
               range(2, len(vals) + 1),
               i -> abs(vals[i]
                        - list_reduce(list_slice(vals, 1, i - 1),
                                      (a, v) -> 0.875 * a + 0.125 * v))
                    > 3.0 * abs(list_reduce(list_slice(vals, 1, i - 1),
                                            (a, v) -> 0.875 * a + 0.125 * v))
           )) AS BIGINT) AS n_anomalies
    FROM ordered
    """,
)
def ewma_anomaly_by_user(spark, sf_dir):
    """Sequential per-entity EWMA + online anomaly count via
    ``applyInPandas`` (operators/grouped.py) — the one computation class
    where row i needs row i-1's RESULT, which no window function
    expresses (windows lag inputs, not outputs). alpha=1/8 keeps every
    step the same two IEEE ops, so the DuckDB oracle replays the exact
    fold with list_reduce and matches bit-for-bit — the Python grouped
    kernel sits fully under the correctness gate."""
    from ..operators.grouped import ewma_by_group

    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ewma_by_group(e)


# --- distribution window functions: percent_rank / cume_dist -----------------
@register(
    "window_distribution_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_functions(spark, sf_dir):
    """percent_rank / cume_dist over a total order (§2.7 completion):
    the normalized-rank family used for percentile bucketing of
    entities. Both are rank/(n-1)-style exact rational divisions of
    integer ranks, so the doubles are bit-identical across engines.
    One shuffle on the partition key."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


# --- temporal gap fill / calendar resample ------------------------------------
@register(
    "gap_fill_daily_user",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS sv, COUNT(*) AS n
        FROM events WHERE user_id < 20 GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), cal AS (
        SELECT s.user_id, CAST(g.g AS DATE) AS day
        FROM span s,
             LATERAL unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                            CAST(s.d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS g(g)
    )
    SELECT c.user_id, c.day,
           CAST(COALESCE(d.sv, 0) AS DOUBLE) AS total_value,
           COALESCE(d.n, 0) AS n_events,
           d.n IS NULL AS is_gap
    FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
    """,
)
def gap_fill_daily_user(spark, sf_dir):
    """Calendar resample with gap fill: per user, a dense daily series
    from their first to last active day — silent days materialized as
    zero rows flagged ``is_gap`` — the shape time-series stores call
    gap-filling / interpolation scaffolding (and what a training
    pipeline uses to build fixed-frequency activity features).

    Plan: aggregate to daily grain FIRST (one shuffle of partial
    sums), derive each user's [min, max] span from the daily rollup
    (not the raw scan), then ``sequence() + explode`` generates the
    calendar rows — output-sized work, no Python, no driver loop. The
    left join back to the rollup is user+day equi-join; at 100 TB both
    sides are already partitioned on user_id from the same upstream
    shuffle, so AQE plans it without a second full exchange of the raw
    fact."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(dec("value", 18, 6)).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
        )
    )
    return cal.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce(F.col("sv"), F.lit(0)).cast("double").alias(
            "total_value"
        ),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )


# --- sliding (hopping) window aggregation -------------------------------------
@register(
    "sliding_weekly_value",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS sv
        FROM events GROUP BY 1
    )
    SELECT daily.d - CAST(g.k AS INT) AS win_start,
           daily.d - CAST(g.k AS INT) + 7 AS win_end,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(sv) AS DOUBLE) AS total_value
    FROM daily, LATERAL unnest(generate_series(0, 6)) AS g(k)
    GROUP BY 1, 2
    """,
)
def sliding_weekly_value(spark, sf_dir):
    """Sliding 7-day window, hopping by 1 day (``F.window(ts, '7
    days', '1 day')``): each event contributes to the 7 overlapping
    windows that contain it — the rolling-weekly-volume view, and the
    exact batch twin of a streaming hopping-window aggregation.

    The oracle reproduces Spark's epoch-aligned window semantics
    relationally: a window starting at day D-k (k in 0..6) contains
    day D, so the daily rollup cross-joined with the 7 offsets and
    re-aggregated is the same window set (windows with zero events
    don't exist in either engine). Plan: the 7x fan-out happens
    map-side AFTER nothing — Spark expands window instances before the
    single aggregation shuffle; sums stay decimal until the end.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 6)).alias("sv"),
        )
        .select(
            F.col("w.start").cast("date").alias("win_start"),
            F.col("w.end").cast("date").alias("win_end"),
            "n_events",
            F.col("sv").cast("double").alias("total_value"),
        )
    )


# --- dynamic-gap sessionization -----------------------------------------------
@register(
    "dynamic_gap_sessions",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                    ELSE INTERVAL 30 MINUTE END AS gap
        FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id, gap,
               CASE WHEN MAX(ts + gap) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                 OR ts >= MAX(ts + gap) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS new_session
        FROM e
    ), grouped AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM grouped GROUP BY user_id, session_id
    """,
)
def dynamic_gap_sessions(spark, sf_dir):
    """Sessionization with a PER-EVENT gap: purchases hold a session
    open for 60 minutes, everything else 30 — Spark's
    ``session_window`` with a dynamic gap-duration expression, the
    operator behind activity models where different actions have
    different decay.

    The oracle reproduces the merge rule relationally: an event starts
    a new session iff it begins at/after the running max of every
    previous event's (ts + its own gap) — running-max-end is exactly
    "my window overlaps the merged window so far". Hash equality
    certifies Spark's native session merge against that definition.
    Plan: one shuffle on user_id (same as fixed-gap session_windows);
    the dynamic gap costs nothing extra — it's an expression input to
    the same streaming-capable operator."""
    e = t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    return (
        e.groupBy(
            "user_id", F.session_window("ts", gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


# --- LOCF forward fill (last observation carried forward) ---------------------
@register(
    "locf_forward_fill",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events WHERE user_id < 20
    ), marked AS (
        SELECT user_id, ts, event_id, v,
               COUNT(v) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS grp
        FROM e
    )
    SELECT user_id, ts, event_id, v,
           MAX(v) OVER (PARTITION BY user_id, grp) AS v_filled,
           v IS NULL AS was_filled
    FROM marked
    """,
)
def locf_forward_fill(spark, sf_dir):
    """Forward fill (LOCF): gaps in a sensor series (here: every 7th
    event's value nulled as the fixture, stated) take the most recent
    non-null observation for the same entity — the standard
    time-series repair before feature extraction, and the complement
    of gap_fill_daily_user (which materializes missing ROWS; this
    fills missing VALUES).

    Implemented with the portable count-marker trick instead of
    last_value(IGNORE NULLS): a running COUNT of non-null values is
    constant across a null run, so (user, count) groups each null with
    its preceding observation and MAX over that group is the carried
    value — deterministic, engine-independent, one shuffle on user_id
    (the second window reuses the same partitioning)."""
    e = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") < 20)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_id") % 7 == 0, None)
            .otherwise(F.col("value"))
            .alias("v"),
        )
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = e.withColumn("grp", F.count("v").over(w_run))
    w_grp = Window.partitionBy("user_id", "grp")
    return marked.select(
        "user_id",
        "ts",
        "event_id",
        "v",
        F.max("v").over(w_grp).alias("v_filled"),
        F.col("v").isNull().alias("was_filled"),
    )


@register(
    "asof_join_with_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_event
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN p.p_ts >= c.ts - INTERVAL 7 DAY
                THEN p.p_event END AS last_purchase_event,
           CASE WHEN p.p_ts >= c.ts - INTERVAL 7 DAY
                THEN datediff('day', p.p_ts, c.ts) END AS days_since
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.p_ts <= c.ts
    """,
)
def asof_join_with_tolerance(spark, sf_dir):
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=)``
    semantics): each click takes the user's latest at-or-before
    purchase ONLY if it happened within the last 7 days — stale
    matches become NULL, the click row survives.

    Same scalable composition as the unbounded as-of (union-tag → one
    window pass, ONE shuffle on the entity key, no range explosion):
    the window also carries the matched purchase's timestamp, and the
    tolerance is a post-window CASE — zero extra shuffles over the
    unbounded version."""
    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event"),
        F.lit(None).cast("long").alias("c_event"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_event"),
        F.col("event_id").alias("c_event"),
    )
    unioned = purchases.withColumn("side", F.lit(0)).unionByName(
        clicks.withColumn("side", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side", "p_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "user_id",
        "ev_ts",
        "c_event",
        F.last("p_event", ignorenulls=True).over(w).alias("m_event"),
        F.last("p_ts", ignorenulls=True).over(w).alias("m_ts"),
    ).where(F.col("c_event").isNotNull())
    fresh = F.col("m_ts") >= F.col("ev_ts") - F.expr("INTERVAL 7 DAYS")
    return carried.select(
        F.col("c_event").alias("event_id"),
        "user_id",
        F.when(fresh, F.col("m_event")).alias("last_purchase_event"),
        F.when(fresh, F.datediff(F.col("ev_ts"), F.col("m_ts")))
        .alias("days_since"),
    )


@register(
    "interval_overlap_join_bucketed",
    oracle="""
    WITH su AS (
        SELECT user_id, event_id AS signup_id, ts AS s
        FROM events WHERE event_type = 'signup'
    ), pu AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT su.signup_id, su.user_id,
           CAST(COUNT(pu.ts) AS BIGINT) AS n_purchases,
           CAST(COALESCE(SUM(CAST(pu.value AS DECIMAL(12,4))), 0.00)
                AS DOUBLE) AS purchase_value
    FROM su LEFT JOIN pu
      ON su.user_id = pu.user_id
     AND pu.ts >= su.s AND pu.ts < su.s + INTERVAL 24 HOURS
    GROUP BY 1, 2
    """,
)
def interval_overlap_join_bucketed(spark, sf_dir):
    """Interval-overlap join, bucket-blocked: same-user purchases
    falling in each signup's 24-hour attribution window — the
    interval/theta join that naive engines execute as a per-key range
    NESTED LOOP. The scale move: a 24 h window overlaps at most TWO
    calendar days, so each window explodes into ≤2 (user, day) bucket
    rows, each purchase carries its ONE (user, day) bucket, and the
    join becomes a plain EQUI-join on (user_id, day) with the exact
    range as a residual filter. No pair is duplicated (a purchase's
    bucket is unique) and no dedup pass is needed; zero-match signups
    survive via the left join. Purchase values sum as exact decimals.
    """
    e = t(spark, sf_dir, "events")
    su = e.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s"),
    )
    end = F.col("s") + F.expr("INTERVAL 24 HOURS")
    su_b = su.select(
        "user_id",
        "signup_id",
        "s",
        F.explode(
            F.array_distinct(
                F.array(
                    F.date_trunc("DAY", F.col("s")).cast("date"),
                    F.date_trunc("DAY", end).cast("date"),
                )
            )
        ).alias("day"),
    )
    pu = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("p_day"),
        F.col("value").cast("decimal(12,4)").alias("p_value"),
    )
    joined = su_b.join(
        pu,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("day") == F.col("p_day"))
        & (F.col("p_ts") >= F.col("s"))
        & (F.col("p_ts") < F.col("s") + F.expr("INTERVAL 24 HOURS")),
        "left",
    )
    return joined.groupBy("signup_id", "user_id").agg(
        F.count("p_ts").cast("bigint").alias("n_purchases"),
        F.coalesce(
            F.sum("p_value"), F.lit(0).cast("decimal(12,4)")
        ).cast("double").alias("purchase_value"),
    )


# --- forward as-of join (time-to-next-event) ----------------------------------
@register(
    "asof_join_forward",
    oracle="""
    WITH purchases AS (
      -- tie-stable: collapse equal-ts purchases to MIN(event_id) so the
      -- ASOF join (which picks an arbitrary row among ts ties) is
      -- deterministic and matches Spark's ascending p_event tie-break
      SELECT user_id, ts AS p_ts, MIN(event_id) AS p_event
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ), clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           p.p_event AS next_purchase_event,
           datediff('day', c.ts, p.p_ts) AS days_until
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.p_ts >= c.ts
    """,
)
def asof_join_forward(spark, sf_dir):
    """FORWARD as-of join (pandas ``merge_asof(direction='forward')``):
    each click takes the user's EARLIEST purchase at-or-after it — the
    time-to-conversion join, the mirror of the backward variant that
    answers "how long after each touch did the purchase land".

    Same one-shuffle union-tag composition as the backward as-of, with
    the window frame flipped: first-non-null over
    (currentRow, unboundedFollowing), ordered so that a purchase at
    the exact click timestamp sorts after the click row and is
    therefore eligible (inclusive >= bound, matching DuckDB's ASOF).
    Unmatched clicks survive with NULLs (left semantics). No range
    explosion, no join — the event stream shuffles once on user_id.
    """
    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event"),
        F.lit(None).cast("long").alias("c_event"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_event"),
        F.col("event_id").alias("c_event"),
    )
    unioned = clicks.withColumn("side", F.lit(0)).unionByName(
        purchases.withColumn("side", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side", "p_event")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        unioned.select(
            "user_id",
            "ev_ts",
            "c_event",
            F.first("p_event", ignorenulls=True).over(w).alias(
                "next_purchase_event"
            ),
            F.first("p_ts", ignorenulls=True).over(w).alias("m_ts"),
        )
        .where(F.col("c_event").isNotNull())
        .select(
            F.col("c_event").alias("event_id"),
            "user_id",
            "next_purchase_event",
            F.datediff(F.col("m_ts"), F.col("ev_ts")).alias("days_until"),
        )
    )


# --- event-time lateness audit (watermark design aid) -------------------------
@register(
    "event_lateness_audit",
    oracle="""
    WITH arr AS (
        SELECT user_id, ts,
               MAX(ts) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS high_water
        FROM events
    ),
    late AS (
        SELECT CAST(date_diff('second', ts, high_water) AS BIGINT) AS late_s
        FROM arr
    )
    SELECT CASE WHEN late_s = 0 THEN 0
                WHEN late_s <= 60 THEN 1
                WHEN late_s <= 3600 THEN 2
                WHEN late_s <= 86400 THEN 3
                ELSE 4 END AS lateness_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS frac
    FROM late GROUP BY 1
    """,
)
def event_lateness_audit(spark, sf_dir):
    """Event-time lateness audit — the measurement that DESIGNS a
    watermark instead of guessing one: treating event_id as arrival
    order, each event's lateness is the per-user high-water mark (the
    running max event time at its arrival) minus its own event time.
    The bucketed histogram (on-time / <=1 min / <=1 h / <=1 day /
    worse) with the max observed lateness tells you exactly what
    fraction of data a candidate ``withWatermark`` horizon would drop —
    the batch twin of the tradeoff every streaming job in
    streaming/windowed.py makes.

    Integer-second arithmetic throughout; the running max is one
    user-keyed window in arrival order (at 100 TB arrival order is the
    ingest file/offset order — same window, same shape); the rollup is
    at most 5 bucket rows and the fraction denominator rides a window
    over them. On the driver's generator, event_id order IS timestamp
    order, so everything lands in bucket 0 with max_late_s = 0 — that
    degenerate histogram is itself the audit's (gated) finding: this
    feed needs no lateness allowance; ``tests/test_streaming.py``
    exercises the genuinely-late path.
    """
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_s = (
        F.max(F.col("ts").cast("long")).over(w) - F.col("ts").cast("long")
    )
    bucket = (
        F.when(late_s == 0, 0)
        .when(late_s <= 60, 1)
        .when(late_s <= 3600, 2)
        .when(late_s <= 86400, 3)
        .otherwise(4)
    )
    counts = (
        e.select(bucket.alias("lateness_bucket"), late_s.alias("late_s"))
        .groupBy("lateness_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
    )
    wall = Window.partitionBy()
    return counts.select(
        "lateness_bucket",
        F.col("n").cast("bigint").alias("n_events"),
        "max_late_s",
        (F.col("n").cast("double") / F.sum("n").over(wall).cast("double")).alias(
            "frac"
        ),
    )


# --- integer-exact interpolating resample -------------------------------------
@register(
    "resample_hourly_interpolate",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               SUM(CAST(value AS DECIMAL(18,6))) AS sv
        FROM events GROUP BY 1
    ),
    seg AS (
        SELECT d, sv,
               LEAD(sv) OVER (ORDER BY d) AS nxt,
               LEAD(d) OVER (ORDER BY d) AS nd
        FROM daily
    ),
    pairs AS (
        SELECT d, sv, nxt FROM seg
        WHERE nxt IS NOT NULL AND nd = d + 1
    )
    SELECT d, CAST(g.h AS INT) AS hour,
           CAST(CAST(sv * 1000000 AS BIGINT)
                + (CAST((nxt - sv) * 1000000 AS BIGINT) * g.h) // 24
                AS BIGINT) AS value_micro
    FROM pairs, LATERAL unnest(generate_series(0, 23)) AS g(h)
    """,
)
def resample_hourly_interpolate(spark, sf_dir):
    """Upsampling resample: the daily value series linearly
    interpolated to hourly grain — the time-series alignment step
    before joining series of different frequencies (the inverse of the
    rollup cascade). Interpolation is where float determinism usually
    dies (v0 + (v1-v0)*h/24 accumulates differently per engine), so
    the entire ramp is integer micro-units: exact decimal day totals
    scaled by 1e6 to bigint, the fraction as a FLOOR-DIVIDED integer
    product ((delta_micro * h) DIV 24) — bit-identical everywhere,
    monotone along each segment by construction.

    Only adjacent-day segments interpolate (a gap in the daily series
    does not fabricate a ramp across it — gap semantics belong to
    gap_fill_daily_user / LOCF). Plan: one event->day shuffle, a lead
    window over the tiny daily series, then a 24x fan-out on day-grain
    rows only.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(dec("value", 18, 6)).alias("sv"))
    w = Window.orderBy("d")
    seg = daily.select(
        "d",
        "sv",
        F.lead("sv").over(w).alias("nxt"),
        F.lead("d").over(w).alias("nd"),
    ).where(
        F.col("nxt").isNotNull() & (F.col("nd") == F.date_add("d", 1))
    )
    return (
        seg.select(
            "d",
            (F.col("sv") * 1_000_000).cast("bigint").alias("base_units"),
            ((F.col("nxt") - F.col("sv")) * 1_000_000)
            .cast("bigint")
            .alias("delta_units"),
        )
        .select(
            "d",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"),
            "base_units",
            "delta_units",
        )
        .select(
            "d",
            F.col("hour").cast("int").alias("hour"),
            F.expr("base_units + (delta_units * hour) DIV 24")
            .cast("bigint")
            .alias("value_micro"),
        )
    )


# --- numeric RANGE frame (value-based window, not row- or time-based) ---------
@register(
    "value_range_frame_sum",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
               AS near_total
    FROM orders
    WINDOW w AS (
        PARTITION BY o_orderstatus ORDER BY o_totalprice
        RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
    )
    """,
)
def value_range_frame_sum(spark, sf_dir):
    """Numeric RANGE frame: for every order, the count and exact total
    of same-status orders whose price lies within +-1000 of ITS price —
    a value-based neighborhood, the third window frame mode beside
    ROWS (position) and calendar RANGE (time, flux_rotation_anomaly).
    This is the frame that prices "how crowded is my price point" and
    kernel-density-style local mass without a self-join; the
    equivalent theta join (|a.price - b.price| <= 1000) is quadratic,
    while the RANGE frame is one sort per partition with a sliding
    boundary.

    RANGE frames peer on the ORDER BY VALUE, so ties share identical
    frames in both engines — no tiebreak key is needed (and adding one
    is illegal: multi-column ORDER BY with a value RANGE is rejected).
    Decimal-exact sums, one partition-keyed window shuffle.
    """
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_near"),
        F.sum(dec("o_totalprice", 18, 4))
        .over(w)
        .cast("double")
        .alias("near_total"),
    )


# --- debounce: first event per (user, type) burst --------------------------
@register(
    "debounce_first_per_burst",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id)
                        >= INTERVAL 5 MINUTE
                 OR LAG(ts) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS new_burst
        FROM events
    ),
    bursts AS (
        SELECT user_id, event_type, ts, event_id, value,
               SUM(new_burst) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS burst_id
        FROM flagged
    ),
    firsts AS (
        SELECT user_id, event_type, burst_id, ts,
               FIRST_VALUE(event_id) OVER (
                   PARTITION BY user_id, event_type, burst_id
                   ORDER BY ts, event_id
               ) AS first_eid
        FROM bursts
    )
    SELECT user_id, event_type,
           MIN(ts) AS first_ts,
           CAST(MIN(first_eid) AS BIGINT) AS first_event_id,
           CAST(COUNT(*) AS BIGINT) AS n_suppressed
    FROM firsts
    GROUP BY user_id, event_type, burst_id
    """,
)
def debounce_first_per_burst(spark, sf_dir):
    """Debounce / alert-throttle: for each (user, event_type), emit the
    FIRST event of every burst and count what the throttle suppressed —
    a repeat within 5 minutes of the previous arrival stays silent and
    RESETS the timer (trailing debounce), so a steady drip never
    re-fires until a full quiet gap passes. The alert-dedup /
    rate-limit semantics every notification pipeline needs, expressed
    as gaps-and-islands: bursts are 5-minute-gap sessions per
    (user, type), the emitted row is each island's first element.

    Gap rule uses integer-µs >= (the session_windows half-open
    convention); the burst's first element is the (ts, event_id)
    argmin — total order, no arbitrary pick. One composite-keyed
    window shuffle carries flagging, island numbering, AND the final
    per-burst collapse."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            prev.isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                >= 5 * 60 * 1_000_000
            )
        )
        .cast("int")
        .alias("new_burst"),
    )
    bursts = flagged.withColumn(
        "burst_id",
        F.sum("new_burst").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wf = Window.partitionBy("user_id", "event_type", "burst_id").orderBy(
        "ts", "event_id"
    )
    firsts = bursts.withColumn(
        "first_eid", F.first("event_id").over(wf)
    )
    return (
        firsts.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.min("first_eid").cast("bigint").alias("first_event_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_suppressed"),
        )
        .drop("burst_id")
    )


# --------------------------------------------------------------------------
# clamped running balance (Lindley recursion via Skorokhod reflection)
# --------------------------------------------------------------------------
@register(
    "clamped_running_balance",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN CAST(value AS DECIMAL(18,2))
                    ELSE -CAST(value AS DECIMAL(18,2)) END AS v
        FROM events
    ),
    c AS (
        SELECT user_id, event_id, ts, v,
               SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM s
    ),
    c2 AS (
        SELECT user_id, v, cum,
               MIN(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS runmin
        FROM c
    ),
    b AS (
        SELECT user_id, v,
               cum - LEAST(CAST(0 AS DECIMAL(38,2)), runmin) AS bal
        FROM c2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(MAX(bal) AS DECIMAL(18,2)) AS DOUBLE)
               AS peak_balance,
           CAST(SUM(CASE WHEN bal = 0 AND v < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_floor_hits
    FROM b GROUP BY user_id
    """,
)
def clamped_running_balance(spark, sf_dir):
    """Running balance clamped at zero — the Lindley recursion
    b_t = max(0, b_{t-1} + v_t) that models inventory, prepaid
    credit, queue backlogs, and rate-limiter tokens. It LOOKS like a
    non-windowable sequential recurrence, but the Skorokhod
    reflection identity solves it in closed form:
    b_t = cum_t − min(0, min_{s≤t} cum_s) — two stacked windows, no
    kernel, no iteration, exact for any one-sided clamp. (The
    two-sided clamp — floor AND cap — has no such form; that is the
    true boundary where an applyInPandas kernel becomes necessary.)

    Signed engagement series (the ``user_value_drawdown`` convention),
    all DECIMAL-exact; per user: event count, peak clamped balance,
    and how often a drop landed on the floor (the stock-out /
    credit-exhausted counter). Both windows and the rollup share ONE
    user-keyed shuffle."""
    e = t(spark, sf_dir, "events")
    signed = F.when(
        F.col("event_type").isin("purchase", "signup"),
        F.col("value").cast("decimal(18,2)"),
    ).otherwise(-F.col("value").cast("decimal(18,2)"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = e.select("user_id", "event_id", "ts", signed.alias("v")).withColumn(
        "cum", F.sum("v").over(w)
    )
    # the running min MUST take the same (ts, event_id) total order the
    # cumulative series was built in — ordering by event_id alone is
    # only equivalent when ids happen to be ts-monotone per user (the
    # r6 advisor's silent-semantics hazard)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = c.withColumn("runmin", F.min("cum").over(w2)).withColumn(
        "bal",
        F.col("cum")
        - F.least(F.lit(0).cast("decimal(38,2)"), F.col("runmin")),
    )
    return b.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("bal").cast("decimal(18,2)").cast("double")
        .alias("peak_balance"),
        F.sum(((F.col("bal") == 0) & (F.col("v") < 0)).cast("int"))
        .cast("bigint")
        .alias("n_floor_hits"),
    )


# --------------------------------------------------------------------------
# session entry/exit transition matrix
# --------------------------------------------------------------------------
@register(
    "session_entry_exit_matrix",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    grouped AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                 AS session_id
      FROM flagged
    ),
    bounds AS (
      SELECT user_id, session_id,
             first_value(event_type) OVER w AS entry_type,
             last_value(event_type) OVER w AS exit_type,
             COUNT(*) OVER (PARTITION BY user_id, session_id)
                 AS n_events
      FROM grouped
      WINDOW w AS (PARTITION BY user_id, session_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)
    ),
    sessions AS (
      SELECT DISTINCT user_id, session_id, entry_type, exit_type,
             n_events
      FROM bounds
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           round(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6)
               AS avg_session_len,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces
    FROM sessions GROUP BY 1, 2
    """,
)
def session_entry_exit_matrix(spark, sf_dir):
    """Session entry/exit transition matrix: for every (first event
    type, last event type) pair, how many sessions start and end that
    way, their average length, and how many are single-event bounces
    — the landing/abandonment view ("sessions that start with an
    error and end with an error are bounces; sessions entered via
    view and exited via purchase are the funnel working") product
    analytics reads next to ``session_path_analysis``.

    Same session convention as ``session_windows`` (30-minute
    half-open gap on full-microsecond timestamps, (ts, event_id)
    total order); entry/exit via first/last_value over the fully
    framed session window, so ties cannot exist. Plan: all four
    windows and the session collapse run on the ONE user-keyed
    shuffle; the final matrix is a tiny (|types|²) rollup."""
    e = t(spark, sf_dir, "events")
    ow = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(ow))
    flagged = e.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn(
        "new_session",
        F.when(
            (gap_us >= 1800 * 1_000_000) | gap_us.isNull(), 1
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            ow.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sw = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    bounds = grouped.select(
        "user_id",
        "session_id",
        F.first("event_type").over(sw).alias("entry_type"),
        F.last("event_type").over(sw).alias("exit_type"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "session_id"))
        .alias("n_events"),
    ).distinct()
    return bounds.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.round(
            F.sum("n_events") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_session_len"),
        F.sum((F.col("n_events") == 1).cast("int"))
        .cast("bigint")
        .alias("n_bounces"),
    )


# --- gaps-and-islands: consecutive-active-day streaks ------------------------
@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
        FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d
               ) AS g
        FROM days
    ),
    islands AS (
        SELECT user_id, g,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(d) AS BIGINT) AS start_d
        FROM grp GROUP BY user_id, g
    ),
    ranked AS (
        SELECT user_id, len, start_d,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY len DESC, start_d
               ) AS rn,
               CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_active_days,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_streaks
        FROM islands
    )
    SELECT user_id, n_active_days, n_streaks,
           len AS longest_streak, start_d AS longest_start_day
    FROM ranked WHERE rn = 1
    """,
)
def user_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: each user's consecutive-active-day streaks —
    the classic retention shape (duolingo-style "longest streak")
    that needs islands, not windowsized frames: island id = active_day
    − row_number(per user, day order), constant exactly while days
    are consecutive. Longest streak picked with a (length DESC, start
    ASC) total order so ties are deterministic.

    All arithmetic is integer epoch-days; every window partitions by
    user_id (one shuffle, linear in-partition) and the island rollup
    is user-grain — nothing global, nothing data-sized in a frame."""
    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("d"),
    ).distinct()
    g = days.withColumn(
        "g",
        F.col("d")
        - F.row_number().over(
            Window.partitionBy("user_id").orderBy("d")
        ),
    )
    islands = g.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("d").cast("bigint").alias("start_d"),
    )
    wu = Window.partitionBy("user_id")
    ranked = islands.select(
        "user_id",
        "len",
        "start_d",
        F.row_number()
        .over(wu.orderBy(F.col("len").desc(), F.col("start_d")))
        .alias("rn"),
        F.sum("len").over(wu).cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).over(wu).cast("bigint").alias("n_streaks"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "user_id",
        "n_active_days",
        "n_streaks",
        F.col("len").alias("longest_streak"),
        F.col("start_d").alias("longest_start_day"),
    )


# --- interval union: merge overlapping coverage windows ----------------------
@register(
    "interval_coalesce_union",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS s,
               CAST(epoch_us(ts) + 1800000000 AS BIGINT) AS e
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islanded AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS isl
        FROM marked
    ),
    merged AS (
        SELECT user_id, isl,
               MIN(s) AS ms, MAX(e) AS me
        FROM islanded GROUP BY user_id, isl
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(me - ms) AS BIGINT) AS covered_us,
           CAST(MAX(me - ms) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    """,
)
def interval_coalesce_union(spark, sf_dir):
    """Interval union (coalesce overlapping ranges): every event opens
    a 30-minute attention window; per user, overlapping/touching
    windows merge and the TOTAL covered time is reported — the
    double-count-free utilization measure (machine uptime, ad
    exposure, session coverage) that a plain SUM of durations gets
    wrong. Sweep: an interval starts a new island iff its start
    exceeds the running MAX end of all earlier intervals (handles
    nested intervals that a lag-based check misses); island id is the
    running sum of starts.

    Integer-µs arithmetic end to end; both windows partition by
    user_id with a (start, event_id) total order — one shuffle,
    linear in-partition, no global frame."""
    e = t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").cast("bigint").alias("s"),
        (F.unix_micros("ts") + 1_800_000_000).cast("bigint").alias("e"),
    )
    wseq = Window.partitionBy("user_id").orderBy("s", "event_id")
    marked = iv.withColumn(
        "new_island",
        (
            F.col("s")
            > F.coalesce(
                F.max("e").over(
                    wseq.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(-1),
            )
        ).cast("int"),
    )
    islanded = marked.withColumn(
        "isl",
        F.sum("new_island").over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islanded.groupBy("user_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("covered_us"),
        F.max(F.col("me") - F.col("ms")).cast("bigint").alias("longest_us"),
    )


# --- as-of join, NEAREST direction (third mode beside backward/forward) -----
@register(
    "asof_join_nearest",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts AS p_ts, MAX(event_id) AS p_event
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    errors AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'error'
    ),
    back AS (
        SELECT e.event_id, e.user_id, e.ts,
               p.p_event AS b_event, p.p_ts AS b_ts
        FROM errors e
        ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND p.p_ts <= e.ts
    ),
    paired AS (
        SELECT b.event_id, b.user_id, b.ts, b.b_event, b.b_ts,
               p.p_event AS f_event, p.p_ts AS f_ts
        FROM back b
        ASOF LEFT JOIN purchases p
          ON b.user_id = p.user_id AND p.p_ts >= b.ts
    )
    SELECT event_id, user_id,
           CASE WHEN b_event IS NOT NULL AND (f_event IS NULL OR
                     epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts))
                THEN b_event ELSE f_event END AS nearest_purchase_event,
           CASE WHEN b_event IS NOT NULL AND (f_event IS NULL OR
                     epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts))
                THEN CAST(epoch_us(b_ts) - epoch_us(ts) AS BIGINT)
                ELSE CAST(epoch_us(f_ts) - epoch_us(ts) AS BIGINT)
           END AS diff_us
    FROM paired
    """,
)
def asof_join_nearest(spark, sf_dir):
    """As-of join, NEAREST mode — the third direction completing the
    backward (``asof_join_latest_purchase``) / forward
    (``asof_join_forward``) pair: each error event pairs with the
    closest purchase in absolute event time, ties to the earlier
    (backward) side; users with no purchase at all emit NULLs.

    Composition: ONE union-tag pooled stream, scanned twice with
    per-user ordered windows — ascending (last purchase ≤ ts; an
    equal-ts purchase sorts before the error, so ≤ holds) and
    descending (first purchase > ts; at equal ts the error sorts
    first in the reversed scan, so the tie stays backward-side).
    Candidate choice is pure integer-µs comparison. Two shuffles on
    user_id total, no range explosion, no per-group pandas. (DuckDB
    oracle: native ASOF both directions — its ``>=`` forward may
    surface an equal-ts tie the engine assigns backward, but a 0-µs
    tie picks the backward candidate in both engines, so the CASE
    resolves identically.)"""
    e = t(spark, sf_dir, "events")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event"))
        .select(
            "user_id",
            F.col("ts").alias("ev_ts"),
            "p_event",
            F.lit(None).cast("long").alias("err_event"),
        )
    )
    errors = e.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("long").alias("p_event"),
        F.col("event_id").alias("err_event"),
    )
    pooled = purchases.withColumn("side", F.lit(0)).unionByName(
        errors.withColumn("side", F.lit(1))
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side", "p_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ev_ts").desc(), F.col("side").desc(),
            F.col("p_event").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = (
        pooled.withColumn("b_event", F.last("p_event", True).over(wb))
        .withColumn(
            "b_ts",
            F.last(
                F.when(F.col("side") == 0, F.unix_micros("ev_ts")), True
            ).over(wb),
        )
        .withColumn("f_event", F.last("p_event", True).over(wf))
        .withColumn(
            "f_ts",
            F.last(
                F.when(F.col("side") == 0, F.unix_micros("ev_ts")), True
            ).over(wf),
        )
        .where(F.col("side") == 1)
    )
    ets = F.unix_micros("ev_ts")
    pick_back = F.col("b_event").isNotNull() & (
        F.col("f_event").isNull()
        | (ets - F.col("b_ts") <= F.col("f_ts") - ets)
    )
    return scanned.select(
        F.col("err_event").alias("event_id"),
        "user_id",
        F.when(pick_back, F.col("b_event"))
        .otherwise(F.col("f_event"))
        .alias("nearest_purchase_event"),
        F.when(pick_back, F.col("b_ts") - ets)
        .otherwise(F.col("f_ts") - ets)
        .cast("bigint")
        .alias("diff_us"),
    )
