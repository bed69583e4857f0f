"""Product-analytics operators over the events stream (SURVEY.md
§2.11): cohort retention and funnel conversion — the two workhorse
warehouse queries for behavioral data, expressed as pure DataFrame
plans and oracle-gated.

Determinism: everything here is counts, integer week arithmetic, and a
single final double division — exact in any engine at any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import register
from .common import t


# --------------------------------------------------------------------------
# weekly cohort retention matrix
# --------------------------------------------------------------------------
@register(
    "cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id
    ), sizes AS (
        SELECT cohort_wk, COUNT(*) AS cohort_n FROM cohort GROUP BY 1
    ), mat AS (
        SELECT c.cohort_wk,
               CAST((a.wk - c.cohort_wk) // 7 AS BIGINT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM act a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2
    )
    SELECT m.cohort_wk, m.week_offset, m.n_active, s.cohort_n,
           m.n_active::DOUBLE / s.cohort_n::DOUBLE AS retention
    FROM mat m JOIN sizes s ON m.cohort_wk = s.cohort_wk
    """,
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-active week,
    tracked by distinct activity in each subsequent week — the
    triangle matrix every growth dashboard is built on.

    Plan — deliberately single-scan (the naive distinct + two
    self-joins shape scans events 3x and shuffles 6x; audited and
    rewritten): one groupBy(user_id) collapses each user to their
    distinct week set AND cohort week in the same shuffle
    (collect_set + min), explode rebuilds (user, week) rows already
    carrying the cohort, and the matrix aggregation shuffles only
    pre-collapsed rows. Cohort sizes need no extra branch: every user
    is active at offset 0, so cohort_n IS the offset-0 cell, read back
    with a window over the tiny matrix. Total: 1 scan, 1 full shuffle
    + 2 tiny ones, no join. Week arithmetic is integer days DIV 7 on
    Monday-anchored date_trunc, identical in both engines.
    """
    per_user = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("wk"),
        )
        .groupBy("user_id")
        .agg(
            F.collect_set("wk").alias("wks"),
            F.min("wk").alias("cohort_wk"),
        )
    )
    mat = (
        per_user.select(
            "user_id", "cohort_wk", F.explode("wks").alias("wk")
        )
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w = Window.partitionBy("cohort_wk")
    return mat.select(
        "cohort_wk",
        "week_offset",
        "n_active",
        F.max(
            F.when(F.col("week_offset") == 0, F.col("n_active"))
        ).over(w).alias("cohort_n"),
    ).withColumn(
        "retention",
        F.col("n_active").cast("double") / F.col("cohort_n").cast("double"),
    )


# --------------------------------------------------------------------------
# ordered funnel conversion
# --------------------------------------------------------------------------
@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_buy,
           (SELECT COUNT(*) FROM p)::DOUBLE
               / (SELECT COUNT(*) FROM v)::DOUBLE AS conversion
    """,
)
def funnel_conversion(spark, sf_dir):
    """Strictly-ordered funnel: view -> later click -> later purchase,
    each stage anchored at the user's FIRST qualifying event after the
    previous stage (the standard product-funnel semantics — a purchase
    before any view does not count).

    Plan — deliberately single-scan (the naive per-stage
    aggregate-and-join shape scans events 6x; audited and rewritten):
    the pushed ``event_type IN (view, click, purchase)`` filter feeds
    ONE shuffle on user_id, over which three chained window minima
    resolve the stage anchors in the same sorted partition (each
    stage's predicate references the previous stage's column — no
    joins, no recomputation); a per-user collapse and a singleton
    summary aggregate finish on already-tiny data. The division is one
    double op.
    """
    stages = ("view", "click", "purchase")
    e = t(spark, sf_dir, "events").where(F.col("event_type").isin(*stages))
    w = Window.partitionBy("user_id")
    with_view = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    with_click = with_view.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    with_buy = with_click.withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = with_buy.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_buy").alias("t_buy"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_buy").alias("n_view_click_buy"),
        (
            F.count("t_buy").cast("double") / F.count("t_view").cast("double")
        ).alias("conversion"),
    )


# --------------------------------------------------------------------------
# event transition matrix (Markov bigrams)
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), counts AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           n::DOUBLE / (SUM(n) OVER (PARTITION BY prev_type))::DOUBLE AS p
    FROM counts
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over each user's event
    sequence: count (prev -> next) bigrams, normalize per source state
    — the behavioral-model / anomalous-flow primitive.

    Plan: one scan, one shuffle on user_id for the lag window (total
    order: ts then event_id, so ties are deterministic), then a tiny
    5x5 aggregation and an in-partition window for the row
    normalization. The division is the only double op.
    """
    seq = t(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.withColumn(
        "p",
        F.col("n").cast("double")
        / F.sum("n").over(Window.partitionBy("prev_type")).cast("double"),
    )


# --------------------------------------------------------------------------
# gaps-and-islands -> SCD Type 2 state history
# --------------------------------------------------------------------------
@register(
    "scd2_state_history",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )
               - row_number() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS island
        FROM events WHERE user_id < 50
    ), runs AS (
        SELECT user_id, event_type, MIN(ts) AS valid_from,
               COUNT(*) AS n_events
        FROM seq GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from
           ) AS valid_to,
           LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from
           ) IS NULL AS is_current,
           n_events
    FROM runs
    """,
)
def scd2_state_history(spark, sf_dir):
    """Slowly-changing-dimension (type 2) state history built from an
    event log with the gaps-and-islands pattern: consecutive runs of
    the same event_type per user collapse to one versioned row with
    [valid_from, valid_to) effectivity and an is_current flag — the
    dimension-history build every warehouse needs, from nothing but
    window functions.

    Plan: one scan; the two row_numbers AND the run aggregation all
    partition by user_id (the second row_number's (user_id, event_type)
    partitioning is a subset sort, not a new exchange) — so the whole
    history builds on a single shuffle. Every ordering carries the
    (ts, event_id) total-order tiebreak; valid_from values within a
    user are distinct (min of disjoint runs), so the LEAD is
    deterministic too."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_state = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            (F.row_number().over(w_user) - F.row_number().over(w_state))
            .alias("island"),
        )
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_hist = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_hist).alias("valid_to"),
        F.lead("valid_from").over(w_hist).isNull().alias("is_current"),
        "n_events",
    )
