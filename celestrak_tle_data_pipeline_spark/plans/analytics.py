"""Product-analytics operators over the events stream (SURVEY.md
§2.11): cohort retention and funnel conversion — the two workhorse
warehouse queries for behavioral data, expressed as pure DataFrame
plans and oracle-gated.

Determinism: everything here is counts, integer week arithmetic, and a
single final double division — exact in any engine at any
partitioning.
"""

from __future__ import annotations

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

    Plan: one scan → distinct (user, week) pairs (the only shuffle of
    raw-ish data, already deduplicated to at most users x weeks rows);
    cohorts derive from that same distinct set (no second scan); the
    matrix join is on user_id, co-partitioned with the distinct's own
    hash — AQE reuses the exchange. The tiny per-cohort sizes side is
    broadcast. Week arithmetic is integer days DIV 7 on Monday-anchored
    date_trunc, identical in both engines.
    """
    act = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("wk"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    mat = (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return mat.join(F.broadcast(sizes), "cohort_wk").select(
        "cohort_wk",
        "week_offset",
        "n_active",
        "cohort_n",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_n").cast("double")
        ).alias("retention"),
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

    Plan: the events scan feeds three stage aggregations; each stage
    joins the previous stage's per-user anchor (all stages are
    per-user aggregates, so every join is co-partitioned on user_id —
    one logical shuffle reused down the chain under AQE). Output is a
    single summary row; the division is one double op.
    """
    e = t(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.join(v, "user_id")
        .where(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_buy")))
    )
    return counts.select(
        "n_view",
        "n_view_click",
        "n_view_click_buy",
        (
            F.col("n_view_click_buy").cast("double")
            / F.col("n_view").cast("double")
        ).alias("conversion"),
    )
