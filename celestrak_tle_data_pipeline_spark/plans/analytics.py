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
