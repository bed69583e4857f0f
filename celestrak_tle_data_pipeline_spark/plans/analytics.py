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
from .common import dec, t


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


# --------------------------------------------------------------------------
# RFM segmentation — broadcast percentile cutoffs, not a global ntile
# --------------------------------------------------------------------------
@register(
    "rfm_segmentation",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey AS c_custkey,
               datediff('day', MAX(o_orderdate),
                        TIMESTAMP '2002-01-01') AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    cuts AS (
        SELECT quantile_cont(recency_days::DOUBLE, [0.25, 0.5, 0.75]) AS rc,
               quantile_cont(frequency::DOUBLE, [0.25, 0.5, 0.75]) AS fc,
               quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
        FROM per_cust
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           5 - (CASE WHEN recency_days <= rc[1] THEN 1
                     WHEN recency_days <= rc[2] THEN 2
                     WHEN recency_days <= rc[3] THEN 3 ELSE 4 END)
               AS r_score,
           CASE WHEN frequency <= fc[1] THEN 1
                WHEN frequency <= fc[2] THEN 2
                WHEN frequency <= fc[3] THEN 3 ELSE 4 END AS f_score,
           CASE WHEN monetary <= mc[1] THEN 1
                WHEN monetary <= mc[2] THEN 2
                WHEN monetary <= mc[3] THEN 3 ELSE 4 END AS m_score
    FROM per_cust, cuts
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM segmentation (X17): score every customer 1-4 on Recency /
    Frequency / Monetary quartiles — the classic CRM cut of a customer
    base.

    Plan — the 100 TB point of this query: quartiling is NOT done with
    ``ntile(4) OVER (ORDER BY metric)``, which Spark executes as a
    SINGLE-PARTITION window over the whole customer grain (the
    canonical driver-melting anti-pattern for global ranks). Instead
    the three cutoff triples come from Spark's DISTRIBUTED exact-
    `percentile` aggregate (partial digests per partition, one final
    row) broadcast-cross-joined back, and each score is a CASE
    comparison. The cutoff branch does re-aggregate orders (Catalyst
    doesn't reuse the exchange across the two consumers): two
    map-side-combined passes over three pruned columns — deliberately
    chosen over materializing the customer grain into one partition,
    which stops scaling first. Interpolated cutoffs over identical
    doubles match `quantile_cont` exactly; monetary is an exact
    decimal sum read as double."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(
                F.lit("2002-01-01").cast("timestamp"),
                F.max("o_orderdate"),
            ).alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    cuts = per_cust.agg(
        F.percentile(F.col("recency_days").cast("double"), qs).alias("rc"),
        F.percentile(F.col("frequency").cast("double"), qs).alias("fc"),
        F.percentile(F.col("monetary"), qs).alias("mc"),
    )

    def bucket(col, c):
        x = F.col(col).cast("double")
        return (
            F.when(x <= F.element_at(F.col(c), 1), 1)
            .when(x <= F.element_at(F.col(c), 2), 2)
            .when(x <= F.element_at(F.col(c), 3), 3)
            .otherwise(4)
        )

    return per_cust.crossJoin(F.broadcast(cuts)).select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(5) - bucket("recency_days", "rc")).alias("r_score"),
        bucket("frequency", "fc").alias("f_score"),
        bucket("monetary", "mc").alias("m_score"),
    )


# --------------------------------------------------------------------------
# lag-1 autocorrelation per user — exact-decimal moment sums
# --------------------------------------------------------------------------
@register(
    "autocorr_lag1_by_user",
    oracle="""
    WITH p AS (
        SELECT user_id,
               CAST(value AS DECIMAL(12,4)) AS x,
               CAST(lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS DECIMAL(12,4)) AS y
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sx2,
               CAST(SUM(y * y) AS DOUBLE) AS sy2
        FROM p WHERE y IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_pairs,
           (n_pairs * sxy - sx * sy)
           / sqrt((n_pairs * sx2 - sx * sx) * (n_pairs * sy2 - sy * sy))
               AS autocorr_lag1
    FROM m
    """,
)
def autocorr_lag1_by_user(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values (X17): Pearson r
    between consecutive observations — the burstiness/persistence
    screen for behavioral time series.

    Determinism: built-in corr() is a float aggregation whose result
    depends on shuffle arrival order. Here every moment (Σx, Σy, Σxy,
    Σx², Σy²) is an EXACT fixed-scale decimal sum, each cast to double
    once, and the Pearson formula is the same IEEE expression DAG in
    both engines — bit-identical at any partitioning. The lag pairing
    is pinned by the (ts, event_id) total order.

    Plan: one window exchange on user_id computes the lag, and the
    moments aggregate reuses that partitioning (no second shuffle of
    event rows)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.col("value").cast("decimal(12,4)")
    p = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            x.alias("x"),
            F.lag(x).over(w).alias("y"),
        )
        .where(F.col("y").isNotNull())
    )
    m = p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("sy2"),
    )
    n = F.col("n_pairs")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sx2") - F.col("sx") * F.col("sx"))
        * (n * F.col("sy2") - F.col("sy") * F.col("sy"))
    )
    return m.select("user_id", "n_pairs", r.alias("autocorr_lag1"))


# --------------------------------------------------------------------------
# X46: event-type co-occurrence mining (market-basket lite)
# --------------------------------------------------------------------------


@register(
    "event_cooccurrence_pairs",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    ORDER BY n_users DESC, type_a, type_b
    LIMIT 15
    """,
)
def event_cooccurrence_pairs(spark, sf_dir):
    """Pairwise co-occurrence mining (X46): for every unordered pair
    of event types, how many users performed both — the support
    counts behind market-basket / feature-co-usage analysis, and the
    first stage of association-rule mining.

    Shape: distinct (user, type) first (one shuffle — this also
    bounds the blow-up: a user contributes each type once no matter
    how many raw events), then a self-equi-join on user_id whose
    fan-out is quadratic only in the user's DISTINCT type count
    (bounded by the small event-type domain, not by event volume),
    the `a < b` predicate halves the pairs, and the pair rollup is
    map-side combined. Top-15 is totally ordered (count DESC, then
    both type names) so the cut is deterministic. Counts only —
    exact in any engine at any partitioning."""
    ut = t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(
        F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b")
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("type_a"), F.asc("type_b"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# rolling 7-day active users (sliding exact count-distinct)
# --------------------------------------------------------------------------
@register(
    "rolling_weekly_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    )
    SELECT ud.d - CAST(g.k AS INT) AS win_start,
           ud.d - CAST(g.k AS INT) + 7 AS win_end,
           CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
    FROM ud, LATERAL unnest(generate_series(0, 6)) AS g(k)
    GROUP BY 1, 2
    """,
)
def rolling_weekly_active_users(spark, sf_dir):
    """Rolling 7-day active users (WAU), hopping daily — the
    growth-dashboard headline metric, and the EXACT-distinct twin of
    ``sliding_weekly_value``'s additive rollup: distinct users cannot
    be summed across overlapping windows, so each (user, day) pair
    fans out to the 7 windows containing it and the count-distinct
    runs per window.

    Plan: the event stream collapses to distinct (user, day) FIRST —
    the 7x expansion happens on day-grain pairs, never on raw events —
    then one aggregation with a distinct on the bounded fan-out. At
    100 TB the same plan holds because |users|x|days| is orders of
    magnitude below event count; the approximate path swaps the exact
    distinct for per-window HLL sketches merged across days
    (approx_distinct_hll certifies those error bounds).
    """
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    return (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            "d",
        )
        .select(
            "user_id",
            F.date_sub("d", F.col("k")).alias("win_start"),
        )
        .groupBy("win_start")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
        .select(
            "win_start",
            F.date_add("win_start", 7).alias("win_end"),
            "wau",
        )
    )


# --------------------------------------------------------------------------
# week-over-week growth rate
# --------------------------------------------------------------------------
@register(
    "weekly_growth_rate",
    oracle="""
    WITH wk AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               SUM(CAST(value AS DECIMAL(18,6))) AS sv,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT week, n_events,
           CAST(sv AS DOUBLE) AS total_value,
           CAST(LAG(sv) OVER (ORDER BY week) AS DOUBLE) AS prev_value,
           CAST(sv - LAG(sv) OVER (ORDER BY week) AS DOUBLE)
               / CAST(LAG(sv) OVER (ORDER BY week) AS DOUBLE) AS wow_growth
    FROM wk
    """,
)
def weekly_growth_rate(spark, sf_dir):
    """Week-over-week growth of total event value — the trend line
    beside the WAU level metric. The delta is computed in DECIMAL
    (exact subtraction of exact sums) and only the final growth ratio
    is a double division, so the value is bit-identical in both
    engines; the first week's growth is NULL by lag semantics.

    ISO weeks via ``date_trunc('week')`` — Monday start in Spark and
    DuckDB alike (same convention cohort_retention relies on). The
    ordering window runs over one row per week — single-partition by
    construction and trivially safe at any scale (a century is ~5,200
    rows).
    """
    e = t(spark, sf_dir, "events")
    wk = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(
        F.sum(dec("value", 18, 6)).alias("sv"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w = Window.orderBy("week")
    prev = F.lag("sv").over(w)
    return wk.select(
        "week",
        "n_events",
        F.col("sv").cast("double").alias("total_value"),
        prev.cast("double").alias("prev_value"),
        ((F.col("sv") - prev).cast("double") / prev.cast("double")).alias(
            "wow_growth"
        ),
    )


# --------------------------------------------------------------------------
# first/last-touch marketing attribution
# --------------------------------------------------------------------------
@register(
    "attribution_first_last_touch",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, event_type, value,
               FIRST_VALUE(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS first_touch,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_touch
        FROM events
    )
    SELECT first_touch, last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS attributed_value
    FROM e
    WHERE event_type = 'purchase'
      AND first_touch IS NOT NULL AND last_touch IS NOT NULL
    GROUP BY 1, 2
    """,
)
def attribution_first_last_touch(spark, sf_dir):
    """First-touch / last-touch purchase attribution: every purchase is
    credited to the earliest and the most recent non-purchase
    interaction that PRECEDES it in the user's (ts, event_id)-ordered
    stream — the two classic single-touch marketing attribution models,
    reported as a (first_touch, last_touch) matrix with purchase counts
    and exact-decimal attributed value.

    Both touches come from ONE window pass (first/last with
    ignorenulls over the strictly-preceding frame), so the plan is a
    single scan + one user-keyed window shuffle — no self-join against
    the interaction history, which is the naive formulation that
    re-shuffles the event stream per touch model. Purchases with no
    preceding interaction drop out (both engines).
    """
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    enriched = e.select(
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        enriched.where(
            (F.col("event_type") == "purchase")
            & F.col("first_touch").isNotNull()
            & F.col("last_touch").isNotNull()
        )
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(dec("value", 18, 6))
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --------------------------------------------------------------------------
# share-of-parent contribution rollup
# --------------------------------------------------------------------------
@register(
    "share_of_parent_rollup",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS nrev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(nrev AS DOUBLE) AS nation_rev,
           CAST(SUM(nrev) OVER (PARTITION BY region) AS DOUBLE)
               AS region_rev,
           CAST(nrev AS DOUBLE)
               / CAST(SUM(nrev) OVER (PARTITION BY region) AS DOUBLE)
               AS share_of_region
    FROM rev
    """,
)
def share_of_parent_rollup(spark, sf_dir):
    """Share-of-parent contribution: each nation's revenue as a
    fraction of its region's total — the drill-down decoration every
    OLAP hierarchy view carries (percent-of-parent), computed WITHOUT a
    second aggregation-and-rejoin: the parent total rides a window over
    the child rollup rows.

    Revenue sums are exact decimals at every level (the region total
    is a window SUM over already-exact nation decimals, so child/parent
    are consistent by construction — no double-rounding drift between
    levels); the share is the single terminal division. Plan: fact
    scans once, dims broadcast, one aggregation shuffle to nation
    grain, one 25-row window.
    """
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(dec("o_totalprice", 18, 4)).alias("nrev"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.col("nrev").cast("double").alias("nation_rev"),
        F.sum("nrev").over(w).cast("double").alias("region_rev"),
        (
            F.col("nrev").cast("double")
            / F.sum("nrev").over(w).cast("double")
        ).alias("share_of_region"),
    )


# --------------------------------------------------------------------------
# rolling weekly exact median
# --------------------------------------------------------------------------
@register(
    "rolling_weekly_median",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS dv
        FROM events GROUP BY 1
    )
    SELECT daily.d - CAST(g.k AS INT) AS win_start,
           daily.d - CAST(g.k AS INT) + 7 AS win_end,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           median(dv) AS median_daily_value
    FROM daily, LATERAL unnest(generate_series(0, 6)) AS g(k)
    GROUP BY 1, 2
    """,
)
def rolling_weekly_median(spark, sf_dir):
    """Exact rolling 7-day median of daily value — the robust-center
    twin of ``sliding_weekly_value``'s additive total. Medians are not
    mergeable across overlapping windows, so (like the WAU
    count-distinct) each day fans out to the 7 hopping windows
    containing it and an exact ``percentile(0.5)`` runs per window over
    at most 7 day-grain values.

    Inputs to the median are exact (decimal day sums cast once to
    double), and Spark's ``percentile`` uses the same linear
    interpolation as DuckDB's ``median``/``quantile_cont`` (the
    equivalence ``percentile_quartiles`` already certifies), so the
    midpoint average of two exact doubles is bit-stable. Plan: one
    event->day shuffle, then a 7x fan-out on day-grain rows only.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(dec("value", 18, 6)).cast("double").alias("dv"))
    return (
        daily.select(
            "dv", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d"
        )
        .select("dv", F.date_sub("d", F.col("k")).alias("win_start"))
        .groupBy("win_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr("percentile(dv, 0.5d)").alias("median_daily_value"),
        )
        .select(
            "win_start",
            F.date_add("win_start", 7).alias("win_end"),
            "n_days",
            "median_daily_value",
        )
    )


# --------------------------------------------------------------------------
# cohort cumulative LTV curve
# --------------------------------------------------------------------------
@register(
    "cohort_cumulative_ltv",
    oracle="""
    WITH uw AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events GROUP BY 1, 2
    ),
    coh AS (
        SELECT user_id, wk, rev,
               MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
        FROM uw
    ),
    mat AS (
        SELECT cohort_wk,
               CAST((wk - cohort_wk) // 7 AS BIGINT) AS week_offset,
               SUM(rev) AS wk_rev,
               COUNT(DISTINCT user_id) AS n_active
        FROM coh GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_wk, week_offset, n_active,
               SUM(wk_rev) OVER (
                   PARTITION BY cohort_wk ORDER BY week_offset
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_rev,
               MAX(CASE WHEN week_offset = 0 THEN n_active END) OVER (
                   PARTITION BY cohort_wk
               ) AS cohort_n
        FROM mat
    )
    SELECT cohort_wk, week_offset,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_n AS BIGINT) AS cohort_n,
           CAST(cum_rev AS DOUBLE) AS cum_revenue,
           CAST(cum_rev AS DOUBLE) / CAST(cohort_n AS DOUBLE)
               AS ltv_per_user
    FROM cum
    """,
)
def cohort_cumulative_ltv(spark, sf_dir):
    """Cumulative lifetime-value curve per weekly cohort: for each
    cohort and week offset, total revenue accumulated since the cohort
    week divided by cohort size — the payback-period view grafted onto
    the retention triangle (``cohort_retention``).

    Revenue stays DECIMAL through the per-week rollup AND the running
    cumulative (exact at every prefix; only the per-user ratio at the
    end is a double division). Cohort size needs no extra scan: every
    user is active at offset 0, so the offset-0 row carries it, read
    back with a window over the tiny matrix — same trick as the
    retention query. Plan: one event->user-week shuffle, a user window,
    the matrix aggregation, then windows over matrix-grain rows.
    """
    e = t(spark, sf_dir, "events")
    uw = e.groupBy(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).agg(F.sum(dec("value", 18, 6)).alias("rev"))
    coh = uw.withColumn(
        "cohort_wk", F.min("wk").over(Window.partitionBy("user_id"))
    )
    mat = coh.groupBy(
        "cohort_wk",
        (F.datediff("wk", "cohort_wk") / 7).cast("bigint").alias(
            "week_offset"
        ),
    ).agg(
        F.sum("rev").alias("wk_rev"),
        F.count_distinct("user_id").alias("n_active"),
    )
    wc = Window.partitionBy("cohort_wk")
    wcum = wc.orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = mat.select(
        "cohort_wk",
        "week_offset",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.max(
            F.when(F.col("week_offset") == 0, F.col("n_active"))
        ).over(wc).cast("bigint").alias("cohort_n"),
        F.sum("wk_rev").over(wcum).cast("double").alias("cum_revenue"),
    )
    return cum.withColumn(
        "ltv_per_user",
        F.col("cum_revenue") / F.col("cohort_n").cast("double"),
    )


# --------------------------------------------------------------------------
# time-bounded funnel (conversion deadlines per stage)
# --------------------------------------------------------------------------
@register(
    "funnel_time_bounded",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 7 DAY
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 7 DAY
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_7d,
           (SELECT COUNT(*) FROM p) AS n_buy_7d,
           (SELECT COUNT(*) FROM p)::DOUBLE
               / (SELECT COUNT(*) FROM v)::DOUBLE AS bounded_conversion
    """,
)
def funnel_time_bounded(spark, sf_dir):
    """Deadline funnel: view -> click within 7 days -> purchase within
    7 days of the click. The unbounded funnel (``funnel_conversion``)
    overcounts conversions that took months; product teams report the
    time-boxed variant, and the deadline is what lets a STREAMING
    funnel expire its state (the watermark horizon = the stage
    deadline — this batch query is that streaming job's exact twin).

    Same single-scan shape as the unbounded funnel: one pushed
    event-type filter, one user_id shuffle, chained window minima whose
    stage predicates add the upper bound (integer-microsecond interval
    arithmetic, identical in both engines), then a per-user collapse
    and singleton summary.
    """
    stages = ("view", "click", "purchase")
    e = t(spark, sf_dir, "events").where(F.col("event_type").isin(*stages))
    w = Window.partitionBy("user_id")
    bound = F.expr("INTERVAL 7 DAYS")
    with_view = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    with_click = with_view.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + bound),
                F.col("ts"),
            )
        ).over(w),
    )
    with_buy = with_click.withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + bound),
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
        F.count("t_click").alias("n_click_7d"),
        F.count("t_buy").alias("n_buy_7d"),
        (
            F.count("t_buy").cast("double") / F.count("t_view").cast("double")
        ).alias("bounded_conversion"),
    )


# --------------------------------------------------------------------------
# clickstream path mining (top 3-step paths per session)
# --------------------------------------------------------------------------
@register(
    "session_path_analysis",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL 30 MINUTE
                 OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    grouped AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    seqs AS (
        SELECT user_id, session_id,
               list(event_type ORDER BY ts, event_id) AS seq
        FROM grouped GROUP BY 1, 2
    ),
    paths AS (
        SELECT UNNEST(CASE WHEN len(seq) >= 3 THEN
                   list_transform(generate_series(1, len(seq) - 2),
                                  i -> array_to_string(seq[i:i+2], '>'))
               ELSE [] END) AS path
        FROM seqs
    ),
    counted AS (
        SELECT path, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rn
        FROM paths GROUP BY path
    )
    SELECT path, CAST(n AS BIGINT) AS n_occurrences
    FROM counted WHERE rn <= 10
    """,
)
def session_path_analysis(spark, sf_dir):
    """Clickstream path mining: the 10 most common 3-step event-type
    sequences WITHIN a session (30-minute-gap sessionization, same rule
    as ``session_windows``) — the "what do users actually do"
    exploration query behind every product-flow diagram.

    Each session collapses to its time-ordered event-type sequence in
    ONE aggregation (sort_array of (ts, event_id, type) structs — the
    shuffle-stable way to get an ordered list without a second window
    pass), 3-gram paths explode from session-grain rows only, and the
    path rollup + total-ordered top-10 run on the tiny path domain.
    Paths never cross a session boundary by construction — the gram
    window slides inside each session's sequence, which is what
    separates this from a naive global 3-gram over the event stream.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        (
            prev.isNull()
            # integer-µs compare == the oracle's ``> INTERVAL 30 MINUTE``
            # exactly; a second-truncated cast("long") diff disagrees with
            # the interval semantics for gaps inside [1800s, 1801s).
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                > 30 * 60 * 1_000_000
            )
        )
        .cast("int")
        .alias("new_session"),
    )
    grouped = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seqs = grouped.groupBy("user_id", "session_id").agg(
        F.expr(
            "transform(sort_array(collect_list("
            "  struct(ts, event_id, event_type))),"
            " x -> x.event_type)"
        ).alias("seq")
    )
    paths = seqs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(seq) >= 3 THEN "
                "  transform(sequence(1, size(seq) - 2),"
                "            i -> concat_ws('>', slice(seq, i, 3))) "
                "ELSE array() END"
            )
        ).alias("path")
    )
    # total-ordered top-10 via orderBy().limit() → TakeOrderedAndProject
    # (per-partition heaps, k-row merge) — no single-partition window
    # exchange over the path domain
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
        .select("path", F.col("n").cast("bigint").alias("n_occurrences"))
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve (censored session durations)
# --------------------------------------------------------------------------
@register(
    "kaplan_meier_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL 30 MINUTE
                 OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    grouped AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    bounds AS (SELECT MAX(ts) AS mx FROM events),
    sessions AS (
        SELECT date_diff('minute', MIN(ts), MAX(ts)) AS dur,
               MAX(ts) <= (SELECT mx FROM bounds) - INTERVAL 30 MINUTE
                   AS completed
        FROM grouped GROUP BY user_id, session_id
    ),
    by_dur AS (
        SELECT dur,
               SUM(CASE WHEN completed THEN 1 ELSE 0 END) AS d_events,
               COUNT(*) AS n_ending
        FROM sessions GROUP BY dur
    ),
    risk AS (
        SELECT dur, d_events,
               SUM(n_ending) OVER (
                   ORDER BY dur DESC ROWS UNBOUNDED PRECEDING
               ) AS n_at_risk
        FROM by_dur
    ),
    km AS (
        -- d_events = n_at_risk only at the maximal duration (everyone
        -- left dies there): survival is exactly 0, and ln is guarded
        SELECT dur, d_events, n_at_risk,
               SUM(CASE WHEN d_events < n_at_risk
                        THEN ln(1.0 - d_events / CAST(n_at_risk AS DOUBLE))
                        ELSE 0.0 END) OVER (
                   ORDER BY dur ROWS UNBOUNDED PRECEDING
               ) AS log_s
        FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS duration_min,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CASE WHEN d_events = n_at_risk THEN 0.0
                ELSE round(exp(log_s), 9) END AS survival
    FROM km WHERE d_events > 0
    """,
)
def kaplan_meier_sessions(spark, sf_dir):
    """Kaplan-Meier survival estimator over SESSION durations — the
    censoring-aware answer to "what fraction of sessions last past
    minute d" (a plain duration histogram is biased: sessions still
    open at the corpus high-water mark have unknown true length and
    must be CENSORED, not counted as ended): a session whose last
    event sits within 30 minutes of the corpus end could still be
    running, so it enters the at-risk counts but never the death
    counts. S(d) = Π_{d'<=d} (1 − deaths(d')/at_risk(d')), the
    product-limit estimator.

    Determinism: the 30-min sessionization is the session_windows
    lag/cumsum rule (same oracle CTE); durations are integer
    minute-boundary counts (date_diff('minute') ≡ µs DIV truncation
    on minute-aligned diffs — both engines integer); deaths/at-risk
    are exact integers (reverse-cumulative window over the day-grain
    rollup); the product is exp of a cumulative ln sum in the SAME
    ascending order in both engines, rounded to 9. Plan: one
    user-keyed session shuffle, a session-grain rollup, then two
    windows over the tiny duration domain."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    flagged = e.select(
        "user_id",
        "ts",
        (
            prev.isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                > 30 * 60 * 1_000_000
            )
        )
        .cast("int")
        .alias("new_session"),
    )
    grouped = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bounds = e.agg(F.max("ts").alias("mx"))
    sessions = (
        grouped.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts"))
        .crossJoin(F.broadcast(bounds))
        .select(
            (
                F.unix_micros(F.date_trunc("minute", "e_ts"))
                - F.unix_micros(F.date_trunc("minute", "s_ts"))
            )
            .cast("long")
            .alias("us_dur"),
            (
                F.col("e_ts") <= F.col("mx") - F.expr("INTERVAL 30 MINUTES")
            ).alias("completed"),
        )
        .select(
            (F.col("us_dur") / 60_000_000).cast("long").alias("dur"),
            "completed",
        )
    )
    by_dur = sessions.groupBy("dur").agg(
        F.sum(F.when(F.col("completed"), 1).otherwise(0)).alias("d_events"),
        F.count(F.lit(1)).alias("n_ending"),
    )
    w_desc = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = by_dur.withColumn("n_at_risk", F.sum("n_ending").over(w_desc))
    w_asc = (
        Window.orderBy(F.col("dur").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    km = risk.withColumn(
        "log_s",
        F.sum(
            F.when(
                F.col("d_events") < F.col("n_at_risk"),
                F.log(
                    F.lit(1.0)
                    - F.col("d_events") / F.col("n_at_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0))
        ).over(w_asc),
    )
    return km.where(F.col("d_events") > 0).select(
        F.col("dur").cast("bigint").alias("duration_min"),
        F.col("n_at_risk").cast("bigint"),
        F.col("d_events").cast("bigint"),
        F.when(F.col("d_events") == F.col("n_at_risk"), F.lit(0.0))
        .otherwise(F.round(F.exp("log_s"), 9))
        .alias("survival"),
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time (AS OF) lookup
# --------------------------------------------------------------------------
@register(
    "scd2_asof_lookup",
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
    ), hist AS (
        SELECT user_id, event_type, valid_from, n_events,
               LEAD(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from
               ) AS valid_to
        FROM runs
    ), pit AS (
        SELECT MIN(epoch_us(ts))
               + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS t_us
        FROM events WHERE user_id < 50
    )
    SELECT h.user_id, h.event_type AS state_at_t,
           h.valid_from, h.valid_to,
           CAST(h.n_events AS BIGINT) AS n_events
    FROM hist h, pit
    WHERE epoch_us(h.valid_from) <= pit.t_us
      AND (h.valid_to IS NULL OR epoch_us(h.valid_to) > pit.t_us)
    """,
)
def scd2_asof_lookup(spark, sf_dir):
    """Point-in-time (AS OF) read over the SCD2 history — the query
    side of the temporal table ``scd2_state_history`` builds: each
    user's effective state row at time T, selected by the half-open
    effectivity predicate ``valid_from <= T < valid_to`` (open-ended
    current rows via NULL valid_to). T is derived from the data
    itself — the integer-µs midpoint of the observed window — so the
    lookup is deterministic under any regenerated corpus, and exactly
    one row per user qualifies by construction (effectivity intervals
    partition each user's timeline).

    Plan: the history build is the single-shuffle gaps-and-islands
    DAG; the AS OF selection is a map-side predicate against a
    broadcast one-row bound — at 100 TB this is the query you answer
    from the MATERIALIZED history table with partition pruning on
    valid_from, never by rebuilding history."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_state = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_user) - F.row_number().over(w_state)).alias(
            "island"
        ),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_hist = Window.partitionBy("user_id").orderBy("valid_from")
    hist = runs.select(
        "user_id",
        "event_type",
        "valid_from",
        "n_events",
        F.lead("valid_from").over(w_hist).alias("valid_to"),
    )
    pit = e.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2
            )
        ).alias("t_us")
    )
    return (
        hist.crossJoin(F.broadcast(pit))
        .where(
            (F.unix_micros("valid_from") <= F.col("t_us"))
            & (
                F.col("valid_to").isNull()
                | (F.unix_micros("valid_to") > F.col("t_us"))
            )
        )
        .select(
            "user_id",
            F.col("event_type").alias("state_at_t"),
            "valid_from",
            "valid_to",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# cumulative distinct users (all-time reach curve)
# --------------------------------------------------------------------------
@register(
    "cumulative_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    fs AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY 1),
    nu AS (SELECT first_d AS d, COUNT(*) AS new_users FROM fs GROUP BY 1),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1)
    SELECT dau.d,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY dau.d)
                AS BIGINT) AS cum_users
    FROM dau LEFT JOIN nu ON dau.d = nu.d
    """,
)
def cumulative_distinct_users(spark, sf_dir):
    """All-time reach curve: per day, the active users (DAU), the
    users seen for the FIRST time, and the cumulative distinct user
    count — the growth chart every product review opens with. A
    running COUNT(DISTINCT) is not windowable directly; the standard
    exact rewrite counts each user once at their first-seen day and
    cumulative-sums those first-seen counts, which this implements.

    Plan: events collapse to distinct (user, day), then to user-grain
    first-seen days (the two data-sized shuffles, both partial-
    aggregated); the left join and running sum operate on the DAY-grain
    frame, whose size is the calendar span (bounded domain — ~10^4 rows
    after 30 years), so the unpartitioned cumulative window is a
    constant, not a scale risk."""
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    fs = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    nu = fs.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    joined = dau.join(F.broadcast(nu), "d", "left").select(
        "d",
        F.col("dau").cast("bigint").alias("dau"),
        F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return joined.withColumn(
        "cum_users", F.sum("new_users").over(w).cast("bigint")
    )


# --------------------------------------------------------------------------
# seasonal-naive forecast baseline with MASE
# --------------------------------------------------------------------------
@register(
    "seasonal_naive_mase",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT abs(a.v - b.v) AS e
        FROM daily a JOIN daily b ON a.d = b.d + 7
    ),
    n1 AS (
        SELECT abs(a.v - b.v) AS e
        FROM daily a JOIN daily b ON a.d = b.d + 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_forecast_days,
           round(CAST((SELECT SUM(e) FROM s) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s), 6) AS mae_seasonal,
           round(CAST((SELECT SUM(e) FROM n1) AS DOUBLE)
                 / (SELECT COUNT(*) FROM n1), 6) AS mae_naive1,
           round((CAST((SELECT SUM(e) FROM s) AS DOUBLE)
                  / (SELECT COUNT(*) FROM s))
                 / (CAST((SELECT SUM(e) FROM n1) AS DOUBLE)
                    / (SELECT COUNT(*) FROM n1)), 6) AS mase
    """,
)
def seasonal_naive_mase(spark, sf_dir):
    """Seasonal-naive forecast baseline with MASE (mean absolute
    scaled error, Hyndman & Koehler 2006): forecast each day's total
    value with the value seven days earlier, and scale its MAE by the
    one-step-naive MAE — MASE < 1 means weekly seasonality genuinely
    predicts (the bar any real forecasting model must clear before
    replacing the naive baseline; ``seasonal_dow_decompose`` measures
    the same structure, this scores it as a forecaster).

    Both lags are CALENDAR joins (d = d-7 / d = d-1), not row lags, so
    missing days cannot silently misalign the season. Daily totals and
    absolute errors are DECIMAL-exact; each MAE is one terminal
    division. Plan: one event->day rollup (the only data-sized
    shuffle), then self-joins and scalar rollups on the
    calendar-bounded day frame."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(dec("value", 18, 2)).alias("v"))
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(
        F.broadcast(b), F.col("a.d") == F.date_add(F.col("b.d"), 7)
    ).select(F.abs(F.col("a.v") - F.col("b.v")).alias("e"))
    n1 = a.join(
        F.broadcast(b), F.col("a.d") == F.date_add(F.col("b.d"), 1)
    ).select(F.abs(F.col("a.v") - F.col("b.v")).alias("e"))
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ss = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_forecast_days"),
        F.sum("e").cast("double").alias("se7"),
    )
    s1 = n1.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("e").cast("double").alias("se1"),
    )
    out = nd.crossJoin(F.broadcast(ss)).crossJoin(F.broadcast(s1))
    mae7 = F.col("se7") / F.col("n_forecast_days")
    mae1 = F.col("se1") / F.col("n1")
    return out.select(
        "n_days",
        "n_forecast_days",
        F.round(mae7, 6).alias("mae_seasonal"),
        F.round(mae1, 6).alias("mae_naive1"),
        F.round(mae7 / mae1, 6).alias("mase"),
    )


# --------------------------------------------------------------------------
# per-user running-peak drawdown
# --------------------------------------------------------------------------
@register(
    "user_value_drawdown",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, ts,
               SUM(CASE WHEN event_type IN ('purchase', 'signup')
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE -CAST(value AS DECIMAL(18,2)) END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM events
    ),
    p AS (
        SELECT user_id, cum,
               MAX(cum) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS peak
        FROM c
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(cum) AS DOUBLE) AS peak_value,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown
    FROM p GROUP BY user_id
    """,
)
def user_value_drawdown(spark, sf_dir):
    """Running-peak drawdown per user: cumulative value over the
    user's event sequence, its running maximum, and the largest
    peak-to-trough drop — the engagement-collapse detector (finance's
    max-drawdown applied to activity curves): a user whose drawdown
    approaches their peak effectively restarted from zero, the signal
    churn models key on. The series is SIGNED engagement: purchases
    and signups add value, friction events (clicks, views, errors)
    subtract it, so peaks and troughs genuinely alternate.

    BOTH windows order by (ts, event_id) — the same total order the
    cumulative series is built in, so the running peak is the true
    time-ordered peak regardless of how event ids were assigned (an
    event_id-alone ordering would only coincide if ids happened to be
    ts-monotone per user — the r6 advisor's silent-semantics hazard).
    All arithmetic is DECIMAL-exact end to end; the
    DOUBLE casts at output are exact decimal→double conversions.
    Plan: both windows and the final rollup share ONE user-keyed
    shuffle (same partition key), no single-partition exchange."""
    e = t(spark, sf_dir, "events")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signed = F.when(
        F.col("event_type").isin("purchase", "signup"), dec("value", 18, 2)
    ).otherwise(-dec("value", 18, 2))
    c = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(signed).over(w_cum).alias("cum"),
    )
    w_peak = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = c.select(
        "user_id", "cum", F.max("cum").over(w_peak).alias("peak")
    )
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("cum").cast("double").alias("peak_value"),
        F.max(F.col("peak") - F.col("cum"))
        .cast("double")
        .alias("max_drawdown"),
    )


# --------------------------------------------------------------------------
# quantile treatment effects (distributional A/B readout)
# --------------------------------------------------------------------------
@register(
    "quantile_treatment_effect",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (user_id * 2654435761) % 4294967296 % 2 AS arm,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tv
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT arm,
               COUNT(*) AS n,
               quantile_cont(tv, 0.25) AS q25,
               median(tv) AS med,
               quantile_cont(tv, 0.75) AS q75
        FROM per_user GROUP BY arm
    )
    SELECT CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_treat,
           CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_ctrl,
           MAX(CASE WHEN arm = 1 THEN med END) AS med_treat,
           MAX(CASE WHEN arm = 0 THEN med END) AS med_ctrl,
           MAX(CASE WHEN arm = 1 THEN q25 END)
               - MAX(CASE WHEN arm = 0 THEN q25 END) AS qte_25,
           MAX(CASE WHEN arm = 1 THEN med END)
               - MAX(CASE WHEN arm = 0 THEN med END) AS qte_50,
           MAX(CASE WHEN arm = 1 THEN q75 END)
               - MAX(CASE WHEN arm = 0 THEN q75 END) AS qte_75
    FROM a
    """,
)
def quantile_treatment_effect(spark, sf_dir):
    """Quantile treatment effects: the difference between treatment
    and control at the 25th/50th/75th percentile of per-user total
    value — the distributional A/B readout that catches what a mean
    difference hides (a feature that moves only the whales shows
    qte_75 >> qte_50 ≈ 0). Same Knuth-hash arms as
    ``ab_experiment_readout``; per-user totals are DECIMAL-exact then
    cast once, and Spark's exact ``percentile`` matches DuckDB's
    quantile_cont bit-for-bit on the identical multiset (the
    percentile_quartiles contract).

    Plan: one user-grain shuffle, then a 2-group exact-percentile
    aggregation (sort within aggregation buffers — the documented
    exact path; heavy-group scale swaps in percentile_approx) and a
    2-row pivot."""
    from .ext_pipeline import _KNUTH, _M32

    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(dec("value", 18, 2)).cast("double").alias("tv")
    ).select(
        ((F.col("user_id").cast("decimal(38,0)") * _KNUTH) % _M32 % 2)
        .cast("bigint")
        .alias("arm"),
        "tv",
    )
    a = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(tv, 0.25)").alias("q25"),
        F.median("tv").alias("med"),
        F.expr("percentile(tv, 0.75)").alias("q75"),
    )
    g = lambda arm, col: F.max(F.when(F.col("arm") == arm, F.col(col)))
    return a.agg(
        g(1, "n").cast("bigint").alias("n_treat"),
        g(0, "n").cast("bigint").alias("n_ctrl"),
        g(1, "med").alias("med_treat"),
        g(0, "med").alias("med_ctrl"),
        (g(1, "q25") - g(0, "q25")).alias("qte_25"),
        (g(1, "med") - g(0, "med")).alias("qte_50"),
        (g(1, "q75") - g(0, "q75")).alias("qte_75"),
    )


# --------------------------------------------------------------------------
# association rules over order baskets (support / confidence / lift)
# --------------------------------------------------------------------------
@register(
    "association_rules_parts",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
        FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
          FROM basket),
    item_c AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM basket GROUP BY 1
    ),
    pair_c AS (
        SELECT a.item AS pa, b.item AS pb,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM basket a JOIN basket b
          ON a.ok = b.ok AND a.item < b.item
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT pa, pb, c_ab,
           ia.c AS c_a, ib.c AS c_b,
           round(c_ab / CAST(n.n_orders AS DOUBLE), 9) AS support,
           round(c_ab / CAST(ia.c AS DOUBLE), 9) AS confidence,
           round(c_ab * CAST(n.n_orders AS DOUBLE) / (ia.c * ib.c), 6)
               AS lift
    FROM pair_c
    JOIN item_c ia ON ia.item = pa
    JOIN item_c ib ON ib.item = pb
    CROSS JOIN n
    ORDER BY c_ab DESC, lift DESC, pa, pb
    LIMIT 100
    """,
)
def association_rules_parts(spark, sf_dir):
    """Market-basket association rules over order baskets: for part
    pairs bought together in at least 2 orders, support (P(a,b)),
    confidence (P(b|a)), and lift (P(a,b)/(P(a)P(b)) — the
    independence-normalized strength a recommender thresholds on).
    Top-100 strongest rules, ranked by co-count then lift with full
    key tiebreaks.

    Scale shape — the reason basket mining is tractable at 100 TB:
    the pair join is WITHIN-basket (equi-join on the order key), so
    each basket of size k contributes C(k,2) pairs — TPC-H baskets cap
    at 7 lines, bounding the blow-up at 21x order count, linear
    overall (same bounded-fan-out argument as
    ``item_cooccurrence_cosine``'s top-50 cap). Counts are exact
    integers; support/confidence/lift are terminal divisions; the
    final ranking compiles to TakeOrderedAndProject."""
    l = t(spark, sf_dir, "lineitem")
    basket = l.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    n = basket.agg(
        F.countDistinct("ok").cast("bigint").alias("n_orders")
    )
    item_c = basket.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pair_c = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("pa"), F.col("b.item").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .where(F.col("c_ab") >= 2)
    )
    ia = item_c.select(
        F.col("item").alias("pa"), F.col("c").alias("c_a")
    )
    ib = item_c.select(
        F.col("item").alias("pb"), F.col("c").alias("c_b")
    )
    out = (
        pair_c.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n))
    )
    return (
        out.select(
            "pa",
            "pb",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.col("c_ab") / F.col("n_orders").cast("double"), 9
            ).alias("support"),
            F.round(
                F.col("c_ab") / F.col("c_a").cast("double"), 9
            ).alias("confidence"),
            F.round(
                F.col("c_ab")
                * F.col("n_orders").cast("double")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.desc("c_ab"), F.desc("lift"), F.asc("pa"), F.asc("pb")
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# signup -> purchase conversion latency quartiles
# --------------------------------------------------------------------------
@register(
    "time_to_convert_quartiles",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
        GROUP BY e.user_id
    ),
    d AS (
        SELECT p.user_id, p.p_us - s.s_us AS delta_us
        FROM p JOIN s ON p.user_id = s.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signups,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           round(COUNT(*) / CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 6)
               AS conversion_rate,
           round(quantile_cont(delta_us, 0.25) / 3600e6, 6) AS q1_hours,
           round(median(delta_us) / 3600e6, 6) AS med_hours,
           round(quantile_cont(delta_us, 0.75) / 3600e6, 6) AS q3_hours
    FROM d
    """,
)
def time_to_convert_quartiles(spark, sf_dir):
    """Signup-to-first-purchase latency distribution: for each user
    who purchased at or after their first signup, the integer-µs
    delta between first signup and first subsequent purchase;
    reported as exact quartiles in hours plus the conversion rate —
    the activation-speed readout growth teams track next to the
    funnel (median answers "how long does activation take?", the IQR
    answers "how variable?").

    Deltas are exact integer microseconds; exact percentile matches
    quantile_cont bit-for-bit on the identical multiset; each output
    is one terminal division. Plan: two user-grain min-aggregations
    (signups, then purchases gated to >= the user's signup via one
    broadcast-joined bound) and a scalar quartile rollup."""
    e = t(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.unix_micros("ts") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    d = p.join(s, "user_id").select(
        (F.col("p_us") - F.col("s_us")).alias("delta_us")
    )
    ns = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_signups"))
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.expr("percentile(delta_us, 0.25)").alias("q1"),
        F.median("delta_us").alias("med"),
        F.expr("percentile(delta_us, 0.75)").alias("q3"),
    )
    out = ns.crossJoin(F.broadcast(agg))
    return out.select(
        "n_signups",
        "n_converted",
        F.round(
            F.col("n_converted") / F.col("n_signups").cast("double"), 6
        ).alias("conversion_rate"),
        F.round(F.col("q1") / F.lit(3600e6), 6).alias("q1_hours"),
        F.round(F.col("med") / F.lit(3600e6), 6).alias("med_hours"),
        F.round(F.col("q3") / F.lit(3600e6), 6).alias("q3_hours"),
    )


# --------------------------------------------------------------------------
# linear multi-touch attribution
# --------------------------------------------------------------------------
@register(
    "attribution_linear_touch",
    oracle="""
    WITH conv AS (
        SELECT event_id AS conv_id, user_id, ts AS c_ts,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, ts AS t_ts, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ),
    touched AS (
        SELECT c.conv_id, c.v, t.event_type
        FROM conv c JOIN touch t
          ON c.user_id = t.user_id
         AND t.t_ts <= c.c_ts
         AND t.t_ts > c.c_ts - INTERVAL 7 DAY
    ),
    per_conv AS (
        SELECT conv_id, COUNT(*) AS k FROM touched GROUP BY 1
    ),
    credits AS (
        SELECT t.event_type,
               t.conv_id,
               CAST(round(t.v / p.k, 6) AS DECIMAL(18,6)) AS credit
        FROM touched t JOIN per_conv p ON t.conv_id = p.conv_id
    )
    SELECT event_type AS touch_type,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT)
               AS n_conversions_touched,
           CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
           CAST(SUM(credit) AS DOUBLE) AS credited_value
    FROM credits GROUP BY 1
    """,
)
def attribution_linear_touch(spark, sf_dir):
    """Linear multi-touch attribution: every click/view in the 7 days
    before a purchase shares the conversion value EQUALLY (value/k to
    each of the k touches) — the model between the extremes
    ``attribution_first_last_touch`` certifies, and the one marketing
    mix reviews default to when neither endpoint deserves full
    credit. Per touch channel: conversions it participated in,
    credited touch count, and total credited value.

    Determinism: k is an exact integer per conversion; each touch's
    credit is value/k rounded to 6 and then summed as DECIMAL(18,6)
    (the rounded-then-exact-sum contract), so channel totals are
    order-independent. Plan: the conversion-touch join is user-keyed
    with a 7-day range predicate (bounded fan-out per conversion);
    per-conversion touch counts and channel rollups are two more
    hash aggregations on the same keys."""
    e = t(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        dec("value", 18, 2).alias("v"),
    )
    touch = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("ts").alias("t_ts"), "event_type"
    )
    touched = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (F.col("t_ts") <= F.col("c_ts"))
        & (
            F.unix_micros("t_ts")
            > F.unix_micros("c_ts") - 7 * 86_400 * 1_000_000
        ),
    ).select("conv_id", "v", "event_type")
    per_conv = touched.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    credits = touched.join(per_conv, "conv_id").select(
        "event_type",
        "conv_id",
        F.round(F.col("v") / F.col("k"), 6)
        .cast("decimal(18,6)")
        .alias("credit"),
    )
    return credits.groupBy(
        F.col("event_type").alias("touch_type")
    ).agg(
        F.countDistinct("conv_id")
        .cast("bigint")
        .alias("n_conversions_touched"),
        F.count(F.lit(1)).cast("bigint").alias("n_credited_touches"),
        F.sum("credit").cast("double").alias("credited_value"),
    )


# --------------------------------------------------------------------------
# discount -> quantity elasticity (per-shipmode OLS)
# --------------------------------------------------------------------------
@register(
    "discount_quantity_elasticity",
    oracle="""
    WITH p AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS syy,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sxy
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag AS returnflag,
           CAST(n AS BIGINT) AS n_lines,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * sx / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
               AS r2
    FROM p
    """,
)
def discount_quantity_elasticity(spark, sf_dir):
    """Discount-to-quantity elasticity per return flag: the OLS fit of
    line quantity on discount — slope answers "does a deeper discount
    move more units?" (the demand-response readout a pricing review
    runs on TPC-H-shaped sales data), r² says whether discount
    explains any quantity variance at all, a near-zero r² warning
    against causal readings of the slope. Grouped by return flag (the
    generated lineitem carries no shipmode column).

    Same closed-form five-sum OLS as the decay-rate and Heaps fits:
    per-group n, Σx, Σy, Σx², Σy², Σxy are DECIMAL-exact
    partial-aggregated rollups; slope/intercept/r² are identical
    double expression trees over those scalars. Plan: ONE shuffle of
    lineitem to |shipmodes| groups, then scalar algebra."""
    l = t(spark, sf_dir, "lineitem")
    x = dec("l_discount", 18, 2)
    y = dec("l_quantity", 18, 2)
    p = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return p.select(
        F.col("l_returnflag").alias("returnflag"),
        n.cast("bigint").alias("n_lines"),
        F.round(slope, 6).alias("slope"),
        F.round(sy / n - slope * sx / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# Holt double-exponential smoothing (iterative forecast, replayed oracle)
# --------------------------------------------------------------------------
@register(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily
    ),
    h AS (
        SELECT i, y,
               y AS level,
               CAST(0.0 AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS forecast
        FROM idx WHERE i = 1
        UNION ALL
        SELECT x.i, x.y,
               0.5 * x.y + 0.5 * (h.level + h.trend),
               0.5 * ((0.5 * x.y + 0.5 * (h.level + h.trend)) - h.level)
                   + 0.5 * h.trend,
               h.level + h.trend
        FROM h JOIN idx x ON x.i = h.i + 1
    )
    SELECT idx.d,
           round(h.y, 6) AS y,
           round(h.level, 6) AS level,
           round(h.trend, 6) AS trend,
           round(h.forecast, 6) AS one_step_forecast
    FROM h JOIN idx ON idx.i = h.i
    """,
)
def holt_linear_forecast(spark, sf_dir):
    """Holt double-exponential smoothing (level + trend, α = β = 1/2)
    over the daily value series — the first real forecaster above the
    seasonal-naive baseline ``seasonal_naive_mase`` scores: level
    tracks the local mean, trend the local slope, and
    ``one_step_forecast`` is what the model would have predicted for
    each day (its error series is the thing MASE compares).

    An exponential smoother is a SEQUENTIAL recurrence with no
    closed-form window rewrite (unlike the clamped balance), so this
    is the designed showcase of the engine's recurrence pattern: the
    calendar-bounded day frame (one aggregation shuffle collapses the
    events) flows through ONE Arrow batch whose kernel runs the
    recursion in plain IEEE doubles, and the DuckDB oracle REPLAYS
    the identical recursion as a recursive CTE — same operation
    order, bitwise-equal doubles, the same independent-replay
    contract as ``mmr_diversified_topk``. α = β = 1/2 keeps every
    multiply exact, narrowing the float story to identically-ordered
    additions. At 100 TB the recursion length is the calendar span —
    a constant — while the data-sized work stays in the day rollup."""
    import pandas as pd

    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(dec("value", 18, 2)).cast("double").alias("y"))
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        level, trend, fc = [], [], []
        l = b = None
        for _, row in pdf.iterrows():
            y = float(row["y"])
            if l is None:
                l, b = y, 0.0
                fc.append(None)
            else:
                fc.append(l + b)
                l_new = 0.5 * y + 0.5 * (l + b)
                b = 0.5 * (l_new - l) + 0.5 * b
                l = l_new
            level.append(l)
            trend.append(b)
        # raw doubles out; the outer select applies F.round so the
        # half-away rounding convention matches the SQL oracle's
        # (pandas/python round are half-even and disagree on exact
        # binary midpoints like 166246.9765625)
        return pd.DataFrame(
            {
                "d": pdf["d"],
                "y": pdf["y"],
                "level": level,
                "trend": trend,
                "one_step_forecast": fc,
            }
        )

    raw = (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            smooth,
            schema="d date, y double, level double, trend double,"
            " one_step_forecast double",
        )
    )
    return raw.select(
        "d",
        F.round("y", 6).alias("y"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("one_step_forecast", 6).alias("one_step_forecast"),
    )


# --------------------------------------------------------------------------
# open-order backlog curve (sweep-line interval counting)
# --------------------------------------------------------------------------
@register(
    "open_order_backlog_sweep",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS start_d,
               MAX(CAST(l.l_shipdate AS DATE)) AS end_d
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT start_d AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT end_d + 1 AS d, -1 AS delta FROM spans
    ),
    daily AS (
        SELECT d,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_opened,
               CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_closed,
               SUM(delta) AS net
        FROM deltas GROUP BY d
    )
    SELECT d, n_opened, n_closed,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM daily
    """,
)
def open_order_backlog_sweep(spark, sf_dir):
    """Open-order backlog over time by SWEEP-LINE interval counting:
    each order is an interval [orderdate, last shipdate]; instead of
    joining every day against every order (quadratic), each interval
    emits a +1 delta at its start and a −1 the day after its end, and
    the running sum of daily nets IS the number of concurrently open
    orders — the WIP/backlog curve operations dashboards track, and
    the canonical O(n) rewrite of "how many intervals cover each
    point".

    Plan: one order-grain aggregation finds each order's last
    shipment (the only data-sized shuffle), the delta union collapses
    to the day grain, and the cumulative window runs on the
    calendar-bounded day frame. All integers; no interval join
    anywhere."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    spans = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("start_d"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    deltas = spans.select(
        F.col("start_d").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("end_d", 1).alias("d"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("d").agg(
        F.sum((F.col("delta") == 1).cast("int"))
        .cast("bigint")
        .alias("n_opened"),
        F.sum((F.col("delta") == -1).cast("int"))
        .cast("bigint")
        .alias("n_closed"),
        F.sum("delta").alias("net"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        "n_opened",
        "n_closed",
        F.sum("net").over(w).cast("bigint").alias("backlog"),
    )


# --------------------------------------------------------------------------
# shipping SLA attainment tiers per order priority
# --------------------------------------------------------------------------
@register(
    "shipping_sla_attainment",
    oracle="""
    WITH lines AS (
        SELECT o.o_orderpriority AS priority,
               CAST(l.l_shipdate AS DATE)
                   - CAST(o.o_orderdate AS DATE) AS lag_days
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_30d,
           CAST(SUM(CASE WHEN lag_days <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_60d,
           CAST(SUM(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_90d,
           round(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS sla_30d,
           round(SUM(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS sla_90d,
           CAST(MAX(lag_days) AS BIGINT) AS worst_lag_days
    FROM lines GROUP BY priority
    """,
)
def shipping_sla_attainment(spark, sf_dir):
    """Shipping SLA attainment per order priority: the fraction of
    line items shipped within 30/60/90 days of order placement, plus
    the worst observed lag — the tiered service-level scorecard an
    operations review reads next to the backlog curve
    (``open_order_backlog_sweep``); a premium priority whose 30-day
    attainment trails a lower tier is the misrouting signal.

    Lag is an exact integer day difference; every tier count is an
    integer aggregate and each attainment rate one terminal division.
    Plan: the orders↔lineitem equi-join (AQE picks broadcast or
    sort-merge by size) feeding ONE partial-aggregated rollup to the
    five priority groups."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    lines = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("lag_days"),
    )
    tier = lambda d: F.sum((F.col("lag_days") <= d).cast("int")).cast(
        "bigint"
    )
    return lines.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        tier(30).alias("n_within_30d"),
        tier(60).alias("n_within_60d"),
        tier(90).alias("n_within_90d"),
        F.round(
            tier(30) / F.count(F.lit(1)).cast("double"), 6
        ).alias("sla_30d"),
        F.round(
            tier(90) / F.count(F.lit(1)).cast("double"), 6
        ).alias("sla_90d"),
        F.max("lag_days").cast("bigint").alias("worst_lag_days"),
    )


# --------------------------------------------------------------------------
# referential-integrity audit across the star schema
# --------------------------------------------------------------------------

_RI_CHECK_SQL = """
        SELECT '{fk}' AS fk,
               CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
               CAST((SELECT COUNT(*) FROM {child} ch
                     WHERE NOT EXISTS (
                         SELECT 1 FROM {parent} pa
                         WHERE pa.{pk} = ch.{fkcol}
                     )) AS BIGINT) AS n_orphans"""

_RI_CHECKS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
)


@register(
    "referential_integrity_audit",
    oracle="WITH checks AS (" + "\n        UNION ALL".join(
        _RI_CHECK_SQL.format(fk=fk, child=c, fkcol=fc, parent=p, pk=pk)
        for fk, c, fc, p, pk in _RI_CHECKS
    ) + """
    )
    SELECT fk, n_child, n_orphans,
           CAST(FLOOR(n_orphans * 1000000.0 / n_child) AS BIGINT)
               AS orphan_ppm
    FROM checks
    """,
)
def referential_integrity_audit(spark, sf_dir):
    """Referential-integrity audit: orphan counts for every foreign-key
    edge of the star schema (lineitem→orders/part/supplier,
    orders→customer, customer/supplier→nation) plus the deliberately
    leaky events.user_id→customer edge — the data-quality sweep a
    warehouse runs after every load, and the empirical basis for
    treating a join as lossless (the TPC-H edges audit to 0 orphans;
    the events edge does NOT, which is why event queries never inner-
    join customer without saying so).

    The whole audit is ONE lazy plan instead of 14 sequential
    driver-blocking actions (2 per edge: COUNT + anti-join COUNT;
    guide §5 — no driver loops in query paths), and every child table
    scans exactly ONCE — all of its outgoing edges are checked in the
    same pass (guide §1.2: remove whole passes; lineitem, the 100 TB
    fact, carried three separate scans before). Per child table: scan
    the FK columns, LEFT OUTER JOIN the broadcast DISTINCT key set of
    each edge's parent, aggregate to (COUNT(*), COUNT(pk_i IS NULL)
    per edge), then ``stack`` the single row back to edge grain. The
    DISTINCT on each broadcast side makes every outer join provably
    row-preserving for ANY data, so COUNT(pk_i IS NULL) equals the
    NOT-EXISTS orphan count exactly (a NULL fk never matches either
    engine's predicate → orphan in both), and COUNT(*) is unchanged
    through the join chain. The 5 child branches union into one job
    whose branches run concurrently (guide §2.6). Orphan rate is
    reported as integer ppm — no float in the comparison surface."""
    by_child: dict[str, list] = {}
    for edge in _RI_CHECKS:
        by_child.setdefault(edge[1], []).append(edge)
    branches = []
    for child, edges in by_child.items():
        ch = t(spark, sf_dir, child).select(
            *dict.fromkeys(e[2] for e in edges)
        )
        for i, (fk, _c, fkcol, parent, pk) in enumerate(edges):
            pa = (
                t(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk_{i}"))
                .distinct()
            )
            ch = ch.join(
                F.broadcast(pa),
                ch[fkcol] == pa[f"__pk_{i}"],
                "left",
            )
        agg = ch.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.count(
                    F.when(F.col(f"__pk_{i}").isNull(), 1)
                ).alias(f"__orph_{i}")
                for i in range(len(edges))
            ],
        )
        stack_args = ", ".join(
            "'{}', __orph_{}".format(e[0].replace("'", ""), i)
            for i, e in enumerate(edges)
        )
        branches.append(
            agg.select(
                F.expr(
                    f"stack({len(edges)}, {stack_args}) "
                    "AS (fk, n_orphans)"
                ),
                "n_child",
            ).select("fk", "n_child", "n_orphans")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.select(
        "fk",
        "n_child",
        "n_orphans",
        F.floor(F.col("n_orphans") * 1_000_000.0 / F.col("n_child"))
        .cast("bigint")
        .alias("orphan_ppm"),
    )


# --------------------------------------------------------------------------
# quantile normalization audit by source
# --------------------------------------------------------------------------
@register(
    "quantile_normalize_by_source",
    oracle="""
    WITH counts AS (
        SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ),
    cum AS (
        SELECT source, n_chars, c,
               CAST(SUM(c) OVER (
                   PARTITION BY source ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cc,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM counts
    ),
    deciles AS (SELECT UNNEST(range(1, 10)) AS d),
    src_q AS (
        SELECT cum.source, d.d,
               CAST(MIN(cum.n_chars) AS BIGINT) AS src_q
        FROM cum CROSS JOIN deciles d
        WHERE cum.cc >= CAST(CEIL(cum.n * d.d / 10.0) AS BIGINT)
        GROUP BY cum.source, d.d
    ),
    gcum AS (
        SELECT n_chars,
               CAST(SUM(c) OVER (
                   ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cc,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM (SELECT n_chars, CAST(SUM(c) AS BIGINT) AS c
              FROM counts GROUP BY n_chars)
    ),
    glob_q AS (
        SELECT d.d, CAST(MIN(g.n_chars) AS BIGINT) AS glob_q
        FROM gcum g CROSS JOIN deciles d
        WHERE g.cc >= CAST(CEIL(g.n * d.d / 10.0) AS BIGINT)
        GROUP BY d.d
    )
    SELECT s.source, s.d AS decile, s.src_q, g.glob_q,
           CAST(s.src_q - g.glob_q AS BIGINT) AS shift
    FROM src_q s JOIN glob_q g ON s.d = g.d
    """,
)
def quantile_normalize_by_source(spark, sf_dir):
    """Quantile-normalization audit: per-source document-length
    deciles aligned against the corpus-global deciles — the
    batch-effect diagnosis (and the lookup table for the actual
    normalization map) a multi-source training-data pipeline needs
    before mixing: a source whose decile curve sits uniformly above
    the global one contributes systematically longer documents, and
    `shift` quantifies it per decile.

    Exact order statistics with NO data-grain sort: lengths roll up
    to (source, n_chars) counts first, cumulative counts ride the
    LENGTH-DOMAIN frame (distinct character counts — domain-bounded,
    the ``auc_rank_score`` class, never corpus-sized), and decile d's
    value is min{length : cum ≥ ⌈n·d/10⌉} via a 9-way threshold join.
    Integer arithmetic throughout; the ceil threshold is an exact
    integer in both engines."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wsrc = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(wsrc).cast("bigint").alias("cc"),
        F.sum("c")
        .over(Window.partitionBy("source"))
        .cast("bigint")
        .alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("d"))
    src_q = (
        cum.crossJoin(F.broadcast(deciles))
        .where(
            F.col("cc")
            >= F.ceil(F.col("n") * F.col("d") / 10.0).cast("bigint")
        )
        .groupBy("source", "d")
        .agg(F.min("n_chars").cast("bigint").alias("src_q"))
    )
    gcounts = counts.groupBy("n_chars").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    wg = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gcum = gcounts.select(
        "n_chars",
        F.sum("c").over(wg).cast("bigint").alias("cc"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    glob_q = (
        gcum.crossJoin(F.broadcast(deciles))
        .where(
            F.col("cc")
            >= F.ceil(F.col("n") * F.col("d") / 10.0).cast("bigint")
        )
        .groupBy("d")
        .agg(F.min("n_chars").cast("bigint").alias("glob_q"))
    )
    return (
        src_q.join(F.broadcast(glob_q), "d")
        .select(
            "source",
            F.col("d").alias("decile"),
            "src_q",
            "glob_q",
            (F.col("src_q") - F.col("glob_q")).cast("bigint").alias("shift"),
        )
    )


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (sibling of kaplan_meier_sessions)
# --------------------------------------------------------------------------
@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL 30 MINUTE
                 OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    grouped AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    bounds AS (SELECT MAX(ts) AS mx FROM events),
    sessions AS (
        SELECT date_diff('minute', MIN(ts), MAX(ts)) AS dur,
               MAX(ts) <= (SELECT mx FROM bounds) - INTERVAL 30 MINUTE
                   AS completed
        FROM grouped GROUP BY user_id, session_id
    ),
    by_dur AS (
        SELECT dur,
               SUM(CASE WHEN completed THEN 1 ELSE 0 END) AS d_events,
               COUNT(*) AS n_ending
        FROM sessions GROUP BY dur
    ),
    risk AS (
        SELECT dur, d_events,
               SUM(n_ending) OVER (
                   ORDER BY dur DESC ROWS UNBOUNDED PRECEDING
               ) AS n_at_risk
        FROM by_dur
    ),
    na AS (
        SELECT dur, d_events, n_at_risk,
               SUM(d_events / CAST(n_at_risk AS DOUBLE)) OVER (
                   ORDER BY dur ROWS UNBOUNDED PRECEDING
               ) AS h,
               SUM(d_events / (CAST(n_at_risk AS DOUBLE) * n_at_risk))
                   OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS v
        FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS duration_min,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d_events AS BIGINT) AS d_events,
           round(h, 9) AS cum_hazard,
           round(v, 9) AS hazard_var
    FROM na WHERE d_events > 0
    """,
)
def nelson_aalen_hazard(spark, sf_dir):
    """Nelson-Aalen cumulative hazard over session durations — the
    estimator survival analysis pairs with ``kaplan_meier_sessions``
    when the HAZARD (instantaneous end-rate), not the survival curve,
    is the quantity of interest: H(d) = Σ_{d'≤d} deaths/at_risk, with
    the standard variance Σ d/(n²). Near-identical small-sample
    behavior to −ln S_KM but defined even where KM's product hits 0,
    and additive — the natural form for comparing hazard between
    cohorts.

    Same censoring rule, sessionization, and exact integer
    deaths/at-risk rollups as the KM query (one user-keyed shuffle +
    duration-domain windows); the hazard sum accumulates in the SAME
    ascending duration order in both engines, rounded at 9."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    flagged = e.select(
        "user_id",
        "ts",
        (
            prev.isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                > 30 * 60 * 1_000_000
            )
        )
        .cast("int")
        .alias("new_session"),
    )
    grouped = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bounds = e.agg(F.max("ts").alias("mx"))
    sessions = (
        grouped.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts"))
        .crossJoin(F.broadcast(bounds))
        .select(
            (
                (
                    F.unix_micros(F.date_trunc("minute", "e_ts"))
                    - F.unix_micros(F.date_trunc("minute", "s_ts"))
                )
                / 60_000_000
            )
            .cast("bigint")
            .alias("dur"),
            (
                F.col("e_ts")
                <= F.col("mx") - F.expr("INTERVAL 30 MINUTES")
            ).alias("completed"),
        )
    )
    by_dur = sessions.groupBy("dur").agg(
        F.sum(F.col("completed").cast("int")).alias("d_events"),
        F.count(F.lit(1)).alias("n_ending"),
    )
    risk = by_dur.select(
        "dur",
        "d_events",
        F.sum("n_ending")
        .over(
            Window.orderBy(F.col("dur").desc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("n_at_risk"),
    )
    wasc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    na = risk.select(
        "dur",
        "d_events",
        "n_at_risk",
        F.sum(
            F.col("d_events") / F.col("n_at_risk").cast("double")
        )
        .over(wasc)
        .alias("h"),
        F.sum(
            F.col("d_events")
            / (F.col("n_at_risk").cast("double") * F.col("n_at_risk"))
        )
        .over(wasc)
        .alias("v"),
    )
    return na.where(F.col("d_events") > 0).select(
        F.col("dur").cast("bigint").alias("duration_min"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d_events").cast("bigint").alias("d_events"),
        F.round("h", 9).alias("cum_hazard"),
        F.round("v", 9).alias("hazard_var"),
    )
