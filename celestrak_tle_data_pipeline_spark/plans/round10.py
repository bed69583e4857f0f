"""Round-10 fresh registrations (X251+): the econometrics / eval /
corpus-analytics sweep.

Forty-odd new oracle-paired components continuing the SURVEY §2.11
franchise: unit-root & stationarity diagnostics, heteroscedasticity and
Granger tests, classifier/ranking evaluation panels, inequality and
price-index economics, lexical-richness and collocation text analytics,
LSH design curves, and link-prediction graph scores. Every query follows
the engine's determinism contract (plans/__init__.py docstring): integer
or fixed-scale DECIMAL arithmetic wherever a sum crosses partitions,
per-row IEEE expressions otherwise, `round(x, k) + 0.0` on signed
rounded outputs, and total-order tiebreaks on every top-k.

Shared shapes: the "daily grid" queries roll facts to day-grain cents
(one hash agg), broadcast a scalar fit frame back, and do consecutive-
day arithmetic with d = d+j self-joins on the bounded calendar frame —
no row-grain windows anywhere (the one cumulative exception is
documented in tools/audit_single_partition.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from . import register
from .common import dec, t

# --------------------------------------------------------------------------
# shared: day-grain orders revenue (cents) + order counts
# --------------------------------------------------------------------------
_DAILY_ORDERS_SQL = """
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
"""


def _daily_orders(spark, sf_dir):
    """Orders rolled to day grain: (d, y cents, c count) — exact ints."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
            .cast("bigint")
            .alias("d")
        )
        .agg(
            (F.sum(dec("o_totalprice", 18, 2)) * 100)
            .cast("bigint")
            .alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )


def _trend_fit(daily):
    """OLS daily-revenue trend (a, b, n, sse) from exact power sums —
    the chow/durbin-watson fit, factored: slope/intercept/SSE as one
    deterministic double expression each from DECIMAL(38,0) moments."""
    fit = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("y")).alias("sdy"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("sdd"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sxx_c = n * F.col("sdd").cast("double") - F.col("sd").cast(
        "double"
    ) * F.col("sd")
    sxy_c = n * F.col("sdy").cast("double") - F.col("sd").cast(
        "double"
    ) * F.col("sy")
    syy_c = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    b = sxy_c / sxx_c
    return fit.select(
        "n",
        b.alias("b"),
        ((F.col("sy").cast("double") - b * F.col("sd")) / n).alias("a"),
        ((syy_c - sxy_c * sxy_c / sxx_c) / n).alias("sse"),
    )


_TREND_FIT_SQL = """
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(d AS DECIMAL(38,0)) * y) AS sdy,
               SUM(CAST(d AS DECIMAL(38,0)) * d) AS sdd,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        FROM daily
    ),
    beta AS (
        SELECT n,
               (n * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * sy)
                 / (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd)
                   AS b,
               (CAST(sy AS DOUBLE)
                - (n * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * sy)
                  / (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd)
                  * sd) / n AS a,
               ((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                - (n * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * sy)
                  * (n * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * sy)
                  / (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd))
                 / n AS sse
        FROM fit
    )
"""


# --------------------------------------------------------------------------
# X251: Dickey-Fuller unit-root test on daily revenue
# --------------------------------------------------------------------------
@register(
    "dickey_fuller_unit_root",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    pairs AS (
        SELECT a.y AS w, b.y - a.y AS z
        FROM daily a JOIN daily b ON b.d = a.d + 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(z) AS BIGINT) AS sz,
               SUM(CAST(w AS DECIMAL(38,0)) * w) AS sww,
               SUM(CAST(w AS DECIMAL(38,0)) * z) AS swz,
               SUM(CAST(z AS DECIMAL(38,0)) * z) AS szz
        FROM pairs
    ),
    s AS (
        SELECT n,
               (n * CAST(swz AS DOUBLE) - CAST(sw AS DOUBLE) * sz)
                 / (n * CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * sw)
                   AS rho,
               ((n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz)
                - (n * CAST(swz AS DOUBLE) - CAST(sw AS DOUBLE) * sz)
                  * (n * CAST(swz AS DOUBLE) - CAST(sw AS DOUBLE) * sz)
                  / (n * CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * sw))
                 / n AS ssen,
               (n * CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * sw) / n
                   AS sxx
        FROM m
    )
    SELECT n AS n_pairs,
           round(rho, 9) + 0.0 AS rho_hat,
           round(rho / sqrt((ssen / (n - 2)) / sxx), 6) + 0.0 AS tau_stat,
           CASE WHEN rho > -1 AND rho < 0
                THEN round(ln(0.5) / ln(1.0 + rho), 4) + 0.0
           END AS half_life_days
    FROM s
    """,
)
def dickey_fuller_unit_root(spark, sf_dir):
    """Dickey-Fuller unit-root test on daily revenue: regress the
    one-day difference Δy on the lagged level y_{t-1} and report
    ρ̂ and its t-ratio τ (compare to the DF critical values, not
    normal ones). τ near 0 means a random-walk revenue process —
    every mean-reverting forecast and control chart on the series is
    then lying; ρ̂ < 0 gives the mean-reversion half-life
    ln(½)/ln(1+ρ̂). The unit-root complement of `mann_kendall_trend`
    (monotone drift) and `kpss_level_stationarity` (the reversed null).

    Exactness: day-grain cents, consecutive-day pairs from a d = d+1
    self-join on the bounded calendar grid (gaps drop in both engines
    identically — no lag window), power sums through DECIMAL(38,0)
    (the sf0.1 overflow class), τ one IEEE expression from n-scaled
    centered moments. Plan: one orders rollup, one bounded self-join,
    one scalar fold; no window, no row-grain pass beyond the rollup.
    """
    daily = _daily_orders(spark, sf_dir)
    a, b_ = daily.alias("a"), daily.alias("b")
    pairs = a.join(b_, F.col("b.d") == F.col("a.d") + 1).select(
        F.col("a.y").alias("w"), (F.col("b.y") - F.col("a.y")).alias("z")
    )
    wd = F.col("w").cast("decimal(38,0)")
    zd = F.col("z").cast("decimal(38,0)")
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(wd * F.col("w")).alias("sww"),
        F.sum(wd * F.col("z")).alias("swz"),
        F.sum(zd * F.col("z")).alias("szz"),
    )
    n = F.col("n").cast("double")
    sww_c = n * F.col("sww").cast("double") - F.col("sw").cast(
        "double"
    ) * F.col("sw")
    swz_c = n * F.col("swz").cast("double") - F.col("sw").cast(
        "double"
    ) * F.col("sz")
    szz_c = n * F.col("szz").cast("double") - F.col("sz").cast(
        "double"
    ) * F.col("sz")
    rho = swz_c / sww_c
    ssen = (szz_c - swz_c * swz_c / sww_c) / n
    sxx = sww_c / n
    return m.select(
        F.col("n").alias("n_pairs"),
        (F.round(rho, 9) + 0.0).alias("rho_hat"),
        (
            F.round(rho / F.sqrt((ssen / (n - 2)) / sxx), 6) + 0.0
        ).alias("tau_stat"),
        F.when(
            (rho > -1) & (rho < 0),
            F.round(F.log(F.lit(0.5)) / F.log(F.lit(1.0) + rho), 4) + 0.0,
        ).alias("half_life_days"),
    )


# --------------------------------------------------------------------------
# X252: KPSS level-stationarity test on daily revenue
# --------------------------------------------------------------------------
@register(
    "kpss_level_stationarity",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy
        FROM daily
    ),
    e AS (
        SELECT d, CAST(y AS DECIMAL(38,0)) * n - sy AS u, n
        FROM daily, tot
    ),
    s AS (
        SELECT d, u, n,
               SUM(u) OVER (ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS su
        FROM e
    ),
    parts AS (
        SELECT MAX(n) AS n,
               SUM(CAST(su AS DECIMAL(38,0)) * su) AS ss2,
               SUM(CAST(u AS DECIMAL(38,0)) * u) AS g0
        FROM s
    ),
    gam AS (
        SELECT j, SUM(CAST(a.u AS DECIMAL(38,0)) * b.u) AS gj
        FROM (SELECT UNNEST([1, 2, 3, 4]) AS j) lags
        JOIN e a ON true
        JOIN e b ON b.d = a.d + j
        GROUP BY j
    ),
    lr AS (
        SELECT p.n,
               CAST(p.ss2 AS DOUBLE) AS ss2,
               CAST(p.g0 AS DOUBLE)
                 + 2.0 * SUM((1.0 - j / 5.0) * CAST(g.gj AS DOUBLE))
                   AS s2lr
        FROM parts p, gam g
        GROUP BY p.n, p.ss2, p.g0
    )
    SELECT n AS n_days,
           round(ss2 / (n * s2lr), 6) + 0.0 AS kpss_eta,
           CASE WHEN ss2 / (n * s2lr) > 0.463 THEN 1 ELSE 0 END
               AS reject_level_5pct
    FROM lr
    """,
)
def kpss_level_stationarity(spark, sf_dir):
    """KPSS test of level stationarity on daily revenue — the REVERSED
    null vs Dickey-Fuller (H0 here = stationary), so the pair gives
    the four-quadrant verdict (both reject → structural break, both
    accept → underpowered, etc.). η = ΣS_t² / (n²·σ̂²_lr) with S_t
    the partial sums of mean deviations and σ̂²_lr the Bartlett-kernel
    long-run variance (l = 4); 0.463 is the 5% critical value.

    Exactness: deviations are the n-scaled integers u = y·n − Σy
    (exact at any partitioning); partial sums, ΣS², and the lag
    autocovariances all ride DECIMAL(38,0); the n-scaling cancels in
    the ratio (η = ΣS'²/(n·σ'²) after the common n³ factor drops).
    Lag products come from d = d+j self-joins (gap days drop in both
    engines identically). Plan: one rollup; the cumulative-sum window
    runs over the bounded calendar frame (~2,400 rows; the cusum class
    — allowlisted in tools/audit_single_partition.py), never at order
    grain.
    """
    from pyspark.sql import Window

    daily = _daily_orders(spark, sf_dir).persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    e = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        (F.col("y").cast("decimal(38,0)") * F.col("n") - F.col("sy")).alias(
            "u"
        ),
        "n",
    ).persist()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    s = e.select("d", "u", "n", F.sum("u").over(w).alias("su"))
    parts = s.agg(
        F.max("n").alias("n"),
        F.sum(F.col("su").cast("decimal(38,0)") * F.col("su")).alias("ss2"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("g0"),
    )
    lags = spark.range(1, 5).select(F.col("id").alias("j"))
    ea, eb = e.alias("ea"), e.alias("eb")
    gam = (
        ea.crossJoin(F.broadcast(lags))
        .join(
            eb,
            F.col("eb.d") == F.col("ea.d") + F.col("j"),
        )
        .groupBy("j")
        .agg(
            F.sum(
                F.col("ea.u").cast("decimal(38,0)") * F.col("eb.u")
            ).alias("gj")
        )
    )
    lr = (
        parts.crossJoin(gam)
        .groupBy("n", "ss2", "g0")
        .agg(
            F.sum(
                (1.0 - F.col("j") / 5.0) * F.col("gj").cast("double")
            ).alias("wgj")
        )
        .select(
            "n",
            F.col("ss2").cast("double").alias("ss2"),
            (F.col("g0").cast("double") + 2.0 * F.col("wgj")).alias("s2lr"),
        )
    )
    eta = F.col("ss2") / (F.col("n") * F.col("s2lr"))
    return lr.select(
        F.col("n").alias("n_days"),
        (F.round(eta, 6) + 0.0).alias("kpss_eta"),
        F.when(eta > 0.463, 1).otherwise(0).alias("reject_level_5pct"),
    )


# --------------------------------------------------------------------------
# X253: Breusch-Pagan / Koenker heteroscedasticity test
# --------------------------------------------------------------------------
@register(
    "breusch_pagan_koenker",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    {_TREND_FIT_SQL},
    z AS (
        SELECT d,
               round((y - (a + b * d)) * (y - (a + b * d))
                     / (sse / (n - 2)), 9) AS g,
               n
        FROM daily, beta
    ),
    m AS (
        SELECT MAX(n) AS n,
               CAST(SUM(d) AS BIGINT) AS sd,
               SUM(CAST(d AS DECIMAL(38,0)) * d) AS sdd,
               SUM(CAST(round(g, 9) AS DECIMAL(28,9))) AS sg,
               SUM(CAST(round(d * g, 6) AS DECIMAL(32,6))) AS sdg,
               SUM(CAST(round(g * g, 6) AS DECIMAL(32,6))) AS sgg
        FROM z
    )
    SELECT n AS n_days,
           round(n * pow(n * CAST(round(sdg, 0) AS DOUBLE)
                         - sd * CAST(round(sg, 0) AS DOUBLE), 2)
                 / ((n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd)
                    * (n * CAST(round(sgg, 0) AS DOUBLE)
                       - CAST(round(sg, 0) AS DOUBLE)
                         * CAST(round(sg, 0) AS DOUBLE))), 6) + 0.0
               AS koenker_lm
    FROM m
    """,
)
def breusch_pagan_koenker(spark, sf_dir):
    """Breusch-Pagan heteroscedasticity test (Koenker's studentized
    form) on the daily-revenue trend: regress the STUDENTIZED squared
    residuals g_t = e_t²/s² on the day index; LM = n·R². Significant
    LM means the trend's error variance grows/shrinks over time, so
    every homoscedastic interval (`chow_structural_break`'s F, the
    control-chart sigma) is miscalibrated — the diagnostic that says
    WHETHER to trust them, completing the residual panel with
    `durbin_watson_trend_residuals` (correlation) and
    `jarque_bera_normality` (shape).

    Exactness: the fit is the shared exact-moment trend (DECIMAL(38,0)
    power sums); residuals and g_t are one identical IEEE expression
    per day; studentizing by s² = SSE·n/(n−2) bounds g to O(1-100) so
    every sum rides a fixed-scale DECIMAL with no overflow at any SF
    (R² is scale-invariant, so the statistic is unchanged). Sums round
    to scale 0 before the DOUBLE cast (the int128 double-round
    hazard). Plan: rollup → broadcast fit → one fold; no window.
    """
    daily = _daily_orders(spark, sf_dir)
    beta = _trend_fit(daily)
    nL = F.col("n").cast("double")
    g = F.round(
        (F.col("y") - (F.col("a") + F.col("b") * F.col("d")))
        * (F.col("y") - (F.col("a") + F.col("b") * F.col("d")))
        / (F.col("sse") / (nL - 2)),
        9,
    )
    z = daily.crossJoin(F.broadcast(beta)).select(
        "d", g.alias("g"), "n"
    )
    m = z.agg(
        F.max("n").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("sdd"),
        F.sum(F.round(F.col("g"), 9).cast("decimal(28,9)")).alias("sg"),
        F.sum(
            F.round(F.col("d") * F.col("g"), 6).cast("decimal(32,6)")
        ).alias("sdg"),
        F.sum(
            F.round(F.col("g") * F.col("g"), 6).cast("decimal(32,6)")
        ).alias("sgg"),
    )
    n = F.col("n").cast("double")
    sg0 = F.round(F.col("sg"), 0).cast("double")
    sdg0 = F.round(F.col("sdg"), 0).cast("double")
    sgg0 = F.round(F.col("sgg"), 0).cast("double")
    lm = (
        n
        * F.pow(n * sdg0 - F.col("sd") * sg0, F.lit(2.0))
        / (
            (
                n * F.col("sdd").cast("double")
                - F.col("sd").cast("double") * F.col("sd")
            )
            * (n * sgg0 - sg0 * sg0)
        )
    )
    return m.select(
        F.col("n").alias("n_days"),
        (F.round(lm, 6) + 0.0).alias("koenker_lm"),
    )


# --------------------------------------------------------------------------
# X254: Granger causality (lag 1): do order counts lead revenue?
# --------------------------------------------------------------------------
@register(
    "granger_causality_lag1",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    pairs AS (
        SELECT b.y AS yy, a.y AS y1, a.c AS x1
        FROM daily a JOIN daily b ON b.d = a.d + 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yy) AS BIGINT) AS sy,
               CAST(SUM(y1) AS BIGINT) AS s1,
               CAST(SUM(x1) AS BIGINT) AS s2,
               SUM(CAST(y1 AS DECIMAL(38,0)) * y1) AS s11,
               SUM(CAST(y1 AS DECIMAL(38,0)) * x1) AS s12,
               SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS s22,
               SUM(CAST(y1 AS DECIMAL(38,0)) * yy) AS s1y,
               SUM(CAST(x1 AS DECIMAL(38,0)) * yy) AS s2y,
               SUM(CAST(yy AS DECIMAL(38,0)) * yy) AS syy
        FROM pairs
    ),
    c AS (
        SELECT n,
               n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 AS c11,
               n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 AS c12,
               n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 AS c22,
               n * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy AS c1y,
               n * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy AS c2y,
               n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy
        FROM m
    ),
    r AS (
        SELECT n,
               (cyy - ((c22 * c1y - c12 * c2y) * c1y
                       + (c11 * c2y - c12 * c1y) * c2y)
                      / (c11 * c22 - c12 * c12)) / n AS rss_u,
               (cyy - c1y * c1y / c11) / n AS rss_r,
               (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)
                   AS beta_count
        FROM c
    )
    SELECT n AS n_pairs,
           round(beta_count, 6) + 0.0 AS beta_lagged_count,
           round((rss_r - rss_u) / (rss_u / (n - 3)), 6) + 0.0
               AS granger_f
    FROM r
    """,
)
def granger_causality_lag1(spark, sf_dir):
    """Granger causality at lag 1: does yesterday's ORDER COUNT carry
    information about today's REVENUE beyond yesterday's revenue?
    F-test of the restricted AR(1) (y_t ~ y_{t-1}) against the
    unrestricted VAR row (y_t ~ y_{t-1} + count_{t-1}), both fit in
    closed form from the 2×2 normal equations. The lead-lag HYPOTHESIS
    TEST on top of `cross_correlation_daily`'s descriptive panel —
    correlation says the series co-move, Granger says the count adds
    predictive value.

    Exactness: all ten power sums are exact integers through
    DECIMAL(38,0) (cents × cents is the sf0.1 overflow class);
    centered moments, the solved coefficients, and both RSS values
    are single IEEE expressions from those integers (the chow
    pattern). Consecutive-day pairs from the d = d+1 self-join on the
    calendar grid. Plan: one rollup, one bounded self-join, one
    scalar fold; no window.
    """
    daily = _daily_orders(spark, sf_dir)
    a, b_ = daily.alias("a"), daily.alias("b")
    pairs = a.join(b_, F.col("b.d") == F.col("a.d") + 1).select(
        F.col("b.y").alias("yy"),
        F.col("a.y").alias("y1"),
        F.col("a.c").alias("x1"),
    )
    y1d = F.col("y1").cast("decimal(38,0)")
    x1d = F.col("x1").cast("decimal(38,0)")
    yyd = F.col("yy").cast("decimal(38,0)")
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yy").cast("bigint").alias("sy"),
        F.sum("y1").cast("bigint").alias("s1"),
        F.sum("x1").cast("bigint").alias("s2"),
        F.sum(y1d * F.col("y1")).alias("s11"),
        F.sum(y1d * F.col("x1")).alias("s12"),
        F.sum(x1d * F.col("x1")).alias("s22"),
        F.sum(y1d * F.col("yy")).alias("s1y"),
        F.sum(x1d * F.col("yy")).alias("s2y"),
        F.sum(yyd * F.col("yy")).alias("syy"),
    )
    n = F.col("n").cast("double")

    def cc(sab, sa, sb):
        return n * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb)

    c11, c12, c22 = cc("s11", "s1", "s1"), cc("s12", "s1", "s2"), cc(
        "s22", "s2", "s2"
    )
    c1y, c2y, cyy = cc("s1y", "s1", "sy"), cc("s2y", "s2", "sy"), cc(
        "syy", "sy", "sy"
    )
    det = c11 * c22 - c12 * c12
    bu = (c22 * c1y - c12 * c2y) / det
    cu = (c11 * c2y - c12 * c1y) / det
    rss_u = (cyy - (bu * c1y + cu * c2y)) / n
    rss_r = (cyy - c1y * c1y / c11) / n
    return m.select(
        F.col("n").alias("n_pairs"),
        (F.round(cu, 6) + 0.0).alias("beta_lagged_count"),
        (
            F.round((rss_r - rss_u) / (rss_u / (n - 3)), 6) + 0.0
        ).alias("granger_f"),
    )


# --------------------------------------------------------------------------
# X255: ARCH-effect (McLeod-Li) test on trend residuals
# --------------------------------------------------------------------------
@register(
    "arch_effect_mcleod_li",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    {_TREND_FIT_SQL},
    z AS (
        SELECT d,
               round((y - (a + b * d)) * (y - (a + b * d))
                     / (sse / (n - 2)), 9) AS s
        FROM daily, beta
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(round(SUM(CAST(round(s, 9) AS DECIMAL(28,9))), 9)
                    AS DOUBLE) AS ssum
        FROM z
    ),
    lagsum AS (
        SELECT j,
               CAST(COUNT(*) AS BIGINT) AS nj,
               CAST(round(SUM(CAST(round(a.s * b.s, 6)
                                   AS DECIMAL(32,6))), 6) AS DOUBLE)
                   AS spp,
               CAST(round(SUM(CAST(round(a.s + b.s, 9)
                                   AS DECIMAL(28,9))), 9) AS DOUBLE)
                   AS spair
        FROM (SELECT UNNEST([1, 2, 3, 4, 5]) AS j) lags
        JOIN z a ON true
        JOIN z b ON b.d = a.d + j
        GROUP BY j
    ),
    den AS (
        SELECT t.n,
               CAST(round(SUM(CAST(round(
                   (s - ssum / n) * (s - ssum / n), 6)
                   AS DECIMAL(32,6))), 6) AS DOUBLE) AS css
        FROM z, tot t GROUP BY t.n
    ),
    acf AS (
        SELECT l.j,
               (l.spp - (t.ssum / t.n) * l.spair
                + l.nj * (t.ssum / t.n) * (t.ssum / t.n)) / d.css AS r
        FROM lagsum l, tot t, den d
    )
    SELECT a.j AS lag,
           round(a.r, 6) + 0.0 AS acf_sq_resid,
           round(t.n * (t.n + 2.0)
                 * (SELECT SUM(b.r * b.r / (t.n - b.j)) FROM acf b
                    WHERE b.j <= a.j), 6) + 0.0 AS mcleod_li_q
    FROM acf a, tot t
    """,
)
def arch_effect_mcleod_li(spark, sf_dir):
    """McLeod-Li / ARCH-effect test: Ljung-Box portmanteau on the
    SQUARED studentized trend residuals at lags 1..5. The raw-residual
    ACF (`durbin_watson_trend_residuals`, `acf_ljung_box`) can be
    clean while volatility still clusters — squared-residual
    autocorrelation is the canonical ARCH signature, and it decides
    whether `ewma_control_chart`-style constant-sigma limits are valid
    or a GARCH-style widening is needed.

    Exactness: studentized g = e²/s² bounds every term to O(1-100)
    (scale-invariant statistic, the breusch_pagan_koenker trick), all
    sums are rounded-term fixed-scale DECIMAL folds, lag products come
    from d = d+j self-joins on the calendar grid, and the 5-term
    cumulative Q is a triangular join over the 5-row lag frame — no
    window anywhere. Output: one row per lag with r_j and the running
    McLeod-Li Q.
    """
    daily = _daily_orders(spark, sf_dir)
    beta = _trend_fit(daily)
    nL = F.col("n").cast("double")
    sexpr = F.round(
        (F.col("y") - (F.col("a") + F.col("b") * F.col("d")))
        * (F.col("y") - (F.col("a") + F.col("b") * F.col("d")))
        / (F.col("sse") / (nL - 2)),
        9,
    )
    z = (
        daily.crossJoin(F.broadcast(beta))
        .select("d", sexpr.alias("s"))
        .persist()
    )
    tot = z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.round(F.col("s"), 9).cast("decimal(28,9)")), 9)
        .cast("double")
        .alias("ssum"),
    )
    lags = spark.range(1, 6).select(F.col("id").alias("j"))
    za, zb = z.alias("za"), z.alias("zb")
    lagsum = (
        za.crossJoin(F.broadcast(lags))
        .join(zb, F.col("zb.d") == F.col("za.d") + F.col("j"))
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nj"),
            F.round(
                F.sum(
                    F.round(F.col("za.s") * F.col("zb.s"), 6).cast(
                        "decimal(32,6)"
                    )
                ),
                6,
            )
            .cast("double")
            .alias("spp"),
            F.round(
                F.sum(
                    F.round(F.col("za.s") + F.col("zb.s"), 9).cast(
                        "decimal(28,9)"
                    )
                ),
                9,
            )
            .cast("double")
            .alias("spair"),
        )
    )
    den = (
        z.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    F.round(
                        (F.col("s") - F.col("ssum") / F.col("n"))
                        * (F.col("s") - F.col("ssum") / F.col("n")),
                        6,
                    ).cast("decimal(32,6)")
                ),
                6,
            )
            .cast("double")
            .alias("css")
        )
    )
    mean = F.col("ssum") / F.col("n")
    acf = (
        lagsum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(den))
        .select(
            "j",
            "n",
            (
                (
                    F.col("spp")
                    - mean * F.col("spair")
                    + F.col("nj") * mean * mean
                )
                / F.col("css")
            ).alias("r"),
        )
        .persist()
    )
    a2 = acf.select(
        F.col("j").alias("j2"), F.col("r").alias("r2")
    )
    q = (
        acf.join(a2, F.col("j2") <= F.col("j"))
        .groupBy("j", "n", "r")
        .agg(
            F.sum(
                F.col("r2") * F.col("r2") / (F.col("n") - F.col("j2"))
            ).alias("qsum")
        )
    )
    return q.select(
        F.col("j").alias("lag"),
        (F.round(F.col("r"), 6) + 0.0).alias("acf_sq_resid"),
        (
            F.round(F.col("n") * (F.col("n") + 2.0) * F.col("qsum"), 6)
            + 0.0
        ).alias("mcleod_li_q"),
    )


# --------------------------------------------------------------------------
# X256: spectral entropy of the daily revenue series
# --------------------------------------------------------------------------
@register(
    "spectral_entropy_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(MIN(d) AS BIGINT) AS d0
        FROM daily
    ),
    terms AS (
        SELECT p,
               SUM((CAST(y AS DECIMAL(38,0)) * n - s)
                   * CAST(round(cos(2 * pi() * ((d - d0) % p) / p), 9)
                          AS DECIMAL(12,9))) AS sc,
               SUM((CAST(y AS DECIMAL(38,0)) * n - s)
                   * CAST(round(sin(2 * pi() * ((d - d0) % p) / p), 9)
                          AS DECIMAL(12,9))) AS ss
        FROM daily, tot, (SELECT UNNEST(range(2, 15)) AS p) periods
        GROUP BY p
    ),
    den AS (
        SELECT SUM((CAST(y AS DECIMAL(38,0)) * n - s)
                   * (CAST(y AS DECIMAL(38,0)) * n - s)) AS dsq,
               MAX(n) AS n
        FROM daily, tot
    ),
    power AS (
        SELECT p,
               round((CAST(round(sc, 0) AS DOUBLE)
                      * CAST(round(sc, 0) AS DOUBLE)
                      + CAST(round(ss, 0) AS DOUBLE)
                      * CAST(round(ss, 0) AS DOUBLE))
                     / (n * CAST(round(dsq, 0) AS DOUBLE)), 9) AS w
        FROM terms, den
    ),
    norm AS (
        SELECT CAST(round(SUM(CAST(w AS DECIMAL(12,9))), 9) AS DOUBLE)
            AS tw
        FROM power
    ),
    ent AS (
        SELECT SUM(CAST(CASE WHEN w > 0
                   THEN round(-(w / tw) * ln(w / tw), 9) ELSE 0 END
                   AS DECIMAL(12,9))) AS h
        FROM power, norm
    ),
    top AS (
        SELECT p, w FROM power ORDER BY w DESC, p ASC LIMIT 1
    )
    SELECT d.n AS n_days,
           round(CAST(e.h AS DOUBLE) / ln(13.0), 6) + 0.0
               AS spectral_entropy,
           t.p AS dominant_period,
           round(t.w / m.tw, 6) + 0.0 AS dominant_share
    FROM ent e, top t, norm m, den d
    """,
)
def spectral_entropy_daily(spark, sf_dir):
    """Normalized spectral entropy of daily revenue over candidate
    periods 2..14 days: H = −Σ p̂ ln p̂ / ln(13) on the normalized
    periodogram. Near 1 = white-noise-flat spectrum, near 0 = one
    dominant cycle; the single-number "how seasonal is this series"
    gauge on top of `periodogram_dft_peaks`' per-period panel (that
    query reports WHERE the peaks are; this one reports how
    concentrated the spectrum is, plus the argmax period for free).

    Exactness: identical DFT machinery to the periodogram (n-scaled
    integer deviations × 1e-9-rounded trig factors in DECIMAL, scale-0
    round before the DOUBLE cast); powers round to 1e-9 before the
    13-term normalization and entropy folds, both of which are
    fixed-scale DECIMAL sums over the period DOMAIN (13 rows). The
    argmax uses the total order (power desc, period asc). Plan: one
    rollup, broadcast period dim, two tiny folds; no window.
    """
    e = _daily_orders(spark, sf_dir)
    tot = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.min("d").cast("bigint").alias("d0"),
    )
    periods = spark.range(2, 15).select(F.col("id").alias("p"))
    theta = (
        2.0
        * math.pi
        * ((F.col("d") - F.col("d0")) % F.col("p"))
        / F.col("p")
    )
    u = (F.col("y").cast("decimal(38,0)") * F.col("n") - F.col("s"))
    terms = (
        e.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(periods))
        .groupBy("p")
        .agg(
            F.sum(u * F.round(F.cos(theta), 9).cast("decimal(12,9)")).alias(
                "sc"
            ),
            F.sum(u * F.round(F.sin(theta), 9).cast("decimal(12,9)")).alias(
                "ss"
            ),
        )
    )
    den = e.crossJoin(F.broadcast(tot)).agg(
        F.sum(u * u).alias("dsq"), F.max("n").alias("n")
    )
    sc0 = F.round(F.col("sc"), 0).cast("double")
    ss0 = F.round(F.col("ss"), 0).cast("double")
    power = terms.crossJoin(F.broadcast(den)).select(
        "p",
        F.round(
            (sc0 * sc0 + ss0 * ss0)
            / (F.col("n") * F.round(F.col("dsq"), 0).cast("double")),
            9,
        ).alias("w"),
    ).persist()
    norm = power.agg(
        F.round(F.sum(F.col("w").cast("decimal(12,9)")), 9)
        .cast("double")
        .alias("tw")
    )
    ent = (
        power.crossJoin(F.broadcast(norm))
        .agg(
            F.sum(
                F.when(
                    F.col("w") > 0,
                    F.round(
                        -(F.col("w") / F.col("tw"))
                        * F.log(F.col("w") / F.col("tw")),
                        9,
                    ),
                )
                .otherwise(F.lit(0.0))
                .cast("decimal(12,9)")
            ).alias("h")
        )
    )
    top = power.orderBy(F.col("w").desc(), F.col("p").asc()).limit(1)
    return (
        ent.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(den.select("n")))
        .select(
            F.col("n").alias("n_days"),
            (
                F.round(
                    F.col("h").cast("double") / math.log(13.0), 6
                )
                + 0.0
            ).alias("spectral_entropy"),
            F.col("p").alias("dominant_period"),
            (F.round(F.col("w") / F.col("tw"), 6) + 0.0).alias(
                "dominant_share"
            ),
        )
    )


# --------------------------------------------------------------------------
# X257: turning-points randomness test
# --------------------------------------------------------------------------
@register(
    "turning_points_randomness",
    oracle=f"""
    WITH daily AS ({_DAILY_ORDERS_SQL}),
    triples AS (
        SELECT CASE WHEN (b.y - a.y) * (c.y - b.y) < 0 THEN 1 ELSE 0 END
                   AS tp
        FROM daily a
        JOIN daily b ON b.d = a.d + 1
        JOIN daily c ON c.d = a.d + 2
        WHERE a.y <> b.y AND b.y <> c.y
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
               CAST(SUM(tp) AS BIGINT) AS tps
        FROM triples
    )
    SELECT n_triples, tps AS turning_points,
           round(2.0 * n_triples / 3.0, 6) AS expected_tp,
           round((tps - 2.0 * n_triples / 3.0)
                 / sqrt((16.0 * (n_triples + 2) - 29.0) / 90.0), 6)
               + 0.0 AS z_score
    FROM s
    """,
)
def turning_points_randomness(spark, sf_dir):
    """Turning-points test of series randomness: count local
    extrema among consecutive-day revenue triples — an i.i.d. series
    has E[T] = 2m/3 turning points over m triples; too few means
    persistence (trend/momentum), too many means oscillation
    (negative autocorrelation, e.g. inventory whipsaw). The
    triple-grain companion to `runs_test_randomness` (which looks at
    direction RUNS) — the two catch different departures.

    Exactness: pure integer sign arithmetic on cents ((y₂−y₁)(y₃−y₂)
    < 0 — products of day deltas fit int64 at any SF... cast through
    DECIMAL(38,0) anyway for the sf0.1 class); flat steps (exact
    ties) are excluded in both engines identically. Consecutive
    triples from two d+1/d+2 self-joins on the bounded calendar grid;
    z from the classic variance (16m−29)/90. Plan: one rollup, two
    bounded self-joins, one scalar fold; no window.
    """
    daily = _daily_orders(spark, sf_dir)
    a, b_, c = daily.alias("a"), daily.alias("b"), daily.alias("c")
    triples = (
        a.join(b_, F.col("b.d") == F.col("a.d") + 1)
        .join(c, F.col("c.d") == F.col("a.d") + 2)
        .where(
            (F.col("a.y") != F.col("b.y"))
            & (F.col("b.y") != F.col("c.y"))
        )
        .select(
            F.when(
                (F.col("b.y") - F.col("a.y")).cast("decimal(38,0)")
                * (F.col("c.y") - F.col("b.y"))
                < 0,
                1,
            )
            .otherwise(0)
            .alias("tp")
        )
    )
    s = triples.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.sum("tp").cast("bigint").alias("tps"),
    )
    m = F.col("n_triples")
    return s.select(
        "n_triples",
        F.col("tps").alias("turning_points"),
        F.round(2.0 * m / 3.0, 6).alias("expected_tp"),
        (
            F.round(
                (F.col("tps") - 2.0 * m / 3.0)
                / F.sqrt((16.0 * (m + 2) - 29.0) / 90.0),
                6,
            )
            + 0.0
        ).alias("z_score"),
    )


R10_QUERIES = (
    "dickey_fuller_unit_root",
    "kpss_level_stationarity",
    "breusch_pagan_koenker",
    "granger_causality_lag1",
    "arch_effect_mcleod_li",
    "spectral_entropy_daily",
    "turning_points_randomness",
)
