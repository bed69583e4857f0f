"""Round-13 pre-staged bank (candidate X394+): STAGED, not in the live
registry, under the same no-new-debt discipline every flipped bank
(next_window, bank_r11, bank_r12) went through: a stage-only decorator,
the two-SF driver-gate mirror in ``tests/test_bank_r13.py``, the sf0.1
sweep via ``tools/bank_check.py --module bank_r13``, the
single-partition plan audit, and the Spark-schema-vs-DuckDB dtype-family
sweep (``tests/test_oracle_dtypes.py`` picks this module up by name) —
the r11 ``kendalls_w`` lesson says dtype families are part of the gate.

Seeded in round 12 with a risk/agreement/price-index/post-hoc batch;
round-13 fresh work appends below and the round-13 flip follows the
bank_r12 protocol.

Determinism disciplines inherited unchanged (see bank_r11/bank_r12
docstrings): exact integer/DECIMAL folds, round-before-fold for float
terms, ``+ 0.0`` on possibly-negative-zero outputs, total-order top-k,
bounded-domain windows only, explicit ``floor()`` before any
double→integer bucket (DuckDB CAST rounds where Spark truncates).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator: records the query in the bank dicts and
    deliberately does NOT touch the live registry (pre-flip
    discipline — ``tests/test_bank_r13.py`` asserts the separation)."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# Shared day-grain revenue series (orders calendar, integer cents).
_DAILY_SQL = """
    daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                   AS day,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    )
"""


def _daily(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((dec("o_totalprice", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )


# --------------------------------------------------------------------------
# Historical VaR / CVaR of daily revenue changes
# --------------------------------------------------------------------------
@register(
    "var_cvar_historical",
    oracle=f"""
    WITH {_DAILY_SQL},
    chg AS (
        SELECT round((LAG(y) OVER (ORDER BY day) - y) / 100.0, 2)
                   AS loss
        FROM daily
        QUALIFY loss IS NOT NULL
    ),
    v AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(quantile_cont(loss, 0.95), 2) AS var95,
               round(quantile_cont(loss, 0.99), 2) AS var99
        FROM chg
    )
    SELECT v.n AS n_days,
           v.var95 + 0.0 AS var_95,
           v.var99 + 0.0 AS var_99,
           round(CAST(round(SUM(CASE WHEN c.loss >= v.var95
                                THEN CAST(c.loss AS DECIMAL(18,2))
                                END), 2) AS DOUBLE)
                 / COUNT(CASE WHEN c.loss >= v.var95 THEN 1 END), 2)
               + 0.0 AS cvar_95
    FROM chg c, v GROUP BY v.n, v.var95, v.var99
    """,
)
def var_cvar_historical(spark, sf_dir):
    """Historical 95/99% Value-at-Risk and 95% expected shortfall
    (CVaR) of day-over-day revenue DROPS: the loss distribution's
    empirical tail quantiles, and the mean loss beyond VaR95 — the
    coherent-risk-measure pair every treasury/risk dashboard carries,
    applied to the revenue series the registry's drawdown query views
    path-wise. Losses are exact integer-cent differences rounded to
    cents; quantiles are the engines' bit-compatible interpolated
    percentile; CVaR folds DECIMAL cents over the >=VaR tail (the >=
    compare is on rounded values, identical in both engines). Plan:
    one day rollup, one lag over the calendar frame, one percentile
    fold, one tail fold."""
    daily = _daily(spark, sf_dir)
    chg = daily.select(
        F.round(
            (F.lag("y").over(Window.orderBy("day")) - F.col("y"))
            / 100.0,
            2,
        ).alias("loss")
    ).where(F.col("loss").isNotNull()).persist()
    v = chg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.expr("percentile(loss, 0.95)"), 2).alias("var95"),
        F.round(F.expr("percentile(loss, 0.99)"), 2).alias("var99"),
    )
    tail = chg.crossJoin(F.broadcast(v)).where(
        F.col("loss") >= F.col("var95")
    )
    out = tail.groupBy("n", "var95", "var99").agg(
        F.round(
            F.round(
                F.sum(F.col("loss").cast("decimal(18,2)")), 2
            ).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("cvar"),
    )
    return out.select(
        F.col("n").alias("n_days"),
        (F.col("var95") + 0.0).alias("var_95"),
        (F.col("var99") + 0.0).alias("var_99"),
        (F.col("cvar") + 0.0).alias("cvar_95"),
    )


# --------------------------------------------------------------------------
# Kupiec proportion-of-failures VaR backtest (split-sample)
# --------------------------------------------------------------------------
@register(
    "kupiec_pof_backtest",
    oracle=f"""
    WITH {_DAILY_SQL},
    chg AS (
        SELECT day,
               round((LAG(y) OVER (ORDER BY day) - y) / 100.0, 2)
                   AS loss
        FROM daily
        QUALIFY loss IS NOT NULL
    ),
    split AS (
        SELECT CAST(floor(quantile_cont(day, 0.5)) AS BIGINT) AS mid FROM chg
    ),
    est AS (
        SELECT round(quantile_cont(loss, 0.95), 2) AS var95
        FROM chg, split WHERE day <= split.mid
    ),
    test AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN loss > est.var95
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM chg, split, est WHERE day > split.mid
        GROUP BY est.var95
    )
    SELECT n AS n_test_days, x AS n_violations,
           round(x * 1.0 / n, 6) AS violation_rate,
           CASE WHEN x = 0 OR x = n THEN NULL
                ELSE round(-2.0 * ((n - x) * ln(0.95) + x * ln(0.05)
                           - ((n - x) * ln(1.0 - x * 1.0 / n)
                              + x * ln(x * 1.0 / n))), 6) + 0.0
           END AS kupiec_lr
    FROM test
    """,
)
def kupiec_pof_backtest(spark, sf_dir):
    """Kupiec proportion-of-failures backtest of the historical VaR95:
    estimate VaR on the first half of the loss series (by median day),
    count violations in the second half, and LR_pof = -2 ln of the
    binomial likelihood ratio against p = 5% — asymptotically chi2(1);
    the regulatory (Basel traffic-light) check that a VaR model's
    exception RATE matches its confidence level, out of sample. NULL
    when the test half has zero or all violations (the LR degenerates
    — same expression both engines). Losses and the split median are
    the var_cvar twin's exact constructions; the LR is one closed-form
    expression of two integers. Plan: day rollup, lag, two percentile
    folds, one test-half fold."""
    daily = _daily(spark, sf_dir)
    chg = daily.select(
        "day",
        F.round(
            (F.lag("y").over(Window.orderBy("day")) - F.col("y"))
            / 100.0,
            2,
        ).alias("loss"),
    ).where(F.col("loss").isNotNull()).persist()
    split = chg.agg(
        F.floor(F.expr("percentile(day, 0.5)")).cast("bigint").alias("mid")
    )
    est = (
        chg.crossJoin(F.broadcast(split))
        .where(F.col("day") <= F.col("mid"))
        .agg(F.round(F.expr("percentile(loss, 0.95)"), 2).alias("var95"))
    )
    test = (
        chg.crossJoin(F.broadcast(split))
        .crossJoin(F.broadcast(est))
        .where(F.col("day") > F.col("mid"))
        .groupBy("var95")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("loss") > F.col("var95"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
        )
    )
    n = F.col("n")
    x = F.col("x")
    rate = x * 1.0 / n
    lr = -2.0 * (
        (n - x) * F.log(F.lit(0.95))
        + x * F.log(F.lit(0.05))
        - ((n - x) * F.log(1.0 - rate) + x * F.log(rate))
    )
    return test.select(
        n.alias("n_test_days"),
        x.alias("n_violations"),
        F.round(rate, 6).alias("violation_rate"),
        F.when((x == 0) | (x == n), F.lit(None).cast("double"))
        .otherwise(F.round(lr, 6) + 0.0)
        .alias("kupiec_lr"),
    )


# --------------------------------------------------------------------------
# GBM drift / volatility fit of the daily revenue series
# --------------------------------------------------------------------------
@register(
    "gbm_drift_vol_fit",
    oracle=f"""
    WITH {_DAILY_SQL},
    ret AS (
        SELECT round(ln(y * 1.0 / LAG(y) OVER (ORDER BY day)), 9) AS r
        FROM daily
        QUALIFY r IS NOT NULL
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(r AS DECIMAL(28,9))) AS s1,
               SUM(CAST(round(r * r, 15) AS DECIMAL(28,15))) AS s2
        FROM ret
    )
    SELECT n AS n_returns,
           round(CAST(s1 AS DOUBLE) / n, 9) + 0.0 AS mu_daily,
           round(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1.0)), 9) AS sigma_daily,
           round(CAST(s1 AS DOUBLE) / n * 252.0, 6) + 0.0
               AS mu_annualized,
           round(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1.0)) * sqrt(252.0), 6) AS sigma_annualized
    FROM f
    """,
)
def gbm_drift_vol_fit(spark, sf_dir):
    """Geometric-Brownian-motion parameter fit of the daily revenue
    series: per-day log returns, their mean (drift) and sample
    standard deviation (volatility), annualized with the 252-day
    convention — the Black-Scholes-world summary of a business series,
    and the volatility input a revenue-hedging or anomaly-band model
    starts from. Log returns are single IEEE expressions on exact
    integer cents rounded at 1e-9; the moment folds are exact DECIMAL
    sums of those rounded returns; every output is one terminal
    expression. Plan: day rollup, one lag over the calendar frame,
    one fold."""
    daily = _daily(spark, sf_dir)
    ret = daily.select(
        F.round(
            F.log(
                F.col("y") * 1.0 / F.lag("y").over(Window.orderBy("day"))
            ),
            9,
        ).alias("r")
    ).where(F.col("r").isNotNull())
    f = ret.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r").cast("decimal(28,9)")).alias("s1"),
        F.sum(
            F.round(F.col("r") * F.col("r"), 15).cast("decimal(28,15)")
        ).alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sigma = F.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    return f.select(
        n.alias("n_returns"),
        (F.round(s1 / n, 9) + 0.0).alias("mu_daily"),
        F.round(sigma, 9).alias("sigma_daily"),
        (F.round(s1 / n * 252.0, 6) + 0.0).alias("mu_annualized"),
        F.round(sigma * F.sqrt(F.lit(252.0)), 6).alias(
            "sigma_annualized"
        ),
    )


# --------------------------------------------------------------------------
# Dixon's Q test for the daily-revenue extremes
# --------------------------------------------------------------------------
@register(
    "dixon_q_extremes",
    oracle=f"""
    WITH {_DAILY_SQL},
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(y) AS BIGINT) AS x1,
               CAST(MAX(y) AS BIGINT) AS xn
        FROM daily
    ),
    x2 AS (
        SELECT CAST(MIN(y) AS BIGINT) AS v FROM daily, s
        WHERE y > s.x1
    ),
    xn1 AS (
        SELECT CAST(MAX(y) AS BIGINT) AS v FROM daily, s
        WHERE y < s.xn
    )
    SELECT s.n AS n_days,
           round(s.x1 / 100.0, 2) AS min_revenue,
           round(s.xn / 100.0, 2) AS max_revenue,
           round((x2.v - s.x1) * 1.0 / (s.xn - s.x1), 9) + 0.0
               AS q_low,
           round((s.xn - xn1.v) * 1.0 / (s.xn - s.x1), 9) + 0.0
               AS q_high
    FROM s, x2, xn1
    """,
)
def dixon_q_extremes(spark, sf_dir):
    """Dixon's Q statistics for the daily-revenue extremes: Q_low =
    (x(2)-x(1))/(x(n)-x(1)) and Q_high = (x(n)-x(n-1))/(x(n)-x(1)) —
    the gap each extreme opens relative to the full range, the
    small-sample outlier screen (vs the registry's Grubbs, which
    assumes normality and uses the variance). Order statistics are
    exact integer cents via MIN/MAX and strict-inequality re-folds
    (the second-smallest is min over y > min — tie-safe by
    construction); each Q is one terminal division. Plan: one day
    rollup, three scalar folds."""
    daily = _daily(spark, sf_dir).persist()
    s = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("y").cast("bigint").alias("x1"),
        F.max("y").cast("bigint").alias("xn"),
    )
    x2 = (
        daily.crossJoin(F.broadcast(s))
        .where(F.col("y") > F.col("x1"))
        .agg(F.min("y").cast("bigint").alias("v2"))
    )
    xn1 = (
        daily.crossJoin(F.broadcast(s))
        .where(F.col("y") < F.col("xn"))
        .agg(F.max("y").cast("bigint").alias("vn1"))
    )
    return (
        s.crossJoin(F.broadcast(x2))
        .crossJoin(F.broadcast(xn1))
        .select(
            F.col("n").alias("n_days"),
            F.round(F.col("x1") / 100.0, 2).alias("min_revenue"),
            F.round(F.col("xn") / 100.0, 2).alias("max_revenue"),
            (
                F.round(
                    (F.col("v2") - F.col("x1"))
                    * 1.0
                    / (F.col("xn") - F.col("x1")),
                    9,
                )
                + 0.0
            ).alias("q_low"),
            (
                F.round(
                    (F.col("xn") - F.col("vn1"))
                    * 1.0
                    / (F.col("xn") - F.col("x1")),
                    9,
                )
                + 0.0
            ).alias("q_high"),
        )
    )


# --------------------------------------------------------------------------
# Cochran's C test for variance homogeneity across event types
# --------------------------------------------------------------------------
@register(
    "cochran_c_variance",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM daily GROUP BY event_type
    ),
    v AS (
        SELECT event_type,
               round((s2 - s1 * 1.0 * s1 / nd) / (nd - 1.0), 9) AS s2v
        FROM g WHERE nd > 1
    ),
    tot AS (
        SELECT CAST(round(SUM(CAST(round(s2v, 9) AS DECIMAL(28,9))), 9)
                    AS DOUBLE) AS vs
        FROM v
    )
    SELECT event_type,
           s2v + 0.0 AS daily_count_variance,
           round(s2v / tot.vs, 6) + 0.0 AS c_share
    FROM v, tot ORDER BY event_type
    """,
)
def cochran_c_variance(spark, sf_dir):
    """Cochran's C decomposition for variance homogeneity across the
    five event types' DAILY COUNT series: each type's variance as a
    share of the summed variances — C = max share, with 1/k the
    equal-variance reference. The max-focused member of the
    variance-homogeneity family (Bartlett is omnibus-likelihood,
    Levene/Brown-Forsythe robust-location — both in the registry);
    Cochran's is the one an SPC practitioner uses to ask "is ONE
    stream driving the instability". Variances come from exact
    integer power sums, rounded at 1e-9; shares divide by a DECIMAL
    fold of the rounded variances. Plan: (type, day) rollup, 5-row
    fold, scalar-sum broadcast."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    v = g.where(F.col("nd") > 1).select(
        "event_type",
        F.round(
            (
                F.col("s2")
                - F.col("s1") * 1.0 * F.col("s1") / F.col("nd")
            )
            / (F.col("nd") - 1.0),
            9,
        ).alias("s2v"),
    ).persist()
    tot = v.agg(
        F.round(
            F.sum(F.round(F.col("s2v"), 9).cast("decimal(28,9)")), 9
        )
        .cast("double")
        .alias("vs")
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            (F.col("s2v") + 0.0).alias("daily_count_variance"),
            (F.round(F.col("s2v") / F.col("vs"), 6) + 0.0).alias(
                "c_share"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Page-Hinkley drift statistic on the daily revenue series
# --------------------------------------------------------------------------
@register(
    "page_hinkley_drift",
    oracle=f"""
    WITH {_DAILY_SQL},
    xbar AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM daily
    ),
    m AS (
        SELECT day,
               SUM(CAST(y AS DECIMAL(38,9))
                   - CAST(round(x.s * 1.0 / x.n, 9) AS DECIMAL(38,9)))
                   OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS mt
        FROM daily, xbar x
    ),
    ph AS (
        SELECT day, mt,
               MIN(mt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS mmin
        FROM m
    )
    SELECT (SELECT n FROM xbar) AS n_days,
           round(CAST(MAX(mt - mmin) AS DOUBLE) / 100.0, 2)
               AS ph_statistic,
           CAST(MIN(CASE WHEN mt - mmin = (SELECT MAX(mt - mmin) FROM ph)
                    THEN day END) AS BIGINT) AS argmax_day
    FROM ph
    """,
)
def page_hinkley_drift(spark, sf_dir):
    """Page-Hinkley drift statistic on daily revenue: cumulative
    deviations from the global mean, PH = max_t (m_t - min_{s<=t} m_s)
    with the day attaining it — the sequential change detector
    streaming ML systems run beside CUSUM (the registry's
    cusum_changepoint_scan tests a single changepoint; Page-Hinkley is
    the monitor form whose excursion height IS the alarm statistic).
    The mean is pinned at 1e-9 and the cumulative sums are exact
    DECIMAL arithmetic over the calendar frame, so the argmax day is
    tie-broken by MIN(day) identically in both engines. Plan: day
    rollup, two cumulative windows over the bounded day frame, one
    fold."""
    daily = _daily(spark, sf_dir)
    xbar = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    wo = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = daily.crossJoin(F.broadcast(xbar)).select(
        "day",
        "n",
        F.sum(
            F.col("y").cast("decimal(38,9)")
            - F.round(F.col("s") * 1.0 / F.col("n"), 9).cast(
                "decimal(38,9)"
            )
        )
        .over(wo)
        .alias("mt"),
    )
    ph = m.select(
        "day",
        "n",
        (F.col("mt") - F.min("mt").over(wo)).alias("exc"),
    )
    mx = ph.agg(F.max("exc").alias("mexc"))
    arg = (
        ph.crossJoin(F.broadcast(mx))
        .where(F.col("exc") == F.col("mexc"))
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.min("day").cast("bigint").alias("argmax_day"),
        )
    )
    return arg.crossJoin(F.broadcast(mx)).select(
        "n_days",
        F.round(F.col("mexc").cast("double") / 100.0, 2).alias(
            "ph_statistic"
        ),
        "argmax_day",
    )


# --------------------------------------------------------------------------
# Integrated autocorrelation time of the daily revenue series
# --------------------------------------------------------------------------
@register(
    "integrated_autocorr_time",
    oracle=f"""
    WITH {_DAILY_SQL},
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM daily
    ),
    d AS (
        SELECT day,
               round(y - m.s * 1.0 / m.n, 6) AS e
        FROM daily, m
    ),
    lagged AS (
        SELECT e,
               LAG(e, 1) OVER (ORDER BY day) AS e1,
               LAG(e, 2) OVER (ORDER BY day) AS e2,
               LAG(e, 3) OVER (ORDER BY day) AS e3,
               LAG(e, 4) OVER (ORDER BY day) AS e4,
               LAG(e, 5) OVER (ORDER BY day) AS e5
        FROM d
    ),
    g AS (
        SELECT
          CAST(round(SUM(CAST(round(e * e / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g0,
          CAST(round(SUM(CAST(round(e * e1 / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g1,
          CAST(round(SUM(CAST(round(e * e2 / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g2,
          CAST(round(SUM(CAST(round(e * e3 / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g3,
          CAST(round(SUM(CAST(round(e * e4 / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g4,
          CAST(round(SUM(CAST(round(e * e5 / 1.0e6, 9)
              AS DECIMAL(38,9))), 9) AS DOUBLE) AS g5
        FROM lagged
    )
    SELECT (SELECT n FROM m) AS n_days,
           round(g1 / g0, 6) + 0.0 AS rho_1,
           round(g2 / g0, 6) + 0.0 AS rho_2,
           round(g3 / g0, 6) + 0.0 AS rho_3,
           round(g4 / g0, 6) + 0.0 AS rho_4,
           round(g5 / g0, 6) + 0.0 AS rho_5,
           round(1.0 + 2.0 * (g1 / g0 + g2 / g0 + g3 / g0
                              + g4 / g0 + g5 / g0), 6) + 0.0
               AS tau_integrated
    FROM g
    """,
)
def integrated_autocorr_time(spark, sf_dir):
    """Integrated autocorrelation time tau = 1 + 2*sum rho_k (k <= 5)
    of the daily revenue series, with the first five autocorrelations:
    the effective-sample-size deflator (n_eff = n / tau) that says how
    much the day-to-day dependence the registry's Durbin-Watson / ACF
    queries DETECT actually costs in estimator precision — the number
    an A/B power calculation on daily metrics must divide by.
    Deviations from the pinned (1e-6-rounded) mean fold as rounded
    lag products in DECIMAL (scaled by 1e6 cents^2 to keep the folds
    in range); each rho is one division of those folds. Plan: day
    rollup, one 5-lag window over the calendar frame, one fold."""
    daily = _daily(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    d = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        F.round(F.col("y") - F.col("s") * 1.0 / F.col("n"), 6).alias(
            "e"
        ),
    )
    wo = Window.orderBy("day")
    lagged = d.select(
        "n",
        "e",
        *[F.lag("e", i).over(wo).alias(f"e{i}") for i in range(1, 6)],
    )
    def fold(col):
        return (
            F.round(
                F.sum(
                    F.round(F.col("e") * col / 1.0e6, 9).cast(
                        "decimal(38,9)"
                    )
                ),
                9,
            )
            .cast("double")
        )
    g = lagged.agg(
        F.max("n").alias("n"),
        fold(F.col("e")).alias("g0"),
        *[fold(F.col(f"e{i}")).alias(f"g{i}") for i in range(1, 6)],
    )
    rhos = [F.col(f"g{i}") / F.col("g0") for i in range(1, 6)]
    return g.select(
        F.col("n").alias("n_days"),
        *[
            (F.round(r, 6) + 0.0).alias(f"rho_{i}")
            for i, r in enumerate(rhos, 1)
        ],
        (
            F.round(
                1.0
                + 2.0
                * (rhos[0] + rhos[1] + rhos[2] + rhos[3] + rhos[4]),
                6,
            )
            + 0.0
        ).alias("tau_integrated"),
    )


# --------------------------------------------------------------------------
# Gwet's AC1 agreement coefficient over the day x type busy grid
# --------------------------------------------------------------------------
@register(
    "gwet_ac1_agreement",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, ty.event_type, COALESCE(x.c, 0) AS c
        FROM (SELECT DISTINCT day FROM daily) d
        CROSS JOIN (SELECT DISTINCT event_type FROM daily) ty
        LEFT JOIN daily x
          ON x.day = d.day AND x.event_type = ty.event_type
    ),
    tym AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM grid GROUP BY event_type
    ),
    unit AS (
        SELECT g.day,
               CAST(SUM(CASE WHEN g.c * t.nd > t.s
                        THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN g.c * t.nd > t.s
                        THEN 0 ELSE 1 END) AS BIGINT) AS n0
        FROM grid g JOIN tym t ON g.event_type = t.event_type
        GROUP BY g.day
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS u,
               CAST(SUM(n1) AS BIGINT) AS t1,
               CAST(SUM(n0 + n1) AS BIGINT) AS n,
               CAST(SUM(n1 * (n1 - 1) + n0 * (n0 - 1)) AS BIGINT)
                   AS agree
        FROM unit
    )
    SELECT u AS n_units,
           round(agree / (u * 20.0), 9) AS pa,
           round((agree / (u * 20.0)
                  - 2.0 * (t1 * 1.0 / n) * (1.0 - t1 * 1.0 / n))
                 / (1.0 - 2.0 * (t1 * 1.0 / n)
                          * (1.0 - t1 * 1.0 / n)), 6) + 0.0
               AS gwet_ac1
    FROM s
    """,
)
def gwet_ac1_agreement(spark, sf_dir):
    """Gwet's AC1 agreement coefficient on the binary day x type busy
    grid (the krippendorff_alpha_binary construction, m = 5 coders per
    unit): Pa = mean within-unit pairwise agreement, and AC1's chance
    correction Pe = 2*pi*(1-pi) — designed to avoid the kappa paradox
    (kappa collapsing when the busy/quiet marginal is skewed, exactly
    when agreement is easiest). Alongside the registry's Fleiss kappa
    and the bank's Krippendorff alpha this completes the
    chance-corrected-agreement triad whose DISAGREEMENT is itself the
    diagnostic (all three close: trust any; AC1 >> kappa: marginal
    skew, not rater quality). Agreement pair counts are exact integers
    (n1(n1-1) + n0(n0-1) over 20 ordered pairs per unit); Pa and AC1
    are terminal expressions. Plan: one (day, type) rollup, domain
    grid fill, two bounded folds."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).persist()
    grid = (
        daily.select("day")
        .distinct()
        .crossJoin(F.broadcast(daily.select("event_type").distinct()))
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    tym = daily.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s")
    )
    nd = daily.select("day").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    busy = (
        grid.join(F.broadcast(tym), "event_type")
        .crossJoin(F.broadcast(nd))
        .select(
            "day",
            F.when(F.col("c") * F.col("nd") > F.col("s"), 1)
            .otherwise(0)
            .alias("v"),
        )
    )
    unit = busy.groupBy("day").agg(
        F.sum("v").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("v")).cast("bigint").alias("n0"),
    )
    s = unit.agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum(F.col("n0") + F.col("n1")).cast("bigint").alias("n"),
        F.sum(
            F.col("n1") * (F.col("n1") - 1)
            + F.col("n0") * (F.col("n0") - 1)
        )
        .cast("bigint")
        .alias("agree"),
    )
    pa = F.col("agree") / (F.col("u") * 20.0)
    pi = F.col("t1") * 1.0 / F.col("n")
    pe = 2.0 * pi * (1.0 - pi)
    return s.select(
        F.col("u").alias("n_units"),
        F.round(pa, 9).alias("pa"),
        (F.round((pa - pe) / (1.0 - pe), 6) + 0.0).alias("gwet_ac1"),
    )


# --------------------------------------------------------------------------
# Goh-Barabasi burstiness + memory coefficient per event type
# --------------------------------------------------------------------------
@register(
    "burstiness_memory_panel",
    oracle="""
    WITH gaps AS (
        SELECT event_type, user_id, ts, event_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS gap
        FROM events
    ),
    seq AS (
        SELECT event_type, gap,
               LAG(gap) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS prev_gap
        FROM gaps
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS s1,
               CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap)
                    AS DECIMAL(38,0)) AS s2
        FROM seq WHERE gap IS NOT NULL GROUP BY event_type
    ),
    p AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(gap) AS BIGINT) AS sx,
               CAST(SUM(prev_gap) AS BIGINT) AS sy,
               CAST(SUM(CAST(gap AS DECIMAL(38,0)) * prev_gap)
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(prev_gap AS DECIMAL(38,0)) * prev_gap)
                    AS DECIMAL(38,0)) AS syy
        FROM seq WHERE gap IS NOT NULL AND prev_gap IS NOT NULL
        GROUP BY event_type
    )
    SELECT g.event_type,
           g.n AS n_gaps,
           round((sqrt((CAST(g.s2 AS DOUBLE)
                        - CAST(g.s1 AS DOUBLE) * g.s1 / g.n) / g.n)
                  - g.s1 * 1.0 / g.n)
                 / (sqrt((CAST(g.s2 AS DOUBLE)
                          - CAST(g.s1 AS DOUBLE) * g.s1 / g.n) / g.n)
                    + g.s1 * 1.0 / g.n), 6) + 0.0 AS burstiness_b,
           round((p.np * CAST(p.sxy AS DOUBLE)
                  - CAST(p.sx AS DOUBLE) * p.sy)
                 / (sqrt(p.np * CAST(p.sxx AS DOUBLE)
                         - CAST(p.sx AS DOUBLE) * p.sx)
                    * sqrt(p.np * CAST(p.syy AS DOUBLE)
                           - CAST(p.sy AS DOUBLE) * p.sy)), 6) + 0.0
               AS memory_m
    FROM g JOIN p ON g.event_type = p.event_type
    ORDER BY g.event_type
    """,
)
def burstiness_memory_panel(spark, sf_dir):
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) and memory
    coefficient M (lag-1 Pearson of consecutive gaps) per event type,
    over per-user inter-event times: the (B, M) plane is THE standard
    classification of point-process character — Poisson sits at (0, 0),
    human activity at B > 0 (heavy-tailed gaps), periodic heartbeats
    at B < 0 — and it decides whether rate-based capacity models
    (poisson_rate_ratio, exp_rate_lr) are even admissible. Gaps are
    exact integer microseconds; all five moment folds are exact
    (gap^2 sums ride DECIMAL(38,0)); B and M are terminal expressions
    with population-sigma and Pearson conventions documented. Plan:
    two stacked lags in one user-partitioned window pass, two 5-row
    rollups, one bounded join."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        "event_type",
        "user_id",
        "ts",
        "event_id",
        (us - F.lag(us).over(wu)).alias("gap"),
    )
    seq = gaps.select(
        "event_type",
        "gap",
        F.lag("gap").over(wu).alias("prev_gap"),
    ).persist()
    g = seq.where(F.col("gap").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s1"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    p = (
        seq.where(
            F.col("gap").isNotNull() & F.col("prev_gap").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("np"),
            F.sum("gap").cast("bigint").alias("sx"),
            F.sum("prev_gap").cast("bigint").alias("sy"),
            F.sum(
                F.col("gap").cast("decimal(38,0)") * F.col("prev_gap")
            )
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(
                F.col("prev_gap").cast("decimal(38,0)")
                * F.col("prev_gap")
            )
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    sigma = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n")
        )
        / F.col("n")
    )
    mu = F.col("s1") * 1.0 / F.col("n")
    mem = (
        F.col("np") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.sqrt(
            F.col("np") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * F.sqrt(
            F.col("np") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return (
        g.join(p, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_gaps"),
            (
                F.round((sigma - mu) / (sigma + mu), 6) + 0.0
            ).alias("burstiness_b"),
            (F.round(mem, 6) + 0.0).alias("memory_m"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Expected / maximum calibration error from the document score bins
# --------------------------------------------------------------------------
@register(
    "ece_mce_calibration",
    oracle="""
    WITH b AS (
        SELECT LEAST(n_chars // 60, 9) AS bin,
               n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    g AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS s,
               CAST(SUM(y) AS BIGINT) AS o
        FROM b GROUP BY bin
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(n) AS BIGINT) AS nd,
               CAST(SUM(abs(s - 600 * o)) AS BIGINT) AS gapsum,
               MAX(round(abs(s - 600 * o) * 1.0 / (600 * n), 9))
                   AS mce
        FROM g
    )
    SELECT n_bins, nd AS n_docs,
           round(gapsum * 1.0 / (600 * nd), 9) AS ece,
           mce + 0.0 AS mce
    FROM f
    """,
)
def ece_mce_calibration(spark, sf_dir):
    """Expected and maximum calibration error of the document quality
    score (same bins and pseudo-model as score_calibration_bins /
    hosmer_lemeshow_calibration): ECE = sum_b (n_b/N)|conf_b - acc_b|,
    MCE = max_b — the two numbers a model card reports where the
    reliability diagram shows the curve and HL tests it. With score =
    n_chars/600, the per-bin gap reduces EXACTLY: (n_b/N)|conf-acc| =
    |S_b - 600 O_b| / (600 N), so ECE is one integer fold divided
    once, and MCE is a max of per-bin rationals rounded at 1e-9 —
    zero float accumulation anywhere. Plan: one 10-bin hash rollup,
    one fold."""
    d = t(spark, sf_dir, "documents")
    b = d.select(
        F.expr("least(n_chars div 60, 9)").alias("bin"),
        "n_chars",
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum("y").cast("bigint").alias("o"),
    )
    gap = F.abs(F.col("s") - 600 * F.col("o"))
    f = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n").cast("bigint").alias("nd"),
        F.sum(gap).cast("bigint").alias("gapsum"),
        F.max(
            F.round(gap * 1.0 / (600 * F.col("n")), 9)
        ).alias("mce"),
    )
    return f.select(
        "n_bins",
        F.col("nd").alias("n_docs"),
        F.round(
            F.col("gapsum") * 1.0 / (600 * F.col("nd")), 9
        ).alias("ece"),
        (F.col("mce") + 0.0).alias("mce"),
    )


# --------------------------------------------------------------------------
# Cohen's q: weekend vs weekday daily count-value correlation gap
# --------------------------------------------------------------------------
@register(
    "cohens_q_correlations",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 >= 5
                    THEN 1 ELSE 0 END AS we,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT we, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y)
                    AS DECIMAL(38,0)) AS syy
        FROM daily GROUP BY we
    ),
    r AS (
        SELECT we, n,
               round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                        * sqrt(n * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy)), 9) AS rr
        FROM g
    )
    SELECT MAX(CASE WHEN we = 1 THEN n END) AS n_weekend_days,
           MAX(CASE WHEN we = 0 THEN n END) AS n_weekday_days,
           MAX(CASE WHEN we = 1 THEN rr END) + 0.0 AS r_weekend,
           MAX(CASE WHEN we = 0 THEN rr END) + 0.0 AS r_weekday,
           round(0.5 * ln((1.0 + MAX(CASE WHEN we = 1 THEN rr END))
                          / (1.0 - MAX(CASE WHEN we = 1 THEN rr END)))
                 - 0.5 * ln((1.0 + MAX(CASE WHEN we = 0 THEN rr END))
                            / (1.0 - MAX(CASE WHEN we = 0 THEN rr END))),
                 6) + 0.0 AS cohens_q
    FROM r
    """,
)
def cohens_q_correlations(spark, sf_dir):
    """Cohen's q — the effect size for COMPARING two correlations:
    Fisher-z-transform the weekend and weekday daily count-value
    Pearson correlations and difference them (q ~ 0.1/0.3/0.5 small/
    medium/large). Answers "does volume couple to revenue differently
    on weekends" in a metric that is variance-stabilized, where a raw
    r gap is not comparable across base levels. Correlations come from
    exact integer power sums (y^2 rides DECIMAL(38,0)) rounded at
    1e-9; atanh is expressed as 0.5*ln((1+r)/(1-r)) — ln only, the
    engine's safe transcendental set. Plan: one day rollup, one 2-row
    moment fold, one pivot fold."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint")
    daily = e.groupBy(
        day.alias("day"),
        F.when((day + 4) % 7 >= 5, 1).otherwise(0).alias("we"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum((dec("value", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("y"),
    )
    g = daily.groupBy("we").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    n = F.col("n")
    rr = F.round(
        (n * F.col("sxy").cast("double") - F.col("sx").cast("double")
         * F.col("sy"))
        / (
            F.sqrt(
                n * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            * F.sqrt(
                n * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy")
            )
        ),
        9,
    )
    r = g.select("we", "n", rr.alias("rr"))
    agg = r.agg(
        F.max(F.when(F.col("we") == 1, F.col("n"))).alias(
            "n_weekend_days"
        ),
        F.max(F.when(F.col("we") == 0, F.col("n"))).alias(
            "n_weekday_days"
        ),
        F.max(F.when(F.col("we") == 1, F.col("rr"))).alias("r1"),
        F.max(F.when(F.col("we") == 0, F.col("rr"))).alias("r0"),
    )
    def fisher_z(c):
        return 0.5 * F.log((1.0 + c) / (1.0 - c))
    return agg.select(
        "n_weekend_days",
        "n_weekday_days",
        (F.col("r1") + 0.0).alias("r_weekend"),
        (F.col("r0") + 0.0).alias("r_weekday"),
        (
            F.round(
                fisher_z(F.col("r1")) - fisher_z(F.col("r0")), 6
            )
            + 0.0
        ).alias("cohens_q"),
    )


# --------------------------------------------------------------------------
# Gini inequality of the co-purchase degree distribution
# --------------------------------------------------------------------------
@register(
    "degree_gini_inequality",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT pk, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT p1 AS pk FROM edges
              UNION ALL SELECT p2 FROM edges)
        GROUP BY pk
    ),
    dist AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM deg GROUP BY d
    ),
    tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(d * c) AS BIGINT) AS s
        FROM dist
    ),
    pairs AS (
        SELECT CAST(SUM(a.c * b.c * (b.d - a.d)) AS BIGINT) AS absdiff
        FROM dist a JOIN dist b ON a.d < b.d
    )
    SELECT tot.n AS n_nodes,
           round(tot.s * 1.0 / tot.n, 6) AS mean_degree,
           round(2.0 * pairs.absdiff
                 / (2.0 * tot.n * tot.s), 6) + 0.0 AS degree_gini
    FROM tot, pairs
    """,
)
def degree_gini_inequality(spark, sf_dir):
    """Gini coefficient of the co-purchase graph's degree distribution:
    how concentrated product connectivity is (0 = every part equally
    connected, ->1 = a few hub products hold all the affinity). The
    graph-structural complement of the registry's revenue Gini /
    power-law tiers — and the number that predicts whether hub-salting
    is needed before any per-neighbor fan-out at scale. Uses the
    grouped pairwise identity sum|di-dj| = 2*sum_{d<e} c_d c_e (e-d)
    over the DISTINCT-DEGREE grid (bounded by the degree support, not
    the node count), so everything is exact integer arithmetic with
    one terminal division. Plan: order-blocked edge build, degree
    rollup, distinct-degree rollup, bounded triangular join."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    deg = (
        edges.select(F.col("p1").alias("pk"))
        .unionAll(edges.select(F.col("p2").alias("pk")))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dist = deg.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    tot = dist.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("s"),
    )
    db = dist.select(
        F.col("d").alias("d2"), F.col("c").alias("c2")
    )
    pairs = (
        dist.join(F.broadcast(db), F.col("d") < F.col("d2"))
        .agg(
            F.sum(
                F.col("c") * F.col("c2") * (F.col("d2") - F.col("d"))
            )
            .cast("bigint")
            .alias("absdiff")
        )
    )
    return tot.crossJoin(F.broadcast(pairs)).select(
        F.col("n").alias("n_nodes"),
        F.round(F.col("s") * 1.0 / F.col("n"), 6).alias("mean_degree"),
        (
            F.round(
                2.0 * F.col("absdiff") / (2.0 * F.col("n") * F.col("s")),
                6,
            )
            + 0.0
        ).alias("degree_gini"),
    )


# --------------------------------------------------------------------------
# Benford second-digit MAD conformity of order totals
# --------------------------------------------------------------------------
@register(
    "benford_second_digit_mad",
    oracle="""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x
        FROM orders
    ),
    d2 AS (
        SELECT CAST(substr(CAST(x AS VARCHAR), 2, 1) AS BIGINT) AS dig
        FROM cents WHERE x >= 10
    ),
    obs AS (
        SELECT dig, CAST(COUNT(*) AS BIGINT) AS c FROM d2 GROUP BY dig
    ),
    grid AS (
        SELECT g.dig, COALESCE(o.c, 0) AS c,
               CASE g.dig
                 WHEN 0 THEN 0.119679269 WHEN 1 THEN 0.113890103
                 WHEN 2 THEN 0.108821499 WHEN 3 THEN 0.10432956
                 WHEN 4 THEN 0.100308202 WHEN 5 THEN 0.096677236
                 WHEN 6 THEN 0.093374736 WHEN 7 THEN 0.090351989
                 WHEN 8 THEN 0.087570054 ELSE 0.084997352 END AS p
        FROM (SELECT UNNEST(range(10)) AS dig) g
        LEFT JOIN obs o ON o.dig = g.dig
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid)
    SELECT n.n AS n_values,
           round(CAST(round(SUM(CAST(round(
                 abs(g.c * 1.0 / n.n - g.p), 12) AS DECIMAL(20,12))),
                 12) AS DOUBLE) / 10.0, 9) AS mad,
           CASE
             WHEN CAST(round(SUM(CAST(round(abs(g.c * 1.0 / n.n - g.p),
                  12) AS DECIMAL(20,12))), 12) AS DOUBLE) / 10.0
                  < 0.008 THEN 'close'
             WHEN CAST(round(SUM(CAST(round(abs(g.c * 1.0 / n.n - g.p),
                  12) AS DECIMAL(20,12))), 12) AS DOUBLE) / 10.0
                  < 0.01 THEN 'acceptable'
             WHEN CAST(round(SUM(CAST(round(abs(g.c * 1.0 / n.n - g.p),
                  12) AS DECIMAL(20,12))), 12) AS DOUBLE) / 10.0
                  < 0.012 THEN 'marginal'
             ELSE 'nonconforming' END AS nigrini_verdict
    FROM grid g, n GROUP BY n.n
    """,
)
def benford_second_digit_mad(spark, sf_dir):
    """Benford SECOND-digit MAD conformity of order totals (in exact
    cents): observed second-significant-digit shares against the
    Benford-2 expectation p_d = sum_k log10(1 + 1/(10k+d)) (embedded
    as literal constants so no cross-engine log10), summarized by
    Nigrini's mean-absolute-deviation with his published conformity
    bands. The second digit is THE forensic-accounting screen for
    psychological pricing and invented numbers (first digits pass
    while second digits pile on 0/5) — complementing the registry's
    first-digit chi2. Digits come from the integer's STRING form
    (both engines render BIGINT identically — no float log10
    boundary); per-digit gaps round at 1e-12 and fold in DECIMAL over
    the 10-row digit domain. Plan: one scan projection, one 10-row
    rollup, domain-grid fill, one fold."""
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("x")
    )
    d2 = cents.where(F.col("x") >= 10).select(
        F.expr("CAST(substr(CAST(x AS STRING), 2, 1) AS BIGINT)").alias(
            "dig"
        )
    )
    obs = d2.groupBy("dig").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    probs = [
        0.119679269, 0.113890103, 0.108821499, 0.10432956,
        0.100308202, 0.096677236, 0.093374736, 0.090351989,
        0.087570054, 0.084997352,
    ]
    p_expr = F.element_at(
        F.array(*[F.lit(p) for p in probs]), F.col("dig").cast("int") + 1
    )
    grid = (
        spark.range(10)
        .select(F.col("id").cast("bigint").alias("dig"))
        .join(F.broadcast(obs), "dig", "left")
        .select(
            "dig",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            p_expr.alias("p"),
        )
    )
    n = grid.agg(F.sum("c").cast("bigint").alias("n"))
    mad = (
        F.round(
            F.sum(
                F.round(
                    F.abs(F.col("c") * 1.0 / F.col("n") - F.col("p")),
                    12,
                ).cast("decimal(20,12)")
            ),
            12,
        ).cast("double")
        / 10.0
    )
    f = grid.crossJoin(F.broadcast(n)).groupBy("n").agg(
        mad.alias("mad_raw")
    )
    return f.select(
        F.col("n").alias("n_values"),
        F.round(F.col("mad_raw"), 9).alias("mad"),
        F.when(F.col("mad_raw") < 0.008, "close")
        .when(F.col("mad_raw") < 0.01, "acceptable")
        .when(F.col("mad_raw") < 0.012, "marginal")
        .otherwise("nonconforming")
        .alias("nigrini_verdict"),
    )


# --------------------------------------------------------------------------
# Elementary price indices (Carli / Dutot / Jevons) by ship month
# --------------------------------------------------------------------------
@register(
    "elementary_price_indices",
    oracle="""
    WITH pm AS (
        SELECT l_partkey AS pk,
               CAST(epoch_us(date_trunc('month', l_shipdate))
                    // 86400000000 AS BIGINT) AS mo,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS sp,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sq
        FROM lineitem GROUP BY 1, 2
    ),
    base AS (
        SELECT pk, sp AS sp0, sq AS sq0
        FROM pm WHERE mo = (SELECT MIN(mo) FROM pm)
    ),
    matched AS (
        SELECT pm.mo,
               round(pm.sp * 1.0 / pm.sq
                     / (b.sp0 * 1.0 / b.sq0), 9) AS rel,
               pm.sp * 1.0 / pm.sq AS pt,
               b.sp0 * 1.0 / b.sq0 AS p0
        FROM pm JOIN base b ON pm.pk = b.pk
    )
    SELECT mo AS month_day,
           CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
           round(CAST(round(SUM(CAST(round(rel, 9) AS DECIMAL(28,9))),
                 9) AS DOUBLE) / COUNT(*), 6) AS carli,
           round(CAST(round(SUM(CAST(round(pt, 6) AS DECIMAL(28,6))),
                 6) AS DOUBLE)
                 / CAST(round(SUM(CAST(round(p0, 6) AS DECIMAL(28,6))),
                   6) AS DOUBLE), 6) AS dutot,
           round(exp(CAST(round(SUM(CAST(round(ln(rel), 9)
                 AS DECIMAL(28,9))), 9) AS DOUBLE) / COUNT(*)), 6)
               AS jevons
    FROM matched GROUP BY mo ORDER BY mo
    """,
)
def elementary_price_indices(spark, sf_dir):
    """The three classical ELEMENTARY price indices per ship month
    against the first month as base, over matched parts: Carli
    (arithmetic mean of price relatives — upward-biased, famously
    banned from RPI), Dutot (ratio of average prices — quantity-proxy
    sensitive), and Jevons (geometric mean — the CPI standard since
    the Boskin report). Their SPREAD is the index-number-problem
    diagnostic the registry's Fisher index (aggregate level) cannot
    show. Unit prices are ratios of exact integer folds (cents /
    integral quantities, floor-cast); relatives and ln-relatives
    round at 1e-9 and fold in DECIMAL per month. Plan: one
    (part, month) rollup, a base-month broadcast join, one month
    rollup — all hash aggs, no windows."""
    li = t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.floor(
            F.unix_micros(F.date_trunc("month", "l_shipdate"))
            / 86_400_000_000
        )
        .cast("bigint")
        .alias("mo"),
    ).agg(
        F.sum((dec("l_extendedprice", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("sp"),
        F.sum(F.floor("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("sq"),
    ).persist()
    m0 = pm.agg(F.min("mo").alias("mo0"))
    base = (
        pm.crossJoin(F.broadcast(m0))
        .where(F.col("mo") == F.col("mo0"))
        .select(
            "pk",
            F.col("sp").alias("sp0"),
            F.col("sq").alias("sq0"),
        )
    )
    pt = F.col("sp") * 1.0 / F.col("sq")
    p0 = F.col("sp0") * 1.0 / F.col("sq0")
    matched = pm.join(base, "pk").select(
        "mo",
        F.round(pt / p0, 9).alias("rel"),
        pt.alias("pt"),
        p0.alias("p0"),
    )
    return (
        matched.groupBy(F.col("mo").alias("month_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched_parts"),
            F.round(
                F.round(
                    F.sum(
                        F.round(F.col("rel"), 9).cast("decimal(28,9)")
                    ),
                    9,
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("carli"),
            F.round(
                F.round(
                    F.sum(
                        F.round(F.col("pt"), 6).cast("decimal(28,6)")
                    ),
                    6,
                ).cast("double")
                / F.round(
                    F.sum(
                        F.round(F.col("p0"), 6).cast("decimal(28,6)")
                    ),
                    6,
                ).cast("double"),
                6,
            ).alias("dutot"),
            F.round(
                F.exp(
                    F.round(
                        F.sum(
                            F.round(F.log("rel"), 9).cast(
                                "decimal(28,9)"
                            )
                        ),
                        9,
                    ).cast("double")
                    / F.count(F.lit(1))
                ),
                6,
            ).alias("jevons"),
        )
        .orderBy("month_day")
    )


# --------------------------------------------------------------------------
# Oaxaca-Blinder decomposition of the weekend value gap
# --------------------------------------------------------------------------
@register(
    "oaxaca_blinder_gap",
    oracle="""
    WITH cell AS (
        SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 >= 5
                    THEN 1 ELSE 0 END AS we,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS s
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT we, CAST(SUM(n) AS BIGINT) AS ng FROM cell GROUP BY we
    ),
    terms AS (
        SELECT c1.event_type,
               c1.n * 1.0 / g1.ng AS w1,
               c0.n * 1.0 / g0.ng AS w0,
               c1.s * 1.0 / (100.0 * c1.n) AS m1,
               c0.s * 1.0 / (100.0 * c0.n) AS m0
        FROM cell c1
        JOIN cell c0 ON c1.event_type = c0.event_type
        JOIN g g1 ON g1.we = 1 JOIN g g0 ON g0.we = 0
        WHERE c1.we = 1 AND c0.we = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           round(CAST(round(SUM(CAST(round(w1 * m1 - w0 * m0, 9)
                 AS DECIMAL(28,9))), 9) AS DOUBLE), 6) + 0.0
               AS total_gap,
           round(CAST(round(SUM(CAST(round((w1 - w0) * m0, 9)
                 AS DECIMAL(28,9))), 9) AS DOUBLE), 6) + 0.0
               AS composition_effect,
           round(CAST(round(SUM(CAST(round(w0 * (m1 - m0), 9)
                 AS DECIMAL(28,9))), 9) AS DOUBLE), 6) + 0.0
               AS rate_effect,
           round(CAST(round(SUM(CAST(round((w1 - w0) * (m1 - m0), 9)
                 AS DECIMAL(28,9))), 9) AS DOUBLE), 6) + 0.0
               AS interaction_effect
    FROM terms
    """,
)
def oaxaca_blinder_gap(spark, sf_dir):
    """Oaxaca-Blinder (Kitagawa) decomposition of the weekend-vs-
    weekday mean event value gap over event types: gap = composition
    (weekend does MORE of the pricey event types, at weekday rates) +
    rate (each type pays differently on weekends, at weekday mix) +
    interaction — the accounting that tells a growth team whether a
    weekend premium is mix-shift or true per-event lift. The identity
    total = composition + rate + interaction holds exactly by
    construction. Weights and means are exact integer-count/cent
    ratios; the four folds run on 1e-9-rounded terms in DECIMAL over
    the 5-type domain. Plan: one (we, type) rollup, broadcast group
    totals, one 5-row fold."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86_400_000_000)
    cell = e.groupBy(
        F.when((day + 4) % 7 >= 5, 1).otherwise(0).alias("we"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((dec("value", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("s"),
    ).persist()
    g = cell.groupBy("we").agg(F.sum("n").cast("bigint").alias("ng"))
    c1 = cell.where(F.col("we") == 1).select(
        "event_type", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    c0 = cell.where(F.col("we") == 0).select(
        "event_type", F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    g1 = g.where(F.col("we") == 1).select(F.col("ng").alias("ng1"))
    g0 = g.where(F.col("we") == 0).select(F.col("ng").alias("ng0"))
    terms = (
        c1.join(c0, "event_type")
        .crossJoin(F.broadcast(g1))
        .crossJoin(F.broadcast(g0))
        .select(
            (F.col("n1") * 1.0 / F.col("ng1")).alias("w1"),
            (F.col("n0") * 1.0 / F.col("ng0")).alias("w0"),
            (F.col("s1") * 1.0 / (100.0 * F.col("n1"))).alias("m1"),
            (F.col("s0") * 1.0 / (100.0 * F.col("n0"))).alias("m0"),
        )
    )
    def fold(expr):
        return (
            F.round(
                F.round(
                    F.sum(F.round(expr, 9).cast("decimal(28,9)")), 9
                ).cast("double"),
                6,
            )
            + 0.0
        )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        fold(
            F.col("w1") * F.col("m1") - F.col("w0") * F.col("m0")
        ).alias("total_gap"),
        fold((F.col("w1") - F.col("w0")) * F.col("m0")).alias(
            "composition_effect"
        ),
        fold(F.col("w0") * (F.col("m1") - F.col("m0"))).alias(
            "rate_effect"
        ),
        fold(
            (F.col("w1") - F.col("w0")) * (F.col("m1") - F.col("m0"))
        ).alias("interaction_effect"),
    )


# --------------------------------------------------------------------------
# Indirectly standardized failure ratios (SIR) by region
# --------------------------------------------------------------------------
@register(
    "indirect_standardization_sir",
    oracle="""
    WITH tab AS (
        SELECT r.r_regionkey AS rk,
               CAST((epoch_us(o.o_orderdate) // 86400000000 + 4) % 7
                    AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                        THEN 1 ELSE 0 END) AS BIGINT) AS f
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation na ON c.c_nationkey = na.n_nationkey
        JOIN region r ON na.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ),
    rate AS (
        SELECT dow,
               CAST(SUM(f) AS BIGINT) AS tf,
               CAST(SUM(n) AS BIGINT) AS tn
        FROM tab GROUP BY dow
    ),
    reg AS (
        SELECT t.rk,
               CAST(SUM(t.n) AS BIGINT) AS n,
               CAST(SUM(t.f) AS BIGINT) AS observed,
               CAST(round(SUM(CAST(round(t.n * (r.tf * 1.0 / r.tn), 9)
                   AS DECIMAL(28,9))), 9) AS DOUBLE) AS expected
        FROM tab t JOIN rate r ON t.dow = r.dow
        GROUP BY t.rk
    )
    SELECT rk AS regionkey, n AS n_orders, observed,
           round(expected, 4) AS expected,
           round(observed / expected, 6) AS sir
    FROM reg ORDER BY rk
    """,
)
def indirect_standardization_sir(spark, sf_dir):
    """Indirectly standardized failure ratios by region: expected
    failures per region under the GLOBAL weekday-specific failure
    rates applied to each region's own weekday mix, and SIR =
    observed/expected — the epidemiology-standard adjustment (SMR)
    that separates "this region fails more" from "this region just
    orders on bad weekdays". The grouped-data companion of the
    registry's Mantel-Haenszel / Breslow-Day strata tier. Counts are
    exact integers; expected folds 1e-9-rounded n*rate terms in
    DECIMAL over the 7-row dow domain per region; SIR is one terminal
    division. Plan: three broadcast dim hops, one 35-cell rollup, a
    7-row rate broadcast, one 5-row fold."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    na = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    day = F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
    tab = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(na), "c_nationkey")
        .groupBy(
            F.col("n_regionkey").alias("rk"),
            ((day + 4) % 7).cast("bigint").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("f"),
        )
        .persist()
    )
    rate = tab.groupBy("dow").agg(
        F.sum("f").cast("bigint").alias("tf"),
        F.sum("n").cast("bigint").alias("tn"),
    )
    reg = (
        tab.join(F.broadcast(rate), "dow")
        .groupBy("rk")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("f").cast("bigint").alias("observed"),
            F.round(
                F.sum(
                    F.round(
                        F.col("n")
                        * (F.col("tf") * 1.0 / F.col("tn")),
                        9,
                    ).cast("decimal(28,9)")
                ),
                9,
            )
            .cast("double")
            .alias("expected"),
        )
    )
    return reg.select(
        F.col("rk").alias("regionkey"),
        F.col("n").alias("n_orders"),
        "observed",
        F.round(F.col("expected"), 4).alias("expected"),
        F.round(F.col("observed") / F.col("expected"), 6).alias("sir"),
    ).orderBy("regionkey")


# --------------------------------------------------------------------------
# Newsvendor optimal stock quantile + expected mismatch cost
# --------------------------------------------------------------------------
@register(
    "newsvendor_quantile",
    oracle=f"""
    WITH {_DAILY_SQL},
    dem AS (
        SELECT day, round(y / 100.0, 2) AS d FROM daily
    ),
    q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(quantile_cont(d, 0.75), 2) AS qstar
        FROM dem
    ),
    cost AS (
        SELECT
          CAST(round(SUM(CASE WHEN dem.d < q.qstar
                         THEN CAST(round(q.qstar - dem.d, 2)
                              AS DECIMAL(18,2)) END), 2) AS DOUBLE)
              AS over_sum,
          CAST(round(SUM(CASE WHEN dem.d > q.qstar
                         THEN CAST(round(dem.d - q.qstar, 2)
                              AS DECIMAL(18,2)) END), 2) AS DOUBLE)
              AS under_sum
        FROM dem, q
    )
    SELECT q.n AS n_days,
           q.qstar AS q_star,
           round(COALESCE(c.over_sum, 0.0) / q.n, 2) AS expected_overage,
           round(COALESCE(c.under_sum, 0.0) / q.n, 2)
               AS expected_underage,
           round((1.0 * COALESCE(c.over_sum, 0.0)
                  + 3.0 * COALESCE(c.under_sum, 0.0)) / q.n, 2)
               AS expected_cost
    FROM q, cost c
    """,
)
def newsvendor_quantile(spark, sf_dir):
    """Newsvendor solution for daily revenue-capacity planning:
    with underage cost cu = 3 and overage cost co = 1 the optimal
    stock level is the critical-fractile quantile q* = F^-1(cu/(cu+co))
    = the 75th percentile of daily demand, reported with the expected
    overage, underage, and total mismatch cost at q*. The one-line
    stochastic-inventory result every capacity planner actually uses —
    and a quantile-decision complement to the registry's forecast-
    accuracy tier (pinball loss EVALUATES quantile forecasts; the
    newsvendor SETS the quantile). Demand is exact cents rounded to
    2; q* is the engines' interpolated percentile; partial
    expectations fold DECIMAL cents over each side of q*. Plan: day
    rollup, one percentile fold, one conditional fold."""
    daily = _daily(spark, sf_dir)
    dem = daily.select(
        F.round(F.col("y") / 100.0, 2).alias("d")
    ).persist()
    q = dem.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.expr("percentile(d, 0.75)"), 2).alias("qstar"),
    )
    cost = dem.crossJoin(F.broadcast(q)).agg(
        F.round(
            F.sum(
                F.when(
                    F.col("d") < F.col("qstar"),
                    F.round(F.col("qstar") - F.col("d"), 2).cast(
                        "decimal(18,2)"
                    ),
                )
            ),
            2,
        )
        .cast("double")
        .alias("over_sum"),
        F.round(
            F.sum(
                F.when(
                    F.col("d") > F.col("qstar"),
                    F.round(F.col("d") - F.col("qstar"), 2).cast(
                        "decimal(18,2)"
                    ),
                )
            ),
            2,
        )
        .cast("double")
        .alias("under_sum"),
    )
    return q.crossJoin(F.broadcast(cost)).select(
        F.col("n").alias("n_days"),
        F.col("qstar").alias("q_star"),
        F.round(
            F.coalesce(F.col("over_sum"), F.lit(0.0)) / F.col("n"), 2
        ).alias("expected_overage"),
        F.round(
            F.coalesce(F.col("under_sum"), F.lit(0.0)) / F.col("n"), 2
        ).alias("expected_underage"),
        F.round(
            (
                1.0 * F.coalesce(F.col("over_sum"), F.lit(0.0))
                + 3.0 * F.coalesce(F.col("under_sum"), F.lit(0.0))
            )
            / F.col("n"),
            2,
        ).alias("expected_cost"),
    )


# --------------------------------------------------------------------------
# Tracking-signal monitor for the seasonal-naive revenue forecast
# --------------------------------------------------------------------------
@register(
    "tracking_signal_monitor",
    oracle=f"""
    WITH {_DAILY_SQL},
    fc AS (
        SELECT day, y,
               LAG(y, 7) OVER (ORDER BY day) AS yhat
        FROM daily
        QUALIFY yhat IS NOT NULL
    ),
    e AS (
        SELECT day,
               CAST(y - yhat AS BIGINT) AS err,
               CAST(abs(y - yhat) AS BIGINT) AS aerr,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
        FROM fc
    ),
    ts AS (
        SELECT day, i,
               SUM(err) OVER w AS cume,
               SUM(aerr) OVER w AS cuma
        FROM e
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    sig AS (
        SELECT day, i,
               round(cume * 1.0 * i / cuma, 6) AS tsig
        FROM ts WHERE cuma > 0
    )
    SELECT CAST(MAX(i) AS BIGINT) AS n_forecasts,
           round(MAX(CASE WHEN i = (SELECT MAX(i) FROM sig)
                     THEN tsig END), 6) + 0.0 AS ts_final,
           round(MAX(abs(tsig)), 6) AS ts_max_abs,
           CAST(SUM(CASE WHEN abs(tsig) > 4.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signal_breaches
    FROM sig
    """,
)
def tracking_signal_monitor(spark, sf_dir):
    """Tracking signal for the seasonal-naive (same-weekday-last-week)
    revenue forecast: TS_t = cumulative error / (cumulative |error| / t)
    — cumulative bias in MAD units, with the classic |TS| > 4 alarm
    band, reported as the final value, the worst excursion, and the
    breach count. The BIAS monitor that belongs next to the accuracy
    metrics the registry already has (MASE/pinball/Theil's U measure
    size of error; the tracking signal detects one-sided drift that
    accuracy metrics average away). Errors are exact integer cents;
    cumulative sums are exact integer windows over the calendar frame;
    TS is one rational per day rounded at 1e-6. Plan: day rollup, a
    lag-7 forecast window, two cumulative windows over the bounded
    day frame, one fold."""
    daily = _daily(spark, sf_dir)
    wo = Window.orderBy("day")
    fc = daily.select(
        "day", "y", F.lag("y", 7).over(wo).alias("yhat")
    ).where(F.col("yhat").isNotNull())
    e = fc.select(
        "day",
        (F.col("y") - F.col("yhat")).cast("bigint").alias("err"),
        F.abs(F.col("y") - F.col("yhat")).cast("bigint").alias("aerr"),
        F.row_number().over(wo).cast("bigint").alias("i"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ts = e.select(
        "day",
        "i",
        F.sum("err").over(wcum).alias("cume"),
        F.sum("aerr").over(wcum).alias("cuma"),
    )
    sig = ts.where(F.col("cuma") > 0).select(
        "i",
        F.round(
            F.col("cume") * 1.0 * F.col("i") / F.col("cuma"), 6
        ).alias("tsig"),
    ).persist()
    last = sig.agg(F.max("i").alias("imax"))
    return (
        sig.crossJoin(F.broadcast(last))
        .agg(
            F.max("i").cast("bigint").alias("n_forecasts"),
            (
                F.round(
                    F.max(
                        F.when(
                            F.col("i") == F.col("imax"), F.col("tsig")
                        )
                    ),
                    6,
                )
                + 0.0
            ).alias("ts_final"),
            F.round(F.max(F.abs(F.col("tsig"))), 6).alias("ts_max_abs"),
            F.sum(
                F.when(F.abs(F.col("tsig")) > 4.0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_signal_breaches"),
        )
    )


# --------------------------------------------------------------------------
# Dunn's post-hoc pairwise tests after Kruskal-Wallis (all 5 types)
# --------------------------------------------------------------------------
@register(
    "dunns_posthoc_pairs",
    oracle="""
    WITH by_val AS (
        SELECT value, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    vg AS (
        SELECT value, CAST(SUM(c) AS BIGINT) AS h FROM by_val
        GROUP BY value
    ),
    cum AS (
        SELECT value, h,
               SUM(h) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   - h AS below
        FROM vg
    ),
    ranked AS (
        SELECT b.event_type, b.c,
               (2 * cum.below + cum.h + 1) AS rank2
        FROM by_val b JOIN cum ON b.value = cum.value
    ),
    grp AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * rank2) AS BIGINT) AS rs2
        FROM ranked GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn FROM grp
    ),
    ties AS (
        SELECT CAST(SUM(h * h * h - h) AS BIGINT) AS tsum FROM vg
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round((a.rs2 * 1.0 / (2 * a.n)
                  - b.rs2 * 1.0 / (2 * b.n))
                 / sqrt((tot.nn * (tot.nn + 1.0) / 12.0
                         - ties.tsum / (12.0 * (tot.nn - 1)))
                        * (1.0 / a.n + 1.0 / b.n)), 6) + 0.0
               AS dunn_z
    FROM grp a JOIN grp b ON a.event_type < b.event_type,
         tot, ties
    ORDER BY type_a, type_b
    """,
)
def dunns_posthoc_pairs(spark, sf_dir):
    """Dunn's post-hoc pairwise z statistics for all C(5,2) event-type
    pairs after Kruskal-Wallis (which the registry already runs on
    this panel): z_ij = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 -
    T/(12(N-1))) (1/n_i + 1/n_j)) with the full tie correction T =
    sum(t^3 - t) over the tied-value groups — the test that says WHICH
    types differ once KW rejects, with the rank-variance shrunk for
    the 2-decimal grid's heavy ties. Everything lives at distinct-
    value grain: midrank x2 is an exact integer from the cumulative
    head count, group rank sums and the tie fold are exact BIGINTs,
    and each z is one terminal expression. Plan: one (value, type)
    rollup, one cumulative over the bounded value grid, a 5-row group
    fold, a bounded triangular pair join."""
    e = t(spark, sf_dir, "events")
    by_val = e.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    vg = by_val.groupBy("value").agg(
        F.sum("c").cast("bigint").alias("h")
    )
    cum = vg.select(
        "value",
        "h",
        (
            F.sum("h").over(
                Window.orderBy("value").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("h")
        ).alias("below"),
    )
    ranked = by_val.join(cum, "value").select(
        "event_type",
        "c",
        (2 * F.col("below") + F.col("h") + 1).alias("rank2"),
    )
    grp = ranked.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("rank2")).cast("bigint").alias("rs2"),
    )
    tot = grp.agg(F.sum("n").cast("bigint").alias("nn"))
    ties = vg.agg(
        F.sum(F.col("h") * F.col("h") * F.col("h") - F.col("h"))
        .cast("bigint")
        .alias("tsum")
    )
    a = grp.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("rs2").alias("rsa"),
    )
    b = grp.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("rs2").alias("rsb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
    )
    z = (
        F.col("rsa") * 1.0 / (2 * F.col("na"))
        - F.col("rsb") * 1.0 / (2 * F.col("nb"))
    ) / F.sqrt(
        (
            F.col("nn") * (F.col("nn") + 1.0) / 12.0
            - F.col("tsum") / (12.0 * (F.col("nn") - 1))
        )
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return pairs.select(
        "type_a",
        "type_b",
        (F.round(z, 6) + 0.0).alias("dunn_z"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# Cucconi location-scale omnibus test (click vs purchase)
# --------------------------------------------------------------------------
@register(
    "cucconi_test",
    oracle="""
    WITH pool AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                   AS g1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    by_val AS (
        SELECT value,
               CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(1 - g1) AS BIGINT) AS c0
        FROM pool GROUP BY value
    ),
    cum AS (
        SELECT value, c1, c0, c1 + c0 AS h,
               SUM(c1 + c0) OVER (ORDER BY value
                                  ROWS UNBOUNDED PRECEDING)
                   - (c1 + c0) AS below
        FROM by_val
    ),
    tots AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0) AS BIGINT) AS n0
        FROM by_val
    ),
    folds AS (
        SELECT
          CAST(SUM(c1 * CAST((2 * below + h + 1) AS DECIMAL(38,0))
                   * (2 * below + h + 1)) AS DECIMAL(38,0)) AS sr2x4,
          CAST(SUM(c1 * CAST((2 * (t.n1 + t.n0 + 1)
                              - (2 * below + h + 1)) AS DECIMAL(38,0))
                   * (2 * (t.n1 + t.n0 + 1) - (2 * below + h + 1)))
               AS DECIMAL(38,0)) AS sc2x4
        FROM cum, tots t
    )
    SELECT t.n1, t.n0,
           round((6.0 * (CAST(f.sr2x4 AS DOUBLE) / 4.0)
                  - t.n1 * (t.n1 + t.n0 + 1.0)
                    * (2.0 * (t.n1 + t.n0) + 1))
                 / sqrt(t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1)
                        * (2.0 * (t.n1 + t.n0) + 1)
                        * (8.0 * (t.n1 + t.n0) + 11) / 5.0), 9) + 0.0
               AS u_stat,
           round((6.0 * (CAST(f.sc2x4 AS DOUBLE) / 4.0)
                  - t.n1 * (t.n1 + t.n0 + 1.0)
                    * (2.0 * (t.n1 + t.n0) + 1))
                 / sqrt(t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1)
                        * (2.0 * (t.n1 + t.n0) + 1)
                        * (8.0 * (t.n1 + t.n0) + 11) / 5.0), 9) + 0.0
               AS v_stat,
           round(((t.n1 + t.n0) * (t.n1 + t.n0) - 4.0)
                 / ((2.0 * (t.n1 + t.n0) + 1)
                    * (8.0 * (t.n1 + t.n0) + 11)) * 2.0 - 1.0, 9)
               AS rho
    FROM folds f, tots t
    """,
)
def cucconi_test(spark, sf_dir):
    """Cucconi's location-scale components U and V (click vs purchase
    values): U standardizes the sum of SQUARED pooled midranks of
    sample 1, V the sum of squared CONTRARY ranks (N+1-R) — U moves
    with scale, V with location-and-scale, and the omnibus C =
    (U^2 + V^2 - 2 rho U V)/(2(1 - rho^2)) with rho = 2(N^2-4)/
    ((2N+1)(8N+11)) - 1 (reported as the third column so the
    one-line C is auditable) predates and often beats Lepage as the
    joint location-scale test. Midranks x2 are exact integers at
    distinct-value grain; both squared-rank folds ride DECIMAL(38,0);
    U, V, rho are terminal expressions with the no-ties moments
    (documented convention, as in the Mood/Conover twins). Plan: one
    value-grain rollup, one cumulative over the bounded value grid,
    one fold."""
    e = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    by_val = (
        e.select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
        .groupBy("value")
        .agg(
            F.sum("g1").cast("bigint").alias("c1"),
            F.sum(1 - F.col("g1")).cast("bigint").alias("c0"),
        )
    ).persist()
    h = F.col("c1") + F.col("c0")
    cum = by_val.select(
        "c1",
        "c0",
        h.alias("h"),
        (
            F.sum(h).over(
                Window.orderBy("value").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - h
        ).alias("below"),
    )
    tots = by_val.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    rank2 = 2 * F.col("below") + F.col("h") + 1
    contra2 = 2 * (F.col("n1") + F.col("n0") + 1) - rank2
    folds = cum.crossJoin(F.broadcast(tots)).agg(
        F.sum(
            F.col("c1") * rank2.cast("decimal(38,0)") * rank2
        )
        .cast("decimal(38,0)")
        .alias("sr2x4"),
        F.sum(
            F.col("c1") * contra2.cast("decimal(38,0)") * contra2
        )
        .cast("decimal(38,0)")
        .alias("sc2x4"),
    )
    out = folds.crossJoin(F.broadcast(tots))
    n1 = F.col("n1")
    n0 = F.col("n0")
    nn = n1 + n0
    denom = F.sqrt(
        n1 * 1.0 * n0 * (nn + 1) * (2.0 * nn + 1) * (8.0 * nn + 11)
        / 5.0
    )
    u = (
        6.0 * (F.col("sr2x4").cast("double") / 4.0)
        - n1 * (nn + 1.0) * (2.0 * nn + 1)
    ) / denom
    v = (
        6.0 * (F.col("sc2x4").cast("double") / 4.0)
        - n1 * (nn + 1.0) * (2.0 * nn + 1)
    ) / denom
    rho = (nn * nn - 4.0) / ((2.0 * nn + 1) * (8.0 * nn + 11)) * 2.0 - 1.0
    return out.select(
        "n1",
        "n0",
        (F.round(u, 9) + 0.0).alias("u_stat"),
        (F.round(v, 9) + 0.0).alias("v_stat"),
        F.round(rho, 9).alias("rho"),
    )


# --------------------------------------------------------------------------
# Stochastic superiority p-hat with Brunner-Munzel/DeLong variance z
# --------------------------------------------------------------------------
@register(
    "stochastic_superiority_bm",
    oracle="""
    WITH pool AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                   AS g1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    by_val AS (
        SELECT value,
               CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(1 - g1) AS BIGINT) AS c0
        FROM pool GROUP BY value
    ),
    cum AS (
        SELECT c1, c0,
               SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   - c1 AS b1,
               SUM(c0) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   - c0 AS b0
        FROM by_val
    ),
    tots AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0) AS BIGINT) AS n0
        FROM cum
    ),
    folds AS (
        SELECT
          CAST(SUM(c0 * (2 * b1 + c1)) AS BIGINT) AS a0,
          CAST(SUM(c0 * CAST((2 * b1 + c1) AS DECIMAL(38,0))
                   * (2 * b1 + c1)) AS DECIMAL(38,0)) AS bb0,
          CAST(SUM(c1 * (2 * b0 + c0)) AS BIGINT) AS a1,
          CAST(SUM(c1 * CAST((2 * b0 + c0) AS DECIMAL(38,0))
                   * (2 * b0 + c0)) AS DECIMAL(38,0)) AS bb1
        FROM cum
    )
    SELECT t.n1, t.n0,
           round(f.a0 * 1.0 / (2.0 * t.n1 * t.n0), 9) AS p_hat,
           round((f.a0 * 1.0 / (2.0 * t.n1 * t.n0) - 0.5)
                 / sqrt(((CAST(f.bb0 AS DOUBLE) - f.a0 * 1.0 * f.a0
                          / t.n0) / (4.0 * (t.n0 - 1)))
                        / (t.n0 * 1.0 * t.n1 * t.n1)
                        + ((CAST(f.bb1 AS DOUBLE) - f.a1 * 1.0 * f.a1
                            / t.n1) / (4.0 * (t.n1 - 1)))
                          / (t.n1 * 1.0 * t.n0 * t.n0)), 6) + 0.0
               AS z_stat
    FROM folds f, tots t
    """,
)
def stochastic_superiority_bm(spark, sf_dir):
    """Stochastic superiority p-hat = P(click < purchase) + 1/2
    P(tie) with the Brunner-Munzel-style studentization: the variance
    is estimated from the empirical PLACEMENT variances of each
    sample (the DeLong/BM sandwich S0^2/(n0 n1^2) + S1^2/(n1 n0^2)),
    so unlike Mann-Whitney (also in the registry) the z remains valid
    when the two samples have UNEQUAL variances — the
    Behrens-Fisher-robust effect-size test, and p_hat doubles as the
    AUC between the two distributions. Placements are exact
    half-integers at distinct-value grain (2P = 2*other-below +
    other-tied), placement power sums ride BIGINT/DECIMAL(38,0), and
    p_hat / z are terminal expressions. Plan: one value-grain rollup,
    one cumulative pair over the bounded value grid, one fold."""
    e = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    by_val = (
        e.select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
        .groupBy("value")
        .agg(
            F.sum("g1").cast("bigint").alias("c1"),
            F.sum(1 - F.col("g1")).cast("bigint").alias("c0"),
        )
    )
    wv = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = by_val.select(
        "c1",
        "c0",
        (F.sum("c1").over(wv) - F.col("c1")).alias("b1"),
        (F.sum("c0").over(wv) - F.col("c0")).alias("b0"),
    ).persist()
    tots = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    p0x2 = 2 * F.col("b1") + F.col("c1")
    q1x2 = 2 * F.col("b0") + F.col("c0")
    folds = cum.agg(
        F.sum(F.col("c0") * p0x2).cast("bigint").alias("a0"),
        F.sum(F.col("c0") * p0x2.cast("decimal(38,0)") * p0x2)
        .cast("decimal(38,0)")
        .alias("bb0"),
        F.sum(F.col("c1") * q1x2).cast("bigint").alias("a1"),
        F.sum(F.col("c1") * q1x2.cast("decimal(38,0)") * q1x2)
        .cast("decimal(38,0)")
        .alias("bb1"),
    )
    out = folds.crossJoin(F.broadcast(tots))
    n1 = F.col("n1")
    n0 = F.col("n0")
    phat = F.col("a0") * 1.0 / (2.0 * n1 * n0)
    s0 = (
        F.col("bb0").cast("double")
        - F.col("a0") * 1.0 * F.col("a0") / n0
    ) / (4.0 * (n0 - 1))
    s1 = (
        F.col("bb1").cast("double")
        - F.col("a1") * 1.0 * F.col("a1") / n1
    ) / (4.0 * (n1 - 1))
    z = (phat - 0.5) / F.sqrt(
        s0 / (n0 * 1.0 * n1 * n1) + s1 / (n1 * 1.0 * n0 * n0)
    )
    return out.select(
        "n1",
        "n0",
        F.round(phat, 9).alias("p_hat"),
        (F.round(z, 6) + 0.0).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Bland-Altman agreement limits: click-mean vs view-mean by day
# --------------------------------------------------------------------------
@register(
    "bland_altman_limits",
    oracle="""
    WITH cell AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               event_type,
               round(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) / (100.0 * COUNT(*)), 9)
                   AS m
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY 1, 2
    ),
    paired AS (
        SELECT a.day,
               round(a.m - b.m, 9) AS diff,
               round((a.m + b.m) / 2.0, 9) AS avg
        FROM cell a JOIN cell b
          ON a.day = b.day
         AND a.event_type = 'click' AND b.event_type = 'view'
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(diff AS DECIMAL(28,9))) AS s1,
               SUM(CAST(round(diff * diff, 9) AS DECIMAL(38,9))) AS s2
        FROM paired
    )
    SELECT n AS n_days,
           round(CAST(s1 AS DOUBLE) / n, 6) + 0.0 AS bias,
           round(CAST(s1 AS DOUBLE) / n
                 - 1.96 * sqrt((CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE)
                                  * CAST(s1 AS DOUBLE) / n)
                               / (n - 1.0)), 6) + 0.0 AS loa_lower,
           round(CAST(s1 AS DOUBLE) / n
                 + 1.96 * sqrt((CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE)
                                  * CAST(s1 AS DOUBLE) / n)
                               / (n - 1.0)), 6) + 0.0 AS loa_upper
    FROM f
    """,
)
def bland_altman_limits(spark, sf_dir):
    """Bland-Altman agreement analysis treating the daily mean CLICK
    value and daily mean VIEW value as two measurement methods of the
    same underlying engagement level: the bias (mean difference) and
    the 95% limits of agreement (bias +- 1.96 sd of differences) — the
    method-comparison framework that replaced correlation for
    instrument agreement (two methods can correlate at 0.99 and still
    disagree by a constant the correlation never shows; the LoA show
    it immediately). Daily means are exact cent ratios rounded at
    1e-9; difference moments fold in DECIMAL; the limits are terminal
    expressions. Plan: one (day, type) rollup, a day-keyed pair join,
    one fold."""
    e = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    cell = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("day"),
        "event_type",
    ).agg(
        F.round(
            F.sum((dec("value", 18, 2) * 100).cast("bigint"))
            / (100.0 * F.count(F.lit(1))),
            9,
        ).alias("m")
    )
    a = cell.where(F.col("event_type") == "click").select(
        "day", F.col("m").alias("ma")
    )
    b = cell.where(F.col("event_type") == "view").select(
        "day", F.col("m").alias("mb")
    )
    paired = a.join(b, "day").select(
        F.round(F.col("ma") - F.col("mb"), 9).alias("diff")
    )
    f = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("diff").cast("decimal(28,9)")).alias("s1"),
        F.sum(
            F.round(F.col("diff") * F.col("diff"), 9).cast(
                "decimal(38,9)"
            )
        ).alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sd = F.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    return f.select(
        n.alias("n_days"),
        (F.round(s1 / n, 6) + 0.0).alias("bias"),
        (F.round(s1 / n - 1.96 * sd, 6) + 0.0).alias("loa_lower"),
        (F.round(s1 / n + 1.96 * sd, 6) + 0.0).alias("loa_upper"),
    )


# --------------------------------------------------------------------------
# Spearman footrule distance between the two largest sources' rankings
# --------------------------------------------------------------------------
@register(
    "spearman_footrule_sources",
    oracle="""
    WITH tc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    top2 AS (
        SELECT source,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, source ASC)
                   AS rn
        FROM tc GROUP BY source QUALIFY rn <= 2
    ),
    sa AS (SELECT source FROM top2 WHERE rn = 1),
    sb AS (SELECT source FROM top2 WHERE rn = 2),
    shared AS (
        SELECT a.w,
               CAST(ROW_NUMBER() OVER (ORDER BY a.c DESC, a.w ASC)
                    AS BIGINT) AS ra,
               CAST(ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w ASC)
                    AS BIGINT) AS rb
        FROM (SELECT w, c FROM tc WHERE source = (SELECT * FROM sa)) a
        JOIN (SELECT w, c FROM tc WHERE source = (SELECT * FROM sb)) b
          ON a.w = b.w
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(abs(ra - rb)) AS BIGINT) AS fr
        FROM shared
    )
    SELECT k AS n_shared_terms, fr AS footrule,
           round(1.0 - 2.0 * fr
                 / (CAST(k AS DOUBLE) * k - (k % 2)), 9) + 0.0
               AS footrule_similarity
    FROM f
    """,
)
def spearman_footrule_sources(spark, sf_dir):
    """Spearman's footrule distance F = sum |rank_A(w) - rank_B(w)|
    between the two largest sources' term-frequency rankings over
    their shared vocabulary, normalized by the maximum (k^2 - [k odd])
    / 2 into a [-1, 1]-style similarity. The L1 companion of the
    registry's rank-biased overlap and Kendall tau: Diaconis-Graham
    proved F is within a factor 2 of Kendall distance, but F is
    computable in one pass with NO pairwise machinery — the cheap
    ranking-drift monitor for vocabulary shift between corpus slices.
    Ranks are unique by the (count desc, term) total order; the fold
    is an exact integer; one terminal normalization. Plan: one
    (source, term) rollup, two top-source scalar picks, one term
    equi-join, rank windows over the shared-vocabulary frame
    (vocabulary-domain-bounded), one fold."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ).persist()
    ranked_src = (
        tc.groupBy("source")
        .agg(F.sum("c").alias("tot"))
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy(F.col("tot").desc(), F.col("source")))
            .alias("rn"),
        )
        .where(F.col("rn") <= 2)
    )
    sa = ranked_src.where(F.col("rn") == 1).select(
        F.col("source").alias("src_a")
    )
    sb = ranked_src.where(F.col("rn") == 2).select(
        F.col("source").alias("src_b")
    )
    a = tc.join(
        F.broadcast(sa), tc.source == F.col("src_a")
    ).select(F.col("w"), F.col("c").alias("ca"))
    b = tc.join(
        F.broadcast(sb), tc.source == F.col("src_b")
    ).select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    shared = a.join(b, a.w == b.wb).select(
        "w",
        F.row_number()
        .over(Window.orderBy(F.col("ca").desc(), F.col("w").asc()))
        .cast("bigint")
        .alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.col("cb").desc(), F.col("w").asc()))
        .cast("bigint")
        .alias("rb"),
    )
    f = shared.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.abs(F.col("ra") - F.col("rb")))
        .cast("bigint")
        .alias("fr"),
    )
    return f.select(
        F.col("k").alias("n_shared_terms"),
        F.col("fr").alias("footrule"),
        (
            F.round(
                1.0
                - 2.0
                * F.col("fr")
                / (
                    F.col("k").cast("double") * F.col("k")
                    - (F.col("k") % 2)
                ),
                9,
            )
            + 0.0
        ).alias("footrule_similarity"),
    )


# --------------------------------------------------------------------------
# Sharpe / Sortino / Omega ratio panel of daily revenue log-returns
# --------------------------------------------------------------------------
@register(
    "sharpe_sortino_omega",
    oracle=f"""
    WITH {_DAILY_SQL},
    ret AS (
        SELECT round(ln(y * 1.0 / LAG(y) OVER (ORDER BY day)), 9) AS r
        FROM daily
        QUALIFY r IS NOT NULL
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(r AS DECIMAL(28,9))) AS s1,
               SUM(CAST(round(r * r, 15) AS DECIMAL(28,15))) AS s2,
               SUM(CASE WHEN r < 0
                   THEN CAST(round(r * r, 15) AS DECIMAL(28,15)) END)
                   AS sd2,
               SUM(CASE WHEN r > 0
                   THEN CAST(r AS DECIMAL(28,9)) END) AS sup,
               SUM(CASE WHEN r < 0
                   THEN CAST(-r AS DECIMAL(28,9)) END) AS sdn
        FROM ret
    )
    SELECT n AS n_returns,
           round((CAST(s1 AS DOUBLE) / n)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                        / (n - 1.0)), 6) + 0.0 AS sharpe_daily,
           round((CAST(s1 AS DOUBLE) / n)
                 / sqrt(CAST(sd2 AS DOUBLE) / n), 6) + 0.0
               AS sortino_daily,
           round(CAST(sup AS DOUBLE) / CAST(sdn AS DOUBLE), 6)
               AS omega_at_zero
    FROM f
    """,
)
def sharpe_sortino_omega(spark, sf_dir):
    """Risk-adjusted return panel of the daily revenue log-returns at
    a zero threshold: Sharpe (mean / full sd), Sortino (mean /
    downside deviation — only sub-threshold returns count as risk),
    and the Omega ratio (upside partial sum / downside partial sum —
    the whole-distribution gain/loss measure that needs no moment
    assumptions). Three answers to "is the growth worth the
    volatility" that disagree exactly when the return distribution is
    skewed — which the registry's GBM fit (this bank) assumes away.
    Returns are 1e-9-rounded; all five folds are exact DECIMAL; each
    ratio is a terminal expression. Plan: day rollup, one lag, one
    fold."""
    daily = _daily(spark, sf_dir)
    ret = daily.select(
        F.round(
            F.log(
                F.col("y") * 1.0 / F.lag("y").over(Window.orderBy("day"))
            ),
            9,
        ).alias("r")
    ).where(F.col("r").isNotNull())
    f = ret.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r").cast("decimal(28,9)")).alias("s1"),
        F.sum(
            F.round(F.col("r") * F.col("r"), 15).cast("decimal(28,15)")
        ).alias("s2"),
        F.sum(
            F.when(
                F.col("r") < 0,
                F.round(F.col("r") * F.col("r"), 15).cast(
                    "decimal(28,15)"
                ),
            )
        ).alias("sd2"),
        F.sum(
            F.when(F.col("r") > 0, F.col("r").cast("decimal(28,9)"))
        ).alias("sup"),
        F.sum(
            F.when(F.col("r") < 0, (-F.col("r")).cast("decimal(28,9)"))
        ).alias("sdn"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sharpe = (s1 / n) / F.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    sortino = (s1 / n) / F.sqrt(F.col("sd2").cast("double") / n)
    omega = F.col("sup").cast("double") / F.col("sdn").cast("double")
    return f.select(
        n.alias("n_returns"),
        (F.round(sharpe, 6) + 0.0).alias("sharpe_daily"),
        (F.round(sortino, 6) + 0.0).alias("sortino_daily"),
        F.round(omega, 6).alias("omega_at_zero"),
    )


# --------------------------------------------------------------------------
# Ulcer index / Martin ratio of the daily revenue level series
# --------------------------------------------------------------------------
@register(
    "ulcer_index_martin",
    oracle=f"""
    WITH {_DAILY_SQL},
    dd AS (
        SELECT day, y,
               MAX(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS peak
        FROM daily
    ),
    pct AS (
        SELECT round(100.0 * (peak - y) / peak, 9) AS drawdown_pct
        FROM dd
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(round(SUM(CAST(round(
                   drawdown_pct * drawdown_pct, 9)
                   AS DECIMAL(38,9))), 9) AS DOUBLE) AS sq,
               round(MAX(drawdown_pct), 6) AS max_dd
        FROM pct
    ),
    mu AS (
        SELECT round(CAST(SUM(CAST(round(
                   100.0 * ln(b.y * 1.0 / a.y) / (SELECT COUNT(*) - 1
                                                  FROM daily), 9)
                   AS DECIMAL(28,9)) ) AS DOUBLE), 9) AS mean_ret
        FROM (SELECT MIN(day) AS d0 FROM daily) s,
             daily a, daily b,
             (SELECT MAX(day) AS d1 FROM daily) e2
        WHERE a.day = s.d0 AND b.day = e2.d1
    )
    SELECT f.n AS n_days,
           f.max_dd AS max_drawdown_pct,
           round(sqrt(f.sq / f.n), 6) AS ulcer_index,
           round(mu.mean_ret / sqrt(f.sq / f.n), 6) + 0.0
               AS martin_ratio
    FROM f, mu
    """,
)
def ulcer_index_martin(spark, sf_dir):
    """Ulcer index of the daily revenue level — sqrt of the mean
    SQUARED percent drawdown from the running peak — with the worst
    drawdown and the Martin ratio (mean daily log-return, in percent,
    per unit of ulcer). Unlike standard deviation (which penalizes
    upside equally) the ulcer index measures only the depth AND
    duration of being underwater, which is what revenue-stream pain
    actually is; the registry's per-user drawdown query gives the
    path, this gives the portfolio-grade summary. The running peak is
    an exact integer cumulative max over the calendar frame; percent
    drawdowns round at 1e-9 and their squares fold in DECIMAL. Plan:
    day rollup, one running-max window, one fold."""
    daily = _daily(spark, sf_dir).persist()
    wo = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = daily.select(
        "day", "y", F.max("y").over(wo).alias("peak")
    )
    pct = dd.select(
        F.round(
            100.0 * (F.col("peak") - F.col("y")) / F.col("peak"), 9
        ).alias("drawdown_pct")
    )
    f = pct.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(
                F.round(
                    F.col("drawdown_pct") * F.col("drawdown_pct"), 9
                ).cast("decimal(38,9)")
            ),
            9,
        )
        .cast("double")
        .alias("sq"),
        F.round(F.max("drawdown_pct"), 6).alias("max_dd"),
    )
    nd = daily.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
    )
    first = daily.select(
        F.col("day").alias("d0"), F.col("y").alias("y0")
    )
    last = daily.select(
        F.col("day").alias("d1"), F.col("y").alias("y1")
    )
    mu = (
        nd.join(F.broadcast(first), "d0")
        .join(F.broadcast(last), "d1")
        .select(
            F.round(
                F.round(
                    (
                        100.0
                        * F.log(F.col("y1") * 1.0 / F.col("y0"))
                        / (F.col("cnt") - 1)
                    ),
                    9,
                ).cast("decimal(28,9)").cast("double"),
                9,
            ).alias("mean_ret")
        )
    )
    return f.crossJoin(F.broadcast(mu)).select(
        F.col("n").alias("n_days"),
        F.col("max_dd").alias("max_drawdown_pct"),
        F.round(F.sqrt(F.col("sq") / F.col("n")), 6).alias(
            "ulcer_index"
        ),
        (
            F.round(
                F.col("mean_ret") / F.sqrt(F.col("sq") / F.col("n")), 6
            )
            + 0.0
        ).alias("martin_ratio"),
    )


# --------------------------------------------------------------------------
# Lepage combined location-scale test (Wilcoxon^2 + Ansari-Bradley^2)
# --------------------------------------------------------------------------
@register(
    "lepage_test",
    oracle="""
    WITH pool AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                   AS g1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    by_val AS (
        SELECT value,
               CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(1 - g1) AS BIGINT) AS c0
        FROM pool GROUP BY value
    ),
    cum AS (
        SELECT c1, c0, c1 + c0 AS h,
               SUM(c1 + c0) OVER (ORDER BY value
                                  ROWS UNBOUNDED PRECEDING)
                   - (c1 + c0) AS below
        FROM by_val
    ),
    tots AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0) AS BIGINT) AS n0
        FROM cum
    ),
    folds AS (
        SELECT
          CAST(SUM(c1 * (2 * below + h + 1)) AS BIGINT) AS w2,
          CAST(SUM(c1 * LEAST(2 * below + h + 1,
                              2 * (t.n1 + t.n0 + 1)
                              - (2 * below + h + 1))) AS BIGINT) AS ab2
        FROM cum, tots t
    )
    SELECT t.n1, t.n0,
           round((f.w2 / 2.0 - t.n1 * (t.n1 + t.n0 + 1) / 2.0)
                 / sqrt(t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1) / 12.0),
                 9) + 0.0 AS z_wilcoxon,
           round((f.ab2 / 2.0
                  - CASE WHEN (t.n1 + t.n0) % 2 = 0
                         THEN t.n1 * (t.n1 + t.n0 + 2) / 4.0
                         ELSE t.n1 * (t.n1 + t.n0 + 1)
                              * (t.n1 + t.n0 + 1)
                              / (4.0 * (t.n1 + t.n0)) END)
                 / sqrt(CASE WHEN (t.n1 + t.n0) % 2 = 0
                        THEN t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 2)
                             * (t.n1 + t.n0 - 2)
                             / (48.0 * (t.n1 + t.n0 - 1))
                        ELSE t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1)
                             * (3.0 + (t.n1 + t.n0)
                                * (t.n1 + t.n0))
                             / (48.0 * (t.n1 + t.n0)
                                * (t.n1 + t.n0)) END), 9) + 0.0
               AS z_ansari,
           round(((f.w2 / 2.0 - t.n1 * (t.n1 + t.n0 + 1) / 2.0)
                  / sqrt(t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1)
                         / 12.0))
                 * ((f.w2 / 2.0 - t.n1 * (t.n1 + t.n0 + 1) / 2.0)
                    / sqrt(t.n1 * 1.0 * t.n0 * (t.n1 + t.n0 + 1)
                           / 12.0))
                 + ((f.ab2 / 2.0
                     - CASE WHEN (t.n1 + t.n0) % 2 = 0
                            THEN t.n1 * (t.n1 + t.n0 + 2) / 4.0
                            ELSE t.n1 * (t.n1 + t.n0 + 1)
                                 * (t.n1 + t.n0 + 1)
                                 / (4.0 * (t.n1 + t.n0)) END)
                    / sqrt(CASE WHEN (t.n1 + t.n0) % 2 = 0
                           THEN t.n1 * 1.0 * t.n0
                                * (t.n1 + t.n0 + 2)
                                * (t.n1 + t.n0 - 2)
                                / (48.0 * (t.n1 + t.n0 - 1))
                           ELSE t.n1 * 1.0 * t.n0
                                * (t.n1 + t.n0 + 1)
                                * (3.0 + (t.n1 + t.n0)
                                   * (t.n1 + t.n0))
                                / (48.0 * (t.n1 + t.n0)
                                   * (t.n1 + t.n0)) END))
                 * ((f.ab2 / 2.0
                     - CASE WHEN (t.n1 + t.n0) % 2 = 0
                            THEN t.n1 * (t.n1 + t.n0 + 2) / 4.0
                            ELSE t.n1 * (t.n1 + t.n0 + 1)
                                 * (t.n1 + t.n0 + 1)
                                 / (4.0 * (t.n1 + t.n0)) END)
                    / sqrt(CASE WHEN (t.n1 + t.n0) % 2 = 0
                           THEN t.n1 * 1.0 * t.n0
                                * (t.n1 + t.n0 + 2)
                                * (t.n1 + t.n0 - 2)
                                / (48.0 * (t.n1 + t.n0 - 1))
                           ELSE t.n1 * 1.0 * t.n0
                                * (t.n1 + t.n0 + 1)
                                * (3.0 + (t.n1 + t.n0)
                                   * (t.n1 + t.n0))
                                / (48.0 * (t.n1 + t.n0)
                                   * (t.n1 + t.n0)) END)), 6) + 0.0
               AS lepage_d
    FROM folds f, tots t
    """,
)
def lepage_test(spark, sf_dir):
    """Lepage's combined location-scale test D = Z_Wilcoxon^2 +
    Z_AnsariBradley^2 (click vs purchase values): the rank-test
    portmanteau for "same distribution?" when the alternative could
    be a shift, a spread change, or both — each component test (both
    separately in the registry) has power only against its own
    alternative; their squared sum is the classic omnibus, chi2(2)
    under the null. Wilcoxon uses midrank sums; Ansari-Bradley uses
    both-ends scores min(R, N+1-R), exact at distinct-value grain as
    LEAST on the 2x midrank; the parity-dependent AB moments follow
    the published even/odd-N formulas via the same CASE in both
    engines. Everything is one value-grain rollup + one cumulative +
    one fold; D is a terminal expression of two exact integers."""
    e = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    by_val = (
        e.select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("g1"),
        )
        .groupBy("value")
        .agg(
            F.sum("g1").cast("bigint").alias("c1"),
            F.sum(1 - F.col("g1")).cast("bigint").alias("c0"),
        )
    )
    h = F.col("c1") + F.col("c0")
    cum = by_val.select(
        "c1",
        "c0",
        h.alias("h"),
        (
            F.sum(h).over(
                Window.orderBy("value").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - h
        ).alias("below"),
    ).persist()
    tots = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    rank2 = 2 * F.col("below") + F.col("h") + 1
    ab2 = F.least(
        rank2, 2 * (F.col("n1") + F.col("n0") + 1) - rank2
    )
    folds = cum.crossJoin(F.broadcast(tots)).agg(
        F.sum(F.col("c1") * rank2).cast("bigint").alias("w2"),
        F.sum(F.col("c1") * ab2).cast("bigint").alias("ab2"),
    )
    out = folds.crossJoin(F.broadcast(tots))
    n1 = F.col("n1")
    n0 = F.col("n0")
    nn = n1 + n0
    zw = (F.col("w2") / 2.0 - n1 * (nn + 1) / 2.0) / F.sqrt(
        n1 * 1.0 * n0 * (nn + 1) / 12.0
    )
    e_ab = F.when(
        nn % 2 == 0, n1 * (nn + 2) / 4.0
    ).otherwise(n1 * (nn + 1) * (nn + 1) / (4.0 * nn))
    v_ab = F.when(
        nn % 2 == 0,
        n1 * 1.0 * n0 * (nn + 2) * (nn - 2) / (48.0 * (nn - 1)),
    ).otherwise(
        n1 * 1.0 * n0 * (nn + 1) * (3.0 + nn * nn)
        / (48.0 * nn * nn)
    )
    za = (F.col("ab2") / 2.0 - e_ab) / F.sqrt(v_ab)
    return out.select(
        "n1",
        "n0",
        (F.round(zw, 9) + 0.0).alias("z_wilcoxon"),
        (F.round(za, 9) + 0.0).alias("z_ansari"),
        (F.round(zw * zw + za * za, 6) + 0.0).alias("lepage_d"),
    )


# --------------------------------------------------------------------------
# Friedman aligned-ranks test (dow blocks x event-type treatments)
# --------------------------------------------------------------------------
@register(
    "friedman_aligned_ranks",
    oracle="""
    WITH cell AS (
        SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                   AS blk,
               event_type AS trt,
               round(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) / (100.0 * COUNT(*)), 9)
                   AS m
        FROM events GROUP BY 1, 2
    ),
    blkmean AS (
        SELECT blk,
               round(CAST(round(SUM(CAST(m AS DECIMAL(18,9))), 9)
                     AS DOUBLE) / COUNT(*), 9) AS bm
        FROM cell GROUP BY blk
    ),
    aligned AS (
        SELECT c.blk, c.trt, round(c.m - b.bm, 9) AS a
        FROM cell c JOIN blkmean b ON c.blk = b.blk
    ),
    rk AS (
        SELECT blk, trt,
               CAST(ROW_NUMBER() OVER (ORDER BY a, trt, blk)
                    AS BIGINT) AS r
        FROM aligned
    ),
    rt AS (
        SELECT trt, CAST(SUM(r) AS BIGINT) AS rj FROM rk GROUP BY trt
    ),
    rb AS (
        SELECT blk, CAST(SUM(r) AS BIGINT) AS ri FROM rk GROUP BY blk
    ),
    dims AS (
        SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM rb) AS BIGINT) AS nb
    ),
    f AS (
        SELECT d.k, d.nb,
               (SELECT CAST(SUM(rj * rj) AS BIGINT) FROM rt) AS srj2,
               (SELECT CAST(SUM(ri * ri) AS BIGINT) FROM rb) AS sri2
        FROM dims d
    )
    SELECT k AS n_treatments, nb AS n_blocks,
           round((k - 1.0)
                 * (srj2 - k * nb * nb
                    * (k * nb + 1.0) * (k * nb + 1) / 4.0)
                 / (k * nb * (k * nb + 1.0) * (2 * k * nb + 1) / 6.0
                    - sri2 * 1.0 / k), 6) + 0.0 AS aligned_chi2
    FROM f
    """,
)
def friedman_aligned_ranks(spark, sf_dir):
    """Friedman ALIGNED-ranks test (Hodges-Lehmann alignment) on the
    dow-block x event-type grid of mean values: subtract each block's
    mean first, rank ALL k*n aligned values in one pooled ranking,
    then chi2 = (k-1)[sum R_j^2 - kn^2(kn+1)^2/4] / [kn(kn+1)(2kn+1)/6
    - sum R_i.^2/k]. Classic Friedman (in the registry) ranks WITHIN
    blocks and wastes the between-block information the alignment
    recovers — with only k = 5 treatments per block, that power
    difference is material. Cell means are exact cent ratios rounded
    at 1e-9; aligned values and the pooled ranking live on the
    bounded 35-cell frame with a (value, trt, blk) total order; the
    statistic is one rational expression of exact integer rank sums.
    Plan: one 35-cell rollup, one block-mean broadcast, one bounded
    rank window, two bounded folds."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(
        ((F.floor(F.unix_micros("ts") / 86_400_000_000) + 4) % 7)
        .cast("bigint")
        .alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(
        F.round(
            F.sum((dec("value", 18, 2) * 100).cast("bigint"))
            / (100.0 * F.count(F.lit(1))),
            9,
        ).alias("m")
    )
    blkmean = cell.groupBy("blk").agg(
        F.round(
            F.round(
                F.sum(F.col("m").cast("decimal(18,9)")), 9
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("bm")
    )
    aligned = cell.join(F.broadcast(blkmean), "blk").select(
        "blk",
        "trt",
        F.round(F.col("m") - F.col("bm"), 9).alias("a"),
    )
    rk = aligned.select(
        "blk",
        "trt",
        F.row_number()
        .over(Window.orderBy("a", "trt", "blk"))
        .cast("bigint")
        .alias("r"),
    ).persist()
    rt = rk.groupBy("trt").agg(F.sum("r").cast("bigint").alias("rj"))
    rb = rk.groupBy("blk").agg(F.sum("r").cast("bigint").alias("ri"))
    srj2 = rt.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("rj") * F.col("rj")).cast("bigint").alias("srj2"),
    )
    sri2 = rb.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(F.col("ri") * F.col("ri")).cast("bigint").alias("sri2"),
    )
    f = srj2.crossJoin(F.broadcast(sri2))
    k = F.col("k")
    nb = F.col("nb")
    kn = k * nb
    chi2 = (
        (k - 1.0)
        * (
            F.col("srj2")
            - k * nb * nb * (kn + 1.0) * (kn + 1) / 4.0
        )
        / (
            kn * (kn + 1.0) * (2 * kn + 1) / 6.0
            - F.col("sri2") * 1.0 / k
        )
    )
    return f.select(
        k.alias("n_treatments"),
        nb.alias("n_blocks"),
        (F.round(chi2, 6) + 0.0).alias("aligned_chi2"),
    )


# --------------------------------------------------------------------------
# Winsorized correlation of daily count vs daily value
# --------------------------------------------------------------------------
@register(
    "winsorized_correlation",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    q AS (
        SELECT quantile_cont(x, 0.1) AS xlo, quantile_cont(x, 0.9) AS xhi,
               quantile_cont(y, 0.1) AS ylo, quantile_cont(y, 0.9) AS yhi
        FROM daily
    ),
    w AS (
        SELECT round(LEAST(GREATEST(d.x * 1.0, q.xlo), q.xhi), 6) AS xw,
               round(LEAST(GREATEST(d.y * 1.0, q.ylo), q.yhi), 6) AS yw
        FROM daily d, q
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(xw AS DECIMAL(28,6))) AS sx,
               SUM(CAST(yw AS DECIMAL(28,6))) AS sy,
               SUM(CAST(round(xw * xw, 6) AS DECIMAL(38,6))) AS sxx,
               SUM(CAST(round(xw * yw, 6) AS DECIMAL(38,6))) AS sxy,
               SUM(CAST(round(yw * yw, 6) AS DECIMAL(38,6))) AS syy
        FROM w
    )
    SELECT n AS n_days,
           round((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)
                             * CAST(sy AS DOUBLE))), 6) + 0.0
               AS winsorized_r
    FROM f
    """,
)
def winsorized_correlation(spark, sf_dir):
    """Winsorized Pearson correlation (10/90 clamping on BOTH margins)
    between daily event count and daily revenue: the robust
    correlation that keeps Pearson's linear interpretation while
    capping the leverage any single outlier day can exert — the
    complement of Spearman (registry) which discards magnitudes
    entirely; winsorized-r vs raw-r disagreement localizes HOW much of
    an observed correlation is a few extreme days. Clamp bounds are
    the engines' interpolated percentiles broadcast into the scan;
    clamped values round at 1e-6 and all five moment folds are exact
    DECIMAL; r is one terminal expression. Plan: day rollup, one
    percentile fold, one moment fold."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum((dec("value", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("y"),
    ).persist()
    q = daily.agg(
        F.expr("percentile(x, 0.1)").alias("xlo"),
        F.expr("percentile(x, 0.9)").alias("xhi"),
        F.expr("percentile(y, 0.1)").alias("ylo"),
        F.expr("percentile(y, 0.9)").alias("yhi"),
    )
    w = daily.crossJoin(F.broadcast(q)).select(
        F.round(
            F.least(
                F.greatest(F.col("x") * 1.0, F.col("xlo")), F.col("xhi")
            ),
            6,
        ).alias("xw"),
        F.round(
            F.least(
                F.greatest(F.col("y") * 1.0, F.col("ylo")), F.col("yhi")
            ),
            6,
        ).alias("yw"),
    )
    f = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("xw").cast("decimal(28,6)")).alias("sx"),
        F.sum(F.col("yw").cast("decimal(28,6)")).alias("sy"),
        F.sum(
            F.round(F.col("xw") * F.col("xw"), 6).cast("decimal(38,6)")
        ).alias("sxx"),
        F.sum(
            F.round(F.col("xw") * F.col("yw"), 6).cast("decimal(38,6)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("yw") * F.col("yw"), 6).cast("decimal(38,6)")
        ).alias("syy"),
    )
    n = F.col("n")
    r = (
        n * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.sqrt(
            n * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * F.sqrt(
            n * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return f.select(
        n.alias("n_days"),
        (F.round(r, 6) + 0.0).alias("winsorized_r"),
    )


# --------------------------------------------------------------------------
# Biweight midvariance of daily revenue (Tukey robust scale)
# --------------------------------------------------------------------------
@register(
    "biweight_midvariance",
    oracle=f"""
    WITH {_DAILY_SQL},
    med AS (
        SELECT round(quantile_cont(y / 100.0, 0.5), 4) AS med
        FROM daily
    ),
    madd AS (
        SELECT round(quantile_cont(abs(d.y / 100.0 - m.med), 0.5), 4)
                   AS mad
        FROM daily d, med m
    ),
    u AS (
        SELECT d.y / 100.0 - m.med AS dev,
               round((d.y / 100.0 - m.med) / (9.0 * md.mad), 12) AS ui
        FROM daily d, med m, madd md
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(round(SUM(CASE WHEN abs(ui) < 1.0
                   THEN CAST(round(dev * dev
                        * (1.0 - ui * ui) * (1.0 - ui * ui)
                        * (1.0 - ui * ui) * (1.0 - ui * ui), 6)
                        AS DECIMAL(38,6)) END), 6) AS DOUBLE) AS num,
               CAST(round(SUM(CASE WHEN abs(ui) < 1.0
                   THEN CAST(round((1.0 - ui * ui)
                        * (1.0 - 5.0 * ui * ui), 9)
                        AS DECIMAL(28,9)) END), 9) AS DOUBLE) AS den
        FROM u
    )
    SELECT f.n AS n_days,
           m.med AS median_revenue,
           md.mad AS mad_revenue,
           round(f.n * f.num / (f.den * f.den), 4) AS biweight_midvar,
           round(sqrt(f.n * f.num / (f.den * f.den)), 4)
               AS biweight_scale
    FROM f, med m, madd md
    """,
)
def biweight_midvariance(spark, sf_dir):
    """Tukey's biweight midvariance of daily revenue: a 9-MAD-bandwidth
    redescending M-estimator of scale — observations beyond 9 MADs get
    ZERO weight, so unlike the sample variance (breakdown 0) or even
    the MAD (efficiency 37%) it combines a high breakdown point with
    ~87% Gaussian efficiency; the scale estimate a robust anomaly band
    should actually use. BWMV = n sum d^2(1-u^2)^4 / [sum
    (1-u^2)(1-5u^2)]^2 over |u| < 1 with u = d/(9 MAD). Median and MAD
    are interpolated percentiles rounded at 1e-4 and broadcast;
    u rounds at 1e-12, the numerator/denominator terms at 1e-6/1e-9
    before DECIMAL folds; outputs are terminal expressions. Plan: day
    rollup, two percentile folds (median then MAD of deviations), one
    weighted fold."""
    daily = _daily(spark, sf_dir).persist()
    med = daily.agg(
        F.round(F.expr("percentile(y / 100.0, 0.5)"), 4).alias("med")
    )
    madd = daily.crossJoin(F.broadcast(med)).agg(
        F.round(
            F.expr("percentile(abs(y / 100.0 - med), 0.5)"), 4
        ).alias("mad")
    )
    u = (
        daily.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(madd))
        .select(
            (F.col("y") / 100.0 - F.col("med")).alias("dev"),
            F.round(
                (F.col("y") / 100.0 - F.col("med"))
                / (9.0 * F.col("mad")),
                12,
            ).alias("ui"),
        )
    )
    one_u2 = 1.0 - F.col("ui") * F.col("ui")
    f = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(
                F.when(
                    F.abs(F.col("ui")) < 1.0,
                    F.round(
                        F.col("dev") * F.col("dev")
                        * one_u2 * one_u2 * one_u2 * one_u2,
                        6,
                    ).cast("decimal(38,6)"),
                )
            ),
            6,
        )
        .cast("double")
        .alias("num"),
        F.round(
            F.sum(
                F.when(
                    F.abs(F.col("ui")) < 1.0,
                    F.round(
                        one_u2 * (1.0 - 5.0 * F.col("ui") * F.col("ui")),
                        9,
                    ).cast("decimal(28,9)"),
                )
            ),
            9,
        )
        .cast("double")
        .alias("den"),
    )
    bwmv = F.col("n") * F.col("num") / (F.col("den") * F.col("den"))
    return (
        f.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(madd))
        .select(
            F.col("n").alias("n_days"),
            F.col("med").alias("median_revenue"),
            F.col("mad").alias("mad_revenue"),
            F.round(bwmv, 4).alias("biweight_midvar"),
            F.round(F.sqrt(bwmv), 4).alias("biweight_scale"),
        )
    )


# --------------------------------------------------------------------------
# Rousseeuw-Croux Sn robust scale (pairwise median of medians)
# --------------------------------------------------------------------------
@register(
    "rousseeuw_sn_scale",
    oracle=f"""
    WITH {_DAILY_SQL},
    pm AS (
        SELECT a.day,
               round(quantile_cont(abs(a.y - b.y) / 100.0, 0.5), 4)
                   AS medj
        FROM daily a JOIN daily b ON a.day <> b.day
        GROUP BY a.day
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(quantile_cont(medj, 0.5), 4) AS mm
        FROM pm
    )
    SELECT n AS n_days,
           round(1.1926 * mm, 4) AS sn_scale
    FROM f
    """,
)
def rousseeuw_sn_scale(spark, sf_dir):
    """Rousseeuw-Croux Sn estimator of scale for daily revenue: Sn =
    1.1926 * med_i( med_j |x_i - x_j| ) — the 50%-breakdown robust
    scale that, unlike the MAD, needs NO location estimate and keeps
    ~58% Gaussian efficiency (MAD: 37%) while remaining meaningful for
    ASYMMETRIC distributions (the MAD implicitly assumes symmetry
    around the median). Pairwise |differences| are exact integer
    cents; both median layers are interpolated percentiles on
    1e-4-rounded values; the O(d^2) pair frame is calendar-bounded
    (the siegel_repeated_medians discipline — days don't grow with
    data volume). Plan: day rollup, one bounded self-join, two
    percentile folds."""
    daily = _daily(spark, sf_dir).persist()
    b = daily.select(
        F.col("day").alias("day2"), F.col("y").alias("y2")
    )
    pm = (
        daily.join(F.broadcast(b), F.col("day") != F.col("day2"))
        .groupBy("day")
        .agg(
            F.round(
                F.expr("percentile(abs(y - y2) / 100.0, 0.5)"), 4
            ).alias("medj")
        )
    )
    f = pm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.expr("percentile(medj, 0.5)"), 4).alias("mm"),
    )
    return f.select(
        F.col("n").alias("n_days"),
        F.round(1.1926 * F.col("mm"), 4).alias("sn_scale"),
    )


# --------------------------------------------------------------------------
# CUSUM-of-squares variance-stability scan (Brown-Durbin-Evans)
# --------------------------------------------------------------------------
@register(
    "cusum_squares_variance",
    oracle=f"""
    WITH {_DAILY_SQL},
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM daily
    ),
    e AS (
        SELECT day,
               CAST(round((y - m.s * 1.0 / m.n)
                          * (y - m.s * 1.0 / m.n) / 1.0e8, 9)
                    AS DECIMAL(38,9)) AS e2,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               m.n
        FROM daily, m
    ),
    cs AS (
        SELECT day, i, n,
               SUM(e2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS cum,
               SUM(e2) OVER () AS tot
        FROM e
    ),
    dev AS (
        SELECT day, n,
               round(abs(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                         - i * 1.0 / n), 9) AS d
        FROM cs
    ),
    mx AS (SELECT MAX(d) AS mxd FROM dev)
    SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM dev) AS n_days,
           round(mx.mxd, 6) AS cusumsq_stat,
           CAST((SELECT MIN(day) FROM dev, mx
                 WHERE dev.d = mx.mxd) AS BIGINT) AS argmax_day
    FROM mx
    """,
)
def cusum_squares_variance(spark, sf_dir):
    """CUSUM-of-squares (Brown-Durbin-Evans) variance-stability scan
    on daily revenue: S_r = cumulative squared deviation share vs the
    uniform line r/n, reporting max |S_r - r/n| and the day attaining
    it — the VARIANCE-change companion of the registry's level-change
    scans (CUSUM/Pettitt/SNHT detect mean shifts; CUSUMSQ detects
    volatility-regime breaks those miss entirely). Squared deviations
    from the pinned mean are rounded at 1e-9 (scaled by 1e8 cents^2)
    and folded in DECIMAL, so the cumulative shares are
    identical-input divisions; the argmax day tie-breaks by MIN(day).
    Plan: day rollup, two windows over the calendar frame, one max
    fold."""
    daily = _daily(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    dev_ = F.col("y") - F.col("s") * 1.0 / F.col("n")
    e = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        F.round(dev_ * dev_ / 1.0e8, 9)
        .cast("decimal(38,9)")
        .alias("e2"),
        F.row_number().over(Window.orderBy("day")).cast("bigint")
        .alias("i"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cs = e.select(
        "day",
        "i",
        "n",
        F.sum("e2").over(wcum).alias("cum"),
        F.sum("e2").over(wall).alias("tot"),
    )
    dev = cs.select(
        "day",
        "n",
        F.round(
            F.abs(
                F.col("cum").cast("double") / F.col("tot").cast("double")
                - F.col("i") * 1.0 / F.col("n")
            ),
            9,
        ).alias("d"),
    ).persist()
    mx = dev.agg(F.max("d").alias("mxd"))
    arg = (
        dev.crossJoin(F.broadcast(mx))
        .where(F.col("d") == F.col("mxd"))
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.min("day").cast("bigint").alias("argmax_day"),
        )
    )
    return arg.crossJoin(F.broadcast(mx)).select(
        "n_days",
        F.round(F.col("mxd"), 6).alias("cusumsq_stat"),
        "argmax_day",
    )


# --------------------------------------------------------------------------
# Zhang's clumpiness index of per-user event timing
# --------------------------------------------------------------------------
@register(
    "clumpiness_index_users",
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
        FROM events
    ),
    gaps AS (
        SELECT user_id,
               epoch_us(ts) - COALESCE(LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id),
                   (SELECT t0 FROM bounds)) AS gap,
               COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        FROM events
    ),
    tail AS (
        SELECT user_id,
               (SELECT t1 FROM bounds) - MAX(epoch_us(ts)) AS gap,
               CAST(MAX(cnt) AS BIGINT) AS n_ev
        FROM (SELECT user_id, ts,
                     COUNT(*) OVER (PARTITION BY user_id) AS cnt
              FROM events) GROUP BY user_id
    ),
    allgaps AS (
        SELECT user_id, gap, n_ev FROM gaps
        UNION ALL
        SELECT user_id, gap, n_ev FROM tail
    ),
    hp AS (
        SELECT user_id,
               CAST(MAX(n_ev) AS BIGINT) AS n_ev,
               round(1.0
                     + CAST(round(SUM(CASE WHEN gap > 0 THEN
                       CAST(round((gap / ((SELECT t1 FROM bounds)
                                          - (SELECT t0 FROM bounds)
                                          * 1.0))
                            * ln(gap / ((SELECT t1 FROM bounds)
                                        - (SELECT t0 FROM bounds)
                                        * 1.0)), 12)
                            AS DECIMAL(20,12)) ELSE NULL END), 12)
                       AS DOUBLE)
                       / ln(MAX(n_ev) + 1.0), 9) AS c
        FROM allgaps
        GROUP BY user_id
        HAVING MAX(n_ev) >= 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(round(SUM(CAST(round(c, 9) AS DECIMAL(28,9))), 9)
                 AS DOUBLE) / COUNT(*), 6) AS mean_clumpiness,
           round(quantile_cont(c, 0.9), 6) AS p90_clumpiness
    FROM hp
    """,
)
def clumpiness_index_users(spark, sf_dir):
    """Zhang-Bradlow-Small clumpiness index per user: with the n+1
    normalized inter-event gaps over the corpus window (boundary gaps
    included), Hp = 1 + sum x ln x / ln(n+1) — 0 for perfectly even
    visits, ->1 for one burst; reported as the user mean and p90. The
    CRM literature's third behavioral axis after recency/frequency
    (RFM is in the registry): two users with identical R and F but
    different clumpiness have measurably different churn risk. Gaps
    are exact integer microseconds against broadcast corpus bounds;
    x ln x terms round at 1e-12 and fold in DECIMAL per user; the
    corpus summary folds rounded per-user indices. Plan: one
    user-partitioned lag pass + one boundary-gap rollup, a user fold,
    one percentile fold."""
    e = t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        (us - F.coalesce(F.lag(us).over(wu), F.col("t0"))).alias(
            "gap"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_ev"),
        "t0",
        "t1",
    )
    tail = (
        e.groupBy("user_id")
        .agg(
            F.max(us).alias("mx"),
            F.count(F.lit(1)).alias("n_ev"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            (F.col("t1") - F.col("mx")).alias("gap"),
            "n_ev",
            "t0",
            "t1",
        )
    )
    allgaps = gaps.unionByName(tail)
    span = F.col("t1") - F.col("t0") * 1.0
    x = F.col("gap") / span
    hp = (
        allgaps.groupBy("user_id")
        .agg(
            F.max("n_ev").cast("bigint").alias("n_ev"),
            F.round(
                1.0
                + F.round(
                    F.sum(
                        F.when(
                            F.col("gap") > 0,
                            F.round(x * F.log(x), 12).cast(
                                "decimal(20,12)"
                            ),
                        )
                    ),
                    12,
                ).cast("double")
                / F.log(F.max("n_ev") + 1.0),
                9,
            ).alias("c"),
        )
        .where(F.col("n_ev") >= 2)
    )
    return hp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.round(
                F.sum(F.round(F.col("c"), 9).cast("decimal(28,9)")), 9
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_clumpiness"),
        F.round(F.expr("percentile(c, 0.9)"), 6).alias(
            "p90_clumpiness"
        ),
    )


# --------------------------------------------------------------------------
# Gries' deviation of proportions (DP) dispersion for top terms
# --------------------------------------------------------------------------
@register(
    "gries_dp_dispersion",
    oracle="""
    WITH tc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    srcsz AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS s FROM tc
        GROUP BY source
    ),
    corpus AS (SELECT CAST(SUM(s) AS BIGINT) AS tot FROM srcsz),
    term AS (
        SELECT w, CAST(SUM(c) AS BIGINT) AS f FROM tc GROUP BY w
    ),
    top AS (
        SELECT w, f FROM term ORDER BY f DESC, w ASC LIMIT 20
    ),
    grid AS (
        SELECT top.w, top.f, sz.source, sz.s,
               COALESCE(tc.c, 0) AS v
        FROM top CROSS JOIN srcsz sz
        LEFT JOIN tc ON tc.w = top.w AND tc.source = sz.source
    )
    SELECT w AS term, f AS n_occurrences,
           round(CAST(round(SUM(CAST(round(
                 abs(v * 1.0 / f - s * 1.0 / corpus.tot), 12)
                 AS DECIMAL(20,12))), 12) AS DOUBLE) / 2.0, 6)
               AS gries_dp
    FROM grid, corpus
    GROUP BY w, f, corpus.tot
    ORDER BY n_occurrences DESC, term ASC
    """,
)
def gries_dp_dispersion(spark, sf_dir):
    """Gries' Deviation of Proportions (DP) for the top-20 corpus
    terms: DP = 1/2 sum_s |term share in source s - source s's size
    share| — 0 when the term distributes exactly like the corpus
    (function word), ->1 when it concentrates in one source. The
    modern corpus-linguistics dispersion standard (Gries 2008) that
    fixed Juilland's D's known insensitivity to unequal corpus-part
    sizes — this bank carries both precisely because they disagree on
    size-skewed corpora, and the data's sources ARE size-skewed.
    Zero-count (term, source) cells enter via the bounded grid; every
    share is a ratio of exact integers rounded at 1e-12 and folded in
    DECIMAL over the source domain; top-k rides the (freq, term)
    total order. Plan: one (source, term) rollup, TakeOrdered 20,
    bounded grid join, one fold per term."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ).persist()
    srcsz = tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("s")
    )
    corpus = srcsz.agg(F.sum("s").cast("bigint").alias("tot"))
    term = tc.groupBy("w").agg(F.sum("c").cast("bigint").alias("f"))
    top = term.orderBy(F.col("f").desc(), F.col("w").asc()).limit(20)
    grid = (
        top.crossJoin(F.broadcast(srcsz))
        .join(tc, ["w", "source"], "left")
        .select(
            "w",
            "f",
            "s",
            F.coalesce(F.col("c"), F.lit(0)).alias("v"),
        )
    )
    return (
        grid.crossJoin(F.broadcast(corpus))
        .groupBy(F.col("w").alias("term"), F.col("f").alias("n_occurrences"))
        .agg(
            F.round(
                F.round(
                    F.sum(
                        F.round(
                            F.abs(
                                F.col("v") * 1.0 / F.col("f")
                                - F.col("s") * 1.0 / F.col("tot")
                            ),
                            12,
                        ).cast("decimal(20,12)")
                    ),
                    12,
                ).cast("double")
                / 2.0,
                6,
            ).alias("gries_dp")
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    )


# --------------------------------------------------------------------------
# Pickands tail-index estimator for order totals
# --------------------------------------------------------------------------
@register(
    "pickands_tail_estimator",
    oracle="""
    WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x
        FROM orders
    ),
    q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(quantile_cont(x, 0.875) / 100.0, 4) AS q875,
               round(quantile_cont(x, 0.75) / 100.0, 4) AS q75,
               round(quantile_cont(x, 0.5) / 100.0, 4) AS q50
        FROM v
    )
    SELECT n AS n_orders, q875, q75, q50,
           round(ln((q875 - q75) / (q75 - q50)) / ln(2.0), 6) + 0.0
               AS pickands_xi
    FROM q
    """,
)
def pickands_tail_estimator(spark, sf_dir):
    """Pickands' estimator of the extreme-value tail index xi for
    order totals: xi = ln((Q(7/8) - Q(3/4)) / (Q(3/4) - Q(1/2))) /
    ln 2 — quantile-spacing based, so unlike the registry's Hill
    estimator it is valid for ALL three EVT domains (xi > 0 heavy,
    = 0 light, < 0 bounded tails), and Hill-vs-Pickands disagreement
    is itself the "is the tail really Pareto?" diagnostic. The three
    quantiles are the engines' interpolated percentiles on exact
    integer cents, rounded at 1e-4 before the single ln ratio. Plan:
    one scan projection, one percentile fold, one scalar select."""
    o = t(spark, sf_dir, "orders")
    v = o.select(
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("x")
    )
    q = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.expr("percentile(x, 0.875)") / 100.0, 4).alias(
            "q875"
        ),
        F.round(F.expr("percentile(x, 0.75)") / 100.0, 4).alias("q75"),
        F.round(F.expr("percentile(x, 0.5)") / 100.0, 4).alias("q50"),
    )
    return q.select(
        F.col("n").alias("n_orders"),
        "q875",
        "q75",
        "q50",
        (
            F.round(
                F.log(
                    (F.col("q875") - F.col("q75"))
                    / (F.col("q75") - F.col("q50"))
                )
                / F.log(F.lit(2.0)),
                6,
            )
            + 0.0
        ).alias("pickands_xi"),
    )


# --------------------------------------------------------------------------
# Acerbi-Szekely expected-shortfall backtest (split-sample)
# --------------------------------------------------------------------------
@register(
    "es_backtest_acerbi",
    oracle=f"""
    WITH {_DAILY_SQL},
    chg AS (
        SELECT day,
               round((LAG(y) OVER (ORDER BY day) - y) / 100.0, 2)
                   AS loss
        FROM daily
        QUALIFY loss IS NOT NULL
    ),
    split AS (
        SELECT CAST(floor(quantile_cont(day, 0.5)) AS BIGINT) AS mid
        FROM chg
    ),
    est AS (
        SELECT round(quantile_cont(loss, 0.95), 2) AS var95
        FROM chg, split WHERE day <= split.mid
    ),
    es AS (
        SELECT round(CAST(round(SUM(CAST(loss AS DECIMAL(18,2))), 2)
                     AS DOUBLE) / COUNT(*), 4) AS es95
        FROM chg, split, est
        WHERE day <= split.mid AND loss >= est.var95
    ),
    test AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN c.loss > est.var95
                        THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(round(SUM(CASE WHEN c.loss > est.var95
                          THEN CAST(c.loss AS DECIMAL(18,2)) END), 2)
                    AS DOUBLE) AS viol_sum
        FROM chg c, split, est WHERE c.day > split.mid
        GROUP BY est.var95
    )
    SELECT t.n AS n_test_days, t.x AS n_violations,
           e.es95 AS es_estimate,
           CASE WHEN t.x = 0 THEN NULL
                ELSE round(COALESCE(t.viol_sum, 0.0)
                           / (t.n * 0.05 * e.es95) - 1.0, 6) + 0.0
           END AS acerbi_z2
    FROM test t, es e
    """,
)
def es_backtest_acerbi(spark, sf_dir):
    """Acerbi-Szekely Z2 backtest of the expected-shortfall estimate:
    ES95 is fitted as the mean beyond VaR95 on the first half of the
    loss series, and Z2 = sum(test-half losses beyond VaR) /
    (n * alpha * ES) - 1 should sit near 0 when the tail SEVERITY
    model is right — the Basel-FRTB companion of the Kupiec POF test
    (this bank), which only checks violation FREQUENCY; together they
    separate "too many exceptions" from "exceptions too deep". All
    losses are exact 2-rounded cents differences; ES and the
    violation sum are DECIMAL folds; Z2 is one terminal expression
    (NULL when the test half has no violations — same rule both
    engines). Plan: day rollup, lag, split percentile, two tail
    folds."""
    daily = _daily(spark, sf_dir)
    chg = daily.select(
        "day",
        F.round(
            (F.lag("y").over(Window.orderBy("day")) - F.col("y"))
            / 100.0,
            2,
        ).alias("loss"),
    ).where(F.col("loss").isNotNull()).persist()
    split = chg.agg(
        F.floor(F.expr("percentile(day, 0.5)"))
        .cast("bigint")
        .alias("mid")
    )
    est = (
        chg.crossJoin(F.broadcast(split))
        .where(F.col("day") <= F.col("mid"))
        .agg(F.round(F.expr("percentile(loss, 0.95)"), 2).alias("var95"))
    )
    es = (
        chg.crossJoin(F.broadcast(split))
        .crossJoin(F.broadcast(est))
        .where(
            (F.col("day") <= F.col("mid"))
            & (F.col("loss") >= F.col("var95"))
        )
        .agg(
            F.round(
                F.round(
                    F.sum(F.col("loss").cast("decimal(18,2)")), 2
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("es95")
        )
    )
    test = (
        chg.crossJoin(F.broadcast(split))
        .crossJoin(F.broadcast(est))
        .where(F.col("day") > F.col("mid"))
        .groupBy("var95")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("loss") > F.col("var95"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.round(
                F.sum(
                    F.when(
                        F.col("loss") > F.col("var95"),
                        F.col("loss").cast("decimal(18,2)"),
                    )
                ),
                2,
            )
            .cast("double")
            .alias("viol_sum"),
        )
    )
    return test.crossJoin(F.broadcast(es)).select(
        F.col("n").alias("n_test_days"),
        F.col("x").alias("n_violations"),
        F.col("es95").alias("es_estimate"),
        F.when(F.col("x") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.coalesce(F.col("viol_sum"), F.lit(0.0))
                / (F.col("n") * 0.05 * F.col("es95"))
                - 1.0,
                6,
            )
            + 0.0
        )
        .alias("acerbi_z2"),
    )
