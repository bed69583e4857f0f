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
