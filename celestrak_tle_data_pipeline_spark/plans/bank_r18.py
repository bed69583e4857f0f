"""Round-18 pre-staged bank (candidate X640+): STAGED, not in the live
registry — the next bank generation behind ``bank_r17`` (round 17's
flip), under the identical no-new-debt discipline: stage-only
decorator, two-SF gate mirror in ``tests/test_bank_r18.py``, sf0.1
sweeps via ``tools/bank_check.py --module bank_r18``, the dtype-family
sweep (``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r19),
plan-audit notes pre-adjudicated at authoring time, and — a HARD gate
since round 14 — the authoring-time 64x probe: every batch runs
``python tools/scale_probe.py 64 <names>`` in the session it is
authored and appends the names (+ ratios) to ``SCALING_PROBES.json``;
``tests/test_flip_readiness.py`` fails any staged name without a
ledger row (the r13 seed commits skipped the probe and became VERDICT
r13 item 2 — never again).

Seed theme: TAIL GEOMETRY AND DOMINANCE — the mean-excess plot that
diagnoses WHICH extreme-value regime the data sits in, exponential-
scores rank testing, and pointwise Lorenz dominance between periods.

Determinism disciplines inherited unchanged (bank_r11..r17
docstrings): exact integer/DECIMAL folds, round-before-fold on every
float aggregate, ``+ 0.0`` on possibly-negative-zero outputs,
total-order top-k/argmax tiebreaks, bounded-domain windows or the
ranged-rank device, the shared Abramowitz-Stegun erfc tree, and the
Acklam inverse-normal device.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}
PLAN_AUDIT_NOTES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13..r17): records the query in
    the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Mean-excess (mean residual life of exceedances) slope over thresholds
# --------------------------------------------------------------------------
@register(
    "mean_excess_slope",
    oracle="""
    WITH pts AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v
        FROM orders
    ),
    grid AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY v
    ),
    cum AS (
        SELECT v,
               SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER () AS n
        FROM grid
    ),
    qs AS (
        SELECT CAST(u.g AS BIGINT) AS k,
               (SELECT CAST(MIN(v) AS BIGINT) FROM cum
                WHERE 100 * cc >= (74 + u.g * 5) * n) AS thr
        FROM LATERAL UNNEST(range(1, 5)) AS u(g)
    ),
    me AS (
        SELECT qs.k, qs.thr,
               CAST(COUNT(*) AS BIGINT) AS m,
               round(CAST(SUM(p.v - qs.thr) AS DOUBLE)
                     / COUNT(*) / 100000.0, 8) AS mean_excess
        FROM pts p JOIN qs ON p.v > qs.thr
        GROUP BY qs.k, qs.thr
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS kk,
               CAST(SUM(CAST(round(k, 1) AS DECIMAL(18,1)))
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(mean_excess, 8)
                             AS DECIMAL(28,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(k * k, 1) AS DECIMAL(18,1)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(round(k * mean_excess, 8)
                             AS DECIMAL(28,8))) AS DOUBLE) AS sxy
        FROM me
    )
    SELECT (SELECT m FROM me WHERE k = 1) AS n_above_q79,
           (SELECT round(mean_excess, 6) + 0.0 FROM me
            WHERE k = 1) AS me_at_q79,
           (SELECT round(mean_excess, 6) + 0.0 FROM me
            WHERE k = 4) AS me_at_q94,
           round((fit.kk * fit.sxy - fit.sx * fit.sy)
                 / (fit.kk * fit.sxx - fit.sx * fit.sx), 8) + 0.0
               AS me_slope_per_step
    FROM fit
    """,
)
def mean_excess_slope(spark, sf_dir):
    """MEAN-EXCESS plot slope of order values over the exact lower
    79/84/89/94-percentile thresholds: e(u) = E[X - u | X > u] at
    four thresholds plus the fitted slope — the EVT diagnostic that
    names the tail regime BEFORE any fit: rising mean excess =
    heavy (Pareto) tail, flat = exponential, falling = bounded —
    exactly the qualitative call that decides between the
    registry's `hill_tail_exponent` / `dekkers_moment_tail` /
    `pot_gpd_pwm_fit` machinery and a plain exponential model; the
    slope relates to the GPD shape by slope = xi/(1-xi) on a
    linear ME plot.

    Exactness: thresholds are exact order statistics from the
    cents-grid cumulative; per-threshold excess sums are exact
    BIGINTs; the 4-point slope folds rounded terms through
    DECIMAL. Plan: one value-grid cumulative, one 4-threshold
    filtered join, two folds."""
    o = t(spark, sf_dir, "orders")
    pts = o.select(
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("v")
    ).persist()
    grid = pts.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = grid.select(
        "v",
        F.sum("c")
        .over(
            Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    ).persist()
    ks = spark.range(1, 5).select(
        F.col("id").cast("bigint").alias("k")
    )
    qs = (
        cum.crossJoin(F.broadcast(ks))
        .where(100 * F.col("cc") >= (74 + F.col("k") * 5) * F.col("n"))
        .groupBy("k")
        .agg(F.min("v").cast("bigint").alias("thr"))
    )
    me = (
        pts.crossJoin(F.broadcast(qs))
        .where(F.col("v") > F.col("thr"))
        .groupBy("k", "thr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.round(
                F.sum(F.col("v") - F.col("thr")).cast("double")
                / F.count(F.lit(1))
                / 100000.0,
                8,
            ).alias("mean_excess"),
        )
        .persist()
    )
    fit = me.agg(
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum(F.round(F.col("k") * 1.0, 1).cast("decimal(18,1)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.round("mean_excess", 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sy"),
        F.sum(
            F.round(F.col("k") * F.col("k") * 1.0, 1).cast(
                "decimal(18,1)"
            )
        )
        .cast("double")
        .alias("sxx"),
        F.sum(
            F.round(F.col("k") * F.col("mean_excess"), 8).cast(
                "decimal(28,8)"
            )
        )
        .cast("double")
        .alias("sxy"),
    )
    m1 = me.where(F.col("k") == 1).select(
        F.col("m").alias("n_above_q79"),
        (F.round("mean_excess", 6) + 0.0).alias("me_at_q79"),
    )
    m4 = me.where(F.col("k") == 4).select(
        (F.round("mean_excess", 6) + 0.0).alias("me_at_q94")
    )
    slope = (
        F.col("kk") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("kk") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        m1.crossJoin(F.broadcast(m4))
        .crossJoin(F.broadcast(fit))
        .select(
            "n_above_q79",
            "me_at_q79",
            "me_at_q94",
            (F.round(slope, 8) + 0.0).alias("me_slope_per_step"),
        )
    )


PLAN_AUDIT_NOTES.update(
    {
        "mean_excess_slope": (
            "one cumulative over the cents value grid for the exact "
            "thresholds (the dekkers/hill class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Pointwise Lorenz dominance of customer spend: half 1 vs half 2
# --------------------------------------------------------------------------
@register(
    "lorenz_dominance_check",
    oracle="""
    WITH lab AS (
        SELECT o_custkey AS u,
               CASE WHEN epoch_us(o_orderdate) // 86400000000
                    <= (SELECT (min(epoch_us(o_orderdate))
                                // 86400000000
                                + max(epoch_us(o_orderdate))
                                // 86400000000) // 2 FROM orders)
                    THEN 1 ELSE 2 END AS half,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents
        FROM orders
    ),
    spend AS (
        SELECT half, u, CAST(SUM(cents) AS BIGINT) AS m
        FROM lab GROUP BY half, u
    ),
    grid AS (
        SELECT half, m AS v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(m) AS BIGINT) AS tv
        FROM spend GROUP BY half, m
    ),
    cum AS (
        SELECT half, v,
               CAST(SUM(c) OVER w AS BIGINT) AS cc,
               CAST(SUM(tv) OVER w AS BIGINT) AS cv,
               CAST(SUM(c) OVER (PARTITION BY half) AS BIGINT) AS n,
               CAST(SUM(tv) OVER (PARTITION BY half) AS BIGINT)
                   AS tot
        FROM grid
        WINDOW w AS (PARTITION BY half ORDER BY v
                     ROWS UNBOUNDED PRECEDING)
    ),
    ks AS (SELECT CAST(u.g AS BIGINT) AS k
           FROM LATERAL UNNEST(range(1, 20)) AS u(g)),
    lorenz AS (
        SELECT ks.k, cum.half,
               MAX(round(CAST(cv AS DOUBLE) / tot, 10)) AS lmax
        FROM cum, ks
        WHERE 20 * cum.cc <= ks.k * cum.n
        GROUP BY ks.k, cum.half
    ),
    wide AS (
        SELECT k,
               MAX(CASE WHEN half = 1 THEN lmax END) AS l1,
               MAX(CASE WHEN half = 2 THEN lmax END) AS l2
        FROM lorenz GROUP BY k
    ),
    fold AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS kk,
               CAST(SUM(CASE WHEN l1 > l2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_h1_above,
               CAST(SUM(CASE WHEN l2 > l1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_h2_above,
               round(MAX(ABS(l1 - l2)), 8) AS max_gap
        FROM wide
    )
    SELECT kk AS n_ventiles, n_h1_above, n_h2_above,
           max_gap + 0.0 AS max_lorenz_gap,
           CAST(CASE WHEN n_h2_above = 0 AND n_h1_above > 0
                     THEN 1
                     WHEN n_h1_above = 0 AND n_h2_above > 0
                     THEN 2 ELSE 0 END AS INT)
               AS dominant_half
    FROM fold
    """,
)
def lorenz_dominance_check(spark, sf_dir):
    """Pointwise LORENZ DOMINANCE between the first- and second-half
    customer-spend distributions at the 19 ventile ordinates: one
    curve everywhere above the other means EVERY relative-
    inequality measure (Gini, Atkinson at any aversion, Theil, GE)
    agrees on which period is more equal — no index choice needed;
    curves that CROSS (both counts positive, dominant_half = 0)
    mean the inequality ranking is index-dependent and any single-
    number comparison is an editorial choice. The
    dominance-theoretic backbone under the whole inequality bench,
    applied across time; the distributional sibling of
    `shorrocks_mobility_index` (who moved) and `gini` deltas
    (how much).

    Exactness: per-half Lorenz ordinates are exact cumulative-
    value/total ratios at exact head-count ventile cuts on the
    half-PARTITIONED spend grids, rounded at 10 dp; dominance
    counts are exact. Plan: one customer rollup, partitioned grid
    cumulatives, a 19-ventile bounded cross, two folds."""
    o = t(spark, sf_dir, "orders")
    cut = o.agg(
        (
            (
                F.floor(F.min(F.unix_micros("o_orderdate")) / 86_400_000_000)
                + F.floor(
                    F.max(F.unix_micros("o_orderdate")) / 86_400_000_000
                )
            )
            / 2
        )
        .cast("bigint")
        .alias("c")
    )
    lab = o.crossJoin(F.broadcast(cut)).select(
        F.col("o_custkey").alias("u"),
        F.when(
            F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
            <= F.col("c"),
            1,
        )
        .otherwise(2)
        .alias("half"),
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("cents"),
    )
    spend = lab.groupBy("half", "u").agg(
        F.sum("cents").cast("bigint").alias("m")
    )
    grid = spend.groupBy("half", F.col("m").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("m").cast("bigint").alias("tv"),
    )
    w = (
        Window.partitionBy("half")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "half",
        "v",
        F.sum("c").over(w).cast("bigint").alias("cc"),
        F.sum("tv").over(w).cast("bigint").alias("cv"),
        F.sum("c")
        .over(Window.partitionBy("half"))
        .cast("bigint")
        .alias("n"),
        F.sum("tv")
        .over(Window.partitionBy("half"))
        .cast("bigint")
        .alias("tot"),
    )
    ks = spark.range(1, 20).select(
        F.col("id").cast("bigint").alias("k")
    )
    lorenz = (
        cum.crossJoin(F.broadcast(ks))
        .where(20 * F.col("cc") <= F.col("k") * F.col("n"))
        .groupBy("k", "half")
        .agg(
            F.max(
                F.round(
                    F.col("cv").cast("double") / F.col("tot"), 10
                )
            ).alias("lmax")
        )
    )
    wide = lorenz.groupBy("k").agg(
        F.max(F.when(F.col("half") == 1, F.col("lmax"))).alias("l1"),
        F.max(F.when(F.col("half") == 2, F.col("lmax"))).alias("l2"),
    )
    fold = wide.agg(
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum(F.when(F.col("l1") > F.col("l2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_h1_above"),
        F.sum(F.when(F.col("l2") > F.col("l1"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_h2_above"),
        F.round(F.max(F.abs(F.col("l1") - F.col("l2"))), 8).alias(
            "max_gap"
        ),
    )
    return fold.select(
        F.col("kk").alias("n_ventiles"),
        "n_h1_above",
        "n_h2_above",
        (F.col("max_gap") + 0.0).alias("max_lorenz_gap"),
        F.when(
            (F.col("n_h2_above") == 0) & (F.col("n_h1_above") > 0), 1
        )
        .when(
            (F.col("n_h1_above") == 0) & (F.col("n_h2_above") > 0), 2
        )
        .otherwise(0)
        .cast("int")
        .alias("dominant_half"),
    )



# --------------------------------------------------------------------------
# DKW finite-sample band check of the fitted lognormal
# --------------------------------------------------------------------------
from .stats_tests import _p_two_sided_sql  # noqa: E402


@register(
    "dkw_band_lognormal_check",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v,
               round(ln(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) / 100000.0), 10) AS l
        FROM orders
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(round(l, 10) AS DECIMAL(28,10)))
                          AS DOUBLE) / COUNT(*), 10) AS mu,
               round(sqrt((CAST(SUM(CAST(round(l * l, 10)
                                AS DECIMAL(28,10))) AS DOUBLE)
                           - pow(CAST(SUM(CAST(round(l, 10)
                                 AS DECIMAL(28,10))) AS DOUBLE), 2)
                             / COUNT(*)) / COUNT(*)), 10) AS sig
        FROM pts
    ),
    grid AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS f,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM grid
    ),
    dist AS (
        SELECT cum.v, cum.f, cum.n, mom.mu, mom.sig,
               round(1.0 - ({_p_two_sided_sql(
                   '(ln(cum.v / 100000.0) - mom.mu) / mom.sig')})
                     / 2.0, 12) AS cdf_hi,
               round(({_p_two_sided_sql(
                   '(ln(cum.v / 100000.0) - mom.mu) / mom.sig')})
                     / 2.0, 12) AS cdf_lo
        FROM cum, mom
    ),
    gap2 AS (
        SELECT MAX(GREATEST(
                   ABS(CAST(d.f AS DOUBLE) / d.n
                       - CASE WHEN ln(d.v / 100000.0) >= d.mu
                              THEN d.cdf_hi ELSE d.cdf_lo END),
                   ABS(CAST(d.f - 1 AS DOUBLE) / d.n
                       - CASE WHEN ln(d.v / 100000.0) >= d.mu
                              THEN d.cdf_hi ELSE d.cdf_lo END)))
                   AS supgap
        FROM dist d
    )
    SELECT mom.n AS n_orders,
           round(gap2.supgap, 8) + 0.0 AS sup_ecdf_gap,
           round(sqrt(ln(2.0 / 0.05) / (2.0 * mom.n)), 8) + 0.0
               AS dkw_epsilon_95,
           CAST(CASE WHEN gap2.supgap
                          <= sqrt(ln(2.0 / 0.05) / (2.0 * mom.n))
                     THEN 1 ELSE 0 END AS INT) AS inside_dkw_band
    FROM mom, gap2
    """,
)
def dkw_band_lognormal_check(spark, sf_dir):
    """DKW FINITE-SAMPLE band check of the fitted lognormal: the sup
    gap between the order-value ECDF (evaluated above and below
    every distinct value) and the MLE lognormal CDF, against the
    Dvoretzky-Kiefer-Wolfowitz 95% envelope sqrt(ln(2/alpha)/(2n))
    — unlike the asymptotic tests (`lilliefors_normal_fit`,
    `ks_exponential_gaps`), DKW is a NON-asymptotic guarantee: the
    band holds at every n with no critical-value table, so
    inside_dkw_band = 1 is a finite-sample certificate that the
    lognormal (the `lognormal_vs_exponential_fit` winner) is
    indistinguishable from the data at 95% — the model-acceptance
    complement to that query's model-SELECTION verdict. The
    lognormal CDF splits the shared erfc tree by the sign of the
    standardized log (identical CASE both engines).

    Exactness: mu/sigma are 10-dp rounded log-moment folds; ECDF
    counts are exact on the cents grid; the sup is an order-free
    MAX of 12-dp rounded terms. Plan: one fold, one grid
    cumulative, one fold."""
    o = t(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 18, 2) * 100).cast("bigint")
    pts = o.select(
        cents.alias("v"),
        F.round(F.log(cents / 100000.0), 10).alias("l"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(F.round("l", 10).cast("decimal(28,10)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            10,
        ).alias("mu"),
        F.round(
            F.sqrt(
                (
                    F.sum(
                        F.round(F.col("l") * F.col("l"), 10).cast(
                            "decimal(28,10)"
                        )
                    ).cast("double")
                    - F.pow(
                        F.sum(
                            F.round("l", 10).cast("decimal(28,10)")
                        ).cast("double"),
                        2,
                    )
                    / F.count(F.lit(1))
                )
                / F.count(F.lit(1))
            ),
            10,
        ).alias("sig"),
    )
    grid = pts.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = grid.select(
        "v",
        F.sum("c")
        .over(
            Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint")
        .alias("f"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    z = (F.log(F.col("v") / 100000.0) - F.col("mu")) / F.col("sig")
    x = F.abs(z) / 1.4142135623730951
    tp = 1.0 / (1.0 + 0.3275911 * x)
    ptwo = (
        (
            ((1.061405429 * tp - 1.453152027) * tp + 1.421413741) * tp
            - 0.284496736
        )
        * tp
        + 0.254829592
    ) * tp * F.exp(-x * x)
    cdf_hi = F.round(1.0 - ptwo / 2.0, 12)
    cdf_lo = F.round(ptwo / 2.0, 12)
    dist = cum.crossJoin(F.broadcast(mom)).select(
        "v",
        "f",
        cum.n.alias("nn"),
        "mu",
        "sig",
        cdf_hi.alias("cdf_hi"),
        cdf_lo.alias("cdf_lo"),
    )
    cdf = F.when(
        F.log(F.col("v") / 100000.0) >= F.col("mu"), F.col("cdf_hi")
    ).otherwise(F.col("cdf_lo"))
    gap2 = dist.agg(
        F.max(
            F.greatest(
                F.abs(F.col("f").cast("double") / F.col("nn") - cdf),
                F.abs(
                    (F.col("f") - 1).cast("double") / F.col("nn") - cdf
                ),
            )
        ).alias("supgap")
    )
    return mom.crossJoin(F.broadcast(gap2)).select(
        F.col("n").alias("n_orders"),
        (F.round("supgap", 8) + 0.0).alias("sup_ecdf_gap"),
        (
            F.round(
                F.sqrt(F.log(F.lit(2.0 / 0.05)) / (2.0 * F.col("n"))),
                8,
            )
            + 0.0
        ).alias("dkw_epsilon_95"),
        F.when(
            F.col("supgap")
            <= F.sqrt(F.log(F.lit(2.0 / 0.05)) / (2.0 * F.col("n"))),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("inside_dkw_band"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "dkw_band_lognormal_check": (
            "one cumulative over the cents value grid for the exact "
            "ECDF (the lilliefors / moods class)"
        ),
    }
)
