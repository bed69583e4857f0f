"""Round-14 pre-staged bank (candidate X443+): STAGED, not in the live
registry — the third bank generation staged ahead (bank_r13 carries
round 13's flip; this module seeds round 14's), under the identical
no-new-debt discipline: stage-only decorator, two-SF gate mirror in
``tests/test_bank_r14.py``, sf0.1 sweeps via ``tools/bank_check.py
--module bank_r14``, the dtype-family sweep, and plan-audit notes at
flip time.

Seed theme: MODERN inference at scale — split-conformal intervals,
the Poisson bootstrap (the distributed-bootstrap standard: per-row
hash-derived Poisson(1) weights need no global resample), information-
criterion model weights, and paired-classifier comparison — methodology
a 100 TB training-data pipeline actually runs, expressed in the same
exact-arithmetic contract as every other bank.

Determinism disciplines inherited unchanged (bank_r11/12/13
docstrings): exact integer/DECIMAL folds, round-before-fold,
``+ 0.0`` on possibly-negative-zero outputs, total-order top-k,
bounded-domain windows only, explicit ``floor()`` before any
double->integer bucket, DOUBLE-cast literals where DuckDB would infer
DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13): records the query in the
    bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


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
# Split-conformal prediction interval for the seasonal-naive forecast
# --------------------------------------------------------------------------
@register(
    "split_conformal_interval",
    oracle=f"""
    WITH {_DAILY_SQL},
    fc AS (
        SELECT day, y,
               LAG(y, 7) OVER (ORDER BY day) AS yhat
        FROM daily
        QUALIFY yhat IS NOT NULL
    ),
    split AS (
        SELECT CAST(floor(quantile_cont(day, 0.5)) AS BIGINT) AS mid
        FROM fc
    ),
    cal AS (
        SELECT round(abs(y - yhat) / 100.0, 2) AS score
        FROM fc, split WHERE day <= split.mid
    ),
    by_score AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS c
        FROM cal GROUP BY score
    ),
    cum AS (
        SELECT score,
               SUM(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                   AS cc
        FROM by_score
    ),
    nk AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_cal,
               CAST((9 * (SUM(c) + 1) + 9) // 10 AS BIGINT) AS k
        FROM by_score
    ),
    qhat AS (
        SELECT nk.n_cal,
               MIN(CASE WHEN cum.cc >= LEAST(nk.k, nk.n_cal)
                   THEN cum.score END) AS q
        FROM cum, nk GROUP BY nk.n_cal
    ),
    test AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN abs(f.y - f.yhat) / 100.0 <= qh.q
                        THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM fc f, split, qhat qh WHERE f.day > split.mid
        GROUP BY qh.q
    )
    SELECT qh.n_cal, t.n_test,
           qh.q AS interval_half_width,
           round(t.covered * 1.0 / t.n_test, 6) AS test_coverage
    FROM qhat qh, test t
    """,
)
def split_conformal_interval(spark, sf_dir):
    """Split-conformal 90% prediction interval for the seasonal-naive
    daily-revenue forecast: the calibration half's absolute residuals
    give the conformity scores, q-hat is the ceil(0.9*(n+1))-th smallest
    score — the EXACT order statistic the conformal guarantee is
    stated for (clamped at the max score), found by a cumulative count
    over the bounded distinct-score grid, no interpolation —
    and the test half reports the achieved coverage of yhat +- q-hat.
    Distribution-free, finite-sample-guaranteed intervals from ANY
    forecaster — the modern uncertainty wrapper a pipeline puts around
    point models, next to the registry's parametric interval
    machinery. Scores are exact 2-rounded cent ratios; coverage is an
    exact integer ratio. Plan: day rollup, lag-7
    window, split percentile, one calibration fold, one test fold."""
    daily = _daily(spark, sf_dir)
    fc = daily.select(
        "day",
        "y",
        F.lag("y", 7).over(Window.orderBy("day")).alias("yhat"),
    ).where(F.col("yhat").isNotNull()).persist()
    split = fc.agg(
        F.floor(F.expr("percentile(day, 0.5)"))
        .cast("bigint")
        .alias("mid")
    )
    cal = (
        fc.crossJoin(F.broadcast(split))
        .where(F.col("day") <= F.col("mid"))
        .select(
            F.round(
                F.abs(F.col("y") - F.col("yhat")) / 100.0, 2
            ).alias("score")
        )
    )
    by_score = cal.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = by_score.select(
        "score",
        F.sum("c")
        .over(
            Window.orderBy("score").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cc"),
    )
    nk = by_score.agg(
        F.sum("c").cast("bigint").alias("n_cal"),
        ((9 * (F.sum("c") + 1) + 9) / 10)
        .cast("bigint")
        .alias("k"),
    )
    qhat = (
        cum.crossJoin(F.broadcast(nk))
        .groupBy("n_cal")
        .agg(
            F.min(
                F.when(
                    F.col("cc") >= F.least(F.col("k"), F.col("n_cal")),
                    F.col("score"),
                )
            ).alias("q")
        )
    )
    test = (
        fc.crossJoin(F.broadcast(split))
        .crossJoin(F.broadcast(qhat.select("q")))
        .where(F.col("day") > F.col("mid"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("y") - F.col("yhat")) / 100.0
                    <= F.col("q"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return qhat.join(
        test.withColumnRenamed("q", "q2"),
        F.col("q") == F.col("q2"),
    ).select(
        "n_cal",
        "n_test",
        F.col("q").alias("interval_half_width"),
        F.round(
            F.col("covered") * 1.0 / F.col("n_test"), 6
        ).alias("test_coverage"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap standard error of the mean order value
# --------------------------------------------------------------------------
# Deterministic Poisson(1) weights: u = hash(key, k)/2^32 in [0,1) maps
# through the Poisson(1) inverse CDF via literal cumulative thresholds
# (P(X<=k) for k = 0..6; the 1e-5 tail mass above 6 truncates — both
# engines share the identical literal table, so no RNG and no libm).
_POIS_CDF = [
    0.3678794412, 0.7357588824, 0.9196986030,
    0.9810118431, 0.9963401532, 0.9994058152, 0.9999167589,
]


def _pois_case(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {whens} ELSE 7 END"


@register(
    "poisson_bootstrap_se",
    oracle=f"""
    WITH v AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x
        FROM orders
    ),
    reps AS (
        SELECT v.k, v.x, r.rep,
               {_pois_case("((v.k * 2654435761 + r.rep * 40503) "
                           "% 4294967296) / 4294967296.0")} AS w
        FROM v, (SELECT UNNEST(range(1, 51)) AS rep) r
    ),
    stat AS (
        SELECT rep,
               round(SUM(w * x) / (100.0 * SUM(w)), 6) AS m
        FROM reps GROUP BY rep HAVING SUM(w) > 0
    ),
    f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS b,
               SUM(CAST(m AS DECIMAL(28,6))) AS s1,
               SUM(CAST(round(m * m, 6) AS DECIMAL(38,6))) AS s2
        FROM stat
    ),
    base AS (
        SELECT round(SUM(x) / (100.0 * COUNT(*)), 6) AS mean_value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM v
    )
    SELECT base.n AS n_orders, base.mean_value, f.b AS n_replicates,
           round(sqrt((CAST(f.s2 AS DOUBLE)
                       - CAST(f.s1 AS DOUBLE) * CAST(f.s1 AS DOUBLE)
                         / f.b) / (f.b - 1.0)), 6) AS bootstrap_se
    FROM f, base
    """,
)
def poisson_bootstrap_se(spark, sf_dir):
    """Poisson-bootstrap standard error of the mean order value, fully
    DETERMINISTIC: each (row, replicate) draws a Poisson(1) weight by
    pushing the Knuth hash u = h(key, rep)/2^32 through a literal
    inverse-CDF table (no RNG, no libm) — the bootstrap that actually
    runs at 100 TB, because Poissonization needs no global resample:
    every row weights itself independently and the 50 replicate means
    are one grouped aggregation (Google's production bootstrap). SE =
    sd of the replicate means. Weighted means are exact integer-cent
    folds divided once per replicate and rounded at 1e-6; the SE folds
    DECIMAL moments of those rounded means. Plan: one scan x 50
    broadcast replicate ids (a projection fan-out, map-side), one
    50-group rollup, one fold."""
    o = t(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("x"),
    )
    reps = spark.range(1, 51).select(F.col("id").alias("rep"))
    u = (
        ((F.col("k") * 2654435761 + F.col("rep") * 40503) % 4294967296)
        / 4294967296.0
    )
    w = F.expr(
        _pois_case(
            "((k * 2654435761 + rep * 40503) % 4294967296)"
            " / 4294967296.0"
        )
    )
    weighted = v.crossJoin(F.broadcast(reps)).select(
        "rep", "x", w.alias("w")
    )
    stat = (
        weighted.groupBy("rep")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("sw"),
            F.sum("w").alias("wsum"),
        )
        .where(F.col("wsum") > 0)
        .select(
            F.round(
                F.col("sw") / (100.0 * F.col("wsum")), 6
            ).alias("m")
        )
    )
    f = stat.agg(
        F.count(F.lit(1)).cast("bigint").alias("b"),
        F.sum(F.col("m").cast("decimal(28,6)")).alias("s1"),
        F.sum(
            F.round(F.col("m") * F.col("m"), 6).cast("decimal(38,6)")
        ).alias("s2"),
    )
    base = v.agg(
        F.round(F.sum("x") / (100.0 * F.count(F.lit(1))), 6).alias(
            "mean_value"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    se = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double")
            * F.col("s1").cast("double")
            / F.col("b")
        )
        / (F.col("b") - 1.0)
    )
    return f.crossJoin(F.broadcast(base)).select(
        F.col("n").alias("n_orders"),
        "mean_value",
        F.col("b").alias("n_replicates"),
        F.round(se, 6).alias("bootstrap_se"),
    )
