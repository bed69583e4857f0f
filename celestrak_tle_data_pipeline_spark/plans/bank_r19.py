"""Round-19 pre-staged bank (candidate X690+): STAGED, not in the live
registry — the generation behind ``bank_r18`` (round 18's flip), under
the identical no-new-debt discipline: stage-only decorator, two-SF gate
mirror in ``tests/test_bank_r19.py``, sf0.1 sweeps via
``tools/bank_check.py --module bank_r19``, the dtype-family sweep
(``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r20),
plan-audit notes pre-adjudicated at authoring time, and the HARD
authoring-time 64x probe gate (``SCALING_PROBES.json`` +
``tests/test_flip_readiness.py`` — every batch probes in the session it
is authored, no exceptions since round 14).

Seed theme: SECOND OPINIONS — alternative-form tests for questions the
registry already answers once, because two estimators agreeing is the
actual certificate: monotone-run randomness (vs above-median runs),
rank autocorrelation at the seasonal lag (vs value ACF), TOST
equivalence for means (vs the proportions TOST), coverage-corrected
entropy (vs plug-in), and one-sample Cramer-von Mises against the
fitted lognormal (vs the DKW band).

Determinism disciplines inherited unchanged (bank_r11..r18
docstrings): exact integer/DECIMAL folds, round-before-fold with the
DECADE-ESCALATION rule for libm pins (ln/exp pin one decade coarser
than the readout; r14's watts/VI lesson), ``+ 0.0`` on possibly-
negative-zero outputs, total-order tiebreaks, bounded-domain windows
or the ranged device, the shared Abramowitz-Stegun erfc tree, explicit
``floor()`` before double->integer buckets.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}
PLAN_AUDIT_NOTES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13..r18): records the query in
    the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# Shared day-grain revenue series (the bank_r13/r14/r18 copy).
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
# Runs-up-and-down randomness test on daily revenue
# --------------------------------------------------------------------------
@register(
    "updown_runs_test",
    oracle=f"""
    WITH {_DAILY_SQL},
    sgn AS (
        SELECT day,
               CASE WHEN y > LAG(y) OVER (ORDER BY day) THEN 1
                    WHEN y < LAG(y) OVER (ORDER BY day) THEN -1
                    ELSE 0 END AS s
        FROM daily QUALIFY LAG(y) OVER (ORDER BY day) IS NOT NULL
    ),
    nz AS (
        SELECT day, s,
               LAG(s) OVER (ORDER BY day) AS prev
        FROM sgn WHERE s <> 0
    ),
    fold AS (
        SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n,
               CAST(SUM(CASE WHEN prev IS NULL OR s <> prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM nz
    )
    SELECT n AS n_days_effective,
           runs AS n_monotone_runs,
           round((2.0 * n - 1.0) / 3.0, 6) + 0.0 AS expected_runs,
           round((runs - (2.0 * n - 1.0) / 3.0)
                 / sqrt((16.0 * n - 29.0) / 90.0), 6) + 0.0
               AS updown_runs_z
    FROM fold
    """,
)
def updown_runs_test(spark, sf_dir):
    """RUNS-UP-AND-DOWN test on daily revenue: count maximal monotone
    runs of the day-over-day sign sequence (ties dropped, the
    Wallis-Moore convention); under exchangeability E[R] = (2n-1)/3
    and Var = (16n-29)/90 — the second opinion to
    `runs_test_randomness` (above/below-median runs): median runs
    catch level clustering, monotone runs catch OSCILLATION
    (too-regular sawtooth reads z >> 0, momentum reads z << 0), and
    together with `turning_points_randomness` / `difference_sign_
    test` the randomness battery now covers all four classical
    forms.

    Exactness: signs and run boundaries are exact integer
    comparisons over the calendar-day frame; the moments are
    literal rationals of the exact effective n. Plan: one day
    rollup, two calendar-frame lags, one fold."""
    daily = _daily(spark, sf_dir)
    lagw = Window.orderBy("day")
    sgn = daily.select(
        "day",
        F.when(F.col("y") > F.lag("y").over(lagw), 1)
        .when(F.col("y") < F.lag("y").over(lagw), -1)
        .otherwise(0)
        .alias("s"),
        F.lag("y").over(lagw).alias("prev_y"),
    ).where(F.col("prev_y").isNotNull())
    nz = sgn.where(F.col("s") != 0).select(
        "s", F.lag("s").over(Window.orderBy("day")).alias("prev")
    )
    fold = nz.agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("s") != F.col("prev")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("runs"),
    )
    er = (2.0 * F.col("n") - 1.0) / 3.0
    return fold.select(
        F.col("n").alias("n_days_effective"),
        F.col("runs").alias("n_monotone_runs"),
        (F.round(er, 6) + 0.0).alias("expected_runs"),
        (
            F.round(
                (F.col("runs") - er)
                / F.sqrt((16.0 * F.col("n") - 29.0) / 90.0),
                6,
            )
            + 0.0
        ).alias("updown_runs_z"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "updown_runs_test": (
            "two lags over the calendar-day frame (the "
            "difference_sign class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Spearman rank autocorrelation of daily revenue at lags 1 and 7
# --------------------------------------------------------------------------
@register(
    "rank_autocorrelation_lag7",
    oracle=f"""
    WITH {_DAILY_SQL},
    ranked AS (
        SELECT day,
               CAST(RANK() OVER (ORDER BY y)
                    + COUNT(*) OVER (PARTITION BY y) - 1
                    AS BIGINT) AS r2
        FROM daily
    ),
    pairs AS (
        SELECT r2,
               LAG(r2, 1) OVER (ORDER BY day) AS p1,
               LAG(r2, 7) OVER (ORDER BY day) AS p7
        FROM ranked
    ),
    f1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2) AS BIGINT) AS sa,
               CAST(SUM(p1) AS BIGINT) AS sb,
               CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2)
                    AS DECIMAL(38,0)) AS saa,
               CAST(SUM(CAST(p1 AS DECIMAL(38,0)) * p1)
                    AS DECIMAL(38,0)) AS sbb,
               CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * p1)
                    AS DECIMAL(38,0)) AS sab
        FROM pairs WHERE p1 IS NOT NULL
    ),
    f7 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2) AS BIGINT) AS sa,
               CAST(SUM(p7) AS BIGINT) AS sb,
               CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2)
                    AS DECIMAL(38,0)) AS saa,
               CAST(SUM(CAST(p7 AS DECIMAL(38,0)) * p7)
                    AS DECIMAL(38,0)) AS sbb,
               CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * p7)
                    AS DECIMAL(38,0)) AS sab
        FROM pairs WHERE p7 IS NOT NULL
    )
    SELECT f7.n AS n_pairs_lag7,
           round((CAST(f1.n AS DOUBLE) * CAST(f1.sab AS DOUBLE)
                  - CAST(f1.sa AS DOUBLE) * f1.sb)
                 / sqrt((CAST(f1.n AS DOUBLE) * CAST(f1.saa AS DOUBLE)
                         - CAST(f1.sa AS DOUBLE) * f1.sa)
                        * (CAST(f1.n AS DOUBLE)
                           * CAST(f1.sbb AS DOUBLE)
                           - CAST(f1.sb AS DOUBLE) * f1.sb)), 8)
               + 0.0 AS spearman_rho_lag1,
           round((CAST(f7.n AS DOUBLE) * CAST(f7.sab AS DOUBLE)
                  - CAST(f7.sa AS DOUBLE) * f7.sb)
                 / sqrt((CAST(f7.n AS DOUBLE) * CAST(f7.saa AS DOUBLE)
                         - CAST(f7.sa AS DOUBLE) * f7.sa)
                        * (CAST(f7.n AS DOUBLE)
                           * CAST(f7.sbb AS DOUBLE)
                           - CAST(f7.sb AS DOUBLE) * f7.sb)), 8)
               + 0.0 AS spearman_rho_lag7
    FROM f1, f7
    """,
)
def rank_autocorrelation_lag7(spark, sf_dir):
    """SPEARMAN rank autocorrelation of daily revenue at lags 1 and 7
    — the robust second opinion to the value-scale `acf_ljung_box` /
    `autocorr_lag1_by_user` family: rank autocorrelation survives
    the heavy daily-revenue tail that inflates or deflates Pearson
    ACF, and the lag-7 reading is the distribution-free weekly-
    seasonality certificate (`harmonic_weekly_regression` fits the
    same signal parametrically; disagreement between the two is the
    interesting event).

    Exactness: midranks are exact 2x-scaled integers (RANK +
    tiecount - 1 over the calendar-bounded daily grid); both
    Pearson folds over the rank pairs are exact DECIMAL(38,0);
    division at the end. Plan: one day rollup, one rank window +
    two lags over the calendar frame, two folds."""
    daily = _daily(spark, sf_dir)
    ranked = daily.select(
        "day",
        (
            F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    lagw = Window.orderBy("day")
    pairs = ranked.select(
        "r2",
        F.lag("r2", 1).over(lagw).alias("p1"),
        F.lag("r2", 7).over(lagw).alias("p7"),
    ).persist()
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731

    def fold(col):
        return pairs.where(F.col(col).isNotNull()).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("r2").cast("bigint").alias("sa"),
            F.sum(col).cast("bigint").alias("sb"),
            F.sum(d38("r2") * F.col("r2"))
            .cast("decimal(38,0)")
            .alias("saa"),
            F.sum(d38(col) * F.col(col))
            .cast("decimal(38,0)")
            .alias("sbb"),
            F.sum(d38("r2") * F.col(col))
            .cast("decimal(38,0)")
            .alias("sab"),
        )

    def rho():
        nn = F.col("n").cast("double")
        num = nn * F.col("sab").cast("double") - F.col("sa").cast(
            "double"
        ) * F.col("sb")
        den = F.sqrt(
            (
                nn * F.col("saa").cast("double")
                - F.col("sa").cast("double") * F.col("sa")
            )
            * (
                nn * F.col("sbb").cast("double")
                - F.col("sb").cast("double") * F.col("sb")
            )
        )
        return F.round(num / den, 8) + 0.0

    f1 = fold("p1").select(rho().alias("spearman_rho_lag1"))
    f7 = fold("p7").select(
        F.col("n").alias("n_pairs_lag7"),
        rho().alias("spearman_rho_lag7"),
    )
    return f7.crossJoin(F.broadcast(f1)).select(
        "n_pairs_lag7", "spearman_rho_lag1", "spearman_rho_lag7"
    )


# --------------------------------------------------------------------------
# TOST equivalence test for weekend vs weekday mean order value
# --------------------------------------------------------------------------
@register(
    "tost_equivalence_means",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN CAST(epoch_us(o_orderdate) // 86400000000
                         + 4 AS BIGINT) % 7 >= 5
                    THEN 1 ELSE 0 END AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v
        FROM orders
    ),
    arm AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s,
               CAST(SUM(CAST(v AS DECIMAL(38,0)) * v)
                    AS DECIMAL(38,0)) AS ss
        FROM pts GROUP BY g
    ),
    w AS (
        SELECT MAX(CASE WHEN g = 1 THEN n END) AS n1,
               MAX(CASE WHEN g = 1 THEN s END) AS s1,
               MAX(CASE WHEN g = 1 THEN ss END) AS ss1,
               MAX(CASE WHEN g = 0 THEN n END) AS n0,
               MAX(CASE WHEN g = 0 THEN s END) AS s0,
               MAX(CASE WHEN g = 0 THEN ss END) AS ss0
        FROM arm
    ),
    stat AS (
        SELECT n1, n0,
               (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                   / 100000.0 AS d,
               0.01 * (CAST(s1 AS DOUBLE) + s0) / (n1 + n0)
                   / 100000.0 AS margin,
               sqrt(((CAST(ss1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)
                     / n1
                     + (CAST(ss0 AS DOUBLE)
                        - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1)
                       / n0)) / 100000.0 AS se
        FROM w
    )
    SELECT n1 AS n_weekend, n0 AS n_weekday,
           round(d, 6) + 0.0 AS mean_diff_kusd,
           round(margin, 6) + 0.0 AS margin_kusd,
           round(se, 6) + 0.0 AS se_welch_kusd,
           round((d + margin) / se, 6) + 0.0 AS tost_t_lower,
           round((d - margin) / se, 6) + 0.0 AS tost_t_upper,
           CAST(CASE WHEN (d + margin) / se >= 1.6448536269514722
                      AND (d - margin) / se <= -1.6448536269514722
                     THEN 1 ELSE 0 END AS INT)
               AS equivalent_at_5pct
    FROM stat
    """,
)
def tost_equivalence_means(spark, sf_dir):
    """TOST (two one-sided tests) EQUIVALENCE of weekend vs weekday
    MEAN order value with a +/-1%-of-pooled-mean margin: both
    one-sided Welch statistics must clear z_0.95 for the means to be
    declared equivalent — the means-scale second opinion to
    `tost_equivalence_proportions`, and the only way to POSITIVELY
    certify "no weekend effect" (a non-significant
    `weekend_effect_ols` t is absence of evidence; TOST is evidence
    of absence, the call a seasonality-aware pipeline actually
    needs before pooling weekday and weekend data).

    Exactness: per-arm counts and power sums are exact DECIMAL(38,0)
    integers; the margin is an exact 1% of the pooled mean; z
    critical value is a shared literal. Large-n normal reference
    documented (n in the thousands at every SF). Plan: one arm
    rollup, two scalar folds — no window."""
    o = t(spark, sf_dir, "orders")
    day = F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
    pts = o.select(
        F.when((day + 4) % 7 >= 5, 1).otherwise(0).alias("g"),
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("v"),
    )
    arm = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    w = arm.agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("g") == 1, F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("g") == 0, F.col("ss"))).alias("ss0"),
    )
    d = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s0").cast("double") / F.col("n0")
    ) / 100000.0
    margin = (
        0.01
        * (F.col("s1").cast("double") + F.col("s0"))
        / (F.col("n1") + F.col("n0"))
        / 100000.0
    )
    se = (
        F.sqrt(
            (
                F.col("ss1").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
            )
            / (F.col("n1") - 1)
            / F.col("n1")
            + (
                F.col("ss0").cast("double")
                - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
            )
            / (F.col("n0") - 1)
            / F.col("n0")
        )
        / 100000.0
    )
    zc = 1.6448536269514722
    return w.select(
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        (F.round(d, 6) + 0.0).alias("mean_diff_kusd"),
        (F.round(margin, 6) + 0.0).alias("margin_kusd"),
        (F.round(se, 6) + 0.0).alias("se_welch_kusd"),
        (F.round((d + margin) / se, 6) + 0.0).alias("tost_t_lower"),
        (F.round((d - margin) / se, 6) + 0.0).alias("tost_t_upper"),
        F.when(
            ((d + margin) / se >= zc) & ((d - margin) / se <= -zc), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("equivalent_at_5pct"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "rank_autocorrelation_lag7": (
            "rank window + two lags over the calendar-day frame "
            "(the spearman_footrule class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Coverage-corrected vocabulary entropy (plug-in / Miller-Madow / Chao-Shen)
# --------------------------------------------------------------------------
@register(
    "chao_shen_entropy",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY w
    ),
    fof AS (
        SELECT f, CAST(COUNT(*) AS BIGINT) AS m FROM freq GROUP BY f
    ),
    tot AS (
        SELECT CAST(SUM(CAST(f AS DECIMAL(38,0)) * m) AS BIGINT)
                   AS n,
               CAST(SUM(m) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN f = 1 THEN m ELSE 0 END)
                    AS BIGINT) AS f1
        FROM fof
    ),
    terms AS (
        SELECT tot.n, tot.v, tot.f1,
               CAST(SUM(CAST(round(CAST(fof.m AS DOUBLE) * fof.f
                   * round(ln(CAST(fof.f AS DOUBLE)), 8), 6)
                   AS DECIMAL(38,6))) AS DOUBLE) AS s_flnf,
               CAST(SUM(CAST(round(-fof.m
                   * ((1.0 - CAST(tot.f1 AS DOUBLE) / tot.n)
                      * fof.f / tot.n)
                   * round(ln((1.0 - CAST(tot.f1 AS DOUBLE) / tot.n)
                              * fof.f / tot.n), 8)
                   / (1.0 - round(exp(-(1.0 - CAST(tot.f1 AS DOUBLE)
                                        / tot.n) * fof.f), 8)), 12)
                   AS DECIMAL(38,12))) AS DOUBLE) AS h_cs
        FROM fof, tot GROUP BY tot.n, tot.v, tot.f1
    )
    SELECT n AS n_tokens, v AS n_types, f1 AS n_hapax,
           round(1.0 - CAST(f1 AS DOUBLE) / n, 8) + 0.0
               AS good_turing_coverage,
           round(round(ln(CAST(n AS DOUBLE)), 8) - s_flnf / n, 5)
               + 0.0 AS h_plugin_nats,
           round(round(ln(CAST(n AS DOUBLE)), 8) - s_flnf / n
                 + (v - 1.0) / (2.0 * n), 5) + 0.0
               AS h_miller_madow_nats,
           round(h_cs, 5) + 0.0 AS h_chao_shen_nats
    FROM terms
    """,
)
def chao_shen_entropy(spark, sf_dir):
    """COVERAGE-CORRECTED vocabulary entropy: plug-in, Miller-Madow
    (+ (V-1)/2n bias term) and CHAO-SHEN (Good-Turing-coverage-
    adjusted probabilities with Horvitz-Thompson inclusion
    weighting, the standard estimator when many types are UNSEEN)
    — the second opinion the plug-in `text_language_profile` /
    `bigram_entropy_rate` entropies need on long-tailed vocabulary:
    plug-in underestimates H by ~V/2n, and the Chao-Shen-vs-plug-in
    gap SIZES the unseen mass without ever enumerating it
    (`good_turing_vocab` / `chao1_vocabulary_estimate` size the
    unseen TYPES; this sizes their entropy).

    Device + exactness: everything folds on the frequency-of-
    frequencies grid (bounded by max token count, never type-grain
    at the fold); the inclusion probability 1-(1-p)^n uses its
    n->inf form 1-e^(-C*f) (documented choice: the exact power
    cancels catastrophically in ln space at data scale); ln pins at
    8 dp, term folds at 6/12 dp, readouts at 5 dp (the decade
    rule). Plan: one explode + two rollups, one fold."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w"))
    freq = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    fof = freq.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    tot = fof.agg(
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("m"))
        .cast("bigint")
        .alias("n"),
        F.sum("m").cast("bigint").alias("v"),
        F.sum(F.when(F.col("f") == 1, F.col("m")).otherwise(0))
        .cast("bigint")
        .alias("f1"),
    )
    cov = 1.0 - F.col("f1").cast("double") / F.col("n")
    ptil = cov * F.col("f") / F.col("n")
    terms = (
        fof.crossJoin(F.broadcast(tot))
        .groupBy("n", "v", "f1")
        .agg(
            F.sum(
                F.round(
                    F.col("m").cast("double")
                    * F.col("f")
                    * F.round(F.log(F.col("f").cast("double")), 8),
                    6,
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("s_flnf"),
            F.sum(
                F.round(
                    -F.col("m")
                    * ptil
                    * F.round(F.log(ptil), 8)
                    / (
                        1.0
                        - F.round(F.exp(-cov * F.col("f")), 8)
                    ),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("h_cs"),
        )
    )
    lnn = F.round(F.log(F.col("n").cast("double")), 8)
    hp = lnn - F.col("s_flnf") / F.col("n")
    return terms.select(
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("f1").alias("n_hapax"),
        (
            F.round(1.0 - F.col("f1").cast("double") / F.col("n"), 8)
            + 0.0
        ).alias("good_turing_coverage"),
        (F.round(hp, 5) + 0.0).alias("h_plugin_nats"),
        (
            F.round(
                hp + (F.col("v") - 1.0) / (2.0 * F.col("n")), 5
            )
            + 0.0
        ).alias("h_miller_madow_nats"),
        (F.round(F.col("h_cs"), 5) + 0.0).alias("h_chao_shen_nats"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "chao_shen_entropy": (
            "no window — explode + two rollups + one fold on the "
            "bounded frequency-of-frequencies grid"
        ),
    }
)


def _phi_col_r19(z):
    """Standard normal CDF Column via the shared Abramowitz-Stegun
    7.1.26 erfc tree (bank_r15/_r18 device, split by sign)."""
    x = F.abs(z) / 1.4142135623730951
    tp = 1.0 / (1.0 + 0.3275911 * x)
    p2 = (
        (
            ((1.061405429 * tp - 1.453152027) * tp + 1.421413741) * tp
            - 0.284496736
        )
        * tp
        + 0.254829592
    ) * tp * F.exp(-x * x)
    return F.when(z >= 0, 1.0 - p2 / 2.0).otherwise(p2 / 2.0)


def _phi_sql_r19(z_expr: str) -> str:
    from .stats_tests import _p_two_sided_sql

    return (
        "(CASE WHEN (__z) >= 0 THEN 1.0 - (__P) / 2.0"
        " ELSE (__P) / 2.0 END)"
    ).replace("__P", _p_two_sided_sql(z_expr)).replace("__z", z_expr)


# --------------------------------------------------------------------------
# Cramer-von Mises goodness of fit against the moment-fitted lognormal
# --------------------------------------------------------------------------
@register(
    "cvm_lognormal_gof",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS x
        FROM orders
    ),
    grid AS (
        SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM pts GROUP BY x
    ),
    lmom AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CAST(round(c * round(ln(CAST(v AS DOUBLE)
                   / 100000.0), 8), 6) AS DECIMAL(38,6)))
                   AS DOUBLE) AS sl,
               CAST(SUM(CAST(round(c * round(ln(CAST(v AS DOUBLE)
                   / 100000.0), 8)
                   * round(ln(CAST(v AS DOUBLE) / 100000.0), 8), 6)
                   AS DECIMAL(38,6))) AS DOUBLE) AS sll
        FROM grid
    ),
    fitp AS (
        SELECT n, round(sl / n, 8) AS mu,
               round(sqrt(sll / n - (sl / n) * (sl / n)), 8) AS sig
        FROM lmom
    ),
    cum AS (
        SELECT g.v, g.c, f.n, f.mu, f.sig,
               CAST(COALESCE(SUM(g.c) OVER (ORDER BY g.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                   PRECEDING), 0) AS BIGINT) AS head
        FROM grid g, fitp f
    ),
    terms AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(round(
                   c * round({_phi_sql_r19(
                       "((round(ln(CAST(v AS DOUBLE) / 100000.0), 8)"
                       " - mu) / sig)")}, 10)
                     * round({_phi_sql_r19(
                       "((round(ln(CAST(v AS DOUBLE) / 100000.0), 8)"
                       " - mu) / sig)")}, 10)
                   - round({_phi_sql_r19(
                       "((round(ln(CAST(v AS DOUBLE) / 100000.0), 8)"
                       " - mu) / sig)")}, 10)
                     * c * (2.0 * head + c) / n
                   + (4.0 * ((CAST(head AS DECIMAL(38,0)) + c)
                             * (head + c) * (2 * head + 2 * c + 1)
                             / 6
                             - CAST(head AS DECIMAL(38,0)) * head
                               * (2 * head + 1) / 6)
                      - 4.0 * (CAST(c AS DECIMAL(38,0)) * head
                               + CAST(c AS DECIMAL(38,0)) * (c + 1)
                                 / 2)
                      + c)
                     / (4.0 * CAST(n AS DOUBLE) * n), 10)
                   AS DECIMAL(38,10))) AS DOUBLE) AS s
        FROM cum GROUP BY n
    )
    SELECT n AS n_orders,
           round(1.0 / (12.0 * n) + s, 6) + 0.0 AS cvm_w2,
           round((1.0 / (12.0 * n) + s)
                 * (1.0 + 0.5 / n), 6) + 0.0 AS cvm_w2_adjusted,
           CAST(CASE WHEN (1.0 / (12.0 * n) + s)
                          * (1.0 + 0.5 / n) > 0.461
                     THEN 1 ELSE 0 END AS INT)
               AS reject_lognormal_5pct
    FROM terms
    """,
)
def cvm_lognormal_gof(spark, sf_dir):
    """CRAMER-VON MISES goodness of fit of order values against the
    moment-fitted lognormal: W^2 = 1/(12n) + sum_i (F(x_(i)) -
    (2i-1)/(2n))^2 with F = Phi((ln x - mu)/sigma) — the
    QUADRATIC-distance second opinion to `dkw_band_lognormal_check`
    (a sup-norm band: CvM integrates squared discrepancy over the
    WHOLE distribution, so it sees broad low-amplitude misfit the
    band's single widest point misses) and to `lilliefors_normal_
    fit` (which tests normality of raw values, not lognormality).

    Device: the unit-grain sum collapses onto the value grid — for
    a tie group at head h of size c, sum(2i-1) = c(2h+c) and
    sum(2i-1)^2 = 4*(S2(h+c)-S2(h)) - 4*S1 + c via exact integer
    square-pyramidal partial sums in DECIMAL(38,0), so W^2 needs no
    per-unit rank. F pins at 10 dp (erfc tree, shared literals);
    ln pins at 8; the 5% decision uses the standard adjusted
    critical value 0.461. Plan: one value rollup, one
    domain-bounded grid cumulative, two folds."""
    o = t(spark, sf_dir, "orders")
    grid = (
        o.select(
            (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    lnv = F.round(F.log(F.col("v").cast("double") / 100000.0), 8)
    lmom = grid.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.round(F.col("c") * lnv, 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sl"),
        F.sum(
            F.round(F.col("c") * lnv * lnv, 6).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("sll"),
    )
    fitp = lmom.select(
        "n",
        F.round(F.col("sl") / F.col("n"), 8).alias("mu"),
        F.round(
            F.sqrt(
                F.col("sll") / F.col("n")
                - (F.col("sl") / F.col("n"))
                * (F.col("sl") / F.col("n"))
            ),
            8,
        ).alias("sig"),
    )
    cum = grid.crossJoin(F.broadcast(fitp)).select(
        "v",
        "c",
        "n",
        "mu",
        "sig",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("head"),
    )
    ff = F.round(_phi_col_r19((lnv - F.col("mu")) / F.col("sig")), 10)
    h38 = F.col("head").cast("decimal(38,0)")
    c38 = F.col("c").cast("decimal(38,0)")
    s2hi = (
        (h38 + F.col("c"))
        * (F.col("head") + F.col("c"))
        * (2 * F.col("head") + 2 * F.col("c") + 1)
        / 6
    )
    s2lo = h38 * F.col("head") * (2 * F.col("head") + 1) / 6
    s1 = c38 * F.col("head") + c38 * (F.col("c") + 1) / 2
    odd2 = 4.0 * (s2hi - s2lo) - 4.0 * s1 + F.col("c")
    term = F.round(
        F.col("c") * ff * ff
        - ff * F.col("c") * (2.0 * F.col("head") + F.col("c")) / F.col("n")
        + odd2 / (4.0 * F.col("n").cast("double") * F.col("n")),
        10,
    ).cast("decimal(38,10)")
    terms = cum.groupBy("n").agg(
        F.sum(term).cast("double").alias("s")
    )
    w2 = 1.0 / (12.0 * F.col("n")) + F.col("s")
    w2a = w2 * (1.0 + 0.5 / F.col("n"))
    return terms.select(
        F.col("n").alias("n_orders"),
        (F.round(w2, 6) + 0.0).alias("cvm_w2"),
        (F.round(w2a, 6) + 0.0).alias("cvm_w2_adjusted"),
        F.when(w2a > 0.461, 1)
        .otherwise(0)
        .cast("int")
        .alias("reject_lognormal_5pct"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "cvm_lognormal_gof": (
            "one exclusive-prefix cumulative over the cents value "
            "grid (price-domain-bounded — the dkw_band class)"
        ),
    }
)
