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


# --------------------------------------------------------------------------
# Brown-Mood median line for the daily revenue trend
# --------------------------------------------------------------------------
@register(
    "brown_mood_median_line",
    oracle=f"""
    WITH {_DAILY_SQL},
    lab AS (
        SELECT day, y,
               CASE WHEN day <= (SELECT (MIN(day) + MAX(day)) // 2
                                 FROM daily)
                    THEN 1 ELSE 2 END AS half
        FROM daily
    ),
    med AS (
        SELECT half,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(quantile_disc(day, 0.5) AS BIGINT) AS mx,
               CAST(quantile_disc(y, 0.5) AS BIGINT) AS my
        FROM lab GROUP BY half
    ),
    w AS (
        SELECT MAX(CASE WHEN half = 1 THEN n END) AS n1,
               MAX(CASE WHEN half = 1 THEN mx END) AS x1,
               MAX(CASE WHEN half = 1 THEN my END) AS y1,
               MAX(CASE WHEN half = 2 THEN n END) AS n2,
               MAX(CASE WHEN half = 2 THEN mx END) AS x2,
               MAX(CASE WHEN half = 2 THEN my END) AS y2
        FROM med
    ),
    resid AS (
        SELECT l.half,
               CAST(SUM(CASE WHEN l.y - w.y1
                                  - CAST(w.y2 - w.y1 AS DOUBLE)
                                    / (w.x2 - w.x1)
                                    * (l.day - w.x1) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS above,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lab l, w GROUP BY l.half
    )
    SELECT w.n1 + w.n2 AS n_days,
           round(CAST(w.y2 - w.y1 AS DOUBLE) / (w.x2 - w.x1)
                 / 1000.0, 8) + 0.0 AS bm_slope_usd_per_day,
           round((w.y1 - CAST(w.y2 - w.y1 AS DOUBLE)
                         / (w.x2 - w.x1) * w.x1) / 100000.0, 4)
               + 0.0 AS bm_intercept_kusd,
           (SELECT round(CAST(above AS DOUBLE) / n, 6) + 0.0
            FROM resid WHERE half = 1) AS frac_above_h1,
           (SELECT round(CAST(above AS DOUBLE) / n, 6) + 0.0
            FROM resid WHERE half = 2) AS frac_above_h2
    FROM w
    """,
)
def brown_mood_median_line(spark, sf_dir):
    """BROWN-MOOD median line for the daily revenue trend: split the
    calendar at its midpoint, join the two half-sample (median day,
    median revenue) points — a line whose slope is immune to ANY
    fraction of revenue-spike outliers short of half a half-sample,
    the blunt-instrument second opinion to the OLS trend
    (`weekend_effect_ols` family) and `sen_slope_confidence_band`
    (pairwise-median): three trend estimators agreeing is the trend
    certificate. The per-half fractions of days above the line
    double as the Brown-Mood fit check (both should be ~1/2).

    Exactness: half medians are exact discrete order statistics
    (quantile_disc / the lower-median convention both engines
    share); the line and residual signs evaluate in doubles from
    exact integers. Plan: one day rollup, two half folds, one
    broadcast residual count."""
    daily = _daily(spark, sf_dir)
    cut = daily.agg(
        F.floor((F.min("day") + F.max("day")) / 2)
        .cast("bigint")
        .alias("cut")
    )
    lab = daily.crossJoin(F.broadcast(cut)).select(
        "day",
        "y",
        F.when(F.col("day") <= F.col("cut"), 1).otherwise(2).alias(
            "half"
        ),
    ).persist()
    med = lab.groupBy("half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY day)")
        .cast("bigint")
        .alias("mx"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY y)")
        .cast("bigint")
        .alias("my"),
    )
    w = med.agg(
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("half") == 1, F.col("mx"))).alias("x1"),
        F.max(F.when(F.col("half") == 1, F.col("my"))).alias("y1"),
        F.max(F.when(F.col("half") == 2, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("half") == 2, F.col("mx"))).alias("x2"),
        F.max(F.when(F.col("half") == 2, F.col("my"))).alias("y2"),
    )
    slope = (F.col("y2") - F.col("y1")).cast("double") / (
        F.col("x2") - F.col("x1")
    )
    resid = (
        lab.crossJoin(F.broadcast(w))
        .groupBy("half")
        .agg(
            F.sum(
                F.when(
                    F.col("y")
                    - F.col("y1")
                    - slope * (F.col("day") - F.col("x1"))
                    > 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("above"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    fr = resid.agg(
        F.max(
            F.when(
                F.col("half") == 1,
                F.round(F.col("above").cast("double") / F.col("n"), 6)
                + 0.0,
            )
        ).alias("frac_above_h1"),
        F.max(
            F.when(
                F.col("half") == 2,
                F.round(F.col("above").cast("double") / F.col("n"), 6)
                + 0.0,
            )
        ).alias("frac_above_h2"),
    )
    return w.crossJoin(F.broadcast(fr)).select(
        (F.col("n1") + F.col("n2")).alias("n_days"),
        (F.round(slope / 1000.0, 8) + 0.0).alias(
            "bm_slope_usd_per_day"
        ),
        (
            F.round(
                (F.col("y1") - slope * F.col("x1")) / 100000.0, 4
            )
            + 0.0
        ).alias("bm_intercept_kusd"),
        "frac_above_h1",
        "frac_above_h2",
    )


# --------------------------------------------------------------------------
# Robust dispersion panel: QCD, decile ratio, midspread share
# --------------------------------------------------------------------------
@register(
    "robust_dispersion_panel",
    oracle="""
    WITH pts AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v
        FROM orders
    ),
    grid AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(v) AS BIGINT) AS tv
        FROM pts GROUP BY v
    ),
    cum AS (
        SELECT v, c, tv,
               SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cc,
               SUM(c) OVER () AS n,
               SUM(tv) OVER () AS s
        FROM grid
    ),
    qs AS (
        SELECT (SELECT CAST(MIN(v) AS BIGINT) FROM cum
                WHERE 10 * cc >= n) AS p10,
               (SELECT CAST(MIN(v) AS BIGINT) FROM cum
                WHERE 4 * cc >= n) AS q1,
               (SELECT CAST(MIN(v) AS BIGINT) FROM cum
                WHERE 4 * cc >= 3 * n) AS q3,
               (SELECT CAST(MIN(v) AS BIGINT) FROM cum
                WHERE 10 * cc >= 9 * n) AS p90,
               (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n,
               (SELECT CAST(MAX(s) AS BIGINT) FROM cum) AS s
    ),
    mid AS (
        SELECT CAST(SUM(CASE WHEN g.v >= qs.q1 AND g.v <= qs.q3
                             THEN g.tv ELSE 0 END) AS BIGINT)
                   AS mid_v
        FROM grid g, qs
    )
    SELECT qs.n AS n_orders,
           round(CAST(qs.q3 - qs.q1 AS DOUBLE)
                 / (qs.q3 + qs.q1), 8) + 0.0
               AS quartile_coeff_dispersion,
           round(CAST(qs.p90 AS DOUBLE) / qs.p10, 6) + 0.0
               AS decile_ratio_p90_p10,
           round(CAST(mid.mid_v AS DOUBLE) / qs.s, 8) + 0.0
               AS midspread_value_share
    FROM qs, mid
    """,
)
def robust_dispersion_panel(spark, sf_dir):
    """ROBUST DISPERSION panel for order values: the quartile
    coefficient of dispersion (Q3-Q1)/(Q3+Q1), the P90/P10 decile
    ratio, and the share of total VALUE carried by the interquartile
    midspread — the outlier-immune second opinions to the moment CV
    (`feltz_miller_cv_test`) and the robust-scale estimators
    (`qn_scale_estimator`, `rousseeuw_sn_scale` answer "how wide";
    these answer "how wide relative to location", which is what
    cross-SF and cross-period comparisons need).

    Exactness: all four quantiles are exact lower order statistics
    (integer threshold compares); the midspread value share is an
    exact integer-cents ratio. Plan: one value-grid cumulative,
    two scalar folds."""
    o = t(spark, sf_dir, "orders")
    grid = (
        o.select(
            (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("v")
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum("v").cast("bigint").alias("tv"),
        )
        .persist()
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
        F.sum("tv").over(Window.partitionBy()).alias("s"),
    ).persist()

    def orderstat(num, den):
        return (
            cum.where(den * F.col("cc") >= num * F.col("n"))
            .agg(F.min("v").cast("bigint").alias("q"))
        )

    p10 = orderstat(1, 10).select(F.col("q").alias("p10"))
    q1 = orderstat(1, 4).select(F.col("q").alias("q1"))
    q3 = orderstat(3, 4).select(F.col("q").alias("q3"))
    p90 = orderstat(9, 10).select(F.col("q").alias("p90"))
    ns = cum.agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("s").cast("bigint").alias("s"),
    )
    qs = (
        p10.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .crossJoin(F.broadcast(p90))
        .crossJoin(F.broadcast(ns))
    )
    mid = (
        grid.crossJoin(F.broadcast(qs))
        .agg(
            F.sum(
                F.when(
                    (F.col("v") >= F.col("q1"))
                    & (F.col("v") <= F.col("q3")),
                    F.col("tv"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("mid_v")
        )
    )
    return qs.crossJoin(F.broadcast(mid)).select(
        F.col("n").alias("n_orders"),
        (
            F.round(
                (F.col("q3") - F.col("q1")).cast("double")
                / (F.col("q3") + F.col("q1")),
                8,
            )
            + 0.0
        ).alias("quartile_coeff_dispersion"),
        (
            F.round(F.col("p90").cast("double") / F.col("p10"), 6)
            + 0.0
        ).alias("decile_ratio_p90_p10"),
        (
            F.round(F.col("mid_v").cast("double") / F.col("s"), 8)
            + 0.0
        ).alias("midspread_value_share"),
    )


# --------------------------------------------------------------------------
# DeLong variance for the value->purchase AUC
# --------------------------------------------------------------------------
@register(
    "auc_delong_se",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS pos,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM events
    ),
    grid AS (
        SELECT v,
               CAST(SUM(pos) AS BIGINT) AS c1,
               CAST(SUM(1 - pos) AS BIGINT) AS c0
        FROM pts GROUP BY v
    ),
    cum AS (
        SELECT v, c1, c0,
               CAST(COALESCE(SUM(c0) OVER ew, 0) AS BIGINT)
                   AS c0_below,
               CAST(COALESCE(SUM(c1) OVER ew, 0) AS BIGINT)
                   AS c1_below,
               CAST(SUM(c1) OVER () AS BIGINT) AS n1,
               CAST(SUM(c0) OVER () AS BIGINT) AS n0
        FROM grid
        WINDOW ew AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING)
    ),
    afold AS (
        SELECT MAX(n1) AS n1, MAX(n0) AS n0,
               CAST(SUM(CAST(c1 AS DECIMAL(38,0))
                        * (2 * c0_below + c0)) AS DECIMAL(38,0))
                   AS u2
        FROM cum
    ),
    placef AS (
        SELECT a.n1, a.n0,
               CAST(a.u2 AS DOUBLE) / 2 / a.n1 / a.n0 AS auc,
               CAST(SUM(CAST(round(c.c1
                   * ((c.c0_below + c.c0 / 2.0) / a.n0
                      - CAST(a.u2 AS DOUBLE) / 2 / a.n1 / a.n0)
                   * ((c.c0_below + c.c0 / 2.0) / a.n0
                      - CAST(a.u2 AS DOUBLE) / 2 / a.n1 / a.n0), 10)
                   AS DECIMAL(38,10))) AS DOUBLE) AS s10,
               CAST(SUM(CAST(round(c.c0
                   * ((a.n1 - c.c1_below - c.c1 / 2.0) / a.n1
                      - CAST(a.u2 AS DOUBLE) / 2 / a.n1 / a.n0)
                   * ((a.n1 - c.c1_below - c.c1 / 2.0) / a.n1
                      - CAST(a.u2 AS DOUBLE) / 2 / a.n1 / a.n0), 10)
                   AS DECIMAL(38,10))) AS DOUBLE) AS s01
        FROM cum c, afold a
        GROUP BY a.n1, a.n0, a.u2
    )
    SELECT n1 AS n_positive, n0 AS n_negative,
           round(auc, 8) + 0.0 AS auc_midrank,
           round(sqrt(s10 / (n1 - 1.0) / n1
                      + s01 / (n0 - 1.0) / n0), 8) + 0.0
               AS delong_se,
           round(auc - 1.959963984540054
                 * sqrt(s10 / (n1 - 1.0) / n1
                        + s01 / (n0 - 1.0) / n0), 8) + 0.0
               AS ci95_lo,
           round(auc + 1.959963984540054
                 * sqrt(s10 / (n1 - 1.0) / n1
                        + s01 / (n0 - 1.0) / n0), 8) + 0.0
               AS ci95_hi
    FROM placef
    """,
)
def auc_delong_se(spark, sf_dir):
    """DELONG variance for the value->purchase AUC: the structural-
    components estimator — per-positive placements V10 = F0(x) and
    per-negative placements V01 = 1 - F1(y) (midrank convention at
    ties), SE^2 = S10/(n1 m... ) = var(V10)/n1 + var(V01)/n0 — the
    assumption-free second opinion to `auc_hanley_mcneil_ci`'s
    exponential-model SE: when the two intervals disagree, the
    Hanley-McNeil model assumption is the thing that broke, which
    is exactly what a model-comparison gate needs to know before
    trusting either.

    Device: placements collapse onto the value grid — every
    positive at value v has the SAME placement (c0_below +
    c0_tied/2)/n0, so the placement variance folds as c1 * (place
    - AUC)^2 per grid row with no per-event vector; both exclusive
    cumulatives ride one window over the value-cents grid. Terms
    round at 10 dp into DECIMAL(38,10). Plan: one grid rollup, one
    double exclusive cumulative, two folds."""
    e = t(spark, sf_dir, "events")
    pts = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    grid = pts.groupBy("v").agg(
        F.sum("pos").cast("bigint").alias("c1"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("c0"),
    )
    ew = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = grid.select(
        "c1",
        "c0",
        F.coalesce(F.sum("c0").over(ew), F.lit(0))
        .cast("bigint")
        .alias("c0_below"),
        F.coalesce(F.sum("c1").over(ew), F.lit(0))
        .cast("bigint")
        .alias("c1_below"),
        F.sum("c1").over(Window.partitionBy()).cast("bigint").alias(
            "n1"
        ),
        F.sum("c0").over(Window.partitionBy()).cast("bigint").alias(
            "n0"
        ),
    ).persist()
    afold = cum.agg(
        F.max("n1").alias("n1"),
        F.max("n0").alias("n0"),
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (2 * F.col("c0_below") + F.col("c0"))
        )
        .cast("decimal(38,0)")
        .alias("u2"),
    )
    placef = (
        cum.crossJoin(F.broadcast(afold.select(F.col("u2"))))
        .groupBy("n1", "n0", "u2")
        .agg(
            F.sum(
                F.round(
                    F.col("c1")
                    * (
                        (F.col("c0_below") + F.col("c0") / 2.0)
                        / F.col("n0")
                        - F.col("u2").cast("double")
                        / 2
                        / F.col("n1")
                        / F.col("n0")
                    )
                    * (
                        (F.col("c0_below") + F.col("c0") / 2.0)
                        / F.col("n0")
                        - F.col("u2").cast("double")
                        / 2
                        / F.col("n1")
                        / F.col("n0")
                    ),
                    10,
                ).cast("decimal(38,10)")
            )
            .cast("double")
            .alias("s10"),
            F.sum(
                F.round(
                    F.col("c0")
                    * (
                        (
                            F.col("n1")
                            - F.col("c1_below")
                            - F.col("c1") / 2.0
                        )
                        / F.col("n1")
                        - F.col("u2").cast("double")
                        / 2
                        / F.col("n1")
                        / F.col("n0")
                    )
                    * (
                        (
                            F.col("n1")
                            - F.col("c1_below")
                            - F.col("c1") / 2.0
                        )
                        / F.col("n1")
                        - F.col("u2").cast("double")
                        / 2
                        / F.col("n1")
                        / F.col("n0")
                    ),
                    10,
                ).cast("decimal(38,10)")
            )
            .cast("double")
            .alias("s01"),
        )
    )
    auc = F.col("u2").cast("double") / 2 / F.col("n1") / F.col("n0")
    se = F.sqrt(
        F.col("s10") / (F.col("n1") - 1.0) / F.col("n1")
        + F.col("s01") / (F.col("n0") - 1.0) / F.col("n0")
    )
    z = 1.959963984540054
    return placef.select(
        F.col("n1").alias("n_positive"),
        F.col("n0").alias("n_negative"),
        (F.round(auc, 8) + 0.0).alias("auc_midrank"),
        (F.round(se, 8) + 0.0).alias("delong_se"),
        (F.round(auc - z * se, 8) + 0.0).alias("ci95_lo"),
        (F.round(auc + z * se, 8) + 0.0).alias("ci95_hi"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "robust_dispersion_panel": (
            "one cumulative over the cents value grid + threshold "
            "scalars (the gastwirth class)"
        ),
        "auc_delong_se": (
            "one double exclusive-prefix cumulative over the "
            "value-cents grid (the auc_hanley_mcneil class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Closed-form MMD (quadratic kernel): weekend vs weekday order values
# --------------------------------------------------------------------------
@register(
    "mmd_poly2_two_sample",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN CAST(epoch_us(o_orderdate) // 86400000000
                         + 4 AS BIGINT) % 7 >= 5
                    THEN 1 ELSE 0 END AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    AS DECIMAL(10,2)) AS x
        FROM orders
    ),
    arm AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(round(x * x, 2) AS DECIMAL(30,2)))
                    AS DOUBLE) AS s2
        FROM pts GROUP BY g
    ),
    w AS (
        SELECT MAX(CASE WHEN g = 1 THEN n END) AS na,
               MAX(CASE WHEN g = 1 THEN s1 END) AS a1,
               MAX(CASE WHEN g = 1 THEN s2 END) AS a2,
               MAX(CASE WHEN g = 0 THEN n END) AS nb,
               MAX(CASE WHEN g = 0 THEN s1 END) AS b1,
               MAX(CASE WHEN g = 0 THEN s2 END) AS b2
        FROM arm
    ),
    mm AS (
        SELECT na, nb,
               a1 / na / 100000.0 AS ma1,
               a2 / na / 10000000000.0 AS ma2,
               b1 / nb / 100000.0 AS mb1,
               b2 / nb / 10000000000.0 AS mb2
        FROM w
    )
    SELECT na AS n_weekend, nb AS n_weekday,
           round((ma1 - mb1) * (ma1 - mb1), 10) + 0.0
               AS mmd2_linear_kusd2,
           round(2.0 * (ma1 - mb1) * (ma1 - mb1)
                 + (ma2 - mb2) * (ma2 - mb2), 10) + 0.0
               AS mmd2_poly2_kusd,
           round(ma2 - ma1 * ma1 - (mb2 - mb1 * mb1), 8) + 0.0
               AS variance_gap_kusd2
    FROM mm
    """,
)
def mmd_poly2_two_sample(spark, sf_dir):
    """CLOSED-FORM MAXIMUM MEAN DISCREPANCY between weekend and
    weekday order values under the quadratic polynomial kernel
    k(x,y) = (xy + c)^2: for polynomial kernels the mean embedding
    is a finite moment vector, so MMD^2 = 2c*(mu_a - mu_b)^2 +
    (E[x^2]_a - E[x^2]_b)^2 (c = 1 k$^2 here) computes EXACTLY from
    first and second moments — no kernel matrix, no sampling. The
    moment-space second opinion to `energy_distance_two_sample` and
    `ks_two_sample_values`: MMD-poly2 isolates WHICH moments moved
    (the variance_gap column is the second component), where KS
    says only "something moved".

    Exactness: both arms' moment sums are exact decimals (values at
    2 dp, squares rounded at 2 dp into DECIMAL(30,2) — the
    max_to_sum staging); the k$ normalizations and the final
    quadratic form run in doubles at 10 dp. Plan: one arm rollup,
    one fold — no window, no join."""
    o = t(spark, sf_dir, "orders")
    day = F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
    pts = o.select(
        F.when((day + 4) % 7 >= 5, 1).otherwise(0).alias("g"),
        dec("o_totalprice", 10, 2).alias("x"),
    )
    arm = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(30,2)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 2).cast("decimal(30,2)")
        )
        .cast("double")
        .alias("s2"),
    )
    w = arm.agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("g") == 1, F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("g") == 1, F.col("s2"))).alias("a2"),
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("g") == 0, F.col("s1"))).alias("b1"),
        F.max(F.when(F.col("g") == 0, F.col("s2"))).alias("b2"),
    )
    ma1 = F.col("a1") / F.col("na") / 100000.0
    ma2 = F.col("a2") / F.col("na") / 10000000000.0
    mb1 = F.col("b1") / F.col("nb") / 100000.0
    mb2 = F.col("b2") / F.col("nb") / 10000000000.0
    return w.select(
        F.col("na").alias("n_weekend"),
        F.col("nb").alias("n_weekday"),
        (F.round((ma1 - mb1) * (ma1 - mb1), 10) + 0.0).alias(
            "mmd2_linear_kusd2"
        ),
        (
            F.round(
                2.0 * (ma1 - mb1) * (ma1 - mb1)
                + (ma2 - mb2) * (ma2 - mb2),
                10,
            )
            + 0.0
        ).alias("mmd2_poly2_kusd"),
        (
            F.round(ma2 - ma1 * ma1 - (mb2 - mb1 * mb1), 8) + 0.0
        ).alias("variance_gap_kusd2"),
    )


# --------------------------------------------------------------------------
# Sarle's bimodality coefficient for daily revenue
# --------------------------------------------------------------------------
@register(
    "bimodality_coefficient",
    oracle=f"""
    WITH {_DAILY_SQL},
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y)
                    AS DECIMAL(38,0)) AS s2,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y * y)
                    AS DECIMAL(38,0)) AS s3,
               CAST(SUM(CAST(round(((y / 100000.0)
                                    * (y / 100000.0))
                                   * ((y / 100000.0)
                                      * (y / 100000.0)), 2)
                             AS DECIMAL(36,2))) AS DOUBLE) AS s4k
        FROM daily
    ),
    km AS (
        SELECT n,
               (CAST(s2 AS DOUBLE) / n / 10000000000.0
                - (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)) AS m2,
               (CAST(s3 AS DOUBLE) / n / 1000000000000000.0
                - 3.0 * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s2 AS DOUBLE) / n / 10000000000.0)
                + 2.0 * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)) AS m3,
               (s4k / n
                - 4.0 * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s3 AS DOUBLE) / n / 1000000000000000.0)
                + 6.0 * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s2 AS DOUBLE) / n / 10000000000.0)
                - 3.0 * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)
                  * (CAST(s AS DOUBLE) / n / 100000.0)) AS m4
        FROM mom
    ),
    gk AS (
        SELECT n,
               round(m3 / sqrt(m2 * m2 * m2)
                     * sqrt(CAST(n AS DOUBLE) * (n - 1)) / (n - 2),
                     8) AS g1,
               round((CAST(n AS DOUBLE) - 1)
                     / ((n - 2.0) * (n - 3.0))
                     * ((n + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0),
                     8) AS g2
        FROM km
    )
    SELECT n AS n_days,
           g1 + 0.0 AS sample_skewness_g1,
           g2 + 0.0 AS excess_kurtosis_g2,
           round((g1 * g1 + 1.0)
                 / (g2 + 3.0 * (CAST(n AS DOUBLE) - 1) * (n - 1)
                           / ((n - 2.0) * (n - 3.0))), 8) + 0.0
               AS bimodality_coefficient,
           CAST(CASE WHEN (g1 * g1 + 1.0)
                          / (g2 + 3.0 * (CAST(n AS DOUBLE) - 1)
                                * (n - 1)
                                / ((n - 2.0) * (n - 3.0)))
                          > 0.5555555555555556
                     THEN 1 ELSE 0 END AS INT)
               AS exceeds_uniform_bc
    FROM gk
    """,
)
def bimodality_coefficient(spark, sf_dir):
    """SARLE'S BIMODALITY COEFFICIENT for daily revenue: BC = (g1^2 +
    1) / (g2 + 3(n-1)^2/((n-2)(n-3))) from bias-corrected sample
    skewness and kurtosis — BC above the uniform benchmark 5/9
    flags a bimodal/multimodal regime (two operating modes of the
    business) that every location/scale summary silently averages
    over; the cheap moment-space screen that says when
    `shorth_lms_location` / mixture machinery (`poisson_mixture_
    em2`) is worth running. The distribution-shape second opinion
    to `dagostino_k2_panel` (which tests normality, not
    unimodality).

    Exactness: the first three raw power sums are exact
    DECIMAL(38,0) integers; the fourth power (cents^4 overflows a
    38-digit SUM at sf0.1 scale — caught by the sf0.1 sweep) is
    computed per day in k$ as identical-IEEE double products,
    rounded at 2 dp, and folded order-independently through
    DECIMAL(36,2); all central moments assemble in k$ units;
    g1/g2 pin at 8 dp before BC. Plan: one day
    rollup, one fold — no window."""
    daily = _daily(spark, sf_dir)
    y38 = F.col("y").cast("decimal(38,0)")
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(y38 * F.col("y")).cast("decimal(38,0)").alias("s2"),
        F.sum(y38 * F.col("y") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("s3"),
        F.sum(
            F.round(
                ((F.col("y") / 100000.0) * (F.col("y") / 100000.0))
                * ((F.col("y") / 100000.0) * (F.col("y") / 100000.0)),
                2,
            ).cast("decimal(36,2)")
        )
        .cast("double")
        .alias("s4k"),
    )
    nn = F.col("n").cast("double")
    mu = F.col("s").cast("double") / F.col("n") / 100000.0
    mm2 = F.col("s2").cast("double") / F.col("n") / 10000000000.0
    mm3 = (
        F.col("s3").cast("double") / F.col("n") / 1000000000000000.0
    )
    m2 = mm2 - mu * mu
    m3 = mm3 - 3.0 * mu * mm2 + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4k") / F.col("n")
        - 4.0 * mu * mm3
        + 6.0 * mu * mu * mm2
        - 3.0 * mu * mu * mu * mu
    )
    g1 = F.round(
        m3 / F.sqrt(m2 * m2 * m2) * F.sqrt(nn * (F.col("n") - 1))
        / (F.col("n") - 2),
        8,
    )
    g2 = F.round(
        (nn - 1)
        / ((F.col("n") - 2.0) * (F.col("n") - 3.0))
        * ((F.col("n") + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0),
        8,
    )
    denom_adj = (
        3.0
        * (nn - 1)
        * (F.col("n") - 1)
        / ((F.col("n") - 2.0) * (F.col("n") - 3.0))
    )
    bc = (g1 * g1 + 1.0) / (g2 + denom_adj)
    return mom.select(
        F.col("n").alias("n_days"),
        (g1 + 0.0).alias("sample_skewness_g1"),
        (g2 + 0.0).alias("excess_kurtosis_g2"),
        (F.round(bc, 8) + 0.0).alias("bimodality_coefficient"),
        F.when(bc > 0.5555555555555556, 1)
        .otherwise(0)
        .cast("int")
        .alias("exceeds_uniform_bc"),
    )


# --------------------------------------------------------------------------
# Watson U^2 circular-uniformity test on second-of-day event phases
# --------------------------------------------------------------------------
@register(
    "watson_u2_hours",
    oracle="""
    WITH phases AS (
        SELECT CAST((epoch_us(ts) % 86400000000) // 1000000
                    AS BIGINT) AS s
        FROM events
    ),
    grid AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS c
        FROM phases GROUP BY s
    ),
    cum AS (
        SELECT s, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY s ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS head,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM grid
    ),
    terms AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(round(
                   c * ((s + 0.5) / 86400.0) * ((s + 0.5) / 86400.0)
                   - ((s + 0.5) / 86400.0) * c * (2.0 * head + c) / n
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
                   AS DECIMAL(38,10))) AS DOUBLE) AS s_cvm,
               CAST(SUM(CAST(round(c * ((s + 0.5) / 86400.0), 8)
                             AS DECIMAL(28,8))) AS DOUBLE) AS s_u
        FROM cum GROUP BY n
    )
    SELECT n AS n_events,
           round(s_u / n, 8) + 0.0 AS mean_phase,
           round(1.0 / (12.0 * n) + s_cvm, 6) + 0.0 AS cvm_w2,
           round(1.0 / (12.0 * n) + s_cvm
                 - n * (s_u / n - 0.5) * (s_u / n - 0.5), 6) + 0.0
               AS watson_u2,
           CAST(CASE WHEN 1.0 / (12.0 * n) + s_cvm
                          - n * (s_u / n - 0.5) * (s_u / n - 0.5)
                          > 0.187 THEN 1 ELSE 0 END AS INT)
               AS reject_uniform_5pct
    FROM terms
    """,
)
def watson_u2_hours(spark, sf_dir):
    """WATSON'S U^2 circular-uniformity test on second-of-day event
    phases: U^2 = W^2 - n*(ubar - 1/2)^2 — the rotation-INVARIANT
    repair of Cramer-von Mises for circular data (a KS/CvM verdict
    on hours depends on where midnight cuts the circle; Watson's
    does not) — the quantitative second opinion to
    `hodges_ajne_circular` (a sign test, ignores magnitudes) and
    `rayleigh_circular_hours` (first-harmonic only: U^2 also sees
    bimodal 12-hour patterns Rayleigh is blind to). Asymptotic 5%
    critical value 0.187.

    Device: phases discretize to the bounded 86400-point second-of-
    day grid (stated); the per-unit CvM sum collapses onto it via
    the `cvm_lognormal_gof` tie-group identity (exact square-
    pyramidal partial sums in DECIMAL(38,0)); F is the literal
    midpoint (s+0.5)/86400. Plan: one phase rollup, one bounded
    grid cumulative, one fold."""
    e = t(spark, sf_dir, "events")
    phases = e.select(
        F.floor(
            (F.unix_micros("ts") % 86_400_000_000) / 1_000_000
        )
        .cast("bigint")
        .alias("s")
    )
    grid = phases.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = grid.select(
        "s",
        "c",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("s").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("head"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias(
            "n"
        ),
    )
    ff = (F.col("s") + 0.5) / 86400.0
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
    uterm = F.round(F.col("c") * ff, 8).cast("decimal(28,8)")
    terms = cum.groupBy("n").agg(
        F.sum(term).cast("double").alias("s_cvm"),
        F.sum(uterm).cast("double").alias("s_u"),
    )
    ubar = F.col("s_u") / F.col("n")
    w2 = 1.0 / (12.0 * F.col("n")) + F.col("s_cvm")
    u2 = w2 - F.col("n") * (ubar - 0.5) * (ubar - 0.5)
    return terms.select(
        F.col("n").alias("n_events"),
        (F.round(ubar, 8) + 0.0).alias("mean_phase"),
        (F.round(w2, 6) + 0.0).alias("cvm_w2"),
        (F.round(u2, 6) + 0.0).alias("watson_u2"),
        F.when(u2 > 0.187, 1)
        .otherwise(0)
        .cast("int")
        .alias("reject_uniform_5pct"),
    )


# --------------------------------------------------------------------------
# Benford first-two-digits forensic test on order amounts
# --------------------------------------------------------------------------
@register(
    "benford_first_two_digits",
    oracle="""
    WITH pts AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
                   AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),
                   1, 2) AS BIGINT) AS d
        FROM orders
    ),
    obs AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS o
        FROM pts WHERE d >= 10 GROUP BY d
    ),
    digits AS (
        SELECT CAST(u.g AS BIGINT) AS d,
               round(ln(1.0 + 1.0 / u.g)
                     / 2.302585092994046, 10) AS p
        FROM LATERAL UNNEST(range(10, 100)) AS u(g)
    ),
    fold AS (
        SELECT CAST(SUM(COALESCE(o.o, 0)) AS BIGINT) AS n,
               CAST(SUM(CAST(round(
                   (COALESCE(o.o, 0) * 1.0) * COALESCE(o.o, 0), 2)
                   AS DECIMAL(38,2)) / dg.p) AS DOUBLE) AS s_oo_p,
               CAST(SUM(CAST(round(abs(COALESCE(o.o, 0) * 1.0
                   / (SELECT SUM(o) FROM obs) - dg.p), 10)
                   AS DECIMAL(18,10))) AS DOUBLE) AS sad
        FROM digits dg LEFT JOIN obs o ON dg.d = o.d
    )
    SELECT n AS n_orders,
           round(s_oo_p / n - n, 4) + 0.0 AS benford_ft_chi2,
           round(sad / 90.0, 8) + 0.0 AS mad_first_two,
           CASE WHEN round(sad / 90.0, 8) <= 0.0012
                    THEN 'close'
                WHEN round(sad / 90.0, 8) <= 0.0018
                    THEN 'acceptable'
                WHEN round(sad / 90.0, 8) <= 0.0022
                    THEN 'marginal'
                ELSE 'nonconforming' END AS nigrini_conformity
    FROM fold
    """,
)
def benford_first_two_digits(spark, sf_dir):
    """BENFORD FIRST-TWO-DIGITS test on order amounts (Nigrini's
    forensic standard): the 90-cell chi2 against log10(1+1/d) via
    the identity chi2 = sum(o_d^2/(n p_d)) - n, and the mean
    absolute deviation with Nigrini's published conformity bands
    (0.0012 / 0.0018 / 0.0022) — the high-resolution escalation of
    `benford_first_digit` / `benford_second_digit_mad`: fabricated
    or threshold-gamed amounts that pass both single-digit screens
    still light up specific first-two cells (the classic "just
    under an approval limit" spike). Digits extract by STRING
    prefix of the exact integer cents — no log10, no float
    boundary.

    Exactness: cell counts exact; expected probabilities pin at 10
    dp from ln literals (1/ln10 literal); the chi2 identity needs
    one o^2/p fold. Plan: one digit rollup, one 90-row broadcast
    left join, one fold."""
    o = t(spark, sf_dir, "orders")
    pts = o.select(
        F.substring(
            (dec("o_totalprice", 18, 2) * 100)
            .cast("bigint")
            .cast("string"),
            1,
            2,
        )
        .cast("bigint")
        .alias("d")
    ).where(F.col("d") >= 10)
    obs = pts.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    digits = spark.range(10, 100).select(
        F.col("id").cast("bigint").alias("d"),
        F.round(
            F.log(1.0 + 1.0 / F.col("id")) / 2.302585092994046, 10
        ).alias("p"),
    )
    ntot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    joined = (
        digits.join(obs, "d", "left")
        .crossJoin(F.broadcast(ntot))
        .select(
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            "p",
            "n",
        )
    )
    fold = joined.agg(
        F.max("n").alias("n"),
        F.sum(
            F.round(F.col("o") * 1.0 * F.col("o"), 2).cast(
                "decimal(38,2)"
            )
            / F.col("p")
        )
        .cast("double")
        .alias("s_oo_p"),
        F.sum(
            F.round(
                F.abs(F.col("o") * 1.0 / F.col("n") - F.col("p")), 10
            ).cast("decimal(18,10)")
        )
        .cast("double")
        .alias("sad"),
    )
    mad = F.round(F.col("sad") / 90.0, 8)
    return fold.select(
        F.col("n").alias("n_orders"),
        (
            F.round(F.col("s_oo_p") / F.col("n") - F.col("n"), 4)
            + 0.0
        ).alias("benford_ft_chi2"),
        (mad + 0.0).alias("mad_first_two"),
        F.when(mad <= 0.0012, "close")
        .when(mad <= 0.0018, "acceptable")
        .when(mad <= 0.0022, "marginal")
        .otherwise("nonconforming")
        .alias("nigrini_conformity"),
    )


# --------------------------------------------------------------------------
# GEV shape from monthly block maxima via L-moments
# --------------------------------------------------------------------------
@register(
    "gev_lmoment_blockmax",
    oracle=f"""
    WITH {_DAILY_SQL},
    bm AS (
        SELECT CAST(day // 30 AS BIGINT) AS blk,
               CAST(MAX(y) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM daily GROUP BY 1 HAVING COUNT(*) = 30
    ),
    ranked AS (
        SELECT m, ROW_NUMBER() OVER (ORDER BY m, blk) AS i,
               COUNT(*) OVER () AS n
        FROM bm
    ),
    pwm AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DOUBLE) AS b0n,
               CAST(SUM(CAST(m AS DECIMAL(38,0)) * (i - 1))
                    AS DOUBLE) AS b1nn,
               CAST(SUM(CAST(m AS DECIMAL(38,0)) * (i - 1)
                        * (i - 2)) AS DOUBLE) AS b2nnn
        FROM ranked
    ),
    lmom AS (
        SELECT n,
               b0n / n / 100000.0 AS l1,
               (2.0 * b1nn / (n - 1.0) - b0n) / n / 100000.0 AS l2,
               (6.0 * b2nnn / ((n - 1.0) * (n - 2.0))
                - 6.0 * b1nn / (n - 1.0) + b0n) / n / 100000.0
                   AS l3
        FROM pwm
    )
    SELECT n AS n_blocks,
           round(l1, 6) + 0.0 AS l1_kusd,
           round(l2, 6) + 0.0 AS l2_kusd,
           round(l3 / l2, 8) + 0.0 AS tau3,
           round(-(7.8590 * (2.0 / (3.0 + l3 / l2)
                            - 0.6309297535714574)
                   + 2.9554 * (2.0 / (3.0 + l3 / l2)
                               - 0.6309297535714574)
                     * (2.0 / (3.0 + l3 / l2)
                        - 0.6309297535714574)), 8) + 0.0
               AS xi_gev
    FROM lmom
    """,
)
def gev_lmoment_blockmax(spark, sf_dir):
    """GEV SHAPE from 30-day block maxima of daily revenue via the
    Hosking L-moment estimator: c = 2/(3+tau3) - ln2/ln3, k =
    7.8590c + 2.9554c^2, xi = -k — the BLOCK-MAXIMA route to the
    same tail-shape parameter the threshold route estimates in
    `gpd_shape_stability` / `pot_gpd_pwm_fit`: EVT says the two xi's
    must agree if either regime is real, so their gap is the
    sharpest tail-model audit available (and `gumbel_block_maxima`
    is the xi = 0 special case this generalizes).

    Exactness: block maxima are exact integer cents over exact
    30-day blocks (partial blocks dropped); the PWM weights
    (i-1), (i-1)(i-2) are exact integers on the bounded block frame
    (row_number with the blk tiebreak = the standard unbiased PWM
    ordering); ln2/ln3 and the Hosking coefficients are shared
    literals. Plan: one day rollup, one bounded block rollup, one
    rank window over the ~85-row block frame, one fold."""
    daily = _daily(spark, sf_dir)
    bm = (
        daily.groupBy(F.floor(F.col("day") / 30).alias("blk"))
        .agg(
            F.max("y").cast("bigint").alias("m"),
            F.count(F.lit(1)).cast("bigint").alias("nd"),
        )
        .where(F.col("nd") == 30)
    )
    ranked = bm.select(
        "m",
        F.row_number().over(Window.orderBy("m", "blk")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    pwm = ranked.agg(
        F.max("n").alias("n"),
        F.sum(F.col("m").cast("decimal(38,0)"))
        .cast("double")
        .alias("b0n"),
        F.sum(F.col("m").cast("decimal(38,0)") * (F.col("i") - 1))
        .cast("double")
        .alias("b1nn"),
        F.sum(
            F.col("m").cast("decimal(38,0)")
            * (F.col("i") - 1)
            * (F.col("i") - 2)
        )
        .cast("double")
        .alias("b2nnn"),
    )
    nn = F.col("n").cast("double")
    l1 = F.col("b0n") / F.col("n") / 100000.0
    l2 = (
        (2.0 * F.col("b1nn") / (nn - 1.0) - F.col("b0n"))
        / F.col("n")
        / 100000.0
    )
    l3 = (
        (
            6.0 * F.col("b2nnn") / ((nn - 1.0) * (nn - 2.0))
            - 6.0 * F.col("b1nn") / (nn - 1.0)
            + F.col("b0n")
        )
        / F.col("n")
        / 100000.0
    )
    c = 2.0 / (3.0 + l3 / l2) - 0.6309297535714574
    return pwm.select(
        F.col("n").alias("n_blocks"),
        (F.round(l1, 6) + 0.0).alias("l1_kusd"),
        (F.round(l2, 6) + 0.0).alias("l2_kusd"),
        (F.round(l3 / l2, 8) + 0.0).alias("tau3"),
        (F.round(-(7.8590 * c + 2.9554 * c * c), 8) + 0.0).alias(
            "xi_gev"
        ),
    )


# --------------------------------------------------------------------------
# Theil U1 forecast accuracy for the seasonal naive
# --------------------------------------------------------------------------
@register(
    "theil_u1_forecast",
    oracle=f"""
    WITH {_DAILY_SQL},
    fc AS (
        SELECT y, LAG(y, 7) OVER (ORDER BY day) AS yhat
        FROM daily QUALIFY yhat IS NOT NULL
    ),
    fold AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y - yhat AS DECIMAL(38,0))
                        * (y - yhat)) AS DECIMAL(38,0)) AS sse,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y)
                    AS DECIMAL(38,0)) AS syy,
               CAST(SUM(CAST(yhat AS DECIMAL(38,0)) * yhat)
                    AS DECIMAL(38,0)) AS shh
        FROM fc
    )
    SELECT n AS n_days,
           round(sqrt(CAST(sse AS DOUBLE) / n) / 100000.0, 6)
               + 0.0 AS rmse_kusd,
           round(sqrt(CAST(sse AS DOUBLE) / n)
                 / (sqrt(CAST(syy AS DOUBLE) / n)
                    + sqrt(CAST(shh AS DOUBLE) / n)), 8) + 0.0
               AS theil_u1
    FROM fold
    """,
)
def theil_u1_forecast(spark, sf_dir):
    """THEIL'S U1 accuracy coefficient for the lag-7 seasonal-naive
    forecast: RMSE normalized by the sum of the root mean squares of
    actuals and forecasts — bounded in [0,1] with 0 = perfect, so it
    is comparable ACROSS series of different scales, which neither
    RMSE nor `smape_wape_panel`'s percentage metrics achieve on
    near-zero series; completes the Theil pair with
    `theil_u2_forecast_skill` (U2 benchmarks against the naive; U1
    grades absolute accuracy).

    Exactness: squared-error and squared-level sums are exact
    DECIMAL(38,0) integer folds; three square roots at the end.
    Plan: one day rollup, one calendar lag, one fold."""
    daily = _daily(spark, sf_dir)
    fc = daily.select(
        "y",
        F.lag("y", 7).over(Window.orderBy("day")).alias("yhat"),
    ).where(F.col("yhat").isNotNull())
    e = (F.col("y") - F.col("yhat")).cast("decimal(38,0)")
    fold = fc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(e * (F.col("y") - F.col("yhat")))
        .cast("decimal(38,0)")
        .alias("sse"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("yhat").cast("decimal(38,0)") * F.col("yhat"))
        .cast("decimal(38,0)")
        .alias("shh"),
    )
    rmse = F.sqrt(F.col("sse").cast("double") / F.col("n"))
    return fold.select(
        F.col("n").alias("n_days"),
        (F.round(rmse / 100000.0, 6) + 0.0).alias("rmse_kusd"),
        (
            F.round(
                rmse
                / (
                    F.sqrt(F.col("syy").cast("double") / F.col("n"))
                    + F.sqrt(F.col("shh").cast("double") / F.col("n"))
                ),
                8,
            )
            + 0.0
        ).alias("theil_u1"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "watson_u2_hours": (
            "one cumulative over the bounded 86400-point second-of-"
            "day grid (the cvm_lognormal class)"
        ),
        "gev_lmoment_blockmax": (
            "row_number over the bounded ~85-row block-maxima frame"
        ),
        "theil_u1_forecast": ("lag-7 window over the calendar-day frame"),
        "brown_mood_median_line": (
            "half medians via percentile_disc over the calendar-day "
            "frame (bounded domain)"
        ),
    }
)


# --------------------------------------------------------------------------
# Delete-one-nation jackknife SE for the customer-spend Gini
# --------------------------------------------------------------------------
@register(
    "gini_jackknife_se",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS g, o.o_custkey AS u,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS m
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ggrid AS (
        SELECT g, m AS v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(m) AS BIGINT) AS tv
        FROM spend GROUP BY g, m
    ),
    vgrid AS (SELECT DISTINCT v FROM ggrid),
    gl AS (SELECT DISTINCT g FROM ggrid),
    full_g AS (
        SELECT vg.v, gg.g,
               COALESCE(x.c, 0) AS c0, COALESCE(x.tv, 0) AS tv0
        FROM vgrid vg CROSS JOIN gl gg
        LEFT JOIN ggrid x ON x.v = vg.v AND x.g = gg.g
    ),
    cume AS (
        SELECT v, g,
               CAST(COALESCE(SUM(c0) OVER w, 0) AS BIGINT) AS ce,
               CAST(COALESCE(SUM(tv0) OVER w, 0) AS BIGINT) AS cve
        FROM full_g
        WINDOW w AS (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
    ),
    splus AS (
        SELECT h.g AS gh, k.g AS gk,
               CAST(SUM(CAST(h.c AS DECIMAL(38,0))
                        * (CAST(h.v AS DECIMAL(38,0)) * k.ce
                           - k.cve)) AS DECIMAL(38,0)) AS sp
        FROM ggrid h JOIN cume k ON h.v = k.v
        GROUP BY h.g, k.g
    ),
    gtot AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
               CAST(SUM(tv) AS BIGINT) AS sg
        FROM ggrid GROUP BY g
    ),
    tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(SUM(sg) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS ngrp
        FROM gtot
    ),
    tall AS (SELECT CAST(SUM(CAST(sp AS DOUBLE)) AS DOUBLE) AS tt
             FROM splus),
    loo AS (
        SELECT gt.g,
               round((tall.tt
                      - (SELECT SUM(CAST(sp AS DOUBLE)) FROM splus
                         WHERE gh = gt.g)
                      - (SELECT SUM(CAST(sp AS DOUBLE)) FROM splus
                         WHERE gk = gt.g)
                      + (SELECT SUM(CAST(sp AS DOUBLE)) FROM splus
                         WHERE gh = gt.g AND gk = gt.g))
                     / ((tot.n - gt.ng)
                        * (CAST(tot.s AS DOUBLE) - gt.sg)), 10)
                   AS g_loo
        FROM gtot gt, tot, tall
    ),
    jk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS ngrp,
               CAST(SUM(CAST(g_loo AS DECIMAL(18,10)))
                    AS DOUBLE) AS sgl,
               CAST(SUM(CAST(round(g_loo * g_loo, 12)
                             AS DECIMAL(18,12))) AS DOUBLE) AS sgl2
        FROM loo
    )
    SELECT (SELECT n FROM tot) AS n_customers,
           (SELECT ngrp FROM tot) AS n_nations,
           (SELECT round(tall.tt
                         / (CAST(tot.n AS DOUBLE) * tot.s), 8) + 0.0
            FROM tall, tot) AS gini,
           round(sqrt((jk.ngrp - 1.0) / jk.ngrp
                      * (jk.sgl2 - jk.sgl * jk.sgl / jk.ngrp)), 8)
               + 0.0 AS gini_jackknife_se
    FROM jk
    """,
)
def gini_jackknife_se(spark, sf_dir):
    """DELETE-ONE-NATION grouped jackknife standard error for the
    customer-spend Gini: each leave-one-nation-out Gini recomputes
    from PAIR-SUM ARITHMETIC alone — G_(-g) = (T - row_g - col_g +
    s+(g,g)) / ((n-n_g)(S-S_g)) over the 25x25 ordered-pair sums
    s+(h,k) built once on the merged grid (the
    `dagum_gini_decomposition` device pointed at nations) — so 25
    full Gini recomputations cost one frame and 625 bounded rows.
    This is the PRECISION statement every inequality readout in the
    registry (`customer_inequality_panel`, `wolfson_polarization`,
    the Dagum decomposition) was missing: a Gini without an SE
    cannot be compared across rounds.

    Exactness: all pair sums exact DECIMAL(38,0) on the ranged-
    window-free construction; leave-out Ginis pin at 10 dp before
    the jackknife spread fold (12-dp squares). Grouped-jackknife
    caveat (25 groups) documented. Plan: one merged-grid frame, one
    pair rollup, bounded 25-row jackknife fold."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("g"),
            F.col("o_custkey").alias("u"),
        )
        .agg(
            F.sum((dec("o_totalprice", 18, 2) * 100).cast("bigint"))
            .cast("bigint")
            .alias("m")
        )
    )
    ggrid = (
        spend.groupBy("g", F.col("m").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum("m").cast("bigint").alias("tv"),
        )
        .persist()
    )
    vgrid = ggrid.select("v").distinct()
    gl = ggrid.select("g").distinct()
    full_g = (
        vgrid.crossJoin(F.broadcast(gl))
        .join(ggrid, ["v", "g"], "left")
        .select(
            "v",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).alias("c0"),
            F.coalesce(F.col("tv"), F.lit(0)).alias("tv0"),
        )
        .repartitionByRange(8, F.col("v").asc())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    psums = full_g.groupBy("pid", "g").agg(
        F.sum("c0").cast("bigint").alias("pc"),
        F.sum("tv0").cast("bigint").alias("pv"),
    )
    prior = psums.select(
        F.col("pid").alias("bpid"),
        F.col("g").alias("bg"),
        "pc",
        "pv",
    )
    offsets = (
        psums.select("pid", "g")
        .join(
            prior,
            (F.col("bg") == F.col("g"))
            & (F.col("bpid") < F.col("pid")),
            "left",
        )
        .groupBy("pid", "g")
        .agg(
            F.coalesce(F.sum("pc"), F.lit(0)).alias("off_c"),
            F.coalesce(F.sum("pv"), F.lit(0)).alias("off_v"),
        )
    )
    lw = (
        Window.partitionBy("pid", "g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cume = full_g.join(F.broadcast(offsets), ["pid", "g"]).select(
        "v",
        "g",
        (F.coalesce(F.sum("c0").over(lw), F.lit(0)) + F.col("off_c"))
        .cast("bigint")
        .alias("ce"),
        (F.coalesce(F.sum("tv0").over(lw), F.lit(0)) + F.col("off_v"))
        .cast("bigint")
        .alias("cve"),
    )
    splus = (
        ggrid.alias("h")
        .join(cume.alias("k"), F.col("h.v") == F.col("k.v"))
        .groupBy(F.col("h.g").alias("gh"), F.col("k.g").alias("gk"))
        .agg(
            F.sum(
                F.col("h.c").cast("decimal(38,0)")
                * (
                    F.col("h.v").cast("decimal(38,0)") * F.col("k.ce")
                    - F.col("k.cve")
                )
            )
            .cast("decimal(38,0)")
            .alias("sp")
        )
        .persist()
    )
    gtot = ggrid.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("ng"),
        F.sum("tv").cast("bigint").alias("sg"),
    )
    tot = gtot.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("ngrp"),
    )
    tall = splus.agg(
        F.sum(F.col("sp").cast("double")).alias("tt")
    )
    rowg = splus.groupBy("gh").agg(
        F.sum(F.col("sp").cast("double")).alias("row_s")
    )
    colg = splus.groupBy("gk").agg(
        F.sum(F.col("sp").cast("double")).alias("col_s")
    )
    diag = splus.where(F.col("gh") == F.col("gk")).select(
        F.col("gh").alias("g"), F.col("sp").cast("double").alias("dg")
    )
    loo = (
        gtot.join(F.broadcast(rowg), gtot.g == rowg.gh)
        .join(F.broadcast(colg), gtot.g == colg.gk)
        .join(F.broadcast(diag.withColumnRenamed("g", "dgk")),
              gtot.g == F.col("dgk"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tall))
        .select(
            F.round(
                (
                    F.col("tt")
                    - F.col("row_s")
                    - F.col("col_s")
                    + F.col("dg")
                )
                / (
                    (F.col("n") - F.col("ng"))
                    * (F.col("s").cast("double") - F.col("sg"))
                ),
                10,
            ).alias("g_loo")
        )
    )
    jk = loo.agg(
        F.count(F.lit(1)).cast("bigint").alias("ngrp"),
        F.sum(F.col("g_loo").cast("decimal(18,10)"))
        .cast("double")
        .alias("sgl"),
        F.sum(
            F.round(F.col("g_loo") * F.col("g_loo"), 12).cast(
                "decimal(18,12)"
            )
        )
        .cast("double")
        .alias("sgl2"),
    )
    gini = tall.crossJoin(F.broadcast(tot)).select(
        (
            F.round(
                F.col("tt")
                / (F.col("n").cast("double") * F.col("s")),
                8,
            )
            + 0.0
        ).alias("gini"),
        F.col("n").alias("n_customers"),
        F.col("ngrp").alias("n_nations"),
    )
    return gini.crossJoin(F.broadcast(jk)).select(
        "n_customers",
        "n_nations",
        "gini",
        (
            F.round(
                F.sqrt(
                    (F.col("ngrp") - 1.0)
                    / F.col("ngrp")
                    * (
                        F.col("sgl2")
                        - F.col("sgl") * F.col("sgl") / F.col("ngrp")
                    )
                ),
                8,
            )
            + 0.0
        ).alias("gini_jackknife_se"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "gini_jackknife_se": (
            "per-(pid, nation) local exclusive windows on the ranged "
            "device (the dagum_gini class); jackknife runs on the "
            "bounded 25-row nation frame"
        ),
    }
)


# --------------------------------------------------------------------------
# Lexis ratio: overdispersion of the daily purchase share
# --------------------------------------------------------------------------
@register(
    "lexis_ratio_proportions",
    oracle="""
    WITH dday AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS kd
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS d,
               CAST(SUM(nd) AS BIGINT) AS n,
               CAST(SUM(kd) AS BIGINT) AS k
        FROM dday
    ),
    fold AS (
        SELECT tot.d, tot.n, tot.k,
               CAST(SUM(CAST(round(
                   (kd * CAST(tot.n AS DOUBLE) - CAST(tot.k
                        AS DOUBLE) * nd)
                   * (kd * CAST(tot.n AS DOUBLE) - CAST(tot.k
                        AS DOUBLE) * nd)
                   / nd / CAST(tot.n AS DOUBLE) / tot.n, 8)
                   AS DECIMAL(28,8))) AS DOUBLE) AS q_num
        FROM dday, tot GROUP BY tot.d, tot.n, tot.k
    )
    SELECT d AS n_days, k AS n_purchases,
           round(CAST(k AS DOUBLE) / n, 8) + 0.0 AS pooled_share,
           round(q_num / (CAST(k AS DOUBLE) / n
                          * (1.0 - CAST(k AS DOUBLE) / n)), 4)
               + 0.0 AS lexis_chi2,
           round(q_num / (CAST(k AS DOUBLE) / n
                          * (1.0 - CAST(k AS DOUBLE) / n))
                 / (d - 1.0), 6) + 0.0 AS lexis_ratio,
           round((q_num / (CAST(k AS DOUBLE) / n
                           * (1.0 - CAST(k AS DOUBLE) / n))
                  - (d - 1.0)) / sqrt(2.0 * (d - 1.0)), 6) + 0.0
               AS overdispersion_z
    FROM fold
    """,
)
def lexis_ratio_proportions(spark, sf_dir):
    """LEXIS RATIO for the daily purchase share: Q = sum n_d (p_d -
    pbar)^2 / (pbar(1-pbar)) ~ chi2(D-1) under a constant binomial
    share, and L = Q/(D-1) reads directly as the variance inflation
    of daily proportions over binomial sampling noise — the
    PROPORTIONS-side second opinion to `dean_overdispersion_test`
    (counts) and the day-to-day stability certificate behind every
    pooled conversion-rate readout (`srm_guardrail_check` tests ONE
    day's split; Lexis tests all of them jointly).

    Exactness: the per-day term (k_d*N - K*n_d)^2/(n_d*N^2) is an
    exact rational of integers rounded at 8 dp before the DECIMAL
    fold; the pooled-share denominator divides once at the end.
    Plan: one day rollup, one broadcast scalar, one fold."""
    e = t(spark, sf_dir, "events")
    dday = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("kd"),
    )
    tot = dday.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("nd").cast("bigint").alias("n"),
        F.sum("kd").cast("bigint").alias("k"),
    )
    num = F.col("kd") * F.col("n").cast("double") - F.col("k").cast(
        "double"
    ) * F.col("nd")
    fold = (
        dday.crossJoin(F.broadcast(tot))
        .groupBy("d", "n", "k")
        .agg(
            F.sum(
                F.round(
                    num
                    * num
                    / F.col("nd")
                    / F.col("n").cast("double")
                    / F.col("n"),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("q_num")
        )
    )
    pbar = F.col("k").cast("double") / F.col("n")
    q = F.col("q_num") / (pbar * (1.0 - pbar))
    return fold.select(
        F.col("d").alias("n_days"),
        F.col("k").alias("n_purchases"),
        (F.round(pbar, 8) + 0.0).alias("pooled_share"),
        (F.round(q, 4) + 0.0).alias("lexis_chi2"),
        (F.round(q / (F.col("d") - 1.0), 6) + 0.0).alias(
            "lexis_ratio"
        ),
        (
            F.round(
                (q - (F.col("d") - 1.0))
                / F.sqrt(2.0 * (F.col("d") - 1.0)),
                6,
            )
            + 0.0
        ).alias("overdispersion_z"),
    )
