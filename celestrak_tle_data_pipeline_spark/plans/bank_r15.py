"""Round-15 pre-staged bank (candidate X493+): STAGED, not in the live
registry — the next bank generation behind ``bank_r14`` (round 14's
flip), under the identical no-new-debt discipline: stage-only
decorator, two-SF gate mirror in ``tests/test_bank_r15.py``, sf0.1
sweeps via ``tools/bank_check.py --module bank_r15``, the dtype-family
sweep (``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r17),
and plan-audit notes pre-adjudicated at authoring time.

Seed theme: the AUDIT BENCH — the statistics a 100 TB pipeline runs on
its own per-segment readouts rather than on raw rows: meta-analytic
pooling of per-nation effects (DerSimonian-Laird, Egger funnel
asymmetry), distribution-shape certification (D'Agostino K²),
structural-break monitoring (MOSUM), irregular-sampling spectra
(Lomb-Scargle), long-memory certification (DFA), model-output
calibration repair (isotonic PAVA), serially-correlated trend repair
(Cochrane-Orcutt), familywise-error panels (Holm/Hochberg/Šidák), and
directed-graph reciprocity (Holland-Leinhardt dyad census).

Determinism disciplines inherited unchanged (bank_r11..r14
docstrings): exact integer/DECIMAL folds, round-before-fold on every
float aggregate, ``+ 0.0`` on possibly-negative-zero outputs,
total-order top-k/argmax tiebreaks, bounded-domain windows only,
explicit ``floor()`` before any double->integer bucket, DOUBLE-cast
literals where DuckDB would infer DECIMAL, and the shared
Abramowitz-Stegun erfc tree (``stats_tests._p_two_sided_sql``) for
normal tails — neither engine ships ``erf`` in SQL.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13/r14): records the query in
    the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Per-nation effect frame shared by the meta-analysis pair
# --------------------------------------------------------------------------
# Each of the 25 nations is a "study": the effect is the urgent-minus-
# routine mean order value in THOUSANDS of dollars (k$ keeps every
# folded weight term O(0.1..100) at every SF, so fixed-dp
# round-before-fold loses nothing), its variance the Welch two-sample
# variance of that mean difference. Exact cents power sums per
# (nation, arm); y and v are rounded at 8 dp BEFORE any reciprocal so
# both engines weight identical doubles.
_EFFECTS_SQL = """
    arm AS (
        SELECT c.c_nationkey AS nk,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS urgent,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                                  * 100 AS BIGINT)
                             AS DECIMAL(38,0))
                        * CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                                    * 100 AS BIGINT)
                               AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS ss
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    eff AS (
        SELECT u.nk,
               round((CAST(u.s AS DOUBLE) / u.n
                      - CAST(r.s AS DOUBLE) / r.n) / 100000.0, 8) AS y,
               round(((CAST(u.ss AS DOUBLE)
                       - CAST(u.s AS DOUBLE) * u.s / u.n)
                      / (u.n - 1) / u.n
                      + (CAST(r.ss AS DOUBLE)
                         - CAST(r.s AS DOUBLE) * r.s / r.n)
                        / (r.n - 1) / r.n) / 10000000000.0, 8) AS v
        FROM arm u JOIN arm r ON u.nk = r.nk
        WHERE u.urgent = 1 AND r.urgent = 0 AND u.n > 1 AND r.n > 1
    )
"""


def _effects(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cents = (dec("o_totalprice", 18, 2) * 100).cast("bigint")
    arm = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("urgent"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).cast("bigint").alias("s"),
            F.sum(
                cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("ss"),
        )
    )
    u = arm.where((F.col("urgent") == 1) & (F.col("n") > 1)).select(
        "nk",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    r = arm.where((F.col("urgent") == 0) & (F.col("n") > 1)).select(
        "nk",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    n2, s2, ss2 = F.col("n2"), F.col("s2"), F.col("ss2")
    return u.join(r, "nk").select(
        "nk",
        F.round(
            (s1.cast("double") / n1 - s2.cast("double") / n2) / 100000.0,
            8,
        ).alias("y"),
        F.round(
            (
                (ss1.cast("double") - s1.cast("double") * s1 / n1)
                / (n1 - 1)
                / n1
                + (ss2.cast("double") - s2.cast("double") * s2 / n2)
                / (n2 - 1)
                / n2
            )
            / 10000000000.0,
            8,
        ).alias("v"),
    )


# --------------------------------------------------------------------------
# DerSimonian-Laird random-effects meta-analysis
# --------------------------------------------------------------------------
@register(
    "dersimonian_laird_meta",
    oracle=f"""
    WITH {_EFFECTS_SQL},
    s1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(round(1.0 / v, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sw,
               CAST(SUM(CAST(round(y / v, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS swy,
               CAST(SUM(CAST(round(y * y / v, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS swyy,
               CAST(SUM(CAST(round(1.0 / v / v, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sww
        FROM eff
    ),
    het AS (
        SELECT k, sw, swy,
               swyy - swy * swy / sw AS q,
               round(greatest(0.0, (swyy - swy * swy / sw - (k - 1))
                                   / (sw - sww / sw)), 8) AS tau2
        FROM s1
    ),
    s2 AS (
        SELECT het.k, het.q, het.tau2, het.swy, het.sw,
               CAST(SUM(CAST(round(1.0 / round(eff.v + het.tau2, 8), 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS swr,
               CAST(SUM(CAST(round(eff.y / round(eff.v + het.tau2, 8), 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS swry
        FROM eff, het
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT k AS k_studies,
           round(q, 6) + 0.0 AS q_heterogeneity,
           round(100.0 * greatest(0.0, (q - (k - 1)) / q), 6) + 0.0
               AS i2_pct,
           round(tau2, 6) + 0.0 AS tau2_kusd2,
           round(swy / sw, 6) + 0.0 AS mu_fixed_kusd,
           round(swry / swr, 6) + 0.0 AS mu_random_kusd,
           round(swry / swr - 1.959963984540054 / sqrt(swr), 6) + 0.0
               AS ci95_lo,
           round(swry / swr + 1.959963984540054 / sqrt(swr), 6) + 0.0
               AS ci95_hi
    FROM s2
    """,
)
def dersimonian_laird_meta(spark, sf_dir):
    """DerSimonian-Laird random-effects pooling of the per-nation
    urgent-vs-routine order-value effect — the meta-analysis readout a
    segmented experiment actually ships: 25 nations are 25 "studies"
    with effect y_i (k$) and Welch variance v_i, Cochran's Q folds in
    ONE pass via Q = Σwy² − (Σwy)²/Σw, I² = max(0, (Q−df)/Q), the DL
    moment estimator τ² = max(0, (Q−df)/(Σw − Σw²/Σw)), and the
    random-effects pooled mean re-weights by 1/(v_i+τ²) with a 95%
    Wald CI. τ² is rounded at 8 dp before the second weighting so both
    engines re-weight identical doubles; every weight term is rounded
    at 8 dp and folded through DECIMAL(38,8) (order-independent).

    Scale: the study frame is the 25-nation domain — the only
    data-grain work is one orders⋈customer equi-join feeding a
    (nation, arm) hash rollup with exact cents power sums; both meta
    passes run on 25 rows. 100 TB: the rollup is map-side combinable,
    the join shuffles on custkey with AQE; nothing downstream scales
    with volume."""
    eff = _effects(spark, sf_dir)
    r8 = lambda c: F.round(c, 8).cast("decimal(38,8)")  # noqa: E731
    s1 = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(r8(1.0 / F.col("v"))).cast("double").alias("sw"),
        F.sum(r8(F.col("y") / F.col("v"))).cast("double").alias("swy"),
        F.sum(r8(F.col("y") * F.col("y") / F.col("v")))
        .cast("double")
        .alias("swyy"),
        F.sum(r8(1.0 / F.col("v") / F.col("v")))
        .cast("double")
        .alias("sww"),
    )
    q = F.col("swyy") - F.col("swy") * F.col("swy") / F.col("sw")
    het = s1.select(
        "k",
        "sw",
        "swy",
        q.alias("q"),
        F.round(
            F.greatest(
                F.lit(0.0),
                (q - (F.col("k") - 1))
                / (F.col("sw") - F.col("sww") / F.col("sw")),
            ),
            8,
        ).alias("tau2"),
    )
    vstar = F.round(F.col("v") + F.col("tau2"), 8)
    s2 = eff.crossJoin(F.broadcast(het)).groupBy(
        "k", "q", "tau2", "swy", "sw"
    ).agg(
        F.sum(r8(1.0 / vstar)).cast("double").alias("swr"),
        F.sum(r8(F.col("y") / vstar)).cast("double").alias("swry"),
    )
    mu_re = F.col("swry") / F.col("swr")
    half = 1.959963984540054 / F.sqrt(F.col("swr"))
    return s2.select(
        F.col("k").alias("k_studies"),
        (F.round("q", 6) + 0.0).alias("q_heterogeneity"),
        (
            F.round(
                100.0
                * F.greatest(
                    F.lit(0.0),
                    (F.col("q") - (F.col("k") - 1)) / F.col("q"),
                ),
                6,
            )
            + 0.0
        ).alias("i2_pct"),
        (F.round("tau2", 6) + 0.0).alias("tau2_kusd2"),
        (F.round(F.col("swy") / F.col("sw"), 6) + 0.0).alias(
            "mu_fixed_kusd"
        ),
        (F.round(mu_re, 6) + 0.0).alias("mu_random_kusd"),
        (F.round(mu_re - half, 6) + 0.0).alias("ci95_lo"),
        (F.round(mu_re + half, 6) + 0.0).alias("ci95_hi"),
    )


# --------------------------------------------------------------------------
# Egger funnel-plot asymmetry + Begg-style rank correlation
# --------------------------------------------------------------------------
@register(
    "egger_funnel_asymmetry",
    oracle=f"""
    WITH {_EFFECTS_SQL},
    pts AS (
        SELECT nk,
               round(y / sqrt(v), 8) AS z,
               round(1.0 / sqrt(v), 8) AS prec,
               y, v
        FROM eff
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(round(prec, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(z, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(prec * prec, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(round(prec * z, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(round(z * z, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS syy
        FROM pts
    ),
    fit AS (
        SELECT k, sxx,
               (k * sxy - sx * sy) / (k * sxx - sx * sx) AS b,
               sy / k - (k * sxy - sx * sy) / (k * sxx - sx * sx)
                   * sx / k AS a,
               (syy - sy * sy / k)
               - (k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / (k * (k * sxx - sx * sx)) AS ssr,
               (k * sxx - sx * sx) / k AS sxxc
        FROM m
    ),
    tau AS (
        SELECT CAST(SUM(CASE WHEN (a.y - b.y) * (a.v - b.v) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN (a.y - b.y) * (a.v - b.v) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(COUNT(*) AS BIGINT) AS np
        FROM pts a JOIN pts b ON a.nk < b.nk
    )
    SELECT f.k AS k_studies,
           round(f.a, 6) + 0.0 AS egger_intercept,
           round(f.a / sqrt(f.ssr / (f.k - 2) * f.sxx
                            / (f.k * f.sxxc)), 6) + 0.0 AS egger_t,
           round(f.b, 6) + 0.0 AS egger_slope,
           round((t.conc - t.disc) * 1.0 / t.np, 6) + 0.0
               AS begg_kendall_tau
    FROM fit f, tau t
    """,
)
def egger_funnel_asymmetry(spark, sf_dir):
    """Egger regression asymmetry test + a Begg-style rank
    correlation over the same 25-nation effect frame as
    ``dersimonian_laird_meta`` — the small-study/selection-bias audit:
    regress the standardized effect z_i = y_i/se_i on precision
    1/se_i; under no asymmetry the intercept is 0, and t = a/se(a)
    flags funnel skew. The Begg companion is Kendall tau-a between
    effect and variance over the 300 study pairs (exact integer
    concordance counts on 8 dp-rounded doubles).

    Determinism: z and precision rounded at 8 dp before the OLS
    moments; moments folded through DECIMAL(38,8); intercept/slope/t
    are terminal double expressions; pair counts are exact integers.
    Scale: identical to the DL query — one fact equi-join + hash
    rollup; the regression and the 25x25 pair join live on the
    25-row study domain."""
    eff = _effects(spark, sf_dir)
    pts = eff.select(
        "nk",
        F.round(F.col("y") / F.sqrt("v"), 8).alias("z"),
        F.round(1.0 / F.sqrt("v"), 8).alias("prec"),
        "y",
        "v",
    )
    r8 = lambda c: F.round(c, 8).cast("decimal(38,8)")  # noqa: E731
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(r8(F.col("prec"))).cast("double").alias("sx"),
        F.sum(r8(F.col("z"))).cast("double").alias("sy"),
        F.sum(r8(F.col("prec") * F.col("prec")))
        .cast("double")
        .alias("sxx"),
        F.sum(r8(F.col("prec") * F.col("z")))
        .cast("double")
        .alias("sxy"),
        F.sum(r8(F.col("z") * F.col("z"))).cast("double").alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    fit = m.select(
        "k",
        "sxx",
        b.alias("b"),
        (sy / k - b * sx / k).alias("a"),
        (
            (syy - sy * sy / k)
            - (k * sxy - sx * sy)
            * (k * sxy - sx * sy)
            / (k * (k * sxx - sx * sx))
        ).alias("ssr"),
        ((k * sxx - sx * sx) / k).alias("sxxc"),
    )
    pa, pb = pts.alias("pa"), pts.alias("pb")
    dy = F.col("pa.y") - F.col("pb.y")
    dv = F.col("pa.v") - F.col("pb.v")
    tau = (
        pa.join(pb, F.col("pa.nk") < F.col("pb.nk"))
        .agg(
            F.sum(F.when(dy * dv > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("conc"),
            F.sum(F.when(dy * dv < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("disc"),
            F.count(F.lit(1)).cast("bigint").alias("np"),
        )
    )
    return fit.crossJoin(F.broadcast(tau)).select(
        F.col("k").alias("k_studies"),
        (F.round("a", 6) + 0.0).alias("egger_intercept"),
        (
            F.round(
                F.col("a")
                / F.sqrt(
                    F.col("ssr")
                    / (F.col("k") - 2)
                    * F.col("sxx")
                    / (F.col("k") * F.col("sxxc"))
                ),
                6,
            )
            + 0.0
        ).alias("egger_t"),
        (F.round("b", 6) + 0.0).alias("egger_slope"),
        (
            F.round(
                (F.col("conc") - F.col("disc")) * 1.0 / F.col("np"), 6
            )
            + 0.0
        ).alias("begg_kendall_tau"),
    )


# --------------------------------------------------------------------------
# D'Agostino-Pearson K² normality panel
# --------------------------------------------------------------------------
@register(
    "dagostino_k2_panel",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s2,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s3,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0))
                        * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                    AS BIGINT) AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s4
        FROM events GROUP BY 1
    ),
    cm AS (
        SELECT event_type, n,
               CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   AS m2,
               CAST(s3 AS DOUBLE) / n
                   - 3.0 * (CAST(s1 AS DOUBLE) / n)
                     * CAST(s2 AS DOUBLE) / n
                   + 2.0 * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n) AS m3,
               CAST(s4 AS DOUBLE) / n
                   - 4.0 * (CAST(s1 AS DOUBLE) / n)
                     * CAST(s3 AS DOUBLE) / n
                   + 6.0 * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n)
                     * CAST(s2 AS DOUBLE) / n
                   - 3.0 * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n) AS m4
        FROM m
    ),
    g AS (
        SELECT event_type, n,
               m3 / (m2 * sqrt(m2)) AS g1,
               m4 / (m2 * m2) AS b2
        FROM cm
    ),
    z1c AS (
        SELECT event_type, n, g1, b2,
               g1 * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3)
                         / (6.0 * (n - 2))) AS yy,
               3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1)
                   * (n + 3)
                   / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7)
                      * (n + 9)) AS beta2
        FROM g
    ),
    z1 AS (
        SELECT event_type, n, g1, b2,
               (1.0 / sqrt(ln(sqrt(-1.0 + sqrt(2.0 * (beta2 - 1))))))
               * ln(yy / sqrt(2.0 / (-1.0 + sqrt(2.0 * (beta2 - 1)) - 1))
                    + sqrt((yy / sqrt(2.0
                                      / (-1.0 + sqrt(2.0 * (beta2 - 1))
                                         - 1)))
                           * (yy / sqrt(2.0
                                        / (-1.0
                                           + sqrt(2.0 * (beta2 - 1))
                                           - 1)))
                           + 1.0)) AS zs
        FROM z1c
    ),
    z2c AS (
        SELECT event_type, n, g1, b2, zs,
               (b2 - 3.0 * (n - 1) / (CAST(n AS DOUBLE) + 1))
               / sqrt(24.0 * n * (n - 2) * (n - 3)
                      / ((CAST(n AS DOUBLE) + 1) * (n + 1) * (n + 3)
                         * (n + 5))) AS x,
               6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2)
                   / ((n + 7.0) * (n + 9))
                   * sqrt(6.0 * (n + 3) * (n + 5)
                          / (CAST(n AS DOUBLE) * (n - 2) * (n - 3)))
                   AS sb1
        FROM z1
    ),
    z2 AS (
        SELECT event_type, n, g1, b2, zs,
               ((1.0 - 2.0 / (9.0 * (6.0 + 8.0 / sb1
                                     * (2.0 / sb1
                                        + sqrt(1.0 + 4.0 / (sb1 * sb1))))))
                - cbrt((1.0 - 2.0 / (6.0 + 8.0 / sb1
                                     * (2.0 / sb1
                                        + sqrt(1.0 + 4.0 / (sb1 * sb1)))))
                       / (1.0 + x * sqrt(2.0 / ((6.0 + 8.0 / sb1
                                                 * (2.0 / sb1
                                                    + sqrt(1.0
                                                           + 4.0
                                                             / (sb1 * sb1))))
                                                - 4.0)))))
               / sqrt(2.0 / (9.0 * (6.0 + 8.0 / sb1
                                    * (2.0 / sb1
                                       + sqrt(1.0 + 4.0 / (sb1 * sb1))))))
                   AS zk
        FROM z2c
    )
    SELECT event_type, n,
           round(g1, 6) + 0.0 AS skew_g1,
           round(b2, 6) + 0.0 AS kurt_b2,
           round(zs, 6) + 0.0 AS z1_skew,
           round(zk, 6) + 0.0 AS z2_kurt,
           round(zs * zs + zk * zk, 6) + 0.0 AS k2_stat,
           round(exp(-(zs * zs + zk * zk) / 2.0), 9) + 0.0 AS p_k2
    FROM z2
    ORDER BY event_type
    """,
)
def dagostino_k2_panel(spark, sf_dir):
    """D'Agostino-Pearson K² omnibus normality panel per event type —
    the production companion to the registry's Jarque-Bera (X226): JB's
    asymptotics need n in the tens of thousands, while D'Agostino's
    transformed z₁ (D'Agostino 1970 skewness) and z₂ (Anscombe-Glynn
    1983 kurtosis) are calibrated at the n a per-segment readout
    actually has. K² = z₁² + z₂² is χ²(2), so p = exp(−K²/2) in closed
    form — no erf needed.

    Exact central moments from four DECIMAL(38,0) cents power sums per
    type (the jarque_bera device); every transform is a terminal
    scalar expression on doubles with IDENTICAL trees in both engines
    (`cbrt` handles the negative-operand cube root). One hash
    aggregate over events; the panel frame is the 5-type domain.
    Output ordered by event_type (deterministic total order)."""
    e = t(spark, sf_dir, "events")
    cents = (dec("value", 18, 2) * 100).cast("bigint")
    cd = cents.cast("decimal(38,0)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("s1"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("s2"),
        F.sum(cd * cd * cd).cast("decimal(38,0)").alias("s3"),
        F.sum(cd * cd * cd * cd).cast("decimal(38,0)").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - 3.0 * mu * F.col("s2").cast("double") / n
        + 2.0 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / n
        - 4.0 * mu * F.col("s3").cast("double") / n
        + 6.0 * mu * mu * F.col("s2").cast("double") / n
        - 3.0 * mu * mu * mu * mu
    )
    g = m.select(
        "event_type",
        "n",
        (m3 / (m2 * F.sqrt(m2))).alias("g1"),
        (m4 / (m2 * m2)).alias("b2"),
    )
    nd = n.cast("double")
    yy = F.col("g1") * F.sqrt((nd + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0
        * (nd * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((nd - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2m1 = -1.0 + F.sqrt(2.0 * (beta2 - 1)) - 1  # W^2 - 1
    alpha = F.sqrt(2.0 / w2m1)
    delta = 1.0 / F.sqrt(
        F.log(F.sqrt(-1.0 + F.sqrt(2.0 * (beta2 - 1))))
    )
    zs = delta * F.log(
        yy / alpha + F.sqrt((yy / alpha) * (yy / alpha) + 1.0)
    )
    z1 = g.select("event_type", "n", "g1", "b2", zs.alias("zs"))
    x = (F.col("b2") - 3.0 * (n - 1) / (nd + 1)) / F.sqrt(
        24.0 * n * (n - 2) * (n - 3) / ((nd + 1) * (n + 1) * (n + 3) * (n + 5))
    )
    sb1 = (
        6.0
        * (nd * n - 5 * n + 2)
        / ((n + 7.0) * (n + 9))
        * F.sqrt(6.0 * (n + 3) * (n + 5) / (nd * (n - 2) * (n - 3)))
    )
    z2c = z1.select(
        "event_type", "n", "g1", "b2", "zs", x.alias("x"), sb1.alias("sb1")
    )
    a_ = 6.0 + 8.0 / F.col("sb1") * (
        2.0 / F.col("sb1") + F.sqrt(1.0 + 4.0 / (F.col("sb1") * F.col("sb1")))
    )
    zk = (
        (1.0 - 2.0 / (9.0 * a_))
        - F.cbrt(
            (1.0 - 2.0 / a_)
            / (1.0 + F.col("x") * F.sqrt(2.0 / (a_ - 4.0)))
        )
    ) / F.sqrt(2.0 / (9.0 * a_))
    z2 = z2c.select("event_type", "n", "g1", "b2", "zs", zk.alias("zk"))
    k2 = F.col("zs") * F.col("zs") + F.col("zk") * F.col("zk")
    return z2.select(
        "event_type",
        "n",
        (F.round("g1", 6) + 0.0).alias("skew_g1"),
        (F.round("b2", 6) + 0.0).alias("kurt_b2"),
        (F.round("zs", 6) + 0.0).alias("z1_skew"),
        (F.round("zk", 6) + 0.0).alias("z2_kurt"),
        (F.round(k2, 6) + 0.0).alias("k2_stat"),
        (F.round(F.exp(-k2 / 2.0), 9) + 0.0).alias("p_k2"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# MOSUM structural-break monitor
# --------------------------------------------------------------------------
@register(
    "mosum_break_monitor",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                   AS day,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    gs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS ss
        FROM daily
    ),
    win AS (
        SELECT day,
               CAST(SUM(y) OVER (ORDER BY day
                                 ROWS BETWEEN 29 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS w,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
        FROM daily
    ),
    num AS (
        -- n-scaled exact integer MOSUM numerator: n*W_k - 30*S
        SELECT w2.day,
               CAST(gs.n AS DECIMAL(38,0)) * w2.w
                   - CAST(30 AS DECIMAL(38,0)) * gs.s AS e
        FROM win w2, gs
        WHERE w2.rn >= 30
    ),
    top AS (
        SELECT day, abs(e) AS ae
        FROM num
        ORDER BY abs(e) DESC, day ASC
        LIMIT 1
    )
    SELECT gs.n AS n_days,
           CAST(30 AS INT) AS h_window,
           top.day AS argmax_day,
           round(CAST(top.ae AS DOUBLE) / gs.n
                 / sqrt((CAST(gs.ss AS DOUBLE)
                         - CAST(gs.s AS DOUBLE) * gs.s / gs.n)
                        / (gs.n - 1))
                 / sqrt(30.0), 6) + 0.0
               AS max_mosum_std,
           CAST((SELECT COUNT(*) FROM num, gs g2
                 WHERE abs(CAST(e AS DOUBLE)) / g2.n
                       / sqrt((CAST(g2.ss AS DOUBLE)
                               - CAST(g2.s AS DOUBLE) * g2.s / g2.n)
                              / (g2.n - 1))
                       / sqrt(30.0) > 3.0) AS BIGINT) AS n_exceed_3
    FROM gs, top
    """,
)
def mosum_break_monitor(spark, sf_dir):
    """MOSUM (moving-sum) structural-break monitor over daily order
    revenue — the windowed companion to the registry's CUSUM scan:
    where CUSUM accumulates from the series start (power decays for
    late breaks), the h=30-day moving sum of mean-deviations has
    uniform power at any break location; the monitor statistic is
    max_k |Σ_{k-29..k}(y_i − ȳ)| / (σ̂√h), with the boundary-crossing
    count at the conventional 3.0 level.

    Exactness device (the grubbs/cusum class): the numerator is kept
    as the n-scaled EXACT integer n·W_k − h·S in DECIMAL(38,0) (W_k
    the 30-day window sum, S the grand sum — at 100 TB cents scale
    n·W_k needs >63 bits), so the argmax and its day tiebreak are
    integer-exact; σ̂ enters once, in the terminal scalar. Plan: one
    day rollup; the ROWS window and row_number run on the
    calendar-day frame (bounded domain); the top-1 is a
    TakeOrderedAndProject under the (|e| desc, day asc) total order."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((dec("o_totalprice", 18, 2) * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    yd = F.col("y").cast("decimal(38,0)")
    gs = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("ss"),
    )
    wspec = Window.orderBy("day")
    win = daily.select(
        "day",
        F.sum("y")
        .over(wspec.rowsBetween(-29, 0))
        .cast("bigint")
        .alias("w"),
        F.row_number().over(wspec).cast("bigint").alias("rn"),
    ).where(F.col("rn") >= 30)
    num = win.crossJoin(F.broadcast(gs)).select(
        "day",
        "n",
        "s",
        "ss",
        (
            F.col("n").cast("decimal(38,0)") * F.col("w")
            - F.lit(30).cast("decimal(38,0)") * F.col("s")
        ).alias("e"),
    )
    sigma = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    std = F.abs(F.col("e").cast("double")) / F.col("n") / sigma / F.sqrt(
        F.lit(30.0)
    )
    exceed = num.agg(
        F.sum(F.when(std > 3.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exceed_3")
    )
    top = num.orderBy(F.abs(F.col("e")).desc(), F.col("day").asc()).limit(1)
    return (
        top.crossJoin(F.broadcast(exceed))
        .select(
            F.col("n").alias("n_days"),
            F.lit(30).cast("int").alias("h_window"),
            F.col("day").alias("argmax_day"),
            (
                F.round(
                    F.abs(F.col("e").cast("double"))
                    / F.col("n")
                    / sigma
                    / F.sqrt(F.lit(30.0)),
                    6,
                )
                + 0.0
            ).alias("max_mosum_std"),
            "n_exceed_3",
        )
    )


PLAN_AUDIT_NOTES: dict[str, str] = {
    "mosum_break_monitor": (
        "ROWS window + row_number over the calendar-day frame "
        "(bounded domain — the cusum class)"
    ),
}
