"""Round-17 pre-staged bank (candidate X591+): STAGED, not in the live
registry — the next bank generation behind ``bank_r16`` (round 16's
flip), under the identical no-new-debt discipline: stage-only
decorator, two-SF gate mirror in ``tests/test_bank_r17.py``, sf0.1
sweeps via ``tools/bank_check.py --module bank_r17``, the dtype-family
sweep (``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r17),
and plan-audit notes pre-adjudicated at authoring time.

Seed theme: GLOBAL-NULL AND EVIDENCE COMBINATION — what a monitoring
surface does with a FAMILY of p-values beyond per-cell FDR: Fisher and
Stouffer combinations, the Simes global test, the harmonic-mean
p-value, and the BKY adaptive two-stage FDR, all on the shared 35-cell
contingency family; plus consumption-structure econometrics (Engel
curve) off the customer-spend frame.

Determinism disciplines inherited unchanged (bank_r11..r16
docstrings): exact integer/DECIMAL folds, round-before-fold on every
float aggregate, ``+ 0.0`` on possibly-negative-zero outputs,
total-order top-k/argmax tiebreaks, bounded-domain windows only, the
shared Abramowitz-Stegun erfc tree, and the Acklam inverse-normal
device (bank_r15).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .bank_r15 import _acklam_col, _acklam_sql  # noqa: E402
from .bank_r16 import _CELLP_SQL, _cellp  # noqa: E402
from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}
PLAN_AUDIT_NOTES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13..r16): records the query in
    the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Fisher and Stouffer combined evidence over the 35-cell p family
# --------------------------------------------------------------------------
@register(
    "fisher_stouffer_combined",
    oracle=f"""
    WITH {_CELLP_SQL},
    fold AS (
        SELECT CAST(MAX(m) AS BIGINT) AS m,
               CAST(SUM(CAST(round(-2.0 * ln(p), 10)
                             AS DECIMAL(28,10))) AS DOUBLE) AS fsum,
               CAST(SUM(CAST(round({_acklam_sql('1.0 - p / 2.0')},
                             10) AS DECIMAL(28,10))) AS DOUBLE)
                   AS zsum
        FROM ranked WHERE p > 0 AND p < 1
    )
    SELECT m AS m_tests,
           round(fsum, 6) + 0.0 AS fisher_chi2,
           CAST(2 * m AS BIGINT) AS fisher_dof,
           round((exp(ln(fsum / (2.0 * m)) / 3.0)
                  - (1.0 - 1.0 / (9.0 * m)))
                 / sqrt(1.0 / (9.0 * m)), 6) + 0.0
               AS fisher_z_wilson_hilferty,
           round(zsum / sqrt(m * 1.0), 6) + 0.0 AS stouffer_z
    FROM fold
    """,
)
def fisher_stouffer_combined(spark, sf_dir):
    """FISHER and STOUFFER combined evidence over the 35-cell
    contingency p-value family: Fisher's -2 sum ln p ~ chi2(2m)
    (sensitive to a FEW very small p's) and Stouffer's sum z /
    sqrt(m) with z = Phi^-1(1 - p/2) via the Acklam device
    (sensitive to MANY mildly small p's) — the two classical
    evidence-pooling geometries; they disagree exactly when the
    signal is sparse-vs-diffuse, which is the same axis
    `higher_criticism_panel` resolves pointwise. Fisher's tail
    ships as the Wilson-Hilferty cube-root z (dof = 2m).

    Exactness: the shared cell p's (12-dp rounded erfc trees); each
    -2 ln p and z term rounds at 10 dp into DECIMAL(28,10) folds
    (order-free). Plan: the 35-cell frame, one fold."""
    ranked = _cellp(spark, sf_dir)
    ok = ranked.where((F.col("p") > 0) & (F.col("p") < 1))
    fold = ok.agg(
        F.max("m").cast("bigint").alias("m"),
        F.sum(
            F.round(-2.0 * F.log("p"), 10).cast("decimal(28,10)")
        )
        .cast("double")
        .alias("fsum"),
        F.sum(
            F.round(
                _acklam_col(1.0 - F.col("p") / 2.0), 10
            ).cast("decimal(28,10)")
        )
        .cast("double")
        .alias("zsum"),
    )
    m = F.col("m")
    wh = (
        F.exp(F.log(F.col("fsum") / (2.0 * m)) / 3.0)
        - (1.0 - 1.0 / (9.0 * m))
    ) / F.sqrt(1.0 / (9.0 * m))
    return fold.select(
        m.alias("m_tests"),
        (F.round("fsum", 6) + 0.0).alias("fisher_chi2"),
        (2 * m).cast("bigint").alias("fisher_dof"),
        (F.round(wh, 6) + 0.0).alias("fisher_z_wilson_hilferty"),
        (
            F.round(F.col("zsum") / F.sqrt(m * 1.0), 6) + 0.0
        ).alias("stouffer_z"),
    )


# --------------------------------------------------------------------------
# Simes global test + harmonic-mean p-value on the same family
# --------------------------------------------------------------------------
@register(
    "simes_harmonic_global",
    oracle=f"""
    WITH {_CELLP_SQL},
    simes AS (
        SELECT CAST(MAX(m) AS BIGINT) AS m,
               MIN(round(m * p / i, 12)) AS p_simes
        FROM ranked
    ),
    hmp AS (
        SELECT CAST(SUM(CAST(round(1.0 / p, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sinv
        FROM ranked WHERE p > 0
    )
    SELECT simes.m AS m_tests,
           round(LEAST(1.0, p_simes), 8) + 0.0 AS simes_p_global,
           round(simes.m / hmp.sinv, 10) + 0.0 AS harmonic_mean_p,
           round(LEAST(1.0, simes.m / hmp.sinv
                       * (ln(simes.m * 1.0) + 0.874367040387922)),
                 8) + 0.0 AS hmp_bound_p
    FROM simes, hmp
    """,
)
def simes_harmonic_global(spark, sf_dir):
    """SIMES global test and HARMONIC-MEAN p-value over the 35-cell
    family: Simes p = min_i m p_(i)/i is the valid-under-positive-
    dependence global null test BH inherits its guarantee from (the
    family-level "is anything going on" answer one level up from
    `bh_fdr_correction`'s per-cell answer); the HMP is the modern
    robust-to-dependence combiner (Wilson 2019), reported raw and
    with the e-value-style validity inflation min(1, hmp (ln m +
    0.8744)) — the asymptotically exact Landau-based bound. Three
    global-null answers with different dependence contracts, one
    frame.

    Exactness: the deterministic (p, type, dow) ranks; the Simes
    fold is an exact MIN of 12-dp rounded terms; 1/p terms round at
    8 dp into a DECIMAL(38,8) fold; the Euler-Mascheroni-derived
    constant is a literal. Plan: the 35-cell frame, two folds."""
    ranked = _cellp(spark, sf_dir)
    simes = ranked.agg(
        F.max("m").cast("bigint").alias("m"),
        F.min(
            F.round(F.col("m") * F.col("p") / F.col("i"), 12)
        ).alias("p_simes"),
    )
    hmp = ranked.where(F.col("p") > 0).agg(
        F.sum(F.round(1.0 / F.col("p"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("sinv")
    )
    j = simes.crossJoin(F.broadcast(hmp))
    m = F.col("m")
    h = m / F.col("sinv")
    return j.select(
        m.alias("m_tests"),
        (
            F.round(F.least(F.lit(1.0), F.col("p_simes")), 8) + 0.0
        ).alias("simes_p_global"),
        (F.round(h, 10) + 0.0).alias("harmonic_mean_p"),
        (
            F.round(
                F.least(
                    F.lit(1.0),
                    h * (F.log(m * 1.0) + 0.874367040387922),
                ),
                8,
            )
            + 0.0
        ).alias("hmp_bound_p"),
    )


# --------------------------------------------------------------------------
# Benjamini-Krieger-Yekutieli adaptive two-stage FDR
# --------------------------------------------------------------------------
@register(
    "bky_two_stage_fdr",
    oracle=f"""
    WITH {_CELLP_SQL},
    s1 AS (
        SELECT CAST(MAX(m) AS BIGINT) AS m,
               CAST(COALESCE(MAX(CASE WHEN p <= (0.05 / 1.05)
                                  * i / m THEN i END), 0)
                    AS BIGINT) AS r1
        FROM ranked
    ),
    s2 AS (
        SELECT s1.m, s1.r1,
               CAST(s1.m - s1.r1 AS BIGINT) AS m0_hat,
               CAST(COALESCE(MAX(CASE WHEN ranked.p
                                  <= (0.05 / 1.05)
                                     * (s1.m * 1.0
                                        / GREATEST(s1.m - s1.r1, 1))
                                     * ranked.i / s1.m
                                  THEN ranked.i END), 0)
                    AS BIGINT) AS r2
        FROM ranked, s1 GROUP BY s1.m, s1.r1
    )
    SELECT m AS m_tests, r1 AS stage1_rejections,
           m0_hat AS m0_null_estimate,
           r2 AS stage2_rejections,
           round(CAST(m0_hat AS DOUBLE) / m, 6) + 0.0
               AS pi0_bky
    FROM s2
    """,
)
def bky_two_stage_fdr(spark, sf_dir):
    """Benjamini-Krieger-Yekutieli ADAPTIVE two-stage FDR on the
    35-cell family at q = 0.05: stage 1 runs BH at q/(1+q), its
    rejection count estimates the null count m0 = m - r1, and stage
    2 reruns BH at q m/m0 — the PROVEN-FDR-control adaptive
    procedure (Storey's `storey_pi0_qvalues` estimates pi0 more
    aggressively but its control is asymptotic; BKY's is
    finite-sample). r2 > r1 quantifies exactly the power the plain
    `bh_fdr_correction` leaves on the table. Both stages are
    step-up cutoffs: MAX over i with p_(i) under the line — exact
    integer folds on the ranked frame.

    Exactness: ranks deterministic; both cutoff scans compare 12-dp
    rounded p's against exact rational lines; counts are BIGINTs.
    Plan: the 35-cell frame, two folds."""
    ranked = _cellp(spark, sf_dir).persist()
    q1 = 0.05 / 1.05
    s1 = ranked.agg(
        F.max("m").cast("bigint").alias("mt"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= q1 * F.col("i") / F.col("m"),
                    F.col("i"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("r1"),
    )
    s2 = (
        ranked.drop("m")
        .crossJoin(F.broadcast(s1))
        .groupBy("mt", "r1")
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p")
                        <= q1
                        * (
                            F.col("mt")
                            * 1.0
                            / F.greatest(
                                F.col("mt") - F.col("r1"), F.lit(1)
                            )
                        )
                        * F.col("i")
                        / F.col("mt"),
                        F.col("i"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("r2")
        )
    )
    return s2.select(
        F.col("mt").alias("m_tests"),
        F.col("r1").alias("stage1_rejections"),
        (F.col("mt") - F.col("r1")).cast("bigint").alias(
            "m0_null_estimate"
        ),
        F.col("r2").alias("stage2_rejections"),
        (
            F.round(
                (F.col("mt") - F.col("r1")).cast("double")
                / F.col("mt"),
                6,
            )
            + 0.0
        ).alias("pi0_bky"),
    )


# --------------------------------------------------------------------------
# Engel curve: share of premium-brand spend vs log total spend
# --------------------------------------------------------------------------
@register(
    "engel_curve_loglog",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey AS ok,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS r,
               CASE WHEN p.p_retailprice >= 975.0
                    THEN 1 ELSE 0 END AS prem
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    cust AS (
        SELECT o.o_custkey AS u,
               CAST(SUM(li.r) AS BIGINT) AS spend,
               CAST(SUM(CASE WHEN li.prem = 1 THEN li.r ELSE 0 END)
                    AS BIGINT) AS prem_spend
        FROM li JOIN orders o ON li.ok = o.o_orderkey
        GROUP BY o.o_custkey
    ),
    xy AS (
        SELECT round(ln(CAST(spend AS DOUBLE) / 100000.0), 10) AS x,
               round(CAST(prem_spend AS DOUBLE) / spend, 10) AS w
        FROM cust WHERE spend > 0
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(x, 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(w, 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sw,
               CAST(SUM(CAST(round(x * x, 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(round(w * w, 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sww,
               CAST(SUM(CAST(round(x * w, 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sxw
        FROM xy
    )
    SELECT n AS n_customers,
           round((n * sxw - sx * sw) / (n * sxx - sx * sx), 8) + 0.0
               AS engel_slope,
           round((sw - (n * sxw - sx * sw)
                  / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
               AS engel_intercept,
           round(CASE WHEN n * sww - sw * sw > 0
                      THEN pow(n * sxw - sx * sw, 2)
                           / ((n * sxx - sx * sx)
                              * (n * sww - sw * sw))
                 END, 8) + 0.0 AS r2,
           round(sw / n, 8) + 0.0 AS mean_premium_share
    FROM mom
    """,
)
def engel_curve_loglog(spark, sf_dir):
    """ENGEL CURVE for premium parts (retail price >= $975, the top quartile of the catalog): the
    Working-Leser regression of each customer's premium-brand
    BUDGET SHARE on the log of their total spend — slope > 0 reads
    premium parts as LUXURIES (share rises with budget), < 0 as
    necessities; the consumption-structure coefficient under every
    premium-tier pricing decision, and a cross-SECTIONAL
    elasticity angle the registry's `discount_quantity_elasticity`
    (price response) does not touch. Mean share anchors the slope's
    economic size. r2 is NULL when the share is degenerate (no
    premium part in the tiny-SF catalog — the engines' 0/0
    semantics differ, so both emit NULL behind an identical
    variance guard).

    Exactness: per-customer spends are exact cents BIGINTs; the
    share and log-spend round at 10 dp; the five regression moments
    fold 10-dp rounded terms through DECIMAL(28,10). Plan: one join
    rollup to customers, one fold."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    o = t(spark, sf_dir, "orders")
    li2 = li.join(
        F.broadcast(p.select("p_partkey", "p_retailprice")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("l_orderkey").alias("ok"),
        (dec("l_extendedprice", 18, 2) * 100).cast("bigint").alias("r"),
        F.when(F.col("p_retailprice") >= 975.0, 1)
        .otherwise(0)
        .alias("prem"),
    )
    cust = (
        li2.join(
            o.select(F.col("o_orderkey").alias("ok"), "o_custkey"),
            "ok",
        )
        .groupBy(F.col("o_custkey").alias("u"))
        .agg(
            F.sum("r").cast("bigint").alias("spend"),
            F.sum(F.when(F.col("prem") == 1, F.col("r")).otherwise(0))
            .cast("bigint")
            .alias("prem_spend"),
        )
    )
    xy = cust.where(F.col("spend") > 0).select(
        F.round(
            F.log(F.col("spend").cast("double") / 100000.0), 10
        ).alias("x"),
        F.round(
            F.col("prem_spend").cast("double") / F.col("spend"), 10
        ).alias("w"),
    )

    def dfold(expr, name):
        return (
            F.sum(F.round(expr, 10).cast("decimal(28,10)"))
            .cast("double")
            .alias(name)
        )

    mom = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dfold(F.col("x"), "sx"),
        dfold(F.col("w"), "sw"),
        dfold(F.col("x") * F.col("x"), "sxx"),
        dfold(F.col("w") * F.col("w"), "sww"),
        dfold(F.col("x") * F.col("w"), "sxw"),
    )
    n = F.col("n")
    num = n * F.col("sxw") - F.col("sx") * F.col("sw")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.select(
        n.alias("n_customers"),
        (F.round(num / den, 8) + 0.0).alias("engel_slope"),
        (
            F.round(
                (F.col("sw") - num / den * F.col("sx")) / n, 6
            )
            + 0.0
        ).alias("engel_intercept"),
        (
            F.round(
                F.when(
                    n * F.col("sww") - F.col("sw") * F.col("sw") > 0,
                    F.pow(num, 2)
                    / (
                        den
                        * (n * F.col("sww") - F.col("sw") * F.col("sw"))
                    ),
                ),
                8,
            )
            + 0.0
        ).alias("r2"),
        (F.round(F.col("sw") / n, 8) + 0.0).alias(
            "mean_premium_share"
        ),
    )


PLAN_AUDIT_NOTES.update(
    {
        "fisher_stouffer_combined": (
            "rank over the 35-cell contingency p family "
            "(domain-bounded — the bh_fdr_correction class)"
        ),
        "simes_harmonic_global": (
            "rank over the same 35-cell family (bh_fdr class)"
        ),
        "bky_two_stage_fdr": (
            "two step-up cutoff scans over the same 35-cell family "
            "(bh_fdr class)"
        ),
    }
)
