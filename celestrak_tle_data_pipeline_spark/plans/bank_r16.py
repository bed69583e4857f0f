"""Round-16 pre-staged bank (candidate X542+): STAGED, not in the live
registry — the next bank generation behind ``bank_r15`` (round 15's
flip), under the identical no-new-debt discipline: stage-only
decorator, two-SF gate mirror in ``tests/test_bank_r16.py``, sf0.1
sweeps via ``tools/bank_check.py --module bank_r16``, the dtype-family
sweep (``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r17),
and plan-audit notes pre-adjudicated at authoring time.

Seed theme: STRUCTURE AND DEPENDENCE CERTIFICATION — the matrix-level
and information-theoretic checks a feature pipeline runs before
modeling: correlation-matrix sphericity (Bartlett) and sampling
adequacy (KMO/MSA), stratified rare-event pooling (Peto), asymmetric
categorical association (Goodman-Kruskal tau, Theil's uncertainty
coefficient), lead-lag structure (cross-correlation peak, Granger F),
and multiple-testing geometry (higher criticism, Storey pi0).

Determinism disciplines inherited unchanged (bank_r11..r15
docstrings): exact integer/DECIMAL folds, round-before-fold on every
float aggregate, ``+ 0.0`` on possibly-negative-zero outputs,
total-order top-k/argmax tiebreaks, bounded-domain windows only,
explicit ``floor()`` before any double->integer bucket, DOUBLE-cast
literals where DuckDB would infer DECIMAL, the shared
Abramowitz-Stegun erfc tree for normal tails, and the Acklam
inverse-normal device (bank_r15) where quantiles are needed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}
PLAN_AUDIT_NOTES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13/r14/r15): records the query
    in the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared frame: the three daily activity series and their correlations
# --------------------------------------------------------------------------
# Correlations of (purchases, clicks, errors) per day from exact
# BIGINT count folds; each r is rounded at 10 dp so every downstream
# matrix functional consumes identical doubles in both engines.
_DAY3_SQL = """
    day3 AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y,
               CAST(SUM(CASE WHEN event_type = 'error'
                             THEN 1 ELSE 0 END) AS BIGINT) AS z
        FROM events GROUP BY 1
    ),
    mom3 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS syy,
               CAST(SUM(CAST(z AS DECIMAL(19,0)) * z)
                    AS DECIMAL(38,0)) AS szz,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * z)
                    AS DECIMAL(38,0)) AS sxz,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * z)
                    AS DECIMAL(38,0)) AS syz
        FROM day3
    ),
    corr3 AS (
        SELECT n,
               round((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sy)
                     / sqrt((n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy)), 10)
                   AS r12,
               round((n * CAST(sxz AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sz)
                     / sqrt((n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(szz AS DOUBLE)
                               - CAST(sz AS DOUBLE) * sz)), 10)
                   AS r13,
               round((n * CAST(syz AS DOUBLE)
                      - CAST(sy AS DOUBLE) * sz)
                     / sqrt((n * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * sy)
                            * (n * CAST(szz AS DOUBLE)
                               - CAST(sz AS DOUBLE) * sz)), 10)
                   AS r23
        FROM mom3
    )
"""


def _corr3(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    day3 = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("z"),
    )

    def dsum(a, b, name):
        return (
            F.sum(F.col(a).cast("decimal(19,0)") * F.col(b))
            .cast("decimal(38,0)")
            .alias(name)
        )

    mom = day3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        dsum("x", "x", "sxx"),
        dsum("y", "y", "syy"),
        dsum("z", "z", "szz"),
        dsum("x", "y", "sxy"),
        dsum("x", "z", "sxz"),
        dsum("y", "z", "syz"),
    )
    n = F.col("n")

    def r(sab, sa, sb, saa, sbb):
        return F.round(
            (n * F.col(sab).cast("double")
             - F.col(sa).cast("double") * F.col(sb))
            / F.sqrt(
                (n * F.col(saa).cast("double")
                 - F.col(sa).cast("double") * F.col(sa))
                * (n * F.col(sbb).cast("double")
                   - F.col(sb).cast("double") * F.col(sb))
            ),
            10,
        )

    return mom.select(
        n.alias("n"),
        r("sxy", "sx", "sy", "sxx", "syy").alias("r12"),
        r("sxz", "sx", "sz", "sxx", "szz").alias("r13"),
        r("syz", "sy", "sz", "syy", "szz").alias("r23"),
    )


# --------------------------------------------------------------------------
# Bartlett's test of sphericity on the 3x3 activity correlation matrix
# --------------------------------------------------------------------------
@register(
    "bartlett_sphericity",
    oracle=f"""
    WITH {_DAY3_SQL}
    SELECT n AS n_days,
           round(r12, 6) + 0.0 AS r_purchase_click,
           round(r13, 6) + 0.0 AS r_purchase_error,
           round(r23, 6) + 0.0 AS r_click_error,
           round(1.0 - r12 * r12 - r13 * r13 - r23 * r23
                 + 2.0 * r12 * r13 * r23, 8) + 0.0 AS det_r,
           round(-(n - 1.0 - (2.0 * 3.0 + 5.0) / 6.0)
                 * ln(1.0 - r12 * r12 - r13 * r13 - r23 * r23
                      + 2.0 * r12 * r13 * r23), 6) + 0.0
               AS bartlett_chi2,
           CAST(3 AS BIGINT) AS dof
    FROM corr3
    """,
)
def bartlett_sphericity(spark, sf_dir):
    """Bartlett's test of SPHERICITY on the 3x3 correlation matrix of
    the daily (purchase, click, error) activity series: chi2 =
    -(n-1-(2p+5)/6) ln|R| ~ chi2(p(p-1)/2) against R = I — the
    gatekeeper run before any factor/PCA step (`canonical_
    correlation_pairs`, `effective_rank_entropy`): if sphericity is
    NOT rejected the correlation structure is noise and every
    downstream rotation is fiction. |R| for p=3 is the closed form
    1 - r12^2 - r13^2 - r23^2 + 2 r12 r13 r23.

    Exactness: the three correlations come from one pass of exact
    BIGINT count power sums (DECIMAL(19,0) widens), each rounded at
    10 dp before the determinant tree, so both engines take ln of
    identical doubles. Plan: one day rollup, one fold — no joins,
    no windows."""
    c = _corr3(spark, sf_dir)
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    det = (
        1.0
        - r12 * r12
        - r13 * r13
        - r23 * r23
        + 2.0 * r12 * r13 * r23
    )
    n = F.col("n")
    return c.select(
        n.alias("n_days"),
        (F.round(r12, 6) + 0.0).alias("r_purchase_click"),
        (F.round(r13, 6) + 0.0).alias("r_purchase_error"),
        (F.round(r23, 6) + 0.0).alias("r_click_error"),
        (F.round(det, 8) + 0.0).alias("det_r"),
        (
            F.round(
                -(n - 1.0 - (2.0 * 3.0 + 5.0) / 6.0) * F.log(det), 6
            )
            + 0.0
        ).alias("bartlett_chi2"),
        F.lit(3).cast("bigint").alias("dof"),
    )


# --------------------------------------------------------------------------
# Kaiser-Meyer-Olkin sampling adequacy (KMO + per-variable MSA)
# --------------------------------------------------------------------------
@register(
    "kmo_adequacy",
    oracle=f"""
    WITH {_DAY3_SQL},
    part AS (
        SELECT n, r12, r13, r23,
               round((r12 - r13 * r23)
                     / sqrt((1.0 - r13 * r13)
                            * (1.0 - r23 * r23)), 10) AS p12,
               round((r13 - r12 * r23)
                     / sqrt((1.0 - r12 * r12)
                            * (1.0 - r23 * r23)), 10) AS p13,
               round((r23 - r12 * r13)
                     / sqrt((1.0 - r12 * r12)
                            * (1.0 - r13 * r13)), 10) AS p23
        FROM corr3
    )
    SELECT n AS n_days,
           round((r12 * r12 + r13 * r13 + r23 * r23)
                 / (r12 * r12 + r13 * r13 + r23 * r23
                    + p12 * p12 + p13 * p13 + p23 * p23), 6) + 0.0
               AS kmo_overall,
           round((r12 * r12 + r13 * r13)
                 / (r12 * r12 + r13 * r13 + p12 * p12 + p13 * p13),
                 6) + 0.0 AS msa_purchase,
           round((r12 * r12 + r23 * r23)
                 / (r12 * r12 + r23 * r23 + p12 * p12 + p23 * p23),
                 6) + 0.0 AS msa_click,
           round((r13 * r13 + r23 * r23)
                 / (r13 * r13 + r23 * r23 + p13 * p13 + p23 * p23),
                 6) + 0.0 AS msa_error
    FROM part
    """,
)
def kmo_adequacy(spark, sf_dir):
    """Kaiser-Meyer-Olkin sampling adequacy for the 3-variable daily
    activity system: KMO = sum r^2 / (sum r^2 + sum partial^2) over
    the off-diagonal, plus the per-variable MSA diagonals — the
    companion gate to `bartlett_sphericity` (Bartlett asks "is
    there ANY structure"; KMO asks "is the structure COMPACT enough
    to factor" — high pairwise r with high partials reads as
    diffuse, unfactorable correlation). For p=3 the partial
    correlations are the closed forms (r_ij - r_ik r_jk)/
    sqrt((1-r_ik^2)(1-r_jk^2)) — no matrix inverse needed.

    Exactness: correlations from the shared exact-count fold
    (rounded 10 dp), partials rounded at 10 dp before the KMO
    ratios; everything downstream is a terminal double tree. Plan:
    one day rollup, one fold."""
    c = _corr3(spark, sf_dir)
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    p12 = F.round(
        (r12 - r13 * r23)
        / F.sqrt((1.0 - r13 * r13) * (1.0 - r23 * r23)),
        10,
    )
    p13 = F.round(
        (r13 - r12 * r23)
        / F.sqrt((1.0 - r12 * r12) * (1.0 - r23 * r23)),
        10,
    )
    p23 = F.round(
        (r23 - r12 * r13)
        / F.sqrt((1.0 - r12 * r12) * (1.0 - r13 * r13)),
        10,
    )
    part = c.select(
        "n", "r12", "r13", "r23",
        p12.alias("p12"), p13.alias("p13"), p23.alias("p23"),
    )
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    q12, q13, q23 = F.col("p12"), F.col("p13"), F.col("p23")
    return part.select(
        F.col("n").alias("n_days"),
        (
            F.round(
                (r12 * r12 + r13 * r13 + r23 * r23)
                / (
                    r12 * r12 + r13 * r13 + r23 * r23
                    + q12 * q12 + q13 * q13 + q23 * q23
                ),
                6,
            )
            + 0.0
        ).alias("kmo_overall"),
        (
            F.round(
                (r12 * r12 + r13 * r13)
                / (r12 * r12 + r13 * r13 + q12 * q12 + q13 * q13),
                6,
            )
            + 0.0
        ).alias("msa_purchase"),
        (
            F.round(
                (r12 * r12 + r23 * r23)
                / (r12 * r12 + r23 * r23 + q12 * q12 + q23 * q23),
                6,
            )
            + 0.0
        ).alias("msa_click"),
        (
            F.round(
                (r13 * r13 + r23 * r23)
                / (r13 * r13 + r23 * r23 + q13 * q13 + q23 * q23),
                6,
            )
            + 0.0
        ).alias("msa_error"),
    )


# --------------------------------------------------------------------------
# Peto one-step odds ratio pooled across priority strata
# --------------------------------------------------------------------------
@register(
    "peto_odds_ratio",
    oracle="""
    WITH lab AS (
        SELECT o_orderpriority AS pri,
               CASE WHEN CAST(epoch_us(o_orderdate) // 86400000000
                         + 4 AS BIGINT) % 7 >= 5
                    THEN 1 ELSE 0 END AS exp_,
               CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS cs
        FROM orders
    ),
    g AS (
        SELECT pri,
               CAST(SUM(CASE WHEN exp_ = 1 AND cs = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(exp_) AS BIGINT) AS n1,
               CAST(SUM(1 - exp_) AS BIGINT) AS n0,
               CAST(SUM(cs) AS BIGINT) AS m1,
               CAST(SUM(1 - cs) AS BIGINT) AS m0,
               CAST(COUNT(*) AS BIGINT) AS nn
        FROM lab GROUP BY pri
    ),
    fold AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(round(
                   a - CAST(n1 AS DOUBLE) * m1 / nn, 9)
                   AS DECIMAL(38,9))) AS DOUBLE) AS oe,
               CAST(SUM(CAST(round(
                   CAST(n1 AS DOUBLE) * n0 * m1 * m0
                   / (CAST(nn AS DOUBLE) * nn * (nn - 1)), 9)
                   AS DECIMAL(38,9))) AS DOUBLE) AS v
        FROM g
    )
    SELECT k AS n_strata,
           round(oe, 6) + 0.0 AS sum_o_minus_e,
           round(v, 6) + 0.0 AS sum_v,
           round(exp(oe / v), 6) + 0.0 AS peto_or,
           round(exp(oe / v - 1.959963985 / sqrt(v)), 6) + 0.0
               AS or_ci_lo,
           round(exp(oe / v + 1.959963985 / sqrt(v)), 6) + 0.0
               AS or_ci_hi
    FROM fold
    """,
)
def peto_odds_ratio(spark, sf_dir):
    """Peto one-step odds ratio for the weekend -> problem-status
    association, pooled across the five priority STRATA: log OR =
    sum(O-E)/sum(V) with the per-stratum hypergeometric moments
    E = n1 m1/N, V = n1 n0 m1 m0/(N^2(N-1)) — the rare-event
    meta-analytic pooler that stays defined when a stratum has a
    ZERO cell (where `mantel_haenszel_weekday_strata`'s ratio form
    and `haldane_anscombe_or`'s continuity correction both distort),
    and the fixed-effect complement to `dersimonian_laird_meta`'s
    random-effects pooling. CI = exp(logOR +/- 1.96/sqrt(V)).

    Exactness: all 2x2 margins are exact BIGINTs; each stratum's
    O-E and V are rounded at 9 dp and folded through DECIMAL(38,9)
    (order-free 5-term sums); the OR and CI are terminal exp trees.
    Plan: one scan, one 5-group fold, one scalar fold — no joins,
    no windows."""
    o = t(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.when(
            (
                F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
                + 4
            ).cast("bigint")
            % 7
            >= 5,
            1,
        )
        .otherwise(0)
        .alias("exp_"),
        F.when(F.col("o_orderstatus") == "P", 1).otherwise(0).alias("cs"),
    )
    g = lab.groupBy("pri").agg(
        F.sum(
            F.when((F.col("exp_") == 1) & (F.col("cs") == 1), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("a"),
        F.sum("exp_").cast("bigint").alias("n1"),
        F.sum(1 - F.col("exp_")).cast("bigint").alias("n0"),
        F.sum("cs").cast("bigint").alias("m1"),
        F.sum(1 - F.col("cs")).cast("bigint").alias("m0"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    nn = F.col("nn")
    oe_term = F.round(
        F.col("a") - F.col("n1").cast("double") * F.col("m1") / nn, 9
    )
    v_term = F.round(
        F.col("n1").cast("double")
        * F.col("n0")
        * F.col("m1")
        * F.col("m0")
        / (nn.cast("double") * nn * (nn - 1)),
        9,
    )
    fold = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(oe_term.cast("decimal(38,9)")).cast("double").alias("oe"),
        F.sum(v_term.cast("decimal(38,9)")).cast("double").alias("v"),
    )
    oe, v = F.col("oe"), F.col("v")
    return fold.select(
        F.col("k").alias("n_strata"),
        (F.round(oe, 6) + 0.0).alias("sum_o_minus_e"),
        (F.round(v, 6) + 0.0).alias("sum_v"),
        (F.round(F.exp(oe / v), 6) + 0.0).alias("peto_or"),
        (
            F.round(F.exp(oe / v - 1.959963985 / F.sqrt(v)), 6) + 0.0
        ).alias("or_ci_lo"),
        (
            F.round(F.exp(oe / v + 1.959963985 / F.sqrt(v)), 6) + 0.0
        ).alias("or_ci_hi"),
    )


# --------------------------------------------------------------------------
# Goodman-Kruskal tau: proportional reduction in prediction error
# --------------------------------------------------------------------------
@register(
    "goodman_kruskal_tau",
    oracle="""
    WITH obs AS (
        SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                   AS dow,
               event_type AS ty,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS rc
           FROM obs GROUP BY dow),
    cm AS (SELECT ty, CAST(SUM(c) AS BIGINT) AS cc
           FROM obs GROUP BY ty),
    n_ AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs),
    within AS (
        SELECT CAST(SUM(CAST(round(
                   CAST(o.c AS DOUBLE) * o.c / rm.rc, 9)
                   AS DECIMAL(38,9))) AS DOUBLE) AS wr,
               CAST(SUM(CAST(round(
                   CAST(o.c AS DOUBLE) * o.c / cm.cc, 9)
                   AS DECIMAL(38,9))) AS DOUBLE) AS wc
        FROM obs o JOIN rm ON o.dow = rm.dow
                   JOIN cm ON o.ty = cm.ty
    ),
    marg AS (
        SELECT CAST(SUM(CAST(rc AS DECIMAL(19,0)) * rc)
                    AS DECIMAL(38,0)) AS r2 FROM rm
    ),
    marg2 AS (
        SELECT CAST(SUM(CAST(cc AS DECIMAL(19,0)) * cc)
                    AS DECIMAL(38,0)) AS c2 FROM cm
    )
    SELECT n_.n AS n_events,
           round((within.wr - CAST(marg2.c2 AS DOUBLE) / n_.n)
                 / (n_.n - CAST(marg2.c2 AS DOUBLE) / n_.n), 8) + 0.0
               AS tau_type_given_dow,
           round((within.wc - CAST(marg.r2 AS DOUBLE) / n_.n)
                 / (n_.n - CAST(marg.r2 AS DOUBLE) / n_.n), 8) + 0.0
               AS tau_dow_given_type
    FROM n_, within, marg, marg2
    """,
)
def goodman_kruskal_tau(spark, sf_dir):
    """Goodman-Kruskal tau for the (weekday, event-type) table, BOTH
    directions: the proportional reduction in Gini prediction error
    from knowing the row — tau(C|R) = (sum n_ij^2/n_i+ - sum
    n_+j^2/N)/(N - sum n_+j^2/N) — the ASYMMETRIC association
    measure the symmetric chi-square family (`cramers_v`, X442's
    bias-corrected twin) cannot express: tau(type|dow) !=
    tau(dow|type) quantifies which direction of prediction the
    association actually helps, the feature-selection question.
    Companion to `goodman_kruskal_lambda` (modal error) — tau uses
    the full distribution, so it is nonzero whenever ANY
    association exists.

    Exactness: cell/margin counts are exact BIGINTs; the within-row
    terms n_ij^2/n_i+ are rounded at 9 dp and folded through
    DECIMAL(38,9); the margin squares fold exactly through
    DECIMAL(19,0) widens. Plan: one rollup to 35 cells, two
    broadcast margin joins, one fold."""
    e = t(spark, sf_dir, "events")
    obs = e.groupBy(
        ((F.floor(F.unix_micros("ts") / 86_400_000_000) + 4) % 7)
        .cast("bigint")
        .alias("dow"),
        F.col("event_type").alias("ty"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rm = obs.groupBy("dow").agg(F.sum("c").cast("bigint").alias("rc"))
    cm = obs.groupBy("ty").agg(F.sum("c").cast("bigint").alias("cc"))
    n_ = obs.agg(F.sum("c").cast("bigint").alias("n"))
    within = (
        obs.join(F.broadcast(rm), "dow")
        .join(F.broadcast(cm), "ty")
        .agg(
            F.sum(
                F.round(
                    F.col("c").cast("double") * F.col("c") / F.col("rc"),
                    9,
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("wr"),
            F.sum(
                F.round(
                    F.col("c").cast("double") * F.col("c") / F.col("cc"),
                    9,
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("wc"),
        )
    )
    marg = rm.agg(
        F.sum(F.col("rc").cast("decimal(19,0)") * F.col("rc"))
        .cast("decimal(38,0)")
        .alias("r2")
    )
    marg2 = cm.agg(
        F.sum(F.col("cc").cast("decimal(19,0)") * F.col("cc"))
        .cast("decimal(38,0)")
        .alias("c2")
    )
    j = (
        n_.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(marg2))
    )
    n = F.col("n")
    c2n = F.col("c2").cast("double") / n
    r2n = F.col("r2").cast("double") / n
    return j.select(
        n.alias("n_events"),
        (
            F.round((F.col("wr") - c2n) / (n - c2n), 8) + 0.0
        ).alias("tau_type_given_dow"),
        (
            F.round((F.col("wc") - r2n) / (n - r2n), 8) + 0.0
        ).alias("tau_dow_given_type"),
    )


# --------------------------------------------------------------------------
# Theil's uncertainty coefficient (normalized mutual information)
# --------------------------------------------------------------------------
@register(
    "uncertainty_coefficient",
    oracle="""
    WITH obs AS (
        SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                   AS dow,
               event_type AS ty,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS rc
           FROM obs GROUP BY dow),
    cm AS (SELECT ty, CAST(SUM(c) AS BIGINT) AS cc
           FROM obs GROUP BY ty),
    n_ AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs),
    hr AS (
        SELECT CAST(SUM(CAST(round(
                   -(CAST(rc AS DOUBLE) / n_.n)
                   * ln(CAST(rc AS DOUBLE) / n_.n), 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM rm, n_
    ),
    hc AS (
        SELECT CAST(SUM(CAST(round(
                   -(CAST(cc AS DOUBLE) / n_.n)
                   * ln(CAST(cc AS DOUBLE) / n_.n), 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM cm, n_
    ),
    hrc AS (
        SELECT CAST(SUM(CAST(round(
                   -(CAST(c AS DOUBLE) / n_.n)
                   * ln(CAST(c AS DOUBLE) / n_.n), 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM obs, n_
    )
    SELECT n_.n AS n_events,
           round(hr.h, 8) + 0.0 AS h_dow,
           round(hc.h, 8) + 0.0 AS h_type,
           round(hr.h + hc.h - hrc.h, 8) + 0.0 AS mutual_info_nats,
           round((hr.h + hc.h - hrc.h) / hc.h, 8) + 0.0
               AS u_type_given_dow,
           round((hr.h + hc.h - hrc.h) / hr.h, 8) + 0.0
               AS u_dow_given_type,
           round(2.0 * (hr.h + hc.h - hrc.h) / (hr.h + hc.h), 8)
               + 0.0 AS u_symmetric
    FROM n_, hr, hc, hrc
    """,
)
def uncertainty_coefficient(spark, sf_dir):
    """Theil's uncertainty coefficient for the (weekday, event-type)
    table: U(C|R) = I(R;C)/H(C) — the entropy-normalized mutual
    information, read as "what fraction of the type's uncertainty
    does the weekday remove", in BOTH directions plus the symmetric
    average — the information-theoretic sibling of
    `goodman_kruskal_tau` (same asymmetry, Shannon error instead of
    Gini error) and the categorical analogue of the registry's
    `js_divergence_sources`. Emits the raw entropies and MI in nats
    so downstream consumers can re-normalize.

    Exactness: margin/cell counts are exact BIGINTs; every -p ln p
    term is rounded at 12 dp and folded through DECIMAL(28,12)
    (order-free); ratios are terminal trees. Plan: one rollup to 35
    cells, two margin rollups, three scalar folds — no windows."""
    e = t(spark, sf_dir, "events")
    obs = e.groupBy(
        ((F.floor(F.unix_micros("ts") / 86_400_000_000) + 4) % 7)
        .cast("bigint")
        .alias("dow"),
        F.col("event_type").alias("ty"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).persist()
    rm = obs.groupBy("dow").agg(F.sum("c").cast("bigint").alias("rc"))
    cm = obs.groupBy("ty").agg(F.sum("c").cast("bigint").alias("cc"))
    n_ = obs.agg(F.sum("c").cast("bigint").alias("n"))

    def ent(df, col, out):
        p = F.col(col).cast("double") / F.col("n")
        return (
            df.crossJoin(F.broadcast(n_))
            .agg(
                F.sum(
                    F.round(-p * F.log(p), 12).cast("decimal(28,12)")
                )
                .cast("double")
                .alias(out)
            )
        )

    hr = ent(rm, "rc", "h_r")
    hc = ent(cm, "cc", "h_c")
    hrc = ent(obs, "c", "h_rc")
    j = (
        n_.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hrc))
    )
    mi = F.col("h_r") + F.col("h_c") - F.col("h_rc")
    return j.select(
        F.col("n").alias("n_events"),
        (F.round("h_r", 8) + 0.0).alias("h_dow"),
        (F.round("h_c", 8) + 0.0).alias("h_type"),
        (F.round(mi, 8) + 0.0).alias("mutual_info_nats"),
        (F.round(mi / F.col("h_c"), 8) + 0.0).alias(
            "u_type_given_dow"
        ),
        (F.round(mi / F.col("h_r"), 8) + 0.0).alias(
            "u_dow_given_type"
        ),
        (
            F.round(2.0 * mi / (F.col("h_r") + F.col("h_c")), 8) + 0.0
        ).alias("u_symmetric"),
    )


# --------------------------------------------------------------------------
# Bivariate Granger causality F (lag 1, both directions)
# --------------------------------------------------------------------------
_GC_MOM_SQL = """
    ev2 AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS p,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS q
        FROM events GROUP BY 1
    ),
    span2 AS (SELECT CAST(min(d) AS BIGINT) AS d0,
                     CAST(max(d) AS BIGINT) AS d1 FROM ev2),
    grid2 AS (
        SELECT CAST(u.g AS BIGINT) AS d
        FROM span2,
             LATERAL UNNEST(range(span2.d0, span2.d1 + 1)) AS u(g)
    ),
    fill2 AS (
        SELECT g.d, COALESCE(e.p, 0) AS p, COALESCE(e.q, 0) AS q
        FROM grid2 g LEFT JOIN ev2 e ON g.d = e.d
    ),
    lag2 AS (
        SELECT a.p, a.q, b.p AS u, b.q AS v
        FROM fill2 a JOIN fill2 b ON a.d = b.d + 1
    ),
    gm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(p) AS BIGINT) AS sp,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(u) AS BIGINT) AS su,
               CAST(SUM(v) AS BIGINT) AS sv,
               CAST(SUM(CAST(p AS DECIMAL(19,0)) * p)
                    AS DECIMAL(38,0)) AS spp,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * q)
                    AS DECIMAL(38,0)) AS sqq,
               CAST(SUM(CAST(u AS DECIMAL(19,0)) * u)
                    AS DECIMAL(38,0)) AS suu,
               CAST(SUM(CAST(v AS DECIMAL(19,0)) * v)
                    AS DECIMAL(38,0)) AS svv,
               CAST(SUM(CAST(u AS DECIMAL(19,0)) * v)
                    AS DECIMAL(38,0)) AS suv,
               CAST(SUM(CAST(p AS DECIMAL(19,0)) * u)
                    AS DECIMAL(38,0)) AS spu,
               CAST(SUM(CAST(p AS DECIMAL(19,0)) * v)
                    AS DECIMAL(38,0)) AS spv,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * u)
                    AS DECIMAL(38,0)) AS squ,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * v)
                    AS DECIMAL(38,0)) AS sqv
        FROM lag2
    )
"""


def _gc_f_sql(sy, syy, syu, syv, sown, sownown, scross,
              scrosscross, sboth):
    """F statistic for response y on (1, own-lag) vs (1, own-lag,
    cross-lag), all from the gm moment columns. Arguments are SQL
    column names: Sy, Syy, S(y*own), S(y*cross), S(own), S(own^2),
    S(cross), S(cross^2), S(own*cross)."""
    n = "CAST(n AS DOUBLE)"
    yd = f"CAST({sy} AS DOUBLE)"
    yyd = f"CAST({syy} AS DOUBLE)"
    yud = f"CAST({syu} AS DOUBLE)"
    yvd = f"CAST({syv} AS DOUBLE)"
    ud = f"CAST({sown} AS DOUBLE)"
    vd = f"CAST({scross} AS DOUBLE)"
    uud = f"CAST({sownown} AS DOUBLE)"
    vvd = f"CAST({scrosscross} AS DOUBLE)"
    uvd = f"CAST({sboth} AS DOUBLE)"
    br = f"(({n} * {yud} - {ud} * {yd}) / ({n} * {uud} - {ud} * {ud}))"
    ar = f"(({yd} - {br} * {ud}) / {n})"
    ssr_r = f"({yyd} - {ar} * {yd} - {br} * {yud})"
    det = (f"({n} * ({uud} * {vvd} - {uvd} * {uvd})"
           f" - {ud} * ({ud} * {vvd} - {uvd} * {vd})"
           f" + {vd} * ({ud} * {uvd} - {uud} * {vd}))")
    d0 = (f"({yd} * ({uud} * {vvd} - {uvd} * {uvd})"
          f" - {ud} * ({yud} * {vvd} - {yvd} * {uvd})"
          f" + {vd} * ({yud} * {uvd} - {yvd} * {uud}))")
    d1 = (f"({n} * ({yud} * {vvd} - {yvd} * {uvd})"
          f" - {yd} * ({ud} * {vvd} - {uvd} * {vd})"
          f" + {vd} * ({ud} * {yvd} - {yud} * {vd}))")
    d2 = (f"({n} * ({uud} * {yvd} - {uvd} * {yud})"
          f" - {ud} * ({ud} * {yvd} - {yud} * {vd})"
          f" + {yd} * ({ud} * {uvd} - {uud} * {vd}))")
    ssr_u = (f"({yyd} - ({d0} / {det}) * {yd}"
             f" - ({d1} / {det}) * {yud}"
             f" - ({d2} / {det}) * {yvd})")
    return f"(({ssr_r} - {ssr_u}) * (n - 3.0) / {ssr_u})"


@register(
    "granger_causality_f",
    oracle=f"""
    WITH {_GC_MOM_SQL}
    SELECT n AS n_pairs,
           round({_gc_f_sql('sp', 'spp', 'spu', 'spv',
                            'su', 'suu', 'sv', 'svv', 'suv')}, 6)
               + 0.0 AS f_clicks_to_purchases,
           round({_gc_f_sql('sq', 'sqq', 'sqv', 'squ',
                            'sv', 'svv', 'su', 'suu', 'suv')}, 6)
               + 0.0 AS f_purchases_to_clicks,
           CAST(n - 3 AS BIGINT) AS dof2
    FROM gm
    """,
)
def granger_causality_f(spark, sf_dir):
    """Bivariate GRANGER CAUSALITY at lag 1 between the daily click
    and purchase series, BOTH directions in one pass: F compares
    y_t ~ (1, y_(t-1)) against y_t ~ (1, y_(t-1), x_(t-1)) — "do
    yesterday's clicks predict today's purchases beyond what
    yesterday's purchases already say?" — the lead-lag readout
    behind every marketing-attribution claim, and the predictive
    sibling of `transfer_entropy_daily` (same question,
    information-theoretic route; the two disagreeing flags
    nonlinear coupling). Asymmetric by construction: both F's ship.

    Exactness: the 14 moments of (p_t, q_t, p_(t-1), q_(t-1)) fold
    exact BIGINT day counts through DECIMAL(19,0) widens in ONE
    pass over the zero-filled grid's lag join; both restricted and
    unrestricted SSRs are closed forms on those moments (the
    ramsey_reset Cramer idiom), so the F's are terminal double
    trees of exact integers — no rounding needed before the final
    round. Plan: one day rollup, bounded grid fill, one lag-1
    equi-join, one fold."""
    e = t(spark, sf_dir, "events")
    ev2 = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("q"),
    )
    span = ev2.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    )
    fill = grid.join(ev2, "d", "left").select(
        "d",
        F.coalesce("p", F.lit(0)).cast("bigint").alias("p"),
        F.coalesce("q", F.lit(0)).cast("bigint").alias("q"),
    )
    a = fill.select("d", "p", "q")
    b = fill.select(
        (F.col("d") + 1).alias("d"),
        F.col("p").alias("u"),
        F.col("q").alias("v"),
    )
    lag2 = a.join(b, "d")

    def dsum(x, y, name):
        return (
            F.sum(F.col(x).cast("decimal(19,0)") * F.col(y))
            .cast("decimal(38,0)")
            .alias(name)
        )

    gm = lag2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p").cast("bigint").alias("sp"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("v").cast("bigint").alias("sv"),
        dsum("p", "p", "spp"),
        dsum("q", "q", "sqq"),
        dsum("u", "u", "suu"),
        dsum("v", "v", "svv"),
        dsum("u", "v", "suv"),
        dsum("p", "u", "spu"),
        dsum("p", "v", "spv"),
        dsum("q", "u", "squ"),
        dsum("q", "v", "sqv"),
    )

    def gc_f(sy, syy, syu, syv, sown, sownown, scross,
             scrosscross, sboth):
        """F for response y on (1, own-lag) vs (1, own-lag,
        cross-lag); arguments name the gm moment columns exactly as
        in _gc_f_sql."""
        n = F.col("n").cast("double")
        syd = F.col(sy).cast("double")
        syyd = F.col(syy).cast("double")
        syud = F.col(syu).cast("double")
        syvd = F.col(syv).cast("double")
        sud = F.col(sown).cast("double")
        svd = F.col(scross).cast("double")
        suud = F.col(sownown).cast("double")
        svvd = F.col(scrosscross).cast("double")
        suvd = F.col(sboth).cast("double")
        br = (n * syud - sud * syd) / (n * suud - sud * sud)
        ar = (syd - br * sud) / n
        ssr_r = syyd - ar * syd - br * syud
        det = (
            n * (suud * svvd - suvd * suvd)
            - sud * (sud * svvd - suvd * svd)
            + svd * (sud * suvd - suud * svd)
        )
        d0 = (
            syd * (suud * svvd - suvd * suvd)
            - sud * (syud * svvd - syvd * suvd)
            + svd * (syud * suvd - syvd * suud)
        )
        d1 = (
            n * (syud * svvd - syvd * suvd)
            - syd * (sud * svvd - suvd * svd)
            + svd * (sud * syvd - syud * svd)
        )
        d2 = (
            n * (suud * syvd - suvd * syud)
            - sud * (sud * syvd - syud * svd)
            + syd * (sud * suvd - suud * svd)
        )
        ssr_u = (
            syyd
            - (d0 / det) * syd
            - (d1 / det) * syud
            - (d2 / det) * syvd
        )
        return (ssr_r - ssr_u) * (n - 3.0) / ssr_u

    f1 = gc_f("sp", "spp", "spu", "spv", "su", "suu", "sv", "svv",
              "suv")
    f2 = gc_f("sq", "sqq", "sqv", "squ", "sv", "svv", "su", "suu",
              "suv")
    return gm.select(
        F.col("n").alias("n_pairs"),
        (F.round(f1, 6) + 0.0).alias("f_clicks_to_purchases"),
        (F.round(f2, 6) + 0.0).alias("f_purchases_to_clicks"),
        (F.col("n") - 3).cast("bigint").alias("dof2"),
    )


# --------------------------------------------------------------------------
# Cross-correlation function clicks -> purchases at lags -7..7
# --------------------------------------------------------------------------
@register(
    "ccf_peak_lag",
    oracle="""
    WITH ev2 AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    span2 AS (SELECT CAST(min(d) AS BIGINT) AS d0,
                     CAST(max(d) AS BIGINT) AS d1 FROM ev2),
    fill2 AS (
        SELECT CAST(u.g AS BIGINT) AS d,
               COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y
        FROM span2,
             LATERAL UNNEST(range(span2.d0, span2.d1 + 1)) AS u(g)
        LEFT JOIN ev2 e ON u.g = e.d
    ),
    ks AS (SELECT CAST(u.g AS BIGINT) AS k
           FROM LATERAL UNNEST(range(-7, 8)) AS u(g)),
    pairs AS (
        SELECT ks.k, a.x, b.y
        FROM fill2 a JOIN ks ON TRUE
        JOIN fill2 b ON b.d = a.d + ks.k
    ),
    mom AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x)
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * y)
                    AS DECIMAL(38,0)) AS sxy
        FROM pairs GROUP BY k
    ),
    ccf AS (
        SELECT k, n,
               round((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sy)
                     / sqrt((n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy)), 10)
                   AS r
        FROM mom
    ),
    peak AS (
        SELECT k AS kstar FROM ccf
        ORDER BY abs(r) DESC, k ASC LIMIT 1
    )
    SELECT ccf.k AS lag_days, ccf.n AS n_pairs,
           round(ccf.r, 6) + 0.0 AS ccf_r,
           round(1.959963985 / sqrt(ccf.n * 1.0), 6) + 0.0
               AS white_noise_band,
           CAST(CASE WHEN ccf.k = peak.kstar THEN 1 ELSE 0 END
                AS INT) AS is_peak
    FROM ccf, peak ORDER BY ccf.k
    """,
)
def ccf_peak_lag(spark, sf_dir):
    """Cross-correlation function between daily clicks (x) and daily
    purchases (y) at lags -7..+7: r_k = corr(x_t, y_(t+k)) on the
    zero-filled grid, each lag over its own aligned window, with the
    +/-1.96/sqrt(n) white-noise band and the |r|-argmax peak flag
    (ties to the smallest lag) — the WHERE of the lead-lag story
    `granger_causality_f` tests at lag 1: a peak at k>0 reads
    "clicks lead purchases by k days", the marketing-latency
    readout. Per-lag n shrinks with |k| (no padding — real aligned
    pairs only).

    Exactness: per-lag moments fold exact BIGINT counts through
    DECIMAL(19,0) widens in one grouped pass over the bounded
    (day x 15-lag) join; each r is rounded at 10 dp before the
    argmax so both engines rank identical doubles; the peak is a
    total-order top-1. Plan: one day rollup, bounded grid fill, one
    15-lag equi-join, one grouped fold, one 15-row argmax."""
    e = t(spark, sf_dir, "events")
    ev2 = e.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    span = ev2.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    )
    fill = grid.join(ev2, "d", "left").select(
        "d",
        F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
        F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
    ).persist()
    ks = spark.range(-7, 8).select(F.col("id").cast("bigint").alias("k"))
    a = fill.select("d", "x")
    b = fill.select(F.col("d").alias("bd"), F.col("y").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(ks))
        .withColumn("bd", F.col("d") + F.col("k"))
        .join(b, "bd")
    )
    mom = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    n = F.col("n")
    r = F.round(
        (n * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy"))
        / F.sqrt(
            (n * F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx"))
            * (n * F.col("syy").cast("double")
               - F.col("sy").cast("double") * F.col("sy"))
        ),
        10,
    )
    ccf = mom.select("k", "n", r.alias("r")).persist()
    peak = (
        ccf.orderBy(F.abs(F.col("r")).desc(), F.col("k").asc())
        .limit(1)
        .select(F.col("k").alias("kstar"))
    )
    return (
        ccf.crossJoin(F.broadcast(peak))
        .select(
            F.col("k").alias("lag_days"),
            F.col("n").alias("n_pairs"),
            (F.round("r", 6) + 0.0).alias("ccf_r"),
            (F.round(1.959963985 / F.sqrt(n * 1.0), 6) + 0.0).alias(
                "white_noise_band"
            ),
            F.when(F.col("k") == F.col("kstar"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_peak"),
        )
        .orderBy("lag_days")
    )


# --------------------------------------------------------------------------
# Knox space-time interaction test on orders
# --------------------------------------------------------------------------
@register(
    "knox_spacetime",
    oracle="""
    WITH o2 AS (
        SELECT CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
                   AS d,
               c.c_nationkey AS nk
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o2),
    byday AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM o2 GROUP BY d
    ),
    bynat AS (
        SELECT nk, CAST(COUNT(*) AS BIGINT) AS c FROM o2 GROUP BY nk
    ),
    bynd AS (
        SELECT nk, d, CAST(COUNT(*) AS BIGINT) AS c
        FROM o2 GROUP BY nk, d
    ),
    pt AS (
        SELECT CAST(SUM(CAST(c AS DECIMAL(19,0)) * (c - 1))
                    AS DECIMAL(38,0)) // 2
               + (SELECT CAST(SUM(CAST(a.c AS DECIMAL(19,0)) * b.c)
                              AS DECIMAL(38,0))
                  FROM byday a JOIN byday b
                    ON b.d > a.d AND b.d <= a.d + 3) AS np
        FROM byday
    ),
    ps AS (
        SELECT CAST(SUM(CAST(c AS DECIMAL(19,0)) * (c - 1))
                    AS DECIMAL(38,0)) // 2 AS np
        FROM bynat
    ),
    pb AS (
        SELECT CAST(SUM(CAST(c AS DECIMAL(19,0)) * (c - 1))
                    AS DECIMAL(38,0)) // 2
               + (SELECT CAST(SUM(CAST(a.c AS DECIMAL(19,0)) * b.c)
                              AS DECIMAL(38,0))
                  FROM bynd a JOIN bynd b
                    ON a.nk = b.nk AND b.d > a.d AND b.d <= a.d + 3)
                   AS np
        FROM bynd
    ),
    stat AS (
        SELECT n_.n,
               CAST(pt.np AS DOUBLE) AS nt,
               CAST(ps.np AS DOUBLE) AS ns,
               CAST(pb.np AS DOUBLE) AS x,
               CAST(pt.np AS DOUBLE) * CAST(ps.np AS DOUBLE)
                   / (CAST(n_.n AS DOUBLE) * (n_.n - 1) / 2.0) AS ex
        FROM n_, pt, ps, pb
    )
    SELECT n AS n_orders,
           CAST(nt AS BIGINT) AS pairs_time_close,
           CAST(ns AS BIGINT) AS pairs_space_close,
           CAST(x AS BIGINT) AS pairs_both_close,
           round(ex, 4) + 0.0 AS expected_both,
           round((x - ex) / sqrt(ex), 6) + 0.0 AS knox_z
    FROM stat
    """,
)
def knox_spacetime(spark, sf_dir):
    """Knox space-time interaction test on orders: X = pairs of
    orders CLOSE IN BOTH time (<= 3 days apart) and space (same
    customer nation), against E[X] = N_T N_S / N_pairs under
    independence, z = (X-E)/sqrt(E) (Knox's Poisson approximation)
    — the classic outbreak/fraud-burst detector: orders clustering
    in time AND geography beyond what their marginal clusterings
    imply. The spatial-epidemiology member of the spatial family
    (`morans_i_nations` / `getis_ord_general_g` are cross-sectional;
    Knox is the INTERACTION of the two closeness relations).

    Exactness: all three pair counts are exact — same-cell C(c,2)
    folds plus 3-offset day-band equi-joins at (day), (nation), and
    (nation, day) grain, every product DECIMAL(19,0)-widened (day
    cell counts squared pass int64 at the 64x octave); E and z are
    terminal ratios. The pair counting never touches order-pair
    grain: everything is rollup-of-rollups on bounded (nation x
    day) frames. Plan: one join scan, three rollups, three bounded
    band self-joins, one fold."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    o2 = o.join(c, o.o_custkey == c.c_custkey).select(
        F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
        .cast("bigint")
        .alias("d"),
        F.col("c_nationkey").alias("nk"),
    )
    n_ = o2.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    byday = o2.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    bynat = o2.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bynd = o2.groupBy("nk", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()

    def same_cell_pairs(df):
        return df.agg(
            (
                F.sum(
                    F.col("c").cast("decimal(19,0)") * (F.col("c") - 1)
                ).cast("decimal(38,0)")
                / 2
            )
            .cast("decimal(38,0)")
            .alias("p")
        )

    tband = (
        byday.alias("a")
        .join(
            byday.alias("b"),
            (F.col("b.d") > F.col("a.d"))
            & (F.col("b.d") <= F.col("a.d") + 3),
        )
        .agg(
            F.sum(
                F.col("a.c").cast("decimal(19,0)") * F.col("b.c")
            )
            .cast("decimal(38,0)")
            .alias("p")
        )
    )
    sband = (
        bynd.alias("a")
        .join(
            bynd.alias("b"),
            (F.col("a.nk") == F.col("b.nk"))
            & (F.col("b.d") > F.col("a.d"))
            & (F.col("b.d") <= F.col("a.d") + 3),
        )
        .agg(
            F.sum(
                F.col("a.c").cast("decimal(19,0)") * F.col("b.c")
            )
            .cast("decimal(38,0)")
            .alias("p")
        )
    )
    pt = (
        same_cell_pairs(byday)
        .crossJoin(F.broadcast(tband.select(F.col("p").alias("pb_"))))
        .select((F.col("p") + F.col("pb_")).alias("nt"))
    )
    ps = same_cell_pairs(bynat).select(F.col("p").alias("ns"))
    pb = (
        same_cell_pairs(bynd)
        .crossJoin(F.broadcast(sband.select(F.col("p").alias("pb_"))))
        .select((F.col("p") + F.col("pb_")).alias("x"))
    )
    stat = (
        n_.crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(pb))
    )
    n = F.col("n").cast("double")
    nt = F.col("nt").cast("double")
    ns = F.col("ns").cast("double")
    x = F.col("x").cast("double")
    ex = nt * ns / (n * (F.col("n") - 1) / 2.0)
    return stat.select(
        F.col("n").alias("n_orders"),
        F.col("nt").cast("bigint").alias("pairs_time_close"),
        F.col("ns").cast("bigint").alias("pairs_space_close"),
        F.col("x").cast("bigint").alias("pairs_both_close"),
        (F.round(ex, 4) + 0.0).alias("expected_both"),
        (F.round((x - ex) / F.sqrt(ex), 6) + 0.0).alias("knox_z"),
    )
