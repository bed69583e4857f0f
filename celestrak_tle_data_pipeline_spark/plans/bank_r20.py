"""Round-20 pre-staged bank (candidate X739+): STAGED, not in the
live registry — the generation behind ``bank_r19`` (round 19's flip),
under the identical no-new-debt discipline: stage-only decorator,
two-SF gate mirror in ``tests/test_bank_r20.py``, sf0.1 sweeps via
``tools/bank_check.py --module bank_r20``, the dtype-family sweep
(``tests/test_oracle_dtypes.py`` auto-discovers bank_r13..r20),
plan-audit notes pre-adjudicated at authoring time, and the HARD
authoring-time 64x probe gate (``SCALING_PROBES.json`` +
``tests/test_flip_readiness.py``).

Seed theme: SPACINGS & EXTREMAL DEPENDENCE — the log-spacings Moran
test (the information-theoretic third opinion beside Greenwood's
quadratic and Quesenberry-Miller's adjacent-product forms, with exact
digamma/trigamma moments via the harmonic devices), the Gnedenko F
test of exponentiality on normalized order-statistic spacings, and
the bivariate extreme-dependence pair the tail battery lacks: the CFG
Pickands-function estimator and the F-madogram extremal coefficient,
plus the chi-bar tail-INDEPENDENCE discriminator (Coles-Heffernan-
Tawn) that says whether the chi-style readouts are even the right
object.

Determinism disciplines inherited unchanged (bank_r11..r19
docstrings): exact integer/DECIMAL folds, round-before-fold with the
DECADE-ESCALATION rule for libm pins, ``+ 0.0`` on possibly-negative-
zero outputs, total-order tiebreaks, bounded-domain windows or the
ranged device, the shared erfc/harmonic trees, explicit ``floor()``
before double->integer buckets.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .bank_r19 import _harmonic_col
from .common import dec, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}
PLAN_AUDIT_NOTES: dict[str, str] = {}

# pi^2/6, and the exact 21-entry generalized-harmonic H2 table
# (H2_j = sum_{k<=j} 1/k^2); beyond 20 the trigamma Euler-Maclaurin
# series psi'(j+1) = 1/x + 1/(2x^2) + 1/(6x^3) - 1/(30x^5) closes it
# as H2_j = pi^2/6 - psi'(j+1) (the bank_r19 harmonic-device pattern).
_PI2_6 = 1.6449340668482264
_H2_20 = [0.0, 1.0, 1.25, 1.3611111111111112, 1.4236111111111112, 1.4636111111111112, 1.4913888888888889, 1.511797052154195, 1.527422052154195, 1.5397677311665408, 1.5497677311665408, 1.558032193976458, 1.5649766384209025, 1.5708937981842162, 1.5759958390005426, 1.580440283444987, 1.584346533444987, 1.587806741057444, 1.5908931608105303, 1.5936632439130234, 1.5961632439130233]


def _harmonic2_col(j):
    """H2_j = sum_{k=1..j} 1/k^2 as a Column (table + series)."""
    x = (j + 1).cast("double")
    out = _PI2_6 - (
        1.0 / x
        + 1.0 / (2.0 * x * x)
        + 1.0 / (6.0 * x * x * x)
        - 1.0 / (30.0 * x * x * x * x * x)
    )
    for i in range(20, -1, -1):
        out = F.when(j == i, F.lit(_H2_20[i])).otherwise(out)
    return out


def register(name: str, oracle: str | None = None):
    """Stage-only decorator (see bank_r13..r19): records the query in
    the bank dicts and does NOT touch the live registry."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Pooled Moran log-spacings statistic over per-user timelines
# --------------------------------------------------------------------------
@register(
    "moran_log_spacings",
    oracle="""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS tu,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
        FROM events
    ),
    gaps AS (
        SELECT user_id, CAST(tu - prev AS BIGINT) AS gap
        FROM seq WHERE prev IS NOT NULL AND tu - prev > 0
    ),
    peruser AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(gap) AS BIGINT) AS span,
               CAST(SUM(CAST(round(ln(CAST(gap AS DOUBLE)), 8)
                    AS DECIMAL(28,8))) AS DOUBLE) AS slg
        FROM gaps GROUP BY user_id
        HAVING COUNT(*) >= 2
    ),
    terms AS (
        SELECT round(-slg - m * round(ln(m * 1.0), 10)
                     + m * round(ln(CAST(span AS DOUBLE)), 10), 8)
                   AS mo,
               round(m * ((CASE WHEN (m - 1) = 0 THEN 0.0 WHEN (m - 1) = 1 THEN 1.0 WHEN (m - 1) = 2 THEN 1.5 WHEN (m - 1) = 3 THEN 1.8333333333333333 WHEN (m - 1) = 4 THEN 2.0833333333333335 WHEN (m - 1) = 5 THEN 2.283333333333333 WHEN (m - 1) = 6 THEN 2.45 WHEN (m - 1) = 7 THEN 2.592857142857143 WHEN (m - 1) = 8 THEN 2.717857142857143 WHEN (m - 1) = 9 THEN 2.828968253968254 WHEN (m - 1) = 10 THEN 2.9289682539682538 WHEN (m - 1) = 11 THEN 3.019877344877345 WHEN (m - 1) = 12 THEN 3.103210678210678 WHEN (m - 1) = 13 THEN 3.180133755133755 WHEN (m - 1) = 14 THEN 3.2515623265623264 WHEN (m - 1) = 15 THEN 3.3182289932289932 WHEN (m - 1) = 16 THEN 3.3807289932289932 WHEN (m - 1) = 17 THEN 3.4395525226407577 WHEN (m - 1) = 18 THEN 3.4951080781963135 WHEN (m - 1) = 19 THEN 3.547739657143682 WHEN (m - 1) = 20 THEN 3.597739657143682 ELSE ln(CAST((m - 1) AS DOUBLE)) + 0.5772156649015329 + 1.0 / (2.0 * (m - 1)) - 1.0 / (12.0 * (m - 1) * (m - 1)) + 1.0 / (120.0 * (m - 1) * (m - 1) * (m - 1) * (m - 1)) END)
                          - round(ln(m * 1.0), 10)), 8) AS em,
               round(m * 1.6449340668482264
                     - CAST(m AS DOUBLE) * m
                       * (1.6449340668482264
                          - (CASE WHEN (m - 1) = 0 THEN 0.0 WHEN (m - 1) = 1 THEN 1.0 WHEN (m - 1) = 2 THEN 1.25 WHEN (m - 1) = 3 THEN 1.3611111111111112 WHEN (m - 1) = 4 THEN 1.4236111111111112 WHEN (m - 1) = 5 THEN 1.4636111111111112 WHEN (m - 1) = 6 THEN 1.4913888888888889 WHEN (m - 1) = 7 THEN 1.511797052154195 WHEN (m - 1) = 8 THEN 1.527422052154195 WHEN (m - 1) = 9 THEN 1.5397677311665408 WHEN (m - 1) = 10 THEN 1.5497677311665408 WHEN (m - 1) = 11 THEN 1.558032193976458 WHEN (m - 1) = 12 THEN 1.5649766384209025 WHEN (m - 1) = 13 THEN 1.5708937981842162 WHEN (m - 1) = 14 THEN 1.5759958390005426 WHEN (m - 1) = 15 THEN 1.580440283444987 WHEN (m - 1) = 16 THEN 1.584346533444987 WHEN (m - 1) = 17 THEN 1.587806741057444 WHEN (m - 1) = 18 THEN 1.5908931608105303 WHEN (m - 1) = 19 THEN 1.5936632439130234 WHEN (m - 1) = 20 THEN 1.5961632439130233 ELSE 1.6449340668482264 - (1.0 / ((m - 1) + 1.0) + 1.0 / (2.0 * ((m - 1) + 1.0) * ((m - 1) + 1.0))    + 1.0 / (6.0 * ((m - 1) + 1.0) * ((m - 1) + 1.0) * ((m - 1) + 1.0))    - 1.0 / (30.0 * ((m - 1) + 1.0) * ((m - 1) + 1.0) * ((m - 1) + 1.0)             * ((m - 1) + 1.0) * ((m - 1) + 1.0))) END)),
                     10) AS vm
        FROM peruser
    ),
    fold AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS u,
               CAST(SUM(CAST(mo AS DECIMAL(28,8))) AS DOUBLE) AS sm,
               CAST(SUM(CAST(em AS DECIMAL(28,8))) AS DOUBLE) AS se_,
               CAST(SUM(CAST(vm AS DECIMAL(28,10))) AS DOUBLE) AS sv
        FROM terms
    )
    SELECT u AS n_users,
           round(sm, 4) + 0.0 AS moran_sum,
           round(se_, 4) + 0.0 AS expected_sum,
           round((sm - se_) / sqrt(sv), 6) + 0.0 AS z_pooled
    FROM fold
""",
)
def moran_log_spacings(spark, sf_dir):
    """Pooled MORAN log-spacings statistic over per-user event
    timelines: M_u = -sum ln(m D_i) over the user's normalized
    POSITIVE spacings (micros ties drop — ln 0 is undefined; m
    counts the kept gaps) — the information-theoretic THIRD opinion
    beside `greenwood_spacing_uniformity` (quadratic form) and
    `quesenberry_miller_spacings` (adjacent products): M is the
    likelihood-ratio statistic against ANY smooth alternative
    (Cheng-Stephens 1989 recommend it as the most powerful general
    spacings test), diverging when any spacing collapses toward 0,
    which the squared forms soften. Null moments are EXACT via the
    flat-Dirichlet log moments: E[M] = m(H_(m-1) - ln m) and
    Var[M] = m pi^2/6 - m^2(pi^2/6 - H2_(m-1)) (from E[ln D] =
    psi(1) - psi(m), Cov[ln D_i, ln D_j] = -psi'(m); MC-verified at
    m = 3/5/12 before authoring, max |emp-theory| < 5e-2 on V at
    400k draws), with H/H2 from the shared hybrid table/series
    devices. Pooled into one z across users beside the other two.

    Exactness: gaps/spans exact micros BIGINTs; ln gap pins at 8 dp
    into a DECIMAL fold; ln m / ln span pin at 10 dp; per-user
    M/E/Var round at 8-10 dp into DECIMAL folds (order-free).
    Plan: one user-partitioned lag, one per-user rollup, one fold —
    no global sorts."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        "user_id", (us - F.lag(us).over(wu)).alias("gap")
    ).where(F.col("gap").isNotNull() & (F.col("gap") > 0))
    peruser = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum("gap").cast("bigint").alias("span"),
            F.sum(
                F.round(F.log(F.col("gap").cast("double")), 8).cast(
                    "decimal(28,8)"
                )
            )
            .cast("double")
            .alias("slg"),
        )
        .where(F.col("m") >= 2)
    )
    m = F.col("m").cast("double")
    mo = F.round(
        -F.col("slg")
        - m * F.round(F.log(m), 10)
        + m * F.round(F.log(F.col("span").cast("double")), 10),
        8,
    )
    em = F.round(
        m * (_harmonic_col(F.col("m") - 1) - F.round(F.log(m), 10)),
        8,
    )
    vm = F.round(
        m * _PI2_6
        - m * m * (_PI2_6 - _harmonic2_col(F.col("m") - 1)),
        10,
    )
    terms = peruser.select(
        mo.alias("mo"), em.alias("em"), vm.alias("vm")
    )
    fold = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum(F.col("mo").cast("decimal(28,8)"))
        .cast("double")
        .alias("sm"),
        F.sum(F.col("em").cast("decimal(28,8)"))
        .cast("double")
        .alias("se_"),
        F.sum(F.col("vm").cast("decimal(28,10)"))
        .cast("double")
        .alias("sv"),
    )
    return fold.select(
        F.col("u").alias("n_users"),
        (F.round("sm", 4) + 0.0).alias("moran_sum"),
        (F.round("se_", 4) + 0.0).alias("expected_sum"),
        (
            F.round(
                (F.col("sm") - F.col("se_")) / F.sqrt(F.col("sv")), 6
            )
            + 0.0
        ).alias("z_pooled"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "moran_log_spacings": (
            "user-partitioned lag + per-user rollup (the "
            "greenwood_spacing_uniformity frame)"
        ),
    }
)


# --------------------------------------------------------------------------
# Gnedenko F test of exponentiality on pooled interpurchase gaps
# --------------------------------------------------------------------------
@register(
    "gnedenko_f_exponentiality",
    oracle="""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS tu,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT CAST(tu - prev AS BIGINT) AS g
        FROM seq WHERE prev IS NOT NULL AND tu - prev > 0
    ),
    grid AS (
        SELECT g AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM gaps GROUP BY g
    ),
    cum AS (
        SELECT v, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS head,
               CAST(COALESCE(SUM(CAST(v AS DECIMAL(38,0)) * c)
                   OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS DECIMAL(38,0)) AS below,
               CAST(SUM(c) OVER () AS BIGINT) AS m,
               CAST(SUM(CAST(v AS DECIMAL(38,0)) * c) OVER ()
                    AS DECIMAL(38,0)) AS s
        FROM grid
    ),
    atr AS (
        SELECT m, s,
               m // 2 AS r,
               CAST(below AS DOUBLE)
                   + (m // 2 - head) * CAST(v AS DOUBLE)
                   + (m - m // 2) * CAST(v AS DOUBLE) AS ttt_r
        FROM cum
        WHERE head < m // 2 AND m // 2 <= head + c
    ),
    stat AS (
        SELECT m, r,
               (ttt_r / r)
               / ((CAST(s AS DOUBLE) - ttt_r) / (m - r)) AS f
        FROM atr
    )
    SELECT m AS n_gaps, r AS r_split,
           round(f, 6) + 0.0 AS gnedenko_f,
           round(ln(f) / sqrt(1.0 / r + 1.0 / (m - r)), 6) + 0.0
               AS z_ln_f
    FROM stat
    """,
)
def gnedenko_f_exponentiality(spark, sf_dir):
    """GNEDENKO F test of exponentiality on the pooled positive
    interpurchase gaps: the normalized order-statistic spacings
    l_i = (m-i+1)(D_(i) - D_(i-1)) are iid exponential UNDER
    exponentiality, so the ratio of their early-half to late-half
    means is F(2r, 2(m-r))-distributed — computed WITHOUT
    materializing a single spacing via the total-time-on-test
    identity sum_{i<=r} l_i = sum_{i<=r} D_(i) + (m-r) D_(r), one
    row lookup on the gap-value grid. The ORDER-STATISTICS second
    opinion to `exp_rate_lr_gaps` (likelihood ratio on a split) and
    `ks_exponential_gaps` (ECDF distance): F > 1 reads as
    decreasing hazard (burst-then-quiet timelines), F < 1 as
    increasing hazard, the direction the omnibus tests cannot give.
    z_ln_f is the large-df normal reading ln F ~ N(0, 1/r +
    1/(m-r)).

    Exactness: gaps exact micros BIGINTs; the grid cumulative and
    the c*v prefix widen through DECIMAL(38,0); the single
    position-r row is an exact integer head/c bracket; F and z are
    terminal IEEE trees. Plan: user-partitioned lag -> gap-value
    grid rollup -> two exclusive-prefix cumulatives -> one-row
    filter; grid windows are gap-value-domain-bounded (the
    weibull_median_rank class)."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id", (us - F.lag(us).over(wu)).alias("g")
        )
        .where(F.col("g").isNotNull() & (F.col("g") > 0))
    )
    grid = gaps.groupBy(F.col("g").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cv = F.col("v").cast("decimal(38,0)") * F.col("c")
    cum = grid.select(
        "v",
        "c",
        (F.sum("c").over(wv) - F.col("c")).cast("bigint").alias("head"),
        (F.sum(cv).over(wv) - cv).cast("decimal(38,0)").alias("below"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("m"),
        F.sum(cv)
        .over(Window.partitionBy())
        .cast("decimal(38,0)")
        .alias("s"),
    )
    r = F.floor(F.col("m") / 2).cast("bigint")
    atr = cum.where(
        (F.col("head") < r) & (r <= F.col("head") + F.col("c"))
    ).select(
        "m",
        "s",
        r.alias("r"),
        (
            F.col("below").cast("double")
            + (r - F.col("head")).cast("double")
            * F.col("v").cast("double")
            + (F.col("m") - r).cast("double")
            * F.col("v").cast("double")
        ).alias("ttt_r"),
    )
    f = (F.col("ttt_r") / F.col("r")) / (
        (F.col("s").cast("double") - F.col("ttt_r"))
        / (F.col("m") - F.col("r"))
    )
    return atr.select(
        F.col("m").alias("n_gaps"),
        F.col("r").alias("r_split"),
        (F.round(f, 6) + 0.0).alias("gnedenko_f"),
        (
            F.round(
                F.log(f)
                / F.sqrt(
                    1.0 / F.col("r")
                    + 1.0 / (F.col("m") - F.col("r"))
                ),
                6,
            )
            + 0.0
        ).alias("z_ln_f"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "gnedenko_f_exponentiality": (
            "exclusive-prefix cumulatives over the gap-value grid "
            "(gap-value-domain-bounded — the weibull_median_rank "
            "class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Shared daily (volume, revenue) pseudo-uniform frame for the tail pair
# --------------------------------------------------------------------------
_BIVAR_SQL = """
    daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                   AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT d,
               CAST(RANK() OVER (ORDER BY x)
                    + COUNT(*) OVER (PARTITION BY x) - 1
                    AS BIGINT) AS rx2,
               CAST(RANK() OVER (ORDER BY y)
                    + COUNT(*) OVER (PARTITION BY y) - 1
                    AS BIGINT) AS ry2,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    uv AS (
        SELECT n,
               round(rx2 / (2.0 * (n + 1.0)), 10) AS u,
               round(ry2 / (2.0 * (n + 1.0)), 10) AS v
        FROM ranked
    )
"""


def _bivar_uv(spark, sf_dir):
    """Daily (order volume, revenue) with midrank pseudo-uniform
    margins U, V (the rank_autocorrelation 2x-midrank device over
    the ~2.4k-row calendar frame; pinned at 10 dp)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        (F.sum(dec("o_totalprice", 18, 2)) * 100)
        .cast("bigint")
        .alias("y"),
    )
    wall = Window.partitionBy()
    rx2 = (
        F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    ).cast("bigint")
    ry2 = (
        F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
    ).cast("bigint")
    n = F.count(F.lit(1)).over(wall).cast("bigint")
    ranked = daily.select(
        rx2.alias("rx2"), ry2.alias("ry2"), n.alias("n")
    )
    return ranked.select(
        "n",
        F.round(F.col("rx2") / (2.0 * (F.col("n") + 1.0)), 10)
        .alias("u"),
        F.round(F.col("ry2") / (2.0 * (F.col("n") + 1.0)), 10)
        .alias("v"),
    )


# --------------------------------------------------------------------------
# CFG (Caperaa-Fougeres-Genest) Pickands dependence at t = 1/2
# --------------------------------------------------------------------------
@register(
    "cfg_pickands_dependence",
    oracle=f"""
    WITH {_BIVAR_SQL},
    terms AS (
        SELECT n,
               round(ln(LEAST(-ln(u), -ln(v))) + 0.6931471805599453,
                     10) AS lmin,
               round(ln(-ln(u)), 10) AS lx,
               round(ln(-ln(v)), 10) AS ly
        FROM uv
    ),
    fold AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(lmin AS DECIMAL(28,10))) AS DOUBLE)
                   AS sm,
               CAST(SUM(CAST(lx AS DECIMAL(28,10))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ly AS DECIMAL(28,10))) AS DOUBLE) AS sy
        FROM terms
    )
    SELECT n AS n_days,
           round(exp(-(sm / n) + 0.5 * (sx / n + sy / n)), 8) + 0.0
               AS pickands_a_half,
           round(2.0 * (1.0
                 - exp(-(sm / n) + 0.5 * (sx / n + sy / n))), 8)
               + 0.0 AS chi_cfg
    FROM fold
    """,
)
def cfg_pickands_dependence(spark, sf_dir):
    """CFG (Caperaa-Fougeres-Genest 1997) estimator of the PICKANDS
    DEPENDENCE FUNCTION at t = 1/2 for daily (order volume,
    revenue), endpoint-corrected: ln A(1/2) = -(1/n) sum ln min(2
    xi_i, 2 eta_i) + (1/2)[(1/n) sum ln xi_i + (1/n) sum ln eta_i]
    with xi = -ln U, eta = -ln V on midrank pseudo-uniforms (the
    Euler-gamma terms cancel exactly in the corrected form, so no
    gamma constant is needed). A(1/2) = 1 reads as tail
    INDEPENDENCE, 1/2 as perfect dependence; chi = 2(1 - A(1/2)) is
    the same chi the threshold estimator `upper_tail_dependence_
    daily` chases — but CFG uses EVERY observation through the
    copula rather than the top few exceedances, so the pair
    agreeing certifies the tail reading and CFG-above-threshold
    flags that the threshold chi hasn't converged.

    Exactness: midranks are exact integers over the calendar frame
    (bounded windows, the rank_autocorrelation class); U/V pin at
    10 dp; the three log folds round at 10 dp into DECIMAL sums
    (ln 2 = 0.6931471805599453 shared literal). Plan: day rollup ->
    bounded rank windows -> one fold."""
    uv = _bivar_uv(spark, sf_dir)
    xi = -F.log("u")
    eta = -F.log("v")
    terms = uv.select(
        "n",
        F.round(
            F.log(F.least(xi, eta)) + 0.6931471805599453, 10
        ).alias("lmin"),
        F.round(F.log(xi), 10).alias("lx"),
        F.round(F.log(eta), 10).alias("ly"),
    )
    fold = terms.agg(
        F.max("n").alias("n"),
        F.sum(F.col("lmin").cast("decimal(28,10)"))
        .cast("double")
        .alias("sm"),
        F.sum(F.col("lx").cast("decimal(28,10)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.col("ly").cast("decimal(28,10)"))
        .cast("double")
        .alias("sy"),
    )
    n = F.col("n").cast("double")
    a_half = F.exp(
        -(F.col("sm") / n) + 0.5 * (F.col("sx") / n + F.col("sy") / n)
    )
    return fold.select(
        F.col("n").alias("n_days"),
        (F.round(a_half, 8) + 0.0).alias("pickands_a_half"),
        (F.round(2.0 * (1.0 - a_half), 8) + 0.0).alias("chi_cfg"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "cfg_pickands_dependence": (
            "bounded calendar-frame rank windows (the "
            "rank_autocorrelation class)"
        ),
    }
)


# --------------------------------------------------------------------------
# F-madogram extremal coefficient (the distance route to the same chi)
# --------------------------------------------------------------------------
@register(
    "f_madogram_extremal",
    oracle=f"""
    WITH {_BIVAR_SQL},
    fold AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(round(0.5 * abs(u - v), 12)
                    AS DECIMAL(28,12))) AS DOUBLE) AS nu
        FROM uv
    )
    SELECT n AS n_days,
           round(nu / n, 8) + 0.0 AS f_madogram,
           round((1.0 + 2.0 * nu / n) / (1.0 - 2.0 * nu / n), 8)
               + 0.0 AS extremal_theta,
           round(2.0 - (1.0 + 2.0 * nu / n) / (1.0 - 2.0 * nu / n),
                 8) + 0.0 AS chi_madogram
    FROM fold
    """,
)
def f_madogram_extremal(spark, sf_dir):
    """F-MADOGRAM extremal coefficient for daily (order volume, revenue)
    on the identical midrank pseudo-uniform frame as
    `cfg_pickands_dependence`: nu_F = (1/2n) sum |U_i - V_i| maps
    to the extremal coefficient theta = (1 + 2 nu)/(1 - 2 nu)
    (Cooley-Naveau-Poncet 2006), theta = 1 total dependence, 2
    independence, and chi = 2 - theta — the DISTANCE route to the
    same tail-dependence number CFG reaches through the copula
    likelihood and the threshold estimator through exceedance
    counts: three estimators, three error mechanisms, one
    parameter; their spread IS the uncertainty statement. nu_F is
    also bounded in [0, 1/6], so the readout self-checks (values
    outside mean a margins bug, not a data property).

    Exactness: U/V are 10-dp-pinned exact-midrank ratios; the
    half-absolute-difference terms round at 12 dp into one DECIMAL
    fold; theta and chi are terminal IEEE trees. Plan: day rollup
    -> bounded rank windows -> one fold."""
    uv = _bivar_uv(spark, sf_dir)
    fold = uv.agg(
        F.max("n").alias("n"),
        F.sum(
            F.round(0.5 * F.abs(F.col("u") - F.col("v")), 12).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("nu"),
    )
    nu = F.col("nu") / F.col("n").cast("double")
    theta = (1.0 + 2.0 * nu) / (1.0 - 2.0 * nu)
    return fold.select(
        F.col("n").alias("n_days"),
        (F.round(nu, 8) + 0.0).alias("f_madogram"),
        (F.round(theta, 8) + 0.0).alias("extremal_theta"),
        (F.round(2.0 - theta, 8) + 0.0).alias("chi_madogram"),
    )


PLAN_AUDIT_NOTES.update(
    {
        "f_madogram_extremal": (
            "bounded calendar-frame rank windows (the "
            "rank_autocorrelation class)"
        ),
    }
)


# --------------------------------------------------------------------------
# Chi-bar tail-independence discriminator at two thresholds
# --------------------------------------------------------------------------
@register(
    "chibar_tail_independence",
    oracle=f"""
    WITH {_BIVAR_SQL},
    gr AS (
        SELECT q AS uq, uv.n,
               CAST(SUM(CASE WHEN u > q THEN 1 ELSE 0 END)
                    AS BIGINT) AS nx,
               CAST(SUM(CASE WHEN u > q AND v > q THEN 1 ELSE 0 END)
                    AS BIGINT) AS nj
        FROM uv, (SELECT CAST(UNNEST([0.90, 0.95]) AS DOUBLE) AS q)
        GROUP BY q, uv.n
    )
    SELECT uq AS threshold_u,
           nj AS n_joint_exceed,
           round(CAST(nj AS DOUBLE) / n / (1.0 - uq), 8) + 0.0
               AS chi_u,
           round(CASE WHEN nj > 0 AND nx > 0
                      THEN 2.0 * ln(CAST(nx AS DOUBLE) / n)
                           / ln(CAST(nj AS DOUBLE) / n) - 1.0
                 END, 8) + 0.0 AS chibar_u
    FROM gr
    ORDER BY uq
    """,
)
def chibar_tail_independence(spark, sf_dir):
    """CHI-BAR tail-independence discriminator (Coles-Heffernan-
    Tawn 1999) for daily (order volume, revenue) at thresholds u = 0.90
    and 0.95 on the shared pseudo-uniform frame: chibar(u) = 2 ln
    P(U>u) / ln P(U>u, V>u) - 1 converges to 1 under ASYMPTOTIC
    DEPENDENCE and to 2*eta-1 < 1 under asymptotic independence —
    the regime bit every chi-style readout silently assumes:
    chi (also shipped per threshold) is only meaningful when
    chibar -> 1; chibar < 1 with positive chi at finite u is the
    classic spurious-tail-dependence pattern, and THIS query is the
    one that says which regime `upper_tail_dependence_daily`,
    `cfg_pickands_dependence`, and `f_madogram_extremal` are
    actually reading.

    Exactness: exceedance counts are exact integers against
    10-dp-pinned midrank uniforms and literal thresholds; both
    readouts are terminal IEEE trees per 2-row threshold grid.
    Plan: day rollup -> bounded rank windows -> 2-row threshold
    rollup."""
    uv = _bivar_uv(spark, sf_dir)
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.90), F.lit(0.95))).alias("uq")
    )
    gr = (
        uv.crossJoin(F.broadcast(qs))
        .groupBy("uq", "n")
        .agg(
            F.sum(F.when(F.col("u") > F.col("uq"), 1).otherwise(0))
            .cast("bigint")
            .alias("nx"),
            F.sum(
                F.when(
                    (F.col("u") > F.col("uq"))
                    & (F.col("v") > F.col("uq")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("nj"),
        )
    )
    n = F.col("n").cast("double")
    return gr.select(
        F.col("uq").alias("threshold_u"),
        F.col("nj").alias("n_joint_exceed"),
        (
            F.round(
                F.col("nj").cast("double") / n / (1.0 - F.col("uq")),
                8,
            )
            + 0.0
        ).alias("chi_u"),
        (
            F.round(
                F.when(
                    (F.col("nj") > 0) & (F.col("nx") > 0),
                    2.0
                    * F.log(F.col("nx").cast("double") / n)
                    / F.log(F.col("nj").cast("double") / n)
                    - 1.0,
                ),
                8,
            )
            + 0.0
        ).alias("chibar_u"),
    ).orderBy("threshold_u")


PLAN_AUDIT_NOTES.update(
    {
        "chibar_tail_independence": (
            "bounded calendar-frame rank windows + 2-row threshold "
            "grid (the rank_autocorrelation class)"
        ),
    }
)
