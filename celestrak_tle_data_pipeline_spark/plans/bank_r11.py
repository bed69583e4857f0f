"""Round-11 pre-staged bank (candidate X296+): built during round 10
AFTER the official 50-slot window filled, staged OUTSIDE the live
registry so ``tests/test_registry.py::test_no_new_official_debt``
never sees an oracle-paired name without an official row. Round 11
flips this module into ``plans._MODULES`` exactly like round 9 flipped
``next_window.py`` (same local-decorator discipline; see that module's
docstring for the flip protocol).

Every query lands here only after passing the driver-gate compare
(``tools/check.py`` canon/hash) at sf0.001 AND sf0.01 via
``tests/test_bank_r11.py``, plus the sf0.1 sweep through
``tools/bank_check.py --module bank_r11`` (the round-8 lesson: integer
overflow in power sums only shows at sf0.1+).

Topic sweep (genuinely new ground vs the 377 live names):
two-sample distribution tests beyond KS/MWU (Cramér-von Mises +
Watson, Anderson-Darling, Kuiper, Mood scale), robust shape panels
(Bowley/Moors), time-series complexity (sample entropy, permutation
entropy, variance-ratio, variogram), EVT (GPD peaks-over-threshold by
PWM), stylometry (Burrows' Delta, hapax richness, JS divergence,
Kneser-Ney discounts, log-odds-Dirichlet), agreement (Fleiss kappa),
causal panels (DiD, RDD), graph cohesion (rich club), embedding
geometry (anisotropy via the sum-vector identity), and
business-analytics shapes (net dollar retention, duplicate-invoice
audit, SBC intermittent-demand grid).

Determinism discipline (plans/__init__ contract): counts, midranks
(2x-scaled), and cross-multiplied ECDF gaps are exact integers; money
folds are integer cents; ln/sqrt terms are per-row IEEE rounded to a
fixed scale BEFORE any cross-partition DECIMAL fold; every final float
rounds; possibly-negative-zero outputs append ``+ 0.0``; every top-k
carries a total-order tiebreak.

Scale shape: the pooled-ECDF machinery is the ranged global-cumsum
device (range partition on value + broadcast prefix-sum offsets —
``plans/common.prefix_offsets``), so no unpartitioned window touches
row-grain data anywhere in this module; day-grain queries ride the
bounded orders calendar (~2.4k rows) exactly like round10.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dec, prefix_offsets, t

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    """Stage-only decorator: records the query in the bank dicts and
    deliberately does NOT touch the live registry (pre-flip
    discipline — ``tests/test_bank_r11.py`` asserts the separation)."""

    def deco(fn):
        BANK_QUERIES[name] = fn
        if oracle is not None:
            BANK_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# shared: pooled two-sample ECDF at distinct-value grain (click vs purchase)
# --------------------------------------------------------------------------
_POOL_SQL = """
    pool AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    by_val AS (
        SELECT value, CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(1 - g1) AS BIGINT) AS c2
        FROM pool GROUP BY value
    ),
    tots AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2
        FROM by_val
    ),
    cum AS (
        SELECT value, c1 + c2 AS h,
               SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   AS f1,
               SUM(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   AS f2
        FROM by_val
    )
"""


def _ecdf2(spark, sf_dir):
    """(value, h, f1, f2) at distinct-value grain plus broadcast totals
    (n1, n2) — f1/f2 are EXACT cumulative counts of each sample through
    the value, built with the single-partition-free ranged device
    (range partition on value, per-partition running sums, broadcast
    prefix offsets; the ks_two_sample_values shape)."""
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
            F.sum("g1").alias("c1"),
            F.sum(1 - F.col("g1")).alias("c2"),
        )
        .repartitionByRange(8, F.col("value").asc())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    part_tots = by_val.groupBy("pid").agg(
        F.sum("c1").alias("p1"), F.sum("c2").alias("p2")
    )
    offsets = prefix_offsets(part_tots, {"off1": "p1", "off2": "p2"})
    w_local = (
        Window.partitionBy("pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = by_val.join(F.broadcast(offsets), "pid").select(
        "value",
        (F.col("c1") + F.col("c2")).alias("h"),
        (F.sum("c1").over(w_local) + F.col("off1")).alias("f1"),
        (F.sum("c2").over(w_local) + F.col("off2")).alias("f2"),
    )
    tots = by_val.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    return cum.crossJoin(F.broadcast(tots))


# --------------------------------------------------------------------------
# Cramér-von Mises + Watson U² two-sample tests
# --------------------------------------------------------------------------
@register(
    "cramer_von_mises_watson",
    oracle=f"""
    WITH {_POOL_SQL},
    gaps AS (
        SELECT c.h,
               c.f1 * t.n2 - c.f2 * t.n1 AS d
        FROM cum c, tots t
    ),
    folds AS (
        SELECT CAST(SUM(CAST(h AS DECIMAL(38,0)) * d * d)
                    AS DECIMAL(38,0)) AS u,
               CAST(SUM(CAST(h AS DECIMAL(38,0)) * d)
                    AS DECIMAL(38,0)) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_values
        FROM gaps
    )
    SELECT t.n1, t.n2, f.n_values,
           round(CAST(f.u AS DOUBLE)
                 / ((t.n1 + t.n2) * CAST(t.n1 + t.n2 AS DOUBLE)
                    * t.n1 * t.n2), 9) AS cvm_t,
           round(CAST(f.u AS DOUBLE)
                 / ((t.n1 + t.n2) * CAST(t.n1 + t.n2 AS DOUBLE)
                    * t.n1 * t.n2)
                 - CAST(f.s AS DOUBLE) * CAST(f.s AS DOUBLE)
                   / ((t.n1 + t.n2) * CAST(t.n1 + t.n2 AS DOUBLE)
                      * (t.n1 + t.n2) * t.n1 * t.n2), 9) + 0.0
               AS watson_u2
    FROM folds f, tots t
    """,
)
def cramer_von_mises_watson(spark, sf_dir):
    """Two-sample Cramér-von Mises T plus Watson's U² (click vs
    purchase values): T integrates the SQUARED ECDF gap over the pooled
    sample — sensitive to distributed shape differences a single max
    (KS) misses; Watson's U² recenters the gap (Σh·(d−d̄)²), making the
    statistic rotation-invariant — the variant used for circular/
    periodic data and the sharper of the two against location-free
    shape drift.

    Exactness: with d_j = f1·n2 − f2·n1 (cross-multiplied integer ECDF
    gap at distinct value j, multiplicity h_j), both Σh·d² and Σh·d are
    EXACT DECIMAL(38,0) integer folds; T = Σh·d²/(N²·n1·n2) and
    U² = T − (Σh·d)²/(N³·n1·n2) divide once at the end.

    Plan: the ranged ECDF device (no unpartitioned window), then one
    summary fold — identical shuffle shape to ks_two_sample_values."""
    cum = _ecdf2(spark, sf_dir)
    d = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    folds = cum.groupBy("n1", "n2").agg(
        F.sum(F.col("h").cast("decimal(38,0)") * d * d)
        .cast("decimal(38,0)")
        .alias("u"),
        F.sum(F.col("h").cast("decimal(38,0)") * d)
        .cast("decimal(38,0)")
        .alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
    )
    nn = F.col("n1") + F.col("n2")
    t_stat = F.col("u").cast("double") / (
        nn * nn.cast("double") * F.col("n1") * F.col("n2")
    )
    u2 = t_stat - F.col("s").cast("double") * F.col("s").cast("double") / (
        nn * nn.cast("double") * nn * F.col("n1") * F.col("n2")
    )
    return folds.select(
        "n1",
        "n2",
        "n_values",
        F.round(t_stat, 9).alias("cvm_t"),
        (F.round(u2, 9) + 0.0).alias("watson_u2"),
    )


# --------------------------------------------------------------------------
# Anderson-Darling two-sample test (ties-weighted, Scholz-Stephens k=2)
# --------------------------------------------------------------------------
@register(
    "anderson_darling_two_sample",
    oracle=f"""
    WITH {_POOL_SQL},
    terms AS (
        SELECT CAST(round(
                   CAST(h AS DOUBLE)
                   * ((t.n1 + t.n2) * c.f1 - t.n1 * (c.f1 + c.f2))
                   * ((t.n1 + t.n2) * c.f1 - t.n1 * (c.f1 + c.f2))
                   / (CAST(c.f1 + c.f2 AS DOUBLE)
                      * ((t.n1 + t.n2) - (c.f1 + c.f2))), 9)
               AS DECIMAL(38,9)) AS term
        FROM cum c, tots t
        WHERE c.f1 + c.f2 < t.n1 + t.n2
    ),
    fold AS (
        SELECT SUM(term) AS sd, CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM terms
    )
    SELECT t.n1, t.n2, f.n_terms,
           round(CAST(f.sd AS DOUBLE) / (t.n1 * CAST(t.n2 AS DOUBLE)),
                 6) AS ad_a2
    FROM fold f, tots t
    """,
)
def anderson_darling_two_sample(spark, sf_dir):
    """Two-sample Anderson-Darling A² (click vs purchase values),
    ties-weighted Scholz-Stephens k=2 form: the ECDF-gap integral with
    1/(H(N−H)) weighting that makes the TAILS count — the test that
    catches tail drift (extreme-value contamination, truncation) which
    KS and CvM, weighted toward the middle, both under-power. For k=2
    the two samples' terms coincide (N·f2 − n2·H = −(N·f1 − n1·H)), so
    A² = Σ_j h_j·(N·f1_j − n1·H_j)²/(H_j·(N−H_j)) / (n1·n2), summed
    over distinct pooled values below the maximum.

    Determinism: the numerator (N·f1 − n1·H)² and weights are exact
    integers per distinct value; each term's single division is
    per-row IEEE rounded to 9 before the DECIMAL(38,9) fold (the
    round-before-fold contract), so partial-aggregate order cannot
    move a bit. Plan: ranged ECDF device + one fold."""
    cum = _ecdf2(spark, sf_dir)
    nn = F.col("n1") + F.col("n2")
    hh = F.col("f1") + F.col("f2")
    num = nn * F.col("f1") - F.col("n1") * hh
    term = F.round(
        F.col("h").cast("double")
        * num
        * num
        / (hh.cast("double") * (nn - hh)),
        9,
    ).cast("decimal(38,9)")
    fold = (
        cum.where(hh < nn)
        .groupBy("n1", "n2")
        .agg(
            F.sum(term).alias("sd"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
    )
    return fold.select(
        "n1",
        "n2",
        "n_terms",
        F.round(
            F.col("sd").cast("double")
            / (F.col("n1") * F.col("n2").cast("double")),
            6,
        ).alias("ad_a2"),
    )


# --------------------------------------------------------------------------
# Kuiper two-sample test (V = D+ + D−, exact integers)
# --------------------------------------------------------------------------
@register(
    "kuiper_two_sample",
    oracle=f"""
    WITH {_POOL_SQL},
    gaps AS (
        SELECT c.f1 * t.n2 - c.f2 * t.n1 AS d
        FROM cum c, tots t
    ),
    fold AS (
        SELECT GREATEST(CAST(MAX(d) AS BIGINT), 0) AS dplus,
               GREATEST(CAST(MAX(-d) AS BIGINT), 0) AS dminus
        FROM gaps
    )
    SELECT t.n1, t.n2, f.dplus AS dplus_scaled, f.dminus AS dminus_scaled,
           round((f.dplus + f.dminus)
                 / CAST(t.n1 * t.n2 AS DOUBLE), 9) AS v_stat
    FROM fold f, tots t
    """,
)
def kuiper_two_sample(spark, sf_dir):
    """Kuiper two-sample test: V = D⁺ + D⁻, the sum of the largest
    ECDF exceedance in EACH direction — equally sensitive across the
    whole support (KS's max|·| loses power near the tails) and the
    standard drift test for periodic domains (hour-of-day, phase)
    where the cut point of the CDF is arbitrary. Both extrema are
    exact cross-multiplied integers (the KS discipline); each is
    floored at 0 because sup(F−G) is never negative (the gap is 0 at
    −∞). One ranged-ECDF pass + one summary fold."""
    cum = _ecdf2(spark, sf_dir)
    d = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    fold = cum.groupBy("n1", "n2").agg(
        F.greatest(F.max(d).cast("bigint"), F.lit(0).cast("bigint")).alias(
            "dplus_scaled"
        ),
        F.greatest(
            F.max(-d).cast("bigint"), F.lit(0).cast("bigint")
        ).alias("dminus_scaled"),
    )
    return fold.select(
        "n1",
        "n2",
        "dplus_scaled",
        "dminus_scaled",
        F.round(
            (F.col("dplus_scaled") + F.col("dminus_scaled"))
            / (F.col("n1") * F.col("n2")).cast("double"),
            9,
        ).alias("v_stat"),
    )


# --------------------------------------------------------------------------
# Mood scale test (squared centered midranks)
# --------------------------------------------------------------------------
@register(
    "mood_scale_ranks",
    oracle="""
    WITH pool AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    ranked AS (
        SELECT g1,
               CAST(RANK() OVER (ORDER BY value) AS BIGINT) * 2
               + CAST(COUNT(*) OVER (PARTITION BY value) AS BIGINT) - 1
                   AS rank2
        FROM pool
    ),
    tots AS (
        SELECT CAST(SUM(g1) AS BIGINT) AS n1,
               CAST(SUM(1 - g1) AS BIGINT) AS n2
        FROM ranked
    ),
    fold AS (
        SELECT CAST(SUM(CASE WHEN g1 = 1
                        THEN (rank2 - (t.n1 + t.n2 + 1))
                             * (rank2 - (t.n1 + t.n2 + 1))
                        ELSE 0 END) AS BIGINT) AS t4
        FROM ranked, tots t
        GROUP BY t.n1, t.n2
    )
    SELECT t.n1, t.n2, f.t4,
           round(f.t4 / 4.0, 6) AS mood_t,
           round((f.t4 / 4.0
                  - t.n1 * (CAST(t.n1 + t.n2 AS DOUBLE)
                            * (t.n1 + t.n2) - 1) / 12.0)
                 / sqrt(t.n1 * CAST(t.n2 AS DOUBLE)
                        * (t.n1 + t.n2 + 1)
                        * (CAST(t.n1 + t.n2 AS DOUBLE)
                           * (t.n1 + t.n2) - 4) / 180.0), 6) + 0.0
               AS z_stat
    FROM fold f, tots t
    """,
)
def mood_scale_ranks(spark, sf_dir):
    """Mood's scale test (click vs purchase values): T = Σ over sample
    1 of (r̄ − (N+1)/2)² — squared deviation of each observation's
    midrank from the center, the rank test for DISPERSION differences
    (same median, different spread — the case Mann-Whitney can't see
    and Ansari-Bradley sees with linear scores; Mood's quadratic
    scores give it more tail weight). Centered midranks are exact
    half-integers: 2r̄ − (N+1) = rank2 − (N+1) is an exact integer, so
    T·4 is an exact BIGINT fold at any partitioning. The z-statistic
    uses the no-ties null moments E[T] = n1(N²−1)/12,
    Var[T] = n1·n2(N+1)(N²−4)/180 (documented convention; ties in the
    2-decimal value grid are sparse).

    Plan: the ranged global-midrank device (range partition + prefix
    offsets, the mann_whitney_u_values shape) + one integer fold."""
    e = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    pool = (
        e.select(
            "value",
            (F.col("event_type") == "click").cast("int").alias("g1"),
        )
        .repartitionByRange(8, F.col("value").asc())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = pool.groupBy("pid").agg(F.count(F.lit(1)).alias("pn"))
    offsets = prefix_offsets(counts, {"offset": "pn"})
    local_rank = F.rank().over(Window.partitionBy("pid").orderBy("value"))
    rank2 = (
        (local_rank.cast("bigint") + F.col("offset")) * 2
        + F.count(F.lit(1))
        .over(Window.partitionBy("pid", "value"))
        .cast("bigint")
        - 1
    )
    ranked = pool.join(F.broadcast(offsets), "pid").select(
        "g1", rank2.alias("rank2")
    )
    tots = ranked.agg(
        F.sum("g1").cast("bigint").alias("n1"),
        F.sum(1 - F.col("g1")).cast("bigint").alias("n2"),
    )
    nn1 = F.col("n1") + F.col("n2") + 1
    fold = (
        ranked.crossJoin(F.broadcast(tots))
        .groupBy("n1", "n2")
        .agg(
            F.sum(
                F.when(
                    F.col("g1") == 1,
                    (F.col("rank2") - nn1) * (F.col("rank2") - nn1),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("t4")
        )
    )
    nn = F.col("n1") + F.col("n2")
    e_t = (
        F.col("n1")
        * (nn.cast("double") * nn - 1)
        / 12.0
    )
    var_t = (
        F.col("n1")
        * F.col("n2").cast("double")
        * (nn + 1)
        * (nn.cast("double") * nn - 4)
        / 180.0
    )
    return fold.select(
        "n1",
        "n2",
        "t4",
        F.round(F.col("t4") / 4.0, 6).alias("mood_t"),
        (
            F.round((F.col("t4") / 4.0 - e_t) / F.sqrt(var_t), 6) + 0.0
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Robust shape panel: Bowley skewness + Moors kurtosis from octiles
# --------------------------------------------------------------------------
@register(
    "quantile_shape_panel",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 6) AS median,
           round(quantile_cont(value, 0.75)
                 - quantile_cont(value, 0.25), 6) AS iqr,
           round((quantile_cont(value, 0.75)
                  - 2 * quantile_cont(value, 0.5)
                  + quantile_cont(value, 0.25))
                 / (quantile_cont(value, 0.75)
                    - quantile_cont(value, 0.25)), 6) + 0.0
               AS bowley_skew,
           round(((quantile_cont(value, 0.875)
                   - quantile_cont(value, 0.625))
                  + (quantile_cont(value, 0.375)
                     - quantile_cont(value, 0.125)))
                 / (quantile_cont(value, 0.75)
                    - quantile_cont(value, 0.25)), 6) AS moors_kurt
    FROM events GROUP BY event_type
    """,
)
def quantile_shape_panel(spark, sf_dir):
    """Quantile-based distribution-shape panel per event type: Bowley
    skewness (Q3 − 2·median + Q1)/IQR and Moors kurtosis
    ((E7−E5)+(E3−E1))/IQR from octiles — the OUTLIER-PROOF skew and
    tail-weight measures (moment-based skewness/kurtosis explode on a
    single contaminated point; quantile versions have a 25% breakdown
    point). The monitoring view a value-distribution drift alert
    should be built on, next to the moment panel it complements
    (stats_moments_by_flag).

    Exactness: Spark's exact ``percentile`` aggregate and DuckDB's
    ``quantile_cont`` share the same linear interpolation on (n−1)·p
    (the weighted_price_quantiles precedent); all shape ratios are
    per-group scalar expressions, rounded, with ``+ 0.0`` on Bowley
    whose sign is free. Plan: one hash agg per type — percentile is
    the only per-group sort, over values of one event type."""
    e = t(spark, sf_dir, "events")
    q = {
        p: F.expr(f"percentile(value, {p})")
        for p in (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)
    }
    iqr = q[0.75] - q[0.25]
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(q[0.5], 6).alias("median"),
        F.round(iqr, 6).alias("iqr"),
        (
            F.round((q[0.75] - 2 * q[0.5] + q[0.25]) / iqr, 6) + 0.0
        ).alias("bowley_skew"),
        F.round(
            ((q[0.875] - q[0.625]) + (q[0.375] - q[0.125])) / iqr, 6
        ).alias("moors_kurt"),
    )
