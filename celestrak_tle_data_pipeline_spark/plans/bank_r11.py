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


# --------------------------------------------------------------------------
# shared: day-grain orders revenue in exact cents (the round10 device)
# --------------------------------------------------------------------------
_DAILY_SQL = """
    daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    )
"""


def _daily(spark, sf_dir):
    """Orders rolled to day grain: (d, y cents) — exact integers; the
    calendar frame (~2.4k rows at any SF) every series query below
    rides (domain-bounded: constant in data volume)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.unix_micros("o_orderdate") / 86_400_000_000)
            .cast("bigint")
            .alias("d")
        )
        .agg(
            (F.sum(dec("o_totalprice", 18, 2)) * 100)
            .cast("bigint")
            .alias("y")
        )
    )


# --------------------------------------------------------------------------
# Sample entropy of the daily revenue series (m=2, integer tolerance)
# --------------------------------------------------------------------------
@register(
    "sample_entropy_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    tol AS (
        SELECT CAST(floor(0.2 * sqrt(
                   CAST(COUNT(*) * SUM(CAST(y AS DECIMAL(38,0)) * y)
                        - SUM(CAST(y AS DECIMAL(38,0)))
                          * SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
                   / (COUNT(*) * CAST(COUNT(*) - 1 AS DOUBLE))))
               AS BIGINT) AS r
        FROM daily
    ),
    t2 AS (
        SELECT a.d, a.y AS y0, b.y AS y1, c.y AS y2
        FROM daily a
        JOIN daily b ON b.d = a.d + 1
        LEFT JOIN daily c ON c.d = a.d + 2
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN ABS(i.y0 - j.y0) <= r.r
                              AND ABS(i.y1 - j.y1) <= r.r
                         THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs,
               CAST(SUM(CASE WHEN ABS(i.y0 - j.y0) <= r.r
                              AND ABS(i.y1 - j.y1) <= r.r
                              AND i.y2 IS NOT NULL AND j.y2 IS NOT NULL
                              AND ABS(i.y2 - j.y2) <= r.r
                         THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs
        FROM t2 i JOIN t2 j ON i.d < j.d, tol r
        GROUP BY r.r
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           r.r AS r_cents, p.b_pairs, p.a_pairs,
           round(-ln(p.a_pairs / CAST(p.b_pairs AS DOUBLE)), 6)
               AS sampen
    FROM pairs p, tol r
    """,
)
def sample_entropy_daily(spark, sf_dir):
    """Sample entropy (SampEn, m=2) of the daily-revenue series — the
    regularity/complexity measure: −ln(A/B) where B counts day pairs
    whose 2-day templates match within tolerance r and A counts those
    whose 3-day extensions still match. Low SampEn = repetitive,
    predictable dynamics; high = noise. The anomaly-monitoring
    complement to the spectral/ACF views (a regime change moves SampEn
    before it moves the mean).

    Determinism: the series is exact integer cents; the tolerance is
    an INTEGER — r = floor(0.2·sd), sd from exact integer power sums
    (n·Σy² − (Σy)² as DECIMAL(38,0), one double sqrt at the end) — so
    every template comparison is integer-exact. Templates use calendar
    lags (d+1, d+2 must exist); the template self-join is over the
    day-grain frame only (domain-bounded ~2.4k rows — pair count is a
    calendar constant, NOT data-volume-scaled; at 100 TB the fact scan
    still reduces to the same 2.4k-row frame first)."""
    daily = _daily(spark, sf_dir).persist()
    tol = daily.agg(
        F.floor(
            0.2
            * F.sqrt(
                (
                    F.count(F.lit(1))
                    * F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
                    - F.sum(F.col("y").cast("decimal(38,0)"))
                    * F.sum(F.col("y").cast("decimal(38,0)"))
                ).cast("double")
                / (
                    F.count(F.lit(1))
                    * (F.count(F.lit(1)) - 1).cast("double")
                )
            )
        )
        .cast("bigint")
        .alias("r")
    )
    b1 = daily.select(
        (F.col("d") - 1).alias("d"), F.col("y").alias("y1")
    )
    c2 = daily.select(
        (F.col("d") - 2).alias("d"), F.col("y").alias("y2")
    )
    t2 = (
        daily.withColumnRenamed("y", "y0")
        .join(b1, "d")
        .join(c2, "d", "left")
        .crossJoin(F.broadcast(tol))
    )
    i = t2.select(
        F.col("d").alias("di"),
        F.col("y0").alias("i0"),
        F.col("y1").alias("i1"),
        F.col("y2").alias("i2"),
        "r",
    )
    j = t2.select(
        F.col("d").alias("dj"),
        F.col("y0").alias("j0"),
        F.col("y1").alias("j1"),
        F.col("y2").alias("j2"),
    )
    m2 = (F.abs(F.col("i0") - F.col("j0")) <= F.col("r")) & (
        F.abs(F.col("i1") - F.col("j1")) <= F.col("r")
    )
    m3 = (
        m2
        & F.col("i2").isNotNull()
        & F.col("j2").isNotNull()
        & (F.abs(F.col("i2") - F.col("j2")) <= F.col("r"))
    )
    pairs = (
        i.join(j, F.col("di") < F.col("dj"))
        .groupBy("r")
        .agg(
            F.sum(m2.cast("long")).cast("bigint").alias("b_pairs"),
            F.sum(m3.cast("long")).cast("bigint").alias("a_pairs"),
        )
    )
    n_days = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        pairs.crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            F.col("r").alias("r_cents"),
            "b_pairs",
            "a_pairs",
            F.round(
                -F.log(
                    F.col("a_pairs") / F.col("b_pairs").cast("double")
                ),
                6,
            ).alias("sampen"),
        )
    )


# --------------------------------------------------------------------------
# Permutation entropy (Bandt-Pompe, m=3) of the daily revenue series
# --------------------------------------------------------------------------
@register(
    "permutation_entropy_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    w AS (
        SELECT a.y AS v0, b.y AS v1, c.y AS v2
        FROM daily a
        JOIN daily b ON b.d = a.d + 1
        JOIN daily c ON c.d = a.d + 2
    ),
    pat AS (
        SELECT CASE
            WHEN v0 <= v1 AND v1 <= v2 THEN '012'
            WHEN v0 <= v2 AND v2 < v1  THEN '021'
            WHEN v1 < v0  AND v0 <= v2 THEN '102'
            WHEN v2 < v0  AND v0 <= v1 THEN '120'
            WHEN v1 <= v2 AND v2 < v0  THEN '201'
            ELSE '210' END AS pattern
        FROM w
    ),
    cnt AS (
        SELECT pattern, CAST(COUNT(*) AS BIGINT) AS c FROM pat GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
    h AS (
        SELECT CAST(SUM(CAST(round(c / CAST(t.n AS DOUBLE)
                                   * ln(c / CAST(t.n AS DOUBLE)), 12)
                        AS DECIMAL(38,12))) AS DOUBLE) AS hneg
        FROM cnt, tot t
    )
    SELECT c.pattern, c.c AS n_windows,
           round(c.c / CAST(t.n AS DOUBLE), 6) AS share,
           round(-h.hneg, 6) AS perm_entropy,
           round(-h.hneg / ln(6), 6) AS perm_entropy_norm
    FROM cnt c, tot t, h
    """,
)
def permutation_entropy_daily(spark, sf_dir):
    """Bandt-Pompe permutation entropy (order m=3) of daily revenue:
    classify every 3 consecutive calendar days by the ORDINAL pattern
    of their values (6 possible orderings, ties broken toward the
    earlier day — the Bandt-Pompe stable-sort convention, expressed as
    <=/< comparisons on exact cents), then the Shannon entropy of the
    pattern distribution. A pure trend shows only '012'/'210';
    white noise shows all six equally (entropy → ln 6). The
    complexity view that is invariant to any monotone transform of
    the values — robust where SampEn's amplitude tolerance is not.

    Output: one row per observed pattern with its count and share,
    plus the (identical-per-row) entropy and ln(6)-normalized entropy.
    Counts are exact; the ≤6 p·ln p terms round to 12 before the
    DECIMAL fold. Plan: two calendar lag joins + one 6-cell rollup."""
    daily = _daily(spark, sf_dir)
    b1 = daily.select((F.col("d") - 1).alias("d"), F.col("y").alias("v1"))
    c2 = daily.select((F.col("d") - 2).alias("d"), F.col("y").alias("v2"))
    w = (
        daily.withColumnRenamed("y", "v0")
        .join(b1, "d")
        .join(c2, "d")
    )
    v0, v1, v2 = F.col("v0"), F.col("v1"), F.col("v2")
    pattern = (
        F.when((v0 <= v1) & (v1 <= v2), "012")
        .when((v0 <= v2) & (v2 < v1), "021")
        .when((v1 < v0) & (v0 <= v2), "102")
        .when((v2 < v0) & (v0 <= v1), "120")
        .when((v1 <= v2) & (v2 < v0), "201")
        .otherwise("210")
    )
    cnt = w.groupBy(pattern.alias("pattern")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot_n = cnt.agg(F.sum("c").cast("bigint").alias("n"))
    h = (
        cnt.crossJoin(F.broadcast(tot_n))
        .agg(
            F.sum(
                F.round(
                    F.col("c")
                    / F.col("n").cast("double")
                    * F.log(F.col("c") / F.col("n").cast("double")),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("hneg")
        )
    )
    return (
        cnt.crossJoin(F.broadcast(tot_n))
        .crossJoin(F.broadcast(h))
        .select(
            "pattern",
            F.col("c").alias("n_windows"),
            F.round(F.col("c") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
            F.round(-F.col("hneg"), 6).alias("perm_entropy"),
            F.round(-F.col("hneg") / F.log(F.lit(6.0)), 6).alias(
                "perm_entropy_norm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test on daily log revenue (q = 5)
# --------------------------------------------------------------------------
@register(
    "variance_ratio_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    x AS (
        SELECT d, CAST(round(ln(y), 9) AS DECIMAL(18,9)) AS x FROM daily
    ),
    d1 AS (
        SELECT b.x - a.x AS dx FROM x a JOIN x b ON b.d = a.d + 1
    ),
    dq AS (
        SELECT b.x - a.x AS dx FROM x a JOIN x b ON b.d = a.d + 5
    ),
    m1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dx) AS DECIMAL(38,9)) AS s,
               CAST(SUM(dx * dx) AS DECIMAL(38,18)) AS q
        FROM d1
    ),
    mq AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dx) AS DECIMAL(38,9)) AS s,
               CAST(SUM(dx * dx) AS DECIMAL(38,18)) AS q
        FROM dq
    ),
    v AS (
        SELECT m1.n AS n1, mq.n AS nq,
               (CAST(m1.q AS DOUBLE)
                - CAST(m1.s AS DOUBLE) * CAST(m1.s AS DOUBLE) / m1.n)
               / (m1.n - 1) AS var1,
               (CAST(mq.q AS DOUBLE)
                - CAST(mq.s AS DOUBLE) * CAST(mq.s AS DOUBLE) / mq.n)
               / (mq.n - 1) AS varq
        FROM m1, mq
    )
    SELECT n1, nq,
           round(var1, 9) AS var_1d,
           round(varq, 9) AS var_5d,
           round(varq / (5 * var1), 6) AS vr_5,
           round((varq / (5 * var1) - 1)
                 / sqrt(2.0 * (2 * 5 - 1) * (5 - 1)
                        / (3.0 * 5 * nq)), 6) + 0.0 AS z_iid
    FROM v
    """,
)
def variance_ratio_daily(spark, sf_dir):
    """Lo-MacKinlay variance-ratio test (q = 5) on daily log revenue:
    under a random walk, the variance of 5-day log changes is exactly
    5x the variance of 1-day changes — VR(5) ≈ 1. VR < 1 flags mean
    reversion (negative serial correlation), VR > 1 momentum/trending.
    The series-diagnostics complement to the unit-root pair
    (dickey_fuller / kpss): those test the LEVEL's persistence, VR
    tests the INCREMENTS' aggregation law. z uses the iid null
    (documented convention; the heteroscedastic-robust correction
    needs per-lag fourth moments).

    Determinism: per-day ln rounds to 9 and every sum/power-sum is an
    exact DECIMAL fold of those rounded values; the two variances
    combine in doubles in the same operation order in both engines.
    Plan: day rollup + two calendar lag joins (d+1, d+5) + two scalar
    folds — all on the bounded day frame."""
    daily = _daily(spark, sf_dir)
    x = daily.select(
        "d", F.round(F.log("y"), 9).cast("decimal(18,9)").alias("x")
    ).persist()

    def _diff_moments(lag):
        b = x.select((F.col("d") - lag).alias("d"), F.col("x").alias("xb"))
        dx = x.join(b, "d").select((F.col("xb") - F.col("x")).alias("dx"))
        return dx.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dx").cast("decimal(38,9)").alias("s"),
            F.sum(F.col("dx") * F.col("dx"))
            .cast("decimal(38,18)")
            .alias("q"),
        )

    m1 = _diff_moments(1).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("q").alias("q1")
    )
    mq = _diff_moments(5).select(
        F.col("n").alias("nq"), F.col("s").alias("sq"), F.col("q").alias("qq")
    )
    var1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
    ) / (F.col("n1") - 1)
    varq = (
        F.col("qq").cast("double")
        - F.col("sq").cast("double") * F.col("sq").cast("double") / F.col("nq")
    ) / (F.col("nq") - 1)
    vr = varq / (5 * var1)
    return m1.crossJoin(F.broadcast(mq)).select(
        "n1",
        "nq",
        F.round(var1, 9).alias("var_1d"),
        F.round(varq, 9).alias("var_5d"),
        F.round(vr, 6).alias("vr_5"),
        (
            F.round(
                (vr - 1)
                / F.sqrt(
                    2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5 * F.col("nq"))
                ),
                6,
            )
            + 0.0
        ).alias("z_iid"),
    )


# --------------------------------------------------------------------------
# Empirical variogram / madogram of daily revenue (lags 1..14)
# --------------------------------------------------------------------------
@register(
    "variogram_daily_lags",
    oracle=f"""
    WITH {_DAILY_SQL},
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                   AS q
        FROM daily
    ),
    pairs AS (
        SELECT b.d - a.d AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CAST(b.y - a.y AS DECIMAL(38,0))
                        * (b.y - a.y)) AS DECIMAL(38,0)) AS ss,
               CAST(SUM(ABS(CAST(b.y - a.y AS DECIMAL(38,0))))
                   AS DECIMAL(38,0)) AS sa
        FROM daily a JOIN daily b
          ON b.d - a.d BETWEEN 1 AND 14
        GROUP BY 1
    )
    SELECT p.lag, p.n_pairs,
           round(CAST(p.ss AS DOUBLE) / (2 * p.n_pairs) / 1e16, 6)
               AS gamma_mdollars2,
           round(CAST(p.sa AS DOUBLE) / (2 * p.n_pairs) / 100.0, 4)
               AS madogram_dollars,
           round(CAST(p.ss AS DOUBLE) / (2 * p.n_pairs)
                 / ((CAST(m.q AS DOUBLE)
                     - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
                    / (m.n - 1)), 6) AS gamma_over_var
    FROM pairs p, mom m
    """,
)
def variogram_daily_lags(spark, sf_dir):
    """Empirical semivariogram γ(h) = Σ(y_{d+h} − y_d)²/(2·N_h) of
    daily revenue for lags 1–14, with the robust madogram
    (mean |Δ|/2) and the sill-normalized ratio γ(h)/s² (γ reported in
    (million dollars)² so the rounded magnitude stays far inside
    double precision at any SF — a raw cents² γ overflows stable
    rounding, the DECIMAL->DOUBLE gotcha class) — the
    geostatistics view of temporal structure: γ rises toward the sill
    (sample variance) as autocorrelation dies; a γ/s² plateau below 1
    reveals periodicity (the 7-day dip shows weekly seasonality
    directly). The madogram column is the outlier-resistant twin.

    All pair sums are exact DECIMAL(38,0) integer folds of cents;
    each lag divides once. Plan: one banded self-join on the bounded
    day frame (14 lags x ~2.4k days — a calendar constant), one
    grouped fold, one broadcast variance frame."""
    daily = _daily(spark, sf_dir).persist()
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)").alias(
            "s"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    a = daily.select(
        "d", "y", F.explode(F.sequence(F.lit(1), F.lit(14))).alias("lag")
    )
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    diff = F.col("yb") - F.col("y")
    pairs = (
        a.join(b, F.col("db") == F.col("d") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(diff.cast("decimal(38,0)") * diff)
            .cast("decimal(38,0)")
            .alias("ss"),
            F.sum(F.abs(diff.cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias("sa"),
        )
    )
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    gamma = F.col("ss").cast("double") / (2 * F.col("n_pairs"))
    return pairs.crossJoin(F.broadcast(mom)).select(
        "lag",
        "n_pairs",
        F.round(gamma / 1e16, 6).alias("gamma_mdollars2"),
        F.round(
            F.col("sa").cast("double") / (2 * F.col("n_pairs")) / 100.0, 4
        ).alias("madogram_dollars"),
        F.round(gamma / var, 6).alias("gamma_over_var"),
    )


# --------------------------------------------------------------------------
# GPD peaks-over-threshold fit by probability-weighted moments
# --------------------------------------------------------------------------
@register(
    "pot_gpd_pwm_fit",
    oracle=f"""
    WITH {_DAILY_SQL},
    thr AS (
        SELECT CAST(round(quantile_cont(y, 0.9), 1) AS DECIMAL(38,1)) AS u,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily
    ),
    exc AS (
        SELECT d.d, CAST(d.y AS DECIMAL(38,1)) - t.u AS e
        FROM daily d, thr t WHERE CAST(d.y AS DECIMAL(38,1)) > t.u
    ),
    rk AS (
        SELECT a.e,
               CAST(1 + COUNT(CASE WHEN b.e < a.e
                              OR (b.e = a.e AND b.d < a.d)
                              THEN 1 END) AS BIGINT) AS r
        FROM exc a LEFT JOIN exc b
          ON b.e < a.e OR (b.e = a.e AND b.d < a.d)
        GROUP BY a.e, a.d
    ),
    pwm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(e) AS DECIMAL(38,1)) AS se,
               CAST(SUM((
                   SELECT CAST(MAX(m2.m) AS BIGINT)
                   FROM (SELECT COUNT(*) AS m FROM rk) m2
               ) * e - r * e) AS DECIMAL(38,1)) AS swd
        FROM rk
    ),
    fit AS (
        SELECT m,
               CAST(se AS DOUBLE) / m AS a0,
               CAST(swd AS DOUBLE) / (CAST(m AS DOUBLE) * (m - 1)) AS a1
        FROM pwm
    )
    SELECT t.n_days, f.m AS n_exceed,
           round(CAST(t.u AS DOUBLE) / 100.0, 2) AS u_dollars,
           round(f.a0 / 100.0, 2) AS mean_excess_dollars,
           round(2.0 - f.a0 / (f.a0 - 2 * f.a1), 6) + 0.0 AS xi_shape,
           round(2.0 * f.a0 * f.a1 / (f.a0 - 2 * f.a1) / 100.0, 2)
               AS sigma_dollars
    FROM fit f, thr t
    """,
)
def pot_gpd_pwm_fit(spark, sf_dir):
    """Peaks-over-threshold extreme-value fit: daily revenues above
    the 90th percentile, fitted to a Generalized Pareto by
    probability-weighted moments (Hosking-Wallis 1987) — a₀ = mean
    excess, a₁ = (1/(m(m−1)))·Σ(m−rᵢ)·e₍ᵢ₎ with ascending ranks, then
    ξ = 2 − a₀/(a₀−2a₁) and σ = 2a₀a₁/(a₀−2a₁). ξ > 0 means
    heavy-tailed peak risk (no exponential moment); ξ < 0 a bounded
    tail. The tail-risk calibration view next to hill_tail_exponent
    (which needs a log-scale regime) and gumbel_block_maxima (which
    wastes all non-maximal extremes POT keeps).

    Determinism: the threshold is quantile_cont/percentile (shared
    interpolation, the weighted_price_quantiles precedent) rounded to
    one decimal — exact, because the interpolation fraction at p=0.9
    is always a multiple of 0.1 on an integer-cents grid. Excesses are
    exact DECIMAL(38,1); ranks are unique under the (e, d) total
    order via a triangular join on the excess frame (~10% of the
    bounded day grid — a calendar constant); both PWMs are exact
    decimal folds with single final divisions."""
    daily = _daily(spark, sf_dir)
    thr = daily.agg(
        F.round(F.expr("percentile(y, 0.9)"), 1)
        .cast("decimal(38,1)")
        .alias("u"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    exc = (
        daily.crossJoin(F.broadcast(thr))
        .where(F.col("y").cast("decimal(38,1)") > F.col("u"))
        .select("d", (F.col("y").cast("decimal(38,1)") - F.col("u")).alias("e"))
        .persist()
    )
    b = exc.select(F.col("d").alias("db"), F.col("e").alias("eb"))
    rk = (
        exc.join(
            b,
            (F.col("eb") < F.col("e"))
            | ((F.col("eb") == F.col("e")) & (F.col("db") < F.col("d"))),
            "left",
        )
        .groupBy("d", "e")
        .agg((1 + F.count("db")).cast("bigint").alias("r"))
    )
    m_tot = exc.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    pwm = (
        rk.crossJoin(F.broadcast(m_tot))
        .agg(
            F.max("m").alias("m"),
            F.sum("e").cast("decimal(38,1)").alias("se"),
            F.sum((F.col("m") - F.col("r")) * F.col("e"))
            .cast("decimal(38,1)")
            .alias("swd"),
        )
    )
    a0 = F.col("se").cast("double") / F.col("m")
    a1 = F.col("swd").cast("double") / (
        F.col("m").cast("double") * (F.col("m") - 1)
    )
    return pwm.crossJoin(F.broadcast(thr)).select(
        "n_days",
        F.col("m").alias("n_exceed"),
        F.round(F.col("u").cast("double") / 100.0, 2).alias("u_dollars"),
        F.round(a0 / 100.0, 2).alias("mean_excess_dollars"),
        (F.round(2.0 - a0 / (a0 - 2 * a1), 6) + 0.0).alias("xi_shape"),
        F.round(2.0 * a0 * a1 / (a0 - 2 * a1) / 100.0, 2).alias(
            "sigma_dollars"
        ),
    )
