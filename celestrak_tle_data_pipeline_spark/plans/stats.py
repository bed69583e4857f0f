"""Advanced aggregate / window / set-op coverage (SURVEY.md §2.5, §2.7):
cube, grouping sets, statistical moments, distinct counting, ntile/lead,
range (theta) joins, bag set-ops.

Determinism discipline (plans/__init__ contract): every double-valued
aggregate is reconstructed from *exact decimal power sums* (Σx, Σx²,
Σxy — order-independent by construction) with the final floating-point
arithmetic written in the same operation order in both engines. Native
single-pass stddev/corr implementations are NOT used in oracle-gated
queries — their merge order varies by partitioning, so their low bits
are not reproducible. The approximate-by-design sketches
(approx_count_distinct, percentile_approx) carry self-certifying
error-bound gates: the query returns exact companions plus a boolean
asserting the sketch met its own contract, and the oracle expects
TRUE — an out-of-bound estimate fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import register
from .common import dec, dsum, t


# --------------------------------------------------------------------------
# CUBE with grouping ids (§2.5)
# --------------------------------------------------------------------------
@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf_dir):
    """Full CUBE over (status, priority) with grouping_id to tell
    roll-up NULLs from data NULLs. Partial-aggregable; the cube factor
    (4 grouping sets) multiplies map-side output, not the scan."""
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS (§2.5)
# --------------------------------------------------------------------------
@register(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_status_priority(spark, sf_dir):
    """Explicit GROUPING SETS — the two marginals plus the grand total,
    without the full cube's cross products."""
    o = t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# statistical moments from exact power sums (§2.5)
# --------------------------------------------------------------------------
@register(
    "stats_moments_by_flag",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                        * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(sx / n, 9) AS avg_qty,
           round((n * sxx - sx * sx) / (n * (n - 1.0)), 9) AS var_qty,
           round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 9)
               AS stddev_qty,
           round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
             AS corr_qty_price
    FROM s
    """,
)
def stats_moments_by_flag(spark, sf_dir):
    """Sample variance / stddev / Pearson correlation per return flag,
    rebuilt from exact decimal power sums so the result is identical on
    any partitioning (native one-pass stddev/corr merge order is not).
    Single scan, single shuffle of 5 power sums per group."""
    l = t(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    p = dec("l_extendedprice", 14, 2)
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy = F.col("sy"), F.col("syy")
    sxy = F.col("sxy")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    # rounded to 9 decimals in BOTH engines: the decimal->double cast of
    # large power sums can differ by 1 ulp between JVM BigDecimal and
    # DuckDB int128 conversion (observed at sf0.001).
    return s.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 9).alias("avg_qty"),
        F.round(var, 9).alias("var_qty"),
        F.round(F.sqrt(var), 9).alias("stddev_qty"),
        F.round(corr, 9).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# exact + approximate distinct counting (§2.5)
# --------------------------------------------------------------------------
@register(
    "distinct_part_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_part_counts(spark, sf_dir):
    """Exact multi-column COUNT(DISTINCT) — Spark expands to one
    aggregate per distinct column (expand + two-phase agg), still one
    scan."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_distinct_hll",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_hll(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the 100 TB path for
    distinct counting — fixed-size sketch, mergeable, no expand. The
    estimate itself is engine-specific by design, so the value check is
    a SELF-CERTIFYING error-bound gate: the query returns the exact
    count plus a boolean asserting |approx − exact| ≤ 3·rsd·exact
    (measured error at rsd=0.02 is ~1%, so the 6% gate has margin but
    still catches a broken sketch); the oracle expects TRUE, so an
    out-of-bound estimate flips the row and fails the hash — the same
    protocol as the LSH recall gates."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.countDistinct("l_partkey")
            ).cast("double")
            <= F.lit(0.06) * F.countDistinct("l_partkey").cast("double")
        ).alias("within_3rsd"),
    )


# --------------------------------------------------------------------------
# ntile / lead / lag windows (§2.7)
# --------------------------------------------------------------------------
@register(
    "ntile_lead_lag_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           lead(o_totalprice) OVER w AS next_price,
           lag(o_totalprice)  OVER w AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def ntile_lead_lag_orders(spark, sf_dir):
    """ntile/lead/lag over a total order (date + key tiebreak — window
    determinism contract). One shuffle on the partition key, linear
    in-partition work."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# --------------------------------------------------------------------------
# range (theta) join (§2.4 J-family extension)
# --------------------------------------------------------------------------
@register(
    "range_band_join",
    oracle="""
    WITH bands AS (
        SELECT unnest(generate_series(0, 5)) AS band
    )
    SELECT b.band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS band_total
    FROM orders o
    JOIN bands b
      ON o.o_totalprice >= b.band * 100000.0
     AND o.o_totalprice <  (b.band + 1) * 100000.0
    GROUP BY b.band
    """,
)
def range_band_join(spark, sf_dir):
    """Range/theta join: orders matched into price bands by interval
    containment. The band side is 6 rows → broadcast nested-loop with
    the range predicate evaluated in codegen; at scale the same shape
    handles calendar/SLA-window joins (small interval dim × huge
    fact)."""
    o = t(spark, sf_dir, "orders")
    bands = spark.range(0, 6).select(F.col("id").cast("bigint").alias("band"))
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("band") * 100000.0)
            & (F.col("o_totalprice") < (F.col("band") + 1) * 100000.0),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("band_total"),
        )
    )


# --------------------------------------------------------------------------
# bag semantics set-ops (§2.7 — set_ops_nations covers the distinct kind)
# --------------------------------------------------------------------------
@register(
    "bag_set_ops",
    oracle="""
    SELECT 'intersect_all' AS op, x.n FROM (
        SELECT c_nationkey AS n FROM customer
        INTERSECT ALL SELECT s_nationkey AS n FROM supplier) x
    UNION ALL
    SELECT 'except_all' AS op, y.n FROM (
        SELECT s_nationkey AS n FROM supplier
        EXCEPT ALL SELECT c_nationkey AS n FROM customer) y
    """,
)
def bag_set_ops(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL — multiplicity-preserving set ops
    (min/ difference of per-key counts), complementing the distinct
    variants in set_ops_nations."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    ia = c.intersectAll(s).select(F.lit("intersect_all").alias("op"), "n")
    ea = s.exceptAll(c).select(F.lit("except_all").alias("op"), "n")
    return ia.unionAll(ea)


# --------------------------------------------------------------------------
# skew-resistant two-phase aggregation (X5 scale technique, oracle-gated)
# --------------------------------------------------------------------------
@register(
    "salted_heavy_hitters",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_spend
    FROM orders
    GROUP BY o_custkey
    QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, o_custkey) <= 20
    """,
)
def salted_heavy_hitters(spark, sf_dir):
    """Heavy-hitter customers via explicit two-phase salted
    aggregation: phase 1 aggregates on (key, salt=orderkey%8) — a hot
    key's rows land on 8 different reducers — phase 2 merges the 8
    partials per key. For plain count/sum Spark's map-side partial agg
    already defuses skew (this query exists to keep the pattern under
    the correctness gate); the salt becomes load-bearing when the agg
    state doesn't partial-combine (collect_list, exact distinct) on a
    skewed key. Result is identical to the direct groupBy by
    construction."""
    o = t(spark, sf_dir, "orders")
    phase1 = (
        o.withColumn("salt", (F.col("o_orderkey") % 8).cast("int"))
        .groupBy("o_custkey", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(dec("o_totalprice")).alias("psum"),
        )
    )
    phase2 = phase1.groupBy("o_custkey").agg(
        F.sum("pn").alias("n_orders"),
        F.sum("psum").cast("double").alias("total_spend"),
    )
    w = Window.orderBy(F.desc("n_orders"), F.asc("o_custkey"))
    return (
        phase2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# exact percentiles / median (§2.5)
# --------------------------------------------------------------------------
@register(
    "percentile_quartiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS q1,
           median(o_totalprice) AS med,
           quantile_cont(o_totalprice, 0.75) AS q3,
           quantile_cont(o_totalprice, 0.75)
             - quantile_cont(o_totalprice, 0.25) AS iqr
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_quartiles(spark, sf_dir):
    """Exact continuous-interpolation quartiles + IQR per status —
    Spark's exact `percentile` matches DuckDB's quantile_cont
    bit-for-bit (verified at %.17g). Exact percentile sorts within
    the aggregation buffer; the approximate scale path for heavy
    groups is percentile_approx (a KLL-style sketch, engine-specific
    like the HLL twin)."""
    o = t(spark, sf_dir, "orders")
    q1 = F.expr("percentile(o_totalprice, 0.25)")
    q3 = F.expr("percentile(o_totalprice, 0.75)")
    return o.groupBy("o_orderstatus").agg(
        q1.alias("q1"),
        F.median("o_totalprice").alias("med"),
        q3.alias("q3"),
        (q3 - q1).alias("iqr"),
    )


# --------------------------------------------------------------------------
# approximate quantile with a rank-tolerance gate (§2.5 scale path)
# --------------------------------------------------------------------------
@register(
    "approx_quantile_bounds",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_rank_tol
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_quantile_bounds(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch, accuracy=1000): the
    mergeable quantile path heavy groups use at 100 TB. The sketch
    value is engine-specific, so — like approx_distinct_hll — the gate
    is SELF-CERTIFYING against the sketch's own contract: the rank of
    the returned approximate median must sit within eps·n of n/2
    (eps = 1/accuracy, widened 4x for safety; measured slack is far
    smaller). The rank is recomputed exactly with a conditional count
    against a broadcast of the per-group sketch outputs; the oracle
    expects TRUE, so a sketch whose error exceeds its contract fails
    the value hash."""
    o = t(spark, sf_dir, "orders")
    ap = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("apx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    joined = o.select("o_orderstatus", "o_totalprice").join(
        F.broadcast(ap), "o_orderstatus"
    )
    agg = joined.groupBy("o_orderstatus").agg(
        F.first("n_rows").alias("n_rows"),
        F.sum((F.col("o_totalprice") <= F.col("apx")).cast("bigint"))
        .cast("double")
        .alias("rank_apx"),
    )
    n = F.col("n_rows").cast("double")
    tol = F.greatest(F.lit(1.0), n * F.lit(4.0 / 1000.0))
    return agg.select(
        "o_orderstatus",
        "n_rows",
        (F.abs(F.col("rank_apx") - n / F.lit(2.0)) <= tol).alias(
            "within_rank_tol"
        ),
    )


# --------------------------------------------------------------------------
# robust outlier filter: median absolute deviation per entity
# --------------------------------------------------------------------------
@register(
    "mad_outlier_filter",
    oracle="""
    WITH m AS (
        SELECT user_id, median(value) AS med
        FROM events GROUP BY user_id
    ),
    dev AS (
        SELECT e.user_id, e.event_id, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN m USING (user_id)
    ),
    mad AS (
        SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN abs(d.value - d.med) > 6.0 * t.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad t USING (user_id)
    GROUP BY d.user_id
    """,
)
def mad_outlier_filter(spark, sf_dir):
    """Robust per-entity outlier detection (the telemetry-cleaning step
    before decay analysis): median + median-absolute-deviation per
    entity, flag |x − med| > 6·MAD. Medians are exact (Spark
    ``median`` = DuckDB ``median``, both continuous-interpolation —
    bit-equal, proven by percentile_quartiles); the deviations are
    plain double subtractions of identical operands, so the flags are
    deterministic.

    Scale shape: two grouped aggregations on the entity key and two
    broadcast joins of tiny per-entity statistics back onto the scan —
    the fact rows shuffle once (same key both aggs; Catalyst reuses
    the partitioning)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = e.groupBy("user_id").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(6.0) * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# approx_top_k under-capacity exactness gate (§2.5 sketch family)
# --------------------------------------------------------------------------
@register(
    "approx_topk_events",
    oracle="""
    SELECT event_type, COUNT(*) AS est_n, COUNT(*) AS exact_n, TRUE AS ok
    FROM events GROUP BY event_type
    """,
)
def approx_topk_events(spark, sf_dir):
    """Frequent-items sketch (``approx_top_k``) under its exactness
    contract: with maxItemsTracked (10000) >= the column's distinct
    count, the sketch degenerates to exact counting — so the estimate
    joined against the exact per-key counts must agree row-for-row,
    and the oracle simply expects the exact counts with ok=TRUE. Same
    self-certifying pattern as approx_distinct_hll: an estimate that
    violates the sketch's own contract fails the value hash.

    Scale shape: the sketch side is a single-pass partial-aggregable
    accumulator (one bounded map per task, merged once — no per-key
    shuffle); the exact side shuffles 5 partial counts. At 100 TB with
    high-cardinality keys you keep ONLY the sketch side and size
    maxItemsTracked to the memory budget; the join here is the gate,
    not the production shape.
    """
    e = t(spark, sf_dir, "events")
    sk = e.select(
        F.expr("inline(approx_top_k(event_type, 5, 10000))")
    ).select(F.col("item").alias("event_type"), F.col("count").alias("est_n"))
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    return sk.join(exact, "event_type").select(
        "event_type",
        "est_n",
        "exact_n",
        (F.col("est_n") == F.col("exact_n")).alias("ok"),
    )


# --------------------------------------------------------------------------
# X44: 2-D Pareto frontier (skyline) over orders
# --------------------------------------------------------------------------


@register(
    "pareto_frontier_orders",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ),
    grp AS (
        SELECT o_totalprice AS price, MAX(o_orderdate) AS mx_date
        FROM pts GROUP BY o_totalprice
    ),
    run AS (
        SELECT price,
               MAX(mx_date) OVER (
                   ORDER BY price DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS dom_date
        FROM grp
    )
    SELECT p.o_orderkey, p.o_totalprice, p.o_orderdate
    FROM pts p JOIN run r ON p.o_totalprice = r.price
    WHERE r.dom_date IS NULL OR p.o_orderdate >= r.dom_date
    """,
)
def pareto_frontier_orders(spark, sf_dir):
    """2-D skyline (X44): orders not dominated on (totalprice,
    orderdate) — a point is dominated iff some other order has BOTH a
    strictly higher price AND a strictly later date. The classic
    "best trade-off set" query (maximal vectors), done without any
    pairwise O(n^2) comparison.

    Rewrite: group points by price (the max date per price is the only
    candidate that matters), sort the price groups descending, and
    take the running max of date over STRICTLY higher price groups
    (rows-frame ending at 1 PRECEDING). A point survives iff that
    running max is NULL or not strictly later than its own date. All
    comparisons are exact (double equality on grouped keys, date
    order) — no float arithmetic at all.

    Scale shape — the associative decomposition (frontier(A ∪ B) =
    frontier(frontier(A) ∪ frontier(B))) implemented, not just
    documented (the r6 verdict's X44 scale-killer): after the hash
    aggregation to price grain, the grouped table RANGE-PARTITIONS on
    price desc (near-continuous prices ⇒ ~|orders| rows — never a
    single-partition sort), the strictly-higher-price running max of
    date computes per partition, and each partition's carry-in is the
    max date over all earlier (higher-price) partitions — a broadcast
    |partitions|-row frame built with a triangular self-join (no
    window at all). dominating date = greatest(local running max,
    carry). Then one equi-join back to the scan on price. Every
    shuffle is keyed; tests/test_plans.py pins the absence of a
    single-partition exchange."""
    pts = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return skyline_2d(
        pts, "o_orderkey", "o_totalprice", "o_orderdate"
    )


def skyline_2d(
    pts, key: str, x: str, y: str, n_parts: int = 8
):
    """Distributed 2-D skyline core (shared by the registered query and
    the property test): rows of ``pts`` not dominated on (x, y) — a row
    is dominated iff some other row has BOTH strictly higher x AND
    strictly higher y. Per-partition frontier + broadcast carry; see
    ``pareto_frontier_orders`` for the full plan narrative."""
    grp = pts.groupBy(F.col(x).alias("price")).agg(
        F.max(y).alias("mx_date")
    )
    gp = (
        grp.repartitionByRange(n_parts, F.col("price").desc())
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    pmax = gp.groupBy("pid").agg(F.max("mx_date").alias("pmx"))
    prior = pmax.select(
        F.col("pid").alias("bpid"), F.col("pmx").alias("bmx")
    )
    carry = (
        pmax.select("pid")
        .join(prior, F.col("bpid") < F.col("pid"), "left")
        .groupBy("pid")
        .agg(F.max("bmx").alias("carry"))
    )
    w_local = Window.partitionBy("pid").orderBy(F.desc("price")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = gp.join(F.broadcast(carry), "pid").select(
        "price",
        F.greatest(
            F.max("mx_date").over(w_local), F.col("carry")
        ).alias("dom_date"),
    )
    return (
        pts.join(run, pts[x] == run["price"])
        .where(
            F.col("dom_date").isNull()
            | (F.col(y) >= F.col("dom_date"))
        )
        .select(key, x, y)
    )


# --------------------------------------------------------------------------
# X45: winsorized robust statistics per group
# --------------------------------------------------------------------------


@register(
    "winsorized_stats_by_status",
    oracle="""
    WITH th AS (
        SELECT o_orderstatus AS status,
               quantile_cont(o_totalprice, 0.01) AS p01,
               quantile_cont(o_totalprice, 0.99) AS p99
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           t.p01, t.p99,
           round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS raw_mean,
           round(CAST(SUM(CAST(least(greatest(o.o_totalprice, t.p01),
                                     t.p99) AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS winsor_mean,
           CAST(SUM(CASE WHEN o.o_totalprice < t.p01
                           OR o.o_totalprice > t.p99
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM orders o JOIN th t ON o.o_orderstatus = t.status
    GROUP BY o.o_orderstatus, t.p01, t.p99
    """,
)
def winsorized_stats_by_status(spark, sf_dir):
    """Winsorized robust mean per order status (X45): clip each value
    into its own group's [p01, p99] band before averaging — the
    outlier-robust aggregate real metric pipelines use when a handful
    of extreme rows would otherwise drag the mean (MAD flags outliers;
    winsorization neutralizes them while keeping the row count).

    Determinism: the cutoffs are exact interpolated percentiles
    (Spark `percentile` ≡ DuckDB `quantile_cont` on identical
    doubles — the per_group_quality_filter contract); clipping is
    least/greatest (picks one of two exact doubles); both means are
    order-free DECIMAL(28,9) sums divided once. The sums run to ~19
    significant digits — beyond double's exact range — and the two
    engines round the DECIMAL→DOUBLE conversion differently at the
    last ulp, so the means are rounded to 6 decimals after the
    division (same contract as tfidf's rounded scores).

    Scale shape: one pass computes per-group cutoffs (percentile
    needs the group's values — at 100 TB swap in approx_percentile
    with the X7 error-gate pattern, or a two-pass exact selection);
    the tiny per-status cutoff table is broadcast back into the scan,
    so the clip + final aggregate is map-side-combined with no extra
    fact shuffle."""
    o = t(spark, sf_dir, "orders")
    th = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.percentile("o_totalprice", F.lit(0.01)).alias("p01"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99")
    )
    return (
        o.join(
            F.broadcast(th), F.col("o_orderstatus") == F.col("status")
        )
        .groupBy("o_orderstatus", "p01", "p99")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(dec("o_totalprice", 28, 9)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("raw_mean"),
            F.round(
                F.sum(clipped.cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsor_mean"),
            F.sum(
                F.when(
                    (F.col("o_totalprice") < F.col("p01"))
                    | (F.col("o_totalprice") > F.col("p99")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            "n",
            "p01",
            "p99",
            "raw_mean",
            "winsor_mean",
            "n_clipped",
        )
    )


# --------------------------------------------------------------------------
# equi-depth (quantile-bucketed) histogram
# --------------------------------------------------------------------------
@register(
    "equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS bucket_total
    FROM b GROUP BY 1
    """,
)
def equidepth_histogram(spark, sf_dir):
    """Equi-depth (equal-population) histogram over order totals — the
    selectivity-estimation structure query optimizers keep in
    statistics catalogs, complementing the fixed-width variant
    (``histogram_order_totals``): bucket BOUNDARIES adapt to the
    distribution, so every bucket holds n/10 rows and skewed ranges get
    proportionally more buckets.

    ``ntile`` over a TOTAL order (value, key) distributes remainder
    rows to the leading buckets by the same rule in Spark and DuckDB,
    so bucket membership is exactly reproducible — no quantile
    interpolation convention involved. The global-order window is the
    scale caveat: at 100 TB you compute boundary values with
    ``approx_percentile`` (or exact distributed ``percentile``) and
    assign buckets with a broadcast range lookup instead — same output
    contract, no single-partition sort; this query certifies the exact
    semantics the approximate path is graded against.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("bucket", F.ntile(10).over(w))
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(dec("o_totalprice", 18, 4)).cast("double").alias(
                "bucket_total"
            ),
        )
    )


# --------------------------------------------------------------------------
# equi-depth histogram, boundary-broadcast form (the 100 TB plan)
# --------------------------------------------------------------------------
@register(
    "equidepth_histogram_bounded",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(o_totalprice,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS bs
        FROM orders
    ),
    assigned AS (
        SELECT CAST(1 + len(list_filter(b.bs, x -> o.o_totalprice > x))
                    AS INT) AS bucket,
               o.o_totalprice
        FROM orders o CROSS JOIN bounds b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS bucket_total
    FROM assigned GROUP BY 1
    """,
)
def equidepth_histogram_bounded(spark, sf_dir):
    """Equi-depth histogram, scale-safe twin of ``equidepth_histogram``:
    decile BOUNDARIES come from one exact ``percentile`` aggregate
    (partial-merge, map-side combined — no global sort), the 9-value
    boundary row is broadcast back into the scan, and bucket assignment
    is a pure range lookup (``1 + size(filter(bs, b -> v > b))``, ties
    to the lower bucket). This is the plan that survives 100 TB: the
    only shuffles are an aggregate's partial merge and the final
    10-group rollup — NO ``ntile`` over an unpartitioned total-order
    window pushing every row through one partition (the ``ntile`` form
    stays registered as the rank-semantics certification; this is the
    plan you actually run). ``tests/test_plans.py`` pins the absence of
    a single-partition window exchange and
    ``tests/test_stats_scale_twins.py`` certifies per-bucket agreement
    with the ``ntile`` form.

    Determinism: boundaries are exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` on identical doubles —
    the winsorized/per_group_quality_filter contract); assignment
    compares doubles; bucket_total is an order-free DECIMAL(18,4) sum.
    At a scale where exact percentile partials get heavy,
    ``approx_percentile`` drops in with the X7 error-gate pattern.
    """
    o = t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile(
            "o_totalprice",
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
        ).alias("bs")
    )
    assigned = o.crossJoin(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + F.size(
                F.filter("bs", lambda b: F.col("o_totalprice") > b)
            )
        )
        .cast("int")
        .alias("bucket"),
        "o_totalprice",
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.sum(dec("o_totalprice", 18, 4)).cast("double").alias("bucket_total"),
    )


# --------------------------------------------------------------------------
# Count-Min sketch with overcount-invariant gate
# --------------------------------------------------------------------------
@register(
    "countmin_heavy_hitters",
    oracle="""
    WITH u AS (
        SELECT CAST(user_id AS VARCHAR) AS ukey, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    keyed AS (
        SELECT u.ukey, u.n, g.i,
               CAST(('0x' || substr(md5(g.i || ':' || u.ukey), 1, 15))
                    AS BIGINT) % 256 AS bucket
        FROM u, LATERAL unnest([1, 2, 3]) AS g(i)
    ),
    counters AS (
        SELECT i, bucket, SUM(n) AS cnt FROM keyed GROUP BY 1, 2
    ),
    est AS (
        SELECT k.ukey, MIN(c.cnt) AS cm_est
        FROM keyed k JOIN counters c ON k.i = c.i AND k.bucket = c.bucket
        GROUP BY 1
    ),
    ranked AS (
        SELECT u.ukey, u.n, e.cm_est,
               ROW_NUMBER() OVER (ORDER BY u.n DESC, u.ukey) AS rn
        FROM u JOIN est e ON u.ukey = e.ukey
    )
    SELECT ukey AS user_key, CAST(n AS BIGINT) AS exact_n,
           CAST(cm_est AS BIGINT) AS cm_estimate,
           cm_est >= n AS never_undercounts
    FROM ranked WHERE rn <= 20
    """,
)
def countmin_heavy_hitters(spark, sf_dir):
    """Count-Min sketch (d=3 rows x w=256 counters) over per-user event
    counts, reported for the exact top-20 heavy hitters beside their
    exact counts — the fixed-size frequency sketch whose counter matrix
    is MERGEABLE (cell-wise sum) across partitions, batches, and days,
    which is what makes it the streaming/distributed answer to "top
    talkers" when exact per-key state would be unbounded.

    Hash rows use the engines' shared md5-prefix integer hash (same
    idiom as the native MinHash), so the sketch is bit-identical in
    Spark and DuckDB and sits fully under the value gate. The
    deterministic CM property — estimates NEVER undercount (a key's
    cell contains its own count plus nonnegative collision mass) — is
    emitted as a per-row ``never_undercounts`` gate and asserted TRUE
    in ``tests/test_plans.py::test_countmin_never_undercounts``; the
    probabilistic eps-N error bound is a distributional claim and is
    deliberately NOT asserted row-wise.

    Scale shape: the sketch is built from the per-key rollup (one
    shuffle); the counter matrix is d*w = 768 rows — broadcast
    everywhere it is consumed; top-k ranks a 1-row-per-key aggregate
    with a total order.
    """
    e = t(spark, sf_dir, "events")
    u = e.groupBy(
        F.col("user_id").cast("string").alias("ukey")
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = u.select(
        "ukey",
        "n",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("i"), F.col("ukey"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    counters = keyed.groupBy("i", "bucket").agg(F.sum("n").alias("cnt"))
    est = (
        keyed.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("ukey")
        .agg(F.min("cnt").alias("cm_est"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("ukey").asc())
    return (
        u.join(est, "ukey")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select(
            F.col("ukey").alias("user_key"),
            F.col("n").cast("bigint").alias("exact_n"),
            F.col("cm_est").cast("bigint").alias("cm_estimate"),
            (F.col("cm_est") >= F.col("n")).alias("never_undercounts"),
        )
    )


# --------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration (exact squares trick)
# --------------------------------------------------------------------------
@register(
    "market_concentration_hhi",
    oracle="""
    WITH cr AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS DOUBLE) AS total_rev,
           CAST(CAST(ROUND(SUM(rev * rev), 0) AS DECIMAL(18,0)) AS DOUBLE)
               / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
               AS hhi
    FROM cr GROUP BY 1
    """,
)
def market_concentration_hhi(spark, sf_dir):
    """Herfindahl-Hirschman concentration index of revenue across
    customers within each market segment — the antitrust/portfolio
    concentration metric (1/n = perfectly even, 1.0 = monopoly).

    The naive form sums SQUARED SHARES — a float accumulation whose
    result depends on partition order. This uses the algebraic
    identity HHI = sum(r_i^2) / (sum(r_i))^2: both sums stay exact
    DECIMAL (squares at scale (38,8) — still exact), and only the final
    quotient touches doubles. One subtlety the value gate caught: a
    wide DECIMAL whose scaled integer exceeds 2^53 casts to DOUBLE with
    DOUBLE ROUNDING in DuckDB (int128 -> double, then the scale
    divide) — off by one ulp from Spark's correctly-rounded BigDecimal
    path. The squared sum is therefore rounded to scale 0 (a ~2e14
    integer, exactly representable) before the cast; the relative
    error introduced is < 1e-14 and the value is bit-identical in both
    engines. Plan: customer-grain rollup (one shuffle of the fact),
    then the segment summary over 1-row-per-customer partials; dim
    broadcasts.
    """
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(dec("o_totalprice", 18, 4)).alias("rev"))
    )
    tot = F.sum("rev")
    sq = (
        F.round(F.sum(F.col("rev") * F.col("rev")), 0)
        .cast("decimal(18,0)")
        .cast("double")
    )
    return cr.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        tot.cast("double").alias("total_rev"),
        (sq / (tot.cast("double") * tot.cast("double"))).alias("hhi"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------
@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                      1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS frac
    FROM d GROUP BY digit
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen (natural multiplicative data leads with
    digit 1 ~30.1% of the time; uniform-ish synthetic data shows up
    flat, which is itself the finding on this generator).

    The leading digit comes from floor -> bigint -> string -> first
    char: ``floor`` pins the truncation direction (a bare double->int
    CAST truncates in Spark but ROUNDS in DuckDB — the kind of silent
    cross-engine trap the value gate exists to catch), and the grand
    total for the fraction rides an unpartitioned window over the
    9-row digit rollup, not a second scan. One shuffle of digit keys.
    """
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "digit",
        F.col("n").cast("bigint"),
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "frac"
        ),
    )


# --------------------------------------------------------------------------
# Pareto 80/20 decile analysis
# --------------------------------------------------------------------------
@register(
    "pareto_decile_analysis",
    oracle="""
    WITH cr AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev, NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
        FROM cr
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS DOUBLE) AS decile_rev,
           CAST(SUM(rev) AS DOUBLE)
               / CAST(SUM(SUM(rev)) OVER () AS DOUBLE) AS rev_share,
           CAST(SUM(SUM(rev)) OVER (
                    ORDER BY decile ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE)
               / CAST(SUM(SUM(rev)) OVER () AS DOUBLE) AS cum_share
    FROM ranked GROUP BY decile
    """,
)
def pareto_decile_analysis(spark, sf_dir):
    """Pareto (80/20) revenue concentration: customers ranked into
    revenue deciles (total order: revenue desc, key asc — ntile
    remainder semantics identical in both engines), each decile's
    share and the cumulative share curve. cum_share at decile 2 ~ "the
    top 20% of customers hold X% of revenue" — the number the 80/20
    rule asks for.

    Every sum is exact DECIMAL through both grouping levels and both
    windows (cumulative included); shares are terminal single
    divisions. Plan: customer rollup (the only data-sized shuffle),
    then a 10-row decile aggregate with unpartitioned windows over it.
    The ``ntile`` over the customer-grain frame is the scale caveat —
    customers scale with data — so this form is retained as the
    rank-semantics certification; ``pareto_decile_ranged`` is the plan
    you actually run at 100 TB (exact-percentile decile boundaries
    broadcast back, no total-order window anywhere;
    ``tests/test_stats_scale_twins.py`` pins per-decile agreement).
    """
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", 18, 4)).alias("rev")
    )
    wd = Window.orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
    ranked = cr.withColumn("decile", F.ntile(10).over(wd))
    agg = ranked.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").alias("drev"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "decile",
        "n_customers",
        F.col("drev").cast("double").alias("decile_rev"),
        (
            F.col("drev").cast("double")
            / F.sum("drev").over(wall).cast("double")
        ).alias("rev_share"),
        (
            F.sum("drev").over(wcum).cast("double")
            / F.sum("drev").over(wall).cast("double")
        ).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Pareto deciles, scale-safe twin (boundary broadcast, no ntile)
# --------------------------------------------------------------------------
@register(
    "pareto_decile_ranged",
    oracle="""
    WITH cr AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1
    ),
    bounds AS (
        SELECT quantile_cont(CAST(rev AS DOUBLE),
                             [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1])
               AS bs
        FROM cr
    ),
    agg AS (
        SELECT CAST(1 + len(list_filter(b.bs,
                                        x -> CAST(c.rev AS DOUBLE) < x))
                    AS INT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(c.rev) AS drev
        FROM cr c CROSS JOIN bounds b
        GROUP BY 1
    )
    SELECT a.decile, a.n_customers,
           CAST(a.drev AS DOUBLE) AS decile_rev,
           CAST(a.drev AS DOUBLE) / CAST(tt.total AS DOUBLE) AS rev_share,
           CAST(cc.cum AS DOUBLE) / CAST(tt.total AS DOUBLE) AS cum_share
    FROM agg a
    CROSS JOIN (SELECT SUM(drev) AS total FROM agg) tt
    JOIN (SELECT a1.decile, SUM(a2.drev) AS cum
          FROM agg a1 JOIN agg a2 ON a2.decile <= a1.decile
          GROUP BY 1) cc ON cc.decile = a.decile
    """,
)
def pareto_decile_ranged(spark, sf_dir):
    """Pareto revenue deciles, scale-safe twin of
    ``pareto_decile_analysis`` (the r6 verdict's X73 remedy, the
    X55→X83 equidepth playbook): decile BOUNDARIES come from one exact
    ``percentile`` aggregate over the customer-revenue rollup at the
    nine descending quantiles (partial-merge, map-side combined — no
    global sort), the 9-value boundary row broadcasts back, and decile
    assignment is a pure range lookup — decile = 1 + |{b : rev < b}|,
    so decile 1 is the top-revenue band and ties go to the better
    decile. The cumulative-share curve is built from the 10-row decile
    aggregate with a triangular self-join, so the whole plan carries
    NO window operator and no single-partition exchange at all
    (``ntile`` over the customer-grain frame — the retained
    certification form — pushes every customer through one task at
    scale; customers scale with data).

    Determinism: boundaries are exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` on identical doubles —
    the equidepth_histogram_bounded contract); revenue stays exact
    DECIMAL through both grouping levels, the triangular cumulative
    sum included; shares are terminal double divisions of identical
    bits. ``tests/test_stats_scale_twins.py`` certifies per-decile
    agreement with the ntile form (populations differ by at most 1 per
    decile on distinct revenues — remainder vs interpolated-cut
    placement) and pins the window-free physical plan."""
    o = t(spark, sf_dir, "orders")
    # the customer rollup feeds boundary computation AND assignment;
    # the decile aggregate feeds totals, the cumulative join, and the
    # final projection — persist both so the plan scans the fact once
    # per consumer-tree instead of re-deriving the rollup per branch
    # (at 100 TB: one fact scan + one user-grain shuffle, cached at
    # customer grain, then 10-row frames everywhere)
    cr = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", 18, 4)).alias("rev")
    ).persist()
    bounds = cr.agg(
        F.percentile(
            F.col("rev").cast("double"),
            F.array(*[F.lit(i / 10) for i in range(9, 0, -1)]),
        ).alias("bs")
    )
    agg = (
        cr.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        "bs", lambda b: F.col("rev").cast("double") < b
                    )
                )
            )
            .cast("int")
            .alias("decile"),
            "rev",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("rev").alias("drev"),
        )
        .persist()
    )
    total = agg.agg(F.sum("drev").alias("total"))
    a2 = agg.select(
        F.col("decile").alias("d2"), F.col("drev").alias("drev2")
    )
    cum = (
        agg.select("decile")
        .join(a2, F.col("d2") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("drev2").alias("cum"))
    )
    return (
        agg.join(cum, "decile")
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.col("drev").cast("double").alias("decile_rev"),
            (
                F.col("drev").cast("double")
                / F.col("total").cast("double")
            ).alias("rev_share"),
            (
                F.col("cum").cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


# --------------------------------------------------------------------------
# rollup with grouping_id (subtotal-row disambiguation)
# --------------------------------------------------------------------------
@register(
    "rollup_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_grouping_id(spark, sf_dir):
    """ROLLUP with ``grouping()`` flags — the disambiguation every
    production rollup needs and most migrations break: a NULL in a
    rollup output column is ambiguous between "subtotal row" and "the
    group whose key IS NULL"; the grouping flag (1 = this column is
    rolled up on this row) is the only reliable discriminator, and
    BI layers key their drill-down logic on it.

    Engine subtlety certified here: Spark's ``grouping()`` returns
    byte/int and DuckDB's returns BIGINT — both cast to INT explicitly
    so the driver's schema compare sees one type. Same single-shuffle
    partial-agg plan as the plain rollup (`rollup_order_status`).
    """
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority").agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("o_totalprice", 18, 4)).cast("double").alias("rev"),
        )
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "rev"
    )


# --------------------------------------------------------------------------
# exact percentile over a sliding window frame
# --------------------------------------------------------------------------
@register(
    "trailing_median_per_user",
    oracle="""
    SELECT user_id, event_id,
           median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS trailing_median
    FROM events
    WHERE user_id < 50
    """,
)
def trailing_median_per_user(spark, sf_dir):
    """Exact median over a trailing 5-row window per user — the robust
    rolling center used for spike detection where a rolling MEAN is
    dragged by the outlier it is supposed to find (complements
    ewma_anomaly_by_user / mad_outlier_filter).

    Certifies Spark's aggregate-as-window-function path for exact
    ``percentile`` with a bounded ROWS frame against DuckDB's windowed
    ``median`` — the same double-domain interpolation equivalence
    percentile_quartiles certifies, now inside a moving frame. (Inputs
    deliberately stay DOUBLE: DuckDB's median over DECIMAL computes
    the exact decimal midpoint before any cast, while Spark
    interpolates in double — feeding decimals would diverge by an ulp
    on even-sized frames.) One user-keyed window shuffle; the frame is
    O(1) rows per position.
    """
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5d)").over(w).alias("trailing_median"),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership sketch (mergeable; no-false-negative gate)
# --------------------------------------------------------------------------
@register(
    "bloom_membership_sketch",
    oracle="""
    WITH obs AS (
        SELECT DISTINCT o_custkey AS key FROM orders
    ),
    bits AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(g.i || ':' || CAST(key AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 131072 AS bit
        FROM obs, LATERAL unnest([1, 2, 3]) AS g(i)
    ),
    probe AS (
        SELECT c.key,
               SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nhit
        FROM (SELECT c_custkey AS key,
                     CAST(('0x' || substr(md5(g.i || ':'
                              || CAST(c_custkey AS VARCHAR)), 1, 15))
                          AS BIGINT) % 131072 AS bit
              FROM customer, LATERAL unnest([1, 2, 3]) AS g(i)) c
        LEFT JOIN bits b USING (bit)
        GROUP BY c.key
    ),
    flags AS (
        SELECT p.key, p.nhit = 3 AS bloom_positive,
               o.key IS NOT NULL AS present
        FROM probe p LEFT JOIN obs o ON p.key = o.key
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT)
               AS n_present,
           CAST(SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_positive,
           CAST(SUM(CASE WHEN bloom_positive AND NOT present
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(0 AS BIGINT) AS n_false_negatives,
           CAST(SUM(CASE WHEN bloom_positive AND NOT present
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN NOT present THEN 1 ELSE 0 END), 0)
               AS fpr
    FROM flags
    """,
)
def bloom_membership_sketch(spark, sf_dir):
    """Bloom-filter membership sketch (d=3 hashes, m=2^17 bits) built
    over the distinct order-placing customers and probed with EVERY
    customer — the fixed-size set-membership structure that answers
    "might this key be in the 100 TB fact table?" from kilobytes,
    completing the sketch tier beside HLL (distinct counts), Count-Min
    (frequencies), and approx quantiles. The bit set is MERGEABLE
    (bit-OR across partitions/batches/days), which is what makes it
    the distributed pre-filter for selective joins.

    Hash rows use the engines' shared md5-prefix integer idiom (same
    as Count-Min/MinHash), so the sketch is bit-identical in both
    engines. The one-row summary is gated the strong way: the ORACLE
    pins ``0 AS n_false_negatives`` as a literal while Spark counts
    present-but-bloom-negative keys from the data — a broken filter
    hash-fails the driver gate itself (the zorder_skipping_gate
    pattern). False positives are exactly value-matched and the FPR
    denominator is the true-absent count.

    Scale shape: build = one distinct + map-side hash explode into a
    <=m-row bit table (kilobytes — broadcast); probe = candidate hash
    explode → broadcast equi-join on bit → 3-row-per-key rollup; truth
    = broadcast left join on the distinct key set. No fact-fact
    shuffle anywhere."""
    m = 131072

    def bitpos(i, key):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m
        )

    obs = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bits = obs.select(
        F.explode(
            F.array(*[bitpos(i, F.col("key")) for i in (1, 2, 3)])
        ).alias("bit")
    ).distinct()
    cand = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    cand_bits = cand.select(
        "key",
        F.explode(
            F.array(*[bitpos(i, F.col("key")) for i in (1, 2, 3)])
        ).alias("bit"),
    )
    probe = (
        cand_bits.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left"
        )
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("nhit"))
    )
    flags = probe.join(
        F.broadcast(obs.withColumn("present", F.lit(True))), "key", "left"
    ).select(
        (F.col("nhit") == 3).alias("bloom_positive"),
        F.coalesce(F.col("present"), F.lit(False)).alias("present"),
    )
    n_absent = F.sum(F.when(~F.col("present"), 1).otherwise(0))
    n_fp = F.sum(
        F.when(F.col("bloom_positive") & ~F.col("present"), 1).otherwise(0)
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("present"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_present"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_positive"),
        n_fp.cast("bigint").alias("n_false_positives"),
        F.sum(
            F.when(F.col("present") & ~F.col("bloom_positive"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_negatives"),
        (
            n_fp.cast("double")
            / F.when(n_absent > 0, n_absent).otherwise(F.lit(None))
        ).alias("fpr"),
    )


# --------------------------------------------------------------------------
# HLL sketch-union rollup (mergeability certification)
# --------------------------------------------------------------------------
@register(
    "hll_sketch_union_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_3rsd,
           TRUE AS direct_within_3rsd,
           TRUE AS union_drift_under_1pct
    FROM events GROUP BY 1
    """,
)
def hll_sketch_union_rollup(spark, sf_dir):
    """Sketch MERGEABILITY under the gate — the property that makes
    approximate distinct counting the 100 TB rollup path: weekly
    distinct users computed by UNIONING per-day HLL sketches
    (`hll_sketch_agg` per day, `hll_union_agg` up to weeks) must equal
    the direct weekly sketch — the exact algebraic-rollup shape of
    rollup_cascade_daily, but for the NON-ADDITIVE distinct count that
    plain sums cannot cascade. Both estimates and the drift flags are
    computed Spark-side; the ORACLE pins ``TRUE`` literals for the
    3·rsd error contract of BOTH estimates against its exact count
    (rsd ≈ 1.04/√2¹² ≈ 1.6% at the default lgConfigK=12) plus a ≤1%
    merged-vs-direct drift bound — a sketch that stops merging cleanly
    or drifts out of bound hash-fails the driver gate (the
    approx_distinct_hll / zorder-gate pattern).

    The union is NOT pinned bit-lossless: the sf0.1 sweep caught the
    DataSketches union gadget (HLL_8 internal registers) estimating
    ~0.4% below a directly-built HLL_4 sketch of the same keys
    (1488 vs 1494 on 1500 exact) once cardinality leaves sparse mode
    — a representation artifact sparse-mode small SFs masked, not
    data loss; both estimates stay well inside the 3·rsd contract,
    which is the bound a 100 TB rollup actually relies on.

    Scale shape: day-grain sketches are what you MATERIALIZE (each a
    few KB); every coarser grain unions sketches and never re-touches
    raw events — the second aggregation's input is one row per day."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    weekly_merged = daily.groupBy(
        F.date_trunc("week", F.col("day").cast("timestamp"))
        .cast("date")
        .alias("week")
    ).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_merged")
    )
    weekly_direct = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
            "est_direct"
        ),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
    )
    rsd3 = 3 * 1.04 / (2 ** 6)  # 3 * 1.04/sqrt(2^12)
    return (
        weekly_merged.join(weekly_direct, "week")
        .select(
            "week",
            "exact_users",
            (
                F.abs(
                    F.col("est_merged").cast("double")
                    - F.col("exact_users").cast("double")
                )
                <= F.lit(rsd3) * F.col("exact_users").cast("double")
            ).alias("merged_within_3rsd"),
            (
                F.abs(
                    F.col("est_direct").cast("double")
                    - F.col("exact_users").cast("double")
                )
                <= F.lit(rsd3) * F.col("exact_users").cast("double")
            ).alias("direct_within_3rsd"),
            (
                F.abs(
                    F.col("est_merged").cast("double")
                    - F.col("est_direct").cast("double")
                )
                <= 0.01 * F.col("exact_users").cast("double")
            ).alias("union_drift_under_1pct"),
        )
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) sketch with intersection estimation
# --------------------------------------------------------------------------
@register(
    "kmv_intersection_estimate",
    oracle="""
    WITH a AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 15)) AS BIGINT) AS h
        FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 15)) AS BIGINT) AS h
        FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM a ORDER BY h LIMIT 256),
    kb AS (SELECT h FROM b ORDER BY h LIMIT 256),
    ku AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
           ORDER BY h LIMIT 256),
    rho AS (
        SELECT COUNT(*) AS both_n
        FROM ku
        WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
    ),
    ests AS (
        SELECT
          -- small-set rule: a sketch holding the whole set IS the
          -- exact count; the (k-1)/h_k estimator applies only at k
          (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE round(255.0 * 1152921504606846976 / MAX(h), 6)
                  END FROM ka) AS est_a,
          (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE round(255.0 * 1152921504606846976 / MAX(h), 6)
                  END FROM kb) AS est_b,
          (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE round(255.0 * 1152921504606846976 / MAX(h), 6)
                  END FROM ku) AS est_union,
          (SELECT CAST(COUNT(*) AS DOUBLE) FROM ku) AS ku_n,
          (SELECT both_n FROM rho) AS both_n
    ),
    exacts AS (
        SELECT
          (SELECT COUNT(*) FROM a) AS exact_a,
          (SELECT COUNT(*) FROM b) AS exact_b,
          (SELECT COUNT(*) FROM (SELECT h FROM a INTERSECT SELECT h FROM b))
              AS exact_inter
    )
    SELECT CAST(exact_a AS BIGINT) AS exact_a,
           CAST(exact_b AS BIGINT) AS exact_b,
           CAST(exact_inter AS BIGINT) AS exact_inter,
           est_a, est_b,
           round(both_n / ku_n * est_union, 6) AS est_inter,
           TRUE AS within_15pct
    FROM ests, exacts
    """,
)
def kmv_intersection_estimate(spark, sf_dir):
    """KMV (k-minimum-values, k=256) sketches over clicking and
    purchasing users, with INTERSECTION estimation — the set-operation
    capability HLL lacks (sketch tier #5 beside HLL / Count-Min /
    quantiles / Bloom): est(|S|) = (k−1)·2⁶⁰/h₍ₖ₎ from the k smallest
    60-bit md5 hashes, and |A∩B| ≈ ρ·est(|A∪B|) where ρ counts union-
    sketch members present in BOTH input sketches. KMV sketches are
    MERGEABLE (union = k smallest of concatenated sketches — exactly
    the min-k the query takes), and every estimate is DETERMINISTIC
    (md5 order, no RNG), so both engines compute bit-identical
    estimates and the gate value-matches them directly; the 15% error
    contract rides the pinned-TRUE pattern on top.

    Scale shape: per-set min-k compiles to TakeOrderedAndProject
    (per-partition heaps over the distinct-hash shuffle, k-row merge);
    the membership checks join 256-row broadcast frames. At 100 TB the
    sketches are the materialization unit — set algebra happens on
    k-row frames, raw events are touched once."""
    k = 256
    scale = float(2**60)
    e = t(spark, sf_dir, "events")

    def hashes(etype):
        return (
            e.where(F.col("event_type") == etype)
            .select(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("h")
            )
            .distinct()
        )

    a, b = hashes("click").persist(), hashes("purchase").persist()
    ka = a.orderBy("h").limit(k).persist()
    kb = b.orderBy("h").limit(k).persist()
    ku = a.unionByName(b).distinct().orderBy("h").limit(k)

    def est(sketch):
        # small-set rule: a sketch holding the whole set IS the exact
        # count; the (k-1)/h_k estimator applies only at capacity k
        n = F.count(F.lit(1))
        return F.when(n < k, n.cast("double")).otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(scale)
                / F.max("h").cast("double"),
                6,
            )
        )

    ests_a = ka.agg(est(ka).alias("est_a"))
    ests_b = kb.agg(est(kb).alias("est_b"))
    both = (
        ku.join(ka.withColumnRenamed("h", "ha"), F.col("h") == F.col("ha"))
        .join(kb.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"))
    )
    ests_u = ku.agg(
        est(ku).alias("est_union"),
        F.count(F.lit(1)).cast("double").alias("ku_n"),
    ).crossJoin(both.agg(F.count(F.lit(1)).alias("both_n")))
    exacts = (
        a.agg(F.count(F.lit(1)).cast("bigint").alias("exact_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).cast("bigint").alias("exact_b")))
        .crossJoin(
            a.join(b, "h").agg(
                F.count(F.lit(1)).cast("bigint").alias("exact_inter")
            )
        )
    )
    est_inter = F.round(
        F.col("both_n").cast("double") / F.col("ku_n") * F.col("est_union"),
        6,
    )
    return (
        exacts.crossJoin(ests_a)
        .crossJoin(ests_b)
        .crossJoin(ests_u)
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            "est_a",
            "est_b",
            est_inter.alias("est_inter"),
            (
                F.abs(
                    F.col("both_n").cast("double")
                    / F.col("ku_n")
                    * F.col("est_union")
                    - F.col("exact_inter").cast("double")
                )
                <= F.lit(0.15) * F.col("exact_inter").cast("double")
            ).alias("within_15pct"),
        )
    )


# --------------------------------------------------------------------------
# Count-Min inner product: self-join size (F2) estimation
# --------------------------------------------------------------------------
@register(
    "cm_selfjoin_size_estimate",
    oracle="""
    WITH u AS (
        SELECT CAST(user_id AS VARCHAR) AS ukey, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    keyed AS (
        SELECT u.n, g.i,
               CAST(('0x' || substr(md5(g.i || ':' || u.ukey), 1, 15))
                    AS BIGINT) % 256 AS bucket
        FROM u, LATERAL unnest([1, 2, 3]) AS g(i)
    ),
    counters AS (
        SELECT i, bucket, SUM(n) AS cnt FROM keyed GROUP BY 1, 2
    ),
    rows_est AS (
        SELECT i, SUM(cnt * cnt) AS est FROM counters GROUP BY i
    ),
    exact AS (
        SELECT CAST(SUM(n * n) AS BIGINT) AS f2,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM u
    )
    SELECT e.n_keys, e.f2 AS exact_selfjoin_rows,
           CAST((SELECT MIN(est) FROM rows_est) AS BIGINT)
               AS cm_estimate,
           TRUE AS never_undercounts
    FROM exact e
    """,
)
def cm_selfjoin_size_estimate(spark, sf_dir):
    """Join-size estimation by Count-Min INNER PRODUCT — the sketch
    algebra behind cardinality estimators: the size of the events
    self-join on user_id is the second frequency moment F₂ = Σ cnt(u)²
    (also THE skew diagnostic — a hot key dominates this sum), and the
    CM estimate is min over hash rows of Σ_b C[i,b]² — computable from
    two mergeable 3×256 counter matrices WITHOUT touching row data
    again. The estimator never undercounts (collisions only add cross
    terms), pinned the strong way: the oracle hard-codes TRUE while
    Spark compares est ≥ F₂ from the data. Both the exact moment and
    the estimate are deterministic integers (shared md5 hash idiom), so
    the gate value-matches them outright.

    At 100 TB this is how a planner prices a fact-fact join before
    running it: per-side CM sketches maintained incrementally
    (cell-wise sums), inner product on 768 counters. One key rollup +
    one 768-cell rollup; everything after is arithmetic on sketch
    rows."""
    e = t(spark, sf_dir, "events")
    u = e.groupBy(F.col("user_id").cast("string").alias("ukey")).agg(
        F.count(F.lit(1)).alias("n")
    )
    keyed = u.select(
        "ukey",
        "n",
        F.explode(F.array(*[F.lit(i) for i in (1, 2, 3)])).alias("i"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("i"), F.col("ukey"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    counters = keyed.groupBy("i", "bucket").agg(F.sum("n").alias("cnt"))
    rows_est = counters.groupBy("i").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("est")
    )
    est = rows_est.agg(F.min("est").alias("cm_estimate"))
    exact = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias(
            "exact_selfjoin_rows"
        ),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_keys",
        "exact_selfjoin_rows",
        F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        (F.col("cm_estimate") >= F.col("exact_selfjoin_rows")).alias(
            "never_undercounts"
        ),
    )


# --------------------------------------------------------------------------
# quantity-weighted price quantiles (percentile with frequency)
# --------------------------------------------------------------------------
@register(
    "weighted_price_quantiles",
    oracle="""
    WITH expanded AS (
        SELECT l_returnflag, l_extendedprice
        FROM lineitem, unnest(range(CAST(l_quantity AS BIGINT)))
    )
    SELECT l_returnflag,
           CAST((SELECT COUNT(*) FROM lineitem li
                 WHERE li.l_returnflag = expanded.l_returnflag)
                AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS total_weight,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS wq25,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS wmedian,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS wq75
    FROM expanded GROUP BY l_returnflag
    """,
)
def weighted_price_quantiles(spark, sf_dir):
    """Quantity-WEIGHTED price quantiles per return flag: the median
    price a unit actually sold at (not the median line) — the
    difference between "half our order lines are under X" and "half
    our volume moved under X", which is the number pricing and
    inventory planning want. Certifies Spark's three-argument
    ``percentile(col, p, frequency)`` — each row replicated by its
    integer weight inside the aggregation buffer — against a DuckDB
    oracle that EXPANDS rows by weight (unnest(range(qty))) and runs
    plain quantile_cont on the multiset: two independent mechanisms,
    same interpolation.

    Weights are exact integers; the Spark side never materializes the
    expansion (the frequency path aggregates (value, weight) pairs),
    which is the 100 TB story: weighted quantiles at scan cost, no
    row blow-up — the oracle's expansion is the semantics
    specification, not the plan."""
    l = t(spark, sf_dir, "lineitem")
    freq = F.col("l_quantity").cast("bigint")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(freq).cast("bigint").alias("total_weight"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.25,"
                   " CAST(l_quantity AS BIGINT))"), 6
        ).alias("wq25"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.5,"
                   " CAST(l_quantity AS BIGINT))"), 6
        ).alias("wmedian"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.75,"
                   " CAST(l_quantity AS BIGINT))"), 6
        ).alias("wq75"),
    )
