"""Classic OLAP: the TPC-H queries the driver schema can express.

Round 3 landed Q1/Q3/Q6/Q18 (plans/relational.py); round 4 adds Q5,
Q7, Q10, Q13, Q14, Q22 (faithful modulo documented constant proxies)
and then completes the suite with shape-faithful VARIANTS of the
remaining queries. The driver's tables lack partsupp,
l_commitdate/l_receiptdate, l_shipmode/l_shipinstruct, p_container,
c_phone and o_comment, so each variant keeps the query's canonical
PLAN SHAPE — the part optimizers and engines are graded on — while
substituting available columns:

- supply relation  := SELECT DISTINCT l_partkey, l_suppkey FROM
  lineitem (the partsupp surrogate; Q2/Q11/Q16/Q20)
- supply cost      := s_acctbal (Q2) or 0.50 * p_retailprice (Q9)
- "late shipment"  := l_shipdate > o_orderdate + N days (Q4/Q12/Q21;
  the synthetic ship lag spans ±2400 days so thresholds stay selective)
- shipmode/container-style categorical := l_returnflag / p_brand bands
  (Q12/Q17/Q19); phone country code := c_custkey % 7 (Q22)

Every query follows the engine determinism contract: money math in
fixed-scale DECIMAL (order-independent sums), ratios cast to DOUBLE at
the end, every LIMIT ranked by a total order.

Reference parity note: the reference (script.py, a 180-line ETL loader)
executes none of these — its star schema exists to SERVE them
(README.md:80-81 "Fact & Dimension Tables → Analytics Ready Data");
this module is that declared analytics surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .common import dec, t

# --------------------------------------------------------------------------
# Q5: local supplier volume — the join-cycle query
# --------------------------------------------------------------------------


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    supplier and the customer share that nation, restricted to one
    region and one order year — the JOIN-CYCLE query (the
    customer-nation = supplier-nation equality closes a cycle in the
    join graph, the shape optimizers historically mishandled).

    Plan: region ⋈ nation collapses to a handful of nation keys that
    broadcast into supplier AND customer (both dim joins shuffle-free);
    the date-filtered orders⋈lineitem pair is the only potentially
    large join and AQE picks its strategy; the cycle edge
    (c_nationkey = s_nationkey) is evaluated as a post-join filter on
    already-broadcast columns, never a shuffle key. One aggregation
    shuffle on n_name (25 groups)."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.sum(
        dec("l_extendedprice", 14, 2)
        * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
    ).cast("double")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7: volume shipping — bi-nation trade flows
# --------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping): trade volume between two nations in
    both directions, by year — the two-role-dimension query (nation
    joins twice, once through the supplier leg and once through the
    customer leg, with a disjunctive cross-leg predicate).

    Plan: both nation legs resolve to 1-key broadcasts into supplier
    and customer; those (now tiny) dims broadcast into the
    date-filtered fact legs, so the only shuffle is the final 4-group
    aggregation. The OR predicate is applied post-join on broadcast
    columns — it never forces a cartesian or a re-shuffle."""
    nat = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("sk"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("ck"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    rev = F.sum(
        dec("l_extendedprice", 14, 2)
        * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
    ).cast("double")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(rev.alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 problem customers
# --------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned items): the 20 customers who returned the
    most revenue in a quarter — filter both fact legs, join up to the
    customer grain, aggregate there, top-k with attributes carried
    through the GROUP BY (the "report with entity attributes" shape
    that Q18 solves by re-join and Q10 solves by grouping wide).

    Plan: returnflag + quarter predicates are pushed to both scans;
    nation broadcasts into customer, customer broadcasts into the
    filtered orders⋈lineitem join; one aggregation shuffle on the
    customer grain; total-order top-20 (revenue desc, custkey)."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    rev = F.sum(
        dec("l_extendedprice", 14, 2)
        * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
    ).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join + double aggregate
# --------------------------------------------------------------------------


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly N orders, INCLUDING the zero bucket — the double-aggregate
    over a LEFT OUTER join (COUNT of a nullable column counts only
    matches, so no-order customers land in c_count = 0 instead of
    vanishing; an inner join would silently drop the most interesting
    bucket).

    Plan: the first aggregate runs on the customer grain (AQE picks
    shuffle vs broadcast for the outer join); the second is a
    near-free re-aggregation of ~distinct-count-many rows. At 100 TB
    the orders side pre-aggregates to (custkey, count) BEFORE the
    outer join — map-side combine shrinks the shuffle to one row per
    customer."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    # pre-aggregate orders to one row per customer before the outer
    # join: the join input is |customers| rows, not |orders| rows
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = (
        c.join(F.broadcast(per_cust), c.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("c_count")
        )
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# --------------------------------------------------------------------------
# Q14: promotion effect — conditional-aggregate ratio
# --------------------------------------------------------------------------


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT 100.00 * CAST(
             SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE 0.00 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
             AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from promotional parts — the conditional-aggregate ratio (two
    sums over one scan, one gated by a dimension attribute; no second
    pass, no self-join).

    Plan: the month predicate pushes into the lineitem scan; part
    broadcasts (it's a dim); both sums are exact decimals computed in
    the SAME single aggregation, each cast to DOUBLE before the
    100*a/b arithmetic (decimal÷decimal quotient scales differ across
    engines; double ops on identical inputs are IEEE-exact
    everywhere, any partitioning)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    ext = dec("l_extendedprice", 14, 2) * (
        F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", ext).otherwise(
            F.lit(0.00).cast("decimal(16,4)")
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00) * promo.cast("double")
                / F.sum(ext).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity — scalar subquery + anti-join
# --------------------------------------------------------------------------


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
               / COUNT(*) AS a
        FROM customer
        WHERE c_acctbal > 0.00 AND c_custkey % 7 IN (1, 3, 5)
    )
    SELECT c.c_custkey % 7 AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_custkey % 7 IN (1, 3, 5)
      AND CAST(CAST(c.c_acctbal AS DECIMAL(14,2)) AS DOUBLE) > avg_bal.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): well-funded customers in
    selected markets who never ordered — the scalar-subquery +
    anti-join query. The driver's customer table has no phone column,
    so the TPC-H "country code" is proxied by ``c_custkey % 7``
    residue classes (same selectivity structure: a small IN-list over
    a derived code). The driver's order history is dense — every
    customer has ordered at least once — so "never ordered" is
    replaced by "dormant: no orders since 2000-01-01", keeping the
    anti-join non-degenerate while preserving Q22's shape.

    Determinism: the average balance is an exact decimal sum divided
    by a count, computed ONCE and compared against decimal-cast
    balances — the comparison set is engine-independent (no double
    summation order anywhere).

    Plan: the scalar average is a one-row aggregate broadcast-cross-
    joined into the plan (lazy, no driver-side collect — the
    tfidf_top_terms pattern); the NOT EXISTS is a broadcast left-anti
    join on the customer key; one final 3-group aggregation."""
    c = t(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 7).isin(1, 3, 5)
    )
    # exact decimal sum cast to double BEFORE dividing by the count:
    # decimal/bigint quotient scales differ across engines, while
    # double/int division of identical inputs is IEEE-exact everywhere
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.00)
        .agg(
            (
                F.sum(dec("c_acctbal", 14, 2)).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    o_keys = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(dec("c_acctbal", 14, 2).cast("double") > F.col("a"))
        .join(o_keys, F.col("c_custkey") == o_keys.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(dec("c_acctbal", 14, 2)).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q2 variant: minimum-cost supplier — correlated min + rejoin
# --------------------------------------------------------------------------


def _supply(spark, sf_dir):
    """The partsupp surrogate: distinct (part, supplier) pairs observed
    in lineitem. One exact-distinct shuffle on the pair key; at 100 TB
    this is the honest dedup every partsupp-shaped query must pay once
    (and would be materialized/bucketed by (l_partkey) in a warehouse)."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    esupp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey
    FROM part p
    JOIN supply sp ON sp.l_partkey = p.p_partkey
    JOIN esupp e  ON e.s_suppkey = sp.l_suppkey
    WHERE p.p_size = 15 AND p.p_type = 'LARGE'
      AND e.s_acctbal = (
          SELECT MIN(e2.s_acctbal)
          FROM supply sp2
          JOIN esupp e2 ON e2.s_suppkey = sp2.l_suppkey
          WHERE sp2.l_partkey = p.p_partkey
      )
    ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), schema variant: for each
    EUROPE-supplied part of one size/type, the supplier(s) achieving
    the minimum cost — the correlated-scalar-MIN + rejoin query. The
    driver has no partsupp, so supply = distinct lineitem pairs and
    cost := s_acctbal (module docstring).

    Plan: part filter broadcasts into the supply pairs; the EUROPE
    supplier dim broadcasts; the per-part MIN is a part-keyed WINDOW
    over the qualified rows — the aggregate-and-rejoin decorrelation
    would compute the whole candidate subtree twice (10 scans vs 5;
    ReuseExchange doesn't canonicalize the consumers) — and ties keep
    ALL minimal suppliers, exactly like the SQL. Top-100 ranked by a
    total order (acctbal desc, partkey, name)."""
    from pyspark.sql import Window

    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    esupp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    cand = (
        _supply(spark, sf_dir)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(esupp), F.col("l_suppkey") == esupp.s_suppkey)
    )
    min_bal = F.min("s_acctbal").over(Window.partitionBy("l_partkey"))
    return (
        cand.withColumn("min_bal", min_bal)
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q4 variant: order-priority checking — EXISTS semi-join
# --------------------------------------------------------------------------


@register(
    "tpch_q4_priority_late_ship",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND datediff('day', o.o_orderdate, l.l_shipdate) > 365
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_late_ship(spark, sf_dir):
    """TPC-H Q4 (order-priority checking), schema variant: count one
    quarter's orders per priority class where at least one line shipped
    more than a year after the order — the EXISTS → semi-join query.
    The driver has no l_commitdate/l_receiptdate, so "late" :=
    l_shipdate > o_orderdate + 365 days (module docstring).

    Plan: the quarter predicate pushes into the orders scan; the
    EXISTS compiles to a LEFT SEMI join on the order key with the
    lag predicate in the join condition (no dedup pass needed — semi
    stops at first match); one 5-group aggregation. At 100 TB both
    sides are facts, so the semi join shuffles on l_orderkey and AQE
    handles the rest."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (F.datediff(li.l_shipdate, o.o_orderdate) > 365),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q8: national market share — conditional share of a join-cycle volume
# --------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_6'
                     THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
                     ELSE 0.00 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
             AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share), fully faithful (needs no
    partsupp): NATION_6's share of ECONOMY-part volume sold into the
    AMERICA region per year — the conditional-share query over the
    largest join graph in the suite (8 relations, nation in two roles).

    Plan: part/customer-nation/supplier-nation all collapse to
    broadcasts; orders carries the 2-year pushed predicate and joins
    lineitem on the order key (the one big join, AQE-planned); both
    the gated and total sums are exact decimals computed in ONE
    aggregation over 2 year-groups; both are cast to DOUBLE BEFORE the
    division (decimal÷decimal result scales differ across engines —
    Spark rounds the quotient to its derived scale, DuckDB to another —
    while double÷double of identical inputs is IEEE-exact in both)."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n = t(spark, sf_dir, "nation")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cnk")
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount",
    )
    vol = dec("l_extendedprice", 14, 2) * (
        F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    gated = F.sum(
        F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(
            F.lit(0.00).cast("decimal(16,4)")
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (gated.cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# --------------------------------------------------------------------------
# Q9 variant: product-type profit — multi-fact profit rollup
# --------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
                    - 0.50 * CAST(p.p_retailprice AS DECIMAL(14,2))
                           * CAST(l.l_quantity AS DECIMAL(8,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit), schema variant: profit on parts
    whose name contains 'red', per supplier nation per year. The driver
    has no partsupp, so supply cost := 0.50 * p_retailprice per unit
    (module docstring) — the plan keeps Q9's signature: a LIKE-filtered
    part dim driving a lineitem/orders fact join with profit arithmetic
    inside the aggregate.

    Plan: part filter (LIKE pushed to the scan) broadcasts; supplier ⋈
    nation broadcasts; lineitem ⋈ orders is the one shuffle join;
    profit terms are exact decimals (scale-4 revenue minus scale-4
    cost), summed in one aggregation over nation × year groups."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("nation"),
            )),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "nation")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    profit = F.sum(
        dec("l_extendedprice", 14, 2)
        * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
        - F.lit(0.50).cast("decimal(4,2)")
        * dec("p_retailprice", 14, 2)
        * dec("l_quantity", 8, 2)
    ).cast("double")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(profit.alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 variant: important parts — global-total scalar subquery + HAVING
# --------------------------------------------------------------------------


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH natline AS (
        SELECT l.l_partkey,
               CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
    )
    SELECT l_partkey AS p_partkey,
           CAST(SUM(v) AS DOUBLE) AS part_value
    FROM natline
    GROUP BY l_partkey
    HAVING SUM(v) > (SELECT SUM(v) * 0.002 FROM natline)
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 (important stock), schema variant: parts whose traded
    value through NATION_7's suppliers exceeds a fraction of that
    nation's total — the global-total-scalar-subquery + HAVING query.
    partsupp value := sum of discounted lineitem value (module
    docstring); fraction 0.002 plays Q11's 0.0001/SF role.

    Plan: the nation's suppliers broadcast into lineitem; ONE shuffle
    aggregates per part; the part-grain frame is persisted once and
    feeds BOTH the global-total scalar aggregate (broadcast back as a
    one-row cross join) and the threshold filter — no second lineitem
    scan (ReuseExchange would not fire across the two consumers) and
    no single-partition exchange of part-grain rows (the window form
    this replaces pushed ~|parts| rows through one partition; at
    SF-100k that is 20M rows on one task for no reason). Exact decimal
    sums both sides of the comparison — threshold semantics identical
    across engines."""
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_7"
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = dec("l_extendedprice", 14, 2) * (
        F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(v).alias("pv"))
    )
    per_part = per_part.persist()
    total = per_part.agg(
        (
            F.sum("pv") * F.lit(0.002).cast("decimal(6,3)")
        ).alias("cutoff")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("pv") > F.col("cutoff"))
        .select(
            "p_partkey", F.col("pv").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# --------------------------------------------------------------------------
# Q12 variant: late lines by class — priority split conditional agg
# --------------------------------------------------------------------------


@register(
    "tpch_q12_late_line_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND datediff('day', o.o_orderdate, l.l_shipdate) > 60
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_late_line_priority(spark, sf_dir):
    """TPC-H Q12 (shipping modes and order priority), schema variant:
    for each line class, how many late-shipped 1997 lines belonged to
    high- vs low-priority orders — the two-CASE conditional aggregate
    over a fact-fact join. shipmode := l_returnflag and "late" :=
    shipped > 60 days after ordering (module docstring).

    Plan: the year predicate pushes into the lineitem scan; the join
    shuffles both facts on the order key (the lag predicate needs
    columns from both sides, applied as join condition so rows die
    before the aggregate); both counts come from ONE aggregation over
    3 groups."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (F.datediff(li.l_shipdate, o.o_orderdate) > 60),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q15: top supplier — scalar MAX subquery over a derived revenue view
# --------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                   * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
                   AS total_rev
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    in one quarter — the derived-view + scalar-MAX-subquery query
    (the only TPC-H query defined via a view). Faithful; the driver
    supplier just lacks address/phone output columns.

    Plan: the quarter predicate pushes into the scan; ONE aggregation
    builds the revenue view, persisted once so the scalar MAX (a
    one-row aggregate broadcast back as a cross join) and the equality
    filter share a single computation — no second lineitem scan
    (ReuseExchange would not canonicalize the two consumers) and no
    single-partition exchange of supplier-grain rows (the window form
    this replaces). Equality compare on exact decimals keeps ties,
    like the SQL."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            dec("l_extendedprice", 14, 2)
            * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
        ).alias("total_rev")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = revenue.persist()
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 variant: parts/supplier relationship — distinct count + NOT IN
# --------------------------------------------------------------------------


@register(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 20, 28, 36, 45)
      AND sp.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.00
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), schema variant: how
    many distinct suppliers can supply parts of each surviving
    (brand, type, size) combination, excluding a complaint blacklist —
    the COUNT(DISTINCT) + NOT-IN-subquery query. supply := distinct
    lineitem pairs; "complaints" := s_acctbal < 0 (module docstring;
    the blacklist column s_comment doesn't exist).

    Plan: the part attribute filters broadcast into the supply pairs;
    the blacklist is a broadcast LEFT ANTI join (safe here — the
    subquery's key is non-null by construction, so NOT IN == anti
    join); COUNT(DISTINCT l_suppkey) runs as Spark's two-phase
    distinct-aggregate expand on the (brand, type, size) grain."""
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.00
    ).select("s_suppkey")
    return (
        _supply(spark, sf_dir)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


# --------------------------------------------------------------------------
# Q17 variant: small-quantity-order revenue — per-group scalar rejoin
# --------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               COUNT(*) AS cnt,
               SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sumq
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) / 7.0
           AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND 5.00 * CAST(l.l_quantity AS DECIMAL(8,2)) * a.cnt < a.sumq
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue), schema variant:
    yearly-averaged revenue lost if Brand#7 orders below 20% of the
    part's average quantity were not taken — the correlated per-group
    AVG + rejoin query (p_container doesn't exist, so the filter is
    brand-only).

    Determinism: the original `l_quantity < 0.2 * AVG(l_quantity)`
    compares against a float division; both engines instead evaluate
    the cross-multiplied EXACT form `5 * qty * cnt < sum_qty` in
    decimals — same rows everywhere, no float boundary ties.

    Plan: the brand filter broadcasts into lineitem FIRST — the
    correlated stats are per part, and brand is a part attribute, so
    restricting before aggregating is lossless and shrinks the stats
    to only the brand's parts — then cnt/sumq come from a part-keyed
    WINDOW over that single scan (the aggregate-and-rejoin shape reads
    lineitem twice); the final sum is a one-row exact decimal."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = t(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#7"
    ).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .withColumn("sumq", F.sum(dec("l_quantity", 8, 2)).over(w))
        .where(
            F.lit(5.00).cast("decimal(4,2)")
            * dec("l_quantity", 8, 2)
            * F.col("cnt")
            < F.col("sumq")
        )
        .agg(
            (F.sum(dec("l_extendedprice", 14, 2)) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q19 variant: discounted revenue — disjunctive band-predicate join
# --------------------------------------------------------------------------


@register(
    "tpch_q19_banded_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
           AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_banded_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue), schema variant: revenue from
    three disjunctive (brand, size-band, quantity-band) clauses — the
    OR-of-conjunctions join predicate that tests an optimizer's
    ability to (a) still use the equi-join on partkey and (b) push the
    derivable residuals to each side. p_container/l_shipmode don't
    exist, so each clause uses brand × size × quantity only.

    Plan: Catalyst keeps the partkey equi-join and pushes the
    OR-derived brand/size union filter into the part scan and the
    quantity union band into the lineitem scan (PushedFilters shows
    both); the cross-side OR evaluates post-join on broadcast
    columns; one-row exact decimal sum."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .where(band)
        .agg(
            F.sum(
                dec("l_extendedprice", 14, 2)
                * (F.lit(1.00).cast("decimal(4,2)") - dec("l_discount", 4, 2))
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q20 variant: excess supply — semi-join chain into a HAVING subquery
# --------------------------------------------------------------------------


@register(
    "tpch_q20_excess_supply",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE '%red%'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l.l_partkey, l.l_suppkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(8,2))) > 40.00
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_excess_supply(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), schema variant: NATION_2
    suppliers who moved more than a threshold quantity of some 'red'
    part in 1997 — the IN-subquery-over-grouped-HAVING chain (Q20's
    signature nesting, with availqty > 0.5*sum(qty) replaced by a
    fixed per-(part,supplier) quantity threshold since partsupp
    doesn't exist).

    Plan: the 'red' part filter broadcasts into the year-pruned
    lineitem scan; ONE aggregation on the (part, supplier) pair grain;
    the IN compiles to a broadcast LEFT SEMI join into the (tiny)
    nation-filtered supplier dim. Exact-decimal quantity sum makes the
    HAVING boundary engine-independent."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", 8, 2)).alias("sq"))
        .where(F.col("sq") > F.lit(40.00).cast("decimal(8,2)"))
        .select("l_suppkey")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_2"
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 variant: suppliers who kept orders waiting — EXISTS + NOT EXISTS
# --------------------------------------------------------------------------


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND datediff('day', o.o_orderdate, l.l_shipdate) > 180
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    allp AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_9'
      AND EXISTS (
          SELECT 1 FROM allp l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM late l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), schema variant:
    NATION_9 suppliers who were the ONLY late supplier on a
    multi-supplier finished order — the EXISTS + NOT-EXISTS
    double-correlation, the hardest nesting in the suite. "late" :=
    shipped > 180 days after ordering (no l_receiptdate/l_commitdate;
    module docstring); the count grain is distinct (order, supplier)
    pairs, pinned identically in both engines via the `late` CTE.

    Plan: instead of two correlated self-joins, ONE pass computes per
    (order, supplier) whether that supplier shipped late, then an
    order-keyed window derives both quantifier counts — `n_all`
    suppliers on the order and `n_late` late suppliers:
    EXISTS(other supplier) ⇔ n_all ≥ 2, NOT EXISTS(other late) ⇔
    n_late = 1 (l1 itself is late). lineitem and orders are each
    scanned ONCE (the naive late/all/counts formulation scans lineitem
    three times — ReuseExchange doesn't rescue it); total cost is the
    pair aggregation shuffle plus one order-keyed window exchange of
    pair-grain rows. The supplier dim broadcasts; top-100 ranked by
    (numwait desc, name)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                    > 180
                ).cast("int")
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    pair = pair.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_all"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_9"
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        pair.where(
            (F.col("is_late") == 1)
            & (F.col("n_all") >= 2)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
