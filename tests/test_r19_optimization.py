"""Round-19 optimization pins (OPTIMIZATION_r19.md).

The r18 value-bucket device computed its bucket offsets
(``prefix_offsets``) and its grid totals (a separate scalar aggregate)
as independent subtrees over the same data-grain grid; column pruning
and the join-inferred ``isnotnull(pid)`` de-canonicalized the branches
so AQE re-executed the grid rollup once per consumer (verified in the
r18 runtime plans). r19 folds offsets AND totals into ONE
``bucket_prefix_totals`` pass and aligns every branch's scan predicate,
so the base subtree materializes once. These pins cover:

1. ``bucket_prefix_totals`` arithmetic (exclusive prefix + totals,
   both join shapes) on a hand-checked frame;
2. the executed (post-AQE) plans of the five rewritten queries hit
   their scan budgets — a regression that re-splits the base subtree
   re-adds full-table passes at 100 TB;
3. ``reynolds_smolensky_redistribution`` carries no persist (a
   fact-width cache at 100 TB is the guide-§5 scale killer r19
   removed).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from celestrak_tle_data_pipeline_spark.plans.common import (
    bucket_prefix_totals,
)

from conftest import SF_DIR

SF_DIR_01 = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    # collect() drives THIS Dataset's queryExecution, so executedPlan
    # afterwards is the final adaptive plan (a .write would plan a
    # fresh execution and show the pre-AQE tree with no stage reuse)
    df.collect()
    txt = df._jdf.queryExecution().executedPlan().toString()
    return txt.split("== Initial Plan ==")[0]


def test_bucket_prefix_totals_exact(spark):
    psums = spark.createDataFrame(
        [Row(pid=3, pn=7, px=30), Row(pid=1, pn=2, px=10),
         Row(pid=5, pn=4, px=20)]
    )
    for symmetric in (False, True):
        # the symmetric shape only guarantees identical results when
        # every off_<out> is consumed; pn qualifies in both shapes
        sums = {"pn": "pn"} if symmetric else {"pn": "pn", "px": "px"}
        out = {
            r["pid"]: r
            for r in bucket_prefix_totals(
                psums, sums, symmetric=symmetric
            ).collect()
        }
        assert [out[p]["off_pn"] for p in (1, 3, 5)] == [0, 2, 9]
        assert [out[p]["tot_pn"] for p in (1, 3, 5)] == [13, 13, 13]
        if not symmetric:
            assert [out[p]["off_px"] for p in (1, 3, 5)] == [0, 10, 40]
            assert [out[p]["tot_px"] for p in (1, 3, 5)] == [60] * 3


def test_device_queries_hit_scan_budget(spark):
    """Executed-plan scan counts for the five rewritten queries (the
    r18 formulations ran 4/5/3/4/7). The budget is structural: one
    scan for the shared grid subtree, plus only the scans that are
    provably irreducible without a persist (mrp's date-bounds pass,
    kakwani/reynolds' bucket-id distinct sides, reynolds' second
    grid key)."""
    from celestrak_tle_data_pipeline_spark.plans.bank_r18 import (
        dkw_band_lognormal_check,
        kakwani_discount_progressivity,
        qq_tail_estimator,
        relative_distribution_mrp,
        reynolds_smolensky_redistribution,
    )

    budgets = {
        dkw_band_lognormal_check: 1,
        qq_tail_estimator: 1,
        kakwani_discount_progressivity: 2,
        relative_distribution_mrp: 2,
        reynolds_smolensky_redistribution: 4,
    }
    for fn, budget in budgets.items():
        plan = _executed_plan(fn(spark, SF_DIR_01))
        got = plan.count("Scan parquet")
        assert got <= budget, (
            f"{fn.__name__}: {got} executed scans > budget {budget} — "
            f"the shared grid subtree split again (check column sets "
            f"and the explicit isnotnull filters)"
        )
        assert "InMemoryRelation" not in plan
        assert "InMemoryTableScan" not in plan


def test_device_offsets_match_global_window(spark):
    """The device's head values equal the global ordered cumulative it
    replaces, on a frame small enough to compute both ways."""
    from pyspark.sql import Window

    grid = (
        spark.range(0, 500)
        .select((F.col("id") * 37 % 997).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    gb = grid.withColumn("pid", F.expr("v div 100"))
    ot = bucket_prefix_totals(
        gb.groupBy("pid").agg(F.sum("c").cast("bigint").alias("pn")),
        {"pn": "pn"},
        symmetric=True,
    )
    local = F.sum("c").over(
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        r["v"]: (r["head"], r["n"])
        for r in gb.join(F.broadcast(ot), "pid")
        .select(
            "v",
            (F.coalesce(local, F.lit(0)) + F.col("off_pn")).alias(
                "head"
            ),
            F.col("tot_pn").alias("n"),
        )
        .collect()
    }
    want_rows = (
        grid.select(
            "v",
            F.coalesce(
                F.sum("c").over(
                    Window.orderBy("v").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("head"),
        )
        .collect()
    )
    n = sum(r["c"] for r in grid.collect())
    want = {r["v"]: (r["head"], n) for r in want_rows}
    assert got == want


def test_bucket_prefix_totals_keyed(spark):
    """keys=... restricts prefix and totals to the group (the lorenz
    per-half shape): offsets accumulate earlier buckets of the SAME
    group only, totals are per-group."""
    psums = spark.createDataFrame(
        [
            Row(half=1, pid=0, pn=3),
            Row(half=1, pid=2, pn=5),
            Row(half=2, pid=1, pn=7),
            Row(half=2, pid=3, pn=11),
        ]
    )
    out = {
        (r["half"], r["pid"]): (r["off_pn"], r["tot_pn"])
        for r in bucket_prefix_totals(
            psums, {"pn": "pn"}, symmetric=True, keys=("half",)
        ).collect()
    }
    assert out == {
        (1, 0): (0, 8),
        (1, 2): (3, 8),
        (2, 1): (0, 18),
        (2, 3): (7, 18),
    }
