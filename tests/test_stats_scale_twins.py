"""Scale-safe twins certify against their global-sort forms.

Round-5 verdict flagged two operators whose semantics certification
uses a single-partition global-order window (`ntile`, global `lead`):
correct, but the canonical 100x scale killer. The twins re-express the
same contract with boundary-broadcast / range-partitioned plans; these
tests pin (a) output agreement with the global form and (b) the absence
of any single-partition exchange in the twin's physical plan.
"""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark import plans

from conftest import SF_DIR


def _df(spark, name, sf=SF_DIR):
    return plans.all_queries()[name](spark, sf)


def _plan(spark, name, sf=SF_DIR):
    return _df(spark, name, sf)._jdf.queryExecution().executedPlan().toString()


def test_sorted_neighborhood_ranged_matches_global_form(spark):
    # boundary replication makes the range-partitioned window seam-free:
    # the candidate-pair set is IDENTICAL to the global-sort form
    ranged = {tuple(r) for r in _df(spark, "sorted_neighborhood_ranged").collect()}
    global_ = {tuple(r) for r in _df(spark, "sorted_neighborhood_pairs").collect()}
    assert ranged == global_
    assert len(ranged) > 0


def test_sorted_neighborhood_ranged_plan_has_no_global_sort(spark):
    plan = _plan(spark, "sorted_neighborhood_ranged")
    assert "Exchange SinglePartition" not in plan
    assert "Exchange rangepartitioning" in plan


def test_equidepth_bounded_plan_has_no_single_partition_window(spark):
    # the ntile form's defining flaw is Window over Exchange
    # SinglePartition; the bounded twin must not reproduce it. (The
    # percentile aggregate's final merge collapses ONE 9-double row,
    # not the fact table — that exchange is fine and unavoidable.)
    plan = _plan(spark, "equidepth_histogram_bounded")
    assert "Window" not in plan  # no window operator at all
    assert "BroadcastExchange" in plan  # boundary row broadcasts


def test_equidepth_bounded_agrees_with_ntile_form(spark):
    # rank-split (ntile) vs value-split (range lookup) bucket
    # populations differ by at most 1 per bucket on distinct values:
    # ntile places remainder rows in leading buckets, quantile_cont
    # cuts at 1+(N-1)q. Certify that bound plus identical totals.
    ntile = {
        r["bucket"]: r["n_rows"]
        for r in _df(spark, "equidepth_histogram").collect()
    }
    bounded = {
        r["bucket"]: r["n_rows"]
        for r in _df(spark, "equidepth_histogram_bounded").collect()
    }
    assert set(ntile) == set(bounded) == set(range(1, 11))
    assert sum(ntile.values()) == sum(bounded.values())
    for b in ntile:
        assert abs(ntile[b] - bounded[b]) <= 1, (b, ntile[b], bounded[b])


def test_pareto_decile_ranged_plan_is_window_free(spark):
    # the ntile form's defining flaw (r6 verdict X73) is NTILE over an
    # unpartitioned customer-grain window; the ranged twin must carry
    # no window operator at all — boundaries broadcast back, the
    # cumulative curve is a triangular self-join over the 10-row
    # decile aggregate
    plan = _plan(spark, "pareto_decile_ranged")
    assert "Window" not in plan
    assert "BroadcastExchange" in plan  # boundary row broadcasts


def test_pareto_decile_ranged_agrees_with_ntile_form(spark):
    # rank-split (ntile) vs value-split (percentile boundary) decile
    # populations differ by at most 1 per decile on distinct revenues:
    # ntile places remainder rows in leading deciles, quantile_cont
    # cuts at 1+(N-1)q. Certify that bound plus identical totals and
    # a monotone cumulative-share curve ending at 1.
    ntile = {
        r["decile"]: r["n_customers"]
        for r in _df(spark, "pareto_decile_analysis").collect()
    }
    ranged_rows = _df(spark, "pareto_decile_ranged").collect()
    ranged = {r["decile"]: r["n_customers"] for r in ranged_rows}
    assert set(ntile) == set(ranged) == set(range(1, 11))
    assert sum(ntile.values()) == sum(ranged.values())
    for d in ntile:
        assert abs(ntile[d] - ranged[d]) <= 1, (d, ntile[d], ranged[d])
    cum = [r["cum_share"] for r in sorted(ranged_rows, key=lambda r: r["decile"])]
    assert all(a <= b for a, b in zip(cum, cum[1:]))
    assert abs(cum[-1] - 1.0) < 1e-12


def _no_window_or_sort_over_single_partition(plan):
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        ctx = plan[max(0, m.start() - 500):m.start()]
        assert "Window" not in ctx
        assert not ("Sort " in ctx and "TakeOrdered" not in ctx)


def test_systematic_sample_plan_has_no_global_cumsum(spark):
    # r6 verdict X22: the cumulative character axis must not be an
    # unpartitioned running-sum window. r19: the ranged device became
    # the deterministic doc_id-bucket device — the cumsum rides
    # hashpartitioning(pid) windows with broadcast bucket offsets, no
    # range partition (whose boundary sampling re-ran the rollup) and
    # no stability persist. The only SinglePartition exchanges left
    # are scalar merges (one row), never under a Window or Sort.
    plan = _plan(spark, "systematic_weighted_sample")
    assert "hashpartitioning(pid" in plan
    assert "rangepartitioning" not in plan
    assert "InMemoryRelation" not in plan
    _no_window_or_sort_over_single_partition(plan)


def test_pareto_frontier_plan_merges_partition_frontiers(spark):
    # r6 verdict X44: the skyline's running max must not sort the
    # near-continuous price grain through one partition. The rewrite
    # range-partitions the price-grain aggregate, runs the
    # strictly-preceding max per partition, and folds in a broadcast
    # per-partition carry (frontier(A∪B) = frontier(frontier(A) ∪
    # frontier(B))).
    plan = _plan(spark, "pareto_frontier_orders")
    assert "Exchange rangepartitioning" in plan
    _no_window_or_sort_over_single_partition(plan)
