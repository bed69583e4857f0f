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
