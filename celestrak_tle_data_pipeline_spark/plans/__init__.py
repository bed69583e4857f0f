"""Query registry — the engine's analytics surface.

Every operator from SURVEY.md §2 (plus the [EXT] LLM-data operators) is
exposed as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, where ANSI-SQL-expressible, a matching DuckDB oracle
string. The driver's correctness gate compares the two per name
(row-count + schema + order-insensitive value hash).

Determinism contract (what makes value hashes match):
- Sums/averages of doubles go through fixed-scale DECIMAL casts
  (exact, order-independent arithmetic) and are cast back to DOUBLE at
  the end — identical bits in any engine, no float-summation-order
  dependence.
- Every LIMIT/top-k ranks with a total order (explicit tiebreak keys).
- Timestamp arithmetic is integer-µs; session timezone pinned UTC.
- Rounded columns whose exact value can sit just below zero append
  ``+ 0.0`` in BOTH engines: ``round`` propagates IEEE negative zero
  and the driver canonicalizer renders ``-0`` ≠ ``0``
  (tle_j2_secular_rates' critical-inclination row found this).

Driver-canonicalizer contract (priority-window queries): result
columns must be SCALAR types only — no array/map/struct columns. The
driver canonicalizes results by sorting a pandas frame, and pandas
cannot order list cells (``TypeError: unhashable type: 'list'`` took
down ``multimodal_feature_extract`` in round 3 despite correct
values). Project vectors to ``f1..fN`` columns via ``element_at`` or
explode to (id, idx, value) rows before returning;
``tests/test_registry.py::test_priority_outputs_are_scalar`` enforces
this at test time.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

_MODULES = (
    "relational",
    "windows",
    "tle_domain",
    "ext_text",
    "ext_vectors",
    "ext_multimodal",
    "stats",
    "weather_domain",
    "ext_udf",
    "ext_pipeline",
    "analytics",
    "tpch",
    "ext_ml",
    "stats_tests",
)

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-6 rotation: CORRECTNESS_r05 is 50/50 green, so the whole r5 window
# rotates out. In: 49 of the 50 oracle-paired registry entries that have
# never appeared in an official driver window (all mirror-green under
# tools/check.py), plus ``sliding_weekly_value``, whose ONLY official
# record is the r4 hash FAIL (fixed in round 5, mirror-green since) — a
# failing official record outranks a missing one. Registry at the end of
# round 5: 183 entries, 181 oracle-paired. Cumulative official coverage
# after this round: 136 + 50 - 1 re-certification = 185 name-rounds over
# 184 distinct names ⇒ every oracle-paired entry official except
# ``histogram_order_totals`` (deferred to round 7 to make room for the
# re-certification) and rows-only-by-design ``minhash_near_dup`` /
# ``ann_lsh_bucketed`` (recall-1.0 twins gate their MLlib internals).
# Round-7 window seed: histogram_order_totals + every round-6
# registration (the registry entries not in this round's _PRIORITY and
# absent from all CORRECTNESS_r* files). Compute the authoritative list
# at rotation time:
#   officials = union of keys of CORRECTNESS_r0*.json
#   backlog   = [n for n in all_oracles() if n not in officials
#                and n not in _PRIORITY]
_PRIORITY = (
    # official-FAIL re-certification (r4 hash mismatch, fixed in r5)
    "sliding_weekly_value",
    # SQL surface / relational extensions
    "sql_api_revenue_filter",
    "sql_filter_clause_aggregates",
    "null_semantics_bundle",
    "unpivot_price_bands",
    "cross_join_coverage_matrix",
    "distinct_part_counts",
    "rollup_grouping_id",
    # windows / temporal
    "window_distribution_functions",
    "value_range_frame_sum",
    "gap_fill_daily_user",
    "resample_hourly_interpolate",
    "trailing_median_per_user",
    "rolling_weekly_median",
    "asof_join_forward",
    "event_lateness_audit",
    # text / dedup / training-data ops
    "repetition_profile",
    "per_group_quality_filter",
    "qgram_prefix_filter_pairs",
    "dedup_best_quality_survivor",
    # vectors / ML / ER
    "embedding_label_stats",
    "dup_graph_bfs3",
    "sorted_neighborhood_pairs",
    # multimodal codecs
    "multimodal_wav_decode",
    "multimodal_y4m_frames",
    # stats / sketches
    "mad_outlier_filter",
    "equidepth_histogram",
    "benford_first_digit",
    "countmin_heavy_hitters",
    "approx_topk_events",
    # product analytics
    "session_path_analysis",
    "funnel_time_bounded",
    "attribution_first_last_touch",
    "rolling_weekly_active_users",
    "weekly_growth_rate",
    "cohort_cumulative_ltv",
    "share_of_parent_rollup",
    "pareto_decile_analysis",
    "market_concentration_hhi",
    "k_anonymity_audit",
    # TPC-H classics (final tranche)
    "tpch_q4_priority_late_ship",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_line_priority",
    "tpch_q14_promo_revenue",
    "tpch_q16_parts_supplier_counts",
    "tpch_q19_banded_revenue",
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def _ordered(table: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    out = {n: table[n] for n in _PRIORITY if n in table}
    out.update({n: v for n, v in table.items() if n not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
