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
# Round-8 rotation (the FINAL backlog window): CORRECTNESS_r07 is 50/50
# green, so the whole r7 window rotates out. The never-official
# oracle-paired backlog entering round 8 is EXACTLY 25 names (verified =
# all_oracles() minus the union of CORRECTNESS_r0*.json keys): the 20
# names pledged by the r6/r7 rotation comments plus round-7's five new
# registrations. All 25 head this window, closing the three-round
# official-green debt; the other 25 slots are filled by round-8's 25
# NEW registrations — the window is exactly full and the registered-
# but-never-official set is EMPTY by construction
# (``tests/test_registry.py::test_no_new_official_debt`` machine-checks
# this, so the debt class cannot recur silently).
#
# Work produced AFTER the window filled is pre-staged in
# ``plans/next_window.py`` (16 oracle-paired queries, gate-mirror
# verified at two SFs by ``tests/test_next_window.py``, 8x/64x-probed)
# and registers in round 9 — see that module's docstring for the
# mechanical flip.
_PRIORITY = (
    # --- the 25-name backlog: 20 pledged names (r6/r7 rotation comments) ---
    "sql_lateral_topn_per_segment",
    "debounce_first_per_burst",
    "session_entry_exit_matrix",
    "tle_j2_secular_rates",
    "tle_theil_sen_decay",
    "fd_violation_profile",
    "neyman_allocation_sources",
    "l_diversity_audit",
    "join_size_sample_estimate",
    "kaplan_meier_sessions",
    "scd2_asof_lookup",
    "cumulative_distinct_users",
    "seasonal_naive_mase",
    "association_rules_parts",
    "time_to_convert_quartiles",
    "attribution_linear_touch",
    "discount_quantity_elasticity",
    "holt_linear_forecast",
    "open_order_backlog_sweep",
    "shipping_sla_attainment",
    # --- ... plus round-7's five registrations ---
    "pareto_decile_ranged",
    "cdc_warehouse_roundtrip",
    "document_chunks_overlap",
    "streaming_sessions_finalized",
    "streaming_trailing_median",
    # --- round-8 registrations (new work lands official same-round) ---
    "streaming_dedup_within_watermark",
    "streaming_outer_join_nulls",
    "spearman_rank_corr",
    "bh_fdr_correction",
    "cusum_changepoint_scan",
    "partial_correlation_controls",
    "cochran_armitage_trend",
    "user_activity_streaks",
    "interval_coalesce_union",
    "asof_join_nearest",
    "referential_integrity_audit",
    "quantile_normalize_by_source",
    "t_closeness_audit",
    "ols_normal_equations",
    "gini_split_threshold",
    "weighted_sample_no_replacement",
    "nelson_aalen_hazard",
    "gopher_quality_rules",
    "bpe_pair_merge_step",
    "chi2_discriminative_terms",
    "tokenizer_fertility_profile",
    "mcnemar_paired_outcomes",
    "levene_brown_forsythe",
    "runs_test_randomness",
    "grubbs_max_outlier",
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
