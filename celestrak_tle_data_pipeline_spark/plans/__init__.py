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
    "next_window",
    "graph_ops",
    "round10",
)

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-10 rotation: CORRECTNESS_r09 is 50/50 green (the 45 flipped bank
# names plus 5 registration-order fall-throughs), so the whole r9 window
# rotates out and every r10 slot turns over to FIRST-TIME names — the five
# graph-analytics registrations that round 9 promised but never built
# (``plans/graph_ops.py``, X246-X250) plus round-10's fresh work
# (``plans/round10.py``). ``tests/test_registry.py::
# test_window_is_all_first_time_names`` machine-checks that no slot recycles
# an already-official name, and ``test_no_new_official_debt`` keeps the
# registered-but-never-official set empty. If the round ends with fewer than
# 50 fresh names, the remaining slots fall through to registration order
# (re-greens of round-2 core queries) — documented fall-through, never
# silent.
_PRIORITY = (
    # --- round-10 graph analytics (X246-X250, graph_ops.GRAPH_QUERIES) ---
    "trade_bipartite_degree_profile",
    "copurchase_projection_weighted",
    "copurchase_components_gated",
    "copurchase_kcore_peel",
    "seeded_ppr_copurchase",
    # --- round-10 fresh registrations (plans/round10.py, X251+) ---
    "dickey_fuller_unit_root",
    "kpss_level_stationarity",
    "breusch_pagan_koenker",
    "granger_causality_lag1",
    "arch_effect_mcleod_li",
    "spectral_entropy_daily",
    "turning_points_randomness",
    "sign_test_paired",
    "moods_median_test",
    "cliffs_delta_bucketed",
    "cohens_d_panel",
    "mcc_confusion_panel",
    "youden_j_threshold_scan",
    "brier_murphy_decomposition",
    "ansari_bradley_scale",
    "mrr_reciprocal_rank",
    "rank_biased_overlap_parts",
    "customer_inequality_panel",
    "fisher_price_index_monthly",
    "abc_xyz_inventory_grid",
    "interpurchase_gap_profile",
    "power_user_curve",
    "monthly_growth_yoy_panel",
    "yule_k_lexical_richness",
    "bigram_entropy_rate",
    "ngram_novelty_rate",
    "pmi_collocations_topk",
    "lsh_band_tuning_curve",
    "jl_projection_distortion",
    "copurchase_degree_assortativity",
    "copurchase_linkpred_scores",
    "lin_ccc_naive_forecast",
    "mantel_haenszel_weekday_strata",
    "page_trend_test",
    "weighted_kappa_agreement",
    "somers_d_gamma_panel",
    "sprt_purchase_rate_monitor",
    "vif_collinearity_audit",
    "retention_powerlaw_fit",
    "seasonal_esd_outliers",
    "naive_forecast_coverage_backtest",
    "component_overmerge_audit",
    "weekend_effect_ols",
    "hodges_lehmann_shift",
    "theil_u2_forecast_skill",
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
