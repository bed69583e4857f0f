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
# Round-7 rotation: CORRECTNESS_r06 is 50/50 green, so the whole r6 window
# rotates out. The never-official oracle-paired backlog at the end of round
# 6 was 70 names (= all_oracles() minus the union of CORRECTNESS_r0*.json
# keys minus the r6 window) — more than one 50-slot window, so this round
# prioritizes per the r6 verdict: (a) the scale-twin / gate certifications
# whose whole point is an official row, (b) the full experimentation /
# statistical-testing tier, (c) the codec/text additions, plus
# ``histogram_order_totals`` (deferred in r5 and r6), plus the four queries
# the r6 advisor's fixes touched (drawdown, clamped balance, CUPED,
# centroid confusion — an official row should certify the FIXED
# semantics). The documented round-8 remainder is the 20 deferred names
# (sql_lateral_topn_per_segment, debounce_first_per_burst,
# session_entry_exit_matrix, tle_j2_secular_rates, tle_theil_sen_decay,
# fd_violation_profile, neyman_allocation_sources, l_diversity_audit,
# join_size_sample_estimate, kaplan_meier_sessions, scd2_asof_lookup,
# cumulative_distinct_users, seasonal_naive_mase, association_rules_parts,
# time_to_convert_quartiles, attribution_linear_touch,
# discount_quantity_elasticity, holt_linear_forecast,
# open_order_backlog_sweep, shipping_sla_attainment) plus round-7's five
# new registrations (pareto_decile_ranged, cdc_warehouse_roundtrip,
# document_chunks_overlap, streaming_sessions_finalized,
# streaming_trailing_median) = 25 names — exactly one final window; no
# further round-7 registrations so the cap holds. The late-round-7 ops
# surfaces (X167-X175: state introspection, exactly-once CDC apply,
# compaction, schema evolution, streaming Python source, quality gate,
# ops-loop composition, Z-order recluster, maintenance vacuum) are deliberately pytest-gated, NOT registry
# queries, so the 25-name cap stands; round 8 therefore has ~25 free
# window slots for any new oracle-paired registrations.
_PRIORITY = (
    # (a) scale-twin / gate certifications (r6 verdict priority 1a)
    "equidepth_histogram_bounded",
    "sorted_neighborhood_ranged",
    "zorder_skipping_gate",
    "hilbert_curve_layout",
    "rowhash_table_digest",
    # twice-deferred fixed-width histogram
    "histogram_order_totals",
    # (b) experimentation / statistical-testing tier
    "ab_experiment_readout",
    "cuped_adjusted_ab",
    "srm_guardrail_check",
    "ab_difference_newcombe",
    "quantile_treatment_effect",
    "cem_matched_att",
    "power_analysis_mde",
    "mann_whitney_u_values",
    "ks_two_sample_values",
    "chi2_independence_type_dow",
    "chi2_cell_residuals",
    "anova_value_by_dow",
    "mutual_information_type_dow",
    "cohens_kappa_agreement",
    "auc_rank_score",
    "score_calibration_bins",
    "gains_chart_deciles",
    # (c) codec / text additions
    "y4m_scene_cuts",
    "multimodal_ppm_resize",
    "winnowing_fingerprints",
    "ppjoin_token_sets",
    "bigram_lm_perplexity",
    "rake_keyphrases",
    # advisor-touched queries (official row certifies the fixed form)
    "user_value_drawdown",
    "clamped_running_balance",
    "centroid_classifier_confusion",
    # sketches (mergeability certifications)
    "bloom_membership_sketch",
    "hll_sketch_union_rollup",
    "kmv_intersection_estimate",
    "cm_selfjoin_size_estimate",
    # stats / order statistics
    "weighted_price_quantiles",
    "median_ci_order_stats",
    "psi_value_drift",
    "hill_tail_exponent",
    # text / corpus / training-data ops
    "corpus_curation_funnel",
    "heaps_law_fit",
    "zipf_slope_tokens",
    "vocab_coverage_curve",
    "length_bucket_padding_waste",
    "split_distribution_divergence",
    "mixture_interleave_schedule",
    # vectors / ML / graph
    "mmr_diversified_topk",
    "graph_clustering_coefficient",
    # CDC surface
    "cdc_apply_changes",
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
