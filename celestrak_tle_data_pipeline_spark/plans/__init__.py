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
    "bank_r11",
    "bank_r12",
    "bank_r13",
    "bank_r14",
    "bank_r15",
    "bank_r16",
)

# The round whose official CORRECTNESS gate this window targets. The
# rotation invariant ("every _PRIORITY name is first-time") is checked
# against rounds STRICTLY BEFORE this one: once the driver writes this
# round's own CORRECTNESS file, the window names ARE official — that is
# the point — so tests/test_registry.py excludes rounds >= WINDOW_ROUND
# from the recycled-name glob (the r10 verdict's era-proofing fix).
WINDOW_ROUND = 16

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-16 rotation: CORRECTNESS_r15 is 50/50 green — nothing to re-green,
# so the whole window turns over to first-time names again: the pre-staged
# 49-query bank (``plans/bank_r16.py``, X543+) flips live in registration
# order, and the 50th slot is ``fisher_stouffer_combined``, promoted from
# the round-17 bank (VERDICT r15 item 1 directed the promotion — the
# bartlett_sphericity / dersimonian_laird_meta precedent).
_PRIORITY = (
    # --- round-16 bank flip (X543+, bank_r16.BANK_QUERIES order;
    # the 50th name is fisher_stouffer_combined, promoted from the
    # round-17 bank — VERDICT r15 item 1: no red name was left to
    # re-green, so the slot goes to first-time staged work) ---
    "williams_dependent_corr",
    "kmo_adequacy",
    "peto_odds_ratio",
    "goodman_kruskal_tau",
    "uncertainty_coefficient",
    "granger_causality_f",
    "ccf_peak_lag",
    "knox_spacetime",
    "higher_criticism_panel",
    "storey_pi0_qvalues",
    "mack_wolfe_umbrella",
    "fisher_tornqvist_index",
    "association_rules_panel",
    "van_der_waerden_test",
    "klotz_scale_test",
    "fligner_killeen_scale",
    "hodges_ajne_circular",
    "geary_kurtosis_ratio",
    "palma_quintile_shares",
    "time_reversibility_trev",
    "german_tank_estimate",
    "longest_run_above_median",
    "press_predicted_r2",
    "eb_gamma_poisson_rates",
    "honore_sichel_richness",
    "embedding_hubness_skew",
    "sobel_mediation_test",
    "slope_equality_moderation",
    "scheirer_ray_hare_twoway",
    "qq_ventile_fit",
    "proper_scoring_panel",
    "tukey_nonadditivity",
    "ridit_analysis",
    "qn_scale_estimator",
    "shorth_lms_location",
    "circular_linear_correlation",
    "covariate_balance_smd",
    "vanderweele_evalue",
    "leik_ordinal_consensus",
    "greenwood_spacing_uniformity",
    "brand_beta_systematic",
    "lognormal_vs_exponential_fit",
    "supplier_price_dispersion",
    "exceedance_correlation",
    "gini_correlation_pair",
    "partial_auc_low_fpr",
    "direct_standardized_rates",
    "frequency_severity_decomposition",
    "dekkers_moment_tail",
    "fisher_stouffer_combined",
)

# Registry names that are rows-only BY DESIGN (registered without a DuckDB
# oracle: MLlib LSH internals are not ANSI-SQL-expressible; exactness is
# carried by the gated recall-1.0 twins minhash_lsh_recall/ann_lsh_recall).
ROWS_ONLY = ("minhash_near_dup", "ann_lsh_bucketed")


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
