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
    "bank_r17",
    "bank_r18",
)

# The round whose official CORRECTNESS gate this window targets. The
# rotation invariant ("every _PRIORITY name is first-time") is checked
# against rounds STRICTLY BEFORE this one: once the driver writes this
# round's own CORRECTNESS file, the window names ARE official — that is
# the point — so tests/test_registry.py excludes rounds >= WINDOW_ROUND
# from the recycled-name glob (the r10 verdict's era-proofing fix).
WINDOW_ROUND = 18

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-18 rotation: CORRECTNESS_r17 is 50/50 green — nothing to re-green,
# so the whole window turns over to first-time names again: the pre-staged
# 49-query bank (``plans/bank_r18.py``, X641+) flips live in registration
# order, and the 50th slot is ``updown_runs_test``, promoted from the
# round-19 bank (VERDICT r17 item 1 directed the promotion — the
# mean_excess_slope / fisher_stouffer_combined precedent).
_PRIORITY = (
    # --- round-18 bank flip (X641+, bank_r18.BANK_QUERIES order;
    # the 50th name is updown_runs_test, promoted from the
    # round-19 bank — VERDICT r17 item 1: no red name was left to
    # re-green after the 50/50 r17 window) ---
    "lorenz_dominance_check",
    "dkw_band_lognormal_check",
    "hoover_pietra_index",
    "gastwirth_trimean_panel",
    "fgt_poverty_panel",
    "watts_sen_poverty",
    "max_to_sum_ratios",
    "zenga_bonferroni_ordinates",
    "wolfson_polarization",
    "generalized_entropy_panel",
    "generalized_lorenz_dominance",
    "relative_distribution_mrp",
    "kakwani_discount_progressivity",
    "reynolds_smolensky_redistribution",
    "qq_tail_estimator",
    "extremal_index_runs",
    "dagum_gini_decomposition",
    "rachev_ratio_tails",
    "calmar_sterling_panel",
    "kelly_fraction_daily",
    "spectral_risk_exponential",
    "moment_bound_certificates",
    "laplace_trend_test",
    "crow_amsaa_growth",
    "ttt_barlow_proschan",
    "foster_stuart_records",
    "zip_score_test",
    "dean_overdispersion_test",
    "adjusted_rand_index",
    "fowlkes_mallows_bcubed",
    "variation_of_information",
    "pabak_prevalence_bias",
    "smape_wape_panel",
    "leverage_effect_corr",
    "fano_factor_timescales",
    "aggvar_hurst",
    "first_passage_time_panel",
    "westenberg_iqr_test",
    "auc_hanley_mcneil_ci",
    "ratio_regression_estimators",
    "ord_plot_family",
    "dcca_coefficient",
    "schweizer_wolff_sigma",
    "hhi_concentration_trend",
    "gpd_shape_stability",
    "block_bootstrap_se",
    "berry_esseen_certificate",
    "moses_extreme_reactions",
    "hodges_lehmann_walsh_ci",
    "updown_runs_test",
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
