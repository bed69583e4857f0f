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
)

# The round whose official CORRECTNESS gate this window targets. The
# rotation invariant ("every _PRIORITY name is first-time") is checked
# against rounds STRICTLY BEFORE this one: once the driver writes this
# round's own CORRECTNESS file, the window names ARE official — that is
# the point — so tests/test_registry.py excludes rounds >= WINDOW_ROUND
# from the recycled-name glob (the r10 verdict's era-proofing fix).
WINDOW_ROUND = 11

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-11 rotation: CORRECTNESS_r10 is 50/50 green, so the whole r10 window
# rotates out and round 11 flips the pre-staged bank (``plans/bank_r11.py``,
# X296-X344) live — 49 first-time oracle-paired names in bank registration
# order — and fills the last slot with ``ann_lsh_bucketed`` (MLlib LSH
# internals, no SQL oracle by design) so the official record shows its
# rows-only status explicitly instead of "never gated" (r10 verdict item 7).
# The verdict also asked for ``minhash_near_dup`` in the tail, but that name
# already HAS an official rows-only record (CORRECTNESS_r02, err=no_oracle)
# — windowing it again would recycle an official name, so its slot went to
# bank query X344 instead. The bank's last three queries (X345-X347)
# deferred to the round-12 staged bank (``plans/bank_r12.py``) to keep the
# 50-slot arithmetic exact.
# ``tests/test_registry.py::test_window_is_all_first_time_names``
# machine-checks that no slot recycles a name official before WINDOW_ROUND,
# and ``test_no_new_official_debt`` keeps the registered-but-never-official
# set empty.
_PRIORITY = (
    # --- round-11 bank flip (X296-X343, bank_r11.BANK_QUERIES order) ---
    "cramer_von_mises_watson",
    "anderson_darling_two_sample",
    "kuiper_two_sample",
    "mood_scale_ranks",
    "quantile_shape_panel",
    "sample_entropy_daily",
    "permutation_entropy_daily",
    "variance_ratio_daily",
    "variogram_daily_lags",
    "pot_gpd_pwm_fit",
    "hapax_richness_panel",
    "burrows_delta_sources",
    "js_divergence_sources",
    "kneser_ney_discounts",
    "log_odds_dirichlet_terms",
    "msttr_segmental_ttr",
    "fleiss_kappa_days",
    "did_2x2_panel",
    "rdd_local_linear",
    "inspection_paradox_gaps",
    "rich_club_coefficient",
    "embedding_anisotropy_panel",
    "net_dollar_retention_cohort",
    "duplicate_invoice_heuristic",
    "harrell_c_index_sessions",
    "kendalls_w_concordance",
    "quade_test",
    "seasonal_strength_panel",
    "pattern_vshape_daily",
    "record_counts_test",
    "transfer_entropy_daily",
    "huber_one_step_location",
    "simpsons_paradox_audit",
    "poisson_rate_ratio_weekend",
    "markov_entropy_rate_events",
    "pinball_loss_backtest",
    "intermittent_demand_sbc",
    "ks_uniform_dayofmonth",
    "dimension_participation_ratio",
    "anderson_darling_k_sample",
    "seasonal_mann_kendall",
    "heldout_unigram_crossent",
    "upper_tail_dependence_daily",
    "topk_churn_monthly",
    "chao1_vocabulary_estimate",
    "prr_error_by_weekday",
    "split_half_reliability_users",
    "categorical_association_matrix",
    "retention_half_life_cohorts",
    # --- rows-only tail (r10 verdict item 7): no SQL oracle by design;
    # the driver records the weaker rows-only check for this one.
    # (minhash_near_dup, its twin, already has its official rows-only
    # record from CORRECTNESS_r02 — recycling it would break the
    # first-time-names invariant.) ---
    "ann_lsh_bucketed",
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
