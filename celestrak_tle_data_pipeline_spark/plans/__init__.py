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
)

# The round whose official CORRECTNESS gate this window targets. The
# rotation invariant ("every _PRIORITY name is first-time") is checked
# against rounds STRICTLY BEFORE this one: once the driver writes this
# round's own CORRECTNESS file, the window names ARE official — that is
# the point — so tests/test_registry.py excludes rounds >= WINDOW_ROUND
# from the recycled-name glob (the r10 verdict's era-proofing fix).
WINDOW_ROUND = 12

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-12 rotation: CORRECTNESS_r11 is 48/50 green + 1 rows-only-by-design
# (``ann_lsh_bucketed``) + exactly ONE hash-fail — ``kendalls_w_concordance``,
# whose oracle emitted DOUBLE where Spark emitted BIGINT (dtype only; values
# identical — r11 verdict item 1). Round 12 fixes that oracle (``s4 // 4``)
# and flips the pre-staged 49-query bank (``plans/bank_r12.py``, X345+) live
# in registration order, filling the 50th slot with the kendalls_w RE-GREEN.
# ``test_window_is_all_first_time_names`` counts only GREEN official records,
# so the hash-failed name stays windowable — a re-green slot is exactly what
# the rotation exists for.
_PRIORITY = (
    # --- round-12 bank flip (X345+, bank_r12.BANK_QUERIES order) ---
    "theil_between_within_nations",
    "wasserstein1_two_sample",
    "energy_distance_two_sample",
    "buishand_range_test",
    "snht_homogeneity_scan",
    "von_neumann_ratio_test",
    "bartels_rank_test",
    "cox_stuart_trend_test",
    "chatterjee_xi_daily",
    "bowker_symmetry_transitions",
    "goodman_kruskal_lambda",
    "renyi_entropy_spectrum",
    "taylors_power_law",
    "stuart_maxwell_test",
    "krippendorff_alpha_binary",
    "iv_wald_weekend",
    "shewhart_xbar_r_chart",
    "process_capability_cpk",
    "hosmer_lemeshow_calibration",
    "coleman_liau_ari_panel",
    "juilland_dispersion_terms",
    "token_char_entropy_topk",
    "hellinger_affinity_panel",
    "jackknife_richness_panel",
    "shapley_channel_attribution",
    "qini_uplift_deciles",
    "ar_aging_buckets",
    "eb_beta_binomial_shrinkage",
    "james_stein_nation_means",
    "wald_wolfowitz_runs",
    "siegel_tukey_scale",
    "conover_squared_ranks",
    "err_cascade_ranking",
    "rmst_sessions",
    "newey_west_trend_se",
    "siegel_repeated_medians_trend",
    "hoeffding_d_daily",
    "hash_permutation_mean_test",
    "exp_rate_lr_gaps",
    "ks_exponential_gaps",
    "yuen_trimmed_t",
    "breslow_day_homogeneity",
    "negbin_mom_fit",
    "naive_bayes_dow_type",
    "fellegi_sunter_match_weights",
    "cluster_validity_panel",
    "simplified_silhouette_labels",
    "hits_hubs_authorities",
    "modularity_brand_partition",
    # --- re-green (r11 official hash-fail, oracle dtype fixed this round;
    # the only non-first-time name, permitted because its sole official
    # record is RED) ---
    "kendalls_w_concordance",
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
