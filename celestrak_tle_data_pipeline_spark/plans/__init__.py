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
)

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: these 50 names — at least one official
# representative per SURVEY.md §2 family (sources, relational, joins, aggs,
# windows, TLE parse bundle, text/dedup, vectors, multimodal, weather) —
# are emitted first. Everything else registered stays available after them
# as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-4 rotation: 18 twice/once-green stalwarts (top_revenue_orders,
# semijoin_exists, first_order_per_customer, rollup_order_status,
# pivot_status_counts, outer_join_nation_coverage, cube_status_priority,
# grouping_sets_status_priority, percentile_quartiles, bag_set_ops,
# ntile_lead_lag_orders, running_customer_spend, tumbling_daily_value,
# text_profile, lang_id_ngram, doc_fingerprint_rolling, tfidf_top_terms,
# token_count_regex — all green in CORRECTNESS_r02/r03, still registered
# after the window) rotated out for the round-3 operators that had
# judge-only verification, so cumulative official coverage keeps growing.
_PRIORITY = (
    # relational / joins / scans
    "pricing_summary",
    "antijoin_composite_key",
    "pruned_scan_recent",
    "scalar_functions_bundle",
    # TPC-H classics (rotated in r4)
    "tpch_q6_forecast_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    # advanced aggregation / stats / sketches
    "stats_moments_by_flag",
    "range_band_join",
    "salted_heavy_hitters",
    "approx_distinct_hll",
    "approx_quantile_bounds",
    "systematic_weighted_sample",
    # window functions / temporal
    "session_windows",
    "asof_join_latest_purchase",
    "ewma_anomaly_by_user",
    "sliding_weekly_value",
    "dynamic_gap_sessions",
    "locf_forward_fill",
    # product analytics (rotated in r4)
    "cohort_retention",
    "funnel_conversion",
    "scd2_state_history",
    # governance
    "data_quality_audit",
    # TLE domain (fixed-width parse bundle)
    "tle_parse_telemetry",
    "tle_bstar_decode",
    "tle_epoch_pivot_sweep",
    "tle_assembly_stride3",
    "tle_decay_flagship",
    "tle_regime_neighbors",
    # text analysis / dedup
    "text_quality_score",
    "exact_dup_groups",
    "simhash_near_dup",
    "minhash_lsh_recall",
    "minhash_native_near_dup",
    "ngram_shingle_jaccard",
    "dup_cluster_components",
    "dup_graph_triangles",
    # similarity search / vectors
    "cosine_topk_exact",
    "ann_ivf_topk",
    "embedding_cosine_near_dup",
    "embedding_sq8_recall",
    "embedding_pq_recall",
    "ann_lsh_recall",
    # multimodal / semi-structured
    "props_maptype",
    "multimodal_meta_profile",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    # weather domain
    "flux_parse",
    "flux_rotation_anomaly",
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
