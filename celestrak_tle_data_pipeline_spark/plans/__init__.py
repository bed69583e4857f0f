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
)

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: these 50 names — at least one official
# representative per SURVEY.md §2 family (sources, relational, joins, aggs,
# windows, TLE parse bundle, text/dedup, vectors, multimodal, weather) —
# are emitted first. Everything else registered stays available after them
# as bonus coverage. ``tests/test_registry.py`` pins this list.
_PRIORITY = (
    # relational / joins / scans
    "pricing_summary",
    "top_revenue_orders",
    "antijoin_composite_key",
    "semijoin_exists",
    "first_order_per_customer",
    "pruned_scan_recent",
    "rollup_order_status",
    "pivot_status_counts",
    "scalar_functions_bundle",
    "outer_join_nation_coverage",
    # advanced aggregation / stats
    "cube_status_priority",
    "grouping_sets_status_priority",
    "stats_moments_by_flag",
    "percentile_quartiles",
    "bag_set_ops",
    "range_band_join",
    "salted_heavy_hitters",
    "ntile_lead_lag_orders",
    # window functions / temporal
    "running_customer_spend",
    "tumbling_daily_value",
    "session_windows",
    "asof_join_latest_purchase",
    "ewma_anomaly_by_user",
    # TLE domain (fixed-width parse bundle)
    "tle_parse_telemetry",
    "tle_bstar_decode",
    "tle_epoch_pivot_sweep",
    "tle_assembly_stride3",
    "tle_decay_flagship",
    # text analysis / dedup
    "text_profile",
    "text_quality_score",
    "lang_id_ngram",
    "exact_dup_groups",
    "simhash_near_dup",
    "minhash_lsh_recall",
    "ngram_shingle_jaccard",
    "tfidf_top_terms",
    "token_count_regex",
    "doc_fingerprint_rolling",
    "dup_cluster_components",
    # similarity search / vectors
    "cosine_topk_exact",
    "ann_ivf_topk",
    "embedding_cosine_near_dup",
    "embedding_sq8_recall",
    "ann_lsh_recall",
    # multimodal / semi-structured
    "props_maptype",
    "multimodal_meta_profile",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    # weather domain
    "flux_parse",
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
