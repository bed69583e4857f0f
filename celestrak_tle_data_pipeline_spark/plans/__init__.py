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
    "ext_ml",
)

# The driver's correctness gate evaluates the FIRST 50 registry entries, so
# ordering is part of the contract: the 50 names emitted first are that
# round's official window. Everything else registered stays available after
# them as bonus coverage. ``tests/test_registry.py`` pins this list.
#
# Round-5 rotation: every name in the r4 window is officially green in
# CORRECTNESS_r04 (sliding_weekly_value's HUGEINT-cast fix landed this
# round), so the whole window rotates: 45 queries that had judge-only
# verification (added in rounds 3-4, all green under tools/check.py's
# protocol mirror) plus the 5 new round-5 operators (ext_ml.py). Cumulative
# official coverage after this round: 82 + 50 = 132 of 176 registry
# entries. Remaining never-official backlog (44, spread over rounds
# 6-7): 10 TPC-H
# (q4 q5 q7 q8 q10 q11 q12 q14 q16 q19) + unpivot_price_bands,
# sql_api_revenue_filter, window_distribution_functions,
# gap_fill_daily_user, distinct_part_counts, mad_outlier_filter,
# approx_topk_events, histogram_order_totals, embedding_label_stats,
# per_group_quality_filter, repetition_profile + the round-5 bonus ops
# registered after the window (survivor selection, BFS, SNM blocking,
# equi-depth histogram, WAU, WoW growth, Count-Min, q-gram prefix
# filter, attribution, share-of-parent, rolling median, LTV,
# WAV/Y4M codecs, k-anonymity, bounded funnel, path mining, HHI,
# Benford, Pareto deciles, forward as-of, lateness audit).
_PRIORITY = (
    # SQL surface / relational extensions
    "sql_parameterized_top_orders",
    "sorted_string_agg_segments",
    "try_arithmetic_bundle",
    "recursive_cte_subtree_rollup",
    # temporal joins
    "asof_join_with_tolerance",
    "interval_overlap_join_bucketed",
    # TLE domain
    "tle_decay_rate_fit",
    # text / dedup / training-data ops
    "decontamination_overlap",
    "sequence_packing_chunks",
    "mixture_budget_plan",
    "levenshtein_fuzzy_pairs",
    "vocab_oov_rate",
    "dup_graph_pagerank",
    "split_leakage_audit",
    "unigram_lm_score",
    "bm25_topk_docs",
    "reservoir_sample_per_source",
    "duplicate_ngram_spans",
    "token_vote_classifier",
    # vectors / ML
    "vector_hof_bundle",
    "hard_negative_mining",
    "kmeans_lloyd_integer",
    "item_cooccurrence_cosine",
    # multimodal / semi-structured
    "props_variant_rollup",
    "multimodal_ppm_decode",
    # stats
    "pareto_frontier_orders",
    "winsorized_stats_by_status",
    "seasonal_dow_decompose",
    # UDF/UDTF/Arrow surfaces
    "udaf_gini_quantity",
    "udtf_ngram_expand",
    "arrow_batch_token_stats",
    "udtf_dynamic_split_fields",
    # pipeline / governance / layout
    "rollup_cascade_daily",
    "dataset_split_assign",
    "pii_scrub_contacts",
    "snapshot_diff_dim",
    "zorder_morton_layout",
    "incremental_agg_merge",
    # product analytics
    "event_transition_matrix",
    "rfm_segmentation",
    "autocorr_lag1_by_user",
    "event_cooccurrence_pairs",
    # TPC-H classics (second tranche)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_supply",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
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
