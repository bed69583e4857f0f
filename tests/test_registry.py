"""Registry ordering contract.

The driver's correctness gate evaluates the first 50 entries of
``queries()`` in iteration order, so the ordering is load-bearing: every
SURVEY.md §2 family must surface at least one representative inside that
window. ``plans._PRIORITY`` pins the window; these tests keep it honest.
"""

from celestrak_tle_data_pipeline_spark import plans
from celestrak_tle_data_pipeline_spark.plans import _PRIORITY


def test_priority_is_exactly_the_first_50():
    names = list(plans.all_queries().keys())
    assert len(_PRIORITY) == 50
    assert names[:50] == list(_PRIORITY)


def test_priority_names_unique_and_registered():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    registered = plans.all_queries()
    assert all(n in registered for n in _PRIORITY)


def test_first_50_oracle_coverage():
    # Every priority query is value-checked against DuckDB: the MLlib
    # LSH paths are represented by their recall gates
    # (minhash_lsh_recall / ann_lsh_recall); the raw candidate surfaces
    # (minhash_near_dup / ann_lsh_bucketed) stay registered after the
    # window as rows-only bonus coverage.
    oracles = plans.all_oracles()
    assert all(n in oracles for n in _PRIORITY)


def test_family_representation_in_window():
    window = set(_PRIORITY)
    families = {
        "relational": {"pricing_summary", "antijoin_composite_key"},
        "aggs": {"cube_status_priority", "grouping_sets_status_priority"},
        "windows": {"session_windows", "asof_join_latest_purchase"},
        "tle": {"tle_parse_telemetry", "tle_decay_flagship"},
        "text": {"exact_dup_groups", "tfidf_top_terms"},
        "vectors": {"cosine_topk_exact", "embedding_sq8_recall"},
        "multimodal": {"multimodal_decode_stub", "props_maptype"},
        "weather": {"flux_parse"},
    }
    for family, reps in families.items():
        assert reps <= window, f"family {family} missing from first-50 window"
