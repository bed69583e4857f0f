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
        "tpch": {"tpch_q6_forecast_revenue", "tpch_q3_shipping_priority"},
        "aggs": {"stats_moments_by_flag", "salted_heavy_hitters"},
        "sketches": {"approx_distinct_hll", "approx_quantile_bounds"},
        "windows": {"session_windows", "asof_join_latest_purchase"},
        "analytics": {"cohort_retention", "funnel_conversion"},
        "tle": {"tle_parse_telemetry", "tle_decay_flagship"},
        "text": {"exact_dup_groups", "minhash_native_near_dup"},
        "vectors": {"cosine_topk_exact", "embedding_pq_recall"},
        "multimodal": {"multimodal_decode_stub", "props_maptype"},
        "weather": {"flux_parse", "flux_rotation_anomaly"},
    }
    for family, reps in families.items():
        assert reps <= window, f"family {family} missing from first-50 window"


def test_priority_outputs_are_scalar(spark):
    # Driver-canonicalizer contract (see plans/__init__.py docstring):
    # the driver sorts result cells with pandas, which cannot order
    # list/dict cells — a single array-typed output column makes an
    # otherwise-correct query officially RED (round 3's
    # multimodal_feature_extract). Build every priority query's plan
    # and reject nested types in its result schema.
    from pyspark.sql import types as T

    from conftest import SF_DIR

    qs = plans.all_queries()
    bad = []
    for name in _PRIORITY:
        schema = qs[name](spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar output columns in priority window: {bad}"
