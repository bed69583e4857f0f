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
    # Round-6 window: every r5 name went officially green, so the whole
    # window rotated to the never-official backlog plus the
    # sliding_weekly_value re-certification. Families whose every member
    # is already officially green (weather, TLE parse, UDF surfaces,
    # pipeline/governance) have no r6 representative by design —
    # cumulative official coverage is the contract, not per-round family
    # presence.
    window = set(_PRIORITY)
    families = {
        "recertification": {"sliding_weekly_value"},
        "sql-surface": {"sql_api_revenue_filter", "null_semantics_bundle"},
        "tpch": {"tpch_q8_market_share", "tpch_q19_banded_revenue"},
        "stats-sketches": {"equidepth_histogram", "countmin_heavy_hitters"},
        "temporal-windows": {"asof_join_forward", "value_range_frame_sum"},
        "analytics": {"session_path_analysis", "cohort_cumulative_ltv"},
        "text": {"repetition_profile", "qgram_prefix_filter_pairs"},
        "vectors-ml": {"embedding_label_stats", "sorted_neighborhood_pairs"},
        "multimodal": {"multimodal_wav_decode", "multimodal_y4m_frames"},
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
