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
    # Round-7 window: every r6 name went officially green, so the whole
    # window rotates onto the 70-name never-official backlog, prioritized
    # per the r6 verdict — scale-twin/gate certifications, the
    # experimentation tier, codec/text additions, the twice-deferred
    # histogram, and the four advisor-touched queries whose official row
    # should certify the FIXED semantics. Families whose every member is
    # already officially green have no r7 representative by design —
    # cumulative official coverage is the contract, not per-round family
    # presence.
    window = set(_PRIORITY)
    families = {
        "scale-twins-gates": {
            "equidepth_histogram_bounded",
            "sorted_neighborhood_ranged",
            "zorder_skipping_gate",
            "hilbert_curve_layout",
            "rowhash_table_digest",
        },
        "deferred": {"histogram_order_totals"},
        "experimentation": {
            "ab_experiment_readout",
            "cuped_adjusted_ab",
            "srm_guardrail_check",
            "mann_whitney_u_values",
            "ks_two_sample_values",
            "power_analysis_mde",
        },
        "advisor-fixed": {
            "user_value_drawdown",
            "clamped_running_balance",
            "centroid_classifier_confusion",
        },
        "codecs": {"y4m_scene_cuts", "multimodal_ppm_resize"},
        "text": {"winnowing_fingerprints", "bigram_lm_perplexity"},
        "sketches": {"bloom_membership_sketch", "hll_sketch_union_rollup"},
        "vectors-ml": {"mmr_diversified_topk", "graph_clustering_coefficient"},
        "cdc": {"cdc_apply_changes"},
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
