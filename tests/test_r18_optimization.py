"""Round-18 optimization pins (OPTIMIZATION_r18.md).

Three behavior-preserving changes, each pinned structurally AND by
value so a regression (re-widening the Python boundary, re-introducing
the driver-action loop, breaking the conf passthrough) fails loudly:

1. multimodal operators project to exactly the kernel's input columns
   before ``mapInPandas`` (guide §4.1 — Spark cannot prune into an
   opaque function, so an unused ``meta`` map would cross the Arrow
   boundary and un-prune the parquet scan);
2. ``referential_integrity_audit`` is ONE lazy plan (no driver-side
   count loop, no local-collected result) in which every child table
   scans once for ALL of its outgoing FK edges;
3. ``SPARK_GRAFT_SPARK_CONF`` parses ``k=v;k=v`` into builder confs so
   scale-dependent settings stay parameterized (guide §2/§9).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from celestrak_tle_data_pipeline_spark.session import _env_conf_pairs

from conftest import SF_DIR


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_env_conf_pairs_parsing():
    assert _env_conf_pairs("") == []
    assert _env_conf_pairs(" a.b=c ; d=e=f ;; garbage ; =x ") == [
        ("a.b", "c"),
        ("d", "e=f"),
    ]


def test_decode_assets_prunes_unused_columns(spark):
    """An extra column on the input must NOT reach the Python boundary:
    the scan under MapInPandas reads only what the kernel consumes."""
    from celestrak_tle_data_pipeline_spark.plans.ext_multimodal import (
        multimodal_decode_stub,
    )

    plan = _formatted_plan(multimodal_decode_stub(spark, SF_DIR))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan
    # the meta map's source columns stay out of the scan entirely
    for col in ("lang", "source", "n_chars"):
        assert col not in plan


def test_sample_frames_drops_extra_input_columns(spark):
    """Behavior parity: a payload-only kernel fed a wider frame returns
    exactly what it returns on the narrow frame."""
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    base = spark.range(3).select(
        F.col("id").alias("asset_id"),
        F.encode(F.concat(F.lit("x" * 70), F.col("id")), "UTF-8").alias(
            "payload"
        ),
    )
    wide = base.withColumn(
        "meta", F.create_map(F.lit("k"), F.lit("v"))
    ).withColumn("media_type", F.lit("video/mp4"))
    got = sorted(
        map(tuple, sample_frames(wide, 32, 2).collect())
    )
    want = sorted(
        map(tuple, sample_frames(base, 32, 2).collect())
    )
    assert got == want and len(got) > 0


def test_referential_audit_is_one_lazy_fused_plan(spark):
    """No ExistingRDD (i.e. nothing was collected at construction), and
    each child table appears exactly once per distinct child — lineitem
    carries its three FK edges in a single scan."""
    from celestrak_tle_data_pipeline_spark.plans.analytics import (
        _RI_CHECKS,
        referential_integrity_audit,
    )

    df = referential_integrity_audit(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert "ExistingRDD" not in plan
    n_children = len({c[1] for c in _RI_CHECKS})  # 5
    n_parent_scans = len(_RI_CHECKS)  # 7 (one distinct-key build each)
    # count scans in the numbered detail section only — the "listed
    # once in the tree AND once in the details" doubling is a
    # formatted-explain rendering convention that could shift across
    # Spark versions (ADVICE r18)
    n_detail_scans = len(
        re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    )
    assert n_detail_scans == n_children + n_parent_scans


def test_referential_audit_matches_eager_formulation(spark):
    """Value pin: the fused lazy plan computes exactly what the r17
    eager per-edge formulation (COUNT + broadcast LEFT ANTI COUNT)
    computed."""
    from celestrak_tle_data_pipeline_spark.plans.analytics import (
        _RI_CHECKS,
        referential_integrity_audit,
    )
    from celestrak_tle_data_pipeline_spark.plans.common import t

    got = {
        r["fk"]: (r["n_child"], r["n_orphans"], r["orphan_ppm"])
        for r in referential_integrity_audit(spark, SF_DIR).collect()
    }
    assert len(got) == len(_RI_CHECKS)
    for fk, child, fkcol, parent, pk in _RI_CHECKS:
        ch = t(spark, SF_DIR, child).select(F.col(fkcol).alias("__fk"))
        pa = t(spark, SF_DIR, parent).select(F.col(pk).alias("__pk"))
        n_child = ch.count()
        n_orphans = ch.join(
            F.broadcast(pa), ch["__fk"] == pa["__pk"], "left_anti"
        ).count()
        ppm = int((n_orphans * 1_000_000.0) // n_child)
        assert got[fk] == (n_child, n_orphans, ppm), fk
