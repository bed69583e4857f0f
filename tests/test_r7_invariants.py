"""Round-7 additions: CDC→MERGE round-trip writer invariants.

The registry query ``cdc_warehouse_roundtrip`` puts the MERGE sink
under the driver's value gate (digest vs a pure-SQL oracle of the
expected state). These tests pin the writer properties the digest
compare relies on but cannot itself articulate: idempotent re-apply,
untouched-partition preservation, and determinism across rebuilds.
"""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark import plans
from celestrak_tle_data_pipeline_spark.plans.ext_pipeline import (
    _cdc_as_telemetry,
    _cdc_digest,
    _cdc_head,
    _cdc_log,
)
from celestrak_tle_data_pipeline_spark.plans.common import t
from celestrak_tle_data_pipeline_spark.sinks.warehouse import (
    ParquetWarehouse,
    merge_upsert_telemetry,
)

from conftest import SF_DIR


def _digest_row(wh):
    return _cdc_digest(wh.read("fact_telemetry")).collect()[0]


def test_cdc_merge_reapply_is_idempotent(spark, tmp_path):
    # re-applying the SAME snapshot must leave the table bit-identical:
    # every incoming row ties with its stored twin and the survivor
    # rule picks the (identical) incoming one — digest unchanged,
    # row count unchanged. A sink that appended instead of merging, or
    # whose dynamic overwrite dropped sibling rows, fails here.
    log = _cdc_log(t(spark, SF_DIR, "events"))
    full = _cdc_as_telemetry(_cdc_head(log))
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    n1 = merge_upsert_telemetry(wh, full)
    d1 = _digest_row(wh)
    n2 = merge_upsert_telemetry(wh, full)
    d2 = _digest_row(wh)
    assert n1 == n2 == d1.n_rows
    assert (d1.digest_xor, d1.digest_sum_mod) == (
        d2.digest_xor,
        d2.digest_sum_mod,
    )


def test_cdc_merge_preserves_untouched_partitions(spark, tmp_path):
    # wave 2 rewrites only the date partitions its batch touches; rows
    # that exist only in wave 1 (keys whose head didn't move, living in
    # other dates) must survive verbatim — the round-trip state equals
    # the deduplicated union of both snapshots.
    from pyspark.sql import functions as F

    log = _cdc_log(t(spark, SF_DIR, "events"))
    mid = log.agg(
        F.floor((F.min("d") + F.max("d") + 1) / F.lit(2))
    ).first()[0]
    half = _cdc_as_telemetry(_cdc_head(log.where(F.col("d") < mid)))
    full = _cdc_as_telemetry(_cdc_head(log)).persist()
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    merge_upsert_telemetry(wh, half)
    merge_upsert_telemetry(wh, full)
    stored = wh.read("fact_telemetry")
    expected = (
        half.select("norad_id", "epoch_utc", "mean_motion")
        .unionByName(full.select("norad_id", "epoch_utc", "mean_motion"))
        .distinct()
    )
    got = {
        (r.norad_id, r.epoch_utc, r.mean_motion)
        for r in stored.select(
            "norad_id", "epoch_utc", "mean_motion"
        ).collect()
    }
    want = {tuple(r) for r in expected.collect()}
    assert got == want
    # both snapshot generations must actually be represented, or the
    # preservation claim is vacuous
    only_half = want - {tuple(r) for r in full.select(
        "norad_id", "epoch_utc", "mean_motion"
    ).collect()}
    assert only_half, "test data produced no wave-1-only rows"


def test_cdc_roundtrip_query_is_deterministic(spark):
    q = plans.all_queries()["cdc_warehouse_roundtrip"]
    r1 = q(spark, SF_DIR).collect()[0]
    r2 = q(spark, SF_DIR).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1.n_rows >= r1.n_keys > 0
