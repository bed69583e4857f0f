"""Streaming CDC apply through the idempotent MERGE sink
(streaming/cdc_apply.py).

Pins the exactly-once contract end to end: streamed micro-batch
application equals sequential batch MERGE, a checkpoint-restart with
no new data is a no-op, a REPLAYED (batch_id, rows) call — the
at-least-once failure foreachBatch actually delivers — is skipped by
the ledger, and a crash BETWEEN merge and ledger write converges (the
replayed merge is idempotent, then gets recorded).
"""

from __future__ import annotations

import datetime as dtm

from celestrak_tle_data_pipeline_spark.sinks.warehouse import (
    ParquetWarehouse,
    merge_upsert_telemetry,
)
from celestrak_tle_data_pipeline_spark.streaming.cdc_apply import (
    LEDGER_TABLE,
    IdempotentMergeSink,
    run_cdc_merge_stream,
)

ROW_SCHEMA = (
    "norad_id long, epoch_utc timestamp, fetched_at_utc timestamp, "
    "inclination double, raan double, eccentricity double, "
    "arg_perigee double, mean_anomaly double, mean_motion double, "
    "b_star_drag double, rev_number long"
)

E1 = dtm.datetime(2024, 3, 1, 12, 0, 0)
E2 = dtm.datetime(2024, 3, 5, 6, 0, 0)
E3 = dtm.datetime(2024, 3, 9, 0, 0, 0)
T0 = dtm.datetime(2024, 3, 10, 0, 0, 0)
T1 = dtm.datetime(2024, 3, 11, 0, 0, 0)
T2 = dtm.datetime(2024, 3, 12, 0, 0, 0)


def _row(norad, epoch, mm, fetched):
    return (
        norad, epoch, fetched, 53.0, 205.0, 0.0001, 90.0, 270.0, mm,
        0.0001, 12345,
    )


def _frame(spark, rows):
    return spark.createDataFrame(rows, ROW_SCHEMA)


def _table(wh):
    return {
        (r.norad_id, r.epoch_utc, r.mean_motion, r.fetched_at_utc)
        for r in wh.read("fact_telemetry").select(
            "norad_id", "epoch_utc", "mean_motion", "fetched_at_utc"
        ).collect()
    }


def test_cdc_stream_equals_batch_merge_and_survives_replay(spark, tmp_path):
    landing = tmp_path / "cdc_land"
    landing.mkdir()
    whroot = str(tmp_path / "cdc_wh")
    ckpt = str(tmp_path / "cdc_ck")

    wave1 = [_row(777, E1, 15.0, T0), _row(778, E2, 14.0, T0)]
    # wave 2: 777 re-ingested at the SAME epoch with fresher data (the
    # upsert case) + a brand-new satellite
    wave2 = [_row(777, E1, 15.5, T1), _row(779, E3, 13.0, T1)]

    _frame(spark, wave1).coalesce(1).write.parquet(str(landing / "w1"))
    sink = run_cdc_merge_stream(
        spark, str(landing / "w*"), whroot, ckpt
    )
    assert _table(sink.wh) == {
        (777, E1, 15.0, T0),
        (778, E2, 14.0, T0),
    }

    _frame(spark, wave2).coalesce(1).write.parquet(str(landing / "w2"))
    sink = run_cdc_merge_stream(spark, str(landing / "w*"), whroot, ckpt)
    got = _table(sink.wh)

    # streamed application == sequential batch MERGE of the same waves
    ref = ParquetWarehouse(spark, str(tmp_path / "ref_wh"))
    merge_upsert_telemetry(ref, _frame(spark, wave1))
    merge_upsert_telemetry(ref, _frame(spark, wave2))
    assert got == _table(ref)
    assert (777, E1, 15.5, T1) in got  # the upsert genuinely won

    ledger = sink.applied_batches()
    assert ledger == {0, 1}

    # checkpoint restart, no new files: no-op (file source tracking)
    sink = run_cdc_merge_stream(spark, str(landing / "w*"), whroot, ckpt)
    assert _table(sink.wh) == got
    assert sink.applied_batches() == {0, 1}

    # foreachBatch's at-least-once failure: the SAME (batch_id, rows)
    # delivered again after a crash between sink write and checkpoint
    # commit — the ledger detects and skips
    assert sink.apply(_frame(spark, wave2), 1) == 0
    assert _table(sink.wh) == got
    assert sink.wh.read(LEDGER_TABLE).count() == 2

    # crash BETWEEN merge and ledger write: the merge landed, the
    # ledger row didn't; the replay re-merges (idempotent) and records
    wave3 = [_row(778, E2, 14.25, T2)]
    merge_upsert_telemetry(sink.wh, _frame(spark, wave3))  # pre-crash
    assert sink.apply(_frame(spark, wave3), 2) == 1  # replay converges
    expect = (got - {(778, E2, 14.0, T0)}) | {(778, E2, 14.25, T2)}
    assert _table(sink.wh) == expect
    assert sink.applied_batches() == {0, 1, 2}


def test_cdc_sink_is_reconstructible_from_storage(spark, tmp_path):
    """A NEW sink instance over the same warehouse sees the ledger —
    restart-safety does not depend on driver memory."""
    whroot = str(tmp_path / "wh2")
    s1 = IdempotentMergeSink(spark, whroot)
    assert s1.apply(_frame(spark, [_row(900, E1, 15.0, T0)]), 0) == 1

    s2 = IdempotentMergeSink(spark, whroot)
    assert s2.applied_batches() == {0}
    assert s2.apply(_frame(spark, [_row(900, E1, 15.0, T0)]), 0) == 0
    assert s2.wh.read("fact_telemetry").count() == 1
