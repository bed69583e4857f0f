"""Quality-gated ingest with quarantine (streaming/quality.py).

Pins: a clean batch flows through the wrapped MERGE writer; a
poisoned batch (violation fraction over tolerance) lands VERBATIM in
quarantine with the failed-constraint stamp while the warehouse stays
untouched; tolerances admit bounded dirt; the audit table records
every disposition with per-constraint counts; and a corrected
re-submission of quarantined data applies cleanly."""

from __future__ import annotations

import datetime as dtm
import json

from pyspark.sql import functions as F

from celestrak_tle_data_pipeline_spark.sinks.warehouse import (
    ParquetWarehouse,
    merge_upsert_telemetry,
)
from celestrak_tle_data_pipeline_spark.streaming.quality import (
    AUDIT_TABLE,
    Constraint,
    QualityGatedSink,
    violation_counts,
)

ROW_SCHEMA = (
    "norad_id long, epoch_utc timestamp, fetched_at_utc timestamp, "
    "inclination double, raan double, eccentricity double, "
    "arg_perigee double, mean_anomaly double, mean_motion double, "
    "b_star_drag double, rev_number long"
)

E = dtm.datetime(2024, 3, 1, 12, 0, 0)
T0 = dtm.datetime(2024, 3, 10, 0, 0, 0)


def _row(norad, ecc=0.001, mm=15.0):
    return (
        norad, E, T0, 53.0, 205.0, ecc, 90.0, 270.0, mm, 0.0001, 12345,
    )


def _constraints():
    return [
        Constraint("norad_present", F.col("norad_id").isNotNull()),
        Constraint(
            "eccentricity_range",
            (F.col("eccentricity") >= 0) & (F.col("eccentricity") < 1),
            max_violation_frac=0.1,
        ),
        Constraint(
            "mean_motion_physical",
            (F.col("mean_motion") > 0) & (F.col("mean_motion") < 20),
            max_violation_frac=0.1,
        ),
    ]


def test_gate_routes_clean_dirty_and_resubmission(spark, tmp_path):
    whroot = str(tmp_path / "wh")
    sink = QualityGatedSink(
        spark, whroot, merge_upsert_telemetry, _constraints()
    )

    clean = spark.createDataFrame(
        [_row(100), _row(101)], ROW_SCHEMA
    )
    assert sink.apply(clean, 0) == "applied"
    assert sink.wh.read("fact_telemetry").count() == 2

    # feed regression: half the batch has impossible eccentricity —
    # way over the 10% tolerance
    dirty = spark.createDataFrame(
        [_row(102), _row(103, ecc=7.5), _row(104, ecc=3.2), _row(105)],
        ROW_SCHEMA,
    )
    assert sink.apply(dirty, 1) == "quarantined"
    # warehouse untouched; bytes kept verbatim with the evidence stamp
    assert sink.wh.read("fact_telemetry").count() == 2
    q = spark.read.parquet(sink.wh.path("quarantine"))
    assert q.count() == 4
    assert {r["__failed"] for r in q.collect()} == {"eccentricity_range"}
    assert {r["__batch_id"] for r in q.collect()} == {1}

    # bounded dirt within tolerance passes (1 bad of 12 < 10%... use 1/20)
    mostly = spark.createDataFrame(
        [_row(200 + i) for i in range(19)] + [_row(299, mm=-1.0)],
        ROW_SCHEMA,
    )
    assert sink.apply(mostly, 2) == "applied"

    # corrected re-submission of the quarantined batch applies
    fixed = spark.createDataFrame(
        [_row(102), _row(103), _row(104), _row(105)], ROW_SCHEMA
    )
    assert sink.apply(fixed, 3) == "applied"
    ids = {
        r.norad_id
        for r in sink.wh.read("fact_telemetry")
        .select("norad_id")
        .collect()
    }
    assert {102, 103, 104, 105} <= ids

    # the audit history carries every disposition + counts
    audit = {
        r.batch_id: r
        for r in sink.wh.read(AUDIT_TABLE).collect()
    }
    assert [audit[i].disposition for i in range(4)] == [
        "applied", "quarantined", "applied", "applied",
    ]
    assert json.loads(audit[1].violations_json) == {
        "norad_present": 0,
        "eccentricity_range": 2,
        "mean_motion_physical": 0,
    }
    assert json.loads(audit[2].violations_json)[
        "mean_motion_physical"
    ] == 1


def test_violation_counts_single_pass_and_empty(spark, tmp_path):
    df = spark.createDataFrame(
        [_row(1), _row(2, ecc=9.0)], ROW_SCHEMA
    )
    n, counts = violation_counts(df, _constraints())
    assert n == 2
    assert counts == {
        "norad_present": 0,
        "eccentricity_range": 1,
        "mean_motion_physical": 0,
    }

    sink = QualityGatedSink(
        spark, str(tmp_path / "whe"), merge_upsert_telemetry, _constraints()
    )
    empty = spark.createDataFrame([], ROW_SCHEMA)
    assert sink.apply(empty, 0) == "empty"
