"""End-to-end ingest pipeline — the Spark shape of the reference's
``main()`` / ``fetch_space_weather()`` (SURVEY.md §3 EP1/EP2).

The reference's 16 eager stages collapse into two lazy DataFrame DAGs
(TLE branch, weather branch) whose only actions are the writes and
count logs. The HTTP fetch itself stays a driver-side landing step
(Spark has no HTTP batch source — SURVEY.md §2.1 S1); payloads land as
text files in a landing directory and everything downstream is
distributed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from .functions.tle import parse_tle_triples, valid_record
from .functions.weather import parse_flux_payload
from .operators.assembly import assemble_from_payloads, read_payloads
from .sinks.warehouse import (
    ParquetWarehouse,
    append_new_satellites,
    append_new_telemetry,
    append_new_weather,
)


class IngestStats(dict):
    """Counts logged per stage, mirroring the reference's prints."""


def ingest_tle_payloads(
    wh: ParquetWarehouse,
    payloads: DataFrame,
    fetched_at: dt.datetime | None = None,
    lookback_days: int = 3,
    min_rows: int = 0,
    bstar_mode: str = "compat",
) -> IngestStats:
    """TLE branch (EP1 stages 5-15): assemble → parse → gate → dedup → load.

    ``fetched_at`` is captured once per batch (reference script.py:120).
    """
    fetched_at = fetched_at or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    triples = assemble_from_payloads(payloads)
    parsed = parse_tle_triples(
        triples, fetched_at=fetched_at, bstar_mode=bstar_mode
    ).where(valid_record())
    parsed = parsed.cache()  # two consumers (dim + fact) — scan/parse once
    try:
        n = parsed.count()
        if n == 0 or n < min_rows:
            # empty-batch bail-out (script.py:132-134) / min-row gate
            return IngestStats(parsed=n, new_satellites=0, new_telemetry=0)
        stats = IngestStats(parsed=n)
        stats["new_satellites"] = append_new_satellites(wh, parsed)
        stats["new_telemetry"] = append_new_telemetry(
            wh, parsed, lookback_days=lookback_days
        )
        return stats
    finally:
        parsed.unpersist()


def ingest_tle_landing_dir(
    wh: ParquetWarehouse, spark: SparkSession, landing_dir: str, **kw
) -> IngestStats:
    return ingest_tle_payloads(wh, read_payloads(spark, landing_dir), **kw)


def ingest_weather_payload(wh: ParquetWarehouse, payloads: DataFrame) -> IngestStats:
    """Weather branch (EP2): parse JSON → anti-join on date → append."""
    weather = parse_flux_payload(payloads)
    return IngestStats(new_weather=append_new_weather(wh, weather))
