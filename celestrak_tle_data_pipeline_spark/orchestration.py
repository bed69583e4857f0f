"""Scheduled-run orchestration — the repo artifact for the reference's
cron workflow (``data-pipeline.yml:7-8``: ``45 4,12,20 * * *`` → three
runs a day at 04:45, 12:45, 20:45 UTC; ``yml:25-28`` → each run is
``python script.py`` once).

The Spark shape of "cron invokes a bounded run" is ONE
``Trigger.AvailableNow()`` pass per branch over its landing directory:
the checkpoint remembers processed files, the warehouse appends are
check-then-write, so a cycle is idempotent and crash-safe — rerunning
after a partial failure converges to the same warehouse state. The
scheduler stays external and dumb, exactly like the reference's GitHub
Actions trigger:

    # crontab mirroring data-pipeline.yml:7-8
    45 4,12,20 * * *  spark-submit --master ... -m \
        celestrak_tle_data_pipeline_spark.orchestration /data/root

Landing the HTTP payloads (sources/fetch.py) is the only driver-side
step, same as the batch pipeline — Spark has no HTTP source
(SURVEY.md §2.1 S1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .sources.fetch import FLUX_TIMEOUT, FLUX_URL, fetch_and_land
from .streaming.incremental import (
    run_incremental_ingest,
    run_incremental_weather,
)


def run_scheduled_cycle(
    spark: SparkSession,
    root: str,
    fetch: bool = False,
    lookback_days: int = 3,
) -> None:
    """One cron cycle under ``root``: optionally land fresh payloads,
    then drain both landing dirs with AvailableNow passes.

    Layout (created on first run):
      root/landing/tle/      text payload files (one per fetch)
      root/landing/weather/  NOAA JSON payload files
      root/checkpoints/...   streaming file-tracking state
      root/warehouse/        parquet warehouse tables

    ``fetch=False`` (the default, and what every test uses) skips the
    network step and just drains whatever has landed — the
    cron-without-network mode; payloads can be landed by any external
    process."""
    tle_land = os.path.join(root, "landing", "tle")
    wx_land = os.path.join(root, "landing", "weather")
    wh_root = os.path.join(root, "warehouse")
    ckpt = os.path.join(root, "checkpoints")
    for d in (tle_land, wx_land):
        os.makedirs(d, exist_ok=True)

    if fetch:  # pragma: no cover — network-gated, tests land files
        fetch_and_land(tle_land)
        fetch_and_land(
            wx_land, url=FLUX_URL, timeout=FLUX_TIMEOUT, prefix="flux"
        )

    run_incremental_ingest(
        spark,
        tle_land,
        wh_root,
        os.path.join(ckpt, "tle"),
        lookback_days=lookback_days,
    )
    run_incremental_weather(
        spark, wx_land, wh_root, os.path.join(ckpt, "weather")
    )


def main() -> int:  # pragma: no cover — thin CLI shim over the cycle
    import sys

    from .session import get_spark

    root = sys.argv[1] if len(sys.argv) > 1 else "."
    run_scheduled_cycle(get_spark(app_name="scheduled-cycle"), root)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
