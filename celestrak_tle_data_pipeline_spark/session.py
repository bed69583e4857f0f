"""SparkSession factory.

Mirrors the reference's session management (``script.py:105`` — a single
engine + scoped connections) as a single configured SparkSession.

Scale notes (100 TB design):
- AQE on: runtime join-strategy choice, partition coalescing, skew-join
  splitting replace any hand-scheduling.
- ``spark.sql.session.timeZone=UTC`` pins the reference's naive-UTC
  timestamp semantics (``script.py:26-29``) and makes results comparable
  with the DuckDB oracle.
- shuffle partitions default to the local core count; on a real cluster
  this is overridden to ~2-3x total cores (or left to AQE coalescing
  with a high initial value).
- ``SPARK_GRAFT_SPARK_CONF`` (optimization round 18): scale-dependent
  settings stay PARAMETERIZED rather than baked in as local[32]-tuned
  constants (guide §2/§9 — a config win that only makes sense at one
  scale is not a win). The env var carries ``key=value`` pairs
  separated by ``;`` and is applied last, so a cluster deployment can
  set e.g.::

      SPARK_GRAFT_SPARK_CONF="spark.sql.join.preferSortMergeJoin=false;
      spark.sql.files.maxPartitionBytes=1g;
      spark.io.compression.codec=zstd;
      spark.sql.adaptive.advisoryPartitionSizeInBytes=256m"

  (the guide §9 cluster baseline: allow shuffled-hash joins, big
  sequential scan splits, zstd shuffle compression, 256 MB post-AQE
  partitions) without changing the local bench defaults the driver's
  cross-round comparison depends on. Empty/absent = no change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _env_conf_pairs(raw: str) -> list[tuple[str, str]]:
    """Parse ``SPARK_GRAFT_SPARK_CONF``: ``key=value`` pairs separated
    by ``;`` (whitespace-tolerant, malformed fragments skipped)."""
    out = []
    for pair in raw.split(";"):
        pair = pair.strip()
        if pair and "=" in pair:
            k, _, v = pair.partition("=")
            if k.strip():
                out.append((k.strip(), v.strip()))
    return out


def get_spark(
    app_name: str = "celestrak_tle_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so bench runs match
    the driver's environment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(isAdjustedToUTC=false) must read as LTZ
        # (naive-UTC engine semantics, SURVEY.md §1.4) — Spark 4 would
        # otherwise infer TIMESTAMP_NTZ and break timestamp expressions
        # (unix_micros) and oracle comparison. load_table re-pins this
        # for driver-owned sessions.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Parameterized scale overrides (see module docstring): applied
    # after every default so a cluster run can retune without a code
    # change; absent/empty in the driver's local bench environment.
    for k, v in _env_conf_pairs(
        os.environ.get("SPARK_GRAFT_SPARK_CONF", "")
    ):
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
