"""Parquet table loaders for the driver's synthetic tables.

Column pruning and predicate pushdown are Catalyst built-ins — callers
``select``/``filter`` and the parquet scan reads only what is needed
(this replaces the reference's hand-rolled projection pushdown,
``script.py:141``, ``script.py:85``, ``script.py:159``; SURVEY.md §4).

This module is the ONE place that normalizes physical-type quirks of
the driver's parquet files; ``plans.common.t`` delegates here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DRIVER_TABLES


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_min_us: int | None = None,
) -> DataFrame:
    """Load one driver table; normalizes parquet TIMESTAMP(NANOS).

    Some SF dirs store ``events.ts`` as nanosecond timestamps, which
    Spark's vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL);
    others store µs. The events read happens under
    ``spark.sql.legacy.parquet.nanosAsLong`` — yielding raw int64 nanos
    for the former (and changing nothing for the latter) — which we
    truncate to µs with integer arithmetic (``div 1000``; a double
    division would lose precision above 2^53 ns), bit-identical to
    DuckDB's native ns→µs truncation, so oracle value-hashes match.
    The conf is scoped set/restore around the ``spark.read.parquet``
    call: the relation captures it at read time (verified — execution
    after restore succeeds), so other nanos parquet the CALLER reads in
    the same session is unaffected.

    ``ts_min_us`` (events only) is a lower-bound predicate in integer
    epoch-µs applied in the file's PHYSICAL domain — on the raw int64
    nanos BEFORE conversion, or on the native µs timestamp — so it is
    a literal comparison the scan can push into parquet row-group
    pruning. Predicates on the post-conversion ``ts`` of a nanos file
    cannot prune; this parameter is how callers keep time-range scans
    pruned regardless of encoding. (At warehouse scale the primary
    pruning path is the date-partitioned layout, sinks/warehouse.py.)

    API contract (session-wide, intentionally NOT restored): the
    engine's timestamp semantics are naive-UTC (SURVEY.md §1.4), so
    this loader pins ``spark.sql.session.timeZone=UTC``. Unlike the
    nanos conf, the timezone is consulted at EXECUTION time by
    timestamp expressions, so scoping it to the read would corrupt
    lazily-executed plans; callers needing another zone must set it
    back after materializing these tables.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Naive-UTC semantics for ALL parquet timestamps: files written with
    # isAdjustedToUTC=false (every driver table since round 5) must read
    # as session-tz TIMESTAMP, not TIMESTAMP_NTZ — NTZ rejects
    # unix_micros/epoch arithmetic and diverges from the DuckDB oracle
    # protocol. Runtime conf, consulted at read-time schema inference;
    # set here (not only in session.py) because the driver smoke test
    # passes its OWN SparkSession.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        prev = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            if ts_min_us is not None:
                # Pushed row-group pruner on the raw nanos (a superset:
                # trunc(ns/1000) > m implies ns > m*1000), then the exact
                # strict-µs predicate after conversion.
                df = df.where(F.col("ts") > F.lit(ts_min_us * 1000))
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            if ts_min_us is not None:
                df = df.where(
                    F.col("ts") > F.timestamp_micros(F.lit(ts_min_us))
                )
        elif ts_min_us is not None:
            df = df.where(F.col("ts") > F.timestamp_micros(F.lit(ts_min_us)))
        return _ltz(df)
    return _ltz(spark.read.parquet(path))


def _ltz(df: DataFrame) -> DataFrame:
    """Fallback normalization: cast any TIMESTAMP_NTZ column to
    session-tz TIMESTAMP (exact under the pinned UTC zone — same int64
    µs, different logical type). No-op when inferTimestampNTZ=false
    already took effect at inference time."""
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}
