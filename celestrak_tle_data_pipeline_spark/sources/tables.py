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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes parquet TIMESTAMP(NANOS).

    Some SF dirs store ``events.ts`` as nanosecond timestamps, which
    Spark's vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL);
    others store µs. Reading under
    ``spark.sql.legacy.parquet.nanosAsLong`` yields raw int64 nanos for
    the former (and changes nothing for the latter), which we truncate
    to µs with integer arithmetic (``div 1000`` — a double division
    would lose precision above 2^53 ns) — bit-identical to DuckDB's
    native ns→µs truncation, so oracle value-hashes match. The conf is
    session-wide and harmless for µs tables, so it is simply left on.

    Pushdown caveat: on a nanos file the normalized ``ts`` is a computed
    column, so static ``ts`` predicates cannot reach the parquet scan
    (µs files are unaffected — no conversion happens). At scale the
    time-pruning path is the warehouse's date-partitioned layout
    (sinks/warehouse.py), not row-group filters on a misencoded file.
    """
    # The engine's timestamp contract is naive-UTC (SURVEY.md §1.4).
    # Registry queries may run on a CALLER-OWNED session (the driver's),
    # so the contract is pinned here, not only in our session factory —
    # on a non-UTC session every timestamp literal and collected value
    # would shift against the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}
