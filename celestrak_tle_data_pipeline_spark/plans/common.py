"""Shared helpers for registry queries."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes parquet TIMESTAMP(NANOS) columns.

    The driver's ``events.parquet`` stores ``ts`` as nanosecond
    timestamps, which Spark's vectorized parquet reader rejects
    (PARQUET_TYPE_ILLEGAL). Reading under
    ``spark.sql.legacy.parquet.nanosAsLong`` yields the raw int64 nanos,
    which we truncate to µs with integer arithmetic (``div 1000`` — a
    double division would lose precision above 2^53 ns) — bit-identical
    to DuckDB's native ns→µs truncation, so oracle value-hashes match.
    The conf is per-session and harmless for µs-timestamp tables, so it
    is simply left on.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def dec(col, precision: int = 12, scale: int = 2) -> Column:
    """Fixed-scale decimal view of a double column.

    double → decimal rounding is deterministic across engines (a k-decimal
    boundary like x.005 is never exactly representable in binary, so the
    double is strictly on one side of it everywhere). All downstream
    +,-,*,SUM stay exact — no float-order dependence in aggregates.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast(f"decimal({precision},{scale})")


def dsum(col, precision: int = 12, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, returned as DOUBLE."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col, precision: int = 12, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, in doubles."""
    return F.sum(dec(col, precision, scale)).cast("double") / F.count(
        F.lit(1)
    ).cast("double")
