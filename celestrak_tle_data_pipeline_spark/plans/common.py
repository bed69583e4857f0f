"""Shared helpers for registry queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_min_us: int | None = None,
) -> DataFrame:
    """Registry-local alias for ``sources.load_table`` (the single
    loader that also normalizes the events nanos-timestamp quirk).
    ``ts_min_us`` pushes a ``ts`` lower bound into the scan in the
    file's physical domain (see load_table)."""
    return load_table(spark, sf_dir, name, ts_min_us=ts_min_us)


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
