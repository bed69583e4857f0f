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


def prefix_offsets(
    psums: DataFrame, sums: dict[str, str], pid: str = "pid"
) -> DataFrame:
    """Per-partition prefix-sum offsets WITHOUT a window.

    The range-partitioned global-rank/cumsum pattern needs, for each
    partition id, the sum of every EARLIER partition's total. A
    ``Window.orderBy(pid)`` computes it but plants an unpartitioned
    window in the plan (benign — the frame is |partitions| rows — yet
    indistinguishable from the real single-partition scale killer in a
    plan audit). This triangular self-join over the |partitions|-row
    totals frame produces the identical exact integers with no window
    operator at all, keeping ``tools/audit_single_partition.py`` at
    zero for every query built on it.

    ``sums`` maps output column name -> source column in ``psums``;
    partitions with no predecessor get 0.
    """
    prior = psums.select(
        F.col(pid).alias("__bpid"),
        *[F.col(src).alias(f"__b_{out}") for out, src in sums.items()],
    )
    aggs = [
        F.coalesce(F.sum(f"__b_{out}"), F.lit(0)).alias(out)
        for out in sums
    ]
    return (
        psums.select(pid)
        .join(prior, F.col("__bpid") < F.col(pid), "left")
        .groupBy(pid)
        .agg(*aggs)
    )
