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


def bucket_prefix_totals(
    psums: DataFrame,
    sums: dict[str, str],
    pid: str = "pid",
    symmetric: bool = False,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-bucket exclusive-prefix offsets AND whole-frame totals from
    ONE pass over the |buckets|-row per-bucket rollup (r19).

    The r18 value-bucket device computed the bucket offsets
    (``prefix_offsets``) and the grid totals (a separate scalar
    aggregate) as independent subtrees over the same data-grain grid;
    column pruning de-canonicalized the branches, so at runtime each
    one re-executed the grid rollup (no AQE stage reuse — verified in
    the r18 runtime plans, see OPTIMIZATION_r19.md). This helper folds
    both into one triangular cross-join aggregation over the tiny
    per-bucket frame: for each ``out -> src`` in ``sums`` it emits
    ``off_<out>`` = sum of src over strictly-earlier buckets (exact,
    0 for the first bucket) and ``tot_<out>`` = sum of src over ALL
    buckets, one row per pid. Callers attach the totals per row
    through the same broadcast join that attaches the offsets, so no
    scalar-aggregate subtree over the grid remains.

    Like ``prefix_offsets`` this is window-free (audit-clean) and
    exact for BIGINT/DECIMAL sums. The cross join is |buckets|^2 rows
    — bounded by the device's domain-derived bucket count, never by
    data volume.

    ``symmetric=True`` computes the exclusive prefix as the INCLUSIVE
    prefix minus the bucket's own value, which makes the streamed
    (own) side consume exactly the same columns as the broadcast
    (prior) side — the two sides then canonicalize to ONE subtree and
    AQE materializes the per-bucket rollup once instead of collapsing
    the own side into a separate base-table scan. Use it when every
    entry of ``sums`` has its ``off_<out>`` consumed downstream
    (otherwise pruning re-introduces the asymmetry); the default
    keeps the own side at bucket-id grain, which is the cheaper shape
    when ``sums`` carries totals-only columns.

    ``keys`` restricts both the prefix and the totals to rows sharing
    the named group columns (the dagum per-region pattern): offsets
    accumulate strictly-earlier buckets OF THE SAME GROUP and
    ``tot_<out>`` is the group's whole-frame sum, so per-group
    cumulatives (e.g. per-half Lorenz ordinates) ride per-(group,
    bucket) windows instead of one window partition per group value —
    a |groups|-task parallelism ceiling at scale. The group equality
    is an equi-join; the triangular part stays in the aggregate.
    """
    prior = psums.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        F.col(pid).alias("__bpid"),
        *[F.col(src).alias(f"__b_{out}") for out, src in sums.items()],
    )
    aggs = []
    for out, src in sums.items():
        if symmetric:
            aggs.append(
                (
                    F.sum(
                        F.when(
                            F.col("__bpid") <= F.col(pid),
                            F.col(f"__b_{out}"),
                        )
                    )
                    - F.max(F.col(src))
                ).alias(f"off_{out}")
            )
        else:
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("__bpid") < F.col(pid),
                            F.col(f"__b_{out}"),
                        )
                    ),
                    F.lit(0),
                ).alias(f"off_{out}")
            )
        aggs.append(F.sum(f"__b_{out}").alias(f"tot_{out}"))
    own = (
        psums if symmetric else psums.select(*keys, pid)
    )
    if keys:
        cond = None
        for k in keys:
            c = F.col(f"__bk_{k}") == F.col(k)
            cond = c if cond is None else (cond & c)
        joined = own.join(F.broadcast(prior), cond)
        return joined.groupBy(*keys, pid).agg(*aggs)
    return own.crossJoin(prior).groupBy(pid).agg(*aggs)


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
