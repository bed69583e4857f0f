"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``celestrak_tle_data_pipeline_spark.plans`` —
this module only delegates to the package registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from celestrak_tle_data_pipeline_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7): per-satellite orbital-decay
    indicator — raw TLE lines → Catalyst expression parse →
    lag(mean_motion) per satellite over epoch order → mean decay rate;
    one lazy DAG at sf0.001; driver checks rows>0."""
    return plans.all_queries()["tle_decay_flagship"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query name (subset of
    ``queries()`` — non-SQL-expressible ops get rows-only checks)."""
    return plans.all_oracles()
