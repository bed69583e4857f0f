"""Parquet table loaders for the driver's synthetic tables.

Column pruning and predicate pushdown are Catalyst built-ins — callers
``select``/``filter`` and the parquet scan reads only what is needed
(this replaces the reference's hand-rolled projection pushdown,
``script.py:141``, ``script.py:85``, ``script.py:159``; SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DRIVER_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}
