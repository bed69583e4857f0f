"""Query registry — the engine's analytics surface.

Every operator from SURVEY.md §2 (plus the [EXT] LLM-data operators) is
exposed as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, where ANSI-SQL-expressible, a matching DuckDB oracle
string. The driver's correctness gate compares the two per name
(row-count + schema + order-insensitive value hash).

Determinism contract (what makes value hashes match):
- Sums/averages of doubles go through fixed-scale DECIMAL casts
  (exact, order-independent arithmetic) and are cast back to DOUBLE at
  the end — identical bits in any engine, no float-summation-order
  dependence.
- Every LIMIT/top-k ranks with a total order (explicit tiebreak keys).
- Timestamp arithmetic is integer-µs; session timezone pinned UTC.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

_MODULES = (
    "relational",
    "windows",
    "tle_domain",
    "ext_text",
    "ext_vectors",
    "ext_multimodal",
    "stats",
    "weather_domain",
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
