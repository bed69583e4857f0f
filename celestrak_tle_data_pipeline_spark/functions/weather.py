"""NOAA F10.7 flux JSON parsing (SURVEY.md §2 S2, F10, F11, F14).

The reference GETs a 30-day JSON array-of-arrays whose first element is
a header row (skipped via ``data[1:]``), then per row takes the date
token before the first space and casts flux to float (reference
``script.py:64-74``). Here the payload lands as a file/string and is
parsed with ``from_json`` + higher-order functions — no Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLUX_JSON_SCHEMA = "array<array<string>>"


def parse_flux_payload(payloads: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(one row per raw JSON payload) → (date_utc DATE, f10_7_flux DOUBLE).

    Header-row skip = ``slice(arr, 2, size-1)`` (script.py:68); date =
    first space-token (script.py:69); flux cast (script.py:70). Rows
    whose date fails to parse are dropped, matching the reference's
    permissive behavior.
    """
    arr = F.from_json(F.col(payload_col), FLUX_JSON_SCHEMA)
    rows = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    out = (
        payloads.select(F.explode(rows).alias("r"))
        .select(
            # try_cast, NOT to_date: under ANSI mode (Spark 4 default)
            # to_date THROWS on a malformed date token, killing the
            # whole batch — the reference drops the row (script.py:97-98
            # permissive containment).
            F.substring_index(F.col("r").getItem(0), " ", 1)
            .try_cast("date")
            .alias("date_utc"),
            (F.col("r").getItem(1)).try_cast("double").alias("f10_7_flux"),
        )
        .where(F.col("date_utc").isNotNull())
    )
    return out
