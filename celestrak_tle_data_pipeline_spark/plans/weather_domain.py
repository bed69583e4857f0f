"""Weather-domain queries: the flux JSON parse path (SURVEY.md §2 S2,
F10, F11, F14) under the oracle gate.

Same strategy as tle_domain: synthesize deterministic JSON
array-of-arrays payloads (the NOAA wire format, header row included)
from ``orders`` keys, run the real ``parse_flux_payload`` bundle, and
have DuckDB recompute the expected outputs arithmetically."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.weather import parse_flux_payload
from . import register
from .common import t


@register(
    "flux_parse",
    oracle="""
    WITH keys AS (
        SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
    )
    SELECT CAST(DATE '2024-01-01' + CAST(k % 365 AS INT) AS DATE)
               AS date_utc,
           (k % 3000) / 10.0 AS f10_7_flux
    FROM keys
    """,
)
def flux_parse(spark, sf_dir):
    """S2+F10+F11+F14 end to end: JSON array-of-arrays payloads (one
    per 30 records, header row first — the NOAA shape, script.py:64-74)
    → from_json → header-skip slice → explode → date-token split +
    double cast. The oracle recomputes dates/fluxes from the keys —
    no JSON on the oracle side."""
    k = F.col("k")
    keys = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(2000)
    )
    date_str = F.concat(
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), (k % 365).cast("int")),
            "yyyy-MM-dd",
        ),
        F.lit(" 12:00"),
    )
    flux_str = F.format_string("%.1f", (k % 3000) / F.lit(10.0))
    rows = keys.select(
        k,
        F.expr("k div 30").alias("payload_id"),
        F.array(date_str, flux_str).alias("r"),
    )
    payloads = rows.groupBy("payload_id").agg(
        F.to_json(
            F.concat(
                # header row, skipped by the parser (script.py:68)
                F.array(F.array(F.lit("time_tag"), F.lit("flux"))),
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "r"))),
                    lambda s: s.r,
                ),
            )
        ).alias("payload")
    )
    return parse_flux_payload(payloads)
