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


@register(
    "flux_rotation_anomaly",
    oracle="""
    WITH keys AS (
        SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
    ), raw AS (
        SELECT CAST(DATE '2024-01-01' + CAST(k % 365 AS INT) AS DATE)
                   AS date_utc,
               (k % 3000) / 10.0 AS flux
        FROM keys
    ), daily AS (
        SELECT date_utc,
               SUM(CAST(flux AS DECIMAL(18,6))) AS sv,
               COUNT(*) AS n,
               date_utc - DATE '2024-01-01' AS daynum
        FROM raw GROUP BY date_utc
    ), win AS (
        SELECT date_utc, sv, n,
               SUM(sv) OVER (ORDER BY daynum
                             RANGE BETWEEN 13 PRECEDING AND 13 FOLLOWING)
                   AS wsum,
               SUM(n) OVER (ORDER BY daynum
                            RANGE BETWEEN 13 PRECEDING AND 13 FOLLOWING)
                   AS wn
        FROM daily
    )
    SELECT date_utc,
           CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS daily_mean,
           CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE) AS rot_mean,
           CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE) AS anomaly,
           abs(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE)) > 50.0
               AS is_anomalous
    FROM win
    """,
)
def flux_rotation_anomaly(spark, sf_dir):
    """27-day solar-rotation anomaly over the parsed flux series: the
    F10.7 index repeats with the Sun's ~27-day rotation, so the
    centered 27-day rolling mean (a RANGE frame over calendar
    distance, +-13 days — NOT a row frame: missing days must not
    stretch the window) is the natural baseline, and a day's deviation
    from it flags geomagnetic events. Runs the REAL parse bundle
    (flux_parse upstream), then daily decimal sums and exact window
    sums; the only doubles are the two final divisions and one
    subtraction, written in the same order in both engines.

    Scale shape: daily rollup first (one small shuffle), window over
    the rollup (365 rows/year — trivially single-partition; at decades
    of data still thousands of rows, one range sort)."""
    parsed = flux_parse(spark, sf_dir)
    daily = parsed.groupBy("date_utc").agg(
        F.sum(F.col("f10_7_flux").cast("decimal(18,6)")).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn(
        "daynum", F.datediff("date_utc", F.lit("2024-01-01").cast("date"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("daynum").rangeBetween(-13, 13)
    win = daily.select(
        "date_utc",
        "sv",
        "n",
        F.sum("sv").over(w).alias("wsum"),
        F.sum("n").over(w).alias("wn"),
    )
    daily_mean = F.col("sv").cast("double") / F.col("n").cast("double")
    rot_mean = F.col("wsum").cast("double") / F.col("wn").cast("double")
    return win.select(
        "date_utc",
        daily_mean.alias("daily_mean"),
        rot_mean.alias("rot_mean"),
        (daily_mean - rot_mean).alias("anomaly"),
        (F.abs(daily_mean - rot_mean) > 50.0).alias("is_anomalous"),
    )
