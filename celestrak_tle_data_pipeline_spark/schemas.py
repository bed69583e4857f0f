"""Explicit schemas for the warehouse star schema and the driver tables.

The reference's schemas are fixed but implicit (hard-coded character
positions at ``script.py:24-40``; output dict at ``script.py:42-56``;
only ``fact_space_weather`` has DDL, ``script.py:77-82``). Here every
table gets an explicit ``StructType`` — at 100 TB, schema inference is
both wrong (a full scan) and unstable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- warehouse star schema (README.md:18-32) --------------------------------

# dim_satellites: one row per space object, PK norad_id (README.md:31).
# launch_year is our derived addition (README.md:30 declares it; the
# reference never extracts it — SURVEY.md §0).
DIM_SATELLITES = T.StructType(
    [
        T.StructField("norad_id", T.LongType(), False),
        T.StructField("sat_name", T.StringType(), True),
        T.StructField("intl_designator", T.StringType(), True),
        T.StructField("launch_year", T.IntegerType(), True),
    ]
)

# fact_telemetry: one row per (norad_id, epoch_utc) (README.md:22),
# columns per the projection at script.py:151-155.
FACT_TELEMETRY = T.StructType(
    [
        T.StructField("norad_id", T.LongType(), False),
        T.StructField("epoch_utc", T.TimestampType(), False),
        T.StructField("fetched_at_utc", T.TimestampType(), True),
        T.StructField("inclination", T.DoubleType(), True),
        T.StructField("raan", T.DoubleType(), True),
        T.StructField("eccentricity", T.DoubleType(), True),
        T.StructField("arg_perigee", T.DoubleType(), True),
        T.StructField("mean_anomaly", T.DoubleType(), True),
        T.StructField("mean_motion", T.DoubleType(), True),
        T.StructField("b_star_drag", T.DoubleType(), True),  # nullable: script.py:19-20
        T.StructField("rev_number", T.LongType(), True),
    ]
)

# fact_space_weather: one row per UTC day (script.py:77-82 DDL).
FACT_SPACE_WEATHER = T.StructType(
    [
        T.StructField("date_utc", T.DateType(), False),
        T.StructField("f10_7_flux", T.DoubleType(), True),
    ]
)

# Partition column for fact_telemetry at scale: daily partitioning makes
# the reference's 3-day dedup probe (script.py:159) a partition-pruned
# scan instead of a full-table scan.
FACT_TELEMETRY_PARTITION_COL = "epoch_date"

# --- driver test tables (TESTDATA.md) ---------------------------------------

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
