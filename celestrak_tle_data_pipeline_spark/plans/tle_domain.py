"""TLE-domain queries: the reference's parse bundle under the oracle gate.

The reference's core competence is fixed-width TLE parsing
(``script.py:22-59``) with the B* sci-notation decode
(``script.py:11-20``), the 57-pivot two-digit year (``script.py:28``)
and fractional day-of-year epoch arithmetic (``script.py:29``). The
golden pytest fixtures cover those functions directly; these queries put
them under the driver's DuckDB gate too.

Strategy: synthesize deterministic fixed-width TLE lines from
``orders.o_orderkey`` (pure column expressions — ``format_string`` over
modular arithmetic), run the real parse bundle
(``functions/tle.py:parse_tle_triples``), and have the DuckDB oracle
compute the expected *outputs* arithmetically from the same key — no
string parsing on the oracle side, so the two engines take fully
independent paths to the same values.

Numeric design for bit-exact cross-engine equality:
- every synthesized numeric is a single division of an integer by a
  power of ten (both engines produce the nearest double of the same
  decimal), or an exact dyadic fraction (``k%128/128`` — 7 decimal
  digits, exactly representable, so format→parse is lossless);
- epoch micros stay integers: ``(k%364)*86_400_000_000 +
  (k%128)*675_000_000`` (86.4e9/128 = 675e6 exactly).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.tle import launch_year, parse_tle_triples, valid_record
from ..operators.assembly import assemble_from_payloads
from . import register
from .common import t

_FETCHED_AT = "2026-01-01 00:00:00"


def _synth_fields(k, norad_mod=100000):
    """Deterministic TLE field values from an integer key (shared spec —
    the oracle SQL mirrors these exact formulas). ``norad_mod`` < the
    key range folds multiple epochs onto each satellite (flagship
    time-series shape)."""
    return {
        "norad": k % norad_mod,
        "yy": (k * 7) % 100,
        "day_i": F.lit(1) + (k % 364),
        "day_frac_num": k % 128,  # /128 — dyadic, 7 decimal digits
        "intl_num": k % 777,
        "incl": (k % 1800) / F.lit(10.0),
        "raan": (k % 3600) / F.lit(10.0),
        "ecc7": (k * 13) % 10000000,
        "argp": ((k * 3) % 3600) / F.lit(10.0),
        "ma": ((k * 7) % 3600) / F.lit(10.0),
        "mm": (F.lit(10000000) + (k * 3) % 9000000) / F.lit(1000000.0),
        "rev": (k * 11) % 100000,
    }


def _bstar_variant(k):
    """8-char B* field cycling through the decode's behavior classes
    (sci +/-, the reference's negative-mantissa NULL quirk, plain
    float, blank)."""
    return (
        F.when(k % 5 == 0, F.lit(" 12345-4"))
        .when(k % 5 == 1, F.lit(" 12345+4"))
        .when(k % 5 == 2, F.lit("-11606-4"))
        .when(k % 5 == 3, F.lit(" 0.00123"))
        .otherwise(F.lit("        "))
    )


def _synth_lines(df, corrupt=False, norad_mod=100000):
    """Key column ``k`` → (sat_name_raw, line1, line2) at the reference's
    exact field offsets (``script.py:24-40``)."""
    k = F.col("k")
    f = _synth_fields(k, norad_mod)
    norad_str = F.format_string("%05d", f["norad"])
    if corrupt:
        # an unparsable norad field nulls the whole record downstream
        norad_str = F.when(k % 97 == 0, F.lit("XXXXX")).otherwise(norad_str)
    day_str = F.format_string(
        "%012.7f", f["day_i"].cast("double") + f["day_frac_num"] / F.lit(128.0)
    )
    intl_str = F.format_string("%02d%03dA  ", f["yy"] % 100, f["intl_num"])
    line1 = F.format_string(
        "1 %sU %s %02d%s  .00000000  00000-0 %s 0  9990",
        norad_str,
        intl_str,
        f["yy"],
        day_str,
        _bstar_variant(k),
    )
    line2 = F.format_string(
        "2 %s %s %s %07d %s %s %s%05d",
        norad_str,
        F.format_string("%08.4f", f["incl"]),
        F.format_string("%08.4f", f["raan"]),
        f["ecc7"],
        F.format_string("%08.4f", f["argp"]),
        F.format_string("%08.4f", f["ma"]),
        F.format_string("%011.7f", f["mm"]),
        f["rev"],
    )
    return df.select(
        k.alias("k"),
        F.format_string("SAT-%d", k).alias("sat_name_raw"),
        line1.alias("line1"),
        line2.alias("line2"),
    )


def _keys(spark, sf_dir, n=2000):
    return (
        t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .orderBy("k")
        .limit(n)
    )


# Oracle-side mirror of _synth_fields / the parse outputs. The year
# pivot (script.py:28), epoch arithmetic (script.py:29) and B* decode
# (script.py:11-20) are recomputed arithmetically — independent of the
# Spark string round-trip.
_ORACLE_PARSE = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
fields AS (
    SELECT k,
           k % 100000 AS norad,
           (k * 7) % 100 AS yy,
           1 + (k % 364) AS day_i,
           k % 128 AS day_frac_num,
           k % 777 AS intl_num
    FROM keys
)
SELECT CAST(norad AS BIGINT) AS norad_id,
       'SAT-' || CAST(k AS VARCHAR) AS sat_name,
       lpad(CAST(yy AS VARCHAR), 2, '0')
         || lpad(CAST(intl_num AS VARCHAR), 3, '0') || 'A' AS intl_designator,
       make_timestamp(
           epoch_us(CAST(make_date(
               CASE WHEN yy < 57 THEN 2000 + yy ELSE 1900 + yy END, 1, 1
           ) AS TIMESTAMP))
           + (day_i - 1) * 86400000000 + day_frac_num * 675000000
       ) AS epoch_utc,
       TIMESTAMP '2026-01-01 00:00:00' AS fetched_at_utc,
       (k % 1800) / 10.0 AS inclination,
       (k % 3600) / 10.0 AS raan,
       ((k * 13) % 10000000) / 10000000.0 AS eccentricity,
       ((k * 3) % 3600) / 10.0 AS arg_perigee,
       ((k * 7) % 3600) / 10.0 AS mean_anomaly,
       (10000000 + (k * 3) % 9000000) / 1000000.0 AS mean_motion,
       CASE k % 5
           WHEN 0 THEN 0.12345 * power(10.0, -4)
           WHEN 1 THEN 0.12345 * power(10.0, 4)
           WHEN 3 THEN 0.00123
           ELSE NULL
       END AS b_star_drag,
       CAST((k * 11) % 100000 AS BIGINT) AS rev_number,
       CAST(CASE WHEN yy < 57 THEN 2000 + yy ELSE 1900 + yy END AS INT)
           AS launch_year
FROM fields
WHERE k % 97 <> 0
"""


@register("tle_parse_telemetry", oracle=_ORACLE_PARSE)
def tle_parse_telemetry(spark, sf_dir):
    """F1-F9 + P4 end-to-end: synthesized fixed-width lines → the full
    Catalyst parse bundle → typed telemetry rows; records with a
    corrupted norad field null out and are dropped (script.py:57-59,
    129-130). Plus the README-declared derived ``launch_year``
    (SURVEY.md §0). Scale note: pure whole-stage-codegen expressions on
    a scan — no shuffle, no UDF; the same plan shape parses a 100 TB
    landing zone."""
    triples = _synth_lines(_keys(spark, sf_dir), corrupt=True)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT)
    return parsed.where(valid_record()).withColumn(
        "launch_year", launch_year(F.col("intl_designator"))
    )


_ORACLE_BSTAR = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
)
SELECT k,
       CASE k % 7
           WHEN 0 THEN '12345-4' WHEN 1 THEN '12345+4'
           WHEN 2 THEN '-11606-4' WHEN 3 THEN '+23456-4'
           WHEN 4 THEN '0.00123' WHEN 5 THEN '' ELSE '12345'
       END AS bstar_raw,
       CASE k % 7
           WHEN 0 THEN 0.12345 * power(10.0, -4)
           WHEN 1 THEN 0.12345 * power(10.0, 4)
           WHEN 4 THEN 0.00123
           WHEN 6 THEN 12345.0
           ELSE NULL
       END AS bstar_compat,
       CASE k % 7
           WHEN 0 THEN 0.12345 * power(10.0, -4)
           WHEN 1 THEN 0.12345 * power(10.0, 4)
           WHEN 2 THEN -0.11606 * power(10.0, -4)
           WHEN 3 THEN 0.23456 * power(10.0, -4)
           WHEN 4 THEN 0.00123
           WHEN 6 THEN 12345.0
           ELSE NULL
       END AS bstar_corrected
FROM keys
"""


@register("tle_bstar_decode", oracle=_ORACLE_BSTAR)
def tle_bstar_decode(spark, sf_dir):
    """F6 both variants side-by-side: the reference-faithful decode
    (negative/signed mantissa → NULL, script.py:11-20 quirk verified by
    execution) vs the sign-aware corrected decode."""
    from ..functions.tle import bstar_compat, bstar_corrected

    k = F.col("k")
    raw = (
        F.when(k % 7 == 0, F.lit(" 12345-4"))
        .when(k % 7 == 1, F.lit(" 12345+4"))
        .when(k % 7 == 2, F.lit("-11606-4"))
        .when(k % 7 == 3, F.lit("+23456-4"))
        .when(k % 7 == 4, F.lit(" 0.00123"))
        .when(k % 7 == 5, F.lit("        "))
        .otherwise(F.lit("   12345"))
    )
    return _keys(spark, sf_dir).select(
        k,
        F.trim(raw).alias("bstar_raw"),
        bstar_compat(raw).alias("bstar_compat"),
        bstar_corrected(raw).alias("bstar_corrected"),
    )


_ORACLE_EPOCH = """
WITH yys AS (
    SELECT DISTINCT o_orderkey % 100 AS yy FROM orders
)
SELECT yy,
       CAST(CASE WHEN yy < 57 THEN 2000 + yy ELSE 1900 + yy END AS INT)
           AS year,
       make_timestamp(
           epoch_us(CAST(make_date(
               CASE WHEN yy < 57 THEN 2000 + yy ELSE 1900 + yy END, 1, 1
           ) AS TIMESTAMP)) + 31 * 86400000000 + 43200000000
       ) AS epoch_utc
FROM yys
"""


@register("tle_epoch_pivot_sweep", oracle=_ORACLE_EPOCH)
def tle_epoch_pivot_sweep(spark, sf_dir):
    """F7+F8 isolated: the 57-pivot across every two-digit year that
    occurs in the data (both sides of the 1957 boundary) with a
    half-day fractional epoch (day 32.5 → Feb 1 12:00, µs-exact)."""
    from ..functions.tle import epoch_timestamp, year_pivot

    yy = F.col("yy")
    yys = (
        t(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % 100).alias("yy"))
        .distinct()
    )
    year = year_pivot(yy)
    return yys.select(
        yy,
        year.cast("int").alias("year"),
        epoch_timestamp(year, F.lit(32.5)).alias("epoch_utc"),
    )


_ORACLE_ASSEMBLY = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
)
SELECT k // 50 AS payload_id,
       COUNT(*) AS n_triples,
       MIN(k % 100000) AS min_norad,
       MAX(k % 100000) AS max_norad
FROM keys
GROUP BY k // 50
"""


@register("tle_assembly_stride3", oracle=_ORACLE_ASSEMBLY)
def tle_assembly_stride3(spark, sf_dir):
    """R1 end-to-end: pack synthesized records into multi-line payloads
    (50 triples each, plus a trailing incomplete line that must be
    dropped — script.py:124), run the zero-shuffle stride-3 assembly,
    parse, and profile per payload. The assembly itself never shuffles:
    lines are split and regrouped inside one row via higher-order array
    functions (operators/assembly.py)."""
    lines = _synth_lines(_keys(spark, sf_dir))
    packed = (
        lines.withColumn("payload_id", F.expr("k div 50"))
        .groupBy("payload_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("k", "sat_name_raw", "line1", "line2")
                        )
                    ),
                    lambda s: F.concat_ws(
                        "\n", s.sat_name_raw, s.line1, s.line2
                    ),
                ),
            ).alias("payload")
        )
        # trailing incomplete triple: one stray name line at the end
        .withColumn("payload", F.concat(F.col("payload"), F.lit("\nSAT-STRAY")))
    )
    triples = assemble_from_payloads(packed)
    parsed = parse_tle_triples(
        triples, fetched_at=_FETCHED_AT, passthrough=("payload_id",)
    )
    return parsed.groupBy(F.col("payload_id")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.min("norad_id").alias("min_norad"),
        F.max("norad_id").alias("max_norad"),
    )


_ORACLE_FLAGSHIP = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k,
           k % 50 AS norad,
           make_timestamp(
               epoch_us(CAST(make_date(
                   CASE WHEN (k * 7) % 100 < 57 THEN 2000 + (k * 7) % 100
                        ELSE 1900 + (k * 7) % 100 END, 1, 1
               ) AS TIMESTAMP))
               + (k % 364) * 86400000000 + (k % 128) * 675000000
           ) AS epoch_utc,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys
),
d AS (
    SELECT norad,
           mm - LAG(mm) OVER (PARTITION BY norad ORDER BY epoch_utc) AS delta
    FROM f
)
SELECT CAST(norad AS BIGINT) AS norad_id,
       COUNT(delta) AS n_deltas,
       CAST(SUM(CAST(delta AS DECIMAL(18,12))) AS DOUBLE) / COUNT(delta)
           AS decay_rate
FROM d
WHERE delta IS NOT NULL
GROUP BY norad
"""


@register("tle_decay_flagship", oracle=_ORACLE_FLAGSHIP)
def tle_decay_flagship(spark, sf_dir):
    """The SURVEY.md §7 flagship, end to end in one plan: synthesized
    raw TLE lines (40 epochs per satellite) → the full Catalyst parse
    bundle → per-satellite ``lag(mean_motion)`` over epoch order →
    mean decay rate per satellite. This is the question the reference's
    warehouse exists to answer (README.md:71 'orbital decay mechanics')
    expressed as one lazy DataFrame DAG: scan → expression parse (no
    UDF) → one shuffle on norad_id → linear window pass → partial agg.
    The delta average goes through a fixed-scale decimal sum (order-
    independent); the oracle recomputes everything arithmetically."""
    from pyspark.sql import Window

    triples = _synth_lines(_keys(spark, sf_dir), norad_mod=50)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT)
    w = Window.partitionBy("norad_id").orderBy("epoch_utc")
    deltas = parsed.where(valid_record()).select(
        "norad_id",
        (
            F.col("mean_motion") - F.lag("mean_motion").over(w)
        ).alias("delta"),
    )
    return (
        deltas.where(F.col("delta").isNotNull())
        .groupBy("norad_id")
        .agg(
            F.count("delta").alias("n_deltas"),
            (
                F.sum(F.col("delta").cast("decimal(18,12)")).cast("double")
                / F.count("delta")
            ).alias("decay_rate"),
        )
    )


_ORACLE_REGIMES = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k,
           (k * 7) % 100 AS yy,
           (k % 1800) / 10.0 AS incl,
           ((k * 13) % 10000000) / 10000000.0 AS ecc,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys
    WHERE k % 97 <> 0
)
SELECT CAST((CASE WHEN yy < 57 THEN 2000 + yy ELSE 1900 + yy END) // 10 * 10
            AS INT) AS launch_decade,
       CASE WHEN incl < 30.0 THEN 'low-inclination'
            WHEN incl < 60.0 THEN 'mid-inclination'
            WHEN incl < 100.0 THEN 'polar'
            ELSE 'retrograde' END AS regime,
       COUNT(*) AS n_sats,
       CAST(SUM(CAST(ecc AS DECIMAL(10,8))) AS DOUBLE) / COUNT(*)
           AS avg_eccentricity,
       MIN(mm) AS min_mean_motion,
       MAX(mm) AS max_mean_motion
FROM f
GROUP BY 1, 2
"""


@register("tle_orbital_regimes", oracle=_ORACLE_REGIMES)
def tle_orbital_regimes(spark, sf_dir):
    """Orbital-regime rollup — the 'analytics-ready data' the reference
    warehouse exists to serve (README.md:80-81): parsed telemetry
    classified into inclination regimes × launch decades with
    decimal-safe eccentricity averages. Runs on the REAL parse output
    (synthesized lines → expression bundle), so the whole
    parse→classify→aggregate DAG sits under the oracle gate; one scan,
    one partial-aggregated shuffle of ~40 group keys."""
    from ..functions.tle import launch_year

    triples = _synth_lines(_keys(spark, sf_dir), corrupt=True)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT).where(
        valid_record()
    )
    regime = (
        F.when(F.col("inclination") < 30.0, F.lit("low-inclination"))
        .when(F.col("inclination") < 60.0, F.lit("mid-inclination"))
        .when(F.col("inclination") < 100.0, F.lit("polar"))
        .otherwise(F.lit("retrograde"))
    )
    decade = (
        (launch_year(F.col("intl_designator")) / 10).cast("int") * 10
    ).cast("int")
    return (
        parsed.select(
            decade.alias("launch_decade"),
            regime.alias("regime"),
            "eccentricity",
            "mean_motion",
        )
        .groupBy("launch_decade", "regime")
        .agg(
            F.count(F.lit(1)).alias("n_sats"),
            (
                F.sum(F.col("eccentricity").cast("decimal(10,8)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("avg_eccentricity"),
            F.min("mean_motion").alias("min_mean_motion"),
            F.max("mean_motion").alias("max_mean_motion"),
        )
    )


# x = seconds since 1950-01-01 (positive for every TLE epoch, so the
# integer `div` truncation is floor in both engines; pre-1970 epochs
# would make div-vs-// diverge on negatives).
_EPOCH_1950_US = -631152000000000


_ORACLE_SLOPE = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k % 50 AS norad,
           (epoch_us(CAST(make_date(
                CASE WHEN (k * 7) % 100 < 57 THEN 2000 + (k * 7) % 100
                     ELSE 1900 + (k * 7) % 100 END, 1, 1) AS TIMESTAMP))
             + (k % 364) * 86400000000 + (k % 128) * 675000000
             + 631152000000000) // 1000000 AS x,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS y
    FROM keys
),
s AS (
    SELECT norad,
           COUNT(*) AS n,
           CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
           -- DECIMAL(19)*DECIMAL(19) = 38 digits: the max DuckDB can
           -- multiply (narrower casts execute in int64 and overflow)
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                AS DOUBLE) AS sxx,
           CAST(SUM(CAST(y AS DECIMAL(9,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(9,6)))
                AS DOUBLE) AS sxy
    FROM f GROUP BY norad
)
SELECT CAST(norad AS BIGINT) AS norad_id, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0, 12)
           AS slope_mm_per_day
FROM s
"""


@register("tle_decay_slope", oracle=_ORACLE_SLOPE)
def tle_decay_slope(spark, sf_dir):
    """Per-satellite decay rate as a least-squares regression slope of
    mean_motion over epoch time (the 'windowed regression slope'
    SURVEY.md §2.7 names as the decay-mechanics analysis): closed-form
    slope from exact decimal power sums — one scan over the parsed
    telemetry, one shuffle of 4 sums per satellite, no per-group
    iteration. The slope is rescaled to rev/day² and rounded to 12
    decimals on both engines (the power sums exceed 2^53, so their
    double casts carry the usual 1-ulp conversion hazard)."""
    triples = _synth_lines(_keys(spark, sf_dir), norad_mod=50)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT).where(
        valid_record()
    )
    x = (
        (F.unix_micros(F.col("epoch_utc")) - F.lit(_EPOCH_1950_US))
        / F.lit(1000000)
    ).cast("long").cast("decimal(12,0)")
    y = F.col("mean_motion").cast("decimal(9,6)")
    s = parsed.groupBy(F.col("norad_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sxx, sy, sxy = F.col("sx"), F.col("sxx"), F.col("sy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) * F.lit(86400.0)
    return s.select(
        "norad_id", "n", F.round(slope, 12).alias("slope_mm_per_day")
    )


# --------------------------------------------------------------------------
# nearest orbital neighbor within regime bands (conjunction pre-screen)
# --------------------------------------------------------------------------
_ORACLE_NEIGHBORS = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k % 100000 AS norad_id,
           (k % 1800) / 10.0 AS incl,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys WHERE k % 97 <> 0
),
banded AS (
    SELECT norad_id, incl, mm,
           CAST(floor(incl / 10) AS INT) AS incl_band
    FROM f
)
SELECT a.norad_id, a.incl_band,
       b.norad_id AS neighbor_id,
       abs(a.mm - b.mm) AS mm_delta
FROM banded a JOIN banded b
  ON a.incl_band = b.incl_band AND a.norad_id <> b.norad_id
QUALIFY row_number() OVER (
    PARTITION BY a.norad_id
    ORDER BY abs(a.mm - b.mm), b.norad_id
) = 1
"""


@register("tle_regime_neighbors", oracle=_ORACLE_NEIGHBORS)
def tle_regime_neighbors(spark, sf_dir):
    """Nearest orbital neighbor per satellite within its 10-degree
    inclination band, by mean-motion distance — the conjunction-screen
    pre-filter shape: you never compare satellites across regimes, so
    candidate pairs are bucketed (band equi-join) rather than
    all-pairs, and each satellite keeps exactly one deterministic
    nearest neighbor (delta, then id tiebreak).

    Runs on the REAL parse output (synthesized lines → expression
    bundle), so parse→band→self-join→argmin all sit under the oracle
    gate; the oracle recomputes the fixture arithmetically. Plan: one
    parse pass, band equi-join (bounded buckets), one window argmin
    per satellite — the same bucket-then-rank discipline every fuzzy
    self-join in the repo uses."""
    triples = _synth_lines(_keys(spark, sf_dir), corrupt=True)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT).where(
        valid_record()
    )
    banded = parsed.select(
        "norad_id",
        "mean_motion",
        F.floor(F.col("inclination") / 10).cast("int").alias("incl_band"),
    )
    a = banded.select(
        F.col("norad_id").alias("a_id"),
        F.col("mean_motion").alias("a_mm"),
        "incl_band",
    )
    b = banded.select(
        F.col("norad_id").alias("neighbor_id"),
        F.col("mean_motion").alias("b_mm"),
        F.col("incl_band").alias("b_band"),
    )
    w = Window.partitionBy("a_id").orderBy(
        F.asc("mm_delta"), F.asc("neighbor_id")
    )
    return (
        a.join(
            b,
            (F.col("incl_band") == F.col("b_band"))
            & (F.col("a_id") != F.col("neighbor_id")),
        )
        .withColumn("mm_delta", F.abs(F.col("a_mm") - F.col("b_mm")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("a_id").alias("norad_id"),
            "incl_band",
            "neighbor_id",
            "mm_delta",
        )
    )


_ORACLE_DECAY_FIT = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k % 50 AS norad,
           (epoch_us(CAST(make_date(
                CASE WHEN (k * 7) % 100 < 57 THEN 2000 + (k * 7) % 100
                     ELSE 1900 + (k * 7) % 100 END, 1, 1
            ) AS TIMESTAMP))
            + (k % 364) * 86400000000 + (k % 128) * 675000000)
           // 675000000 AS t,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys
),
m AS (
    SELECT norad,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(CAST(t AS DECIMAL(20,0))) AS DOUBLE) AS st,
           CAST(SUM(CAST(mm AS DECIMAL(14,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(t AS DECIMAL(20,0))
                    * CAST(mm AS DECIMAL(14,6))) AS DOUBLE) AS sty,
           CAST(SUM(CAST(t AS DECIMAL(20,0))
                    * CAST(t AS DECIMAL(20,0))) AS DOUBLE) AS st2
    FROM f GROUP BY norad
)
SELECT CAST(norad AS BIGINT) AS norad_id, n_obs,
       128.0 * (n_obs * sty - st * sy) / (n_obs * st2 - st * st)
           AS slope_per_day
FROM m
"""


@register("tle_decay_rate_fit", oracle=_ORACLE_DECAY_FIT)
def tle_decay_rate_fit(spark, sf_dir):
    """Per-satellite least-squares decay-rate fit: the closed-form OLS
    slope of mean_motion against epoch time, per satellite — the
    regression upgrade of the flagship's mean-of-deltas decay rate
    (a fit over all epochs is robust to one missing observation where
    consecutive deltas are not).

    No MLlib, no iteration: slope = (nΣty − ΣtΣy)/(nΣt² − (Σt)²) from
    FIVE moment sums in one aggregation pass. Determinism: the
    synthesized epoch grid lives on an exact 675 ms lattice
    (86.4e9/128), so t := epoch_µs div 675e6 is an exact integer
    tick; Σt, Σt², Σty are fixed-scale DECIMAL sums (order-independent
    — Σt² ≈ 6e20 would overflow int64 but fits decimal(38,0)), each
    cast to double ONCE and combined in the same IEEE expression DAG
    in both engines; ×128 rescales ticks to days.

    Plan: scan → expression parse → ONE map-side-combined shuffle on
    norad_id. Cites reference script.py:22-59 (the parse bundle whose
    output feeds the fit)."""
    triples = _synth_lines(_keys(spark, sf_dir), norad_mod=50)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT)
    tick = F.expr("unix_micros(epoch_utc) div 675000000")
    dt = tick.cast("decimal(20,0)")
    dy = F.col("mean_motion").cast("decimal(14,6)")
    m = (
        parsed.where(valid_record())
        .select("norad_id", dt.alias("t"), dy.alias("y"))
        .groupBy("norad_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("t").cast("double").alias("st"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("t") * F.col("y")).cast("double").alias("sty"),
            F.sum(F.col("t") * F.col("t")).cast("double").alias("st2"),
        )
    )
    n = F.col("n_obs")
    slope = (
        F.lit(128.0)
        * (n * F.col("sty") - F.col("st") * F.col("sy"))
        / (n * F.col("st2") - F.col("st") * F.col("st"))
    )
    return m.select("norad_id", "n_obs", slope.alias("slope_per_day"))


# --------------------------------------------------------------------------
# J2 secular perturbation rates (astrodynamics-native derived columns)
# --------------------------------------------------------------------------
_ORACLE_J2 = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k, k % 100000 AS norad,
           radians((k % 1800) / 10.0) AS inc_rad,
           ((k * 13) % 10000000) / 10000000.0 AS ecc,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys WHERE k % 97 <> 0
),
g AS (
    SELECT *, mm * 2 * pi() / 86400.0 AS n_rad
    FROM f WHERE ecc < 0.25
),
h AS (
    SELECT *, cbrt(398600.4418 / (n_rad * n_rad)) AS a_km FROM g
),
j AS (
    SELECT *,
           1.5 * 0.00108262668 * (6378.137 / (a_km * (1 - ecc * ecc)))
               * (6378.137 / (a_km * (1 - ecc * ecc))) * n_rad AS fac
    FROM h
)
SELECT CAST(norad AS BIGINT) AS norad_id,
       round(a_km, 6) AS a_km,
       -- + 0.0 normalizes IEEE negative zero (argp drift crosses 0 at
       -- the 63.4-degree critical inclination; -0 vs 0 hash-differs)
       round(-fac * cos(inc_rad) * (180.0 / pi()) * 86400.0, 6) + 0.0
           AS raan_drift_deg_day,
       round(0.5 * fac * (5 * cos(inc_rad) * cos(inc_rad) - 1)
             * (180.0 / pi()) * 86400.0, 6) + 0.0 AS argp_drift_deg_day
FROM j
"""


@register("tle_j2_secular_rates", oracle=_ORACLE_J2)
def tle_j2_secular_rates(spark, sf_dir):
    """J2 secular perturbation rates — the astrodynamics-native derived
    columns a TLE warehouse exists to serve: from each parsed
    satellite's (n, e, i), the semi-major axis via Kepler's third law
    (a = (μ/n²)^⅓) and the Earth-oblateness secular drifts
    Ω̇ = −1.5·J2·(Re/p)²·n·cos i (nodal regression — the rate that
    makes sun-synchronous orbits work) and
    ω̇ = 0.75·J2·(Re/p)²·n·(5cos²i − 1) (apsidal rotation, zero at the
    63.4° critical inclination). This is the physics layer above the
    parse bundle: runs on the REAL parse output of synthesized lines
    (the tle_orbital_regimes pattern), so parse → element extraction →
    propagation math all sit under the value gate, with the oracle
    recomputing every rate arithmetically from the key formulas —
    engine-independent of the parse entirely.

    Near-circular filter (e < 0.25) keeps (Re/p)² in a regime where
    the 6-decimal rounding contract absorbs libm last-ulp differences
    (μ = 398600.4418 km³/s², Re = 6378.137 km, J2 = 1.08262668e-3).
    Map-side trig in whole-stage codegen; no shuffle at all."""
    triples = _synth_lines(_keys(spark, sf_dir), corrupt=True)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT).where(
        valid_record()
    )
    base = parsed.where(F.col("eccentricity") < 0.25).select(
        "norad_id",
        F.radians("inclination").alias("inc_rad"),
        F.col("eccentricity").alias("ecc"),
        (F.col("mean_motion") * 2 * F.lit(3.141592653589793) / 86400.0).alias(
            "n_rad"
        ),
    )
    a_km = F.cbrt(F.lit(398600.4418) / (F.col("n_rad") * F.col("n_rad")))
    with_a = base.withColumn("a_km", a_km)
    p_km = F.col("a_km") * (1 - F.col("ecc") * F.col("ecc"))
    fac = (
        F.lit(1.5)
        * F.lit(0.00108262668)
        * (F.lit(6378.137) / p_km)
        * (F.lit(6378.137) / p_km)
        * F.col("n_rad")
    )
    deg_day = F.lit(180.0 / 3.141592653589793) * F.lit(86400.0)
    return with_a.select(
        "norad_id",
        F.round("a_km", 6).alias("a_km"),
        (F.round(-fac * F.cos("inc_rad") * deg_day, 6) + 0.0).alias(
            "raan_drift_deg_day"
        ),
        (
            F.round(
                F.lit(0.5)
                * fac
                * (5 * F.cos("inc_rad") * F.cos("inc_rad") - 1)
                * deg_day,
                6,
            )
            + 0.0
        ).alias("argp_drift_deg_day"),
    )


# --------------------------------------------------------------------------
# Theil-Sen robust decay slope (median of pairwise slopes)
# --------------------------------------------------------------------------
_ORACLE_THEIL_SEN = """
WITH keys AS (
    SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000
),
f AS (
    SELECT k % 50 AS norad,
           (epoch_us(CAST(make_date(
                CASE WHEN (k * 7) % 100 < 57 THEN 2000 + (k * 7) % 100
                     ELSE 1900 + (k * 7) % 100 END, 1, 1
            ) AS TIMESTAMP))
            + (k % 364) * 86400000000 + (k % 128) * 675000000)
           // 675000000 AS t,
           (10000000 + (k * 3) % 9000000) / 1000000.0 AS mm
    FROM keys
),
pairs AS (
    SELECT a.norad,
           CAST(CAST(b.mm AS DECIMAL(14,6)) - CAST(a.mm AS DECIMAL(14,6))
                AS DOUBLE) * 128.0 / CAST(b.t - a.t AS DOUBLE) AS slope
    FROM f a JOIN f b ON a.norad = b.norad AND a.t < b.t
)
SELECT CAST(norad AS BIGINT) AS norad_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(median(slope), 9) + 0.0 AS theil_sen_slope
FROM pairs GROUP BY norad
"""


@register("tle_theil_sen_decay", oracle=_ORACLE_THEIL_SEN)
def tle_theil_sen_decay(spark, sf_dir):
    """Theil-Sen robust decay slope per satellite: the MEDIAN of all
    pairwise (Δmean_motion/Δt) slopes — the estimator that shrugs off
    the outliers that drag the OLS fit (`tle_decay_rate_fit`): up to
    ~29% of corrupted epochs leave the Theil-Sen slope untouched,
    which is exactly the robustness a TLE feed with occasional bad
    elements needs. Completes the trend-estimator pair: OLS for
    efficiency on clean series, Theil-Sen for breakdown resistance.

    Pairwise slopes are a per-satellite self-join on the epoch tick
    (t_a < t_b excludes degenerate pairs identically in both engines)
    — fan-out is C(h,2) in the per-entity HISTORY LENGTH h, bounded by
    TLE cadence, never by fleet size; the join key is norad_id so the
    pair explosion stays inside each satellite's partition. Slope =
    exact DECIMAL Δmm cast to double once, divided by the integer tick
    delta, ×128 ticks→days; the median is the certified double-domain
    interpolation (trailing_median contract), rounded to 9 with -0
    normalized."""
    triples = _synth_lines(_keys(spark, sf_dir), norad_mod=50)
    parsed = parse_tle_triples(triples, fetched_at=_FETCHED_AT)
    tick = F.expr("unix_micros(epoch_utc) div 675000000")
    base = (
        parsed.where(valid_record())
        .select(
            "norad_id",
            tick.alias("t"),
            F.col("mean_motion").cast("decimal(14,6)").alias("mm"),
        )
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.norad_id") == F.col("b.norad_id"))
        & (F.col("a.t") < F.col("b.t")),
    ).select(
        F.col("a.norad_id").alias("norad_id"),
        (
            (F.col("b.mm") - F.col("a.mm")).cast("double")
            * F.lit(128.0)
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope"),
    )
    return pairs.groupBy("norad_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            F.round(F.expr("percentile(slope, 0.5d)"), 9) + 0.0
        ).alias("theil_sen_slope"),
    )
