"""TLE parsing as pure Catalyst column expressions.

The reference parses one (name, line1, line2) triple at a time in a
row-wise Python function (``parse_tle_pair``, reference
``script.py:22-59``) with a helper for the B* drag term
(``parse_bstar``, ``script.py:11-20``). Here the whole parse is a bundle
of built-in column expressions (SURVEY.md §2.8 F1-F9): no Python UDF,
fully whole-stage-codegen'd, vectorized, and Catalyst-optimizable —
which is what makes the same logic viable on a 100 TB scan.

Failure semantics match the reference exactly: any unparsable numeric
field nulls the *whole record* (``script.py:57-59``), which the caller
drops (``script.py:129-130``) — PERMISSIVE-mode parsing. The B* decoder
ships in two variants:

- ``bstar_compat``: bug-for-bug with ``script.py:11-20`` — a negative
  mantissa (e.g. ``"-11606-4"``) yields NULL because the reference
  builds ``float("0.-11606")`` which raises (verified by execution;
  SURVEY.md §2.8 F6).
- ``bstar_corrected``: handles the leading sign per the actual TLE spec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-width field positions (0-based python slices from the reference,
# converted to 1-based F.substring(pos, len)). reference script.py:24-40.
_L1_FIELDS = {
    "norad_raw": (3, 5),  # line1[2:7]
    "intl_designator_raw": (10, 8),  # line1[9:17]
    "epoch_yy_raw": (19, 2),  # line1[18:20]
    "epoch_day_raw": (21, 12),  # line1[20:32]
    "bstar_raw": (54, 8),  # line1[53:61]
}
_L2_FIELDS = {
    "inclination_raw": (9, 8),  # line2[8:16]
    "raan_raw": (18, 8),  # line2[17:25]
    "ecc_digits_raw": (27, 7),  # line2[26:33]
    "arg_perigee_raw": (35, 8),  # line2[34:42]
    "mean_anomaly_raw": (44, 8),  # line2[43:51]
    "mean_motion_raw": (53, 11),  # line2[52:63]
    "rev_number_raw": (64, 5),  # line2[63:68]
}


def _num(col: Column) -> Column:
    """`float(...)` / `int(...)` equivalent: trim then try_cast → NULL on junk."""
    return (F.trim(col)).try_cast("double")


def _int(col: Column) -> Column:
    return (F.trim(col)).try_cast("bigint")


def bstar_compat(raw: Column) -> Column:
    """B* decode, bug-for-bug with reference ``script.py:11-20``.

    if the last 2 chars contain '+'/'-': float("0."+mantissa) * 10**int(exp)
    else: plain float. Any failure → NULL — including the reference's
    negative-mantissa quirk (mantissa "-11606" → "0.-11606" → NULL).
    """
    b = F.trim(raw)
    n = F.length(b)
    suffix = F.substring(b, -2, 2)
    mantissa = b.substr(F.lit(1), n - F.lit(2))
    has_exp = suffix.contains("+") | suffix.contains("-")
    sci = F.concat(F.lit("0."), mantissa).try_cast("double") * F.pow(
        F.lit(10.0), (suffix).try_cast("int")
    )
    plain = (b).try_cast("double")
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.when(has_exp, sci).otherwise(plain)
    )


def bstar_corrected(raw: Column) -> Column:
    """B* decode per the actual TLE assumed-decimal format, sign-aware."""
    b = F.trim(raw)
    sign_s = F.regexp_extract(b, r"^([+-]?)(\d+)([+-]\d)$", 1)
    mant = F.regexp_extract(b, r"^([+-]?)(\d+)([+-]\d)$", 2)
    expo = F.regexp_extract(b, r"^([+-]?)(\d+)([+-]\d)$", 3)
    sign = F.when(sign_s == "-", F.lit(-1.0)).otherwise(F.lit(1.0))
    sci = (
        sign
        * F.concat(F.lit("0."), mant).try_cast("double")
        * F.pow(F.lit(10.0), (expo).try_cast("int"))
    )
    return F.when(mant != "", sci).otherwise((b).try_cast("double"))


def year_pivot(yy: Column) -> Column:
    """Two-digit-year NORAD pivot: 2000+yy if yy<57 else 1900+yy (script.py:28)."""
    return F.when(yy < 57, yy + 2000).otherwise(yy + 1900)


def epoch_timestamp(year: Column, epoch_day: Column) -> Column:
    """Fractional day-of-year → timestamp, µs precision (script.py:29).

    datetime(year,1,1) + timedelta(days=epoch_day-1), done as integer-µs
    arithmetic so the same value is reproducible in any engine:
    timestamp_micros(unix_micros(jan1) + round((d-1) * 86_400e6)).
    """
    jan1 = F.make_date(year, F.lit(1), F.lit(1)).cast("timestamp")
    micros = F.round((epoch_day - F.lit(1.0)) * F.lit(86_400_000_000.0), 0).cast(
        "long"
    )
    return F.timestamp_micros(F.unix_micros(jan1) + micros)


def launch_year(intl_designator: Column) -> Column:
    """Derived launch year from the intl designator's 2-digit year prefix.

    Declared in the reference README (README.md:30) but never extracted
    by its code (SURVEY.md §0) — same 57-pivot as the epoch year.
    """
    yy = F.substring(F.trim(intl_designator), 1, 2).try_cast("int")
    return year_pivot(yy).cast("int")


def parse_tle_triples(
    df,
    name_col: str = "sat_name_raw",
    l1_col: str = "line1",
    l2_col: str = "line2",
    fetched_at=None,
    bstar_mode: str = "compat",
    passthrough: tuple[str, ...] = (),
):
    """Parse assembled TLE triples into the typed telemetry schema.

    Input: DataFrame with (name, line1, line2) string columns. Output:
    typed columns per reference ``script.py:42-56``. Records where any
    required numeric field fails to parse come out with ``norad_id`` or
    ``epoch_utc`` NULL and are dropped (reference ``script.py:57-59``,
    ``script.py:129-130``) — use ``.where(valid_record())``.

    ``fetched_at`` is a batch-constant timestamp literal (the reference
    stamps one ``datetime.utcnow()`` per batch — ``script.py:120``,
    ``script.py:47`` — deliberately NOT per-row current_timestamp()).
    """
    # The reference strips each raw line before slicing (script.py:125-127).
    l1 = F.trim(F.col(l1_col))
    l2 = F.trim(F.col(l2_col))

    cols = {}
    for name, (pos, length) in _L1_FIELDS.items():
        cols[name] = F.substring(l1, pos, length)
    for name, (pos, length) in _L2_FIELDS.items():
        cols[name] = F.substring(l2, pos, length)

    norad = _int(cols["norad_raw"])
    yy = (F.trim(cols["epoch_yy_raw"])).try_cast("int")
    epoch_day = _num(cols["epoch_day_raw"])
    year = year_pivot(yy)
    bstar = (
        bstar_compat(cols["bstar_raw"])
        if bstar_mode == "compat"
        else bstar_corrected(cols["bstar_raw"])
    )

    # int(...) in the reference fails on floats-with-fraction too; a
    # record whose norad/rev/year field is junk must null out entirely.
    required_ok = (
        norad.isNotNull()
        & yy.isNotNull()
        & epoch_day.isNotNull()
        & _num(cols["inclination_raw"]).isNotNull()
        & _num(cols["raan_raw"]).isNotNull()
        # the reference does NOT strip the ecc digit field — it builds
        # float("0." + line2[26:33]) from the raw slice (script.py:36),
        # so a leading-space-padded field raises (internal space) and
        # drops the record, while trailing spaces survive (float strips
        # them). concat+try_cast reproduces both behaviors exactly.
        & F.concat(F.lit("0."), cols["ecc_digits_raw"]).try_cast("double").isNotNull()
        & _num(cols["arg_perigee_raw"]).isNotNull()
        & _num(cols["mean_anomaly_raw"]).isNotNull()
        & _num(cols["mean_motion_raw"]).isNotNull()
        & _int(cols["rev_number_raw"]).isNotNull()
    )

    fetched = F.lit(fetched_at).cast("timestamp") if fetched_at is not None else F.lit(None).cast("timestamp")

    out = df.select(
        *[F.col(c) for c in passthrough],
        F.when(required_ok, norad).alias("norad_id"),
        F.trim(F.col(name_col)).alias("sat_name"),
        F.trim(F.substring(l1, 10, 8)).alias("intl_designator"),
        F.when(required_ok, epoch_timestamp(year, epoch_day)).alias("epoch_utc"),
        fetched.alias("fetched_at_utc"),
        F.when(required_ok, _num(cols["inclination_raw"])).alias("inclination"),
        F.when(required_ok, _num(cols["raan_raw"])).alias("raan"),
        # implied decimal point: float("0." + digits) on the RAW slice,
        # no strip — bug-for-bug with script.py:36 (see required_ok note)
        F.when(
            required_ok,
            F.concat(F.lit("0."), cols["ecc_digits_raw"]).try_cast("double"),
        ).alias("eccentricity"),
        F.when(required_ok, _num(cols["arg_perigee_raw"])).alias("arg_perigee"),
        F.when(required_ok, _num(cols["mean_anomaly_raw"])).alias("mean_anomaly"),
        F.when(required_ok, _num(cols["mean_motion_raw"])).alias("mean_motion"),
        F.when(required_ok, bstar).alias("b_star_drag"),
        F.when(required_ok, _int(cols["rev_number_raw"])).alias("rev_number"),
    )
    return out


def valid_record() -> Column:
    """Filter matching the reference's null-record drop (script.py:129-130)."""
    return F.col("norad_id").isNotNull() & F.col("epoch_utc").isNotNull()
