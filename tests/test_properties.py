"""Property-based spot checks (SURVEY.md §5.4, hypothesis).

Strategy: generate random field values, format them into fixed-width
TLE lines exactly as a ground station would, push them through the
Catalyst parse bundle in ONE batch (hypothesis generates the values,
Spark runs once per test — not once per example, which would be
minutes), and compare against an independent Python computation.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from celestrak_tle_data_pipeline_spark.operators.assembly import (
    assemble_from_payloads,
)


def _fmt_line(norad, yy, day, incl, raan, ecc7, argp, ma, mm, rev):
    l1 = (
        f"1 {norad:05d}U 20001A   {yy:02d}{day:012.7f}"
        f"  .00000000  00000-0  12345-4 0  9990"
    )
    l2 = (
        f"2 {norad:05d} {incl:08.4f} {raan:08.4f} {ecc7:07d} "
        f"{argp:08.4f} {ma:08.4f} {mm:011.7f}{rev:05d}"
    )
    return l1, l2


FIELDS = st.tuples(
    st.integers(0, 99999),          # norad
    st.integers(0, 99),             # yy
    st.integers(1, 364),            # day integer part
    st.integers(0, 127),            # day fraction numerator (/128)
    st.integers(0, 1799),           # incl tenths
    st.integers(0, 3599),           # raan tenths
    st.integers(0, 9999999),        # ecc digits
    st.integers(0, 3599),           # argp tenths
    st.integers(0, 3599),           # ma tenths
    st.integers(10_000_000, 18_999_999),  # mm millionths
    st.integers(0, 99999),          # rev
)


@settings(max_examples=1, deadline=None)
@given(st.lists(FIELDS, min_size=30, max_size=60, unique=True))
def test_tle_parse_roundtrip_property(spark, cases):
    from celestrak_tle_data_pipeline_spark.functions.tle import (
        parse_tle_triples,
        valid_record,
    )

    rows = []
    expected = {}
    for i, (norad, yy, di, dfrac, incl, raan, ecc7, argp, ma, mmi, rev) in (
        enumerate(cases)
    ):
        day = di + dfrac / 128.0
        l1, l2 = _fmt_line(
            norad, yy, day, incl / 10.0, raan / 10.0, ecc7,
            argp / 10.0, ma / 10.0, mmi / 1e6, rev,
        )
        rows.append((i, f"SAT-{i}", l1, l2))
        year = 2000 + yy if yy < 57 else 1900 + yy
        epoch = dt.datetime(year, 1, 1) + dt.timedelta(days=day - 1)
        expected[i] = {
            "norad_id": norad,
            "epoch_utc": epoch,
            "inclination": incl / 10.0,
            "raan": raan / 10.0,
            "eccentricity": float(f"0.{ecc7:07d}"),
            "arg_perigee": argp / 10.0,
            "mean_anomaly": ma / 10.0,
            "mean_motion": mmi / 1e6,
            "rev_number": rev,
        }

    df = spark.createDataFrame(
        rows, "k long, sat_name_raw string, line1 string, line2 string"
    )
    parsed = parse_tle_triples(df, passthrough=("k",)).where(valid_record())
    got = {r.k: r for r in parsed.collect()}
    assert set(got) == set(expected)
    for k, exp in expected.items():
        r = got[k]
        for field, want in exp.items():
            have = getattr(r, field)
            assert have == want, (k, field, have, want)


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="abc \n", min_size=0, max_size=5),
                 min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    )
)
def test_assembly_triple_count_property(spark, payload_lines):
    """For any payload, assembly yields exactly floor(n_lines/3) triples
    after the reference's strip semantics (script.py:119-127)."""
    rows = []
    expected = []
    for i, lines in enumerate(payload_lines):
        # payload-level strip first, like the reference
        flat = [ln.replace("\n", " ") for ln in lines]
        payload = "\n".join(flat).strip()
        n_lines = len(payload.split("\n")) if payload else 0
        rows.append((i, payload))
        expected.append((i, n_lines // 3))
    df = spark.createDataFrame(rows, "pid long, payload string")
    out = assemble_from_payloads(df)
    counts = {r.pid: r.n for r in out.groupBy("pid").count()
              .withColumnRenamed("count", "n").collect()}
    for pid, want in expected:
        assert counts.get(pid, 0) == want, (pid, counts.get(pid, 0), want)


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.integers(0, 2**31 - 1), min_size=50, max_size=200, unique=True
    )
)
def test_dataset_split_is_pure_and_partition_invariant(spark, ids):
    """The split label is a pure function of the id: Spark agrees with
    the plain-Python twin on arbitrary ids, and re-running on any
    re-partitioning (or subset) never moves an id's assignment."""
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.ext_pipeline import (
        split_label,
        split_label_py,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", split_label("doc_id").alias("s")
        ).collect()
    }
    assert got == {i: split_label_py(i) for i in ids}

    # partitioning invariance: 1 partition vs 16, same labels
    got16 = {
        r.doc_id: r.s
        for r in df.repartition(16)
        .select("doc_id", split_label("doc_id").alias("s"))
        .collect()
    }
    assert got16 == got


def test_short_docs_shingle_to_empty_not_error(spark):
    # ANSI-mode regression guard (round-4 hardening, same class as the
    # decontamination_overlap fix): F.sequence(1, n-2) runs DESCENDING
    # for n < 3, so unguarded trigram builders would element_at index 0
    # and crash on 1-2-token docs. The guarded builder must yield an
    # empty shingle set instead.
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.plans.ext_text import (
        _trigram_shingles,
    )

    df = spark.createDataFrame(
        [("", ), ("one", ), ("one two", ), ("one two three", ),
         ("a b c d", )],
        ["text"],
    ).select(_trigram_shingles(F.split(F.col("text"), " ")).alias("sh"))
    rows = [r.sh for r in df.collect()]
    assert rows[0] == [] and rows[1] == [] and rows[2] == []
    assert rows[3] == ["one two three"]
    assert rows[4] == ["a b c", "b c d"]
