"""Round-21 reserve-bank verification (plans/bank_r21.py — STAGED, not live).

Each pre-staged query runs against its DuckDB oracle with EXACTLY the
driver-gate compare (`tools/check.py` norm/canon: row count, column
set, order-insensitive value hash — including the float-marker norm
that closes the r11 dtype blind spot), at two scale factors — so when
round 21 would flip the bank into the live registry the queries are already
gate-green, and the no-new-debt invariant never sees them unverified.

Seeded in round 14 as the PROMOTION RESERVE behind bank_r20 (the
round-20 flip fills window slot 50 from here); later rounds append.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check import TABLES, canon  # noqa: E402

from celestrak_tle_data_pipeline_spark.plans import bank_r21  # noqa: E402

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _oracle_rows(sf_dir, sql):
    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(sf_dir, f"{tname}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {tname} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


def test_bank_is_fully_oracle_paired():
    assert set(bank_r21.BANK_QUERIES) == set(bank_r21.BANK_ORACLES)
    assert len(bank_r21.BANK_QUERIES) >= 2


def test_bank_is_not_in_the_live_registry():
    # Pre-flip discipline: a staged name must not collide with (or
    # leak into) the live registry until round 21 would flip the module
    # into plans._MODULES — otherwise test_no_new_official_debt would
    # see an oracle-paired name without an official correctness row.
    from celestrak_tle_data_pipeline_spark import plans

    live = set(plans.all_queries())
    assert not live & set(bank_r21.BANK_QUERIES)
    assert "bank_r21" not in plans._MODULES


def test_bank_does_not_collide_with_other_staged_banks():
    from celestrak_tle_data_pipeline_spark.plans import (
        bank_r15,
        bank_r16,
        bank_r17,
        bank_r18,
        bank_r19,
        bank_r20,
        next_window,
    )

    mine = set(bank_r21.BANK_QUERIES)
    assert not mine & set(bank_r15.BANK_QUERIES)
    assert not mine & set(bank_r16.BANK_QUERIES)
    assert not mine & set(bank_r17.BANK_QUERIES)
    assert not mine & set(bank_r18.BANK_QUERIES)
    assert not mine & set(bank_r19.BANK_QUERIES)
    assert not mine & set(bank_r20.BANK_QUERIES)
    assert not mine & set(next_window.NEXT_QUERIES)


def test_bank_outputs_are_scalar(spark):
    from conftest import scalar_output_violations

    bad = scalar_output_violations(spark, dict(bank_r21.BANK_QUERIES))
    assert not bad, f"non-scalar bank outputs: {bad}"


@pytest.mark.parametrize("name", sorted(bank_r21.BANK_QUERIES))
@pytest.mark.parametrize("sf_dir", SFS)
def test_bank_query_matches_oracle(spark, name, sf_dir):
    df = bank_r21.BANK_QUERIES[name](spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    ocols, orows = _oracle_rows(sf_dir, bank_r21.BANK_ORACLES[name])
    assert sorted(cols) == sorted(ocols), f"{name}: column mismatch"
    assert len(rows) == len(orows), f"{name}: row count mismatch"
    assert canon(rows, cols) == canon(orows, ocols), (
        f"{name}: value mismatch at {sf_dir}"
    )
