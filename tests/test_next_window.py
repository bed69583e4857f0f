"""Round-9 bank verification (plans/next_window.py).

Each pre-staged query runs against its DuckDB oracle with EXACTLY the
driver-gate compare (`tools/check.py` norm/canon: row count, column
set, order-insensitive value hash), at two scale factors — so when
round 9 flips the bank into the live registry the queries are already
gate-green, and the no-new-debt invariant never sees them unverified.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check import TABLES, canon  # noqa: E402

from celestrak_tle_data_pipeline_spark.plans import next_window  # noqa: E402

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
    # every bank query must carry an oracle: the whole point of
    # pre-staging is landing in round 9's window gate-ready.
    assert set(next_window.NEXT_QUERIES) == set(next_window.NEXT_ORACLES)
    assert len(next_window.NEXT_QUERIES) >= 9


def test_bank_is_live_since_the_round9_flip():
    # Round 9 flipped the whole bank into the live registry (the
    # module registers via ``plans.register`` and sits in
    # ``plans._MODULES``); the flipped invariant is that every bank
    # name IS live and oracle-paired — the inverse of the pre-flip
    # "never registers itself" guard this test used to be.
    from celestrak_tle_data_pipeline_spark import plans

    live = set(plans.all_queries())
    oracles = set(plans.all_oracles())
    bank = set(next_window.NEXT_QUERIES)
    assert bank <= live
    assert bank <= oracles


@pytest.mark.parametrize("name", sorted(next_window.NEXT_QUERIES))
@pytest.mark.parametrize("sf_dir", SFS)
def test_bank_query_matches_oracle(spark, name, sf_dir, request):
    df = next_window.NEXT_QUERIES[name](spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    ocols, orows = _oracle_rows(sf_dir, next_window.NEXT_ORACLES[name])
    assert sorted(cols) == sorted(ocols), f"{name}: column mismatch"
    assert len(rows) == len(orows), f"{name}: row count mismatch"
    assert canon(rows, cols) == canon(orows, ocols), (
        f"{name}: value mismatch at {sf_dir}"
    )
