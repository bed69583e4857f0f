"""Oracle-compare the pre-staged next-window bank at an arbitrary SF.

`tests/test_next_window.py` pins the bank at sf0.001+sf0.01 with the
driver-gate compare; this is the same compare, pointed at whatever
$SPARK_GRAFT_SF_DIR says (default sf0.1) — the round-8 lesson is that
int64-overflow bugs in power sums only show up at sf0.1+, so bank
queries get the sf0.1 sweep BEFORE they flip into the live registry.

Usage: python tools/bank_check.py [--module MOD] [name ...]
(default module: bank_r13 — the most recently flipped bank; pass
``--module bank_r12`` / ``--module bank_r11`` to re-sweep the
flipped rounds' bank dicts)
"""

from __future__ import annotations

import importlib
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv) -> int:
    import duckdb

    from check import TABLES, canon

    from celestrak_tle_data_pipeline_spark.session import get_spark

    mod_name = "bank_r13"
    if argv and argv[0] == "--module":
        mod_name = argv[1]
        argv = argv[2:]
    mod = importlib.import_module(
        f"celestrak_tle_data_pipeline_spark.plans.{mod_name}"
    )
    queries = getattr(mod, "BANK_QUERIES", None)
    oracles = getattr(mod, "BANK_ORACLES", None)
    if queries is None:
        queries, oracles = mod.NEXT_QUERIES, mod.NEXT_ORACLES

    spark = get_spark(app_name="bank_check")
    names = argv or sorted(queries)

    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(SF_DIR, f"{tname}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {tname} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )

    npass = nfail = 0
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok = (
                sorted(cols) == sorted(ocols)
                and len(rows) == len(orows)
                and canon(rows, cols) == canon(orows, ocols)
            )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"FAIL {name}: {exc}")
            nfail += 1
            continue
        dt = time.time() - t0
        if ok:
            npass += 1
            print(f"pass {name} ({dt:.1f}s)")
        else:
            nfail += 1
            print(f"FAIL {name}: value/shape mismatch ({dt:.1f}s)")
    print(f"{npass} pass, {nfail} fail @ {SF_DIR}")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main(sys.argv[1:]))
