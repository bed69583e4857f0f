"""Dev loop for staged-bank authoring: driver-gate compare at sf0.001
+ sf0.01 (same canon as tools/check.py / tests/test_bank_rN.py), for
ANY bank module — replaces the per-generation r15_dev.py..r18_dev.py
wrappers (VERDICT r13 item 5: they were 4x79 near-identical lines,
growing by 79 per generation).

Usage:
    python tools/bank_dev.py --module bank_r18 [name ...]

With no names, runs every query in the module's BANK_QUERIES. Exit
status is non-zero iff any compare fails — the same two-SF gate the
bank's pytest mirror runs, usable one query at a time while authoring.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv) -> int:
    import duckdb

    from check import TABLES, canon

    from celestrak_tle_data_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--module", required=True,
                    help="bank module name, e.g. bank_r18")
    ap.add_argument("names", nargs="*",
                    help="query names (default: the whole bank)")
    args = ap.parse_args(argv)

    bank = importlib.import_module(
        f"celestrak_tle_data_pipeline_spark.plans.{args.module}"
    )
    spark = get_spark()
    names = args.names or list(bank.BANK_QUERIES)
    fails = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for tname in TABLES:
            path = os.path.join(sf_dir, f"{tname}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {tname} AS "
                    f"SELECT * FROM read_parquet('{path}')"
                )
        for name in names:
            t0 = time.time()
            try:
                df = bank.BANK_QUERIES[name](spark, sf_dir)
                cols = df.columns
                rows = [tuple(r) for r in df.collect()]
            except Exception as ex:  # noqa: BLE001
                print(f"FAIL {name} @ {sf_dir}: spark {type(ex).__name__}: "
                      f"{str(ex)[:300]}")
                fails += 1
                continue
            try:
                res = con.execute(bank.BANK_ORACLES[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
            except Exception as ex:  # noqa: BLE001
                print(f"FAIL {name} @ {sf_dir}: oracle {type(ex).__name__}: "
                      f"{str(ex)[:300]}")
                fails += 1
                continue
            problems = []
            if sorted(cols) != sorted(ocols):
                problems.append(f"cols spark={sorted(cols)} vs {sorted(ocols)}")
            elif len(rows) != len(orows):
                problems.append(f"rows {len(rows)} vs {len(orows)}")
            elif canon(rows, cols) != canon(orows, ocols):
                problems.append("value mismatch")
                print("  spark:", sorted(rows)[:3])
                print("  duck :", sorted(orows)[:3])
            if problems:
                print(f"FAIL {name} @ {sf_dir}: {'; '.join(problems)}")
                fails += 1
            else:
                print(f"pass {name} @ {os.path.basename(sf_dir)} "
                      f"({len(rows)} rows, {time.time()-t0:.1f}s)")
        con.close()
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
