"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against the matching ``oracle_sql()`` string executed by DuckDB on the
same parquet tables: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
values normalised). Queries without an oracle get a rows-only check.

Usage: python tools/check.py [--json PATH] [name ...]
(--json writes a driver-CORRECTNESS-format record per name — the
machine-readable mirror the judge can diff against the official
CORRECTNESS_r{N}.json instead of parsing log text.)
"""

from __future__ import annotations

import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        s = f"{v:.17g}"
        # Guarantee a float marker so the int/float dtype family is part
        # of the canon: %.17g renders 484.0 as "484", identical to the
        # BIGINT 484, which masked exactly the dtype-mismatch class the
        # driver's canonicalizer rejects (kendalls_w_concordance,
        # CORRECTNESS_r11 — mirror-green, officially RED). A trailing
        # ".0" makes the mirror and the driver agree on this class.
        if not any(c in s for c in ".einf"):
            s += ".0"
        return s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(argv):
    import duckdb

    import __spark_entry__ as e
    from celestrak_tle_data_pipeline_spark.session import get_spark

    json_path = None
    if argv and argv[0] == "--json":
        if len(argv) < 2:
            print("usage: check.py [--json OUT.json] [name ...]",
                  file=sys.stderr)
            return 2
        json_path = argv[1]
        argv = argv[2:]

    spark = get_spark()
    qs = e.queries()
    oracles = e.oracle_sql()
    names = argv or sorted(qs)

    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(SF_DIR, f"{tname}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{path}')"
            )

    n_pass = n_fail = n_rowsonly = 0
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark:{type(ex).__name__}",
            }
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            # ADVICE r13: no compare ran, so rows/schema/hash are null
            # (not true/false) plus an explicit status — a consumer
            # keying on the booleans must not count these as verified.
            record[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(rows),
                "oracle_rows": None, "err": "no_oracle",
                "status": "rows_only",
            }
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {type(ex).__name__}: {ex}")
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(rows),
                "oracle_rows": None,
                "err": f"oracle:{type(ex).__name__}",
            }
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs oracle {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs oracle {sorted(ocols)}")
        if not problems:
            a, b = canon(rows, cols), canon(orows, ocols)
            if a != b:
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        problems.append(f"first diff row {i}: {x} vs {y}")
                        break
                else:
                    problems.append("value mismatch (prefix equal)")
        record[name] = {
            "rows_match": len(rows) == len(orows),
            "schema_match": sorted(cols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"wrote {json_path} ({len(record)} records)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
