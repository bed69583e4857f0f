"""Audit oracle result types for driver-canonicalizer hazards.

The driver canonicalizes both result sets through pandas before
hashing, which makes two type classes dangerous even when values are
identical:

- DuckDB ``SUM()`` over integer columns returns HUGEINT (int128);
  pandas renders it as ``object``/``float`` and the value hash can
  diverge from Spark's int64 (took down ``sliding_weekly_value`` in
  CORRECTNESS_r04 — fixed with ``CAST(... AS BIGINT)``).
- LIST/STRUCT cells cannot be sorted by ``pandas.sort_values``
  (``TypeError: unhashable type: 'list'`` took down
  ``multimodal_feature_extract`` in round 3).

This tool runs every registered oracle against DuckDB at sf0.001
(cheap — SQL only, no Spark) and flags any result column whose DuckDB
type is outside the safe scalar set. Exit code 1 if anything is
flagged, so it can run as a gate.

Usage: python tools/audit_oracle_types.py [name ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# DuckDB types that survive the driver's pandas round-trip bit-stably.
SAFE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


def main(argv):
    import duckdb

    import __spark_entry__ as e

    oracles = e.oracle_sql()
    names = argv or sorted(oracles)

    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(SF_DIR, f"{tname}.parquet")
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{path}')"
        )

    flagged = 0
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            rel = con.sql(sql)
            bad = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) not in SAFE and not str(t).startswith("DECIMAL")
            ]
            # DECIMAL is fine only if it fits int64/float64 semantics the
            # driver normalises; wide decimals (>18 digits) degrade to
            # object dtype in pandas — flag those too.
            bad += [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t).startswith("DECIMAL")
                and int(str(t).split("(")[1].split(",")[0]) > 18
            ]
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {exc}")
            flagged += 1
            continue
        if bad:
            flagged += 1
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FLAG  {name}: {cols}")
    print(f"{len(names)} oracles audited, {flagged} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
