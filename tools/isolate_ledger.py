"""Registry-wide per-query isolate timing ledger (VERDICT r18 item 3).

The 32-name bench at sf0.1 is harness-floor-dominated (22/32 within 2x
of the ~50 ms toPandas constant), so round-over-round movement there
mostly measures box state. This sweep times EVERY registered query's
computation with the noop sink (guide §1.4) at $SPARK_GRAFT_SF_DIR —
one untimed cold pass (codegen/analysis/AQE), then N timed warm
passes per name — and writes a JSON ledger so heavy tails are visible
and comparable across rounds. Analysis instrument only: bench.py's
driver contract (query list, toPandas, one-line JSON) is untouched.

Usage: python tools/isolate_ledger.py [-r REPS] [-o OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv):
    reps = 2
    out_path = os.path.join(ROOT, "plans", "r19", "isolate_ledger.json")
    while argv:
        if argv[0] == "-r":
            reps = int(argv[1])
            argv = argv[2:]
        elif argv[0] == "-o":
            out_path = argv[1]
            argv = argv[2:]
        else:
            break

    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark
    from celestrak_tle_data_pipeline_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="isolate_ledger")
    for tname in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            load_table(spark, SF_DIR, tname).count()
        except Exception:  # noqa: BLE001
            pass

    qs = plans.all_queries()
    ledger: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(qs)):
        spark.catalog.clearCache()
        try:
            df = qs[name](spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"ledger_cold:{name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            cold = time.time() - t0
            warms = []
            for r in range(reps):
                spark.sparkContext.setJobDescription(
                    f"ledger_warm:{name}:{r}"
                )
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                warms.append(time.time() - t0)
            ledger[name] = {
                "cold": round(cold, 3),
                "warm_min": round(min(warms), 3),
            }
        except Exception as ex:  # noqa: BLE001
            ledger[name] = {"err": str(ex)[:120]}
        if i % 50 == 0:
            print(
                f"[{i}/{len(qs)}] {name} "
                f"({time.time() - t_start:.0f}s elapsed)",
                flush=True,
            )
    meta = {
        "sf_dir": SF_DIR,
        "reps": reps,
        "loadavg_start": os.getloadavg()[0],
        "total_sweep_sec": round(time.time() - t_start, 1),
        "method": "noop sink; 1 untimed... cold timed + min of warm "
        "reps per name; sequential sweep, cache cleared per name",
    }
    with open(out_path, "w") as f:
        json.dump({"_meta": meta, "queries": ledger}, f, indent=1)
    top = sorted(
        (
            (v.get("warm_min", 99), v.get("cold", 99), k)
            for k, v in ledger.items()
            if "err" not in v
        ),
        reverse=True,
    )[:25]
    print("\nheaviest 25 by warm_min:")
    for w, c, k in top:
        print(f"  {k}: warm_min={w} cold={c}")
    errs = [k for k, v in ledger.items() if "err" in v]
    print(f"errors: {errs}")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
