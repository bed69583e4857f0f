"""Isolated per-query timing with the noop sink (guide §1.4).

Times each named query's COMPUTATION (df.write.format("noop")) — no
driver transfer — with R interleaved repetitions per name so box noise
averages across variants rather than across time. Reports min and
median per name. This is an analysis tool; BENCH_r{N} methodology
(toPandas, median of 3) is unchanged.

Usage: python tools/isolate_bench.py [-r REPS] name [name ...]
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
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark
    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    reps = 5
    if argv and argv[0] == "-r":
        reps = int(argv[1])
        argv = argv[2:]
    names = argv

    spark = get_spark(app_name="isolate_bench")
    qs = plans.all_queries()
    for tname in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            load_table(spark, SF_DIR, tname).count()
        except Exception:  # noqa: BLE001
            pass

    dfs = {n: qs[n](spark, SF_DIR) for n in names}
    # cold pass (codegen/analysis) once per name, untimed here
    for n, df in dfs.items():
        spark.sparkContext.setJobDescription(f"cold:{n}")
        df.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n, df in dfs.items():  # interleaved: noise spreads evenly
            spark.sparkContext.setJobDescription(f"warm:{n}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples[n].append(time.time() - t0)
    out = {}
    for n, s in samples.items():
        s.sort()
        out[n] = {
            "min": round(s[0], 3),
            "med": round(s[len(s) // 2], 3),
            "max": round(s[-1], 3),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
