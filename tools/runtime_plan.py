"""Dump the POST-EXECUTION adaptive plan for registered queries.

`explain("formatted")` prints the initial plan (isFinalPlan=false),
which cannot show AQE's runtime exchange/stage reuse. This tool runs
each named query (collect) and prints the final executed plan, plus a
summary of `Scan parquet` and reuse-node counts, so claims about
repeated base subtrees are checked against what actually executed.

Usage: python tools/runtime_plan.py [-o outdir] name [name ...]
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def summarize(txt: str) -> str:
    # the executed-plan string appends an "== Initial Plan ==" section
    # that duplicates every node pre-reuse; count the final plan only
    body = txt.split("== Initial Plan ==")[0]
    n_scan = body.count("Scan parquet")
    n_reuse = body.count("ReusedExchange") + body.count(
        "ReusedQueryStage"
    )
    n_subq_reuse = body.count("ReusedSubquery")
    n_exch = len(re.findall(r"\bExchange\b", body))
    stages = sorted(set(re.findall(r"ShuffleQueryStage (\d+)", body)))
    return (
        f"Scan parquet={n_scan} ReusedExchange/Stage={n_reuse} "
        f"ReusedSubquery={n_subq_reuse} Exchange={n_exch} "
        f"shuffle_stage_ids={stages}"
    )


def main(argv):
    outdir = None
    if argv and argv[0] == "-o":
        outdir = argv[1]
        argv = argv[2:]
    names = argv
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="runtime_plan")
    qs = plans.all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"runtime_plan:{name}")
        txt = final_plan(df)
        print(f"== {name}: {summarize(txt)}")
        if outdir:
            os.makedirs(outdir, exist_ok=True)
            path = os.path.join(outdir, f"{name}_runtime.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"   wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
