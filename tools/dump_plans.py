"""Dump .explain("formatted") for bench queries to plans/<round>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py [-d r19] <tag> [name ...]
(default names = bench.QUERIES; tag is e.g. "before"/"after")
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(ROOT, "plans", "r18")


def _parse_outdir(argv):
    global OUT
    if argv and argv[0] == "-d":
        OUT = os.path.join(ROOT, "plans", argv[1])
        argv = argv[2:]
    return argv


def main(argv):
    import bench
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark

    argv = _parse_outdir(argv)
    tag = argv[0]
    names = argv[1:] or bench.QUERIES
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{tag}")
    qs = plans.all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
