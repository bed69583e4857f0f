"""Registry-wide sweep for the single-partition-exchange scale killer.

For every registered query, builds the physical plan at sf0.001 and
flags `Exchange SinglePartition` nodes that feed a Window or Sort
(TakeOrderedAndProject excluded) — the pattern that serializes an
unbounded frame through one task at scale. Scalar-aggregate merges
(one-row results) also use SinglePartition and are fine; the heuristic
separates the two by context.

Known, accepted flags (bounded domains or documented certifications):
  - global-sort SEMANTICS certifications whose scale twins exist
    (sorted_neighborhood_pairs, equidepth_histogram, systematic PPS)
  - windows over domains bounded by construction: lateness buckets,
    calendar weeks/days, contingency cells, range-partition ids,
    duration minutes, the 2000-key TLE synth frames
Anything NEW this tool flags should either get a bounded-domain
justification in its docstring or a rewrite (persist + scalar-agg
broadcast replaced the q11/q15 entity-grain windows in round 6).

Usage: python tools/audit_single_partition.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def flagged_contexts(plan: str) -> int:
    n = 0
    for m in re.finditer(r"Exchange SinglePartition", plan):
        ctx = plan[max(0, m.start() - 500):m.start()]
        if "Window" in ctx or ("Sort " in ctx and "TakeOrdered" not in ctx):
            n += 1
    return n


def main(argv):
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sp-audit")
    qs = plans.all_queries()
    names = argv or list(qs)
    hits = []
    for name in names:
        try:
            plan = (
                qs[name](spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"ERR   {name}: {str(ex)[:100]}")
            continue
        k = flagged_contexts(plan)
        if k:
            hits.append((name, k))
    for name, k in hits:
        print(f"FLAG  {name}: {k} window/sort-over-SinglePartition")
    print(f"{len(hits)} flagged of {len(names)} audited")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
