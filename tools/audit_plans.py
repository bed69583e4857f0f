"""Plan-quality audit: the .explain discipline as a runnable tool.

For each named query (default: the bench headline set), prints the
scale-relevant facts of the optimized physical plan:

- PushedFilters reaching each parquet scan (predicate pushdown)
- ReadSchema per scan (column pruning)
- join strategies chosen (broadcast vs sort-merge vs nested-loop)
- number of Exchanges (shuffles) — the thing to minimize

Usage: python tools/audit_plans.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "tle_decay_flagship", "pricing_summary", "top_revenue_orders",
    "region_revenue", "antijoin_composite_key", "session_windows",
    "exact_dup_groups", "simhash_near_dup", "cosine_topk_exact",
    "ann_ivf_topk", "ngram_shingle_jaccard", "tfidf_top_terms",
    # round-5 shapes
    "duplicate_ngram_spans", "item_cooccurrence_cosine",
    "token_vote_classifier", "rolling_weekly_active_users",
]


def main(argv):
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="audit")
    qs = plans.all_queries()
    for name in argv or DEFAULT:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
        bcast = len(re.findall(r"BroadcastHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        print(f"== {name}")
        print(
            f"   shuffles={shuffles} broadcastHash={bcast} "
            f"sortMerge={smj} broadcastNL={bnl}"
        )
        for p in pushed:
            if p.strip():
                print(f"   pushed: {p[:110]}")
        for s in schemas:
            print(f"   scan:   {s[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
