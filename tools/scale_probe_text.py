"""64x probe for the three heaviest text families (r7 verdict item 6).

The routine probe (`scale_probe.py`) measures at 8x; the output-bound
diagnosis of the pair-emitting near-dup queries rested on those 8x
numbers. This probe adds the 64x octave, split by what 64x MEANS for
each family on a key-shifted replica corpus (where every document has
exactly 64 verbatim copies):

- winnowing_fingerprints is per-document (fingerprints, not pairs):
  probe it STRAIGHT at 64x — its ratio against linear is the
  asymptote check.
- exact_dup_groups / dedup_survivors are the mandated FIRST stage of
  the curation pipeline: probe them straight at 64x (digest shuffle —
  the claim is linearity).
- simhash_near_dup emits pairs: on the replica corpus its output
  grows ~replicas^2 BY DEFINITION (each duplicate group of g copies
  emits ~C(g,2) pairs). Probe it straight at 64x anyway — time per
  OUTPUT ROW is the honest asymptote — and then re-probe on the
  DEDUPED corpus (survivors of exact dedup, with every other table
  copied), where the pipeline actually runs it.
- ppjoin_token_sets at 8x already exceeded 25 minutes producing the
  (correct, enormous) answer and is excluded a fortiori at 64x; it is
  measured on the deduped corpus only — the ordering
  corpus_curation_funnel encodes.

Usage: python tools/scale_probe_text.py [N]   (default 64)
Writes .scratch/sfx{N}text/ (documents replicated, other tables
copied) and .scratch/sfx{N}dedup/ (documents = exact-dedup survivors
of the replica corpus). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIED = (
    "region nation customer supplier part orders lineitem events "
    "embeddings"
).split()


def build(spark, n: int, rep_dir: str, dedup_dir: str) -> None:
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    os.makedirs(rep_dir, exist_ok=True)
    os.makedirs(dedup_dir, exist_ok=True)
    docs = load_table(spark, BASE, "documents")
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10**9))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(rep_dir, "documents.parquet")
    )
    for name in COPIED:
        src = os.path.join(BASE, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        for d in (rep_dir, dedup_dir):
            dst = os.path.join(d, f"{name}.parquet")
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)

    # stage 1 of the curation pipeline, materialized: exact-dedup
    # survivors of the replica corpus become the deduped documents
    # table (lowest doc_id per digest — dedup_survivors semantics)
    from celestrak_tle_data_pipeline_spark import plans

    qs = plans.all_queries()
    surv = qs["dedup_survivors"](spark, rep_dir).select("doc_id")
    rep_docs = spark.read.parquet(
        os.path.join(rep_dir, "documents.parquet")
    )
    rep_docs.join(surv, "doc_id").write.mode("overwrite").parquet(
        os.path.join(dedup_dir, "documents.parquet")
    )


def timed(qs, name, spark, sf_dir):
    df = qs[name](spark, sf_dir)
    n_rows = len(df.toPandas())  # cold: codegen + cache
    t0 = time.time()
    df.toPandas()
    return time.time() - t0, n_rows


def main(argv) -> int:
    n = int(argv[0]) if argv else 64
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_text")
    rep_dir = os.path.join(ROOT, ".scratch", f"sfx{n}text")
    dedup_dir = os.path.join(ROOT, ".scratch", f"sfx{n}dedup")
    if not os.path.isdir(os.path.join(rep_dir, "documents.parquet")):
        print(f"building {n}x text dataset ...", file=sys.stderr)
        build(spark, n, rep_dir, dedup_dir)

    qs = plans.all_queries()
    report: dict = {"n": n}
    straight = [
        "winnowing_fingerprints",
        "exact_dup_groups",
        "dedup_survivors",
        "simhash_near_dup",
    ]
    for name in straight:
        t1, r1 = timed(qs, name, spark, BASE)
        tn, rn = timed(qs, name, spark, rep_dir)
        report[name] = {
            "t_x1_sec": round(t1, 3),
            f"t_x{n}_sec": round(tn, 3),
            "rows_x1": r1,
            f"rows_x{n}": rn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
        print(
            f"{name:24s} x1={t1:7.2f}s ({r1} rows)  "
            f"x{n}={tn:7.2f}s ({rn} rows)  ratio={tn / t1:6.2f}",
            file=sys.stderr,
        )
    for name in ("simhash_near_dup", "ppjoin_token_sets",
                 "winnowing_fingerprints"):
        td, rd = timed(qs, name, spark, dedup_dir)
        report.setdefault(name, {})[f"t_dedup{n}_sec"] = round(td, 3)
        report[name][f"rows_dedup{n}"] = rd
        print(
            f"{name:24s} dedup({n}x)={td:7.2f}s ({rd} rows)",
            file=sys.stderr,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
