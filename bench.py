"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines, detail first and a compact summary LAST:
  line 1: {"metric": "total_query_sec_detail", ... full per-query
           cold/rows/floor-subtracted maps ...}
  line 2: {"metric": "total_query_sec", "value": N, "unit": "sec",
           "queries": {...median warm sec...}, "sf": <sf>, ...}

The summary line is intentionally small (≤ ~1 KB): the driver's tail
capture truncates long output and rounds 6–7 lost the headline metric
to a single oversized line (`parsed: null`); the final line alone is
fully self-contained.

Each query's full plan is executed (collect) after a shared warm-up
pass that touches every table file once, so timings measure execution,
not first-touch page cache or session startup. Warm time is the
MEDIAN of three repetitions (best-of hides tail noise one way,
mean smears hiccups the other; the r7 cross-round "1.6x" was pure
box constant at ±40% run-to-run), and `floor_subtracted` restates
each query net of the measured py4j/Arrow overhead floor so
constant-dominated entries compare as ~0 across rounds.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Idle-box reference bracket (VERDICT r14 item 1 / "What's missing" 1):
# the most recent pair of back-to-back bench runs on an IDLE box,
# updated at each round's session close (SCALING.md carries the run
# narrative). Emitted in the summary line so BENCH_rN is
# self-annotating about box noise: an official warm total inside or
# near this envelope with loadavg_start high is contention, not a
# regression — without cross-reading SCALING.md.
# Rounded OUTWARD so every observed clean idle run sits inside it
# (ADVICE r17). Round-18 lesson: guest loadavg is a NECESSARY but not
# SUFFICIENT idleness signal — two r18-close runs at loadavg 0.00-0.06
# ran 13-34% slow from hypervisor-level contention (no local process;
# the guest can't see the host); the cold-phase total is the detector
# (cold >> the clean 37-42 s family means the host was busy, not the
# engine slower). See SCALING.md round-18 close for the run ledger.
# Round-18 OPTIMIZATION update: the bracket below is the
# post-optimization family (three settled runs, warm 2.33-2.45 / cold
# 34.5-37.7, loadavg_1m_start 0.02-0.88) — the referential audit's
# construction-time driver loop moved into the lazy plan (cold -3 s)
# and its local-RDD warm pass became a reused-stage union pass
# (warm -0.26 s); see OPTIMIZATION_r18.md. The pre-optimization r18
# bracket was warm [2.77, 3.15] / cold [37.3, 41.8] on a faster box.
IDLE_BRACKET = {
    "round": 18,
    "warm_sec": [2.32, 2.54],
    "cold_sec": [34.5, 38.0],
}

# Headline set: the flagship + one representative per operator family
# (scan/agg, star join, window, set op, TLE parse, text dedup/analysis,
# vector search). Kept to ~a dozen so the bench stays a feedback loop.
QUERIES = [
    "tle_decay_flagship",       # flagship: TLE parse -> decay window
    "decay_indicator",          # events twin: window lag/delta per entity
    "pricing_summary",          # TPC-H Q1 shape groupBy/agg
    "top_revenue_orders",       # star join + top-k
    "region_revenue",           # snowflake join chain
    "antijoin_composite_key",   # idempotency anti-join
    "session_windows",          # sessionization over events
    "tle_parse_telemetry",      # fixed-width expression parse bundle
    "exact_dup_groups",         # digest dedup
    "text_quality_score",       # text analysis
    "simhash_near_dup",         # banded LSH near-dup
    "cosine_topk_exact",        # brute-force ANN baseline
    "ann_ivf_topk",             # probed ANN
    "stats_moments_by_flag",    # advanced agg (skew/kurtosis moments)
    "multimodal_decode_stub",   # Arrow-batched mapInPandas kernel
    "funnel_conversion",        # product analytics: chained window minima
    "rollup_cascade_daily",     # continuous-aggregate cascade
    "tpch_q8_market_share",     # classic OLAP: 8-relation join graph
    "duplicate_ngram_spans",    # cross-doc span-dup gram pipeline (r5)
    "item_cooccurrence_cosine", # capped item-item similarity self-join (r5)
    "equidepth_histogram_bounded",  # boundary-broadcast scale twin (r6)
    "winnowing_fingerprints",   # MOSS fingerprint selection (r6)
    "cuped_adjusted_ab",        # experimentation: user-grain moments (r6)
    "rowhash_table_digest",     # scan-bound integrity fold (r6)
    "bigram_lm_perplexity",     # LM scoring: model joins over grams (r6)
    "mmr_diversified_topk",     # bounded-pool Arrow greedy kernel (r6)
    "systematic_weighted_sample",   # ranged PPS cumsum, no global window (r7)
    "pareto_decile_ranged",     # boundary-broadcast decile twin (r7)
    "referential_integrity_audit",  # six anti-join FK orphan counts (r8)
    "interval_coalesce_union",  # running-max interval sweep (r8)
    "spearman_rank_corr",       # double ranged-rank machinery (r8)
    "bpe_pair_merge_step",      # pair explode + hash agg + TakeOrdered (r8)
]


def testdata_inventory(sf_dir: str) -> dict:
    """Per-table parquet layout at the benched SF: [files, bytes,
    row_groups, rows]. The driver regenerates /root/testdata each
    round, and the round-15 idle-bracket drift (~0.2 s warm on zero
    bench-path code change) could only be ATTRIBUTED to a layout
    shift by argument, not by data (VERDICT r15, missing item 1) —
    this records the layout beside every bracket so an envelope
    shift on unchanged code is explained by the artifact itself.
    Metadata-only reads; adds no measurable time. Best-effort by
    contract (ADVICE r16): it runs AFTER the timed loop, so nothing
    here may take the summary lines down — a broken pyarrow degrades
    row_groups/rows to -1, any other failure returns what was
    gathered so far. A table written as a DIRECTORY of part-files
    (should the driver ever change layout) is aggregated recursively
    rather than silently dropped from the signature."""
    import glob

    try:
        import pyarrow.parquet as pq
    except Exception:  # noqa: BLE001 — inventory is best-effort
        pq = None

    inv: dict[str, list[int]] = {}
    try:
        for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            name = os.path.basename(path).removesuffix(".parquet")
            files = (
                sorted(
                    glob.glob(
                        os.path.join(path, "**", "*.parquet"),
                        recursive=True,
                    )
                )
                if os.path.isdir(path)
                else [path]
            )
            nbytes = sum(os.path.getsize(f) for f in files)
            row_groups = rows = 0
            try:
                if pq is None:
                    raise ImportError("pyarrow unavailable")
                for f in files:
                    md = pq.ParquetFile(f).metadata
                    row_groups += md.num_row_groups
                    rows += md.num_rows
            except Exception:  # noqa: BLE001 — inventory is best-effort
                row_groups = rows = -1
            inv[name] = [len(files), nbytes, row_groups, rows]
    except Exception:  # noqa: BLE001 — never lose the summary lines
        pass
    return inv


def main() -> int:
    from celestrak_tle_data_pipeline_spark import plans
    from celestrak_tle_data_pipeline_spark.session import get_spark
    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        load_start = None

    spark = get_spark(app_name="bench")
    qs = plans.all_queries()

    # warm-up: touch every table once (page cache + schema inference)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            load_table(spark, SF_DIR, name).count()
        except Exception:  # noqa: BLE001 — missing table at this SF is fine
            pass

    # Four passes per query on the SAME DataFrame. The first (cold) pays
    # Catalyst analysis + whole-stage-codegen (Janino) compilation —
    # a per-plan constant (~1-2 s) that is noise at bench SF and fully
    # amortized on any real workload; the next three are warm passes and
    # the MEDIAN of the three is reported: robust to a one-off scheduler
    # hiccup (which best-of also rejects) AND to a one-off lucky cache
    # hit (which best-of keeps — round 3's "1.26x slower" and round 7's
    # "1.6x" were both unattributable single-sample artifacts).
    # `value` is the median-warm total, `cold_sec` discloses
    # compile-inclusive time.
    WARM_PASSES = 3

    # Measured harness overhead floor: best of several empty-plan
    # py4j + Arrow round-trips. Any query whose best-warm time is at or
    # under ~this floor is CONSTANT-DOMINATED — its reading tracks the
    # environment (scheduler/py4j/Arrow constants, ~30-90 ms on this
    # box), not data work, and cross-round comparisons should weight it
    # accordingly (the r5->r6 "regressions" were exactly this; see
    # SCALING.md). Reported as `overhead_floor_sec` with the affected
    # names in `constant_dominated`.
    floor = float("inf")
    trivial = spark.range(1).selectExpr("id")
    for _ in range(5):
        t0 = time.time()
        trivial.toPandas()
        floor = min(floor, time.time() - t0)
    floor = round(floor, 3)

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in QUERIES:
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        # Arrow-batched result transfer: measures engine execution, not
        # row-at-a-time Python Row materialization.
        rows[name] = len(df.toPandas())
        cold[name] = round(time.time() - t0, 3)
        samples = []
        for _ in range(WARM_PASSES):
            t1 = time.time()
            df.toPandas()
            samples.append(time.time() - t1)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)

    sf = None
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    constant_dominated = sorted(
        n for n, v in times.items() if v <= 2 * floor
    )
    floor_sub = {
        n: round(max(0.0, v - floor), 3) for n, v in times.items()
    }
    # Detail line FIRST (bulky maps: cold, rows, floor-subtracted) —
    # safe to truncate. The driver's tail capture (~2.2 KB) lost the
    # single ~4.5 KB payload line in rounds 6–7 (`parsed: null`), so
    # the LAST line is a compact, fully self-contained summary that
    # fits the capture on its own.
    inv = testdata_inventory(SF_DIR)
    detail = {
        "metric": "total_query_sec_detail",
        "cold_sec": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "rows": rows,
        "floor_subtracted": floor_sub,
        "constant_dominated": constant_dominated,
        # per-table [files, bytes, row_groups, rows] of the benched
        # SF dir — attributes idle-bracket envelope shifts to testdata
        # layout changes (see testdata_inventory).
        "testdata_inventory": inv,
    }
    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = None
    summary = {
        "metric": "total_query_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cold_sec": round(sum(cold.values()), 3),
        "overhead_floor_sec": floor,
        "floor_subtracted_total_sec": round(sum(floor_sub.values()), 3),
        "constant_dominated_n": len(constant_dominated),
        "warm_stat": "median_of_3",
        # box-noise self-annotation: the idle-box reference envelope
        # (updated at each round's session close) + 1-min loadavg
        # observed around THIS run — a warm total above the bracket
        # with loadavg >> CPUs-in-use is contention, not regression.
        "idle_bracket_round": IDLE_BRACKET["round"],
        "idle_bracket_warm_sec": IDLE_BRACKET["warm_sec"],
        "idle_bracket_cold_sec": IDLE_BRACKET["cold_sec"],
        "loadavg_1m_start": load_start,
        "loadavg_1m_end": load_end,
        # compact layout fingerprint of the benched SF dir (full
        # per-table inventory is in the detail line): total bytes +
        # a short stable digest — if the bracket moves on unchanged
        # code but this signature moved too, the cause is the
        # driver's testdata regeneration, not the engine.
        "testdata_bytes": sum(v[1] for v in inv.values()),
        "testdata_sig": hashlib.sha256(
            json.dumps(inv, sort_keys=True).encode()
        ).hexdigest()[:12],
    }
    sys.stdout.flush()
    print(json.dumps(detail, separators=(",", ":")), flush=True)
    print(json.dumps(summary, separators=(",", ":")), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
