"""Plan-shape regression tests: the 100 TB properties.

Correctness says what a query returns; these tests pin HOW — pushed
filters reach the scan, dims broadcast instead of shuffling the fact
side, zero-shuffle operators stay zero-shuffle. A refactor that keeps
results right but regresses a plan to a full-shuffle shape fails here,
at sf0.001 plan-build cost.
"""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark import plans

from conftest import SF_DIR


def _plan(spark, name, sf=SF_DIR):
    df = plans.all_queries()[name](spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    # count shuffle exchanges only; BroadcastExchange is the cheap kind
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def test_pruned_scan_pushes_ts_into_parquet(spark):
    plan = _plan(spark, "pruned_scan_recent")
    # the 3-day bound reaches the parquet scan as a literal comparison
    # (raw int64 nanos on nanos-encoded files) — row-group pruning works
    assert "GreaterThan(ts" in plan
    assert _shuffles(plan) == 0


def test_antijoin_is_broadcast_no_shuffle(spark):
    plan = _plan(spark, "antijoin_composite_key")
    assert _shuffles(plan) == 0
    assert "BroadcastHashJoin" in plan


def test_stride3_assembly_is_shuffle_free(spark):
    plan = _plan(spark, "tle_assembly_stride3")
    assert _shuffles(plan) == 0


def test_star_joins_broadcast_dims(spark):
    top = _plan(spark, "top_revenue_orders")
    # customer dim must broadcast — the fact side never shuffles for it
    assert top.count("BroadcastHashJoin") >= 1
    region = _plan(spark, "region_revenue")
    # customer, nation, region (and supplier-free chain) all broadcast
    assert region.count("BroadcastHashJoin") >= 3


def test_exact_dedup_shuffles_digests_once(spark):
    plan = _plan(spark, "exact_dup_groups")
    assert _shuffles(plan) == 1


def test_tfidf_corpus_size_stays_lazy(spark):
    # n_docs must be an aggregate INSIDE the plan (broadcast cross-join),
    # not a literal baked in by an eager driver-side count()
    plan = _plan(spark, "tfidf_top_terms")
    assert "n_docs" in plan


def test_pii_scrub_is_map_only(spark):
    # detect/redact is a pure projection: no shuffle, no Python
    plan = _plan(spark, "pii_scrub_contacts")
    assert _shuffles(plan) == 0
    assert "Python" not in plan


def test_dataset_split_assign_is_single_shuffle(spark):
    # the hash assignment itself is projection-only; the verification
    # summary adds exactly one partial-agg shuffle
    plan = _plan(spark, "dataset_split_assign")
    assert _shuffles(plan) == 1


def test_rollup_cascade_second_level_reads_rollup(spark):
    # two grains -> two agg shuffles; the day level must aggregate the
    # hourly rollup, never re-scan raw events (exactly one scan)
    plan = _plan(spark, "rollup_cascade_daily")
    assert _shuffles(plan) == 2
    assert plan.count("Scan parquet") == 1


def test_runtime_bloom_filter_injection(spark):
    """Catalyst injects a bloom-filter runtime filter on the probe side
    of a selective shuffle join — the scan-reduction path that matters
    when neither side broadcasts at 100 TB. Session AQE+bloom confs
    must keep this reachable (thresholds here only shrink the
    trigger sizes to test scale)."""
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        sel = o.where(F.col("o_totalprice") > 400000)
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_funnel_is_single_scan_single_shuffle(spark):
    plan = _plan(spark, "funnel_conversion")
    assert plan.count("Scan parquet") == 1
    assert _shuffles(plan) <= 2  # user_id window + singleton agg
    assert "In(event_type" in plan  # stage filter pushed to the scan


def test_cohort_retention_is_single_scan(spark):
    plan = _plan(spark, "cohort_retention")
    assert plan.count("Scan parquet") == 1
    assert _shuffles(plan) <= 3  # user collapse + tiny matrix + window


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: a hot key that swamps one shuffle
    partition is split at runtime (SortMergeJoin(skew=true) +
    'skewed' AQEShuffleRead) — the engine's answer to hot-satellite /
    hot-document keys at 100 TB, complementing the explicit salting
    pattern (salted_heavy_hitters). Thresholds here only shrink the
    trigger sizes to test scale."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin"
        ".skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 2_000_000).select(
            F.when(F.col("id") % 10 < 9, 7)
            .otherwise(F.col("id") + F.lit(10**9))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.toPandas()) == 1_800_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_native_minhash_single_shuffle(spark):
    # signature construction is projection-only (array HOFs); the only
    # full shuffle is the final candidate distinct — band matching and
    # jaccard-verify joins all broadcast at dim scale
    plan = _plan(spark, "minhash_native_near_dup")
    assert _shuffles(plan) <= 2
    assert "BroadcastHashJoin" in plan


def test_tpch_q6_is_zero_shuffle_pushed_scan(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    # the only exchange is the SinglePartition merge of 2 numbers —
    # no hash/range repartitioning of data rows anywhere
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange rangepartitioning") == 0
    # predicates reach the scan (toString elides PushedFilters, so
    # check the DataFilters rendering)
    assert "isnotnull(l_shipdate" in plan


def test_tpch_q3_broadcasts_filtered_dims(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") == 2
    assert _shuffles(plan) <= 2  # agg + top-10 sort; fact never re-shuffles


def test_events_nanos_pushdown_is_raw_int64(spark, tmp_path):
    # Round-2 fix, pinned: on a nanos-encoded events file the 3-day
    # bound must be pushed in the file's PHYSICAL domain — a literal
    # comparison on the raw int64 nanos (ts > ts_min_us*1000), BEFORE
    # the µs conversion — or parquet row-group pruning never happens
    # (a predicate on the converted timestamp is post-scan). The driver
    # switched the testdata encoding to µs in round 5, so the nanos
    # path is pinned against a synthesized nanos file instead of
    # whatever encoding the current testdata happens to use.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    ts_min_us = 1_600_000_000_000_000  # arbitrary fixed anchor
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [ts_min_us * 1000 - 5, ts_min_us * 1000 + 5],
                pa.timestamp("ns"),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet", version="2.6")
    df = load_table(spark, str(tmp_path), "events", ts_min_us=ts_min_us)
    full = df._jdf.queryExecution().toString()
    assert f"GreaterThan(ts,{ts_min_us * 1000})" in full, full[-2000:]
    # and the exact strict-µs predicate still guards post-conversion
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_events_micros_pushdown_and_ltz(spark):
    # The µs-encoded driver file: the bound pushes as a plain timestamp
    # predicate on the scan, and the NTZ-inference override keeps the
    # column session-tz TIMESTAMP (naive-UTC semantics).
    import pyspark.sql.types as T

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    ts_min_us = 1_600_000_000_000_000
    df = load_table(spark, SF_DIR, "events", ts_min_us=ts_min_us)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    full = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in full, full[-2000:]


def test_tpch_q5_cycle_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "tpch_q5_local_supplier_volume")
    # region->nation->supplier and customer legs all broadcast; the
    # only shuffle is the 25-group aggregation — the fact side never
    # sort-merge-joins
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert _shuffles(plan) <= 2


def test_tpch_q10_single_agg_shuffle(spark):
    plan = _plan(spark, "tpch_q10_returned_items")
    assert "SortMergeJoin" not in plan
    # quarter + returnflag predicates reach the scans
    assert "isnotnull(l_returnflag" in plan or "l_returnflag" in plan
    assert _shuffles(plan) <= 2  # agg + top-20 sort


def test_tpch_q13_preaggregates_orders_before_outer_join(spark):
    plan = _plan(spark, "tpch_q13_customer_distribution")
    # the outer join input must be the (custkey, count) pre-aggregate,
    # not raw orders: exactly one HashAggregate pair below the join
    assert plan.count("Exchange hashpartitioning") <= 2


def test_tpch_q4_exists_compiles_to_semi_join(spark):
    plan = _plan(spark, "tpch_q4_priority_late_ship")
    # the EXISTS must be a semi join (stops at first match), never a
    # dedup-then-inner-join, and the quarter bound reaches the scan
    assert "LeftSemi" in plan
    assert "isnotnull(o_orderdate" in plan


def test_tpch_q8_largest_join_graph_broadcasts_all_dims(spark):
    plan = _plan(spark, "tpch_q8_market_share")
    # part, supplier+nation, customer+nation+region all broadcast; the
    # only non-broadcast join is lineitem ⋈ orders
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_tpch_q19_pushes_disjunctive_bands_to_both_scans(spark):
    plan = _plan(spark, "tpch_q19_banded_revenue")
    # the OR-of-conjunctions must not defeat the equi-join or the
    # per-side residual pushdown: quantity bands reach the lineitem
    # scan, brand/size union reaches the part scan
    assert "BroadcastHashJoin" in plan
    assert "l_quantity" in plan.split("Scan parquet")[1] if "Scan parquet" in plan else True
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tpch_scalar_subqueries_scan_each_table_once(spark):
    # Scalar/quantifier values must never trigger the naive
    # decorrelation's second fact scan (ReuseExchange does not
    # canonicalize the consumers). Q17/Q21/Q2 ride windows over
    # already-aggregated rows; Q11/Q15 persist the aggregated frame and
    # broadcast a one-row scalar back (round-6 rewrite — the persisted
    # branch replaces the parquet scan with InMemoryTableScan, so the
    # parquet count stays at one per table).
    for name, n_tables in (
        ("tpch_q17_small_quantity_revenue", 2),
        ("tpch_q21_waiting_suppliers", 4),
        ("tpch_q2_min_cost_supplier", 5),
    ):
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == n_tables, name
    # q11/q15: both consumers must read the SHARED persisted frame
    # (plan text echoes the cached lineage inside each InMemoryRelation
    # print, so raw parquet string counts over-report; the runtime
    # guarantee is the two InMemoryTableScan readers)
    for name in ("tpch_q11_important_parts", "tpch_q15_top_supplier"):
        plan = _plan(spark, name)
        assert plan.count("InMemoryTableScan") == 2, name


def test_interval_join_is_bucketed_equi_join(spark):
    plan = _plan(spark, "interval_overlap_join_bucketed")
    # the 24h-window overlap must run as an equi-join on (user, day)
    # with the range residual — never a nested-loop theta join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_double_correlation_is_count_based(spark):
    plan = _plan(spark, "tpch_q21_waiting_suppliers")
    # EXISTS/NOT EXISTS evaluate from per-order counts, not correlated
    # self-joins: no nested-loop join anywhere, supplier dim broadcasts
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_zorder_tiles_all_skippable(spark):
    # the Morton-layout invariant itself, not just engine agreement:
    # every 16x16 tile's per-dimension span must be <= 15, so a
    # min/max-footer predicate on either dimension prunes ~15/16 of
    # tiles. pmod keeps both dims in [0, 255] for any date domain.
    df = plans.all_queries()["zorder_morton_layout"](spark, SF_DIR)
    bad = df.where(~df.skippable).count()
    assert bad == 0


def test_token_vote_scans_corpus_exactly_twice(spark):
    # train pass + inference pass — class totals must ride a window
    # over the (tok, lang) counts, not a third corpus aggregation
    plan = _plan(spark, "token_vote_classifier")
    assert plan.count("Scan parquet") == 2
    assert "CartesianProduct" not in plan


def test_item_cooccurrence_materializes_shared_pairs(spark):
    # the distinct (part, cust) set feeds four subtrees; without
    # persist() the fact join runs four times (8 scans). All four
    # consumers must read the InMemoryRelation, and the pair join must
    # stay an equi-join.
    plan = _plan(spark, "item_cooccurrence_cosine")
    assert plan.count("InMemoryTableScan") == 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_duplicate_ngram_spans_is_gram_equi_join(spark):
    plan = _plan(spark, "duplicate_ngram_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_no_product_join(spark):
    # SNM generates candidates from lead() windows, never a pair join
    plan = _plan(spark, "sorted_neighborhood_pairs")
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # no join operator at all — window only


def test_bfs3_stays_equi_join(spark):
    plan = _plan(spark, "dup_graph_bfs3")
    assert "CartesianProduct" not in plan


def test_countmin_never_undercounts(spark):
    # the deterministic CM property: every estimate >= the exact count
    df = plans.all_queries()["countmin_heavy_hitters"](spark, SF_DIR)
    bad = df.where(~df.never_undercounts).count()
    assert bad == 0


def test_qgram_prefix_filter_complete(spark):
    # the prefix-filtering guarantee: the blocked join finds EVERY pair
    # the quadratic baseline finds (no false negatives) — verified
    # against brute force at sf0.001
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    got = (
        plans.all_queries()["qgram_prefix_filter_pairs"](spark, SF_DIR)
        .select("key1", "key2")
        .collect()
    )
    p = load_table(spark, SF_DIR, "part").select("p_partkey", "p_name")
    a, b = p.alias("a"), p.alias("b")
    want = (
        a.join(b, F.col("a.p_name") < F.col("b.p_name"))
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(
            F.col("a.p_partkey").alias("key1"),
            F.col("b.p_partkey").alias("key2"),
        )
        .collect()
    )
    assert set(map(tuple, got)) == set(map(tuple, want))


def test_ppjoin_prefix_filter_complete(spark):
    # PPJoin's prefix-filtering guarantee: the blocked set-similarity
    # join finds EVERY Jaccard>=0.7 pair the quadratic baseline finds —
    # verified against brute force at sf0.001
    from pyspark.sql import functions as F

    from celestrak_tle_data_pipeline_spark.sources.tables import load_table

    got = (
        plans.all_queries()["ppjoin_token_sets"](spark, SF_DIR)
        .select("id1", "id2")
        .collect()
    )
    s = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
            F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("n"),
        )
    )
    a = s.select(
        F.col("doc_id").alias("id1"),
        F.col("toks").alias("t1"),
        F.col("n").alias("n1"),
    )
    b = s.select(
        F.col("doc_id").alias("id2"),
        F.col("toks").alias("t2"),
        F.col("n").alias("n2"),
    )
    common = F.size(F.array_intersect("t1", "t2"))
    want = (
        a.join(b, F.col("id1") < F.col("id2"))
        .where(
            common.cast("double")
            / (F.col("n1") + F.col("n2") - common)
            >= 0.7
        )
        .select("id1", "id2")
        .collect()
    )
    assert set(map(tuple, got)) == set(map(tuple, want))
    assert len(want) > 0


def test_parquet_aggregate_pushdown_v2(spark):
    """MIN/MAX/COUNT over a parquet scan can resolve from footer
    statistics without reading data pages — Spark's DSv2 aggregate
    pushdown. Not enabled session-wide (the engine's plan pins assume
    the v1 scan strings); this pins that the capability is one conf
    flip away for metadata-only probes at 100 TB."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.sources.useV1SourceList": "",
        "spark.sql.parquet.aggregatePushdown": "true",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = spark.read.parquet(f"{SF_DIR}/orders.parquet").agg(
            F.min("o_orderkey"), F.max("o_orderkey"), F.count(F.lit(1))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan, plan[-1500:]
        row = tuple(df.collect()[0])
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    # footer-stats answer must equal the data-page answer
    base = tuple(
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .agg(F.min("o_orderkey"), F.max("o_orderkey"), F.count(F.lit(1)))
        .collect()[0]
    )
    assert row == base and base[2] > 0


def test_runtime_bloom_filter_join_pruning(spark):
    """Spark's InjectRuntimeFilter: a selective filter on one join side
    builds a bloom filter at runtime and pushes might_contain() into
    the OTHER side's scan — the mechanism that turns a 100 TB
    fact-fact shuffle join into a pre-filtered one without bucketing.
    Not exercised by the engine's default plans (dims broadcast, and
    the application-side threshold is 10 GB); this pins that the
    capability is a conf flip away and that the filtered result is
    identical."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # bench-SF scans are far below the 10 GB production threshold
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1b",
        # force a shuffle join: broadcast joins get no runtime filter
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}

    def q():
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[-1500:]
        filtered = {tuple(r) for r in df.collect()}
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    base = {tuple(r) for r in q().collect()}
    assert filtered == base and len(base) == 1


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join certification: a 90%-hot key makes one shuffle
    partition dwarf the median, and AQE splits it into parallel
    sub-partitions at runtime — `SortMergeJoin(skew=true)` over an
    `AQEShuffleRead skewed` in the FINAL plan. This is the no-code
    answer to join skew at 100 TB (manual salting — X13,
    salted_heavy_hitters — remains for aggregations, where AQE cannot
    split). Caveat pinned here by construction: skew splitting only
    applies when nothing downstream requires the join's output
    partitioning — a groupBy on the join key right after the join
    disables it (ENSURE_REQUIREMENTS), which is why this test ends in
    a projection."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}

    def q():
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id"))
            .alias("key"),
            F.col("id").alias("val"),
        )
        right = spark.range(0, 2000).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("rv")
        )
        return left.join(right, "key").select(
            (F.col("val") + F.col("rv")).alias("s")
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        n = df.count()
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    # split partitions must not change the join result
    assert n == q().count() == 270200


def test_incremental_merge_pushes_both_slice_bounds(spark):
    # history and new-batch slices must reach the scans as literal
    # timestamp predicates (LessThan / GreaterThanOrEqual)
    plan = _plan(spark, "incremental_agg_merge")
    assert "LessThan(ts," in plan
    assert "GreaterThanOrEqual(ts," in plan


def test_attribution_is_single_scan_single_window(spark):
    plan = _plan(spark, "attribution_first_last_touch")
    assert plan.count("Scan parquet") == 1
    assert _shuffles(plan) <= 2  # user window + tiny matrix agg


def test_funnel_time_bounded_single_scan(spark):
    plan = _plan(spark, "funnel_time_bounded")
    assert plan.count("Scan parquet") == 1
    assert "In(event_type" in plan  # stage filter pushed


def test_session_path_no_product_join(spark):
    plan = _plan(spark, "session_path_analysis")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 1


def test_topk_takes_compile_to_take_ordered(spark):
    # r5 verdict #7: total-ordered top-k selections must compile to
    # TakeOrderedAndProject (per-partition heaps + one k-row merge),
    # never a row_number() over an unpartitioned window that exchanges
    # the whole frame to a single partition first.
    for name in (
        "item_cooccurrence_cosine",
        "session_path_analysis",
        "bm25_topk_docs",
    ):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
    # the two rank-free queries must carry no single-partition exchange
    # at all (bm25 keeps a scalar-aggregate merge for corpus stats, and
    # its rank window reads the already-limited k-row output)
    for name in ("item_cooccurrence_cosine", "session_path_analysis"):
        assert "Exchange SinglePartition" not in _plan(spark, name), name


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """Hive-style partition pruning: a predicate on the partition
    column must land in PartitionFilters (directory-level pruning —
    at 100 TB the difference between listing one day and scanning a
    year), and the pruned read must touch only the matching
    partition's files."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "pt")
    spark.createDataFrame(
        [(i, f"2026-08-{d:02d}") for d in (1, 2, 3) for i in range(20)],
        "k long, day string",
    ).write.partitionBy("day").parquet(base)

    # poison a SIBLING partition: a pruned read never opens the file,
    # an unpruned scan would throw on it — behavioral proof, not just
    # plan text (inputFiles() lists pre-pruning and can't distinguish)
    import os

    with open(
        os.path.join(base, "day=2026-08-01", "garbage.parquet"), "wb"
    ) as fh:
        fh.write(b"not a parquet file")

    # explicit schema: no footer-driven schema inference (which would
    # itself open every file — the production discipline at 100 TB)
    df = (
        spark.read.schema("k long, day string")
        .parquet(base)
        .where(F.col("day") == "2026-08-02")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2026-08-02" in plan, plan[-1200:]
    assert df.count() == 20
    assert [r.k for r in df.orderBy("k").collect()] == list(range(20))


def test_tpch_q11_q15_no_entity_grain_global_window(spark):
    # round-6 rewrite: global total / scalar max come from a persisted
    # one-row aggregate broadcast back, never a window that exchanges
    # the part-/supplier-grain frame to a single partition
    import re

    for name in ("tpch_q11_important_parts", "tpch_q15_top_supplier"):
        plan = _plan(spark, name)
        for m in re.finditer(r"Exchange SinglePartition", plan):
            ctx = plan[max(0, m.start() - 500):m.start()]
            assert "Window" not in ctx, name
        assert "InMemoryTableScan" in plan, name  # persisted shared frame


def test_hilbert_tiles_are_exact_subquadrants(spark):
    # every 256-cell aligned Hilbert segment is one 16x16 subquadrant:
    # per-dimension span exactly <= 15 on every tile (the same bound as
    # Morton's high-byte tiles, with adjacency continuity on top)
    from pyspark.sql import functions as F

    df = plans.all_queries()["hilbert_curve_layout"](spark, SF_DIR)
    bad = df.where(
        (F.col("max_x") - F.col("min_x") > 15)
        | (F.col("max_y") - F.col("min_y") > 15)
        | ~F.col("skippable")
    ).count()
    assert bad == 0


def test_digest_is_one_shuffle_no_window(spark):
    # the replica-equality digest must stay a pure map-side fold plus
    # one source-keyed partial aggregation: no windows, no sorts, no
    # single-partition exchange — that shape is WHY it works at 100 TB
    plan = _plan(spark, "rowhash_table_digest")
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    # source-keyed agg + the (source, v) pre-aggregation the exact
    # distinct-hash count adds; nothing else
    assert _shuffles(plan) == 2


def test_mmr_pool_compiles_to_take_ordered(spark):
    # the candidate pool must be a TakeOrderedAndProject (top-50), and
    # only the bounded greedy runs in Python (one ArrowEvalPython-free
    # FlatMapGroupsInPandas over the 50-row pool)
    plan = _plan(spark, "mmr_diversified_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_cuped_has_no_window_and_two_aggregations(spark):
    plan = _plan(spark, "cuped_adjusted_ab")
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 2  # events + broadcast bounds
    # the only hash exchange is the user-grain rollup; everything
    # after it is scalar-sized
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_clamped_balance_windows_share_one_shuffle(spark):
    # both reflection windows and the rollup run on the same user
    # partitioning: exactly one data-sized exchange
    plan = _plan(spark, "clamped_running_balance")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning(user_id") == 1
