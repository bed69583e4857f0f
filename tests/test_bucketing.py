"""Bucketed warehouse tables (X5): the shuffle is paid at write time,
not per query — verified at the PLAN level (no Exchange on bucket-key
aggregation / self-join over the bucketed table)."""

from __future__ import annotations

from celestrak_tle_data_pipeline_spark.sinks.warehouse import (
    ParquetWarehouse,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_groupby_and_join_skip_exchange(spark, tmp_path):
    from pyspark.sql import functions as F

    src = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("norad_id"),
        F.col("id").alias("epoch_seq"),
        (F.col("id") % 97 / 10.0).alias("mean_motion"),
    )
    wh = ParquetWarehouse(spark, str(tmp_path))
    write_bucketed(
        wh, "fact_bucketed", src,
        bucket_cols=("norad_id",), n_buckets=4,
        sort_cols=("norad_id", "epoch_seq"), mode="overwrite",
    )

    t = spark.table("fact_bucketed")

    agg = t.groupBy("norad_id").agg(F.avg("mean_motion"))
    agg_plan = _plan(agg)
    assert "Exchange" not in agg_plan, agg_plan

    # For the join, force sort-merge (a broadcast join would hide the
    # co-location win behind a BroadcastExchange): bucketed sides need
    # no shuffle — no `Exchange hashpartitioning` anywhere in the plan.
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = t.alias("a").join(t.alias("b"), "norad_id")
        join_plan = _plan(j)
        assert "Exchange hashpartitioning" not in join_plan, join_plan
        assert "SortMergeJoin" in join_plan, join_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    # control: the same aggregation over non-bucketed parquet shuffles
    src.write.mode("overwrite").parquet(str(tmp_path / "plain"))
    plain = spark.read.parquet(str(tmp_path / "plain"))
    control = _plan(plain.groupBy("norad_id").agg(F.avg("mean_motion")))
    assert "Exchange" in control, control

    spark.sql("DROP TABLE fact_bucketed")
