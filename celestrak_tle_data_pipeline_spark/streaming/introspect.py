"""Offline state-store introspection (the streaming ops-audit surface).

At scale a streaming job's state store IS the job: watermarked dedup
sets, windowed partial aggregates, transformWithState variables and
timers. When state goes wrong — a hot key ballooning one partition, a
dedup set that never expires, a processor leaking rows per key — the
running query can't say so; it just slows, spills, or OOMs. Spark 4's
state data source (the ``state-metadata`` and ``statestore`` read
formats) reads a checkpoint's state OFFLINE, as a DataFrame, with no
query restart and no state-store lock. This module wraps it as the
audit surface the engine's streaming operators (SURVEY.md §2.9,
X159–X163) are certified against:

- :func:`state_metadata` — operator/store inventory plus the committed
  micro-batch range of each store;
- :func:`state_variables` — a transformWithState operator's DECLARED
  state variables parsed from its operator properties, tying the
  processor classes to their physical stores;
- :func:`read_state` — state rows with structs flattened to scalar
  columns; optional time travel (``batch_id``) and TWS state-variable
  selection (``state_var``);
- :func:`read_timers` — registered event-/processing-time timers per
  key (the X159 one-live-timer-per-key invariant becomes checkable
  offline);
- :func:`state_skew_profile` — per-partition state-row histogram
  reduced to (rows, non-empty partitions, max, skew ratio): the
  "is my keyspace hot-spotted" probe.

Scale shape: every reader here is state- or metadata-sized — orders of
magnitude below the stream itself, which is the entire point of
auditing the store instead of replaying the input. The skew profile is
one shuffle over state rows; everything else is a pruned columnar read
of the checkpoint.

Reference scope: the reference (script.py) is a batch cron loader with
no streaming state; this surface exists because the Spark
re-expression runs the same semantics as continuous queries, and
continuous queries need an offline audit path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/store inventory of a checkpoint: one row per state store
    with (operatorId, operatorName, stateStoreName, numPartitions,
    minBatchId, maxBatchId, operatorProperties)."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_variables(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> list[dict]:
    """The state variables a transformWithState operator DECLARED
    (name, type, ttl), parsed from the checkpoint's operator metadata.
    Empty for non-TWS operators (their single store is implicit).

    The collect is operator-count-sized (metadata, not state)."""
    rows = (
        state_metadata(spark, checkpoint)
        .where(F.col("operatorId") == operator_id)
        .select("operatorProperties")
        .collect()
    )
    out: list[dict] = []
    seen: set[str] = set()
    for (props,) in rows:
        if not props:
            continue
        for var in json.loads(props).get("stateVariables", []):
            if var["stateName"] not in seen:
                seen.add(var["stateName"])
                out.append(var)
    return out


def _flatten(df: DataFrame) -> DataFrame:
    """Expand every top-level struct column to ``<col>_<field>`` scalar
    columns (key/value structs vary per operator; the audit comparisons
    want plain columns)."""
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols.extend(
                F.col(f"{f.name}.{sub.name}").alias(f"{f.name}_{sub.name}")
                for sub in f.dataType.fields
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    state_var: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """State rows of one store at one committed batch.

    ``batch_id`` time-travels to any batch the checkpoint retains
    (default: latest committed). ``state_var`` selects a
    transformWithState variable by name; ``store_name`` a non-default
    store (e.g. a stream-stream join's four internal stores). With
    ``flatten`` the key/value structs become ``key_*`` / ``value_*``
    scalar columns beside ``partition_id``."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if state_var is not None:
        reader = reader.option("stateVarName", state_var)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    return _flatten(df) if flatten else df


def read_join_state(
    spark: SparkSession,
    checkpoint: str,
    side: str,
    *,
    operator_id: int = 0,
    flatten: bool = True,
) -> DataFrame:
    """One side's buffered rows of a stream-stream join
    (``side`` ∈ {'left','right'}). A symmetric hash join keeps every
    in-watermark input row of BOTH sides in four internal stores; this
    read answers the production question "who is waiting on whom" —
    rows buffered on one side with no counterpart yet on the other are
    exactly the join's open obligations, and their volume per side is
    the state-growth early warning."""
    df = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("joinSide", side)
        .load(checkpoint)
    )
    return _flatten(df) if flatten else df


def read_state_changes(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    start_batch_id: int = 0,
    end_batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The state CHANGE FEED: per-batch (batch_id, change_type, key,
    value) upsert/delete records between two committed batches — the
    incremental view of state, sized by what each batch TOUCHED rather
    than by total state. This is the replication/debug primitive: ship
    state deltas to a replica, or answer "which keys did batch N
    rewrite" without diffing two full snapshots."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch_id)
    )
    if end_batch_id is not None:
        reader = reader.option("changeEndBatchId", end_batch_id)
    df = reader.load(checkpoint)
    return _flatten(df) if flatten else df


def read_timers(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    flatten: bool = True,
) -> DataFrame:
    """Registered transformWithState timers: one row per (key, expiry).
    The X159 sessionizer's delete-then-re-arm contract — exactly one
    live timer per key, at last_event_ms + gap — is assertable from
    this frame alone, no replay."""
    df = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("readRegisteredTimers", "true")
        .load(checkpoint)
    )
    return _flatten(df) if flatten else df


def state_skew_profile(state_df: DataFrame) -> DataFrame:
    """Reduce a ``read_state`` frame to one audit row:
    (state_rows, nonempty_partitions, max_partition_rows,
    skew_ratio = max/avg over non-empty partitions).

    A skew_ratio near 1 means the key hashing spreads state evenly; a
    large ratio is the hot-key early warning (the partition that will
    OOM first at 1000× state). One shuffle over state rows."""
    per = state_df.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return per.agg(
        F.sum("n_rows").cast("bigint").alias("state_rows"),
        F.count(F.lit(1)).cast("bigint").alias("nonempty_partitions"),
        F.max("n_rows").cast("bigint").alias("max_partition_rows"),
        F.round(
            F.max("n_rows") / F.avg("n_rows"), 6
        ).alias("skew_ratio"),
    )
