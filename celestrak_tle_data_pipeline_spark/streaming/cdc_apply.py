"""Streaming CDC apply: change-log micro-batches through the parquet
MERGE sink, exactly-once by construction.

``foreachBatch`` is Structured Streaming's transactional escape hatch,
but its delivery contract is at-least-once: a crash BETWEEN the sink's
write and the checkpoint commit replays the last micro-batch — same
rows, same ``batch_id`` — on restart. The MERGE sink
(``sinks/warehouse.py::merge_upsert_telemetry``) is row-idempotent, so
a replay converges to the same table; but a replayed rewrite still
re-reads and rewrites partitions, and any downstream WITHOUT natural
idempotence (append ledgers, outbound notifications) duplicates. The
canonical fix — the shape Delta encodes as its ``txn`` app-id/version
API — is a durable applied-batch LEDGER consulted before applying:
``batch_id`` already present ⇒ skip. This module implements that
ledger on the warehouse itself, so merge and ledger share one storage
system and one failure domain.

Write order is the correctness argument: the MERGE lands BEFORE the
ledger row. A crash between the two replays the merge (harmless — the
same change rows merge to the same state) and then records it; the
reverse order could record a batch whose data never landed, which is
silent data loss. Both sides of the ordering are pinned by
``tests/test_cdc_stream.py``.

Scale shape: the ledger is one row per micro-batch (pure metadata; the
membership probe reads only the ``batch_id`` column), and the merge
cost is the sink's own — affected-date partition probe + rewrite of
touched partitions only. Nothing here scales with table size.

Reference scope: the reference loader (script.py:151-172) re-runs its
whole check-then-write under cron and relies on the 3-day dedup window
for crash safety; this is the streaming-native strengthening of that
contract (any-age upsert + exact replay detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import FACT_TELEMETRY
from ..sinks.warehouse import ParquetWarehouse, merge_upsert_telemetry

LEDGER_TABLE = "merge_ledger"
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("n_merged", T.LongType(), False),
    ]
)


class IdempotentMergeSink:
    """foreachBatch sink: change-log micro-batches → MERGE upsert, with
    an applied-batch ledger making checkpoint-replayed batches no-ops."""

    def __init__(self, spark: SparkSession, warehouse_root: str):
        self.wh = ParquetWarehouse(spark, warehouse_root)
        self.wh.ensure(LEDGER_TABLE, LEDGER_SCHEMA)

    def applied_batches(self) -> set[int]:
        """Batch ids already merged — ledger-sized (one row per
        micro-batch ever applied), a metadata read."""
        return {
            r[0]
            for r in self.wh.read(LEDGER_TABLE).select("batch_id").collect()
        }

    def apply(self, batch_df: DataFrame, batch_id: int) -> int:
        """Merge one micro-batch unless its id is already in the
        ledger. Returns merged row count (0 for a detected replay)."""
        if int(batch_id) in self.applied_batches():
            return 0
        n = merge_upsert_telemetry(self.wh, batch_df)
        # ledger row AFTER the merge: a crash between the two replays
        # an idempotent merge; the reverse order could record data
        # that never landed
        self.wh.append(
            LEDGER_TABLE,
            batch_df.sparkSession.createDataFrame(
                [(int(batch_id), n)], LEDGER_SCHEMA
            ),
        )
        return n


def run_cdc_merge_stream(
    spark: SparkSession,
    landing_glob: str,
    warehouse_root: str,
    checkpoint_dir: str,
) -> IdempotentMergeSink:
    """Drain all landed change-log parquet through the idempotent MERGE
    sink (Trigger.AvailableNow — the cron-shaped micro-batch run), and
    return the sink for ledger inspection."""
    src = spark.readStream.schema(FACT_TELEMETRY).parquet(landing_glob)
    sink = IdempotentMergeSink(spark, warehouse_root)
    q = (
        src.writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
