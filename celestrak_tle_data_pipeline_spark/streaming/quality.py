"""Batch-level quality gate + quarantine for incremental ingest.

Row-level hygiene already exists at parse time (`valid_record` drops
malformed rows — P4, reference script.py:131-138). That is the wrong
tool for a FEED regression: when an upstream starts emitting 40%
garbage, dropping rows silently accepts a poisoned feed and loses the
evidence. The training-data-pipeline contract is the opposite —
quarantine the whole batch, keep the bytes for review, and leave the
warehouse untouched until a human (or a fixed feed) re-submits.

This sink evaluates declarative constraints over each micro-batch in
ONE aggregate pass (every constraint becomes a conditional-sum column
— map-side combine, no per-constraint jobs), then routes:

- all constraints within tolerance → the wrapped writer runs (append,
  MERGE, anything with the ``(wh, df) -> n`` shape);
- any constraint over its allowed violation fraction → the batch is
  appended VERBATIM to a ``quarantine`` table (stamped with batch_id
  and the failed-constraint summary) and the target is not written.

Either way one audit row lands in ``quality_audit``: batch_id, rows,
per-constraint violation counts (JSON), disposition. The audit table
is the feed's health history — per-batch violation rates are a
time-series you can alert on.

Scale shape: the gate adds exactly one aggregation over the batch and
one metadata-sized audit append; quarantined batches append verbatim
(no transform). Nothing scales with warehouse size.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sinks.warehouse import ParquetWarehouse

AUDIT_TABLE = "quality_audit"
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("disposition", T.StringType(), False),
        T.StructField("violations_json", T.StringType(), False),
    ]
)


@dataclass(frozen=True)
class Constraint:
    """A named row predicate that should hold, with the fraction of
    violating rows the feed is allowed before the batch quarantines."""

    name: str
    holds: Column
    max_violation_frac: float = 0.0


def violation_counts(
    batch: DataFrame, constraints: list[Constraint]
) -> tuple[int, dict[str, int]]:
    """(total_rows, per-constraint violation counts) in ONE aggregate
    pass over the batch."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")] + [
        F.coalesce(
            F.sum(F.when(c.holds, F.lit(0)).otherwise(F.lit(1))),
            F.lit(0),  # SUM over zero rows is NULL, not 0
        ).cast("bigint").alias(c.name)
        for c in constraints
    ]
    row = batch.agg(*aggs).collect()[0]
    return int(row["__n"]), {
        c.name: int(row[c.name]) for c in constraints
    }


class QualityGatedSink:
    """foreachBatch sink: constraints pass → wrapped writer; any
    constraint over tolerance → quarantine, target untouched."""

    def __init__(
        self,
        spark,
        warehouse_root: str,
        writer,
        constraints: list[Constraint],
        quarantine_table: str = "quarantine",
    ):
        self.wh = ParquetWarehouse(spark, warehouse_root)
        self.writer = writer
        self.constraints = constraints
        self.quarantine_table = quarantine_table
        self.wh.ensure(AUDIT_TABLE, AUDIT_SCHEMA)

    def _audit(self, batch_id, n, disposition, counts):
        self.wh.append(
            AUDIT_TABLE,
            self.wh.spark.createDataFrame(
                [
                    (
                        int(batch_id),
                        n,
                        disposition,
                        json.dumps(counts, sort_keys=True),
                    )
                ],
                AUDIT_SCHEMA,
            ),
        )

    def apply(self, batch: DataFrame, batch_id: int) -> str:
        """Returns the disposition: 'applied', 'quarantined', or
        'empty'."""
        n, counts = violation_counts(batch, self.constraints)
        if n == 0:
            self._audit(batch_id, 0, "empty", counts)
            return "empty"
        failed = [
            c.name
            for c in self.constraints
            if counts[c.name] > c.max_violation_frac * n
        ]
        if failed:
            quarantined = batch.withColumn(
                "__batch_id", F.lit(int(batch_id))
            ).withColumn("__failed", F.lit(",".join(sorted(failed))))
            quarantined.write.mode("append").parquet(
                self.wh.path(self.quarantine_table)
            )
            self._audit(batch_id, n, "quarantined", counts)
            return "quarantined"
        self.writer(self.wh, batch)
        self._audit(batch_id, n, "applied", counts)
        return "applied"
