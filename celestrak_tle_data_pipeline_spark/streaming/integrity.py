"""Incrementally-maintained table digests over a document stream.

The batch certification (``rowhash_table_digest``) proves the fold —
per-row MD5 60-bit values combined with XOR and SUM mod the Mersenne
prime 2^61−1 — is partitioning- and order-independent. This module
proves the *streaming* consequence: because both combiners are
commutative groups, the digest of a table is maintainable one
micro-batch at a time with O(|sources|) state:

    xor'  = xor  ⊕  batch_xor
    sum'  = (sum + batch_sum) mod (2^61 − 1)
    rows' = rows + batch_rows

No reprocessing, no sort, no re-scan — the 100 TB replica-equality
check updates in the time it takes to digest the new files. A replica
drifting (lost batch, double-apply, corrupted row) surfaces as a
digest mismatch at the next comparison, which is exactly the
exactly-once audit a ``foreachBatch`` sink needs.

The per-batch digest reuses the same expressions as the batch query
(md5 over the identical '|'-joined serialization), so stream-built and
batch-built digests are comparable BY VALUE — pinned by
``tests/test_streaming.py::test_streaming_digest_equals_batch_digest``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERSENNE61 = 2305843009213693951  # 2^61 - 1, the modular-sum group


def row_digest_value(df: DataFrame) -> DataFrame:
    """Attach the 60-bit row-hash ``v`` used by every digest fold
    (same serialization as ``rowhash_table_digest``)."""
    v = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    "lang",
                    "source",
                    F.col("n_chars").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("v", v)


def digest_of(df: DataFrame) -> DataFrame:
    """One digest row per source for a (static or micro-batch) frame."""
    return row_digest_value(df).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bit_xor("v").cast("bigint").alias("digest_xor"),
        F.pmod(
            F.sum(F.col("v").cast("decimal(38,0)")),
            F.lit(MERSENNE61).cast("decimal(38,0)"),
        )
        .cast("bigint")
        .alias("digest_sum_mod"),
    )


class StreamingDigest:
    """foreachBatch sink maintaining per-source digests incrementally.

    State is the digest table itself (|sources| rows), merged with the
    group operations above — deliberately NOT a re-aggregation of
    history. ``merge_batch`` is idempotence-unsafe by design (applying
    the same batch twice shifts the sum digest), which is the feature:
    a double-applied batch is precisely what the audit must detect
    when the final digest is compared against a batch-built one.
    """

    def __init__(self) -> None:
        self.state: dict[str, tuple[int, int, int]] = {}

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        for r in digest_of(batch_df).collect():  # |sources| rows: state-sized
            n0, x0, s0 = self.state.get(r.source, (0, 0, 0))
            self.state[r.source] = (
                n0 + r.n_rows,
                x0 ^ r.digest_xor,
                (s0 + r.digest_sum_mod) % MERSENNE61,
            )

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (src, n, x, s) for src, (n, x, s) in sorted(self.state.items())
        ]
        return spark.createDataFrame(
            rows, "source string, n_rows long, digest_xor long,"
            " digest_sum_mod long"
        )


def run_digest_stream(
    spark: SparkSession, landing_dir: str, checkpoint_dir: str
) -> StreamingDigest:
    """Drain a parquet landing directory (AvailableNow) through the
    incremental digest sink and return the maintained state."""
    sink = StreamingDigest()
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink.merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return sink


class StreamingReach:
    """foreachBatch sink counting FIRST-SEEN users per micro-batch.

    The stream is deduplicated upstream with an UNWATERMARKED
    ``dropDuplicates`` — state holds every user id ever seen, the
    correct tool for an all-time reach counter (the state size is the
    answer's cardinality, so it cannot be bounded tighter; contrast
    the 3-day watermarked dedup in streaming/incremental.py whose
    state is horizon-bounded by design). The sink itself keeps only
    the running total.
    """

    def __init__(self) -> None:
        self.total = 0
        self.per_batch: list[int] = []

    def count_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        self.per_batch.append(n)
        self.total += n


def run_reach_stream(
    spark: SparkSession, landing_dir: str, checkpoint_dir: str
) -> StreamingReach:
    """Drain a parquet landing dir through dropDuplicates(user) and
    count first-seen users — the streaming form of the
    ``cumulative_distinct_users`` reach curve."""
    sink = StreamingReach()
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .parquet(landing_dir)
        .select("user_id")
        .dropDuplicates(["user_id"])
    )
    q = (
        stream.writeStream.foreachBatch(sink.count_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return sink
