"""Anti-join dedup and distinct-on-key (SURVEY.md §2 J1-J3, D1-D2, P6).

The reference's core idempotency device is isin-negation against a key
probe (``~df['col'].isin(existing)`` at ``script.py:89``,
``script.py:143``, ``script.py:166``) — semantically a LEFT ANTI join,
which is how we express it so Catalyst can pick broadcast vs shuffle
(key sides are small → broadcast hash join, no shuffle of the big side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anti_join_new(
    batch: DataFrame,
    existing_keys: DataFrame,
    keys: Sequence[str],
    broadcast: bool | None = None,
) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``existing_keys``.

    J1 (norad_id, script.py:143), J2 (date_utc, script.py:87-89) and J3
    (composite norad_id+epoch_utc, script.py:163-166) all reduce to this.
    The reference's string-concat composite key (script.py:163-164) is a
    pandas workaround we do not replicate: Spark anti-joins natively on
    multiple columns. Null-safe equality is used so NULL keys behave like
    pandas isin (NULL == NULL matches) rather than SQL's never-match.

    ``broadcast=None`` (default) leaves the join strategy to Catalyst/
    AQE, which size-gates the broadcast at runtime — an unconditional
    broadcast would OOM when the probe side is 3 days of a 100 TB fact
    table. Pass ``broadcast=True`` only when the caller *knows* the
    probe is a small dim key set.
    """
    probe = existing_keys.select(*keys).dropDuplicates(list(keys))
    if broadcast:
        probe = F.broadcast(probe)
    cond = None
    for k in keys:
        c = batch[k].eqNullSafe(probe[k])
        cond = c if cond is None else cond & c
    return batch.join(probe, cond, "left_anti")


def distinct_on_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence | None = None
) -> DataFrame:
    """First row per key (reference ``drop_duplicates(subset=['norad_id'])``,
    script.py:144).

    pandas keeps the first row *in file order*; Spark's dropDuplicates
    keeps an arbitrary row. When the survivor matters, pass ``order_by``
    → deterministic row_number()==1 (SURVEY.md §2.6 D1). With no
    ordering, falls back to dropDuplicates (any-row semantics).
    """
    if not order_by:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_duplicates(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact duplicate groups over ``cols``: hash-groupBy, partial
    aggregation map-side, one shuffle on the hash key. ([EXT] X1 exact
    tier; at 100 TB, group on a 256-bit digest of the normalized
    payload, never the payload itself.)"""
    # to_json(struct(...)) is an unambiguous encoding: field names
    # delimit columns and NULLs stay explicit, so ('a', NULL) vs
    # ('a','') and separator-containing values can't collide (a
    # concat_ws drops NULLs and trusts its separator).
    digest = F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)
    return (
        df.withColumn("dup_key", digest)
        .groupBy("dup_key")
        .agg(F.count("*").alias("dup_count"), F.min(F.col(cols[0])).alias("first_value"))
        .where(F.col("dup_count") > 1)
    )
