"""Arbitrary stateful processing, Spark 4 tier (SURVEY.md §2.9):
``transformWithStateInPandas`` per-satellite decay tracking.

Same semantics as the ``applyInPandasWithState`` tracker
(``stateful.py`` — the Spark 3.x API kept as the compatibility tier):
carry (last_epoch_us, last_mean_motion, n_seen) per ``norad_id`` across
micro-batches, emit one forward-moving delta row per new epoch. The v2
API is where stateful streaming is headed — an object-oriented
``StatefulProcessor`` with NAMED state variables (``getValueState``;
list/map state, TTL and timers available on the same handle), so one
operator can hold several independently-evolvable state shapes instead
of packing everything into a single tuple.

Requires the RocksDB state store provider (the transformWithState
backend) and the protobuf package (the TWS Python runner's
driver-worker handshake is proto-serialized); the test sets the
provider on the session and self-skips where protobuf is absent —
in that case ``stateful.decay_tracker`` (v1) is the production path.

Scale notes identical to v1: state is 3 scalars per satellite, input
shuffles once on norad_id, Arrow-grouped batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import OUTPUT_SCHEMA, STATE_SCHEMA


class DecayTrackerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._track = handle.getValueState("track", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (norad_id,) = key
        prior = self._track.get()
        if prior is not None:
            last_epoch, last_mm, n_seen = prior
        else:
            last_epoch, last_mm, n_seen = -1, None, 0

        out: dict[str, list] = {c: [] for c in (
            "norad_id", "epoch_us", "mean_motion", "mm_delta", "n_seen"
        )}
        for pdf in rows:
            pdf = pdf.sort_values("epoch_us")
            for epoch_us, mm in zip(pdf["epoch_us"], pdf["mean_motion"]):
                epoch_us = int(epoch_us)
                mm = float(mm)
                if epoch_us <= last_epoch:
                    continue  # stale/duplicate epoch: forward-only
                n_seen += 1
                out["norad_id"].append(norad_id)
                out["epoch_us"].append(epoch_us)
                out["mean_motion"].append(mm)
                out["mm_delta"].append(
                    mm - last_mm if last_mm is not None else None
                )
                out["n_seen"].append(n_seen)
                last_epoch, last_mm = epoch_us, mm

        self._track.update((last_epoch, last_mm, n_seen))
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def decay_tracker_v2(parsed: DataFrame) -> DataFrame:
    """parsed telemetry stream → per-epoch decay deltas, carried by the
    transformWithStateInPandas state store. Drop-in output-compatible
    with ``stateful.decay_tracker``."""
    from pyspark.sql import functions as F

    src = parsed.select(
        "norad_id",
        F.unix_micros("epoch_utc").alias("epoch_us"),
        "mean_motion",
    )
    return src.groupBy("norad_id").transformWithStateInPandas(
        DecayTrackerProcessor(),
        OUTPUT_SCHEMA,
        "append",
        "none",
    )
