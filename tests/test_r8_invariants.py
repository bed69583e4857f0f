"""Round-8 additions: cross-chunk ordering invariants for the
transformWithStateInPandas processors (r7 ADVICE, medium).

``handleInputRows`` receives a key's batch rows as an ITERATOR of
pandas chunks with no cross-chunk ordering guarantee (Arrow
maxRecordsPerBatch slicing, interleaved map-task output). The
processors must buffer the whole iterator and sort once globally per
key — sorting each chunk independently computes wrong gap splits /
first_us / medians the moment a key spans chunks. These tests drive
the processors directly with multi-chunk, out-of-order iterators (no
Spark session needed) and pin the globally-sorted semantics.
"""

from __future__ import annotations

import pandas as pd

from celestrak_tle_data_pipeline_spark.streaming.stateful_v2 import (
    DecayTrackerProcessor,
    make_session_finalizer,
    make_trailing_median,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None

    def exists(self):
        return self._v is not None


class _FakeListState:
    def __init__(self):
        self._rows = []

    def get(self):
        return iter(self._rows)

    def put(self, rows):
        self._rows = [tuple(r) for r in rows]

    def exists(self):
        return bool(self._rows)


class _FakeHandle:
    def __init__(self):
        self.timers = []
        self._states = {}

    def getValueState(self, name, schema):
        return self._states.setdefault(name, _FakeValueState())

    def getListState(self, name, schema):
        return self._states.setdefault(name, _FakeListState())

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


SEC = 1_000_000  # µs


def test_session_finalizer_merges_chunks_before_gap_fold():
    # gap = 10 s. True event order: 0 s, 20 s, 25 s → one closed
    # session [0,0] (gap 20 s) and an open session [20,25].
    # Chunks arrive out of order: [20] then [0, 25]. Per-chunk sorting
    # would see 20, 0, 25 — no gap ever ≥ 10 s — and close NOTHING.
    proc = make_session_finalizer(gap_ms=10_000)
    handle = _FakeHandle()
    proc.init(handle)
    chunks = iter(
        [
            pd.DataFrame({"ts_us": [20 * SEC], "cents": [7]}),
            pd.DataFrame({"ts_us": [0, 25 * SEC], "cents": [1, 3]}),
        ]
    )
    closed = pd.concat(list(proc.handleInputRows((42,), chunks, None)))
    assert len(closed) == 1
    row = closed.iloc[0]
    assert (row.session_start_us, row.session_end_us) == (0, 0)
    assert (row.n_events, row.total_cents) == (1, 1)
    # open session carried in state covers the 20→25 s pair
    assert handle._states["sess"].get() == (20 * SEC, 25 * SEC, 2, 10)
    # single re-armed close timer at last_event + gap
    assert handle.timers == [25_000 + 10_000]


def test_trailing_median_merges_chunks_before_ring_fold():
    # True event order (by ts): 100, 200, 300 cents → per-event 2x
    # medians 200, 300, 400. Chunks arrive with event 3 first; per-chunk
    # sorting would emit 600, 400, 400 instead.
    proc = make_trailing_median()
    handle = _FakeHandle()
    proc.init(handle)
    chunks = iter(
        [
            pd.DataFrame(
                {"ts_us": [3 * SEC], "event_id": [3], "cents": [300]}
            ),
            pd.DataFrame(
                {
                    "ts_us": [1 * SEC, 2 * SEC],
                    "event_id": [1, 2],
                    "cents": [100, 200],
                }
            ),
        ]
    )
    out = pd.concat(list(proc.handleInputRows((7,), chunks, None)))
    got = dict(zip(out.event_id, out.median_cents_x2))
    assert got == {1: 200, 2: 300, 3: 400}


def test_decay_tracker_merges_chunks_before_forward_fold():
    # Epoch 20 arrives in the first chunk, epoch 10 in the second.
    # Per-chunk folding would drop epoch 10 as "stale" (forward-only
    # gate); the global sort emits both, delta = +1.0 at epoch 20.
    proc = DecayTrackerProcessor()
    handle = _FakeHandle()
    proc.init(handle)
    chunks = iter(
        [
            pd.DataFrame({"epoch_us": [20 * SEC], "mean_motion": [2.0]}),
            pd.DataFrame({"epoch_us": [10 * SEC], "mean_motion": [1.0]}),
        ]
    )
    out = pd.concat(list(proc.handleInputRows((99,), chunks, None)))
    assert list(out.epoch_us) == [10 * SEC, 20 * SEC]
    assert out.mm_delta.iloc[0] is None or pd.isna(out.mm_delta.iloc[0])
    assert out.mm_delta.iloc[1] == 1.0
    assert handle._states["track"].get() == (20 * SEC, 2.0, 2)


def test_streaming_gate_queries_restore_session_state(spark):
    """streaming_sessions_finalized sets a session-global worker env
    var (sc.environment['PYTHONPATH']) and the state-store provider
    conf; BOTH must be restored on exit — a registry query may not
    leave hidden session mutations behind (r7 ADVICE)."""
    import pytest

    from celestrak_tle_data_pipeline_spark import compat, plans

    if not compat.ensure_protobuf():
        pytest.skip("no protobuf runtime for transformWithState")
    from conftest import SF_DIR

    qs = plans.all_queries()
    env = spark.sparkContext.environment
    before_env = dict(env)
    before_conf = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    df = qs["streaming_sessions_finalized"](spark, SF_DIR)
    assert df.count() >= 0
    assert dict(env) == before_env
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        == before_conf
    )
