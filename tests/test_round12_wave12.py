"""transformWithState contract (round 12): the new-API sessionizer's
state machine must match the applyInPandasWithState twin exactly, and
the environment block must fail cleanly with setup advice — the
Cassandra-sink disposition pattern (tests/test_cassandra_contract.py).
"""

from __future__ import annotations

import pandas as pd
import pytest


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


def _run_processor(events_by_batch, gap=1800):
    """Drive SessionizeProcessor.handleInputRows as a plain Python
    state machine across batches (no Spark, no state server)."""
    from graphsense_blocksci_spark.streaming.tws import SessionizeProcessor

    p = SessionizeProcessor(gap_seconds=gap)
    p._state = _FakeValueState()
    out = []
    for batch in events_by_batch:
        pdf = pd.DataFrame({"ts_epoch": batch})
        for emitted in p.handleInputRows((7,), iter([pdf]), None):
            out.extend(emitted.to_dict("records"))
    open_state = p._state.get()
    return out, open_state


def test_tws_state_machine_matches_reference_sessionization():
    """Multi-batch replay: closed sessions + the carried open session
    must equal single-pass gap sessionization of the concatenated
    event stream."""
    batches = [
        [0, 100, 5000],          # closes nothing yet (5000-100 > 1800)
        [5100, 5200],            # continues the 5000 session
        [20000],                 # closes 5000-5200, opens 20000
    ]
    closed, open_state = _run_processor(batches)
    assert closed == [
        {
            "user_id": 7,
            "session_start": 0,
            "session_end": 100,
            "n_events": 2,
        },
        {
            "user_id": 7,
            "session_start": 5000,
            "session_end": 5200,
            "n_events": 3,
        },
    ]
    assert open_state == (20000, 20000, 1)


def test_tws_matches_old_api_reference_semantics():
    """The same event list through the OLD API's pure-Python fold
    (streaming/stateful.py's gap rule: strictly-greater-than-gap
    closes) yields identical sessions — the two operators are
    interchangeable."""
    import random

    rng = random.Random(11)
    ts = sorted(rng.randrange(0, 100_000) for _ in range(200))
    closed, open_state = _run_processor([ts])
    # reference single-pass fold
    ref_closed = []
    start = last = None
    n = 0
    for t in ts:
        if start is None:
            start = last = t
            n = 1
        elif t - last <= 1800:
            last = t
            n += 1
        else:
            ref_closed.append((start, last, n))
            start = last = t
            n = 1
    assert [
        (c["session_start"], c["session_end"], c["n_events"])
        for c in closed
    ] == ref_closed
    assert open_state == (start, last, n)


def test_tws_environment_block_raises_with_advice(spark):
    """In this container protobuf is absent, so the stream-facing
    entry must refuse cleanly (not crash the Python driver worker
    mid-stream) and point at both the missing package and the
    drop-in old-API operator."""
    from graphsense_blocksci_spark.streaming import tws

    if tws.tws_available():  # pragma: no cover - protobuf installed
        pytest.skip("protobuf present; the live path applies")
    df = spark.createDataFrame([(1, 10)], "user_id long, ts_epoch long")
    with pytest.raises(RuntimeError, match="protobuf"):
        tws.sessionize_stream_tws(df)
