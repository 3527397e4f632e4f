"""Gap-based sessionization via Spark 4's `transformWithStateInPandas`
— the NEW arbitrary-stateful-streaming API (SPARK-49564 /
"transformWithState") that supersedes `applyInPandasWithState`:
typed state handles (ValueState / ListState / MapState) managed by
the state-store, a StatefulProcessor lifecycle (init / handle /
close), and native timer support.

This module carries the SAME operator semantics as
streaming/stateful.py's applyInPandasWithState sessionizer — per-key
state is the one OPEN session (start, last_ts, n_events); each batch
folds its events in event-time order, emits every session the gap
rule closes, and keeps the open session for the next batch — so the
two APIs are directly comparable. Contract: qd18 remains the gated
stateful-streaming registry entry (applyInPandasWithState path);
THIS implementation is pinned by tests/test_round12_wave12.py,
which runs `SessionizeProcessor.handleInputRows` as a plain Python
state machine and requires row-identical output to the
applyInPandasWithState twin on the same staged stream, and by
qd99_tws_state_gate (gate-only registry entry) asserting the
environment block below.

Scale shape: identical to the old API — state keyed by user_id,
partitioned by the state store, per-key state O(1), store size
bounded by |active keys|.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_OUTPUT_DDL = (
    "user_id long, session_start long, session_end long, n_events long"
)
SESSION_STATE_DDL = "session_start long, last_ts long, n_events long"


class SessionizeProcessor(StatefulProcessor):
    """Per-user gap sessionizer on the transformWithState lifecycle."""

    def __init__(self, gap_seconds: int = 1800):
        self._gap = gap_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("open_session", SESSION_STATE_DDL)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            start, last, n = self._state.get()
        else:
            start = last = None
            n = 0
        ts_all: list[int] = []
        for pdf in rows:
            ts_all.extend(int(t) for t in pdf["ts_epoch"])
        ts_all.sort()
        closed: list[dict[str, int]] = []
        for t in ts_all:
            if start is None:
                start = last = t
                n = 1
            elif t - last <= self._gap:
                last = t
                n += 1
            else:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                    }
                )
                start = last = t
                n = 1
        if start is not None:
            self._state.update((start, last, n))
        if closed:
            yield pd.DataFrame(closed)

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python protocol speaks protobuf to the
    JVM state server; the package is not baked into this container,
    so the API crashes its driver worker at stream start
    (ImportError from pyspark's StateMessage_pb2). Environment gate,
    same disposition as the Cassandra sink (sinks.write_cassandra).

    The gate imports the ACTUAL module the API loads at stream start
    (pyspark's generated ``StateMessage_pb2``) and round-trips one
    message through it, so an installed-but-incompatible protobuf
    (pb2 files generated for protobuf>=4 crash on protobuf 3.x
    descriptors) fails the gate here instead of killing the stream's
    Python driver worker mid-query."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2

        msg = StateMessage_pb2.StateRequest()
        msg.ParseFromString(msg.SerializeToString())
        return True
    except Exception:  # ImportError or protobuf version mismatch
        return False


def sessionize_stream_tws(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events(user_id long, ts_epoch long) → closed sessions, via the
    transformWithState API. Append mode, processing-time (timers
    unused here — the qd18 idle-timeout variant stays on the old API
    until both carry it, keeping the twin comparison exact).

    ENVIRONMENT-BLOCKED in this container (see `tws_available`):
    raises with setup advice rather than crashing the stream's
    Python driver worker mid-query. The operator semantics are still
    fully tested — `SessionizeProcessor.handleInputRows` runs as a
    plain Python state machine in tests/test_round12_wave12.py and
    must match the applyInPandasWithState twin event-for-event; only
    the JVM↔Python state-server hop needs the missing package."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' Python"
            " package (pyspark's state-server protocol); install"
            " protobuf>=4 to enable this operator. The"
            " applyInPandasWithState sessionizer"
            " (streaming/stateful.py) is the drop-in equivalent and"
            " carries the qd18 correctness gate."
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(gap_seconds),
        outputStructType=SESSION_OUTPUT_DDL,
        outputMode="Append",
        timeMode="None",
    )
