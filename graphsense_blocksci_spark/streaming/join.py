"""Stream-stream equi-join with event-time bounds — the last join
family the engine needs: BOTH sides arriving as streams (orders feed ⋈
line-items feed, tx feed ⋈ rates feed), matched as rows show up.

Spark-first: this is the native watermarked stream-stream inner join —
each side buffers unmatched rows in keyed state, the event-time range
condition plus the two watermarks bound how long state is retained,
and matches emit in append mode the moment both sides are present.
No custom state machine: the built-in operator already implements
symmetric hash-join state, watermark-based eviction and checkpoint
recovery.

Correctness contract (what qd14 pins): with watermarks WIDER than the
true event-time spread and an availableNow run, no row is ever evicted
before its match can arrive, so the streamed inner join equals the
batch join with the same predicate row-for-row — which is exactly the
oracle the driver checks.

Scale notes: state per side ≈ rows within the watermark horizon keyed
by join key — the time-range condition is NOT an optimization hint but
the state-size contract (without it the operator must buffer each side
forever). Horizon × arrival rate is the executor-memory budget; the
shuffle is one hash partition per join key on each side, same as a
batch shuffle join. Skewed keys get AQE-less salting upstream
(operators/skew.py) since streaming plans don't re-optimize.

Reference parity: none — the reference's daemon is single-stream batch
(docker/ingest.sh); this is part of the beyond-reference streaming
surface (SURVEY §7.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join. ``condition`` must include the
    equi-key AND an event-time range between ``left_ts`` and
    ``right_ts`` (the range is what lets Spark evict state; omit it
    and state grows without bound). Both inputs must be streaming
    frames; watermarks are applied here so callers can't forget them."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    return lw.join(rw, condition, how)
