"""Incremental ingest layer — the reference's production daemon semantics.

The reference daemon loop (docker/ingest.sh:2-8) runs
`blocksci_export.py --continue --previous-day` forever:

- `--continue`  — resume from the sink's high-water mark
  (blocksci_export.py:489-505): start_index = most_recent + 1, empty
  sink means start from 0.
- `--previous-day` — never ingest blocks timestamped today
  (blocksci_export.py:540-553): vectorized cutoff at local midnight.
  We fix the cutoff to UTC midnight and document the divergence
  (SURVEY §7 risk list — reference uses `time.mktime` local time).
- reorg safety lag — the parser config stops 6 blocks short of the tip
  (`maxBlockNum: -6`, conf/btc.cfg:20); applied here as an explicit
  filter instead of a parser knob.

Composition order matches the reference: reorg lag bounds the parsed
tip, previous-day cuts the tail, high-water mark drops what the sink
already has. All three are single-pass native filters over the source —
the only data movement is the broadcast of two single-row aggregates
(sink max, source max), so the plan is a pruned parquet scan at any
scale.

Idempotence (the reference gets it from Cassandra primary-key upsert,
blocksci_export.py:132-142): running the delta twice appends nothing
new, because the second run's high-water mark already covers it —
property-tested as run-twice == run-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.windows import high_water_mark_filter
from graphsense_blocksci_spark.schemas import REORG_SAFETY_LAG


def previous_day_cutoff(
    df: DataFrame, ts_col: str, as_of_epoch: int | None = None
) -> DataFrame:
    """Drop rows timestamped on or after the current UTC day
    (reference: blocksci_export.py:540-553, `--previous-day`).

    `as_of_epoch` pins "now" for tests; production passes None and the
    cutoff is evaluated driver-side once (a literal in the plan, so the
    filter pushes down to the parquet scan).
    """
    if as_of_epoch is None:
        cutoff = F.date_trunc("day", F.current_timestamp())
    else:
        cutoff = F.date_trunc(
            "day", F.to_timestamp(F.lit(as_of_epoch).cast("long"))
        )
    # Epoch-seconds int columns (the reference's layout) need a decode;
    # native timestamp columns are compared directly — casting them
    # through long would truncate sub-second precision.
    if dict(df.dtypes).get(ts_col) in ("timestamp", "timestamp_ntz"):
        ts = F.col(ts_col)
    else:
        ts = F.to_timestamp(F.col(ts_col).cast("long"))
    return df.filter(ts < cutoff)


def reorg_safety_filter(
    df: DataFrame, block_col: str = "block_id", lag: int = REORG_SAFETY_LAG
) -> DataFrame:
    """Never ingest the newest `lag` blocks (reference: conf/btc.cfg:20
    `maxBlockNum: -6`) — a reorg near the tip would otherwise require
    retractions. The tip is a single-row max broadcast into the filter."""
    tip = df.agg(F.max(block_col).alias("_tip"))
    return (
        df.join(F.broadcast(tip), F.col(block_col) <= F.col("_tip") - lag)
        .drop("_tip")
    )


def incremental_delta(
    source: DataFrame,
    sink: DataFrame,
    block_col: str = "block_id",
    ts_col: str = "timestamp",
    as_of_epoch: int | None = None,
    lag: int = REORG_SAFETY_LAG,
) -> DataFrame:
    """The `--continue --previous-day` daemon step (docker/ingest.sh:2-8):
    rows of `source` that are (a) at least `lag` blocks behind the tip,
    (b) timestamped before today UTC, and (c) above the sink's high-water
    mark. Empty sink ⇒ full (safe) history, matching the reference's
    cold start."""
    safe = reorg_safety_filter(source, block_col, lag)
    closed = previous_day_cutoff(safe, ts_col, as_of_epoch)
    return high_water_mark_filter(closed, sink, block_col)
