"""The production ingest daemon — the reference's `docker/ingest.sh:2-8`
loop (`while true; do blocksci_export.py --continue --previous-day;
sleep …; done`) as a driver-side composition of the incremental layer.

Each step is pure incremental batch: read the source directory (the
chain follower drops parsed block files there), read the sink back,
compute the delta (reorg lag → previous-day cutoff → high-water mark,
`plans/incremental.py`), transform, append. Idempotence comes from the
high-water mark, not from write-side dedup: a crashed step that wrote
its files re-runs to an empty delta.

This is the BATCH face of the daemon; `streaming/ingest.py` is the
Structured-Streaming face (checkpoint instead of HWM query). Both reuse
the same `plans/ingest.py` transforms — one declarative transform, two
execution modes, which is the Spark-first point.

Scale shape per step: one pruned scan of the source (the HWM predicate
pushes to parquet row-group stats, so old files are skipped), two
single-row broadcast aggregates (tip, HWM), zero wide shuffles.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphsense_blocksci_spark.plans.incremental import incremental_delta
from graphsense_blocksci_spark.plans.ingest import block_table
from graphsense_blocksci_spark.schemas import REORG_SAFETY_LAG


def _read_sink(spark: SparkSession, sink_dir: str, like: DataFrame) -> DataFrame:
    """The sink, or an empty frame of the sink's schema on cold start
    (first daemon run: nothing ingested yet ⇒ full history, matching
    blocksci_export.py:497-505).

    ONLY a missing path means cold start — any other read failure
    (corrupt footer, transient FS error) must surface, because treating
    it as empty would recompute the full history and append a duplicate
    of everything next to the existing rows."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(sink_dir)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], like.schema)
        raise


def ingest_daemon_step(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    transform: Callable[[DataFrame], DataFrame] = block_table,
    block_col: str = "block_id",
    ts_col: str = "timestamp",
    as_of_epoch: int | None = None,
    lag: int = REORG_SAFETY_LAG,
) -> int:
    """One `--continue --previous-day` pass: append the transformed
    delta to the sink; returns the number of rows appended (0 ⇒ the
    chain has nothing new — the daemon just sleeps)."""
    source = spark.read.parquet(source_dir)
    transformed = transform(source)
    sink = _read_sink(spark, sink_dir, transformed)
    # the delta is computed on the RAW side (reorg lag and cutoff are
    # source-tip semantics), then transformed once
    delta_raw = incremental_delta(
        source, sink, block_col=block_col, ts_col=ts_col,
        as_of_epoch=as_of_epoch, lag=lag,
    )
    delta = transform(delta_raw)
    # persist around count+write: without it the count and the write
    # each re-run the full source scan + HWM aggregation
    delta.persist()
    try:
        n = delta.count()
        if n:
            delta.write.mode("append").parquet(sink_dir)
    finally:
        delta.unpersist()
    return n


def run_ingest_daemon(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    max_iterations: int = 1,
    poll_seconds: float = 0.0,
    stop_when_empty: bool = False,
    **step_kwargs,
) -> list[int]:
    """The ingest.sh loop, bounded for embedding in schedulers and
    tests: run up to `max_iterations` daemon steps, sleeping
    `poll_seconds` between them; with `stop_when_empty` the loop exits
    on the first 0-row step (a test's "caught up" signal). Returns the
    per-step appended row counts."""
    counts: list[int] = []
    for i in range(max_iterations):
        n = ingest_daemon_step(spark, source_dir, sink_dir, **step_kwargs)
        counts.append(n)
        if stop_when_empty and n == 0:
            break
        if poll_seconds and i + 1 < max_iterations:
            time.sleep(poll_seconds)
    return counts


def _main() -> None:
    """CLI face of the daemon — `python -m
    graphsense_blocksci_spark.plans.daemon SRC SINK [--iterations N]
    [--poll SECONDS]` is the repo's `docker/ingest.sh` equivalent."""
    import argparse

    from graphsense_blocksci_spark.session import get_spark

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source_dir")
    p.add_argument("sink_dir")
    p.add_argument("--iterations", type=int, default=1)
    p.add_argument("--poll", type=float, default=0.0)
    p.add_argument("--lag", type=int, default=REORG_SAFETY_LAG)
    args = p.parse_args()
    spark = get_spark(app_name="gbs-ingest-daemon")
    counts = run_ingest_daemon(
        spark,
        args.source_dir,
        args.sink_dir,
        max_iterations=args.iterations,
        poll_seconds=args.poll,
        lag=args.lag,
    )
    print({"appended_per_step": counts, "total": sum(counts)})


if __name__ == "__main__":
    _main()
