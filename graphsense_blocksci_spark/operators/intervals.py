"""Interval analytics: sweep-line concurrency and overlap joins.

Two classic interval operators the reference's query surface (and any
events/session warehouse) needs but Spark does not ship natively:

* `sweep_concurrency` — how many intervals are open at each boundary
  time (max concurrent sessions, peak load, room occupancy). The
  textbook formulation is a GLOBAL running sum over +1/-1 deltas — a
  single-partition `Window.orderBy` that moves the whole corpus to one
  task. This implements the distributed two-phase prefix sum instead
  (same machinery as operators/packing.py:sequence_packing): local
  running sums inside contiguous time buckets, then one bounded window
  over the n_buckets bucket totals to produce each bucket's starting
  offset. Only n_buckets rows are ever sequential.

* `interval_overlap_join` — all pairs (a, b) with
  a.start <= b.end AND b.start <= a.end. The naive plan is a
  cross-join with a theta predicate (O(n*m) everywhere). Instead each
  interval is exploded onto the fixed-width time buckets it covers and
  the join runs per (bucket) with equi-join semantics; a pair is kept
  only when the bucket is the FIRST bucket the overlap region touches,
  so no dedup shuffle is needed afterwards. Fan-out is bounded by
  interval length / bucket width; the join key is uniform time.

Reference parity: the reference (graphsense-blocksci export,
blocksci_export.py) has no interval operator — this is checklist
surface (theta/range-join family, SURVEY §2.C) beyond the q27
containment join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sweep_concurrency(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    n_buckets: int = 64,
) -> DataFrame:
    """Running count of open intervals at every boundary instant.

    Input: one row per interval with integer `start_col` <= `end_col`
    (half-open [start, end): an interval ending at t does not overlap
    one starting at t). Output: (t, delta, concurrent) — one row per
    boundary event, `concurrent` = number of intervals open in
    [t, next boundary). Ties: at the same instant, ends apply before
    starts (delta ascending), so a back-to-back handoff never counts 2.

    Scale: deltas are bucketed into n_buckets contiguous time ranges;
    running sums are bucket-local windows; only the n_buckets bucket
    totals see a single-partition window (bounded-frame contract, as
    packing.py). Event rows are (long, long) — minimal shuffle bytes.
    """
    deltas = intervals.select(
        F.col(start_col).cast("long").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            F.col(end_col).cast("long").alias("t"), F.lit(-1).alias("delta")
        )
    )
    # Collapse same-instant events first: one row per (t, delta) with a
    # summed weight. This bounds the per-bucket sort input AND makes
    # the output one row per distinct boundary state change.
    collapsed = deltas.groupBy("t", "delta").agg(
        F.sum("delta").alias("w")
    )
    bounds = collapsed.agg(
        F.min("t").alias("lo"), F.max("t").alias("hi")
    ).first()
    if bounds["lo"] is None:
        return intervals.sparkSession.createDataFrame(
            [], "t long, delta long, concurrent long"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    bucketed = collapsed.withColumn(
        "_bkt", ((F.col("t") - lo) / width).cast("long")
    )
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum", F.sum("w").over(w_local))
    w_bkt = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        bucketed.groupBy("_bkt")
        .agg(F.sum("w").alias("_tot"))
        .withColumn("_boff", F.sum("_tot").over(w_bkt) - F.col("_tot"))
        .select("_bkt", "_boff")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .select(
            "t",
            F.col("delta").cast("long").alias("delta"),
            (F.col("_boff") + F.col("_cum")).cast("long").alias("concurrent"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_width: int,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Equi-join plan for the interval-overlap theta join.

    Returns all (left row, right row) pairs whose closed intervals
    overlap: l.start <= r.end AND r.start <= l.end. Columns of both
    sides are kept with `l_` / `r_` prefixes on the interval bounds.

    Plan: each interval explodes onto the `bucket_width`-sized time
    buckets it covers (`sequence(floor(s/w), floor(e/w))`), the join
    runs on the bucket key plus the overlap predicate, and a pair
    survives only in the FIRST bucket its overlap region touches
    (bucket == floor(max(l.start, r.start) / w)) — exactly-once
    without a distinct. Fan-out per row is len/width + 1; pick a width
    near the typical interval length. The shuffle key is uniform time,
    so skew only arises from genuinely bursty instants (salt the
    bucket if so).
    """
    w = int(bucket_width)

    def explode_side(df: DataFrame, prefix: str) -> DataFrame:
        s = F.col(start_col).cast("long")
        e = F.col(end_col).cast("long")
        out = df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
            F.explode(
                F.sequence(F.floor(s / w).cast("long"), F.floor(e / w).cast("long"))
            ).alias("_bkt"),
        )
        return out

    le = explode_side(left, "l_")
    re_ = explode_side(right, "r_")
    ls, le_end = F.col(f"l_{start_col}"), F.col(f"l_{end_col}")
    rs, re_end = F.col(f"r_{start_col}"), F.col(f"r_{end_col}")
    first_overlap_bkt = F.floor(F.greatest(ls, rs) / w).cast("long")
    return (
        le.join(re_, "_bkt")
        .filter((ls <= re_end) & (rs <= le_end))
        .filter(F.col("_bkt") == first_overlap_bkt)
        .drop("_bkt")
    )
