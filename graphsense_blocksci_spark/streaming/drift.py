"""Streaming distribution-drift monitoring: windowed value histograms
on the stream, KS distance against a reference computed on the sink.

The deployment shape every 100 TB feature pipeline runs: the STREAM
maintains only compact per-(time-window, value-cell) counts — a
single built-in watermarked window aggregation, state bounded by
(windows in flight) × (grid cells), nothing custom — and the alert
layer computes the two-sample Kolmogorov-Smirnov distance of each
window against a reference distribution from those tiny histogram
rows (a batch post-pass over hundreds of rows, not the stream).

The KS arithmetic is the q210 exact-integer discipline: with window
counts c_w over cells and reference counts c_r, D = max over cells of
|cum_w·n_r − cum_r·n_w| / (n_w·n_r) — the cross-multiplied integer
max is exact and order-free; the float D is one final divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_histogram_stream(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "1 day",
    cell_width: int = 1000,
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window value histogram over a stream:
    one row per (window_start, cell) with its row count, where cell =
    floor(value/cell_width) quantizes to a bounded grid (the q210
    distributed-KS compromise — state and emission are grid-sized,
    never value-distinct-sized).

    Pure built-in streaming aggregation: watermark + window + groupBy
    count. Append mode emits each window's final histogram exactly
    once when the watermark passes it; availableNow over staged files
    finalizes every window, which is what the batch oracle replays.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            (F.col(value_col).cast("long") / F.lit(cell_width))
            .cast("long")
            .alias("cell"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell",
            "cnt",
        )
    )


def ks_against_reference(
    window_hist: DataFrame, reference_hist: DataFrame
) -> DataFrame:
    """Per-window two-sample KS distance from histogram frames.

    ``window_hist``: (window_start, cell, cnt) — the streaming sink.
    ``reference_hist``: (cell, cnt) — the broadcast-sized reference
    distribution (e.g. the trailing corpus, or a golden training set).

    Returns one row per window: n_window, n_ref, d_scaled = max
    |cum_w·n_r − cum_r·n_w| (exact int64), and the float
    ks_d = d_scaled / (n_w·n_r). Cells absent on one side contribute
    zero mass there — the full-outer cell spine makes both CDFs step
    on the union grid, exactly like a sorted two-pointer merge.

    Scale shape: both inputs are grid-sized (≤ windows × cells rows);
    the reference is broadcast; the cumulative window partitions by
    window_start over at most |grid| rows each.

    PRECONDITION: ``reference_hist`` must carry positive total mass.
    An empty (or all-zero) reference makes every window's KS distance
    undefined — without the guard that surfaced as ks_d = NaN with
    d_scaled = 0, which reads as "no drift" instead of "no reference".
    """
    ref = reference_hist.select(
        F.col("cell").alias("cell"), F.col("cnt").alias("ref_cnt")
    )
    n_ref_val = ref.agg(F.sum("ref_cnt").cast("long")).first()[0]
    if n_ref_val is None or n_ref_val <= 0:
        raise ValueError(
            "ks_against_reference: reference_hist has no mass"
            f" (total cnt = {n_ref_val}); a KS distance against an"
            " empty reference is undefined"
        )
    n_ref = ref.agg(F.sum("ref_cnt").cast("long").alias("n_ref"))
    # The CDF grid must be (every window) × (every cell either side
    # ever saw): a ref cell ABSENT from one window still steps that
    # window's ref CDF, and evaluating the sup there is what catches
    # "this window never saw values the reference has" drift. All
    # three frames are grid-sized, so the cross join is tiny.
    cells = (
        window_hist.select("cell")
        .union(ref.select("cell"))
        .distinct()
    )
    windows = window_hist.select("window_start").distinct()
    per_w = (
        windows.crossJoin(F.broadcast(cells))
        .join(
            window_hist.select("window_start", "cell", "cnt"),
            ["window_start", "cell"],
            "left",
        )
        .join(F.broadcast(ref), "cell", "left")
        .select(
            "window_start",
            "cell",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("w_cnt"),
            F.coalesce("ref_cnt", F.lit(0)).cast("long").alias("r_cnt"),
        )
        # pin: per_w feeds both the cumulative window and the totals
        # aggregate — unpinned, the grid construction runs twice
        .localCheckpoint(eager=False)
    )
    cum_w = (
        Window.partitionBy("window_start")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_w.select(
        "window_start",
        F.sum("w_cnt").over(cum_w).cast("long").alias("cum_w"),
        F.sum("r_cnt").over(cum_w).cast("long").alias("cum_r"),
    )
    totals = per_w.groupBy("window_start").agg(
        F.sum("w_cnt").cast("long").alias("n_window")
    )
    return (
        cum.join(F.broadcast(totals), "window_start")
        .crossJoin(F.broadcast(n_ref))
        .select(
            "window_start",
            "n_window",
            "n_ref",
            F.abs(
                F.col("cum_w") * F.col("n_ref")
                - F.col("cum_r") * F.col("n_window")
            ).alias("_d"),
        )
        .groupBy("window_start", "n_window", "n_ref")
        .agg(F.max("_d").cast("long").alias("d_scaled"))
        .select(
            "window_start",
            "n_window",
            "n_ref",
            "d_scaled",
            (
                F.col("d_scaled").cast("double")
                / (F.col("n_window") * F.col("n_ref")).cast("double")
            ).alias("ks_d"),
        )
    )
