"""Stateful streaming heavy hitters: a sharded Misra-Gries summary in
the state store.

The streaming face of `operators/sketches.py:heavy_hitters`: items
shard by `xxhash64(item) % n_shards` (each item lives in exactly ONE
shard, so per-item counts never split across state keys); every shard
keeps a bounded Misra-Gries summary — (items, counts, total) arrays,
≤ ``capacity`` entries — in the `applyInPandasWithState` store and
folds each micro-batch in with the mergeable reduce rule (Agarwal et
al., PODS'12). After each batch a shard EMITS its current summary
snapshot, so the sink always holds a bounded, freshest-wins view of
the stream's frequent items with the standard MG guarantee: any item
with true running count > total/capacity is present, and
``approx_count`` undercounts by at most total/capacity.

Scale shape: state is O(capacity) per shard and the number of shards
is fixed — the store does NOT grow with the stream. The per-batch
shuffle is the groupBy(shard), and a batch contributes at most
|batch| rows to it. Emission is candidate-sized, not stream-sized.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_OUTPUT = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("approx_count", T.LongType()),
        T.StructField("shard_total", T.LongType()),
    ]
)

# state: parallel arrays (MG summary) + the shard's running item total
HH_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)


def _merge_mg(
    counts: "pd.Series | None", batch: pd.Series, capacity: int
) -> pd.Series:
    """Mergeable Misra-Gries reduce: combine, then keep the top
    ``capacity`` by subtracting the (capacity+1)-th largest count."""
    vc = batch.dropna().value_counts()
    merged = vc if counts is None else counts.add(vc, fill_value=0)
    if len(merged) > capacity:
        top = merged.nlargest(capacity + 1)
        merged = (top - top.iloc[-1]).iloc[:-1]
        merged = merged[merged > 0]
    return merged


def _hh_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    capacity: int,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        items, counts_list, total = state.get
        counts = pd.Series(list(counts_list), index=list(items), dtype="float64")
    else:
        counts, total = None, 0
    for pdf in pdfs:
        total += int(pdf["item"].notna().sum())
        counts = _merge_mg(counts, pdf["item"], capacity)
    if counts is None:
        counts = pd.Series(dtype="float64")
    state.update(
        (
            [str(i) for i in counts.index],
            [int(c) for c in counts],
            total,
        )
    )
    if len(counts):
        yield pd.DataFrame(
            {
                "item": list(counts.index),
                "approx_count": [int(c) for c in counts],
                "shard_total": total,
            }
        )


def heavy_hitters_stream(
    items: DataFrame,
    col: str = "item",
    capacity: int = 4096,
    n_shards: int = 8,
) -> DataFrame:
    """Apply the sharded stateful Misra-Gries summary to a STREAMING
    frame. Returns the per-batch summary snapshot stream
    ``(item, approx_count, shard_total)`` — append-mode friendly (file
    sinks): each batch appends the shard's refreshed candidate set,
    and a consumer takes the latest (or max) row per item.

    With ``capacity`` ≥ the per-shard distinct-item count no decrement
    ever fires, so snapshot counts are EXACT running counts — that is
    the configuration the driver's SQL oracle verifies (qd24);
    summaries under pressure (real decrements) are pytest-gated
    against the batch Misra-Gries reference instead.
    """

    def fn(key, pdfs, state):
        return _hh_group(key, pdfs, state, capacity)

    sharded = items.select(
        F.col(col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n_shards)).alias(
            "_shard"
        ),
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HDR_OUTPUT = T.StructType(
    [
        T.StructField("group", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)

HDR_STATE = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _hdr_group(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    acc: dict[int, int] = {}
    if state.exists:
        buckets, counts = state.get
        acc = dict(zip(buckets, counts))
    for pdf in pdfs:
        for b, c in pdf.groupby("bucket")["bucket"].count().items():
            acc[int(b)] = acc.get(int(b), 0) + int(c)
    state.update(([int(b) for b in acc], [int(c) for c in acc.values()]))
    if acc:
        items = sorted(acc.items())
        yield pd.DataFrame(
            {
                "group": key[0],
                "bucket": [b for b, _ in items],
                "cnt": [c for _, c in items],
            }
        )


def hdr_histogram_stream(
    values: DataFrame,
    value_col: str,
    group_col: str,
    sub_bits: int = 4,
) -> DataFrame:
    """STREAMING mergeable quantile partials: the stateful face of
    `operators/sketches.py:hdr_histogram`. The HDR bucket id is
    computed JVM-side on the stream (the same integer bit arithmetic
    as the batch operator — the Python state op never sees raw
    values), rows shuffle to their group's state key, and each group
    folds its micro-batch bucket counts into the store with a plain
    per-bucket sum — the merge that CANNOT be order-sensitive, which
    is exactly why HDR partials and not a rank sketch live in the
    state store. After each batch a group emits its refreshed
    histogram snapshot ``(group, bucket, cnt)``; a consumer takes the
    latest snapshot per group and feeds `hdr_quantiles` unchanged.

    State per group is bounded by the VALUE RANGE (≈ sub_bits·64
    buckets), not the stream length — the same guarantee as the
    Misra-Gries store above, with zero approximation: snapshot counts
    are always exact running counts (unlike MG under pressure).
    """
    from graphsense_blocksci_spark.operators.sketches import hdr_bucket

    keyed = values.select(
        F.col(group_col).cast("long").alias("group"),
        hdr_bucket(F.col(value_col), sub_bits).alias("bucket"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        _hdr_group,
        outputStructType=HDR_OUTPUT,
        stateStructType=HDR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """STREAMING Count-Min sketch: the stateful face of
    `operators/sketches.py:cms_build`. The (hash-row, bucket) cell of
    every occurrence is computed JVM-side with the same md5 arithmetic
    as the batch operator (the Python state op never sees raw keys);
    cells shuffle to their hash-row's state key and fold into the
    store with a plain per-bucket sum — the order-insensitive merge
    that makes CMS partials safe in a state store (identical argument
    to the HDR histogram above, and the same stateful fold executes
    both). After each batch every hash-row emits its refreshed counter
    snapshot ``(d, bucket, cnt)``; a consumer takes the latest
    snapshot per row and probes it with
    `operators/sketches.py:cms_estimate` unchanged.

    State per hash-row is bounded by ``width`` counters — the store
    never grows with the stream; snapshot counts are exact running
    cell counts, so a single-batch run reproduces the batch sketch
    cell-for-cell (the qd26 gate).
    """
    exploded = keys.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("_d"),
        F.col(key_col).cast("string").alias("_k"),
    )
    keyed = exploded.select(
        F.col("_d").cast("long").alias("group"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.col("_d"), F.col("_k"))), 1, 7
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        _hdr_group,
        outputStructType=HDR_OUTPUT,
        stateStructType=HDR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_OUTPUT = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("rho", T.LongType()),
    ]
)

HLL_STATE = T.StructType([T.StructField("rho", T.LongType())])


def _hll_group(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    best = int(state.get[0]) if state.exists else 0
    for pdf in pdfs:
        if len(pdf):
            best = max(best, int(pdf["rho"].max()))
    state.update((best,))
    yield pd.DataFrame({"bucket": [key[0]], "rho": [best]})


def hll_stream(values: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """STREAMING HyperLogLog registers: the stateful face of
    `operators/sketches.py:hll_registers`. The (bucket, rho) pair of
    every key is computed JVM-side with the identical md5/shift/bin
    arithmetic (the Python state op only ever sees small integers);
    rows shuffle to their bucket's state key and fold in with a plain
    MAX — the order-insensitive, idempotent merge that makes HLL the
    canonical mergeable sketch (duplicate keys and replayed batches
    cannot move a register, so retries are free). After each batch a
    register emits its refreshed (bucket, rho) snapshot; the latest
    snapshot per bucket IS the batch register table, which
    `hll_estimate` consumes unchanged.

    State is ONE long per register — at most 2^p state rows total,
    regardless of stream length or cardinality.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll_stream: p must be in [4, 16], got {p}")
    m = 1 << p
    h = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    )
    z = F.shiftright(h, p)
    # suffix width is 60-p bits, so rho ranges over [1, 61-p] — the
    # identical window as the batch hll_registers (a p!=8 stream and
    # batch register table stay cell-for-cell equal)
    rho = (
        F.when(z == 0, F.lit(61 - p))
        .otherwise(F.lit(61 - p) - F.length(F.bin(z)))
        .cast("long")
    )
    keyed = values.select((h % F.lit(m)).alias("bucket"), rho.alias("rho"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _hll_group,
        outputStructType=HLL_OUTPUT,
        stateStructType=HLL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LOG2_HIST_OUTPUT = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)

LOG2_HIST_STATE = T.StructType([T.StructField("cnt", T.LongType())])


def _log2_hist_group(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    running = int(state.get[0]) if state.exists else 0
    for pdf in pdfs:
        running += int(len(pdf))
    state.update((running,))
    yield pd.DataFrame({"bucket": [key[0]], "cnt": [running]})


def log2_hist_stream(values: DataFrame, value_col: str) -> DataFrame:
    """STREAMING power-of-2 histogram: the stateful face of the q252
    log2 quantile sketch. The bucket (floor(log2(v)) via
    length(bin(v)) - 1, the libm-free integer form) is computed
    JVM-side; rows shuffle to their bucket's state key and fold in
    with a plain running count — addition is the order-insensitive
    merge that makes histograms the simplest mergeable sketch, so
    micro-batch boundaries cannot move a cell. After each batch a
    bucket emits its refreshed (bucket, cnt) snapshot; the latest
    (= max, counts are monotone) snapshot per bucket is the batch
    histogram, which the q252 quantile readout consumes unchanged.

    State is ONE long per bucket — at most 64 state rows total,
    regardless of stream length or value distribution.
    """
    keyed = values.select(
        (F.length(F.bin(F.col(value_col).cast("long"))) - 1)
        .cast("long")
        .alias("bucket")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _log2_hist_group,
        outputStructType=LOG2_HIST_OUTPUT,
        stateStructType=LOG2_HIST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BITMAP_OUTPUT = T.StructType(
    [
        T.StructField("day", T.LongType()),
        T.StructField("word", T.LongType()),
        T.StructField("bits", T.LongType()),
    ]
)

BITMAP_STATE = T.StructType([T.StructField("bits", T.LongType())])


def _bitmap_group(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    bits = int(state.get[0]) if state.exists else 0
    for pdf in pdfs:
        for m in pdf["mask"]:
            bits |= int(m)
    state.update((bits,))
    yield pd.DataFrame(
        {"day": [key[0]], "word": [key[1]], "bits": [bits]}
    )


def bitmap_or_stream(values: DataFrame, day_col: str, user_col: str) -> DataFrame:
    """STREAMING activity bitmaps: the stateful face of the q253
    bitmap-retention build. Each (epoch-day, 60-user word) state cell
    holds one OR-folded long (60-bit payload — the same cross-engine
    shift-safe width as the batch twin); masks are computed JVM-side
    and fold with bitwise OR — idempotent and commutative, so
    duplicate events, replayed batches and micro-batch boundaries
    cannot change a cell. Snapshots emit per batch; OR-ing a key's
    snapshots (or taking the last) reproduces the batch bitmap
    exactly.

    State is ONE long per (day, word) — bounded by days x users/60,
    not by the event stream.
    """
    keyed = values.select(
        F.col(day_col).cast("long").alias("day"),
        F.expr(f"CAST({user_col} DIV 60 AS BIGINT)").alias("word"),
        F.expr(f"shiftleft(1L, CAST({user_col} % 60 AS INT))").alias("mask"),
    )
    return keyed.groupBy("day", "word").applyInPandasWithState(
        _bitmap_group,
        outputStructType=BITMAP_OUTPUT,
        stateStructType=BITMAP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LIFETIME_OUTPUT = T.StructType(
    [
        T.StructField("addr", T.StringType()),
        T.StructField("first_block", T.LongType()),
        T.StructField("last_block", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("received_value", T.LongType()),
        T.StructField("spent_value", T.LongType()),
    ]
)
LIFETIME_STATE = T.StructType(
    [
        T.StructField("first_block", T.LongType()),
        T.StructField("last_block", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("received_value", T.LongType()),
        T.StructField("spent_value", T.LongType()),
    ]
)


def _lifetime_group(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    if state.exists:
        first, last, n, recv, spent = (int(x) for x in state.get)
    else:
        first, last, n, recv, spent = None, None, 0, 0, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        lo = int(pdf["blk"].min())
        hi = int(pdf["blk"].max())
        first = lo if first is None else min(first, lo)
        last = hi if last is None else max(last, hi)
        n += len(pdf)
        recv += int(pdf["recv"].sum())
        spent += int(pdf["spent"].sum())
    state.update((first, last, n, recv, spent))
    yield pd.DataFrame(
        {
            "addr": [key[0]],
            "first_block": [first],
            "last_block": [last],
            "n_events": [n],
            "received_value": [recv],
            "spent_value": [spent],
        }
    )


def lifetime_stream(ledger: DataFrame) -> DataFrame:
    """STREAMING per-address lifetime ledger: the stateful face of the
    qd77 batch rollup (minus the distinct-tx count, whose state would
    be a per-address tx SET — the maintained index qd44/qd48 owns that
    shape). State per address is five mergeable longs (min, max,
    count, two sums) — each a commutative monoid, so replay and batch
    boundaries cannot change the fixpoint; the final snapshot per key
    is the emission with the largest n_events (monotone). Input must
    carry (addr string, blk long, recv long, spent long).

    State is O(addresses), independent of event volume.
    """
    return ledger.groupBy("addr").applyInPandasWithState(
        _lifetime_group,
        outputStructType=LIFETIME_OUTPUT,
        stateStructType=LIFETIME_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
