"""Sequence packing: map a token-counted corpus onto fixed-budget
training sequences (the GPT-style concat-and-chunk layout).

Documents are laid end-to-end in stable `id` order; the token stream is
cut every `budget` tokens; each document learns its global token
`offset` and the range of sequence bins it spans. Downstream a writer
can group by bin to emit packed training rows; the offsets are the
whole contract.

Scale shape — the global running sum is the textbook sequential trap
(one `Window.orderBy` = ALL rows to one partition). This implements the
distributed two-phase prefix sum instead:

1. rows are range-bucketed by id (`n_buckets` contiguous id ranges);
2. a per-bucket window computes LOCAL running sums (shuffle on bucket,
   each bucket sorts independently);
3. bucket TOTALS (n_buckets rows, not corpus rows) get a tiny
   single-partition window to produce each bucket's starting offset;
4. the per-bucket offsets broadcast-join back onto the local sums.

Only step 3 is sequential, and it touches `n_buckets` rows regardless
of corpus size — at 100 TB with n_buckets=8192 that is 8192 rows on
one core, while the heavy sort/scan work stays fully parallel.

Reference parity: none — the reference has no training-data surface;
this is the beyond-reference LLM-pipeline brief (packing is standard
practice for LLM pretraining batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_packing(
    docs: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each doc its global token offset and sequence-bin span.

    Input: (`id_col`, `count_col`) — ids stable and unique, counts >= 0.
    Output: (doc_id, n_tokens, offset, start_bin, end_bin) where
    `offset` is the number of tokens before this doc in id order,
    `start_bin`/`end_bin` the first/last `budget`-token sequence the
    doc's tokens land in (empty docs span [start_bin, start_bin]).
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(count_col).cast("long").alias("n_tokens"),
    )
    # Contiguous id-range buckets. The max-id probe is one tiny agg
    # (a scalar to the driver, like every bounded-probe in this repo);
    # ids need not be dense — ranges just need to preserve id order.
    hi = base.agg(F.max("doc_id")).first()[0]
    if hi is None:
        return base.sparkSession.createDataFrame(
            [],
            "doc_id long, n_tokens long, offset long, "
            "start_bin long, end_bin long",
        )
    width = max(1, (int(hi) + n_buckets) // n_buckets)
    bucketed = base.withColumn("_bkt", (F.col("doc_id") / width).cast("long"))
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum", F.sum("n_tokens").over(w_local))
    # Bucket totals: n_buckets rows; the only sequential window runs
    # over this bounded frame, never the corpus.
    w_bkt = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        bucketed.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn("_boff", F.sum("_tot").over(w_bkt) - F.col("_tot"))
        .select("_bkt", "_boff")
    )
    joined = local.join(F.broadcast(offsets), "_bkt")
    offset = F.col("_boff") + F.col("_cum") - F.col("n_tokens")
    start_bin = F.floor(offset / budget).cast("long")
    end_bin = F.when(
        F.col("n_tokens") > 0,
        F.floor((offset + F.col("n_tokens") - 1) / budget).cast("long"),
    ).otherwise(start_bin)
    return joined.select(
        "doc_id",
        "n_tokens",
        offset.cast("long").alias("offset"),
        start_bin.alias("start_bin"),
        end_bin.alias("end_bin"),
    )
