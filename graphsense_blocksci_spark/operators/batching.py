"""Length-bucketed batch planning: group similar-length documents into
fixed-size inference/training batches and account the padding waste.

Dynamic batching (the "bucketing" of every serving / fine-tuning
stack): a batch pads every member to its longest sequence, so batching
similar lengths together is pure throughput. This operator plans the
batches: documents land in a WIDTH-sized length bucket (fixed integer
boundaries — NOT a global ntile, whose single-partition sort is a
scale-killer), are ordered deterministically inside the bucket by
(n_tokens, id), and sliced into `batch_size` groups; per batch it
reports member count, max/sum length, and the padding waste
``n_docs·max_len − sum_len`` a dense pack of that batch would pay.

All integers end-to-end -> cell-exact cross-engine. Scale shape: one
shuffle on the bucket key; the per-bucket window sort is the only
per-group cost, and buckets are bounded by the WIDTH choice (length
distributions are heavy-headed, so width controls skew directly; a
pathological bucket can be sub-split by salting the bucket id with
hash(id) without changing any batch's membership semantics beyond the
deterministic order, exactly like group_capped_sample's note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import spread, tokens

BUCKET_WIDTH = 16
BATCH_SIZE = 8


def plan_batches(
    docs: DataFrame,
    bucket_width: int = BUCKET_WIDTH,
    batch_size: int = BATCH_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, batch_id, n_docs, max_len, sum_len, padding_waste) —
    batch_id is 0-based within its bucket; empty docs are excluded
    (a zero-token row has nothing to batch)."""
    n_tok = F.size(tokens(text_col))
    per_doc = (
        spread(docs)
        .select(
            F.col(id_col).cast("long").alias(id_col),
            n_tok.cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "bucket", F.floor(F.col("n_tokens") / bucket_width).cast("long")
        )
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("n_tokens").asc(), F.col(id_col).asc()
    )
    slotted = per_doc.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return (
        slotted.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_len"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_len",
            "sum_len",
            (F.col("n_docs") * F.col("max_len") - F.col("sum_len")).alias(
                "padding_waste"
            ),
        )
    )
