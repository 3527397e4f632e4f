"""Streaming exact deduplication — the streaming face of
`operators/text_dedup.exact_dedup`.

A training-data ingest daemon sees the same document again and again
(re-crawls, mirror feeds, retried uploads). Batch dedup re-scans the
corpus; the streaming form drops repeats AS THEY ARRIVE using Spark's
native `dropDuplicatesWithinWatermark`: state is keyed by content hash
and expired by the event-time watermark, so the store holds only the
hashes seen within the lateness window — bounded, unlike a forever
`dropDuplicates` whose state grows with the corpus.

Spark-first: no custom state machine — the built-in operator already
implements keyed state + watermark eviction + checkpoint recovery; we
only supply the key (a 128-bit md5 of normalized content, the same
canonicalization the batch dedup uses, so batch and stream agree on
what "same document" means).

Scale shape: one shuffle on the uniform content hash; state size is
|distinct hashes per watermark window|; checkpointing makes redelivery
effectively-once (reference analog: PK upsert + retry,
blocksci_export.py:132-142).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import normalize_text


def content_hash(text_col: str = "text") -> Column:
    """128-bit md5 of whitespace-normalized lowercase content — the
    batch `exact_dedup` key, shared so stream and batch dedup agree."""
    return F.md5(normalize_text(text_col))


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-arrivals of the same content within the watermark window.

    `docs` is a STREAMING frame with an event-time column `ts_col`.
    The first arrival of each content hash passes through; later
    copies inside the watermark window are dropped; state for hashes
    older than the watermark is evicted (a copy arriving later than
    the lateness bound is treated as new — the documented trade of
    bounded state)."""
    return (
        docs.withColumn("_content_hash", content_hash(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash"])
    )


def curate_stream(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """The curation pipeline's STREAMING face: arriving documents are
    deduped against the watermark window, then quality-gated and
    language-filtered — so a crawl feed lands already curated instead
    of being re-curated batch-wise each day.

    Spark-first composition: the curation signals are APPENDED as pure
    per-row columns (`curation_columns`), so the stateless stages
    stream for free with NO joins — the keyed frames the batch
    `quality_score`/`language_id` return would self-join as
    stream-stream here. The only stateful stage is the native
    watermark dedup. One declarative DAG, two execution modes —
    mirroring plans/curate.py (parity pytest-pinned).
    """
    from graphsense_blocksci_spark.operators.text_analysis import (
        curation_columns,
    )

    deduped = dedup_stream(docs, text_col, ts_col, watermark)
    scored = curation_columns(deduped, text_col)
    return scored.filter(
        F.col("quality_ok") & F.col("lang_pred").isin(*keep_langs)
    ).select(id_col, ts_col, "n_tokens", "lang_pred")
