from graphsense_blocksci_spark.streaming.ingest import (
    stream_block_stats,
    stream_transactions,
)
from graphsense_blocksci_spark.streaming.stateful import sessionize_stream
from graphsense_blocksci_spark.streaming.sketches import (
    hdr_histogram_stream,
    heavy_hitters_stream,
)
from graphsense_blocksci_spark.streaming.dedup import (
    content_hash,
    curate_stream,
    dedup_stream,
)

__all__ = [
    "stream_transactions",
    "stream_block_stats",
    "sessionize_stream",
    "heavy_hitters_stream",
    "hdr_histogram_stream",
    "dedup_stream",
    "curate_stream",
    "content_hash",
]
