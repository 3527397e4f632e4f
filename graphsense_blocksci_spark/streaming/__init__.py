from graphsense_blocksci_spark.streaming.ingest import (
    stream_block_stats,
    stream_transactions,
)

__all__ = ["stream_transactions", "stream_block_stats"]
