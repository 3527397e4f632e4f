from graphsense_blocksci_spark.plans.ingest import (
    block_table,
    transaction_table,
    tx_prefix_table,
    block_transactions_table,
    summary_statistics_table,
    configuration_table,
    ingest_all,
)

__all__ = [
    "block_table",
    "transaction_table",
    "tx_prefix_table",
    "block_transactions_table",
    "summary_statistics_table",
    "configuration_table",
    "ingest_all",
]
