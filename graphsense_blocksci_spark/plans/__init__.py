from graphsense_blocksci_spark.plans.ingest import (
    block_table,
    transaction_table,
    tx_prefix_table,
    block_transactions_table,
    summary_statistics_table,
    configuration_table,
    ingest_all,
)
from graphsense_blocksci_spark.plans.daemon import (
    ingest_daemon_step,
    run_ingest_daemon,
)

__all__ = [
    "block_table",
    "transaction_table",
    "tx_prefix_table",
    "block_transactions_table",
    "summary_statistics_table",
    "configuration_table",
    "ingest_all",
    "ingest_daemon_step",
    "run_ingest_daemon",
]
