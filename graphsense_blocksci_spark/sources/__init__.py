from graphsense_blocksci_spark.sources.tables import (
    TESTDATA_TABLES,
    load_table,
    load_testdata,
    load_raw_blocks,
    load_raw_txs,
    load_raw_exchange_rates,
    load_csv_table,
    load_json_table,
    load_orc_table,
    write_csv_table,
    write_json_table,
    write_orc_table,
)
from graphsense_blocksci_spark.sources.sinks import (
    write_bucketed_table,
    write_range_sorted,
    write_spark_bucketed,
    overwrite_partitions,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_testdata",
    "load_raw_blocks",
    "load_raw_txs",
    "load_raw_exchange_rates",
    "load_csv_table",
    "load_json_table",
    "load_orc_table",
    "write_csv_table",
    "write_json_table",
    "write_orc_table",
    "write_bucketed_table",
    "write_range_sorted",
    "write_spark_bucketed",
    "overwrite_partitions",
]
