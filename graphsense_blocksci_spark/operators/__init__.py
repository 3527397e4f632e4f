from graphsense_blocksci_spark.operators.windows import (
    latest_per_group,
    dedup_last_write_wins,
    top_k,
    high_water_mark_filter,
)
from graphsense_blocksci_spark.operators.asof import asof_join
from graphsense_blocksci_spark.operators.linkage import (
    explode_outputs,
    link_inputs_to_outputs,
)

__all__ = [
    "latest_per_group",
    "dedup_last_write_wins",
    "top_k",
    "high_water_mark_filter",
    "asof_join",
    "explode_outputs",
    "link_inputs_to_outputs",
]
