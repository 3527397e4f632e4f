"""UTXO input→previous-output linkage — the domain's defining join.

The reference never writes this join: BlockSci's C++ parser resolves
`tx.inputs[i].address / .value` before the Python driver ever sees a
transaction (reference: blocksci_export.py:348-349; SURVEY §2.B1). In a
relational engine it IS a join: every input references the output it
spends by `(spent_tx_id, spent_index)`, and the output table is keyed by
`(tx_id, output_index)`.

Scale notes: both sides are huge (billions of rows at full-chain scale),
so this is a shuffle (sort-merge) equi-join on the composite key. The
join key is the SPENT tx id, which is uniformly distributed over the tx
id space — no skew, no salting needed. Pre-bucketing both tables by
`tx_id_group` (the reference's own 25k bucketing, blocksci_export.py:36)
makes it a co-located join with zero shuffle on the bucketed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_inputs(txs: DataFrame) -> DataFrame:
    """One row per input slot, carrying the UTXO back-reference
    (spent_tx_id, spent_index) the parser resolved and the value the
    input claims to spend."""
    return txs.select(
        F.col("tx_id"), F.posexplode("inputs").alias("input_index", "inp")
    ).select(
        "tx_id",
        "input_index",
        F.col("inp.spent_tx_id").alias("spent_tx_id"),
        F.col("inp.spent_index").alias("spent_index"),
        F.col("inp.value").alias("claimed_value"),
    )


def explode_outputs(txs: DataFrame) -> DataFrame:
    """Flatten the nested `outputs` array into one row per output slot,
    keyed by (tx_id, output_index)."""
    return txs.select(
        F.col("tx_id").alias("tx_id"),
        F.posexplode("outputs").alias("output_index", "out"),
    ).select(
        "tx_id",
        "output_index",
        F.col("out.address").alias("address"),
        F.col("out.value").alias("value"),
        F.col("out.address_type").alias("address_type"),
    )


def link_inputs_to_outputs(
    inputs: DataFrame,
    outputs: DataFrame,
    spent_tx_col: str = "spent_tx_id",
    spent_idx_col: str = "spent_index",
    broadcast_outputs: bool = False,
) -> DataFrame:
    """Resolve each input to the output it spends (SURVEY §2.B1).

    `inputs` must carry (spent_tx_id, spent_index); `outputs` must carry
    (tx_id, output_index) plus the value/address payload. Left join: an
    unresolvable input (corrupt data) keeps NULL payload rather than
    disappearing.
    """
    right = outputs.select(
        F.col("tx_id").alias("_out_tx_id"),
        F.col("output_index").alias("_out_index"),
        *[c for c in outputs.columns if c not in ("tx_id", "output_index")],
    )
    if broadcast_outputs:
        right = F.broadcast(right)
    return inputs.join(
        right,
        (F.col(spent_tx_col) == F.col("_out_tx_id"))
        & (F.col(spent_idx_col) == F.col("_out_index")),
        "left",
    ).drop("_out_tx_id", "_out_index")
