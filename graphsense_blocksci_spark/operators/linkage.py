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


def address_balances(txs: DataFrame) -> DataFrame:
    """Per-address UTXO ledger: total received, total spent (resolved
    through the input→output linkage), and the balance — the engine-
    side analog of the address summary GraphSense's transformation
    stage derives from the reference's exported tables (the export
    itself stops at raw tx rows; a relational engine can fold the
    ledger in one more pass).

    Address identity: the rendered address list joined with '|' — one
    identity per output SLOT (multisig stays one identity, matching
    one-Address-object-per-output), and outputs with no renderable
    address (nonstandard scripts) never enter the ledger, so an input
    spending one contributes to neither side.

    Returns (addr, n_received, received_value, n_spent, spent_value,
    balance). Scale shape: credit is one aggregate over exploded
    outputs keyed by address; debit shuffles the inputs once on the
    uniform (spent_tx_id, spent_index) key for the linkage, then
    aggregates on address. Hot service addresses make the address key
    skewed — map-side partial aggregation collapses them before the
    shuffle, and AQE's skew handling covers the join side.
    """
    outs = (
        explode_outputs(txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            "value",
        )
    )
    credit = outs.groupBy("addr").agg(
        F.count(F.lit(1)).alias("n_received"),
        F.sum("value").alias("received_value"),
    )
    ins = explode_inputs(txs.filter(~F.col("coinbase")))
    debit = (
        link_inputs_to_outputs(ins, outs)
        .filter(F.col("addr").isNotNull())
        .groupBy("addr")
        .agg(
            F.count(F.lit(1)).alias("n_spent"),
            F.sum("value").alias("spent_value"),
        )
    )
    return credit.join(debit, "addr", "left").select(
        "addr",
        "n_received",
        "received_value",
        F.coalesce("n_spent", F.lit(0)).alias("n_spent"),
        F.coalesce("spent_value", F.lit(0)).alias("spent_value"),
        (F.col("received_value") - F.coalesce("spent_value", F.lit(0))).alias(
            "balance"
        ),
    )


def daily_balances(txs: DataFrame) -> DataFrame:
    """Per-address DAILY balance time series — the running-ledger view
    GraphSense's transformation stage materializes on top of the
    qd15 totals: credits land on the receiving tx's day, debits on
    the SPENDING tx's day (resolved through the B1 linkage join), net
    per (addr, day), and the running balance as a per-address
    cumulative window.

    Scale shape: credits are one exploded-output aggregate; debits pay
    the linkage shuffle once (uniform spent-tx key) plus a timestamp
    join on the spender's tx id; the cumulative window partitions BY
    ADDRESS — per-partition frames are one address's active days,
    never a global sort. Same multisig/no-address identity rules as
    `address_balances`.

    Returns (addr, day, net_value, balance) for days with activity.
    """
    days = txs.select(
        F.col("tx_id"),
        F.floor(F.col("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("day"),
    )
    outs = (
        explode_outputs(txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            "value",
        )
    )
    credits = (
        outs.join(days, "tx_id")
        .select("addr", "day", F.col("value").cast("long").alias("delta"))
    )
    ins = explode_inputs(txs.filter(~F.col("coinbase")))
    debits = (
        link_inputs_to_outputs(ins, outs)
        .filter(F.col("addr").isNotNull())
        .select("tx_id", "addr", "value")
        .join(days, "tx_id")
        .select("addr", "day", (-F.col("value").cast("long")).alias("delta"))
    )
    from pyspark.sql import Window

    net = (
        credits.union(debits)
        .groupBy("addr", "day")
        .agg(F.sum("delta").cast("long").alias("net_value"))
    )
    w = (
        Window.partitionBy("addr")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return net.withColumn(
        "balance", F.sum("net_value").over(w).cast("long")
    )


def address_transactions(txs: DataFrame) -> DataFrame:
    """Per-address ORDERED transaction index — the inverted
    address→tx list GraphSense's raw keyspace serves every address
    drill-down from (consumers page it off the reference's exported
    `transaction` rows, schema.cql:21-34; the transformation stage
    materializes exactly this table so lookups never scan the chain).

    One row per (addr, tx) the address participates in, with the
    address's flows inside that tx split by direction and netted:

      (addr, tx_id, block_id, n_received_outputs, received_value,
       n_spent_inputs, spent_value, net_value, tx_seq)

    ``tx_seq`` is the address's 1-based position in its own history,
    ordered by (block_id, tx_id) — the clustering-key order the
    Cassandra table pages by. Same identity rules as
    `address_balances`: one '|'-joined identity per output slot,
    no-address outputs never enter.

    Scale shape: credits are one exploded-output aggregate on
    (addr, tx); debits pay the B1 linkage shuffle once (uniform
    (spent_tx_id, spent_index) key) and aggregate on the SPENDING
    (addr, tx); one uniform tx_id join stamps block heights; the
    tx_seq window partitions BY ADDRESS (a hot service address makes
    a big — but single-address — frame; the index semantics require
    that per-address order, exactly as the Cassandra clustering key
    does).
    """
    heights = txs.select("tx_id", F.col("block_id").cast("long").alias("block_id"))
    outs = (
        explode_outputs(txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            "value",
        )
    )
    credit = outs.groupBy("addr", "tx_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_received_outputs"),
        F.sum("value").cast("long").alias("received_value"),
    )
    ins = explode_inputs(txs.filter(~F.col("coinbase")))
    debit = (
        link_inputs_to_outputs(ins, outs)
        .filter(F.col("addr").isNotNull())
        .groupBy("addr", "tx_id")  # tx_id = the SPENDING tx
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spent_inputs"),
            F.sum("value").cast("long").alias("spent_value"),
        )
    )
    per_tx = (
        credit.join(debit, ["addr", "tx_id"], "full_outer")
        .select(
            "addr",
            "tx_id",
            F.coalesce("n_received_outputs", F.lit(0))
            .cast("long")
            .alias("n_received_outputs"),
            F.coalesce("received_value", F.lit(0))
            .cast("long")
            .alias("received_value"),
            F.coalesce("n_spent_inputs", F.lit(0))
            .cast("long")
            .alias("n_spent_inputs"),
            F.coalesce("spent_value", F.lit(0))
            .cast("long")
            .alias("spent_value"),
        )
        .join(heights, "tx_id")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("addr").orderBy("block_id", "tx_id")
    return per_tx.select(
        "addr",
        "tx_id",
        "block_id",
        "n_received_outputs",
        "received_value",
        "n_spent_inputs",
        "spent_value",
        (F.col("received_value") - F.col("spent_value"))
        .cast("long")
        .alias("net_value"),
        F.row_number().over(w).cast("long").alias("tx_seq"),
    )
