"""Streaming incremental maintenance of the address→transactions
index — the GraphSense transformation daemon as a Structured
Streaming `foreachBatch` loop (the reference runs the raw-keyspace
half of this as the `blocksci_export.py --continue --previous-day`
loop, docker/ingest.sh:2-8; consumers then derive address pages from
the exported `transaction` rows, scripts/schema.cql:21-34 — this
module materializes and MAINTAINS that derived index engine-side).

Production shape: the chain follower drops new block files in a
directory; the stream picks them up per micro-batch and each batch
applies the qd44 incremental merge — delta flows from the batch's
transactions, inputs resolved against the ACCUMULATED output table,
only touched addresses re-sequenced, untouched index rows carried
verbatim. Two sinks:

- ``outputs/``  — exploded output table (the UTXO-side lookup the
  linkage join needs; append per batch, rewritten only on reorg
  rollback — see `merge_batch`).
- ``index/``    — the maintained address_transactions index,
  atomically replaced per batch (eager localCheckpoint first — a
  parquet overwrite invalidates readers of the OLD files, so the
  merged frame must be materialized off the sink before the rewrite;
  the production sink would be a MERGE-capable table format and skip
  the rewrite entirely).

Effectively-once: a replayed batch re-appends outputs (the linkage
dedups nothing, but duplicate outputs only arise on non-atomic
retries — production uses the A21 idempotent sink machinery) and the
index merge is idempotent given the same accumulated outputs.

Scale shape per batch: delta-sized flows + one linkage shuffle
against the output table (uniform (spent_tx_id, spent_index) key,
partition-prunable by tx range at real scale) + touched-address
re-sequencing only. The full-history recompute never runs — that is
the point; the ORACLE is that full recompute, and equality after the
final batch proves the daemon loses nothing.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.linkage import (
    explode_inputs,
    explode_outputs,
    link_inputs_to_outputs,
)

INDEX_SCHEMA = (
    "addr string, tx_id long, block_id long, n_received_outputs long,"
    " received_value long, n_spent_inputs long, spent_value long,"
    " net_value long, tx_seq long"
)
OUTPUTS_SCHEMA = (
    "tx_id long, output_index int, addr string, value long, block_id long"
)


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a sink, treating ONLY a missing path as cold start.

    Any other read failure (transient FS error, corrupt footer, perm
    denied) must propagate: merge_batch rewrites the index with
    mode('overwrite'), so silently substituting an empty frame would
    replace the accumulated index with just the current batch's rows —
    permanent history loss instead of a failed-and-retried batch.
    """
    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as exc:
        cls = (
            exc.getCondition()
            if hasattr(exc, "getCondition")
            else exc.getErrorClass()
        )
        if cls == "PATH_NOT_FOUND":
            return spark.createDataFrame([], schema)
        raise


def merge_batch(
    spark: SparkSession,
    batch_txs: DataFrame,
    outputs_dir: str,
    index_dir: str,
) -> None:
    """Fold one micro-batch of transactions into the two sinks.

    REORG HANDLING: a batch whose minimum block height is ≤ the
    index's current tip is a competing-chain announcement — every
    block at or above that fork height is ORPHANED. Orphaned rows
    are rolled back from both sinks before the batch folds in:
    orphaned index rows are dropped and their addresses join the
    touched set (their tx_seq must re-pack), orphaned outputs leave
    the lookup table (a surviving block's tx can never spend a
    later — hence orphaned — block's output, so the rollback cannot
    strand a resolved spend). The reference only SHIELDS against
    reorgs with the B7 safety-lag filter; recovery is what the
    transformation daemon actually needs. At real scale the outputs
    sink is partitioned by block range and the rollback is a dynamic
    partition overwrite (A21 machinery) instead of this rewrite.
    """
    batch_txs = batch_txs.localCheckpoint(eager=True)

    old = _read_or_empty(spark, index_dir, INDEX_SCHEMA)
    tip_row = old.agg(F.max("block_id").alias("tip")).first()
    tip = tip_row["tip"] if tip_row is not None else None
    fork_row = batch_txs.agg(F.min("block_id").alias("lo")).first()
    fork = fork_row["lo"] if fork_row is not None else None
    reorg = tip is not None and fork is not None and fork <= tip

    dropped_addrs = None
    if reorg:
        # roll orphaned blocks out of both sinks
        dropped_addrs = (
            old.filter(F.col("block_id") >= fork).select("addr").distinct()
        )
        old = old.filter(F.col("block_id") < fork)
        kept_outs = (
            _read_or_empty(spark, outputs_dir, OUTPUTS_SCHEMA)
            .filter(F.col("block_id") < fork)
            .distinct()  # reorg rewrite doubles as replay-dup compaction
            .localCheckpoint(eager=True)
        )
        kept_outs.write.mode("overwrite").parquet(outputs_dir)
        dropped_addrs = dropped_addrs.localCheckpoint(eager=True)
        old = old.localCheckpoint(eager=True)

    heights_all = batch_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("block_id")
    )
    new_outs = (
        explode_outputs(batch_txs)
        .filter(F.size("address") > 0)
        .select(
            F.col("tx_id").cast("long").alias("tx_id"),
            F.col("output_index").cast("int").alias("output_index"),
            F.concat_ws("|", "address").alias("addr"),
            F.col("value").cast("long").alias("value"),
        )
        .join(heights_all, "tx_id")
        .select("tx_id", "output_index", "addr", "value", "block_id")
    )
    new_outs.write.mode("append").parquet(outputs_dir)

    # accumulated outputs now include this batch — inputs may spend
    # outputs created earlier in the SAME batch. The distinct() makes
    # every read REPLAY-SAFE: a batch re-run after a crash between the
    # outputs append and the index write re-appends identical rows,
    # and without the dedup each input would match twice and double
    # its spent_value (effectively-once by idempotent read, the A21
    # discipline; the rows are exact duplicates so distinct is exact)
    all_outs = (
        _read_or_empty(spark, outputs_dir, OUTPUTS_SCHEMA)
        .select("tx_id", "output_index", "addr", "value")
        .distinct()
    )

    credit = (
        explode_outputs(batch_txs)
        .filter(F.size("address") > 0)
        .select("tx_id", F.concat_ws("|", "address").alias("addr"), "value")
        .groupBy("addr", "tx_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_received_outputs"),
            F.sum("value").cast("long").alias("received_value"),
        )
    )
    debit = (
        link_inputs_to_outputs(
            explode_inputs(batch_txs.filter(~F.col("coinbase"))), all_outs
        )
        .filter(F.col("addr").isNotNull())
        .groupBy("addr", "tx_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spent_inputs"),
            F.sum("value").cast("long").alias("spent_value"),
        )
    )
    delta = (
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
        .join(heights_all, "tx_id")
        .select(
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
        )
        # pin: delta feeds the touched set AND the re-sequencing union
        # — unpinned, the batch linkage shuffle would execute twice
        .localCheckpoint(eager=False)
    )

    touched = delta.select("addr").distinct()
    if dropped_addrs is not None:
        # addresses that LOST rows to the rollback must re-pack their
        # tx_seq even if the replacement batch never mentions them
        touched = touched.union(dropped_addrs).distinct()
    untouched = old.join(touched, "addr", "left_anti")
    reseq = (
        old.drop("tx_seq")
        .join(F.broadcast(touched), "addr", "semi")
        .unionByName(delta)
    )
    w = Window.partitionBy("addr").orderBy("block_id", "tx_id")
    merged = untouched.unionByName(
        reseq.withColumn("tx_seq", F.row_number().over(w).cast("long"))
    )
    # materialize OFF the sink before overwriting it (parquet overwrite
    # invalidates the old files any lazy reader still references)
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(index_dir)


def run_index_daemon(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    tx_schema: str,
) -> str:
    """Drive the daemon availableNow over a staged block-file
    directory; returns the index sink path. One file per micro-batch
    (maxFilesPerTrigger=1), so a 3-file staging exercises 3
    incremental merges."""
    outputs_dir = f"{work_dir}/outputs"
    index_dir = f"{work_dir}/index"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, batch_df, outputs_dir, index_dir)

    q = (
        spark.readStream.schema(tx_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return index_dir
