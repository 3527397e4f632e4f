"""Structured Streaming ingest daemon tests: checkpoint resume
(--continue), watermarked windows (--previous-day), idempotent sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_blocksci_spark import fixtures
from graphsense_blocksci_spark.streaming import (
    stream_block_stats,
    stream_transactions,
)


def _raw_txs(spark, tmp_path):
    d = fixtures.ensure_fixtures()
    df = spark.read.parquet(f"{d}/raw_txs.parquet")
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)
    return df, src


def test_stream_transactions_matches_batch(spark, tmp_path):
    batch_df, src = _raw_txs(spark, tmp_path)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_transactions(
        spark, src, sink, ckpt, max_files_per_trigger=2, available_now=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == batch_df.count()
    # stream output has the batch transform's schema and values
    assert got.filter(F.col("total_input") < 0).count() == 0
    assert set(got.columns) >= {"tx_id", "tx_id_group", "coinjoin"}


def test_stream_resume_is_incremental(spark, tmp_path):
    batch_df, src = _raw_txs(spark, tmp_path)
    sink = str(tmp_path / "sink2")
    ckpt = str(tmp_path / "ckpt2")
    q = stream_transactions(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # restart with NO new files: checkpoint must prevent reprocessing
    q2 = stream_transactions(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2 == batch_df.count()


def test_stream_block_stats_windows(spark, tmp_path):
    _, src = _raw_txs(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "stats")
    q = stream_block_stats(
        spark, src, ckpt, window="1 hour", available_now=True, sink_dir=out
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; with a 1-day
    # watermark over a short fixture chain the newest windows stay open
    assert set(got.columns) == {
        "window_start",
        "window_end",
        "no_txs",
        "no_outputs",
    }
