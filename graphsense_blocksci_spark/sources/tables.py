"""Parquet source registry.

The reference's source is BlockSci's memory-mapped columnar store with
vectorized accessors (reference: blocksci_export.py:480,542; BlockSci
paper §3). The Spark-native equivalent of a columnar mmap store is a
parquet scan: column pruning and predicate pushdown give the same
"touch only what you read" behavior, distributed.

Two families:
- the driver's TPC-H-ish testdata (TESTDATA.md) for generic operators,
- the domain mini-chain fixtures (fixtures.py) for blockchain parity.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from graphsense_blocksci_spark import fixtures

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))


def load_testdata(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def _fixture(spark: SparkSession, name: str, fixture_dir: str | None) -> DataFrame:
    d = fixtures.ensure_fixtures(fixture_dir or fixtures.DEFAULT_DIR)
    return spark.read.parquet(str(Path(d) / f"{name}.parquet"))


def load_raw_blocks(spark: SparkSession, fixture_dir: str | None = None) -> DataFrame:
    return _fixture(spark, "raw_blocks", fixture_dir)


def load_raw_txs(spark: SparkSession, fixture_dir: str | None = None) -> DataFrame:
    return _fixture(spark, "raw_txs", fixture_dir)


def load_raw_exchange_rates(spark: SparkSession, fixture_dir: str | None = None) -> DataFrame:
    return _fixture(spark, "raw_exchange_rates", fixture_dir)
