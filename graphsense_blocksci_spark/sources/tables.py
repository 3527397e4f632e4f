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
from pyspark.sql import functions as F
from pyspark.sql import types as T  # noqa: F401  (schema hints for load_json_table)

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


def _nanos_ts_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — a type Spark's
    vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). Sniffed
    driver-side from the footer via pyarrow; one footer read, no data."""
    import pyarrow.parquet as pq

    p = Path(path)
    target = p if p.is_file() else next(p.glob("**/*.parquet"), None)
    if target is None:
        return []
    schema = pq.read_schema(str(target))
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with nanosecond-timestamp compatibility.

    TIMESTAMP(NANOS) columns (e.g. the driver testdata's `events.ts`)
    are read as raw long nanoseconds (`nanosAsLong`) and decoded to
    microsecond timestamps with exact integer division (`div 1000` —
    truncation, matching how µs-native engines read the same file).
    Plain tables take the normal vectorized-reader path untouched.
    """
    # Timestamp semantics (date_trunc, epoch extraction, day cutoffs)
    # are session-timezone dependent; the oracle engine runs UTC. Pin
    # it here — every query loads through this function, so a driver
    # session created with a local timezone still computes UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = str(Path(sf_dir) / f"{name}.parquet")
    ns_cols = _nanos_ts_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


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


def load_json_table(
    spark: SparkSession, path: str, schema: "T.StructType | str"
) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema — the config-style
    input family (the reference's parser configs are JSON,
    conf/btc.cfg). Schema inference is forbidden in this engine
    (SURVEY §1.3: fixed, explicit schemas only) — at 100 TB an
    inference pass is a full extra scan, and a drifting inferred type
    silently changes downstream plans."""
    return spark.read.schema(schema).json(path)


def write_json_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — interchange with non-columnar consumers; for
    anything large, parquet (`sinks.py`) is the real format."""
    df.write.mode(mode).json(path)


def load_orc_table(
    spark: SparkSession, path: str, schema: "T.StructType | str | None" = None
) -> DataFrame:
    """ORC source — the second columnar format Spark ships natively
    (predicate pushdown, column pruning and vectorized read work the
    same as parquet). Schema optional: ORC footers carry types, so
    unlike CSV/JSON there is no inference scan to forbid."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — interchange with Hive/Trino-side consumers; same
    nested-type support as parquet."""
    df.write.mode(mode).orc(path)


def load_csv_table(
    spark: SparkSession,
    path: str,
    schema: "T.StructType | str",
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with an EXPLICIT schema (same no-inference rule as
    the JSON source: inference is an extra full scan and a type-drift
    hazard). `mode=FAILFAST` — a malformed row is a data bug to
    surface, not a NULL to smuggle downstream."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_csv_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """CSV sink — flat-file interchange only (no nested columns; Spark
    rejects arrays/structs in CSV, which is correct: flatten or use
    parquet/JSON for structured data)."""
    df.write.mode(mode).option("header", str(header).lower()).option(
        "delimiter", delimiter
    ).csv(path)
