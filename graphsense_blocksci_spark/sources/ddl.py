"""DDL bootstrap + table-selection validation.

The reference bootstraps its Cassandra keyspace by substituting the
keyspace name into a CQL template and executing statement-by-statement
(reference: create_keyspace.py:43-70, create_keyspace.sh:8), and
validates a `--tables` CLI arg by set algebra over the known table
list (reference: blocksci_export.py:444-463).

Spark-natively, DDL is catalog DDL: `CREATE DATABASE/TABLE IF NOT
EXISTS ... USING PARQUET`, idempotent like the reference's
`has_keyspace` check, with the explicit StructTypes of schemas.py as
the single source of truth (no template substitution — the keyspace
name is just the database name).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from graphsense_blocksci_spark.schemas import OUTPUT_TABLES


def check_tables_arg(
    tables: list[str] | None, known: tuple[str, ...] | None = None
) -> list[str]:
    """Validate a table-selection argument against the known output
    tables (reference: blocksci_export.py:444-463): unknown names
    raise, None/empty means all, order follows the canonical list."""
    known = tuple(known or OUTPUT_TABLES.keys())
    if not tables:
        return list(known)
    unknown = sorted(set(tables) - set(known))
    if unknown:
        raise ValueError(f"unknown tables {unknown}; known: {sorted(known)}")
    return [t for t in known if t in set(tables)]


def _ddl_schema(schema: T.StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def setup_keyspace(
    spark: SparkSession,
    keyspace: str,
    location: str | None = None,
    tables: list[str] | None = None,
) -> list[str]:
    """Idempotent catalog bootstrap: one database per keyspace, one
    external parquet table per output schema (reference:
    create_keyspace.py:43-70 — `CREATE KEYSPACE IF NOT EXISTS` +
    per-table DDL). Returns the created/verified table identifiers."""
    selected = check_tables_arg(tables)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{keyspace}`")
    created = []
    for name in selected:
        schema = OUTPUT_TABLES[name]
        ident = f"`{keyspace}`.`{name}`"
        loc = f" LOCATION '{location}/{name}'" if location else ""
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {ident} ({_ddl_schema(schema)}) "
            f"USING PARQUET{loc}"
        )
        created.append(f"{keyspace}.{name}")
    return created


def has_keyspace(spark: SparkSession, keyspace: str) -> bool:
    """Existence check (reference: create_keyspace.py:43-53 queries
    system_schema.keyspaces; here the catalog API)."""
    return spark.catalog.databaseExists(keyspace)
