"""Custom Python data source: the generator-paged scan as a REAL
Spark 4 `pyspark.sql.datasource` implementation (SURVEY §2.A4).

The reference pages a Python generator `concurrency` rows at a time on
the driver (`blocksci_export.py:276-292` `take`, used at `:249,269`) —
a single-process pull loop. Spark's native execution already makes
that disposition a no-op for parquet inputs, but the SAME shape — "an
external cursor-paged producer that Spark cannot list as files" (an
RPC block fetcher, a REST cursor, a chain daemon) — is exactly what
the Spark 4 Python DataSource API exists for: the planner emits ONE
InputPartition per page, and each page's generator runs inside its own
task, partition-parallel, with no driver funnel.

`PagedRangeDataSource` is the deterministic reference instance of that
shape: `n_rows` rows split into `page_size`-row pages; each row
carries a 28-bit md5-derived value (the registry-wide hash28 contract,
operators/textops.py) so results are reproducible and cell-exact
cross-engine — q356 oracles the whole scan against DuckDB `range()`.

Scale shape: pages are independent tasks (a 1000-executor cluster
pulls 1000 pages concurrently); per-task memory is one page. The
Python-worker hop prices each row through Arrow — this path is for
sources that have no JVM connector, never a replacement for parquet
scans (the package's zero-row-UDF policy is about per-row Python in
the TRANSFORM hot path; a source with no other access path is I/O,
not transform).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

PYDS_SCHEMA = "id long, page long, v long"


def _hash28(s: str) -> int:
    """28-bit md5 prefix — the exact integer DuckDB computes as
    ('0x' || substr(md5(s), 1, 7))::BIGINT (textops.hash28)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)


class PagedRangeReader(DataSourceReader):
    """One InputPartition per page; each task generates its own page."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.page_size = int(options.get("page_size", 1_000))
        if self.n_rows < 0 or self.page_size <= 0:
            raise ValueError(
                "pagedrange requires n_rows >= 0 and page_size > 0"
            )

    def partitions(self) -> list[InputPartition]:
        n_pages = -(-self.n_rows // self.page_size) if self.n_rows else 0
        return [InputPartition(p) for p in range(max(n_pages, 1))]

    def read(self, partition: InputPartition):
        page = partition.value
        start = page * self.page_size
        stop = min(start + self.page_size, self.n_rows)
        for i in range(start, stop):
            yield (i, page, _hash28(f"pg:{i}"))


class PagedRangeDataSource(DataSource):
    """`spark.read.format("pagedrange")` — options n_rows, page_size."""

    @classmethod
    def name(cls) -> str:
        return "pagedrange"

    def schema(self) -> str:
        return PYDS_SCHEMA

    def reader(self, schema) -> PagedRangeReader:
        return PagedRangeReader(self.options)


def register_pagedrange(spark) -> None:
    """Idempotent per-session registration (re-register overwrites)."""
    spark.dataSource.register(PagedRangeDataSource)
