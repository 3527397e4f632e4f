"""Snapshot reconciliation: classify rows as added / removed / changed
between two versions of a keyed table.

The audit primitive an incremental pipeline needs around every re-run
(reference context: the daemon's repeated ingest windows,
docker/ingest.sh:2-8 — "did the re-run change anything it shouldn't
have?"). Expressed as ONE full-outer join on the key plus column
comparison — no collect, no per-row Python.

Scale shape: a single shuffle on the key for each side (sort-merge
full outer); the change test compares a 64-bit xxhash of the non-key
columns, so wide rows cost one projection, not N column equality
checks carried through the join. Unchanged rows are dropped by
default — at 100 TB the diff output is the (small) churn, never the
corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Return (keys..., change) where change ∈ added | removed |
    changed (| unchanged). Both inputs must share a schema; non-key
    columns are compared via xxhash64 over their values in schema
    order (NULL-safe: hash of NULL is stable and distinct from '')."""
    value_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")

    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *[F.col(k) for k in keys],
            F.xxhash64(*[F.col(c) for c in value_cols]).alias(f"_h_{side}"),
        )

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
