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

from pyspark.sql import DataFrame, Window
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


def scd2_intervals(
    events: DataFrame,
    key: str,
    state: str,
    ts: str,
    order: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change-event stream into slowly-changing-dimension
    type-2 validity intervals: one row per (key, state run) with
    ``valid_from`` / ``valid_to`` (NULL = current). Consecutive events
    with the SAME state merge into one interval; only transitions open
    a new row.

    The warehouse-side complement of `snapshot_diff`: diff tells you
    WHAT changed between two snapshots, SCD2 tells you WHEN each state
    held, queryable with a plain BETWEEN (the as-of-join pattern,
    operators/asof.py).

    Scale shape: two windows over the SAME (key, ts) partitioning —
    Catalyst plans one shuffle + one sort for both (lag to flag
    transitions, running max to number runs) — then one (key, run)
    aggregate reusing that partitioning, and a lead window on the
    run-level rows (already collapsed, ≤ transitions per key) for
    valid_to. Per-key data never concentrates beyond its own events.

    ``order`` adds tie-break columns after ts for a total order
    (determinism with same-timestamp events).
    """
    ob = [F.col(ts)] + [F.col(c) for c in order]
    w = Window.partitionBy(key).orderBy(*ob)
    flagged = events.withColumn(
        "_new_run",
        F.when(
            F.lag(state).over(w).isNull()
            | (F.lag(state).over(w) != F.col(state)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_run",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(key, "_run").agg(
        F.min_by(F.col(state), F.struct(*ob)).alias(state),
        F.min(ts).alias("valid_from"),
    )
    w_runs = Window.partitionBy(key).orderBy("_run")
    return runs.select(
        key,
        state,
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
    )
