"""As-of join (backward-inclusive), two physical strategies.

The reference declares an `exchange_rates(date, fiat_values)` table
(schema.cql:58-61) that downstream components join against transaction
timestamps — an equality join on calendar date, with "most recent rate at
or before" as the robust general form. Spark has no native as-of join;
this implements it twice and picks the right plan for the shape:

- ``strategy="broadcast"`` (default when `by` is empty): turn the right
  side into validity intervals `[t, next_t)` via one window over the
  (small) right side, broadcast it, and range-join. The only window runs
  over the RIGHT side, which must be broadcast-small (a daily rate series
  is ~365 rows/year — trivially so). The big left side is never shuffled.
  This is the 100 TB-safe plan for the exchange-rates use case: the
  previous union+window form put the entire left side in ONE partition
  when `by=()` — an OOM at scale, not a plan.

- ``strategy="union"`` (default when `by` is non-empty): tag both sides,
  union on the time axis, `last(ignorenulls)` window per `by` key, keep
  left rows. One shuffle on (`by`, time); parallel over keys; survives a
  large right side (e.g. per-entity tick data). Equivalent to pandas
  ``merge_asof(direction='backward')`` but fully distributed.

Right rows must be unique per (`by`, `right_on`); pre-dedup with
`dedup_last_write_wins` if they are not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    strategy: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` (optionally per `by` key).

    Left rows with no matching right row keep NULL value columns
    (left-join semantics). Exact timestamp ties are backward-inclusive:
    a right row at exactly `left[on]` is visible.
    """
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c != right_on and c not in by]
    if strategy is None:
        strategy = "union" if by else "broadcast"
    if strategy == "broadcast":
        return _asof_broadcast(left, right, on, by, right_on, value_cols, suffix)
    if strategy == "union":
        if not by:
            raise ValueError(
                "asof_join(strategy='union') with by=() puts the whole "
                "dataset in one window partition — use strategy='broadcast' "
                "(small right side) or provide `by` keys"
            )
        return _asof_union(left, right, on, by, right_on, value_cols, suffix)
    raise ValueError(f"unknown asof strategy: {strategy!r}")


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str,
    value_cols: Sequence[str],
    suffix: str,
) -> DataFrame:
    """Validity-interval broadcast join. Window only over the right side."""
    w = Window.partitionBy(*by).orderBy(F.col(right_on).asc())
    intervals = right.select(
        *by,
        F.col(right_on).alias("_valid_from"),
        F.lead(right_on).over(w).alias("_valid_to"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    cond = (F.col(on) >= F.col("_valid_from")) & (
        F.col("_valid_to").isNull() | (F.col(on) < F.col("_valid_to"))
    )
    for k in by:
        cond = cond & (left[k] == intervals[k])
    joined = left.join(F.broadcast(intervals), cond, "left")
    keep = [left[c] for c in left.columns] + [
        F.col(f"{c}{suffix}") for c in value_cols
    ]
    return joined.select(*keep)


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str,
    value_cols: Sequence[str],
    suffix: str,
) -> DataFrame:
    """Union + per-key window. One shuffle on (`by`, time)."""
    lt = left.withColumn("_t", F.col(on)).withColumn("_is_left", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *by,
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    rt = rt.select(*lt.columns)

    unioned = lt.unionByName(rt)
    # right rows sort before left rows at the same timestamp, so an
    # exact-tie right row is visible to the left row (backward-inclusive).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_is_left") == 1).drop("_t", "_is_left")
