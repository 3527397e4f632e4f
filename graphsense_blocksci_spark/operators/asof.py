"""As-of join.

The reference declares an `exchange_rates(date, fiat_values)` table
(schema.cql:58-61) that downstream components join against transaction
timestamps — an equality join on calendar date, with "most recent rate at
or before" as the robust general form. Spark has no native as-of join;
this implements it as union + window (one shuffle, no range explosion),
the composition recommended for sparse right sides.

Algorithm: tag both sides, union on the time axis, window
last_value(ignorenulls) ordered by (time, tag) per partition key, keep
left rows. Equivalent to pandas merge_asof(direction='backward') but
fully distributed.
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
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` (optionally per `by` key).

    Scales: one shuffle on (`by`, time); no cross/range join. For a
    small right side a broadcast variant would also work, but this form
    survives a large right side (e.g. per-entity tick data).
    """
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c != right_on and c not in by]

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
