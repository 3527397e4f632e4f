"""As-of join (backward / forward / nearest), two physical strategies.

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
  ``merge_asof`` but fully distributed.

Directions (pandas `merge_asof` parity, property-tested):
- ``backward`` — latest right row with `right_on <= on` (default);
- ``forward``  — earliest right row with `right_on >= on`;
- ``nearest``  — whichever of the two is closer in time; exact ties
  prefer the backward match (pandas semantics). Composed as one
  backward + one forward pass, so it inherits the strategy's scale
  shape (two broadcast range-joins, or two keyed shuffles).

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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row per `direction`
    (optionally per `by` key).

    Left rows with no matching right row keep NULL value columns
    (left-join semantics). Exact timestamp ties are inclusive in both
    directions: a right row at exactly `left[on]` is visible.
    """
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c != right_on and c not in by]
    if strategy is None:
        strategy = "union" if by else "broadcast"
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, by, right_on, value_cols, suffix, strategy
        )
    if strategy == "broadcast":
        return _asof_broadcast(
            left, right, on, by, right_on, value_cols, suffix, direction
        )
    if strategy == "union":
        if not by:
            raise ValueError(
                "asof_join(strategy='union') with by=() puts the whole "
                "dataset in one window partition — use strategy='broadcast' "
                "(small right side) or provide `by` keys"
            )
        return _asof_union(
            left, right, on, by, right_on, value_cols, suffix, direction
        )
    raise ValueError(f"unknown asof strategy: {strategy!r}")


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str,
    value_cols: Sequence[str],
    suffix: str,
    direction: str,
) -> DataFrame:
    """Validity-interval broadcast join. Window only over the right side.

    backward: right row at t covers [t, next_t) — left rows in that
    interval see it. forward: right row at t covers (prev_t, t] — the
    earliest right row at-or-after the left time."""
    w = Window.partitionBy(*by).orderBy(F.col(right_on).asc())
    if direction == "backward":
        intervals = right.select(
            *by,
            F.col(right_on).alias("_valid_from"),
            F.lead(right_on).over(w).alias("_valid_to"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        cond = (F.col(on) >= F.col("_valid_from")) & (
            F.col("_valid_to").isNull() | (F.col(on) < F.col("_valid_to"))
        )
    else:  # forward
        intervals = right.select(
            *by,
            F.lag(right_on).over(w).alias("_valid_from"),
            F.col(right_on).alias("_valid_to"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        cond = (F.col(on) <= F.col("_valid_to")) & (
            F.col("_valid_from").isNull() | (F.col(on) > F.col("_valid_from"))
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
    direction: str,
) -> DataFrame:
    """Union + per-key window. One shuffle on (`by`, time).

    forward is the time-mirrored fill: descending order, so the carried
    value is the EARLIEST right row at-or-after each left row."""
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
    # right rows sort before left rows at the same timestamp (in either
    # direction), so an exact-tie right row is visible — inclusive ties.
    order = (
        [F.col("_t").asc(), F.col("_is_left").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_is_left").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_is_left") == 1).drop("_t", "_is_left")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str,
    value_cols: Sequence[str],
    suffix: str,
    strategy: str,
) -> DataFrame:
    """backward + forward pass, per-row pick of the closer match; exact
    ties prefer backward (pandas merge_asof semantics). The matched
    right time rides along as an internal value column so the distance
    compare needs no extra join."""
    # internal names chosen to be collision-proof against user columns
    sb, sf_ = "__asof_bwd", "__asof_fwd"
    mt = "__asof_rt"
    rt = right.withColumn(mt, F.col(right_on))
    vc = [*value_cols, mt]
    back = asof_join(
        left, rt, on, by, right_on, vc, sb, strategy, "backward"
    )
    both = asof_join(
        back, rt, on, by, right_on, vc, sf_, strategy, "forward"
    )
    fwd_wins = F.col(f"{mt}{sb}").isNull() | (
        F.col(f"{mt}{sf_}").isNotNull()
        & ((F.col(f"{mt}{sf_}") - F.col(on)) < (F.col(on) - F.col(f"{mt}{sb}")))
    )
    picked = both.select(
        *[both[c] for c in left.columns],
        *[
            F.when(fwd_wins, F.col(f"{c}{sf_}"))
            .otherwise(F.col(f"{c}{sb}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return picked
