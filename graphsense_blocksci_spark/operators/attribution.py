"""Conversion attribution over event streams — which earlier touch
events (views, clicks) get credit for a conversion (purchase): the
classic first-touch / last-touch models, with the touch count for
linear credit. The analytics-warehouse workload that pairs with the
funnel (q127) and cohort (q128) operators.

Credit assignment is a per-user range join (touch in
[t_conv − lookback, t_conv]) followed by one aggregate per
conversion; first/last are min/max over the (ts, id) struct — a total
order, so ties on the timestamp break on the event id and the result
is deterministic across engines and retries (the same struct-ordered
min/max DuckDB evaluates).

Scale shape: both sides shuffle once on the user key; the join fans
out per user as |conversions| × |touches within the window| — bounded
by per-user activity, with the same skew discipline as the repo's
session/funnel operators (a bot user with millions of touches is a
salting candidate, and the lookback bound keeps the window finite).
No global windows, no driver state.

Reference parity: none — beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_conversions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback: int = 604800,
) -> DataFrame:
    """Attribute each conversion to its first and last preceding touch
    within ``lookback`` seconds. Conversions with no touch in the
    window are kept with NULL touch columns (the unattributed bucket
    every marketing report needs).

    Returns (conversion_id, user_id, t_conv, n_touches,
    first_touch_id, first_touch_ts, last_touch_id, last_touch_ts).
    """
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("long").alias("t"),
        F.col(type_col).alias("et"),
        F.col(id_col).cast("long").alias("eid"),
    )
    conv = base.filter(F.col("et") == conversion_type).select(
        "user_id",
        F.col("eid").alias("conversion_id"),
        F.col("t").alias("t_conv"),
    )
    touch = base.filter(F.col("et").isin(*touch_types)).select(
        "user_id",
        F.col("eid").alias("touch_id"),
        F.col("t").alias("t_touch"),
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("t_touch") <= F.col("t_conv"))
        & (F.col("t_touch") >= F.col("t_conv") - lookback)
    )
    credited = joined.groupBy("conversion_id", "user_id", "t_conv").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.min(F.struct("t_touch", "touch_id")).alias("_first"),
        F.max(F.struct("t_touch", "touch_id")).alias("_last"),
    )
    return (
        conv.join(
            credited.select(
                "conversion_id",
                "n_touches",
                F.col("_first.touch_id").alias("first_touch_id"),
                F.col("_first.t_touch").alias("first_touch_ts"),
                F.col("_last.touch_id").alias("last_touch_id"),
                F.col("_last.t_touch").alias("last_touch_ts"),
            ),
            "conversion_id",
            "left",
        )
        .select(
            "conversion_id",
            "user_id",
            "t_conv",
            F.coalesce(F.col("n_touches"), F.lit(0)).cast("long").alias(
                "n_touches"
            ),
            "first_touch_id",
            "first_touch_ts",
            "last_touch_id",
            "last_touch_ts",
        )
    )
