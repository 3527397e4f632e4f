"""Round-11 plan contracts: q323's three global_rank passes pinned
END-TO-END (VERDICT r10 item 8 — the operator-level pin stopped at the
localCheckpoint boundary), by spying on the operator at its call sites
inside the registered query and walking each invocation's rank-stage
executed plan."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q323_three_global_rank_passes_end_to_end(spark, monkeypatch):
    """q323 must rank via EXACTLY three global_rank invocations (one
    per RFM metric), and each invocation's pre-checkpoint rank stage —
    rebuilt verbatim from the operator's recipe on the ACTUAL input
    frame q323 passes — must be range-partitioned on the order key
    with no Exchange SinglePartition. This walks the contract across
    the localCheckpoint boundary the end-to-end plan string hides."""
    from graphsense_blocksci_spark.operators import windows as W

    calls: list[tuple[tuple[str, ...], str]] = []
    orig = W.global_rank

    def spy(df, order_cols, rank_col="rank", num_partitions=32):
        cols = list(order_cols)
        staged = (
            df.repartitionByRange(num_partitions, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .withColumn(
                "_lrk",
                F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
            )
        )
        calls.append((tuple(cols), _executed_plan(staged)))
        return orig(df, order_cols, rank_col, num_partitions)

    monkeypatch.setattr(W, "global_rank", spy)
    from graphsense_blocksci_spark.queries import q323_rfm_segmentation

    result = q323_rfm_segmentation(spark, SF)
    assert result.count() > 0

    assert len(calls) == 3, f"expected 3 global_rank passes, saw {len(calls)}"
    keys = [cols for cols, _ in calls]
    # one pass per RFM metric, custkey tiebreak making the order total
    assert all(cols[-1] == "o_custkey" for cols in keys)
    metrics = {cols[0] for cols in keys}
    assert metrics == {"recency_days", "neg_freq", "neg_monetary"}
    for cols, plan in calls:
        low = plan.lower()
        assert "rangepartitioning" in low, f"rank pass {cols} not ranged"
        assert "Exchange SinglePartition" not in plan, (
            f"rank pass {cols} funnels through one task"
        )
