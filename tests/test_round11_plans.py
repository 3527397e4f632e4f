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


def test_qd92_no_interval_cross_join(spark):
    """HODL waves must build the daily series from banded delta
    events + a day-grain running sum — never the day × UTXO interval
    join the oracle uses. The only nested-loop joins allowed are the
    repo's 1-row scalar-broadcast pattern (the horizon min/max frame
    and the 4-row band-name frame): no CartesianProduct, and no BNLJ
    may join two non-aggregate sides (every BNLJ build side must be
    an aggregate-derived or literal frame)."""
    from graphsense_blocksci_spark.queries import qd92_hodl_waves

    df = qd92_hodl_waves(spark, SF)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan
    # walk the tree: every BNLJ's build (right) side must be a tiny
    # bounded frame — a HashAggregate (the 1-row horizon min/max) or
    # a LocalTableScan (the literal band list)
    jplan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.nodeName()
        if "BroadcastNestedLoopJoin" in name:
            right = node.children().last()
            rs = right.toString()
            assert (
                "HashAggregate" in rs or "LocalTableScan" in rs
            ), f"BNLJ over a non-bounded side:\n{rs[:500]}"
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(jplan)


def test_q330_first_occurrence_window_partitions_on_hash(spark):
    """Paragraph dedup's first-occurrence window partitions on the
    uniform md5 paragraph hash — no single-partition funnel."""
    from graphsense_blocksci_spark.queries import q330_paragraph_dedup

    plan = _executed_plan(q330_paragraph_dedup(spark, SF))
    assert "Exchange SinglePartition" not in plan


def test_q329_pii_scan_is_projection_only(spark):
    """The PII scan must be pure JVM projections into one hash
    aggregate: no join, no window, no UDF in the plan."""
    from graphsense_blocksci_spark.queries import q329_pii_redaction

    plan = _executed_plan(q329_pii_redaction(spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_q335_rank_rides_global_rank_not_cluster_window(spark, monkeypatch):
    """q335's per-cluster p90 rank must come from ONE global_rank pass
    over the composite (cluster_id, dist_sq, vec_id) order — a
    cluster_id-partitioned window would make k=10 corpus/10-sized
    single-task partitions (the qd68 trap). Same spy walk as q323's."""
    from graphsense_blocksci_spark.operators import windows as W

    calls = []
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
    from graphsense_blocksci_spark.queries import q335_embedding_outliers

    assert q335_embedding_outliers(spark, SF).count() > 0
    assert len(calls) == 1
    cols, plan = calls[0]
    assert cols == ("cluster_id", "dist_sq", "vec_id")
    assert "rangepartitioning" in plan.lower()
    assert "Exchange SinglePartition" not in plan


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
