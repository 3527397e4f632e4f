"""Round-10 plan contracts, pinned: qd68's rewrite must never regress
to a single-partition corpus window, and q327's batch-hard join must
never regress to a cartesian/broadcast-nested-loop corpus product."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_qd68_no_single_partition_window(spark):
    """The bucketed trailing-median rewrite (VERDICT r9 item 2): every
    Window op partitions on the bucket key and the plan carries NO
    Exchange SinglePartition — the whole fact table never funnels
    through one task."""
    from graphsense_blocksci_spark.queries import qd68_whale_transfers

    plan = _executed_plan(qd68_whale_transfers(spark, SF))
    assert "Exchange SinglePartition" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            # a partitioned window spec lists its partition expressions
            # before the ORDER BY clause inside windowspecdefinition
            spec = line.split("windowspecdefinition(", 1)[1]
            head = spec.split("ASC", 1)[0].split("DESC", 1)[0]
            assert "," in head, f"unpartitioned window spec: {line.strip()}"


def test_q327_no_cartesian_product(spark):
    """Batch-hard mining self-joins on batch_id (equi join): the plan
    must contain no CartesianProduct and no BroadcastNestedLoopJoin —
    the corpus-product regression the first cut measured at 84x."""
    from graphsense_blocksci_spark.queries import q327_triplet_mining

    plan = _executed_plan(q327_triplet_mining(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q326_no_corpus_crossjoin(spark):
    """The MMR candidate stage rides cosine_topk_ivf_exact (VERDICT
    r10 item 2): queries meet the corpus only inside bound-surviving
    IVF cells (equi join on cell id), so the executed plan must carry
    no CartesianProduct and no BroadcastNestedLoopJoin anywhere —
    the quadratic queries x corpus relevance scan is gone."""
    from graphsense_blocksci_spark.queries import q326_mmr_rerank

    plan = _executed_plan(q326_mmr_rerank(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_exact_matches_bruteforce(spark):
    """cosine_topk_ivf_exact is cell-identical to brute force — same
    (neighbor_id, rank) rows and bitwise-equal cos_sim — because the
    residual-radius bound only prunes pairs that provably cannot
    reach the top-k and final scores use the same fixed-order fold."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_exact,
    )
    from graphsense_blocksci_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    cols = ["vec_id", "rank", "neighbor_id", "cos_sim"]
    bf = sorted(map(tuple, cosine_topk_bruteforce(emb, k=10, queries=qs)
                    .select(cols).collect()))
    iv = sorted(map(tuple, cosine_topk_ivf_exact(emb, k=10, queries=qs)
                    .select(cols).collect()))
    assert bf == iv


def test_q322_pair_window_is_nation_partitioned(spark):
    """The Theil-Sen rank window partitions on n_name (month-grain
    bounded pair frame), never globally."""
    from graphsense_blocksci_spark.queries import q322_theil_sen

    plan = _executed_plan(q322_theil_sen(spark, SF))
    assert "Exchange SinglePartition" not in plan


def test_global_rank_range_partitions_before_ranking(spark):
    """q323's three tile passes ride operators/windows.global_rank;
    pin the operator's own contract: the pre-checkpoint rank stage is
    RANGE-partitioned on the order key (partition-parallel sort) and
    its per-partition window partitions on _pid. (q323's end-to-end
    plan hides this behind the localCheckpoint boundary — its
    semantic pin is the native-ntile equality test; the remaining
    SinglePartition exchanges there are the documented <=P-row
    offset/count frames.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.sources.tables import load_table

    base = load_table(spark, SF, "orders").select("o_orderkey")
    ranged = base.repartitionByRange(8, "o_orderkey").withColumn(
        "_pid", F.spark_partition_id()
    )
    staged = ranged.withColumn(
        "_lrk",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy("o_orderkey")
        ),
    )
    plan = _executed_plan(staged)
    assert "rangepartitioning" in plan.lower()
    assert "Exchange SinglePartition" not in plan
