"""Round-13 optimization tests: scale-adaptive static-frame layout for
iterative graph operators (guide §2.4 — remove the per-round shuffle of
a static frame by pre-partitioning it on the join key and persisting,
which keeps the partitioning under AQE where localCheckpoint does not).

Two contracts:
- the pre-partitioned (cluster-scale) path returns the SAME ranks as the
  default local path — partitioning only reorders float summation;
- the mechanism itself: a persisted repartition(k, key) frame joins on
  that key with no Exchange above its InMemoryTableScan, while the same
  frame localCheckpointed DOES get re-exchanged (why persist was chosen).
"""

from __future__ import annotations

import pyspark.sql.functions as F


EDGES = [
    (1, 2),
    (2, 3),
    (3, 1),
    (3, 4),
    (4, 4),
    (5, 1),
    (6, 2),
    (6, 7),
    (7, 6),
]


def _rank_map(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_prepartitioned_path_matches_default(spark, monkeypatch):
    """Forcing the pre-partitioned static-frame path (threshold 1) must
    reproduce the default path's ranks exactly up to float summation
    order — same nodes, same values within 1e-12."""
    from graphsense_blocksci_spark.operators import graph

    df = spark.createDataFrame(EDGES, "src: long, dst: long")
    base = _rank_map(graph.pagerank(df, iterations=8))
    monkeypatch.setattr(graph, "_PREPARTITION_MIN_NODES", 1)
    pp = _rank_map(graph.pagerank(df, iterations=8))
    assert set(base) == set(pp)
    for node, r in base.items():
        assert abs(r - pp[node]) < 1e-12, node
    assert abs(sum(pp.values()) - 1.0) < 1e-9


def test_personalized_pagerank_prepartitioned_path_matches_default(
    spark, monkeypatch
):
    from graphsense_blocksci_spark.operators import graph

    df = spark.createDataFrame(EDGES, "src: long, dst: long")
    seeds = spark.createDataFrame([(1,), (6,)], "node: long")
    base = _rank_map(graph.pagerank(df, iterations=8, seeds=seeds))
    monkeypatch.setattr(graph, "_PREPARTITION_MIN_NODES", 1)
    pp = _rank_map(graph.pagerank(df, iterations=8, seeds=seeds))
    assert set(base) == set(pp)
    for node, r in base.items():
        assert abs(r - pp[node]) < 1e-12, node
    assert abs(sum(pp.values()) - 1.0) < 1e-9


def test_static_pin_profile_matches_default_across_operators(spark, monkeypatch):
    """With the cluster profile forced on
    (spark.graphsense.prepartitionStatic via its env fallback), every
    operator that pins its loop-static frame must return EXACTLY the
    rows of the default local path — these are integer/exact-label
    frames, so set equality is the contract."""
    from graphsense_blocksci_spark.operators import graph

    edges = spark.createDataFrame(EDGES, "src: long, dst: long")
    seeds = spark.createDataFrame([(1,), (6,)], "node: long")
    wedges = spark.createDataFrame(
        [(u, v, (u * 7 + v) % 5 + 1) for u, v in EDGES],
        "src: long, dst: long, w: long",
    )

    def snap():
        return {
            "bfs": {
                (r["node"], r["hops"])
                for r in graph.bfs_reachability(edges, seeds, 4).collect()
            },
            "msbfs": {
                (r["source"], r["node"], r["hops"])
                for r in graph.multi_source_bfs(edges, seeds, 4).collect()
            },
            "paths": {
                (r["source"], r["node"], r["dist"], r["sigma"])
                for r in graph.bfs_path_counts(edges, seeds, 4).collect()
            },
            "sp": {
                (r["node"], r["dist"])
                for r in graph.shortest_paths(wedges, seeds, 4).collect()
            },
            "lpa": {
                (r["node"], r["label"])
                for r in graph.label_propagation(edges, iterations=3).collect()
            },
            "walks": {
                (r["seed"], r["walk_id"], r["path"])
                for r in graph.random_walks(edges, seeds, 4).collect()
            },
            "scc": {
                (r["node"], r["component"])
                for r in graph.strongly_connected_components(edges).collect()
            },
            "btw": {
                (r["node"], round(r["betweenness"], 9))
                for r in graph.betweenness_sampled(edges, seeds, 3).collect()
            },
        }

    base = snap()
    monkeypatch.setenv("SPARK_GRAFT_PREPARTITION_STATIC", "1")
    pinned = snap()
    for key in base:
        assert base[key] == pinned[key], key


def test_persisted_repartition_keeps_partitioning_under_aqe(spark):
    """The mechanism the scale path relies on: under AQE, a persisted
    repartition(k, key) frame satisfies a same-key join's distribution
    requirement (no Exchange above its InMemoryTableScan), while the
    same frame localCheckpointed loses its partitioning and is
    re-exchanged. Pinned so a Spark upgrade that changes either
    behavior fails loudly instead of silently re-adding (or silently
    relying on) a per-round shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        prev_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(0, 2000).select(
            (F.col("id") % 97).alias("k"), F.col("id").alias("payload")
        )
        other = spark.range(0, 97).select(F.col("id").alias("k"))

        cached = big.repartition(8, "k").persist()
        cached.count()
        try:
            import re

            def _without_cached_setup(plan: str) -> str:
                """Drop the InMemoryRelation's EMBEDDED one-time setup
                plan (it prints its own Exchange twice under AQE) so
                exchange counts below see only the join's own plan —
                independent of which side the printer puts first."""
                out: list[str] = []
                skip_deeper_than: int | None = None
                for ln in plan.splitlines():
                    body_col = next(
                        (i for i, ch in enumerate(ln) if ch not in " :+-"),
                        len(ln),
                    )
                    if skip_deeper_than is not None:
                        if body_col > skip_deeper_than:
                            continue
                        skip_deeper_than = None
                    out.append(ln)
                    if "InMemoryRelation" in ln:
                        skip_deeper_than = ln.find("InMemoryRelation")
                return "\n".join(out)

            plan_cached = (
                cached.join(other.repartition(8, "k"), "k")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # Structural (join-side-order-independent) form: outside the
            # relation's embedded setup plan, the ONLY hashpartitioning
            # exchange is `other`'s explicit repartition — the cached
            # side satisfies the join's distribution from its
            # InMemoryTableScan with no re-exchange.
            _ex = r"Exchange hashpartitioning\(k#"
            assert "InMemoryTableScan" in plan_cached, plan_cached
            assert (
                len(re.findall(_ex, _without_cached_setup(plan_cached))) == 1
            ), plan_cached

            ckpt = big.repartition(8, "k").localCheckpoint(eager=True)
            plan_ckpt = (
                ckpt.join(other.repartition(8, "k"), "k")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # the checkpointed side LOSES its partitioning: its scan is
            # re-exchanged on top of `other`'s explicit repartition
            assert "Scan ExistingRDD" in plan_ckpt, plan_ckpt
            assert len(re.findall(_ex, plan_ckpt)) == 2, plan_ckpt
        finally:
            cached.unpersist(True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
