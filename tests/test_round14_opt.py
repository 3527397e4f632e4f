"""Round-14 optimization pins: prepartition gate semantics and the
hits materialize-and-release pin."""
from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators import graph


def _toy_edges(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 1)],
        ["src", "dst"],
    )


def test_prepartition_false_is_a_hard_veto(spark, monkeypatch):
    """An explicit 'false' conf/env must disable pinning even when the
    caller's adaptive decision says pin (ADVICE r13: previously the
    adaptive OR made 'false' unspellable)."""
    df = spark.range(0, 100).select((F.col("id") % 7).alias("k"), "id")

    monkeypatch.setenv("SPARK_GRAFT_PREPARTITION_STATIC", "false")
    out, pins = graph._pin_static(df, "k", local=None, adaptive=True)
    assert pins == []

    monkeypatch.setenv("SPARK_GRAFT_PREPARTITION_STATIC", "true")
    out, pins = graph._pin_static(df, "k", local=None, adaptive=False)
    assert len(pins) == 1
    for p in pins:
        p.unpersist(True)

    # unset -> the adaptive decision governs
    monkeypatch.delenv("SPARK_GRAFT_PREPARTITION_STATIC", raising=False)
    out, pins = graph._pin_static(df, "k", local=None, adaptive=True)
    assert len(pins) == 1
    for p in pins:
        p.unpersist(True)
    out, pins = graph._pin_static(df, "k", local=None, adaptive=False)
    assert pins == []


def test_pagerank_min_nodes_zero_disables_adaptive(spark, monkeypatch):
    """SPARK_GRAFT_PREPARTITION_MIN_NODES <= 0 must mean 'adaptive path
    disabled', not 'pin every graph' (ADVICE r13). Ranks are identical
    either way; this pins the decision wiring via the module constant."""
    monkeypatch.setattr(graph, "_PREPARTITION_MIN_NODES", 0)
    monkeypatch.delenv("SPARK_GRAFT_PREPARTITION_STATIC", raising=False)
    edges = _toy_edges(spark)
    base = {
        (r["node"], round(r["rank"], 12))
        for r in graph.pagerank(edges, iterations=3).collect()
    }
    # threshold 1 -> adaptive pin engages on this 6-node graph
    monkeypatch.setattr(graph, "_PREPARTITION_MIN_NODES", 1)
    pinned = {
        (r["node"], round(r["rank"], 12))
        for r in graph.pagerank(edges, iterations=3).collect()
    }
    assert base == pinned


def test_hits_pin_parity_and_release(spark, monkeypatch):
    """hits under the forced cluster profile must return the exact
    integer scores of the lazy local path, and must leave no persisted
    frames behind (materialize-and-release)."""
    edges = _toy_edges(spark)
    base = {
        (r["node"], r["authority"], r["hub"])
        for r in graph.hits(edges, iterations=2).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_PREPARTITION_STATIC", "1")
    pinned_df = graph.hits(edges, iterations=2)
    pinned = {
        (r["node"], r["authority"], r["hub"]) for r in pinned_df.collect()
    }
    assert base == pinned
    # the operator released its pins before returning: DataFrame.persist
    # registers in the SQL CacheManager (localCheckpoint RDDs do not),
    # so a released pin leaves the cache manager empty
    assert (
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    ), "hits leaked persisted frames"
