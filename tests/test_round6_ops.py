"""Round-6 additions: streaming top-N+OTHERS (exact + Misra-Gries
capacity regimes), the streaming drift monitor's KS arithmetic, and
the address/entity transaction inverted indexes."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _stream_topn(spark, tmp_path, rows, n=2, capacity=None, n_files=1):
    """Stage rows as n_files parquet files, run topn_others_stream
    availableNow with maxFilesPerTrigger=1, return the final snapshot
    (max seq per group) as a pandas frame."""
    from graphsense_blocksci_spark.streaming.topn import topn_others_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(rows, "grp string, item long, cents long")
    df.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("grp string, item long, cents long")
    stream = (
        stream.option("maxFilesPerTrigger", 1).parquet(src)
        if n_files > 1
        else stream.parquet(src)
    )
    q = (
        topn_others_stream(stream, "grp", "item", "cents", n=n, capacity=capacity)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = spark.read.schema(
        "group string, who string, n_members long, n_rows long,"
        " sum_value long, seq long"
    ).parquet(out)
    w = Window.partitionBy("group")
    return (
        snap.withColumn("_mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("_mx"))
        .drop("_mx")
        .toPandas()
    )


def _batch_rollup(rows, n=2):
    """Exact batch top-N + OTHERS reference in pandas."""
    df = pd.DataFrame(rows, columns=["grp", "item", "cents"])
    per = df.groupby(["grp", "item"]).agg(
        cents=("cents", "sum"), rows=("cents", "size")
    )
    out = {}
    for grp, sub in per.groupby(level=0):
        sub = sub.reset_index()
        sub = sub.sort_values(["cents", "item"], ascending=[False, True])
        top = sub.iloc[:n]
        rest = sub.iloc[n:]
        out[grp] = {
            str(r.item): (1, int(r.rows), int(r.cents))
            for r in top.itertuples()
        }
        if len(rest):
            out[grp]["OTHERS"] = (
                len(rest),
                int(rest["rows"].sum()),
                int(rest["cents"].sum()),
            )
    return out


def test_topn_stream_exact_multibatch_matches_batch(spark, tmp_path):
    """Across MULTIPLE micro-batches in exact mode, the final snapshot
    must equal the batch rollup — running sums fold order-free."""
    rows = [
        ("a", i % 7, 100 * (i % 7) + i % 3) for i in range(200)
    ] + [("b", i % 4, 50 + i % 5) for i in range(100)]
    got = _stream_topn(spark, tmp_path, rows, n=2, capacity=None, n_files=4)
    want = _batch_rollup(rows, n=2)
    for r in got.itertuples():
        m, nr, sv = want[r.group][r.who]
        assert (r.n_members, r.n_rows, r.sum_value) == (m, nr, sv), r
    assert len(got) == sum(len(v) for v in want.values())


def test_topn_stream_capacity_keeps_true_heavy_items(spark, tmp_path):
    """Misra-Gries regime: with capacity k, any item holding > 1/k of
    the group's value mass must survive in state and appear in top-N;
    the OTHERS row's n_rows/sum_value must keep ALL evicted mass (the
    rollup's group totals stay exact)."""
    # one dominant item (60% of mass) + 30 tiny items, adversarially
    # interleaved so eviction pressure fires every batch
    rows = []
    for i in range(300):
        rows.append(("g", 999, 200))  # dominant: 60_000 total
    for i in range(30):
        for _ in range(10):
            rows.append(("g", i, 100))  # each 1_000; total 30_000
    got = _stream_topn(spark, tmp_path, rows, n=1, capacity=8, n_files=5)
    top = got[got.who == "999"]
    assert len(top) == 1, "dominant item must survive MG eviction"
    # undercount bounded: kept value >= true - evicted floor, and the
    # group totals (identity + OTHERS) are exactly preserved
    assert int(top.n_rows.iloc[0]) == 300
    total_value = int(got.sum_value.sum())
    total_rows = int(got.n_rows.sum())
    assert total_value == 60_000 + 30_000
    assert total_rows == 300 + 300


def test_topn_stream_numeric_tiebreak(spark, tmp_path):
    """Equal running values tie-break by NUMERIC item id ascending
    (the batch rollup's long-typed order), not string order: 9 < 10
    numerically but '9' > '10' as strings — the numeric order must
    pick {9, 10} over {10, 11} and over the string order."""
    rows = [("g", 9, 100), ("g", 10, 100), ("g", 11, 100)]
    got = _stream_topn(spark, tmp_path, rows, n=2, capacity=None)
    assert sorted(got[got.who != "OTHERS"].who) == ["10", "9"]
    assert got[got.who == "OTHERS"].n_members.iloc[0] == 1


def test_ks_against_reference_cells_missing_from_window(spark):
    """A reference cell ABSENT from a window must still step that
    window's reference CDF — the sup evaluated there catches
    'window never saw these values' drift. Hand-computed: window has
    10 rows all in cell 0; reference is 10 rows in cell 0 + 10 in
    cell 5. D = |10*20 - 10*10| = 100 -> ks = 100/200 = 0.5."""
    from graphsense_blocksci_spark.streaming.drift import ks_against_reference

    wh = spark.createDataFrame(
        [Row(window_start="2024-01-01", cell=0, cnt=10)]
    ).select(
        F.col("window_start").cast("timestamp").alias("window_start"),
        "cell",
        "cnt",
    )
    ref = spark.createDataFrame(
        [Row(cell=0, cnt=10), Row(cell=5, cnt=10)]
    )
    out = ks_against_reference(wh, ref).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_window, r.n_ref, r.d_scaled) == (10, 20, 100)
    assert r.ks_d == pytest.approx(0.5)


def test_ks_identical_distributions_zero(spark):
    from graphsense_blocksci_spark.streaming.drift import ks_against_reference

    wh = spark.createDataFrame(
        [
            Row(window_start="2024-01-01", cell=c, cnt=5)
            for c in range(4)
        ]
    ).select(
        F.col("window_start").cast("timestamp").alias("window_start"),
        "cell",
        "cnt",
    )
    ref = spark.createDataFrame([Row(cell=c, cnt=50) for c in range(4)])
    r = ks_against_reference(wh, ref).collect()[0]
    assert r.d_scaled == 0 and r.ks_d == 0.0


def test_address_transactions_index(spark):
    """Hand-built 3-tx chain: coinbase pays A; tx1 spends it to B and
    back to A (change); tx2 spends A's change to B. Checks directional
    splits, net values, and the (block, tx) ordering index."""
    from graphsense_blocksci_spark.operators.linkage import (
        address_transactions,
    )

    txs = spark.createDataFrame(
        [
            Row(
                tx_id=0,
                block_id=0,
                coinbase=True,
                inputs=[],
                outputs=[
                    Row(address=["A"], value=100, address_type=0),
                ],
            ),
            Row(
                tx_id=1,
                block_id=1,
                coinbase=False,
                inputs=[
                    Row(
                        address=["A"],
                        value=100,
                        address_type=0,
                        spent_tx_id=0,
                        spent_index=0,
                    )
                ],
                outputs=[
                    Row(address=["B"], value=60, address_type=0),
                    Row(address=["A"], value=40, address_type=0),
                ],
            ),
            Row(
                tx_id=2,
                block_id=2,
                coinbase=False,
                inputs=[
                    Row(
                        address=["A"],
                        value=40,
                        address_type=0,
                        spent_tx_id=1,
                        spent_index=1,
                    )
                ],
                outputs=[
                    Row(address=["B"], value=40, address_type=0),
                ],
            ),
        ],
        schema=(
            "tx_id long, block_id int, coinbase boolean,"
            " inputs array<struct<address:array<string>,value:long,"
            "address_type:int,spent_tx_id:long,spent_index:long>>,"
            " outputs array<struct<address:array<string>,value:long,"
            "address_type:int>>"
        ),
    )
    got = {
        (r.addr, r.tx_id): r
        for r in address_transactions(txs).collect()
    }
    # A: receives 100 in tx0 (seq 1), spends 100 / receives 40 in tx1
    # (seq 2, net -60), spends 40 in tx2 (seq 3, net -40)
    assert got[("A", 0)].net_value == 100 and got[("A", 0)].tx_seq == 1
    a1 = got[("A", 1)]
    assert (a1.received_value, a1.spent_value, a1.net_value) == (40, 100, -60)
    assert a1.tx_seq == 2
    a2 = got[("A", 2)]
    assert (a2.received_value, a2.spent_value, a2.net_value) == (0, 40, -40)
    assert a2.tx_seq == 3
    # B: receives in tx1 (seq 1) and tx2 (seq 2), never spends
    assert got[("B", 1)].net_value == 60 and got[("B", 1)].tx_seq == 1
    assert got[("B", 2)].net_value == 40 and got[("B", 2)].tx_seq == 2
    assert len(got) == 5


def test_hits_hand_graph(spark):
    """Hand graph: 1->3, 2->3, 3->4. h0=1 everywhere.
    a1: 3 gets 2 (from 1,2), 4 gets 1.   h1: 1,2 get a1(3)=2; 3 gets a1(4)=1.
    a2: 3 gets h1(1)+h1(2)=4, 4 gets h1(3)=1. h2: 1,2 get 4; 3 gets 1."""
    from graphsense_blocksci_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r.node: (r.authority, r.hub) for r in hits(e, iterations=2).collect()}
    assert got == {1: (0, 4), 2: (0, 4), 3: (4, 1), 4: (1, 0)}


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: hub (deg k) attaches
    only to leaves (deg 1) -> r = -1."""
    import graphsense_blocksci_spark.queries as Q

    # build directly from the sufficient-statistic formula on a star
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "u long, v long"
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    p = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("dx")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dy")), "v")
    )
    r = p.agg(
        (
            (F.count(F.lit(1)) * F.sum(F.col("dx") * F.col("dy"))
             - F.sum("dx") * F.sum("dx")).cast("double")
            / (F.count(F.lit(1)) * F.sum(F.col("dx") * F.col("dx"))
               - F.sum("dx") * F.sum("dx")).cast("double")
        ).alias("r")
    ).first().r
    assert r == pytest.approx(-1.0)


def test_containment_join_asymmetric(spark):
    """Doc B contains all of doc A's shingles (plus many more): the
    (A,B) direction qualifies at 0.8, the (B,A) direction does not,
    and symmetric Jaccard would reject both."""
    from graphsense_blocksci_spark.operators.setsim import containment_join

    a_set = list(range(10))
    b_set = list(range(50))  # superset of a
    c_set = list(range(100, 140))  # disjoint
    docs = spark.createDataFrame(
        [(1, a_set), (2, b_set), (3, c_set)],
        "doc_id long, gs array<long>",
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.containment)
        for r in containment_join(docs, "doc_id", "gs", threshold_pct=80).collect()
    }
    assert got == {(1, 2): (10, 1.0)}
    # jaccard(A,B) = 10/50 = 0.2 — the symmetric join would reject


def test_global_rank_matches_single_task_window(spark):
    """The distributed two-pass rank must equal the single-task
    row_number().over(orderBy) exactly, including across range
    boundaries and ties (total order includes the id tiebreak)."""
    from graphsense_blocksci_spark.operators.windows import global_rank

    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 37).alias("x"),  # heavy ties
    )
    got = {
        r.id: r.rank
        for r in global_rank(df, ["x", "id"], num_partitions=7).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("x", "id"))
        ).collect()
    }
    assert got == want


def test_scc_direction_sensitivity(spark):
    """Two 2-cycles bridged one-way plus a dangling tail: SCC must
    keep {1,2} and {3,4} separate (the bridge 2->3 has no return)
    and leave 5 a singleton; undirected CC would merge everything."""
    from graphsense_blocksci_spark.operators.graph import (
        strongly_connected_components,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5)],
        "src long, dst long",
    )
    got = {
        r.node: r.component
        for r in strongly_connected_components(e).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5}


def test_index_daemon_batch_replay_idempotent(spark, tmp_path):
    """A batch replayed after a crash between the outputs append and
    the index write must leave the index EXACTLY as a single run
    would — the distinct() on the outputs read absorbs the duplicate
    append (effectively-once by idempotent read)."""
    from graphsense_blocksci_spark.operators.linkage import (
        address_transactions,
    )
    from graphsense_blocksci_spark.streaming.index_daemon import (
        merge_batch,
        read_index,
    )

    txs = spark.createDataFrame(
        [
            (0, 0, True, [], [(["A"], 100, 0)]),
            (
                1,
                1,
                False,
                [(["A"], 100, 0, 0, 0)],
                [(["B"], 60, 0), (["A"], 40, 0)],
            ),
        ],
        "tx_id long, block_id int, coinbase boolean,"
        " inputs array<struct<address:array<string>,value:long,"
        "address_type:int,spent_tx_id:long,spent_index:long>>,"
        " outputs array<struct<address:array<string>,value:long,"
        "address_type:int>>",
    )
    out_dir = str(tmp_path / "outputs")
    idx_dir = str(tmp_path / "index")
    merge_batch(spark, txs, out_dir, idx_dir)
    once = sorted(map(tuple, read_index(spark, idx_dir).collect()))
    # crash-replay: the SAME batch folds again (outputs re-append)
    merge_batch(spark, txs, out_dir, idx_dir)
    twice = sorted(map(tuple, read_index(spark, idx_dir).collect()))
    want = sorted(map(tuple, address_transactions(txs).collect()))
    assert once == want
    assert twice == want
