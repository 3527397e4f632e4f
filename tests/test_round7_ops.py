"""Round-7 hardening: the four ADVICE items from round 6 — SCC inner
non-convergence must raise (not silently split components), hits()
iteration-range guards, index-daemon cold-start detection narrowed to
PATH_NOT_FOUND, and the KS drift monitor's empty-reference guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# -- ADVICE high: SCC inner min-label loop must raise on exhaustion ---


def test_scc_inner_nonconvergence_raises(spark):
    """A directed cycle of diameter > max_rounds cannot converge the
    min-label propagation within max_rounds steps; the old code
    silently returned the under-propagated labels (splitting the one
    SCC into many) — now it must raise like the outer peel loop."""
    from graphsense_blocksci_spark.operators.graph import (
        strongly_connected_components,
    )

    n = 8
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        strongly_connected_components(e, max_rounds=3).collect()


def test_scc_cycle_converges_with_enough_rounds(spark):
    from graphsense_blocksci_spark.operators.graph import (
        strongly_connected_components,
    )

    n = 8
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    rows = strongly_connected_components(e).collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


# -- ADVICE low: hits() argument validation -----------------------


def test_hits_rejects_nonpositive_iterations(spark):
    from graphsense_blocksci_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations must be >= 1"):
        hits(e, iterations=0)
    with pytest.raises(ValueError, match="iterations must be >= 1"):
        hits(e, iterations=-3)


def test_hits_rejects_overflow_range(spark):
    from graphsense_blocksci_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="int64"):
        hits(e, iterations=17)


def test_hits_single_iteration_counts_degrees(spark):
    """After 1 iteration authority(v) = in-degree, hub(u) = sum of
    in-degrees of u's targets — checks the guard didn't break the
    minimum valid call."""
    from graphsense_blocksci_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(1, 3), (2, 3), (1, 4)], "src long, dst long"
    )
    got = {r["node"]: (r["authority"], r["hub"]) for r in hits(
        e, iterations=1
    ).collect()}
    assert got[3] == (2, 0)
    assert got[4] == (1, 0)
    assert got[1] == (0, 3)  # targets 3 (auth 2) + 4 (auth 1)
    assert got[2] == (0, 2)


# -- ADVICE medium: index daemon cold start narrowed ----------------


def test_read_or_empty_cold_start_only_on_missing_path(spark, tmp_path):
    from graphsense_blocksci_spark.streaming.index_daemon import (
        _read_or_empty,
    )

    missing = str(tmp_path / "never_written")
    df = _read_or_empty(spark, missing, "a long")
    assert df.count() == 0 and df.columns == ["a"]


def test_read_or_empty_propagates_non_missing_failures(spark, tmp_path):
    """A path that EXISTS but fails to read must raise, never return
    an empty frame — merge_batch overwrites the index with whatever
    this returns, so a swallowed transient error would be permanent
    history loss."""
    from py4j.protocol import Py4JJavaError

    from graphsense_blocksci_spark.streaming.index_daemon import (
        _read_or_empty,
    )

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    df = _read_or_empty(spark, str(corrupt), "a long")
    # plan-time read succeeds (path exists); the corruption surfaces
    # at action time as a failed job — NOT as silently-zero rows.
    with pytest.raises(Py4JJavaError):
        df.count()


def test_index_daemon_survives_corrupt_probe_without_overwrite(
    spark, tmp_path
):
    """End-to-end: fold a batch, corrupt the index dir, and check the
    next merge_batch raises instead of overwriting history."""
    from graphsense_blocksci_spark.streaming.index_daemon import (
        merge_batch,
    )

    outputs_dir = str(tmp_path / "outputs")
    index_dir = str(tmp_path / "index")
    tx_schema = (
        "tx_id long, block_id int, coinbase boolean,"
        " inputs array<struct<address:array<string>,value:long,"
        "address_type:int,spent_tx_id:long,spent_index:long>>,"
        " outputs array<struct<address:array<string>,value:long,"
        "address_type:int>>"
    )
    b1 = spark.createDataFrame(
        [
            (0, 0, True, [], [(["A"], 100, 0)]),
            (1, 1, False, [(["A"], 100, 0, 0, 0)], [(["B"], 60, 0)]),
        ],
        tx_schema,
    )
    merge_batch(spark, b1, outputs_dir, index_dir)
    before = spark.read.parquet(index_dir).count()
    assert before > 0

    # corrupt the index sink: replace parquet parts with garbage
    import pathlib

    idx = pathlib.Path(index_dir)
    # the sink is hive-partitioned (blk_bucket=N/part-*.parquet), so
    # the corruption must recurse into the partition dirs
    corrupted = 0
    for p in idx.glob("**/*.parquet"):
        p.write_bytes(b"garbage")
        corrupted += 1
    assert corrupted > 0
    b2 = spark.createDataFrame(
        [(2, 2, True, [], [(["C"], 25, 0)])], tx_schema
    )
    with pytest.raises(Exception) as excinfo:
        merge_batch(spark, b2, outputs_dir, index_dir)
    # the batch failed loudly — no silent overwrite happened
    assert "PATH_NOT_FOUND" not in str(excinfo.value)


# -- ADVICE low: KS drift empty-reference guard ---------------------


def test_ks_empty_reference_raises(spark):
    from graphsense_blocksci_spark.streaming.drift import (
        ks_against_reference,
    )

    wh = spark.createDataFrame(
        [("w1", 0, 5), ("w1", 1, 5)],
        "window_start string, cell int, cnt long",
    )
    empty_ref = spark.createDataFrame([], "cell int, cnt long")
    with pytest.raises(ValueError, match="no mass"):
        ks_against_reference(wh, empty_ref)


def test_ks_zero_mass_reference_raises(spark):
    from graphsense_blocksci_spark.streaming.drift import (
        ks_against_reference,
    )

    wh = spark.createDataFrame(
        [("w1", 0, 5)], "window_start string, cell int, cnt long"
    )
    zero_ref = spark.createDataFrame(
        [(0, 0), (1, 0)], "cell int, cnt long"
    )
    with pytest.raises(ValueError, match="no mass"):
        ks_against_reference(wh, zero_ref)


def test_ks_identical_distributions_zero_distance(spark):
    from graphsense_blocksci_spark.streaming.drift import (
        ks_against_reference,
    )

    wh = spark.createDataFrame(
        [("w1", 0, 3), ("w1", 1, 7)],
        "window_start string, cell int, cnt long",
    )
    ref = spark.createDataFrame([(0, 3), (1, 7)], "cell int, cnt long")
    r = ks_against_reference(wh, ref).collect()[0]
    assert r["d_scaled"] == 0 and r["ks_d"] == 0.0
