"""Round-13 wave 6: the native streaming session_window twin (qd102)
— its watermark close rule, and how its closed set differs from the
custom stateful sessionizer's (qd18)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _run_native(spark, rows, gap="30 minutes"):
    work = tempfile.mkdtemp(prefix="t13w6_")
    ev = spark.createDataFrame(rows, "user_id long, ts_epoch long")
    ev.selectExpr(
        "user_id", "CAST(ts_epoch AS TIMESTAMP) AS ts"
    ).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema(
        "user_id long, ts timestamp"
    ).parquet(f"{work}/src")
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    q = (
        agg.select(
            "user_id",
            F.col("session_window.start").cast("long").alias("s"),
            F.col("session_window.end").cast("long").alias("e"),
            "n",
        )
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        tuple(r)
        for r in spark.read.schema("user_id long, s long, e long, n long")
        .parquet(f"{work}/out")
        .collect()
    )


def test_boundary_equality_emits(spark):
    """A window whose padded end EQUALS the watermark emits — the
    boundary rule qd102's oracle encodes."""
    got = _run_native(spark, [(1, 5000), (3, 3200)])
    # user 3's window [3200, 5000] has end == watermark (5000) → emits
    assert got == [(3, 3200, 5000, 1)]


def test_unclosed_windows_withheld(spark):
    got = _run_native(
        spark, [(1, 0), (1, 600), (1, 5000), (2, 100), (2, 3300)]
    )
    # [0,2400] and [100,1900] close (end ≤ 5000); [3300,5100] and
    # [5000,6800] are withheld in the state store
    assert got == [(1, 0, 2400, 2), (2, 100, 1900, 1)]


def test_qd102_closed_set_vs_qd18(spark):
    """The two operators' closed sets differ EXACTLY as documented:
    qd18 (custom stateful) withholds every user's final session;
    qd102 (native watermark) withholds only sessions whose padded
    end exceeds the global max event time. On the same table, the
    native set must therefore equal full batch sessionization minus
    the watermark-open tail, and contain every qd18 session whose
    padded end clears the watermark."""
    from graphsense_blocksci_spark.queries import (
        qd18_stateful_sessions,
        qd102_native_session_stream,
    )
    from graphsense_blocksci_spark.sources.tables import load_table

    native = {
        (r["user_id"], r["session_start"], r["window_end"], r["n_events"])
        for r in qd102_native_session_stream(spark, SF).collect()
    }
    custom = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"] + 1800,
            r["n_events"],
        )
        for r in qd18_stateful_sessions(spark, SF).collect()
    }
    max_ts = (
        load_table(spark, SF, "events")
        .agg(F.max(F.col("ts").cast("timestamp").cast("long")))
        .first()[0]
    )
    # every custom-closed session that clears the watermark is in the
    # native set
    assert {t for t in custom if t[2] <= max_ts} <= native
    # sessions native closes but custom withholds are exactly final
    # sessions cleared by the watermark — all end ≤ max_ts
    extra = native - custom
    assert all(t[2] <= max_ts for t in native)
    assert extra, "watermark must close some final sessions"
