"""Contract tests for the gated Cassandra sink (sources/sinks.py).

The connector jars are absent from this image, so the live round-trip
(the reference's actual sink, blocksci_export.py:113-149 /
schema.cql:6-75) cannot run here. These tests pin the interface
instead: the classpath gate answers honestly on both branches, the
unavailable branch fails fast with routing advice, and the available
branch plumbs the exact (format, keyspace, table, mode) contract the
Spark-Cassandra connector expects.
"""

from __future__ import annotations

import pytest

from graphsense_blocksci_spark.sources import sinks


class _RecordingWriter:
    def __init__(self, calls: dict):
        self._calls = calls

    def format(self, fmt: str):
        self._calls["format"] = fmt
        return self

    def options(self, **kw):
        self._calls.setdefault("options", {}).update(kw)
        return self

    def mode(self, mode: str):
        self._calls["mode"] = mode
        return self

    def save(self):
        self._calls["saved"] = True


class _RecordingDF:
    """Just enough DataFrame surface for write_cassandra."""

    def __init__(self, spark):
        self.sparkSession = spark
        self.calls: dict = {}
        self.write = _RecordingWriter(self.calls)


def test_cassandra_gate_false_without_jars(spark):
    """This image ships no connector jars; the classpath probe must say
    so (a true here would mean the gate probes the wrong class name)."""
    assert sinks.cassandra_available(spark) is False


def test_write_cassandra_unavailable_raises_with_routing(spark):
    df = _RecordingDF(spark)
    with pytest.raises(RuntimeError, match="spark.jars.packages"):
        sinks.write_cassandra(df, keyspace="gs_btc_raw", table="block")
    assert "saved" not in df.calls  # gate fired before any write


def test_write_cassandra_available_plumbs_connector_contract(
    spark, monkeypatch
):
    """With the gate stubbed open, the writer must emit exactly the
    connector's datasource contract: cassandra format, keyspace+table
    options, append mode (the keyed-upsert semantics the reference
    relies on), and a terminal save()."""
    monkeypatch.setattr(sinks, "cassandra_available", lambda s: True)
    df = _RecordingDF(spark)
    sinks.write_cassandra(df, keyspace="gs_btc_raw", table="transaction")
    assert df.calls["format"] == "org.apache.spark.sql.cassandra"
    assert df.calls["options"] == {
        "keyspace": "gs_btc_raw",
        "table": "transaction",
    }
    assert df.calls["mode"] == "append"
    assert df.calls["saved"] is True


def test_write_cassandra_mode_passthrough(spark, monkeypatch):
    monkeypatch.setattr(sinks, "cassandra_available", lambda s: True)
    df = _RecordingDF(spark)
    sinks.write_cassandra(
        df, keyspace="gs_btc_raw", table="block", mode="overwrite"
    )
    assert df.calls["mode"] == "overwrite"
