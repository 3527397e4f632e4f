"""DDL bootstrap (A25), table validation (A24), progress metering
(A23), address rendering wiring (A9/A10), sinks round-trip (A20)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphsense_blocksci_spark.functions.addresses import (
    address_type_code,
    build_io_struct,
)
from graphsense_blocksci_spark.operators.progress import (
    CountingAccumulator,
    observed,
)
from graphsense_blocksci_spark.sources.ddl import (
    check_tables_arg,
    has_keyspace,
    setup_keyspace,
)
from graphsense_blocksci_spark.sources.sinks import write_bucketed_table


class TestTableValidation:
    def test_none_means_all(self):
        assert check_tables_arg(None)[0] == "block"
        assert len(check_tables_arg([])) == 7

    def test_subset_preserves_canonical_order(self):
        got = check_tables_arg(["transaction", "block"])
        assert got == ["block", "transaction"]

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown tables"):
            check_tables_arg(["block", "nope"])


class TestDDL:
    def test_setup_keyspace_idempotent(self, spark, tmp_path):
        loc = str(tmp_path / "warehouse")
        created = setup_keyspace(spark, "btc_test", location=loc)
        assert "btc_test.block" in created
        assert has_keyspace(spark, "btc_test")
        # idempotent re-run (CREATE IF NOT EXISTS), like has_keyspace
        # guarding the reference's template execution
        again = setup_keyspace(spark, "btc_test", location=loc)
        assert created == again
        cols = [f.name for f in spark.table("btc_test.block").schema.fields]
        assert cols == [
            "block_id_group",
            "block_id",
            "block_hash",
            "timestamp",
            "no_transactions",
        ]


class TestProgress:
    def test_observed_counts_inline(self, spark):
        df = spark.range(0, 1234)
        obs_df, obs = observed(df)
        assert obs_df.count() == 1234
        assert obs.get["rows_processed"] == 1234

    def test_accumulator_counts_partitions(self, spark):
        acc = CountingAccumulator(spark)
        spark.range(0, 500).foreachPartition(acc.count_partition)
        assert acc.value == 500


class TestAddressWiring:
    def test_build_io_struct_from_flat(self, spark):
        rows = [
            ("pubkeyhash", "1abc", None, 5000),
            ("multisig", None, ["1a", "1b"], 7000),
            ("nulldata", None, None, 0),
        ]
        df = spark.createDataFrame(
            rows,
            "type_name string, addr string, ms array<string>, v long",
        )
        out = df.select(
            build_io_struct("type_name", "addr", "ms", "v").alias("io")
        ).collect()
        assert out[0].io.address == ["1abc"] and out[0].io.address_type == 3
        assert out[1].io.address == ["1a", "1b"] and out[1].io.address_type == 6
        assert out[2].io.address is None and out[2].io.address_type == 7

    def test_address_type_code_unknown_is_null(self, spark):
        df = spark.createDataFrame([("wat",)], "type_name string")
        assert df.select(address_type_code("type_name")).first()[0] is None


class TestChains:
    def test_chain_registry_matches_reference_constants(self):
        from graphsense_blocksci_spark.chains import CHAINS, for_chain

        assert set(CHAINS) == {"btc", "bch", "ltc", "zec"}
        assert all(c.reorg_safety_lag == 6 for c in CHAINS.values())
        assert for_chain("btc").has_segwit and for_chain("ltc").has_segwit
        assert not for_chain("bch").has_segwit
        assert not for_chain("zec").has_segwit
        with pytest.raises(ValueError, match="unknown chain"):
            for_chain("doge")

    def test_chain_lag_plumbs_into_incremental(self, spark):
        from graphsense_blocksci_spark.chains import for_chain
        from graphsense_blocksci_spark.plans.incremental import (
            reorg_safety_filter,
        )

        df = spark.range(0, 100).withColumnRenamed("id", "block_id")
        safe = reorg_safety_filter(
            df, "block_id", lag=for_chain("btc").reorg_safety_lag
        )
        assert safe.agg(F.max("block_id")).first()[0] == 93


class TestSinkRoundTrip:
    def test_bucketed_layout_and_values(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i // 100, i, f"v{i}") for i in range(0, 1000, 7)],
            "grp int, id long, payload string",
        )
        path = str(tmp_path / "sink")
        write_bucketed_table(df, path, "grp", "id", descending=True)
        back = spark.read.parquet(path)
        assert back.count() == df.count()
        # partition pruning: one directory per group
        pruned = back.filter(F.col("grp") == 3)
        assert pruned.count() == df.filter(F.col("grp") == 3).count()
        # round-trip values survive exactly
        a = sorted((r.id, r.payload) for r in back.collect())
        b = sorted((r.id, r.payload) for r in df.collect())
        assert a == b


def test_json_source_roundtrip_explicit_schema(spark, tmp_path):
    from graphsense_blocksci_spark.sources import (
        load_json_table,
        write_json_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, name string, score double"
    )
    path = str(tmp_path / "j")
    write_json_table(df, path)
    back = load_json_table(spark, path, "id long, name string, score double")
    assert back.schema == df.schema
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", None),
    ]


def test_csv_source_roundtrip_explicit_schema(spark, tmp_path):
    from graphsense_blocksci_spark.sources import (
        load_csv_table,
        write_csv_table,
    )

    df = spark.createDataFrame(
        [(1, "a,with delim", 1.5), (2, "b", None)],
        "id long, name string, score double",
    )
    path = str(tmp_path / "c")
    write_csv_table(df, path)
    back = load_csv_table(spark, path, "id long, name string, score double")
    assert back.schema == df.schema
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "a,with delim", 1.5),
        (2, "b", None),
    ]


def test_orc_source_roundtrip_nested(spark, tmp_path):
    from graphsense_blocksci_spark.sources import load_orc_table, write_orc_table

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"k": 2}), (2, [], None)],
        "id long, tags array<string>, props map<string,long>",
    )
    path = str(tmp_path / "o")
    write_orc_table(df, path)
    back = load_orc_table(spark, path)
    assert back.schema == df.schema
    # set-ops reject map columns; compare collected rows instead
    norm = lambda d: sorted(  # noqa: E731
        (r.id, tuple(r.tags), None if r.props is None else tuple(sorted(r.props.items())))
        for r in d.collect()
    )
    assert norm(back) == norm(df)


def test_cluster_conf_is_consumable(spark):
    from graphsense_blocksci_spark.session import cluster_conf

    conf = cluster_conf()
    # every key/value must be a plain string Spark conf accepts
    assert all(isinstance(k, str) and isinstance(v, str) for k, v in conf.items())
    # shuffle width scales with the input, never below 2 tasks/core
    assert int(conf["spark.sql.shuffle.partitions"]) >= 8000
    small = cluster_conf(target_input_tb=0.001, executors=2, cores_per_executor=4)
    assert int(small["spark.sql.shuffle.partitions"]) == 16
