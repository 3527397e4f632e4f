"""Round-12 wave-10: Spark 4 engine-surface coverage — native XML
source round-trip and the VARIANT semi-structured path — with
independent checks beyond the DuckDB oracle gate."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q352_xml_roundtrip_equals_no_disk_plan(spark):
    """The XML write/read round-trip must be value-identical to the
    same rollup that never touched disk, with the declared types
    surviving the text format."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.queries import _cents, q352_xml_roundtrip
    from graphsense_blocksci_spark.sources.tables import load_table

    back = q352_xml_roundtrip(spark, SF)
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "string",
        "bigint",
        "bigint",
    ]
    o = load_table(spark, SF, "orders")
    direct = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(_cents("o_totalprice")).cast("long").alias("sum_cents"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_q353_variant_missing_key_is_null(spark):
    """variant_get on a missing path must be NULL (not an error) so
    n_with_k counts only carriers — the three-valued contract the
    oracle's ->> shares."""
    rows = spark.sql(
        "SELECT variant_get(parse_json('{\"other\": 1}'), '$.k', 'long')"
        " AS k, variant_get(parse_json('{\"k\": 7}'), '$.k', 'long') AS k2"
    ).first()
    assert rows["k"] is None and rows["k2"] == 7


def test_q353_plan_is_jvm_side(spark):
    """The VARIANT path must be pure JVM column work: no Python
    stages, no join, one shuffle for the rollup."""
    from graphsense_blocksci_spark.queries import q353_variant_shredding

    plan = _executed_plan(q353_variant_shredding(spark, SF))
    for marker in ("ArrowEvalPython", "MapInPandas", "CartesianProduct"):
        assert marker not in plan
    assert "parse_json" in plan or "variant_get" in plan
