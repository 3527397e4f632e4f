"""Round-13 wave 1: the Spark-4 surface queries — Python DataSource
paged scan (q356) and SQL session variables / EXECUTE IMMEDIATE
(q357) — plus the pyds source contract."""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# pyds source contract
# ---------------------------------------------------------------------------


def test_pagedrange_one_task_per_page(spark):
    """The planner must emit exactly one InputPartition per page —
    that IS the paged-scan parallelism claim."""
    from graphsense_blocksci_spark.sources.pyds import register_pagedrange

    register_pagedrange(spark)
    df = (
        spark.read.format("pagedrange")
        .option("n_rows", 5_000)
        .option("page_size", 500)
        .load()
    )
    assert df.rdd.getNumPartitions() == 10


def test_pagedrange_values_match_hash28(spark):
    """Row values are the md5-prefix integers the oracle recomputes."""
    from graphsense_blocksci_spark.sources.pyds import register_pagedrange

    register_pagedrange(spark)
    rows = (
        spark.read.format("pagedrange")
        .option("n_rows", 7)
        .option("page_size", 3)
        .load()
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["page"]) for r in rows] == [
        (0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1), (6, 2),
    ]
    for r in rows:
        exp = int(
            hashlib.md5(f"pg:{r['id']}".encode()).hexdigest()[:7], 16
        )
        assert r["v"] == exp


def test_pagedrange_rejects_bad_options():
    from graphsense_blocksci_spark.sources.pyds import PagedRangeReader

    with pytest.raises(ValueError):
        PagedRangeReader({"n_rows": "10", "page_size": "0"})
    with pytest.raises(ValueError):
        PagedRangeReader({"n_rows": "-1", "page_size": "10"})


def test_pagedrange_empty_source(spark):
    """n_rows=0 still plans (one empty partition) and returns 0 rows."""
    from graphsense_blocksci_spark.sources.pyds import register_pagedrange

    register_pagedrange(spark)
    df = (
        spark.read.format("pagedrange")
        .option("n_rows", 0)
        .option("page_size", 10)
        .load()
    )
    assert df.count() == 0


# ---------------------------------------------------------------------------
# q356 — plan shape
# ---------------------------------------------------------------------------


def test_q356_partial_agg_above_python_scan(spark):
    """The per-page rollup must partial-aggregate ABOVE the Python
    batch scan before the exchange (map-side combine — each task
    ships 1 row per page, not 1000), and no Python eval stage may
    appear above the source (I/O-path Python only)."""
    from graphsense_blocksci_spark.queries import q356_python_datasource

    plan = _executed_plan(q356_python_datasource(spark, SF))
    assert "BatchScan pagedrange" in plan
    assert "partial_sum" in plan
    # partial aggregate sits between the exchange and the scan
    scan_at = plan.index("BatchScan pagedrange")
    exch_at = plan.index("Exchange")
    assert "partial_sum" in plan[exch_at:scan_at]
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q357 — variable folds to a pushed-down literal
# ---------------------------------------------------------------------------


def test_q357_variable_folds_to_pushed_filter(spark):
    """Catalyst must resolve the session variable to a literal at
    analysis time and push the comparison into the parquet scan —
    the whole point of the two-step workflow costing nothing."""
    from graphsense_blocksci_spark.queries import q357_sql_variables

    plan = _executed_plan(q357_sql_variables(spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThan(o_totalprice" in plan
    assert "BatchEvalPython" not in plan


def test_q357_threshold_is_half_max(spark):
    """The variable's value must be exactly max/2 of the table."""
    from graphsense_blocksci_spark.queries import q357_sql_variables
    from graphsense_blocksci_spark.sources.tables import load_table

    q357_sql_variables(spark, SF)  # declares + sets the variable
    got = spark.sql("SELECT rq357_thr AS v").first()["v"]
    mx = (
        load_table(spark, SF, "orders")
        .agg({"o_totalprice": "max"})
        .first()[0]
    )
    assert got == mx * 0.5
