"""Round-12 wave-11: recursive CTE and SQL-UDF engine surfaces —
independent checks beyond the DuckDB oracle gate."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q354_matches_python_recursion(spark):
    """Replay the max-plus carry chain in pure Python from the yearly
    intake frame — the recursion Spark's iterative CTE must
    reproduce exactly (all-integer arithmetic)."""
    import duckdb

    from graphsense_blocksci_spark.queries import q354_recursive_backlog

    got = sorted(
        tuple(r) for r in q354_recursive_backlog(spark, SF).collect()
    )
    con = duckdb.connect()
    years = con.sql(
        f"SELECT CAST(year(o_orderdate) AS BIGINT),"
        f" CAST(count(*) AS BIGINT)"
        f" FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    total = sum(n for _, n in years)
    cap = total // len(years) + 1
    carry = 0
    expected = []
    for i, (y, intake) in enumerate(years, start=1):
        carry = max(0, carry + intake - cap)
        expected.append((i, y, intake, carry))
    assert got == sorted(expected)
    # the recursion genuinely clamps at least once on this fixture
    # (otherwise a plain running sum would express it)
    assert any(c == 0 for _, _, _, c in got[:-1]) or got[-1][3] == 0


def test_q355_sql_udf_is_inlined(spark):
    """Catalyst must inline the SQL UDF bodies: the physical plan
    carries the CASE/round expressions directly, no Python stages and
    no UDF-invocation node."""
    from graphsense_blocksci_spark.queries import q355_sql_udf

    df = q355_sql_udf(spark, SF)
    plan = _executed_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "CASE WHEN" in plan
    rows = {r["tier"]: (r["n_orders"], r["sum_cents"]) for r in df.collect()}
    assert set(rows) <= {"small", "mid", "large"}
    assert sum(n for n, _ in rows.values()) > 0
