"""Round-13 wave 5: SQL pipe syntax (q366), IDENTIFIER clause
(q367), try_ error-safe arithmetic (q368)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q366_pipe_desugars_to_pushed_plan(spark):
    """The |> chain must produce the same physical shape as classic
    SQL: the WHERE stage pushed into the parquet scan, the AGGREGATE
    stage partial-aggregated before the exchange."""
    from graphsense_blocksci_spark.queries import q366_pipe_syntax

    plan = _executed_plan(q366_pipe_syntax(spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_q366_matches_classic_spelling(spark):
    from graphsense_blocksci_spark.queries import q366_pipe_syntax
    from graphsense_blocksci_spark.sources.tables import load_table

    got = [tuple(r) for r in q366_pipe_syntax(spark, SF).collect()]
    li = load_table(spark, SF, "lineitem")
    li.createOrReplaceTempView("t366_classic")
    exp = [
        tuple(r)
        for r in spark.sql(
            """
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS sum_cents,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM t366_classic
            WHERE l_shipdate >= DATE'1995-01-01'
            GROUP BY l_returnflag ORDER BY l_returnflag
            """
        ).collect()
    ]
    assert got == exp


def test_q367_identifier_matches_inline(spark):
    from graphsense_blocksci_spark.queries import q367_identifier_clause

    got = {
        r["grp"]: (r["n_orders"], r["sum_cents"])
        for r in q367_identifier_clause(spark, SF).collect()
    }
    exp = {
        r["o_orderstatus"]: (r["n"], r["s"])
        for r in spark.sql(
            "SELECT o_orderstatus,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))"
            " AS BIGINT) AS s"
            " FROM rq367_orders GROUP BY 1"
        ).collect()
    }
    assert got == exp


def test_q367_identifier_rejects_injection(spark):
    """The injection-safety claim: a parameter carrying SQL syntax
    must fail to RESOLVE as an identifier, never execute."""
    from graphsense_blocksci_spark.sources.tables import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView(
        "rq367_orders"
    )
    with pytest.raises(Exception, match="INVALID_IDENTIFIER|PARSE"):
        spark.sql(
            "SELECT count(*) FROM IDENTIFIER(:tbl)",
            args={"tbl": "rq367_orders WHERE 1=1; DROP TABLE x"},
        ).collect()


def test_q368_exercises_all_branches(spark):
    """Both try_ outcomes must occur in the data: zero-denominator
    NULLs AND real quotients; overflow NULLs AND in-range products —
    otherwise the row is a constant-folded non-test."""
    from graphsense_blocksci_spark.queries import q368_try_arithmetic

    rows = q368_try_arithmetic(spark, "/root/testdata/sf0.01").collect()
    div_null = sum(1 for r in rows if r["cents_per_debtor"] is None)
    mul_null = sum(1 for r in rows if r["scaled_probe"] is None)
    assert 0 < div_null < len(rows)
    assert 0 < mul_null < len(rows)
    # semantic checks against the row's own suffstats
    for r in rows:
        if r["n_deep_debt"] == 0:
            assert r["cents_per_debtor"] is None
        else:
            assert r["cents_per_debtor"] == r["sum_cents"] / r[
                "n_deep_debt"
            ]
        prod = r["sum_cents"] * 345075982937
        if -(2**63) <= prod <= 2**63 - 1:
            assert r["scaled_probe"] == prod
        else:
            assert r["scaled_probe"] is None


def test_q368_plain_multiply_would_abort(spark):
    """Pin WHY try_multiply is load-bearing: under ANSI semantics the
    unguarded multiply raises instead of wrapping."""
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        spark.sql(
            "SELECT 9223372036854775807 * CAST(2 AS BIGINT)"
        ).collect()
