"""Round-12 wave-9 ops: pure-Python cross-checks (independent of the
DuckDB oracle — a third implementation per query) plus plan contracts
for the scale-critical shapes."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# q350 — Kruskal–Wallis H
# ---------------------------------------------------------------------------


def test_q350_matches_textbook_kruskal_wallis(spark):
    """Recompute H (midrank ties + tie correction) the textbook way —
    scipy's formula in pure Python floats — and require the ppm
    outputs within floor slack of it; plus the Spark row's own
    internal consistency (tie-corrected H >= H for corr in (0,1])."""
    from graphsense_blocksci_spark.queries import q350_kruskal_wallis

    row = q350_kruskal_wallis(spark, SF).collect()[0]
    con = duckdb.connect()
    data = con.sql(
        f"SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    by_g: dict[str, list[int]] = {}
    for g, x in data:
        by_g.setdefault(g, []).append(x)
    xs = sorted(x for _, x in data)
    n = len(xs)
    # average rank per distinct value
    rank: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        rank[xs[i]] = (i + 1 + j) / 2.0
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        sum(rank[x] for x in v) ** 2 / len(v) for v in by_g.values()
    ) - 3.0 * (n + 1)
    from collections import Counter

    cnt = Counter(x for _, x in data)
    tsum = sum(t**3 - t for t in cnt.values())
    corr = 1.0 - tsum / (n**3 - n)
    assert row["k"] == len(by_g)
    assert row["n"] == n
    assert abs(row["h_ppm"] - 1e6 * h) <= 2
    assert abs(row["h_tie_ppm"] - 1e6 * h / corr) <= 2
    assert row["h_tie_ppm"] >= row["h_ppm"]


def test_q350_plan_windows_bounded_value_domain(spark):
    """The only global-order window runs over the DISTINCT-VALUE
    frame (the q310/roc_auc discipline): the midrank window's input
    must already be aggregated, so the plan's Window node sits above
    a HashAggregate, never above the raw orders scan; and nothing
    cross-joins the corpus."""
    from graphsense_blocksci_spark.queries import q350_kruskal_wallis

    plan = _executed_plan(q350_kruskal_wallis(spark, SF))
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan
    # the raw-table scan must sit BELOW an aggregate in every window
    # subtree: between each Window node and the orders parquet scan
    # there must be an intervening (Hash|Sort)Aggregate, i.e. the
    # window's direct input is already the bounded value/group rollup
    assert "Window" in plan
    for win_subtree in plan.split("Window")[1:]:
        scan_at = win_subtree.find("Scan parquet")
        if scan_at == -1:
            continue
        between = win_subtree[:scan_at]
        assert "HashAggregate" in between or "SortAggregate" in between


# ---------------------------------------------------------------------------
# q351 — ordinal-pattern census (permutation-entropy suffstats)
# ---------------------------------------------------------------------------


def test_q351_matches_python(spark):
    """Brute-force the ordinal patterns in pure Python with the same
    earlier-index-wins tie rule and compare the histogram exactly."""
    from graphsense_blocksci_spark.queries import q351_ordinal_patterns

    got = {
        r["pattern"]: (r["n"], r["share_ppm"])
        for r in q351_ordinal_patterns(spark, SF).collect()
    }
    con = duckdb.connect()
    daily = con.sql(
        f"""
        SELECT o_orderdate AS d,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    v = [x for _, x in daily]
    from collections import Counter

    pats: Counter[int] = Counter()
    for i in range(len(v) - 2):
        a, b, c = v[i], v[i + 1], v[i + 2]
        ra = (1 if b > a else 0) + (1 if c > a else 0)
        rb = (1 if a >= b else 0) + (1 if c > b else 0)
        rc = (1 if a >= c else 0) + (1 if b >= c else 0)
        pats[ra * 9 + rb * 3 + rc] += 1
    nt = sum(pats.values())
    expected = {
        p: (cn, 1000000 * cn // nt) for p, cn in pats.items()
    }
    assert got == expected
    # every pattern triple is a permutation encoding: (ra, rb, rc)
    # must decode to a permutation of (0, 1, 2)
    for p in got:
        ra, rb, rc = p // 9, (p % 9) // 3, p % 3
        assert sorted((ra, rb, rc)) == [0, 1, 2]


def test_q351_plan_day_grain_before_window(spark):
    """The corpus must reduce to the day frame before any window
    (the q311/q346 day-grain convention): the lead() windows' subtree
    carries an aggregate between the window and the scan."""
    from graphsense_blocksci_spark.queries import q351_ordinal_patterns

    plan = _executed_plan(q351_ordinal_patterns(spark, SF))
    assert "CartesianProduct" not in plan
    win_subtree = plan.split("Window", 1)[1] if "Window" in plan else ""
    assert "HashAggregate" in win_subtree or "SortAggregate" in win_subtree
