"""Round-13 wave 2: rank statistics — Friedman (q358), Cliff's delta
(q359), Wald–Wolfowitz runs (q360), Jonckheere–Terpstra (q361).
Each is pinned against a brute-force pure-Python computation of the
textbook definition on sf0.001 — independent of both engines' SQL."""

from __future__ import annotations

from collections import defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _sql(q: str):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(q).fetchall()


def _midranks(values):
    """value -> midrank (1-based, ties averaged)."""
    s = sorted(values)
    pos = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        pos[s[i]] = (i + 1 + j) / 2  # mean of positions i+1..j
        i = j
    return pos


def test_q358_friedman_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q358_friedman_test

    got = {r["g"]: r for r in q358_friedman_test(spark, SF).collect()}

    cells = defaultdict(dict)
    for blk, g, v in _sql(
        "SELECT strftime(o_orderdate, '%Y-%m'), o_orderpriority,"
        " CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY 1, 2"
    ):
        cells[blk][g] = v
    k = len({g for b in cells.values() for g in b})
    complete = {b: t for b, t in cells.items() if len(t) == k}
    r_sum = defaultdict(float)
    for t in complete.values():
        mr = _midranks(list(t.values()))
        for g, v in t.items():
            r_sum[g] += mr[v]
    n = len(complete)
    ssq = sum(r * r for r in r_sum.values())
    q_stat = 12.0 * ssq / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    for g, r in r_sum.items():
        assert got[g]["n_blocks"] == n
        assert got[g]["r2_sum"] == int(2 * r)
        # floor-ppm of the float stat within 1 ulp-ish slack
        assert abs(got[g]["q_ppm"] / 1e6 - q_stat) < 1e-6 + 1e-9 * abs(
            q_stat
        )


def test_q359_cliffs_delta_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q359_cliffs_delta

    got = {r["yr"]: r for r in q359_cliffs_delta(spark, SF).collect()}
    rows = _sql(
        "SELECT CAST(year(l_shipdate) AS BIGINT), l_returnflag,"
        " CAST(l_quantity AS BIGINT) FROM lineitem"
    )
    by_yr = defaultdict(lambda: ([], []))
    for yr, flag, q in rows:
        if flag == "A":
            by_yr[yr][0].append(q)
        elif flag == "R":
            by_yr[yr][1].append(q)
    for yr, (a, b) in by_yr.items():
        if not a or not b:
            assert yr not in got or got[yr]["n_a"] == 0
            continue
        gt = sum(1 for x in a for y in b if x > y)
        lt = sum(1 for x in a for y in b if x < y)
        assert got[yr]["n_a"] == len(a)
        assert got[yr]["n_b"] == len(b)
        assert got[yr]["dominance"] == gt - lt
        expect_ppm = int(1_000_000 * (gt - lt) / (len(a) * len(b)))
        assert got[yr]["delta_ppm"] == expect_ppm


def test_q360_runs_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q360_runs_test

    row = q360_runs_test(spark, SF).first()
    daily = sorted(
        _sql(
            "SELECT l_shipdate,"
            " CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))"
            " AS BIGINT) FROM lineitem GROUP BY 1"
        )
    )
    n = len(daily)
    total = sum(c for _, c in daily)
    signs = [c * n > total for _, c in daily]
    runs = 1 + sum(
        1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
    )
    n1 = sum(signs)
    n2 = n - n1
    assert row["n_days"] == n
    assert row["n_plus"] == n1
    assert row["n_minus"] == n2
    assert row["n_runs"] == runs
    assert row["mu_ppm"] == (1_000_000 * (n + 2 * n1 * n2)) // n
    assert row["sigma2_ppm"] == (
        2_000_000 * n1 * n2 * (2 * n1 * n2 - n)
    ) // (n * n * (n - 1))


def test_q361_jt_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q361_jonckheere_terpstra

    got = {
        (r["gi"], r["gj"]): r
        for r in q361_jonckheere_terpstra(spark, SF).collect()
    }
    rows = _sql(
        "SELECT o_orderpriority,"
        " CAST(floor(o_totalprice) AS BIGINT) FROM orders"
    )
    by_g = defaultdict(list)
    for g, x in rows:
        by_g[g].append(x)
    gs = sorted(by_g)
    assert len(got) == len(gs) * (len(gs) - 1) // 2
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            a, b = by_g[gs[i]], by_g[gs[j]]
            # doubled U of group j over group i: 2*#(xj>xi) + #=
            u2 = sum(
                2 for y in b for x in a if y > x
            ) + sum(1 for y in b for x in a if y == x)
            r = got[(gs[i], gs[j])]
            assert r["n_i"] == len(a)
            assert r["n_j"] == len(b)
            assert r["u2"] == u2


def test_q361_pair_window_is_partitioned(spark):
    """The midrank window must be keyed by the pair — a global
    single-partition window over the value domain would serialize
    all 10 pairs through one task."""
    from graphsense_blocksci_spark.queries import q361_jonckheere_terpstra

    plan = (
        q361_jonckheere_terpstra(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs, "expected at least one window in the plan"
    for spec in specs:
        assert spec.startswith("gi#"), spec[:60]
