"""Randomized/property tests for the round-7 late-wave queries:
independent pure-Python references over seeded instances, plus the
structural invariants the ppm arithmetic is supposed to guarantee."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_kaplan_meier_recurrence_matches_python(spark):
    """The driver-side integer fold must equal a pure-Python replay of
    s_i = s_{i-1}*(n_i-d_i)//n_i over the same life table, and the
    survival curve must be non-increasing in [0, 1e6]."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = sorted(
        (r["bucket"], r["at_risk"], r["events"], r["survival_ppm"])
        for r in QUERIES["q262_kaplan_meier"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    s = 1_000_000
    prev = 1_000_000
    for bucket, at_risk, events, got in rows:
        s = s * (at_risk - events) // at_risk
        assert got == s, f"bucket {bucket}"
        assert 0 <= got <= prev
        prev = got


def test_pps_sample_invariants(spark):
    """Systematic PPS: total hits equals the number of whole strides
    inside the cumulative weight axis (k or k+1 by remainder), and
    every drawn customer's hit count is within its weight span."""
    from graphsense_blocksci_spark.queries import QUERIES

    got = QUERIES["q261_pps_sample"](spark, "/root/testdata/sf0.001").collect()
    total_hits = sum(r["n_hits"] for r in got)
    # stride = W // 100 -> the axis holds floor(W / stride) selection
    # points, which is >= 100 and < 100 + 100/stride
    assert 100 <= total_hits <= 101
    for r in got:
        assert r["n_hits"] >= 1


def test_market_basket_identities(spark):
    """Crafted baskets: a pair present in every order has confidence
    1e6 and lift 1e6 (independence at full support); counts match a
    brute-force reference."""
    import itertools

    from pyspark.sql import Row

    rng = random.Random(43)
    orders = []
    for ok in range(40):
        brands = {"A", "B"} | {
            rng.choice(["C", "D", "E"]) for _ in range(rng.randint(0, 2))
        }
        orders.append((ok, sorted(brands)))
    rows = [(ok, b) for ok, bs in orders for b in bs]
    df = spark.createDataFrame(rows, "l_orderkey long, b string")
    baskets = (
        df.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("b")).alias("bs"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) ->"
                    " transform(slice(bs, i + 2, size(bs)),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .collect()
    )
    got = {(r["a"], r["b"]): r["c_ab"] for r in pairs}
    want: dict[tuple, int] = {}
    for _, bs in orders:
        for x, y in itertools.combinations(bs, 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert got == want
    assert got[("A", "B")] == 40  # every order -> full support pair
