"""Tests for the sketch candidate/verify operators: Misra-Gries exact
heavy hitters, Bloom-prefilter decontamination, and triangle counting
(the wedge-join graph statistic that rides the same exact-composition
philosophy)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- heavy hitters
def _exact_hh(values: list[str], denom: int) -> dict[str, int]:
    n = len(values)
    thr = (n + denom - 1) // denom
    return {k: c for k, c in Counter(values).items() if c >= thr}


@pytest.mark.parametrize(
    "values",
    [
        # uniform tail + two genuine heavy keys
        ["hot"] * 400 + ["warm"] * 100 + [f"t{i}" for i in range(300)],
        # everything below threshold
        [f"t{i}" for i in range(600)],
        # all one key
        ["only"] * 50,
        # adversarial: many keys exactly at the boundary
        [f"b{i % 7}" for i in range(700)] + [f"t{i}" for i in range(100)],
    ],
)
def test_heavy_hitters_exact(spark, values):
    from graphsense_blocksci_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(v,) for v in values], "item string").repartition(5)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, "item", support_denominator=512).collect()
    }
    assert got == _exact_hh(values, 512)


def test_heavy_hitters_small_denominator(spark):
    # tiny capacity exercises real Misra-Gries decrements: 3 heavy keys
    # among 50 distinct with denominator 8 (capacity 16 < 53 keys)
    from graphsense_blocksci_spark.operators.sketches import heavy_hitters

    values = ["a"] * 30 + ["b"] * 20 + ["c"] * 15 + [f"t{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in values], "item string").repartition(3)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, "item", support_denominator=8).collect()
    }
    assert got == _exact_hh(values, 8)


def test_heavy_hitters_empty(spark):
    from graphsense_blocksci_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item").count() == 0


def test_mg_partition_superset_guarantee():
    # direct unit check of the phase-1 summary: any key with count >
    # n/capacity must survive, across multiple merged batches
    import pandas as pd

    from graphsense_blocksci_spark.operators.sketches import _mg_partition

    cap = 8
    values = ["h"] * 40 + [f"t{i}" for i in range(200)]  # n=240, n/cap=30
    batches = [
        pd.DataFrame({"item": values[i : i + 37]}) for i in range(0, len(values), 37)
    ]
    (out,) = list(_mg_partition(cap)(iter(batches)))
    items = set(out["item"].dropna())
    total = int(out["partition_total"].dropna().iloc[0])
    assert total == 240
    assert "h" in items
    assert len(items) <= cap


# ---------------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(spark):
    from graphsense_blocksci_spark.operators.sketches import (
        bloom_member,
        build_bloom_words,
    )

    keys = list(range(0, 5000, 7))
    df = spark.createDataFrame([(k,) for k in keys], "h long")
    n_bits = 1 << 14
    sparse = build_bloom_words(df, "h", n_bits)
    words = [sparse.get(i, 0) for i in range(n_bits // 64)]
    probe = spark.createDataFrame([(k,) for k in range(5000)], "h long")
    hits = {
        r["h"]
        for r in probe.filter(bloom_member(F.col("h"), words, n_bits)).collect()
    }
    assert set(keys) <= hits  # one-sided error: every inserted key hits
    # and the filter actually prunes (false-positive rate is not ~1)
    assert len(hits) < 5000


def test_bloom_decontaminate_equals_exact(spark, sf_dir):
    from graphsense_blocksci_spark.operators.sketches import bloom_decontaminate
    from graphsense_blocksci_spark.operators.text_dedup import decontaminate
    from graphsense_blocksci_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 7 == 0
    got = {
        (r["doc_id"], r["n_shared_shingles"])
        for r in bloom_decontaminate(
            docs.filter(~is_eval), docs.filter(is_eval)
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_shared_shingles"])
        for r in decontaminate(
            docs.filter(~is_eval), docs.filter(is_eval)
        ).collect()
    }
    assert got == want and len(want) > 0


def test_bloom_bitmap_cap_raises(spark):
    from graphsense_blocksci_spark.operators.sketches import bloom_decontaminate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (7, "alpha beta gamma x y z")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="shard the eval set"):
        bloom_decontaminate(
            docs.filter(F.col("doc_id") != 7),
            docs.filter(F.col("doc_id") == 7),
            max_bitmap_bytes=1,
        )


# ------------------------------------------------------------------ triangles
def _tri_ref(edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: Counter = Counter()
    for u in sorted(adj):
        for v in [x for x in adj[u] if x > u]:
            for w in [x for x in adj[u] & adj[v] if x > v]:
                out[u] += 1
                out[v] += 1
                out[w] += 1
    return dict(out)


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (1, 3)],  # one triangle
        [(1, 2), (2, 3), (3, 4)],  # path: none
        # K4 (4 triangles, every node in 3) plus a pendant
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        # two triangles sharing an edge + duplicate/reversed inputs
        [(1, 2), (2, 3), (1, 3), (3, 2), (2, 4), (3, 4), (1, 2)],
        # hub: star has no triangles until the rim closes
        [(0, i) for i in range(1, 8)] + [(1, 2), (5, 6)],
    ],
)
def test_triangle_count(spark, edges):
    from graphsense_blocksci_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == _tri_ref(edges)


# -------------------------------------------------------------- HDR quantiles
def test_hdr_bucket_monotone_and_error_bound(spark):
    from graphsense_blocksci_spark.operators.sketches import (
        hdr_bucket,
        hdr_bucket_low,
    )

    import random

    rng = random.Random(41)
    vals = sorted(
        {rng.randrange(0, 10**9) for _ in range(500)}
        | {0, 1, 31, 32, 33, 10**9}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (
        df.select(
            "v",
            hdr_bucket(F.col("v")).alias("b"),
            hdr_bucket_low(hdr_bucket(F.col("v"))).alias("lb"),
        )
        .orderBy("v")
        .collect()
    )
    prev_b = -1
    for r in rows:
        assert r["b"] >= prev_b  # monotone in v
        prev_b = r["b"]
        assert r["lb"] <= r["v"]  # lower bound really is one
        # relative width bound: v < lb * (1 + 1/16) for composite
        # buckets; small buckets (v <= 31) are exact
        if r["v"] > 31:
            assert r["v"] < r["lb"] * 17 / 16
        else:
            assert r["lb"] == r["v"]


def test_hdr_partials_merge_equals_direct_and_rank_semantics(spark):
    from graphsense_blocksci_spark.operators.sketches import (
        hdr_histogram,
        hdr_quantiles,
    )

    import random

    rng = random.Random(42)
    rows = [(i % 7, rng.randrange(0, 10**7)) for i in range(3000)]
    df = spark.createDataFrame(rows, "day int, v long")
    # partials per day, merged inside hdr_quantiles
    per_day = hdr_histogram(df, "v", group_cols=("day",))
    direct = hdr_histogram(df, "v")
    merged = {
        (r["bucket"], r["cnt"])
        for r in per_day.groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == {(r["bucket"], r["cnt"]) for r in direct.collect()}

    got = {
        (r["q_num"], r["q_den"]): r["est"]
        for r in hdr_quantiles(per_day).collect()
    }
    vals = sorted(v for _, v in rows)
    n = len(vals)
    for (num, den), est in got.items():
        rank = (n * num + den - 1) // den
        true = vals[rank - 1]
        assert est <= true
        if true > 31:
            assert true < est * 17 / 16


def test_cms_overcounts_never_undercounts(spark):
    from collections import Counter

    from graphsense_blocksci_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    # skewed stream: key i appears i times, forcing bucket collisions
    # at width 16
    vals = [i for i in range(1, 40) for _ in range(i)]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    sketch = cms_build(df, "k", depth=3, width=16)
    keys = df.distinct()
    est = {
        r.k: r.est
        for r in cms_estimate(sketch, keys, "k", depth=3, width=16).collect()
    }
    true = Counter(vals)
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t  # CMS never undercounts
    # total overcount bounded: each row's counters sum to the stream size
    assert sum(r.cnt for r in sketch.collect()) == 3 * len(vals)


def test_cms_merge_is_cellwise_sum(spark):
    from graphsense_blocksci_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(30)], "k long")
    merged_direct = cms_build(a.union(b), "k", depth=2, width=32)
    merged_partials = (
        cms_build(a, "k", depth=2, width=32)
        .union(cms_build(b, "k", depth=2, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, merged_direct.collect())) == sorted(
        map(tuple, merged_partials.collect())
    )


def test_cms_absent_key_estimates_zero_when_no_collision(spark):
    from graphsense_blocksci_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    sketch = cms_build(df, "k", depth=4, width=4096)
    ghost = spark.createDataFrame([(999999,)], "k long")
    est = cms_estimate(sketch, ghost, "k", depth=4, width=4096).first()
    assert est.est == 0  # wide sketch, 3 keys: collision chance ~0


def test_cms_inner_product_never_underestimates_join_size(spark):
    from graphsense_blocksci_spark.operators.sketches import cms_build
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(i % 13,) for i in range(200)], "k long")
    b = spark.createDataFrame([(i % 9,) for i in range(90)], "k long")
    sa = cms_build(a, "k", depth=3, width=32)
    sb = cms_build(b, "k", depth=3, width=32)
    est = (
        sa.alias("x")
        .join(sb.alias("y"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("x.cnt") * F.col("y.cnt")).alias("ip"))
        .agg(F.min("ip"))
        .first()[0]
    )
    true = a.join(b, "k").count()
    assert est >= true  # CM inner product overestimates only
    # with a wide sketch (no collisions) the estimate is exact
    sa2 = cms_build(a, "k", depth=3, width=4096)
    sb2 = cms_build(b, "k", depth=3, width=4096)
    est2 = (
        sa2.alias("x")
        .join(sb2.alias("y"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("x.cnt") * F.col("y.cnt")).alias("ip"))
        .agg(F.min("ip"))
        .first()[0]
    )
    assert est2 == true


def test_hll_deterministic_accuracy_and_merge(spark):
    """The md5-register HLL must estimate within ~3 standard errors
    (1.04/sqrt(m) ≈ 6.5% at m=256) on a known-cardinality corpus, and
    register tables built on arbitrary splits must merge (per-bucket
    max) into exactly the whole-corpus table — the mergeable-partials
    contract that lets partials roll up across partitions/windows."""
    from graphsense_blocksci_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("k"))
    est = hll_estimate(hll_registers(df, "k")).first()
    assert abs(est.est_floor - n) / n < 0.20  # 3 standard errors at m=256
    # duplicates must not move the registers at all
    dup = df.union(df).union(df)
    est_dup = hll_estimate(hll_registers(dup, "k")).first()
    assert est_dup.harmonic_num == est.harmonic_num
    # split-and-merge identity
    a = hll_registers(df.filter(F.col("k") % 3 == 0), "k")
    b = hll_registers(df.filter(F.col("k") % 3 != 0), "k")
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(df, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_nondefault_p_accuracy_and_python_parity(spark):
    """Regression for the p=8-hardcoded rho window (ADVICE r5): at any
    p the suffix is 60-p bits wide, so rho must be (61-p) -
    length(bin(z)) with an all-zero suffix yielding 61-p. Checks (a)
    register-level parity against an independent pure-Python md5
    rebuild at p=6 and p=12 (would catch the uniform 8-p offset the
    old formula had), (b) estimate accuracy within 3 standard errors
    at both p's, and (c) that harmonic_num cannot overflow at high p
    (the old 2^53 constant overflowed int64 for p >= 11)."""
    import hashlib

    from graphsense_blocksci_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 4000
    df = spark.range(n).select((F.col("id") * 11 + 5).alias("k"))
    keys = [i * 11 + 5 for i in range(n)]
    for p in (6, 12):
        m = 1 << p
        expected: dict[int, int] = {}
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            bucket, z = h % m, h >> p
            rho = (61 - p) if z == 0 else (61 - p) - z.bit_length()
            expected[bucket] = max(expected.get(bucket, 0), rho)
        got = {
            r.bucket: r.rho for r in hll_registers(df, "k", p=p).collect()
        }
        assert got == expected, f"register mismatch at p={p}"
        est = hll_estimate(hll_registers(df, "k", p=p), p=p).first()
        # est_floor is the RAW estimate by contract; apply the standard
        # linear-counting small-range correction (E < 2.5m with zero
        # registers present) consumer-side, as the docstring directs
        import math

        e = est.est_floor
        if e < 2.5 * m and est.n_zero_registers > 0:
            e = m * math.log(m / est.n_zero_registers)
        se = 1.04 / (m ** 0.5)
        assert abs(e - n) / n < 3 * se + 0.02, (p, e)
        assert est.harmonic_num > 0  # no int64 overflow at any p
    # p guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_registers(df, "k", p=3)
    with _pytest.raises(ValueError):
        hll_registers(df, "k", p=17)
