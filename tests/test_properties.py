"""Property-based tests (hypothesis) for the invariants SURVEY §5
promises: bucketing arithmetic, dedup idempotence, coinjoin
permutation-invariance, and as-of join equivalence to pandas
merge_asof. Each example builds ONE small DataFrame; examples are
capped because a Spark round-trip costs ~0.5 s."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphsense_blocksci_spark.functions import bucket_group
from graphsense_blocksci_spark.functions.coinjoin import is_coinjoin
from graphsense_blocksci_spark.operators import asof_join, exact_dedup

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40),
    bucket=st.integers(min_value=1, max_value=100_000),
)
def test_bucket_group_is_floor_division(spark, ids, bucket):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = df.select(bucket_group("id", bucket).alias("g"), "id").collect()
    for r in got:
        assert r.g == r.id // bucket


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t"),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_exact_dedup_idempotent_and_min_keeper(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    # duplicate the corpus with shifted ids: dedup must keep the
    # ORIGINAL (lower) id for every content and count both copies
    rows += [(i + 1000, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).collect()
    assert all(r.keep_id < 1000 for r in out)
    assert sum(r.n_dups for r in out) == len(rows)
    # idempotence: dedup of the keepers keeps every keeper
    keepers = {r.keep_id for r in out}
    kept_df = df.filter(F.col("doc_id").isin(*keepers))
    again = exact_dedup(kept_df).collect()
    assert {r.keep_id for r in again} == keepers


_io = st.fixed_dictionaries(
    {
        "address": st.lists(
            st.sampled_from(["a1", "a2", "a3"]), min_size=1, max_size=2
        ),
        "value": st.sampled_from([546, 1000, 2000, 2730, 5000]),
        "address_type": st.sampled_from([3, 5, 6]),
    }
)


@SLOW
@given(
    inputs=st.lists(_io, min_size=0, max_size=6),
    outputs=st.lists(_io, min_size=0, max_size=6),
    seed=st.randoms(),
)
def test_coinjoin_invariant_under_io_permutation(spark, inputs, outputs, seed):
    shuffled_in = list(inputs)
    shuffled_out = list(outputs)
    seed.shuffle(shuffled_in)
    seed.shuffle(shuffled_out)
    schema = (
        "inputs array<struct<address:array<string>,value:long,address_type:smallint>>,"
        "outputs array<struct<address:array<string>,value:long,address_type:smallint>>"
    )
    df = spark.createDataFrame(
        [(inputs, outputs), (shuffled_in, shuffled_out)], schema
    )
    got = df.select(is_coinjoin("inputs", "outputs").alias("cj")).collect()
    assert got[0].cj == got[1].cj  # order of I/O slots never matters


@SLOW
@given(
    left_ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25
    ),
    right_ts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=10,
        unique=True,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(left_ts)], "id long, ts long"
    )
    right = spark.createDataFrame(
        [(t, float(t * 2)) for t in right_ts], "rts long, val double"
    )
    got = (
        asof_join(left, right, on="ts", right_on="rts", value_cols=["val"])
        .orderBy("id")
        .toPandas()
    )
    expected = pd.merge_asof(
        pd.DataFrame({"id": range(len(left_ts)), "ts": sorted(left_ts)}).sort_values(
            "ts"
        ),
        pd.DataFrame({"rts": sorted(right_ts), "val": [t * 2.0 for t in sorted(right_ts)]}),
        left_on="ts",
        right_on="rts",
        direction="backward",
    )
    # compare per-ts (ids differ after the sort merge_asof requires)
    got_map = dict(zip(got["ts"], got["val_asof"]))
    exp_map = dict(zip(expected["ts"], expected["val"]))
    for ts in set(left_ts):
        g, e = got_map[ts], exp_map[ts]
        assert (pd.isna(g) and pd.isna(e)) or g == e


@SLOW
@given(
    left_ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25
    ),
    right_ts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    direction=st.sampled_from(["forward", "nearest"]),
    strategy=st.sampled_from(["broadcast", "union"]),
)
def test_asof_directions_match_pandas(
    spark, left_ts, right_ts, direction, strategy
):
    # `union` needs a by key; a constant key keeps semantics identical
    by = ["k"] if strategy == "union" else []
    left = spark.createDataFrame(
        [(i, t, 0) for i, t in enumerate(left_ts)], "id long, ts long, k int"
    )
    right = spark.createDataFrame(
        [(t, float(t * 2), 0) for t in right_ts], "rts long, val double, k int"
    )
    got = (
        asof_join(
            left,
            right,
            on="ts",
            right_on="rts",
            by=by,
            value_cols=["val"],
            strategy=strategy,
            direction=direction,
        )
        .orderBy("id")
        .toPandas()
    )
    expected = pd.merge_asof(
        pd.DataFrame({"id": range(len(left_ts)), "ts": sorted(left_ts)}).sort_values("ts"),
        pd.DataFrame({"rts": sorted(right_ts), "val": [t * 2.0 for t in sorted(right_ts)]}),
        left_on="ts",
        right_on="rts",
        direction=direction,
    )
    got_map = dict(zip(got["ts"], got["val_asof"]))
    exp_map = dict(zip(expected["ts"], expected["val"]))
    for ts in set(left_ts):
        g, e = got_map[ts], exp_map[ts]
        assert (pd.isna(g) and pd.isna(e)) or g == e


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SLOW
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_random_graphs(spark, edges):
    """Any random multigraph: star-contraction result == union-find."""
    from graphsense_blocksci_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        (r["node"], r["component"]) for r in connected_components(df).collect()
    }
    want = set(_uf([(a, b) for a, b in edges if a != b]).items())
    assert got == want


@SLOW
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=25,
    ),
    iterations=st.integers(min_value=1, max_value=3),
)
def test_label_propagation_random_graphs(spark, edges, iterations):
    """Synchronized LPA == the textbook per-round rule (most frequent
    neighbor label, min-label tie-break, simultaneous update) on
    random graphs."""
    from collections import Counter

    from graphsense_blocksci_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        (r["node"], r["label"])
        for r in label_propagation(df, iterations=iterations).collect()
    }
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(iterations):
        labels = {
            n: min(
                Counter(labels[m] for m in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    assert got == set(labels.items())


@SLOW
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    ),
    seeds=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=3),
    max_hops=st.integers(min_value=0, max_value=4),
)
def test_bfs_reachability_random_graphs(spark, edges, seeds, max_hops):
    """Frontier BFS == textbook BFS levels on random directed graphs."""
    from collections import deque

    from graphsense_blocksci_spark.operators.graph import bfs_reachability

    e_df = spark.createDataFrame(edges, "src: long, dst: long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node: long")
    got = {
        (r["node"], r["hops"])
        for r in bfs_reachability(e_df, s_df, max_hops=max_hops).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert got == set(dist.items())


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # doc_id (may dup)
            st.integers(min_value=0, max_value=500),  # n_tokens
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=64),
    n_buckets=st.integers(min_value=1, max_value=9),
)
def test_sequence_packing_matches_python_reference(spark, rows, budget, n_buckets):
    from graphsense_blocksci_spark.operators.packing import sequence_packing

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["offset"], r["start_bin"], r["end_bin"])
        for r in sequence_packing(
            df, budget=budget, n_buckets=n_buckets
        ).collect()
    }
    off = 0
    for doc_id, n in sorted(rows):
        start = off // budget
        end = (off + n - 1) // budget if n > 0 else start
        assert got[doc_id] == (off, start, end)
        off += n


@SLOW
@given(
    sets=st.lists(
        st.frozensets(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=12
        ),
        min_size=2,
        max_size=8,
    ),
    threshold=st.sampled_from([40, 60, 80, 100]),
)
def test_jaccard_join_never_misses_a_pair(spark, sets, threshold):
    """Prefix-filter completeness under random sets: every pair at or
    above the threshold must be emitted with its exact intersection."""
    import itertools

    from graphsense_blocksci_spark.operators.setsim import jaccard_join

    rows = [(i, [str(x) for x in sorted(s)]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = {
        (r.id_a, r.id_b): r.inter
        for r in jaccard_join(
            df, "id", "toks", threshold_pct=threshold
        ).collect()
    }
    want = {}
    for (a, sa), (b, sb) in itertools.combinations(enumerate(sets), 2):
        inter = len(sa & sb)
        union = len(sa | sb)
        if 100 * inter >= threshold * union:
            want[(a, b)] = inter
    assert got == want


@SLOW
@given(
    sigs=st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1),
        min_size=2,
        max_size=10,
    ),
    d=st.sampled_from([1, 2, 3, 5]),
)
def test_simhash_pigeonhole_never_misses_a_pair(spark, sigs, d):
    import itertools

    from graphsense_blocksci_spark.operators.text_dedup import (
        simhash_hamming_join,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_hamming_join(df, max_hamming=d).collect()
    }
    want = {
        (a, b): bin(sa ^ sb).count("1")
        for (a, sa), (b, sb) in itertools.combinations(enumerate(sigs), 2)
        if bin(sa ^ sb).count("1") <= d
    }
    assert got == want


@SLOW
@given(
    words=st.lists(
        st.text(
            alphabet="abc#01", min_size=0, max_size=8
        ),
        min_size=2,
        max_size=10,
    ),
)
def test_edit_distance_join_never_misses_a_pair(spark, words):
    """FastSS deletion-blocking completeness under random short
    strings: every pair at Levenshtein distance <= 1 must be emitted
    with its exact distance (the pigeonhole argument over deletion
    variants, including empty strings and duplicates)."""
    import itertools

    from graphsense_blocksci_spark.operators.stringsim import (
        edit_distance_join,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_join(df, "s", "id", max_dist=1).collect()
    }
    want = {
        (a, b): lev(wa, wb)
        for (a, wa), (b, wb) in itertools.combinations(enumerate(words), 2)
        if lev(wa, wb) <= 1
    }
    assert got == want
