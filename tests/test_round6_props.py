"""Randomized reference tests for the round-6 operators: seeded
pseudo-random instances checked against independent pure-Python
references (deterministic seeds — reproducible, no flake)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _tarjan_scc(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; labels every SCC by its minimum member id."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        nodes.add(u)
        nodes.add(v)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    sccs: list[list[int]] = []
    counter = [0]

    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on_stack.add(node)
            recurse = False
            neighbors = adj.get(node, [])
            for i in range(pi, len(neighbors)):
                w = neighbors[i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(comp)
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
    out = {}
    for comp in sccs:
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def test_scc_random_digraphs_vs_tarjan(spark):
    from graphsense_blocksci_spark.operators.graph import (
        strongly_connected_components,
    )

    for seed in (1, 7, 42, 99):
        rng = random.Random(seed)
        n = rng.randint(6, 12)
        m = rng.randint(n, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        want = _tarjan_scc(n, edges)
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.component
            for r in strongly_connected_components(e).collect()
        }
        assert got == want, (seed, sorted(edges))


def test_containment_join_random_vs_bruteforce(spark):
    from graphsense_blocksci_spark.operators.setsim import containment_join

    for seed in (3, 17, 55):
        rng = random.Random(seed)
        docs = []
        for i in range(12):
            size = rng.randint(1, 15)
            docs.append(
                (i, sorted(rng.sample(range(40), size)))
            )
        t = 70
        want = set()
        for ia, sa in docs:
            for ib, sb in docs:
                if ia == ib:
                    continue
                inter = len(set(sa) & set(sb))
                if 100 * inter >= t * len(sa):
                    want.add((ia, ib, inter, len(sa), len(sb)))
        df = spark.createDataFrame(docs, "doc_id long, gs array<long>")
        got = {
            (r.id_a, r.id_b, r.inter, r.n_a, r.n_b)
            for r in containment_join(
                df, "doc_id", "gs", threshold_pct=t
            ).collect()
        }
        assert got == want, seed


def test_hits_random_vs_python(spark):
    """Un-normalized integer HITS must equal the plain Python
    iteration exactly (integer sums both sides)."""
    from graphsense_blocksci_spark.operators.graph import hits

    for seed in (5, 23):
        rng = random.Random(seed)
        n = rng.randint(4, 9)
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(n, 2 * n))
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        h = {v: 1 for v in nodes}
        a = {}
        for _ in range(2):
            a = {v: 0 for v in nodes}
            for u, v in edges:
                a[v] += h[u]
            h = {v: 0 for v in nodes}
            for u, v in edges:
                h[u] += a[v]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.authority, r.hub)
            for r in hits(df, iterations=2).collect()
        }
        assert got == {v: (a[v], h[v]) for v in nodes}, seed
