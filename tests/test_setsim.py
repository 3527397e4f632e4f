"""Prefix-filtered Jaccard join and inverted-index TF-cosine join
(operators/setsim.py): completeness vs a brute-force all-pairs
reference is THE property — the prefix filter must never lose a
qualifying pair."""

from __future__ import annotations

import itertools
import math

import pytest


def _brute_jaccard(sets: dict[int, set], t: float):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = inter
    return out


def test_jaccard_join_complete_vs_bruteforce(spark):
    from graphsense_blocksci_spark.operators.setsim import jaccard_join

    # clusters of near-identical sets + noise; includes sets sharing
    # ONLY frequent tokens (the case a naive rare-token heuristic
    # would lose) and identical twins.
    base = ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"]
    rows = [
        (1, base),
        (2, base[:9] + ["z"]),          # jaccard 9/11
        (3, base),                       # identical twin of 1
        (4, ["a", "b", "c"]),
        (5, ["a", "b", "c", "d"]),      # 3/4 vs doc 4
        (6, ["x", "y"]),
        (7, ["x", "y"]),                 # twin on frequent-only tokens
        (8, ["q"]),
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = {
        (r.id_a, r.id_b): r.inter
        for r in jaccard_join(df, "id", "toks", threshold_pct=70).collect()
    }
    want = _brute_jaccard({i: set(t) for i, t in rows}, 0.7)
    assert got == want
    # sanity: the planted pairs are present
    assert (1, 3) in got and (6, 7) in got and (2, 3) in got


def test_jaccard_join_threshold_exactness(spark):
    from graphsense_blocksci_spark.operators.setsim import jaccard_join

    # jaccard exactly at the threshold boundary must be INCLUDED
    # (>=): 3 common of 5 union = 0.6
    rows = [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "e"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = jaccard_join(df, "id", "toks", threshold_pct=60).collect()
    assert len(got) == 1 and got[0].inter == 3
    assert got[0].jaccard == pytest.approx(0.6, abs=1e-12)
    # one notch above the ratio -> excluded
    assert (
        jaccard_join(df, "id", "toks", threshold_pct=61).count() == 0
    )


def test_tf_cosine_join_matches_python(spark):
    from collections import Counter

    from graphsense_blocksci_spark.operators.setsim import tf_cosine_join

    corp = {
        1: ["w", "w", "x", "y"],
        2: ["w", "w", "x", "z"],
        3: ["p", "q"],
        4: ["p", "q", "q"],
        5: ["only"],
    }
    rows = [(i, t) for i, t in corp.items()]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tf_cosine_join(df, "id", "toks", threshold_pct=50).collect()
    }

    def cos(a, b):
        ca, cb = Counter(corp[a]), Counter(corp[b])
        dot = sum(ca[t] * cb[t] for t in ca)
        return dot / math.sqrt(
            sum(v * v for v in ca.values()) * sum(v * v for v in cb.values())
        )

    want = {
        (a, b): cos(a, b)
        for a, b in itertools.combinations(sorted(corp), 2)
        if cos(a, b) >= 0.5
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_tf_cosine_max_df_prunes_stopwords(spark):
    from graphsense_blocksci_spark.operators.setsim import tf_cosine_join

    # 'the' appears in every doc; with max_df=2 it drops out and the
    # docs share nothing -> no pairs; without the cap they all pair up
    rows = [(1, ["the", "a"]), (2, ["the", "b"]), (3, ["the", "c"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    assert tf_cosine_join(df, "id", "toks", threshold_pct=40).count() == 3
    assert (
        tf_cosine_join(df, "id", "toks", threshold_pct=40, max_df=2).count()
        == 0
    )


def test_modularity_two_cliques(spark):
    from graphsense_blocksci_spark.operators.graph import modularity

    # two 3-cliques joined by one bridge: textbook Q = 2*(3/7 - (7/14)^2)
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)],
        "node long, label long",
    )
    rows = {r.label: r for r in modularity(e, labels).collect()}
    m = 7
    for c in (0, 1):
        r = rows[c]
        assert r.n_nodes == 3 and r.e_in == 3 and r.d_tot == 7
        assert r.q_num == 4 * m * 3 - 49
        assert r.q_contrib == (4 * m * 3 - 49) / (4 * m * m)
    q_total = sum(r.q_num for r in rows.values()) / (4 * m * m)
    assert q_total == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-12)


def test_modularity_dedups_direction_and_selfloops(spark):
    from graphsense_blocksci_spark.operators.graph import modularity

    # duplicated + reversed + self-loop edges collapse to ONE edge
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0)], "node long, label long"
    )
    r = modularity(e, labels).collect()
    assert len(r) == 1
    assert r[0].e_in == 1 and r[0].d_tot == 2
    # single community holds all edges: Q = e/m - (d/2m)^2 = 1 - 1 = 0
    assert r[0].q_num == 4 * 1 * 1 - 4 == 0


def test_two_hop_counts_small_graph(spark):
    from graphsense_blocksci_spark.operators.graph import two_hop_counts

    # 1->2->3, 1->3 (3 is direct: excluded), 2->4, 3->1 (cycle back to
    # source: excluded for node 1 via s != y)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 1)],
        "src long, dst long",
    )
    got = {r.node: r.n_two_hop for r in two_hop_counts(e).collect()}
    # node 1: via 2 -> {3 (direct, drop), 4 (keep)}; via 3 -> {1 self, drop} => 1
    # node 2: via 3 -> {1} => 1 ; node 3: via 1 -> {2, 3-self} => 1
    assert got == {1: 1, 2: 1, 3: 1}


def test_simhash_hamming_join_complete_vs_bruteforce(spark):
    from graphsense_blocksci_spark.operators.text_dedup import (
        simhash_hamming_join,
    )

    # signatures engineered so differing bits land INSIDE single
    # blocks and ACROSS blocks, at exactly d and d+1
    sigs = [
        (1, 0b0000_0000_0000_0000_0000_0000_0000_0000),
        (2, 0b0000_0000_0000_0000_0000_0000_0000_0111),  # h=3 vs 1
        (3, 0b1000_0000_0000_0000_0000_0000_0000_0011),  # h=3 vs 1, cross-block
        (4, 0b0000_0000_0000_0000_0000_0000_0000_1111),  # h=4 vs 1 (excluded)
        (5, 0b0000_0000_0000_0000_0000_0000_0000_0111),  # identical to 2
        (6, 0b1111_1111_1111_1111_1111_1111_1111_1111),
    ]
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_hamming_join(df, max_hamming=3).collect()
    }
    want = {}
    for (a, sa), (b, sb) in itertools.combinations(sigs, 2):
        h = bin(sa ^ sb).count("1")
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    assert (1, 4) not in got and got[(2, 5)] == 0 and got[(1, 3)] == 3


def test_louvain_recovers_planted_cliques(spark):
    from graphsense_blocksci_spark.operators.graph import louvain, modularity

    # ring of 4 4-cliques, one bridge each: optimum = the cliques
    edges = []
    for c in range(4):
        ns = [c * 4 + i for i in range(4)]
        edges += list(itertools.combinations(ns, 2))
        edges.append((c * 4 + 3, ((c + 1) % 4) * 4))
    e = spark.createDataFrame(edges, "src long, dst long")
    out = louvain(e, sub_rounds=4, levels=2).collect()
    comms = {}
    for r in out:
        comms.setdefault(r.community, set()).add(r.node)
    assert sorted(sorted(v) for v in comms.values()) == [
        [0, 1, 2, 3],
        [4, 5, 6, 7],
        [8, 9, 10, 11],
        [12, 13, 14, 15],
    ]
    # exact modularity of the recovered partition beats singletons (0-)
    labels = spark.createDataFrame(
        [(r.node, r.community) for r in out], "node long, label long"
    )
    m = len(edges)
    q = sum(r.q_num for r in modularity(e, labels).collect()) / (4 * m * m)
    assert q > 0.5  # planted-partition quality


def test_louvain_two_cliques_optimal_and_deterministic(spark):
    from graphsense_blocksci_spark.operators.graph import louvain, modularity

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r.node, r.community) for r in louvain(e).collect())
    b = sorted((r.node, r.community) for r in louvain(e).collect())
    assert a == b  # bit-reproducible
    assert a == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)]
    labels = spark.createDataFrame(a, "node long, label long")
    q = sum(r.q_num for r in modularity(e, labels).collect()) / (4 * 49)
    assert q == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-12)


def test_louvain_weighted_edges_flip_the_partition(spark):
    from graphsense_blocksci_spark.operators.graph import louvain

    # a 4-cycle with two heavy opposite edges: communities follow weight
    e = spark.createDataFrame(
        [(1, 2, 10), (3, 4, 10), (2, 3, 1), (4, 1, 1)],
        "src long, dst long, w long",
    )
    out = {r.node: r.community for r in louvain(e, weight_col="w").collect()}
    assert out[1] == out[2] and out[3] == out[4] and out[1] != out[3]


def test_span_dedup_rewrite_removes_later_copies(spark):
    from graphsense_blocksci_spark.operators.text_dedup import (
        span_dedup_rewrite,
    )

    # span size 3: doc 1 owns "a b c"; doc 2 repeats it (dropped) and
    # keeps its own tail span; doc 3 is entirely a copy -> empty
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "a b c"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in span_dedup_rewrite(docs, span_tokens=3).collect()}
    assert out[1].new_text == "a b c d e f" and out[1].n_kept == 2
    assert out[2].new_text == "x y z" and out[2].n_kept == 1
    assert out[3].new_text == "" and out[3].n_kept == 0 and out[3].n_spans == 1
    assert 4 not in out  # empty docs have no spans at all
    # total kept spans == distinct spans in the corpus
    # ("a b c", "d e f", "x y z")
    assert sum(r.n_kept for r in out.values()) == 3


def test_span_dedup_rewrite_partial_tail_span(spark):
    from graphsense_blocksci_spark.operators.text_dedup import (
        span_dedup_rewrite,
    )

    # 7 tokens at span 3 -> spans of 3,3,1; the 1-token tail is its own
    # dedup unit
    docs = spark.createDataFrame(
        [(1, "p q r s t u v"), (2, "v")], "doc_id long, text string"
    )
    out = {r.id: r for r in span_dedup_rewrite(docs, span_tokens=3).collect()}
    assert out[1].n_spans == 3 and out[1].new_text == "p q r s t u v"
    assert out[2].n_kept == 0  # "v" already owned by doc 1's tail


def _brandes_ref(edges, seeds, max_hops):
    """Hop-bounded Brandes reference: truncated BFS sigma + level-wise
    dependency accumulation, mirroring the operator's contract."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in edges:
        if (u, v) not in [(a, b) for a, b in []]:
            pass
    eset = sorted(set(edges))
    for u, v in eset:
        adj[u].append(v)
    bet = defaultdict(float)
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for u, v in eset:
                if v == w and u in dist and dist[u] == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v in order:
            if v != s:
                bet[v] += delta[v]
    return dict(bet)


def test_path_counts_diamond(spark):
    from graphsense_blocksci_spark.operators.graph import bfs_path_counts

    # diamond: 1->2, 1->3, 2->4, 3->4 => sigma(4) = 2
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        (r.source, r.node): (r.dist, r.sigma)
        for r in bfs_path_counts(e, seeds, max_hops=3).collect()
    }
    assert got == {
        (1, 1): (0, 1),
        (1, 2): (1, 1),
        (1, 3): (1, 1),
        (1, 4): (2, 2),
    }


def test_betweenness_matches_python_reference(spark):
    import pytest as _pt

    from graphsense_blocksci_spark.operators.graph import betweenness_sampled

    # two diamonds chained + a side chain; all nodes as sources
    edges = [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 7), (6, 7),
        (7, 8), (9, 1),
    ]
    nodes = sorted({x for e_ in edges for x in e_})
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(n,) for n in nodes], "node long")
    got = {
        r.node: r.betweenness
        for r in betweenness_sampled(e, seeds, max_hops=4).collect()
    }
    want = _brandes_ref(edges, nodes, max_hops=4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == _pt.approx(want[k], abs=1e-9)
    # the diamond midpoint 4 must dominate
    assert got[4] == max(got.values())


def test_betweenness_pair_counting_matches_brandes(spark):
    """The oracle-exact pair-counting identity (q169's round-11 path)
    agrees with both the pure-Python Brandes reference and the
    level-accumulation operator to 1e-9 on the same graph — the
    telescoped Σ σ_sv·P_vt/σ_st really is the same quantity."""
    import pytest as _pt

    from graphsense_blocksci_spark.operators.graph import (
        betweenness_pair_counting,
        betweenness_sampled,
    )

    edges = [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 7), (6, 7),
        (7, 8), (9, 1),
    ]
    nodes = sorted({x for e_ in edges for x in e_})
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(n,) for n in nodes], "node long")
    got = {
        r.node: r.betweenness
        for r in betweenness_pair_counting(e, seeds, max_hops=4).collect()
    }
    want = _brandes_ref(edges, nodes, max_hops=4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == _pt.approx(want[k], abs=1e-9)
    twin = {
        r.node: r.betweenness
        for r in betweenness_sampled(e, seeds, max_hops=4).collect()
    }
    for k in twin:
        assert got[k] == _pt.approx(twin[k], abs=1e-9)
