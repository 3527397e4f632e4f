"""Round-10 wave tests: distributed-ntile equivalence for the RFM
segmentation, Theil-Sen vs a pure-Python reference, supply-velocity
and balance-band invariants, the coinjoin merge audit's exclusion
contract, and an independent union-find recompute of the entity-
adjusted volume."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_rfm_distributed_ntile_matches_native_ntile(spark):
    """q323's two-phase ((rn-1)*5) DIV n + 1 formula must equal
    Spark's own ntile(5) on the identical total order — checked for
    every customer on all three metric orders via the full segment
    frame (a mismatch on ANY metric changes some segment count)."""
    from graphsense_blocksci_spark.queries import _cents, q323_rfm_segmentation
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        r["segment"]: (r["n_customers"], r["monetary_cents"])
        for r in q323_rfm_segmentation(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_date"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(_cents("o_totalprice")).alias("monetary"),
    )
    gmax = base.agg(F.max("last_date").alias("gmax"))
    feat = base.crossJoin(F.broadcast(gmax)).select(
        "o_custkey",
        F.datediff("gmax", "last_date").cast("long").alias("recency_days"),
        "freq",
        "monetary",
    )
    native = feat.select(
        "o_custkey",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("freq"), F.asc("o_custkey")))
        .alias("f"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m"),
    )
    want: dict[int, list[int]] = {}
    for r in native.collect():
        seg = r["r"] * 100 + r["f"] * 10 + r["m"]
        cur = want.setdefault(seg, [0, 0])
        cur[0] += 1
        cur[1] += r["monetary"]
    assert got == {k: tuple(v) for k, v in want.items()}


def test_theil_sen_vs_python_reference(spark):
    """Lower-median-of-pairwise-slopes recomputed in pure Python from
    the same monthly rollup."""
    from graphsense_blocksci_spark.queries import _cents, q322_theil_sen
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        r["n_name"]: (r["n_pairs"], r["theil_sen_mcents"])
        for r in q322_theil_sen(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
            ).alias("m"),
        )
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
        .collect()
    )
    series: dict[str, list[tuple[int, int]]] = {}
    for r in monthly:
        series.setdefault(r["n_name"], []).append((r["m"], r["rev"]))
    want = {}
    for name, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                q, rem = divmod(dy * 1000, dx)
                # Python divmod floors; Spark DIV truncates toward 0
                if q < 0 and rem != 0:
                    q += 1
                slopes.append((q, pts[i][0], pts[j][0]))
        slopes.sort()
        k = (len(slopes) + 1) // 2
        want[name] = (len(slopes), slopes[k - 1][0])
    assert got == want


def test_supply_velocity_invariants(spark):
    """Supply is monotone nondecreasing; velocity_ppm equals the
    floored ratio recomputed in Python; minted+moved partition each
    day's output value."""
    from graphsense_blocksci_spark.queries import qd86_supply_velocity

    rows = sorted(
        qd86_supply_velocity(spark, SF).collect(), key=lambda r: r["day"]
    )
    assert rows, "fixture chain must produce at least one day"
    prev_supply = 0
    run = 0
    for r in rows:
        run += r["minted_value"]
        assert r["supply"] == run
        assert r["supply"] >= prev_supply
        prev_supply = r["supply"]
        assert r["velocity_ppm"] == (r["moved_value"] * 1_000_000) // r["supply"]


def test_balance_band_census_partitions_ledger(spark):
    """Bands partition the address ledger: per-band min/max sit inside
    [10^(band-1), 10^band) for positive bands, and the band totals sum
    to the ledger's total balance."""
    from graphsense_blocksci_spark.operators.linkage import address_balances
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd87_balance_band_census,
    )

    rows = qd87_balance_band_census(spark, SF).collect()
    _, raw_txs, _ = _fixture_frames(spark)
    ledger = address_balances(raw_txs).agg(
        F.count(F.lit(1)).alias("n"), F.sum("balance").alias("total")
    ).first()
    assert sum(r["n_addresses"] for r in rows) == ledger["n"]
    assert sum(r["total_balance"] for r in rows) == ledger["total"]
    for r in rows:
        if r["band"] == 0:
            assert r["max_balance"] <= 0
        else:
            assert 10 ** (r["band"] - 1) <= r["min_balance"]
            assert r["max_balance"] < 10 ** r["band"]


def test_coinjoin_merge_audit_counts_every_coinjoin(spark):
    """Histogram mass equals the number of coinjoin txs with at least
    one renderable input, independently recounted via the B5 heuristic
    column; a coinjoin spanning one entity merges nothing (>= 1)."""
    from graphsense_blocksci_spark.functions.coinjoin import is_coinjoin
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd88_coinjoin_merge_audit,
    )

    rows = qd88_coinjoin_merge_audit(spark, SF).collect()
    _, raw_txs, _ = _fixture_frames(spark)
    n_cj = (
        raw_txs.filter(~F.col("coinbase"))
        .filter(is_coinjoin("inputs", "outputs"))
        .filter(
            F.exists("inputs", lambda i: F.size(i["address"]) > 0)
        )
        .count()
    )
    assert sum(r["n_coinjoin_txs"] for r in rows) == n_cj
    assert n_cj > 0, "fixture must contain coinjoin-shaped txs"
    assert all(r["n_entities_merged"] >= 1 for r in rows)


def test_adjusted_volume_vs_union_find(spark):
    """Full recompute of qd89 with a pure-Python union-find over the
    fixture: same clustering heuristic (co-spent addresses merge),
    same self-churn rule (output entity present on the tx's input
    side), same day rollup."""
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd89_adjusted_volume,
    )

    got = {
        r["day"]: (r["raw_value"], r["self_churn_value"], r["adjusted_value"])
        for r in qd89_adjusted_volume(spark, SF).collect()
    }
    _, raw_txs, _ = _fixture_frames(spark)
    txs = raw_txs.filter(~F.col("coinbase")).select(
        "tx_id", "timestamp", "inputs", "outputs"
    ).collect()

    parent: dict[str, str] = {}

    def find(a: str) -> str:
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    def render(io) -> str | None:
        addrs = io["address"]
        return "|".join(addrs) if addrs else None

    for t in txs:
        in_addrs = sorted({a for a in map(render, t["inputs"]) if a})
        for a, b in zip(in_addrs, in_addrs[1:]):
            union(a, b)
    want: dict[int, list[int]] = {}
    for t in txs:
        day = int(t["timestamp"]) // 86400
        in_ents = {find(a) for a in map(render, t["inputs"]) if a}
        cur = want.setdefault(day, [0, 0, 0])
        for o in t["outputs"]:
            addr = render(o)
            if addr is None:
                continue
            cur[0] += o["value"]
            # an address never seen as an input is its own entity
            ent = find(addr) if addr in parent else addr
            if ent in in_ents:
                cur[1] += o["value"]
        cur[2] = cur[0] - cur[1]
    assert got == {k: tuple(v) for k, v in want.items()}


def test_dedup_influx_monitor_day_partition(spark):
    """Every doc lands in exactly one day row; dups + first_seen =
    docs per day; dup_ppm is the floored ratio."""
    from graphsense_blocksci_spark.queries import q324_dedup_influx_monitor
    from graphsense_blocksci_spark.sources.tables import load_table

    rows = q324_dedup_influx_monitor(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_dups"] + r["n_first_seen"] == r["n_docs"]
        assert r["dup_ppm"] == r["n_dups"] * 1_000_000 // r["n_docs"]


def test_ngram_diversity_bounds(spark):
    """distinct <= total per (source, n); unigram totals equal the
    corpus token count per source; ppm is the floored ratio."""
    from graphsense_blocksci_spark.operators.textops import tokens
    from graphsense_blocksci_spark.queries import q325_ngram_diversity
    from graphsense_blocksci_spark.sources.tables import load_table

    rows = q325_ngram_diversity(spark, SF).collect()
    tok_counts = {
        r["source"]: r["n_toks"]
        for r in load_table(spark, SF, "documents")
        .select("source", F.size(tokens("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_toks"))
        .collect()
    }
    seen = set()
    for r in rows:
        seen.add((r["source"], r["n"]))
        assert 1 <= r["distinct_ngrams"] <= r["total_ngrams"]
        assert (
            r["distinct_ppm"]
            == r["distinct_ngrams"] * 1_000_000 // r["total_ngrams"]
        )
        if r["n"] == 1:
            assert r["total_ngrams"] == tok_counts[r["source"]]
    assert len({s for s, _ in seen}) == len(tok_counts)
    assert {n for _, n in seen} == {1, 2, 3}


def _unit(vec):
    s = 0.0
    for x in vec:
        x = float(x)
        s = s + x * x
    nrm = s ** 0.5
    return [float(x) / nrm for x in vec]


def _pydot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_mmr_rerank_vs_python_greedy(spark):
    """Pure-Python greedy MMR from the same unit vectors — Python
    floats are IEEE doubles and the loops reproduce the fixed-order
    folds, so equality is exact, not approximate."""
    from graphsense_blocksci_spark.queries import q326_mmr_rerank
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        (r["vec_id"], r["mmr_rank"]): (r["neighbor_id"], r["rel"], r["mmr_score"])
        for r in q326_mmr_rerank(spark, SF).collect()
    }
    vecs = {
        r["vec_id"]: _unit(r["embedding"])
        for r in load_table(spark, SF, "embeddings").collect()
    }
    want = {}
    for q in [i for i in sorted(vecs) if i % 100 == 0]:
        rels = sorted(
            ((-_pydot(vecs[q], vecs[n]), n) for n in vecs if n != q),
        )[:10]
        cand = {n: -negrel for negrel, n in rels}
        sel = []
        first = min(cand, key=lambda n: (-cand[n], n))
        sel.append(first)
        want[(q, 1)] = (first, cand[first], cand[first])
        for r in range(2, 6):
            best = None
            for n in cand:
                if n in sel:
                    continue
                maxsim = max(_pydot(vecs[n], vecs[s]) for s in sel)
                score = 0.7 * cand[n] - 0.3 * maxsim
                key = (-score, n)
                if best is None or key < best[0]:
                    best = (key, n, score)
            sel.append(best[1])
            want[(q, r)] = (best[1], cand[best[1]], best[2])
    assert got == want


def test_triplet_mining_vs_python(spark):
    """Within-batch hardest positive / hardest negative recomputed in
    Python from the same unit vectors; exact double equality."""
    from graphsense_blocksci_spark.queries import q327_triplet_mining
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        r["vec_id"]: (
            r["pos_id"], r["pos_sim"], r["neg_id"], r["neg_sim"],
            r["margin_violation"],
        )
        for r in q327_triplet_mining(spark, SF).collect()
    }
    rows = load_table(spark, SF, "embeddings").collect()
    vecs = {r["vec_id"]: _unit(r["embedding"]) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    want = {}
    for a in vecs:
        batch = [b for b in vecs if b // 256 == a // 256]
        pos = [
            (_pydot(vecs[a], vecs[b]), b)
            for b in batch
            if b != a and labels[b] == labels[a]
        ]
        neg = [
            (_pydot(vecs[a], vecs[b]), b)
            for b in batch
            if b != a and labels[b] != labels[a]
        ]
        if not pos or not neg:
            continue
        ps, pid = min(pos, key=lambda t: (t[0], t[1]))
        ns, nid = max(neg, key=lambda t: (t[0], -t[1]))
        want[a] = (pid, ps, nid, ns, ns + 0.2 > ps)
    assert got == want


def test_address_type_migration_vs_python(spark):
    """Full per-tx proportional-attribution recompute: per-type input
    and output sums, flow = out_d * in_s // total_in, matrix rollup."""
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd90_address_type_migration,
    )

    got = {
        (r["src_type"], r["dst_type"]): (r["n_txs"], r["total_flow"])
        for r in qd90_address_type_migration(spark, SF).collect()
    }
    _, raw_txs, _ = _fixture_frames(spark)
    txs = raw_txs.filter(~F.col("coinbase")).select(
        "tx_id", "inputs", "outputs"
    ).collect()
    agg: dict[tuple[int, int], list[int]] = {}
    for t in txs:
        ins: dict[int, int] = {}
        for i in t["inputs"]:
            ins[i["address_type"]] = ins.get(i["address_type"], 0) + i["value"]
        outs: dict[int, int] = {}
        for o in t["outputs"]:
            outs[o["address_type"]] = outs.get(o["address_type"], 0) + o["value"]
        total_in = sum(ins.values())
        for s, iv in ins.items():
            for d, ov in outs.items():
                cur = agg.setdefault((s, d), [set(), 0])
                cur[0].add(t["tx_id"])
                cur[1] += ov * iv // total_in
    want = {k: (len(v[0]), v[1]) for k, v in agg.items()}
    assert got == want


def test_streaming_dedup_rate_equals_batch_monitor(spark):
    """qd91's five-micro-batch incremental fold must reproduce q324's
    whole-corpus monitor row for row — the twin-equality contract."""
    from graphsense_blocksci_spark.queries import (
        q324_dedup_influx_monitor,
        qd91_streaming_dedup_rate,
    )

    batch = {
        r["day"]: (r["n_docs"], r["n_dups"], r["n_first_seen"], r["dup_ppm"])
        for r in q324_dedup_influx_monitor(spark, SF).collect()
    }
    stream = {
        r["day"]: (r["n_docs"], r["n_dups"], r["n_first_seen"], r["dup_ppm"])
        for r in qd91_streaming_dedup_rate(spark, SF).collect()
    }
    assert stream == batch


def test_conformal_intervals_vs_python(spark):
    """q_hat must be the exact k-th smallest calibration residual with
    k = ceil(0.9*(n_cal+1)) clamped to n_cal, and coverage the exact
    test-split count — recomputed in Python from the same split."""
    import hashlib

    from graphsense_blocksci_spark.queries import (
        _cents,
        q328_conformal_intervals,
    )
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        r["n_name"]: (
            r["n_train"], r["n_cal"], r["n_test"], r["pred"], r["q_hat"],
            r["n_covered"], r["coverage_ppm"],
        )
        for r in q328_conformal_intervals(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_orderkey", _cents("o_totalprice").alias("y"))
        .collect()
    )
    per: dict[str, list[tuple[int, int, int]]] = {}
    for r in rows:
        bkt = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:4], 16) % 4
        per.setdefault(r["n_name"], []).append((bkt, r["o_orderkey"], r["y"]))
    want = {}
    for name, items in per.items():
        train = sorted(y for b, _, y in items if b <= 1)
        calr = [(b, k, y) for b, k, y in items if b == 2]
        test = [y for b, _, y in items if b == 3]
        if not train or not calr or not test:
            continue
        # quantile_cont(0.5) == linear-interpolated median
        m = len(train)
        if m % 2:
            pred = float(train[m // 2])
        else:
            pred = (train[m // 2 - 1] + train[m // 2]) / 2.0
        res = sorted((abs(y - pred), k) for _, k, y in calr)
        n_cal = len(res)
        k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
        q_hat = res[k - 1][0]
        covered = sum(1 for y in test if abs(y - pred) <= q_hat)
        want[name] = (
            len(train), n_cal, len(test), pred, q_hat,
            covered, covered * 1_000_000 // len(test),
        )
    assert got == want
