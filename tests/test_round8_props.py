"""Round-8 operator tests: the adaptive Fellegi-Sunter top-k (tier
descent must equal the naive all-block-pairs plan bit-for-bit, and the
max_block contract must raise instead of materializing an oversized
coarse tier) and the sampled LSH quality audit."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _naive_topk(rows, k):
    """Pure-Python reference: all within-(nation,seg) pairs, scored,
    top-k by (score desc, key_a, key_b)."""
    pairs = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if (a[1], a[2]) != (b[1], b[2]):
                continue
            ka, kb = min(a[0], b[0]), max(a[0], b[0])
            agree_f1 = a[3] == b[3]
            agree_f2 = a[4] == b[4]
            score = (24 if agree_f1 else -8) + (18 if agree_f2 else -6)
            pairs.append((ka, kb, agree_f1, agree_f2, score))
    pairs.sort(key=lambda p: (-p[4], p[0], p[1]))
    return pairs[:k]


@pytest.mark.parametrize("seed,n,k", [(11, 60, 10), (23, 120, 40), (5, 30, 500)])
def test_fellegi_sunter_topk_vs_naive(spark, seed, n, k):
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randint(0, 3),          # nation
            rng.choice(["A", "B"]),     # segment
            rng.randint(0, 4),          # field 1 (bal bucket)
            rng.randint(0, 6),          # field 2 (synth id)
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, nation long, seg string, f1 long, f2 long"
    )
    got = [
        (r["key_a"], r["key_b"], r["agree_f1"], r["agree_f2"], r["score"])
        for r in fellegi_sunter_topk(
            df,
            block_cols=("nation", "seg"),
            fields=(("f1", 24, -8), ("f2", 18, -6)),
            k=k,
        ).collect()
    ]
    # the operator's output is already in (score desc, key_a, key_b)
    # order; k > total pairs must return every pair
    assert got == _naive_topk(rows, k)


@pytest.mark.parametrize("seed,n,k", [(7, 60, 15), (41, 90, 40)])
def test_fellegi_sunter_topk_nullable_fields(spark, seed, n, k):
    """NULL==NULL agrees: with nullable block and compared columns the
    null-safe joins must keep materialization consistent with the
    groupBy-based pattern counting (the round-8 ADVICE silent-wrong
    mode: equality joins dropped NULL pairs while counts included
    them, so the descent could stop early with pairs missing)."""
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.choice([None, 0, 1, 2]),            # nullable block col
            rng.choice(["A", "B", None]),            # nullable block col
            rng.choice([None, 0, 1, 2, 3]),          # nullable field 1
            rng.choice([None, 0, 1, 2, 3, 4, 5]),    # nullable field 2
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, nation long, seg string, f1 long, f2 long"
    )
    got = [
        (r["key_a"], r["key_b"], r["agree_f1"], r["agree_f2"], r["score"])
        for r in fellegi_sunter_topk(
            df,
            block_cols=("nation", "seg"),
            fields=(("f1", 24, -8), ("f2", 18, -6)),
            k=k,
        ).collect()
    ]
    # _naive_topk compares python tuples where None == None holds —
    # exactly the NULL<=>NULL semantics the operator must implement
    assert got == _naive_topk(rows, k)


def test_fellegi_sunter_topk_raises_on_oversized_block(spark):
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    # one degenerate block, every field disagreeing, so ONLY the
    # coarse (no-agreement) tier can cover k — and it is oversized
    rows = [(i, 0, "A", i, i) for i in range(30)]
    df = spark.createDataFrame(
        rows, "id long, nation long, seg string, f1 long, f2 long"
    )
    with pytest.raises(ValueError, match="max_block"):
        fellegi_sunter_topk(
            df,
            block_cols=("nation", "seg"),
            fields=(("f1", 24, -8), ("f2", 18, -6)),
            k=10,
            max_block=20,
        )


def test_fellegi_sunter_topk_fine_tier_ignores_coarse_cap(spark):
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    # same oversized (nation, seg) block — 30 rows > max_block=20 —
    # but the fields pair rows up mod 15, so the all-agree tier has
    # 15 pairs in 2-row fine blocks and covers k on its own; the
    # oversized coarse tier is never materialized and no raise fires
    # — the whole point of the adaptive descent
    rows = [(i, 0, "A", i % 15, i % 15) for i in range(30)]
    df = spark.createDataFrame(
        rows, "id long, nation long, seg string, f1 long, f2 long"
    )
    out = fellegi_sunter_topk(
        df,
        block_cols=("nation", "seg"),
        fields=(("f1", 24, -8), ("f2", 18, -6)),
        k=10,
        max_block=20,
    ).collect()
    assert len(out) == 10
    assert all(r["score"] == 42 for r in out)
    assert [(r["key_a"], r["key_b"]) for r in out] == [
        (i, i + 15) for i in range(10)
    ]


def test_q285_sampled_equals_complete_on_small_corpus(spark):
    # at sf0.001 the corpus is under the 2000-doc audit target, so the
    # integer cutoff saturates at 10000 and the sampled default must
    # reproduce the complete audit bit-for-bit
    from graphsense_blocksci_spark.queries import q285_lsh_quality_eval

    sf = "/root/testdata/sf0.001"
    sampled = q285_lsh_quality_eval(spark, sf).collect()
    complete = q285_lsh_quality_eval(spark, sf, complete=True).collect()
    assert sampled == complete
    assert sampled[0]["n_truth"] > 0


def test_index_daemon_reorg_is_partition_true(spark, tmp_path):
    """A reorg rollback must only touch bucket directories at or above
    the fork's bucket: every file in buckets strictly below the fork
    stays byte-identical in BOTH sinks (same path, same mtime, same
    size), while orphaned buckets disappear or are rewritten."""
    import pathlib

    from graphsense_blocksci_spark.streaming.index_daemon import (
        BLOCK_BUCKET_SIZE,
        merge_batch,
        read_index,
    )

    tx_schema = (
        "tx_id long, block_id int, coinbase boolean,"
        " inputs array<struct<address:array<string>,value:long,"
        "address_type:int,spent_tx_id:long,spent_index:long>>,"
        " outputs array<struct<address:array<string>,value:long,"
        "address_type:int>>"
    )
    # chain spanning 4 buckets: coinbase per block, one address each
    blocks = [0, 10, 30, 55, 80, 90]
    rows = [
        (i, b, True, [], [([f"A{b}"], 100 + b, 0)])
        for i, b in enumerate(blocks)
    ]
    b1 = spark.createDataFrame(rows, tx_schema)
    outputs_dir = str(tmp_path / "outputs")
    index_dir = str(tmp_path / "index")
    merge_batch(spark, b1, outputs_dir, index_dir)

    def snapshot(d):
        return {
            str(p.relative_to(d)): (p.stat().st_mtime_ns, p.stat().st_size)
            for p in pathlib.Path(d).glob("**/*.parquet")
        }

    before_out = snapshot(outputs_dir)
    before_idx = snapshot(index_dir)
    assert any("blk_bucket=0" in k for k in before_out)
    assert any("blk_bucket=3" in k for k in before_out)

    # competing chain from block 80: bucket 3 forks, buckets 0-2 must
    # not be touched
    b2 = spark.createDataFrame(
        [(100, 80, True, [], [(["Z"], 777, 0)])], tx_schema
    )
    merge_batch(spark, b2, outputs_dir, index_dir)

    fork_bucket = 80 // BLOCK_BUCKET_SIZE
    after_out = snapshot(outputs_dir)
    after_idx = snapshot(index_dir)
    for snap_before, snap_after in ((before_out, after_out),
                                    (before_idx, after_idx)):
        for path, sig in snap_before.items():
            bucket = int(path.split("blk_bucket=")[1].split("/")[0])
            if bucket < fork_bucket:
                assert snap_after.get(path) == sig, path
            else:
                assert snap_after.get(path) != sig, path

    # and the logical result is the post-reorg chain
    idx = read_index(spark, index_dir)
    got = {
        (r["addr"], r["block_id"], r["received_value"])
        for r in idx.collect()
    }
    assert ("Z", 80, 777) in got
    assert not any(b >= 80 and a != "Z" for a, b, _ in got)
    assert ("A55", 55, 155) in got


def test_kmeans_quantized_matches_float_on_separated_blobs(spark):
    """On well-separated blobs the 1e-6 quantization error cannot flip
    an assignment, so the integer Lloyd must agree with the float twin
    vector-for-vector (and its dist_sq must be the quantized integer)."""
    import random

    from graphsense_blocksci_spark.operators.clustering import (
        kmeans_lloyd,
        kmeans_lloyd_quantized,
    )

    rng = random.Random(42)
    dim = 8
    centers = [[10.0 * c + 0.0] * dim for c in range(3)]
    rows = []
    vid = 0
    # seeds are the k smallest ids: give each blob one early vector
    for c in range(3):
        rows.append((vid, [centers[c][j] for j in range(dim)]))
        vid += 1
    for c in range(3):
        for _ in range(20):
            rows.append(
                (
                    vid,
                    [
                        centers[c][j] + rng.uniform(-0.5, 0.5)
                        for j in range(dim)
                    ],
                )
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fl = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_lloyd(df, k=3, n_iter=4).collect()
    }
    qt = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_lloyd_quantized(df, k=3, n_iter=4).collect()
    }
    assert fl == qt


def test_ridge_solve_exact_matches_lapack(spark):
    """The exact Cramer rationals and the float LAPACK solve are the
    same system's solution: num/den must equal numpy's beta to float
    precision, and den must be positive (ridge system is PD)."""
    import random

    from graphsense_blocksci_spark.operators.evaluation import (
        gram_matrix,
        ridge_solve,
        ridge_solve_exact,
    )

    rng = random.Random(7)
    rows = [
        (1, rng.randint(0, 50), rng.randint(0, 10), rng.randint(0, 100000))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "one long, q long, d long, y long")
    gram = gram_matrix(df, ["one", "q", "d"], "y").localCheckpoint()
    exact = ridge_solve_exact(gram, d=3, lam=1)
    lapack = ridge_solve(gram, d=3, lam=1.0)
    for (num, den), fl in zip(exact, lapack):
        assert den > 0
        assert abs(num / den - fl) <= 1e-9 * max(1.0, abs(fl))


def test_scatter_quantized_eigh_matches_pca_topk(spark):
    """eigh on the exact quantized scatter must reproduce pca_topk's
    float eigenvalues within quantization error (~1e-6 per coord)."""
    import numpy as np

    from graphsense_blocksci_spark.operators.decomposition import (
        pca_topk,
        scatter_quantized,
    )
    from graphsense_blocksci_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = scatter_quantized(emb).collect()
    d = 64
    scale = 1_000_000
    m2 = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        if r["row"] >= 0 and r["col"] >= 0:
            m2[r["row"]][r["col"]] = float(r["value"])
        elif r["row"] >= 0:
            s[r["row"]] = float(r["value"])
        else:
            n = int(r["value"])
    mu = s / n
    cov = (m2 / n - np.outer(mu, mu)) / (scale * scale)
    ev_q = np.sort(np.linalg.eigvalsh(cov))[::-1]
    ev_f = [r["eigenvalue"] for r in pca_topk(emb, k=8).collect()]
    for a, b in zip(ev_q[:8], ev_f):
        assert abs(a - b) < 1e-4, (a, b)


def test_isotonic_minimax_identity_vs_sequential_pav():
    """q307's formula fit(t) = max_{i<=t} min_{j>=i} avg(y[i..j])
    must equal sequential pool-adjacent-violators on exact Fractions,
    for random sequences (no Spark needed — this proves the math the
    engine and oracle both implement)."""
    import random
    from fractions import Fraction

    def pav(ys):
        # classic stack PAV: blocks of (sum, count), merge while
        # decreasing
        blocks = []
        for y in ys:
            s, n = Fraction(y), 1
            while blocks and Fraction(blocks[-1][0], blocks[-1][1]) >= s / n:
                ps, pn = blocks.pop()
                s, n = s + ps, n + pn
            blocks.append((s, n))
        out = []
        for s, n in blocks:
            out.extend([Fraction(s, n)] * n)
        return out

    def minimax(ys):
        n = len(ys)
        pre = [0]
        for y in ys:
            pre.append(pre[-1] + y)
        b = []
        for i in range(n):
            b.append(
                min(
                    Fraction(pre[j + 1] - pre[i], j - i + 1)
                    for j in range(i, n)
                )
            )
        out = []
        cur = None
        for i in range(n):
            cur = b[i] if cur is None else max(cur, b[i])
            out.append(cur)
        return out

    rng = random.Random(1234)
    for trial in range(30):
        ys = [rng.randint(0, 20) for _ in range(rng.randint(1, 40))]
        assert pav(ys) == minimax(ys), (trial, ys)
        # and the engine's floor-milli readout is floor(1000 * fit)
        got = [
            (1000 * f.numerator) // f.denominator for f in minimax(ys)
        ]
        want = [(1000 * f.numerator) // f.denominator for f in pav(ys)]
        assert got == want
