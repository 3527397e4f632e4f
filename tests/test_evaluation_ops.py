"""Evaluation / distribution-statistics operators (operators/evaluation.py)
and the weighted-reservoir + k-fold sampling additions: each pinned
against a tiny hand-checkable frame or a pure-Python reference, plus
the scale-shape invariants the docstrings claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_roc_auc_matches_python_reference(spark):
    # scores with ties, mixed labels
    rows = [
        (1, True),
        (1, False),
        (2, True),
        (3, False),
        (3, True),
        (3, True),
        (5, False),
    ]
    df = spark.createDataFrame(rows, "score long, label boolean")
    from graphsense_blocksci_spark.operators.evaluation import roc_auc

    got = roc_auc(df, "score", "label").first()

    # reference: P(pos > neg) + 0.5 * P(pos == neg) over all pairs
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    want = wins / (len(pos) * len(neg))
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert math.isclose(got.auc, want, rel_tol=0, abs_tol=1e-12)
    # exact rational identity
    assert got.auc_num2 / got.auc_den == pytest.approx(want, abs=1e-12)


def test_roc_auc_perfect_and_random(spark):
    # all positives above all negatives -> AUC 1; identical -> 0.5
    from graphsense_blocksci_spark.operators.evaluation import roc_auc

    perfect = spark.createDataFrame(
        [(10, True), (11, True), (1, False), (2, False)],
        "score long, label boolean",
    )
    assert roc_auc(perfect, "score", "label").first().auc == 1.0
    flat = spark.createDataFrame(
        [(7, True), (7, False), (7, True), (7, False)],
        "score long, label boolean",
    )
    assert roc_auc(flat, "score", "label").first().auc == 0.5


def test_distribution_drift_identical_and_disjoint(spark):
    from graphsense_blocksci_spark.operators.evaluation import (
        distribution_drift,
    )

    same = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "g string, t string",
    )
    r = distribution_drift(same, "g", "t", "a", "b").first()
    assert r.tvd == 0.0 and r.vocab_jaccard == 1.0

    disjoint = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "u"), ("b", "v")],
        "g string, t string",
    )
    r = distribution_drift(disjoint, "g", "t", "a", "b").first()
    assert r.tvd == 1.0 and r.vocab_jaccard == 0.0
    assert r.vocab_common == 0


def test_distribution_drift_matches_python(spark):
    from collections import Counter

    from graphsense_blocksci_spark.operators.evaluation import (
        distribution_drift,
    )

    a = ["the", "cat", "sat", "the", "mat", "cat", "the"]
    b = ["the", "dog", "sat", "sat", "log"]
    rows = [("a", t) for t in a] + [("b", t) for t in b]
    df = spark.createDataFrame(rows, "g string, t string")
    got = distribution_drift(df, "g", "t", "a", "b").first()

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    tvd = 0.5 * sum(
        abs(ca[t] / na - cb[t] / nb) for t in set(ca) | set(cb)
    )
    assert got.n_a == na and got.n_b == nb
    assert got.tvd == pytest.approx(tvd, abs=1e-12)
    inter = len(set(ca) & set(cb))
    union = len(set(ca) | set(cb))
    assert got.vocab_common == inter
    assert got.vocab_jaccard == pytest.approx(inter / union, abs=1e-12)


def test_equiwidth_bins_cover_domain_and_counts(spark):
    from graphsense_blocksci_spark.operators.evaluation import equiwidth_bins

    vals = [0, 1, 5, 9, 10, 15, 19, 99, 100]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = equiwidth_bins(df, "v", 4).collect()
    # width = ceil(101/4) = 26
    assert sum(r.n_rows for r in out) == len(vals)
    for r in out:
        assert r.hi - r.lo + 1 == 26
        members = [v for v in vals if r.lo <= v <= r.hi]
        assert r.n_rows == len(members) and r.sum_value == sum(members)
    # every value falls inside exactly one emitted bin
    covered = sorted((r.lo, r.hi) for r in out)
    for v in vals:
        assert sum(1 for lo, hi in covered if lo <= v <= hi) == 1


def test_zscore_normalize_exact_and_degenerate(spark):
    from graphsense_blocksci_spark.operators.evaluation import (
        zscore_normalize,
    )

    df = spark.createDataFrame(
        [("g", 2), ("g", 4), ("g", 6), ("one", 7), ("flat", 5), ("flat", 5)],
        "grp string, x long",
    )
    rows = {
        (r.grp, r.x): r.z for r in zscore_normalize(df, "grp", "x").collect()
    }
    # g: mean 4, std_pop sqrt(8/3)
    std = math.sqrt(8 / 3)
    assert rows[("g", 2)] == pytest.approx((2 - 4) / std, abs=1e-12)
    assert rows[("g", 4)] == pytest.approx(0.0, abs=1e-12)
    assert rows[("g", 6)] == pytest.approx((6 - 4) / std, abs=1e-12)
    # singleton and zero-variance groups -> NULL, never a div-by-zero
    assert rows[("one", 7)] is None
    assert rows[("flat", 5)] is None


def test_weighted_reservoir_exact_k_and_weight_monotonicity(spark):
    from graphsense_blocksci_spark.operators.sampling import (
        weighted_reservoir,
    )

    # 200 keys, two strata of weights: heavy (8) ids < 50, light (1) rest.
    rows = [(i, "g", 8 if i < 50 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, g string, w long")
    out = weighted_reservoir(df, "g", k=40, key_col="k", weight_col="w").collect()
    assert len(out) == 40
    assert sorted({r.sample_rank for r in out}) == list(range(1, 41))
    heavy = sum(1 for r in out if r.k < 50)
    # heavy items are 50/200 of keys but 400/550 of mass; expect far
    # more than the unweighted 10 — loose deterministic bound
    assert heavy > 15
    # determinism: second run identical
    again = weighted_reservoir(df, "g", k=40, key_col="k", weight_col="w").collect()
    assert sorted(r.k for r in out) == sorted(r.k for r in again)


def test_kfold_assign_partitions_every_key_once(spark):
    from graphsense_blocksci_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    out = kfold_assign(df, "k", n_folds=7)
    folds = out.groupBy("fold").count().collect()
    assert sorted(r.fold for r in folds) == list(range(7))
    assert sum(r["count"] for r in folds) == 500
    # balance within loose tolerance of uniform hashing
    for r in folds:
        assert 35 <= r["count"] <= 110
    # group-safe: same key always same fold (projection is deterministic)
    a = {r.k: r.fold for r in out.collect()}
    b = {r.k: r.fold for r in kfold_assign(df, "k", 7).collect()}
    assert a == b


def test_attribution_first_last_and_unattributed(spark):
    from graphsense_blocksci_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        # user 1: touches 10,20 then purchase at 25; late touch 30 ignored
        (1, 10, "view", 100),
        (1, 20, "click", 101),
        (1, 25, "purchase", 102),
        (1, 30, "view", 103),
        # user 2: touch OUTSIDE the lookback -> unattributed
        (2, 5, "view", 200),
        (2, 1000000, "purchase", 201),
        # user 3: tie on timestamp -> smaller id is first, larger is last
        (3, 50, "view", 300),
        (3, 50, "click", 301),
        (3, 60, "purchase", 302),
    ]
    ev = spark.createDataFrame(
        [(u, float(t), e, i) for u, t, e, i in rows],
        "user_id long, ts double, event_type string, event_id long",
    ).selectExpr(
        "user_id",
        "CAST(ts AS TIMESTAMP) AS ts",
        "event_type",
        "event_id",
    )
    out = {
        r.conversion_id: r
    for r in attribute_conversions(ev, lookback=100).collect()}
    r1 = out[102]
    assert (r1.first_touch_id, r1.last_touch_id, r1.n_touches) == (100, 101, 2)
    r2 = out[201]
    assert r2.n_touches == 0 and r2.first_touch_id is None
    r3 = out[302]
    assert (r3.first_touch_id, r3.last_touch_id) == (300, 301)


def test_gram_matrix_and_ridge_solve_match_numpy(spark):
    import numpy as np

    from graphsense_blocksci_spark.operators.evaluation import (
        gram_matrix,
        ridge_solve,
    )

    rng = np.random.RandomState(7)
    X = np.column_stack(
        [np.ones(200), rng.randint(1, 50, 200), rng.randint(0, 10, 200)]
    ).astype(int)
    beta_true = np.array([100, 3, -7])
    y = (X @ beta_true + rng.randint(-5, 6, 200)).astype(int)
    rows = [
        (int(a), int(b), int(c), int(t)) for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(rows, "one long, f1 long, f2 long, y long")
    gram = gram_matrix(df, ["one", "f1", "f2"], "y")

    # exact sufficient statistics
    cells = {(r.row, r.col): r.value for r in gram.collect()}
    assert cells[(-1, -1)] == 200
    np_xtx = X.T @ X
    for i in range(3):
        for j in range(3):
            assert cells[(i, j)] == np_xtx[i][j]
        assert cells[(i, -1)] == (X.T @ y)[i]

    # OLS solve (lam=0) == numpy lstsq
    beta = np.array(ridge_solve(gram, d=3, lam=0.0))
    want = np.linalg.lstsq(X.astype(float), y.astype(float), rcond=None)[0]
    assert np.allclose(beta, want, atol=1e-8)
    # near the planted coefficients
    assert np.allclose(beta, beta_true, atol=1.0)

    # ridge shrinks toward zero and satisfies its normal equations
    lam = 10.0
    br = np.array(ridge_solve(gram, d=3, lam=lam))
    resid = (np_xtx + lam * np.eye(3)) @ br - X.T @ y
    assert np.allclose(resid, 0, atol=1e-6)


def test_pca_matches_numpy(spark):
    import numpy as np

    from graphsense_blocksci_spark.operators.decomposition import pca_topk

    rng = np.random.RandomState(3)
    # anisotropic cloud: variance concentrated in two directions
    base = rng.randn(300, 2) @ np.array([[5.0, 0.0], [0.0, 2.0]])
    rot = np.linalg.qr(rng.randn(6, 6))[0]
    X = np.hstack([base, 0.1 * rng.randn(300, 4)]) @ rot
    df = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    got = pca_topk(df, k=6).collect()
    cov = np.cov(X.T, bias=True)
    want = np.linalg.eigvalsh(cov)[::-1]
    for r in got:
        assert r.eigenvalue == pytest.approx(want[r.component], rel=1e-6)
    # top-2 explain nearly everything
    assert sum(r.explained_frac for r in got[:2]) > 0.99
    assert got[0].total_variance == pytest.approx(want.sum(), rel=1e-9)


def test_logistic_gd_matches_numpy_schedule(spark):
    import numpy as np

    from graphsense_blocksci_spark.operators.evaluation import logistic_gd

    rng = np.random.RandomState(11)
    X = np.column_stack([np.ones(400), rng.randn(400), rng.randn(400)])
    w_true = np.array([-0.5, 2.0, -1.0])
    y = (1 / (1 + np.exp(-(X @ w_true))) > rng.rand(400)).astype(float)
    df = spark.createDataFrame(
        [
            (float(a), float(b), float(c), float(t))
            for (a, b, c), t in zip(X, y)
        ],
        "one double, f1 double, f2 double, y double",
    )
    got = {
        r.idx: r.weight
        for r in logistic_gd(
            df, ["one", "f1", "f2"], "y", lr=1.0, iterations=8
        ).collect()
    }

    w = np.zeros(3)
    for _ in range(8):
        p = 1 / (1 + np.exp(-(X @ w)))
        w = w - (X.T @ (p - y)) / len(y)
    for i in range(3):
        assert got[i] == pytest.approx(w[i], abs=1e-9)
    # learned the signs of the planted coefficients
    assert got[1] > 0.5 and got[2] < -0.2
