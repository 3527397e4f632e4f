"""Distributed matrix decomposition over embedding columns: PCA via
the method of moments — the dimensionality/variance analysis a
curation pipeline runs on its embedding space (effective dimension,
variance concentration, whitening diagnostics).

The decomposition itself is NOT distributed — it doesn't need to be.
The sufficient statistics are: n, the mean vector (d), and the second
moment matrix Σ x·xᵀ (d×d). Those are computed in ONE pass with
Arrow-batched numpy partials per partition (a d×d GEMM per batch —
the same vectorized-UDF discipline as the repo's cosine GEMM path),
then d²+d+1 numbers reach the driver for an `eigh` — bounded however
large the corpus is, the identical cap argument as
`evaluation.ridge_solve`. Float partial sums are partition-order
dependent ⇒ rows-only gate; exactness is pytest-gated against numpy
on the collected frame.

Reference parity: none — beyond-reference embedding surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_partials(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition second-moment partials: one row per partition
    holding (n, sum vector, flattened Σ x·xᵀ) — the map-side GEMM.
    Rows are partition-count-sized; summing them distributively gives
    the exact (up to float order) global moments.
    """
    import numpy as np

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        m2 = None
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if X.size == 0:
                continue
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            m2 = g if m2 is None else m2 + g
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "m2": [m2.ravel().tolist()],
                }
            )

    return emb.select(vec_col).mapInPandas(
        part, schema="n long, s array<double>, m2 array<double>"
    )


def pca_topk(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Top-k PCA eigenvalues of the embedding covariance and the
    variance they explain. Covariance = M2/n − μμᵀ from the one-pass
    partials; the driver touches d² + d + 1 numbers and runs one
    symmetric `eigh`. Output avoids eigenVECTORS deliberately — their
    sign/rotation is indeterminate under ties, eigenvalues are not.

    Returns (component, eigenvalue, explained_frac, total_variance),
    eigenvalues descending, rounded to 9 decimals for run-to-run
    stability of the float partials.
    """
    import numpy as np

    rows = moment_partials(emb, vec_col).collect()
    if not rows:
        raise ValueError("pca_topk: empty input")
    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    s = np.zeros(d)
    m2 = np.zeros((d, d))
    for r in rows:
        s += np.array(r.s)
        m2 += np.array(r.m2).reshape(d, d)
    mu = s / n
    cov = m2 / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = float(evals.sum())
    out = [
        (
            int(i),
            round(float(evals[i]), 9),
            round(float(evals[i] / total), 9),
            round(total, 9),
        )
        for i in range(min(k, d))
    ]
    return emb.sparkSession.createDataFrame(
        out,
        "component long, eigenvalue double, explained_frac double, "
        "total_variance double",
    )


def scatter_quantized(
    emb: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """EXACT integer second-moment sufficient statistics — the
    hash-green twin of `moment_partials`: coordinates quantize once
    to ``round(x*scale)`` int64 and the per-batch GEMM runs in int64
    (numpy integer matmul is exact), so the partial sums are
    order-independent and the long-form frame is cell-exact
    oracle-able. Same one-pass Arrow shape: a d×d integer GEMM per
    batch, then one (row, col) sum — d² + d + 1 numbers total.

    Returns (row, col, value): col in [0, d) are Σ x_q·x_qᵀ entries,
    col = -1 holds the coordinate sums Σ x_q, and (row=-1, col=-1) is
    n. int64 bound: |x_q| ≲ scale ⇒ entries grow as n·scale² — at
    1e6 scale that is exact to n ~ 9e6 unit-ish vectors; larger
    corpora drop `scale` (each 10× corpus step costs one digit of
    quantization) or move the final sum to decimal(38,0).
    """
    import numpy as np

    def part(batches):
        n = 0
        s = None
        m2 = None
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if X.size == 0:
                continue
            Q = np.rint(X * scale).astype(np.int64)
            n += Q.shape[0]
            s = Q.sum(axis=0) if s is None else s + Q.sum(axis=0)
            g = Q.T @ Q
            m2 = g if m2 is None else m2 + g
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "m2": [m2.ravel().tolist()],
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        part, schema="n long, s array<long>, m2 array<long>"
    ).localCheckpoint(eager=False)
    # pinned: the partials frame feeds the xx/sums/n branches AND the
    # dim probe — unpinned, the corpus GEMM would execute four times
    d_row = partials.select(F.size("s").alias("d")).first()
    if d_row is None:
        raise ValueError("scatter_quantized: empty input")
    d = d_row["d"]
    xx = (
        partials.select(
            F.posexplode("m2").alias("flat", "value")
        )
        .select(
            (F.col("flat") / d).cast("long").alias("row"),
            (F.col("flat") % d).cast("long").alias("col"),
            "value",
        )
        .groupBy("row", "col")
        .agg(F.sum("value").cast("long").alias("value"))
    )
    sums = (
        partials.select(F.posexplode("s").alias("row", "value"))
        .groupBy(F.col("row").cast("long").alias("row"))
        .agg(F.sum("value").cast("long").alias("value"))
        .select("row", F.lit(-1).cast("long").alias("col"), "value")
    )
    nrow = partials.agg(F.sum("n").cast("long").alias("value")).select(
        F.lit(-1).cast("long").alias("row"),
        F.lit(-1).cast("long").alias("col"),
        "value",
    )
    return xx.select("row", "col", "value").unionByName(sums).unionByName(
        nrow
    )
