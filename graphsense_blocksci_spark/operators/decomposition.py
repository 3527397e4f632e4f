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
