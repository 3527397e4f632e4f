"""Distributed k-means over the embeddings table: E-step assignment,
Lloyd iterations, and SemDeDup-style cluster-local near-dedup.

Training-data curation pipelines cluster embeddings to (a) bucket a
corpus into semantic shards for mixture control, (b) prune
semantically redundant documents (SemDeDup, Abbas et al. 2023:
cluster, then drop all-but-one of any within-cluster pair whose
cosine exceeds a threshold), and (c) seed IVF-style ANN cells. The
reference engine has no embedding stack (its scope is chain ETL,
`blocksci_export.py:1`), so this is extension surface like the rest
of the similarity operators.

Exactness design (same rules as operators/similarity.py):

- **Deterministic seeds, not random init.** Initial centroids are the
  embeddings with the ``k`` smallest ids — a pure filter both engines
  evaluate identically — so the E-step is a deterministic function of
  the data and is CELL-EXACT oracle-able. (Classic k-means++ random
  init would make every downstream value run-dependent.)
- **Fixed-order folds.** Squared-L2 distance is a left-to-right
  double fold over `zip_with` (≡ the oracle's explicitly expanded
  ``(e[1]-c[1])^2 + (e[2]-c[2])^2 + ...`` sum), so distances are
  bitwise identical across engines; argmin ties break on centroid id.
- **Lloyd M-step** averages are unordered float sums (Spark partial
  aggregation order is nondeterministic), so the iterative path is
  verified by a numpy-parity pytest at 1e-9 and a rows-only driver
  check — the same split the PageRank / IVF operators use.

Scale shape: the centroid side is k·dim doubles (KBs) and always
BROADCAST; assignment is a map-side projection over the corpus (one
scan, no shuffle). The M-step is one groupBy(cluster) with map-side
partial aggregation — dim fixed-width agg columns, never an explode.
Per-iteration centroid materialization is a bounded k×dim driver
collect (same probe contract as IVF's `_train_centroids`,
similarity.py:269). SemDeDup's within-cluster pairing is quadratic in
cluster size; `max_cluster` drops oversized clusters from pairing
(documented recall trade, same guard as `embedding_neardup`'s
`max_bucket`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.similarity import (
    _as_double,
    dot,
    unit_vector,
)

KMEANS_K = 10  # fixture default: matches the synthetic label count


def dist_sq(a: Column, b: Column) -> Column:
    """Fixed-order (left-to-right) squared-L2 double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "ce",
) -> DataFrame:
    """E-step: nearest centroid per vector (ties -> smallest cid).

    `centroids` is (cid, ce) with ce already double-typed. The
    centroid frame is broadcast (k·dim doubles); assignment is a
    crossJoin + fold + single-partition-by-vector argmin window — a
    per-row computation with no corpus shuffle beyond the window's
    hash on the (unique) vector id, which collapses to a local sort
    when the scan is already id-partitioned.
    """
    scored = vectors.select(
        F.col(id_col).cast("long").alias(id_col),
        _as_double(F.col(vec_col)).alias("_e"),
    ).crossJoin(F.broadcast(centroids.select(cid_col, cvec_col)))
    scored = scored.select(
        id_col,
        F.col(cid_col),
        dist_sq(F.col("_e"), F.col(cvec_col)).alias("dist_sq"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist_sq").asc(), F.col(cid_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col(cid_col).cast("long").alias("cluster_id"),
            "dist_sq",
        )
    )


def seed_centroids(
    vectors: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic init: the k smallest-id vectors as centroids."""
    return vectors.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("long").alias("cid"),
        _as_double(F.col(vec_col)).alias("ce"),
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = KMEANS_K,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Lloyd iterations from the deterministic seed; returns the final
    assignment (vec_id, cluster_id, dist_sq).

    Each iteration: broadcast E-step (no shuffle) + one
    groupBy(cluster) M-step computing all `dim` coordinate means as
    fixed-width agg columns (map-side partials; never an explode whose
    shuffle would be dim× the corpus). New centroids (k×dim doubles)
    are collected to the driver — a bounded probe, k rows — so each
    iteration's plan stays flat instead of stacking n_iter crossJoins
    of lineage. Empty clusters keep their previous centroid (standard
    Lloyd convention).

    Float caveat: M-step means are unordered sums -> not cross-engine
    bit-exact; verified by numpy parity pytest (tests/test_clustering)
    and a rows-only driver check, like PageRank.
    """
    if dim is None:
        row = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            spark = vectors.sparkSession
            return spark.createDataFrame(
                [], f"{id_col} long, cluster_id long, dist_sq double"
            )
        dim = row["d"]
    v = vectors.select(
        F.col(id_col).cast("long").alias(id_col),
        _as_double(F.col(vec_col)).alias("_e"),
    )
    cents = [
        (int(r["cid"]), [float(x) for x in r["ce"]])
        for r in seed_centroids(vectors, k, id_col, vec_col).collect()
    ]
    spark = vectors.sparkSession
    for _ in range(n_iter):
        cdf = spark.createDataFrame(
            [(cid, ce) for cid, ce in cents], "cid long, ce array<double>"
        )
        assign = kmeans_assign(v, cdf, id_col=id_col, vec_col="_e").join(
            v, id_col
        )
        means = assign.groupBy("cluster_id").agg(
            *[F.avg(F.col("_e")[i]).alias(f"m{i}") for i in range(dim)]
        )
        new = {
            int(r["cluster_id"]): [float(r[f"m{i}"]) for i in range(dim)]
            for r in means.collect()
        }
        cents = [(cid, new.get(cid, ce)) for cid, ce in cents]
    cdf = spark.createDataFrame(
        [(cid, ce) for cid, ce in cents], "cid long, ce array<double>"
    )
    return kmeans_assign(v, cdf, id_col=id_col, vec_col="_e")


def semdedup(
    vectors: DataFrame,
    k: int = KMEANS_K,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup: cluster with the deterministic E-step, then inside
    each cluster mark every vector that has a higher-similarity twin
    with a SMALLER id (cosine >= threshold) as a drop.

    Deterministic end-to-end (seed centroids + fixed-order folds), so
    the whole composition is cell-exact oracle-able — unlike the
    banded-LSH near-dup (q46) this prunes by SEMANTIC cluster
    locality: only same-cluster pairs are ever compared, which is the
    SemDeDup paper's scale argument (pairing cost is sum of squared
    cluster sizes, not corpus²). `max_cluster` drops oversized
    clusters from pairing entirely (recall trade, documented), keeping
    the bound under data skew.

    Output: (vec_id, cluster_id, keep) for every input vector.
    """
    cents = seed_centroids(vectors, k, id_col, vec_col)
    assign = kmeans_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
    u = vectors.select(
        F.col(id_col).cast("long").alias(id_col),
        unit_vector(F.col(vec_col)).alias("_uv"),
    ).join(assign.select(id_col, "cluster_id"), id_col)
    paired = u
    if max_cluster is not None:
        wc = Window.partitionBy("cluster_id")
        paired = (
            paired.withColumn("_cn", F.count(F.lit(1)).over(wc))
            .filter(F.col("_cn") <= max_cluster)
            .drop("_cn")
        )
    a = paired.select(
        F.col("cluster_id"),
        F.col(id_col).alias("_ida"),
        F.col("_uv").alias("_ua"),
    )
    b = paired.select(
        F.col("cluster_id"),
        F.col(id_col).alias("_idb"),
        F.col("_uv").alias("_ub"),
    )
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("_idb") < F.col("_ida"))
        .select(
            F.col("_ida").alias(id_col),
            dot(F.col("_ua"), F.col("_ub")).alias("_cos"),
        )
        .filter(F.col("_cos") >= F.lit(float(threshold)))
        .select(id_col)
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assign.select(id_col, "cluster_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )
