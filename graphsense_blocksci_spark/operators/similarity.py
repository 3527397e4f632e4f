"""Embedding similarity search over an `array<float>` column.

Two paths, the standard baseline/scale pair:

- ``cosine_topk_bruteforce`` — exact top-k per query vector. The
  correctness baseline and the right tool when one side is small enough
  to broadcast (query batches, centroid tables). Cost O(|Q| * |C|).
- ``cosine_topk_lsh``       — random-hyperplane LSH: vectors sharing a
  sign-pattern bucket are compared, others never meet. This is the
  100 TB path: shuffle on the bucket key, per-bucket brute force,
  multiple independent hyperplane tables to recover recall.

All arithmetic is fixed-order double-precision folds (`zip_with` +
`aggregate`), so results are bit-reproducible across runs AND across
engines — the DuckDB oracle reproduces the same dot products exactly.
The hyperplanes are seeded literals (embedded in the plan, broadcast
with the task binary), not a driver-side random state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Fixed-order (left-to-right) double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|) — formula mirrored verbatim in the oracle."""
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def unit_vector(vec_col: Column) -> Column:
    """v / |v| as a fixed-order double expression: normalizing ONCE per
    vector turns the per-pair cosine into a single dot-product fold —
    3× less per-pair work than dot/(|a|·|b|) with per-pair norms."""
    vd = _as_double(vec_col)
    nrm = l2_norm(vd)
    return F.transform(vd, lambda x: x / nrm)


def cosine_topk_bruteforce(
    vectors: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine.

    `queries` defaults to `vectors` (all-pairs self-search — the
    correctness baseline; quadratic, so only for small/broadcastable
    sides). Vectors are unit-normalized once per row BEFORE the cross
    join (cos = dot of unit vectors), so the per-pair cost is one
    fold. Ties break on the lower neighbor id, so ranking is total
    and deterministic. Output: (vec_id, neighbor_id, rank, cos_sim).
    """
    if queries is None:
        queries = vectors
    q = queries.select(
        F.col(id_col).cast("long").alias("vec_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
    )
    c = vectors.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_cv"),
    )
    from graphsense_blocksci_spark.operators.textops import spread

    scored = (
        spread(q)
        .crossJoin(F.broadcast(c))
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def mutual_top1_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact mutual-nearest-neighbor pairs between a (small) batch and
    a corpus — both directed cosine top-1s derived from ONE scored
    product with the BATCH side broadcast, never the corpus.

    ASSUMES A SHARED ID SPACE: batch and corpus ids must come from the
    same identifier domain (q348 derives both from one embeddings
    table), because self-pairs are excluded as ``batch_id !=
    corpus_id``. If the two sides come from INDEPENDENT tables whose
    ids can coincidentally collide, that filter silently drops a
    legitimate cross-table nearest-neighbor pair — disambiguate the
    ids (e.g. offset or tag one side) before calling.

    Exact top-1 over arbitrary vectors is irreducibly |batch|×|corpus|
    fused-multiply work — but it need not be |batch|×|corpus| SHUFFLE
    work, and it must never broadcast the unbounded side. Per
    direction, the streamed corpus partitions score against the
    broadcast batch and reduce THROUGH a map-side-combinable argmax —
    ``max(struct(cos_sim, -other_id))`` reproduces the bruteforce
    total order (best score, ties to the LOWER id) while shipping at
    most |group keys| partial rows per partition to the shuffle; no
    window ever ranks the raw pair frame. Two corpus scans total (one
    per direction — recomputing the fold beats materializing a
    |batch|×|corpus| intermediate at scale), each corpus-LINEAR for a
    fixed ingest batch.

    Why not IVF bound-pruning (`cosine_topk_ivf_exact`): measured on
    the synthetic embeddings, the residual-radius bound prunes ZERO
    cells for k=1 (mean top-1 sim ≈ 0.41 vs bound ≈ dot(q,c)+1.3 —
    every cell survives every query), so the IVF routing degenerates
    to the same full product plus assignment/probe overhead: 20.5× at
    10× scaled-batch vs this plan's single-product shape. Bound
    pruning needs clustered data; MNN alignment batches are not.

    cos_sim doubles come from the same fixed-order `dot(unit, unit)`
    fold as `cosine_topk_bruteforce` — bit-exact cross-engine.
    Output: (batch_id, corpus_id, cos_sim) for mutual pairs only.
    """
    from graphsense_blocksci_spark.operators.textops import spread

    b = batch.select(
        F.col(id_col).cast("long").alias("batch_id"),
        unit_vector(F.col(vec_col)).alias("_bv"),
    )
    c = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        unit_vector(F.col(vec_col)).alias("_cv"),
    )
    scored = (
        spread(c)
        .crossJoin(F.broadcast(b))
        .filter(F.col("batch_id") != F.col("corpus_id"))
        .select(
            "batch_id",
            "corpus_id",
            dot(F.col("_bv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    fwd = (
        scored.groupBy("batch_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim"),
                    (-F.col("corpus_id")).alias("_nid"),
                )
            ).alias("_t")
        )
        .select(
            "batch_id",
            (-F.col("_t._nid")).cast("long").alias("corpus_id"),
            F.col("_t.cos_sim").alias("cos_sim"),
        )
    )
    rev = (
        scored.groupBy("corpus_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim"),
                    (-F.col("batch_id")).alias("_nid"),
                )
            ).alias("_t")
        )
        .select(
            "corpus_id", (-F.col("_t._nid")).cast("long").alias("batch_id")
        )
    )
    return fwd.join(rev, ["batch_id", "corpus_id"]).select(
        "batch_id", "corpus_id", "cos_sim"
    )


def cosine_topk_gemm(
    vectors: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    max_index_rows: int = 1 << 20,
) -> DataFrame:
    """Exact cosine top-k via Arrow + NumPy GEMM — the high-throughput
    exact path for queries-vs-BOUNDED-index search.

    The candidate (index) matrix is collected and broadcast (the SAME
    broadcast-small contract as the fold-based baseline's
    `F.broadcast` side); each query partition then scores against it
    with one BLAS matmul — measured ~50× the interpreted-fold
    throughput. Results are float64-exact cosine, but BLAS reduction
    order differs from the sequential fold in the last ulp, so ranking
    TIES can resolve differently — use `cosine_topk_bruteforce` when
    bit-exact cross-engine parity matters, this when throughput does.
    Output schema matches the fold variant.

    `max_index_rows` is a HARD guard on the collect: the scan is
    limited to cap+1 rows (the driver never materializes more than the
    cap regardless of corpus size) and exceeding it raises with the
    scale-path routing. Corpus-vs-corpus callers belong on
    `embedding_neardup_gemm` (bucket-local BLAS, no corpus collect) or
    `cosine_topk_lsh`/`cosine_topk_ivf` (bucketed candidate joins).
    """
    if queries is None:
        queries = vectors
    import numpy as np

    cand = (
        vectors.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
        .limit(max_index_rows + 1)
        .toPandas()
    )
    if len(cand) > max_index_rows:
        raise ValueError(
            f"cosine_topk_gemm index side exceeds max_index_rows="
            f"{max_index_rows}; this operator broadcasts the index and is "
            "for queries-vs-bounded-index search. For corpus-scale "
            "candidates use cosine_topk_lsh / cosine_topk_ivf "
            "(bucketed) or embedding_neardup_gemm (bucket-local BLAS)."
        )
    C = np.array(cand["_v"].tolist(), dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    cand_ids = cand["_id"].to_numpy(np.int64)
    bc = queries.sparkSession.sparkContext.broadcast((cand_ids, C))

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def part(it):
        import numpy as np
        import pandas as pd

        cids, Cm = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            Q = np.array(pdf["_v"].tolist(), dtype=np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            qids = pdf["_id"].to_numpy(np.int64)
            S = Q @ Cm.T
            # self-matches out of contention
            S[qids[:, None] == cids[None, :]] = -np.inf
            kk = min(k, S.shape[1] - 1)
            # ties break on lower neighbor id: lexsort (id asc within -sim)
            part_idx = np.argpartition(-S, kth=kk - 1, axis=1)[:, : kk + 8]
            rows = []
            for r in range(S.shape[0]):
                idx = part_idx[r]
                order = np.lexsort((cids[idx], -S[r, idx]))[:kk]
                sel = idx[order]
                rows.append(
                    pd.DataFrame(
                        {
                            "vec_id": qids[r],
                            "neighbor_id": cids[sel],
                            "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                            "cos_sim": S[r, sel],
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    from graphsense_blocksci_spark.operators.textops import spread

    q = spread(
        queries.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
    )
    return q.mapInPandas(part, schema=schema)


def _probe_dim(vectors: DataFrame, vec_col: str) -> int | None:
    """Vector dimensionality from one row (None for an empty frame —
    callers return an empty result instead of crashing on first()[0]).
    One tiny eager job; the hyperplane literals need the dim at plan
    time, so it cannot be deferred."""
    row = vectors.select(vec_col).first()
    if row is None or row[0] is None:
        return None
    return len(row[0])


def _empty_pairs(spark) -> DataFrame:
    return spark.createDataFrame([], "id_a long, id_b long, cos_sim double")


def _empty_topk(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "vec_id long, neighbor_id long, rank int, cos_sim double"
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state on the
    driver): component h[j][i] from a splitmix64-style integer mix of
    (seed, j, i), scaled to [-1, 1). Fixed literals — identical in every
    task and every engine that re-derives them."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            z = (seed * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + i * 0x94D049BB133111EB) % (1 << 64)
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
            z = z ^ (z >> 31)
            row.append((z % (1 << 21)) / float(1 << 20) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit j set iff dot(v, plane_j) > 0."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                _as_double(vec_col),
                F.array(*[F.lit(x) for x in p]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _train_centroids(
    vectors: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    sample_size: int = 1024,
    iters: int = 5,
    seed: int = 42,
):
    """Deterministic spherical k-means on a bounded sample.

    The sample is the `sample_size` LOWEST ids (order-stable, no RNG
    state), Lloyd iterations run driver-side in NumPy on unit vectors —
    the training set is bounded regardless of corpus size; only the
    assignment pass below touches all data, distributed."""
    import numpy as np

    sample = (
        vectors.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col))
        .orderBy("_id")
        .limit(sample_size)
        .toPandas()
    )
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    C[j] = m / nrm
    return C


def cosine_topk_ivf(
    vectors: DataFrame,
    k: int = 1,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the second scale path next to hyperplane LSH.

    Shape: spherical k-means centroids trained on a bounded sample
    (driver-side, deterministic); ONE distributed pass assigns every
    vector to its nearest centroid cell; queries probe their `n_probe`
    nearest cells; candidates meet queries only inside shared cells
    (shuffle on cell id — cells ≈ corpus/n_centroids rows each, never
    an all-pairs join). Recall tunes with n_probe; output schema
    matches the exact variants.
    """
    import numpy as np

    C = _train_centroids(vectors, n_centroids, id_col, vec_col, seed=seed)
    bc = vectors.sparkSession.sparkContext.broadcast(C)

    from pyspark.sql import types as T

    assign_schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("uv", T.ArrayType(T.DoubleType())),
        ]
    )
    probe_schema = assign_schema

    def _assign(n_cells: int):
        def fn(it):
            import numpy as np
            import pandas as pd

            Cm = bc.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf["_v"].tolist(), dtype=np.float64)
                X /= np.linalg.norm(X, axis=1, keepdims=True)
                sims = X @ Cm.T
                top = np.argsort(-sims, axis=1)[:, :n_cells]
                frames = []
                for j in range(n_cells):
                    frames.append(
                        pd.DataFrame(
                            {
                                "vid": pdf["_id"].to_numpy(np.int64),
                                "cell": top[:, j].astype(np.int32),
                                "uv": list(X),
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        return fn

    from graphsense_blocksci_spark.operators.textops import spread

    base = spread(
        vectors.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
    )
    cand = base.mapInPandas(_assign(1), schema=assign_schema).select(
        F.col("vid").alias("neighbor_id"), "cell", F.col("uv").alias("_cv")
    )
    qry = base.mapInPandas(_assign(n_probe), schema=probe_schema).select(
        F.col("vid").alias("vec_id"), "cell", F.col("uv").alias("_qv")
    )
    scored = (
        qry.join(cand, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"))
    )
    dedup = scored.groupBy("vec_id", "neighbor_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim"
        )
    )


def cosine_topk_ivf_exact(
    vectors: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    seed: int = 42,
    eps: float = 1e-6,
) -> DataFrame:
    """EXACT top-k cosine via IVF with residual-radius bound pruning —
    the scale path that keeps brute-force semantics.

    For unit vectors q, x and x's (unit) cell centroid c, Cauchy-Schwarz
    gives ``dot(q,x) = dot(q,c) + dot(q, x-c) <= dot(q,c) + |x-c|``, and
    for unit x, ``|x-c|^2 = 2 - 2*dot(x,c)``. So each cell j carries one
    number — its max member residual ``radius_j`` — and ``dot(q,c_j) +
    radius_j`` upper-bounds every member's similarity. Two phases:
    (1) probe the ``n_probe`` best cells per query and take the
    provisional k-th best score tau_q; (2) scan ONLY the remaining cells
    whose bound clears tau_q (>= keeps ties; queries with fewer than k
    phase-1 candidates scan everything via tau = -2 < any bound). Any
    true top-k member outside the probed cells lives in a cell whose
    bound >= its score >= tau_q, so it is scanned — the result is
    CELL-IDENTICAL to cosine_topk_bruteforce: final scores come from the
    same fixed-order ``dot(unit_vector, unit_vector)`` JVM fold; the
    bound (NumPy-trained centroids, float arithmetic) only decides which
    pairs get scored, with ``eps`` absorbing last-bit rounding in the
    bound itself.

    Scale shape: the corpus is scanned once for assignment (m literal
    dot-folds per row, m = n_centroids), the cell stats frame is m rows
    (broadcast), and candidate scoring joins on cell id — never a corpus
    cross join; phase-2 volume adapts to how well the quantizer fits.
    Output schema matches the brute-force variant.
    """
    import numpy as np

    if queries is None:
        queries = vectors
    C = _train_centroids(vectors, n_centroids, id_col, vec_col, seed=seed)
    C = np.asarray(C, dtype=np.float64)
    m = len(C)
    # r14 (guide §1.2 per-task work, applied to the DRIVER): one 2-D
    # centroid literal + one transform lambda instead of m separate
    # aggregate/zip_with trees — the array of per-cell dots is
    # element-identical (same fixed-order fold per centroid, evaluated
    # in cell order), but the expression tree Catalyst analyzes per
    # call site shrinks ~m-fold.
    cents_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in C[j]]) for j in range(m)]
    )

    def cell_dots(ucol: Column) -> Column:
        return F.transform(cents_lit, lambda c: dot(ucol, c))

    corpus = vectors.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cd", cell_dots(F.col("_cv")))
    # nearest centroid (ties -> lowest cell index via array_position)
    corpus = (
        corpus.withColumn("_best", F.array_max("_cd"))
        .withColumn(
            "cell", (F.array_position("_cd", F.col("_best")) - 1).cast("int")
        )
        .withColumn(
            "_resid",
            F.sqrt(F.greatest(F.lit(0.0), F.lit(2.0) - 2.0 * F.col("_best"))),
        )
        .select("neighbor_id", "_cv", "cell", "_resid")
        .localCheckpoint(eager=False)
    )
    cells = corpus.groupBy("cell").agg(F.max("_resid").alias("radius"))

    qs = queries.select(
        F.col(id_col).cast("long").alias("vec_id"),
        unit_vector(F.col(vec_col)).alias("_qv"),
    ).localCheckpoint(eager=False)
    # r14 (guide §2.4): the probe ranking orders a BOUNDED m-element
    # array per query, so it runs IN-ROW — array_sort with an explicit
    # (dq DESC, cell ASC) comparator, then posexplode — instead of a
    # vec_id-keyed row_number window. Spark's binary double comparison
    # is the same total order the window sort used (SQLOrderingUtil:
    # NaN largest, NaN = NaN, -0.0 = 0.0), so prank is bit-identical
    # while the Q·m window exchange+sort and the qcells checkpoint
    # disappear; both consumers recompute the narrow in-row projection
    # from the pinned qs instead.
    _probe_order = F.array_sort(
        F.transform(
            cell_dots(F.col("_qv")),
            lambda d, i: F.struct(d.alias("dq"), i.alias("cell")),
        ),
        lambda l, r: (
            F.when(l["dq"] > r["dq"], F.lit(-1))
            .when(l["dq"] < r["dq"], F.lit(1))
            .otherwise(l["cell"] - r["cell"])
        ),
    )
    qcells = qs.select(
        "vec_id", F.posexplode(_probe_order).alias("_pos", "_pc")
    ).select(
        "vec_id",
        F.col("_pc.cell").alias("cell"),
        F.col("_pc.dq").alias("dq"),
        (F.col("_pos") + 1).alias("prank"),
    )

    def score(cell_pairs: DataFrame) -> DataFrame:
        return (
            cell_pairs.join(corpus, "cell")
            .join(qs, "vec_id")
            .filter(F.col("vec_id") != F.col("neighbor_id"))
            .select(
                "vec_id",
                "neighbor_id",
                dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
            )
        )

    wk = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    # r13 optimization (guide §2.4): rank phase 1 ONCE, inside the
    # checkpointed frame, so the tau extraction below is a plain filter
    # over the pin instead of a second window pass (exchange + sort)
    # over the full phase-1 candidate frame. Same wk total order, same
    # k-th score — output unchanged (strict gate re-verified).
    phase1 = (
        score(qcells.filter(F.col("prank") <= n_probe).select("vec_id", "cell"))
        .withColumn("_rk", F.row_number().over(wk))
        .localCheckpoint(eager=False)
    )
    tau = phase1.filter(F.col("_rk") == k).select(
        "vec_id", F.col("cos_sim").alias("tau")
    )
    survivors = (
        qcells.filter(F.col("prank") > n_probe)
        .join(F.broadcast(cells), "cell")
        .join(tau, "vec_id", "left")
        .filter(
            F.col("dq") + F.col("radius") + F.lit(eps)
            >= F.coalesce(F.col("tau"), F.lit(-2.0))
        )
        .select("vec_id", "cell")
    )
    scored = phase1.drop("_rk").unionByName(score(survivors))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim"
        )
    )


def _train_pq_codebooks(
    vectors: DataFrame,
    n_subspaces: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
    sample_size: int = 1024,
    iters: int = 5,
    seed: int = 43,
):
    """Product-quantization codebooks (Jégou et al. TPAMI'11) trained
    driver-side on the bounded lowest-id sample of UNIT vectors: the
    dimension axis splits into ``n_subspaces`` contiguous blocks and
    each block gets its own ``n_codes``-centroid Euclidean k-means.
    Returns ndarray (n_subspaces, n_codes, dim/n_subspaces). Same
    bounded-training contract as `_train_centroids` — the codebooks
    are KBs regardless of corpus size; only encode touches all data."""
    import numpy as np

    sample = (
        vectors.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col))
        .orderBy("_id")
        .limit(sample_size)
        .toPandas()
    )
    if len(sample) == 0:
        return None
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % n_subspaces != 0:
        raise ValueError(
            f"vector dim {dim} is not divisible by n_subspaces="
            f"{n_subspaces}; pick a divisor (PQ blocks must tile the dim)"
        )
    dsub = dim // n_subspaces
    rng = np.random.RandomState(seed)
    books = []
    for m in range(n_subspaces):
        S = X[:, m * dsub : (m + 1) * dsub]
        C = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(len(C)):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def cosine_topk_ivfpq(
    vectors: DataFrame,
    k: int = 1,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF + product quantization with exact
    re-ranking — the memory-scale ANN path next to `cosine_topk_ivf`
    (full vectors in the cells) and the LSH family.

    Why PQ at 100 TB: inside a probed cell, every candidate is
    represented by ``n_subspaces`` one-byte codes (8 bytes/vector here
    vs 512 for a float64[64] — a 64× smaller shuffle and cell
    footprint), and scoring a candidate is ``n_subspaces`` table
    lookups instead of a ``dim``-length dot product (ADC, asymmetric
    distance computation: the QUERY stays exact, only candidates are
    quantized). The plan:

    1. coarse quantizer: `_train_centroids` (bounded driver sample);
    2. one distributed encode pass: cell id + PQ codes per vector
       (Arrow-batched numpy, the only Python over the full corpus);
    3. queries build their per-subspace lookup table
       lut[m][c] = q_sub·codebook[m][c] (query-side linear work);
    4. candidates meet queries on cell id; the ADC score
       Σ_m lut[m][code_m] is a JVM-side `aggregate` over the code
       array — whole-stage codegen, no Python in the O(candidates)
       join path;
    5. the per-query ADC shortlist (``rerank`` ids) joins back to the
       full vectors for EXACT cosine re-ranking, so reported sims are
       true cosines (the approximation only affects which candidates
       make the shortlist — same contract as the LSH entries, recall
       pytest-gated).
    """
    import numpy as np

    from graphsense_blocksci_spark.operators.textops import spread
    from pyspark.sql import types as T

    spark = vectors.sparkSession
    B = _train_pq_codebooks(
        vectors, n_subspaces, n_codes, id_col, vec_col, seed=seed + 1
    )
    if B is None:  # empty input: also skips the coarse training below
        return _empty_topk(spark)
    C = _train_centroids(vectors, n_centroids, id_col, vec_col, seed=seed)
    bc_C = spark.sparkContext.broadcast(C)
    bc_B = spark.sparkContext.broadcast(B)
    dsub = B.shape[2]

    enc_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def _encode(it):
        import numpy as np
        import pandas as pd

        Cm, Bm = bc_C.value, bc_B.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            cell = np.argmax(X @ Cm.T, axis=1).astype(np.int32)
            codes = np.empty((len(X), len(Bm)), dtype=np.int32)
            for m in range(len(Bm)):
                S = X[:, m * dsub : (m + 1) * dsub]
                d2 = ((S[:, None, :] - Bm[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["_id"].to_numpy(np.int64),
                    "cell": cell,
                    "codes": list(codes),
                }
            )

    lut_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("lut", T.ArrayType(T.DoubleType())),
        ]
    )

    def _query_lut(it):
        import numpy as np
        import pandas as pd

        Cm, Bm = bc_C.value, bc_B.value
        n_sub = len(Bm)
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            cells = np.argsort(-(X @ Cm.T), axis=1)[:, :n_probe]
            # lut[m*n_codes + c] = dot(q_sub_m, codebook[m][c])
            luts = np.concatenate(
                [
                    X[:, m * dsub : (m + 1) * dsub] @ Bm[m].T
                    for m in range(n_sub)
                ],
                axis=1,
            )
            frames = []
            for j in range(cells.shape[1]):
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["_id"].to_numpy(np.int64),
                            "cell": cells[:, j].astype(np.int32),
                            "lut": list(luts),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    base = spread(
        vectors.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
    )
    enc = base.mapInPandas(_encode, schema=enc_schema)
    qry = base.mapInPandas(_query_lut, schema=lut_schema)

    # ADC score, fully JVM-side: n_subspaces array lookups per pair
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.col("lut"),
            (m * n_codes + F.element_at(F.col("codes"), (m + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    scored = (
        qry.join(enc, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", adc.alias("adc_sim"))
        .groupBy("vec_id", "neighbor_id")
        .agg(F.max("adc_sim").alias("adc_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("adc_sim"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .select("vec_id", "neighbor_id")
    )
    # exact re-rank: fetch true unit vectors for shortlist ids only
    uv = base.select(
        F.col("_id"), unit_vector(F.col("_v")).alias("_uv")
    )
    exact = (
        shortlist.join(
            uv.select(F.col("_id").alias("vec_id"), F.col("_uv").alias("_qv")),
            "vec_id",
        )
        .join(
            uv.select(
                F.col("_id").alias("neighbor_id"), F.col("_uv").alias("_cv")
            ),
            "neighbor_id",
        )
        .select("vec_id", "neighbor_id", dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"))
    )
    w2 = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim"
        )
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    k: int = 1,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: per LSH table, vectors meet only within their
    sign-pattern bucket; results are unioned across tables and re-ranked.

    Scale shape: `n_tables` shuffles on bucket keys (2^n_planes buckets
    per table), per-bucket quadratic cost bounded by bucket size — never
    a global cross join. Recall tunes with (n_planes ↓, n_tables ↑) and,
    cheaper than extra tables, with `multiprobe`: each QUERY row also
    probes the `multiprobe` buckets at Hamming distance 1 (lowest-index
    sign bits flipped — the bits most likely to be wrong for a point
    near a hyperplane). Probing multiplies only the query-side fan-out
    (`1+multiprobe` rows per query in the bucket shuffle); the candidate
    index side is stored ONCE, which is why multi-probe beats adding
    tables at equal recall on a 100 TB corpus.
    Output schema matches the brute-force variant.
    """
    if not 0 <= multiprobe <= n_planes:
        raise ValueError(f"multiprobe must be in [0, {n_planes}]")
    dim = _probe_dim(vectors, vec_col)
    if dim is None:
        return _empty_topk(vectors.sparkSession)
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        b = vectors.select(
            F.col(id_col).cast("long").alias(id_col),
            unit_vector(F.col(vec_col)).alias("_uv"),
            lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
        )
        probes = F.array(
            F.col("_bucket"),
            *[
                F.col("_bucket").bitwiseXOR(F.lit(1 << j).cast("long"))
                for j in range(multiprobe)
            ],
        )
        left = b.select(
            F.col(id_col).alias("vec_id"),
            F.col("_uv").alias("_qv"),
            F.explode(probes).alias("_bucket"),
        )
        right = b.select(
            F.col(id_col).alias("neighbor_id"), F.col("_uv").alias("_cv"), "_bucket"
        )
        per_table.append(
            left.join(right, "_bucket")
            .filter(F.col("vec_id") != F.col("neighbor_id"))
            .select(
                "vec_id",
                "neighbor_id",
                dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
            )
        )
    allc = per_table[0]
    for df in per_table[1:]:
        allc = allc.unionByName(df)
    dedup = allc.groupBy("vec_id", "neighbor_id").agg(F.max("cos_sim").alias("cos_sim"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def cosine_topk_lsh_gemm(
    vectors: DataFrame,
    k: int = 1,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Throughput twin of `cosine_topk_lsh` — identical bucket
    geometry (same hyperplane literals, same multi-probe rule), all
    float work in Arrow+BLAS: one `mapInPandas` pass computes unit
    vectors and every table's bucket (plus probe buckets) with one
    matmul per batch; per-(table, bucket) candidate scoring is one
    matmul via `applyInPandas`; global dedup + top-k rank stay JVM.
    BLAS reduction order can differ from the sequential fold in the
    last ulp, so a plane dot sitting exactly on 0 (or a ranking tie)
    can resolve differently — use `cosine_topk_lsh` when bit-exact
    cross-engine parity matters (pytest gates the two equal away from
    boundaries).

    100 TB shape: same as the fold variant — n_tables bucket-keyed
    shuffles, per-bucket quadratic bounded by bucket size, multiprobe
    multiplies only query-side fan-out, no corpus broadcast/collect.
    """
    if not 0 <= multiprobe <= n_planes:
        raise ValueError(f"multiprobe must be in [0, {n_planes}]")
    dim = _probe_dim(vectors, vec_col)
    if dim is None:
        return _empty_topk(vectors.sparkSession)
    all_planes = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]

    from pyspark.sql import types as T

    row_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_uv", T.ArrayType(T.DoubleType())),
            T.StructField("_table", T.IntegerType()),
            T.StructField("_bucket", T.LongType()),
            T.StructField("_is_query", T.BooleanType()),
        ]
    )

    def assign(it):
        import numpy as np
        import pandas as pd

        P = np.array(
            [p for planes in all_planes for p in planes], dtype=np.float64
        )  # (n_tables*n_planes, dim)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(np.int64)
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            U = X / np.linalg.norm(X, axis=1, keepdims=True)
            signs = (X @ P.T) > 0
            uv = list(U)
            frames = []
            for t in range(n_tables):
                bucket = signs[:, t * n_planes : (t + 1) * n_planes] @ weights
                # candidate row: home bucket only
                frames.append(
                    pd.DataFrame(
                        {
                            "_id": ids,
                            "_uv": uv,
                            "_table": np.full(len(ids), t, dtype=np.int32),
                            "_bucket": bucket,
                            "_is_query": False,
                        }
                    )
                )
                # query rows: home + Hamming-1 probes on low sign bits
                for j in range(multiprobe + 1):
                    b = bucket if j == 0 else bucket ^ (1 << (j - 1))
                    frames.append(
                        pd.DataFrame(
                            {
                                "_id": ids,
                                "_uv": uv,
                                "_table": np.full(len(ids), t, dtype=np.int32),
                                "_bucket": b,
                                "_is_query": True,
                            }
                        )
                    )
            yield pd.concat(frames, ignore_index=True)

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def bucket_score(pdf):
        import numpy as np
        import pandas as pd

        q = pdf[pdf["_is_query"]]
        c = pdf[~pdf["_is_query"]]
        if len(q) == 0 or len(c) == 0:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cos_sim": []}
            ).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cos_sim": "float64"}
            )
        Q = np.array(q["_uv"].tolist(), dtype=np.float64)
        C = np.array(c["_uv"].tolist(), dtype=np.float64)
        qid = q["_id"].to_numpy(np.int64)
        cid = c["_id"].to_numpy(np.int64)
        S = Q @ C.T
        qq, cc = np.meshgrid(np.arange(len(qid)), np.arange(len(cid)), indexing="ij")
        keep = qid[qq] != cid[cc]
        return pd.DataFrame(
            {
                "vec_id": qid[qq][keep],
                "neighbor_id": cid[cc][keep],
                "cos_sim": S[qq, cc][keep],
            }
        )

    from graphsense_blocksci_spark.operators.textops import spread

    flat = spread(
        vectors.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
    )
    scored = (
        flat.mapInPandas(assign, row_schema)
        .groupBy("_table", "_bucket")
        .applyInPandas(bucket_score, out_schema)
    )
    # max, not first: BLAS scores for the same pair can differ in the
    # last ulp between (table, bucket) groups, and first() would make
    # rank ties flip run-to-run
    dedup = scored.groupBy("vec_id", "neighbor_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim"
        )
    )


def embedding_neardup(
    vectors: DataFrame,
    threshold: float = 0.35,
    n_bands: int = 4,
    band_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fifth dedup modality
    next to exact/MinHash-LSH/SimHash/n-gram (north-star brief; the
    reference has no text stack, so this is extension surface).

    Banded random-hyperplane LSH in the MinHash-LSH shape: `n_bands`
    independent bands of `band_planes` sign bits each; two vectors are
    CANDIDATES iff they agree on every bit of at least one band (OR
    over bands of AND over bits). Candidates then get an EXACT
    fixed-order cosine and only pairs >= `threshold` survive — the
    candidate/verify pattern, so false positives cost compute, never
    correctness. For true near-dups (cos >= 0.9) the default 4x4
    geometry gives ~96% recall per the (1-(1-p^r)^b) curve, p =
    1 - theta/pi.

    Scale shape: one scan computes all band buckets in a single
    projection; candidates are generated per (band, bucket) via a
    bucket-keyed self-join (shuffle on the band/bucket key, per-bucket
    quadratic bounded by bucket size — never all-pairs); pair dedup
    across bands is one hash aggregation. Every float op is a
    fixed-order fold, so the DuckDB oracle reproduces pairs AND
    cosines bit-exactly.

    `max_bucket` is the degenerate-bucket guard for the 100 TB run: a
    pathological bucket (zero vectors, constant embeddings) is
    quadratic in its size; buckets larger than the cap are DROPPED
    from candidate generation (documented recall trade — the same cap
    the text-LSH pair generator applies), bounding per-bucket work by
    max_bucket² regardless of data skew.

    Output: (id_a, id_b, cos_sim) with id_a < id_b.
    """
    dim = _probe_dim(vectors, vec_col)
    if dim is None:
        return _empty_pairs(vectors.sparkSession)
    planes = hyperplanes(dim, n_bands * band_planes, seed=seed)
    b = vectors.select(
        F.col(id_col).cast("long").alias("_id"),
        unit_vector(F.col(vec_col)).alias("_uv"),
        *[
            lsh_bucket(
                F.col(vec_col), planes[t * band_planes : (t + 1) * band_planes]
            ).alias(f"_b{t}")
            for t in range(n_bands)
        ],
    )
    # Candidate generation ships ID-ONLY rows through the band/bucket
    # shuffle (the explode multiplies rows ×n_bands — carrying the unit
    # vectors there would amplify shuffle bytes by n_bands·dim·8 per
    # row); vectors are re-attached exactly once per side, only for the
    # surviving deduped candidate pairs.
    bb = b.select(
        "_id",
        F.posexplode(F.array(*[f"_b{t}" for t in range(n_bands)])).alias(
            "_band", "_bucket"
        ),
    )
    if max_bucket is not None:
        wcnt = Window.partitionBy("_band", "_bucket")
        bb = (
            bb.withColumn("_bn", F.count(F.lit(1)).over(wcnt))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    cand = (
        bb.select(F.col("_id").alias("id_a"), "_band", "_bucket")
        .join(
            bb.select(F.col("_id").alias("id_b"), "_band", "_bucket"),
            ["_band", "_bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = b.select("_id", "_uv")
    pairs = cand.join(
        vecs.select(F.col("_id").alias("id_a"), F.col("_uv").alias("_ua")),
        "id_a",
    ).join(
        vecs.select(F.col("_id").alias("id_b"), F.col("_uv").alias("_ub")),
        "id_b",
    )
    return (
        pairs.select(
            "id_a", "id_b", dot(F.col("_ua"), F.col("_ub")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
    )


def embedding_neardup_gemm(
    vectors: DataFrame,
    threshold: float = 0.35,
    n_bands: int = 4,
    band_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Throughput variant of `embedding_neardup` — same banded-LSH
    geometry, all float work in Arrow+BLAS: one `mapInPandas` pass
    assigns every band bucket (two matmuls per batch), then one matmul
    per (band, bucket) group verifies cosines via `applyInPandas`,
    replacing ~|bucket|^2 + n_planes*n interpreted folds. BLAS
    reduction order differs from the sequential fold in the last ulp,
    so a plane-dot or cosine sitting exactly on its boundary can
    resolve differently — use `embedding_neardup` when bit-exact
    cross-engine parity matters (pytest gates the two variants equal
    away from the boundaries).

    100 TB shape: NO corpus-wide broadcast/collect — each Arrow batch
    holds one bucket's vectors (bounded by bucket size), the only
    shuffle is the same (band, bucket) key the fold variant uses, and
    cross-band pair dedup is the same hash aggregation.
    """
    dim = _probe_dim(vectors, vec_col)
    if dim is None:
        return _empty_pairs(vectors.sparkSession)
    planes = hyperplanes(dim, n_bands * band_planes, seed=seed)

    from pyspark.sql import types as T

    # one Arrow pass computes unit vectors AND all band buckets with two
    # matmuls per batch, emitting the (id, uv, band, bucket) explosion
    # the bucket join groups on — replaces n_bands*band_planes
    # interpreted per-element folds per row
    exploded_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_uv", T.ArrayType(T.DoubleType())),
            T.StructField("_band", T.IntegerType()),
            T.StructField("_bucket", T.LongType()),
        ]
    )

    def assign_buckets(it):
        import numpy as np
        import pandas as pd

        P = np.array(planes, dtype=np.float64)  # (n_bands*band_planes, dim)
        weights = (1 << np.arange(band_planes, dtype=np.int64))
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(np.int64)
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            U = X / np.linalg.norm(X, axis=1, keepdims=True)
            signs = (X @ P.T) > 0  # (n, n_bands*band_planes)
            uv_list = list(U)
            frames = []
            for t in range(n_bands):
                bucket = (
                    signs[:, t * band_planes : (t + 1) * band_planes] @ weights
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "_id": ids,
                            "_uv": uv_list,
                            "_band": np.full(len(ids), t, dtype=np.int32),
                            "_bucket": bucket,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from graphsense_blocksci_spark.operators.textops import spread

    flat = spread(
        vectors.select(
            F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
        )
    )
    bb = flat.mapInPandas(assign_buckets, exploded_schema)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    thr = float(threshold)

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        ids = pdf["_id"].to_numpy(np.int64)
        U = np.array(pdf["_uv"].tolist(), dtype=np.float64)
        S = U @ U.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= thr
        a, bmask = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, bmask), np.maximum(a, bmask)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": S[ia[keep], ib[keep]]}
        )

    pairs = bb.groupBy("_band", "_bucket").applyInPandas(bucket_pairs, out_schema)
    return pairs.groupBy("id_a", "id_b").agg(F.max("cos_sim").alias("cos_sim"))
