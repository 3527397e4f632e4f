"""Streaming approximate-nearest-neighbor search — the streaming face
of `operators/similarity.cosine_topk_lsh`.

Serving shape: a training-data pipeline holds a large STATIC corpus
index and a STREAM of query embeddings (new documents to link, dedupe,
or retrieve for). The Spark-first decomposition:

- **Index once** (`lsh_index`): the corpus side of the LSH join —
  one row per (table, bucket, member) with the pre-normalized vector —
  is a plain DataFrame, built once and persisted/cached. At 100 TB the
  index is bucketed storage, not a broadcast: the stream-static join
  shuffles only the (tiny) stream side to the index's bucket keys.
- **Score as a stream-static join** (`score_stream`): bucket
  assignment for a streaming row is a pure projection (the same
  deterministic hyperplanes the index used — re-derived from (seed,
  table), never shipped), which is streaming-legal; candidates then
  come from a stream-static equi-join on (table, bucket). Append mode,
  no state, no watermark needed.
- **Rank in foreachBatch** (`knn_stream_topk`): per-query top-k needs
  a window rank, which streaming plans disallow — but because the
  index is STATIC, every candidate for a query row materializes in
  that row's own micro-batch, so ranking inside `foreachBatch` is
  EXACT (identical to the batch operator), not an approximation.
  Micro-batch boundaries never split a query's candidate set.

Scale notes: per micro-batch cost is |batch| × (1+multiprobe) stream
rows shuffled to buckets + the per-bucket candidate scan; the corpus is
never re-shuffled. Multi-probe multiplies only the query fan-out — the
same asymmetry the batch operator exploits.

Reference parity: the reference has no streaming query path at all
(its daemon loop is batch re-export, docker/ingest.sh:2-8); this module
is part of the beyond-reference LLM-pipeline surface (SURVEY §7.6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphsense_blocksci_spark.operators.similarity import (
    _probe_dim,
    dot,
    hyperplanes,
    lsh_bucket,
    unit_vector,
)


def lsh_index(
    vectors: DataFrame,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Static corpus index: one row per (table, bucket, member) with
    the unit-normalized vector. Build once; persist or write bucketed
    by `_bucket` so the streaming join co-locates for free."""
    parts = []
    dim = _probe_dim(vectors, vec_col)
    if dim is None:
        return vectors.sparkSession.createDataFrame(
            [], "_table int, _bucket long, neighbor_id long, _cv array<double>"
        )
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        parts.append(
            vectors.select(
                F.lit(t).cast("int").alias("_table"),
                lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
                F.col(id_col).cast("long").alias("neighbor_id"),
                unit_vector(F.col(vec_col)).alias("_cv"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def score_stream(
    query_stream: DataFrame,
    index: DataFrame,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Candidate scores for a STREAMING frame of query embeddings:
    (vec_id, neighbor_id, cos_sim), append-mode, stateless.

    The hyperplanes are re-derived from (seed, table, dim) — the dim
    comes from the static index side, so no action runs against the
    stream. Pairs found by several tables appear once per table here;
    `knn_stream_topk` (or any downstream ranker) dedups them.
    """
    if not 0 <= multiprobe <= n_planes:
        raise ValueError(f"multiprobe must be in [0, {n_planes}]")
    row = index.select(F.size("_cv").alias("d")).first()
    if row is None:
        return _empty_scored(query_stream, id_col, vec_col)
    dim = row["d"]
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        b = query_stream.select(
            F.col(id_col).cast("long").alias("vec_id"),
            unit_vector(F.col(vec_col)).alias("_qv"),
            lsh_bucket(F.col(vec_col), planes).alias("_b0"),
        )
        probes = F.array(
            F.col("_b0"),
            *[
                F.col("_b0").bitwiseXOR(F.lit(1 << j).cast("long"))
                for j in range(multiprobe)
            ],
        )
        per_table.append(
            b.select(
                "vec_id",
                "_qv",
                F.lit(t).cast("int").alias("_table"),
                F.explode(probes).alias("_bucket"),
            )
        )
    probed = per_table[0]
    for p in per_table[1:]:
        probed = probed.unionByName(p)
    return (
        probed.join(index, ["_table", "_bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            dot(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )


def _empty_scored(query_stream: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # Streaming-legal empty result: keep the stream's lineage, emit no rows.
    return query_stream.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.lit(0).cast("long").alias("neighbor_id"),
        F.lit(0.0).alias("cos_sim"),
    ).filter(F.lit(False))


def rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Batch ranker for a micro-batch of candidate scores: cross-table
    dedup, then per-query top-k — identical tie-break to the batch
    operator (desc cos_sim, asc neighbor_id)."""
    dedup = scored.groupBy("vec_id", "neighbor_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def knn_stream_topk(
    query_stream: DataFrame,
    index: DataFrame,
    sink: Callable[[DataFrame, int], None],
    k: int = 1,
    checkpoint: str | None = None,
    **score_kwargs,
):
    """Wire the full streaming kNN: score → exact per-batch top-k →
    caller's sink. Returns the started `StreamingQuery`.

    `sink(batch_df, batch_id)` receives the RANKED batch (vec_id,
    neighbor_id, rank, cos_sim); idempotent sinks (dedup-on-write or
    dynamic partition overwrite) make redelivery effectively-once.
    """
    scored = score_stream(query_stream, index, **score_kwargs)

    def _write(batch: DataFrame, batch_id: int) -> None:
        sink(rank_topk(batch, k), batch_id)

    writer = scored.writeStream.foreachBatch(_write).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
