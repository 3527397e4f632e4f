"""Sparse lexical retrieval over the documents table: BM25 top-k.

The data-selection / retrieval primitive of a training-data pipeline
(targeted corpus selection a la DSIR/DoReMi-style pipelines, RAG index
backfills, eval-set neighbor pulls): score every document against a
small query set with BM25 and keep the top-k per query.

Exactness design (same rules as the rest of the repo):

- **Rational idf, not ln().** Classic BM25 idf is
  ``ln((N - df + .5)/(df + .5) + 1)``; ln() differs in the last ulp
  between JVM Math.log and DuckDB libm (measured ~1% of integer inputs
  — see unigram_likelihood), so an exact cross-engine gate is
  impossible with it. We use the rational core
  ``(N - df + .5)/(df + .5)`` directly — strictly monotone in the
  classic idf, so per-term ordering is preserved — and document the
  divergence here.
- **Fixed-order float fold.** The per-(query, doc) score is a sum of
  per-term doubles; summation order must be pinned for bitwise
  equality, so term scores are collected, sorted by term, and folded
  left-to-right (``F.aggregate`` ≡ DuckDB
  ``list_reduce(list_sort(...))``).

Scale shape: the query set is KBs and BROADCAST (both its terms and
the final per-query top-k heap); the corpus side pays one
corpus-token-sized tf aggregate (map-side partials, uniform term
keys), a per-doc length aggregate reusing the tf frame, and a
broadcast join of query terms onto tf. Document frequency is computed
only for the query vocabulary (aggregate of the broadcast-filtered
matched frame) and broadcast back — no vocab-wide shuffle. No corpus
self-join, no all-pairs anything; the only per-query state is the
top-k window over matched docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import spread, tokens

# Deterministic fixture query set (terms drawn from the synthetic
# corpus vocabulary). The SQL oracle is generated from this constant.
BM25_FIXTURE_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "hash join strategy"),
    (1, "window agg stream"),
    (2, "fast scan filter"),
    (3, "customer order table"),
    (4, "vector batch column"),
    (5, "slow merge sort spill"),
)
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_FIXTURE_QUERIES,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query under rational-idf BM25.

    Returns ``(query_id, doc_id, rank, score)``; rank ties broken by
    ascending doc_id (deterministic because scores are bit-exact).
    """
    spark = docs.sparkSession
    toks = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(text_col).alias("_t"),
    )
    terms = toks.select(id_col, F.explode("_t").alias("term"))
    # tf is the shared root of FOUR consumers (df_, dl, stats, scored);
    # the lazy localCheckpoint runs the regexp tokenization + explode
    # exactly once instead of once per consumer. dl re-derives from tf
    # (sum of per-term counts == token count) so no consumer reaches
    # back past the checkpoint.
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # Per-doc length from the tf frame itself (sum of per-term counts ==
    # token count). Only docs with >=1 token appear here — which is
    # exactly the set that can match a query term, so the scoring join
    # below needs nothing else. Zero-token docs still count toward
    # _n / avgdl, but as AGGREGATES they need no per-row re-attach: _n
    # is a column-pruned id count and _sumdl a sum over dl (zero-token
    # docs contribute 0 to it by construction). r13: this replaces the
    # former |docs|-sized ids left-join dl frame — one whole doc-keyed
    # join gone (guide §2.4), with _n/_sumdl values unchanged.
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    n_docs = spread(docs).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    stats = n_docs.crossJoin(
        dl.agg(F.sum("dl").cast("long").alias("_sumdl"))
    )
    qdf = spark.createDataFrame(
        list(queries), "query_id long, qtext string"
    ).select("query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("term"))
    # r13: document frequency is only ever consumed for the query
    # vocabulary (a handful of terms), so filter tf down to that
    # vocabulary FIRST via the broadcast semi-join, then aggregate the
    # tiny matched frame — the former full-vocab term-keyed shuffle
    # (df over every corpus term) becomes a <=|query vocab|-row frame
    # that BROADCASTS into the scoring join (guide §2.3/§3.1). Counts
    # for query terms are identical; terms matching no document drop
    # out of both sides of the inner join exactly as before.
    matched = tf.join(F.broadcast(qdf.select("term").distinct()), "term")
    df_ = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # per-(query, doc, term) score; every arithmetic step in fixed order
    kd = F.lit(float(BM25_K1))
    scored = (
        matched.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            id_col,
            "term",
            (
                (
                    (F.col("_n").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    (F.col("tf").cast("double") * F.lit(float(BM25_K1 + 1.0)))
                    / (
                        F.col("tf").cast("double")
                        + kd
                        * (
                            F.lit(float(1.0 - BM25_B))
                            + F.lit(float(BM25_B))
                            * (
                                F.col("dl").cast("double")
                                / (
                                    F.col("_sumdl").cast("double")
                                    / F.col("_n").cast("double")
                                )
                            )
                        )
                    )
                )
            ).alias("s"),
        )
    )
    folded = (
        scored.groupBy("query_id", id_col)
        .agg(F.array_sort(F.collect_list(F.struct("term", "s"))).alias("_arr"))
        .select(
            "query_id",
            id_col,
            F.aggregate(
                F.transform("_arr", lambda x: x["s"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, F.col("rank").cast("long").alias("rank"), "score"
        )
    )


def rank_fusion_borda(
    candidates: DataFrame,
    prior: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    prior_col: str = "prior",
) -> DataFrame:
    """Hybrid-retrieval rank fusion by Borda count: fuse a per-query
    candidate ranking (e.g. BM25 top-k) with a static document prior
    (quality score, length, freshness) — the lexical+prior fusion
    every two-stage retrieval stack runs before the expensive
    reranker. Borda is the INTEGER fusion rule (points = n − rank per
    list, summed), chosen over reciprocal-rank fusion deliberately:
    RRF's Σ 1/(60+r) is a float sum whose value depends on summation
    order, while Borda is exact and hash-comparable in any engine.

    The prior is re-ranked WITHIN each query's candidate set (ties:
    higher prior first, then ascending id), so no corpus-wide prior
    ranking exists anywhere — the fusion only ever touches
    |queries| × k candidate rows, which is broadcast-sized by
    construction. fused = 2n − rank − prior_rank, re-ranked
    descending with ascending-id ties.

    Returns (query_col, id_col, rank_col, prior_rank, borda,
    fused_rank) for fused_rank <= k.
    """
    # `j` feeds both the per-query size agg and the prior window; the
    # lazy localCheckpoint pins it (|queries| x k rows) so the upstream
    # candidate ranking — often a full BM25 plan — executes once, not
    # twice (the q162 shared-subplan audit, VERDICT r4 item 2).
    j = (
        candidates.select(
            query_col, id_col, F.col(rank_col).cast("long").alias(rank_col)
        )
        .join(
            prior.select(
                F.col(id_col), F.col(prior_col).cast("long").alias("_prior")
            ),
            id_col,
        )
        .localCheckpoint(eager=False)
    )
    n = j.groupBy(query_col).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    pw = Window.partitionBy(query_col).orderBy(
        F.desc("_prior"), F.asc(id_col)
    )
    ranked = j.withColumn(
        "prior_rank", F.row_number().over(pw).cast("long")
    ).join(n, query_col)
    fused = ranked.select(
        query_col,
        id_col,
        rank_col,
        "prior_rank",
        (2 * F.col("_n") - F.col(rank_col) - F.col("prior_rank"))
        .cast("long")
        .alias("borda"),
    )
    fw = Window.partitionBy(query_col).orderBy(
        F.desc("borda"), F.asc(id_col)
    )
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(fw).cast("long")
        )
        .filter(F.col("fused_rank") <= k)
    )
