"""Token co-occurrence and rational PMI lift over the documents table.

The statistics behind collocation mining, phrase tables, and
word-vector pre-training (word2vec/GloVe both start from exactly this
windowed co-occurrence count): for every ordered token pair (a, b)
where b follows a within `window` positions in a document, count
occurrences, join unigram counts, and score association.

Exactness design: classic PMI is ``log2(p(a,b) / (p(a)p(b)))`` —
log() is not bit-portable across engines (same reason BM25 uses a
rational idf, retrieval.py), so we emit the RATIONAL lift
``(c_ab/N_pairs) / ((c_a/N_tok)(c_b/N_tok))`` instead: strictly
monotone in PMI, and computed as a fixed-order chain of IEEE double
ops (numerator product left-to-right, then one divide) that DuckDB
reproduces bit-exactly. Counts themselves are integers.

Scale shape: pair generation is a per-row projection (nested
transform over the token array — no self-join on position, which
would shuffle the exploded corpus); then ONE hash aggregation on
(tok_a, tok_b) with map-side partials. Unigram counts are a
vocab-sized frame joined twice (broadcast at any realistic vocab);
corpus totals ride a 1-row broadcast crossJoin. The min_count filter
is applied on the pair aggregate BEFORE the joins, so the joined
frame is collocation-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import spread, tokens

PMI_WINDOW = 3
PMI_MIN_COUNT = 5


def _pair_array(text_col: str, window: int):
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.flatten(
        F.transform(
            idx,
            lambda i: F.when(
                i + 1 <= F.least(i + window, n),
                F.transform(
                    F.sequence(i + 1, F.least(i + window, n)),
                    lambda j: F.struct(
                        F.element_at(toks, i.cast("int")).alias("tok_a"),
                        F.element_at(toks, j.cast("int")).alias("tok_b"),
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<tok_a:string,tok_b:string>>"
                )
            ),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    window: int = PMI_WINDOW,
    min_count: int = PMI_MIN_COUNT,
    text_col: str = "text",
) -> DataFrame:
    """(tok_a, tok_b, c_ab, c_a, c_b, lift) for ordered pairs with
    c_ab >= min_count; lift > 1 means the pair co-occurs more than
    independent unigram frequencies predict."""
    base = spread(docs).select(
        _pair_array(text_col, window).alias("_pairs"),
        tokens(text_col).alias("_toks"),
    )
    pair_counts = (
        base.select(F.explode("_pairs").alias("p"))
        .groupBy(
            F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    unigrams = (
        base.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = base.select(
        F.sum(F.size("_pairs")).alias("n_pairs"),
        F.sum(F.size("_toks")).alias("n_tok"),
    )
    scored = (
        pair_counts.join(
            F.broadcast(
                unigrams.select(
                    F.col("token").alias("tok_a"), F.col("c").alias("c_a")
                )
            ),
            "tok_a",
        )
        .join(
            F.broadcast(
                unigrams.select(
                    F.col("token").alias("tok_b"), F.col("c").alias("c_b")
                )
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    # Fixed-order double chain: (((c_ab * n_tok) * n_tok) / n_pairs
    # / c_a / c_b) — mirrored term-for-term in the oracle.
    lift = (
        F.col("c_ab").cast("double")
        * F.col("n_tok").cast("double")
        * F.col("n_tok").cast("double")
        / F.col("n_pairs").cast("double")
        / F.col("c_a").cast("double")
        / F.col("c_b").cast("double")
    )
    return scored.select(
        "tok_a", "tok_b", "c_ab", "c_a", "c_b", lift.alias("lift")
    )
