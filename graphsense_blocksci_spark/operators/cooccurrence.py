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
    """Ordered (toks[i], toks[i+d]) pairs for d = 1..window, built as
    `window` offset-slices zipped against the base array.

    NOT a nested index transform: `element_at(toks, i)` inside a
    lambda re-evaluates the whole tokenize expression per element
    (higher-order-function bodies are interpreted and never
    common-subexpression-eliminated), which is O(n² · tokenize) per
    row — measured 32 s vs ~1 s at sf0.1. The slice/zip form touches
    the token expression only 2·window times per row."""
    toks = tokens(text_col)
    n = F.size(toks)
    parts = [
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - d, F.lit(0))),
            F.slice(toks, 1 + d, F.greatest(n - d, F.lit(0))),
            lambda x, y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
        )
        for d in range(1, window + 1)
    ]
    return F.concat(*parts)


def pmi_pairs(
    docs: DataFrame,
    window: int = PMI_WINDOW,
    min_count: int = PMI_MIN_COUNT,
    text_col: str = "text",
) -> DataFrame:
    """(tok_a, tok_b, c_ab, c_a, c_b, lift) for ordered pairs with
    c_ab >= min_count; lift > 1 means the pair co-occurs more than
    independent unigram frequencies predict."""
    # ONE corpus scan and ONE shuffle: unigram occurrences ride the
    # same explode as the pairs, tagged with a NULL tok_b, so a single
    # (tok_a, tok_b) aggregation yields both count tables. The result
    # is vocab/collocation-sized; localCheckpoint(eager=False) pins it
    # so its four consumers (pair filter, unigram split, two totals)
    # reuse the materialized frame instead of re-scanning the corpus
    # (plain DataFrame reuse re-executes lineage; the static planner's
    # exchange-reuse does not fire across these differing parents).
    combined = F.concat(
        _pair_array(text_col, window),
        F.transform(
            tokens(text_col),
            lambda t: F.struct(
                t.alias("tok_a"),
                F.lit(None).cast("string").alias("tok_b"),
            ),
        ),
    )
    counts = (
        spread(docs)
        .select(F.explode(combined).alias("p"))
        .groupBy(
            F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    pc_all = counts.filter(F.col("tok_b").isNotNull())
    pair_counts = pc_all.filter(F.col("c_ab") >= min_count)
    unigrams = counts.filter(F.col("tok_b").isNull()).select(
        F.col("tok_a").alias("token"), F.col("c_ab").alias("c")
    )
    totals = pc_all.agg(F.sum("c_ab").alias("n_pairs")).crossJoin(
        unigrams.agg(F.sum("c").alias("n_tok"))
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
