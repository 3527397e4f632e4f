"""Document chunking: fixed-token sliding windows with overlap.

The context-window preprocessor of an LLM training / RAG-indexing
pipeline: split every document into `window`-token chunks advancing by
`stride` tokens (overlap = window - stride), the semantics of HF
tokenizers' `stride`/`return_overflowing_tokens`. The reference engine
has no text stack (its scope is chain ETL, `blocksci_export.py:1`);
extension surface like the rest of the LLM operators.

Chunk-count semantics (documented, mirrored verbatim in the oracle):
for n tokens, n_chunks = ceil(max(n - window, 0) / stride) + 1 when
n > 0 else 0 — every token is covered, the last chunk may be shorter
than `window`, and no start index exceeds the token count. All
integer arithmetic: the whole operator is cell-exact cross-engine.

Scale shape: a pure per-row projection (tokenize, slice, explode) —
zero shuffles, whole-stage codegen end-to-end; output fan-out is
~n/stride rows per document, each carrying only its own slice. At
100 TB this is scan-bound and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import spread, tokens

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_documents(
    docs: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_chunk_tokens, chunk_text) — one row per
    sliding window; empty documents produce no rows."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(
        n > 0,
        (
            F.floor(
                (F.greatest(n - window, F.lit(0)) + stride - 1) / F.lit(stride)
            )
            + 1
        ).cast("int"),
    ).otherwise(F.lit(0))
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        toks.alias("_toks"),
        n_chunks.alias("_nc"),
    )
    chunks = F.when(
        F.col("_nc") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("_nc") - 1),
            lambda i: F.slice(F.col("_toks"), i * stride + 1, window),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    ex = base.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "_ctoks")
    )
    return ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("_ctoks").cast("long").alias("n_chunk_tokens"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )
