"""Text analysis for training-data curation: stats, quality scoring,
language ID, document fingerprinting.

All native column expressions over the `documents` table — every value
is integer counts or fixed-order double ratios, so the DuckDB oracle
reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import (
    normalize_text,
    shingle_hash_frame,
    spread,
    tokens,
)

# Tiny stopword profiles for the n-gram/stopword language heuristic.
# Deliberately overlapping (es/fr share 'de', 'la') — the scorer must
# break ties deterministically. Order = priority on ties.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "zu", "ist", "ein"),
    "es": ("el", "la", "y", "los", "que", "es", "un"),
    "fr": ("le", "la", "et", "les", "des", "est", "un"),
}
FINGERPRINT_K = 4  # bottom-k sketch size


def text_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc curation stats: token count, distinct tokens, normalized
    length, mean token length, type-token ratio."""
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(text_col).alias("_t"),
        F.length(normalize_text(text_col)).cast("long").alias("n_chars_norm"),
    )
    n_tok = F.size("_t").cast("long")
    n_distinct = F.size(F.array_distinct("_t")).cast("long")
    total_len = F.aggregate(
        F.col("_t"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return base.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        "n_chars_norm",
        (total_len.cast("double") / n_tok.cast("double")).alias("mean_token_len"),
        (n_distinct.cast("double") / n_tok.cast("double")).alias("type_token_ratio"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality gate (the Gopher-style rule family): flag docs
    outside sane length bands or with degenerate repetition. Returns
    (doc_id, n_tokens, type_token_ratio, quality_ok)."""
    stats = text_stats(docs, text_col, id_col)
    ok = (
        (F.col("n_tokens") >= 5)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("mean_token_len") >= 2.0)
        & (F.col("mean_token_len") <= 12.0)
        & (F.col("type_token_ratio") >= 0.1)
    )
    return stats.select(
        id_col, "n_tokens", "type_token_ratio", ok.alias("quality_ok")
    )


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language heuristic: score = # tokens in each
    language's stopword list; prediction = highest score in the fixed
    priority order en > de > es > fr, 'und' (undetermined) when every
    score is zero. Output: (doc_id, lang_pred, score)."""
    toks = tokens(text_col)

    def in_list(sw: tuple[str, ...]):
        return lambda t: t.isin(*sw)

    scores = {
        lang: F.size(F.filter(toks, in_list(sw))).cast("long")
        for lang, sw in LANG_STOPWORDS.items()
    }
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        *[c.alias(f"_s_{lang}") for lang, c in scores.items()],
    )
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANG_STOPWORDS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # dict order = priority order
        pred = pred.when(F.col(f"_s_{lang}") == best, F.lit(lang))
    return base.select(id_col, pred.alias("lang_pred"), best.alias("score"))


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = FINGERPRINT_K,
) -> DataFrame:
    """Bottom-k (KMV) sketch of the shingle-hash set as a compact
    content fingerprint: the k smallest distinct shingle hashes, sorted,
    joined with ','. Equal fingerprints <=> near-identical prefixes of
    the hashed shingle universe — the standard cheap near-dup key.
    Output: (doc_id, fingerprint, n_shingles)."""
    sh = shingle_hash_frame(docs, text_col, id_col)
    return sh.select(
        id_col,
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.array_sort("_sh"), 1, k), lambda x: x.cast("string")
            ),
        ).alias("fingerprint"),
        F.size("_sh").cast("long").alias("n_shingles"),
    )


# GPT-2-style pre-tokenizer, reduced to constructs whose semantics are
# identical in Java regex (Spark) and RE2 (DuckDB): letter runs, single
# digits (BPE numerals split per digit), punctuation/symbol singletons.
# Whitespace is explicit (\s differs between the engines at the margin:
# Java includes \x0B, RE2 does not).
BPE_PRETOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r\\f]"


def bpe_token_count(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pre-tokenizer piece counts — the budget-estimation pass of a
    training-data pipeline (how many tokens is this corpus?).

    `n_pieces` counts BPE-ish pre-tokens (letter runs / digits /
    punctuation — the split a byte-pair encoder would start from;
    contractions and byte-level details of the real GPT-2 regex are
    deliberately out of scope), `n_ws_tokens` counts whitespace tokens
    for the naive baseline, and `pieces_per_ws_token` is the corpus
    inflation factor. Pure JVM regex projection — no shuffle, no UDF.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_distinct_pieces"),
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
    )
    return base.select(
        id_col,
        "n_pieces",
        "n_distinct_pieces",
        "n_ws_tokens",
        (
            F.col("n_pieces").cast("double")
            / F.nullif(F.col("n_ws_tokens"), F.lit(0)).cast("double")
        ).alias("pieces_per_ws_token"),
    )


def curation_columns(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """APPEND the curation signals (n_tokens, mean_token_len,
    type_token_ratio, quality_ok, lang_pred) as columns, keeping every
    input column — the streaming-friendly form of `quality_score` +
    `language_id` (pure projections compose into any stream without
    joins; the keyed frames those return would self-join as
    stream-stream).

    The token array is STAGED as a real column first (interpreted-HOF
    gotcha: every expression referencing `tokens(text)` re-runs the
    normalize+split per row — staging pays it once)."""
    staged = docs.withColumn("_toks", tokens(text_col))
    if not docs.isStreaming:  # spread() inspects the RDD — batch only
        staged = spread(staged)
    toks = F.col("_toks")
    n_tok = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_len = total_len.cast("double") / n_tok.cast("double")
    ttr = n_distinct.cast("double") / n_tok.cast("double")
    ok = (
        (n_tok >= 5)
        & (n_tok <= 100_000)
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
        & (ttr >= 0.1)
    )
    def in_list(sw: tuple[str, ...]):
        return lambda t: t.isin(*sw)

    scores = {
        lang: F.size(F.filter(toks, in_list(sw))).cast("long")
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return staged.withColumns(
        {
            "n_tokens": n_tok,
            "mean_token_len": mean_len,
            "type_token_ratio": ttr,
            "quality_ok": ok,
            "lang_pred": pred,
        }
    ).drop("_toks")


def vocabulary(
    docs: DataFrame,
    top_n: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent whitespace
    tokens with a total tie-break (count desc, token asc) so the
    result is deterministic across engines and runs.

    The tokenizer is the repo-wide `textops.tokens` (same
    normalization the dedup/shingle oracles mirror). Scale shape:
    explode → two-phase hash aggregate (map-side partial counts make
    the shuffle |vocab|-sized, not |corpus|-sized) → TakeOrdered
    top-n on (count, token). Vocab building over 100 TB is exactly
    this plan; the explode never materializes corpus-wide state.
    """
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    return counts.orderBy(F.desc("tf"), F.asc("token")).limit(top_n)


def doc_frequency(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-token corpus statistics: total occurrences (`tf`) and the
    number of distinct documents containing the token (`df`), for
    tokens with df >= ``min_df`` — the exact-integer core of TF-IDF
    (the float weight is one log away, left to the consumer so the
    stats stay bit-comparable across engines).

    Scale shape: one explode + one grouped aggregate; `df` uses
    per-document token dedup BEFORE the shuffle (array_distinct on
    each row), so the distinct-count is a plain count, not an
    expensive count-distinct state."""
    per_doc = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("token"),
    )
    tf = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    dedup = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    df_ = dedup.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(df_, "token").filter(F.col("df") >= F.lit(min_df))


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    appendix A1.1): per document — token totals, the most frequent
    single token's count, word-2-gram totals, and the duplicate-2-gram
    fraction (1 - distinct/total). High values mark boilerplate and
    degenerate repetition for the curation filter.

    Shape: tokens are staged through a projection boundary once, then
    two explode→count→re-aggregate passes (tokens, 2-grams). The
    groupBy streams collapse map-side (per-(doc,gram) partial counts),
    so the shuffle carries at most |distinct grams per doc| rows per
    doc — repetitive docs, the ones this filter exists for, compress
    the MOST. No interpreted HOF over non-cheap closures: the 2-gram
    lambda touches only the staged `_toks` array reference.
    """
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(text_col).alias("_toks"),
    )
    n = F.size("_toks")
    idx = F.sequence(F.lit(1), n - 1)
    gram = F.when(
        n >= 2,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_toks"), i.cast("int")),
                F.element_at(F.col("_toks"), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok_stats = (
        base.select(id_col, F.explode("_toks").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("_c").alias("top_token_count"),
        )
    )
    gram_stats = (
        base.select(id_col, F.explode(gram).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_2grams"),
            F.count(F.lit(1)).alias("n_distinct_2grams"),
        )
    )
    ids = base.select(id_col)
    return (
        ids.join(tok_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct_tokens", F.lit(0)).alias("n_distinct_tokens"),
            F.coalesce("top_token_count", F.lit(0)).alias("top_token_count"),
            F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
            F.coalesce("n_distinct_2grams", F.lit(0)).alias("n_distinct_2grams"),
            (
                (F.col("n_2grams") - F.col("n_distinct_2grams")).cast("double")
                / F.nullif(F.col("n_2grams"), F.lit(0)).cast("double")
            ).alias("dup_2gram_frac"),
        )
    )
