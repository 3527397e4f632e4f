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


def unigram_likelihood(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style unigram LM quality signal, exact-rational variant:
    per document, the mean RELATIVE corpus frequency of its tokens —
    sum(tf(t)) / (n_tokens * N) with tf from this corpus and N the
    total token count. Rare-token-heavy (often noisy) documents score
    low, common-word prose scores high — the same ordering signal as
    mean unigram log-prob.

    Deliberately NOT log-prob: ln() differs in the last ulp between
    JVM Math.log and DuckDB's libm (~1% of integer inputs measured
    bitwise-unequal), so a log-based score cannot pass a bit-exact
    cross-engine gate. Here everything stays in integer sums (order-
    independent, overflow-checked domains) until ONE final division —
    bit-exact by construction.

    Scale shape: explode → |vocab|-sized tf aggregate (map-side
    partials) → hash join tokens-to-tf (vocab shuffles once; at 100 TB
    the vocab side is GB against the corpus's TB, the join keys are
    uniform) → per-doc integer aggregate. The corpus total N is a
    1-row aggregate cross-broadcast onto results.
    """
    per_tok = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(tokens(text_col)).alias("token"),
    )
    tf = per_tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").cast("long").alias("_N"))
    per_doc = (
        per_tok.join(tf, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("tf").cast("long").alias("sum_tf"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        "sum_tf",
        (
            # each factor widens to double BEFORE the multiply: at
            # 100 TB scale n_tokens * N overflows 2^63 as a long
            # product (silent wrap under non-ANSI Spark), while the
            # double product merely rounds — and rounds identically
            # in DuckDB (IEEE), keeping the oracle gate exact
            F.col("sum_tf").cast("double")
            / (F.col("n_tokens").cast("double") * F.col("_N").cast("double"))
        ).alias("mean_rel_freq"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    df_pct: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate detection (RefinedWeb/C4-style): a word
    3-gram appearing in >= ``df_pct`` percent of documents is
    boilerplate (headers, footers, licence blurbs); each document gets
    its fraction of distinct shingles that are boilerplate. The
    threshold compares integers (df * 100 >= df_pct * n_docs) so no
    float ever enters the set decision.

    Scale shape: per-doc DISTINCT shingle hashes (dedup before the
    shuffle) → |distinct shingles|-sized df aggregate → the boilerplate
    SET is df-filtered (tiny by construction — grams in 20% of a 100 TB
    corpus number in the thousands) and re-joined to per-doc shingles;
    the join key is the 28-bit hash, uniform. n_docs is a 1-row
    aggregate cross-broadcast into the threshold.
    """
    sh = shingle_hash_frame(docs, text_col=text_col, id_col=id_col)
    per_gram = sh.select(F.col(id_col), F.explode("_sh").alias("g"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("long").alias("_nd"))
    dfreq = per_gram.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    boiler = (
        dfreq.crossJoin(F.broadcast(ndocs))
        .filter(F.col("df") * 100 >= F.lit(int(df_pct)) * F.col("_nd"))
        .select("g")
    )
    marked = per_gram.join(
        boiler.withColumn("_is_b", F.lit(1)), "g", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce("_is_b", F.lit(0))).cast("long").alias("n_boiler"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_boiler",
            (
                F.col("n_boiler").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("boiler_frac"),
        )
    )


def vocab_overlap(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus strata (languages,
    sources): |V_a ∩ V_b| / |V_a ∪ V_b| over distinct token sets — the
    standard contamination / register-drift diagnostic when mixing
    training sources. Every unordered group pair gets a row — pairs
    with no common token report n_common=0 / jaccard=0.0 rather than
    being silently omitted, so 'no overlap' is distinguishable from
    'pair not evaluated'.

    Scale shape: ONE distinct (group, token) aggregate (map-side
    dedup), a self-equi-join on token (vocab-sized, not corpus-sized),
    and a per-pair count; the full pair grid comes from crossing the
    (tiny, |groups|-row) size frame with itself, then left-joining the
    broadcast intersection counts. Integer counts + one final
    division — bit-exact.
    """
    gv = (
        spread(docs)
        .select(F.col(group_col).alias("g"), F.explode(tokens(text_col)).alias("token"))
        .distinct()
    )
    sizes = gv.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("vsize"))
    inter = (
        gv.select(F.col("g").alias("g_a"), "token")
        .join(gv.select(F.col("g").alias("g_b"), "token"), "token")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    pairs = (
        sizes.select(F.col("g").alias("g_a"), F.col("vsize").alias("size_a"))
        .crossJoin(
            sizes.select(F.col("g").alias("g_b"), F.col("vsize").alias("size_b"))
        )
        .filter(F.col("g_a") < F.col("g_b"))
    )
    return (
        pairs.join(F.broadcast(inter), ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            "size_a",
            "size_b",
            F.coalesce("n_common", F.lit(0).cast("long")).alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0).cast("long")).cast("double")
                / (
                    F.col("size_a") + F.col("size_b")
                    - F.coalesce("n_common", F.lit(0).cast("long"))
                ).cast("double")
            ).alias("jaccard"),
        )
    )


# Deterministic fixture merge vocabulary for real greedy BPE/WordPiece
# application (bpe_encode): common English multi-char pieces + the
# lowercase letters. Digits and punctuation are deliberately absent so
# the unknown-character fallback path is exercised. The SQL oracle is
# generated FROM this constant, so both engines segment with the
# identical piece set.
BPE_FIXTURE_VOCAB: tuple[str, ...] = (
    # 4-char
    "tion", "ment", "able", "ight", "ough",
    # 3-char
    "the", "ing", "and", "ent", "ion", "for", "ate", "est", "ere",
    "his", "ver", "ter", "ous", "ith",
    # 2-char
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    # single letters (full fallback coverage for a-z)
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
)


def bpe_encode(
    docs: DataFrame,
    vocab: tuple[str, ...] = BPE_FIXTURE_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL subword segmentation (not the q47 piece-count estimate):
    greedy longest-match (WordPiece/max-munch) application of a merge
    vocabulary to every whitespace word, counting actual emitted
    tokens. At each position the longest vocab piece prefixing the
    remaining word is consumed; a position no piece covers advances one
    character and counts as unknown.

    Output per document (docs with zero words emit explicit zero
    rows): ``(doc_id, n_words, n_bpe_tokens, n_unk, tokens_per_word)``
    — all integers plus ONE final division, so the DuckDB oracle
    (which re-derives the identical segmentation with a match-length
    table + recursive walk) is bit-exact.

    Execution: Arrow-batched ``mapInPandas`` — the slow-path carve-out
    is justified because max-munch is an inherently sequential
    per-word loop (each consume depends on the previous position), not
    expressible as a fixed-depth column expression. The vocab ships as
    a closure constant (KBs); per-batch word memoization collapses the
    Zipf-heavy word distribution (a batch of 10k docs segments each
    distinct word once). No shuffle at all — pure projection.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("n_unk", T.LongType()),
        ]
    )
    src = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(text_col).alias("_toks"),
    )
    by_len = tuple(sorted(set(vocab), key=len, reverse=True))

    def batches(it):
        import pandas as pd

        vset = set(by_len)
        lens = sorted({len(p) for p in by_len}, reverse=True)
        memo: dict[str, tuple[int, int]] = {}

        def seg(word: str) -> tuple[int, int]:
            got = memo.get(word)
            if got is not None:
                return got
            n = unk = 0
            i, wl = 0, len(word)
            while i < wl:
                step = 0
                for pl in lens:
                    if pl <= wl - i and word[i : i + pl] in vset:
                        step = pl
                        break
                if step == 0:
                    step = 1
                    unk += 1
                n += 1
                i += step
            memo[word] = (n, unk)
            return (n, unk)

        for pdf in it:
            rows = []
            for did, toks in zip(pdf[id_col], pdf["_toks"]):
                nw = nt = nu = 0
                for w in toks:
                    t, u = seg(w)
                    nw += 1
                    nt += t
                    nu += u
                rows.append((did, nw, nt, nu))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_bpe_tokens", "n_unk"]
            )

    counted = src.mapInPandas(batches, schema=out_schema)
    return counted.select(
        id_col,
        "n_words",
        "n_bpe_tokens",
        "n_unk",
        F.when(
            F.col("n_words") > 0,
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_words").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("tokens_per_word"),
    )


# Feature-hashing dimension and weight range of the fixture linear
# quality model (quality_classifier). Weights are DERIVED (md5 of the
# bucket id), not stored: both engines re-create the identical model
# from these two constants.
QUALITY_CLF_DIM = 1024
QUALITY_CLF_WRANGE = 1000  # weights in [-1000, 1000] milli-units


def quality_classifier(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality filtering (the classifier step of
    CCNet/DCLM-style pipelines, distinct from the heuristic
    `quality_score`): a linear model over feature-hashed token counts
    scores every document; `keep` is the sign of the logit.

    The fixture model is derivation-defined: token -> 28-bit md5 hash
    -> bucket = hash % DIM; weight(bucket) = (hash28('w#'||bucket) %
    (2*WRANGE+1)) - WRANGE, an integer in milli-units. The logit is
    therefore an INTEGER sum (order-free, exact in any engine); the
    only double in the output is one final division by 1000. A real
    deployment swaps the derived weights for a trained table joined by
    bucket id — the plan shape (below) is identical.

    Scale shape: explode -> per-token bucket/weight projection (pure
    codegen, the md5s are per-row expressions) -> one per-doc integer
    aggregate with map-side partials. No vocabulary state, no
    broadcast, no skew (buckets are uniform by construction) — this is
    the cheapest possible 100 TB classifier sweep. Trained-weights
    variant: broadcast-join the DIM-row weight table on bucket.
    """
    from graphsense_blocksci_spark.operators.textops import hash28

    per_tok = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(tokens(text_col)).alias("token"),
    )
    bucket = F.pmod(hash28(F.col("token")), F.lit(QUALITY_CLF_DIM))
    weight = (
        F.pmod(
            hash28(F.concat(F.lit("w#"), bucket.cast("string"))),
            F.lit(2 * QUALITY_CLF_WRANGE + 1),
        )
        - F.lit(QUALITY_CLF_WRANGE)
    )
    scored = per_tok.select(id_col, weight.alias("_w")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("_w").cast("long").alias("logit_milli"),
    )
    # docs with zero tokens still get an explicit row (logit 0, kept)
    ids = spread(docs).select(F.col(id_col).cast("long").alias(id_col))
    return ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("logit_milli", F.lit(0).cast("long")).alias("logit_milli"),
        (
            F.coalesce("logit_milli", F.lit(0).cast("long")).cast("double")
            / F.lit(1000.0)
        ).alias("logit"),
        (F.coalesce("logit_milli", F.lit(0).cast("long")) >= 0).alias("keep"),
    )
