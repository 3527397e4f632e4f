"""Text deduplication at training-data-pipeline scale.

Operators over a `documents(doc_id, text, ...)` table:

- ``exact_dedup``        — content-hash groupBy; the canonical first pass.
- ``minhash_signatures`` — per-doc minhash signature (pure projection).
- ``minhash_lsh_pairs``  — banded LSH candidate pairs: shuffle on band
  key, pairs generated only WITHIN buckets — never all-pairs.
- ``simhash``            — 32-bit simhash per doc (pure projection).
- ``ngram_jaccard_pairs``— exact shingle-set Jaccard, evaluated only on
  LSH candidates (the verify step of the candidate/verify pattern).
- ``substring_dedup``    — substring-level exact dedup (Lee et al. 2022
  ExactSubstr): char-k-gram position hashes → cross-doc repeats →
  per-doc maximal duplicated spans.
- ``decontaminate``      — n-gram-overlap benchmark decontamination
  against a broadcast eval shingle set.

Scale notes (the part that must survive 100 TB):
- exact dedup shuffles once on a 128-bit content hash — uniformly
  distributed, no skew, map-side partial aggregation applies.
- LSH candidate generation is the textbook banding trick: a pair is
  compared only if some band of their minhash signatures collides, so
  the cost is sum over buckets of |bucket|^2, not |corpus|^2. Hot
  buckets (boilerplate-heavy corpora) are the known failure mode:
  `max_bucket` caps them (drop buckets above the cap, exactly what
  production dedup pipelines do) and AQE skew-join splits the rest.
- signatures/simhash are per-row column expressions — no shuffle at all.

No UDFs anywhere: md5, array ops and folds are all JVM-side codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import (
    LSH_BAND_ROWS,
    MINHASH_COEFFS,
    MINHASH_PERMS,
    MINHASH_PRIME,
    normalize_text,
    shingle_hash_frame,
    spread,
    tokens,
)


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id document per normalized content hash.

    Returns (content_hash, keep_id, n_dups). One shuffle on the hash.
    """
    hashed = spread(docs).select(
        F.md5(normalize_text(text_col)).alias("content_hash"),
        F.col(id_col).cast("long").alias(id_col),
    )
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document minhash signature columns mh0..mh{perms-1}.

    Plan shape: explode the shingle-hash array ONCE, then compute all
    `perms` permutation-mins in a single hash aggregate — plain
    arithmetic expressions, fully inside whole-stage codegen (the
    higher-order-function alternative runs interpreted, ~10× slower
    per element). The groupBy shuffles on doc_id, but map-side partial
    aggregation collapses each partition to one row per local doc
    first, so the shuffle carries |docs| × perms longs, not shingles.
    Docs too short to have any shingle vanish in the explode — same
    semantics as dropping NULL signatures (no LSH information).
    """
    # `shingles` lets a caller that also consumes the shingle frame
    # elsewhere (e.g. the q176 estimator audit) pass a pinned copy so
    # the normalize→tokenize→shingle pipeline runs once, not per
    # consumer.
    sh = (
        shingle_hash_frame(docs, text_col, id_col)
        if shingles is None
        else shingles
    )
    exploded = sh.select(id_col, F.explode("_sh").alias("_h"))
    aggs = [
        F.min(
            (F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:perms])
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    band_rows: int = LSH_BAND_ROWS,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded minhash LSH.

    Returns distinct (id_a, id_b) with id_a < id_b, generated only
    WITHIN (band_index, band_key) buckets. At corpus scale, set
    `max_bucket` to drop degenerate buckets (boilerplate-heavy
    corpora) — pair count is bounded by n_bands * max_bucket² per
    bucket instead of |corpus|².
    """
    # `sigs` lets a caller reuse an already-pinned signature frame so
    # the whole minhash pipeline isn't recomputed per consumer.
    if sigs is None:
        sigs = minhash_signatures(docs, text_col, id_col, perms)
    n_bands = perms // band_rows
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{b * band_rows + r}")
                                for r in range(band_rows)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # Bucket-local pair generation via ONE groupBy instead of a self
    # join: the self-join form computes the whole signature pipeline
    # twice (once per branch) and shuffles both; grouping collects each
    # bucket's ids once and enumerates i<j pairs inside the array —
    # one pipeline pass, one shuffle, cost still sum |bucket|².
    buckets = bands.groupBy("band", "key").agg(
        F.collect_list(id_col).alias("_ids")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    pair_arrays = buckets.filter(F.size("_ids") > 1).select(
        F.flatten(
            F.transform(
                "_ids",
                lambda x, i: F.transform(
                    F.slice(
                        F.col("_ids"), (i + 2).cast("int"), F.size("_ids")
                    ),
                    lambda y: F.struct(
                        F.least(x, y).alias("id_a"),
                        F.greatest(x, y).alias("id_b"),
                    ),
                ),
            )
        ).alias("_pairs")
    )
    return (
        pair_arrays.select(F.explode("_pairs").alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """32-bit frequency-weighted simhash per document.

    Bit j of the signature is set iff the sum over tokens of
    (bit j of the token's 32-bit md5 hash ? +1 : -1) is positive.
    Entirely per-row folds — zero shuffle; near-dup docs differ in
    O(edit) bits, so hamming-distance banding gives the scale path.
    """
    # Materialize the token-hash array once (md5 is the expensive part)
    # so the 32 per-bit folds reuse it instead of re-hashing.
    hashed = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        F.transform(
            tokens(text_col),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("_th"),
    )
    def bit_fold(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j) % 2 == 1, 1
        ).otherwise(-1)

    bit_sums = [
        F.aggregate(F.col("_th"), F.lit(0), bit_fold(j)) for j in range(bits)
    ]
    sig = None
    for j, s in enumerate(bit_sums):
        term = F.when(s > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return hashed.select(id_col, sig.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for LSH candidate pairs — the verify
    step. Output: (id_a, id_b, jaccard) for candidates with
    jaccard >= threshold.

    The expensive exact measure runs ONLY on pairs LSH surfaced; the
    shingle sets are joined in by id (two hash joins on ids, both
    broadcast-able when the candidate set is small — the normal case).
    `max_bucket` forwards to the LSH candidate stage: degenerate
    (boilerplate-heavy) buckets above the cap are dropped before pair
    enumeration, bounding candidate count at corpus scale.
    """
    pairs = minhash_lsh_pairs(docs, text_col, id_col, max_bucket=max_bucket)
    sets_ = shingle_hash_frame(docs, text_col, id_col).withColumnRenamed(
        "_sh", "sh"
    )
    ja = (
        pairs.join(sets_.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets_.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
    )
    return ja.filter(F.col("jaccard") >= threshold)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    distinct word-shingle hashes it shares with ANY document of the
    evaluation/benchmark set. Returns ``(doc_id, n_shared_shingles)``
    for contaminated documents only (n > 0); join back left-anti to
    drop them, or threshold on the count.

    The standard pre-training hygiene step (n-gram-overlap
    decontamination, as published with GPT-3 appendix C and The Pile):
    eval suites are kilobytes against a corpus of terabytes, so the
    eval shingle set is distinct-ed and BROADCAST — the corpus side is
    one shingle projection + a broadcast inner join + a partial count
    aggregate. The only shuffle is the per-doc count rollup, whose
    width is bounded by the contaminated-doc count, not the corpus.
    Shingle hashes per doc are already distinct (shingle_hash_frame),
    so the per-doc join-hit count IS the distinct shared count.
    """
    train_sh = shingle_hash_frame(docs, text_col, id_col).select(
        id_col, F.explode("_sh").alias("_h")
    )
    eval_sh = (
        shingle_hash_frame(eval_docs, text_col, id_col)
        .select(F.explode("_sh").alias("_h"))
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def substring_dedup(
    docs: DataFrame,
    k: int = 50,
    min_docs: int = 2,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level exact dedup (the ExactSubstr modality of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): detect runs of >= ``k`` characters that repeat across
    documents, and report per document how much of it is covered by
    such repeated runs.

    Instead of a monolithic suffix array (the paper's single-node
    structure), the same detection distributes as shingle hashing:
    every char-``k``-gram position gets a 60-bit md5-prefix hash, a
    hash occurring in >= ``min_docs`` DISTINCT documents marks its
    positions as duplicated, and per document the duplicated positions
    merge into maximal spans (gaps-and-islands: a new span starts when
    the next position begins past the previous interval's end). A
    char run of length L >= k repeated across docs marks exactly its
    L - k + 1 positions, and the merged span length recovers L.

    Output, one row per document (zero rows are explicit, not
    omitted): ``(doc_id, n_positions, n_dup_positions, dup_chars,
    dup_frac)`` where dup_chars is the merged span length and
    dup_frac = dup_chars / len(normalized text).

    Scale shape: the per-position projection ships ONLY (hash60, id,
    pos) into the one corpus-position-sized shuffle (12 bytes/position,
    not the k-char string); the duplicated-hash set is a groupBy on the
    uniform 60-bit key with map-side partials, re-joined on the same
    key; the island merge windows over per-doc duplicated positions
    only (bounded by doc length). That mirrors the suffix-array cost
    profile (every position is touched once) while staying fully
    distributed. At 100 TB, run ``stride > 1`` (e.g. k/2) as a
    candidate pass — a repeated run of length >= k + stride - 1 still
    hits a sampled position — then re-run stride=1 on candidate docs
    only; stride=1 here is the exact setting used by the oracled query.

    Hash honesty: two different k-grams collide with p = 2^-60, so a
    'duplicated' verdict is exact up to that; the DuckDB oracle uses
    the identical hash, so the correctness gate is bit-exact
    regardless. 60 bits (15 hex chars of md5) is the widest md5 prefix
    that fits signed 64-bit in both engines.
    """
    base = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        normalize_text(text_col).alias("_s"),
    )
    base = base.select(id_col, "_s", F.length("_s").alias("_len"))
    n_pos = F.when(
        F.col("_len") >= k, F.col("_len") - F.lit(k - 1)
    ).otherwise(F.lit(0))
    # explode positions, then project to (hash, id, pos) BEFORE any
    # shuffle — the string never leaves the scan stage
    occ = (
        base.select(
            id_col,
            "_s",
            F.explode(
                F.when(
                    F.col("_len") >= k,
                    F.sequence(
                        F.lit(1), F.col("_len") - F.lit(k - 1), F.lit(stride)
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("p"),
        )
        .select(
            id_col,
            F.col("p").cast("int").alias("p"),
            F.conv(
                F.substring(F.md5(F.substring(F.col("_s"), F.col("p"), F.lit(k))), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("_h"),
        )
    )
    if min_docs == 2:
        # "seen in >= 2 distinct docs" ⇔ min(id) != max(id): O(1)
        # aggregation state per hash (vs a distinct-set), fully
        # map-side combinable — the difference between a bounded and an
        # unbounded reducer on boilerplate-hot hashes
        dup_h = (
            occ.groupBy("_h")
            .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("_h")
        )
    else:
        dup_h = (
            occ.groupBy("_h")
            .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("_h")
        )
    dup_pos = occ.join(dup_h, "_h").select(id_col, "p")
    w = Window.partitionBy(id_col).orderBy("p")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    islands = (
        dup_pos.withColumn("_prev", F.lag("p").over(w))
        .withColumn(
            "_ni",
            F.when(
                F.col("_prev").isNull() | (F.col("p") - F.col("_prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_ni").over(wrun))
        .groupBy(id_col, "_island")
        .agg(
            (F.max("p") - F.min("p") + F.lit(k)).alias("_ilen"),
            F.count(F.lit(1)).alias("_np"),
        )
    )
    per_doc = islands.groupBy(id_col).agg(
        F.sum("_ilen").cast("long").alias("dup_chars"),
        F.sum("_np").cast("long").alias("n_dup_positions"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        n_pos.cast("long").alias("n_positions"),
        F.coalesce("n_dup_positions", F.lit(0).cast("long")).alias(
            "n_dup_positions"
        ),
        F.coalesce("dup_chars", F.lit(0).cast("long")).alias("dup_chars"),
        F.when(
            F.col("_len") > 0,
            F.coalesce("dup_chars", F.lit(0).cast("long")).cast("double")
            / F.col("_len").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def simhash_hamming_join(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """All pairs of signatures within Hamming distance ``max_hamming``
    — the pairing step SimHash exists for (Charikar'02 / the Google
    near-dup pipeline), exact by the pigeonhole block trick: split the
    signature into d+1 bit blocks; d differing bits cannot touch every
    block, so any qualifying pair shares at least one block VERBATIM.
    Candidates join on (block_idx, block_value) buckets; verify is the
    integer popcount of XOR. No false negatives, all integer ops.

    Scale shape: the candidate shuffle carries (block, value, id)
    triples — (d+1) rows per doc, id-only buckets like the MinHash
    band join. Bucket size ~ N / 2^(bits/(d+1)): at 32 bits / d=3 the
    8-bit blocks keep buckets ~N/256 (fine to ~10⁶ docs); for web
    scale switch to 64-bit signatures so 16-bit blocks divide N by
    65536 — width scales with bits, the verify stays O(candidates).

    Returns (id_a, id_b, hamming) with hamming <= max_hamming.
    """
    nb = max_hamming + 1
    width = bits // nb
    s = sigs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(sig_col).cast("long").alias("sig"),
    ).localCheckpoint(eager=False)
    blocks = []
    for i in range(nb):
        lo = i * width
        # last block absorbs the remainder bits
        w = bits - lo if i == nb - 1 else width
        mask = (1 << w) - 1
        blocks.append(
            s.select(
                "id",
                F.lit(i).alias("blk"),
                F.shiftrightunsigned("sig", lo).bitwiseAND(
                    F.lit(mask)
                ).alias("val"),
            )
        )
    exploded = blocks[0]
    for b in blocks[1:]:
        exploded = exploded.union(b)
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["blk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(
            s.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            s.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def span_dedup_rewrite(
    docs: DataFrame,
    span_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document exact dedup WITH rewrite (the deduplicate-and-cut
    step of Lee et al. 2022, at fixed span granularity): tokenize,
    cut each document into consecutive ``span_tokens``-token spans,
    keep only the corpus-wide FIRST occurrence of every distinct span
    (first = smallest (doc, span position) — total order, so retries
    and the oracle agree), and reassemble each document from its
    surviving spans in order. The q105 substring detector FINDS
    repeated spans; this operator REMOVES them and emits the cleaned
    corpus.

    Scale shape: one posexplode to span occurrences (map-side), one
    span-keyed min aggregate (map-side combined — a boilerplate span
    occurring 10⁶ times shuffles once per partition, not per copy),
    one join back on the span key, one per-doc regroup. Span strings
    ride the shuffle once; at web scale hash them first (the q155
    trick) and verify the tail exactly.

    Returns (id, n_spans, n_kept, new_text) — n_kept = 0 docs come
    back with an empty string, preserving corpus membership.
    """
    toks = spread(docs).select(
        F.col(id_col).cast("long").alias("id"),
        tokens(text_col).alias("_t"),
    )
    n = F.size("_t")
    nspans = F.ceil(n / F.lit(span_tokens)).cast("int")
    spans = toks.filter(n > 0).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nspans - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.slice("_t", i * span_tokens + 1, span_tokens),
                ),
            )
        ).alias("idx", "span"),
    )
    keeper = spans.groupBy("span").agg(
        F.min(F.struct("id", "idx")).alias("_k")
    )
    kept = (
        spans.join(keeper, "span")
        .filter(
            (F.col("id") == F.col("_k.id")) & (F.col("idx") == F.col("_k.idx"))
        )
        .select("id", "idx", "span")
    )
    stats = spans.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans")
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda x: x["span"],
            ),
        ).alias("new_text"),
    )
    return (
        stats.join(rebuilt, "id", "left")
        .select(
            "id",
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("new_text", F.lit("")).alias("new_text"),
        )
    )
