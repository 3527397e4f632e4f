"""Exact sparse similarity joins over token sets — the candidate/verify
family BETWEEN exact-dedup (identical text) and MinHash-LSH
(probabilistic): prefix-filtered Jaccard set-similarity join (the
PPJoin/AllPairs design from the set-similarity-join literature) and the
inverted-index TF-cosine join. Both are EXACT — every qualifying pair
is emitted, no false negatives — yet neither ever forms the all-pairs
cross product:

- `jaccard_join` prunes with the *prefix filter*: order every doc's
  token set by one global total order (rarest token first), keep only
  the first |s| - ceil(t*|s|) + 1 tokens as the "prefix"; two sets
  with Jaccard >= t MUST share a prefix token (pigeonhole on the
  overlap bound), so joining on prefix tokens alone finds every
  qualifying pair. Rare-first ordering makes prefix posting lists the
  SHORT ones — the candidate join fans out on rare tokens, not
  stopwords.

- `tf_cosine_join` joins docs through their shared tokens (the
  inverted index), accumulates the integer dot product Σ tf1*tf2 per
  pair, and verifies cos >= t as the integer predicate
  (t100*dot)^2 >= ... — sparse GEMM as a groupBy, the exact backbone
  of TF-IDF similarity search.

Exactness discipline: intersections, dot products and norms are
integers; thresholds compare integer cross-products (never a float
epsilon); the reported float similarity is one IEEE divide (and one
correctly-rounded sqrt for cosine) on those integers — bit-identical
in any engine, so the DuckDB all-pairs oracle can hash-compare.

Scale shape (100 TB): per-doc token sets are deduped/counted map-side
before any shuffle; the candidate shuffle moves (token, id) pairs for
PREFIX tokens only (Jaccard) or df-capped tokens only (cosine); the
verify step re-joins token arrays by id (id-only candidate pairs ride
the wide shuffle, like the repo's LSH near-dup). A stopword token
would make a posting list quadratic — `max_df` caps it for cosine
(standard stopword pruning, part of the operator contract), while the
Jaccard prefix filter is self-limiting because rare-first prefixes
rarely include stopwords (a pathological corpus can still skew a
posting list; cap with max_df there too if needed).

Reference parity: none — the reference has no similarity-join surface;
this module is part of the beyond-reference LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_tokens(docs: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(id, toks sorted-distinct array, n) for docs with >= 1 token."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_sort(F.array_distinct(F.col(tokens_col))).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )


def jaccard_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_pct: int = 60,
) -> DataFrame:
    """Exact Jaccard set-similarity self-join: all pairs (a < b) with
    |A ∩ B| / |A ∪ B| >= threshold_pct/100, via prefix filtering.

    The global token order is (document frequency ASC, token ASC) —
    any consistent total order keeps the filter lossless; rare-first
    keeps it CHEAP. The order is applied per doc by joining tokens to
    their df and re-aggregating (one |occurrences|-sized shuffle), so
    no vocab-wide ranked window exists anywhere.

    Prefix length: L = n - ceil(t*n) + 1 with t*n computed as integer
    ceil((threshold_pct * n) / 100) — overlap o >= ceil(t*(n1+n2)/(1+t))
    is the tight AllPairs bound; the simpler per-set bound used here
    (o >= ceil(t*n)) is looser but still lossless and keeps the
    arithmetic integer-only.

    Verify: integer predicate 100*inter >= t100*(n1+n2-inter).
    Returns (id_a, id_b, inter, n_a, n_b, jaccard).
    """
    # the tokenized per-doc sets feed FOUR plan branches (df counts,
    # prefix ranking, both verify sides); localCheckpoint pins them so
    # the regex/shingle work runs once, not per branch — the in-plan
    # analog of staging the token table (repo pattern: cooccurrence.py)
    d = _doc_tokens(docs, id_col, tokens_col).localCheckpoint(eager=False)
    occ = d.select("id", "n", F.explode("toks").alias("t"))
    df_counts = occ.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # rank tokens inside each doc by (df, token); keep the L rarest
    ranked = (
        occ.join(df_counts, "t")
        .groupBy("id", "n")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "t"))
            ).alias("ordered")
        )
    )
    lpref = (
        F.col("n")
        - F.ceil((F.lit(threshold_pct) * F.col("n")) / 100).cast("int")
        + 1
    )
    prefixes = ranked.select(
        "id",
        F.explode(
            F.slice(F.col("ordered.t"), 1, lpref)
        ).alias("t"),
    )
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "t")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    sets = d.select("id", "toks", "n")
    verified = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("toks_a"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("toks_b"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
        )
        .filter(
            F.lit(100) * F.col("inter")
            >= F.lit(threshold_pct)
            * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    )


def tf_cosine_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_pct: int = 50,
    max_df: int = 1 << 30,
) -> DataFrame:
    """Exact TF-weighted cosine similarity self-join through the
    inverted index: all pairs (a < b) with
    cos = Σ tf_a*tf_b / (||a|| ||b||) >= threshold_pct/100,
    where tf counts tokens with df <= max_df (stopword pruning — part
    of the contract, mirrored by the oracle; norms are computed over
    the SAME pruned vocabulary so cos stays a true cosine).

    The pair dot product is a groupBy over posting-list joins — sparse
    GEMM with |postings|² fan-out per token, which max_df bounds.
    Verify is the integer predicate (100*dot)² >= t²*q_a*q_b (valid
    because tf >= 0 makes dot >= 0). Returns
    (id_a, id_b, dot, q_a, q_b, cosine).
    """
    d = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("t")
    )
    tf = d.groupBy("id", "t").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_counts = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # pruned postings feed three branches (norms + both join sides);
    # pin them so tokenize+count runs once
    kept = tf.join(
        df_counts.filter(F.col("df") <= max_df).select("t"), "t"
    ).localCheckpoint(eager=False)
    norms = kept.groupBy("id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("q")
    )
    dots = (
        kept.alias("a")
        .join(kept.alias("b"), "t")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col("id").alias("id_a"), F.col("q").alias("q_a")),
            "id_a",
        )
        .join(
            norms.select(F.col("id").alias("id_b"), F.col("q").alias("q_b")),
            "id_b",
        )
        .filter(
            (F.lit(100) * F.col("dot")) * (F.lit(100) * F.col("dot"))
            >= F.lit(threshold_pct)
            * F.lit(threshold_pct)
            * F.col("q_a")
            * F.col("q_b")
        )
    )
    return scored.select(
        "id_a",
        "id_b",
        "dot",
        "q_a",
        "q_b",
        (
            F.col("dot").cast("double")
            / F.sqrt((F.col("q_a") * F.col("q_b")).cast("double"))
        ).alias("cosine"),
    )


def containment_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_pct: int = 80,
    max_df: int | None = None,
) -> DataFrame:
    """Exact CONTAINMENT (asymmetric Jaccard) self-join: all DIRECTED
    pairs (a, b), a != b, with |A ∩ B| / |A| >= threshold_pct/100 —
    the doc-in-doc / quote-detection primitive exact Jaccard misses
    (a short doc fully quoted inside a long one has tiny Jaccard but
    containment 1.0).

    Prefix filtering is ASYMMETRIC, which is the whole trick: the
    containment bound constrains only the contained side (o >=
    ceil(t·|A|)), so A contributes its L = n − ceil(t·n) + 1 rarest
    tokens (df ASC, token ASC order — same lossless argument as
    `jaccard_join`) while B must be present with its FULL posting
    list (containment imposes no floor relative to |B|). Candidates =
    A-prefix ⋈ B-postings on the token; verify is the integer
    predicate 100·inter >= t·n_a. No false negatives.

    ``max_df`` (optional) drops tokens with document frequency >
    max_df from CANDIDATE GENERATION only — the stopword-pruning
    knob for the quadratic head at scale (same contract as
    `tf_cosine_join`); it sacrifices completeness only for pairs
    whose every shared token is df-capped, and stays None under the
    oracle.

    Returns (id_a, id_b, inter, n_a, n_b, containment) with
    containment = inter/n_a as the one final double.
    """
    d = _doc_tokens(docs, id_col, tokens_col).localCheckpoint(eager=False)
    occ = d.select("id", "n", F.explode("toks").alias("t"))
    df_counts = occ.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        df_counts = df_counts.filter(F.col("df") <= max_df)
    ranked = (
        occ.join(df_counts, "t")
        .groupBy("id", "n")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "t"))).alias("ordered")
        )
    )
    lpref = (
        F.col("n")
        - F.ceil((F.lit(threshold_pct) * F.col("n")) / 100).cast("int")
        + 1
    )
    prefixes = ranked.select(
        "id", F.explode(F.slice(F.col("ordered.t"), 1, lpref)).alias("t")
    )
    postings = (
        occ.join(df_counts.select("t"), "t") if max_df is not None else occ
    ).select(F.col("id").alias("id_b"), "t")
    cand = (
        prefixes.alias("a")
        .join(postings, "t")
        .filter(F.col("a.id") != F.col("id_b"))
        .select(F.col("a.id").alias("id_a"), "id_b")
        .distinct()
    )
    sets = d.select("id", "toks", "n")
    return (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("toks_a"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("toks_b"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
        )
        .filter(
            F.lit(100) * F.col("inter")
            >= F.lit(threshold_pct) * F.col("n_a")
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("inter").cast("double") / F.col("n_a").cast("double"))
            .alias("containment"),
        )
    )
