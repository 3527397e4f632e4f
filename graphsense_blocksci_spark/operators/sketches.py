"""Bounded-memory sketch operators: frequent items and Bloom filters.

Two candidate/verify compositions that turn classic streaming sketches
into EXACT distributed answers — the same design as the LSH→verify
dedup stack (operators/text_dedup.py): an approximate, tiny-state pass
prunes the search space, then an exact pass over the survivors makes
the final answer bit-deterministic and oracle-checkable.

1. ``heavy_hitters`` — exact frequent items above a support threshold
   without ever shuffling the full key space. Phase 1 runs a mergeable
   Misra-Gries summary (Misra & Gries 1982; mergeability per Agarwal
   et al., "Mergeable Summaries", PODS'12) per partition inside ONE
   `mapInPandas` pass; the union of per-partition candidates provably
   contains every key with global count > n/capacity (pigeonhole over
   the per-partition error bounds), so with capacity ≥ 2/support the
   candidate set is a superset of the true answer. Phase 2 recounts
   ONLY the candidates (broadcast semi-join, map-side partial agg) and
   applies the exact integer threshold. At 100 TB the full vocabulary
   (billions of keys) never shuffles — only candidate-key rows do,
   and the candidate set is ≤ n_partitions × capacity, driver-bounded.

2. ``bloom_decontaminate`` — benchmark decontamination where the eval
   shingle set rides as a Bloom BITMAP (2 bits/key here) instead of an
   8-bytes/key broadcast hash set: ~30× smaller at equal eval size.
   The bitmap is built DISTRIBUTED (per-word `bit_or` aggregation —
   the hashes never leave the executors except as OR-folded words),
   shipped as a constant array literal, probed JVM-side (element_at +
   shiftright, whole-stage codegen), and Bloom false positives are
   removed by an exact join against the eval hashes — which is now a
   tiny shuffle because the Bloom pass already dropped ~99% of the
   corpus. No false negatives by Bloom's one-sided-error construction,
   so the result is bit-identical to the exact broadcast-join
   decontamination (operators/text_dedup.py:decontaminate) and shares
   its oracle shape.

The reference has no sketch surface (its exporter defers analytics to
Cassandra/BlockSci, blocksci_export.py:1); these are extension
operators for the curation pipeline, same as the dedup/ANN stack.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col

_MG_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType(), True),
        T.StructField("partition_total", T.LongType(), True),
    ]
)


def _mg_partition(capacity: int):
    """One Misra-Gries summary per partition, merged across Arrow
    batches with the PODS'12 merge rule: combine counters, then keep
    the top-`capacity` by subtracting the (capacity+1)-th largest
    count from everything (vectorized — value_counts + nlargest, no
    per-row Python loop). Emits the surviving candidate items plus one
    (NULL, n_p) row carrying the partition's total item count."""

    def run(it: Iterator) -> Iterator:
        import pandas as pd

        counts: "pd.Series | None" = None
        total = 0
        for pdf in it:
            vc = pdf["item"].dropna().value_counts()
            total += int(vc.sum())
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > capacity:
                top = counts.nlargest(capacity + 1)
                counts = (top - top.iloc[-1]).iloc[:-1]
                counts = counts[counts > 0]
        items = [] if counts is None else list(counts.index)
        yield pd.DataFrame(
            {
                "item": items + [None],
                "partition_total": [None] * len(items) + [total],
            }
        )

    return run


def heavy_hitters(
    items: DataFrame,
    col: str = "item",
    support_denominator: int = 512,
    max_candidates: int = 1 << 20,
) -> DataFrame:
    """EXACT frequent items: every value of ``col`` whose count is
    ≥ ceil(n / support_denominator) where n is the total row count —
    computed without a full-vocabulary shuffle. Returns
    ``(item, cnt)``, cnt LONG, exact.

    The support threshold is kept as INTEGER arithmetic
    (``(n + d - 1) // d``) so the oracle reproduces it with no float
    rounding hazard. Misra-Gries capacity is 2×denominator, which
    makes the phase-1 candidate union a guaranteed superset of the
    answer for any data distribution (threshold ≥ ceil(n/d) > n/(2d)
    = n/capacity whenever n > 0): the two-phase result is exact
    always, not just with high probability.

    ``max_candidates`` caps the driver-side candidate collect
    (≤ n_partitions × capacity rows by construction); exceeding it
    raises rather than silently degrading.
    """
    capacity = 2 * support_denominator
    src = items.select(F.col(col).cast("string").alias("item"))
    phase1 = src.mapInPandas(_mg_partition(capacity), schema=_MG_SCHEMA)
    rows = phase1.collect()
    total = sum(r["partition_total"] for r in rows if r["partition_total"] is not None)
    cands = sorted({r["item"] for r in rows if r["item"] is not None})
    if len(cands) > max_candidates:
        raise ValueError(
            f"heavy_hitters candidate set {len(cands)} exceeds "
            f"max_candidates={max_candidates}; raise the support "
            "denominator or partition the keyspace first"
        )
    spark = items.sparkSession
    if total == 0 or not cands:
        return spark.createDataFrame([], "item string, cnt long")
    threshold = (total + support_denominator - 1) // support_denominator
    cand_df = spark.createDataFrame([(c,) for c in cands], "item string")
    return (
        src.join(F.broadcast(cand_df), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
    )


def hdr_bucket(col, sub_bits: int = 4):
    """HDR-histogram bucket id for a non-negative integer value —
    log2 exponent + ``sub_bits`` of mantissa, ALL integer arithmetic
    (bit_length via length(bin(v)), shifts as exact power-of-two
    division inside the double-exact domain), so every engine computes
    the identical id: values ≤ 2^(sub_bits+1)-1 are their own bucket
    (exact); above that, id = e*2^sub_bits + mantissa_prefix -
    2^sub_bits where e is the bit length. Monotone in v with relative
    bucket width ≤ 2^-sub_bits — the deterministic, mergeable
    alternative to rank-error sketches whose merge order changes the
    answer."""
    v = _c(col).cast("long")
    e = F.length(F.bin(v)).cast("long")
    small_max = (1 << (sub_bits + 1)) - 1
    shift = e - F.lit(1 + sub_bits)
    m = F.floor(v / F.pow(F.lit(2.0), shift.cast("double"))).cast("long")
    return F.when(v <= small_max, v).otherwise(
        e * F.lit(1 << sub_bits) + m - F.lit(1 << sub_bits)
    )


def hdr_bucket_low(bucket_col, sub_bits: int = 4):
    """Inverse of `hdr_bucket`: the smallest value mapping to the
    bucket — the deterministic quantile estimate the histogram
    reports."""
    b = _c(bucket_col).cast("long")
    small_max = (1 << (sub_bits + 1)) - 1
    e = F.floor(b / F.lit(1 << sub_bits)).cast("long")
    m = b % F.lit(1 << sub_bits) + F.lit(1 << sub_bits)
    return F.when(b <= small_max, b).otherwise(
        F.floor(
            m * F.pow(F.lit(2.0), (e - F.lit(1 + sub_bits)).cast("double"))
        ).cast("long")
    )


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    sub_bits: int = 4,
) -> DataFrame:
    """Mergeable quantile-sketch PARTIALS: per-group bucket counts
    ``(*group_cols, bucket, cnt)``. The quantile analog of the q97
    HLL partials — per-day (or per-shard) histograms union by simply
    summing counts per bucket, and merge order cannot change a single
    count, unlike GK/KLL-style rank sketches. Histogram size is
    bounded by the value range (≈ sub_bits·64 buckets for longs),
    not the row count."""
    b = hdr_bucket(F.col(value_col), sub_bits).alias("bucket")
    return df.groupBy(*group_cols, b).agg(F.count(F.lit(1)).alias("cnt"))


def hdr_quantiles(
    hist: DataFrame,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (90, 100), (99, 100)),
    sub_bits: int = 4,
) -> DataFrame:
    """Quantile estimates from merged histogram partials: for each
    rational q = num/den, the lower bound of the first bucket whose
    cumulative count reaches rank = ceil(q·n) (integer arithmetic —
    no float rank). Returns ``(q_num, q_den, est)``, all LONG.

    The cumulative window runs over the BUCKET-ID order on the merged
    histogram — a bounded frame (hundreds of rows however large the
    input), the same deliberate single-partition shape as the
    sequence-packing offset window."""
    merged = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    picks = []
    for num, den in quantiles:
        rank = (F.col("n") * num + F.lit(den - 1)) / F.lit(den)
        picks.append(
            cum.filter(F.col("cum") >= F.floor(rank))
            .groupBy()
            .agg(F.min("bucket").alias("bucket"))
            .select(
                F.lit(num).cast("long").alias("q_num"),
                F.lit(den).cast("long").alias("q_den"),
                hdr_bucket_low(F.col("bucket"), sub_bits).alias("est"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def build_bloom_words(
    hashes: DataFrame,
    col: str,
    n_bits: int,
    n_hashes: int = 2,
) -> dict[int, int]:
    """Distributed Bloom-filter construction: probe positions are
    Spark-side xxhash64(value, seed) folds, OR-folded into 64-bit words
    by a per-word `bit_or` aggregate — only the (word_index, word)
    pairs reach the driver (≤ n_bits/64 rows), never the key set.
    Returns the sparse {word_index: word} dict. ``n_bits`` must be a
    power of two so the modulo is a mask on both build and probe."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    pos = [
        F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)
    ]
    exploded = hashes.select(
        F.explode(F.array(*pos)).alias("bit")
    ).select(
        (F.col("bit") / 64).cast("long").alias("word_idx"),
        # shiftleft() wants a literal shift amount; expr() lifts the
        # per-row bit offset into the JVM expression directly
        F.expr("shiftleft(1L, cast(pmod(bit, 64) as int))").alias("mask"),
    )
    words = exploded.groupBy("word_idx").agg(F.bit_or("mask").alias("word")).collect()
    return {int(r["word_idx"]): int(r["word"]) for r in words}


def bloom_member(
    col, words: "list[int] | Column", n_bits: int, n_hashes: int = 2
):
    """JVM-side Bloom membership probe: k xxhash64 positions against a
    dense array<long> bitmap — element_at + getbit, all inside
    whole-stage codegen. ``words`` is either a small literal list or a
    Column carrying the bitmap (the scale form: a 1-row broadcast
    crossJoin — `F.lit(list)` would build a CreateArray expression
    with one child PER WORD, and a megabit bitmap as a 32k-node
    Catalyst tree costs more in analysis/codegen than the whole
    query)."""
    lit = words if isinstance(words, Column) else F.lit(words)
    cond = None
    for seed in range(n_hashes):
        bit = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_bits))
        word = F.element_at(lit, (bit / 64).cast("int") + 1)
        hit = F.getbit(word, F.pmod(bit, F.lit(64))) == 1
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits_per_key: int = 16,
    n_hashes: int = 2,
    max_bitmap_bytes: int = 64 << 20,
) -> DataFrame:
    """Exact n-gram decontamination (same contract as
    text_dedup.decontaminate: per training doc, the count of DISTINCT
    shingle hashes shared with any eval doc) with a Bloom bitmap as
    the scale vehicle instead of a broadcast hash set.

    Plan: eval shingle hashes → distributed Bloom build (bit_or per
    word, driver sees only words) → constant-folded bitmap literal →
    JVM-side probe prunes the training shingle stream → exact inner
    join of the SURVIVORS against the eval hashes removes Bloom false
    positives (a tiny shuffle — the bitmap already dropped everything
    else) → per-doc distinct count. One-sided error means zero false
    negatives: output is bit-identical to the broadcast-join exact
    path and shares its oracle.

    ``max_bitmap_bytes`` bounds the literal (64 MB default ≈ 268M eval
    shingles at 16 bits/key); past that the right move is partitioning
    the eval space, and the guard raises with that advice.
    """
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hashes,
        spread,
    )

    def hashes_of(docs: DataFrame) -> DataFrame:
        return (
            spread(docs)
            .select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.explode(shingle_hashes(F.col(text_col))).alias("h"),
            )
            .distinct()
        )

    # one materialization: the count below, the bitmap build and the
    # final verify join all reuse the cached eval hash set instead of
    # re-running the shingle pipeline three times
    eh = hashes_of(eval_docs).select("h").distinct().localCheckpoint(eager=True)
    n_keys = eh.count()
    n_bits = 64
    while n_bits < max(64, n_keys * bits_per_key):
        n_bits <<= 1
    if n_bits // 8 > max_bitmap_bytes:
        raise ValueError(
            f"bloom bitmap would be {n_bits // 8} bytes for {n_keys} eval "
            f"shingles (cap {max_bitmap_bytes}); shard the eval set and "
            "union the per-shard decontamination counts instead"
        )
    sparse = build_bloom_words(eh, "h", n_bits, n_hashes)
    words = [sparse.get(i, 0) for i in range(n_bits // 64)]
    # bitmap as DATA on a broadcast 1-row frame, not as a literal
    # expression: one Literal node + one broadcast instead of a
    # CreateArray tree with n_bits/64 children
    bloom_df = train.sparkSession.createDataFrame(
        [(words,)], "bloom_words array<bigint>"
    )

    # r13: probe the bitmap BEFORE the (doc_id, h) distinct — the old
    # order ran the distinct's full-stream shuffle first, which is
    # exactly the shuffle the Bloom bitmap exists to avoid. The probe
    # is row-deterministic on h, so filter-then-distinct is identical
    # to distinct-then-filter; the shuffle now carries only candidate
    # pairs (guide §2.3 — shuffle fewer bytes).
    th = spread(train).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(shingle_hashes(F.col(text_col))).alias("h"),
    )
    candidates = (
        th.crossJoin(F.broadcast(bloom_df))
        .filter(
            bloom_member(F.col("h"), F.col("bloom_words"), n_bits, n_hashes)
        )
        .drop("bloom_words")
        .distinct()
    )
    confirmed = candidates.join(eh, "h")  # exact false-positive removal
    return confirmed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_shingles")
    )


# 28-bit hash space of the repo-wide md5-prefix convention
KMV_SPACE = 1 << 28


def _h28(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast(
        "long"
    )


def kmv_hashes(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
    salt_buckets: int = 64,
) -> DataFrame:
    """The trimmed KMV hash set per group: the ``k`` smallest DISTINCT
    28-bit md5-prefix hashes of the value, as rows ``(*group_cols,
    h)``. This is the mergeable partial — union sketches by unioning
    hash frames and re-trimming (`kmv_trim`), exactly like the HDR
    bucket partials merge by summing.

    Scale shape: one dedup shuffle on (group, hash) — same cost as any
    distinct — then TWO bounded window passes: k-smallest per
    (group, hash-salt) in parallel, then k-smallest per group over the
    ≤ salt_buckets·k survivors. A billion-distinct group never sorts
    more than salt_buckets·k rows in one task.
    """
    hashed = (
        df.select(*group_cols, _h28(F.col(value_col)).alias("h"))
        .distinct()
    )
    w_salt = Window.partitionBy(
        *group_cols, (F.col("h") % salt_buckets).alias("_salt")
    ).orderBy("h")
    phase1 = (
        hashed.withColumn("_rn", F.row_number().over(w_salt))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return kmv_trim(phase1, group_cols, k)


def kmv_trim(
    hashes: DataFrame, group_cols: tuple[str, ...], k: int
) -> DataFrame:
    """Re-trim a (merged) hash frame to the k smallest distinct per
    group — the KMV union/merge step."""
    w_grp = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("_rn", F.row_number().over(w_grp))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    hashes: DataFrame, group_cols: tuple[str, ...], k: int = 256
) -> DataFrame:
    """Distinct-count estimate from a trimmed KMV hash frame:
    ``(*group_cols, n_sketch, kth_hash, est_distinct)`` — when a group
    holds fewer than k hashes the sketch IS the exact distinct set
    (est = n_sketch); otherwise est = floor((k-1)·2^28 / kth), the
    classic KMV estimator (Bar-Yossef et al. 2002). One double
    division + floor — bit-portable."""
    return hashes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth_hash"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)))
        .otherwise(
            F.floor(F.lit(float((k - 1) * KMV_SPACE)) / F.max("h")).cast(
                "long"
            )
        )
        .alias("est_distinct"),
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
    salt_buckets: int = 64,
) -> DataFrame:
    """K-minimum-values distinct sketch per group — see `kmv_hashes`
    (the partial) and `kmv_estimate` (the estimator). Why KMV next to
    the HLL entries (q54/q97): KMV supports set INTERSECTION via
    Jaccard on merged sketches — HLL can only union — and, being a
    deterministic function of the value hashes, the whole sketch is
    ORACLE-CHECKABLE cell-exact, which no randomized sketch is."""
    return kmv_estimate(
        kmv_hashes(df, value_col, group_cols, k, salt_buckets), group_cols, k
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan '05) of a key
    column's occurrence counts: ``depth`` hash rows × ``width``
    counters; every occurrence increments counter[d][h_d(key)].
    Estimates overcount only (est >= true, whp within 2N/width), and
    sketches MERGE by adding counters cell-wise — the mergeable
    frequency summary that pairs with the repo's KMV (distincts) and
    HDR (quantiles) partials.

    Hash rows are the repo-wide deterministic 28-bit md5 of
    ``d || '#' || key`` mod width — a pure function of the data, so
    unlike a seeded-random CMS the whole counter table is
    ORACLE-CHECKABLE cell-exact, and any engine rebuilds the identical
    sketch.

    Scale shape: explode ×depth map-side, then ONE map-side-combined
    groupBy onto at most depth·width cells — the shuffle carries
    bounded cells, not occurrences. Returns (d, bucket, cnt); absent
    cells are zero.
    """
    rows = df.select(F.col(key_col).cast("string").alias("k"))
    exploded = rows.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("d"),
        "k",
    )
    return (
        exploded.select(
            F.col("d").cast("long").alias("d"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("#", F.col("d"), F.col("k"))), 1, 7
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a Count-Min sketch: for each key, the estimate is
    the MIN over hash rows of its counter (missing cell ⇒ 0 ⇒ the key
    definitely never occurred). The sketch is depth·width rows —
    broadcast by construction; the probe is a map-side hash join
    however large the key set is.

    Returns the ``keys`` frame with an ``est`` column (long).
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        key_col,
        F.col("d").cast("long").alias("d"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#", F.col("d"), F.col(key_col).cast("string")
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


def hll_registers(
    df: DataFrame, col: str, p: int = 8, group_cols: list[str] | None = None
) -> DataFrame:
    """Deterministic HyperLogLog register table: one row per register
    bucket with its max rho (Flajolet et al. 2007). Unlike library
    HLLs (seeded xxhash, opaque binary state), the hash is the repo's
    md5-prefix convention — a 60-bit integer split into a ``p``-bit
    bucket and a (60−p)-bit suffix whose leading-zero count is
    computed EXACTLY via the binary-string length (``(61−p) −
    length(bin(z))``, no float log2; an all-zero suffix yields the
    conventional rho = suffix_width + 1 = 61−p) — so the whole
    register table is a pure function of the data and a SQL oracle
    can rebuild it cell-for-cell.

    Scale shape: the groupBy carries at most 2^p rows after map-side
    partial max — the classic mergeable-partials sketch (register
    tables from different partitions/windows merge by per-bucket max,
    exactly, which `hll_estimate`'s callers exploit for rollups).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p must be in [4, 16], got {p}")
    m = 1 << p
    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    # integer shift, NOT h/m: a 60-bit value exceeds double precision
    z = F.shiftright(h, p)
    # suffix width is 60-p bits, so rho ranges over [1, 61-p]
    rho = (
        F.when(z == 0, F.lit(61 - p))
        .otherwise(F.lit(61 - p) - F.length(F.bin(z)))
        .cast("long")
    )
    gcols = list(group_cols or [])
    return (
        df.select(*gcols, (h % F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").cast("long").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, p: int = 8, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from an HLL register table, with the
    harmonic sum carried as an EXACT integer: Σ 2^(−rho) over all m
    registers has common denominator 2^(61−p) (rho's max — an
    all-zero suffix), so ``harmonic_num = Σ 2^(61−p−rho)`` (absent
    buckets contribute rho=0 → 2^(61−p)) is an exact int64 sum —
    order-independent, hash-comparable, and bounded by m·2^(61−p) =
    2^61 so it can never overflow int64 at any valid p — and the raw
    HLL estimate is ONE fixed-shape double division α·m²·2^(61−p) /
    harmonic_num, floored. ``n_zero_registers`` rides along so a
    consumer can apply linear-counting small-range correction (its ln
    is deliberately left OUT of this frame: ln is not ulp-portable
    across engines, the integers are)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_estimate: p must be in [4, 16], got {p}")
    m = 1 << p
    w1 = 61 - p  # rho's max; 2^w1 is the harmonic sum's common denominator
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols or [])
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(
            F.expr(f"CAST(shiftleft(1L, CAST({w1} - rho AS INT)) AS BIGINT)")
        )
        .cast("long")
        .alias("_present_num"),
    ]
    agg = registers.groupBy(*gcols).agg(*aggs) if gcols else registers.agg(*aggs)
    return agg.select(
        *gcols,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero_registers"),
        (
            F.col("_present_num")
            + (F.lit(m) - F.col("n_present")) * F.lit(1 << w1).cast("long")
        )
        .cast("long")
        .alias("harmonic_num"),
        F.floor(
            F.lit(alpha * m * m)
            * F.lit(float(1 << w1))
            / (
                F.col("_present_num")
                + (F.lit(m) - F.col("n_present")) * F.lit(1 << w1).cast("long")
            ).cast("double")
        )
        .cast("long")
        .alias("est_floor"),
    )
