"""Distributed BPE merge TRAINING (Sennrich et al. 2016).

`text_analysis.bpe_encode` APPLIES a merge vocabulary; this module
LEARNS one from the corpus — the other half of the tokenizer-building
pipeline an LLM-data platform needs. Classic BPE training is a driver
loop over a word-frequency dict; here every per-round step is a
DataFrame op so the corpus (and even the word vocabulary) never has to
fit on one machine:

1. ONE corpus pass builds the weighted word vocabulary
   (word, corpus_count) — vocabulary-sized from then on (Zipf: ~10^6
   distinct words for 10^12 tokens).
2. Each word is an array of single-character symbols.
3. Per merge round:
   a. adjacent symbol pairs via two array slices zipped (no
      positional self-join), weighted count aggregate — map-side
      partials collapse the Zipf head;
   b. the argmax pair (count DESC, then lexicographic (left, right)
      ASC — deterministic, unlike dict-order ties in reference
      implementations) picked with ONE max_by aggregate and collected
      as a single bounded row (the kmeans k-row-probe contract; an
      empty result early-exits — every word fully merged);
   c. the merge applied to every word with an `F.aggregate` left fold
      (append, or fuse with the previous symbol when it equals the
      left+right pattern) — the winner pair rides the fold as two
      short string literals;
   d. localCheckpoint flattens lineage per round.

Counting matches Sennrich's get_stats: overlapping occurrences all
count ("aaa" contributes (a,a) twice), while APPLICATION is greedy
left-to-right non-overlapping ("aaa" -> [aa, a]).

Output: the learned merge table (rank, left, right, pair_count) — the
artifact `bpe_encode`-style tokenizers consume.

Oracle status: cell-exact since round 9 — queries._bpe_train_sql
unrolls the 8-round fold as one positional CTE block per merge (the
kmeans/k-truss unroll discipline); additionally pytest-gated against
the pure-Python reference trainer (tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.textops import spread, tokens


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(rank, left, right, pair_count)`` — merge `rank` (0-based) fused
    symbols `left`+`right`, which co-occurred adjacently with total
    corpus weight `pair_count` at the time of the merge."""
    spark = docs.sparkSession
    vocab = (
        spread(docs)
        .select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.split(F.col("word"), "").alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    merge_rows: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        n = F.size("syms")
        pairs = (
            vocab.filter(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("l"),
                        F.slice("syms", 2, n - 1).alias("r"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.agg(
            F.min_by(
                F.struct("left", "right", "pair_count"),
                # count DESC, then (left, right) ASC == min over the
                # struct (-count, left, right): struct comparison is
                # lexicographic, strings cannot be negated for a
                # max_by, so the count flips sign instead.
                F.struct(
                    (-F.col("pair_count")).alias("nc"),
                    F.col("left"),
                    F.col("right"),
                ),
            ).alias("b")
        ).select(
            F.col("b.left").alias("left"),
            F.col("b.right").alias("right"),
            F.col("b.pair_count").alias("pair_count"),
        ).filter(F.col("left").isNotNull())
        # r13 optimization (guide §2.4): the old round shape checkpointed
        # the 1-row argmax, probed isEmpty() (a driver sync already!),
        # and re-attached the winner via broadcast crossJoin — three
        # extra Spark jobs per round. Collecting the single winner row
        # instead is the SAME bounded driver sync, and the merge pair
        # then rides the fold as two short string literals: per round
        # one aggregate job + one checkpoint job remain (53 -> ~30 jobs
        # for q140 at sf0.1). Arithmetic and tie-breaks are unchanged.
        brow = best.collect()
        if not brow:
            break
        left, right = brow[0]["left"], brow[0]["right"]
        merge_rows.append((rank, left, right, int(brow[0]["pair_count"])))
        llit, rlit = F.lit(left), F.lit(right)
        fused = F.lit(left + right)
        # greedy left-to-right merge application as a left fold: append
        # x, unless the accumulated tail is exactly `left` and x is
        # `right` AND the tail was not itself just produced by this
        # round's merge (the fold marks fresh fusions by checking the
        # tail equals `left`, which a fresh fusion `left+right` cannot
        # equal because left != left+right).
        vocab = (
            vocab.select(
                F.aggregate(
                    "syms",
                    F.array().cast("array<string>"),
                    lambda acc, x: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == llit)
                        & (x == rlit),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(fused)
                        ),
                    ).otherwise(F.concat(acc, F.array(x))),
                ).alias("syms"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        merge_rows, "rank long, left string, right string, pair_count long"
    )


def bpe_train_reference(
    word_counts: dict[str, int], n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference trainer (pytest parity gate). Same
    counting (overlapping pairs), same tie-break (count DESC, pair
    ASC), same greedy left-to-right application."""
    vocab: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_counts.items()
    ]
    out: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        out.append((rank, l, r, cnt))
        fused = l + r
        new_vocab = []
        for syms, c in vocab:
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = fused
                else:
                    acc.append(x)
            new_vocab.append((acc, c))
        vocab = new_vocab
    return out
