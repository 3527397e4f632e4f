"""Record linkage (entity resolution) via blocking + edit distance.

The classic dirty-dimension problem: the same real-world entity
appears under near-identical names ("Customer#000000042" vs a
typo'd variant, merged CRM imports, OCR'd ledgers). The exact-dedup
and MinHash stacks (operators/text_dedup.py) target DOCUMENT-scale
text; record linkage targets short strings where edit distance is the
right similarity and a quadratic all-pairs compare is the trap.

Plan — the same candidate/verify discipline as every dedup operator
in this repo:

1. **Block**: group records by a cheap deterministic key (here any
   caller-supplied column set, e.g. (nation, name length bucket)).
   Only records sharing a block are ever compared — the recall/cost
   dial every production linkage system exposes (Fellegi-Sunter
   blocking).
2. **Verify**: per block, self-join on the block key with `id_a <
   id_b`, then the EXACT `levenshtein` filter — JVM codegen, no
   Python. Block sizes bound the quadratic term (sum of block²,
   never corpus²); `max_block` drops degenerate blocks with the same
   raise-with-advice contract as the LSH `max_bucket` caps.

Levenshtein is implemented identically in Spark and DuckDB, so the
oracle comparison is cell-exact — rare for a similarity operator.

Reference parity: none (the reference's identity surface is
address-cluster based); this is LLM-brief extension surface — dirty
training-metadata reconciliation needs exactly this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_linkage(
    records: DataFrame,
    block_cols: Sequence[str],
    max_dist: int,
    id_col: str = "id",
    name_col: str = "name",
    max_block: int | None = 10_000,
) -> DataFrame:
    """All within-block record pairs with edit distance <= max_dist.

    Returns (id_a, id_b, name_a, name_b, dist), id_a < id_b, one row
    per pair. `max_block` guards the quadratic verify: a block larger
    than the cap raises with blocking-key advice instead of silently
    exploding (same contract as similarity.py's `max_bucket`).
    """
    base = records.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(name_col).cast("string").alias("_name"),
        *[F.col(c) for c in block_cols],
    )
    if max_block is not None:
        oversized = (
            base.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_block)
            .limit(1)
        )
        row = oversized.collect()
        if row:
            raise ValueError(
                f"record_linkage: block {row[0].asDict()} exceeds "
                f"max_block={max_block}; refine block_cols (add a length "
                "bucket or a name prefix) or raise the cap"
            )
    a = base.select(
        *block_cols,
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
    )
    b = base.select(
        *block_cols,
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
    )
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def fellegi_sunter_topk(
    records: DataFrame,
    block_cols: Sequence[str],
    fields: Sequence[tuple[str, int, int]],
    k: int,
    id_col: str = "id",
    max_block: int | None = 10_000,
) -> DataFrame:
    """Top-k scored record pairs under Fellegi-Sunter agreement
    weights — WITHOUT ever materializing the coarse-block quadratic
    when the data is large enough that it cannot matter.

    Each compared field carries integer (agree, disagree) log-
    likelihood weights; a pair's score is the sum over fields. The
    naive plan self-joins on `block_cols` alone — quadratic in block
    size, and with a FIXED-cardinality blocking key the block size
    grows linearly with the corpus, so cost grows quadratically (the
    round-7 10x-harness finding on q275). This operator inverts that
    scaling with adaptive tier descent:

    1. One aggregate over the FINEST grouping (block + every field)
       yields a bounded frame (cardinality <= distinct value combos,
       e.g. 125 blocks x 22 balance buckets x 97 ids ~ 267k rows no
       matter the corpus size).
    2. Exact pair counts per agreement PATTERN (which subset of
       fields agrees) follow from group-size arithmetic + inclusion-
       exclusion on that frame — no pair is formed. 2^m scalar rows
       reach the driver (m = #fields, tiny).
    3. Patterns are taken in score order; only patterns needed to
       cover k pairs (plus score ties) are MATERIALIZED, each via a
       self-join on block + its agreeing fields — the finer the
       pattern, the finer the join key. At scale the all-agree
       pattern alone covers k, so the join key is the full tuple and
       blocks stay near-constant size; the coarse join only runs on
       small corpora, where quadratic is cheap.
    4. Any pattern that must materialize checks its max block size
       against `max_block` first and raises with blocking-key advice
       (the similarity.py `max_bucket` contract) instead of silently
       exploding.

    Returns (key_a, key_b, agree_<field>..., score) — the global
    top-k by (score DESC, key_a, key_b), exactly equal to the naive
    all-block-pairs plan's top-k.

    NULL semantics: NULL agrees with NULL. The pattern counting rides
    groupBy (which groups NULLs together), so the materializing joins
    use null-safe equality (`<=>`) on block and agreeing fields and
    null-safe INequality on disagreeing fields — counting and
    materialization agree even when block or compared columns are
    nullable (two-NULL pairs score as agreement, NULL-vs-value as
    disagreement).
    """
    from itertools import combinations

    if k <= 0:
        raise ValueError("k must be positive")
    fnames = [f for f, _, _ in fields]
    base = records.select(
        F.col(id_col).cast("long").alias("_id"),
        *[F.col(c) for c in block_cols],
        *[F.col(f) for f in fnames],
    )
    fine = (
        base.groupBy(*block_cols, *fnames)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )

    def _pairs_and_max(sub: Sequence[str]) -> tuple[int, int]:
        g = fine.groupBy(*block_cols, *sub).agg(
            F.sum("n").cast("long").alias("bn")
        )
        row = g.agg(
            F.sum(F.expr("bn * (bn - 1) DIV 2")).cast("long").alias("p"),
            F.max("bn").cast("long").alias("mx"),
        ).collect()[0]
        return int(row["p"] or 0), int(row["mx"] or 0)

    subsets = [
        tuple(s)
        for r in range(len(fnames), -1, -1)
        for s in combinations(fnames, r)
    ]
    stats = {s: _pairs_and_max(s) for s in subsets}
    # inclusion-exclusion: exact-pattern pair counts from superset
    # block-pair counts
    tier_count: dict[tuple[str, ...], int] = {}
    for p in subsets:
        total = 0
        extra = [f for f in fnames if f not in p]
        for r in range(len(extra) + 1):
            for add in combinations(extra, r):
                q = tuple(f for f in fnames if f in p or f in add)
                total += (-1) ** r * stats[q][0]
        tier_count[p] = total
    weights = {f: (wa, wd) for f, wa, wd in fields}

    def _score(p: tuple[str, ...]) -> int:
        return sum(
            weights[f][0] if f in p else weights[f][1] for f in fnames
        )

    ordered = sorted(subsets, key=lambda p: (-_score(p), p))
    needed: list[tuple[str, ...]] = []
    cum = 0
    for i, p in enumerate(ordered):
        if cum >= k and _score(p) < _score(ordered[i - 1]):
            break
        needed.append(p)
        cum += tier_count[p]

    a = base.select(
        F.col("_id").alias("key_a"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
        *[F.col(f).alias(f"_fa_{f}") for f in fnames],
    )
    b = base.select(
        F.col("_id").alias("key_b"),
        *[F.col(c).alias(f"_bb_{c}") for c in block_cols],
        *[F.col(f).alias(f"_fb_{f}") for f in fnames],
    )
    out = None
    for p in needed:
        if tier_count[p] == 0:
            continue
        if max_block is not None and stats[p][1] > max_block:
            raise ValueError(
                f"fellegi_sunter_topk: pattern {p or '(none agree)'} must "
                f"materialize but its largest block has {stats[p][1]} rows "
                f"(max_block={max_block}); refine block_cols or add "
                "higher-selectivity compared fields so the top-k is "
                "covered by finer agreement tiers"
            )
        # null-safe equality (<=>) keeps the join consistent with the
        # groupBy-based pattern counting above (NULL==NULL agrees);
        # still an equi-join for shuffle planning purposes.
        cond = [
            a[f"_ba_{c}"].eqNullSafe(b[f"_bb_{c}"]) for c in block_cols
        ] + [a[f"_fa_{f}"].eqNullSafe(b[f"_fb_{f}"]) for f in p]
        pairs = a.join(b, cond).filter(F.col("key_a") < F.col("key_b"))
        for f in fnames:
            if f not in p:
                pairs = pairs.filter(
                    ~F.col(f"_fa_{f}").eqNullSafe(F.col(f"_fb_{f}"))
                )
        tier = pairs.select(
            "key_a",
            "key_b",
            *[
                F.lit(f in p).alias(f"agree_{f}")
                for f in fnames
            ],
            F.lit(_score(p)).cast("long").alias("score"),
        )
        out = tier if out is None else out.unionByName(tier)
    if out is None:
        schema = ", ".join(
            ["key_a long", "key_b long"]
            + [f"agree_{f} boolean" for f in fnames]
            + ["score long"]
        )
        return records.sparkSession.createDataFrame([], schema)
    return out.orderBy(F.col("score").desc(), "key_a", "key_b").limit(k)
