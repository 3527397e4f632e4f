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
