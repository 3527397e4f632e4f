"""String-similarity joins — the character-level counterpart of the
token-set joins in `setsim.py`, for record linkage over names, codes
and identifiers where the edit is a typo, not a word change.

`edit_distance_join` is the FastSS / deletion-neighborhood design
(Bocek et al. 2007): every string generates its single-deletion
variants; two strings within Levenshtein distance 1 MUST share a
variant (pigeonhole on the edit script — a substitution deletes the
differing position from both sides, an insertion's variant IS the
shorter string, equality shares the depth-0 variant), so joining on
variants alone finds every qualifying pair with no false negatives.
Candidates are then verified with the exact `levenshtein` expression —
false positives (hash collisions, shared variants at distance 2) are
filtered exactly, never reported.

Exactness discipline: the distance is Spark's integer `levenshtein`
(identical to DuckDB's `levenshtein`), the join key is an md5-prefix
hash of the variant (collisions are verified away; false negatives are
impossible), and the output carries only (id_a, id_b, dist) integers —
cell-exact against the all-pairs SQL oracle.

Scale shape (100 TB): variant generation is a map-side explode bounded
by string length (len+1 variants per row, hashed to 60-bit longs so
the shuffle moves two longs per variant, never the strings); the
candidate join shuffles on the variant hash, with per-bucket fan-out
bounded by how many strings share a deletion variant (names/codes: a
handful — the all-pairs product never forms); the verify join re-reads
the two strings by id. A degenerate key (millions of rows sharing one
variant, e.g. an empty-string column) is capped with `max_bucket`,
matching the LSH/near-dup bucket-cap discipline elsewhere in the repo.

Reference parity: none — beyond-reference record-linkage surface
(the LLM-pipeline brief's dedup family, at character granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with Levenshtein(text_a, text_b) <=
    ``max_dist`` (currently 1 — the deletion-neighborhood depth this
    implementation generates). Returns (id_a, id_b, dist LONG).
    """
    if max_dist != 1:
        raise ValueError(
            "edit_distance_join generates depth-1 deletion variants; "
            "max_dist must be 1 (deeper neighborhoods grow as len^k — "
            "add depth-2 generation before raising this)"
        )
    from graphsense_blocksci_spark.operators.textops import spread

    s = spread(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).cast("string").alias("_s"),
    ).filter(F.col("_s").isNotNull())
    # the string itself + every single-deletion variant, hashed to a
    # 60-bit long so the candidate shuffle carries (hash, id) only
    variants = s.select(
        "id",
        F.explode(
            F.concat(
                F.array(F.col("_s")),
                F.expr(
                    "transform(sequence(1, length(_s)), i ->"
                    " concat(substring(_s, 1, i-1),"
                    " substring(_s, i+1, length(_s))))"
                ),
            )
        ).alias("_v"),
    ).select(
        "id",
        F.conv(F.substring(F.md5(F.col("_v")), 1, 15), 16, 10)
        .cast("long")
        .alias("_vh"),
    ).distinct()
    if max_bucket is not None:
        sizes = variants.groupBy("_vh").agg(F.count(F.lit(1)).alias("_n"))
        variants = variants.join(
            sizes.filter(F.col("_n") <= max_bucket).select("_vh"), "_vh"
        )
    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "_vh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    sa = s.select(F.col("id").alias("id_a"), F.col("_s").alias("_sa"))
    sb = s.select(F.col("id").alias("id_b"), F.col("_s").alias("_sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_sa", "_sb").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
