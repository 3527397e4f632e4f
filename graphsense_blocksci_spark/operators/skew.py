"""Skew mitigation: salted two-phase aggregation.

A groupBy on a heavy-hitter key (a handful of distinct values over
billions of rows — e.g. address_type, returnflag, event_type) hashes
every row of a hot key into ONE reducer partition. AQE's skew-join
splitting does not help aggregations. The classic fix is salting:

    phase 1: group on (key, salt) where salt = rand int in [0, S) —
             S× more partial groups, uniformly spread;
    phase 2: group the S partials on key alone — tiny input.

Spark's map-side partial aggregation already absorbs most of this for
algebraic aggregates (sum/count/min/max), but the reducer for a hot
key still receives one partial per map task; explicit salting bounds
reducer fan-in for the truly degenerate cases (few keys × huge
cluster) and is the required form for non-algebraic aggregates
(collect_list/exact distinct) where partials don't combine.

Correctness: decomposable aggregates recombine exactly — pinned by the
q28 oracle (salted result ≡ plain GROUP BY).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output column → (input column, fn) with fn in
    {sum, count, min, max} (decomposable: phase-2 recombination is
    sum/sum/min/max respectively). The salt is derived from a seeded
    random column — uniform, independent of the data, never persisted.
    """
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in recombine:
            raise ValueError(f"{out}: non-decomposable aggregate {fn!r}")

    salted = df.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )

    def phase1(out: str, col: str, fn: str) -> Column:
        return getattr(F, fn)(F.lit(1) if fn == "count" else F.col(col)).alias(
            f"_p_{out}"
        )

    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[phase1(out, col, fn) for out, (col, fn) in aggs.items()]
    )
    final = partial.groupBy(*group_cols).agg(
        *[
            getattr(F, recombine[fn])(F.col(f"_p_{out}")).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the small side is too big to
    broadcast and AQE's skew splitting isn't enough (a single key with
    billions of rows lands one straggler task however finely AQE
    splits, because every split still joins against the SAME right
    rows).

    Shape: the big side gets a uniform random salt in [0, S); the
    small side is replicated S× (explode over the salt range); the
    join key becomes (key, salt), spreading each hot key over S
    reducer partitions. Cost: S× shuffle volume of the SMALL side —
    chosen because small × S << big-side straggler time.

    Correctness: every big row meets exactly the one replica of its
    matching small rows that carries its salt ⇒ row-for-row equal to
    the plain join (pinned by the q55 oracle). Inner and left joins
    preserve multiplicity; right/full would need the unsalted
    complement and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(
        replicated,
        (salted_big[big_key] == replicated[small_key])
        & (salted_big["_salt"] == replicated["_salt"]),
        how,
    )
    return out.drop("_salt")
