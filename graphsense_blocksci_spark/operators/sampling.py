"""Deterministic hash-based sampling — the training-mix primitives.

A 100 TB curation pipeline samples constantly: per-source mixing
ratios, per-language caps, held-out splits. `rand()` is the wrong tool
at scale — it is nondeterministic across retries (a re-executed task
samples DIFFERENT rows, breaking effectively-once sinks) and across
engines (no oracle can check it). Keyed hash sampling fixes both: the
decision for a row is a pure function of its stable key, so retries,
re-runs, backfills and the DuckDB oracle all agree row-for-row.

The hash is the repo-wide 28-bit md5 prefix (`conv(substr(md5(k),1,7),
16,10)` ≡ DuckDB `('0x'||substr(md5(k),1,7))::BIGINT` — see
operators/textops.py), uniform enough that `hash % 10_000` deviates
from the target rate by <1% on any non-adversarial key.

Scale shape: both operators are pure projections + filters — no
shuffle, no state, fully pushdown-friendly. Sampling 1% of 100 TB
reads 100 TB once (the filter runs post-scan) but writes 1 TB and
shuffles nothing.

Reference parity: none — the reference has no sampling surface; this
is part of the beyond-reference LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BASIS = 10_000  # rate resolution: 0.01%


def _hash_mod(key: Column, basis: int = _BASIS) -> Column:
    """Uniform value in [0, basis) from the stable row key — the
    28-bit md5 prefix used by every dedup/minhash oracle in the repo."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10)
        .cast("long")
        % basis
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    rate_by: dict[str, float] | None = None,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic sample: keep a row iff hash(key) falls under its
    stratum's rate. Either a global `rate`, or `rate_by[stratum]` with
    `stratum_col` (strata absent from the dict are dropped — the
    explicit-mix contract of a training-data recipe)."""
    h = _hash_mod(F.col(key_col))
    if rate_by is not None:
        if stratum_col is None:
            raise ValueError("rate_by requires stratum_col")
        expr = None
        for stratum, r in rate_by.items():
            cond = F.col(stratum_col) == stratum
            val = F.lit(int(round(r * _BASIS))).cast("long")
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        cut = expr.otherwise(F.lit(0).cast("long"))
        return df.filter(h < cut)
    if rate is None:
        raise ValueError("one of rate / rate_by is required")
    return df.filter(h < F.lit(int(round(rate * _BASIS))).cast("long"))


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1
) -> DataFrame:
    """Stable held-out assignment: adds a `split` column ('test' iff
    hash(key) < test_frac, else 'train'). Group-safe by construction —
    every row with the same key lands on the same side, so splitting
    by document id, URL, or group key prevents leakage between splits
    no matter how the data is partitioned or re-run."""
    h = _hash_mod(F.col(key_col))
    cut = F.lit(int(round(test_frac * _BASIS))).cast("long")
    return df.withColumn(
        "split", F.when(h < cut, F.lit("test")).otherwise(F.lit("train"))
    )


def temperature_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    temperature: float = 2.0,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-balanced mixture sampling (the mT5/XLM-R
    multilingual recipe): sampling mass per stratum is proportional to
    share^(1/T), flattening the head so low-resource strata are
    over-represented relative to their corpus share. Every row gets an
    explicit verdict: ``(*, share, rate, keep)`` where
    ``rate = min(1, budget_frac * p_l / share_l)`` with
    ``p_l = share_l^(1/T) / Z``, and ``keep`` hashes the stable row
    key under the stratum's rate (same retry/backfill determinism
    argument as `hash_sample`).

    Exactness: ``temperature`` must be a power of two — share^(1/T)
    is computed as repeated sqrt (IEEE sqrt is correctly rounded, so
    bit-identical in any engine), because a general pow() is not
    bit-portable. Z is a stratum-sorted left fold of doubles, the
    per-rate arithmetic is fixed-order, and the keep decision compares
    the 28-bit key hash against rate * 2^28 — all reproducible by the
    SQL oracle to the last bit.

    Scale shape: one |strata|-sized count aggregate, two 1-row
    broadcasts (total, Z), and a broadcast join of the tiny rate table
    back onto the corpus — the corpus itself is scanned once and never
    shuffled.
    """
    import math

    n_sqrt = math.log2(temperature)
    if n_sqrt != int(n_sqrt) or n_sqrt < 0:
        raise ValueError(
            "temperature must be a power of two (share^(1/T) is computed "
            "as repeated IEEE sqrt for cross-engine bit-exactness); got "
            f"{temperature!r}"
        )
    counts = df.groupBy(F.col(stratum_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    tot = counts.agg(F.sum("_c").cast("long").alias("_tot"))
    share = F.col("_c").cast("double") / F.col("_tot").cast("double")
    w = share
    for _ in range(int(n_sqrt)):
        w = F.sqrt(w)
    weighted = counts.crossJoin(F.broadcast(tot)).select(
        "_g", share.alias("_share"), w.alias("_w")
    )
    z = weighted.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_g", "_w"))),
                lambda x: x["_w"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("_z")
    )
    rates = weighted.crossJoin(F.broadcast(z)).select(
        "_g",
        "_share",
        F.least(
            F.lit(1.0),
            (F.lit(float(budget_frac)) * (F.col("_w") / F.col("_z")))
            / F.col("_share"),
        ).alias("_rate"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 7), 16, 10)
        .cast("long")
        .cast("double")
    )
    return (
        df.join(F.broadcast(rates), df[stratum_col] == rates._g)
        .select(
            *[df[c] for c in df.columns],
            F.col("_share").alias("share"),
            F.col("_rate").alias("rate"),
            (h < F.col("_rate") * F.lit(268435456.0)).alias("keep"),
        )
    )


def group_capped_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
) -> DataFrame:
    """Exact-k-per-group deterministic sample (the per-source cap of a
    training-data mix): within each group keep the k rows with the
    smallest md5(key) — a uniform draw that is reproducible across
    runs, retries, and engines, unlike reservoir sampling over a
    nondeterministic scan order. Ties (impossible for distinct keys,
    md5 is injective on the fixture domain) break on the key itself.

    Appends `sample_rank` (1-based position in the group's hash
    order). One shuffle on the group key; a pathologically hot group
    pays its own sort — for skewed groups pre-aggregate with a
    two-level cap (salt -> per-salt top-k -> re-top-k), the same
    pattern as salted_agg, which preserves exactness because top-k of
    per-salt top-k's IS the global top-k."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def systematic_sample(
    df: DataFrame,
    step: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    n_buckets: int = 64,
) -> DataFrame:
    """Weighted systematic (size-proportional) sampling WITHOUT
    replacement: lay rows end-to-end in stable `id_col` order, each
    spanning `weight_col` integer units, and select every row whose
    span contains a multiple of ``step`` (sample points 0, step,
    2*step, ...). A row with weight >= step is always selected; a row
    with weight w < step is selected with probability exactly w/step
    under a random phase — here the phase is FIXED at 0, trading the
    unbiasedness guarantee for determinism (retries, backfills and the
    DuckDB oracle agree row-for-row, which `rand()`-phase sampling
    cannot).

    This is the classic PPS-systematic design (survey sampling /
    importance-weighted corpus mixing) expressed on the repo's
    distributed two-phase prefix sum (operators/packing.py) — the
    global cumulative weight is bucket-local running sums plus one
    bounded n_buckets-row offset window, never a corpus-wide
    single-partition sort.

    Returns (id_col, weight, offset, selected) — `offset` the
    exclusive prefix weight, `selected` the sampling verdict — so
    callers can filter or audit inclusion probabilities.
    """
    from graphsense_blocksci_spark.operators.packing import sequence_packing

    packed = sequence_packing(
        df,
        budget=step,
        id_col=id_col,
        count_col=weight_col,
        n_buckets=n_buckets,
    )
    # span [offset, offset+w) contains a multiple of `step` iff the
    # bin of its last unit exceeds the bin of the unit before its
    # first — integer-exact, and offset=0 selects (floor(-1/step) = -1).
    sel = (
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / step)
        > F.floor((F.col("offset") - 1) / step)
    ) & (F.col("n_tokens") > 0)
    return packed.select(
        F.col("doc_id").alias(id_col),
        F.col("n_tokens").alias("weight"),
        "offset",
        sel.alias("selected"),
    )


def weighted_reservoir(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    weight_col: str,
    max_weight: int = 16,
) -> DataFrame:
    """Weighted sampling without replacement, k per group (A-ES /
    Efraimidis-Spirakis): classically each row draws u ~ U(0,1) and
    the k rows with the largest u^(1/w) win. pow() is not
    bit-portable across engines, so for INTEGER weights this uses the
    exact equivalent: max(u_1..u_w) of w independent uniforms has CDF
    u^w — the same distribution as u^(1/w) — so a row's priority is
    the MAX of w independent 28-bit md5 draws md5(key || '#' || i),
    i in [0, w). Pure integer comparisons end to end: retries,
    backfills and the DuckDB oracle agree row-for-row, and ties break
    on the key.

    `max_weight` bounds the explode fan-out (a weight-w row costs w
    hash rows). Weights are clamped to [1, max_weight]; at 100 TB the
    explode is map-side only — the shuffle moves ONE row per input row
    (the max-aggregated priority), then the per-group top-k is the
    same WindowGroupLimit plan as group_capped_sample. For huge
    real-valued weights you'd switch to the float u^(1/w) form and
    accept a rows-only gate; the integer form is the oracle-exact
    path.

    Returns the k winners per group with their integer `priority` and
    1-based `sample_rank`.
    """
    w_clamped = F.greatest(
        F.lit(1), F.least(F.col(weight_col).cast("int"), F.lit(max_weight))
    )
    drawn = df.withColumn(
        "_priority",
        F.array_max(
            F.transform(
                F.sequence(F.lit(0), w_clamped - 1),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#", F.col(key_col).cast("string"), i
                            )
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("_priority").desc(), F.col(key_col).asc()
    )
    return (
        drawn.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .withColumnRenamed("_priority", "priority")
    )


def kfold_assign(df: DataFrame, key_col: str, n_folds: int = 5) -> DataFrame:
    """Stratification-free k-fold cross-validation assignment: adds
    `fold` = md5-hash(key) mod n_folds. Group-safe like
    train_test_split (all rows of a key share a fold — no leakage
    between folds however the data is partitioned), deterministic
    across engines/retries, and a pure projection: zero shuffle,
    fully pushdown-friendly at any scale."""
    return df.withColumn(
        "fold", (_hash_mod(F.col(key_col)) % n_folds).cast("int")
    )
