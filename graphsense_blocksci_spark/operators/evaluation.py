"""Model-evaluation and distribution statistics over corpus tables —
the measurement half of a training-data pipeline: how good is the
quality classifier (AUC), how far has the corpus drifted from a
reference mix (total-variation distance), what does a feature's
distribution look like (equi-width binning), how do we normalize a
feature per group (z-score).

All four operators are *oracle-exact by construction*: every sum that
feeds a float is an integer sum (order-independent), and the floats
that appear in the output are produced by a short fixed chain of
IEEE-754 basic operations (div, mul, sqrt — each correctly rounded) on
those exact integers, so any engine computes bit-identical values.
This is the same exactness discipline as the repo's
q99 unigram-likelihood and q46 near-dup oracles.

Reference parity: none — the reference has no evaluation surface; this
module is part of the beyond-reference LLM-pipeline brief.

Scale shapes are documented per function; none of them materializes a
corpus-sized single partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of an integer score against a boolean label via
    the Mann-Whitney rank-sum identity with midrank tie handling:

        AUC = (R_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg)

    where R_pos is the sum of the midranks of the positives. Ties
    share the midrank (rank_lo + rank_hi)/2, which is the standard
    trapezoidal tie correction (AUC counts a tie as half a win).

    REQUIRES an integer score in a bounded domain (a classifier score
    scaled to e.g. [0, 1000]): the aggregation collapses the corpus to
    one row per distinct score FIRST, so the only ordered window runs
    over at most |score domain| rows — bounded by construction, never
    by corpus size. At 100 TB this is one map-side-combined groupBy to
    ≤ |domain| rows, a window over those, and a 1-row final aggregate.

    Exactness: midranks are kept ×2 (integers); R_pos×2 and the AUC
    numerator ×2 are exact longs; the returned `auc` double is one
    integer-to-double division.

    Returns one row: (n_pos, n_neg, auc_num2, auc_den, auc).
    """
    per_score = (
        df.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("boolean").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
        )
    )
    # midrank*2 of score s = 2*(count below s) + (n_s + 1)
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "below", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn("midrank2", 2 * F.col("below") + F.col("n") + 1)
    totals = ranked.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("n_pos")).cast("long").alias("n_neg"),
        F.sum(F.col("n_pos") * F.col("midrank2")).cast("long").alias("rpos2"),
    )
    return totals.select(
        "n_pos",
        "n_neg",
        (F.col("rpos2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long")
        .alias("auc_num2"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        (
            (F.col("rpos2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                "double"
            )
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def distribution_drift(
    tokens: DataFrame,
    group_col: str,
    token_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Corpus drift between two sources' token unigram distributions:
    total-variation distance plus vocabulary overlap.

        TVD = 1/2 * Σ_t | c_a(t)/N_a - c_b(t)/N_b |

    computed as the INTEGER sum Σ_t |c_a(t)*N_b - c_b(t)*N_a| over the
    common denominator N_a*N_b — order-independent and exact, unlike a
    float Σ of per-token differences. Vocab overlap is the exact
    Jaccard of the two token sets (integers).

    Input is one row per token OCCURRENCE (pre-tokenized); the operator
    does the (group, token) count itself. Scale shape: one map-side-
    combined groupBy to vocab-sized rows, a vocab-sized full-outer
    self-align via conditional aggregation (no join — tokens are
    aggregated once with per-group conditional counts), one final
    1-row aggregate. The corpus is touched once.

    Returns one row: (n_a, n_b, vocab_a, vocab_b, vocab_common,
    tvd_num, tvd_den, tvd, vocab_jaccard).
    """
    counted = (
        tokens.select(
            F.col(group_col).alias("g"), F.col(token_col).alias("t")
        )
        .filter(F.col("g").isin(group_a, group_b))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("g") == group_a, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("g") == group_b, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    tot = counted.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    per_tok = counted.crossJoin(F.broadcast(tot)).select(
        "ca",
        "cb",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias(
            "dnum"
        ),
    )
    return (
        per_tok.agg(
            F.sum(F.when(F.col("ca") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_a"),
            F.sum(F.when(F.col("cb") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_b"),
            F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0))
            .cast("long")
            .alias("vocab_common"),
            F.sum("dnum").cast("long").alias("tvd_num"),
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
        )
        .select(
            "n_a",
            "n_b",
            "vocab_a",
            "vocab_b",
            "vocab_common",
            "tvd_num",
            (2 * F.col("n_a") * F.col("n_b")).cast("long").alias("tvd_den"),
            (
                F.col("tvd_num").cast("double")
                / (2 * F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("tvd"),
            (
                F.col("vocab_common").cast("double")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("vocab_common")
                ).cast("double")
            ).alias("vocab_jaccard"),
        )
    )


def equiwidth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
) -> DataFrame:
    """Equi-width histogram / feature discretization over an integer
    column: bin i covers [min + i*w, min + (i+1)*w) with the integer
    width w = ceil((max - min + 1) / n_bins), so every value maps to a
    bin by pure integer arithmetic — no percentile sort, no global
    ordered window (the NTILE idiom is a corpus-wide single-partition
    sort; this is the scale-safe discretizer when equi-POPULATED bins
    are not required).

    Scale shape: one 1-row min/max aggregate broadcast back over the
    scan (crossJoin of a 1-row frame), then one map-side-combined
    groupBy on ≤ n_bins keys. Two passes over the column, zero wide
    shuffles.

    Returns (bin, lo, hi, n_rows, sum_value) — lo/hi the inclusive
    integer bounds actually covered.
    """
    v = F.col(value_col).cast("long")
    bounds = df.agg(
        F.min(v).cast("long").alias("_lo"), F.max(v).cast("long").alias("_hi")
    )
    width = F.ceil(
        (F.col("_hi") - F.col("_lo") + 1) / F.lit(n_bins)
    ).cast("long")
    return (
        df.select(v.alias("_v"))
        .crossJoin(F.broadcast(bounds))
        .select("_v", "_lo", width.alias("_w"))
        # integer floor-division, not floor(double-div): a quotient that
        # lands within one ulp of an integer must not straddle a bin edge
        .select(
            F.expr("CAST((_v - _lo) DIV _w AS BIGINT)").alias("bin"),
            "_v",
            "_lo",
            "_w",
        )
        .groupBy("bin", "_lo", "_w")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_v").cast("long").alias("sum_value"),
        )
        .select(
            "bin",
            (F.col("_lo") + F.col("bin") * F.col("_w")).alias("lo"),
            (F.col("_lo") + (F.col("bin") + 1) * F.col("_w") - 1).alias("hi"),
            "n_rows",
            "sum_value",
        )
    )


def zscore_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> Column | DataFrame:
    """Per-group z-score normalization of an integer feature (the
    per-source quality-score standardization step before thresholds
    can be compared across sources), exact-arithmetic formulation:

        z = (n*x - S) / sqrt(n*Q - S^2)

    which equals (x - mean) / std_pop with mean = S/n and
    std_pop = sqrt(nQ - S^2)/n, but every input to the float chain is
    an exact integer (S = Σx, Q = Σx² as longs), so the divide and the
    correctly-rounded IEEE sqrt give bit-identical z in any engine —
    a float Σ(x-mean)² could not.

    Groups with zero variance (or a single row) get z = NULL.

    Scale shape: one map-side-combined groupBy to |groups| rows,
    broadcast back over the scan (groups are a dimension, rows are
    not). One wide shuffle only if |groups| exceeds broadcast size.
    """
    x = F.col(value_col).cast("long")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(x).cast("long").alias("_s"),
        F.sum(x * x).cast("long").alias("_q"),
    )
    joined = df.join(F.broadcast(stats), group_col)
    disc = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    z = F.when(
        disc > 0,
        (F.col("_n") * x - F.col("_s")).cast("double")
        / F.sqrt(disc.cast("double")),
    )
    return joined.withColumn("z", z).drop("_n", "_s", "_q")


def gram_matrix(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
) -> DataFrame:
    """Distributed linear-regression sufficient statistics: the Gram
    matrix X'X and moment vector X'y as ONE map-side-combined
    aggregate pass — the normal-equations route that turns a 100 TB
    regression into a d²-number shuffle (d = #features). With INTEGER
    features and target every entry is an exact integer sum
    (order-independent), so the whole sufficient-statistics frame is
    oracle-checkable — the gradient-descent alternative is float-
    order-dependent and needs epochs over the data; this needs one.

    Returns long-form (row, col, value): col in [0, d) are X'X
    entries (symmetric, all d² emitted), col = -1 is X'y, and the
    (row=-1, col=-1) entry is n. Domain bound: Σ|x_i·x_j| and
    Σ|x_i·y| must stay under 2^63 — scale features to keep products
    bounded, or move to decimal(38,0) sums past that.

    Scale shape: one projection computing d² + d + 1 products per row
    (JVM codegen), one 1-row aggregate — zero wide shuffles; the
    driver-side solve (`ridge_solve`) touches exactly d² + d + 1
    numbers regardless of corpus size.
    """
    d = len(feature_cols)
    xs = [F.col(c).cast("long") for c in feature_cols]
    y = F.col(target_col).cast("long")
    aggs = []
    for i in range(d):
        for j in range(d):
            aggs.append(
                F.sum(xs[i] * xs[j]).cast("long").alias(f"xx_{i}_{j}")
            )
    for i in range(d):
        aggs.append(F.sum(xs[i] * y).cast("long").alias(f"xy_{i}"))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n"))
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("row"),
                        F.lit(j).cast("long").alias("col"),
                        F.col(f"xx_{i}_{j}").alias("value"),
                    )
                    for i in range(d)
                    for j in range(d)
                ]
                + [
                    F.struct(
                        F.lit(i).cast("long").alias("row"),
                        F.lit(-1).cast("long").alias("col"),
                        F.col(f"xy_{i}").alias("value"),
                    )
                    for i in range(d)
                ]
                + [
                    F.struct(
                        F.lit(-1).cast("long").alias("row"),
                        F.lit(-1).cast("long").alias("col"),
                        F.col("n").alias("value"),
                    )
                ]
            )
        ).alias("_e")
    ).select("_e.row", "_e.col", "_e.value")


def ridge_solve(
    gram: DataFrame,
    d: int,
    lam: float = 0.0,
) -> list[float]:
    """Solve (X'X + λI) β = X'y from a `gram_matrix` frame. Driver-
    side by design: the sufficient statistics are d²+d+1 numbers — a
    bounded collect whatever the corpus size (the same cap argument
    as the GEMM index collect). Returns the coefficient list β.
    Floats enter only here, AFTER the exact distributed aggregation.
    """
    import numpy as np

    rows = gram.collect()
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for r in rows:
        if r.row >= 0 and r.col >= 0:
            xtx[r.row][r.col] = float(r.value)
        elif r.row >= 0:
            xty[r.row] = float(r.value)
    return list(np.linalg.solve(xtx + lam * np.eye(d), xty))


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iterations: int = 5,
) -> DataFrame:
    """Distributed logistic-regression training by full-batch gradient
    descent — the classification counterpart of the normal-equations
    path (`gram_matrix`), for when the loss has no closed form:

        w ← w − lr · (1/n) Σ x · (σ(w·x) − y)

    Fixed iteration count (a quality knob, like Lloyd/PageRank); the
    weight vector never touches the driver — it rides as a broadcast
    1-row frame crossJoined into the next pass (the q89/pagerank
    1-row-frame idiom), so an iteration is ONE distributed job: one
    scan computing margins + one (d+1)-number aggregate. Floats
    (exp) ⇒ rows-only gate; numpy parity pytest replays the identical
    schedule.

    Scale shape: per iteration one corpus scan with whole-stage-
    codegen arithmetic and a d-sized aggregate — gradient descent at
    100 TB is bounded by scan bandwidth, and d stays in one cache
    line. Returns (idx, weight) for the final w.
    """
    d = len(feature_cols)
    data = df.select(
        F.array(
            *[F.col(c).cast("double") for c in feature_cols]
        ).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [([0.0] * d,)], "w array<double>"
    )
    for _ in range(iterations):
        joined = data.crossJoin(F.broadcast(wdf))
        margin = F.aggregate(
            F.zip_with("x", "w", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        resid = (p - F.col("y")).alias("r")
        scored = joined.select("x", "w", resid)
        agg = scored.agg(
            F.count(F.lit(1)).alias("n"),
            F.first("w").alias("w"),
            *[
                F.sum(F.element_at("x", i + 1) * F.col("r")).alias(f"g{i}")
                for i in range(d)
            ],
        )
        # lazy checkpoint: the 1-row weight frame materializes as part
        # of the NEXT iteration's broadcast (one job per iteration
        # total), instead of spending a separate eager job per round
        wdf = agg.select(
            F.array(
                *[
                    F.element_at("w", i + 1)
                    - F.lit(lr) * F.col(f"g{i}") / F.col("n")
                    for i in range(d)
                ]
            ).alias("w")
        ).localCheckpoint(eager=False)
    return wdf.select(
        F.posexplode("w").alias("idx", "weight")
    ).select(F.col("idx").cast("long").alias("idx"), "weight")


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact precision-recall curve of an integer score against a
    boolean label: one row per distinct score threshold t (descending)
    with the confusion counts of the classifier "predict positive iff
    score >= t" and the two derived ratios. The PR curve is emitted
    (rather than a scalar PR-AUC) because every interpolation rule for
    the scalar sums rationals with unrelated denominators — the curve
    rows stay exact integers plus two one-divide floats, so the frame
    is hash-comparable across engines.

    Same scale shape as roc_auc: the corpus collapses to one row per
    distinct score FIRST (map-side-combined groupBy), so the ordered
    cumulative window runs over at most |score domain| rows, never
    corpus size.

    Returns (score, tp, fp, fn, precision, recall) per threshold.
    """
    per_score = (
        df.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("boolean").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos"),
        )
        # pinned: feeds both the cumulative branch and the totals row —
        # unpinned, the corpus scan + groupBy would execute twice
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_score.select(
        F.col("s").alias("score"),
        F.sum("pos").over(w).cast("long").alias("tp"),
        (F.sum("n").over(w) - F.sum("pos").over(w)).cast("long").alias("fp"),
    )
    totals = per_score.agg(F.sum("pos").cast("long").alias("r_total"))
    return cum.crossJoin(F.broadcast(totals)).select(
        "score",
        "tp",
        "fp",
        (F.col("r_total") - F.col("tp")).cast("long").alias("fn"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        (F.col("tp").cast("double") / F.col("r_total").cast("double")).alias(
            "recall"
        ),
    )


def _midrank2(df: DataFrame, group_col: str, col: str, out: str) -> DataFrame:
    """Per-group midrank×2 of `col` (ties share the average rank; ×2
    keeps it integral). Collapses to one row per (group, value) first,
    so the ordered window is bounded by the per-group value domain."""
    per_v = df.groupBy(group_col, col).agg(F.count(F.lit(1)).alias("_n"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_v.select(
        group_col,
        col,
        (
            2 * F.coalesce(F.sum("_n").over(w), F.lit(0)) + F.col("_n") + 1
        ).alias(out),
    )


def spearman_rho(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Group-wise Spearman rank correlation with tie midranks, exact
    to the final divide: both variables are replaced by their
    per-group midranks×2 (integers), and rho is Pearson's formula on
    those — every Σ an int64, the float rho one div/sqrt chain at the
    end. int64 holds the rank-product sums up to ~1e6 rows per group
    (Σ x² ≤ n·(2n)²); beyond that swap the three sums to decimal(38,0)
    — same plan shape.

    Scale shape: two bounded-domain midrank windows (see _midrank2),
    two broadcast-joinable rank maps joined back, one map-side-combined
    per-group aggregate. Returns (group, n, rho).
    """
    pairs = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        # pinned: feeds both midrank maps AND the join back — three
        # executions of the upstream plan without it
    ).localCheckpoint(eager=False)
    rx = _midrank2(pairs, "g", "x", "rx2")
    ry = _midrank2(pairs, "g", "y", "ry2")
    ranked = pairs.join(rx, ["g", "x"]).join(ry, ["g", "y"])
    agg = ranked.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
    )
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    denx = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    deny = agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]
    return agg.select(
        group_col,
        "n",
        F.when(
            (denx > 0) & (deny > 0),
            num.cast("double")
            / F.sqrt(denx.cast("double") * deny.cast("double")),
        ).alias("rho"),
    )


def kendall_tau(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Group-wise Kendall tau-b by exact pair counting: concordant,
    discordant, and tie counts ride as int64 and tau-b is one final
    float chain. The pair space is a WITHIN-GROUP self-join — O(n²)
    per group, which is the exact algorithm's cost; callers cap the
    group size (sample or stratify first) exactly as they would for
    any exact quadratic statistic. The join co-partitions both sides
    on the group key, so each group's quadratic work is one task,
    groups fan out across the cluster.

    Returns (group, n, concordant, discordant, tau_b).
    """
    pairs = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy("g").orderBy("x", "y")
    # pinned: the indexed frame is both sides of the self-join and the
    # group-size aggregate — three executions unpinned
    a = pairs.withColumn("i", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    b = a.select("g", F.col("x").alias("x2"), F.col("y").alias("y2"),
                 F.col("i").alias("j"))
    pp = a.join(b, "g").filter(F.col("i") < F.col("j"))
    sgn = (
        F.signum((F.col("x") - F.col("x2")) * (F.col("y") - F.col("y2")))
    )
    agg = pp.groupBy(F.col("g").alias(group_col)).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.sum(
            F.when((F.col("x") == F.col("x2")) & (F.col("y") != F.col("y2")), 1)
            .otherwise(0)
        ).cast("long").alias("tx"),
        F.sum(
            F.when((F.col("y") == F.col("y2")) & (F.col("x") != F.col("x2")), 1)
            .otherwise(0)
        ).cast("long").alias("ty"),
    )
    n = a.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # left join from the size frame: a single-row group has an empty
    # pair set and would otherwise vanish — it must surface as n=1,
    # zero counts, NULL tau_b
    j = n.join(agg, group_col, "left").select(
        group_col,
        "n",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("conc", "disc", "tx", "ty")
        ],
    )
    den = (
        (j["conc"] + j["disc"] + j["tx"]).cast("double")
        * (j["conc"] + j["disc"] + j["ty"]).cast("double")
    )
    return j.select(
        group_col,
        "n",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.when(
            den > 0,
            (j["conc"] - j["disc"]).cast("double") / F.sqrt(den),
        ).alias("tau_b"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa between two boolean raters, exact to the final
    divide: the 2×2 confusion counts are one map-side-combined
    aggregate; po and pe share the denominator n² so kappa reduces to
    (n·agree − Σ marginal products) / (n² − Σ marginal products) — an
    integer/integer divide. Returns one row
    (n, both_true, both_false, only_a, only_b, kappa_num, kappa_den,
    kappa)."""
    c = df.select(
        F.col(rater_a).cast("boolean").alias("a"),
        F.col(rater_b).cast("boolean").alias("b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tt"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("ff"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("ta"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tb"),
    )
    # marginals: a_pos = tt+ta, b_pos = tt+tb, a_neg = ff+tb, b_neg = ff+ta
    pe_num = (c["tt"] + c["ta"]) * (c["tt"] + c["tb"]) + (
        c["ff"] + c["tb"]
    ) * (c["ff"] + c["ta"])
    agree = c["tt"] + c["ff"]
    return c.select(
        "n",
        F.col("tt").alias("both_true"),
        F.col("ff").alias("both_false"),
        F.col("ta").alias("only_a"),
        F.col("tb").alias("only_b"),
        (c["n"] * agree - pe_num).cast("long").alias("kappa_num"),
        (c["n"] * c["n"] - pe_num).cast("long").alias("kappa_den"),
        # den = 0 iff a rater is constant (pe = 1): kappa is undefined
        # there — NULL, not an ANSI divide-by-zero failure
        F.when(
            c["n"] * c["n"] - pe_num > 0,
            (c["n"] * agree - pe_num).cast("double")
            / (c["n"] * c["n"] - pe_num).cast("double"),
        ).alias("kappa"),
    )


def ridge_solve_exact(
    gram: DataFrame,
    d: int,
    lam: int = 1,
) -> list[tuple[int, int]]:
    """Solve (X'X + λI) β = X'y EXACTLY as rationals via Cramer's
    rule on the collected integer sufficient statistics (d ≤ 3).

    Python's arbitrary-precision integers make the determinants exact
    at any magnitude; the shared denominator det(X'X + λI) is > 0 (the
    ridge system is positive definite), so β_i = num_i / den is a
    canonical unreduced fraction and the (num, den) pairs are
    engine-portable — a DuckDB oracle reproduces them in HUGEINT and
    the frame hash-compares, unlike the float LAPACK route
    (`ridge_solve`), whose solve is library-specific. Driver-side by
    design: d²+d+1 numbers whatever the corpus size.
    """
    if d > 3:
        raise ValueError(
            "ridge_solve_exact expands Cramer determinants explicitly;"
            " d <= 3 only (use ridge_solve past that)"
        )
    rows = gram.collect()
    a = [[0] * d for _ in range(d)]
    b = [0] * d
    for r in rows:
        if r.row >= 0 and r.col >= 0:
            a[r.row][r.col] = int(r.value)
        elif r.row >= 0:
            b[r.row] = int(r.value)
    for i in range(d):
        a[i][i] += lam

    def det(m: list[list[int]]) -> int:
        n = len(m)
        if n == 1:
            return m[0][0]
        if n == 2:
            return m[0][0] * m[1][1] - m[0][1] * m[1][0]
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    den = det(a)
    out: list[tuple[int, int]] = []
    for i in range(d):
        ai = [row[:] for row in a]
        for r_ in range(d):
            ai[r_][i] = b[r_]
        out.append((det(ai), den))
    return out
