"""Tests for sequence packing and the corpus-statistics operators
(unigram likelihood, boilerplate n-grams, vocabulary overlap) over
hand-computable micro-corpora."""

from __future__ import annotations

import pytest

from graphsense_blocksci_spark.operators.packing import sequence_packing
from graphsense_blocksci_spark.operators.text_analysis import (
    boilerplate_ngrams,
    unigram_likelihood,
    vocab_overlap,
)


def test_sequence_packing_offsets_and_bins(spark):
    # ids with gaps, a zero-count doc, counts straddling the budget
    rows = [(1, 5), (2, 0), (5, 12), (9, 3), (10, 4)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["offset"], r["start_bin"], r["end_bin"])
        for r in sequence_packing(df, budget=10, n_buckets=3).collect()
    }
    # cumulative offsets in id order: 0, 5, 5, 17, 20
    assert got[1] == (0, 0, 0)  # tokens 0-4 -> bin 0
    assert got[2] == (5, 0, 0)  # empty doc pinned to its start bin
    assert got[5] == (5, 0, 1)  # tokens 5-16 straddle bins 0 and 1
    assert got[9] == (17, 1, 1)
    assert got[10] == (20, 2, 2)


def test_sequence_packing_bucket_invariance(spark):
    rows = [(i, (i * 7) % 13) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    one = sorted(
        sequence_packing(df, budget=16, n_buckets=1).collect(),
        key=lambda r: r["doc_id"],
    )
    many = sorted(
        sequence_packing(df, budget=16, n_buckets=7).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_sequence_packing_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert sequence_packing(df).count() == 0


def test_unigram_likelihood_hand_computed(spark):
    # corpus: "a a b" + "b c" -> tf: a=2, b=2, c=1, N=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_likelihood(df).collect()}
    # doc1: tokens (a,a,b) -> sum_tf = 2+2+2 = 6, n=3 -> 6/(3*5)
    assert got[1]["n_tokens"] == 3 and got[1]["sum_tf"] == 6
    assert got[1]["mean_rel_freq"] == pytest.approx(6 / 15, abs=0)
    # doc2: tokens (b,c) -> sum_tf = 2+1 = 3, n=2 -> 3/(2*5)
    assert got[2]["n_tokens"] == 2 and got[2]["sum_tf"] == 3
    assert got[2]["mean_rel_freq"] == pytest.approx(3 / 10, abs=0)


def test_boilerplate_ngrams_threshold(spark):
    # "x y z" appears in 3 of 4 docs (75%); each doc also has unique grams
    rows = [
        (1, "x y z p q r"),
        (2, "x y z s t u"),
        (3, "x y z v w k"),
        (4, "m n o m n o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in boilerplate_ngrams(df, df_pct=60).collect()}
    # doc1 distinct grams: x-y-z, y-z-p, z-p-q, p-q-r -> 1 of 4 boiler
    assert got[1]["n_shingles"] == 4 and got[1]["n_boiler"] == 1
    assert got[1]["boiler_frac"] == pytest.approx(0.25, abs=0)
    # doc4 shares nothing with the boilerplate set
    assert got[4]["n_boiler"] == 0
    # at a 90% threshold nothing qualifies
    got90 = boilerplate_ngrams(df, df_pct=90).collect()
    assert all(r["n_boiler"] == 0 for r in got90)


def test_vocab_overlap_jaccard(spark):
    rows = [
        (1, "en", "a b c"),
        (2, "en", "c d"),
        (3, "de", "c d e"),
        (4, "fr", "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {(r["g_a"], r["g_b"]): r for r in vocab_overlap(df).collect()}
    # en vocab {a,b,c,d} (4), de vocab {c,d,e} (3), inter {c,d} (2)
    r = got[("de", "en")]
    assert (r["size_a"], r["size_b"], r["n_common"]) == (3, 4, 2)
    assert r["jaccard"] == pytest.approx(2 / 5, abs=0)
    # the full pair grid is emitted: fr shares nothing but still gets
    # explicit zero-overlap rows (distinguishable from 'not evaluated')
    assert set(got) == {("de", "en"), ("en", "fr"), ("de", "fr")}
    assert got[("en", "fr")]["n_common"] == 0
    assert got[("en", "fr")]["jaccard"] == 0.0
    assert got[("de", "fr")]["n_common"] == 0


def test_packed_segments_cover_budget(spark):
    """Composition invariant: expanding packing offsets into segments
    gives every non-final bin exactly `budget` tokens, and per-doc
    slices tile the doc without gaps."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.operators.packing import sequence_packing

    rows = [(i, (i * 13) % 29) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    budget = 16
    pack = sequence_packing(df, budget=budget, n_buckets=4)
    seg = pack.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "offset",
        "n_tokens",
        F.explode(F.sequence("start_bin", "end_bin")).alias("bin"),
    )
    lo = F.greatest(F.col("bin") * budget, F.col("offset"))
    hi = F.least((F.col("bin") + 1) * budget, F.col("offset") + F.col("n_tokens"))
    seg = seg.select("bin", "doc_id", (hi - lo).alias("slice_len"))
    per_bin = {
        r["bin"]: r["tot"]
        for r in seg.groupBy("bin").agg(F.sum("slice_len").alias("tot")).collect()
    }
    total = sum(n for _, n in rows)
    last = max(per_bin)
    for b, tot in per_bin.items():
        assert tot == (budget if b < last else total - last * budget)
    per_doc = {
        r["doc_id"]: r["tot"]
        for r in seg.groupBy("doc_id").agg(F.sum("slice_len").alias("tot")).collect()
    }
    assert per_doc == {i: n for i, n in rows if n > 0}
