"""Invariants for exact-k group sampling and length-bucketed batch
planning."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.batching import plan_batches
from graphsense_blocksci_spark.operators.sampling import group_capped_sample
from graphsense_blocksci_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_group_capped_sample_python_parity(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    rows = [(r["doc_id"], r["lang"]) for r in docs.collect()]
    k = 7
    exp: dict[str, list[int]] = {}
    for did, lang in rows:
        exp.setdefault(lang, []).append(did)
    for lang in exp:
        exp[lang] = sorted(
            exp[lang],
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[:k]
    got: dict[str, list[tuple[int, int]]] = {}
    for r in group_capped_sample(docs, "lang", k, "doc_id").collect():
        got.setdefault(r["lang"], []).append((r["sample_rank"], r["doc_id"]))
    assert set(got) == set(exp)
    for lang, pairs in got.items():
        ordered = [d for _, d in sorted(pairs)]
        assert ordered == exp[lang]
        assert len(pairs) == min(k, len([1 for _, l in rows if l == lang]))


def test_plan_batches_invariants(spark):
    docs = load_table(spark, SF, "documents")
    width, bs = 16, 8
    out = plan_batches(docs, bucket_width=width, batch_size=bs).collect()
    # batch ids are dense from 0 per bucket; only the LAST batch of a
    # bucket may be partial; waste is non-negative and consistent
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    n_docs_total = 0
    for b, batches in by_bucket.items():
        ids = sorted(r["batch_id"] for r in batches)
        assert ids == list(range(len(ids)))
        for r in batches:
            assert 1 <= r["n_docs"] <= bs
            assert width * b <= r["max_len"] < width * (b + 1)
            assert r["padding_waste"] == r["n_docs"] * r["max_len"] - r["sum_len"]
            assert r["padding_waste"] >= 0
            if r["batch_id"] < len(ids) - 1:
                assert r["n_docs"] == bs
            n_docs_total += r["n_docs"]
    n_nonempty = docs.filter(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) > 0
    ).filter(F.trim("text") != "").count()
    assert n_docs_total == n_nonempty
