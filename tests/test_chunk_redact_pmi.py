"""Python-reference parity and invariants for chunking, PII
redaction, and PMI co-occurrence."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.chunking import chunk_documents
from graphsense_blocksci_spark.operators.cooccurrence import pmi_pairs
from graphsense_blocksci_spark.operators.redaction import STAGES, redact_pii
from graphsense_blocksci_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text).strip().lower().split(" ") if t]


def test_chunking_python_parity(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in chunk_documents(docs, window=16, stride=12).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        )
    for did, text in raw.items():
        toks = _py_tokens(text)
        if not toks:
            assert did not in got
            continue
        n_chunks = (max(len(toks) - 16, 0) + 11) // 12 + 1
        chunks = sorted(got[did])
        assert len(chunks) == n_chunks
        for cid, nt, ctext in chunks:
            exp = toks[cid * 12 : cid * 12 + 16]
            assert nt == len(exp)
            assert ctext == " ".join(exp)
        # every token covered
        assert chunks[-1][0] * 12 + chunks[-1][1] >= len(toks)


def test_redaction_python_parity_and_idempotence(spark):
    rows = [
        (0, "mail me at a.b+c@ex-1.org or see http://x.io/a?b=1 now"),
        (1, "ip 192.168.0.1 acct 123456789012 ok 12345678 short"),
        (2, "no pii here at all"),
        (3, "https://a.b/c https://d.e/f two urls 10.0.0.256 still-ip-shape"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for did, text in rows:
        cur = text
        for name, pattern, sentinel in STAGES:
            assert got[did][name] == len(re.findall(pattern, cur)), (
                did,
                name,
            )
            cur = re.sub(pattern, sentinel, cur)
        assert got[did]["clean_text"] == cur
    # idempotence: redacting already-clean text is a no-op
    clean = redact_pii(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    again = redact_pii(clean).collect()
    for r in again:
        assert r["n_urls"] == r["n_emails"] == r["n_ips"] == r["n_longnums"] == 0
        assert r["clean_text"] == r["text"]


def test_pmi_python_parity(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    texts = [r["text"] for r in docs.collect()]
    pc: dict[tuple[str, str], int] = {}
    uc: dict[str, int] = {}
    n_pairs = n_tok = 0
    for t in texts:
        toks = _py_tokens(t)
        n_tok += len(toks)
        for i, a in enumerate(toks):
            uc[a] = uc.get(a, 0) + 1
            for j in range(i + 1, min(i + 3, len(toks))):
                pc[(a, toks[j])] = pc.get((a, toks[j]), 0) + 1
                n_pairs += 1
    exp = {
        k: v
        for k, v in pc.items()
        if v >= 3
    }
    got = {
        (r["tok_a"], r["tok_b"]): r
        for r in pmi_pairs(docs, window=2, min_count=3).collect()
    }
    assert set(got) == set(exp)
    for (a, b), r in got.items():
        assert r["c_ab"] == exp[(a, b)]
        assert r["c_a"] == uc[a] and r["c_b"] == uc[b]
        lift = (
            float(r["c_ab"]) * n_tok * n_tok / n_pairs / uc[a] / uc[b]
        )
        assert r["lift"] == pytest.approx(lift, rel=1e-12)
