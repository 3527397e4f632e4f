"""Round-12 registry hygiene (VERDICT r11 item 6): the audit-twin
coverage that moved OUT of bench-measured frames lands here so nothing
is lost — q125's full-probe IVF-PQ identity now runs on the same
testdata as a pytest instead of inside the registered frame."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ivfpq_fullprobe_identity_on_testdata(spark):
    """Probing EVERY cell with an unbounded re-rank shortlist makes
    the candidate set the whole corpus and the exact re-rank the exact
    top-1 — a mathematical identity independent of centroids AND
    codebooks. This was q125's registered invariant through round 11;
    demoted to pytest so the bench anchor measures the production
    path (VERDICT r11 item 6). Same parameters, same testdata."""
    from graphsense_blocksci_spark.operators import (
        cosine_topk_bruteforce,
        cosine_topk_ivfpq,
    )
    from graphsense_blocksci_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    full = {
        r.vec_id: r.neighbor_id
        for r in cosine_topk_ivfpq(
            emb,
            k=1,
            n_centroids=16,
            n_probe=16,
            n_subspaces=8,
            n_codes=16,
            rerank=1 << 30,
        ).collect()
    }
    exact = {
        r.vec_id: r.neighbor_id
        for r in cosine_topk_bruteforce(emb, k=1).collect()
    }
    assert full == exact
