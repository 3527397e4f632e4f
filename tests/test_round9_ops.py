"""Round-9 wave tests: incremental dedup verdicts against a pure-
Python reference, the leakage-safe split's no-cross-split property,
the integer-Jaccard threshold algebra of the incremental near-dup
probe, and peel-chain structural invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_verdicts_vs_reference(spark):
    import re

    from graphsense_blocksci_spark.queries import q319_incremental_dedup
    from graphsense_blocksci_spark.sources.tables import load_table

    got = {
        r["doc_id"]: (r["verdict"], r["canonical_id"])
        for r in q319_incremental_dedup(spark, SF).collect()
    }
    docs = {
        int(r["doc_id"]): re.sub(r"\s+", " ", r["text"]).strip().lower()
        for r in load_table(spark, SF, "documents").collect()
    }
    old_min: dict[str, int] = {}
    for i in sorted(docs):
        if i % 5 != 0:
            old_min.setdefault(docs[i], i)
    batch_min: dict[str, int] = {}
    for i in sorted(docs):
        if i % 5 == 0:
            batch_min.setdefault(docs[i], i)
    want = {}
    for i in sorted(docs):
        if i % 5 != 0:
            continue
        t = docs[i]
        if t in old_min:
            want[i] = ("dup_of_existing", old_min[t])
        elif i > batch_min[t]:
            want[i] = ("dup_in_batch", batch_min[t])
        else:
            want[i] = ("unique", i)
    assert got == want


def test_incremental_dedup_never_compares_old_vs_old(spark):
    """Plan contract: the corpus side appears only as its hash index
    (one aggregate); there is no old-vs-old join in the plan — both
    joins key on the batch side."""
    from graphsense_blocksci_spark.queries import q319_incremental_dedup

    plan = (
        q319_incremental_dedup(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # two joins total: batch x old-index, batch x batch-min
    assert plan.count("Join") == 2


def test_leakage_safe_split_properties(spark):
    from graphsense_blocksci_spark.queries import q320_leakage_safe_split

    rows = q320_leakage_safe_split(spark, SF).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # the whole point: co-clustered docs never separate
    assert all(r["cross_split_dup_pairs"] == 0 for r in rows)
    assert sum(r["n_docs"] for r in rows) > 0


def test_incremental_neardup_threshold_algebra(spark):
    from graphsense_blocksci_spark.queries import q321_incremental_neardup

    rows = q321_incremental_neardup(spark, SF).collect()
    for r in rows:
        assert r["new_doc_id"] % 5 == 0
        assert r["matched_old_id"] % 5 != 0
        # 3*inter >= |A|+|B|  <=>  jaccard >= 0.5
        assert 2 * r["inter"] >= r["union_sz"]
        assert r["jaccard_ppm"] >= 500_000
        assert r["jaccard_ppm"] == 1_000_000 * r["inter"] // r["union_sz"]


def test_peel_chain_structure(spark):
    from graphsense_blocksci_spark.queries import qd82_peel_chain

    rows = qd82_peel_chain(spark, SF).collect()
    assert rows, "fixture chain contains at least one peel run"
    heads = [r["head_tx"] for r in rows]
    assert len(heads) == len(set(heads)), "one row per chain head"
    for r in rows:
        assert r["chain_len"] >= 2
        assert r["peeled_total"] > 0
        assert r["tail_tx"] != r["head_tx"]


def test_fellegi_null_semantics_documented_vs_behavior(spark):
    """Two all-NULL compared fields agree (NULL <=> NULL): the pair
    must land in the all-agree tier with full agreement score."""
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    df = spark.createDataFrame(
        [(1, 0, None, None), (2, 0, None, None)],
        "id long, blk long, f1 string, f2 string",
    )
    out = fellegi_sunter_topk(
        df, block_cols=("blk",), fields=(("f1", 10, -5), ("f2", 7, -3)), k=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["key_a"], r["key_b"]) == (1, 2)
    assert r["agree_f1"] and r["agree_f2"]
    assert r["score"] == 17


def test_change_augmented_entities_invariants(spark):
    """Every augmented entity is a union of >= 1 co-spend parts and
    the merged flag fires exactly when change evidence fused >= 2
    parts (majority vote: >= 2 of the 3 heuristics name the same
    output)."""
    from graphsense_blocksci_spark.queries import (
        qd85_change_augmented_entities,
    )

    rows = qd85_change_augmented_entities(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_cospend_parts"] <= r["n_addrs"]
        assert r["merged_by_change"] == (r["n_cospend_parts"] > 1)
    assert any(r["merged_by_change"] for r in rows), (
        "fixture chain produces at least one majority change vote that "
        "fuses two co-spend entities"
    )


def test_incremental_dedup_bucketed_index_join_no_index_shuffle(spark):
    """q319's production contract made concrete: the corpus content-
    hash index persisted as a Spark-bucketed table on the hash key
    joins a same-bucketed batch WITHOUT an Exchange on either side —
    the per-batch dedup probe never reshuffles the (huge) index."""
    from graphsense_blocksci_spark.operators.textops import normalize_text
    from graphsense_blocksci_spark.sources import write_spark_bucketed
    from graphsense_blocksci_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(normalize_text("text")).alias("h"),
    )
    old_idx = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .groupBy("h")
        .agg(F.min("doc_id").alias("old_min"))
    )
    new_h = docs.filter(F.col("doc_id") % 5 == 0)
    write_spark_bucketed(old_idx, "t_r9_old_idx", "h", n_buckets=8)
    write_spark_bucketed(new_h, "t_r9_batch", "h", n_buckets=8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        idx, batch = spark.table("t_r9_old_idx"), spark.table("t_r9_batch")
        probed = batch.join(idx, "h", "left")
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # same dup_of_existing verdicts as the scan-based q319 path
        got = {
            r["doc_id"]
            for r in probed.filter(F.col("old_min").isNotNull()).collect()
        }
        from graphsense_blocksci_spark.queries import q319_incremental_dedup

        want = {
            r["doc_id"]
            for r in q319_incremental_dedup(spark, SF).collect()
            if r["verdict"] == "dup_of_existing"
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_r9_old_idx")
        spark.sql("DROP TABLE IF EXISTS t_r9_batch")
