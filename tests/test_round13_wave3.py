"""Round-13 wave 3: DSIR importance selection (q362) and
Page–Hinkley drift (q363) — brute-force pins plus the broadcast plan
shape that makes q362 a 100-TB design."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import duckdb

SF = "/root/testdata/sf0.001"
B = 4096


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def test_q362_matches_bruteforce(spark):
    """Full DSIR recomputation in pure Python on sf0.001: bucket
    counts, add-1 ppm ratio weights, per-doc scores, top-50."""
    from graphsense_blocksci_spark.queries import q362_dsir_importance

    got = q362_dsir_importance(spark, SF).collect()
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    ct: Counter = Counter()
    cr: Counter = Counter()
    per_doc: dict[int, list[int]] = {}
    for doc_id, text in rows:
        toks = [
            t
            for t in re.sub(r"\s+", " ", text).strip().lower().split(" ")
            if t
        ]
        grams = sorted(
            {_h28(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)}
        )
        buckets = [h % B for h in grams]
        if doc_id % 7 == 0:
            ct.update(buckets)
        else:
            cr.update(buckets)
            per_doc[doc_id] = buckets
    nt, nr = sum(ct.values()), sum(cr.values())
    w = {
        b: (1_000_000 * (ct[b] + 1) * (nr + B))
        // ((cr[b] + 1) * (nt + B))
        for b in set(ct) | set(cr)
    }
    scores = {
        d: (len(bs), sum(w[b] for b in bs)) for d, bs in per_doc.items()
    }
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:50]
    assert [(r["doc_id"], r["n_grams"], r["score"]) for r in got] == [
        (d, n, s) for d, (n, s) in top
    ]


def test_q362_weight_table_is_broadcast(spark):
    """The 4096-row weight table must BROADCAST to the gram stream —
    a shuffle of the corpus-sized gram frame on the bucket key would
    be the 100-TB bottleneck."""
    from graphsense_blocksci_spark.queries import q362_dsir_importance

    plan = (
        q362_dsir_importance(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # no sort-merge join anywhere: the only equi-join is the
    # broadcast weight join
    assert "SortMergeJoin" not in plan


def test_q363_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q363_page_hinkley

    row = q363_page_hinkley(spark, SF).first()
    con = duckdb.connect()
    daily = sorted(
        con.sql(
            "SELECT l_shipdate,"
            " CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))"
            " AS BIGINT)"
            f" FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    n = len(daily)
    total = sum(c for _, c in daily)
    best_day, best_ph = None, -1
    cum = 0
    run_min = 0
    first = True
    for day, c in daily:
        cum += c * n - total
        if first:
            run_min = cum
            first = False
        run_min = min(run_min, cum)
        ph = cum - run_min
        if ph > best_ph:
            best_ph, best_day = ph, day
    assert row["n_days"] == n
    assert row["day"] == best_day
    assert row["ph_scaled"] == best_ph


def test_q363_rearms_after_dip():
    """The defining PH property CUSUM lacks: after a deep dip the
    running min resets the baseline, so a later rise alarms relative
    to the dip, not the series start (pure state-machine property)."""
    # synthetic: drop then recover — PH at the end must measure the
    # recovery from the dip bottom
    vals = [100, 100, 10, 10, 10, 100, 100, 100]
    n = len(vals)
    total = sum(vals)
    cum, run_min, ph_last = 0, None, 0
    for v in vals:
        cum += v * n - total
        run_min = cum if run_min is None else min(run_min, cum)
        ph_last = cum - run_min
    # dip bottom is after the third 10; recovery adds 3*(100n-T)
    assert ph_last == 3 * (100 * n - total)
    assert ph_last > 0
