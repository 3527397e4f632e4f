"""One-off timing appendix: a SINGLE-pass timing for EVERY registered
query (VERDICT r5 item 6 — the per-query ≤2x claim must be checkable
for the queries outside bench.py's min-of-2 list too).

Unlike bench.py this is not a reproducible anchor — one pass, shared
session, co-tenant noise included. Queries whose run is dominated by
per-run staging (file-stream checkpoint setup, fixture writes) are
still RUN and timed, with the staging caveat recorded inline, so
every name in QUERIES has a number attached.

Usage: python tools/bench_appendix.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphsense_blocksci_spark.queries import QUERIES
from graphsense_blocksci_spark.session import get_spark

# timing includes per-run staging (file-stream setup + checkpoint, or
# fixture/driver-side writes); the named batch twin carries the clean
# timing signal
STAGING_BOUND = {
    "qd07_streaming_roundtrip": "streaming staging",
    "qd09_streaming_dedup": "streaming staging",
    "qd10_streaming_curation": "streaming staging",
    "qd12_streaming_ann": "streaming staging",
    "qd14_stream_stream_join": "streaming staging",
    "qd18_stateful_sessions": "streaming staging",
    "qd21_streaming_clustering": "streaming staging",
    "qd23_binary_files": "binaryFile fixture write",
    "qd24_streaming_heavy_hitters": "streaming staging; twin q121",
    "qd25_streaming_hdr_quantiles": "streaming staging; twin q126",
    "qd26_streaming_count_min": "streaming staging; twin q163",
    "qd32_streaming_shard_router": "streaming staging; twin q196",
    "qd33_streaming_hll": "streaming staging; twin q199",
    "qd37_streaming_lsh_pairs": "streaming staging; twin q36",
    "qd38_streaming_simhash_pairs": "streaming staging; twin q159",
    "qd40_streaming_topn_others": "streaming staging; twin q201",
    "qd41_streaming_drift": "streaming staging; twin q210",
    "qd48_streaming_index_daemon": "streaming staging; twin qd44",
    "qd49_reorg_recovery": "streaming staging; twin qd44",
    "qd51_streaming_duplicate_sentences": "streaming staging; twin q221",
    "q39_knn_bruteforce": "quadratic exact oracle twin of q43",
    "q44_knn_ivf": "includes quadratic exact twin; scale path is q125",
    "qd79_streaming_address_lifetime": "streaming staging; twin qd77",
    # r11 item 7: these three monitors also carry min-of-2 anchor rows
    # in BASELINE.md (qd91 6.81 / qd94 3.06 / qd97 6.01 s at sf0.1);
    # the per-run 5-batch staging share measures ~0.79 s of the total
    "qd91_streaming_dedup_rate": (
        "includes per-run micro-batch staging (~0.79 s); min-of-2"
        " anchor in BASELINE.md"
    ),
    "qd94_streaming_pii_monitor": (
        "includes per-run micro-batch staging (~0.79 s); min-of-2"
        " anchor in BASELINE.md"
    ),
    "qd97_streaming_reuse_monitor": (
        "includes per-run micro-batch staging (~0.79 s); min-of-2"
        " anchor in BASELINE.md"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "BENCH_appendix.json")
    )
    spark = get_spark(app_name="gbs-bench-appendix")
    QUERIES["q02_range_scan"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from graphsense_blocksci_spark import fixtures

    fixtures.ensure_fixtures()
    rows: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            rows[name] = {"sec": dt}
        except Exception as exc:  # noqa: BLE001 — appendix must survive
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        if name in STAGING_BOUND:
            rows[name]["note"] = STAGING_BOUND[name]
        print(f"# {name}: {rows[name]}", file=sys.stderr)
    spark.stop()
    out = {
        "sf_dir": sf_dir,
        "passes": 1,
        "n_queries": len(rows),
        "queries": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"n": len(rows), "out": out_path}))


if __name__ == "__main__":
    main()
