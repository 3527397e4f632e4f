"""Physical-plan audit over the bench queries: for each, record the
join strategies, shuffle count, parquet pushdown, and whole-stage
codegen coverage the optimizer actually chose at the given scale
factor. Output is markdown (PLANS.md) so plan regressions show up in
review diffs, not just in wall-clock.

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from graphsense_blocksci_spark.queries import QUERIES  # noqa: E402
from graphsense_blocksci_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> dict[str, object]:
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        # shuffles only: BroadcastExchange also contains "Exchange "
        "exchanges": plan.count("Exchange ") - plan.count("BroadcastExchange"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "pushed_filters": plan.count("PushedFilters: [") - plan.count("PushedFilters: []"),
        # the string form marks codegen stages as "*(n)"; count distinct ids
        "wscg_spans": len({
            tok.split(")")[0]
            for tok in plan.split("*(")[1:]
        }),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="plan-audit")
    # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false) before
    # execution, hiding codegen markers; disable it HERE ONLY so the
    # audit sees the static plan (production sessions keep AQE on).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print(f"# PLANS — physical-plan audit at `{sf_dir}`")
    print()
    print(
        "Per bench query: the join strategies, shuffle (`Exchange`) count,"
        " parquet predicate pushdown, whole-stage-codegen spans, and Python"
        " (Arrow) stages Catalyst chose (AQE disabled for the audit so"
        " codegen markers are visible; production keeps it on). Regenerate with"
        " `python tools/plan_audit.py`. BNLJ entries are single-row"
        " broadcast aggregates (HWM / tip / cutoff literals joined into"
        " the filter), not data-plane nested loops."
    )
    print()
    print(
        "| query | BHJ | SMJ | SHJ | BNLJ | exchanges | top-k | pushed |"
        " WSCG | py stages |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name in BENCH_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        print(
            f"| {name} | {a['broadcast_joins']} | {a['sort_merge_joins']} |"
            f" {a['shuffled_hash_joins']} | {a['bnl_joins']} |"
            f" {a['exchanges']} | {'y' if a['take_ordered'] else ''} |"
            f" {a['pushed_filters']} | {a['wscg_spans']} |"
            f" {a['python_stages']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
