"""Registry overlap audit (VERDICT r11 item 6): flag query pairs whose
DuckDB oracles are near-duplicates — the mechanical version of the
qd93_fee_market catch (its oracle overlapped qd29/qd53/qd36 before the
round-11 builder re-scoped it).

Similarity = Jaccard over the oracle SQL's identifier/keyword token
SETS (literals and numbers stripped, so two queries differ by a
constant still collide — that IS the overlap we want to catch).
Pairs >= --threshold (default 0.8) print for human review; the audit
is advisory, not a gate, because some high-overlap pairs are
DELIBERATE twins (batch/streaming, exact/approx, 1x/10x harness
shapes) whose divergence lives in the Spark plan, not the oracle.

Usage: python tools/registry_audit.py [--threshold 0.8]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STOP = {
    "select", "from", "where", "group", "by", "order", "as", "and",
    "or", "on", "join", "left", "right", "inner", "full", "outer",
    "cast", "bigint", "double", "varchar", "with", "union", "all",
    "case", "when", "then", "else", "end", "not", "null", "is",
    "count", "sum", "min", "max", "avg", "distinct", "limit", "asc",
    "desc", "having", "between", "in", "exists", "read_parquet",
}


def tokens(sql: str) -> frozenset[str]:
    sql = re.sub(r"'[^']*'", " ", sql)
    sql = re.sub(r"\b\d+(\.\d+)?\b", " ", sql)
    toks = {
        t.lower()
        for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sql)
        if t.lower() not in STOP and len(t) > 1
    }
    return frozenset(toks)


def main() -> None:
    thr = 0.8
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    from graphsense_blocksci_spark.queries import ORACLE_SQL

    toks = {n: tokens(s) for n, s in ORACLE_SQL.items() if s}
    names = sorted(toks)
    flagged = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ta, tb = toks[a], toks[b]
            if not ta or not tb:
                continue
            j = len(ta & tb) / len(ta | tb)
            if j >= thr:
                flagged.append((round(j, 3), a, b))
    flagged.sort(reverse=True)
    for j, a, b in flagged:
        print(f"{j:.3f}  {a}  ~  {b}")
    print(f"# {len(flagged)} pairs >= {thr} over {len(names)} oracles")


if __name__ == "__main__":
    main()
