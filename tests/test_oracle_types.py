"""Every DuckDB oracle's output types must match the Spark result
schema — DuckDB silently widens aggregate results (SUM(BIGINT) →
HUGEINT, date_trunc → DATE), which value-compares equal but fails the
driver's value-hash gate. This is the regression test for the round-2
hash-fail class; tools/oracle_types.py is the standalone form.
"""

from __future__ import annotations

import duckdb
import pytest

from graphsense_blocksci_spark.queries import ORACLE_SQL, QUERIES
from graphsense_blocksci_spark.sources.tables import TESTDATA_TABLES
from tools.oracle_types import duck_ok

SF_DIR = "/root/testdata/sf0.001"

# Streaming / stateful queries execute real streams on plan access —
# costly in a schema-only pass; their oracle types are pinned by the
# standalone tool and the cell-exact checker instead.
SKIP = {n for n in ORACLE_SQL if n.startswith("qd18") or n.startswith("qd2")}


def test_every_oracle_type_matches_spark_schema(spark):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name, sql in ORACLE_SQL.items():
        if name in SKIP:
            continue
        duck_types = {
            row[0]: row[1] for row in con.execute(f"DESCRIBE {sql}").fetchall()
        }
        spark_types = {
            f.name: f.dataType.simpleString()
            for f in QUERIES[name](spark, SF_DIR).schema.fields
        }
        if sorted(duck_types) != sorted(spark_types):
            bad.append(f"{name}: column sets differ")
            continue
        for c in spark_types:
            if not duck_ok(spark_types[c], duck_types[c]):
                bad.append(
                    f"{name}.{c}: spark={spark_types[c]} duck={duck_types[c]}"
                )
    assert not bad, "\n".join(bad)
