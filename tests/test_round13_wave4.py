"""Round-13 wave 4: UTXO additive commitment (qd101), collated
filtering (q364), Cochran's Q (q365)."""

from __future__ import annotations

import hashlib

import duckdb
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_qd101_incremental_equals_scratch(spark):
    """The defining commitment identity: the LAST block's prefix
    digest must equal the from-scratch digest of the final UTXO set
    (all outputs never spent), computed independently here."""
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd101_utxo_commitment,
    )
    from graphsense_blocksci_spark.operators.textops import hash60

    MOD = 2_305_843_009_213_693_952
    rows = qd101_utxo_commitment(spark, SF).orderBy("block_id").collect()
    last_digest = rows[-1]["utxo_digest"]

    _, raw_txs, _ = _fixture_frames(spark)
    outs = raw_txs.select(
        "tx_id", F.posexplode("outputs").alias("oi", "out")
    ).select("tx_id", "oi")
    spends = (
        raw_txs.filter(~F.col("coinbase"))
        .select(F.explode("inputs").alias("i"))
        .filter(F.col("i.spent_tx_id").isNotNull())
        .select(
            F.col("i.spent_tx_id").alias("tx_id"),
            F.col("i.spent_index").alias("oi"),
        )
    )
    scratch = (
        outs.join(spends, ["tx_id", "oi"], "left_anti")
        .select(
            hash60(
                F.concat_ws(":", F.lit("op"), F.col("tx_id"), F.col("oi"))
            ).alias("h")
        )
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("s"))
        .first()["s"]
    )
    assert last_digest == int(scratch) % MOD


def test_qd101_counts_conserve(spark):
    """Σ(created − spent) over all blocks = |final UTXO set|."""
    from graphsense_blocksci_spark.queries import (
        _fixture_frames,
        qd101_utxo_commitment,
    )

    rows = qd101_utxo_commitment(spark, SF).collect()
    net = sum(r["n_created"] - r["n_spent"] for r in rows)
    _, raw_txs, _ = _fixture_frames(spark)
    n_outputs = raw_txs.select(F.explode("outputs")).count()
    n_spends = (
        raw_txs.filter(~F.col("coinbase"))
        .select(F.explode("inputs").alias("i"))
        .filter(F.col("i.spent_tx_id").isNotNull())
        .count()
    )
    assert net == n_outputs - n_spends


def test_qd101_digest_is_order_free():
    """The additive digest is commutative — the 100-TB property: any
    partition order yields the same sum (unlike a merkle chain)."""
    hs = [
        int(hashlib.md5(f"op:{t}:{i}".encode()).hexdigest()[:15], 16)
        for t in range(5)
        for i in range(3)
    ]
    MOD = 2_305_843_009_213_693_952
    import random

    shuffled = hs[:]
    random.Random(7).shuffle(shuffled)
    assert sum(hs) % MOD == sum(shuffled) % MOD


def test_q364_collation_matches_lower_semantics(spark):
    """UTF8_LCASE equality must behave exactly like lower()-compare,
    on genuinely mixed-case strings (the testdata regions are
    uniformly uppercase, so pin the semantics on a literal frame)."""
    df = spark.createDataFrame(
        [("Europe",), ("EUROPE",), ("europe",), ("EuRoPe",), ("asia",)],
        "name string",
    )
    df.createOrReplaceTempView("t364")
    got = spark.sql(
        "SELECT count(*) AS n FROM t364"
        " WHERE name COLLATE UTF8_LCASE = 'europe'"
    ).first()["n"]
    assert got == 4


def test_q364_result_matches_oracle_shape(spark):
    from graphsense_blocksci_spark.queries import q364_collated_filter

    got = {
        r["r_name"]: r["n_nations"]
        for r in q364_collated_filter(spark, SF).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.sql(
            f"""
            SELECT r.r_name, count(*)
            FROM read_parquet('{SF}/region.parquet') r
            JOIN read_parquet('{SF}/nation.parquet') n
              ON n.n_regionkey = r.r_regionkey
            WHERE lower(r.r_name) IN ('europe', 'asia')
               OR lower(r.r_name) LIKE 'am%'
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == exp
    # the output keeps the ORIGINAL bytes (uppercase), not a
    # lowercased rewrite — the collation selling point
    assert all(name == name.upper() for name in got)


def test_q365_cochran_matches_bruteforce(spark):
    from graphsense_blocksci_spark.queries import q365_cochran_q

    row = q365_cochran_q(spark, SF).first()
    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_totalprice, o_orderpriority, year(o_orderdate)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    k = 3
    ca = cb = cc = sum_r = sum_r2 = 0
    for price, prio, yr in orders:
        a = 1 if price > 100_000 else 0
        b = 1 if prio in ("1-URGENT", "2-HIGH") else 0
        c = 1 if yr >= 1995 else 0
        r = a + b + c
        ca += a
        cb += b
        cc += c
        sum_r += r
        sum_r2 += r * r
    n = len(orders)
    num = 1_000_000 * k * (k - 1) * (
        ca * ca + cb * cb + cc * cc
    ) - 1_000_000 * (k - 1) * sum_r * sum_r
    den = k * sum_r - sum_r2
    assert (
        row["n"],
        row["c_value"],
        row["c_urgent"],
        row["c_late"],
        row["sum_r"],
        row["sum_r2"],
    ) == (n, ca, cb, cc, sum_r, sum_r2)
    # trunc-toward-zero division, matching Spark DIV / DuckDB //
    q = abs(num) // den * (1 if num >= 0 else -1)
    assert row["q_ppm"] == q
