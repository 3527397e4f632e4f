"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 (plus the LLM-data-pipeline extensions) expressed as a
(Spark callable, DuckDB oracle SQL) pair over the driver testdata
(TESTDATA.md: region nation customer supplier part orders lineitem
events documents embeddings).

Design rules that make the oracle comparison exact:

- **No raw double aggregation.** Sums of doubles are order-dependent
  across partitions; money flows through integer cents
  (`round(price*100)::BIGINT`), counts through BIGINT, and the only
  doubles in outputs are single IEEE operations on deterministic
  inputs (one division, one multiply chain in fixed order) which both
  engines reproduce bit-identically.
- **Canonical types.** Integers → BIGINT, floats → DOUBLE, strings →
  VARCHAR, bools → BOOLEAN, times → TIMESTAMP (session UTC), on BOTH
  sides — the driver compares schema and value hashes after sorting
  columns by name.
- **Arrays stringified.** Nested outputs are joined to CSV strings so
  the value hash is representation-independent.
- **md5 as the cross-engine hash.** `conv(substr(md5(x),1,7),16,10)`
  in Spark ≡ `('0x'||substr(md5(x),1,7))::BIGINT` in DuckDB — the
  foundation of the dedup/minhash oracles (see operators/textops.py).

Reference parity notes cite graphsense-blocksci files (file:line) next
to each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphsense_blocksci_spark.functions import bucket_group, tx_hash_prefix
from graphsense_blocksci_spark.functions.addresses import (
    address_type_code,
    render_address,
)
from graphsense_blocksci_spark.functions.coinjoin import is_coinjoin
from graphsense_blocksci_spark.operators import (
    asof_join,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    dedup_last_write_wins,
    doc_fingerprint,
    exact_dedup,
    extract_features,
    frame_sample,
    attach_payload,
    high_water_mark_filter,
    language_id,
    latest_per_group,
    link_inputs_to_outputs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    text_stats,
    top_k,
)
from graphsense_blocksci_spark.operators.retrieval import BM25_FIXTURE_QUERIES
from graphsense_blocksci_spark.operators.text_analysis import BPE_FIXTURE_VOCAB
from graphsense_blocksci_spark.operators.textops import (
    LSH_BAND_ROWS,
    MINHASH_COEFFS,
    MINHASH_PERMS,
    MINHASH_PRIME,
)
from graphsense_blocksci_spark.plans.incremental import (
    incremental_delta,
    previous_day_cutoff,
    reorg_safety_filter,
)
from graphsense_blocksci_spark.schemas import ADDRESS_TYPES
from graphsense_blocksci_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# Pinned "now" for the previous-day / incremental queries: 2024-01-15
# 01:00:00 UTC (events span 2024-01-01..30) — cutoff = midnight Jan 15.
PIN_EPOCH = 1705280400
PIN_CUTOFF_SQL = "TIMESTAMP '2024-01-15 00:00:00'"

_cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
# discounted revenue in integer cents — the multiply order (price *
# (1 - discount) * 100, left-assoc) is load-bearing: the oracle SQL
# mirrors it literally, so ALL queries must share this one definition
_rev_cents = lambda: F.round(  # noqa: E731
    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
).cast("long")


# --------------------------------------------------------------------------
# Relational / blockchain-analog operators (SURVEY §2.A/B) over testdata
# --------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship groupBy aggregation (A13 family; TPC-H Q1 shape).

    Money is aggregated in integer cents: double sums are partition-
    order dependent, bigint sums are exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — range slice / partition-pruned scan (blocksci_export.py:513-517).

    The predicate reaches the parquet scan as PushedFilters min/max.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 5000)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def q03_bucket_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — projection with derived bucket group
    (`height // BLOCK_BUCKET_SIZE`, blocksci_export.py:332-337)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        bucket_group("o_orderkey", 100).cast("long").alias("key_group"),
        F.col("o_orderkey").alias("o_orderkey"),
        F.col("o_totalprice").alias("o_totalprice"),
    )


def q04_prefix_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — lowercase hex hash-prefix partition key
    (blocksci_export.py:368-371) via unhex(md5) → hex → lower → substr."""
    c = load_table(spark, sf_dir, "customer")
    hashed = c.select(
        F.col("c_custkey"), F.unhex(F.md5(F.col("c_name"))).alias("h")
    )
    return hashed.select(
        "c_custkey", tx_hash_prefix("h", 5).alias("prefix")
    )


def q05_grouped_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — per-group chain-ordered array build (collect_list +
    sort_array, blocksci_export.py:209-211), stringified for hashing."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.col("l_linenumber").cast("long"))),
                lambda x: x.cast("string"),
            ),
        ).alias("linenumbers_csv"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q06_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — chain totals: max-key+1, row count, timestamp of the
    max-key row (max_by ≡ the reference's last-block timestamp,
    blocksci_export.py:374-383)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        (F.max("o_orderkey") + 1).cast("long").alias("next_key"),
        F.count(F.lit(1)).alias("no_orders"),
        F.max_by("o_orderdate", "o_orderkey").alias("latest_date"),
    )


def q07_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — first row per group under an order — the reference's
    `PER PARTITION LIMIT 1` idiom (blocksci_export.py:55-58)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_group(ev, ["user_id"], "event_id", descending=True).select(
        "user_id", "event_id", "ts", "event_type"
    )


def q08_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — global top-k by sort order (DESC clustering + LIMIT,
    blocksci_export.py:64-67)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


def q09_hwm_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 — resume-from-high-water-mark `--continue`
    (blocksci_export.py:489-505): sink holds ids ≤ 5000, the delta is
    everything above the sink's max."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    sink = ev.filter(F.col("event_id") <= 5000)
    return high_water_mark_filter(ev, sink, "event_id")


def q10_hwm_cold_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 cold start — EMPTY sink must mean "ingest everything"
    (blocksci_export.py:497-505), not "drop everything" (the round-1
    NULL-predicate bug, fixed in operators/windows.py)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    empty_sink = ev.filter(F.col("event_id") < 0)
    return high_water_mark_filter(ev, empty_sink, "event_id")


def q11_dedup_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22 — last-write-wins dedup, the general form of the BIP30
    upsert (blocksci_export.py:466-473): max version row per key.
    Version = event_id (unique), so the winner is deterministic — the
    same property the reference gets from monotonically increasing
    tx_ids."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_last_write_wins(
        ev.select("user_id", "event_type", "event_id", "value"),
        ["user_id", "event_type"],
        "event_id",
    )


def q12_linkage_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — the UTXO input→spent-output equi-join on a composite key
    (SURVEY §2.B1), mapped onto (orderkey, linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    outputs = li.select(
        F.col("l_orderkey").alias("tx_id"),
        F.col("l_linenumber").cast("long").alias("output_index"),
        _cents("l_extendedprice").alias("value"),
    )
    inputs = li.select(
        F.col("l_orderkey").alias("spent_tx_id"),
        F.col("l_linenumber").cast("long").alias("spent_index"),
        F.col("l_suppkey"),
    )
    return link_inputs_to_outputs(inputs, outputs).select(
        "spent_tx_id", "spent_index", "l_suppkey", "value"
    )


def q13_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dim star join + aggregation: orders ⋈ customer ⋈
    nation with the dims broadcast (SURVEY §2.C joins row)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("total_cents"),
        )
    )


def q14_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C — backward-inclusive as-of join (exchange-rates shape,
    schema.cql:58-61): daily rate series built from odd days only, so
    even-day events must carry the previous day's rate forward.
    Broadcast validity-interval strategy — the big side never shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    rates = (
        ev.filter(F.dayofmonth("ts") % 2 == 1)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.max("value").alias("rate"))
    )
    return asof_join(
        ev.select("event_id", "ts"),
        rates,
        on="ts",
        right_on="day",
        value_cols=["rate"],
        suffix="",
        strategy="broadcast",
    ).select("event_id", "ts", "rate")


def q15_previous_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — previous-day watermark cutoff (blocksci_export.py:540-553)
    pinned to 2024-01-15 01:00 UTC → keep rows before midnight UTC."""
    ev = load_table(spark, sf_dir, "events")
    return previous_day_cutoff(ev, "ts", as_of_epoch=PIN_EPOCH).select(
        "event_id", "ts", "user_id"
    )


def q16_reorg_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 — chain-tip safety lag (conf/btc.cfg:20 `maxBlockNum: -6`):
    never the newest 6 ids."""
    ev = load_table(spark, sf_dir, "events")
    return reorg_safety_filter(ev, "event_id", lag=6).select(
        "event_id", "user_id", "event_type"
    )


def q17_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16+A17+B7 composed — the `--continue --previous-day` daemon
    step (docker/ingest.sh:2-8): reorg lag ∘ day cutoff ∘ HWM."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    sink = ev.filter(F.col("event_id") <= 3000)
    return incremental_delta(
        ev, sink, block_col="event_id", ts_col="ts", as_of_epoch=PIN_EPOCH, lag=6
    )


_ADDR_NAMES = list(ADDRESS_TYPES.keys())


def q18_address_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+A10 — dictionary-encode script-type names to smallint codes
    and render addresses per the type CASE (blocksci_export.py:22-33,
    :318-329): multisig → constituent list, nonstandard/nulldata/
    witness_unknown → NULL, else singleton."""
    n = load_table(spark, sf_dir, "nation")
    typed = n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        F.col("n_name"),
        F.element_at(
            F.array(*[F.lit(x) for x in _ADDR_NAMES]),
            (F.col("n_nationkey") % 10 + 1).cast("int"),
        ).alias("type_name"),
    )
    code = address_type_code("type_name")
    rendered = render_address(
        code, F.col("n_name"), F.array(F.col("n_name"), F.lit("ms2"))
    )
    return typed.select(
        "n_nationkey",
        "type_name",
        code.cast("long").alias("type_code"),
        F.array_join(rendered, ",").alias("rendered_csv"),
    )


def q19_coinjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — the BlockSci isCoinjoin heuristic (tx_identification.cpp
    semantics; blocksci_export.py:365) over synthetic txs assembled
    from lineitem: inputs keyed by supplier identity, output values =
    integer quantities (equality classes with real collisions)."""
    li = load_table(spark, sf_dir, "lineitem")
    txs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.array(F.col("l_suppkey").cast("string")).alias("address"),
                (F.col("l_suppkey") % 7).cast("smallint").alias("address_type"),
            )
        ).alias("inputs"),
        F.collect_list(
            F.struct(F.col("l_quantity").cast("long").alias("value"))
        ).alias("outputs"),
    )
    return txs.select(
        "l_orderkey", is_coinjoin("inputs", "outputs").alias("coinjoin")
    )


def q20_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation (the batch shape of the
    streaming ingest's windowed stats; SURVEY §2.C streaming row)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
    )


def q21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + running sum — the
    batch analog of a session window, fully distributed per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ, which Spark refuses to cast straight to
    # DOUBLE; hop through TIMESTAMP (session TZ pinned UTC in session.py)
    # so the epoch-seconds gap is deterministic.
    _epoch = F.col("ts").cast("timestamp").cast("double")
    gap = _epoch - F.lag(_epoch).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)).alias("_new"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q22_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 general form — top-k per group via ranked window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q23_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (SURVEY §2.C distinct row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q24_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup grouping sets (SURVEY §2.C grouping row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("l_extendedprice")).alias("sum_cents"),
    )


def q25_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership joins (SURVEY §2.C set-ops row): per nation, how
    many customers have orders (left_semi) vs none (left_anti) —
    dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    without = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    a = with_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    b = without.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return (
        a.join(b, "c_nationkey", "full")
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


def q29_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing surface (SURVEY §2.C array/map/JSON row):
    `from_json` with an explicit schema over the events.props payload,
    aggregated per event type — schema-on-read without inference."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k int")["k"].cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.count_if(F.col("k").isNull()).alias("n_null_k"),
    )


def q28_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted two-phase aggregation on a 3-value heavy-hitter
    key (l_returnflag) — the oracle pins that salting recombines to
    EXACTLY the plain GROUP BY."""
    from graphsense_blocksci_spark.operators import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    pre = li.select(
        "l_returnflag", _cents("l_extendedprice").alias("price_cents"), "l_orderkey"
    )
    return salted_agg(
        pre,
        ["l_returnflag"],
        {
            "n_rows": ("l_orderkey", "count"),
            "sum_cents": ("price_cents", "sum"),
            "max_key": ("l_orderkey", "max"),
        },
        n_salts=16,
    )


def q27_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi interval join (SURVEY §2.C theta/range row): count
    events falling inside each day's opening window [day, day+6h).
    The interval dim is tiny → broadcast nested-loop with the range
    predicate; the events side is never shuffled."""
    ev = load_table(spark, sf_dir, "events")
    windows = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("w_start"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "w_start",
            (F.col("w_start") + F.expr("INTERVAL 6 HOURS")).alias("w_end"),
        )
    )
    joined = ev.join(
        F.broadcast(windows),
        (ev["ts"] >= windows["w_start"]) & (ev["ts"] < windows["w_end"]),
    )
    return joined.groupBy("w_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q26_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function surface (SURVEY §2.C rows):
    hex↔bytes round-trip, substring/concat, date_trunc/extract,
    floor-div/mod — the reference's entire scalar vocabulary
    (blocksci_export.py:333-371, :540-553) in one projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.hex(F.unhex(F.md5(F.col("o_orderstatus"))))).alias("hex_roundtrip"),
        F.concat_ws("-", F.substring("o_orderpriority", 1, 1), "o_orderstatus").alias(
            "prio_code"
        ),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dom"),
        F.floor(F.col("o_orderkey") / 7).cast("long").alias("key_div7"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
        F.unix_timestamp("o_orderdate").cast("long").alias("order_epoch"),
    )


# --------------------------------------------------------------------------
# Domain tables over the committed mini-chain fixtures — the reference's
# actual output tables (schema.cql:6-75), oracle-checked against DuckDB
# reading the same parquet (nested list<struct> I/O arrays and all).
# --------------------------------------------------------------------------

_FIXTURE_DIR = "/root/repo/fixtures"


def _fixture_frames(spark: SparkSession):
    from graphsense_blocksci_spark import fixtures
    from graphsense_blocksci_spark.sources.tables import (
        load_raw_blocks,
        load_raw_exchange_rates,
        load_raw_txs,
    )

    fixtures.ensure_fixtures()
    return (
        load_raw_blocks(spark),
        load_raw_txs(spark),
        load_raw_exchange_rates(spark),
    )


def qd01_block_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — the `block` table projection (blocksci_export.py:332-337),
    hash hex-encoded for a representation-independent compare."""
    from graphsense_blocksci_spark.plans.ingest import block_table

    raw_blocks, _, _ = _fixture_frames(spark)
    t = block_table(raw_blocks)
    return t.select(
        F.col("block_id_group").cast("long").alias("block_id_group"),
        F.col("block_id").cast("long").alias("block_id"),
        F.lower(F.hex("block_hash")).alias("block_hash_hex"),
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("no_transactions").cast("long").alias("no_transactions"),
    )


def qd02_transaction_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+B2+B3+B5 — the `transaction` table (blocksci_export.py:352-365)
    over REAL nested I/O arrays: bucket group, totals from array folds,
    the coinjoin heuristic — scalar columns projected for the compare."""
    from graphsense_blocksci_spark.plans.ingest import transaction_table

    _, raw_txs, _ = _fixture_frames(spark)
    t = transaction_table(raw_txs)
    return t.select(
        F.col("tx_id_group").cast("long").alias("tx_id_group"),
        F.col("tx_id").alias("tx_id"),
        F.lower(F.hex("tx_hash")).alias("tx_hash_hex"),
        F.col("block_id").cast("long").alias("block_id"),
        F.col("timestamp").cast("long").alias("timestamp"),
        "coinbase",
        "total_input",
        "total_output",
        F.size("inputs").cast("long").alias("no_inputs"),
        F.size("outputs").cast("long").alias("no_outputs"),
        "coinjoin",
    )


def qd03_tx_prefix_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+A22 — the `transaction_by_tx_prefix` lookup index with BIP30
    last-write-wins dedup (blocksci_export.py:368-371, :466-473)."""
    from graphsense_blocksci_spark.plans.ingest import tx_prefix_table

    _, raw_txs, _ = _fixture_frames(spark)
    t = tx_prefix_table(raw_txs)
    return t.select(
        "tx_prefix", F.lower(F.hex("tx_hash")).alias("tx_hash_hex"), "tx_id"
    )


def qd04_block_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — the `block_transactions` nested array build
    (blocksci_export.py:197-240): chain-ordered tx_id list per block
    plus an aggregate over the struct array."""
    from graphsense_blocksci_spark.plans.ingest import block_transactions_table

    _, raw_txs, _ = _fixture_frames(spark)
    t = block_transactions_table(raw_txs)
    return t.select(
        F.col("block_id_group").cast("long").alias("block_id_group"),
        F.col("block_id").cast("long").alias("block_id"),
        F.concat_ws(
            ",", F.transform("txs", lambda x: x["tx_id"].cast("string"))
        ).alias("tx_ids_csv"),
        F.size("txs").cast("long").alias("no_txs"),
        F.aggregate(
            "txs", F.lit(0).cast("long"), lambda acc, x: acc + x["total_output"]
        ).alias("block_total_output"),
    )


def qd05_summary_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13+A26 — the `summary_statistics` singleton
    (blocksci_export.py:374-383)."""
    from graphsense_blocksci_spark.plans.ingest import summary_statistics_table

    raw_blocks, raw_txs, _ = _fixture_frames(spark)
    t = summary_statistics_table(raw_blocks, raw_txs, keyspace="btc")
    return t.select(
        "id",
        F.col("no_blocks").cast("long").alias("no_blocks"),
        F.col("no_txs").alias("no_txs"),
        F.col("timestamp").cast("long").alias("timestamp"),
    )


def qd06_rates_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C — transactions joined to the exchange-rates table via the
    broadcast as-of join (schema.cql:58-61): USD rate extracted from
    the map<currency,float> column."""
    from graphsense_blocksci_spark.plans.ingest import (
        exchange_rates_table,
        transaction_table,
        transactions_with_rates,
    )

    _, raw_txs, raw_rates = _fixture_frames(spark)
    txs = transaction_table(raw_txs).select("tx_id", "timestamp")
    rated = transactions_with_rates(txs, exchange_rates_table(raw_rates))
    return rated.select(
        "tx_id",
        F.col("fiat_values")["USD"].cast("double").alias("usd"),
        F.size("fiat_values").cast("long").alias("n_currencies"),
    )


def qd08_utxo_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — the REAL UTXO join over the fixture chain: every
    non-coinbase input carries the parser-resolved (spent_tx_id,
    spent_index); the engine re-derives the linkage as an equi-join of
    exploded inputs against exploded outputs and proves each resolved
    output's value equals what the input claims to spend."""
    from graphsense_blocksci_spark.operators import (
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    ins = explode_inputs(raw_txs.filter(~F.col("coinbase")))
    outs = explode_outputs(raw_txs).select(
        "tx_id", "output_index", F.col("value").alias("resolved_value")
    )
    linked = link_inputs_to_outputs(ins, outs)
    return linked.select(
        F.col("tx_id").alias("tx_id"),
        F.col("input_index").cast("long").alias("input_index"),
        "spent_tx_id",
        F.col("spent_index").cast("long").alias("spent_index"),
        "claimed_value",
        "resolved_value",
        (F.col("claimed_value") == F.col("resolved_value")).alias("value_matches"),
    )


def qd07_streaming_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest end-to-end under the correctness
    gate: file-source stream over the fixture txs → `transaction`
    transform → idempotent foreachBatch parquet sink (availableNow),
    sink read back as a batch frame. The oracle is plain SQL over the
    same raw parquet — the stream must land exactly the batch rows
    (checkpoint ≙ --continue, dedup-before-append ≙ PK upsert)."""
    import shutil
    import tempfile
    from pathlib import Path

    from graphsense_blocksci_spark import fixtures
    from graphsense_blocksci_spark.streaming import stream_transactions

    fixture_file = fixtures.ensure_fixtures() / "raw_txs.parquet"
    work = tempfile.mkdtemp(prefix="gbs_stream_")
    # the file source tails a DIRECTORY (a chain follower drops block
    # files into it); stage the fixture as that directory's first file
    src = Path(work) / "src"
    src.mkdir()
    shutil.copy(fixture_file, src / "raw_txs.parquet")
    q = stream_transactions(
        spark,
        str(src),
        f"{work}/sink",
        f"{work}/ckpt",
        max_files_per_trigger=4,
        available_now=True,
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd07 streaming ingest did not finish in 600s")
    out = spark.read.parquet(f"{work}/sink")
    return out.select(
        F.col("tx_id_group").cast("long").alias("tx_id_group"),
        "tx_id",
        F.lower(F.hex("tx_hash")).alias("tx_hash_hex"),
        F.col("block_id").cast("long").alias("block_id"),
        "coinbase",
        "total_input",
        "total_output",
    )


def qd09_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under the correctness gate: the documents
    table staged as a file-source stream (event time derived from
    doc_id), `dropDuplicatesWithinWatermark` on the batch dedup's
    content hash, availableNow to a parquet sink, sink read back.
    Output is the surviving hash set — one row per distinct content —
    which must equal the batch DISTINCT the oracle computes (which
    doc_id wins per hash is arrival-order-dependent, so ids stay out
    of the compared output)."""
    import tempfile

    from graphsense_blocksci_spark.streaming import dedup_stream

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.to_timestamp(F.lit(1_700_000_000) + F.col("doc_id")).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="gbs_sdedup_")
    docs.write.mode("overwrite").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{work}/src")
    )
    # watermark must exceed the derived event-time SPAN (1 s per doc_id)
    # at EVERY scale factor, or out-of-order file listing could evict
    # state and emit duplicates / drop late rows — 30 days covers sf1+
    q = (
        dedup_stream(stream, watermark="30 days")
        .writeStream.format("parquet")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd09 streaming dedup did not finish in 600s")
    out = spark.read.parquet(f"{work}/sink")
    return out.select(F.col("_content_hash").alias("content_hash"))


def qd12_streaming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN under the correctness gate: the embeddings table
    staged as a file-source stream of QUERY vectors, stream-static
    joined against the static LSH index (streaming/ann.py), per-batch
    exact top-k ranked in foreachBatch, parquet sink read back.

    The oracle re-derives the hyperplanes, buckets, Hamming-1 probes,
    fold cosines and the ranked top-k in SQL — bit-exact, because the
    static index makes per-batch ranking identical to a batch run."""
    import tempfile

    from graphsense_blocksci_spark.streaming.ann import knn_stream_topk, lsh_index

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(n_planes=6, n_tables=2, seed=42, multiprobe=1)
    work = tempfile.mkdtemp(prefix="gbs_sann_")
    emb.repartition(2).write.mode("overwrite").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/src")
    )
    index = lsh_index(emb, n_planes=6, n_tables=2, seed=42).persist()
    index.count()

    def _sink(ranked: DataFrame, batch_id: int) -> None:
        ranked.write.mode("append").parquet(f"{work}/sink")

    q = knn_stream_topk(
        stream, index, _sink, k=3, checkpoint=f"{work}/ckpt", **kw
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd12 streaming ANN did not finish in 600s")
    index.unpersist()
    return spark.read.parquet(f"{work}/sink").select(
        "vec_id", "neighbor_id", "rank", "cos_sim"
    )


def qd13_taint_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSense's "follow the funds": hop-bounded forward taint
    tracing over the real fixture chain. Seeds = the coinbase txs of
    the first 10 blocks; edges = spent-output → spending-tx (from the
    same exploded-inputs linkage as qd08); answer = every tx reachable
    in ≤ 4 spend-hops with its minimum hop count (frontier BFS,
    operators/graph.py:bfs_reachability). Oracle: hop-bounded
    recursive CTE taking min(hops)."""
    from graphsense_blocksci_spark.operators import explode_inputs
    from graphsense_blocksci_spark.operators.graph import bfs_reachability

    _, raw_txs, _ = _fixture_frames(spark)
    edges = explode_inputs(raw_txs.filter(~F.col("coinbase"))).select(
        F.col("spent_tx_id").alias("src"), F.col("tx_id").alias("dst")
    )
    seeds = raw_txs.filter(F.col("coinbase") & (F.col("block_id") < 10)).select(
        F.col("tx_id").alias("node")
    )
    return bfs_reachability(edges, seeds, max_hops=4)


def qd14_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join under the correctness gate: orders and
    lineitem staged as two file-source streams, joined on the order
    key WITH an event-time range bound (the state-retention contract),
    availableNow to a parquet sink. Watermarks (10 years) exceed the
    data's true ±2500-day shipdate spread, so nothing evicts early and
    the streamed join must equal the batch join the oracle runs."""
    import tempfile

    from graphsense_blocksci_spark.streaming.join import stream_stream_join

    # event-time columns must be TIMESTAMP (tz-aware) — the parquet
    # dates load as TIMESTAMP_NTZ, which watermarks reject
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_ts"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _cents("l_extendedprice").alias("cents"),
        F.col("l_shipdate").cast("timestamp").alias("l_ts"),
    )
    work = tempfile.mkdtemp(prefix="gbs_ssj_")
    o.write.mode("overwrite").parquet(f"{work}/orders")
    li.write.mode("overwrite").parquet(f"{work}/lineitem")
    so = (
        spark.readStream.schema(o.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{work}/orders")
    )
    sl = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{work}/lineitem")
    )
    joined = stream_stream_join(
        so,
        sl,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_ts") >= F.col("o_ts") - F.expr("INTERVAL 2500 DAYS"))
        & (F.col("l_ts") <= F.col("o_ts") + F.expr("INTERVAL 2500 DAYS")),
        left_ts="o_ts",
        right_ts="l_ts",
        left_watermark="3650 days",
        right_watermark="3650 days",
    )
    q = (
        joined.select("o_orderkey", "o_custkey", "l_linenumber", "cents")
        .writeStream.format("parquet")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd14 stream-stream join did not finish in 600s")
    return spark.read.parquet(f"{work}/sink").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "cents",
    )


def qd11_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array fidelity both ways: build the `block_transactions`
    list<struct> (A12), then POSEXPLODE it back to rows — position,
    ids and struct fields must equal the flat per-tx projection the
    oracle computes directly from the raw side. Pins chain ordering
    inside the array (pos == rank of tx_id within block) and lossless
    struct round-tripping."""
    from graphsense_blocksci_spark.plans.ingest import block_transactions_table

    _, raw_txs, _ = _fixture_frames(spark)
    t = block_transactions_table(raw_txs)
    return t.select(
        F.col("block_id").cast("long").alias("block_id"),
        F.posexplode("txs").alias("pos", "tx"),
    ).select(
        "block_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("tx.tx_id").cast("long").alias("tx_id"),
        F.col("tx.no_inputs").cast("long").alias("no_inputs"),
        F.col("tx.no_outputs").cast("long").alias("no_outputs"),
        F.col("tx.total_input").alias("total_input"),
        F.col("tx.total_output").alias("total_output"),
    )


def qd10_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's streaming face under the oracle gate:
    documents staged as a file stream → watermark dedup → per-row
    quality + language columns → filter, sink read back and
    aggregated per language. Which doc survives a dup class is
    arrival-order-dependent, but every curation signal derives from
    the NORMALIZED content (identical within a class), so per-language
    counts and token sums are winner-independent — exactly what the
    oracle compares."""
    import tempfile

    from graphsense_blocksci_spark.streaming import curate_stream

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.to_timestamp(F.lit(1_700_000_000) + F.col("doc_id")).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="gbs_scur_")
    docs.write.mode("overwrite").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{work}/src")
    )
    q = (
        curate_stream(stream, keep_langs=("en", "und"), watermark="30 days")
        .writeStream.format("parquet")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd10 streaming curation did not finish in 600s")
    out = spark.read.parquet(f"{work}/sink")
    return out.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# LLM-data-pipeline operators over documents / embeddings
# --------------------------------------------------------------------------


def q30_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup over normalized text — one shuffle on a
    uniform 128-bit key; map-side partial agg applies at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


def q31_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text_stats(docs)


def q32_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs)


def q33_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs)


def q34_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return doc_fingerprint(docs)


def q35_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs)


def q36_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs — compared only within LSH
    buckets (sum |bucket|², never |corpus|²)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs)


def q37_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs)


def q38_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard, evaluated ONLY on LSH candidates (the
    candidate/verify pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2)


def q39_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 — the correctness baseline (quadratic;
    broadcast right side). Fixed-order double folds → bit-identical
    across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(emb, k=3)


def q44_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN, driver-checkable invariant frame
    (VERDICT r4 item 3 — the former rows-only entry).

    The IVF centroids come from driver-side NumPy k-means (BLAS
    reduction order), so the approximate result itself can never be
    SQL-mirrored. What IS oracle-expressible is a mathematical
    identity: with ``n_probe == n_centroids`` every query probes every
    cell, the candidate set is the whole corpus, and IVF top-1 must
    equal the exact brute-force top-1 — independent of where the
    centroids landed. The frame returned here runs BOTH paths:

    - ``n_queries``   exact top-1 row count  (oracle: count(*))
    - ``n_results``   the real probe-4 approximate path's row count
                      (oracle: count(*) — every query's 4 probed cells
                      contain non-self members at every fixture SF)
    - ``n_fullprobe_mismatch``  queries where full-probe IVF top-1 ≠
                      exact top-1 (oracle: the identity, 0)

    So the driver now verifies the full IVF machinery (assignment,
    cell join, dedup, ranking, tie-break) end-to-end while the
    approximate path still executes at its production setting."""
    from graphsense_blocksci_spark.operators import cosine_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivf(emb, k=1, n_centroids=16, n_probe=4)
    full = cosine_topk_ivf(emb, k=1, n_centroids=16, n_probe=16)
    exact = cosine_topk_bruteforce(emb, k=1)
    pairing = full.select(
        "vec_id", F.col("neighbor_id").alias("ivf_nb")
    ).join(
        exact.select("vec_id", F.col("neighbor_id").alias("ex_nb")),
        "vec_id",
        "full_outer",
    )
    n_queries = exact.agg(F.count(F.lit(1)).alias("n_queries"))
    n_results = approx.agg(F.count(F.lit(1)).alias("n_results"))
    n_mismatch = pairing.agg(
        F.sum(
            F.when(~F.col("ivf_nb").eqNullSafe(F.col("ex_nb")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_fullprobe_mismatch")
    )
    return n_queries.crossJoin(n_results).crossJoin(n_mismatch)


def q45_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation DAG: exact dedup → quality gate → language
    filter → per-language funnel counts — the end-to-end training-data
    pipeline over the documents table, one oracle for the whole
    composition."""
    from graphsense_blocksci_spark.plans.curate import curation_report

    docs = load_table(spark, sf_dir, "documents")
    return curation_report(docs, keep_langs=("en", "und"))


def q43_knn_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 via Arrow+NumPy GEMM — driver-checkable
    parity frame (round 5, extending the VERDICT r4 item-3 pattern to
    the remaining GEMM twin): BLAS reduction order moves scores by an
    ulp, so the (vec_id, neighbor_id, rank) triples are compared
    against the bit-exact fold baseline (q39, which the driver
    verifies against its full SQL mirror) — n_pairs from that mirror,
    symmetric difference an identity (0). Scores stay out of the
    hash; the GEMM path still executes in full."""
    from graphsense_blocksci_spark.operators import (
        cosine_topk_bruteforce,
        cosine_topk_gemm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    gemm = cosine_topk_gemm(emb, k=3).select(
        "vec_id", "neighbor_id", "rank", F.lit(1).alias("_g")
    )
    fold = cosine_topk_bruteforce(emb, k=3).select(
        "vec_id", "neighbor_id", "rank", F.lit(1).alias("_f")
    )
    j = gemm.join(fold, ["vec_id", "neighbor_id", "rank"], "full_outer")
    return j.agg(
        F.sum(F.when(F.col("_g").isNotNull() & F.col("_f").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.sum(F.when(F.col("_f").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_gemm_only"),
        F.sum(F.when(F.col("_g").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_fold_only"),
    )


def q40_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH — the 100 TB
    path (bucket joins, no cross join). "Approximate" means approximate
    w.r.t. exact kNN, NOT non-deterministic: the seeded hyperplanes are
    plan literals and every fold is fixed-order IEEE, so the result is
    a pure function of the data and the oracle re-derives it bit-exactly
    in SQL (same mirror machinery as qd12's streaming ANN — VERDICT r4
    item 3 closed the former rows-only gap)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, k=1, n_planes=8, n_tables=2)


def q103_knn_lsh_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k, Arrow+BLAS execution — driver-checkable parity frame
    (VERDICT r4 item 3 — the former rows-only entry).

    The GEMM path (identical bucket geometry to q40: same hyperplane
    literals, unit vectors + all table buckets from one matmul per
    batch, bucket-local matmul scoring) differs from the fold path only
    in BLAS reduction order, i.e. last-ulp scores — the (vec_id,
    neighbor_id, rank) triples must agree EXACTLY. This frame runs both
    paths and full-outer-joins them on the triple:

    - ``n_pairs``      rows both paths agree on (oracle: the q40 SQL
                       LSH mirror's row count)
    - ``n_gemm_only``  / ``n_fold_only``  symmetric difference
                       (oracle: the identity, 0)

    The driver therefore pins the GEMM execution to the bit-exact SQL
    mirror of the fold path; scores stay out of the hash."""
    from graphsense_blocksci_spark.operators.similarity import (
        cosine_topk_lsh_gemm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    gemm = cosine_topk_lsh_gemm(emb, k=1, n_planes=8, n_tables=2).select(
        "vec_id", "neighbor_id", "rank", F.lit(1).alias("_g")
    )
    fold = cosine_topk_lsh(emb, k=1, n_planes=8, n_tables=2).select(
        "vec_id", "neighbor_id", "rank", F.lit(1).alias("_f")
    )
    j = gemm.join(fold, ["vec_id", "neighbor_id", "rank"], "full_outer")
    return j.agg(
        F.sum(F.when(F.col("_g").isNotNull() & F.col("_f").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.sum(F.when(F.col("_f").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_gemm_only"),
        F.sum(F.when(F.col("_g").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_fold_only"),
    )


def q46_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH +
    exact fixed-order cosine verify (candidate/verify — never
    all-pairs). Bit-exact vs the oracle, which re-derives the same
    seeded hyperplane literals and fold order in SQL."""
    from graphsense_blocksci_spark.operators import embedding_neardup

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, threshold=0.35, n_bands=4, band_planes=4)


def q50_embedding_neardup_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup throughput path — driver-checkable parity frame
    (VERDICT r4 item 3 — the former rows-only entry).

    Same banded-LSH candidates as q46, but bucket-local BLAS matmul
    verification (applyInPandas per bucket — no corpus broadcast).
    BLAS reduction order can move a cosine by an ulp at the threshold
    boundary, so the scored pairs are compared as ID SETS against the
    bit-exact fold path (q46, which the driver verifies against its
    full SQL mirror):

    - ``n_pairs``      pairs both paths emit (oracle: the q46 SQL
                       near-dup mirror's row count)
    - ``n_gemm_only`` / ``n_fold_only``  symmetric difference
                       (oracle: the identity, 0)"""
    from graphsense_blocksci_spark.operators import (
        embedding_neardup,
        embedding_neardup_gemm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    gemm = embedding_neardup_gemm(
        emb, threshold=0.35, n_bands=4, band_planes=4
    ).select("id_a", "id_b", F.lit(1).alias("_g"))
    fold = embedding_neardup(
        emb, threshold=0.35, n_bands=4, band_planes=4
    ).select("id_a", "id_b", F.lit(1).alias("_f"))
    j = gemm.join(fold, ["id_a", "id_b"], "full_outer")
    return j.agg(
        F.sum(F.when(F.col("_g").isNotNull() & F.col("_f").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.sum(F.when(F.col("_f").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_gemm_only"),
        F.sum(F.when(F.col("_g").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_fold_only"),
    )


def q47_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer piece counting — the corpus token-budget
    pass. Pure JVM regex projection; the regex is restricted to
    constructs with identical Java/RE2 semantics so the oracle matches
    cell-exactly."""
    from graphsense_blocksci_spark.operators import bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_count(docs)


def q48_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filters, two shuffle joins on the
    fact keys, revenue agg in integer cents, global top-10 by revenue.
    The customer/orders sides carry their filters into the scans
    (predicate pushdown); the final top-k is TakeOrdered — no global
    sort shuffle."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue_cents = _rev_cents()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_cents).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_cents",
        )
    )


def q49_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full star join — lineitem ⋈ orders ⋈
    customer ⋈ supplier ⋈ nation ⋈ region — with revenue per nation.
    nation/region/supplier are broadcast (small dims); only the
    fact-side joins shuffle. The co-nationality predicate
    (customer and supplier in the same nation) rides on the supplier
    join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue_cents = _rev_cents()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_cents).alias("revenue_cents"))
    )


def q51_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube grouping sets — all 4 (returnflag, linestatus) grouping
    combinations in one pass (SURVEY §2.C grouping row; rollup is q24).
    Spark expands the cube into grouping sets BEFORE the shuffle, so
    it stays one exchange with map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("l_extendedprice")).alias("sum_cents"),
    )


def q52_lead_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered analytics windows beyond row_number: lag/lead deltas and
    a running (unbounded-preceding) sum per user over the events
    stream — one shuffle on user_id, all four windows share the same
    (partition, order) so Spark evaluates them in a single Window node.
    Value sums flow through integer milli-units (exact in both
    engines); event_id is the unique tiebreaker (events carry
    duplicate timestamps)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mills = F.round(F.col("value") * 1000).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        mills.alias("value_mills"),
        F.lag(mills, 1).over(w).alias("prev_value_mills"),
        F.lead(mills, 1).over(w).alias("next_value_mills"),
        F.sum(mills).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("running_mills"),
        F.row_number().over(w).cast("long").alias("event_seq"),
    )


def q53_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations (SURVEY §2.C set-ops row): customers
    active in 1996 INTERSECT 1997 (retained), 1996 EXCEPT 1997
    (churned), and their UNION, tagged — three distinct-set pipelines
    over one orders scan."""
    o = load_table(spark, sf_dir, "orders")

    def custs(year: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    y96, y97 = custs(1996), custs(1997)
    # intersect/subtract are the SQL DISTINCT set ops
    retained = y96.intersect(y97).select(
        "o_custkey", F.lit("retained").alias("cohort")
    )
    churned = y96.subtract(y97).select(
        "o_custkey", F.lit("churned").alias("cohort")
    )
    return retained.unionByName(churned)


def q54_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counting — the cardinality
    sketch a 100 TB profiler runs instead of exact countDistinct
    (which needs a second shuffle on the value). Sketch estimates are
    engine-specific ⇒ rows-only check; the error bound vs exact is
    pytest-gated (test_llm_ops)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q55_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join: lineitem ⋈ orders on the order key with
    the small side replicated per salt — row-for-row equal to the
    plain join (the oracle IS the plain join), aggregated per
    priority so the compared output is stable."""
    from graphsense_blocksci_spark.operators import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("l_extendedprice")).alias("sum_cents"),
    )


def q57_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single global aggregate — the
    query where predicate pushdown does ALL the work (every filter
    reaches the parquet scan; one partial-agg shuffle of one row per
    task). Revenue in integer cents for cross-engine exactness."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue_cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(revenue_cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q58_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional (CASE) aggregation
    — counts split by a predicate on the joined side, per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def q59_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles over integer cents, per
    group — Spark `percentile` ≡ DuckDB `quantile_cont` bit-for-bit on
    integer inputs (both interpolate lower + d·(upper−lower) on the
    sorted values). The exact form needs the full sorted group (one
    shuffle); at 100 TB the profiler swaps in `approx_percentile`
    (KLL/GK sketch, mergeable map-side) and tolerates the rsd — same
    trade as q23/q54 for distinct counts."""
    li = load_table(spark, sf_dir, "lineitem")
    c = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    # ONE percentile aggregate with an array of fractions: a single
    # per-group value buffer + one sort, vs 4 independent buffers for
    # 4 scalar calls (measured ~2x at sf0.1); results bit-identical.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"percentile({c}, array(0.25D, 0.5D, 0.75D, 0.99D))").alias(
                "_ps"
            )
        )
        .select(
            "l_returnflag",
            F.col("_ps")[0].alias("p25"),
            F.col("_ps")[1].alias("p50"),
            F.col("_ps")[2].alias("p75"),
            F.col("_ps")[3].alias("p99"),
        )
    )


def q62_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer — fact
    filter (returnflag), two fact joins, broadcast nation dim, cents
    agg, top-20 customers by lost revenue (TakeOrdered)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue_cents = _rev_cents()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue_cents).alias("lost_cents"))
        .orderBy(F.desc("lost_cents"), F.asc("c_custkey"))
        .limit(20)
    )


def q61_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percentile SCALE path: `approx_percentile` (mergeable
    KLL-style sketch, map-side combinable — no full sort, no whole
    group in memory). Sketch internals are engine-specific ⇒ rows-only
    check; the error bound vs the exact q59 values is pytest-gated."""
    li = load_table(spark, sf_dir, "lineitem")
    c = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"approx_percentile({c}, 0.5, 10000)").alias("p50_approx"),
            F.expr(f"approx_percentile({c}, 0.99, 10000)").alias("p99_approx"),
        )
    )


def q60_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact aggregation (orders whose
    total quantity exceeds a threshold), then joins back to the
    customer dimension — the aggregate-filter-join pattern. The
    aggregation's shuffle partitioning on l_orderkey is reused by the
    orders join (same key, no re-shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        # customer is a LARGE dim at warehouse scale — no broadcast
        # hint; the HAVING-filtered left side is the small one, and
        # AQE picks the build side from runtime sizes
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "total_qty",
        )
    )


def q41_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — binary payload + Arrow-batched mapInPandas
    feature extraction (deterministic md5 fake decode, so the oracle
    verifies the full batch path end-to-end)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "media_id",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
    )


def q56_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing — binary-in/binary-digest-out Arrow
    batches (deterministic md5 fake in place of pixel interpolation,
    so the oracle verifies the full path)."""
    from graphsense_blocksci_spark.operators import resize_image

    docs = load_table(spark, sf_dir, "documents")
    return resize_image(attach_payload(docs), width=64, height=64)


def q42_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-offset sampling — JVM-side sequence explode."""
    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(docs), every_n_bytes=64)
    return frames.select(
        "media_id", F.col("frame_no").cast("long").alias("frame_no"), "offset"
    )


def _supplier_chain_edges(li: DataFrame) -> DataFrame:
    """Co-occurrence edges for the graph queries: consecutive distinct
    suppliers within each early-window order (CHAIN, not clique —
    same components, O(k) not O(k²) edges per group)."""
    nodes = (
        li.filter(F.col("l_shipdate") < F.lit("1995-03-01").cast("timestamp"))
        .select(F.col("l_orderkey").alias("g"), F.col("l_suppkey").alias("node"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("node")
    chain = (
        nodes.select("g", "node", F.lead("node").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
    )
    return chain.select(F.col("node").alias("src"), F.col("nxt").alias("dst"))


def q63_entity_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-input entity clustering — GraphSense's defining downstream
    analytic (the reference exports the co-spend inputs this graph is
    built from, blocksci_export.py:348-349; clustering is the
    connected component of the co-occurrence graph).

    Testdata analog: suppliers co-occurring in one early-window order
    are one entity. Edges are the CHAIN of sorted distinct members per
    group, not the clique — same components, O(k) instead of O(k²)
    edges per group, which is what keeps a 100-input coinjoin (or a
    1000-lineitem order) from quadratic blowup.

    Components via alternating large-star/small-star (O(log n)
    rounds, 2 shuffles/round — operators/graph.py); oracle via DuckDB
    recursive-CTE min-label propagation.
    """
    from graphsense_blocksci_spark.operators.graph import connected_components

    li = load_table(spark, sf_dir, "lineitem")
    cc = connected_components(_supplier_chain_edges(li))
    return cc.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


def q64_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group join-back (the supplier achieving
    the minimum price per part). Expressed as a window min — ONE
    shuffle on l_partkey — instead of the textbook agg + self-join,
    which would shuffle the fact table twice for the same answer."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    e = li.select(
        F.col("l_partkey").cast("long").alias("l_partkey"),
        F.col("l_suppkey").cast("long").alias("l_suppkey"),
        _cents("l_extendedprice").alias("cents"),
    ).withColumn("min_cents", F.min("cents").over(w))
    return (
        e.filter(F.col("cents") == F.col("min_cents"))
        .select("l_partkey", "l_suppkey", "min_cents")
        .distinct()
    )


def q65_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join then aggregate — order count
    per priority among orders with at least one returned line. The
    semi-join outputs only left columns, so no dedup step is needed
    and the probe side never widens."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q66_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + double aggregation — how
    many customers placed exactly k non-urgent orders, including the
    zero-order customers the outer join preserves. Two shuffles
    (custkey, then the tiny count key); the second groupBy is on a
    near-constant-cardinality key, which AQE coalesces."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q67_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-CASE revenue ratio in one pass —
    promo share of revenue for a one-month window. The part dim is
    broadcast; the ratio is a single IEEE division of two exact
    bigint-cents sums, so it is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0))
        ).alias("promo_cents"),
        F.sum(_rev_cents()).alias("total_cents"),
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        (
            F.col("promo_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("promo_share"),
    )


def q68_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: anti-join exclusion + distinct aggregation —
    distinct suppliers per (brand, size) bucket, excluding the
    "complaint" suppliers (negative balance). The exclusion list is
    tiny → broadcast anti-join; countDistinct expands to a two-phase
    partial-distinct aggregate (map-side dedup before the shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q69_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate predicate — revenue
    from lines whose quantity is under 20% of the part's average. The
    per-part (count, sum) aggregate re-joins on the SAME key as its
    groupBy shuffle (no second exchange), and the 20%-of-average test
    is done in integer math (5·qty·cnt < sum_qty) so both engines
    agree exactly — no double division anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    j = li.join(stats, "l_partkey")
    small = j.filter(
        F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt")
        < F.col("sum_qty")
    )
    return small.agg(F.sum(_cents("l_extendedprice")).alias("small_qty_cents"))


def q70_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery + anti-join — customers
    with above-average balance and no RECENT orders, grouped by
    nation (the testdata's uniform order spread means every customer
    has *some* order, so "recent" stands in for Q22's 7-year gap).
    The global average is compared in exact integer math
    (bal_cents · n_pos > sum_pos_cents), the single-row stats frame is
    broadcast, and the orders anti-join is the only big shuffle."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", _cents("c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("bal_cents").alias("sum_pos_cents"),
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos_cents")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_cents").alias("totacctbal_cents"),
    )


def q71_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup — the composition a real 100 TB curation
    pipeline runs: MinHash-LSH candidates → exact Jaccard verify →
    connected components over the surviving pairs → one canonical
    keeper per near-dup cluster (minimum doc id). Docs in no cluster
    keep themselves.

    Every stage is an already-oracled operator (q36 → q38 → q63's
    machinery); this query pins their composition. Scale shape: the
    pair graph is tiny relative to the corpus (only verified near-dup
    edges), so the iterative CC runs on the small frame while the
    corpus is touched exactly twice (shingle pass + final keeper join).
    """
    from graphsense_blocksci_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    cc = connected_components(pairs, src="id_a", dst="id_b")
    d = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    return (
        d.join(cc, d.doc_id == cc.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
        )
        .withColumn("is_keeper", F.col("doc_id") == F.col("canonical_id"))
    )


def q72_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language training mix: downsample English to
    25%, keep half of de/fr/es, drop zh — each row's fate a pure
    function of md5(doc_id), so retries, backfills and the oracle
    agree row-for-row (operators/sampling.py; `rand()` could never
    pass this gate)."""
    from graphsense_blocksci_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.5}
    return hash_sample(docs, "doc_id", rate_by=rates, stratum_col="lang").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


def q73_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/20 held-out split keyed on doc id — group-safe (all
    rows of a key land on one side) and reproducible across engines
    and re-runs, unlike randomSplit."""
    from graphsense_blocksci_spark.operators.sampling import train_test_split

    docs = load_table(spark, sf_dir, "documents")
    return train_test_split(docs, "doc_id", test_frac=0.2).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "split"
    )


def q74_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-based sessionization — `F.session_window` (the batch
    face of the streaming session operator): events within 12 h of the
    previous event merge into one session; the window closes at
    last_event + gap. One shuffle on (user, session); Spark's native
    operator replaces the lag/cumsum island idiom (q21) with a
    first-class plan node that also runs unchanged on a stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "12 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_mills"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_mills",
        )
    )


def q75_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): revenue cents per return flag, one column
    per line status. The pivot values are DECLARED (['F','O']) — at
    100 TB the values-unknown form would run an extra distinct job
    over the fact table just to learn the column set; declaring them
    keeps the pivot a single pass (it compiles to the same conditional
    aggregation the oracle spells out)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_cents("l_extendedprice")))
        .select(
            "l_returnflag",
            F.col("F").alias("cents_f"),
            F.col("O").alias("cents_o"),
        )
    )


def q76_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time windows — `F.window(ts, 1 day, 12 h)`:
    every event lands in width/hop = 2 overlapping windows. The
    explode is plan-native (no self-join); epoch-aligned window starts
    match the oracle's integer arithmetic exactly. Same operator runs
    on a stream with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_mills"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "sum_mills",
        )
    )


def q77_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation shipping volume — a 6-table join
    where the same dimension (nation) enters TWICE under different
    roles (customer's vs supplier's), with a symmetric OR pair
    predicate and a per-year rollup. Tiny dims (nation, supplier) are
    broadcast; customer is NOT — at warehouse scale it's a large
    dimension, so its join stays shuffle-eligible and AQE broadcasts
    only when the runtime size allows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.s_nkey)
        .filter(
            (
                (F.col("cust_nation") == "NATION_1")
                & (F.col("supp_nation") == "NATION_2")
            )
            | (
                (F.col("cust_nation") == "NATION_2")
                & (F.col("supp_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "cust_nation",
        "supp_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(F.sum(_rev_cents()).alias("revenue_cents"))


def q78_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — one nation's fraction of a
    region's yearly revenue for one part type. The share is a single
    IEEE division of two exact bigint-cents sums per year (conditional
    numerator inside the same aggregate pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    sn = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.c_nkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), cn.c_rkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.s_nkey)
    )
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_2", _rev_cents()).otherwise(
                F.lit(0)
            )
        ).alias("nation_cents"),
        F.sum(_rev_cents()).alias("total_cents"),
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        (
            F.col("nation_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("mkt_share"),
    )


def q79_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: global-max join-back — the supplier(s) whose
    quarterly revenue equals the maximum. The revenue aggregate is
    computed ONCE; its single-row max is broadcast back onto it (no
    second scan of the fact table, no correlated re-aggregation)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_revenue_cents")
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("_mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue_cents") == F.col("_mx")
    )
    return top.join(F.broadcast(s), top.supplier_no == s.s_suppkey).select(
        F.col("supplier_no").cast("long").alias("supplier_no"),
        "s_name",
        "total_revenue_cents",
    )


def q80_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across a broadcast join —
    three brand/size/quantity clause groups that Catalyst must keep
    partially pushable (the common `p_partkey = l_partkey` stays an
    equi-join; per-clause residuals evaluate post-join in one codegen
    stage, not as three unioned scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (qty >= 20) & (qty <= 30))
    )
    return j.filter(clause).agg(
        F.sum(_rev_cents()).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q81_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: layered semi + anti self-joins — suppliers
    whose returned line is the ONLY return in a multi-supplier order.
    Three derived views of the same fact scan (returned lines,
    other-supplier lines, other-supplier returns) meet in a left-semi
    then a left-anti join with a key inequality; the final count per
    supplier ranks the repeat offenders."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey", "l_linenumber"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2,
        (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
        "left_semi",
    ).join(
        l3,
        (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3),
        "left_anti",
    )
    return waiting.groupBy(F.col("l_suppkey").cast("long").alias("l_suppkey")).agg(
        F.count(F.lit(1)).alias("numwait")
    )


def q82_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: top-200 tokens by frequency with a
    total (tf desc, token asc) tie-break — map-side partial counts
    keep the shuffle |vocab|-sized (operators/text_analysis.py)."""
    from graphsense_blocksci_spark.operators.text_analysis import vocabulary

    docs = load_table(spark, sf_dir, "documents")
    return vocabulary(docs, top_n=200)


def q83_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token tf/df statistics (the exact-integer core of TF-IDF):
    df via per-document dedup BEFORE the shuffle, so no distinct-count
    state (operators/text_analysis.py)."""
    from graphsense_blocksci_spark.operators.text_analysis import doc_frequency

    docs = load_table(spark, sf_dir, "documents")
    return doc_frequency(docs, min_df=5)


def q84_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the q63 co-occurrence graph —
    the weighted-iteration representative (rank mass flows along
    edges; one co-located join + one aggregate shuffle per round).

    Driver-checkable invariant frame (VERDICT r4 item 3 — the former
    rows-only entry): per-node double sums are partition-order
    dependent, so per-node values stay pytest-gated against a dense
    numpy reference; what IS hash-exact is the conservation law plus
    the SQL-derivable graph shape the rank vector must respect:

    - ``n_nodes``      rank rows (oracle: distinct chain-graph nodes)
    - ``n_dangling``   nodes with no out-edge, whose mass the
                       correction redistributes (oracle: dst-only
                       nodes of the directed chain edge set)
    - ``mass_e6``      round(sum(rank) * 1e6) — dangling-corrected
                       PageRank conserves total mass 1 to ~1e-13, so
                       the integer is exactly 1_000_000 (oracle: the
                       identity)
    - ``n_nonpos``     nodes with rank <= 0 — teleport gives every
                       node strictly positive mass (oracle: 0)"""
    from graphsense_blocksci_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = _supplier_chain_edges(li)
    pr = pagerank(edges, iterations=10)
    mass = pr.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.sum("rank") * F.lit(1e6)).cast("long").alias("mass_e6"),
        F.sum(F.when(F.col("rank") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpos"),
    )
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).distinct()
    dangling = (
        e.select(F.col("dst").alias("node"))
        .union(e.select(F.col("src").alias("node")))
        .distinct()
        .join(e.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_dangling"))
    )
    return mass.crossJoin(dangling).select(
        "n_nodes", "n_dangling", "mass_e6", "n_nonpos"
    )


def q85_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per user, the
    trailing-24h event count and sum — the frame is defined on the
    event-TIME axis (86400-second lookback on epoch seconds), so ties
    and gaps behave by time, unlike the ROWS frames of q52. Epoch
    seconds (floored) are the frame key in BOTH engines, which keeps
    sub-second precision out of the boundary arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts")).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_id",
        sec.alias("ts_sec"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.round(F.col("value") * 1000).cast("long")).over(w).alias(
            "mills_24h"
        ),
    )


def q86_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup are sugar
    for): three chosen aggregation levels in ONE pass over the fact
    table — (flag,status), (flag), and grand total, but NOT (status)
    — something neither rollup nor cube can express. Spark expands it
    to a single Expand + one aggregate (no re-scan per level)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


def q87_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection: synchronized deterministic LPA over the
    q63 co-occurrence graph — 3 fixed rounds of most-frequent-neighbor
    label with min-label tie-break (operators/graph.py). Because every
    update is deterministic, the output is exact integers and the
    DuckDB oracle can unroll the same 3 rounds (join → count → ranked
    pick per round) for a hash-exact compare — rare for a graph
    heuristic, impossible for the async-random original."""
    from graphsense_blocksci_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    return label_propagation(_supplier_chain_edges(li), iterations=3).select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


def q88_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted: testdata ships no partsupp, so the
    supplycost term is proxied by p_retailprice — the join/agg shape
    (part-name filter, 5-table join, line-level profit amount, group
    by supplier nation × order year) is Q9's. Amount is exact integer
    cents on both engines. The two fact tables join on orderkey
    (shuffle); part/supplier/nation are broadcast-size dims AQE picks
    up from runtime stats."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev_cents() - _cents("p_retailprice") * F.col("l_quantity").cast(
        "long"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_cents"))
    )


def q89_national_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value for ONE nation's
    suppliers, kept only when above a 1/1000 fraction of that
    nation's total — the group-vs-global-scalar HAVING. The global
    total is a single-row aggregate crossJoined (broadcast) onto the
    per-part rows; the fraction test is integer-exact
    (value*1000 > total), so no float threshold ambiguity."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").cast("long").alias("l_partkey"))
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("_total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("_total"))
        .select("l_partkey", "value_cents")
    )


def q90_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape, adapted: with no partsupp availqty, the
    "stocked more than half of shipped" test becomes supplier
    dominance — a (supplier, part) pair that shipped MORE THAN HALF of
    the part's total 1996 volume (2*sq > tq, integer-exact). Nested
    aggregate (per-pair sums, then a per-part window total on the
    already-aggregated rows) → dominant suppkeys → semi-join up to
    supplier/nation names, pruning the part dim before the fact
    join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    q = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sq"))
    )
    tq = F.sum("sq").over(Window.partitionBy("l_partkey"))
    dominant = (
        q.withColumn("tq", tq)
        .filter(F.col("sq") * 2 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
    )


def qd15_address_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-address UTXO ledger over the real fixture chain: received
    (exploded outputs), spent (inputs resolved through the B1 linkage
    join), balance — the address summary GraphSense's transformation
    stage computes downstream of the reference's export. Multisig
    renders as one '|'-joined identity per output slot; no-address
    outputs stay out of the ledger on both sides."""
    from graphsense_blocksci_spark.operators.linkage import address_balances

    _, raw_txs, _ = _fixture_frames(spark)
    b = address_balances(raw_txs)
    return b.select(
        "addr",
        F.col("n_received").cast("long").alias("n_received"),
        F.col("received_value").cast("long").alias("received_value"),
        F.col("n_spent").cast("long").alias("n_spent"),
        F.col("spent_value").cast("long").alias("spent_value"),
        F.col("balance").cast("long").alias("balance"),
    )


def qd16_cospend_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE GraphSense analytic, on the real fixture chain: multi-input
    co-spend clustering. Addresses appearing as inputs of one
    transaction are one entity; entities are connected components of
    the co-spend graph (blocksci_export.py:348-349 exports exactly the
    inputs this graph is built from). Chain edges per tx (O(k), not
    the O(k²) clique), node ids via the 28-bit md5 hash both engines
    share, star-contraction components, singleton inputs kept as their
    own entity. Returns (addr, entity)."""
    from graphsense_blocksci_spark.operators.graph import connected_components
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    ia = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select("tx_id", F.concat_ws("|", "inp.address").alias("addr"))
        .distinct()
    )
    nodes = ia.select("tx_id", "addr", hash28(F.col("addr")).alias("node"))
    w = Window.partitionBy("tx_id").orderBy("addr")
    chain = (
        nodes.select(
            F.col("node").alias("src"), F.lead("node").over(w).alias("dst")
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
    cc = connected_components(chain)
    return (
        nodes.select("addr", F.col("node").alias("_n"))
        .distinct()
        .join(cc, F.col("_n") == cc.node, "left")
        .select(
            "addr",
            F.coalesce("component", F.col("_n")).cast("long").alias("entity"),
        )
        .distinct()
    )


def qd17_entity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSense's entity (cluster) statistics table: the qd15
    address ledger rolled up to qd16 co-spend entities — per entity:
    member addresses, totals received/spent, balance. Output-only
    addresses (never spent from, so never co-spent) are their own
    singleton entity via the same shared 28-bit hash. This is the
    composition the transformation stage publishes as `cluster`."""
    from graphsense_blocksci_spark.operators.linkage import address_balances
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    bal = address_balances(raw_txs)
    ent = qd16_cospend_entities(spark, sf_dir)
    return (
        bal.join(ent, "addr", "left")
        .select(
            F.coalesce("entity", hash28(F.col("addr"))).alias("entity"),
            "addr",
            "n_received",
            "received_value",
            "spent_value",
            "balance",
        )
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_addresses"),
            F.sum("n_received").alias("n_received"),
            F.sum("received_value").alias("received_value"),
            F.sum("spent_value").alias("spent_value"),
            F.sum("balance").alias("balance"),
        )
    )


def q91_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (n-gram-overlap hygiene, GPT-3
    appendix C / The Pile): eval set = every 20th doc_id; per training
    doc, the count of distinct word-trigram shingle hashes shared with
    any eval doc. Eval shingles broadcast (eval suites are KBs vs a
    TB corpus); only the per-doc counts shuffle."""
    from graphsense_blocksci_spark.operators.text_dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    return decontaminate(docs.filter(~is_eval), docs.filter(is_eval)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_shared_shingles").cast("long").alias("n_shared_shingles"),
    )


def q92_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021
    A1.1): per-doc token totals, top-token count, 2-gram totals and
    duplicate-2-gram fraction — explode → partial-count → re-aggregate,
    no interpreted HOF over non-cheap closures, no Python."""
    from graphsense_blocksci_spark.operators.text_analysis import (
        repetition_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs)


def q93_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one window: dense_rank,
    percent_rank, cume_dist, ntile(4) over a TOTAL order (cents DESC,
    key ASC — ties broken, so every engine agrees bit-for-bit; the
    two fractional ranks are the same integer ratio on both sides).
    One window spec → one shuffle + one sort for all four."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderpriority",
        _cents("o_totalprice").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cents").desc(), "o_orderkey"
    )
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("tile"),
    )


def q94_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    top-2 suppliers by balance per nation, expressed as the SQL
    LATERAL form rather than a window (the planner decorrelates it;
    the window formulation q08/q22 stays the scale recommendation,
    this pins the LANGUAGE surface)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("q94_nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "q94_supplier"
    )
    return spark.sql(
        """
        SELECT n_name, s_suppkey, acct_cents
        FROM q94_nation, LATERAL (
            SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
                   CAST(round(s_acctbal * 100) AS BIGINT) AS acct_cents
            FROM q94_supplier
            WHERE s_nationkey = n_nationkey
            ORDER BY acct_cents DESC, s_suppkey
            LIMIT 2
        )
        """
    )


def q95_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: generate the full day spine between the
    corpus min/max event dates (F.sequence + explode — no driver
    collect for the bounds; they ride a 1-row crossJoin) and left-join
    daily counts so silent days surface as explicit zeros — the
    standard pre-step for gap-sensitive time series work."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias("d")
    )
    counts = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return spine.join(counts, "d", "left").select(
        F.col("d").cast("timestamp").alias("d"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def q96_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two deterministic versions of
    the orders table (sliding year window + a price bump on urgent
    orders): added / removed / changed per key, one full-outer join.
    The engine compares a 64-bit row hash; the oracle compares the
    raw values — identical classification (modulo a 2^-64 collision,
    the standard content-hash trade)."""
    from graphsense_blocksci_spark.operators.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        _cents("o_totalprice").alias("cents"),
        F.year("o_orderdate").alias("_y"),
        "o_orderpriority",
    )
    old = o.filter(F.col("_y").between(1995, 1997)).select("o_orderkey", "cents")
    new = o.filter(F.col("_y").between(1996, 1998)).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("cents"),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


def q97_hll_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable DataSketches HLL: per-day distinct-user sketches
    (F.hll_sketch_agg) with per-day estimates — the re-aggregatable
    form of approx_count_distinct. At scale the BINARY sketch column
    is what you persist: any date window re-aggregates via
    hll_union_agg without touching raw events (the classic
    pre-aggregation pattern exact distinct counts cannot support).
    Rows-only in the registry (estimator output); the union path and
    error bounds are pytest-gated against exact counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("_sk"))
        .select(
            F.col("d").cast("timestamp").alias("d"),
            F.hll_sketch_estimate("_sk").cast("long").alias("est_users"),
        )
    )


def q98_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining batches:
    every document learns its global token offset (stable doc_id
    order) and the span of 256-token training sequences it falls in.
    Distributed two-phase prefix sum — the only sequential step runs
    over n_buckets rows, not the corpus (operators/packing.py)."""
    from graphsense_blocksci_spark.operators.packing import sequence_packing
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    return sequence_packing(counted, budget=256).select(
        "doc_id",
        "n_tokens",
        F.col("offset").alias("tok_offset"),
        "start_bin",
        "end_bin",
    )


def q104_packed_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized sequence packing: q98's offsets expanded to the
    per-sequence slice list a training-batch writer consumes — one row
    per (sequence bin, document) segment with the in-document slice
    start and length. Every bin's slice lengths sum to the 256-token
    budget (except the final bin); all integer arithmetic, so the
    oracle reproduces it exactly. Scale shape: the explode emits
    ~n_tokens/budget + 1 rows per doc (bounded fan-out), and the
    output is already partitionable by bin for the downstream
    writer."""
    from graphsense_blocksci_spark.operators.packing import sequence_packing
    from graphsense_blocksci_spark.operators.textops import tokens

    budget = 256
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    pack = sequence_packing(counted, budget=budget)
    seg = pack.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "offset",
        "n_tokens",
        F.explode(F.sequence("start_bin", "end_bin")).alias("bin"),
    )
    lo = F.greatest(F.col("bin") * budget, F.col("offset"))
    hi = F.least(
        (F.col("bin") + 1) * budget, F.col("offset") + F.col("n_tokens")
    )
    return seg.select(
        F.col("bin").cast("long").alias("bin"),
        "doc_id",
        (lo - F.col("offset")).cast("long").alias("slice_start"),
        (hi - lo).cast("long").alias("slice_len"),
    )


def q99_unigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (CCNet-style ordering signal) in
    exact-rational form: mean relative corpus frequency per document —
    integer tf sums until one final division, because ln() differs in
    the last ulp between JVM and DuckDB libm and would fail the
    bit-exact gate (operators/text_analysis.py:unigram_likelihood)."""
    from graphsense_blocksci_spark.operators.text_analysis import (
        unigram_likelihood,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_likelihood(docs)


def q100_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate detection: word 3-grams present in >= 1% of
    documents are boilerplate; each doc reports its boilerplate
    shingle fraction (RefinedWeb/C4-style cleanup signal). Integer df
    threshold (df*100 >= pct*n_docs) — no float in the set decision."""
    from graphsense_blocksci_spark.operators.text_analysis import (
        boilerplate_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngrams(docs, df_pct=1)


def q101_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between language strata — the
    mixing/contamination diagnostic for multi-source training data.
    One distinct (lang, token) aggregate + vocab-sized self-join."""
    from graphsense_blocksci_spark.operators.text_analysis import vocab_overlap

    docs = load_table(spark, sf_dir, "documents")
    return vocab_overlap(docs, group_col="lang")


def qd19_entity_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSense's entity-graph edge table (the transformation
    stage's entity_{incoming,outgoing}_relations): one row per
    (spending entity → receiving entity) pair with transaction count,
    output count and total value moved. All inputs of a tx are one
    co-spend entity BY CONSTRUCTION (qd16 clusters exactly that
    graph), so the per-tx source entity is well-defined (min() is the
    deterministic representative); receiving entities fall back to
    the same singleton hash qd17 uses for output-only addresses.
    Self-edges (change back to the spender) are kept — consumers
    filter them per use case. Scale shape: two entity joins on the
    uniform addr key + one (src,dst)-keyed aggregate; the per-tx src
    frame is tx-count-sized, not output-count-sized."""
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    ent = qd16_cospend_entities(spark, sf_dir)
    ia = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select("tx_id", F.concat_ws("|", "inp.address").alias("addr"))
        .distinct()
    )
    src = (
        ia.join(ent, "addr")
        .groupBy("tx_id")
        .agg(F.min("entity").alias("src_entity"))
    )
    outs = (
        raw_txs.select("tx_id", F.explode("outputs").alias("out"))
        .filter(F.size("out.address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "out.address").alias("addr"),
            F.col("out.value").alias("value"),
        )
    )
    dst = outs.join(ent, "addr", "left").select(
        "tx_id",
        F.coalesce("entity", hash28(F.col("addr"))).alias("dst_entity"),
        "value",
    )
    return (
        src.join(dst, "tx_id")
        .groupBy("src_entity", "dst_entity")
        .agg(
            F.countDistinct("tx_id").cast("long").alias("n_txs"),
            F.count(F.lit(1)).cast("long").alias("n_outputs"),
            F.sum("value").cast("long").alias("total_value"),
        )
        .select(
            F.col("src_entity").cast("long").alias("src_entity"),
            F.col("dst_entity").cast("long").alias("dst_entity"),
            "n_txs",
            "n_outputs",
            "total_value",
        )
    )


def qd20_incremental_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity clustering — the daily-delta pattern: the
    chain's first half is clustered into PRIOR labels, the second
    half's co-spend edges are merged in via
    `incremental_components` (prior labels re-enter as star-forest
    edges), and the result must equal reclustering the FULL history —
    which is exactly what the oracle computes (one recursive CTE over
    all edges). At scale this is the difference between touching
    |entities| + |today's edges| rows and re-reading years of chain."""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
        incremental_components,
    )
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    ia = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select("tx_id", F.concat_ws("|", "inp.address").alias("addr"))
        .distinct()
    )
    nodes = ia.select("tx_id", "addr", hash28(F.col("addr")).alias("node"))
    w = Window.partitionBy("tx_id").orderBy("addr")
    chain = nodes.select(
        "tx_id", F.col("node").alias("src"), F.lead("node").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    cut = raw_txs.agg((F.max("tx_id") / 2).cast("long")).first()[0]
    prior = connected_components(chain.filter(F.col("tx_id") <= cut))
    inc = incremental_components(prior, chain.filter(F.col("tx_id") > cut))
    return inc.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


def qd21_streaming_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming entity clustering: co-spend edges arrive as a file
    stream (one micro-batch per file), and a `foreachBatch` sink folds
    each batch into the running entity labels via
    `incremental_components` — the streaming form of the daily-delta
    pattern qd20 proves in batch. Because components are labeled by
    MINIMUM member, the final labels are invariant to how the stream
    was batched, so this multi-batch stateful pipeline still has an
    EXACT oracle: one recursive CTE over all edges. Label versions are
    written append-only per batch (no overwrite-while-reading hazard);
    the latest version is the answer."""
    import tempfile

    from graphsense_blocksci_spark.operators.graph import (
        incremental_components,
    )
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    ia = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select("tx_id", F.concat_ws("|", "inp.address").alias("addr"))
        .distinct()
    )
    nodes = ia.select("tx_id", "addr", hash28(F.col("addr")).alias("node"))
    w = Window.partitionBy("tx_id").orderBy("addr")
    chain = nodes.select(
        "tx_id", F.col("node").alias("src"), F.lead("node").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    work = tempfile.mkdtemp(prefix="gbs_sclust_")
    chain.repartitionByRange(4, "tx_id").write.mode("overwrite").parquet(
        f"{work}/src"
    )
    stream = (
        spark.readStream.schema("tx_id long, src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/src")
    )
    versions: list[int] = []

    def step(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if versions:
            prior = sess.read.schema("node long, component long").parquet(
                f"{work}/labels_v{versions[-1]}"
            )
        else:
            prior = sess.createDataFrame([], "node long, component long")
        merged = incremental_components(prior, batch_df)
        merged.write.mode("overwrite").parquet(f"{work}/labels_v{batch_id}")
        versions.append(batch_id)

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema("node long, component long")
        .parquet(f"{work}/labels_v{versions[-1]}")
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("component").cast("long").alias("component"),
        )
    )


def q102_netpbm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each document's text bytes are
    framed as an 8x6 binary-P6 image (header + text tiled to the
    144-byte raster, built JVM-side), decoded by the numpy NetPBM
    parser in Arrow batches (operators/multimodal.py:decode_image),
    yielding exact integer pixel sums. The oracle re-derives the sums
    as ASCII code-point sums of the same tiled text; both sides filter
    to non-empty pure-ASCII docs (length == octet_length) so byte ==
    code point holds by construction rather than by corpus accident.
    The parser, poison-payload path and resize are additionally
    pytest-pinned against hand-built images."""
    from graphsense_blocksci_spark.operators.multimodal import decode_image
    from graphsense_blocksci_spark.operators.textops import spread

    w, h = 8, 6
    need = w * h * 3
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    # tile the text to the raster budget; pure-ASCII rows -> 1 byte/char
    # (floor, not cast-truncate, so the oracle's semantics are identical)
    raster_txt = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(need) / F.length("text")).cast("int") + 1,
        ),
        1,
        need,
    )
    media = spread(docs).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(
            F.encode(F.lit(f"P6\n{w} {h}\n255\n"), "utf-8"),
            F.encode(raster_txt, "utf-8"),
        ).alias("payload"),
    )
    return decode_image(media).filter(F.col("decode_ok")).select(
        "media_id", "width", "height", "channels", "n_pixels", "px_sum"
    )


def qd18_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator under the correctness
    gate: gap-based sessionization via applyInPandasWithState
    (streaming/stateful.py), driven availableNow over the events table
    staged as a file stream. A single micro-batch makes the closed-
    session set exactly oracle-able: it equals batch sessionization
    minus each user's (still open) final session. Cross-batch state
    carry is pytest-gated (tests/test_streaming.py); this entry pins
    the operator's end-to-end plumbing and semantics vs SQL."""
    import tempfile

    from graphsense_blocksci_spark.streaming.stateful import sessionize_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
    )
    work = tempfile.mkdtemp(prefix="gbs_ssess_")
    ev.write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("user_id long, ts_epoch long").parquet(
        f"{work}/src"
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema(
            "user_id long, session_start long, session_end long, n_events long"
        )
        .parquet(f"{work}/out")
        .select("user_id", "session_start", "session_end", "n_events")
    )


def q107_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval per fixture query (rational-idf variant —
    ln() is not bit-portable across engines; see
    operators/retrieval.py docstring). Per-(query,doc) score is a
    term-sorted left fold of per-term doubles, so the oracle
    (list_reduce(list_prepend(0.0, list_sort(...)))) is bit-exact."""
    from graphsense_blocksci_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, k=10)


def q109_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced multilingual sampling (mT5/XLM-R mixing,
    T=2, budget 50%) over the documents table stratified by lang:
    per-stratum rate min(1, budget*p_l/share_l) with p_l ∝
    sqrt(share_l), keep = hash28(doc_id) under rate
    (operators/sampling.py:temperature_sample). sqrt is correctly
    rounded IEEE so the whole chain is bit-exact cross-engine."""
    from graphsense_blocksci_spark.operators.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_sample(
        docs, stratum_col="lang", key_col="doc_id", temperature=2.0,
        budget_frac=0.5,
    )


def q108_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: linear classifier over
    feature-hashed token counts with derivation-defined integer
    milli-weights (operators/text_analysis.py:quality_classifier) —
    the logit is an order-free integer sum, so the oracle re-derives
    the identical model from the md5 weight derivation. One explode +
    one per-doc aggregate; the cheapest 100 TB classifier sweep."""
    from graphsense_blocksci_spark.operators.text_analysis import (
        quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quality_classifier(docs)


def qd22_fiat_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exchange_rates map column put to work (schema.cql:58-61,
    map<text,float> fiat_values; CHANGELOG.md:10,44-45): every
    transaction's total output converted into EVERY fiat currency by
    exploding the as-of-joined rate map — value/1e8 * rate per entry,
    two IEEE double ops in fixed order so the DuckDB oracle
    (ASOF JOIN + unnest(map_entries)) is bit-exact. Scale shape: the
    rate series is a tiny global table (broadcast as-of, tx side never
    shuffled); the explode fan-out is |currencies| per tx."""
    from graphsense_blocksci_spark.plans.ingest import (
        exchange_rates_table,
        transaction_table,
        transactions_with_rates,
    )

    _, raw_txs, raw_rates = _fixture_frames(spark)
    txs = transaction_table(raw_txs).select("tx_id", "timestamp", "total_output")
    rated = transactions_with_rates(txs, exchange_rates_table(raw_rates))
    conv = rated.select(
        "tx_id",
        "total_output",
        F.explode("fiat_values").alias("currency", "rate_f"),
    )
    return conv.select(
        "tx_id",
        "currency",
        F.col("rate_f").cast("double").alias("rate"),
        F.col("total_output").alias("value_satoshi"),
        (
            F.col("total_output").cast("double") / F.lit(100000000.0)
            * F.col("rate_f").cast("double")
        ).alias("fiat_value"),
    )


def q106_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL greedy BPE/WordPiece merge application over the fixture
    vocabulary (operators/text_analysis.py:bpe_encode): max-munch
    segmentation of every whitespace word, actual emitted-token and
    unknown-fallback counts per document. The oracle re-derives the
    identical segmentation in SQL (match-length table + recursive
    walk over the SAME vocab literals) — all integers, bit-exact;
    additionally parity-pytested against a plain Python tokenizer
    loop (tests/test_llm_ops.py)."""
    from graphsense_blocksci_spark.operators.text_analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode(docs)


def q105_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2022 ExactSubstr
    modality, distributed): char-50-gram position hashes -> hashes in
    >= 2 distinct docs -> per-doc maximal duplicated spans via
    gaps-and-islands (operators/text_dedup.py:substring_dedup). The
    oracle re-derives the identical 60-bit md5-prefix hashes and the
    same island merge, so every span length is bit-exact."""
    from graphsense_blocksci_spark.operators.text_dedup import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(docs, k=50)


def q110_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means E-step with deterministic seed centroids
    (the k=10 smallest vec_ids): nearest centroid per embedding by
    fixed-order squared-L2 fold, ties to the smaller cid
    (operators/clustering.py:kmeans_assign). Centroid side is k·dim
    doubles and broadcast; assignment is one corpus scan, no shuffle.
    Cell-exact: the oracle re-derives the identical left-associated
    (e[i]-c[i])^2 sums."""
    from graphsense_blocksci_spark.operators.clustering import (
        kmeans_assign,
        seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, seed_centroids(emb, k=10))


def q111_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five Lloyd iterations from the deterministic seed, in EXACT
    integer arithmetic (operators/clustering.py:
    kmeans_lloyd_quantized): coordinates quantize once to 1e6-scaled
    int64, E-step distances are integer sums, the M-step centroid is
    the truncated integer mean (DIV ≡ DuckDB //), ties break on
    centroid id — so the full iterative fixpoint is cell-exact
    oracle-able (the round-7 rows-only gap, closed). Same plan shape
    as the float twin: broadcast E-step projection (zero shuffle) +
    one groupBy(cluster) M-step per round (dim fixed-width integer
    agg columns, map-side partials, no explode), bounded k×dim
    centroid collect between rounds. The float twin remains
    numpy-parity pytest-gated (tests/test_clustering.py); a pytest
    pins the quantized assignment against it."""
    from graphsense_blocksci_spark.operators.clustering import (
        kmeans_lloyd_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd_quantized(emb, k=10, n_iter=5)


def q112_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic pruning: deterministic
    E-step clustering, then within each cluster drop every vector
    with a smaller-id twin at cosine >= 0.35
    (operators/clustering.py:semdedup). Pairing cost is sum of
    squared CLUSTER sizes, never corpus² — the paper's scale
    argument; deterministic end-to-end so the whole composition is
    cell-exact oracle-able, unlike banded-LSH near-dup (q46) which
    trades determinism of candidate recall for hash locality."""
    from graphsense_blocksci_spark.operators.clustering import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, k=10, threshold=0.35)


def q113_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token sliding-window chunking (64-token windows, stride
    48 — HF `return_overflowing_tokens` semantics) over the documents
    table (operators/chunking.py). Pure per-row projection, zero
    shuffles, all-integer chunk arithmetic -> cell-exact oracle."""
    from graphsense_blocksci_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=64, stride=48)


def _dirty_documents(docs: DataFrame) -> DataFrame:
    """Deterministic PII augmentation for the redaction fixture: the
    synthetic corpus contains no URLs/emails/digits (verified — a
    redaction query on raw text would pass trivially), so each doc
    gets doc_id-derived PII appended IDENTICALLY in Spark and the
    oracle; the regex machinery is then exercised for real."""
    did = F.col("doc_id").cast("string")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did,
            F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".com visit https://host"), did,
            F.lit(".example/p/"), did,
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" acct "),
            (F.lit(100000000) + F.col("doc_id") * F.lit(917)).cast("string"),
        ).alias("text"),
    )


def q114_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL scrubbing with per-category counts
    (operators/redaction.py): URL -> EMAIL -> IPv4 -> long-digit-run
    stages in fixed order, patterns written in the Java-regex ∩ RE2
    intersection so the oracle's regexp_replace(...,'g') reproduces
    the exact sentinelized text. Per-row projection, zero shuffles."""
    from graphsense_blocksci_spark.operators.redaction import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    return redact_pii(_dirty_documents(docs)).select(
        "doc_id", "n_urls", "n_emails", "n_ips", "n_longnums", "clean_text"
    )


def q115_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed token co-occurrence + rational PMI lift
    (operators/cooccurrence.py): ordered pairs within 3 positions via
    a nested per-row transform (no positional self-join), one
    (tok_a,tok_b) hash aggregate, unigram counts broadcast back, lift
    as a fixed-order double chain (log-free — same rationale as BM25's
    rational idf). min_count=5 prunes before the joins."""
    from graphsense_blocksci_spark.operators.cooccurrence import pmi_pairs

    docs = load_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, window=3, min_count=5)


def q116_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: each document's tiled text bytes
    become the high bytes of 120 little-endian PCM16 samples
    (sample = (byte-128)*256, so the low byte is 0x00 and the high
    byte is byte XOR 128 — assembled JVM-side as a hex string and
    unhex'd behind a constant RIFF/WAVE header), decoded by the numpy
    chunk-walker (operators/multimodal.py:decode_audio) in Arrow
    batches, yielding exact integer |sample| sums and peaks. The
    oracle re-derives both as 256*|code-128| over the same tiled
    text; both sides filter to non-empty pure-ASCII docs so byte ==
    code point holds by construction. Parser + poison payloads are
    pytest-pinned against hand-built WAVs."""
    import struct

    from graphsense_blocksci_spark.operators.multimodal import decode_audio
    from graphsense_blocksci_spark.operators.textops import spread

    n = 120
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 2 * n)
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    tiled = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(n) / F.length("text")).cast("int") + 1,
        ),
        1,
        n,
    )
    sample_hex = F.concat_ws(
        "",
        F.transform(
            F.split(tiled, ""),
            lambda c: F.concat(
                F.lit("00"),
                F.lpad(F.hex(F.ascii(c).bitwiseXOR(F.lit(128))), 2, "0"),
            ),
        ),
    )
    media = spread(docs).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(F.lit(header), F.unhex(sample_hex)).alias("payload"),
    )
    return decode_audio(media).filter(F.col("decode_ok")).select(
        "media_id", "sample_rate", "n_channels", "n_samples", "abs_sum", "peak"
    )


def q117_group_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-group deterministic sample (per-source cap of a
    training mix): 40 docs per lang by smallest md5(doc_id)
    (operators/sampling.py:group_capped_sample) — reproducible across
    runs/retries/engines where reservoir sampling is not. One shuffle
    on the group key; skew disposition in the operator docstring."""
    from graphsense_blocksci_spark.operators.sampling import (
        group_capped_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return group_capped_sample(docs, group_col="lang", k=40, key_col="doc_id")


def q118_batch_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic-batch planning
    (operators/batching.py:plan_batches): fixed integer length
    buckets (NOT a global ntile — that's a single-partition sort),
    deterministic in-bucket order, batch_size slices, per-batch
    padding-waste accounting. All integers -> cell-exact."""
    from graphsense_blocksci_spark.operators.batching import plan_batches

    docs = load_table(spark, sf_dir, "documents")
    return plan_batches(docs, bucket_width=16, batch_size=8)


def q119_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the stopword
    heuristic's prediction vs the labeled lang column — the
    eval-harness face of q33 (zh has no stopword profile, so its row
    pins the 'und' fallback). Integer counts; the prediction CTE is
    the q33 oracle verbatim."""
    from graphsense_blocksci_spark.operators.text_analysis import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    labeled = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return (
        labeled.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def qd23_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The object-storage ingestion face of the multimodal stack: the
    SAME P6 payloads q102 builds are materialized as real .pbm files,
    read back through Spark's built-in `binaryFile` source (path /
    length / content columns, pathGlobFilter pushdown), the media id
    recovered from the file path, and the bytes decoded by the numpy
    NetPBM parser. Output ≡ q102, so the q102 oracle verifies the
    whole file round-trip cell-exactly. The driver-side fixture write
    is setup (bounded at gate scale), not the operator: a production
    run points binaryFile at an object-store prefix directly."""
    import tempfile

    from graphsense_blocksci_spark.operators.multimodal import decode_image

    w, h = 8, 6
    need = w * h * 3
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    raster_txt = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(need) / F.length("text")).cast("int") + 1,
        ),
        1,
        need,
    )
    payloads = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(
            F.encode(F.lit(f"P6\n{w} {h}\n255\n"), "utf-8"),
            F.encode(raster_txt, "utf-8"),
        ).alias("payload"),
    )
    work = tempfile.mkdtemp(prefix="gbs_pbm_")
    for r in payloads.collect():  # fixture setup, gate-scale bounded
        with open(f"{work}/m{r['media_id']}.pbm", "wb") as f:
            f.write(bytes(r["payload"]))
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pbm")
        .load(work)
        .select(
            F.regexp_extract(F.col("path"), r"m(\d+)\.pbm$", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("payload"),
        )
    )
    return decode_image(media).filter(F.col("decode_ok")).select(
        "media_id", "width", "height", "channels", "n_pixels", "px_sum"
    )


def q120_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the co-supplier graph (suppliers
    co-occurring in one order are adjacent) — the clustering-coefficient
    numerator, the standard graph statistic the entity-graph stack
    (qd16/qd19) was missing. Degree-ordered orientation + wedge join
    (Suri & Vassilvitskii WWW'11) bounds the only super-linear
    intermediate; see operators/graph.py:triangle_count. Oracle:
    DuckDB replays the identical orientation/wedge algebra.

    The early-shipdate window keeps the fixture graph SPARSE (the
    full-range co-supplier graph saturates to a near-complete K_1000
    at sf0.1 — every wedge closes, which benchmarks clique density,
    not the operator; triangle counting's target regime is sparse
    graphs, same reason q63 clusters the early window only)."""
    from graphsense_blocksci_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").cast("long").alias("s")
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("src"), F.col("s2").alias("dst"))
        .distinct()
    )
    return triangle_count(edges).select(
        F.col("node").cast("long").alias("node"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


def q121_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT frequent tokens (count ≥ ceil(n/512)) via the two-phase
    Misra-Gries candidate/recount plan (operators/sketches.py) — the
    full vocabulary never shuffles, only MG candidates do. The
    threshold is pure integer arithmetic ((n+511)//512), so the oracle
    reproduces it with no float rounding hazard."""
    from graphsense_blocksci_spark.operators.sketches import heavy_hitters
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select(F.explode(tokens(F.col("text"))).alias("item"))
    return heavy_hitters(toks, "item", support_denominator=512).select(
        F.col("item").alias("token"), F.col("cnt").cast("long").alias("cnt")
    )


def q122_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (q91 semantics, eval = every 7th doc)
    with the eval shingle set carried as a Bloom BITMAP instead of a
    broadcast hash set: distributed bit_or build, constant-folded
    array literal, JVM-side probe, exact join on the survivors to
    remove false positives (operators/sketches.py). One-sided error ⇒
    output is bit-identical to the exact path, so the q91-shape oracle
    verifies the whole Bloom pipeline cell-exactly."""
    from graphsense_blocksci_spark.operators.sketches import (
        bloom_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 7 == 0
    return bloom_decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval)
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_shared_shingles").cast("long").alias("n_shared_shingles"),
    )


def q123_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end: each document's tiled text
    bytes become an 18×16 binary-P5 image, decoded + NN-resized to
    8×8 gray + difference-hashed by the numpy path
    (operators/multimodal.py:image_dhash, 7 bits/row × 8 rows = 56
    bits so the packed hash stays positive in both engines), and the
    per-hash group size — the perceptual-duplicate count a dedup
    keeper-pick runs on — is a window count over dhash. The oracle
    re-derives every bit from the tiled text's code points through the
    same floor(i·src/dst) sampling arithmetic; the 8×8 variant and
    poison payloads are pytest-pinned."""
    from graphsense_blocksci_spark.operators.multimodal import image_dhash
    from graphsense_blocksci_spark.operators.textops import spread

    w, h = 18, 16
    need = w * h
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    raster_txt = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(need) / F.length("text")).cast("int") + 1,
        ),
        1,
        need,
    )
    media = spread(docs).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(
            F.encode(F.lit(f"P5\n{w} {h}\n255\n"), "utf-8"),
            F.encode(raster_txt, "utf-8"),
        ).alias("payload"),
    )
    hashed = image_dhash(media, hash_w=7, hash_h=8).filter(
        F.col("decode_ok")
    )
    return hashed.select(
        "media_id",
        F.col("dhash").cast("long").alias("dhash"),
        F.count(F.lit(1))
        .over(Window.partitionBy("dhash"))
        .cast("long")
        .alias("n_same_hash"),
    )


def q124_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-wise audio features end-to-end: the q116 WAV payloads
    (120 PCM16 samples whose high bytes are the tiled text, low bytes
    zero) framed at 30 samples → 4 rows per doc with exact integer
    energy (Σ sample², RMS minus the final sqrt) and zero-crossing
    counts (operators/multimodal.py:audio_frame_features). The oracle
    re-derives both from the tiled text: sample = (code−128)·256, so
    sq_sum = 65536·Σ(code−128)² and a crossing is (code<128) flipping
    between adjacent samples within the frame."""
    import struct

    from graphsense_blocksci_spark.operators.multimodal import (
        audio_frame_features,
    )
    from graphsense_blocksci_spark.operators.textops import spread

    n = 120
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 2 * n)
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    tiled = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(n) / F.length("text")).cast("int") + 1,
        ),
        1,
        n,
    )
    sample_hex = F.concat_ws(
        "",
        F.transform(
            F.split(tiled, ""),
            lambda c: F.concat(
                F.lit("00"),
                F.lpad(F.hex(F.ascii(c).bitwiseXOR(F.lit(128))), 2, "0"),
            ),
        ),
    )
    media = spread(docs).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(F.lit(header), F.unhex(sample_hex)).alias("payload"),
    )
    return audio_frame_features(media, frame_size=30).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("sq_sum").cast("long").alias("sq_sum"),
        F.col("n_crossings").cast("long").alias("n_crossings"),
    )


def qd24_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful streaming sketch under the correctness gate:
    sharded Misra-Gries heavy hitters via applyInPandasWithState
    (streaming/sketches.py), driven availableNow over the documents
    tokens staged as a file stream. A single micro-batch with capacity
    ≥ per-shard distinct items means no decrement ever fires, so the
    snapshot counts are EXACT running counts and the oracle is the
    plain token group-by. Cross-batch state carry and
    decrement-under-pressure are pytest-gated
    (tests/test_streaming.py); this entry pins the operator's
    end-to-end plumbing and the no-pressure semantics vs SQL."""
    import tempfile

    from graphsense_blocksci_spark.operators.textops import tokens
    from graphsense_blocksci_spark.streaming.sketches import (
        heavy_hitters_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("item"))
    work = tempfile.mkdtemp(prefix="gbs_shh_")
    toks.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("item string").parquet(f"{work}/src")
    q = (
        heavy_hitters_stream(stream, capacity=65536, n_shards=8)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema("item string, approx_count long, shard_total long")
        .parquet(f"{work}/out")
        .select(F.col("item").alias("token"), F.col("approx_count").alias("cnt"))
    )


def q126_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile partials (the quantile analog of the q97 HLL
    partials): per-orderdate HDR-histogram bucket counts over
    order-value cents, merged by a plain per-bucket sum, then
    p50/p90/p99 picked by integer cumulative rank
    (operators/sketches.py:hdr_histogram/hdr_quantiles). Every step is
    integer/bit-exact arithmetic — unlike rank-error sketches, merge
    order cannot change a count — so the oracle re-derives the same
    buckets, ranks and estimates cell-exactly. The partial/merge
    equivalence and the 2^-sub_bits relative-error bound are
    pytest-gated."""
    from graphsense_blocksci_spark.operators.sketches import (
        hdr_histogram,
        hdr_quantiles,
    )

    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.col("o_orderdate").alias("day"),
        _cents("o_totalprice").alias("cents"),
    )
    hist = hdr_histogram(vals, "cents", group_cols=("day",))
    return hdr_quantiles(hist, ((50, 100), (90, 100), (99, 100)))


def q125_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-1 via IVF + product quantization with
    exact re-ranking (operators/similarity.py:cosine_topk_ivfpq) —
    the memory-scale ANN path: candidates ride as 8 one-byte codes
    through the cell shuffle (64× smaller than the float vectors),
    ADC scoring is a JVM-side table-lookup aggregate, and the
    shortlist re-ranks against true vectors so reported sims are
    exact cosines.

    Driver-checkable invariant frame (round 5): the PQ shortlist is
    centroid/codebook-dependent (NumPy BLAS), but probing every cell
    with an unbounded re-rank shortlist is a mathematical identity
    with exact top-1 — so the frame runs the production path (probe=4,
    rerank=32) for its row count AND the full-probe identity against
    the brute-force twin (oracle: count(*), count(*), 0). Recall at
    production settings stays pytest-gated (incl. the adversarial
    clustered+outlier geometry)."""
    from graphsense_blocksci_spark.operators import (
        cosine_topk_bruteforce,
        cosine_topk_ivfpq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivfpq(
        emb, k=1, n_centroids=16, n_probe=4, n_subspaces=8, n_codes=16
    )
    # identity: probing EVERY cell with an unbounded re-rank shortlist
    # makes the candidate set the whole corpus and the exact re-rank
    # the exact top-1 — independent of centroids AND codebooks
    full = cosine_topk_ivfpq(
        emb,
        k=1,
        n_centroids=16,
        n_probe=16,
        n_subspaces=8,
        n_codes=16,
        rerank=1 << 30,
    )
    exact = cosine_topk_bruteforce(emb, k=1)
    pairing = full.select("vec_id", F.col("neighbor_id").alias("pq_nb")).join(
        exact.select("vec_id", F.col("neighbor_id").alias("ex_nb")),
        "vec_id",
        "full_outer",
    )
    n_queries = exact.agg(F.count(F.lit(1)).alias("n_queries"))
    n_results = approx.agg(F.count(F.lit(1)).alias("n_results"))
    n_mismatch = pairing.agg(
        F.sum(F.when(~F.col("pq_nb").eqNullSafe(F.col("ex_nb")), 1).otherwise(0))
        .cast("long")
        .alias("n_fullprobe_mismatch")
    )
    return n_queries.crossJoin(n_results).crossJoin(n_mismatch)


def q127_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase per user, each
    step within 86400 s of the previous: t_view = first view,
    t_click = first click in [t_view, t_view+86400], t_purchase
    likewise after t_click. Expressed as chained conditional-min
    aggregations (filter → join previous stage → min), NOT a per-user
    event-list collect: each stage is one user-keyed shuffle of that
    stage's events only, so a power user with millions of events
    never materializes as a single array."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("long").alias("e"),
        "event_type",
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("e").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("e") >= F.col("t_view")) & (F.col("e") <= F.col("t_view") + 86400))
        .groupBy("user_id")
        .agg(F.min("e").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("e") >= F.col("t_click")) & (F.col("e") <= F.col("t_click") + 86400)
        )
        .groupBy("user_id")
        .agg(F.min("e").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
    )


def q128_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = epoch-week of a user's first
    event; one row per (cohort_week, week_offset) counting users still
    active that many weeks later. The (user, week) distinct runs
    BEFORE the cohort join, so each user contributes ≤ weeks rows to
    the join however many raw events they have."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / 604800)
        .cast("long")
        .alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q129_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier of orders — earliest AND cheapest (both
    dimensions minimized, strict domination): the multi-objective
    filter a curation pipeline uses for cost/quality trade-offs.
    Two-phase all-JVM RANGE-window plan
    (operators/windows.py:skyline_2d): bucket-local frontiers in
    parallel, then one global pass over the surviving candidates
    only. Oracle: the identical two-window predicate in one global
    DuckDB pass (a superset-then-filter plan must be invisible)."""
    from graphsense_blocksci_spark.operators.windows import skyline_2d

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        _cents("o_totalprice").alias("cents"),
    )
    return skyline_2d(base, "day", "cents")


def q130_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: the teleport (and the dangling-mass
    return) lands uniformly on a SEED set instead of all nodes — the
    relevance-to-these-addresses score GraphSense-style investigations
    rank by. Same one-job-per-iteration plan as q84
    (operators/graph.py:pagerank with a seed frame).

    Driver-checkable invariant frame (round 5, the q84 treatment):
    per-node float sums stay numpy-parity pytest-gated; the frame pins
    the conservation law and SQL-derivable shape — n_nodes / n_seeds
    from the edge set, mass_e6 = round(Σrank·1e6) = 1_000_000 (seeded
    teleport + dangling return conserve total mass), n_negative = 0
    (ranks are sums of non-negative terms; unreached nodes sit at
    exactly 0, so the q84 positivity bound weakens to non-negativity
    here)."""
    from graphsense_blocksci_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        F.col("l_partkey").cast("long").alias("dst"),
    ).distinct()
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 10 == 0)
    )
    pr = pagerank(edges, iterations=8, seeds=seeds)
    mass = pr.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.sum("rank") * F.lit(1e6)).cast("long").alias("mass_e6"),
        F.sum(F.when(F.col("rank") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )
    n_seeds = seeds.agg(F.count(F.lit(1)).alias("n_seeds"))
    return mass.crossJoin(n_seeds).select(
        "n_nodes", "n_seeds", "mass_e6", "n_negative"
    )


def q131_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: peak number of simultaneously
    open sessions per day. Each event opens an interval [start,
    start + 60 + event_id % 3600); the running open-count is the
    distributed two-phase prefix sum over +1/-1 boundary deltas
    (operators/intervals.py:sweep_concurrency — bucket-local running
    sums, one bounded n_buckets-row offset window), NEVER a global
    single-partition Window.orderBy. Oracle: the identical running sum
    as one global DuckDB window."""
    from graphsense_blocksci_spark.operators.intervals import sweep_concurrency

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").cast("long").alias("start"),
        (
            F.col("ts").cast("timestamp").cast("long")
            + 60
            + F.col("event_id") % 3600
        ).alias("end"),
    )
    timeline = sweep_concurrency(ev, n_buckets=64)
    return (
        timeline.groupBy(F.floor(F.col("t") / 86400).cast("long").alias("day"))
        .agg(F.max("concurrent").cast("long").alias("max_concurrent"))
    )


def q132_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) over customer names:
    blocking on (nation, name length, 6-digit name prefix) bounds the
    quadratic verify — the prefix key caps block sizes so Σ block²
    stays linear-ish in the table as customers grow (the recall/cost
    dial every Fellegi-Sunter blocking scheme exposes: pairs differing
    inside the blocked prefix are unreachable BY DESIGN, and a
    production run adds a second blocking pass on a different key).
    Then the EXACT levenshtein filter keeps pairs with distance <= 2
    (operators/entity_resolution.py). `levenshtein` is implemented
    identically in Spark and DuckDB, so this similarity join is
    cell-exact — the oracle replays the same block join + filter."""
    from graphsense_blocksci_spark.operators.entity_resolution import (
        record_linkage,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 10, 6).alias("name_prefix"),
    )
    return record_linkage(
        cust,
        ["nation", "name_len", "name_prefix"],
        max_dist=2,
        id_col="id",
        name_col="name",
    )


def q133_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build: collapse each user's event stream into state
    validity intervals (state = event_type; consecutive same-state
    events merge; valid_to = next transition, NULL = current). Two
    windows sharing ONE (user, time) sort + a run-level lead
    (operators/diff.py:scd2_intervals). The as-of-queryable history
    table every warehouse derives from change streams."""
    from graphsense_blocksci_spark.operators.diff import scd2_intervals

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("ts").cast("timestamp").cast("long").alias("e"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return scd2_intervals(
        ev, key="user_id", state="event_type", ts="e", order=["event_id"]
    )


def q134_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per order-priority median and median
    absolute deviation (MAD) of order value in integer cents, plus the
    count of |x - med| > 3*MAD outliers. Exact interpolated
    `percentile` ≡ DuckDB `quantile_cont` bit-for-bit (q59 contract);
    deviations are exact multiples of 0.5 so the second percentile
    pass stays bit-portable. The curation analog: robust quality-score
    thresholds that a few spam documents cannot drag (unlike
    mean/stddev)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(cents, 0.5D)").alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.first("med").alias("med"),
        F.expr("percentile(dev, 0.5D)").alias("mad"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        dev.select("o_orderpriority", "dev")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.first("n_orders").alias("n_orders"),
            F.sum(
                F.when(F.col("dev") > 3.0 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def q135_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of event
    values per user over the last 16 events: the bounded-frame
    collect_list + a LEFT FOLD of the recurrence y = (y + x)/2.
    Dyadic alpha makes every step an exact IEEE halving in a fixed
    order, so Spark's fold and DuckDB's list_reduce agree
    bit-for-bit — a deterministic EWMA, which the textbook
    float-power formulation cannot give across engines. Per-user ROWS
    frame: state is 16 doubles, never the user's history."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("long").alias("e"),
        F.col("value").cast("double").alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("e", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    return ev.select("event_id", "user_id", ewma.alias("ewma"))


def q136_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over orders: bit-interleave
    (order day, $1000 value bucket) into one LONG
    (functions/layout.py:morton_key — pure shift/and/or, whole-stage
    codegen). Sorting files by this key gives every file a small 2-D
    bounding box so parquet min/max stats prune scans on EITHER
    dimension (the OPTIMIZE ZORDER primitive; sink:
    sources/sinks.py:write_zorder, locality pinned in test_plans).
    Oracle: the identical 32-term bit expression unrolled in SQL."""
    from graphsense_blocksci_spark.functions.layout import morton_key

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        F.floor(_cents("o_totalprice") / 100000).cast("long").alias("kbucket"),
    )
    return base.select(
        "o_orderkey",
        "day",
        "kbucket",
        morton_key("day", "kbucket", bits=16).alias("zkey"),
    )


def q137_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest paths (distributed Bellman-Ford,
    operators/graph.py:shortest_paths): min total integer weight over
    ≤4 directed hops from a seed set. Per round only the IMPROVED
    frontier joins the edge table (one src-keyed shuffle + one min
    aggregate); integer weights keep min() exact, so unlike
    float-summing PageRank this is cell-exact against the oracle's
    recursive-CTE path enumeration."""
    from graphsense_blocksci_spark.operators.graph import shortest_paths

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_quantity") < 10).select(
        (F.col("l_orderkey") % 5000).cast("long").alias("src"),
        (F.col("l_partkey") % 5000).cast("long").alias("dst"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    seeds = edges.select(F.col("src").alias("node")).distinct().filter(
        F.col("node") % 500 == 0
    )
    return shortest_paths(edges, seeds, max_hops=4)


def q138_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (operators/graph.py:kcore):
    3 rounds of delete-degree-<4 over the undirected part/supplier
    co-occurrence graph, returning surviving (node, degree). The dense
    backbone the spam/bot-cluster analyses key on. Deterministic fixed
    rounds make it oracle-checkable — the oracle unrolls the same 3
    peels (the q87 LPA pattern)."""
    from graphsense_blocksci_spark.operators.graph import kcore

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") % 2000).cast("long").alias("src"),
        (2000 + F.col("l_suppkey") % 2000).cast("long").alias("dst"),
    )
    return kcore(edges, k=4, rounds=3)


def q139_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profiling (the quality dashboard every ingest
    needs): per column, row/null/distinct counts and min/max rendered
    as strings — ONE aggregate over the scan computes all columns'
    stats (Catalyst shares the shuffle), then an unpivot lays them out
    long-form. Doubles are profiled via integer cents so min/max
    stringification is engine-portable (Java vs C++ float formatting
    is not)."""
    o = load_table(spark, sf_dir, "orders")
    prof = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("order_day"),
        _cents("o_totalprice").alias("cents"),
    )
    cols = prof.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = prof.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


def q140_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge TRAINING (Sennrich et al. 2016;
    operators/tokenizer.py:bpe_train): 8 merge rounds learned from the
    documents corpus — pair counts as a vocabulary-sized aggregate,
    the argmax merge picked with one min_by over (-count, pair) and
    applied via an F.aggregate left fold, the 1-row winner riding a
    broadcast crossJoin (no driver-side scalar sync). Cell-exact
    oracle since round 9 (_bpe_train_sql — the 8-round fold unrolled
    as positional CTEs, the kmeans discipline); also pytest-gated
    against the pure-Python reference trainer."""
    from graphsense_blocksci_spark.operators.tokenizer import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=8)


def q141_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap theta-join as an equi-join plan
    (operators/intervals.py:interval_overlap_join): intervals explode
    onto fixed-width time buckets, the join runs per bucket, and each
    overlapping pair survives only in the FIRST bucket its overlap
    touches — exactly-once with NO dedup shuffle and NO cross join.
    Oracle: the plain quadratic theta join (the bucketed plan must be
    invisible in the output)."""
    from graphsense_blocksci_spark.operators.intervals import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").cast("long").alias("start"),
        (
            F.col("ts").cast("timestamp").cast("long")
            + 60
            + F.col("event_id") % 3600
        ).alias("end"),
    )
    left = ev.filter(F.col("event_id") % 7 == 0)
    right = ev.filter(F.col("event_id") % 7 == 3)
    pairs = interval_overlap_join(left, right, bucket_width=4096)
    return pairs.select(
        F.col("l_event_id"),
        F.col("r_event_id"),
        (
            F.least("l_end", "r_end") - F.greatest("l_start", "r_start")
        ).cast("long").alias("overlap_s"),
    )


def q142_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (size-proportional) sampling without
    replacement (operators/sampling.py:systematic_sample): documents
    laid end-to-end by char length in doc_id order, one sample point
    every 5000 units — long documents always kept, short ones kept
    proportionally to length, FIXED phase so retries/backfills/the
    oracle agree row-for-row (rand()-phase PPS cannot). Runs on the
    packing prefix-sum (bucket-local cumsum + bounded offset window).
    Oracle: one global running-sum window."""
    from graphsense_blocksci_spark.operators.sampling import systematic_sample

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("weight"),
    )
    return systematic_sample(
        docs, step=5000, id_col="doc_id", weight_col="weight"
    )


def q143_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection: each document becomes a 4-frame
    "clip" (frame f rasters a 7-byte-shifted window of the tiled
    text into an 18×16 P5 image), every frame is perceptually hashed
    by the REAL numpy decode+resize path (multimodal.image_dhash),
    and a scene cut is a consecutive-frame Hamming distance ≥ 10 —
    lag + xor + bit_count, all JVM. The frame-dedup/shot-boundary
    primitive a video curation pipeline keys on. Oracle: re-derives
    all 56 dhash bits per frame from code points (q123 arithmetic)
    plus the same lag/popcount."""
    from graphsense_blocksci_spark.operators.multimodal import image_dhash
    from graphsense_blocksci_spark.operators.textops import spread

    w, h, stride, n_frames = 18, 16, 7, 4
    need = w * h + stride * (n_frames - 1)
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    tiled = F.substring(
        F.repeat(
            F.col("text"),
            F.floor(F.lit(need) / F.length("text")).cast("int") + 1,
        ),
        1,
        need,
    )
    frames = spread(docs).select(
        F.col("doc_id").cast("long").alias("media_id"),
        tiled.alias("_tiled"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no"),
    ).select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.concat(
            F.encode(F.lit(f"P5\n{w} {h}\n255\n"), "utf-8"),
            F.encode(
                F.substring(
                    F.col("_tiled"), F.lit(1) + F.col("frame_no") * stride, w * h
                ),
                "utf-8",
            ),
        ).alias("payload"),
    )
    hashed = image_dhash(
        frames.withColumn(
            "media_id", F.col("media_id") * 10 + F.col("frame_no")
        ).drop("frame_no"),
        hash_w=7,
        hash_h=8,
    ).filter(F.col("decode_ok"))
    per_frame = hashed.select(
        F.floor(F.col("media_id") / 10).cast("long").alias("media_id"),
        (F.col("media_id") % 10).cast("long").alias("frame_no"),
        F.col("dhash").cast("long").alias("dhash"),
    )
    wlag = Window.partitionBy("media_id").orderBy("frame_no")
    hamming = F.bit_count(
        F.col("dhash").bitwiseXOR(F.lag("dhash").over(wlag))
    ).cast("long")
    return per_frame.select(
        "media_id",
        "frame_no",
        "dhash",
        hamming.alias("hamming"),
        F.when(hamming.isNull(), F.lit(None).cast("boolean"))
        .otherwise(hamming >= 10)
        .alias("scene_change"),
    )


def q144_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-driven random walks (the DeepWalk/node2vec
    training-corpus generator; operators/graph.py:random_walks): 3
    walks × 4 steps per seed over the lineitem-derived graph, the
    neighbor choice at each (walk, step) being the out-neighbor
    minimizing the 28-bit md5 of walk|step|neighbor — retries and the
    oracle reproduce IDENTICAL walks, which rand()-driven walks
    cannot. One join + one min aggregate per step; walks ride as one
    string per walk. Oracle: 4 unrolled left-join/argmin steps over
    the same hash."""
    from graphsense_blocksci_spark.operators.graph import random_walks

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_quantity") < 10).select(
        (F.col("l_orderkey") % 5000).cast("long").alias("src"),
        (F.col("l_partkey") % 5000).cast("long").alias("dst"),
    )
    seeds = edges.select(F.col("src").alias("node")).distinct().filter(
        F.col("node") % 200 == 0
    )
    return random_walks(edges, seeds, walk_length=4, n_walks=3)


def q145_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language model (the n-gram LM table a
    perplexity filter scores against): adjacent token pairs via the
    offset-slice zip (NO positional self-join — the q115 PMI
    machinery), context counts as the sum of outgoing bigrams, and
    the conditional probability reported as floor(1e6 · c2/c1) —
    one double division + floor, bit-portable (ln/raw-prob floats are
    not). min_count=3 prunes the Zipf tail before any join. Scale:
    one (w1,w2) hash aggregate with map-side partials + a vocab-sized
    context aggregate joined back."""
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select(tokens("text").alias("t"))
    n = F.size("t")
    pairs = (
        toks.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, n - 1).alias("a"),
                    F.slice("t", 2, n - 1).alias("b"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    ctx = pairs.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        pairs.filter(F.col("c2") >= 3)
        .join(ctx, "w1")
        .select(
            "w1",
            "w2",
            "c2",
            "c1",
            F.floor(F.lit(1000000.0) * F.col("c2") / F.col("c1"))
            .cast("long")
            .alias("pmill"),
        )
    )


def qd25_streaming_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING mergeable quantile partials under the exact gate:
    per-day HDR histogram bucket counts folded into the
    applyInPandasWithState store (streaming/sketches.py:
    hdr_histogram_stream — bucket ids computed JVM-side with the q126
    bit arithmetic, state bounded by value RANGE not stream length),
    driven availableNow over orders staged as a file stream. A single
    micro-batch means every snapshot is the exact histogram, so the
    oracle is the plain per-day bucket group-by — the streaming
    plumbing must be invisible. Cross-batch accumulation is
    pytest-gated (tests/test_streaming.py)."""
    import tempfile

    from graphsense_blocksci_spark.streaming.sketches import (
        hdr_histogram_stream,
    )

    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        _cents("o_totalprice").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="gbs_shdr_")
    vals.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("day long, cents long").parquet(
        f"{work}/src"
    )
    q = (
        hdr_histogram_stream(stream, "cents", "day")
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema("group long, bucket long, cnt long")
        .parquet(f"{work}/out")
        .select(F.col("group").alias("day"), "bucket", "cnt")
    )


def q146_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches WITH set operations (the capability HLL
    lacks): per-priority distinct-customer sketches (k=256 smallest
    md5 hashes — operators/sketches.py:kmv_hashes, two bounded window
    passes, never a full per-group sort), their UNION ('ALL'), and the
    Jaccard-based INTERSECTION estimate of two priorities. Every
    number is a deterministic function of the value hashes, so unlike
    any randomized sketch the whole pipeline is cell-exact against
    the oracle's replay of the same trims and estimator arithmetic."""
    from graphsense_blocksci_spark.operators.sketches import (
        KMV_SPACE,
        kmv_estimate,
        kmv_hashes,
        kmv_trim,
    )

    k = 256
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("long").alias("cust"),
    )
    hs = kmv_hashes(o, "cust", ("grp",), k=k).localCheckpoint(eager=True)
    per_group = kmv_estimate(hs, ("grp",), k)
    all_sk = kmv_trim(
        hs.select(F.lit("ALL").alias("grp"), "h"), ("grp",), k
    )
    per_all = kmv_estimate(all_sk, ("grp",), k)
    a = hs.filter(F.col("grp") == "1-URGENT").select("h")
    b = hs.filter(F.col("grp") == "5-LOW").select("h")
    merged = kmv_trim(
        a.union(b).select(F.lit("AB").alias("grp"), "h"), ("grp",), k
    )
    mm = merged.agg(
        F.count(F.lit(1)).alias("n_m"), F.max("h").alias("kth")
    )
    mt = (
        merged.join(a, "h", "left_semi")
        .join(b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    est_u = F.floor(F.lit(float((k - 1) * KMV_SPACE)) / F.col("kth")).cast(
        "long"
    )
    inter = (
        mm.crossJoin(mt)
        .select(
            F.lit("INTER:1-URGENT&5-LOW").alias("grp"),
            F.col("matches").cast("long").alias("n_sketch"),
            F.col("kth").alias("kth_hash"),
            F.when(F.col("n_m") < k, F.col("matches").cast("long"))
            .otherwise(
                F.floor(
                    (F.col("matches") * est_u) / F.lit(float(k))
                ).cast("long")
            )
            .alias("est_distinct"),
        )
    )
    return per_group.unionByName(per_all).unionByName(inter)


def q147_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling (the contrastive-pair generator
    for embedding training): documents get a dense rank via the
    distributed prefix sum (packing machinery with weight 1 — NO
    global row_number window), and each anchor draws 4 pseudo-random
    partners by Knuth multiplicative mixing of (rank, j) mod N — a
    pure function of the data, so retries and the oracle reproduce the
    identical pairs, where rand() negatives cannot. One uniform
    rank-keyed join fetches partner ids; self-draws are dropped
    (documented, matching standard implementations)."""
    from graphsense_blocksci_spark.operators.packing import sequence_packing

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), F.lit(1).alias("one")
    )
    ranked = sequence_packing(
        docs, budget=1, id_col="doc_id", count_col="one"
    ).select("doc_id", F.col("offset").alias("rank"))
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    anchors = ranked.crossJoin(F.broadcast(n)).select(
        F.col("doc_id").alias("anchor_doc"),
        "rank",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
    )
    drawn = anchors.select(
        "anchor_doc",
        "j",
        F.pmod(
            F.col("rank") * 2654435761 + F.col("j") * 40503 + 7, F.col("n")
        ).alias("p_rank"),
        "rank",
    ).filter(F.col("p_rank") != F.col("rank"))
    partners = ranked.select(
        F.col("rank").alias("p_rank"), F.col("doc_id").alias("neg_doc")
    )
    return drawn.join(partners, "p_rank").select(
        "anchor_doc", F.col("j").cast("long").alias("j"), "neg_doc"
    )


def q148_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded harmonic centrality from a seed sample: ONE shared
    multi-source BFS (operators/graph.py:multi_source_bfs — k seeds
    ride one frontier, not k BFS loops) and the centrality sum uses
    integer 60/d credits (60 = lcm(1,2,3)) so the per-node aggregate
    is order-free exact — the float 1/d formulation would be
    partition-order dependent. Oracle: recursive-CTE min-hop
    enumeration + the same integer credits."""
    from graphsense_blocksci_spark.operators.graph import multi_source_bfs

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_quantity") < 10).select(
        (F.col("l_orderkey") % 5000).cast("long").alias("src"),
        (F.col("l_partkey") % 5000).cast("long").alias("dst"),
    )
    seeds = edges.select(F.col("src").alias("node")).distinct().filter(
        F.col("node") % 1000 == 0
    )
    vis = multi_source_bfs(edges, seeds, max_hops=3)
    return (
        vis.filter(F.col("hops") > 0)
        .groupBy("node")
        .agg(
            F.sum(F.floor(F.lit(60) / F.col("hops")).cast("long")).alias(
                "h60"
            ),
            F.count(F.lit(1)).alias("n_src"),
        )
    )



def q149_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling without replacement, 5 docs per
    language, weight = 1 + n_chars % 8 (operators/sampling.py:
    weighted_reservoir): the A-ES priority u^(1/w) realized EXACTLY
    for integer weights as the max of w independent md5 draws (max of
    w uniforms has CDF u^w = the u^(1/w) law), so selection is pure
    integer comparison — retries, backfills and the oracle agree
    row-for-row where a float pow() would drift an ulp. Oracle: the
    identical max-of-w-hashes ranking in DuckDB."""
    from graphsense_blocksci_spark.operators.sampling import (
        weighted_reservoir,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        (F.lit(1) + F.col("n_chars").cast("long") % 8).alias("weight"),
    )
    out = weighted_reservoir(
        docs, "lang", k=5, key_col="doc_id", weight_col="weight",
        max_weight=8,
    )
    return out.select("doc_id", "lang", "weight", "priority", "sample_rank")


def q150_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of an integer score vs a boolean label via the
    Mann-Whitney rank-sum identity with midrank ties
    (operators/evaluation.py:roc_auc) — the classifier-evaluation step
    of a curation pipeline. The corpus collapses to one row per
    distinct score BEFORE any ordered window, so the window is bounded
    by the score domain (997 here), never corpus size; midranks ride
    x2 as integers and the final AUC is a single int/int division.
    Oracle: same rank-sum in one DuckDB window."""
    from graphsense_blocksci_spark.operators.evaluation import roc_auc

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars").cast("long") % 997).alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    return roc_auc(docs, "score", "label")


def q151_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift between two sources' token unigram distributions
    (operators/evaluation.py:distribution_drift): total-variation
    distance as the INTEGER sum |c_a*N_b - c_b*N_a| over the common
    denominator (a float sum of per-token diffs would be
    partition-order dependent) plus exact vocab Jaccard. One
    map-side-combined vocab aggregate with per-group conditional
    counts — no join, corpus touched once."""
    from graphsense_blocksci_spark.operators.evaluation import (
        distribution_drift,
    )
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens("text")).alias("token")
    )
    return distribution_drift(toks, "source", "token", "src0", "src1")


def q152_equiwidth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value in cents, 16 bins
    (operators/evaluation.py:equiwidth_bins): the scale-safe
    discretizer — one 1-row min/max aggregate broadcast back, one
    integer floor-division per row, one <=16-key aggregate. No
    percentile sort, no NTILE corpus-wide single-partition window.
    Oracle: identical integer arithmetic in DuckDB."""
    from graphsense_blocksci_spark.operators.evaluation import (
        equiwidth_bins,
    )

    o = load_table(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("cents")
    )
    return equiwidth_bins(o, "cents", 16)


def q153_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length
    (operators/evaluation.py:zscore_normalize) in the exact-arithmetic
    form z = (n*x - S)/sqrt(n*Q - S^2): every float input is an exact
    integer aggregate, the sqrt is IEEE-correctly-rounded, so any
    engine reproduces z to the bit — the naive (x-mean)/stddev float
    pipeline could not. |groups|-row stats broadcast back over the
    scan."""
    from graphsense_blocksci_spark.operators.evaluation import (
        zscore_normalize,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    return zscore_normalize(docs, "lang", "n_chars")


def q154_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment
    (operators/sampling.py:kfold_assign): fold = md5(doc_id) mod 5 —
    group-safe (a key's rows always share a fold), engine-portable,
    zero-shuffle projection; summarized per (fold, lang) so the
    oracle pins both the assignment and the fold balance."""
    from graphsense_blocksci_spark.operators.sampling import kfold_assign

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return (
        kfold_assign(docs, "doc_id", n_folds=5)
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )



def q155_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact prefix-filtered Jaccard set-similarity self-join
    (operators/setsim.py:jaccard_join) over 3-gram shingle sets:
    every pair with Jaccard >= 0.6, NO false negatives — the
    guaranteed-complete counterpart of the probabilistic MinHash-LSH
    path (q36/q38), pruned by the rare-token-first prefix filter
    instead of banding, so the candidate join fans out on the
    shortest posting lists. Integer threshold predicate; the oracle
    is the brute-force all-pairs join (a complete candidate/verify
    plan must be INVISIBLE next to it)."""
    from graphsense_blocksci_spark.operators.setsim import jaccard_join
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hash_frame,
    )

    # sets are the 28-bit md5 shingle HASHES (the repo-wide staged
    # Arrow path, 24x the interpreted HOF shingling) — identical
    # md5 in the oracle, so a collision collapses the same element
    # on both sides and Jaccard parity is preserved exactly
    docs = shingle_hash_frame(load_table(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("_sh").alias("gs"),
    )
    return jaccard_join(docs, "doc_id", "gs", threshold_pct=60)


def q156_tf_cosine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-weighted cosine similarity self-join through the
    inverted index (operators/setsim.py:tf_cosine_join) over word
    bigram counts: sparse GEMM as posting-list join + groupBy, integer
    dot products and norms, (100*dot)^2 >= t^2*q_a*q_b verify. max_df
    caps posting-list fan-out (inactive at oracle scale, prunes the
    quadratic head at bench scale — the stopword-pruning contract).
    Bigrams ride the q145 offset-slice zip, not a positional
    self-join."""
    from graphsense_blocksci_spark.operators.setsim import tf_cosine_join
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    n = F.size(F.col("t"))
    bigrams = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            tokens("text").alias("t"),
        )
        .select(
            "doc_id",
            F.when(
                n >= 2,
                F.transform(
                    F.arrays_zip(
                        F.slice("t", 1, n - 1).alias("a"),
                        F.slice("t", 2, n - 1).alias("b"),
                    ),
                    lambda p: F.concat_ws(" ", p["a"], p["b"]),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("bg"),
        )
    )
    return tf_cosine_join(
        bigrams, "doc_id", "bg", threshold_pct=70, max_df=100
    )



def _q157_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 10).select(
        (F.col("l_orderkey") % 5000).cast("long").alias("src"),
        (F.col("l_partkey") % 5000).cast("long").alias("dst"),
    )


def q157_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity per community in exact integer arithmetic
    (operators/graph.py:modularity) — the partition-quality gauge for
    LPA/entity-cluster output, computed here over a deterministic
    hash partition (node % 16) so the oracle can re-derive the SAME
    labels: q_num = 4*m*e_in - d_tot^2 per community, Q = sum/4m^2.
    Zero iteration; label map broadcast onto both endpoints; the only
    float is one int/int division."""
    from graphsense_blocksci_spark.operators.graph import modularity

    edges = _q157_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", (F.col("node") % 16).alias("label"))
    return modularity(edges, labels)


def q158_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 2-hop neighborhood size per node
    (operators/graph.py:two_hop_counts): src→x→y with y neither the
    source nor a direct neighbor — the friends-of-friends expansion
    feature. Mid-node self-join + distinct + anti-join, all shuffles
    on node id; hub fan-out documented with the max_bucket-style cap
    discipline. Oracle: the identical three-join SQL."""
    from graphsense_blocksci_spark.operators.graph import two_hop_counts

    return two_hop_counts(_q157_edges(spark, sf_dir))



def q159_simhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: all doc pairs within Hamming
    distance 3 of the 32-bit frequency-weighted simhash (q37's
    signature), EXACT via the pigeonhole block trick
    (operators/text_dedup.py:simhash_hamming_join) — 4 bit-blocks, a
    qualifying pair must share one verbatim, so candidates are
    (block, value) bucket joins and verify is one XOR popcount.
    Completes the Charikar pipeline the q37 signature starts.
    Oracle: brute-force all-pairs popcount."""
    from graphsense_blocksci_spark.operators.text_dedup import (
        simhash,
        simhash_hamming_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash(docs)
    return simhash_hamming_join(sigs, max_hamming=3, bits=32)



def q160_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed Louvain (operators/graph.py:louvain):
    modularity-maximizing communities over the q157 graph — exact
    2m-scaled integer gain comparisons, stay-biased total tie-breaks,
    parity-alternating synchronous moves, one contraction level.
    Bit-reproducible output where textbook Louvain's random node
    order is not — which is exactly what makes it oracle-able:
    cell-exact since round 9 via _louvain_sql (the 2x3
    level/sub-round unroll, kmeans discipline). Quality additionally
    pytest-gated with the exact-integer modularity operator
    (planted-partition recovery, never-worse-than-singletons)."""
    from graphsense_blocksci_spark.operators.graph import louvain

    out = louvain(_q157_edges(spark, sf_dir), sub_rounds=3, levels=2)
    return (
        out.groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
    )



def q161_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution
    (operators/attribution.py:attribute_conversions): every purchase
    credits the earliest and latest view/click of the same user in
    the preceding 7 days; ties on the timestamp break on event id via
    struct-ordered min/max (the same total order DuckDB evaluates),
    and unattributed purchases survive with NULL touches. One
    user-keyed range join + one aggregate per conversion — the funnel
    family's credit-assignment sibling."""
    from graphsense_blocksci_spark.operators.attribution import (
        attribute_conversions,
    )

    ev = load_table(spark, sf_dir, "events")
    return attribute_conversions(ev)



def q162_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 candidates per fixture query
    fused with a static length prior by integer Borda count
    (operators/retrieval.py:rank_fusion_borda) — RRF's float
    1/(60+r) sum is order-dependent, Borda is exact, so the fused
    ranking hash-compares. Prior is re-ranked INSIDE each candidate
    set (never a corpus-wide prior window); fusion touches only
    |queries| x 20 rows."""
    from graphsense_blocksci_spark.operators.retrieval import (
        bm25_topk,
        rank_fusion_borda,
    )

    docs = load_table(spark, sf_dir, "documents")
    cand = bm25_topk(docs, k=20)
    prior = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("prior"),
    )
    return rank_fusion_borda(cand, prior, k=10)



def q163_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates
    (operators/sketches.py:cms_build/cms_estimate): 4x256 counters
    over event user occurrences, probed for every 20th user and
    joined against the true counts — est >= true is the CMS
    contract, pinned by pytest; md5-derived hash rows make the whole
    counter table deterministic, so the oracle rebuilds the sketch
    cell-exact (impossible for a seeded-random CMS). Shuffle carries
    <= depth*width cells, never occurrences; the probe join is a
    broadcast."""
    from graphsense_blocksci_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    sketch = cms_build(ev, "user_id", depth=4, width=256)
    keys = ev.distinct().filter(F.col("user_id") % 20 == 0)
    est = cms_estimate(sketch, keys, "user_id", depth=4, width=256)
    true_counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    return est.join(true_counts, "user_id").select(
        "user_id", "est", "true_cnt"
    )



def q164_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream Markov transition matrix: consecutive event-type
    pairs per user in (ts, event_id) order — the behavioral analog of
    the q145 text bigram LM. One per-user lag window (user-keyed
    partitions, never global), one (from,to) aggregate with map-side
    partials, context totals joined back; transition probability as
    floor(1e6 * c/ctx) — one division + floor, bit-portable."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("u"),
        F.col("ts").cast("timestamp").cast("long").alias("t"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("event_type").alias("et"),
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    pairs = (
        ev.withColumn("prev_et", F.lag("et").over(w))
        .filter(F.col("prev_et").isNotNull())
        .groupBy(
            F.col("prev_et").alias("from_type"),
            F.col("et").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ctx = pairs.groupBy("from_type").agg(
        F.sum("c").cast("long").alias("ctx")
    )
    return pairs.join(ctx, "from_type").select(
        "from_type",
        "to_type",
        "c",
        "ctx",
        F.floor(F.lit(1000000.0) * F.col("c") / F.col("ctx"))
        .cast("long")
        .alias("pmill"),
    )



def qd26_streaming_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Count-Min sketch under the exact gate: per-hash-row
    counter cells folded into the applyInPandasWithState store
    (streaming/sketches.py:cms_stream — cells computed JVM-side with
    the q163 md5 arithmetic, state bounded by width, merge is the
    order-insensitive cell sum), driven availableNow over events
    staged as a file stream. A single micro-batch means the snapshot
    IS the batch sketch, so the oracle is q163's counter-table CTE —
    the streaming plumbing must be invisible. Cross-batch
    accumulation (partials ≡ direct) is pytest-gated."""
    import tempfile

    from graphsense_blocksci_spark.streaming.sketches import cms_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    work = tempfile.mkdtemp(prefix="gbs_scms_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("user_id long").parquet(f"{work}/src")
    q = (
        cms_stream(stream, "user_id", depth=4, width=256)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema("group long, bucket long, cnt long")
        .parquet(f"{work}/out")
        .select(F.col("group").alias("d"), "bucket", "cnt")
    )



def q165_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup WITH corpus rewrite (the Lee et al. 2022
    deduplicate-and-cut step; operators/text_dedup.py:
    span_dedup_rewrite): 10-token spans, corpus-wide first occurrence
    survives (smallest (doc, position) — total order), documents
    reassembled from surviving spans; fully-duplicated docs come back
    empty but stay in the corpus. q105 FINDS repeated spans, this
    REMOVES them. One span-keyed min aggregate + one join back + one
    per-doc regroup."""
    from graphsense_blocksci_spark.operators.text_dedup import (
        span_dedup_rewrite,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = span_dedup_rewrite(docs, span_tokens=10)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_spans",
        "n_kept",
        F.length("new_text").cast("long").alias("new_len"),
        "new_text",
    )



def q166_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear-regression sufficient statistics
    (operators/evaluation.py:gram_matrix): X'X, X'y and n for
    price ~ [1, quantity, discount_pct] over lineitem as ONE
    map-side-combined aggregate — the normal-equations route that
    reduces a 100 TB regression to a d²-number shuffle and a bounded
    driver solve (q167). Integer features make every entry an exact
    integer sum, so the whole statistics frame hash-compares."""
    from graphsense_blocksci_spark.operators.evaluation import gram_matrix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit(1).cast("long").alias("one"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    return gram_matrix(li, ["one", "qty", "disc_pct"], "price_cents")


def q167_ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression fit from the q166 sufficient statistics,
    EXACT to the last digit (operators/evaluation.py:
    ridge_solve_exact): the distributed work is the one integer
    Gram/moment aggregate (d²+d+1 numbers to the driver however
    large the corpus); the solve is Cramer's rule in arbitrary-
    precision integer arithmetic, so each coefficient is the
    canonical rational num_i / det(X'X + λI) and the frame is
    cell-exact oracle-able (the round-7 rows-only gap, closed — the
    DuckDB oracle reproduces the determinants in HUGEINT). The
    numerator/denominator ride as decimal STRINGS (they exceed
    int64 by construction: det is a product of three ~Σx² sums);
    β_i = num/den, and the float LAPACK route (ridge_solve) is
    pytest-pinned against these rationals."""
    from graphsense_blocksci_spark.operators.evaluation import (
        gram_matrix,
        ridge_solve_exact,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit(1).cast("long").alias("one"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    gram = gram_matrix(li, ["one", "qty", "disc_pct"], "price_cents")
    beta = ridge_solve_exact(gram, d=3, lam=1)
    return spark.createDataFrame(
        [(i, str(num), str(den)) for i, (num, den) in enumerate(beta)],
        "coef_idx long, beta_num string, beta_den string",
    )



def q168_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes forward pass (operators/graph.py:bfs_path_counts):
    hop-bounded multi-source shortest-path DISTANCES and PATH COUNTS
    sigma — sigma is the exact integer sum over BFS-tree
    predecessors, so the frame hash-compares against a recursive
    path enumeration (count of length-d paths at d = min distance ==
    sigma, since a shortest path cannot revisit a node). One
    frontier join + one (source,node) sum + one anti-join per hop."""
    from graphsense_blocksci_spark.operators.graph import bfs_path_counts

    edges = _q157_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 1000 == 0)
    )
    return bfs_path_counts(edges, seeds, max_hops=3)


def q169_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled hop-bounded betweenness centrality (Brandes 2001 with
    source sampling; operators/graph.py:betweenness_sampled): exact
    integer sigma from q168's forward pass, then the level-by-level
    float dependency accumulation delta(v) += sigma_v/sigma_w *
    (1+delta_w). Rows-only (float path-count ratios); pinned against
    a pure-Python Brandes reference in pytest."""
    from graphsense_blocksci_spark.operators.graph import (
        betweenness_sampled,
    )

    edges = _q157_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 1000 == 0)
    )
    out = betweenness_sampled(edges, seeds, max_hops=3)
    return out.select(
        "node",
        F.round(F.col("betweenness"), 6).alias("betweenness"),
        "n_sources",
    )



def q170_pca_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA sufficient statistics over the embeddings
    table, EXACT (operators/decomposition.py:scatter_quantized): the
    1e6-quantized int64 second-moment matrix, coordinate sums, and n
    — one Arrow-batched INTEGER GEMM partial per partition (numpy
    int64 matmul is exact, so partials are order-independent), d²+d+1
    numbers total, cell-exact against a DuckDB unnest-pair oracle
    (the round-7 rows-only gap, closed). This is the frame the
    driver-side eigh consumes: the float eigenvalue readout
    (decomposition.py:pca_topk) stays numpy-parity pytest-gated, and
    a round-8 pytest pins eigh-on-this-scatter against pca_topk
    within quantization error."""
    from graphsense_blocksci_spark.operators.decomposition import (
        scatter_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return scatter_quantized(emb)



def q171_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse features (Weinberger et al. 2009): tokens
    hash into 1024 buckets with a SIGNED contribution (the sign bit
    decorrelates collisions, keeping the inner product unbiased) —
    the fixed-width feature map a linear classifier (q108) trains on
    without any vocabulary table. value(bucket) = Σ ±tf, all
    integers: bucket = hash28(token) % 1024, sign from the next hash
    bit. Zero vocabulary state, one map-side-combined (doc, bucket)
    aggregate — the feature extraction that never needs a fit step
    at 100 TB."""
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    occ = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens("text")).alias("t"),
    )
    h = F.conv(F.substring(F.md5("t"), 1, 7), 16, 10).cast("long")
    return (
        occ.select(
            "doc_id",
            (h % 1024).alias("bucket"),
            F.when((F.floor(h / 1024) % 2) == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("value"))
        .filter(F.col("value") != 0)
    )


def q172_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis (the report behind every salting
    decision in this repo): per user-key row counts, corpus share in
    ppm, and the integer salt factor ceil(cnt/(total/32)) a 32-way
    salted join would need to level that key — top 20 keys by count.
    Exact integers + one TakeOrdered; the operator that tells you
    WHEN q55/q28's salting path is worth its extra shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "cnt",
            "total",
            F.floor(F.lit(1000000) * F.col("cnt") / F.col("total"))
            .cast("long")
            .alias("share_ppm"),
            F.greatest(
                F.lit(1),
                F.ceil(F.lit(32) * F.col("cnt") / F.col("total")),
            )
            .cast("long")
            .alias("salt_factor"),
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(20)
    )



def q173_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by full-batch gradient descent
    (operators/evaluation.py:logistic_gd): predict returned lineitems
    from [1, qty/10, discount] — 6 fixed iterations, the weight
    vector riding as a broadcast 1-row frame (never a driver
    collect), one scan + one (d+1)-number aggregate per iteration.
    Rows-only (exp); numpy replays the identical schedule in
    pytest to 1e-9."""
    from graphsense_blocksci_spark.operators.evaluation import logistic_gd

    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit(1.0).alias("one"),
        (F.col("l_quantity") / 10.0).alias("qty10"),
        F.col("l_discount").cast("double").alias("disc"),
        (F.col("l_returnflag") == "R").cast("double").alias("y"),
    )
    out = logistic_gd(li, ["one", "qty10", "disc"], "y", lr=0.5,
                      iterations=6)
    return out.select("idx", F.round("weight", 9).alias("weight"))



def q174_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal profile + anomaly numerator (the seasonal-naive
    baseline a forecast/anomaly pipeline starts from): per
    (day-of-week, hour) mean event value in exact-rational form —
    sums and counts as integers, mean as one division — plus the
    peak deviation numerator max|value*n - sum| per cell, which is
    |value - mean| x n kept integer-exact (the q134 MAD discipline
    applied to seasonality)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = ev.select(
        (F.dayofweek("ts")).cast("long").alias("dow"),
        (F.hour("ts")).cast("long").alias("hod"),
        "cents",
    )
    stats = cells.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.min("cents").cast("long").alias("min_cents"),
    )
    return stats.select(
        "dow",
        "hod",
        "n",
        "sum_cents",
        (F.col("sum_cents").cast("double") / F.col("n").cast("double")).alias(
            "mean_cents"
        ),
        F.greatest(
            F.col("max_cents") * F.col("n") - F.col("sum_cents"),
            F.col("sum_cents") - F.col("min_cents") * F.col("n"),
        )
        .cast("long")
        .alias("peak_dev_num"),
    )


def q175_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite validation report (the expectations check
    every ingest gate runs): orphan foreign keys (lineitem->orders
    anti-join), primary-key duplicates, domain violations (negative
    quantity / out-of-range discount), and null counts — one row per
    check with violation counts. All exact integers; the anti-join is
    the only wide operation and runs on the join key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # One LAZY frame, one job: each check is a scalar aggregate and the
    # report is their union — no .count()/.first() driver round-trips
    # (VERDICT r4: was three sequential driver actions).
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"),
              li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(
            F.lit("fk_orphan_lineitem_orders").alias("check_name"),
            "violations",
        )
    )
    dup_pk = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(
            F.lit("pk_duplicate_orders").alias("check_name"), "violations"
        )
    )
    domain = (
        li.agg(
            F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
            .cast("long")
            .alias("bad_qty"),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("bad_discount"),
            F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_shipdate"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ).select(
            F.expr(
                "stack(4,"
                " 'domain_qty_nonpositive', bad_qty,"
                " 'domain_discount_range', bad_discount,"
                " 'null_shipdate', null_shipdate,"
                " 'row_count_lineitem', n_rows)"
                " AS (check_name, violations)"
            )
        )
    )
    return orphans.unionByName(dup_pk).unionByName(domain)



def qd27_daily_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-address DAILY balance time series over the real fixture
    chain (operators/linkage.py:daily_balances): credits on the
    receiving day, debits on the SPENDING tx's day through the B1
    linkage, running balance as a per-address cumulative window
    (address-partitioned — never a global sort). The ledger view
    GraphSense's transformation stage layers on qd15's lifetime
    totals. Oracle: identical window over the same linkage SQL."""
    from graphsense_blocksci_spark.operators.linkage import daily_balances

    _, raw_txs, _ = _fixture_frames(spark)
    return daily_balances(raw_txs).select(
        "addr",
        "day",
        "net_value",
        "balance",
    )



def q176_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, the
    MinHash Jaccard ESTIMATE (fraction of agreeing signature slots —
    the estimator the banding scheme is built on) side by side with
    the EXACT shingle Jaccard, plus the signed error. Every number is
    a deterministic function of the md5 permutations, so unlike any
    seeded sketch the estimator itself is oracle-checkable — the
    audit that tells you whether 8 permutations are enough before you
    scale the dedup to the full corpus."""
    from graphsense_blocksci_spark.operators.text_dedup import (
        MINHASH_PERMS,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hash_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    # Shared-subplan pinning (VERDICT r4 item 2): the shingle frame
    # feeds the signature agg AND the exact-Jaccard sides, and the
    # signature frame feeds the LSH pairing AND both estimate sides —
    # lazy localCheckpoints run each pipeline stage once instead of
    # once per consumer (was 12 exchanges of recomputation).
    sh = shingle_hash_frame(docs).localCheckpoint(eager=False)
    sigs = minhash_signatures(docs, shingles=sh).localCheckpoint(eager=False)
    pairs = minhash_lsh_pairs(docs, sigs=sigs)
    n = MINHASH_PERMS
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n)],
    )
    matches = None
    for i in range(n):
        t = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = t if matches is None else matches + t
    ha = sh.select(F.col("doc_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    hb = sh.select(F.col("doc_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    uni = F.size(F.array_union("sh_a", "sh_b")).cast("long")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("matches", matches.cast("long"))
        .join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            "matches",
            F.lit(n).cast("long").alias("n_perms"),
            (F.col("matches").cast("double") / F.lit(float(n))).alias("est"),
            inter.alias("inter"),
            uni.alias("uni"),
            (inter.cast("double") / uni.cast("double")).alias("exact"),
            (
                F.col("matches").cast("double") / F.lit(float(n))
                - inter.cast("double") / uni.cast("double")
            ).alias("err"),
        )
    )



def q177_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the q150 score/label pair: decile-wide
    score buckets -> observed positive rate (exact n/n_pos integers,
    rate as one division) — the calibration check that pairs with
    AUC: a model can rank well (high AUC) and still be badly
    calibrated. One bounded-key aggregate; bucket edges are integer
    floor-division, never a quantile sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars").cast("long") % 997).alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    return (
        docs.groupBy(
            F.expr("CAST(score DIV 100 AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("label"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .select(
            "bucket",
            "n",
            "n_pos",
            "min_score",
            "max_score",
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "pos_rate"
            ),
        )
    )



def q178_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by Count-Min inner product
    (Cormode-Muthukrishnan): |orders ⋈ customer on custkey| estimated
    as min over hash rows of Σ_bucket cntA·cntB — never an
    underestimate, computed from two depth×width sketches without
    touching the join itself (the optimizer-style cardinality probe
    at 100 TB: two scans + a 2·d·w-cell join, no shuffle of the fact
    table). Deterministic md5 rows ⇒ the ESTIMATE is oracle-exact;
    the true size rides along for the error audit."""
    from graphsense_blocksci_spark.operators.sketches import cms_build

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    sa = cms_build(o, "k", depth=4, width=256)
    sb = cms_build(c, "k", depth=4, width=256)
    per_row = (
        sa.alias("a")
        .join(sb.alias("b"), ["d", "bucket"])
        .groupBy("d")
        .agg(
            F.sum(F.col("a.cnt") * F.col("b.cnt"))
            .cast("long")
            .alias("ip")
        )
    )
    est = per_row.agg(F.min("ip").cast("long").alias("est_join_size"))
    exact = (
        o.join(c, "k")
        .agg(F.count(F.lit(1)).cast("long").alias("true_join_size"))
    )
    return (
        est.crossJoin(exact)
        .crossJoin(o.agg(F.count(F.lit(1)).cast("long").alias("n_orders")))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        )
    )



def qd28_utxo_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTXO-set snapshot at the chain tip: outputs never referenced
    by any input (anti-join on the (spent_tx_id, spent_index) back-
    reference), summarized per address_type — the unspent-set size/
    value accounting BlockSci exposes natively and a relational
    engine derives with ONE anti-join on the uniform spent-tx key.
    No-address outputs stay in (the UTXO set doesn't care about
    renderability; only the ledger does)."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    outs = explode_outputs(raw_txs)
    ins = explode_inputs(raw_txs.filter(~F.col("coinbase"))).select(
        F.col("spent_tx_id").alias("tx_id"),
        F.col("spent_index").alias("output_index"),
    )
    utxo = outs.join(ins, ["tx_id", "output_index"], "left_anti")
    return utxo.groupBy(
        F.col("address_type").cast("long").alias("address_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_utxos"),
        F.sum("value").cast("long").alias("total_value"),
        F.max("value").cast("long").alias("max_value"),
    )


def qd29_tx_fees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction fee (inputs total − outputs total, coinbase
    excluded — the parser resolves input values so the fee is pure
    nested-array arithmetic, BlockSci's tx.fee accessor) rolled up
    per block: n_txs, total/max fee — the fee-market table every
    chain analytics stack materializes. Zero joins: two array sums
    per row + one block-keyed aggregate."""
    from graphsense_blocksci_spark.functions.io_aggs import io_total_value

    _, raw_txs, _ = _fixture_frames(spark)
    fees = raw_txs.filter(~F.col("coinbase")).select(
        F.col("block_id").cast("long").alias("block_id"),
        (
            io_total_value("inputs") - io_total_value("outputs")
        ).cast("long").alias("fee"),
    )
    return fees.groupBy("block_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_txs"),
        F.sum("fee").cast("long").alias("total_fee"),
        F.max("fee").cast("long").alias("max_fee"),
    )


def qd30_block_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-interval statistics: per-day mean/max seconds between
    consecutive blocks (lag over the block chain ordered by id — ONE
    global-but-block-count-sized window, bounded by chain height not
    tx volume), the difficulty-retarget diagnostic every chain
    monitor computes. Exact-rational mean (sum/count integers, one
    division)."""
    raw_blocks, _, _ = _fixture_frames(spark)
    w = Window.orderBy("block_id")
    iv = (
        raw_blocks.select(
            F.col("block_id").cast("long").alias("block_id"),
            F.col("timestamp").cast("long").alias("ts"),
        )
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            F.floor(F.col("ts") / 86400).cast("long").alias("day"),
            (F.col("ts") - F.col("prev_ts")).alias("gap"),
        )
    )
    return iv.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("sum_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        (F.sum("gap").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_gap"
        ),
    )



def qd31_entity_daily_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: per-ENTITY daily balance time series
    — qd27's daily address ledger rolled up to qd16's co-spend
    entities (output-only addresses as singleton entities via the
    shared 28-bit hash, the qd17 rule), running balance per entity.
    The investigation-grade view GraphSense's transformation stage
    serves: how an entity's holdings evolved day by day. One entity
    join + one (entity, day) aggregate + an entity-partitioned
    cumulative window on top of the already-verified qd27 plan."""
    from graphsense_blocksci_spark.operators.linkage import daily_balances
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    daily = daily_balances(raw_txs)
    ent = qd16_cospend_entities(spark, sf_dir)
    net = (
        daily.join(ent, "addr", "left")
        .select(
            F.coalesce("entity", hash28(F.col("addr"))).alias("entity"),
            "day",
            "net_value",
        )
        .groupBy("entity", "day")
        .agg(F.sum("net_value").cast("long").alias("net_value"))
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return net.withColumn(
        "balance", F.sum("net_value").over(w).cast("long")
    )



def q179_window_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window sketch rollup: HOURLY KMV partials of distinct
    users merged (union + re-trim) into DAILY distinct estimates —
    the pre-aggregated dashboard path where raw events are compacted
    to bounded per-hour sketches and any coarser window derives from
    partials alone. Lossless by construction: a hash in the day's
    k-smallest is necessarily in its hour's k-smallest, so the oracle
    computes the day sketch directly and must agree hash-for-hash.
    True per-day distincts ride along for the error audit."""
    from graphsense_blocksci_spark.operators.sketches import (
        kmv_estimate,
        kmv_hashes,
        kmv_trim,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / 3600)
        .cast("long")
        .alias("hour"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("day"),
    )
    hourly = kmv_hashes(ev, "user_id", ("day", "hour"), k=64)
    daily = kmv_trim(hourly.select("day", "h"), ("day",), k=64)
    est = kmv_estimate(daily, ("day",), k=64)
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    return est.join(exact, "day").select(
        "day", "n_sketch", "kth_hash", "est_distinct", "true_distinct"
    )



def q180_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension lookup (the late-arriving-fact
    join every SCD2 warehouse needs): purchases join the
    view/click-state SCD2 history (q133 machinery restricted to the
    dimension stream) to recover each user's state AS OF the purchase
    instant — join on key + interval containment, half-open
    [valid_from, valid_to), NULL valid_to = current version.
    Purchases before any state survive with NULL (left interval
    join). One user-keyed range join against a version-count-sized
    dimension."""
    from graphsense_blocksci_spark.operators.diff import scd2_intervals

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("ts").cast("timestamp").cast("long").alias("e"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    dim = scd2_intervals(
        ev.filter(F.col("event_type").isin("view", "click")),
        key="user_id",
        state="event_type",
        ts="e",
        order=["event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("e").alias("t"),
    )
    return (
        facts.join(
            dim,
            (facts.user_id == dim.user_id)
            & (F.col("valid_from") <= F.col("t"))
            & (
                F.col("valid_to").isNull()
                | (F.col("t") < F.col("valid_to"))
            ),
            "left",
        )
        .select(
            facts.user_id.alias("user_id"),
            "purchase_id",
            "t",
            "state",
            "valid_from",
        )
    )



def q181_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (the MDM step after record linkage):
    q132's levenshtein-verified match pairs become duplicate clusters
    (connected components, min-member id), every unmatched customer
    stays a singleton, and each cluster elects one surviving record —
    name from the smallest member id (struct-ordered min, the
    first-record-wins rule), best balance as the max, segment spread
    counted. The dedup-then-merge that turns matched PAIRS into a
    clean dimension table."""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
    )

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        _cents("c_acctbal").alias("bal_cents"),
        F.col("c_mktsegment").alias("segment"),
    )
    pairs = q132_record_linkage(spark, sf_dir).select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    cc = connected_components(pairs)
    return (
        c.join(
            cc.select(F.col("node").alias("id"), "component"), "id", "left"
        )
        .select(
            F.coalesce("component", F.col("id")).alias("cluster"),
            "id",
            "name",
            "bal_cents",
            "segment",
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min(F.struct("id", "name"))["name"].alias("canonical_name"),
            F.max("bal_cents").cast("long").alias("best_bal_cents"),
            F.countDistinct("segment").cast("long").alias("n_segments"),
        )
    )



def q182_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split deterministically into two
    arms (md5(user) mod 2 — the same keyed-hash assignment as the
    train/test split, so re-runs and the oracle agree user-for-user),
    conversion = user purchased; per-arm counts plus the pooled
    two-proportion z statistic

        z = (p1 − p0) / sqrt(p̄(1−p̄)(1/n0 + 1/n1))

    computed as a fixed chain of IEEE ops over exact integer counts —
    the experimentation-analysis primitive, hash-comparable because
    every float comes from the same deterministic arithmetic in both
    engines. One user-level aggregate + one 2-row arm aggregate +
    a 1-row final."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
    )
    # outcome: heavy purchaser (>= 18 purchase events) — every fixture
    # user buys at least once, so plain conversion would be degenerate
    users = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 18
        )
        .cast("int")
        .alias("converted")
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10
        ).cast("long")
        % 2
    )
    arms = users.withColumn("arm", arm).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("conv").alias("c0")
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("conv").alias("c1")
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pbar = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pbar
        * (F.lit(1.0) - pbar)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return a0.crossJoin(a1).select(
        "n0",
        "c0",
        "n1",
        "c1",
        p0.alias("rate0"),
        p1.alias("rate1"),
        ((p1 - p0) / se).alias("z_stat"),
    )



def q183_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the q182 experiment (Deng et al.
    2013): covariate X = the user's view count, outcome Y = purchase
    count; θ = cov(X,Y)/var(X) computed from INTEGER moment sums
    (n·ΣXY − ΣX·ΣY over n·ΣX² − (ΣX)²), then the covariate-adjusted
    arm delta (Ȳ − θX̄)₁ − (Ȳ − θX̄)₀. Every sufficient statistic is
    an exact long; θ and the adjusted delta are a short fixed IEEE
    chain — the modern experimentation pipeline, hash-comparable
    end to end."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
    )
    users = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10
        ).cast("long")
        % 2
    )
    au = users.withColumn("arm", arm)
    moments = au.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    arms = au.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("an"),
        F.sum("x").cast("long").alias("ax"),
        F.sum("y").cast("long").alias("ay"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("an").alias("n0"), F.col("ax").alias("x0"),
        F.col("ay").alias("y0"),
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("an").alias("n1"), F.col("ax").alias("x1"),
        F.col("ay").alias("y1"),
    )
    theta_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    theta_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    theta = theta_num.cast("double") / theta_den.cast("double")
    adj1 = F.col("y1").cast("double") / F.col("n1").cast("double") - theta * (
        F.col("x1").cast("double") / F.col("n1").cast("double")
    )
    adj0 = F.col("y0").cast("double") / F.col("n0").cast("double") - theta * (
        F.col("x0").cast("double") / F.col("n0").cast("double")
    )
    return (
        moments.crossJoin(a0)
        .crossJoin(a1)
        .select(
            "n",
            theta_num.cast("long").alias("theta_num"),
            theta_den.cast("long").alias("theta_den"),
            theta.alias("theta"),
            "n0",
            "y0",
            "n1",
            "y1",
            (adj1 - adj0).alias("cuped_delta"),
            (
                F.col("y1").cast("double") / F.col("n1").cast("double")
                - F.col("y0").cast("double") / F.col("n0").cast("double")
            ).alias("raw_delta"),
        )
    )


def q184_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (capped) per-priority order-value means: values are
    clamped to the group's exact [p05, p95] interpolated percentiles
    (the q59 bit-portable percentile contract) before averaging — the
    robust revenue metric a few whale orders cannot drag, unlike the
    raw mean. Cap sums stay exact multiples of 0.01 cents so the
    float mean is one division over an exact rational."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    caps = o.groupBy("o_orderpriority").agg(
        F.percentile("cents", F.lit(0.05)).alias("p05"),
        F.percentile("cents", F.lit(0.95)).alias("p95"),
    )
    w = o.join(F.broadcast(caps), "o_orderpriority").select(
        "o_orderpriority",
        F.greatest(F.least(F.col("cents").cast("double"), F.col("p95")),
                   F.col("p05")).alias("wv"),
    )
    # x20 scaling makes every winsorized value an exact integer (the
    # 0.05-step interpolation has denominator 20), so the sum is
    # order-free exact and the mean is one division — a float Σ of
    # doubles would be partition-order dependent
    return (
        w.select(
            "o_orderpriority",
            F.round(F.col("wv") * 20).cast("long").alias("wv20"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("wv20").cast("long").alias("win_sum20"),
            (
                F.sum("wv20").cast("double")
                / (20 * F.count(F.lit(1))).cast("double")
            ).alias("win_mean"),
        )
    )



def q185_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank @10 for the q107 BM25 ranking against a
    deterministic relevance rule (doc_id % 6 == query_id — synthetic
    but engine-portable, like every fixture label here): per query
    the rank of the first relevant hit, and corpus MRR as the EXACT
    rational Σ 2520/rank over 2520·n (2520 = lcm(1..10), so every
    reciprocal is an integer) — the float Σ 1/r would be
    order-dependent. The ranking-evaluation metric that completes
    the AUC (q150) / calibration (q177) eval suite."""
    from graphsense_blocksci_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    # Pin the 8-exchange BM25 subplan: both consumers below (firsts and
    # the n_queries spine) read the SAME materialized ranking instead of
    # re-executing it, and there is no driver .count() round-trip — n_q
    # rides as a 1-row aggregate crossJoined into the final frame (the
    # q189/q207 pattern), keeping the whole query one lazy action.
    ranked = (
        bm25_topk(docs, k=10)
        .select("query_id", F.col("doc_id").cast("long").alias("doc_id"), "rank")
        .localCheckpoint(eager=False)
    )
    firsts = (
        ranked.filter(F.col("doc_id") % 6 == F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("rank").cast("long").alias("first_rel_rank"))
    )
    n_q = ranked.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries")
    )
    return (
        firsts.agg(
            F.count(F.lit(1)).cast("long").alias("n_with_hit"),
            F.sum(
                F.expr("CAST(2520 DIV first_rel_rank AS BIGINT)")
            ).cast("long").alias("mrr_num2520"),
        )
        .crossJoin(F.broadcast(n_q))
        .select(
            "n_with_hit",
            "n_queries",
            "mrr_num2520",
            (
                F.col("mrr_num2520").cast("double")
                / (F.lit(2520) * F.col("n_queries")).cast("double")
            ).alias("mrr"),
        )
    )


def q186_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level record linkage: all customer-name pairs within
    Levenshtein distance 1, via FastSS deletion-neighborhood blocking
    (operators/stringsim.py:edit_distance_join) — candidates meet only
    through shared single-deletion variants (hashed to longs), then the
    exact integer `levenshtein` verifies; zero false negatives by the
    pigeonhole argument, so the brute-force all-pairs oracle matches
    cell-exactly while the Spark plan never forms the cross product."""
    from graphsense_blocksci_spark.operators.stringsim import (
        edit_distance_join,
    )

    c = load_table(spark, sf_dir, "customer")
    return edit_distance_join(c, "c_name", "c_custkey", max_dist=1)


def q187_map_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-Average-Precision@10 inputs for the q107 BM25 ranking,
    EXACT-rational like q185's MRR: per query, AP's numerator is
    Σ over relevant ranks r of 2520·cum_rel(r)/r (2520 = lcm(1..10)
    makes every term an integer), the denominator 2520·min(R, 10)
    rides alongside, and the float AP is ONE divide on those integers
    — hash-comparable where float Σ prec/r would be order-dependent.
    Completes the ranking-eval suite (AUC q150, calibration q177,
    MRR q185)."""
    from graphsense_blocksci_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    # Pin the shared BM25 subplan: `ranked` feeds both the AP terms and
    # the query spine below; without the lazy localCheckpoint the
    # 8-exchange ranking executes twice (the 6b329df treatment).
    ranked = (
        bm25_topk(docs, k=10)
        .select("query_id", F.col("doc_id").cast("long").alias("doc_id"), "rank")
        .localCheckpoint(eager=False)
    )
    rel = ranked.filter(F.col("doc_id") % 6 == F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy("rank")
    terms = rel.select(
        "query_id",
        (
            F.expr("CAST(2520 DIV rank AS BIGINT)")
            * F.row_number().over(w).cast("long")
        ).alias("_term"),
    )
    per_q = terms.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_at10"),
        F.sum("_term").cast("long").alias("ap_num2520"),
    )
    corpus_rel = docs.select(
        (F.col("doc_id") % 6).cast("long").alias("query_id")
    ).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_corpus")
    )
    return (
        ranked.select("query_id").distinct()
        .join(per_q, "query_id", "left")
        .join(corpus_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel_at10", F.lit(0)).cast("long").alias("n_rel_at10"),
            F.coalesce("n_rel_corpus", F.lit(0)).cast("long").alias(
                "n_rel_corpus"
            ),
            F.coalesce("ap_num2520", F.lit(0)).cast("long").alias("ap_num2520"),
            (F.lit(2520) * F.least(F.coalesce("n_rel_corpus", F.lit(0)), F.lit(10)))
            .cast("long")
            .alias("ap_den2520"),
            (
                F.coalesce("ap_num2520", F.lit(0)).cast("double")
                / (
                    F.lit(2520.0)
                    * F.least(
                        F.coalesce("n_rel_corpus", F.lit(0)), F.lit(10)
                    ).cast("double")
                )
            ).alias("ap"),
        )
    )


def q188_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily order-count series at lags
    1..7 — the seasonality diagnostic (weekly structure) behind the
    q174 seasonal profile. All sums are INTEGER by centering on the
    FLOOR mean: with S = Σx and n days, c_t = x_t − ⌊S/n⌋ is an
    integer, so the lag-k numerator Σ c_t·c_{t+k} over day pairs (t,
    t+k both present) and the denominator Σ c_t² are exact int64
    sums (order-independent) and the float ACF is one divide. Note
    the floor-mean centering leaves a sub-unit residual (deviations
    need not sum to zero), so the statistic is a negligibly (<1
    count/day) biased ACF — "exact" refers to the integer sums, not
    to the textbook mean-centered estimator.
    One tiny daily aggregate, one broadcast self-join on day+lag —
    nothing here grows past |days| rows regardless of corpus size."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.floor(F.unix_timestamp("o_orderdate") / 86400)).cast("long").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    # centering on the FLOOR mean (x - s DIV n), not the n-scaled
    # deviation n*x - s: the scaled form squares to ~(n*x)^2, which
    # outgrows int64 once daily volume reaches ~1e9 rows; the floor-
    # mean deviation stays fluctuation-sized, so its square sums are
    # overflow-safe at any corpus the day grain can see
    d = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (F.col("x") - F.expr("CAST(s DIV n AS BIGINT)")).alias("c"),
        "n",
        "s",
    )
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    left = d.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("day") + F.col("lag")).alias("day"), F.col("c").alias("c_t")
    )
    pairs = left.join(
        d.select("day", F.col("c").alias("c_tk")), "day"
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("c_t") * F.col("c_tk")).cast("long").alias("num_scaled"),
    )
    den = d.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("den_scaled"))
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            "num_scaled",
            "den_scaled",
            (F.col("num_scaled").cast("double") / F.col("den_scaled").cast("double")).alias(
                "acf"
            ),
        )
    )


def q189_msf_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka minimum spanning forest over the co-occurrence-weighted
    supplier chain graph (operators/graph.py:minimum_spanning_forest)
    — driver-checkable invariant frame: the forest itself is
    pytest-gated against a python Kruskal reference under the same
    (w, a, b) total order (the MSF is unique given a total order), and
    the frame pins the SQL-derivable structure every spanning forest
    must satisfy:

    - ``n_nodes`` / ``n_components``  (oracle: recursive-CTE CC over
      the same chain edges, as in q63)
    - ``n_forest_edges``  — must equal n_nodes − n_components (a
      spanning forest of each component, acyclic and connected)
    - ``euler_gap``  n_forest_edges + n_components − n_nodes
      (oracle: the identity, 0)"""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
        minimum_spanning_forest,
    )

    li = load_table(spark, sf_dir, "lineitem")
    chain = _supplier_chain_edges(li)
    weighted = chain.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    msf = minimum_spanning_forest(weighted, weight_col="w")
    cc = connected_components(chain)
    shape = cc.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.countDistinct("component").cast("long").alias("n_components"),
    )
    nfe = msf.agg(F.count(F.lit(1)).cast("long").alias("n_forest_edges"))
    return shape.crossJoin(nfe).select(
        "n_nodes",
        "n_components",
        "n_forest_edges",
        (
            F.col("n_forest_edges") + F.col("n_components") - F.col("n_nodes")
        ).alias("euler_gap"),
    )


def q190_nb_token_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training pass: per (lang, token), the
    Laplace-smoothed class-conditional probability — the integer-
    division form floor(1e6·(c+1)/(N_lang+V)) so the model is exact
    and hash-comparable (no logs, no float sums; scoring applies logs
    at inference, outside this frame). V is the corpus vocabulary,
    N_lang the class token count. The token-class count matrix is the
    one shuffle; everything after is vocabulary-sized. Tokens below
    2 occurrences in a class are dropped to bound the emitted model
    (the smoothing denominator still counts the full vocabulary)."""
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = spread(docs).select(
        "lang", F.explode(tokens("text")).alias("token")
    )
    counts = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    n_lang = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens")
    )
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    return (
        counts.filter(F.col("c") >= 2)
        .join(n_lang, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "token",
            "c",
            "n_tokens",
            "v",
            F.expr("CAST(1000000 * (c + 1) DIV (n_tokens + v) AS BIGINT)").alias(
                "p_ppm"
            ),
        )
    )


def q191_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence scan between event type and hour of
    day — the categorical-association profiler (feature-vs-feature
    screening before training). Per cell: observed count, the row/
    column margins, and the chi² contribution as a DETERMINISTIC
    integer — (O·N − rt·ct)²/(rt·ct·N) evaluated in one fixed-shape
    double expression over int64 inputs (every step correctly rounded
    IEEE, identical in any engine) and floored to ppm, so the sum is
    an integer sum. One contingency aggregate + broadcast margins."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    ct = cells.groupBy("hour").agg(F.sum("o").cast("long").alias("ct"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hour")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "hour",
            "o",
            "rt",
            "ct",
            "n",
            F.floor(
                F.lit(1e6)
                * F.pow(
                    F.col("o").cast("double") * F.col("n").cast("double")
                    - F.col("rt").cast("double") * F.col("ct").cast("double"),
                    F.lit(2.0),
                )
                / (
                    F.col("rt").cast("double")
                    * F.col("ct").cast("double")
                    * F.col("n").cast("double")
                )
            )
            .cast("long")
            .alias("chi2_ppm"),
        )
    )


def q192_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price-vs-quantity slope per
    return flag) from EXACT integer sufficient statistics: n, Σx, Σy,
    Σxy, Σx² are int64 sums of integer cents/quantities (order-
    independent, hash-exact); slope and intercept are then ONE
    fixed-shape double expression each — n·Σxy−Σx·Σy over n·Σx²−(Σx)²
    evaluated in doubles (every step correctly-rounded IEEE over
    exactly-representable int64 inputs, identical in any engine),
    floored to ppm. The groupBy is the only shuffle; the sufficient-
    statistic pattern is what makes per-group OLS a one-pass op at
    100 TB (d² numbers per group, like the global Gram matrix q166)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sum_x"),
        F.sum(y).cast("long").alias("sum_y_cents"),
        F.sum(x * y).cast("long").alias("sum_xy"),
        F.sum(x * x).cast("long").alias("sum_x2"),
    )
    num = (
        F.col("n").cast("double") * F.col("sum_xy").cast("double")
        - F.col("sum_x").cast("double") * F.col("sum_y_cents").cast("double")
    )
    den = (
        F.col("n").cast("double") * F.col("sum_x2").cast("double")
        - F.col("sum_x").cast("double") * F.col("sum_x").cast("double")
    )
    slope = num / den
    intercept = (
        F.col("sum_y_cents").cast("double") - slope * F.col("sum_x").cast("double")
    ) / F.col("n").cast("double")
    return g.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_y_cents",
        "sum_xy",
        "sum_x2",
        F.floor(F.lit(1e6) * slope).cast("long").alias("slope_ppm"),
        F.floor(F.lit(1e3) * intercept).cast("long").alias("intercept_milli"),
    )


def q193_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test over the daily order-count series — the
    nonparametric is-there-a-trend statistic (S = Σ sign(x_j − x_i)
    over i<j) that pairs with q188's autocorrelation in the
    time-series toolkit. S, the pair counts and the tie-corrected
    variance NUMERATOR are all exact integers; the series is a tiny
    daily aggregate, so the pair join is a broadcast self-join bounded
    by |days|² — never corpus-sized (the aggregate comes first)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.floor(F.unix_timestamp("o_orderdate") / 86400)).cast("long").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    a = daily.select(F.col("day").alias("di"), F.col("x").alias("xi"))
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    pairs = a.join(F.broadcast(b), F.col("di") < F.col("dj"))
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long"))
        .cast("long")
        .alias("s"),
        F.sum((F.col("xj") > F.col("xi")).cast("long")).cast("long").alias(
            "n_concordant"
        ),
        F.sum((F.col("xj") < F.col("xi")).cast("long")).cast("long").alias(
            "n_discordant"
        ),
    )
    # tie-corrected variance numerator: 18*Var(S) = n(n-1)(2n+5) - Σ t(t-1)(2t+5)
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    return (
        s.crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "n_pairs",
            "s",
            "n_concordant",
            "n_discordant",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var_s_x18"),
        )
    )


def q194_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node over the q120 co-supplier
    graph: cc = 2·triangles / (deg·(deg−1)), emitted as the EXACT
    integer 2_000_000·tri DIV (deg·(deg−1)) — composes the
    triangle-count operator (orientation-bounded wedges) with the
    symmetric degree aggregate; one extra join, everything integer.
    The density statistic community detection (q160) and modularity
    (q157) consumers read off the same graph."""
    from graphsense_blocksci_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    # Pin the lineitem self-join: `edges` feeds both the degree
    # aggregate and triangle_count; unpinned, the 3-exchange self-join
    # + distinct would execute twice (the 6b329df treatment).
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_count(edges, src="u", dst="v")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "CAST(2000000 * coalesce(n_triangles, 0)"
                    " DIV (deg * (deg - 1)) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cc_ppm"),
        )
    )


def q195_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free K-fold target encoding — the feature-engineering
    staple: each (supplier, fold) cell gets the mean return rate of
    that supplier computed over the OTHER folds only, so a row never
    sees its own target. Closed form from two integer aggregates:
    enc = (S_cat − S_cat,fold) / (n_cat − n_cat,fold) with S/n exact
    int64 sums (category totals minus own-fold totals — no per-row
    leave-one-out pass), emitted as the exact integer ppm division.
    Fold = md5(orderkey) mod 5, the q154 assignment — group-safe and
    engine-portable. Output is |categories|·|folds| rows; the only
    shuffle is the (category, fold) aggregate."""
    from graphsense_blocksci_spark.operators.sampling import kfold_assign

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("cat"),
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    folded = kfold_assign(li, "l_orderkey", n_folds=5)
    cell = folded.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_f"),
        F.sum("y").cast("long").alias("s_f"),
    )
    tot = cell.groupBy("cat").agg(
        F.sum("n_f").cast("long").alias("n_cat"),
        F.sum("s_f").cast("long").alias("s_cat"),
    )
    return (
        cell.join(tot, "cat")
        .select(
            "cat",
            F.col("fold").cast("int").alias("fold"),
            "n_f",
            "s_f",
            "n_cat",
            "s_cat",
            F.when(
                F.col("n_cat") > F.col("n_f"),
                F.expr(
                    "CAST(1000000 * (s_cat - s_f) DIV (n_cat - n_f)"
                    " AS BIGINT)"
                ),
            ).alias("enc_ppm"),
        )
    )


def qd33_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HyperLogLog under the exact gate: per-bucket max-rho
    registers folded into the applyInPandasWithState store
    (streaming/sketches.py:hll_stream — registers computed JVM-side
    with the q199 md5/shift/bin arithmetic, ≤ 2^p longs of state,
    merge is the idempotent per-bucket MAX), driven availableNow over
    events staged as a file stream. A single micro-batch means the
    snapshot IS the batch register table, so the oracle is q199's
    register CTE — the streaming plumbing must be invisible."""
    import tempfile

    from graphsense_blocksci_spark.streaming.sketches import hll_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    work = tempfile.mkdtemp(prefix="gbs_shll_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("user_id long").parquet(f"{work}/src")
    q = (
        hll_stream(stream, "user_id", p=8)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema("bucket long, rho long").parquet(f"{work}/out")


def q199_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog over event users — the ORACLE-EXACT
    counterpart of the built-in approx_count_distinct (q54/q97, which
    stay rows-only because their seeded binary state can't be
    mirrored). md5-derived registers (operators/sketches.py:
    hll_registers), the harmonic sum as an exact integer
    (hll_estimate), and a MERGEABILITY AUDIT: registers built on the
    two event-id parity halves and merged by per-bucket max must equal
    the whole-corpus registers exactly (n_merge_mismatch = 0) — the
    property that makes HLL partials roll up across partitions,
    windows and days at 100 TB. True distinct rides along for error
    context."""
    from graphsense_blocksci_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    whole = hll_registers(ev, "user_id").localCheckpoint(eager=False)
    est = hll_estimate(whole)
    half_a = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    half_b = hll_registers(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        half_a.unionByName(half_b)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    mismatch = (
        whole.withColumnRenamed("rho", "rho_w")
        .join(merged.withColumnRenamed("rho", "rho_m"), "bucket", "full_outer")
        .agg(
            F.sum(
                F.when(~F.col("rho_w").eqNullSafe(F.col("rho_m")), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_merge_mismatch")
        )
    )
    truth = ev.agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    return est.crossJoin(mismatch).crossJoin(truth)


def q205_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classification evaluation pack — confusion matrix,
    precision/recall/F1 and Cohen's kappa for a deterministic
    discount-threshold predictor of returned lineitems (the rule is
    the fixture stand-in for any scored model; AUC q150 / calibration
    q177 grade the scores, this grades the DECISIONS). TP/FP/FN/TN
    are one integer aggregate; P/R/F1 are exact integer ppm divisions
    (F1 = 2·TP·1e6 DIV (2·TP + FP + FN) — no float chain); kappa's
    observed/expected agreement stays rational: kappa_ppm =
    (po_num·n − pe_num)·1e6 DIV (n² − pe_num) with po_num = (TP+TN)·n
    and pe_num the margin product sum — every term int64 at fixture
    scale, one scan, one row out."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        (F.col("l_discount") > 0.05).cast("int").alias("p"),
    )
    cm = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y") * F.col("p")).cast("long").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).cast("long").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).cast("long").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p"))).cast("long").alias("tn"),
    )
    return cm.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(1000000 * tp DIV (tp + fp) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(1000000 * tp DIV (tp + fn) AS BIGINT)").alias(
            "recall_ppm"
        ),
        F.expr(
            "CAST(2000000 * tp DIV (2 * tp + fp + fn) AS BIGINT)"
        ).alias("f1_ppm"),
        # kappa can be negative: integer DIV truncates toward zero in
        # Spark but DuckDB's // floors, so the ppm scaling runs as ONE
        # fixed-shape double expression (exact int64 inputs, floor
        # identical in both engines)
        F.expr(
            "CAST(floor(1e6 *"
            " CAST((tp + tn) * n - ((tp + fp) * (tp + fn)"
            " + (fn + tn) * (fp + tn)) AS DOUBLE)"
            " / CAST(n * n - ((tp + fp) * (tp + fn)"
            " + (fn + tn) * (fp + tn)) AS DOUBLE)) AS BIGINT)"
        ).alias("kappa_ppm"),
    )


def q206_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the campaign-targeting readout: orders cut
    into 10 score bands by the EXACT percentile edges of the score
    (integer cents; edges ride a broadcast 1-row frame back onto the
    scan — deliberately NOT a global ntile window, which would drag
    the whole fact table through one partition at 100 TB), each band
    with its response rate (urgent-priority share) and cumulative lift
    vs the base rate in exact ppm integer arithmetic (lift =
    cum_resp·n·1e6 DIV (cum_n·total_resp)). Value ties at an edge land
    in one band deterministically, so band sizes are near-equal, not
    exactly equal — the price of staying distributed, and irrelevant
    to a lift readout. Running sums window over 10 rows only."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("resp"),
    )
    edges = o.agg(
        F.expr(
            "percentile(cents, array(0.9D, 0.8D, 0.7D, 0.6D, 0.5D,"
            " 0.4D, 0.3D, 0.2D, 0.1D))"
        ).alias("_e")
    )
    deciled = o.crossJoin(F.broadcast(edges)).select(
        "resp",
        # decile 1 = highest scores (>= p90), ... decile 10 = lowest
        F.when(F.col("cents") >= F.col("_e")[0], 1)
        .when(F.col("cents") >= F.col("_e")[1], 2)
        .when(F.col("cents") >= F.col("_e")[2], 3)
        .when(F.col("cents") >= F.col("_e")[3], 4)
        .when(F.col("cents") >= F.col("_e")[4], 5)
        .when(F.col("cents") >= F.col("_e")[5], 6)
        .when(F.col("cents") >= F.col("_e")[6], 7)
        .when(F.col("cents") >= F.col("_e")[7], 8)
        .when(F.col("cents") >= F.col("_e")[8], 9)
        .otherwise(10)
        .cast("long")
        .alias("decile"),
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("resp").cast("long").alias("n_resp"),
    )
    cw = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = per.agg(
        F.sum("n").cast("long").alias("_tn"),
        F.sum("n_resp").cast("long").alias("_tr"),
    )
    return (
        per.withColumn("cum_n", F.sum("n").over(cw).cast("long"))
        .withColumn("cum_resp", F.sum("n_resp").over(cw).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_resp",
            "cum_n",
            "cum_resp",
            F.expr(
                "CAST(1000000 * n_resp DIV n AS BIGINT)"
            ).alias("resp_rate_ppm"),
            F.expr(
                "CAST(1000000 * cum_resp * _tn DIV (cum_n * _tr) AS BIGINT)"
            ).alias("cum_lift_ppm"),
        )
    )


def q207_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile-based bin edges) — the pair of
    the equi-width q152: edges are the exact interpolated quartiles of
    integer cents (the q59 bit-portable percentile contract), bins get
    near-equal populations however skewed the distribution. Edges ride
    a 1-row broadcast back onto the scan; per-bin count / integer
    bounds / cents sum are one aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    edges = li.agg(
        F.expr(
            "percentile(cents, array(0.25D, 0.5D, 0.75D))"
        ).alias("_e")
    ).select(
        F.col("_e")[0].alias("q1"),
        F.col("_e")[1].alias("q2"),
        F.col("_e")[2].alias("q3"),
    )
    binned = li.crossJoin(F.broadcast(edges)).select(
        "cents",
        F.when(F.col("cents") <= F.col("q1"), 0)
        .when(F.col("cents") <= F.col("q2"), 1)
        .when(F.col("cents") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


def q208_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / concentration curve — what share of revenue the top-k
    suppliers carry (the 80/20 readout): per-supplier revenue rollup,
    ranked descending (id tie-break), running revenue share in exact
    ppm (cum_cents·1e6 DIV total_cents) with the supplier count
    alongside. The window runs over the supplier-sized rollup, never
    the fact table; emitted every 10th rank plus the last row to keep
    the curve frame bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_suppkey").cast("long").alias("supp")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), F.asc("supp"))
    cw = Window.orderBy(F.desc("cents"), F.asc("supp")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per.agg(F.sum("cents").cast("long").alias("_t"),
                  F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = (
        per.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("cum_cents", F.sum("cents").over(cw).cast("long"))
        .crossJoin(F.broadcast(tot))
    )
    return ranked.filter(
        (F.col("rk") % 10 == 0) | (F.col("rk") == F.col("_n"))
    ).select(
        "rk",
        "supp",
        "cum_cents",
        F.col("_t").alias("total_cents"),
        F.expr("CAST(1000000 * cum_cents DIV _t AS BIGINT)").alias(
            "cum_share_ppm"
        ),
    )


def qd38_streaming_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SimHash near-dup pairing under the exact gate
    (streaming/dedup.py:simhash_pairs_stream): per-row 32-bit
    signatures and their 4 pigeonhole block keys as stream
    projections, (block, value)-keyed state emitting each candidate
    pair once, availableNow over the documents file stream; the
    read-back candidates are verified with the batch XOR popcount
    (batch signatures are deterministic re-derivations) and must
    match q159's brute-force all-pairs oracle — the streamed twin of
    the Charikar pipeline, completing the qd37 MinHash twin."""
    import tempfile

    from graphsense_blocksci_spark.operators.text_dedup import simhash
    from graphsense_blocksci_spark.streaming.dedup import (
        simhash_pairs_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    work = tempfile.mkdtemp(prefix="gbs_ssim_")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{work}/src"
    )
    q = (
        simhash_pairs_stream(stream, max_hamming=3)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cand = (
        spark.read.schema("id_a long, id_b long")
        .parquet(f"{work}/out")
        .distinct()
    )
    sigs = simhash(docs)
    sa = sigs.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa")
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


def q213_fit_apply_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-on-train / apply-on-serve binning — the leakage-safe
    feature-transform pattern: quartile edges are FIT on the early
    period only (before 1998, the q59 bit-portable percentile
    contract) and APPLIED to both periods, so the serve distribution
    is read through the train lens (retraining triggers when the
    serve shares drift). Per bin: train/serve counts and ppm shares
    plus the signed drift — all integers, the PSI precursor without
    its engine-unportable ln. Edges ride one broadcast row; each
    period is one binned aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
        ).cast("int").alias("is_train"),
    )
    edges = o.filter(F.col("is_train") == 1).agg(
        F.expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").alias("_e")
    ).select(
        F.col("_e")[0].alias("q1"),
        F.col("_e")[1].alias("q2"),
        F.col("_e")[2].alias("q3"),
    )
    binned = o.crossJoin(F.broadcast(edges)).select(
        "is_train",
        F.when(F.col("cents") <= F.col("q1"), 0)
        .when(F.col("cents") <= F.col("q2"), 1)
        .when(F.col("cents") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("long")
        .alias("bin"),
    )
    per = binned.groupBy("bin").agg(
        F.sum("is_train").cast("long").alias("n_train"),
        F.sum(1 - F.col("is_train")).cast("long").alias("n_serve"),
    )
    tot = per.agg(
        F.sum("n_train").cast("long").alias("_tt"),
        F.sum("n_serve").cast("long").alias("_ts"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_train",
        "n_serve",
        F.expr("CAST(1000000 * n_train DIV _tt AS BIGINT)").alias(
            "train_share_ppm"
        ),
        F.expr("CAST(1000000 * n_serve DIV _ts AS BIGINT)").alias(
            "serve_share_ppm"
        ),
        F.expr(
            "CAST(1000000 * n_serve DIV _ts - 1000000 * n_train DIV _tt"
            " AS BIGINT)"
        ).alias("drift_ppm"),
    )


def qd39_entity_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity tag propagation — the GraphSense attribution workflow:
    a deterministic seed rule stands in for an exchange/darknet tag
    list (hash28(addr) % 37 == 0), and every member of a co-spend
    entity containing at least one seeded address inherits the tag
    (guilt-by-co-spend, the point of entity clustering). Per entity:
    member count, seed count, tag flag — one aggregate over the
    verified qd16 clustering; at scale the tag list is a broadcast
    join instead of a hash rule, same plan shape."""
    ents = qd16_cospend_entities(spark, sf_dir)
    from graphsense_blocksci_spark.operators.textops import hash28

    tagged = ents.withColumn(
        "_seed", (hash28(F.col("addr")) % 37 == 0).cast("long")
    )
    return tagged.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("_seed").cast("long").alias("n_seeds"),
        F.max("_seed").cast("int").alias("is_tagged"),
    )


def q215_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-intersection similarity between behavioral profiles:
    every pair of event types compared by their hour-of-day
    distributions, sim = Σ_h min(share_a(h), share_b(h)) — carried as
    the EXACT integer Σ min(c_a·n_b, c_b·n_a) over the n_a·n_b common
    denominator (no float shares anywhere), the same discipline as
    the q210 KS statistic. One contingency aggregate; the pair join
    runs over |types|²·24 rows — nothing is corpus-sized after the
    first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n")
    )
    prof = cells.join(totals, "event_type")
    a = prof.select(
        F.col("event_type").alias("type_a"),
        "hour",
        F.col("c").alias("ca"),
        F.col("n").alias("na"),
    )
    b = prof.select(
        F.col("event_type").alias("type_b"),
        "hour",
        F.col("c").alias("cb"),
        F.col("n").alias("nb"),
    )
    pairs = a.join(b, "hour").filter(F.col("type_a") < F.col("type_b"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.least(
                    F.col("ca") * F.col("nb"), F.col("cb") * F.col("na")
                )
            )
            .cast("long")
            .alias("inter_num"),
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
        )
        .select(
            "type_a",
            "type_b",
            "inter_num",
            "n_a",
            "n_b",
            (
                F.col("inter_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("similarity"),
        )
    )


def q214_rolling_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection on the daily order-count
    series: each day is scored against the trailing 7-day window's
    MEDIAN and MAD (both exact small-array medians — collect the
    odd-sized 7-element frame, sort, take the middle element; integers
    throughout, no float quantiles), flagged by the pure integer
    comparison |x − med| > 3·MAD. The q134 global-MAD outlier scan
    localized in time — the monitoring shape. Windows are
    day-count-bounded (like qd30), never row-sized; only full 7-day
    frames score."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.floor(F.unix_timestamp("o_orderdate") / 86400)).cast("long").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    framed = daily.select(
        "day",
        "x",
        F.array_sort(F.collect_list("x").over(w)).alias("_fr"),
        F.row_number().over(Window.orderBy("day")).alias("_rn"),
    ).filter(F.col("_rn") >= 7)
    # exact median of 7 sorted values = element 4 (1-based)
    med = F.element_at("_fr", 4)
    with_med = framed.select(
        "day", "x", med.alias("med"),
        F.array_sort(
            F.transform("_fr", lambda v: F.abs(v - med))
        ).alias("_dev"),
    )
    mad = F.element_at("_dev", 4)
    return with_med.select(
        "day",
        "x",
        "med",
        mad.alias("mad"),
        (F.abs(F.col("x") - F.col("med")) > 3 * mad)
        .cast("int")
        .alias("is_anomaly"),
    )


def qd37_streaming_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MinHash-LSH near-dup pair discovery under the exact
    gate (streaming/dedup.py:lsh_pairs_stream): per-row md5-permutation
    signatures and band keys as pure stream projections, bucket-keyed
    applyInPandasWithState emitting each candidate pair exactly once
    (when its later member arrives), driven availableNow over the
    documents file stream. A single micro-batch must emit precisely
    the batch operator's pair set, so the oracle is q36's banded SQL;
    cross-batch union-equals-batch is pytest-pinned. This is the
    ingest-daemon shape: flag near-dups of the EXISTING corpus as new
    documents arrive, state bounded by bucket membership."""
    import tempfile

    from graphsense_blocksci_spark.streaming.dedup import lsh_pairs_stream

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    work = tempfile.mkdtemp(prefix="gbs_slsh_")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{work}/src"
    )
    q = (
        lsh_pairs_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema("id_a long, id_b long").parquet(f"{work}/out")
    # cross-band duplicates collapse exactly like the batch distinct
    return out.distinct()


def q211_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivorship — q71's near-dup clusters with
    a BETTER keeper policy: instead of min-id, each cluster keeps its
    longest document (argmax n_chars, id tie-break) — the policy real
    curation pipelines run (keep the most complete copy, drop the
    fragments). One cluster-keyed aggregate over the labeled corpus:
    member count, elected keeper, its length, and the cluster's total
    length (= how many chars dedup saves). The pair graph and CC are
    the verified q71 machinery; the oracle re-runs the identical
    recursive-CTE clusters + the same argmax survivorship."""
    from graphsense_blocksci_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    cc = connected_components(pairs, src="id_a", dst="id_b")
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    labeled = d.join(cc, d.doc_id == cc.node, "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("component", "doc_id").alias("canonical_id"),
    )
    return labeled.groupBy("canonical_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        # composite integer key: larger n_chars wins, ties break to the
        # smaller doc_id (DuckDB's arg_max takes scalars, not structs)
        F.max_by(
            "doc_id",
            F.col("n_chars") * F.lit(1_000_000_000) - F.col("doc_id"),
        )
        .cast("long")
        .alias("keep_id"),
        F.max("n_chars").cast("long").alias("keep_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q212_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution — how long converting users take
    from first view to purchase (the metric the q127 funnel feeds):
    per converting user the view→click and view→purchase latencies in
    integer seconds, summarized as counts plus exact interpolated
    quartiles under the bit-portable percentile contract (q59). The
    funnel stages are q127's chained conditional-min aggregations;
    the summary is one aggregate over the converting-user frame."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").cast("long").alias("e"),
        "event_type",
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("e").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("e") >= F.col("t_view"))
            & (F.col("e") <= F.col("t_view") + 86400)
        )
        .groupBy("user_id")
        .agg(F.min("e").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("e") >= F.col("t_click"))
            & (F.col("e") <= F.col("t_click") + 86400)
        )
        .groupBy("user_id")
        .agg(F.min("e").alias("t_purchase"))
    )
    conv = (
        v.join(c, "user_id")
        .join(p, "user_id")
        .select(
            (F.col("t_click") - F.col("t_view")).alias("s_click"),
            (F.col("t_purchase") - F.col("t_view")).alias("s_purchase"),
        )
    )
    agg = conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converters"),
        F.min("s_purchase").cast("long").alias("min_s"),
        F.max("s_purchase").cast("long").alias("max_s"),
        F.expr("percentile(s_click, array(0.25D, 0.5D, 0.75D))").alias("_cq"),
        F.expr("percentile(s_purchase, array(0.25D, 0.5D, 0.75D))").alias(
            "_pq"
        ),
    )
    return agg.select(
        "n_converters",
        "min_s",
        "max_s",
        F.col("_cq")[0].alias("click_q1"),
        F.col("_cq")[1].alias("click_q2"),
        F.col("_cq")[2].alias("click_q3"),
        F.col("_pq")[0].alias("purchase_q1"),
        F.col("_pq")[1].alias("purchase_q2"),
        F.col("_pq")[2].alias("purchase_q3"),
    )


def q209_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope over the daily order-count series
    — the outlier-immune counterpart of the q192 OLS family and the
    estimator the q193 Mann-Kendall test is usually paired with: the
    MEDIAN of all pairwise slopes (x_j − x_i)/(day_j − day_i). Each
    slope is ONE IEEE divide of exact integers (identical in any
    engine), and the median is the bit-portable interpolated
    percentile contract (q59). Aggregate-first: the pair join is a
    broadcast self-join bounded by |days|², never corpus-sized. The
    pair count and the slope sign counts ride along as exact
    integers."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.floor(F.unix_timestamp("o_orderdate") / 86400)).cast("long").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    a = daily.select(F.col("day").alias("di"), F.col("x").alias("xi"))
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    slopes = a.join(F.broadcast(b), F.col("di") < F.col("dj")).select(
        (
            (F.col("xj") - F.col("xi")).cast("double")
            / (F.col("dj") - F.col("di")).cast("double")
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("slope") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_positive"),
        F.sum(F.when(F.col("slope") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
        F.expr("percentile(slope, 0.5D)").alias("theil_sen_slope"),
    )


def q210_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distribution drift test — the
    CDF-distance counterpart of the q151 TVD drift readout: order
    prices split into early/late halves by date, D = max |CDF_a −
    CDF_b| carried as the EXACT integer max |cum_a·n_b − cum_b·n_a|
    (the n_a·n_b common-denominator trick — no float CDFs anywhere),
    with the float D as one final divide. Values are quantized to a
    bounded grid (1000-cent buckets — near-unique raw prices would
    drag a row-sized frame through the single global cumulative
    window; the grid is the standard distributed-KS compromise and
    its resolution is the knob), so the CDF windows run over a few
    hundred rows regardless of corpus size."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(CAST(round(o_totalprice * 100) AS BIGINT) DIV 1000"
            " AS BIGINT)"
        ).alias("cents"),
        (
            F.col("o_orderdate")
            < F.lit("1998-01-01").cast("timestamp")
        ).cast("int").alias("early"),
    )
    per_value = o.groupBy("cents").agg(
        F.sum("early").cast("long").alias("ca"),
        F.sum(1 - F.col("early")).cast("long").alias("cb"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_value.select(
        "cents",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    tot = o.agg(
        F.sum("early").cast("long").alias("n_a"),
        F.sum(1 - F.col("early")).cast("long").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
            ).alias("_d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_d").cast("long").alias("d_scaled"))
        .select(
            "n_a",
            "n_b",
            "d_scaled",
            (
                F.col("d_scaled").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("ks_d"),
        )
    )


def qd36_miner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block miner revenue = coinbase output total (subsidy + the
    fees it sweeps) decomposed against the block's independently
    computed fee total (qd29's arithmetic), with the implied subsidy
    as the difference — the miner-economics table, and a built-in
    consistency audit of the chain fixture (coinbase value ≥ fees;
    subsidy = coinbase − fees). One coinbase projection + one fee
    aggregate + one block-keyed join; nothing scales past block
    count."""
    from graphsense_blocksci_spark.functions.io_aggs import io_total_value

    _, raw_txs, _ = _fixture_frames(spark)
    coinbase = raw_txs.filter(F.col("coinbase")).select(
        F.col("block_id").cast("long").alias("block_id"),
        io_total_value("outputs").cast("long").alias("coinbase_value"),
    )
    fees = (
        raw_txs.filter(~F.col("coinbase"))
        .select(
            F.col("block_id").cast("long").alias("block_id"),
            (io_total_value("inputs") - io_total_value("outputs"))
            .cast("long")
            .alias("fee"),
        )
        .groupBy("block_id")
        .agg(F.sum("fee").cast("long").alias("total_fee"))
    )
    return (
        coinbase.join(fees, "block_id", "left")
        .select(
            "block_id",
            "coinbase_value",
            F.coalesce("total_fee", F.lit(0)).cast("long").alias("total_fee"),
            (
                F.col("coinbase_value")
                - F.coalesce("total_fee", F.lit(0))
            )
            .cast("long")
            .alias("subsidy"),
        )
    )


def qd34_peeling_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peeling-chain detection over the real fixture chain — the
    classic Bitcoin obfuscation pattern (one UTXO repeatedly "peeled":
    each hop is a single-input tx spending the previous hop's output).
    Hop edges = single-input tx B whose input spends an output of
    single-input tx A; chains = connected components of the hop graph
    (the same adaptive CC as entity clustering); reported per chain
    with length and the tx-id span, chains of >= 3 txs (i.e. >= 2 hop
    edges) only — the investigator's shortlist; the oracle pins the
    same n_txs >= 3 threshold. Oracle: recursive-CTE min-label over
    the identical hop edges."""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
    )
    from graphsense_blocksci_spark.operators.linkage import explode_inputs

    _, raw_txs, _ = _fixture_frames(spark)
    single = (
        raw_txs.filter(~F.col("coinbase"))
        .filter(F.size("inputs") == 1)
        .select(
            F.col("tx_id").cast("long").alias("tx_id"),
            F.col("inputs")[0]["spent_tx_id"].cast("long").alias("parent"),
        )
    )
    parents = single.select(F.col("tx_id").alias("parent")).distinct()
    edges = single.join(parents, "parent").select(
        F.col("parent").alias("src"), F.col("tx_id").alias("dst")
    )
    cc = connected_components(edges)
    return (
        cc.groupBy(F.col("component").alias("chain_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_txs"),
            F.min("node").cast("long").alias("first_tx"),
            F.max("node").cast("long").alias("last_tx"),
        )
        .filter(F.col("n_txs") >= 3)
    )


def qd35_address_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address-reuse histogram over the real fixture chain — the
    privacy-hygiene statistic (how many addresses receive 1, 2, 4+
    times) every chain-analytics report leads with. One output
    explode (multisig output address arrays unnest to their member
    addresses), one per-address count, one log2-binned histogram with
    value totals — all integers, never a per-address frame leaving
    the aggregate."""
    from graphsense_blocksci_spark.operators.linkage import explode_outputs

    _, raw_txs, _ = _fixture_frames(spark)
    outs = explode_outputs(raw_txs)
    per_addr = (
        outs.select(F.explode("address").alias("addr"), "value")
        .groupBy("addr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_received"),
            F.sum("value").cast("long").alias("total_value"),
        )
    )
    return per_addr.groupBy(
        F.length(F.bin(F.col("n_received"))).cast("long").alias("log2_bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_addresses"),
        F.min("n_received").alias("min_received"),
        F.max("n_received").alias("max_received"),
        F.sum("total_value").cast("long").alias("sum_value"),
    )


def q204_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-based benchmark decontamination — the third
    decontamination modality next to n-gram overlap (q91) and the
    Bloom prefilter (q122): corpus vectors whose cosine against ANY
    held-out eval vector reaches the near-dup threshold are flagged
    with their match count and best similarity. The eval set
    (vec_id % 20 == 0) broadcasts — KBs at any corpus size — and
    every cosine is the fixed-order fold on unit vectors, so max/count
    per corpus vector are engine-exact. At 100 TB this is one
    broadcast-join scan; the LSH-bucketed variant (q46 machinery)
    takes over when the eval set itself is huge."""
    emb = load_table(spark, sf_dir, "embeddings")
    from graphsense_blocksci_spark.operators.similarity import unit_vector

    uv = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        unit_vector(F.col("embedding")).alias("_uv"),
    )
    ev = uv.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("_uv").alias("_ev")
    )
    corpus = uv.filter(F.col("vec_id") % 20 != 0)
    from graphsense_blocksci_spark.operators.similarity import dot

    scored = corpus.crossJoin(F.broadcast(ev)).select(
        "vec_id", dot(F.col("_uv"), F.col("_ev")).alias("cos_sim")
    )
    return (
        scored.filter(F.col("cos_sim") >= 0.35)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max("cos_sim").alias("max_sim"),
        )
    )


def q203_groupwise_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group approximate distinct users (distinct users per event
    type) via the oracle-exact HLL — the group-wise form every
    engagement dashboard runs at 100 TB, where per-group exact
    countDistinct would Expand the fact table. Registers key by
    (group, bucket) — at most |groups|·2^p rows after map-side max —
    and the per-group estimate keeps the q199 discipline (exact
    integer harmonic numerator, one floored double divide). Exact
    per-group distinct rides along for error context (affordable at
    fixture scale; the sketch replaces it at real scale)."""
    from graphsense_blocksci_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("long").alias("user_id")
    )
    reg = hll_registers(ev, "user_id", p=8, group_cols=["event_type"])
    est = hll_estimate(reg, p=8, group_cols=["event_type"])
    truth = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    return est.join(truth, "event_type")


def q200_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert verb) expressed
    as one full-outer join + CASE — the engine-level form every
    lakehouse MERGE compiles to: a deterministic change-set against
    orders (urgent orders get re-priced = WHEN MATCHED UPDATE;
    synthetic follow-up orders = WHEN NOT MATCHED INSERT; fulfilled
    'F'-status orders in the change window = WHEN MATCHED DELETE).
    Returns the post-merge state summarized per status with integer
    cents totals plus action counts, so the oracle pins every clause.
    One shuffle on the merge key; at 100 TB this plus dynamic
    partition overwrite (A21) is the upsert story."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    changes = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "k",
        F.col("o_orderstatus").alias("cs"),
        (F.col("cents") + 500).alias("new_cents"),
    )
    inserts = changes.select(
        (F.col("k") + F.lit(10_000_000_000)).alias("k"),
        F.lit("I").alias("o_orderstatus"),
        F.col("new_cents").alias("cents"),
        F.lit("insert").alias("_action"),
    )
    merged = (
        o.join(changes, "k", "full_outer")
        .select(
            "k",
            "o_orderstatus",
            F.when(
                F.col("cs").isNotNull() & (F.col("o_orderstatus") == "F"),
                F.lit("delete"),
            )
            .when(F.col("cs").isNotNull(), F.lit("update"))
            .otherwise(F.lit("keep"))
            .alias("_action"),
            F.when(F.col("cs").isNotNull(), F.col("new_cents"))
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .filter(F.col("_action") != "delete")
        .select("k", "o_orderstatus", "cents", "_action")
        .unionByName(inserts.select("k", "o_orderstatus", "cents", "_action"))
    )
    return merged.groupBy("o_orderstatus", "_action").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


def q201_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + OTHERS rollup — the BI staple: per return flag, the
    top-3 suppliers by revenue keep their identity and every other
    supplier collapses into one 'OTHERS' row (revenue and member
    count aggregated), so dashboards stay bounded however many
    suppliers exist. Rank ties broken by supplier id (total order);
    revenue in integer cents. One group aggregate + one ranked window
    over the per-supplier rollup (supplier-count-sized, not
    fact-sized) + one re-aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(
        "l_returnflag", F.col("l_suppkey").cast("long").alias("supp")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cents"), F.asc("supp")
    )
    ranked = per_supp.withColumn("rk", F.row_number().over(w))
    return (
        ranked.select(
            "l_returnflag",
            F.when(F.col("rk") <= 3, F.col("supp").cast("string"))
            .otherwise(F.lit("OTHERS"))
            .alias("who"),
            "cents",
        )
        .groupBy("l_returnflag", "who")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


def q202_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree distribution of the co-supplier graph — the
    first diagnostic run on any 100 TB graph (is there a hub tail?
    how skewed will the joins be?). The log2 bin is the INTEGER
    binary-string length of the degree (no float log), so the
    histogram is exact and engine-portable; degrees come from one
    symmetric aggregate over the q120 edge set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        deg.groupBy(F.length(F.bin(F.col("deg"))).cast("long").alias("log2_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
            F.sum("deg").cast("long").alias("sum_deg"),
        )
    )


def qd32_streaming_shard_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the q196 rendezvous router: events staged as
    a file-source stream, each row routed to its HRW shard (argmax of
    md5(event_id:shard) over 8 shard literals — a pure streaming
    projection, no state), written to a SHARD-PARTITIONED parquet sink
    with availableNow, sink read back and summarized per shard. This
    is the streaming ingest-router every 100 TB pipeline runs in front
    of its lake: placement must be deterministic across retries and
    micro-batch boundaries, which is exactly what the batch oracle
    checks (same rule, same histogram, cell-exact)."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id")
    )
    work = tempfile.mkdtemp(prefix="gbs_router_")
    ev.write.mode("overwrite").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema("event_id long")
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{work}/src")
    )
    shards = 8
    weights = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("event_id").cast("string"),
                            F.lit(str(s)),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("w"),
            F.lit(s).cast("long").alias("shard"),
        )
        for s in range(shards)
    ]
    routed = stream.select(
        "event_id", F.greatest(*weights).getField("shard").alias("shard")
    )
    q = (
        routed.writeStream.format("parquet")
        .partitionBy("shard")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("qd32 streaming router did not finish in 600s")
    out = spark.read.parquet(f"{work}/sink")
    return out.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


def q198_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style snapshot reconciliation — how two 100 TB replicas
    are compared WITHOUT shipping rows: each side folds its rows into
    per-bucket checksums (bucket = key mod 64; checksum = SUM of a
    row-content hash — an order-independent integer fold, so it's
    partitioning/engine-agnostic; 48-bit md5 prefix so ~30k rows per
    bucket stay under int64 — at larger bucket fan-in, widen buckets,
    not the hash), and only the bucket digests are joined. Buckets that agree are pruned; the frame reports every
    bucket with its two digests, row counts and match flag. The two
    "snapshots" are derived deterministically from orders (the second
    drops one priority class and re-prices it — a real drift shape).
    At scale each side is one aggregate of 64 rows; the compare is a
    broadcast join of digests, never data."""
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    snap_b = snap_a.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_orderkey").cast("long").alias("k"),
            F.lit(1).alias("_bump"),
        ),
        "k",
        "left",
    ).select(
        "k",
        F.when(F.col("_bump").isNotNull(), F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def digests(snap, side):
        row_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("k").cast("string"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        return snap.groupBy((F.col("k") % 64).alias("bucket")).agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{side}"),
            F.sum(row_hash).cast("long").alias(f"digest_{side}"),
        )

    da = digests(snap_a, "a")
    db = digests(snap_b, "b")
    return (
        da.join(db, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.coalesce("digest_a", F.lit(0)).cast("long").alias("digest_a"),
            F.coalesce("digest_b", F.lit(0)).cast("long").alias("digest_b"),
            (
                F.coalesce("digest_a", F.lit(0))
                == F.coalesce("digest_b", F.lit(0))
            )
            .cast("int")
            .alias("bucket_matches"),
        )
    )


def q196_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-placement primitive a 100 TB pipeline uses to route
    keys to 8 shards so that adding/removing a shard only moves 1/n of
    the keys (unlike mod-n, where everything moves). Per key the shard
    is argmax over shards of md5(key:shard) — a zero-shuffle projection
    (greatest over 8 hash literals inlined by Catalyst); the emitted
    frame is the per-shard histogram plus key ranges, pinning both the
    assignment rule and its balance. Fully deterministic and
    engine-portable (the repo's 28-bit md5-prefix convention)."""
    o = load_table(spark, sf_dir, "orders")
    shards = 8
    weights = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("o_orderkey").cast("string"), F.lit(str(s))
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("w"),
            F.lit(s).cast("long").alias("shard"),
        )
        for s in range(shards)
    ]
    assigned = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.greatest(*weights).getField("shard").alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def q197_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key candidate discovery by containment counting — the
    schema-profiling pass (how q175's constraint suite gets its
    constraints in the first place): for each candidate (child.col →
    parent.col) pair, |distinct(child)|, |distinct(parent)| and the
    containment |distinct(child) ∩ distinct(parent)| as exact integer
    counts plus the ppm containment ratio. A true FK has ratio
    1_000_000; the deliberately-wrong pair (custkey → orderkey) pins
    the negative case. Each pair is two pruned distinct scans + one
    join on the candidate key — never a row-level join of the tables."""
    pairs = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("orders", "o_custkey", "orders", "o_orderkey"),
    ]
    out = None
    for child_t, child_c, parent_t, parent_c in pairs:
        child = (
            load_table(spark, sf_dir, child_t)
            .select(F.col(child_c).cast("long").alias("k"))
            .distinct()
        )
        parent = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(parent_c).cast("long").alias("k"))
            .distinct()
        )
        nc = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        np_ = parent.agg(F.count(F.lit(1)).cast("long").alias("n_parent"))
        ni = child.join(parent, "k").agg(
            F.count(F.lit(1)).cast("long").alias("n_contained")
        )
        row = (
            nc.crossJoin(np_)
            .crossJoin(ni)
            .select(
                F.lit(f"{child_t}.{child_c}").alias("child"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent"),
                "n_child",
                "n_parent",
                "n_contained",
                F.expr(
                    "CAST(1000000 * n_contained DIV n_child AS BIGINT)"
                ).alias("containment_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def qd40_streaming_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING top-N + OTHERS rollup — the stateful twin of q201's
    dashboard staple (streaming/topn.py:topn_others_stream): lineitem
    rows staged as a file stream, each return-flag group's
    supplier→running-cents map folded in the applyInPandasWithState
    store, each batch emitting the group's refreshed top-3 + OTHERS
    snapshot. Run exact (capacity=None — state bounded by the
    supplier DIMENSION per group) and availableNow single-batch, so
    the final snapshot IS the batch rollup and q201's SQL oracle
    gates it cell-exact; the capacity-bounded Misra-Gries regime is
    pytest-gated against batch top-N membership instead."""
    import tempfile

    from graphsense_blocksci_spark.streaming.topn import topn_others_stream

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_suppkey").cast("long").alias("supp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="gbs_topn_")
    li.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema(
        "l_returnflag string, supp long, cents long"
    ).parquet(f"{work}/src")
    q = (
        topn_others_stream(
            stream, "l_returnflag", "supp", "cents", n=3, capacity=None
        )
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = spark.read.schema(
        "group string, who string, n_members long, n_rows long,"
        " sum_value long, seq long"
    ).parquet(f"{work}/out")
    # latest snapshot per group (single batch => seq is 1 everywhere)
    return (
        snap.withColumn("_mx", F.max("seq").over(Window.partitionBy("group")))
        .filter(F.col("seq") == F.col("_mx"))
        .select(
            F.col("group").alias("l_returnflag"),
            "who",
            F.col("n_members").cast("long").alias("n_suppliers"),
            F.col("sum_value").cast("long").alias("sum_cents"),
        )
    )


def qd41_streaming_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift monitor: per-day event-value histograms
    maintained by a single watermarked window aggregation on the
    stream (streaming/drift.py:windowed_histogram_stream — state is
    (windows in flight) × (grid cells), pure built-ins, no custom
    state), then each day's two-sample KS distance against the
    whole-corpus reference computed from the sink's tiny histogram
    rows with q210's exact-integer cross-multiplied max. availableNow
    finalizes every window, so the batch oracle replays the identical
    day × cell counts and KS arithmetic in SQL."""
    import tempfile

    from graphsense_blocksci_spark.streaming.drift import (
        ks_against_reference,
        windowed_histogram_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="gbs_drift_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("ts timestamp, cents long").parquet(
        f"{work}/src"
    )
    q = (
        windowed_histogram_stream(
            stream, "ts", "cents", window_duration="1 day", cell_width=1000
        )
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hist = spark.read.schema(
        "window_start timestamp, cell long, cnt long"
    ).parquet(f"{work}/out")
    # reference = the whole corpus on the same grid (batch-side, tiny)
    ref = ev.groupBy(
        (F.col("cents") / F.lit(1000)).cast("long").alias("cell")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return ks_against_reference(hist, ref).select(
        F.col("window_start").cast("timestamp").alias("window_start"),
        "n_window",
        "n_ref",
        "d_scaled",
        "ks_d",
    )


def qd42_address_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GraphSense address→transactions INVERTED INDEX on the real
    fixture chain (operators/linkage.py:address_transactions): one row
    per (address, tx) with directional flow splits, the net value, and
    the address's 1-based position in its own history ordered by
    (block height, tx id) — the clustering-key order the reference's
    consumers page the raw keyspace by (schema.cql:21-34 exports the
    `transaction` rows this index is derived from). Oracle: a DuckDB
    window over the identical exploded-output/linkage CTEs."""
    from graphsense_blocksci_spark.operators.linkage import (
        address_transactions,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    return address_transactions(raw_txs).select(
        "addr",
        F.col("tx_id").cast("long").alias("tx_id"),
        "block_id",
        "n_received_outputs",
        "received_value",
        "n_spent_inputs",
        "spent_value",
        "net_value",
        "tx_seq",
    )


def qd43_entity_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entity-level inverted index: qd42's per-address transaction
    rows rolled up to qd16's co-spend entities — per (entity, tx), the
    member flows netted and re-sequenced by (block height, tx id)
    within the entity. The drill-down GraphSense's transformation
    stage serves for cluster pages; rides the same linkage machinery,
    one extra broadcast-sized entity-map join + one window."""
    from graphsense_blocksci_spark.operators.linkage import (
        address_transactions,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    atx = address_transactions(raw_txs)
    ents = qd16_cospend_entities(spark, sf_dir)
    per_tx = (
        atx.join(F.broadcast(ents), "addr", "left")
        .select(
            # singleton addresses (never co-spent) keep their own
            # 28-bit hash as entity id, matching qd16's convention
            F.coalesce(
                F.col("entity"),
                F.conv(F.substring(F.md5("addr"), 1, 7), 16, 10).cast("long"),
            ).alias("entity"),
            "tx_id",
            "block_id",
            "n_received_outputs",
            "received_value",
            "n_spent_inputs",
            "spent_value",
        )
        .groupBy("entity", "tx_id", "block_id")
        .agg(
            F.sum("n_received_outputs").cast("long").alias("n_received_outputs"),
            F.sum("received_value").cast("long").alias("received_value"),
            F.sum("n_spent_inputs").cast("long").alias("n_spent_inputs"),
            F.sum("spent_value").cast("long").alias("spent_value"),
        )
    )
    w = Window.partitionBy("entity").orderBy("block_id", "tx_id")
    return per_tx.select(
        "entity",
        F.col("tx_id").cast("long").alias("tx_id"),
        "block_id",
        "n_received_outputs",
        "received_value",
        "n_spent_inputs",
        "spent_value",
        (F.col("received_value") - F.col("spent_value"))
        .cast("long")
        .alias("net_value"),
        F.row_number().over(w).cast("long").alias("tx_seq"),
    )


def q218_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the directed co-supplier chain
    graph (operators/graph.py:hits) — 2 un-normalized iterations, so
    every score is an EXACT int64 (integer sums only, order-free,
    hash-comparable; rankings identical to the normalized iteration,
    normalization is the consumer's divide). Completes the centrality
    family: PageRank (q84), PPR (q130), harmonic (q148), betweenness
    (q169). Oracle: the literal CTE chain — one join+aggregate per
    half-round."""
    from graphsense_blocksci_spark.operators.graph import hits

    li = load_table(spark, sf_dir, "lineitem")
    edges = _supplier_chain_edges(li)
    return hits(edges, iterations=2).select(
        F.col("node").cast("long").alias("node"),
        "authority",
        "hub",
    )


def q219_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the q194 co-supplier
    graph: the Pearson correlation of end-point degrees over the
    SYMMETRIZED edge list, carried as the exact integer sufficient
    statistics (m2 = directed-pair count, Σd, Σd·d', Σd²) with the
    float r as ONE final expression — the one-scan answer to "do
    hubs attach to hubs?" that decides whether degree-based
    partitioning will skew. One self-join + one degree aggregate +
    one broadcast-degree join; no iteration."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # pin: deg feeds both endpoint joins below — one degree shuffle,
    # not two
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    pairs = (
        sym.join(deg.select(F.col("node").alias("u"),
                            F.col("deg").alias("dx")), "u")
        .join(deg.select(F.col("node").alias("v"),
                         F.col("deg").alias("dy")), "v")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sx2"),
    )
    return agg.select(
        "m2",
        "sx",
        "sxy",
        "sx2",
        (
            (F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sx"))
            .cast("double")
            / (F.col("m2") * F.col("sx2") - F.col("sx") * F.col("sx"))
            .cast("double")
        ).alias("assortativity"),
    )


def q220_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment (asymmetric Jaccard) self-join
    (operators/setsim.py:containment_join) over 3-gram shingle
    hashes: every DIRECTED pair with |A∩B|/|A| >= 0.8 — the
    doc-in-doc / quote-detection primitive symmetric Jaccard (q155)
    misses (a short doc fully quoted inside a long one has tiny
    Jaccard but containment 1.0). Asymmetric prefix filter: only the
    contained side prunes to its rarest tokens, the container side
    indexes in full — no false negatives; brute-force all-pairs
    oracle."""
    from graphsense_blocksci_spark.operators.setsim import containment_join
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hash_frame,
    )

    docs = shingle_hash_frame(load_table(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("_sh").alias("gs"),
    )
    return containment_join(docs, "doc_id", "gs", threshold_pct=80)


def q221_duplicate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-sentence detection — the C4-style
    boilerplate scan (navigation chrome, cookie banners, license
    blurbs repeat VERBATIM across pages; per-sentence dedup is how
    the cleaning pipelines strip them). Sentences split on [.!?],
    trimmed, length-filtered (>= 20 chars), hashed to the repo's
    28-bit md5 key; a sentence appearing in >= 2 DISTINCT documents
    is boilerplate-suspect. Emits every such sentence hash with its
    document count and total occurrence count — the removal pass's
    worklist, deterministic on both engines. The synthetic corpus has
    no natural cross-doc repeats, so the q114 dirty-augmentation
    convention injects them: every third document carries the shared
    license blurb, and a per-(doc_id%5) cookie banner recurs across
    its residue class — the known-answer both engines construct
    identically.

    Scale shape: one explode + two aggregates, all keyed by the
    uniform sentence hash; nothing pairwise anywhere (the naive
    formulation would be a sentence-level self-join)."""
    from graphsense_blocksci_spark.operators.textops import hash28

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(
                    ". this content is licensed for personal"
                    " noncommercial use only."
                ),
            ).otherwise(F.lit("")),
            F.lit(". accept cookies to continue reading banner "),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(" of this site."),
        ).alias("text"),
    )
    sents = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col("text"), r"[.!?]")).alias("s"),
    ).select("doc_id", F.trim(F.col("s")).alias("s"))
    keyed = sents.filter(F.length("s") >= 20).select(
        "doc_id", hash28(F.col("s")).alias("sh")
    )
    return (
        keyed.groupBy("sh")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def q222_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII prevalence profile per source domain — the measurement pass
    that decides WHERE the q114 redaction budget goes: per source,
    document counts, per-category match totals (URL → EMAIL → IP →
    longnum, counted under q114's staged discipline so sentinels
    never re-match), and how many documents carry each category.
    Rides the q114 deterministic dirty-augmentation convention (the
    raw fixture text is PII-free, so the doc_id-derived suffix is the
    portable signal both engines construct identically)."""
    from graphsense_blocksci_spark.operators.redaction import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com visit https://host"),
            F.col("doc_id").cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" acct "),
            (F.lit(100000000) + F.col("doc_id") * 917).cast("string"),
        ).alias("text"),
    )
    counted = redact_pii(dirty, "text")
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_urls").cast("long").alias("total_urls"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_ips").cast("long").alias("total_ips"),
        F.sum("n_longnums").cast("long").alias("total_longnums"),
        F.sum(F.when(F.col("n_emails") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_email"),
        F.sum(F.when(F.col("n_longnums") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_longnum"),
    )


def qd44_incremental_address_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL maintenance of the qd42 address→transactions index
    — the way the transformation stage actually runs in production
    (nobody recomputes the inverted index from genesis per batch):
    the chain splits at a height cutoff into a BASE snapshot (the
    already-materialized index) and a DELTA of new blocks; delta
    flows are derived from delta txs only (credits from delta
    outputs; debits from delta inputs resolved against the FULL
    output set, since new inputs spend old outputs); then ONLY the
    touched addresses (those with any delta row — a semi join) are
    re-sequenced, untouched addresses keep their materialized rows
    and tx_seq verbatim.

    Scale shape: per batch the work is delta-sized + the touched
    addresses' histories — the linkage shuffle is delta inputs vs the
    output index (uniform key), the semi join is touched-address-
    sized, and the re-rank window runs only over touched addresses.
    The oracle is the FULL recompute (qd42's SQL): cell-exact
    equality IS the proof that incremental maintenance loses
    nothing."""
    from graphsense_blocksci_spark.operators.linkage import (
        address_transactions,
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    cutoff = 60  # ~2/3 of the fixture chain in the base snapshot
    base = raw_txs.filter(F.col("block_id") <= cutoff)
    delta = raw_txs.filter(F.col("block_id") > cutoff)

    # the materialized snapshot (in production: read back from the
    # sink; lineage-pinned so the audit sees one base pass)
    old = address_transactions(base).localCheckpoint(eager=False)

    # delta flows: credits from delta outputs; debits from delta
    # inputs resolved against ALL outputs (old spends cross the cut)
    all_outs = (
        explode_outputs(raw_txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            "value",
        )
    )
    credit = (
        explode_outputs(delta)
        .filter(F.size("address") > 0)
        .select("tx_id", F.concat_ws("|", "address").alias("addr"), "value")
        .groupBy("addr", "tx_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_received_outputs"),
            F.sum("value").cast("long").alias("received_value"),
        )
    )
    debit = (
        link_inputs_to_outputs(
            explode_inputs(delta.filter(~F.col("coinbase"))), all_outs
        )
        .filter(F.col("addr").isNotNull())
        .groupBy("addr", "tx_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spent_inputs"),
            F.sum("value").cast("long").alias("spent_value"),
        )
    )
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("block_id")
    )
    delta_rows = (
        credit.join(debit, ["addr", "tx_id"], "full_outer")
        .select(
            "addr",
            "tx_id",
            F.coalesce("n_received_outputs", F.lit(0))
            .cast("long")
            .alias("n_received_outputs"),
            F.coalesce("received_value", F.lit(0))
            .cast("long")
            .alias("received_value"),
            F.coalesce("n_spent_inputs", F.lit(0))
            .cast("long")
            .alias("n_spent_inputs"),
            F.coalesce("spent_value", F.lit(0))
            .cast("long")
            .alias("spent_value"),
        )
        .join(heights, "tx_id")
        .select(
            "addr",
            "tx_id",
            "block_id",
            "n_received_outputs",
            "received_value",
            "n_spent_inputs",
            "spent_value",
            (F.col("received_value") - F.col("spent_value"))
            .cast("long")
            .alias("net_value"),
        )
        .localCheckpoint(eager=False)
    )
    touched = delta_rows.select("addr").distinct()
    untouched_rows = old.join(touched, "addr", "left_anti")
    resequenced = (
        old.drop("tx_seq")
        .join(F.broadcast(touched), "addr", "semi")
        .unionByName(delta_rows)
    )
    w = Window.partitionBy("addr").orderBy("block_id", "tx_id")
    resequenced = resequenced.withColumn(
        "tx_seq", F.row_number().over(w).cast("long")
    )
    return untouched_rows.unionByName(resequenced).select(
        "addr",
        F.col("tx_id").cast("long").alias("tx_id"),
        "block_id",
        "n_received_outputs",
        "received_value",
        "n_spent_inputs",
        "spent_value",
        "net_value",
        "tx_seq",
    )


def qd45_balance_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealth-concentration Gini coefficient over positive address
    balances on the fixture chain — the BlockSci-paper-style
    concentration readout. The classic rank formula carried as EXACT
    integers: with balances sorted ascending and ranked 1..n
    (ties broken by address — within a tie the rank SUM is
    permutation-invariant, so the statistic is order-free),
    G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx); numerator and denominator
    ride as int64, the float G is one final divide. The global rank
    is the DISTRIBUTED two-pass range-partitioned rank
    (operators/windows.py:global_rank) — a bare
    row_number().over(orderBy) would funnel every address through one
    task; here the sort runs partition-parallel and only the
    partition-count offsets frame is serial."""
    from graphsense_blocksci_spark.operators.linkage import address_balances
    from graphsense_blocksci_spark.operators.windows import global_rank

    _, raw_txs, _ = _fixture_frames(spark)
    b = (
        address_balances(raw_txs)
        .filter(F.col("balance") > 0)
        .select("addr", F.col("balance").cast("long").alias("x"))
    )
    ranked = global_rank(b, ["x", "addr"], rank_col="rk").select("x", "rk")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum(F.col("rk") * F.col("x")).cast("long").alias("sum_rx"),
    )
    return agg.select(
        "n",
        "sum_x",
        (F.lit(2) * F.col("sum_rx") - (F.col("n") + 1) * F.col("sum_x"))
        .cast("long")
        .alias("gini_num"),
        (F.col("n") * F.col("sum_x")).cast("long").alias("gini_den"),
        (
            (F.lit(2) * F.col("sum_rx") - (F.col("n") + 1) * F.col("sum_x"))
            .cast("double")
            / (F.col("n") * F.col("sum_x")).cast("double")
        ).alias("gini"),
    )


def qd46_nakamoto_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nakamoto coefficient of the co-spend entity balances: the
    minimum number of entities whose combined positive balance
    exceeds HALF the total — the standard decentralization readout,
    computed on qd16's entities (addresses never co-spent stay their
    own entity via the shared 28-bit hash). Exact integers end to
    end: the cutover test is 2·cumsum > total on a descending
    (balance, entity) order over the entity-sized rollup. The
    cumulative sum is DISTRIBUTED two-pass (range-partition on the
    total order, local running sums, tiny per-partition offset
    frame) — the global_rank trick applied to sums, so no
    single-task window even with billions of entities."""
    from graphsense_blocksci_spark.operators.linkage import address_balances
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    bal = address_balances(raw_txs).select(
        "addr", F.col("balance").cast("long").alias("balance")
    )
    ents = qd16_cospend_entities(spark, sf_dir)
    ebal = (
        bal.join(F.broadcast(ents), "addr", "left")
        .select(
            F.coalesce(F.col("entity"), hash28(F.col("addr"))).alias("entity"),
            "balance",
        )
        .groupBy("entity")
        .agg(F.sum("balance").cast("long").alias("bal"))
        .filter(F.col("bal") > 0)
        # pin: ebal feeds the ranged cumsum AND the totals aggregate —
        # unpinned, the whole clustering+ledger subplan runs twice
        .localCheckpoint(eager=False)
    )
    ranged = ebal.withColumn("_neg", -F.col("bal")).repartitionByRange(
        32, "_neg", "entity"
    ).withColumn("_pid", F.spark_partition_id())
    wl = (
        Window.partitionBy("_pid")
        .orderBy("_neg", "entity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # pin: local feeds both the per-partition sums and the offset join
    local = ranged.withColumn(
        "_lcum", F.sum("bal").over(wl)
    ).localCheckpoint(eager=False)
    psums = local.groupBy("_pid").agg(F.sum("bal").alias("_psum"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = psums.select(
        "_pid", F.coalesce(F.sum("_psum").over(wo), F.lit(0)).alias("_off")
    )
    cum = (
        local.join(F.broadcast(offs), "_pid")
        .select(
            "entity",
            "bal",
            (F.col("_lcum") + F.col("_off")).cast("long").alias("cum"),
        )
    )
    tot = ebal.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("bal").cast("long").alias("total_balance"),
    )
    # cum is increasing in rank, so the qualifying entities are a rank
    # suffix: nakamoto = n − |{2·cum > total}| + 1
    n_over = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("cum") > F.col("total_balance"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n_over"))
    )
    return (
        tot.crossJoin(F.broadcast(n_over))
        .select(
            "n_entities",
            "total_balance",
            (F.col("n_entities") - F.col("_n_over") + 1)
            .cast("long")
            .alias("nakamoto"),
        )
    )


def qd47_coin_days_destroyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coin-days destroyed per day — THE BlockSci-heritage velocity
    metric (old coins moving signal long-holder activity): every
    spent output contributes value × holding time, resolved through
    the B1 linkage (spending tx's timestamp − creating tx's
    timestamp). The value·seconds sum rides as an exact int64 per
    day; CDD in coin-days is its single final DIV 86400 (sum-then-
    divide, so the integer is order-free). One linkage shuffle + one
    day rollup."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    times = raw_txs.select(
        "tx_id", F.col("timestamp").cast("long").alias("ts")
    )
    outs = (
        explode_outputs(raw_txs)
        .select("tx_id", "output_index", "value")
        .join(times, "tx_id")
        .select(
            "tx_id",
            "output_index",
            "value",
            F.col("ts").alias("created_ts"),
        )
    )
    ins = (
        explode_inputs(raw_txs.filter(~F.col("coinbase")))
        .join(times, "tx_id")
        .select(
            "tx_id",
            "spent_tx_id",
            "spent_index",
            F.col("ts").alias("spend_ts"),
        )
    )
    linked = link_inputs_to_outputs(ins, outs).filter(
        F.col("created_ts").isNotNull()
    )
    return (
        linked.select(
            F.floor(F.col("spend_ts") / 86400).cast("long").alias("day"),
            (
                F.col("value")
                * (F.col("spend_ts") - F.col("created_ts"))
            ).cast("long").alias("vs"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spends"),
            F.sum("vs").cast("long").alias("value_seconds"),
            F.expr("CAST(sum(vs) DIV 86400 AS BIGINT)").alias("coin_days"),
        )
    )


def qd48_streaming_index_daemon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAMING face of qd44: the address→transactions index
    maintained by a foreachBatch daemon
    (streaming/index_daemon.py) over the chain staged as THREE
    block-range files (maxFilesPerTrigger=1 → three incremental
    merges: cold-start build, then two delta folds — cross-batch
    spends resolve against the accumulated output sink). The final
    index sink must equal the FULL recompute cell-for-cell, so the
    oracle is qd42's SQL — three merges must be invisible next to
    one batch pass. Files are staged in ascending block order
    (spends never precede the outputs they consume), matching the
    chain follower's arrival order."""
    import tempfile

    from graphsense_blocksci_spark.streaming.index_daemon import (
        read_index,
        run_index_daemon,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    work = tempfile.mkdtemp(prefix="gbs_idxd_")
    cuts = [(None, 30), (30, 60), (60, None)]
    for i, (lo, hi) in enumerate(cuts):
        part = raw_txs
        if lo is not None:
            part = part.filter(F.col("block_id") > lo)
        if hi is not None:
            part = part.filter(F.col("block_id") <= hi)
        # sequential writes => ascending modification times, so the
        # file source replays them in chain order
        part.coalesce(1).write.mode("overwrite").parquet(
            f"{work}/src/part{i}"
        )
    import shutil

    src = f"{work}/stream_src"
    import os
    import time as _time

    os.makedirs(src, exist_ok=True)
    base = int(_time.time())
    for i in range(len(cuts)):
        pdir = f"{work}/src/part{i}"
        for fn in sorted(os.listdir(pdir)):
            if fn.endswith(".parquet"):
                dst = f"{src}/part{i}.parquet"
                shutil.copy(f"{pdir}/{fn}", dst)
                # the file source orders micro-batches by modification
                # time; explicit +60s steps pin chain order (copies
                # landing in the same mtime tick would otherwise
                # replay blocks out of order — spends before outputs)
                os.utime(dst, (base + 60 * i, base + 60 * i))
    index_dir = run_index_daemon(
        spark,
        src,
        work,
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in raw_txs.schema
        ),
    )
    return read_index(spark, index_dir)


def qd49_reorg_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG RECOVERY in the streaming index daemon — the failure
    mode the reference only shields against (B7 safety lag) and the
    transformation stage must actually survive: after the daemon has
    indexed the full chain, a competing tip arrives for blocks ≥ 76
    (the original tip minus its 'leaf' transactions — non-coinbase
    txs whose outputs nothing ever spends, so the replacement chain
    stays linkage-closed). The daemon must roll the orphaned blocks
    out of both sinks, re-pack the tx_seq of every address that lost
    rows, and fold the replacement in. Oracle: the full qd42
    recompute over the POST-REORG chain (blocks ≤ 75 plus the
    surviving replacement txs) — cell-exact equality proves rollback
    loses nothing and leaves nothing orphaned behind."""
    import os
    import shutil
    import tempfile
    import time as _time

    from graphsense_blocksci_spark.streaming.index_daemon import (
        read_index,
        run_index_daemon,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    # leaves of the tip: non-coinbase txs in blocks >= 76 whose
    # outputs are never spent anywhere — dropping them keeps every
    # remaining input resolvable
    spent_txs = (
        raw_txs.filter(~F.col("coinbase"))
        .select(F.explode("inputs").alias("inp"))
        .select(F.col("inp.spent_tx_id").alias("tx_id"))
        .distinct()
    )
    leaves = (
        raw_txs.filter((F.col("block_id") >= 76) & ~F.col("coinbase"))
        .join(spent_txs, "tx_id", "left_anti")
        .select("tx_id")
    )
    replacement = raw_txs.filter(F.col("block_id") >= 76).join(
        F.broadcast(leaves), "tx_id", "left_anti"
    )

    work = tempfile.mkdtemp(prefix="gbs_reorg_")
    stages = [
        raw_txs.filter(F.col("block_id") <= 60),
        raw_txs.filter(F.col("block_id") > 60),
        replacement,
    ]
    src = f"{work}/stream_src"
    os.makedirs(src, exist_ok=True)
    base = int(_time.time())
    for i, part in enumerate(stages):
        pdir = f"{work}/src/part{i}"
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        for fn in sorted(os.listdir(pdir)):
            if fn.endswith(".parquet"):
                dst = f"{src}/part{i}.parquet"
                shutil.copy(f"{pdir}/{fn}", dst)
                os.utime(dst, (base + 60 * i, base + 60 * i))
    index_dir = run_index_daemon(
        spark,
        src,
        work,
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in raw_txs.schema
        ),
    )
    return read_index(spark, index_dir)


def qd50_address_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ADDRESS-level money-flow edge table — GraphSense's
    address_{incoming,outgoing}_relations, the finest-grained graph
    the transformation stage materializes (qd19 is its entity-level
    rollup). One row per (sending address → receiving address) with
    tx count and PROPORTIONALLY ATTRIBUTED value: within a tx, input
    address a sends output address b exactly
    ``out_b · in_a DIV total_in`` (exact integer floor — the
    deterministic engine-portable attribution; the sub-satoshi
    remainder is the floor's, never redistributed). Per-address slot
    values aggregate BEFORE pairing, so the per-tx pair fan-out is
    |distinct in-addrs| × |distinct out-addrs| — the real relations
    blow-up coinjoins cause; production caps it with the B5 coinjoin
    filter upstream, and the pair join itself is tx-keyed (AQE skew
    handling covers hot txs)."""
    _, raw_txs, _ = _fixture_frames(spark)
    ins = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "inp.address").alias("src_addr"),
            F.col("inp.value").cast("long").alias("in_val"),
        )
        .groupBy("tx_id", "src_addr")
        .agg(F.sum("in_val").cast("long").alias("in_val"))
    )
    tot = ins.groupBy("tx_id").agg(
        F.sum("in_val").cast("long").alias("total_in")
    )
    outs = (
        raw_txs.select("tx_id", F.explode("outputs").alias("out"))
        .filter(F.size("out.address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "out.address").alias("dst_addr"),
            F.col("out.value").cast("long").alias("out_val"),
        )
        .groupBy("tx_id", "dst_addr")
        .agg(F.sum("out_val").cast("long").alias("out_val"))
    )
    pairs = (
        ins.join(tot, "tx_id")
        .join(outs, "tx_id")
        .select(
            "tx_id",
            "src_addr",
            "dst_addr",
            # widen through DECIMAL(38,0): out_val * in_val can reach
            # ~2.5e19 (two 50-BTC satoshi values), past int64; the
            # quotient is <= out_val and fits back in a long
            F.expr(
                "CAST(CAST(out_val AS DECIMAL(38,0)) * in_val"
                " DIV total_in AS BIGINT)"
            ).alias("flow"),
        )
    )
    return (
        pairs.groupBy("src_addr", "dst_addr")
        .agg(
            F.count_distinct("tx_id").cast("long").alias("n_txs"),
            F.sum("flow").cast("long").alias("total_flow"),
        )
    )


def q223_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the DIRECTED clickstream
    transition graph (q164's edges, event types as 28-bit hashed
    nodes) — the directed classic `connected_components` cannot see:
    a funnel edge A→B without B→A must NOT merge A and B, while
    behavioral loops (browse⇄cart⇄checkout cycles) must. Uses
    operators/graph.py:strongly_connected_components (forward/
    backward min-label peeling — each phase one edge⋈label join +
    node-keyed min to fixpoint, SCCs labeled atomically per round).
    Oracle: recursive-CTE reachability closure + mutual-minimum
    labels over the identical edge set."""
    from graphsense_blocksci_spark.operators.graph import (
        strongly_connected_components,
    )
    from graphsense_blocksci_spark.operators.textops import hash28

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("u"),
        F.col("ts").cast("timestamp").cast("long").alias("t"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("event_type").alias("et"),
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    cyclic = (
        ev.withColumn("prev_et", F.lag("et").over(w))
        .filter(F.col("prev_et").isNotNull())
        .select(
            hash28(F.col("prev_et")).alias("src"),
            hash28(F.col("et")).alias("dst"),
        )
        .distinct()
    )
    # the raw transition graph is fully mutually reachable (one giant
    # SCC); the deterministic one-way "archive" sinks make the result
    # direction-discriminating — each sink must stay its own singleton
    # SCC even though the undirected CC would swallow it
    sinks = (
        ev.select("et")
        .distinct()
        .select(
            hash28(F.col("et")).alias("src"),
            hash28(F.concat(F.col("et"), F.lit("_archive"))).alias("dst"),
        )
    )
    return strongly_connected_components(cyclic.unionByName(sinks))


def q224_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the remaining built-in columnar format next
    to Parquet/CSV/JSON (q29) and binaryFile (qd23): the per-flag
    revenue rollup writes to ORC (zlib, dictionary-encoded) and
    reads back; the returned frame must be byte-identical to the
    plan that never touched disk, which is exactly what the oracle
    (the same rollup in SQL) checks. Format coverage, pushdown and
    schema round-trip in one query."""
    import tempfile

    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
    )
    path = tempfile.mkdtemp(prefix="gbs_orc_") + "/rollup.orc"
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path).select(
        "l_returnflag", "l_linestatus", "n_rows", "sum_cents"
    )


def q225_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string surface: every other query declares its plan
    through the DataFrame API; this one registers temp views and runs
    ANSI SQL through spark.sql() verbatim — Catalyst sees the
    identical logical plan either way (one parser in front of the
    same optimizer), which the oracle proves by running the SAME
    text on DuckDB. A reference user who writes SQL, not Python,
    switches with zero translation."""
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlv_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS total_cents
        FROM sqlv_customer c
        JOIN sqlv_nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN sqlv_orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name
        """
    )


def qd51_streaming_duplicate_sentences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING boilerplate discovery — q221's stateful twin
    (streaming/boilerplate.py): the q114-convention boilerplate-
    augmented documents staged as a file stream, each sentence hash
    folding its (distinct-doc set, occurrence count) into the state
    store; availableNow single-batch, so the final snapshot filtered
    to n_docs >= 2 IS the batch scan and q221's SQL oracle gates it
    cell-exact (cap unsaturated at this scale)."""
    import tempfile

    from graphsense_blocksci_spark.streaming.boilerplate import (
        duplicate_sentences_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(
                    ". this content is licensed for personal"
                    " noncommercial use only."
                ),
            ).otherwise(F.lit("")),
            F.lit(". accept cookies to continue reading banner "),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(" of this site."),
        ).alias("text"),
    )
    work = tempfile.mkdtemp(prefix="gbs_bp_")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{work}/src"
    )
    q = (
        duplicate_sentences_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = spark.read.schema(
        "sh long, n_docs long, n_occurrences long, seq long"
    ).parquet(f"{work}/out")
    latest = snap.withColumn(
        "_mx", F.max("seq").over(Window.partitionBy("sh"))
    ).filter(F.col("seq") == F.col("_mx"))
    return latest.filter(F.col("n_docs") >= 2).select(
        "sh", "n_docs", "n_occurrences"
    )


def q226_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — tokens emitted per word and
    unknown-fallback rate by language, the multilingual data-quality
    readout that decides whether a vocabulary shortchanges a language
    (high fertility = fragmenting, high unk = not covered). Rides the
    REAL greedy BPE segmentation (q106's operator, one Arrow
    projection) aggregated per `lang`; ratios as exact integer ppm
    (1e6·Σtokens DIV Σwords), hash-portable. Oracle: q106's
    recursive-walk CTEs rolled up per language."""
    from graphsense_blocksci_spark.operators.text_analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs)
    langs = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return (
        enc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_bpe_tokens").cast("long").alias("total_tokens"),
            F.sum("n_unk").cast("long").alias("total_unk"),
        )
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_tokens",
            "total_unk",
            F.when(
                F.col("total_words") > 0,
                F.expr(
                    "CAST(1000000 * total_tokens DIV total_words AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("fertility_ppm"),
            F.when(
                F.col("total_tokens") > 0,
                F.expr(
                    "CAST(1000000 * total_unk DIV total_tokens AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("unk_ppm"),
        )
    )


def q227_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram overlap matrix — the corpus-mixing
    diagnostic run before blending sources into a training mix: per
    source pair, the Jaccard overlap of their UNIONED word-trigram
    shingle sets (the repo's 28-bit hashed shingles, q155's
    convention). High overlap means the sources duplicate each other
    and the mixture double-counts. Source-level sets build with one
    distinct aggregate; the pair counts ride the INVERTED INDEX
    (shingle → sources, pairs per shingle, one count aggregate) —
    never a quadratic set cross join, and |sources| is tiny so the
    pair space is trivially bounded."""
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hash_frame,
    )

    raw = load_table(spark, sf_dir, "documents")
    hashed = shingle_hash_frame(raw).join(
        raw.select("doc_id", "source"), "doc_id"
    )
    src_sh = (
        hashed.select("source", F.explode("_sh").alias("sh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = src_sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = src_sh.select(F.col("source").alias("src_a"), "sh")
    b = src_sh.select(F.col("source").alias("src_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("n").alias("n_a"))), "src_a"
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("n").alias("n_b"))), "src_b"
        )
        .select(
            "src_a",
            "src_b",
            "inter",
            "n_a",
            "n_b",
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def q216_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every document gets a
    reproducible (shard, position) for epoch-seeded global order —
    shard = seeded 28-bit md5 hash mod n_shards, position = rank of
    the (hash, doc_id) total order WITHIN the shard. The op every
    large-scale trainer needs: the 'random' order is a pure function
    of (seed, doc_id), so any worker can recompute its slice, resumes
    are exact, and reshuffling an epoch is changing one literal.

    Scale shape: one hash projection + a per-shard rank window — each
    shard sorts only its own slice (shards are the data-parallel unit,
    hundreds at 100 TB), never a global sort; no shuffle beyond the
    shard exchange."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("epoch1"),
                                      F.col("doc_id").cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")
    n_shards = 8
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        h.alias("h"),
        (h % F.lit(n_shards)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("position"),
    )


def q217_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-proportion mixture resampling — the corpus-balancing op
    in front of every training run: each source domain gets a target
    share (balanced mixture here: total/|domains| each), an exact
    integer acceptance threshold thr = floor(2^28 · min(1, target/n))
    against the 28-bit seeded md5 of the doc id, and the per-domain
    admitted counts. Acceptance is a pure function of (seed, doc_id),
    so the sample is reproducible across engines and retries — no
    rand(), no resampling drift; both engines count the identical
    admitted set.

    Scale shape: two domain-sized aggregates + one broadcast join +
    one filter-free conditional count — a single scan of the corpus,
    no shuffle beyond the domain rollup."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("mix1"),
                                  F.col("doc_id").cast("string"))), 1, 7
            ),
            16,
            10,
        ).cast("long").alias("h"),
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_domains"),
    )
    thr = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.expr("CAST(total DIV n_domains AS BIGINT)").alias("target_n"),
            F.least(
                F.lit(1 << 28).cast("long"),
                F.expr(
                    "CAST(shiftleft(total DIV n_domains, 28) DIV n_docs"
                    " AS BIGINT)"
                ),
            ).alias("thr"),
        )
    )
    return (
        docs.join(F.broadcast(thr), "source")
        .groupBy("source", "n_docs", "target_n", "thr")
        .agg(
            F.sum(F.when(F.col("h") < F.col("thr"), 1).otherwise(0))
            .cast("long")
            .alias("n_sampled")
        )
    )




# -- round-7 additions: evaluation statistics + relational reshaping ---


def q228_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact precision-recall curve for the q150 classifier frame
    (operators/evaluation.py:pr_curve): one row per distinct score
    threshold with integer confusion counts and the two one-divide
    ratios. Emitting the curve (not a scalar PR-AUC) keeps the frame
    hash-exact: every interpolation rule for the scalar sums rationals
    with unrelated denominators. Same bounded-domain shape as q150 —
    the corpus collapses to <=997 score rows before the only ordered
    window."""
    from graphsense_blocksci_spark.operators.evaluation import pr_curve

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars").cast("long") % 997).alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    return pr_curve(docs, "score", "label")


def q229_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational UNPIVOT (wide->long reshape): the four lineitem
    money measures melt into (measure, cents) rows — Spark's native
    DataFrame.unpivot, which Catalyst expands to a zero-shuffle
    Generate — then one map-side-combined aggregate per
    (returnflag, measure). The reshape multiplies rows 4x but never
    shuffles; the aggregate output is <=12 rows. Cents as int64 keep
    every statistic exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents("l_quantity").alias("qty_cents"),
        _cents("l_extendedprice").alias("price_cents"),
        _cents("l_discount").alias("discount_cents"),
        _cents("l_tax").alias("tax_cents"),
    )
    unp = li.unpivot(
        ["l_returnflag"],
        ["qty_cents", "price_cents", "discount_cents", "tax_cents"],
        "measure",
        "cents",
    )
    return unp.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


def q230_spearman_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rank correlation between a customer's
    account balance and their order count
    (operators/evaluation.py:spearman_rho) — the monotone-association
    readout feature pipelines use where Pearson is distorted by heavy
    tails. Tie midranks ride x2 as integers; rho is one div/sqrt chain
    on six int64 sums, so the frame is hash-exact. Customers with no
    orders count as y=0 (left join), which is where the rank-tie
    handling actually matters."""
    from graphsense_blocksci_spark.operators.evaluation import spearman_rho

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        _cents("c_acctbal").alias("bal_cents"),
    )
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    base = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "nation",
        "bal_cents",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )
    return spearman_rho(base, "nation", "bal_cents", "n_orders")


# NDCG@10 gain table: W[r] = int(1e12 / log2(r+1)) for rank r=1..10,
# and its prefix sums (the IDCG of r all-relevant top ranks). Embedded
# as literals so the Spark plan and the DuckDB oracle share the exact
# integers — no runtime float log anywhere.
_NDCG_W = [
    1000000000000, 630929753571, 500000000000, 430676558073,
    386852807234, 356207187108, 333333333333, 315464876785,
    301029995663, 289064826317,
]
_NDCG_IDCG = [
    1000000000000, 1630929753571, 2130929753571, 2561606311644,
    2948459118878, 3304666305986, 3637999639319, 3953464516104,
    4254494511767, 4543559338084,
]


def q231_ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the q107 BM25 ranking as fixed-point integers: the
    discount weights 1/log2(rank+1) are pre-scaled to the _NDCG_W
    int64 table (shared literal-for-literal with the oracle), DCG is
    an integer SUM of table lookups, IDCG an element_at into the
    prefix-sum table at min(R,10), and the float ndcg is ONE divide.
    Completes the ranking-eval suite (AUC q150, calibration q177,
    MRR q185, MAP q187). Same shape as q187: the ranking is the one
    heavy subplan (pinned — it feeds both the DCG terms and the query
    spine); everything downstream is queries x 10 rows."""
    from graphsense_blocksci_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    ranked = (
        bm25_topk(docs, k=10)
        .select("query_id", F.col("doc_id").cast("long").alias("doc_id"), "rank")
        .localCheckpoint(eager=False)
    )
    warr = F.array(*[F.lit(w) for w in _NDCG_W])
    iarr = F.array(*[F.lit(w) for w in _NDCG_IDCG])
    dcg = (
        ranked.filter(F.col("doc_id") % 6 == F.col("query_id"))
        .select("query_id", F.element_at(warr, F.col("rank").cast("int")).alias("_w"))
        .groupBy("query_id")
        .agg(F.sum("_w").cast("long").alias("dcg_fp"))
    )
    corpus_rel = docs.select(
        (F.col("doc_id") % 6).cast("long").alias("query_id")
    ).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_corpus")
    )
    r = F.coalesce("n_rel_corpus", F.lit(0))
    idcg = F.when(
        r > 0, F.element_at(iarr, F.least(r, F.lit(10)).cast("int"))
    ).otherwise(F.lit(0))
    return (
        ranked.select("query_id").distinct()
        .join(dcg, "query_id", "left")
        .join(corpus_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("dcg_fp", F.lit(0)).cast("long").alias("dcg_fp"),
            idcg.cast("long").alias("idcg_fp"),
            F.when(
                idcg > 0,
                F.coalesce("dcg_fp", F.lit(0)).cast("double")
                / idcg.cast("double"),
            ).otherwise(F.lit(0.0)).alias("ndcg"),
        )
    )




def q232_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (Zhou-Lu-Zhang 2009) over
    the order-part bipartite graph: for part pairs co-occurring in
    >=2 orders, RA(a,b) = sum over shared orders of 1/deg(order).
    TPC-H caps distinct parts per order at 7, so scaling by
    lcm(1..7) = 420 makes every term an exact int64 — no float sum
    anywhere. The pair space is a WITHIN-ORDER self-join (<= C(7,2) =
    21 pairs per order), so the quadratic blow-up is bounded per key
    and fans out across the cluster; the >=2-shared-orders filter
    keeps the emitted frame sparse."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.col("l_partkey").cast("long").alias("p"))
        .distinct()
        # pinned: feeds the degree aggregate AND the pair sides
        .localCheckpoint(eager=False)
    )
    deg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # pinned: both sides of the within-order self-join
    sides = li.join(deg, "l_orderkey").localCheckpoint(eager=False)
    b = sides.select(
        "l_orderkey", F.col("p").alias("p2"), F.col("deg").alias("deg2")
    )
    pairs = (
        sides.join(b, "l_orderkey")
        .filter(F.col("p") < F.col("p2"))
        .groupBy(
            F.col("p").alias("part_a"), F.col("p2").alias("part_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.expr("420 DIV deg")).cast("long").alias("ra_420"),
        )
        .filter(F.col("n_common") >= 2)
    )
    return pairs.select(
        "part_a",
        "part_b",
        "n_common",
        "ra_420",
        (F.col("ra_420").cast("double") / F.lit(420.0)).alias("ra"),
    )


def q233_cusum_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint statistic over the daily order
    revenue series — the recursion S_i = max(0, S_{i-1} + (x_i - mu))
    rewritten window-expressible as S_i = C_i - min_{j<=i} C_j with
    C_i = cumsum(x_i - mu): two ordered windows, no recursion, no
    iterative loop. Everything rides x N (the day count) so the mean
    never becomes a float: d_i = N*x_i - S in cents-scaled int64, and
    the emitted float is one final divide by N. The ordered windows
    run over the DAY-level series (<= a few thousand rows after the
    map-side-combined daily aggregate), never the order table."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("x"))
        # pinned: feeds the 1-row totals AND the cumulative window —
        # unpinned, the orders scan + aggregate executes twice
        .localCheckpoint(eager=False)
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("s_total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        "n_days",
        F.sum(F.col("x") * F.col("n_days") - F.col("s_total"))
        .over(w)
        .cast("long")
        .alias("c_scaled"),
    )
    return c.select(
        # timestamp, not date: DuckDB DATE round-trips to pandas as a
        # midnight Timestamp, so the comparable type is timestamp
        F.col("day").cast("timestamp").alias("day"),
        F.col("x").alias("revenue_cents"),
        (
            F.col("c_scaled")
            - F.min(F.least(F.col("c_scaled"), F.lit(0))).over(w)
        )
        .cast("long")
        .alias("cusum_scaled"),
        (
            (
                F.col("c_scaled")
                - F.min(F.least(F.col("c_scaled"), F.lit(0))).over(w)
            ).cast("double")
            / F.col("n_days").cast("double")
        ).alias("cusum_cents"),
    )


def q234_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement (Cohen's kappa) between two label
    heuristics on the documents table — the annotation-QA readout a
    labeling pipeline runs before trusting weak labels. Rater A flags
    long documents (n_chars > 300), rater B flags token-rich ones
    (> 54 spaces, both near the corpus median so every confusion cell
    is populated). po and pe share the n^2 denominator so kappa is
    one integer/integer divide on the 2x2 confusion counts
    (operators/evaluation.py:cohens_kappa); one map-side-combined
    aggregate, zero shuffles beyond it."""
    from graphsense_blocksci_spark.operators.evaluation import cohens_kappa

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars") > 300).alias("a"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            > 54
        ).alias("b"),
    )
    return cohens_kappa(docs, "a", "b")


def q235_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Kendall tau-b between customer balance and order
    count — the same frame as q230's Spearman, measured by exact pair
    counting (operators/evaluation.py:kendall_tau) so the two rank
    statistics can be read side by side. Concordant/discordant/tie
    counts are int64; tau-b is one float chain. The O(n^2) pair space
    is per-nation (the group key co-partitions the self-join), which
    is the exact algorithm's cost — at training scale you stratify or
    sample the group first, same as any exact quadratic statistic."""
    from graphsense_blocksci_spark.operators.evaluation import kendall_tau

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        _cents("c_acctbal").alias("bal_cents"),
    )
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    base = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "nation",
        "bal_cents",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )
    return kendall_tau(base, "nation", "bal_cents", "n_orders")




def q236_ancestor_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over a derived supplier hierarchy
    (operators/graph.py:ancestor_closure) — the recursive-CTE
    workload (org charts, category trees, ownership chains) answered
    Spark-side by iterative path DOUBLING: log2(depth) co-partitioned
    self-joins instead of SQL recursion's one-hop-per-round walk. The
    hierarchy is the binary tree suppkey -> suppkey DIV 2, so depth
    grows as log2(|suppliers|) and the closure carries exact hop
    distances. Oracle: DuckDB WITH RECURSIVE over the same edges."""
    from graphsense_blocksci_spark.operators.graph import ancestor_closure

    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("child")
    ).filter(F.col("child") > 1)
    edges = s.select(
        "child", F.expr("child DIV 2").cast("long").alias("parent")
    )
    return ancestor_closure(edges)


def q237_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token diversity via the unbiased Simpson index —
    the no-logarithm diversity readout (Shannon entropy needs a float
    ln whose last ulp differs across libm builds; Simpson is pure
    integer arithmetic): lambda = sum c_i(c_i-1) / (N(N-1)), inverse
    Simpson = its reciprocal. One token-count aggregate, one
    vocabulary-sized per-source reduce, exact int64 until the final
    divides."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("sum_cc1"),
    )
    lam = F.col("sum_cc1").cast("double") / (
        F.col("n_tokens").cast("double") * (F.col("n_tokens") - 1).cast("double")
    )
    return agg.select(
        "source",
        "vocab",
        "n_tokens",
        "sum_cc1",
        lam.alias("simpson"),
        (F.lit(1.0) / lam).alias("inv_simpson"),
    )


def q238_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the incremental-dedup readout
    "how much of this doc is new vs everything before it": with docs
    ordered by doc_id, a trigram shingle is NOVEL in the first doc_id
    that contains it, and a doc's novelty is its novel-shingle share.
    First occurrence is one min(doc_id) aggregate over the exploded
    shingle index (q155's 28-bit hashed shingles) joined back — no
    ordered scan, no window over the corpus; both sides of the join
    are shingle-partitioned."""
    from graphsense_blocksci_spark.operators.textops import (
        shingle_hash_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        shingle_hash_frame(docs)
        .select("doc_id", F.explode("_sh").alias("sh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_sh",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_sh").cast("double")).alias(
            "novelty"
        ),
    )


def q239_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower) of line price weighted by
    quantity, per return flag — the robust-center statistic quality
    filters use where a plain median ignores row mass. The corpus
    collapses to one row per (flag, price) FIRST, so the ordered
    cumulative window runs over the per-group price domain, never the
    row count; the pick is the smallest value whose cumulative weight
    x2 reaches the total (exact integers, no interpolation)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents("l_extendedprice").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    per_v = li.groupBy("l_returnflag", "price_cents").agg(
        F.sum("qty").cast("long").alias("w")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    c = per_v.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").cast("long").alias("wmedian_cents"),
            F.max("tw").cast("long").alias("total_weight"),
        )
    )




def qd52_change_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BlockSci-style change-output detection on 2-output spends —
    the three classic heuristics (BlockSci paper sec. 4; the library's
    blocksci.heuristics.change module) voted per transaction, pure
    nested-array arithmetic so the whole frame is one projection:

    - power_of_ten: the PAYMENT tends to be a round amount, so if
      exactly one output value is NOT a multiple of 1000 satoshi,
      that one is the change.
    - address_type: if all inputs share one address type and exactly
      one output matches it, the wallet's change goes back to its own
      type — that output is the change.
    - optimal_change: change below the smallest input — a rational
      wallet wouldn't have added that input if the other output were
      the change.

    Each column is the change output INDEX (0/1) or NULL when the
    heuristic doesn't fire. Zero joins, zero shuffles: per-row lambda
    arithmetic over the nested arrays, exactly the shape that scales
    to 100 TB of transactions."""
    _, raw_txs, _ = _fixture_frames(spark)
    t = raw_txs.filter(
        (~F.col("coinbase")) & (F.size("outputs") == 2)
    ).select(
        F.col("tx_id").cast("long").alias("tx_id"),
        F.col("outputs")[0]["value"].alias("v0"),
        F.col("outputs")[1]["value"].alias("v1"),
        F.col("outputs")[0]["address_type"].cast("long").alias("t0"),
        F.col("outputs")[1]["address_type"].cast("long").alias("t1"),
        F.array_distinct(
            F.transform("inputs", lambda x: x["address_type"].cast("long"))
        ).alias("in_types"),
        F.array_min(
            F.transform("inputs", lambda x: x["value"])
        ).alias("min_in"),
    )
    r0 = F.col("v0") % 1000 == 0
    r1 = F.col("v1") % 1000 == 0
    h_power = (
        F.when(r0 & ~r1, F.lit(1)).when(r1 & ~r0, F.lit(0))
    ).cast("long")
    it = F.when(F.size("in_types") == 1, F.element_at("in_types", 1))
    h_type = (
        F.when((F.col("t0") == it) & (F.col("t1") != it), F.lit(0))
        .when((F.col("t1") == it) & (F.col("t0") != it), F.lit(1))
    ).cast("long")
    h_opt = (
        F.when(
            (F.col("v0") < F.col("min_in")) & (F.col("v1") >= F.col("min_in")),
            F.lit(0),
        ).when(
            (F.col("v1") < F.col("min_in")) & (F.col("v0") >= F.col("min_in")),
            F.lit(1),
        )
    ).cast("long")
    return t.select(
        "tx_id",
        h_power.alias("h_power_of_ten"),
        h_type.alias("h_address_type"),
        h_opt.alias("h_optimal_change"),
    )


def qd53_fee_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block exact fee percentiles (median and p90, lower pick) —
    the fee-market dashboard readout on top of qd29's per-tx fee.
    Same bounded-window discipline as q239: fees collapse to one row
    per (block, fee) before the cumulative window, so the ordered
    scan is the per-block fee DOMAIN; the percentile is the smallest
    fee whose cumulative count crosses the integer-scaled threshold —
    no interpolation, no float rank."""
    from graphsense_blocksci_spark.functions.io_aggs import io_total_value

    _, raw_txs, _ = _fixture_frames(spark)
    fees = raw_txs.filter(~F.col("coinbase")).select(
        F.col("block_id").cast("long").alias("block_id"),
        (io_total_value("inputs") - io_total_value("outputs"))
        .cast("long")
        .alias("fee"),
    )
    per_v = fees.groupBy("block_id", "fee").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    wcum = (
        Window.partitionBy("block_id")
        .orderBy("fee")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("block_id")
    c = per_v.select(
        "block_id",
        "fee",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    ).localCheckpoint(eager=False)
    med = (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("block_id")
        .agg(F.min("fee").cast("long").alias("fee_med"))
    )
    p90 = (
        c.filter(10 * F.col("cw") >= 9 * F.col("tw"))
        .groupBy("block_id")
        .agg(F.min("fee").cast("long").alias("fee_p90"))
    )
    base = fees.groupBy("block_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_txs"),
        F.min("fee").cast("long").alias("fee_min"),
        F.max("fee").cast("long").alias("fee_max"),
    )
    return base.join(med, "block_id").join(p90, "block_id")


def qd54_streaming_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING changepoint monitor: daily event-revenue totals
    maintained by one watermarked window aggregation on the stream
    (state = days in flight, pure built-ins), then q233's CUSUM
    rewrite — S_i = C_i − min prefix, the recursion as two ordered
    windows — over the sink's day-level rows. Append mode emits a day
    once the watermark (max event time − 1 day) passes its end, so
    the trailing in-flight days are withheld — the oracle replays the
    same cutoff, then identical daily totals and CUSUM arithmetic in
    SQL. The sequential statistic runs on the DAY series (tiny),
    never the event stream."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="gbs_cusum_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = spark.readStream.schema("ts timestamp, cents long").parquet(
        f"{work}/src"
    )
    q = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.sum("cents").alias("x"))
        .select(F.col("win.start").alias("day"), F.col("x").cast("long").alias("x"))
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    daily = spark.read.schema("day timestamp, x long").parquet(f"{work}/out")
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("s_total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        "n_days",
        F.sum(F.col("x") * F.col("n_days") - F.col("s_total"))
        .over(w)
        .cast("long")
        .alias("c_scaled"),
    )
    return c.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("x").alias("revenue_cents"),
        (
            F.col("c_scaled")
            - F.min(F.least(F.col("c_scaled"), F.lit(0))).over(w)
        )
        .cast("long")
        .alias("cusum_scaled"),
        (
            (
                F.col("c_scaled")
                - F.min(F.least(F.col("c_scaled"), F.lit(0))).over(w)
            ).cast("double")
            / F.col("n_days").cast("double")
        ).alias("cusum_cents"),
    )




def q240_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-3 tokens per doc by
    the rational score tf·N/df, ranked WITHOUT floats — the window
    orders by the integer proxy tf·1e6 DIV df (ties broken by token),
    so any engine picks identical keywords. Completes the corpus
    retrieval family (vocab q82, df q83, BM25 q107): this is the
    document-side summarization step indexing pipelines run. One
    token-count aggregate, one broadcast-joined df map, one per-doc
    top-k window (WindowGroupLimit prunes to 3 per doc before any
    sort spills)."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_map = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = tf.join(df_map, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.expr("CAST(tf * 1000000 DIV df AS BIGINT)").alias("score_fp"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
            "token",
            "tf",
            "df",
            "score_fp",
        )
    )


def q241_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event burstiness as the Fano factor of daily counts
    (variance-to-mean ratio, the overdispersion diagnostic): with
    daily counts c_1..c_d over the user's ACTIVE days, F =
    (d·Σc² − (Σc)²) / (d·Σc) — integer numerator and denominator, one
    float divide, on the biased (population) variance so the formula
    stays a pure integer identity. Two map-side-combined aggregates
    (events → user-days → user); no window, no join."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.to_date("ts").alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    return agg.select(
        "user_id",
        "d",
        F.col("sc").alias("n_events"),
        (F.col("d") * F.col("scc") - F.col("sc") * F.col("sc"))
        .cast("long")
        .alias("fano_num"),
        (F.col("d") * F.col("sc")).cast("long").alias("fano_den"),
        (
            (F.col("d") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
                "double"
            )
            / (F.col("d") * F.col("sc")).cast("double")
        ).alias("fano"),
    )


def q242_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration Herfindahl-Hirschman index per nation in
    integer ppm points: each customer's revenue share floors to ppm
    against the nation total, and HHI = Σ s_ppm² DIV 10^6. The ppm
    formulation is the OVERFLOW-SAFE one — Σ s² ≤ (max s)·(Σ s) ≤
    10¹² no matter how many customers or cents the corpus holds,
    where the raw Σ r_i² int64 sum overflowed at sf0.1 (caught by the
    timing appendix — the exact scale-bug class the ppm discipline
    exists to prevent). Two nation-keyed aggregates with the totals
    broadcast back; still no float sums anywhere."""
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).cast("long").alias("r")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nation")
    )
    per_cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select("nation", "r")
        .localCheckpoint(eager=False)
    )
    tot = per_cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("r").cast("long").alias("sum_r"),
    )
    shares = per_cust.join(F.broadcast(tot), "nation").select(
        "nation",
        "n_customers",
        "sum_r",
        F.expr("CAST(1000000 * r DIV sum_r AS BIGINT)").alias("s_ppm"),
    )
    return shares.groupBy("nation").agg(
        F.first("n_customers").alias("n_customers"),
        F.first("sum_r").alias("sum_r"),
        F.expr("CAST(sum(s_ppm * s_ppm) DIV 1000000 AS BIGINT)").alias(
            "hhi_ppm"
        ),
    )


# Benford first-digit expectations log10(1 + 1/d), d = 1..9, pre-scaled
# to parts-per-million literals shared with the oracle (no runtime log)
_BENFORD_PPM = [
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
]


def q243_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the fraud/data-
    quality screen: per leading digit, the observed count against the
    Benford expectation log10(1+1/d), with the expectation pre-scaled
    to the _BENFORD_PPM integer literals (shared with the oracle — no
    runtime log) and the observed share as the exact integer
    obs·1e6 DIV n. One digit projection (leading digit of the cents
    integer via string head — exact, no float log10), one 9-key
    aggregate, one broadcast total."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(_cents("o_totalprice").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    per_d = o.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    tot = per_d.agg(F.sum("n_obs").cast("long").alias("n"))
    earr = F.array(*[F.lit(p) for p in _BENFORD_PPM])
    return per_d.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        "n",
        F.expr("CAST(n_obs * 1000000 DIV n AS BIGINT)").alias("obs_ppm"),
        F.element_at(earr, F.col("digit").cast("int")).cast("long").alias(
            "benford_ppm"
        ),
        (
            F.expr("CAST(n_obs * 1000000 DIV n AS BIGINT)")
            - F.element_at(earr, F.col("digit").cast("int"))
        ).cast("long").alias("dev_ppm"),
    )




def q244_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a DETERMINISTIC tiebreak (smallest
    value wins) — SQL's mode() leaves ties unspecified, so cross-
    engine results need the explicit count-then-rank construction:
    one map-side-combined (group, value) count, one per-group top-1
    window ordered by (count desc, value). WindowGroupLimit prunes to
    one row per group before any sort spills. The op every
    categorical-imputation pass needs."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"), "event_type"
    )
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("c").alias("mode_count"),
        )
    )


def q245_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue in deciles — the distribution
    readout that pairs with qd45's Gini scalar: customers ranked by
    revenue, bucketed by the integer rank arithmetic
    ceil(rank·10 / n) (cross-engine deterministic where NTILE's
    remainder placement is implementation lore), each decile's exact
    revenue share as int64 cents over the broadcast total. The global
    rank is the two-pass range-partitioned global_rank — no corpus-
    wide single-partition window."""
    from graphsense_blocksci_spark.operators.windows import global_rank

    r = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("r"))
    )
    ranked = global_rank(r, ["r", "o_custkey"], rank_col="rk")
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("total_r"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("CAST((rk * 10 + n - 1) DIV n AS BIGINT)").alias("decile"),
            "r",
            "n",
            "total_r",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("r").cast("long").alias("decile_cents"),
            F.first("total_r").alias("total_cents"),
        )
    )
    return dec.select(
        "decile",
        "n_customers",
        "decile_cents",
        (
            F.col("decile_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("rev_share"),
    )


def q246_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quartile codes, the classic marketing feature triple — with every
    quartile assigned by the integer rank arithmetic
    ceil(rank·4 / n) over a deterministic total order (metric, then
    custkey), never NTILE (whose tie placement is engine lore). Three
    global_rank passes over the customer aggregate (small — one row
    per customer), one final code concat. Returns the segment code
    counts, the frame a campaign targeting join would consume."""
    from graphsense_blocksci_spark.operators.windows import global_rank

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.col("o_orderdate").cast("timestamp").cast("long"))
        .cast("long")
        .alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(_cents("o_totalprice")).cast("long").alias("money"),
    ).localCheckpoint(eager=False)
    n_f = per_cust.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def quartile(metric: str, qname: str) -> DataFrame:
        ranked = global_rank(
            per_cust.select("ck", metric), [metric, "ck"], rank_col="rk"
        )
        return ranked.crossJoin(F.broadcast(n_f)).select(
            "ck",
            F.expr("CAST((rk * 4 + n - 1) DIV n AS BIGINT)").alias(qname),
        )

    rfm = (
        quartile("last_ts", "r_q")
        .join(quartile("freq", "f_q"), "ck")
        .join(quartile("money", "m_q"), "ck")
    )
    return (
        rfm.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


def q247_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete life table for customer re-order gaps — the survival-
    analysis input (at-risk / events per gap bucket) emitted EXACTLY:
    the Kaplan-Meier product itself is an order-dependent float chain,
    but the life table it consumes is pure integers. An observation is
    each customer's gap between consecutive orders (events) or from
    the last order to the corpus horizon (censored). Bucket = gap in
    30-day months. at_risk(b) = observations with bucket >= b — a
    reversed cumulative sum over the BOUNDED bucket domain."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").cast("long").alias("ts")
    )
    w = Window.partitionBy("o_custkey").orderBy("ts")
    nxt = o.select(
        "o_custkey",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    )
    horizon = o.agg(F.max("ts").cast("long").alias("h"))
    obs = nxt.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("next_ts").isNotNull(), F.col("next_ts") - F.col("ts")
        )
        .otherwise(F.col("h") - F.col("ts"))
        .alias("gap_s"),
        F.col("next_ts").isNotNull().alias("event"),
    )
    per_b = obs.select(
        F.expr("CAST(gap_s DIV 2592000 AS BIGINT)").alias("bucket"),
        "event",
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.when(F.col("event"), 1).otherwise(0))
        .cast("long")
        .alias("events"),
    )
    wrev = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_b.select(
        "bucket",
        F.sum("n_obs").over(wrev).cast("long").alias("at_risk"),
        "events",
        (F.col("n_obs") - F.col("events")).cast("long").alias("censored"),
    )


def q248_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability profile from pure integer counts — the
    Flesch-style proxy without its float coefficients: words (token
    count), sentences (terminal punctuation runs, min 1), and long
    words (>= 7 chars, the syllable stand-in) summed exactly per
    source; the two ratios are one divide each. Regex counts only —
    no UDF, no tokenizer state."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(tokens("text")).cast("long").alias("words"),
        F.greatest(
            F.lit(1),
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"),
                    lambda s: F.trim(s) != "",
                )
            )
        ).cast("long").alias("sentences"),
        F.size(
            F.filter(tokens("text"), lambda t: F.length(t) >= 7)
        ).cast("long").alias("long_words"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("sentences").cast("long").alias("sentences"),
        F.sum("long_words").cast("long").alias("long_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "long_words",
        (F.col("words").cast("double") / F.col("sentences").cast("double"))
        .alias("words_per_sentence"),
        (F.col("long_words").cast("double") / F.col("words").cast("double"))
        .alias("long_word_ratio"),
    )


def q249_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-affinity market basket: support / confidence / lift for
    every brand pair co-ordered in the same order, in exact ppm
    integers (the q190 no-float discipline). Pair generation is the
    scale-critical choice: one hash aggregate collects each order's
    distinct brand set (collect_set dedups in-state; bounded by order
    size, ~7), and the sorted in-array combination explode emits its
    C(k,2) pairs map-side — no order-keyed self-join, so the only
    shuffles are the two hash aggregates on (orderkey) and (brand_a,
    brand_b). The basket frame is pinned (lazy localCheckpoint) and
    feeds pairs, singles (explode) and the order count; singles and
    the count ride back as broadcasts. lift_ppm multiplies three
    counts before the DIV; at extreme corpus scale swap the BIGINT for
    DECIMAL(38,0) — at any realistic brand cardinality the counts fit.
    Min pair support 5 bounds the emitted rule set."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", F.col("p_brand").alias("b")
    )
    baskets = (
        ob.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("b")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) ->"
                    " transform(slice(bs, i + 2, size(bs)),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("brand_a"), F.col("p.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    singles = (
        baskets.select(F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("b").alias("brand_a"), F.col("c").alias("c_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(singles.select(F.col("b").alias("brand_b"), F.col("c").alias("c_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            "c_a",
            "c_b",
            "n_orders",
            F.expr("CAST(1000000 * c_ab DIV n_orders AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST(1000000 * c_ab DIV c_a AS BIGINT)").alias("conf_ppm"),
            F.expr(
                "CAST((1000000 * c_ab * n_orders) DIV (c_a * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def q250_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-cumulative distinct customers — the audience-growth
    curve computed WITHOUT a running COUNT(DISTINCT) scan: each
    customer contributes exactly one first-order row (one customer-
    keyed aggregate), days aggregate those firsts, and the running sum
    is a window over the DAY-grain frame — calendar-bounded rows
    (thousands), not data-bounded, so the single-partition window is
    safe at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d"))
    daily = first.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_customers")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        "new_customers",
        F.sum("new_customers").over(w).cast("long").alias("cum_customers"),
    )


def q251_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT surface: revenue cents by nation x order
    priority reshaped wide via DataFrame.pivot with the value list
    pinned (an unpinned pivot triggers an extra distinct-values job
    and non-deterministic column order). One shuffle to the (nation,
    priority) grain; the pivot itself is a projection."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderpriority", pri)
        .agg(F.sum("cents"))
    )
    return wide.select(
        "n_name",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(a)
            for p, a in zip(pri, ["urgent", "high", "medium", "not_specified", "low"])
        ],
    )


def q252_log2_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style quantile estimation from a power-of-2 histogram,
    fully exact-integer: bucket = floor(log2(cents)) computed as
    length(bin(x)) - 1 (no libm, so Spark and the oracle agree bit-for-
    bit), one hash aggregate to <= 64 bucket rows, then each requested
    quantile reads the first bucket whose cumulative count crosses
    ceil(q*n/100). The histogram is trivially mergeable — the same
    frame a streaming twin maintains per micro-batch. Answer error is
    bounded by the bucket width (factor 2; tighter gamma just means
    more buckets)."""
    o = load_table(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("cents")
    )
    hist = (
        o.select((F.length(F.bin(F.col("cents"))) - 1).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket", "cnt", F.sum("cnt").over(w).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = cum.agg(F.max("cum").cast("long").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("quantile_pct")
    )
    hit = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            cum,
            F.col("cum") >= F.expr("CAST((quantile_pct * n + 99) DIV 100 AS BIGINT)"),
        )
        .groupBy("quantile_pct")
        .agg(
            F.min("bucket").cast("long").alias("bucket"),
            F.first("n").alias("n"),
        )
    )
    return hit.select(
        "quantile_pct",
        "bucket",
        F.expr("CAST(shiftleft(1L, CAST(bucket AS INT)) AS BIGINT)").alias("lo"),
        F.expr(
            "CAST(shiftleft(1L, CAST(bucket AS INT) + 1) - 1 AS BIGINT)"
        ).alias("hi"),
        "n",
    )


def q253_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day user retention via bitmap indexes — the roaring-
    bitmap pattern in pure relational form: each (day, 60-user word)
    row carries a bit_or-packed activity mask (60-bit words, not 64,
    because the oracle engine guards 1<<63 as overflow), so the self-
    join that intersects consecutive days moves |days| x |users|/60
    rows instead of raw (user, day) pairs — a 60x shuffle compression
    — and retention is popcount(a AND b) summed per day. bit_or makes
    the build idempotent (duplicate events cannot set a bit twice).
    The bitmap frame is pinned and feeds DAU, the shifted self-join,
    and nothing else; retention_ppm is exact-integer DIV."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("long").alias("u")
    )
    bm = (
        ev.select(
            "day",
            F.expr("CAST(u DIV 60 AS BIGINT)").alias("word"),
            F.expr("shiftleft(1L, CAST(u % 60 AS INT))").alias("mask"),
        )
        .groupBy("day", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .localCheckpoint(eager=False)
    )
    dau = bm.groupBy("day").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("dau")
    )
    nxt = bm.select(
        F.date_sub("day", 1).alias("day"),
        "word",
        F.col("bits").alias("bits_next"),
    )
    ret = (
        bm.join(nxt, ["day", "word"])
        .groupBy("day")
        .agg(
            F.sum(F.bit_count(F.col("bits").bitwiseAND(F.col("bits_next"))))
            .cast("long")
            .alias("retained_next")
        )
    )
    return (
        dau.join(ret, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            F.coalesce("retained_next", F.lit(0)).cast("long").alias(
                "retained_next"
            ),
        )
        .withColumn(
            "retention_ppm",
            F.expr("CAST(1000000 * retained_next DIV dau AS BIGINT)"),
        )
    )


def q254_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue into trend /
    weekly-seasonal / remainder (the STL shape without loess): trend
    is the centered 7-row moving average in exact integer DIV (sums
    are non-negative, so truncation agrees across engines), the
    seasonal term is the per-weekday mean of the detrended series
    (one double divide of exact integer sums), and the remainder is
    what's left. Weekday is epoch-day % 7 — pure integer arithmetic,
    no locale-dependent dayofweek. Everything runs at the calendar-
    bounded day grain, pinned once; the 7-row window and the
    7-row seasonal broadcast are both domain-bounded."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("cents"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    based = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("c7"),
        (F.datediff("day", F.lit("1970-01-01")) % 7).cast("long").alias(
            "weekday"
        ),
    ).select(
        "day",
        "cents",
        "weekday",
        F.expr("CAST(s7 DIV c7 AS BIGINT)").alias("trend"),
    ).localCheckpoint(eager=False)
    seasonal = based.groupBy("weekday").agg(
        (
            F.sum(F.col("cents") - F.col("trend")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal_mean")
    )
    return based.join(F.broadcast(seasonal), "weekday").select(
        F.col("day").cast("timestamp").alias("day"),
        "cents",
        "weekday",
        "trend",
        "seasonal_mean",
        (
            (F.col("cents") - F.col("trend")).cast("double")
            - F.col("seasonal_mean")
        ).alias("remainder"),
    )


def qd55_streaming_log2_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING twin of the q252 power-of-2 histogram under the exact
    gate: order totals staged as TWO source files and consumed one
    file per trigger (maxFilesPerTrigger=1), so the merge across
    micro-batch boundaries is genuinely exercised — each bucket's
    running count folds in the applyInPandasWithState store
    (streaming/sketches.py:log2_hist_stream, <= 64 longs of state)
    and emits a snapshot per batch; counts are monotone, so the max
    snapshot per bucket is the final histogram, which must equal the
    batch q252 hist cell-for-cell."""
    import tempfile

    from graphsense_blocksci_spark.streaming.sketches import log2_hist_stream

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _cents("o_totalprice").alias("cents")
    )
    work = tempfile.mkdtemp(prefix="gbs_sl2h_")
    o.filter(F.col("o_orderkey") % 2 == 0).select("cents").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{work}/src")
    o.filter(F.col("o_orderkey") % 2 == 1).select("cents").coalesce(1).write.mode(
        "append"
    ).parquet(f"{work}/src")
    stream = (
        spark.readStream.schema("cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/src")
    )
    q = (
        log2_hist_stream(stream, "cents")
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.read.schema("bucket long, cnt long").parquet(f"{work}/out")
    return snaps.groupBy("bucket").agg(F.max("cnt").cast("long").alias("cnt"))


def q255_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual runtime-filter (sideways information passing) for a
    selective dim-side semi join — the optimization engines apply as
    'Bloom join' / dynamic filtering: the high-value order keys build
    a distributed Bloom bitmap (bit_or words, driver sees <= n_bits/64
    longs), the bitmap rides a broadcast 1-row frame, and lineitem is
    pruned JVM-side BEFORE the shuffle; the exact semi join of the
    survivors removes Bloom false positives, so the result is bit-
    identical to the plain semi join the oracle runs. At 100 TB the
    prune keeps ~selectivity of the fact table out of the exchange —
    the Bloom costs one scan of the (small) filtered dim side."""
    from graphsense_blocksci_spark.operators.sketches import (
        bloom_member,
        build_bloom_words,
    )

    o = load_table(spark, sf_dir, "orders")
    hv = (
        o.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").cast("long").alias("ok"))
        .localCheckpoint(eager=False)
    )
    n_bits = 1 << 17
    sparse = build_bloom_words(hv, "ok", n_bits)
    words = [sparse.get(i, 0) for i in range(n_bits // 64)]
    bloom_df = spark.createDataFrame([(words,)], "bloom_words array<bigint>")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("ok"),
        F.to_date("l_shipdate").alias("ship"),
        _cents("l_extendedprice").alias("cents"),
    )
    pruned = (
        li.crossJoin(F.broadcast(bloom_df))
        .filter(bloom_member(F.col("ok"), F.col("bloom_words"), n_bits))
        .drop("bloom_words")
    )
    exact = pruned.join(hv, "ok", "left_semi")
    return (
        exact.groupBy(F.date_trunc("month", "ship").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


def q256_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown over the daily revenue series — the
    risk-readout window pattern: peak = running max, drawdown =
    peak - today, severity in exact ppm of the peak. All windows run
    at the calendar-bounded day grain (one ordered pass), all
    arithmetic integer."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_cents("o_totalprice")).cast("long").alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "cents",
        F.max("cents").over(w).cast("long").alias("peak"),
    ).select(
        "day",
        "cents",
        "peak",
        (F.col("peak") - F.col("cents")).cast("long").alias("drawdown"),
        F.expr("CAST(1000000 * (peak - cents) DIV peak AS BIGINT)").alias(
            "drawdown_ppm"
        ),
    )


def q257_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over a fixed candidate set —
    the data-profiling pass that tells a schema designer which
    'obvious' keys actually determine which attributes: for each
    lhs -> rhs candidate, one hash aggregate on lhs counts groups
    carrying more than one distinct rhs. Each candidate is a single
    shuffle on its lhs; the verdict frame is candidates-sized."""
    part = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")

    def fd(df: DataFrame, lhs: str, rhs: str, table: str) -> DataFrame:
        g = df.groupBy(lhs).agg(
            F.countDistinct(rhs).cast("long").alias("n_rhs")
        )
        return g.agg(
            F.lit(table).alias("table_name"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            (F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)) == 0).alias(
                "fd_holds"
            ),
        )
    cands = [
        fd(part, "p_partkey", "p_brand", "part"),
        fd(part, "p_name", "p_brand", "part"),
        fd(part, "p_type", "p_size", "part"),
        fd(part, "p_brand", "p_type", "part"),
        fd(o, "o_orderkey", "o_custkey", "orders"),
        fd(o, "o_custkey", "o_orderpriority", "orders"),
    ]
    out = cands[0]
    for c in cands[1:]:
        out = out.unionByName(c)
    return out


def qd56_hodl_waves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HODL waves: the age distribution of the unspent coin supply at
    the chain tip — the long-holder structure readout that pairs with
    qd47's coin-days-destroyed flow metric. The UTXO set is the qd28
    anti-join on the uniform spent-tx key; each unspent output's age
    is tip_ts - creation_ts (creation time joined from its tx),
    banded in 30-day integer DIV buckets; per band the exact value
    sum and its double share of total unspent supply. One linkage-
    shaped anti-join + one band rollup; the tip rides as a broadcast
    1-row aggregate."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    times = raw_txs.select(
        "tx_id", F.col("timestamp").cast("long").alias("ts")
    )
    outs = (
        explode_outputs(raw_txs)
        .select("tx_id", "output_index", "value")
        .join(times, "tx_id")
        .withColumnRenamed("ts", "created_ts")
    )
    ins = explode_inputs(raw_txs.filter(~F.col("coinbase"))).select(
        F.col("spent_tx_id").alias("tx_id"),
        F.col("spent_index").alias("output_index"),
    )
    utxo = outs.join(ins, ["tx_id", "output_index"], "left_anti")
    tip = times.agg(F.max("ts").cast("long").alias("tip_ts"))
    banded = (
        utxo.crossJoin(F.broadcast(tip))
        .select(
            F.expr(
                "CAST((tip_ts - created_ts) DIV 2592000 AS BIGINT)"
            ).alias("age_band"),
            "value",
        )
        .groupBy("age_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_utxos"),
            F.sum("value").cast("long").alias("band_value"),
        )
        .localCheckpoint(eager=False)
    )
    total = banded.agg(F.sum("band_value").cast("long").alias("total_value"))
    return banded.crossJoin(F.broadcast(total)).select(
        "age_band",
        "n_utxos",
        "band_value",
        (
            F.col("band_value").cast("double")
            / F.col("total_value").cast("double")
        ).alias("supply_share"),
    )


def q258_split_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree split scoring: weighted Gini impurity of the
    return-flag label for candidate l_quantity thresholds, in exact
    basis points. Each row fans out to the (threshold, branch) grid
    (4 thresholds — a bounded map-side explode), one hash aggregate
    counts (threshold, branch, class), and the impurity algebra stays
    integer via ppm class shares: p_ppm = 10^6*c DIV n_b, branch
    gini_bp = 10^4 - sum(p_ppm^2) DIV 10^8 — the share form is the
    OVERFLOW-SAFE one (sum p^2 <= 10^12 regardless of row counts,
    where n_b^2 arithmetic dies at ~1e9-row branches), the same
    discipline as the q242 HHI. Weighted term = n_b*gini_bp DIV n.
    The output is candidates-sized; the consumer picks the min row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"), "l_returnflag"
    )
    fanned = li.select(
        F.explode(
            F.array(F.lit(10), F.lit(20), F.lit(30), F.lit(40))
        ).alias("threshold"),
        "qty",
        "l_returnflag",
    ).select(
        F.col("threshold").cast("long").alias("threshold"),
        (F.col("qty") <= F.col("threshold")).alias("is_left"),
        "l_returnflag",
    )
    cls = fanned.groupBy("threshold", "is_left", "l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    branch = cls.groupBy("threshold", "is_left").agg(
        F.sum("c").cast("long").alias("n_b")
    ).localCheckpoint(eager=False)
    shares = cls.join(branch, ["threshold", "is_left"]).select(
        "threshold",
        "is_left",
        "n_b",
        F.expr("CAST(1000000 * c DIV n_b AS BIGINT)").alias("p_ppm"),
    )
    gini_b = shares.groupBy("threshold", "is_left").agg(
        F.first("n_b").alias("n_b"),
        F.expr(
            "CAST(10000 - sum(p_ppm * p_ppm) DIV 100000000 AS BIGINT)"
        ).alias("gini_bp"),
    )
    tot = gini_b.groupBy("threshold").agg(
        F.sum("n_b").cast("long").alias("n")
    )
    terms = gini_b.join(tot, "threshold").select(
        "threshold",
        "is_left",
        "n_b",
        F.expr("CAST(n_b * gini_bp DIV n AS BIGINT)").alias("term_bp"),
    )
    return (
        terms.groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("is_left"), F.col("n_b")).otherwise(0))
            .cast("long")
            .alias("n_left"),
            F.sum(F.when(~F.col("is_left"), F.col("n_b")).otherwise(0))
            .cast("long")
            .alias("n_right"),
            F.sum("term_bp").cast("long").alias("weighted_gini_bp"),
        )
    )


def q259_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across groups — the batch-effect
    correction that forces every group's value distribution onto the
    pooled one: each order's within-priority rank maps to the global
    rank index ceil(rk*N/n_g), and the normalized value is the pooled
    value at that index. The global rank is the two-pass range-
    partitioned global_rank (no single-task window); within-group
    ranks are ordinary partitioned windows; the remap is one equi-
    join on the global rank index. Ties break on order key, so both
    engines walk the identical total order."""
    from graphsense_blocksci_spark.operators.windows import global_rank

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        "o_orderpriority",
        _cents("o_totalprice").alias("cents"),
    )
    g = global_rank(o, ["cents", "ok"], rank_col="grank").localCheckpoint(
        eager=False
    )
    n_tot = g.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wg = Window.partitionBy("o_orderpriority").orderBy("cents", "ok")
    ranked = g.select(
        "ok",
        "o_orderpriority",
        "cents",
        F.row_number().over(wg).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("n_g"),
    )
    idx = ranked.crossJoin(F.broadcast(n_tot)).select(
        "ok",
        "o_orderpriority",
        "cents",
        F.expr("CAST((rk * n + n_g - 1) DIV n_g AS BIGINT)").alias("gidx"),
    )
    lut = g.select(F.col("grank").alias("gidx"), F.col("cents").alias("norm_cents"))
    return idx.join(lut, "gidx").select(
        "ok", "o_orderpriority", "cents", "norm_cents"
    )


def qd57_streaming_bitmap_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of the q253 activity-bitmap build: events staged
    as TWO files consumed one per trigger, each (epoch-day, 60-user
    word) cell OR-folding in the state store (streaming/sketches.py:
    bitmap_or_stream) — OR is idempotent and commutative, so the
    cross-batch fold must reproduce the batch bitmap exactly; DAU is
    popcount summed per day over the final snapshots (bit_or across
    snapshots absorbs the per-batch emissions)."""
    import tempfile

    from graphsense_blocksci_spark.streaming.sketches import bitmap_or_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("eid"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("eday"),
        F.col("user_id").cast("long").alias("u"),
    )
    work = tempfile.mkdtemp(prefix="gbs_sbm_")
    ev.filter(F.col("eid") % 2 == 0).select("eday", "u").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{work}/src")
    ev.filter(F.col("eid") % 2 == 1).select("eday", "u").coalesce(1).write.mode(
        "append"
    ).parquet(f"{work}/src")
    stream = (
        spark.readStream.schema("eday long, u long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/src")
    )
    q = (
        bitmap_or_stream(stream, "eday", "u")
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.read.schema("day long, word long, bits long").parquet(
        f"{work}/out"
    )
    final = snaps.groupBy("day", "word").agg(
        F.expr("bit_or(bits)").alias("bits")
    )
    return final.groupBy("day").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("dau")
    )


def q260_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair by linear interpolation — the time-series step after
    q95's zero-fill when absence means 'unobserved', not 'zero': the
    hourly purchase-revenue series joins the full hour spine, and each
    missing hour takes prev + (next-prev)*(h-ph) DIV (nh-ph) between
    its nearest observed neighbors (exact integer lerp, truncation
    toward zero in both engines); leading/trailing gaps stay NULL.
    Neighbor lookup is two IGNORE NULLS window scans over the
    calendar-bounded hour grain."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(_cents("value")).cast("long").alias("cents")
    )
    bounds = obs.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    joined = spine.join(obs, "h", "left").select(
        "h",
        F.expr("CAST(unix_timestamp(h) DIV 3600 AS BIGINT)").alias("eh"),
        "cents",
    )
    wp = Window.orderBy("eh").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("eh").rowsBetween(1, Window.unboundedFollowing)
    ctx = joined.select(
        "h",
        "eh",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(
            F.when(F.col("cents").isNotNull(), F.col("eh")), ignorenulls=True
        ).over(wp).alias("ph"),
        F.first("cents", ignorenulls=True).over(wn).alias("nv"),
        F.first(
            F.when(F.col("cents").isNotNull(), F.col("eh")), ignorenulls=True
        ).over(wn).alias("nh"),
    )
    return ctx.select(
        "h",
        F.col("cents").isNotNull().alias("observed"),
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.expr(
                "pv + CAST((nv - pv) * (eh - ph) DIV (nh - ph) AS BIGINT)"
            ),
        )
        .cast("long")
        .alias("cents_filled"),
    )


def q261_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling — the
    training-data mixing draw where big sources must appear in
    proportion to their weight: customers lay end-to-end in key order
    by revenue weight (the distributed two-phase prefix sum from
    operators/packing.py:sequence_packing — no corpus-wide sequential
    window), a fixed stride W DIV k walks the cumulative axis, and a
    customer is drawn once per selection point inside its weight span
    ((off+w) DIV stride - off DIV stride hits, so heavyweights can be
    drawn multiple times — by design in PPS-with-replacement). Pure
    integer arithmetic end to end. The stride is floored at 1 so a
    total weight under the 100-draw count degrades to every-cent
    selection points instead of a silent divide-by-zero."""
    from graphsense_blocksci_spark.operators.packing import sequence_packing

    o = load_table(spark, sf_dir, "orders")
    w = o.groupBy(F.col("o_custkey").cast("long").alias("ck")).agg(
        F.sum(_cents("o_totalprice")).cast("long").alias("wt")
    )
    packed = sequence_packing(
        w, budget=1 << 40, id_col="ck", count_col="wt"
    ).select(
        F.col("doc_id").alias("o_custkey"),
        F.col("n_tokens").alias("weight_cents"),
        "offset",
    )
    tot = w.agg(F.sum("wt").cast("long").alias("tw"))
    hits = (
        packed.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "weight_cents",
            F.expr(
                "CAST((offset + weight_cents) DIV greatest(tw DIV 100, 1)"
                " - offset DIV greatest(tw DIV 100, 1) AS BIGINT)"
            ).alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )
    return hits


def qd58_tagged_netflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily money flow categorized by entity tag — the GraphSense
    'exchange flow' readout: qd50's proportionally-attributed
    address-to-address flows, each endpoint labeled tagged/untagged
    through its co-spend entity (qd16 clustering + qd39 seed rule;
    output addresses that never co-spend default untagged), rolled up
    per (day, src_tagged, dst_tagged). The four daily cells are the
    inflow/outflow/internal/background decomposition analysts chart.
    One linkage-shaped pair join (tx-keyed) + two address-tag hash
    joins + one day rollup."""
    from graphsense_blocksci_spark.operators.textops import hash28

    _, raw_txs, _ = _fixture_frames(spark)
    ents = qd16_cospend_entities(spark, sf_dir)
    etag = (
        ents.withColumn("_seed", (hash28(F.col("addr")) % 37 == 0).cast("long"))
        .groupBy("entity")
        .agg(F.max("_seed").cast("int").alias("t"))
    )
    addr_tag = ents.join(etag, "entity").select(
        "addr", F.col("t").alias("tagged")
    ).localCheckpoint(eager=False)
    times = raw_txs.select(
        "tx_id",
        F.expr("CAST(CAST(timestamp AS BIGINT) DIV 86400 AS BIGINT)").alias(
            "day"
        ),
    )
    ins = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("inp"))
        .filter(F.size("inp.address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "inp.address").alias("src_addr"),
            F.col("inp.value").cast("long").alias("in_val"),
        )
        .groupBy("tx_id", "src_addr")
        .agg(F.sum("in_val").cast("long").alias("in_val"))
    )
    tot = ins.groupBy("tx_id").agg(
        F.sum("in_val").cast("long").alias("total_in")
    )
    outs = (
        raw_txs.select("tx_id", F.explode("outputs").alias("out"))
        .filter(F.size("out.address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "out.address").alias("dst_addr"),
            F.col("out.value").cast("long").alias("out_val"),
        )
        .groupBy("tx_id", "dst_addr")
        .agg(F.sum("out_val").cast("long").alias("out_val"))
    )
    pairs = (
        ins.join(tot, "tx_id")
        .join(outs, "tx_id")
        .join(times, "tx_id")
        .select(
            "day",
            "src_addr",
            "dst_addr",
            F.expr(
                "CAST(CAST(out_val AS DECIMAL(38,0)) * in_val"
                " DIV total_in AS BIGINT)"
            ).alias("flow"),
        )
    )
    labeled = (
        pairs.join(
            addr_tag.select(
                F.col("addr").alias("src_addr"),
                F.col("tagged").alias("src_tagged"),
            ),
            "src_addr",
            "left",
        )
        .join(
            addr_tag.select(
                F.col("addr").alias("dst_addr"),
                F.col("tagged").alias("dst_tagged"),
            ),
            "dst_addr",
            "left",
        )
        .select(
            "day",
            F.coalesce("src_tagged", F.lit(0)).alias("src_tagged"),
            F.coalesce("dst_tagged", F.lit(0)).alias("dst_tagged"),
            "flow",
        )
    )
    return labeled.groupBy("day", "src_tagged", "dst_tagged").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("flow").cast("long").alias("total_flow"),
    )


def q262_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival over the q247 life table,
    kept exact-integer: S(t) in ppm via the recurrence
    s_i = s_{i-1} * (n_i - d_i) DIV n_i — the float cumulative
    product (exp-sum-ln) is libm- and order-dependent, the scaled
    integer recurrence is neither. The life table is DOMAIN-bounded
    (gap DIV 30 days — tens of rows regardless of corpus size), so
    the sequential fold runs driver-side over that bounded frame (the
    documented bounded-probe pattern; a 1000-bucket cap guards the
    contract), while everything data-sized — the gap derivation and
    the bucket aggregate — stays distributed. Oracle: recursive CTE
    with the identical recurrence."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("ts"),
    )
    w = Window.partitionBy("o_custkey").orderBy("ts")
    nxt = o.select(
        "o_custkey", "ts", F.lead("ts").over(w).alias("next_ts")
    )
    h = o.agg(F.max("ts").alias("h"))
    obs = nxt.crossJoin(F.broadcast(h)).select(
        F.when(
            F.col("next_ts").isNotNull(), F.col("next_ts") - F.col("ts")
        )
        .otherwise(F.col("h") - F.col("ts"))
        .alias("gap_s"),
        F.col("next_ts").isNotNull().alias("event"),
    )
    per_b = (
        obs.select(
            F.expr("CAST(gap_s DIV 2592000 AS BIGINT)").alias("bucket"),
            "event",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(F.when(F.col("event"), 1).otherwise(0))
            .cast("long")
            .alias("events"),
        )
    )
    wb = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    lt = per_b.select(
        "bucket",
        F.sum("n_obs").over(wb).cast("long").alias("at_risk"),
        "events",
    )
    rows = sorted(
        ((r["bucket"], r["at_risk"], r["events"]) for r in lt.collect())
    )
    if len(rows) > 1000:
        raise RuntimeError(
            f"kaplan_meier: {len(rows)} life-table buckets exceed the "
            "bounded-fold cap; widen the bucket (2592000s) instead"
        )
    s = 1_000_000
    out = []
    for bucket, at_risk, events in rows:
        s = s * (at_risk - events) // at_risk
        out.append((bucket, at_risk, events, s))
    return spark.createDataFrame(
        out, "bucket long, at_risk long, events long, survival_ppm long"
    )


def q263_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer quasi-identifier tuple
    (nation, market segment, account-balance kilobucket) — the
    privacy profiling pass that pairs with the q114 PII redaction:
    one hash aggregate to QI-group sizes, then for each k threshold
    the count of under-k groups and the rows they expose. The
    threshold fan-out runs over the GROUP frame (already tiny), never
    the raw table."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        "c_mktsegment",
        F.expr(
            "CAST(CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000 AS BIGINT)"
        ).alias("bal_kb"),
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    fanned = qi.select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k"),
        "sz",
    )
    return (
        fanned.groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_small_groups"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )
    )


def q264_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation — the LISTAGG /
    string_agg surface: per region, its nation names concatenated in
    collation-free byte order. Spark composes it as
    array_join(sort_array(collect_list(...))) — collect_list order is
    partition-dependent, so the EXPLICIT sort is what makes the
    result reproducible (and hash-comparable); the oracle's
    string_agg(... ORDER BY) declares the same order. Dimension-sized
    aggregate."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        nat.join(
            F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations_csv"),
        )
    )


def q265_mixing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture manifest — the composition readout over the
    round-7 sampling stack: per source, token mass drives an integer
    PPS allocation of a 500-doc selection budget (a_s = 500·tok_s DIV
    tok_total, the q261 arithmetic at source grain), the selection
    itself is the deterministic md5-order top-a_s within each source
    (retries and engines agree), and the manifest reports docs/tokens
    before and after plus the 256-token bin count the q98 packer
    would emit (ceil division). One token-count projection, one
    source aggregate, one per-source rank window over the selection
    order."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tok_s"),
    )
    tot = per_src.agg(F.sum("tok_s").cast("long").alias("tok_total"))
    alloc = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tok_s",
        F.expr("CAST(500 * tok_s DIV tok_total AS BIGINT)").alias("a_s"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "source", "doc_id", "n_tokens", F.row_number().over(w).alias("rk")
    )
    picked = (
        ranked.join(F.broadcast(alloc.select("source", "a_s")), "source")
        .filter(F.col("rk") <= F.col("a_s"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum("n_tokens").cast("long").alias("tok_selected"),
        )
    )
    return (
        alloc.join(picked, "source", "left")
        .select(
            "source",
            "n_docs",
            "tok_s",
            "a_s",
            F.coalesce("n_selected", F.lit(0)).cast("long").alias(
                "n_selected"
            ),
            F.coalesce("tok_selected", F.lit(0)).cast("long").alias(
                "tok_selected"
            ),
            F.expr(
                "CAST((coalesce(tok_selected, 0) + 255) DIV 256 AS BIGINT)"
            ).alias("n_bins"),
        )
    )


def q266_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the conformance pass that pairs
    with q197's FK INFERENCE: for each declared relationship, the
    child row count, orphan count (left_anti against the parent key
    set) and orphan ppm. Each relationship is one anti-join on its
    key — at scale the parent side is the smaller key projection and
    broadcasts where it fits; the verdict frame is relationship-
    sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")

    def audit(child: DataFrame, ck: str, parent: DataFrame, pk: str,
              rel: str) -> DataFrame:
        keys = parent.select(F.col(pk).alias(ck)).distinct()
        n = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orphans = child.join(keys, ck, "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("n_orphans")
        )
        return n.crossJoin(orphans).select(
            F.lit(rel).alias("relationship"),
            "n_child",
            "n_orphans",
            F.expr("CAST(1000000 * n_orphans DIV n_child AS BIGINT)").alias(
                "orphan_ppm"
            ),
        )

    rels = [
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
        audit(li, "l_partkey", p, "p_partkey", "lineitem->part"),
        audit(o, "o_custkey", c, "c_custkey", "orders->customer"),
        audit(c, "c_nationkey", nat, "n_nationkey", "customer->nation"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionByName(r)
    return out


def q267_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly flags — the composition the q254
    decomposition exists for: a day is anomalous when its remainder
    (revenue net of trend and weekly seasonal) exceeds 4x the median
    absolute remainder. The MAD threshold uses the exact `percentile`
    contract on the DOMAIN-bounded day frame and rides back as a
    broadcast 1-row aggregate; remainders compare as |r|*10 >= 40*mad
    in scaled integers (remainder is double but its integer-cents
    core cents-trend is exact, so the comparison is done on
    |cents - trend - round(seasonal)| — fully integer)."""
    base = q254_seasonal_decomposition(spark, sf_dir).select(
        "day",
        "cents",
        "trend",
        F.expr(
            "CAST(abs(cents - trend - CAST(round(seasonal_mean) AS BIGINT))"
            " AS BIGINT)"
        ).alias("abs_rem"),
    ).localCheckpoint(eager=False)
    mad = base.agg(
        F.expr("CAST(floor(percentile(abs_rem, 0.5D)) AS BIGINT)").alias("mad")
    )
    return base.crossJoin(F.broadcast(mad)).select(
        "day",
        "cents",
        "trend",
        "abs_rem",
        "mad",
        (F.col("abs_rem") >= 4 * F.col("mad")).alias("is_anomaly"),
    )


def q268_rollup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent reporting over the region → nation hierarchy:
    each nation's revenue as ppm of its region, each region's as ppm
    of the grand total — the drill-down share readout built on ONE
    ROLLUP pass (region, nation) instead of three scans; parent
    totals join back from the rollup's own coarser rows. Exact
    integer ppm everywhere."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    cube = joined.rollup("r_name", "n_name").agg(
        F.sum("cents").cast("long").alias("cents")
    ).localCheckpoint(eager=False)
    grand = cube.filter(
        F.col("r_name").isNull() & F.col("n_name").isNull()
    ).select(F.col("cents").alias("grand_cents"))
    regions = cube.filter(
        F.col("r_name").isNotNull() & F.col("n_name").isNull()
    ).select("r_name", F.col("cents").alias("region_cents"))
    nations = cube.filter(F.col("n_name").isNotNull()).select(
        "r_name", "n_name", "cents"
    )
    return (
        nations.join(F.broadcast(regions), "r_name")
        .crossJoin(F.broadcast(grand))
        .select(
            "r_name",
            "n_name",
            "cents",
            "region_cents",
            "grand_cents",
            F.expr("CAST(1000000 * cents DIV region_cents AS BIGINT)").alias(
                "share_of_region_ppm"
            ),
            F.expr(
                "CAST(1000000 * region_cents DIV grand_cents AS BIGINT)"
            ).alias("region_share_ppm"),
        )
    )


def qd59_multi_chain_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-keyspace (multi-currency) operation — the reference runs
    one keyspace per chain (conf/btc.cfg, bch.cfg, ltc.cfg, zec.cfg;
    create_keyspace.py:55-70 bootstraps each) and analysts union
    across them. Here the second chain derives deterministically from
    the fixture (ltc: block cadence 4x faster, values 4x smaller —
    the parameter differences the per-chain configs encode; the LTC
    tx-version patch is dispositioned in SURVEY §2), each chain
    keeps its own frame, and the cross-chain readout is one
    unionByName + per-chain aggregate — the plan shape a real
    multi-keyspace deployment produces, with chain as the partition
    column so per-chain scans prune."""
    _, raw_txs, _ = _fixture_frames(spark)
    base = raw_txs.select(
        "tx_id",
        "block_id",
        F.col("timestamp").cast("long").alias("ts"),
        F.expr(
            "CAST(aggregate(outputs, 0L, (a, o) -> a + o.value) AS BIGINT)"
        ).alias("out_value"),
        "coinbase",
    )
    chains = []
    for chain, t_div, v_div in (("btc", 1, 1), ("ltc", 4, 4)):
        chains.append(
            base.select(
                F.lit(chain).alias("chain"),
                "tx_id",
                "block_id",
                F.expr(f"CAST(ts DIV {t_div} AS BIGINT)").alias("ts"),
                F.expr(f"CAST(out_value DIV {v_div} AS BIGINT)").alias(
                    "out_value"
                ),
                "coinbase",
            )
        )
    multi = chains[0].unionByName(chains[1])
    return (
        multi.groupBy("chain")
        .agg(
            F.countDistinct("block_id").cast("long").alias("n_blocks"),
            F.count(F.lit(1)).cast("long").alias("n_txs"),
            F.sum("out_value").cast("long").alias("total_out_value"),
            F.sum(F.when(F.col("coinbase"), 1).otherwise(0))
            .cast("long")
            .alias("n_coinbase"),
            (F.max("ts") - F.min("ts")).cast("long").alias("span_s"),
        )
    )


def q269_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log — the
    warehouse-side twin of A22's last-write-wins upsert (reference
    sink semantics at scripts/blocksci_export.py:113-149 keep only
    the last write; SCD2 keeps the full validity history instead).
    Per user, the event stream collapses into attribute VERSIONS (a
    new version only when event_type actually changes), each carrying
    its validity interval [valid_from, valid_to) and an is_current
    flag. One user-keyed window pass detects changes; a second
    numbers the survivors and chains valid_to = next valid_from. At
    scale both windows reuse the same (user_id) shuffle and the
    change filter drops the dominant no-change mass before the
    second pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    return changed.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def q270_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user reaches
    step k only with a step-k event STRICTLY AFTER their step-(k-1)
    entry time — the min-per-type shortcut would overcount
    out-of-order users. Three user-keyed conditional-min aggregates
    chain the entry times (each intermediate pinned because it feeds
    both the next stage and its own count); the four stage counts
    ride as broadcast 1-row aggregates stacked into the report, so
    there is no driver action anywhere. Exact integer ppm conversion
    per stage."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n0 = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n0")
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n3"))
    wide = (
        n0.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
    )
    return wide.select(
        F.expr(
            "stack(4,"
            " CAST(0 AS BIGINT), 'all_users', n0, n0,"
            " CAST(1 AS BIGINT), 'view', n1, n0,"
            " CAST(2 AS BIGINT), 'click', n2, n1,"
            " CAST(3 AS BIGINT), 'purchase', n3, n2)"
            " AS (step, step_name, n_users, n_prev)"
        )
    ).select(
        "step",
        "step_name",
        "n_users",
        "n_prev",
        F.expr(
            "CASE WHEN n_prev = 0 THEN NULL"
            " ELSE CAST(1000000 * n_users DIV n_prev AS BIGINT) END"
        ).alias("conversion_ppm"),
    )


def q271_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency — the overlap analytic Spark
    has no operator for: each lineitem is OPEN from its order date
    through its ship date (inclusive); the peak number of
    simultaneously open lines per year falls out of a +1/−1 delta
    stream, a day-level pre-aggregate, and ONE prefix-sum window.
    The global-order window is safe at any scale because the
    pre-aggregate bounds it to the day domain (~2.5k rows for the
    7-year span), never the lineitem count; the peak-day readback
    joins against the year-level maxima as a broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_day")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_day")
    )
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "open_day", F.date_add("ship_day", 1).alias("close_day")
    )
    deltas = (
        iv.select(F.col("open_day").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            iv.select(F.col("close_day").alias("day"), F.lit(-1).alias("d"))
        )
        .groupBy("day")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    conc = deltas.select(
        "day", F.sum("delta").over(w).cast("long").alias("open_lines")
    ).localCheckpoint(eager=False)
    peaks = conc.groupBy(F.year("day").cast("long").alias("year")).agg(
        F.max("open_lines").alias("peak_open")
    )
    return (
        conc.select(
            F.year("day").cast("long").alias("year"), "day", "open_lines"
        )
        .join(F.broadcast(peaks), "year")
        .filter(F.col("open_lines") == F.col("peak_open"))
        .groupBy("year", "peak_open")
        .agg(F.min("day").cast("timestamp").alias("peak_day"))
    )


def q272_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE active days per
    user. The island key is day_number − row_number (constant within
    a consecutive run) — one user-keyed window plus two aggregates,
    no self-join, no recursion. Equal-length streaks resolve to the
    earliest start for determinism. At scale everything shuffles
    once on user_id; the distinct day projection bounds the window
    input to (users × active days)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date")).cast("long")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("start_day"),
    ).localCheckpoint(eager=False)
    best = streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
    )
    first_best = (
        streaks.join(
            best.select("user_id", F.col("longest_streak").alias("len")),
            ["user_id", "len"],
        )
        .groupBy("user_id")
        .agg(F.min("start_day").cast("timestamp").alias("streak_start"))
    )
    return best.join(first_best, "user_id")


def q273_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: the op-log variant of q200's MERGE
    and A22's last-write-wins upsert. Each lineitem row is an op on
    its order key (seq = line number); a deterministic md5 coin marks
    ~1/7 of ops as deletes. The survivor per key is row_number()=1
    over (seq DESC) — one key-keyed window, no driver state — and
    the report aggregates the applied table by final op. At scale
    this is the standard log-compaction shuffle on the uniform
    order key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").cast("long").alias("seq"),
        _cents("l_extendedprice").alias("payload_cents"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(concat("
            "CAST(l_orderkey AS STRING), ':',"
            " CAST(l_linenumber AS STRING))), 1, 7), 16, 10) AS BIGINT)"
            " % 7 = 0 THEN 'D' ELSE 'U' END"
        ).alias("op"),
    )
    # (key, seq) is NOT unique in the synthetic data — the order
    # must total-order every output-relevant column so the survivor's
    # VALUES are deterministic even when whole rows tie.
    w = Window.partitionBy("key").orderBy(
        F.col("seq").desc(), F.col("payload_cents").desc(), F.col("op").desc()
    )
    last = li.select(
        "key",
        "seq",
        "payload_cents",
        "op",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    return last.groupBy("op").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("payload_cents").cast("long").alias("sum_payload_cents"),
        F.sum("key").cast("long").alias("sum_keys"),
        F.max("seq").cast("long").alias("max_seq"),
    )


def q274_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand index between two document clusterings (language
    vs 64-char length bucket) by exact pair counting: ONE contingency
    aggregate feeds the cell/row/column comb2 sums; the ARI closed
    form evaluates on broadcast 1-row frames in DECIMAL(38,0) so the
    pair-count products cannot overflow int64 at any corpus size
    (DuckDB mirrors with HUGEINT). Output is exact integer ppm
    (truncation toward zero matches across engines, negatives
    included). No pair materialization anywhere — the contingency
    table is (|A| x |B|)-bounded."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.expr("CAST(n_chars DIV 64 AS BIGINT)").alias("bucket")
    )
    cont = docs.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=False)
    i_pairs = cont.agg(
        F.sum(F.expr("cnt * (cnt - 1) DIV 2")).cast("long").alias("i_pairs")
    )
    sa = (
        cont.groupBy("lang")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).cast("long").alias("sa"))
    )
    sb = (
        cont.groupBy("bucket")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).cast("long").alias("sb"))
    )
    n = cont.agg(F.sum("cnt").cast("long").alias("n_items"))
    wide = (
        n.crossJoin(F.broadcast(i_pairs))
        .crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
    )
    return wide.select(
        "n_items",
        F.expr("CAST(n_items * (n_items - 1) DIV 2 AS BIGINT)").alias(
            "n_pairs"
        ),
        "i_pairs",
        "sa",
        "sb",
        F.expr(
            "CASE WHEN CAST(n_items * (n_items - 1) DIV 2 AS DECIMAL(38,0))"
            " * (sa + sb) - 2 * CAST(sa AS DECIMAL(38,0)) * sb = 0"
            " THEN NULL ELSE CAST("
            " (2000000 * (CAST(i_pairs AS DECIMAL(38,0))"
            "   * (n_items * (n_items - 1) DIV 2)"
            "   - CAST(sa AS DECIMAL(38,0)) * sb))"
            " DIV (CAST(n_items * (n_items - 1) DIV 2 AS DECIMAL(38,0))"
            "   * (sa + sb) - 2 * CAST(sa AS DECIMAL(38,0)) * sb)"
            " AS BIGINT) END"
        ).alias("ari_ppm"),
    )


def q275_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record-linkage scoring (the Fellegi-Sunter shape):
    candidate customer pairs come ONLY from (nation, segment) blocks
    and each pair scores the sum of fixed integer log-likelihood
    agreement weights over two compared fields (a $1000 balance
    bucket and a mod-97 synthetic identifier). Top-100 by (score
    DESC, key_a, key_b). The fixed-cardinality blocking key makes the
    naive block self-join quadratic in corpus size (the round-7 10x
    finding), so this rides operators/entity_resolution.py:
    fellegi_sunter_topk — adaptive tier descent that counts pairs per
    agreement pattern with group-size arithmetic and only
    materializes the tiers the top-100 needs; at scale that is the
    all-agree tier, whose join key is the full (block, bal, syn)
    tuple with near-constant block sizes. Identical output to the
    naive plan, verified cell-exact against the all-block-pairs
    DuckDB oracle."""
    from graphsense_blocksci_spark.operators.entity_resolution import (
        fellegi_sunter_topk,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000"
            " AS BIGINT)"
        ).alias("bal_bucket"),
        F.expr("CAST(c_custkey % 97 AS BIGINT)").alias("synth_id"),
    )
    return fellegi_sunter_topk(
        c,
        block_cols=("c_nationkey", "c_mktsegment"),
        fields=(("bal_bucket", 24, -8), ("synth_id", 18, -6)),
        k=100,
        id_col="c_custkey",
    ).select(
        "key_a",
        "key_b",
        F.col("agree_bal_bucket").alias("agree_bal"),
        F.col("agree_synth_id").alias("agree_syn"),
        "score",
    )


def q276_vwap_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC + volume-weighted average price bars per event type:
    open/close via first_value/last_value over the full (day, symbol)
    frame ordered by the unique (ts, event_id) key, high/low/volume/
    VWAP from the same grouped pass. VWAP is exact integer cents
    (sum(price*vol) DIV sum(vol)). One shuffle on (day, symbol) serves
    both the window and the aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.col("event_type").alias("symbol"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("CAST(event_id % 7 + 1 AS BIGINT)").alias("vol"),
    )
    w = (
        Window.partitionBy("day", "symbol")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    enriched = ev.select(
        "day",
        "symbol",
        "cents",
        "vol",
        F.first("cents").over(w).alias("open_c"),
        F.last("cents").over(w).alias("close_c"),
    )
    return enriched.groupBy(
        F.col("day").cast("timestamp").alias("day"), "symbol"
    ).agg(
        F.max("open_c").cast("long").alias("open_cents"),
        F.max("cents").cast("long").alias("high_cents"),
        F.min("cents").cast("long").alias("low_cents"),
        F.max("close_c").cast("long").alias("close_cents"),
        F.sum("vol").cast("long").alias("volume"),
        F.expr(
            "CAST(sum(cents * vol) DIV sum(vol) AS BIGINT)"
        ).alias("vwap_cents"),
    )


def q277_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query over positional posting lists — the retrieval
    primitive BM25 (q107) cannot answer: find every document where
    'hash' is IMMEDIATELY followed by 'join'. Tokens posexplode once
    with 1-based positions; the two term filters prune the posting
    join inputs to the query terms before the (doc, pos+1) equi-join,
    so the cost is posting-list-sized, never corpus-sized. Counts
    include overlapping occurrences by construction."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens("text").alias("toks"),
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok"
    )
    t1 = tok.filter(F.col("tok") == "hash").select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = tok.filter(F.col("tok") == "join").select(
        "doc_id", F.col("pos").alias("p2")
    )
    m = t1.join(t2, "doc_id").filter(F.col("p2") == F.col("p1") + 1)
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("p1").cast("long").alias("first_pos"),
    )


def qd60_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of the q276 OHLC/VWAP bars: events staged as
    TWO files consumed one per trigger (split by event-id parity, so
    each micro-batch interleaves event time and exercises the
    order-independent merge), each (day, symbol) bar folding in the
    state store (streaming/bars.py) with arg-min/arg-max opens/closes
    and summed volume. The freshest cumulative snapshot per bar
    (max_by on the strictly-growing n_seen) must equal the batch bar
    EXACTLY — the oracle is the same SQL as q276."""
    import tempfile

    from graphsense_blocksci_spark.streaming.bars import ohlc_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        F.col("event_type").alias("symbol"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_micros"),
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("CAST(event_id % 7 + 1 AS BIGINT)").alias("vol"),
    )
    work = tempfile.mkdtemp(prefix="gbs_sohlc_")
    cols = ["day", "symbol", "ts_micros", "event_id", "cents", "vol"]
    ev.filter(F.col("event_id") % 2 == 0).select(*cols).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{work}/src")
    ev.filter(F.col("event_id") % 2 == 1).select(*cols).coalesce(
        1
    ).write.mode("append").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema(
            "day long, symbol string, ts_micros long, event_id long,"
            " cents long, vol long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/src")
    )
    q = (
        ohlc_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.read.schema(
        "day long, symbol string, n_seen long, open_c long, high_c long,"
        " low_c long, close_c long, vol long, pv long"
    ).parquet(f"{work}/out")
    final = snaps.groupBy("day", "symbol").agg(
        F.expr("max_by(open_c, n_seen)").alias("open_cents"),
        F.expr("max_by(high_c, n_seen)").alias("high_cents"),
        F.expr("max_by(low_c, n_seen)").alias("low_cents"),
        F.expr("max_by(close_c, n_seen)").alias("close_cents"),
        F.expr("max_by(vol, n_seen)").alias("volume"),
        F.expr("max_by(pv, n_seen)").alias("pv"),
    )
    return final.select(
        F.expr(
            "CAST(date_add(DATE '1970-01-01', CAST(day AS INT))"
            " AS TIMESTAMP)"
        ).alias("day"),
        "symbol",
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
        "volume",
        F.expr("CAST(pv DIV volume AS BIGINT)").alias("vwap_cents"),
    )


def q278_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle — the revenue companion to
    q128's retention counts: customers cohort by FIRST order month,
    every later order lands at an integer month age (12*year+month
    index arithmetic, no float months_between), and each (cohort,
    age) cell reports active customers, period revenue, and the
    running cumulative LTV via a cohort-partitioned prefix window.
    Two shuffles (first-order aggregate, triangle aggregate); the
    window runs over the bounded cohort x age grid."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("midx"),
        _cents("o_totalprice").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("midx").alias("cohort_midx"))
    tri = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort_midx",
            (F.col("midx") - F.col("cohort_midx")).alias("age_months"),
        )
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("n_active"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_midx")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return tri.select(
        F.expr(
            "CAST(make_date(CAST(cohort_midx DIV 12 AS INT),"
            " CAST(cohort_midx % 12 + 1 AS INT), 1) AS TIMESTAMP)"
        ).alias("cohort_month"),
        "age_months",
        "n_active",
        "cents",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


def q279_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining one order up from q164's bigram
    transitions: per-user event-type TRIGRAMS from two stacked leads
    over the unique (ts, event_id) order — an offset window, never a
    positional self-join — then a global count and a deterministic
    top-10 TakeOrdered on (count DESC, trigram)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    counts = tri.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return counts.orderBy(F.col("n").desc(), "t1", "t2", "t3").limit(10)


def q280_locf_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation — the staleness
    fill q260's linear interpolation deliberately is not: the daily
    revenue series per nation densifies onto the shared order-day
    spine (distinct days x 25 nations, a broadcast cross join of two
    bounded key sets), missing cells fill with the latest preceding
    observation (last(ignorenulls) prefix window), and every row
    reports its staleness age in days. NULL before the first
    observation stays NULL — LOCF never invents data."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        _cents("o_totalprice").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    ).localCheckpoint(eager=False)
    spine = (
        daily.select("day")
        .distinct()
        .crossJoin(F.broadcast(nat.select("n_name")))
    )
    dense = spine.join(daily, ["n_name", "day"], "left")
    w = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        "n_name",
        F.col("day").cast("timestamp").alias("day"),
        "cents",
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.datediff(
            "day",
            F.last(
                F.when(F.col("cents").isNotNull(), F.col("day")), True
            ).over(w),
        ).cast("long").alias("staleness_days"),
    )


def qd61_fifo_taint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO taint allocation — the positional taint semantics BlockSci
    ships alongside the haircut variant (qd13 covers reachability;
    this computes the per-output tainted VALUE): within a spending tx,
    inputs and outputs lay out on one cumulative value axis in
    position order, and each output inherits exactly the tainted
    input-interval mass that overlaps its own interval (fee = the
    axis tail past the last output, absorbing leftover taint). Seeds
    are the coinbase outputs of the first 10 blocks, fully tainted.
    One posexplode each side, two per-tx prefix windows, and a per-tx
    interval-overlap join bounded by the tx's own in x out degree —
    never a global pairing. Exact satoshi integers throughout."""
    _, raw_txs, _ = _fixture_frames(spark)
    seeds = (
        raw_txs.filter(F.col("coinbase") & (F.col("block_id") < 10))
        .select(F.col("tx_id").alias("seed_tx"))
    )
    spend = raw_txs.filter(~F.col("coinbase"))
    w_in = Window.partitionBy("tx_id").orderBy("in_pos")
    ins = (
        spend.select("tx_id", F.posexplode("inputs").alias("in_pos", "i"))
        .select(
            "tx_id",
            "in_pos",
            F.col("i.value").cast("long").alias("in_val"),
            F.col("i.spent_tx_id").alias("spent_tx_id"),
        )
        .select(
            "tx_id",
            "in_pos",
            "spent_tx_id",
            F.sum("in_val").over(
                w_in.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("in_end"),
            (
                F.sum("in_val").over(
                    w_in.rowsBetween(Window.unboundedPreceding, 0)
                )
                - F.col("in_val")
            ).alias("in_start"),
        )
    )
    tainted_ins = ins.join(
        F.broadcast(seeds), ins.spent_tx_id == seeds.seed_tx
    ).select("tx_id", "in_start", "in_end")
    w_out = Window.partitionBy("tx_id").orderBy("out_pos")
    outs = (
        spend.select("tx_id", F.posexplode("outputs").alias("out_pos", "o"))
        .select(
            "tx_id",
            F.col("out_pos").cast("long").alias("out_pos"),
            F.col("o.value").cast("long").alias("value"),
        )
        .select(
            "tx_id",
            "out_pos",
            "value",
            F.sum("value").over(
                w_out.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("out_end"),
            (
                F.sum("value").over(
                    w_out.rowsBetween(Window.unboundedPreceding, 0)
                )
                - F.col("value")
            ).alias("out_start"),
        )
    )
    alloc = outs.join(tainted_ins, "tx_id").select(
        "tx_id",
        "out_pos",
        "value",
        F.greatest(
            F.lit(0).cast("long"),
            F.least("in_end", "out_end")
            - F.greatest("in_start", "out_start"),
        ).alias("overlap"),
    )
    return (
        alloc.groupBy("tx_id", F.col("out_pos").alias("output_index"), "value")
        .agg(F.sum("overlap").cast("long").alias("tainted_value"))
        .filter(F.col("tainted_value") > 0)
    )


def q281_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-dominance) query over parts — minimize retail
    price, maximize size: a part survives iff no other part is
    cheaper-or-equal AND bigger-or-equal with one strict. Two windows
    decide it without any self-join: the same-price partition max
    (dominated within its price point unless it carries the group's
    max size) and a RANGE prefix max over STRICTLY cheaper prices
    (any cheaper part with >= size dominates). Equal (price, size)
    duplicates all survive — no strict edge. Integer cents ordering
    makes the RANGE -1 frame exact."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        _cents("p_retailprice").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    w_same = Window.partitionBy("price_cents")
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    flagged = p.select(
        "p_partkey",
        "price_cents",
        "size",
        F.max("size").over(w_same).alias("same_max"),
        F.max("size").over(w_cheaper).alias("cheaper_max"),
    )
    return flagged.filter(
        (F.col("size") == F.col("same_max"))
        & (
            F.col("cheaper_max").isNull()
            | (F.col("size") > F.col("cheaper_max"))
        )
    ).select("p_partkey", "price_cents", "size")


def q282_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window COUNT DISTINCT — DAU / trailing-7-day WAU /
    stickiness — via the q253 bitmap algebra instead of a 7x
    re-aggregation: per (epoch-day, 60-user word) activity bitmaps
    OR-fold over a RANGE -6..0 day window (gap-correct because the
    word x day spine is densified first), and popcount sums give both
    counts from one pass. State and shuffle are bounded by the
    day x word grid (users/60 per day), never the event stream;
    at extreme user counts the spine prunes to words active in the
    trailing window. Stickiness is exact integer ppm."""
    ev = load_table(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("eday"),
        F.expr("CAST(user_id DIV 60 AS BIGINT)").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 60 AS INT))").alias("mask"),
    )
    bits = ev.groupBy("eday", "word").agg(
        F.expr("bit_or(mask)").alias("bits")
    ).localCheckpoint(eager=False)
    spine = (
        bits.select("eday").distinct()
        .crossJoin(F.broadcast(bits.select("word").distinct()))
    )
    dense = spine.join(bits, ["eday", "word"], "left").select(
        "eday", "word", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    w7 = Window.partitionBy("word").orderBy("eday").rangeBetween(-6, 0)
    rolled = dense.select(
        "eday",
        "bits",
        F.expr("bit_or(bits)").over(w7).alias("wau_bits"),
    )
    return (
        rolled.groupBy("eday")
        .agg(
            F.sum(F.bit_count("bits")).cast("long").alias("dau"),
            F.sum(F.bit_count("wau_bits")).cast("long").alias("wau"),
        )
        .select(
            F.expr(
                "CAST(date_add(DATE '1970-01-01', CAST(eday AS INT))"
                " AS TIMESTAMP)"
            ).alias("day"),
            "dau",
            "wau",
            F.expr("CAST(1000000 * dau DIV wau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
    )


def qd62_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the address-level money-flow graph (qd50's
    relations): the share of directed edges whose reverse edge also
    exists — change outputs and back-and-forth flows make this
    non-zero on a real chain, and it is a standard forensic shape
    metric. One left-semi self-join on the swapped key pair over the
    pinned edge list; counts ride as broadcast 1-row aggregates.
    Self-loops (src == dst) are excluded on both sides."""
    rel = (
        qd50_address_relations(spark, sf_dir)
        .select("src_addr", "dst_addr")
        .filter(F.col("src_addr") != F.col("dst_addr"))
        .localCheckpoint(eager=False)
    )
    swapped = rel.select(
        F.col("dst_addr").alias("src_addr"),
        F.col("src_addr").alias("dst_addr"),
    )
    n = rel.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    r = (
        rel.join(swapped, ["src_addr", "dst_addr"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    return n.crossJoin(F.broadcast(r)).select(
        "n_edges",
        "n_reciprocal",
        F.expr(
            "CAST(1000000 * n_reciprocal DIV n_edges AS BIGINT)"
        ).alias("reciprocity_ppm"),
    )


def q283_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded tolerance join — duplicate-payment detection: order
    pairs of the SAME customer whose totals differ by <= $1000
    and whose dates are <= 90 days apart. The equi-joinable band key
    is the tolerance-width ($1000) amount bucket; the probe side fans out to its three
    neighbor buckets (b-1, b, b+1) so every within-tolerance pair
    meets on EXACTLY one (custkey, bucket) key — never an all-pairs
    or theta join — and the exact |diff| predicates verify after.
    The same banding carries to any absolute-tolerance join at 100 TB
    (bucket width = tolerance)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderkey").alias("okey"),
        _cents("o_totalprice").alias("cents"),
        F.to_date("o_orderdate").alias("day"),
    )
    probe = o.select(
        "o_custkey",
        F.col("okey").alias("key_a"),
        F.col("cents").alias("cents_a"),
        F.col("day").alias("day_a"),
        F.explode(
            F.array(
                F.expr("cents DIV 100000 - 1"),
                F.expr("cents DIV 100000"),
                F.expr("cents DIV 100000 + 1"),
            )
        ).alias("bucket"),
    )
    build = o.select(
        "o_custkey",
        F.col("okey").alias("key_b"),
        F.col("cents").alias("cents_b"),
        F.col("day").alias("day_b"),
        F.expr("cents DIV 100000").alias("bucket"),
    )
    return (
        probe.join(build, ["o_custkey", "bucket"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("cents_a") - F.col("cents_b")) <= 100000)
            & (F.abs(F.datediff("day_a", "day_b")) <= 90)
        )
        .select(
            "o_custkey",
            "key_a",
            "key_b",
            "cents_a",
            "cents_b",
            F.datediff("day_b", "day_a").cast("long").alias("day_gap"),
        )
    )


def q284_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert distribution — the latency readout on
    q270's stage chain: per transition (view->click, click->purchase)
    the population size and exact min / median / max lag in
    microseconds (integer micros, the exact `percentile` contract on
    a population-bounded frame; swap to approx_percentile at raw-event
    grain). The two stage frames are pinned once and re-used by both
    transitions."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        "event_type",
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tsu").alias("t1"))
        .localCheckpoint(eager=False)
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("tsu") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("t2"), F.min("t1").alias("t1"))
        .localCheckpoint(eager=False)
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(F.col("tsu") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("t3"), F.min("t2").alias("t2"))
    )
    lag12 = s2.select(
        F.lit("view->click").alias("transition"),
        (F.col("t2") - F.col("t1")).alias("lag_micros"),
    )
    lag23 = s3.select(
        F.lit("click->purchase").alias("transition"),
        (F.col("t3") - F.col("t2")).alias("lag_micros"),
    )
    return (
        lag12.unionByName(lag23)
        .groupBy("transition")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("lag_micros").cast("long").alias("min_micros"),
            F.expr(
                "CAST(floor(percentile(lag_micros, 0.5D)) AS BIGINT)"
            ).alias("p50_micros"),
            F.max("lag_micros").cast("long").alias("max_micros"),
        )
    )


def qd63_tx_motif_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction motif census — the shape taxonomy chain forensics
    reads first (sweeps, consolidations, fan-outs, coinjoin-shaped):
    each non-coinbase tx classifies on its (n_in, n_out) degree pair
    — a pure projection, no shuffle until the motif-sized aggregate.
    Complements qd52's per-output change heuristics with the tx-level
    census (BlockSci exposes the same degree accessors;
    reference export carries the counts at
    scripts/blocksci_export.py tx rows)."""
    _, raw_txs, _ = _fixture_frames(spark)
    shaped = raw_txs.filter(~F.col("coinbase")).select(
        F.size("inputs").cast("long").alias("n_in"),
        F.size("outputs").cast("long").alias("n_out"),
        F.expr(
            "CAST(aggregate(transform(outputs, o -> o.value),"
            " 0L, (a, x) -> a + x) AS BIGINT)"
        ).alias("out_value"),
    )
    motif = shaped.select(
        F.expr(
            "CASE WHEN n_in = 1 AND n_out = 1 THEN 'sweep'"
            " WHEN n_in >= 3 AND n_out >= 3 THEN 'coinjoin_shaped'"
            " WHEN n_in >= 3 THEN 'consolidation'"
            " WHEN n_out >= 3 THEN 'fan_out'"
            " ELSE 'simple_payment' END"
        ).alias("motif"),
        "n_in",
        "n_out",
        "out_value",
    )
    return motif.groupBy("motif").agg(
        F.count(F.lit(1)).cast("long").alias("n_txs"),
        F.sum("out_value").cast("long").alias("total_out_value"),
        F.max("n_in").cast("long").alias("max_in"),
        F.max("n_out").cast("long").alias("max_out"),
    )


def q285_lsh_quality_eval(
    spark: SparkSession, sf_dir: str, *, complete: bool = False
) -> DataFrame:
    """Pipeline-QA meta-evaluation: precision/recall of the banded
    MinHash-LSH candidate generator (q36) against the exact ground
    truth at Jaccard >= 0.2. The truth set is generated by a shingle
    inverted-index join — complete for any threshold > 0 because
    overlapping pairs must share a shingle — never a cross join; both
    pair sets pin once and the three counts ride as broadcast 1-row
    aggregates.

    DEFAULT MODE audits a deterministic fixed-SIZE doc subset: an
    md5-mod hash sample (operators/sampling.py idiom) whose integer
    cutoff is derived from the corpus count so ~2000 docs are audited
    regardless of corpus size — the truth join's cost is then
    CONSTANT in corpus size (the round-7 10x harness showed the
    complete audit growing 8.4x at 10x data; an audit metric does not
    need the full corpus, it needs an unbiased subset). The cutoff
    arithmetic is pure integers (least(10000, 10000*2000 DIV n)) so
    the DuckDB oracle re-derives the identical subset and the frame
    stays cell-exact. `complete=True` keeps the full-corpus audit for
    gate-scale review runs."""
    from graphsense_blocksci_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        shingle_hash_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    if not complete:
        n_docs = docs.count()  # one scalar to the driver — bounded
        cut = min(10_000, (10_000 * 2000) // max(n_docs, 1))
        docs = docs.filter(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7),
                16,
                10,
            ).cast("long")
            % 10_000
            < F.lit(cut)
        )
    sets_ = (
        shingle_hash_frame(docs)
        .withColumnRenamed("_sh", "sh")
        .localCheckpoint(eager=False)
    )
    post = sets_.select("doc_id", F.explode("sh").alias("shingle"))
    cand = (
        post.select(F.col("doc_id").alias("id_a"), "shingle")
        .join(
            post.select(F.col("doc_id").alias("id_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    truth = (
        cand.join(
            sets_.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sets_.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .filter(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            >= 0.2
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    lsh = minhash_lsh_pairs(docs).localCheckpoint(eager=False)
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_lsh = lsh.agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    tp = (
        lsh.join(truth, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
    )
    return (
        n_truth.crossJoin(F.broadcast(n_lsh))
        .crossJoin(F.broadcast(tp))
        .select(
            "n_truth",
            "n_lsh",
            "tp",
            F.expr("CAST(1000000 * tp DIV n_lsh AS BIGINT)").alias(
                "precision_ppm"
            ),
            F.expr("CAST(1000000 * tp DIV n_truth AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


def q286_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subsample confidence interval for the mean order
    value: ONE 60-bit md5 draw per row yields 60 half-rate replicates
    (replicate b keeps the rows whose bit b is 0 — deterministic,
    engine-portable, retry-stable, no rand()); each replicate's exact
    integer mean aggregates map-side, and the replicate distribution's
    floor-percentiles bracket the estimator. One x60 explode feeding a
    60-group aggregate — partial aggregation absorbs the fan-out, so
    the shuffle is 60 rows regardless of table size."""
    o = load_table(spark, sf_dir, "orders").select(
        _cents("o_totalprice").alias("cents"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    reps = (
        o.select(
            "cents",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b"),
        )
        .filter(F.expr("(h >> CAST(b AS INT)) & 1 = 0"))
        .groupBy("b")
        .agg(F.expr("CAST(sum(cents) DIV count(1) AS BIGINT)").alias("m"))
    )
    ci = reps.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min("m").cast("long").alias("min_mean"),
        F.expr("CAST(floor(percentile(m, 0.05D)) AS BIGINT)").alias(
            "p05_mean"
        ),
        F.expr("CAST(floor(percentile(m, 0.5D)) AS BIGINT)").alias(
            "p50_mean"
        ),
        F.expr("CAST(floor(percentile(m, 0.95D)) AS BIGINT)").alias(
            "p95_mean"
        ),
        F.max("m").cast("long").alias("max_mean"),
    )
    full = o.agg(
        F.expr("CAST(sum(cents) DIV count(1) AS BIGINT)").alias(
            "full_mean_cents"
        )
    )
    return ci.crossJoin(F.broadcast(full))


def q287_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact readout over q71's fuzzy-dedup assignment: the
    near-dup cluster-size histogram with exact bytes kept vs removed
    per size class — the number a curation run reports before anyone
    signs off on deleting 100 TB of near-duplicates. One join of the
    assignment to the doc sizes, one cluster aggregate, one size-class
    aggregate."""
    assign = q71_fuzzy_dedup(spark, sf_dir)
    sizes = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    clusters = (
        assign.join(sizes, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.sum("n_chars").cast("long").alias("bytes_total"),
            F.sum(
                F.when(F.col("is_keeper"), F.col("n_chars")).otherwise(0)
            ).cast("long").alias("bytes_kept"),
        )
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("bytes_total").cast("long").alias("bytes_total"),
        F.sum("bytes_kept").cast("long").alias("bytes_kept"),
        F.sum(F.col("bytes_total") - F.col("bytes_kept"))
        .cast("long")
        .alias("bytes_removed"),
    )


def qd64_utxo_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTXO-set growth curve — the time axis qd28's single-height
    snapshot flattens: per block, outputs created vs inputs spent
    (count and satoshi value), with the running UTXO set size and
    value from one prefix-sum window over the bounded block domain.
    The chain-wide invariant (final row == qd28's snapshot totals) is
    pytest-pinned. Deltas aggregate per block BEFORE the global
    window, so the ordered prefix sum runs over |blocks| rows, never
    |outputs|."""
    _, raw_txs, _ = _fixture_frames(spark)
    created = (
        raw_txs.select("block_id", F.explode("outputs").alias("o"))
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_created"),
            F.sum(F.col("o.value")).cast("long").alias("v_created"),
        )
    )
    spent = (
        raw_txs.filter(~F.col("coinbase"))
        .select("block_id", F.explode("inputs").alias("i"))
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spent"),
            F.sum(F.col("i.value")).cast("long").alias("v_spent"),
        )
    )
    per_block = created.join(spent, "block_id", "left").select(
        F.col("block_id").cast("long").alias("block_id"),
        "n_created",
        "v_created",
        F.coalesce("n_spent", F.lit(0)).cast("long").alias("n_spent"),
        F.coalesce("v_spent", F.lit(0)).cast("long").alias("v_spent"),
    )
    w = Window.orderBy("block_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_block.select(
        "block_id",
        "n_created",
        "n_spent",
        (F.sum(F.col("n_created") - F.col("n_spent")).over(w))
        .cast("long")
        .alias("utxo_count"),
        (F.sum(F.col("v_created") - F.col("v_spent")).over(w))
        .cast("long")
        .alias("utxo_value"),
    )


def q288_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest — the per-source summary a curation run
    publishes next to the data: doc/token counts, declared-language
    diversity, predicted-language mode (deterministic tie-break),
    quality-pass rate, near-dup rate (q71 assignment), and the exact
    median token length. Pure composition of already-oracled stages
    (q32 quality, q33 language-ID, q71 dedup) joined once on doc_id
    and aggregated at source grain; the base join pins so the mode
    window and the source aggregate share one pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "lang"
    )
    qual = q32_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_ok"
    )
    lang = q33_language_id(spark, sf_dir).select("doc_id", "lang_pred")
    assign = q71_fuzzy_dedup(spark, sf_dir).select("doc_id", "is_keeper")
    base = (
        docs.join(qual, "doc_id")
        .join(lang, "doc_id")
        .join(assign, "doc_id")
        .localCheckpoint(eager=False)
    )
    per_src = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tok_total"),
        F.count_distinct("lang").cast("long").alias("n_true_langs"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN quality_ok THEN 1 ELSE 0 END)"
            " DIV count(1) AS BIGINT)"
        ).alias("quality_ok_ppm"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN is_keeper THEN 0 ELSE 1 END)"
            " DIV count(1) AS BIGINT)"
        ).alias("dup_ppm"),
        F.expr("CAST(floor(percentile(n_tokens, 0.5D)) AS BIGINT)").alias(
            "p50_tokens"
        ),
    )
    lp = base.groupBy("source", "lang_pred").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), "lang_pred"
    )
    top = (
        lp.select(
            "source", "lang_pred", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang_pred").alias("top_pred_lang"))
    )
    return per_src.join(F.broadcast(top), "source")


def q289_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction on the REAL payload column: the
    events props JSON parses JVM-side (get_json_object — a codegen
    projection, no UDF), and the extracted integer aggregates per
    event type with a parse-failure counter (nulls survive the CASE,
    never drop rows silently). The everyday log-analytics shape:
    schema-on-read over a string column, then a columnar aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unparsed"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
    )


def q290_nearest_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of enrichment — the bidirectional variant of qd06's
    backward as-of join, computed with ZERO joins: per user the event
    stream sorts once, each error row reads the latest preceding and
    earliest following purchase time from two conditional
    ignore-nulls window frames (current row excluded), and the nearer
    side wins (ties -> backward, the reproducible convention). One
    user-keyed sort serves both directions — at scale this beats the
    two-sided range join whenever the streams interleave densely."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        "event_type",
    )
    base = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    purch = F.when(F.col("event_type") == "purchase", F.col("tsu"))
    flagged = ev.select(
        "user_id",
        "event_id",
        "tsu",
        "event_type",
        F.last(purch, ignorenulls=True).over(w_prev).alias("prev_p"),
        F.first(purch, ignorenulls=True).over(w_next).alias("next_p"),
    )
    errors = flagged.filter(F.col("event_type") == "error")
    return errors.select(
        "user_id",
        "event_id",
        "tsu",
        F.expr(
            "CASE"
            " WHEN prev_p IS NULL AND next_p IS NULL THEN NULL"
            " WHEN prev_p IS NULL THEN next_p - tsu"
            " WHEN next_p IS NULL THEN tsu - prev_p"
            " WHEN tsu - prev_p <= next_p - tsu THEN tsu - prev_p"
            " ELSE next_p - tsu END"
        ).cast("long").alias("gap_micros"),
        F.expr(
            "CASE"
            " WHEN prev_p IS NULL AND next_p IS NULL THEN 'none'"
            " WHEN prev_p IS NULL THEN 'forward'"
            " WHEN next_p IS NULL THEN 'backward'"
            " WHEN tsu - prev_p <= next_p - tsu THEN 'backward'"
            " ELSE 'forward' END"
        ).alias("direction"),
    )


def qd65_haircut_taint_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop HAIRCUT taint with exact satoshi VALUES — qd13 gives
    reachability, qd61 the single-hop FIFO split; this propagates the
    proportional (haircut) taint BlockSci's taint module defaults to,
    hop-decomposed: hop-k rows carry the taint arriving over spend
    paths of length exactly k (haircut allocation is linear in the
    tainted input mass, so hop contributions are independently
    meaningful; each hop floors out_val * taint_in DIV total_in once
    per tx — both engines apply the identical decomposition, so the
    frame is oracle-exact). Seeds: coinbase outputs of the first 10
    blocks. Four unrolled hops, each one linkage join + one tx-grain
    aggregate + one allocation projection — the qd08 shuffle shape
    per hop, nothing quadratic."""
    _, raw_txs, _ = _fixture_frames(spark)
    outs = (
        raw_txs.select(
            "tx_id", "coinbase", "block_id",
            F.posexplode("outputs").alias("idx", "o"),
        )
        .select(
            "tx_id",
            "coinbase",
            "block_id",
            F.col("idx").cast("long").alias("out_idx"),
            F.col("o.value").cast("long").alias("out_val"),
        )
        .localCheckpoint(eager=False)
    )
    ins = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("i"))
        .select(
            "tx_id",
            F.col("i.spent_tx_id").alias("spent_tx_id"),
            F.col("i.spent_index").cast("long").alias("spent_index"),
            F.col("i.value").cast("long").alias("in_val"),
        )
        .localCheckpoint(eager=False)
    )
    # haircut denominator is the TOTAL INPUT value: the fee share of
    # the taint is absorbed, exactly like BlockSci's haircut variant
    tx_tot = ins.groupBy("tx_id").agg(
        F.sum("in_val").cast("long").alias("total_in")
    ).localCheckpoint(eager=False)
    taint = outs.filter(
        F.col("coinbase") & (F.col("block_id") < 10)
    ).select(
        "tx_id", "out_idx", F.col("out_val").alias("taint")
    )
    result = None
    for hop in range(1, 5):
        arriving = (
            ins.join(
                taint.select(
                    F.col("tx_id").alias("spent_tx_id"),
                    F.col("out_idx").alias("spent_index"),
                    "taint",
                ),
                ["spent_tx_id", "spent_index"],
            )
            .groupBy("tx_id")
            .agg(F.sum("taint").cast("long").alias("taint_in"))
        )
        taint = (
            outs.join(arriving, "tx_id")
            .join(tx_tot, "tx_id")
            .select(
                "tx_id",
                "out_idx",
                F.expr(
                    "CAST(CAST(out_val AS DECIMAL(38,0)) * taint_in"
                    " DIV total_in AS BIGINT)"
                ).alias("taint"),
            )
            .filter(F.col("taint") > 0)
            .localCheckpoint(eager=False)
        )
        hop_rows = taint.select(
            F.lit(hop).cast("long").alias("hop"),
            "tx_id",
            F.col("out_idx").alias("output_index"),
            F.col("taint").alias("tainted_value"),
        )
        result = hop_rows if result is None else result.unionByName(hop_rows)
    return result


def qd66_address_component_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Component census of the address money-flow graph: connected
    components (undirected) over qd50's relations, reported as the
    component-SIZE histogram — the shape readout that says whether a
    chain is one giant web or many islands before anyone runs
    entity-level analytics on it. Addresses key by the 60-bit md5
    id (engine-portable); self-loops drop; isolated addresses never
    enter the edge list (documented: edge-census, not address
    census). CC is the star-contraction operator — O(log n) rounds,
    node-keyed shuffles only."""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
    )

    rel = qd50_address_relations(spark, sf_dir).filter(
        F.col("src_addr") != F.col("dst_addr")
    )
    edges = rel.select(
        F.expr(
            "CAST(conv(substr(md5(src_addr), 1, 15), 16, 10) AS BIGINT)"
        ).alias("src"),
        F.expr(
            "CAST(conv(substr(md5(dst_addr), 1, 15), 16, 10) AS BIGINT)"
        ).alias("dst"),
    ).distinct()
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    return sizes.groupBy("component_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )


def qd67_time_weighted_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average balance (TWAB) per address — the
    accounting aggregate interest/airdrop/forensic weightings use,
    which a plain balance snapshot (qd15) cannot express: every
    funding output (+v at its block time) and spend (−v at the
    spending tx's time) folds into a per-address balance timeline;
    TWAB = Σ balance_i · Δt_i over [first event, chain tip], exact
    satoshi-seconds in DECIMAL(38,0) floored back to satoshis by one
    DIV. Two exploded linkage passes, one address-keyed window, a
    top-20 TakeOrdered. Deltas pre-aggregate per (addr, ts) so the
    window length is the address's distinct event times."""
    _, raw_txs, _ = _fixture_frames(spark)
    recv = (
        raw_txs.select("timestamp", F.explode("outputs").alias("o"))
        .filter(F.size("o.address") > 0)
        .select(
            F.concat_ws("|", "o.address").alias("addr"),
            F.col("timestamp").cast("long").alias("ts"),
            F.col("o.value").cast("long").alias("delta"),
        )
    )
    spent = (
        raw_txs.filter(~F.col("coinbase"))
        .select("timestamp", F.explode("inputs").alias("i"))
        .filter(F.size("i.address") > 0)
        .select(
            F.concat_ws("|", "i.address").alias("addr"),
            F.col("timestamp").cast("long").alias("ts"),
            (-F.col("i.value")).cast("long").alias("delta"),
        )
    )
    events = (
        recv.unionByName(spent)
        .groupBy("addr", "ts")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    tip = raw_txs.agg(F.max("timestamp").cast("long").alias("tip"))
    w = Window.partitionBy("addr").orderBy("ts")
    timeline = events.crossJoin(F.broadcast(tip)).select(
        "addr",
        "ts",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("bal"),
        (
            F.coalesce(F.lead("ts").over(w), F.col("tip")) - F.col("ts")
        ).alias("dt"),
        "tip",
    )
    per_addr = timeline.groupBy("addr").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("tip").alias("tip"),
        F.sum(
            F.expr("CAST(bal AS DECIMAL(38,0)) * dt")
        ).alias("bal_seconds"),
    ).select(
        "addr",
        "n_events",
        F.expr(
            "CASE WHEN tip > first_ts THEN"
            " CAST(bal_seconds DIV (tip - first_ts) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("twab_satoshi"),
    )
    return per_addr.orderBy(
        F.col("twab_satoshi").desc(), "addr"
    ).limit(20)


def q291_identity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity resolution end-to-end — q275's scoring collapsed to
    the exact-match composition MDM pipelines run first: records
    agreeing on EVERY compared field (the $1000 balance bucket and
    the mod-97 identifier) within a (nation, segment) block join
    directly on the full key — no scoring pass needed — the agreement
    graph resolves with connected components, and each identity
    cluster elects a golden record (highest balance, then lowest
    key). Singletons keep themselves, mirroring q71's corpus
    semantics on the customer table."""
    from graphsense_blocksci_spark.operators.graph import (
        connected_components,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000"
            " AS BIGINT)"
        ).alias("bal_bucket"),
        F.expr("CAST(c_custkey % 97 AS BIGINT)").alias("synth_id"),
        _cents("c_acctbal").alias("cents"),
    ).localCheckpoint(eager=False)
    key = ["c_nationkey", "c_mktsegment", "bal_bucket", "synth_id"]
    a = c.select(F.col("c_custkey").alias("src"), *key)
    b = c.select(F.col("c_custkey").alias("dst"), *key)
    edges = a.join(b, key).filter(F.col("src") < F.col("dst")).select(
        "src", "dst"
    )
    cc = connected_components(edges)
    assigned = c.join(
        cc, c.c_custkey == cc.node, "left"
    ).select(
        "c_custkey",
        "cents",
        F.coalesce("component", "c_custkey").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("cents").desc(), "c_custkey"
    )
    ranked = assigned.select(
        "cluster_id",
        "c_custkey",
        "cents",
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint(eager=False)
    agg = ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    golden = ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("c_custkey").alias("golden_custkey"),
        F.col("cents").alias("golden_cents"),
    )
    return agg.join(golden, "cluster_id").filter(
        F.col("n_members") >= 2
    )


def q292_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union measure per supplier — overlaps merged, NOT
    summed (q271 reports peak concurrency; this reports coverage):
    each lineitem opens a 30-day service window from its ship date,
    and the answer is how many distinct days each supplier was
    serving at all, plus how many merged busy stretches that makes.
    One +1/−1 sweep per supplier: active-prefix-sum over the event
    days, Δt summed only while active, a 0→1 transition count for the
    stretch count. Supplier-keyed windows over per-day pre-aggregated
    events — never row-grain."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.to_date("l_shipdate").alias("open_day")
    )
    iv = li.select(
        "l_suppkey",
        "open_day",
        F.date_add("open_day", 30).alias("close_day"),
    )
    deltas = (
        iv.select(
            "l_suppkey", F.col("open_day").alias("day"), F.lit(1).alias("d")
        )
        .unionByName(
            iv.select(
                "l_suppkey",
                F.col("close_day").alias("day"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("l_suppkey", "day")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = Window.partitionBy("l_suppkey").orderBy("day")
    swept = deltas.select(
        "l_suppkey",
        "day",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("active"),
        F.coalesce(
            F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("prev_active"),
        F.datediff(
            F.coalesce(F.lead("day").over(w), F.col("day")), F.col("day")
        ).cast("long").alias("dt"),
    )
    return swept.groupBy(F.col("l_suppkey").cast("long").alias("suppkey")).agg(
        F.sum(F.when(F.col("active") > 0, F.col("dt")).otherwise(0))
        .cast("long")
        .alias("union_days"),
        F.sum(
            F.when(
                (F.col("active") > 0) & (F.col("prev_active") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_stretches"),
    )


def q293_table_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level dataset reconciliation — the readable companion to
    q198's Merkle diff: a migrated twin of orders derives
    deterministically (md5 coin: ~1/17 of rows dropped, ~1/17
    price-bumped one cent, ~1/17 re-keyed into a new id range), and a
    FULL OUTER join on the key classifies every row SAME / CHANGED /
    ADDED / REMOVED with counts, value drift, and the min/max key per
    class — the exact report a cutover sign-off reads. One shuffle on
    the key; the twin is a projection, not a copy."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        _cents("o_totalprice").alias("cents"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 7),"
            " 16, 10) AS BIGINT) % 17"
        ).alias("coin"),
    ).localCheckpoint(eager=False)
    migrated = (
        o.filter(F.col("coin") != 0)
        .select(
            F.when(
                F.col("coin") == 2, F.col("key") + F.lit(1_000_000_000)
            ).otherwise(F.col("key")).alias("key"),
            F.when(F.col("coin") == 1, F.col("cents") + 1)
            .otherwise(F.col("cents"))
            .alias("m_cents"),
        )
    )
    left = o.select("key", "cents")
    joined = left.join(migrated, "key", "full_outer").select(
        "key",
        "cents",
        "m_cents",
        F.expr(
            "CASE WHEN cents IS NULL THEN 'ADDED'"
            " WHEN m_cents IS NULL THEN 'REMOVED'"
            " WHEN cents = m_cents THEN 'SAME'"
            " ELSE 'CHANGED' END"
        ).alias("status"),
    )
    return joined.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.coalesce("m_cents", F.lit(0)) - F.coalesce("cents", F.lit(0))
        ).cast("long").alias("cents_drift"),
        F.min("key").cast("long").alias("min_key"),
        F.max("key").cast("long").alias("max_key"),
    )


def q294_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the evaluation loop every
    forecasting pipeline needs before anything fancier: forecast(d) =
    revenue(d-7) (same weekday last week), scored per weekday with
    exact integer absolute-percentage error in ppm (|actual-forecast|
    *1e6 DIV actual) plus bias direction counts. One day-grain
    aggregate, one lag window over the bounded day domain, one
    weekday-grain aggregate. The readout says WHICH weekday the naive
    model fails on — the actionable shape."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("cents"))
    )
    w = Window.orderBy("day")
    scored = daily.select(
        "day",
        "cents",
        F.lag("cents", 7).over(w).alias("forecast"),
        F.lag("day", 7).over(w).alias("lag_day"),
    ).filter(
        F.col("forecast").isNotNull()
        # the day spine can have holes: only score true d-7 pairs
        & (F.datediff("day", F.col("lag_day")) == 7)
    )
    return scored.groupBy(
        F.expr(
            "CAST((datediff(day, DATE '1970-01-01')) % 7 AS BIGINT)"
        ).alias("weekday")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "CAST(1000000 * sum(abs(cents - forecast)) DIV sum(cents)"
            " AS BIGINT)"
        ).alias("wape_ppm"),
        F.sum(F.when(F.col("forecast") > F.col("cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_over"),
        F.sum(F.when(F.col("forecast") < F.col("cents"), 1).otherwise(0))
        .cast("long")
        .alias("n_under"),
    )


def qd68_whale_transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-transfer detection with a trailing adaptive threshold:
    a tx is a whale when its output value exceeds 5x the exact median
    of the previous 200 txs (a RANGE-free ROWS window over the
    tx-ordered chain — the percentile contract as a WINDOW function,
    which most engines can't push into one pass; Spark and DuckDB
    both can). Early txs with fewer than 50 predecessors don't flag
    (threshold undefined). Output: per block, whale count and their
    total value — the monitoring readout."""
    _, raw_txs, _ = _fixture_frames(spark)
    vals = raw_txs.select(
        "tx_id",
        "block_id",
        F.expr(
            "CAST(aggregate(transform(outputs, o -> o.value),"
            " 0L, (a, x) -> a + x) AS BIGINT)"
        ).alias("out_value"),
    )
    w = Window.orderBy("tx_id").rowsBetween(-200, -1)
    flagged = vals.select(
        "tx_id",
        "block_id",
        "out_value",
        F.floor(F.expr("percentile(out_value, 0.5D)").over(w))
        .cast("long")
        .alias("med"),
        F.count(F.lit(1)).over(w).alias("n_prev"),
    ).filter(
        (F.col("n_prev") >= 50)
        & (F.col("out_value") > 5 * F.col("med"))
    )
    return flagged.groupBy(
        F.col("block_id").cast("long").alias("block_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_whales"),
        F.sum("out_value").cast("long").alias("whale_value"),
        F.max("out_value").cast("long").alias("max_value"),
    )


def q295_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (the MATCH_RECOGNIZE emulation):
    each user's event types render once into an ordered
    space-delimited string (sort_array over (ts, event_id, type)
    structs — deterministic, engine-portable), then plain regexes do
    the row-pattern work: 'view (error )*click' (conversion despite
    errors), 'purchase [^ ]+ purchase' (repeat purchase with exactly
    one event between), 'signup( [a-z]+)* purchase' (activation).
    Output: per pattern, users matching + match ppm. One shuffle to
    build the strings, three cheap regex projections over the
    user-grain frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("seq")
    ).localCheckpoint(eager=False)
    patterns = [
        ("resilient_conversion", r"view (error )*click"),
        ("repeat_purchase", r"purchase [^ ]+ purchase"),
        ("activation", r"signup( [a-z]+)* purchase"),
    ]
    n_users = seqs.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    frames = []
    for label, pat in patterns:
        m = seqs.agg(
            F.sum(
                F.when(F.col("seq").rlike(pat), 1).otherwise(0)
            ).cast("long").alias("n_matching")
        )
        frames.append(
            m.crossJoin(F.broadcast(n_users)).select(
                F.lit(label).alias("pattern"),
                "n_matching",
                "n_users",
                F.expr(
                    "CAST(1000000 * n_matching DIV n_users AS BIGINT)"
                ).alias("match_ppm"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def q296_five_number_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-plot (five-number) summary per nation in ONE aggregate:
    the array-of-quantiles form of the exact percentile contract —
    min/q1/median/q3/max of order value computed as a single
    percentile(col, array(...)) pass, floored to exact cents, plus
    the IQR-fence outlier count from the same frame (the broadcast
    join-back). The per-group array form is what keeps this one
    shuffle instead of five."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .select("n_name", "cents")
        .localCheckpoint(eager=False)
    )
    summary = base.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "transform(percentile(cents,"
            " array(0.0D, 0.25D, 0.5D, 0.75D, 1.0D)),"
            " x -> CAST(floor(x) AS BIGINT))"
        ).alias("q"),
    ).select(
        "n_name",
        "n_orders",
        F.col("q")[0].alias("min_cents"),
        F.col("q")[1].alias("q1_cents"),
        F.col("q")[2].alias("median_cents"),
        F.col("q")[3].alias("q3_cents"),
        F.col("q")[4].alias("max_cents"),
    ).localCheckpoint(eager=False)
    fenced = base.join(F.broadcast(summary), "n_name").filter(
        (
            F.col("cents")
            > F.col("q3_cents")
            + 3 * (F.col("q3_cents") - F.col("q1_cents")) / 2
        )
        | (
            F.col("cents")
            < F.col("q1_cents")
            - 3 * (F.col("q3_cents") - F.col("q1_cents")) / 2
        )
    ).groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_outliers")
    )
    return summary.join(fenced, "n_name", "left").select(
        "n_name",
        "n_orders",
        "min_cents",
        "q1_cents",
        "median_cents",
        "q3_cents",
        "max_cents",
        F.coalesce("n_outliers", F.lit(0)).cast("long").alias("n_outliers"),
    )


def qd69_address_type_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output census by ADDRESS TYPE — the fixture carries BlockSci's
    address_type tag on every output (the enum A10's dictionary
    rendering maps); this is the chain-composition readout (how much
    value sits in each script class): per type, outputs, total/max
    value, and distinct addresses. One explode + one type-grain
    aggregate."""
    _, raw_txs, _ = _fixture_frames(spark)
    outs = raw_txs.select(F.explode("outputs").alias("o")).select(
        F.col("o.address_type").cast("long").alias("address_type"),
        F.col("o.value").cast("long").alias("value"),
        F.when(
            F.size("o.address") > 0, F.concat_ws("|", "o.address")
        ).alias("addr"),
    )
    return outs.groupBy("address_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_outputs"),
        F.sum("value").cast("long").alias("total_value"),
        F.max("value").cast("long").alias("max_value"),
        F.count_distinct("addr").cast("long").alias("n_addresses"),
    )


def qd70_streaming_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of q273's CDC apply: the op-log staged as TWO
    files split by line-number parity (so per-key ops straddle the
    batch boundary and exercise the merge), per-key survivor state
    compacted under the identical (seq, payload, op) total order
    (streaming/cdc.py — max-merge, order-independent), freshest
    snapshot per key via max_by(n_seen), then the same by-op report.
    Oracle: q273's SQL verbatim."""
    import tempfile

    from graphsense_blocksci_spark.streaming.cdc import cdc_compact_stream

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").cast("long").alias("seq"),
        _cents("l_extendedprice").alias("payload_cents"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(concat("
            "CAST(l_orderkey AS STRING), ':',"
            " CAST(l_linenumber AS STRING))), 1, 7), 16, 10) AS BIGINT)"
            " % 7 = 0 THEN 'D' ELSE 'U' END"
        ).alias("op"),
    )
    work = tempfile.mkdtemp(prefix="gbs_scdc_")
    cols = ["key", "seq", "payload_cents", "op"]
    li.filter(F.col("seq") % 2 == 0).select(*cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{work}/src")
    li.filter(F.col("seq") % 2 == 1).select(*cols).coalesce(1).write.mode(
        "append"
    ).parquet(f"{work}/src")
    stream = (
        spark.readStream.schema(
            "key long, seq long, payload_cents long, op string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/src")
    )
    q = (
        cdc_compact_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.read.schema(
        "key long, n_seen long, seq long, payload_cents long, op string"
    ).parquet(f"{work}/out")
    final = snaps.groupBy("key").agg(
        F.expr("max_by(seq, n_seen)").alias("seq"),
        F.expr("max_by(payload_cents, n_seen)").alias("payload_cents"),
        F.expr("max_by(op, n_seen)").alias("op"),
    )
    return final.groupBy("op").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("payload_cents").cast("long").alias("sum_payload_cents"),
        F.sum("key").cast("long").alias("sum_keys"),
        F.max("seq").cast("long").alias("max_seq"),
    )


def q297_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature/label builder — the leakage-safe split
    every churn/LTV model needs and the thing naive joins get wrong:
    features for each customer derive ONLY from orders strictly
    before the cutoff (count, spend, recency in days), the label
    (retained) ONLY from orders at/after it. One filtered aggregate
    per side of the cutoff, one left join — a customer with no
    post-cutoff order is a labeled churner, not a dropped row.
    Customers with no pre-cutoff history are excluded (no features
    to train on) — stated, not silent."""
    cutoff = "DATE '2000-01-01'"
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        _cents("o_totalprice").alias("cents"),
    )
    feats = (
        o.filter(F.expr(f"day < {cutoff}"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders_pre"),
            F.sum("cents").cast("long").alias("cents_pre"),
            F.expr(
                f"CAST(datediff({cutoff}, max(day)) AS BIGINT)"
            ).alias("recency_days"),
        )
    )
    labels = (
        o.filter(F.expr(f"day >= {cutoff}"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_post"))
    )
    return feats.join(labels, "o_custkey", "left").select(
        "o_custkey",
        "n_orders_pre",
        "cents_pre",
        "recency_days",
        (F.coalesce("n_post", F.lit(0)) > 0).alias("retained"),
    )


def qd71_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-invariant audit as a query: an address's running balance
    must never go negative (spending an output before funding it
    would mean broken linkage or a reorder bug in ingestion). Reuses
    the qd67 timeline (per-address prefix sums over the bounded event
    domain) and reports the corpus verdict — total addresses, clean
    vs violating counts, and the worst dip — so the check runs as a
    scheduled data-quality row, not a test-only assertion."""
    _, raw_txs, _ = _fixture_frames(spark)
    recv = (
        raw_txs.select("timestamp", "tx_id", F.explode("outputs").alias("o"))
        .filter(F.size("o.address") > 0)
        .select(
            F.concat_ws("|", "o.address").alias("addr"),
            F.col("timestamp").cast("long").alias("ts"),
            # funding sorts BEFORE spending at the same timestamp
            F.lit(0).alias("kind"),
            F.col("o.value").cast("long").alias("delta"),
        )
    )
    spent = (
        raw_txs.filter(~F.col("coinbase"))
        .select("timestamp", F.explode("inputs").alias("i"))
        .filter(F.size("i.address") > 0)
        .select(
            F.concat_ws("|", "i.address").alias("addr"),
            F.col("timestamp").cast("long").alias("ts"),
            F.lit(1).alias("kind"),
            (-F.col("i.value")).cast("long").alias("delta"),
        )
    )
    w = Window.partitionBy("addr").orderBy("ts", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    timeline = recv.unionByName(spent).select(
        "addr", F.sum("delta").over(w).alias("bal")
    )
    per_addr = timeline.groupBy("addr").agg(
        F.min("bal").cast("long").alias("min_bal")
    )
    return per_addr.agg(
        F.count(F.lit(1)).cast("long").alias("n_addresses"),
        F.sum(F.when(F.col("min_bal") >= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_clean"),
        F.sum(F.when(F.col("min_bal") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.min("min_bal").cast("long").alias("worst_dip"),
    )


def q298_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — the data-DEPENDENT sampler q72's
    fixed-rate stratifier is not: every language keeps exactly
    min(class size) documents, selected by the deterministic md5
    order (portable, retry-stable). The minority size rides in as a
    broadcast 1-row aggregate; one rank window per class does the
    cut. Output is the per-class audit (kept / available / kept_ppm),
    the thing a training-mix rebalance reviews."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    sizes = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_avail")
    )
    floor_n = sizes.agg(F.min("n_avail").alias("n_keep"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    kept = (
        docs.select(
            "lang", "doc_id", F.row_number().over(w).alias("rk")
        )
        .crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("n_keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_id_sum"),
        )
    )
    return sizes.join(kept, "lang").select(
        "lang",
        "n_avail",
        "n_kept",
        "kept_id_sum",
        F.expr("CAST(1000000 * n_kept DIV n_avail AS BIGINT)").alias(
            "kept_ppm"
        ),
    )


def qd72_outpoint_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-spend conflict audit: every (spent_tx_id, spent_index)
    outpoint must be consumed by AT MOST one input chain-wide — more
    than one spender means a double-spend slipped past ingestion (or
    a reorg rollback half-applied, the qd49 failure class). One
    outpoint-grain aggregate; the verdict row reports total/clean/
    conflicting outpoints so the check schedules as a data-quality
    row next to qd71's balance audit."""
    _, raw_txs, _ = _fixture_frames(spark)
    spends = (
        raw_txs.filter(~F.col("coinbase"))
        .select("tx_id", F.explode("inputs").alias("i"))
        .select(
            F.col("i.spent_tx_id").alias("stx"),
            F.col("i.spent_index").cast("long").alias("sidx"),
        )
    )
    per_outpoint = spends.groupBy("stx", "sidx").agg(
        F.count(F.lit(1)).cast("long").alias("n_spenders")
    )
    return per_outpoint.agg(
        F.count(F.lit(1)).cast("long").alias("n_outpoints"),
        F.sum(F.when(F.col("n_spenders") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_clean"),
        F.sum(F.when(F.col("n_spenders") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_conflicting"),
        F.max("n_spenders").cast("long").alias("max_spenders"),
    )


def qd73_entity_taint_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level taint exposure — the report an investigator
    actually reads: qd65's hop-decomposed haircut taint lands on
    output ADDRESSES, rolls up to qd16's co-spend ENTITIES (addresses
    never seen as inputs keep themselves as singleton entities via
    the same 28-bit hash convention), and the top-20 most-exposed
    entities report total tainted satoshis, tainted outputs, and the
    shortest hop at which taint arrived. Full chain-stack
    composition: taint values x linkage x clustering, each an
    already-oracled stage."""
    from graphsense_blocksci_spark.operators.textops import hash28

    taint = qd65_haircut_taint_value(spark, sf_dir)
    _, raw_txs, _ = _fixture_frames(spark)
    outs_addr = (
        raw_txs.select("tx_id", F.posexplode("outputs").alias("idx", "o"))
        .filter(F.size("o.address") > 0)
        .select(
            "tx_id",
            F.col("idx").cast("long").alias("output_index"),
            F.concat_ws("|", "o.address").alias("addr"),
        )
    )
    ent = qd16_cospend_entities(spark, sf_dir)
    j = (
        taint.join(outs_addr, ["tx_id", "output_index"])
        .join(ent, "addr", "left")
        .select(
            F.coalesce("entity", hash28(F.col("addr"))).alias("entity"),
            "tainted_value",
            "hop",
        )
    )
    exposure = j.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_tainted_outputs"),
        F.sum("tainted_value").cast("long").alias("taint_total"),
        F.min("hop").cast("long").alias("first_hop"),
    )
    return exposure.orderBy(
        F.col("taint_total").desc(), "entity"
    ).limit(20)


def q299_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the causal-inference estimate the
    CUPED/A-B family (q150/q183) doesn't cover: treatment = ASIA
    customers, intervention = 1998-01-01, outcome = mean order value.
    One 2x2 grouped aggregate (treat x post) with exact integer cell
    means, pivoted into a single row so the DiD contrast
    (m11-m10)-(m01-m00) is a plain column expression. The parallel-
    trends caveat is the analyst's; the arithmetic here is exact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.to_date("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .alias("post"),
        _cents("o_totalprice").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            (F.col("r_name") == "ASIA").alias("treated"), "post", "cents"
        )
    )
    cells = base.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(cents) DIV count(1) AS BIGINT)").alias("m"),
    )
    wide = cells.groupBy().pivot(
        "treated", [True, False]
    ).agg(
        F.expr("max_by(m, post)").alias("post_m"),
        F.expr("min_by(m, post)").alias("pre_m"),
        F.sum("n").alias("n"),
    )
    return wide.select(
        F.col("`true_pre_m`").alias("treat_pre_mean"),
        F.col("`true_post_m`").alias("treat_post_mean"),
        F.col("`false_pre_m`").alias("control_pre_mean"),
        F.col("`false_post_m`").alias("control_post_mean"),
        F.col("`true_n`").cast("long").alias("n_treat"),
        F.col("`false_n`").cast("long").alias("n_control"),
        (
            (F.col("`true_post_m`") - F.col("`true_pre_m`"))
            - (F.col("`false_post_m`") - F.col("`false_pre_m`"))
        ).cast("long").alias("did_cents"),
    )


def q300_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (waterfall) between 1997 and 1998 per part
    category: ΔR decomposes into a Laspeyres VOLUME effect (quantity
    change at the base period's realized rate, exact milli-cents via
    DIV) and a residual PRICE/MIX effect defined so additivity is
    EXACT by construction — 1000·ΔR = volume + price_mix, no floats,
    no unexplained remainder. One join, one (category, year)
    aggregate, one pivot."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("cents"),
        F.year("l_shipdate").alias("yr"),
    ).filter(F.col("yr").isin(1997, 1998))
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("category"),
    )
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cells = base.groupBy("category", "yr").agg(
        F.sum("qty").cast("long").alias("q"),
        F.sum("cents").cast("long").alias("r"),
    )
    wide = (
        cells.groupBy("category")
        .pivot("yr", [1997, 1998])
        .agg(F.max("q").alias("q"), F.max("r").alias("r"))
        .filter(
            F.col("`1997_q`").isNotNull() & F.col("`1998_q`").isNotNull()
        )
    )
    return wide.select(
        "category",
        F.col("`1997_r`").alias("r_base_cents"),
        F.col("`1998_r`").alias("r_next_cents"),
        F.col("`1997_q`").alias("q_base"),
        F.col("`1998_q`").alias("q_next"),
        F.expr(
            "CAST((`1998_q` - `1997_q`) * `1997_r` * 1000 DIV `1997_q`"
            " AS BIGINT)"
        ).alias("volume_effect_milli"),
        F.expr(
            "CAST(1000 * (`1998_r` - `1997_r`)"
            " - ((`1998_q` - `1997_q`) * `1997_r` * 1000 DIV `1997_q`)"
            " AS BIGINT)"
        ).alias("price_mix_effect_milli"),
    )


def qd74_gini_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealth-inequality TIME SERIES — qd45's Gini at every chain
    day, not just the tip: per-(addr, day) balance deltas densify
    onto the bounded day x address spine, carry forward with one
    prefix-sum window (the q280 LOCF shape applied chain-side), and
    each day's positive holders rank WITHIN their day partition (the
    window parallelizes across days, so no global-sort funnel). The
    exact-integer rank formula is qd45's; numerators ride as
    DECIMAL(38,0) because day-level Σ rank·x can pass int64 on a
    whale-heavy day."""
    _, raw_txs, _ = _fixture_frames(spark)
    recv = (
        raw_txs.select("timestamp", F.explode("outputs").alias("o"))
        .filter(F.size("o.address") > 0)
        .select(
            F.concat_ws("|", "o.address").alias("addr"),
            F.expr("CAST(CAST(timestamp AS BIGINT) DIV 86400 AS BIGINT)")
            .alias("day"),
            F.col("o.value").cast("long").alias("delta"),
        )
    )
    spent = (
        raw_txs.filter(~F.col("coinbase"))
        .select("timestamp", F.explode("inputs").alias("i"))
        .filter(F.size("i.address") > 0)
        .select(
            F.concat_ws("|", "i.address").alias("addr"),
            F.expr("CAST(CAST(timestamp AS BIGINT) DIV 86400 AS BIGINT)")
            .alias("day"),
            (-F.col("i.value")).cast("long").alias("delta"),
        )
    )
    deltas = (
        recv.unionByName(spent)
        .groupBy("addr", "day")
        .agg(F.sum("delta").cast("long").alias("delta"))
        .localCheckpoint(eager=False)
    )
    spine = (
        deltas.select("day").distinct()
        .crossJoin(deltas.select("addr").distinct())
    )
    w = Window.partitionBy("addr").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    balances = (
        spine.join(deltas, ["addr", "day"], "left")
        .select(
            "addr",
            "day",
            F.sum(F.coalesce("delta", F.lit(0))).over(w).alias("x"),
        )
        .filter(F.col("x") > 0)
    )
    wd = Window.partitionBy("day").orderBy("x", "addr")
    ranked = balances.select(
        "day", "x", F.row_number().over(wd).cast("long").alias("rk")
    )
    agg = ranked.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_holders"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum(F.expr("CAST(rk AS DECIMAL(38,0)) * x")).alias("sum_rx"),
    )
    return agg.select(
        "day",
        "n_holders",
        F.expr(
            "CAST(2 * sum_rx - (n_holders + 1)"
            " * CAST(sum_x AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("gini_num"),
        F.expr(
            "CAST(CAST(n_holders AS DECIMAL(38,0)) * sum_x AS BIGINT)"
        ).alias("gini_den"),
        F.expr(
            "CAST(2 * sum_rx - (n_holders + 1)"
            " * CAST(sum_x AS DECIMAL(38,0)) AS DOUBLE)"
            " / CAST(CAST(n_holders AS DECIMAL(38,0)) * sum_x AS DOUBLE)"
        ).alias("gini"),
    )


def q301_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge triangle-support — the k-truss building block (an edge's
    support = triangles through it = |N(u) ∩ N(v)|), over the same
    co-supplier graph q120/q194 read: the pinned edge list joins its
    own adjacency from BOTH endpoints and counts matching third
    vertices. Cost is Σ_edges min-degree — the oriented wedge
    discipline, never an all-pairs pass. Output: support histogram
    plus the max-support edge (deterministic tie-break) — the shape a
    truss-decomposition peel would start from. The two row kinds
    share one frame, disambiguated by an explicit row_kind column
    ('hist': n_edges populated, endpoints NULL; 'max_edge': endpoints
    populated, n_edges NULL)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # symmetric adjacency once; support(u,v) = common neighbors
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    n1 = adj.select(F.col("u").alias("eu"), F.col("v").alias("w"))
    n2 = adj.select(F.col("u").alias("ev"), F.col("v").alias("w"))
    support = (
        edges.join(n1, edges.u == n1.eu)
        .join(n2, (edges.v == n2.ev) & (n1.w == n2.w))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    full = edges.join(support, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    ).localCheckpoint(eager=False)
    hist = full.groupBy("support").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    top = full.orderBy(
        F.col("support").desc(), "u", "v"
    ).limit(1).select(
        F.lit("max_edge").alias("row_kind"),
        F.col("support").alias("support"),
        F.lit(None).cast("long").alias("n_edges"),
        F.col("u").alias("top_u"),
        F.col("v").alias("top_v"),
    )
    return hist.select(
        F.lit("hist").alias("row_kind"),
        "support",
        "n_edges",
        F.lit(None).cast("long").alias("top_u"),
        F.lit(None).cast("long").alias("top_v"),
    ).unionByName(top)


def q302_key_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-in-sequence detection over the order-key space — the
    inverse of q272's islands: where identifier continuity breaks
    (lost batches, purged ranges, importer bugs). One ordered lag
    window over the DISTINCT key projection finds every hole; the
    report carries gap count, missing-id total, and the widest three
    gaps with their bounds (deterministic TakeOrdered)."""
    # the finished-orders slice is naturally gapped (open orders
    # occupy the missing ids) — the realistic purged-range shape
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    w = Window.orderBy("k")
    gaps = keys.select(
        "k", F.lag("k").over(w).alias("prev")
    ).filter(
        F.col("prev").isNotNull() & (F.col("k") - F.col("prev") > 1)
    ).select(
        (F.col("prev") + 1).alias("gap_start"),
        (F.col("k") - 1).alias("gap_end"),
        (F.col("k") - F.col("prev") - 1).cast("long").alias("n_missing"),
    )
    return gaps.orderBy(
        F.col("n_missing").desc(), "gap_start"
    ).limit(3)


def qd75_supply_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-supply audit — consensus's own invariant as a query:
    per block, the coinbase may claim AT MOST subsidy (50 BTC flat on
    this fixture's height range) + that block's fees; claiming less
    burns the difference forever. The verdict partitions blocks into
    exact / under-claimed (burned) / OVER-claimed — the last is an
    inflation bug and must be zero on a valid chain (pytest-pinned).
    One fee aggregate (qd29's arithmetic), one coinbase aggregate,
    one block-keyed join."""
    from graphsense_blocksci_spark.functions.io_aggs import io_total_value

    _, raw_txs, _ = _fixture_frames(spark)
    subsidy = 5_000_000_000
    fees = (
        raw_txs.filter(~F.col("coinbase"))
        .select(
            F.col("block_id").cast("long").alias("block_id"),
            (io_total_value("inputs") - io_total_value("outputs"))
            .cast("long")
            .alias("fee"),
        )
        .groupBy("block_id")
        .agg(F.sum("fee").cast("long").alias("fees"))
    )
    claimed = (
        raw_txs.filter(F.col("coinbase"))
        .select(
            F.col("block_id").cast("long").alias("block_id"),
            io_total_value("outputs").cast("long").alias("claimed"),
        )
        .groupBy("block_id")
        .agg(F.sum("claimed").cast("long").alias("claimed"))
    )
    audit = claimed.join(fees, "block_id", "left").select(
        "block_id",
        "claimed",
        (F.lit(subsidy) + F.coalesce("fees", F.lit(0))).alias("allowed"),
    )
    return audit.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("claimed") == F.col("allowed"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("claimed") < F.col("allowed"), 1).otherwise(0))
        .cast("long")
        .alias("n_underclaimed"),
        F.sum(F.when(F.col("claimed") > F.col("allowed"), 1).otherwise(0))
        .cast("long")
        .alias("n_overclaimed"),
        F.sum(
            F.when(
                F.col("claimed") < F.col("allowed"),
                F.col("allowed") - F.col("claimed"),
            ).otherwise(0)
        ).cast("long").alias("burned_satoshi"),
    )


def q303_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the compression readout tokenizer
    and dedup work both cite: how many distinct bigrams cover 50% /
    90% / 99% of the corpus's bigram mass. Bigrams come from the
    shared offset-slice zip (no positional self-join), rank by
    (count DESC, bigram) for a total order, and ONE cumulative window
    over the vocabulary-sized count frame answers every threshold via
    conditional mins. Exact integer mass arithmetic; the window runs
    over |vocab| rows, never corpus rows."""
    from graphsense_blocksci_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("toks")
    )
    bigrams = docs.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array())
        ).alias("bg")
    )
    counts = bigrams.groupBy("bg").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), "bg").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = counts.select(
        "n",
        F.sum("n").over(w).alias("cum"),
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "bg"))
        .cast("long")
        .alias("rk"),
    ).localCheckpoint(eager=False)
    total = ranked.agg(
        F.max("cum").alias("mass"),
        F.max("rk").alias("vocab"),
    )
    return ranked.crossJoin(F.broadcast(total)).agg(
        F.max("vocab").cast("long").alias("vocab_size"),
        F.max("mass").cast("long").alias("total_mass"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("mass") * 50, F.col("rk"))
        ).cast("long").alias("k_50pct"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("mass") * 90, F.col("rk"))
        ).cast("long").alias("k_90pct"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("mass") * 99, F.col("rk"))
        ).cast("long").alias("k_99pct"),
    )


def q304_daily_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience overlap — exact Jaccard between
    consecutive days' active-user SETS, computed entirely in the
    q253/q282 bitmap algebra: per (day, word) bitmaps, one lag window
    per word lane, then popcounts of AND (intersection) and OR
    (union) summed per day. No distinct-pair set materialization, no
    join on user ids — the 60-users-per-long packing makes the set
    ops word-parallel. Exact integer ppm."""
    ev = load_table(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("eday"),
        F.expr("CAST(user_id DIV 60 AS BIGINT)").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 60 AS INT))").alias("mask"),
    )
    bits = ev.groupBy("eday", "word").agg(
        F.expr("bit_or(mask)").alias("bits")
    ).localCheckpoint(eager=False)
    spine = (
        bits.select("eday").distinct()
        .crossJoin(F.broadcast(bits.select("word").distinct()))
    )
    dense = spine.join(bits, ["eday", "word"], "left").select(
        "eday", "word", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    w = Window.partitionBy("word").orderBy("eday")
    lagged = dense.select(
        "eday",
        "bits",
        F.lag("bits").over(w).alias("prev_bits"),
        (F.col("eday") - F.lag("eday").over(w)).alias("day_gap"),
    ).filter(F.col("prev_bits").isNotNull() & (F.col("day_gap") == 1))
    return (
        lagged.groupBy("eday")
        .agg(
            F.sum(
                F.bit_count(F.col("bits").bitwiseAND(F.col("prev_bits")))
            ).cast("long").alias("n_both"),
            F.sum(
                F.bit_count(F.col("bits").bitwiseOR(F.col("prev_bits")))
            ).cast("long").alias("n_union"),
        )
        .select(
            F.expr(
                "CAST(date_add(DATE '1970-01-01', CAST(eday AS INT))"
                " AS TIMESTAMP)"
            ).alias("day"),
            "n_both",
            "n_union",
            F.expr(
                "CASE WHEN n_union = 0 THEN NULL"
                " ELSE CAST(1000000 * n_both DIV n_union AS BIGINT) END"
            ).alias("jaccard_ppm"),
        )
    )


def q305_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 maintenance — the A16/A17/A22 capstone: an
    existing type-2 dimension (built from events before the cutoff)
    folds in a late batch WITHOUT rescanning history. Per affected
    user the stored OPEN version re-enters as a pseudo-event (its
    valid_from is strictly before every delta event, so it always
    sorts first), change-detection runs over [pseudo + delta] only,
    version numbers continue from the stored counter, and the merge
    keeps untouched users' rows verbatim while replacing affected
    users' open rows. The oracle is the FULL REBUILD (q269's SQL
    verbatim) — the incremental fold must be cell-exact against it,
    which is the whole point."""
    # keep ts in its native type (q269's convention) so the schema
    # matches the full-rebuild oracle exactly
    cutoff = F.expr("TIMESTAMP_NTZ '2024-01-20 00:00:00'")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = ev.filter(F.col("ts") < cutoff)
    delta = ev.filter(F.col("ts") >= cutoff)

    def build(events: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        changed = events.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        ).filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        return changed.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )

    old = build(hist).localCheckpoint(eager=False)
    affected = delta.select("user_id").distinct().localCheckpoint(
        eager=False
    )
    open_v = old.filter(F.col("is_current")).join(affected, "user_id")
    pseudo = open_v.select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.col("valid_from").alias("ts"),
        "event_type",
        (F.col("version") - 1).alias("version_base"),
    )
    delta_aff = delta.join(
        F.broadcast(
            pseudo.select("user_id", "version_base")
        ),
        "user_id",
        "left",
    ).select(
        "user_id",
        F.col("event_id").cast("long").alias("event_id"),
        "ts",
        "event_type",
        F.coalesce("version_base", F.lit(0)).alias("version_base"),
    )
    combined = pseudo.select(
        "user_id", "event_id", "ts", "event_type", "version_base"
    ).unionByName(delta_aff)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    kept = combined.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "version_base",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    rebuilt = kept.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        (F.col("version_base") + F.row_number().over(w))
        .cast("long")
        .alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    untouched = old.join(affected, "user_id", "left_anti")
    closed_old = (
        old.filter(~F.col("is_current"))
        .join(affected, "user_id", "left_semi")
    )
    return untouched.unionByName(closed_old).unionByName(rebuilt)


def q306_grouped_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation EXACT ridge fit (d=2: intercept + order-date day) of
    order value on time — the groupwise flavor of q167: one map-side-
    combined groupBy(nation) aggregate produces every nation's integer
    sufficient statistics (n, Σx, Σx², Σy, Σxy — 5 numbers per group,
    whatever the corpus size), the bounded 25-row collect solves each
    2×2 system by Cramer's rule in arbitrary-precision integers, and
    the canonical (num, den) rationals ride as decimal strings the
    DuckDB HUGEINT oracle reproduces. The 100 TB shape is the same
    d²-numbers-per-group shuffle as q166 — groupwise OLS/ridge is one
    aggregate, never a per-group solver pass over the data."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("long")
        .alias("x"),
        _cents("o_totalprice").alias("y"),
    )
    g = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    rows = g.collect()  # bounded: one row per nation
    out = []
    for r in rows:
        n, sx, sxx, sy, sxy = (
            int(r["n"]), int(r["sx"]), int(r["sxx"]), int(r["sy"]),
            int(r["sxy"]),
        )
        a11, a12, a22 = n + 1, sx, sxx + 1  # ridge lam=1 on the diagonal
        den = a11 * a22 - a12 * a12
        n0 = sy * a22 - a12 * sxy
        n1 = a11 * sxy - sy * a12
        out.append((int(r["nation"]), 0, str(n0), str(den)))
        out.append((int(r["nation"]), 1, str(n1), str(den)))
    return spark.createDataFrame(
        out, "nation long, coef_idx long, beta_num string, beta_den string"
    )


def q307_isotonic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the daily
    order count on time via the minimax identity
    fit(t) = max_{i<=t} min_{j>=i} avg(y[i..j]) — the exact PAV
    solution without PAV's sequential pass (Robertson-Wright minimax
    characterization; a pytest proves the identity against
    sequential-PAV on exact Fractions). Segment averages quantize to
    floor-milli integers, and floor commutes with min/max, so
    fit_milli = floor(1000·exact_PAV_fit) EXACTLY — deterministic and
    engine-portable. Cost is the O(|days|²) segment grid — bounded by
    the DAY GRAIN, not the corpus (2.4k days → 5.8M integer rows);
    the prefix-sum window runs over the same bounded day frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("long")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.orderBy("day")
    d = daily.select(
        "day",
        "y",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("y").over(w).cast("long").alias("s"),
    ).localCheckpoint(eager=False)
    i_side = d.select(
        F.col("rn").alias("i"),
        (F.col("s") - F.col("y")).alias("s_before"),
    )
    j_side = d.select(F.col("rn").alias("j"), F.col("s").alias("s_j"))
    seg_min = (
        i_side.join(j_side, F.col("j") >= F.col("i"))
        .select(
            "i",
            F.expr(
                "CAST((1000 * (s_j - s_before)) DIV (j - i + 1) AS BIGINT)"
            ).alias("a"),
        )
        .groupBy("i")
        .agg(F.min("a").cast("long").alias("b"))
    )
    wfit = Window.orderBy("i")
    fit = seg_min.select(
        "i", F.max("b").over(wfit).cast("long").alias("fit_milli")
    )
    return (
        d.join(fit, d["rn"] == fit["i"])
        .select(
            F.expr("CAST(day * 86400 AS TIMESTAMP)").alias("day"),
            "y",
            "fit_milli",
        )
    )


def q308_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator of the daily order count —
    the median of all Walsh averages (y_i + y_j)/2, i <= j — the
    robust center a mean can't give and a plain median under-uses.
    Doubled sums keep everything integer; the median over the
    O(|days|²) Walsh multiset (bounded by the day grain, never the
    corpus) collapses to value-grouped counts + one running cumsum
    over the bounded distinct-sum domain, then the UPPER median is
    selected: the first value whose cumulative count reaches
    (N+1)/2 under float divide, i.e. cum >= N/2 + 0.5, which for
    even N excludes cum == N/2 and lands on element N/2 + 1 (the
    oracle shares the expression, so engine and oracle agree by
    construction). Output:
    one row (n_days, n_pairs, hl2, hl) with hl = hl2/2 the one float
    divide."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("long")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = daily.select(F.col("day").alias("di"), F.col("y").alias("yi"))
    b = daily.select(F.col("day").alias("dj"), F.col("y").alias("yj"))
    walsh = (
        a.join(b, F.col("dj") >= F.col("di"))
        .select((F.col("yi") + F.col("yj")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wv = Window.orderBy("v")
    cum = walsh.select(
        "v", "cnt", F.sum("cnt").over(wv).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.sum("cnt").cast("long").alias("n_pairs"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= (F.col("n_pairs") + 1) / 2)
        .agg(F.min("v").cast("long").alias("hl2"))
    )
    return (
        nd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .select(
            "n_days",
            "n_pairs",
            "hl2",
            (F.col("hl2").cast("double") / F.lit(2.0)).alias("hl"),
        )
    )


def q310_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U between the AUTOMOBILE and BUILDING
    segments' customer balances with midrank tie handling — the
    rank-sum two-sample test q210's KS complements. Midranks ride
    doubled (integers): per distinct balance the below-count window
    runs over the BOUNDED distinct-value domain (value-grouped
    counts first, the roc_auc discipline), r_a2 = Σ n_a·midrank2 and
    u2 = r_a2 − n_a(n_a+1) are exact longs, and the effect size is
    integer floor ppm of U/(n_a·n_b). One row out."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    per = (
        c.select(
            _cents("c_acctbal").alias("s"),
            (F.col("c_mktsegment") == "AUTOMOBILE").alias("is_a"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("is_a"), 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "s",
        "n",
        "n_a",
        (2 * F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("n") + 1)
        .cast("long")
        .alias("midrank2"),
    )
    return ranked.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        (F.sum("n") - F.sum("n_a")).cast("long").alias("n_b"),
        F.sum(F.col("n_a") * F.col("midrank2")).cast("long").alias("r_a2"),
    ).select(
        "n_a",
        "n_b",
        "r_a2",
        (F.col("r_a2") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2"),
        F.expr(
            "CAST(1000000 * (r_a2 - n_a * (n_a + 1))"
            " DIV (2 * n_a * n_b) AS BIGINT)"
        ).alias("u_ppm"),
    )


def q311_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the click and purchase daily
    event-count series at lags -3..3 — does engagement lead
    conversion? Same integer discipline as q188's ACF: both series
    align on the union of active days (missing side = 0), center on
    their floor means, and the lag-k numerator Σ ca_t·cb_{t+k} and
    both denominators are exact int64 sums; the correlation is one
    num/sqrt(da·db) float chain. Day-grain bounded: the widest frame
    is |days| × 7 lags."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400)
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
    )
    d = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (F.col("a") - F.expr("CAST(sa DIV n AS BIGINT)")).alias("ca"),
        (F.col("b") - F.expr("CAST(sb DIV n AS BIGINT)")).alias("cb"),
    ).localCheckpoint(eager=False)
    dens = d.agg(
        F.sum(F.col("ca") * F.col("ca")).cast("long").alias("da"),
        F.sum(F.col("cb") * F.col("cb")).cast("long").alias("db"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("lag"))
    left = d.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("day") + F.col("lag")).alias("day"),
        F.col("ca").alias("ca_t"),
    )
    num = (
        left.join(d.select("day", "cb"), "day")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ca_t") * F.col("cb")).cast("long").alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(dens)).select(
        "lag",
        "n_pairs",
        "num",
        "da",
        "db",
        (
            F.col("num").cast("double")
            / F.sqrt(F.col("da").cast("double") * F.col("db").cast("double"))
        ).alias("xcorr"),
    )


def q312_keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance for the term 'join' —
    the corpus-inspection readout every data-quality review of a text
    pipeline leans on: each occurrence with two normalized tokens of
    context either side. Pure per-row array work (posexplode + two
    slices) on the normalized token array — zero joins, zero
    shuffles beyond the scan, output is occurrence-sized (posting-
    list shaped, term-frequency bounded, never corpus-sized)."""
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens("text").alias("toks"),
    )
    occ = t.select(
        "doc_id",
        "toks",
        F.posexplode("toks").alias("p0", "tok"),
    ).filter(F.col("tok") == "join")
    return occ.select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        F.array_join(
            F.slice(
                "toks",
                F.greatest(F.col("p0") - 1, F.lit(1)),
                F.least(F.col("p0"), F.lit(2)),
            ),
            " ",
        ).alias("left_ctx"),
        F.array_join(
            F.slice("toks", F.col("p0") + 2, 2), " "
        ).alias("right_ctx"),
    )


def qd76_coinbase_maturity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coinbase maturity profile — how many blocks miners' rewards
    wait before first being spent (the consensus rule forces >= 100
    on the real chain; the profile is the miner-liquidity readout
    analysts chart). Every input resolving to a COINBASE output
    contributes (spend block − creation block); one B1 linkage
    shuffle restricted to the coinbase output side + one delta
    rollup. Output per block-delta: spend count and value moved."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("blk")
    )
    cb_outs = (
        explode_outputs(raw_txs.filter(F.col("coinbase")))
        .select("tx_id", "output_index", "value")
        .join(heights, "tx_id")
        .select(
            "tx_id", "output_index", "value",
            F.col("blk").alias("created_blk"),
        )
    )
    ins = (
        explode_inputs(raw_txs.filter(~F.col("coinbase")))
        .join(heights, "tx_id")
        .select(
            "spent_tx_id", "spent_index", F.col("blk").alias("spend_blk")
        )
    )
    linked = link_inputs_to_outputs(ins, cb_outs).filter(
        F.col("created_blk").isNotNull()
    )
    return (
        linked.select(
            (F.col("spend_blk") - F.col("created_blk"))
            .cast("long")
            .alias("delta_blocks"),
            "value",
        )
        .groupBy("delta_blocks")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spends"),
            F.sum("value").cast("long").alias("value_moved"),
        )
    )


def qd77_address_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-address lifetime ledger — first/last active block, distinct
    transactions touched, and received/spent totals: the address-page
    header GraphSense renders (first/last activity + totals). Credits
    come from exploded outputs; debits resolve through the B1 linkage
    so the spender's block attributes the SPEND side. One union of
    two address-keyed event streams + one map-side-combined rollup —
    the same shape at 100 TB with the address key pre-bucketed."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("blk")
    )
    credits = (
        explode_outputs(raw_txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "address").alias("addr"),
            F.col("value").cast("long").alias("recv"),
        )
        .join(heights, "tx_id")
        .select(
            "addr", "tx_id", "blk", "recv",
            F.lit(0).cast("long").alias("spent"),
        )
    )
    outs = (
        explode_outputs(raw_txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            F.col("value").cast("long").alias("value"),
        )
    )
    debits = (
        link_inputs_to_outputs(
            explode_inputs(raw_txs.filter(~F.col("coinbase"))), outs
        )
        .filter(F.col("addr").isNotNull())
        .join(heights, "tx_id")
        .select(
            "addr",
            "tx_id",
            "blk",
            F.lit(0).cast("long").alias("recv"),
            F.col("value").alias("spent"),
        )
    )
    return (
        credits.unionByName(debits)
        .groupBy("addr")
        .agg(
            F.min("blk").cast("long").alias("first_block"),
            F.max("blk").cast("long").alias("last_block"),
            F.countDistinct("tx_id").cast("long").alias("n_txs"),
            F.sum("recv").cast("long").alias("received_value"),
            F.sum("spent").cast("long").alias("spent_value"),
        )
    )


def qd78_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled rounds of k-truss peeling (k=2: every surviving
    edge must sit in >= 2 triangles among surviving edges) on the
    q301 co-supplier graph — the truss decomposition step q301's
    support histogram feeds. Each round recomputes edge support over
    the CURRENT edge set with the oriented common-neighbor join and
    drops under-supported edges; two rounds unroll into a fixed plan
    (the kmeans-unroll oracle discipline — iterative fixpoints become
    hash-exact when the round count is pinned). Output per original
    edge: both rounds' supports (support2 NULL for round-1 casualties)
    and the in-truss verdict."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    b = a.select("k", F.col("s").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def support(e: DataFrame) -> DataFrame:
        adj = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        n1 = adj.select(F.col("u").alias("eu"), F.col("v").alias("w"))
        n2 = adj.select(F.col("u").alias("ev"), F.col("v").alias("w"))
        sup = (
            e.join(n1, e["u"] == n1["eu"])
            .join(n2, (e["v"] == n2["ev"]) & (n1["w"] == n2["w"]))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        )
        return e.join(sup, ["u", "v"], "left").select(
            "u", "v", F.coalesce("sup", F.lit(0)).cast("long").alias("sup")
        )

    k = 2
    s1 = support(edges).localCheckpoint(eager=False)
    e1 = s1.filter(F.col("sup") >= k).select("u", "v")
    s2 = support(e1).localCheckpoint(eager=False)
    out = (
        s1.select("u", "v", F.col("sup").alias("support1"))
        .join(
            s2.select(
                "u", "v", F.col("sup").alias("support2")
            ),
            ["u", "v"],
            "left",
        )
        .select(
            "u",
            "v",
            "support1",
            "support2",
            (
                F.col("support2").isNotNull() & (F.col("support2") >= k)
            ).alias("in_truss"),
        )
    )
    return out


def qd79_streaming_address_lifetime(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING twin of qd77's address-lifetime ledger (minus the
    distinct-tx count — a per-address SET is index state, not sketch
    state): the credit/debit event stream staged as TWO files
    (tx-parity split) consumed one per trigger, each address folding
    (min block, max block, event count, received, spent) in the state
    store (streaming/sketches.py:lifetime_stream — five commutative
    monoids, so batch boundaries cannot change the fixpoint). Final
    snapshot per address = the max_by(n_events) emission; the oracle
    is the batch rollup's SQL, so cross-batch state carry is what the
    cell-exact equality proves."""
    import tempfile

    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
        link_inputs_to_outputs,
    )
    from graphsense_blocksci_spark.streaming.sketches import lifetime_stream

    _, raw_txs, _ = _fixture_frames(spark)
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("blk")
    )
    credits = (
        explode_outputs(raw_txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            F.concat_ws("|", "address").alias("addr"),
            F.col("value").cast("long").alias("recv"),
        )
        .join(heights, "tx_id")
        .select(
            "addr", "tx_id", "blk", "recv",
            F.lit(0).cast("long").alias("spent"),
        )
    )
    outs = (
        explode_outputs(raw_txs)
        .filter(F.size("address") > 0)
        .select(
            "tx_id",
            "output_index",
            F.concat_ws("|", "address").alias("addr"),
            F.col("value").cast("long").alias("value"),
        )
    )
    debits = (
        link_inputs_to_outputs(
            explode_inputs(raw_txs.filter(~F.col("coinbase"))), outs
        )
        .filter(F.col("addr").isNotNull())
        .join(heights, "tx_id")
        .select(
            "addr",
            "tx_id",
            "blk",
            F.lit(0).cast("long").alias("recv"),
            F.col("value").alias("spent"),
        )
    )
    ledger = credits.unionByName(debits).select(
        "addr", "tx_id", "blk", "recv", "spent"
    )
    work = tempfile.mkdtemp(prefix="gbs_slife_")
    ledger.filter(F.col("tx_id") % 2 == 0).drop("tx_id").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{work}/src")
    ledger.filter(F.col("tx_id") % 2 == 1).drop("tx_id").coalesce(
        1
    ).write.mode("append").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema(
            "addr string, blk long, recv long, spent long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/src")
    )
    q = (
        lifetime_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.read.schema(
        "addr string, first_block long, last_block long, n_events long,"
        " received_value long, spent_value long"
    ).parquet(f"{work}/out")
    return snaps.groupBy("addr").agg(
        F.expr(
            "max_by(struct(first_block, last_block, n_events,"
            " received_value, spent_value), n_events)"
        ).alias("s")
    ).select(
        "addr",
        F.col("s.first_block").alias("first_block"),
        F.col("s.last_block").alias("last_block"),
        F.col("s.n_events").alias("n_events"),
        F.col("s.received_value").alias("received_value"),
        F.col("s.spent_value").alias("spent_value"),
    )


def q309_quantile_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile quantile-treatment-effect readout: at each decile
    d=1..9, the exact lower-quantile balance of the AUTOMOBILE
    segment minus BUILDING's — WHERE the two distributions differ,
    not just whether (q310's U says whether). Exact integer
    quantiles with zero corpus-wide sort: each segment collapses to
    value-grouped counts, one cumulative window runs over the
    BOUNDED distinct-value domain, and decile d picks the first
    value whose cumulative count reaches ceil(d·n/10) — the same
    bounded-domain discipline as q308's median."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    per = (
        c.select(
            F.col("c_mktsegment").alias("seg"),
            _cents("c_acctbal").alias("s"),
        )
        .groupBy("seg", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("seg").orderBy("s")
    cum = per.select(
        "seg", "s", F.sum("cnt").over(w).cast("long").alias("cum")
    ).localCheckpoint(eager=False)
    tot = per.groupBy("seg").agg(F.sum("cnt").cast("long").alias("n"))
    deciles = spark.range(1, 10).select(
        F.col("id").cast("long").alias("decile")
    )
    targets = tot.crossJoin(F.broadcast(deciles)).select(
        "seg",
        "decile",
        F.expr("CAST((decile * n + 9) DIV 10 AS BIGINT)").alias("k"),
    )
    qtile = (
        cum.join(targets, "seg")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("seg", "decile")
        .agg(F.min("s").cast("long").alias("q"))
    )
    a = qtile.filter(F.col("seg") == "AUTOMOBILE").select(
        "decile", F.col("q").alias("q_auto")
    )
    b = qtile.filter(F.col("seg") == "BUILDING").select(
        "decile", F.col("q").alias("q_build")
    )
    return a.join(b, "decile").select(
        "decile",
        "q_auto",
        "q_build",
        (F.col("q_auto") - F.col("q_build")).cast("long").alias("shift"),
    )


def q313_recurring_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-periodic behavior detection — which (user, event_type)
    streams fire on a regular cadence (subscription renewals, cron
    jobs, bot traffic): per stream with >= 4 events, the inter-event
    gaps' mean and variance ride as exact n-scaled integers (mean
    stays as the (sum, n) pair; variance numerator n·Σg² − (Σg)² is
    the standard n²-scaled form), and the periodicity verdict is the
    integer predicate CV² < 1/16 ⇔ 16·(n·Σg² − (Σg)²) < (Σg)² — a
    coefficient-of-variation threshold with no float anywhere. One
    per-stream lag window + one rollup; gap magnitudes are seconds
    (~1e6) and streams are short, so n·Σg² sits far under int64."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("tse"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "tse", "event_id"
    )
    gaps = ev.select(
        "user_id",
        "event_type",
        (F.col("tse") - F.lag("tse").over(w)).alias("g"),
    ).filter(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sgg"),
    ).filter(F.col("n_gaps") >= 3)
    return agg.select(
        "user_id",
        "event_type",
        "n_gaps",
        F.expr("CAST(sg DIV n_gaps AS BIGINT)").alias("mean_gap_s"),
        (F.col("n_gaps") * F.col("sgg") - F.col("sg") * F.col("sg"))
        .cast("long")
        .alias("var_num"),
        (
            16 * (F.col("n_gaps") * F.col("sgg") - F.col("sg") * F.col("sg"))
            < F.col("sg") * F.col("sg")
        ).alias("is_periodic"),
    )


def q314_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary: the
    top-50 tokens with rank, frequency, and the integer-ppm Zipf
    statistic 1e6·freq·rank DIV top_freq (exactly 1e6 everywhere iff
    the corpus is ideally Zipfian) — the vocabulary-health readout a
    tokenizer review starts from. One token count (map-side
    combined), a TakeOrdered top-50 (never a global sort), and the
    rank window over 50 rows."""
    from graphsense_blocksci_spark.operators.textops import spread, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "t").limit(50)
    w = Window.orderBy(F.col("freq").desc(), "t")
    ranked = top.select(
        "t", "freq", F.row_number().over(w).cast("long").alias("rank")
    )
    top1 = ranked.filter(F.col("rank") == 1).select(
        F.col("freq").alias("f1")
    )
    return ranked.crossJoin(F.broadcast(top1)).select(
        "rank",
        F.col("t").alias("token"),
        "freq",
        F.expr("CAST(1000000 * freq * rank DIV f1 AS BIGINT)").alias(
            "zipf_ppm"
        ),
    )


def q315_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution round-trip — the lake reality q224's format
    coverage doesn't touch: a table whose LATER files carry an added
    column (priority_flag appears only in the 1995+ era of orders),
    read back in ONE scan with mergeSchema=true, old-era rows showing
    NULL for the new column exactly as a 100 TB lake's readers must
    (schema evolution never rewrites history). The rollup counts both
    eras and aggregates the evolved column with NULL-absorbing sums;
    the oracle reproduces the same union-with-missing-column
    semantics. The mergeSchema footer reconciliation happens at
    planning time — the scan itself stays one pushdown-pruned pass."""
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        _cents("o_totalprice").alias("cents"),
        F.col("o_orderpriority"),
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    path = tempfile.mkdtemp(prefix="gbs_evo_") + "/orders_evo"
    o.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_orderdate", "cents"
    ).write.mode("overwrite").parquet(f"{path}/era=v1")
    o.filter(F.col("o_orderdate") >= cut).select(
        "o_orderkey",
        "o_orderdate",
        "cents",
        F.when(F.col("o_orderpriority") < "3", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("priority_flag"),
    ).write.mode("overwrite").parquet(f"{path}/era=v2")
    evolved = spark.read.option("mergeSchema", "true").parquet(path)
    return evolved.groupBy("era").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(F.when(F.col("priority_flag").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_flag"),
        F.coalesce(F.sum("priority_flag"), F.lit(0))
        .cast("long")
        .alias("n_priority"),
    )


def q316_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record triage on CSV ingest — the lake-edge reality
    every 100 TB pipeline hits before its first clean parquet file:
    orders rendered to CSV with a deterministic corruption (every
    o_orderkey % 97 == 0 row carries a non-numeric amount), read back
    in ONE PERMISSIVE pass where schema violations land in the
    _corrupt_record column instead of killing the job (the
    quarantine-don't-crash contract; FAILFAST is the other knob).
    The audit row counts clean vs quarantined and sums only clean
    cents — the oracle re-derives all three from the corruption rule,
    proving PERMISSIVE neither drops nor double-counts anything."""
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        _cents("o_totalprice").alias("cents"),
    )
    lines = o.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("XX")).otherwise(
                F.col("cents").cast("string")
            ),
        ).alias("value")
    )
    path = tempfile.mkdtemp(prefix="gbs_corrupt_") + "/orders_csv"
    lines.write.mode("overwrite").text(path)
    raw = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, cents long,"
            " _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return raw.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("cents"))
        ).cast("long").alias("clean_cents"),
    )


def qd80_utxo_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTXO survival curve by creation era — what fraction of the
    coins minted in each block-range bucket has been spent at all,
    spent fast (within 10 blocks), or still sits unspent: the
    hoarding-vs-velocity readout that qd56's HODL waves give by
    VALUE-age and qd76 gives for coinbase only, here for every
    output from its CREATION side (outputs LEFT JOIN their spends,
    so never-spent outputs stay in the frame — the survival-analysis
    orientation). One linkage-shaped join + one era rollup."""
    from graphsense_blocksci_spark.operators.linkage import (
        explode_inputs,
        explode_outputs,
    )

    _, raw_txs, _ = _fixture_frames(spark)
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("blk")
    )
    outs = (
        explode_outputs(raw_txs)
        .select("tx_id", "output_index", "value")
        .join(heights, "tx_id")
        .select(
            "tx_id",
            "output_index",
            F.col("value").cast("long").alias("value"),
            F.col("blk").alias("created_blk"),
        )
    )
    spends = (
        explode_inputs(raw_txs.filter(~F.col("coinbase")))
        .join(heights, "tx_id")
        .select(
            F.col("spent_tx_id").alias("tx_id"),
            F.col("spent_index").alias("output_index"),
            F.col("blk").alias("spend_blk"),
        )
    )
    joined = outs.join(spends, ["tx_id", "output_index"], "left")
    return joined.groupBy(
        F.expr("CAST(created_blk DIV 25 AS BIGINT)").alias("era_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_outputs"),
        F.sum("value").cast("long").alias("value_created"),
        F.sum(F.when(F.col("spend_blk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_spent"),
        F.sum(
            F.when(
                F.col("spend_blk").isNotNull()
                & (F.col("spend_blk") - F.col("created_blk") <= 10),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_spent_fast"),
        F.sum(F.when(F.col("spend_blk").isNull(), F.col("value")).otherwise(0))
        .cast("long")
        .alias("value_unspent"),
    )


def q317_order_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependency discovery — does sorting by column A imply
    column B is sorted (the OD A ↦ B from the dependency-discovery
    literature; what q257's FDs are to equality, ODs are to order)?
    The audit that decides whether one layout sort key serves two
    range-pruning columns (a Z-order-vs-single-key question). For
    each candidate pair the violation count is one lag window over
    the A-ordered frame: a violation is B decreasing while A strictly
    increased (ties in A are exempt — ODs are defined on A-groups).
    Candidates here: orderdate↦orderkey, orderkey↦orderdate,
    custkey↦totalprice — the readout is (pair, n_violations, holds).

    Scale plan (the qd45/qd46 distributed-prefix discipline, not a
    global sort): per candidate, `repartitionByRange` on (A, B) makes
    every partition a contiguous block of the global sort order
    (Spark's RangePartitioner maps equal keys to one partition), so
    consecutive-pair violations split exactly into (i) within-
    partition lags — a window partitioned by the range-partition id,
    each task sorting only its own chunk — and (ii) the P-1 cross-
    boundary pairs, reconciled on a tiny per-partition first/last
    frame (min/max struct per pid, one lag over ≤P rows). No
    corpus-sized single-partition WindowExec anywhere; cell-exact
    equal to the global-window definition at any partition count."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("long")
        .alias("oday"),
        F.col("o_custkey").cast("long").alias("ckey"),
        _cents("o_totalprice").alias("cents"),
    )
    pairs = [
        ("oday_to_okey", "oday", "okey"),
        ("okey_to_oday", "okey", "oday"),
        ("ckey_to_cents", "ckey", "cents"),
    ]
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    viol = (
        (F.col("_pa").isNotNull())
        & (F.col("_a") > F.col("_pa"))
        & (F.col("_b") < F.col("_pb"))
    )
    out = None
    for name, a, b in pairs:
        d = (
            o.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
            .repartitionByRange(n_parts, "_a", "_b")
            .withColumn("_pid", F.spark_partition_id())
        )
        w_in = Window.partitionBy("_pid").orderBy("_a", "_b")
        inner = d.select(
            "_a",
            "_b",
            F.lag("_a").over(w_in).alias("_pa"),
            F.lag("_b").over(w_in).alias("_pb"),
        ).select(F.when(viol, 1).otherwise(0).alias("_viol"))
        # per-partition first/last rows: partitions are contiguous
        # range blocks, so min/max struct(_a,_b) IS first/last in the
        # global (A, B) order; the lag pairs each non-empty partition's
        # first row with the previous non-empty partition's last row.
        bounds = d.groupBy("_pid").agg(
            F.min(F.struct("_a", "_b")).alias("_first"),
            F.max(F.struct("_a", "_b")).alias("_last"),
        )
        w_b = Window.orderBy("_pid")
        edge = bounds.select(
            F.col("_first._a").alias("_a"),
            F.col("_first._b").alias("_b"),
            F.lag(F.col("_last._a")).over(w_b).alias("_pa"),
            F.lag(F.col("_last._b")).over(w_b).alias("_pb"),
        ).select(F.when(viol, 1).otherwise(0).alias("_viol"))
        v = (
            inner.unionByName(edge)
            .agg(
                F.coalesce(F.sum("_viol"), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(
                F.lit(name).alias("pair"),
                "n_violations",
                (F.col("n_violations") == 0).alias("holds"),
            )
        )
        out = v if out is None else out.unionByName(v)
    return out


def q318_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit — the batch readout that calibrates a
    streaming watermark BEFORE the stream runs: replaying events in
    arrival order (event_id — the ingest sequence), each event's
    lateness is the running max of event time seen so far minus its
    own event time; the per-event-type histogram over {0, ≤1m, ≤1h,
    ≤1d, >1d} says what `withWatermark` delay loses how much data.
    The synthetic feed arrives perfectly ordered, so the replay adds
    deterministic ingest jitter — events shuffle md5-wise WITHIN each
    100-event block (arrival = (block, md5(eid), eid)) — the bounded
    out-of-orderness a multi-partition Kafka topic actually shows.
    Lateness stays integer seconds.

    Scale plan (the qd45/qd46/q261 two-phase distributed prefix, not a
    per-type global window — event_type has a handful of values, so a
    type-partitioned running max would sort ~corpus/|types| rows in
    one task): phase 1 computes per-(type, arr_block) maxima (one
    map-side-combining agg, frame 100× smaller than the feed); phase 2
    runs the running max over that bounded block frame with an
    exclusive upper bound (all PRIOR blocks); the per-block prefix
    joins back on (type, arr_block) — co-partitioned with the
    within-block window that follows, so no extra exchange — and each
    row's running max is greatest(prior-blocks max, within-block
    running max over ≤100 rows). Cell-exact equal to the single
    cumulative window."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("eid"),
            F.col("ts").cast("timestamp").cast("long").alias("tse"),
        )
        .withColumn("arr_block", F.expr("CAST(eid DIV 100 AS BIGINT)"))
        .withColumn("arr_h", F.md5(F.col("eid").cast("string")))
    )
    blk = ev.groupBy("event_type", "arr_block").agg(
        F.max("tse").alias("_blk_max")
    )
    w_blk = (
        Window.partitionBy("event_type")
        .orderBy("arr_block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = blk.select(
        "event_type",
        "arr_block",
        F.max("_blk_max").over(w_blk).alias("_prev_max"),
    )
    w_in = (
        Window.partitionBy("event_type", "arr_block")
        .orderBy("arr_h", "eid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.join(prev, ["event_type", "arr_block"]).select(
        "event_type",
        (
            F.greatest(
                F.max("tse").over(w_in),
                F.coalesce(F.col("_prev_max"), F.lit(-(1 << 62))),
            )
            - F.col("tse")
        ).alias("late_s"),
    )
    bucket = (
        F.when(F.col("late_s") <= 0, F.lit("on_time"))
        .when(F.col("late_s") <= 60, F.lit("le_1m"))
        .when(F.col("late_s") <= 3600, F.lit("le_1h"))
        .when(F.col("late_s") <= 86400, F.lit("le_1d"))
        .otherwise(F.lit("gt_1d"))
    )
    return late.groupBy(
        "event_type", bucket.alias("lateness_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("late_s").cast("long").alias("max_late_s"),
    )


def qd81_dust_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dust-output analysis — sub-threshold outputs (< 10k units)
    per creation era: how much of the UTXO set is uneconomical to
    spend (the fee-pressure readout wallet consolidation planning
    starts from). Per era bucket: dust count/value, total outputs,
    and the dust share in exact ppm. One exploded-output scan, one
    era rollup — no linkage needed (dust is a creation-side
    property)."""
    from graphsense_blocksci_spark.operators.linkage import explode_outputs

    _, raw_txs, _ = _fixture_frames(spark)
    heights = raw_txs.select(
        "tx_id", F.col("block_id").cast("long").alias("blk")
    )
    outs = (
        explode_outputs(raw_txs)
        .select("tx_id", F.col("value").cast("long").alias("value"))
        .join(heights, "tx_id")
    )
    return outs.groupBy(
        F.expr("CAST(blk DIV 25 AS BIGINT)").alias("era_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_outputs"),
        F.sum(F.when(F.col("value") < 10_000, 1).otherwise(0))
        .cast("long")
        .alias("n_dust"),
        F.sum(F.when(F.col("value") < 10_000, F.col("value")).otherwise(0))
        .cast("long")
        .alias("dust_value"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN value < 10000 THEN 1 ELSE 0 END)"
            " DIV count(1) AS BIGINT)"
        ).alias("dust_share_ppm"),
    )


def q319_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup — dedup a NEW ingest batch against an
    EXISTING corpus without ever re-comparing old-vs-old (the shape a
    production 100 TB pipeline actually runs: the corpus is
    append-only, each batch dedups against the accumulated hash
    index). The batch is doc_id % 5 == 0 (~20%); the corpus is the
    rest. Per new doc the verdict is a two-join decision: the
    normalized-content md5 probes the corpus hash index
    (dup_of_existing → canonical = min matching corpus doc), else the
    within-batch min (dup_in_batch for non-first occurrences), else
    unique.

    Scale shape: corpus side is ONE groupBy to its hash index (in
    production a bucketed table maintained incrementally — sinks.py's
    bucketBy layout — so even that pass is amortized); batch side is
    two hash-key shuffles of BATCH size. Old-vs-old pairs never form.
    Output columns: (doc_id, verdict, canonical_id)."""
    from graphsense_blocksci_spark.operators.textops import normalize_text

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(normalize_text("text")).alias("h"),
    )
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    old_idx = old.groupBy("h").agg(F.min("doc_id").alias("_old_min"))
    batch_min = new.groupBy("h").agg(F.min("doc_id").alias("_batch_min"))
    return (
        new.join(old_idx, "h", "left")
        .join(batch_min, "h")
        .select(
            "doc_id",
            F.when(F.col("_old_min").isNotNull(), F.lit("dup_of_existing"))
            .when(F.col("doc_id") > F.col("_batch_min"), F.lit("dup_in_batch"))
            .otherwise(F.lit("unique"))
            .alias("verdict"),
            F.coalesce("_old_min", "_batch_min").alias("canonical_id"),
        )
    )


def q320_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split — the assignment a training
    pipeline must make AFTER near-dup clustering, not before: if two
    near-duplicate documents land in different splits, the eval split
    is contaminated. Clusters come from the oracled q71 machinery
    (MinHash-LSH candidates → exact Jaccard ≥ 0.2 verify → connected
    components → canonical id); every doc in a cluster inherits the
    split of its CANONICAL id via deterministic md5 hashing (8/1/1
    train/val/test), so co-clustered docs can never separate. The
    readout is the split audit card: per split, docs, distinct
    clusters, total chars — plus cross_split_dup_pairs, the number of
    verified near-dup pairs whose endpoints sit in different splits,
    COMPUTED from the pair frame rather than assumed (0 proves the
    no-leakage property end to end).

    Scale shape: rides q71's candidate/verify discipline (the pair
    graph is near-dup-sized, not corpus-sized); the split assignment
    is one md5 projection + one broadcast-able cluster-map join; the
    audit is one rollup plus one pair-frame join."""
    from graphsense_blocksci_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
    pairs = pairs.localCheckpoint(eager=False)
    cc = connected_components(pairs, src="id_a", dst="id_b")
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("chars"),
    )
    assigned = (
        d.join(cc, d.doc_id == cc.node, "left")
        .select(
            "doc_id",
            "chars",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
        .withColumn(
            "split",
            F.when(
                F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 7), 16, 10)
                .cast("long") % 10 < 8,
                F.lit("train"),
            )
            .when(
                F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 7), 16, 10)
                .cast("long") % 10 == 8,
                F.lit("val"),
            )
            .otherwise(F.lit("test")),
        )
        .localCheckpoint(eager=False)
    )
    card = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.sum("chars").cast("long").alias("total_chars"),
    )
    sa = assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("_sa"))
    sb = assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("_sb"))
    leak = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_sa") != F.col("_sb"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("cross_split_dup_pairs")
        )
    )
    return card.crossJoin(F.broadcast(leak))


def q321_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup probe — the fuzzy sibling of q319: match
    each NEW-batch document (doc_id % 5 == 0) against the EXISTING
    corpus through an inverted shingle-hash index, probe-side only.
    Candidates form exclusively where a new doc shares a shingle with
    an old doc (the index join is new-side-probe-sized); per
    candidate the EXACT Jaccard rides integer arithmetic — inter from
    the shared-shingle count, union = |A| + |B| - inter, and the
    ≥ 0.5 threshold as the cross-multiplied predicate 3·inter ≥
    |A| + |B| (no float compare anywhere; jaccard_ppm = 10^6·inter
    DIV union is the reported integer). Output: every (new_doc_id,
    matched_old_id) above threshold with (inter, union_sz,
    jaccard_ppm).

    This is the production decontamination/incremental-dedup
    asymmetry q91 inverts: q91 broadcasts a small eval set over the
    corpus; here the CORPUS is the indexed side and the small batch
    probes it — old-vs-old shingle pairs never join. At 100 TB the
    old index is a bucketed table on shingle hash; each batch is one
    probe join + one (new, old) count aggregate."""
    from graphsense_blocksci_spark.operators.textops import shingle_hash_frame

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hash_frame(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("_sh").alias("sh"),
    )
    sizes = sh.select("doc_id", F.size("sh").cast("long").alias("n"))
    ex = sh.select("doc_id", F.explode("sh").alias("h"))
    new_sh = ex.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("new_doc_id"), "h"
    )
    old_idx = ex.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("matched_old_id"), "h"
    )
    inter = (
        new_sh.join(old_idx, "h")
        .groupBy("new_doc_id", "matched_old_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("new_doc_id"), F.col("n").alias("_na")),
            "new_doc_id",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("matched_old_id"), F.col("n").alias("_nb")
            ),
            "matched_old_id",
        )
        .filter(3 * F.col("inter") >= F.col("_na") + F.col("_nb"))
        .select(
            "new_doc_id",
            "matched_old_id",
            "inter",
            (F.col("_na") + F.col("_nb") - F.col("inter")).alias("union_sz"),
            F.expr("CAST(1000000 * inter DIV (_na + _nb - inter) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )


def qd82_peel_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peeling-chain detection — the classic obfuscation pattern a
    chain-analytics engine must surface (a BlockSci-domain analytic
    beyond the reference's export surface): a run of 1-input/2-output
    transactions where each tx's larger output funds the next hop and
    the smaller output "peels" off. Per maximal chain of length ≥ 2
    transactions (one full peel step or more): (head_tx, chain_len,
    tail_tx, peeled_total).

    Construction, all integer and deterministic: peel-shaped txs
    (exactly 1 input, 2 outputs); a successor edge parent → child
    where the child's single input spends a parent output, both ends
    peel-shaped, and — when both parent outputs are spent by
    peel-shaped children — the successor is the child spending the
    LARGER-value output (tie → lower spent_index), so out-degree ≤ 1;
    in-degree ≤ 1 holds by the single-input shape. The graph is a
    union of simple paths (spends point forward in time — no cycles),
    so chain stats ride 6 rounds of pointer doubling (exact for
    chains to 2^6 + 1 txs; the fixture maxes far below — the bound is
    asserted by a raise-on-unresolved guard). peeled_total sums
    parent_outputs_total − continued_value over the chain's edges.

    Scale shape: the peel frame is a small filtered projection of the
    tx scan; each doubling round is one self-join on the current
    pointer — log-depth, never a corpus-sized window."""
    from graphsense_blocksci_spark.operators.linkage import explode_outputs  # noqa: F401  (schema doc)

    _, raw_txs, _ = _fixture_frames(spark)
    peel = (
        raw_txs.filter(
            (F.size("inputs") == 1) & (F.size("outputs") == 2)
        )
        .select(
            F.col("tx_id").cast("long").alias("tx_id"),
            F.col("inputs")[0]["spent_tx_id"].cast("long").alias("parent"),
            F.col("inputs")[0]["value"].cast("long").alias("in_value"),
            F.col("inputs")[0]["spent_index"].cast("long").alias("in_index"),
            F.aggregate(
                "outputs", F.lit(0).cast("long"), lambda a, o: a + o["value"]
            ).alias("out_total"),
        )
        .localCheckpoint(eager=False)
    )
    ids = peel.select("tx_id")
    # successor: among peel-shaped children of a peel-shaped parent,
    # the one spending the larger-value output (tie: lower index)
    succ = (
        peel.join(ids.withColumnRenamed("tx_id", "parent"), "parent")
        .groupBy("parent")
        .agg(
            F.max_by(
                F.struct(
                    F.col("tx_id").alias("child"),
                    F.col("in_value").alias("v"),
                ),
                F.struct(F.col("in_value"), (-F.col("in_index")).alias("ni")),
            ).alias("_c")
        )
        .select(
            "parent",
            F.col("_c.child").alias("child"),
            F.col("_c.v").alias("continued_value"),
        )
    )
    parent_tot = peel.select(
        F.col("tx_id").alias("parent"), F.col("out_total").alias("_pt")
    )
    edges = succ.join(parent_tot, "parent").select(
        "parent",
        "child",
        (F.col("_pt") - F.col("continued_value")).alias("peeled"),
    )
    edges = edges.localCheckpoint(eager=False)
    # pointer doubling: state(x) = (ptr, dist, sum); terminal state is
    # (x, 0, 0) so composition is idempotent at the tail
    nodes = (
        edges.select(F.col("parent").alias("x"))
        .union(edges.select(F.col("child").alias("x")))
        .distinct()
    )
    state = (
        nodes.join(edges.withColumnRenamed("parent", "x"), "x", "left")
        .select(
            "x",
            F.coalesce("child", "x").alias("ptr"),
            F.when(F.col("child").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("dist"),
            F.coalesce("peeled", F.lit(0)).cast("long").alias("psum"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(6):
        nxt = state.select(
            F.col("x").alias("ptr"),
            F.col("ptr").alias("_p2"),
            F.col("dist").alias("_d2"),
            F.col("psum").alias("_s2"),
        )
        state = (
            state.join(nxt, "ptr")
            .select(
                "x",
                F.col("_p2").alias("ptr"),
                (F.col("dist") + F.col("_d2")).alias("dist"),
                (F.col("psum") + F.col("_s2")).alias("psum"),
            )
            .localCheckpoint(eager=False)
        )
    # resolution guard: after 6 roundings every ptr must be terminal
    unresolved = (
        state.join(edges.select(F.col("parent").alias("ptr")), "ptr", "semi")
        .limit(1)
        .count()
    )
    if unresolved:
        raise ValueError(
            "qd82_peel_chain: a chain exceeds 2^6 + 1 txs; raise the "
            "doubling rounds (log-depth — one extra round doubles reach)"
        )
    heads = state.join(
        edges.select(F.col("child").alias("x")), "x", "anti"
    )
    return heads.filter(F.col("dist") >= 1).select(
        F.col("x").alias("head_tx"),
        (F.col("dist") + 1).alias("chain_len"),
        F.col("ptr").alias("tail_tx"),
        F.col("psum").alias("peeled_total"),
    )


# Registry order is load-bearing: the driver's correctness gate verifies the
# FIRST 50 insertion-ordered entries against the DuckDB oracle each round.
# q01 stays first (entry() smoke query); the rest of the window rotates per
# round so every family eventually gets a driver-green row.
#
# ROUND-9 WINDOW (this round): the first 49 of the never-driver-green
# continuation block — q269-q302 with the interleaved qd60-qd74
# streaming/chain twins. See the in-dict section comment for the family
# list. All 49 are oracled.
#
# ROUND-10 ROTATION (do this first next round): move the "round-10
# rotation candidates" section below the window (qd75/q303/q304/q305 +
# the round-8 additions q306-q318 + qd76-qd81 + the round-9 wave
# q319-q321 + qd82 — 27 entries) into positions 2-50, then the
# newly-exact q111/q167/q170/q140/q160 (q140 BPE train and q160
# Louvain gained unroll oracles in round 9), then the rows-only set
# (q54/q61/q97/q169/q173 — genuinely float paths; driver records the
# weaker rows-only check): 37 never-driver-green slots total. Fill
# the remaining 12 with the oldest previously-green rows (q37-q97
# long tail) for re-verification. After round 10 every registered
# entry has had a driver-green (or declared rows-only) row at least
# once.
QUERIES: dict[str, QueryFn] = {
    # -- round-9 driver window (50) ------------------------------------
    # q01 first (entry() smoke), then the never-driver-green round-7/8
    # continuation block per the registered rotation plan: q269-q302 +
    # the interleaved qd60-qd74 streaming/chain twins (SCD2, funnel,
    # sweep-line, streaks, CDC apply, adjusted Rand, record linkage,
    # OHLC/VWAP, phrase search, cohort LTV, trigrams, LOCF, FIFO/haircut
    # taint, skyline, rolling-distinct DAU/WAU, reciprocity, tolerance
    # join, motif census, LSH quality audit, subsample CI, dedup savings,
    # UTXO growth, dataset card, JSON props, nearest as-of, component
    # census, TWAB, identity resolution, interval union, reconciliation,
    # forecast backtest, whale transfers, sequence patterns, five-number
    # summary, address type census, streaming CDC, PIT features,
    # balance/outpoint audits, balanced sampler, taint exposure,
    # diff-in-diff, revenue bridge, daily Gini, edge support, key gaps).
    # All 49 are oracled.
    "q01_pricing_summary": q01_pricing_summary,
    "q269_scd2_dimension": q269_scd2_dimension,
    "q270_funnel_conversion": q270_funnel_conversion,
    "q271_max_concurrency": q271_max_concurrency,
    "q272_activity_streaks": q272_activity_streaks,
    "q273_cdc_apply": q273_cdc_apply,
    "q274_adjusted_rand": q274_adjusted_rand,
    "q275_record_linkage": q275_record_linkage,
    "q276_vwap_ohlc": q276_vwap_ohlc,
    "q277_phrase_search": q277_phrase_search,
    "qd60_streaming_ohlc": qd60_streaming_ohlc,
    "q278_cohort_ltv": q278_cohort_ltv,
    "q279_event_trigrams": q279_event_trigrams,
    "q280_locf_imputation": q280_locf_imputation,
    "qd61_fifo_taint": qd61_fifo_taint,
    "q281_skyline": q281_skyline,
    "q282_rolling_distinct_users": q282_rolling_distinct_users,
    "qd62_graph_reciprocity": qd62_graph_reciprocity,
    "q283_tolerance_join": q283_tolerance_join,
    "q284_conversion_lag": q284_conversion_lag,
    "qd63_tx_motif_census": qd63_tx_motif_census,
    "q285_lsh_quality_eval": q285_lsh_quality_eval,
    "q286_subsample_ci": q286_subsample_ci,
    "q287_dedup_savings": q287_dedup_savings,
    "qd64_utxo_growth": qd64_utxo_growth,
    "q288_dataset_card": q288_dataset_card,
    "q289_json_props_stats": q289_json_props_stats,
    "q290_nearest_asof": q290_nearest_asof,
    "qd65_haircut_taint_value": qd65_haircut_taint_value,
    "qd66_address_component_census": qd66_address_component_census,
    "qd67_time_weighted_balance": qd67_time_weighted_balance,
    "q291_identity_resolution": q291_identity_resolution,
    "q292_interval_union": q292_interval_union,
    "q293_table_reconciliation": q293_table_reconciliation,
    "q294_forecast_backtest": q294_forecast_backtest,
    "qd68_whale_transfers": qd68_whale_transfers,
    "q295_sequence_pattern": q295_sequence_pattern,
    "q296_five_number_summary": q296_five_number_summary,
    "qd69_address_type_census": qd69_address_type_census,
    "qd70_streaming_cdc": qd70_streaming_cdc,
    "q297_pit_features": q297_pit_features,
    "qd71_balance_audit": qd71_balance_audit,
    "q298_balanced_sample": q298_balanced_sample,
    "qd72_outpoint_conflicts": qd72_outpoint_conflicts,
    "qd73_entity_taint_exposure": qd73_entity_taint_exposure,
    "q299_diff_in_diff": q299_diff_in_diff,
    "q300_revenue_bridge": q300_revenue_bridge,
    "qd74_gini_timeseries": qd74_gini_timeseries,
    "q301_edge_support": q301_edge_support,
    "q302_key_gaps": q302_key_gaps,
    # -- round-10 rotation candidates (never driver-green, oracled) ----
    # ROUND-10 ROTATION (do this first next round): move this block --
    # qd75/q303/q304/q305 (supply audit, n-gram coverage, daily overlap,
    # incremental SCD2) plus the round-8 additions q306-q318 + qd76-qd81
    # (grouped ridge, isotonic PAV, Hodges-Lehmann, quantile shift,
    # Mann-Whitney, cross-correlation, KWIC, recurring payments, Zipf
    # profile, schema evolution, corrupt-record triage, coinbase
    # maturity, address lifetime + streaming twin, k-truss peel, UTXO
    # survival, order-dependency audit, lateness audit, dust analysis)
    # + the round-9 wave q319-q321/qd82 -- into positions 2-50, then
    # the newly-exact q111/q167/q170/q140/q160, then the rows-only set
    # (q54/q61/q97/q169/q173 -- driver records the weaker rows-only
    # check). That is 27 + 5 + 5 = 37 never-driver-green slots; fill
    # the remaining 12 with the oldest previously-green rows (q37-q97
    # long tail) for re-verification.
    "qd75_supply_audit": qd75_supply_audit,
    "q303_ngram_coverage": q303_ngram_coverage,
    "q304_daily_overlap": q304_daily_overlap,
    "q305_scd2_incremental": q305_scd2_incremental,
    "q306_grouped_ridge": q306_grouped_ridge,
    "q307_isotonic_trend": q307_isotonic_trend,
    "q308_hodges_lehmann": q308_hodges_lehmann,
    "q309_quantile_shift": q309_quantile_shift,
    "q310_mann_whitney": q310_mann_whitney,
    "q311_cross_correlation": q311_cross_correlation,
    "q312_keyword_in_context": q312_keyword_in_context,
    "q313_recurring_payments": q313_recurring_payments,
    "q314_zipf_profile": q314_zipf_profile,
    "q315_schema_evolution": q315_schema_evolution,
    "q316_corrupt_records": q316_corrupt_records,
    "qd76_coinbase_maturity": qd76_coinbase_maturity,
    "qd77_address_lifetime": qd77_address_lifetime,
    "qd78_ktruss_peel": qd78_ktruss_peel,
    "qd79_streaming_address_lifetime": qd79_streaming_address_lifetime,
    "qd80_utxo_survival": qd80_utxo_survival,
    "q317_order_dependency": q317_order_dependency,
    "q318_lateness_audit": q318_lateness_audit,
    "qd81_dust_analysis": qd81_dust_analysis,
    # round-9 wave (never driver-green, oracled): incremental
    # exact/near dedup against an existing corpus, leakage-safe
    # cluster-hashed splits, and peeling-chain detection
    "q319_incremental_dedup": q319_incremental_dedup,
    "q320_leakage_safe_split": q320_leakage_safe_split,
    "q321_incremental_neardup": q321_incremental_neardup,
    "qd82_peel_chain": qd82_peel_chain,
    # -- previously driver-green (rounds 1-8) --------------------------
    "q228_pr_curve": q228_pr_curve,
    "q229_unpivot_measures": q229_unpivot_measures,
    "q230_spearman_by_nation": q230_spearman_by_nation,
    "q231_ndcg_at_10": q231_ndcg_at_10,
    "q232_resource_allocation": q232_resource_allocation,
    "q233_cusum_revenue": q233_cusum_revenue,
    "q234_cohens_kappa": q234_cohens_kappa,
    "q235_kendall_tau": q235_kendall_tau,
    "q236_ancestor_closure": q236_ancestor_closure,
    "q237_simpson_diversity": q237_simpson_diversity,
    "q238_ngram_novelty": q238_ngram_novelty,
    "q239_weighted_median": q239_weighted_median,
    "q240_tfidf_keywords": q240_tfidf_keywords,
    "q241_burstiness": q241_burstiness,
    "q242_hhi_concentration": q242_hhi_concentration,
    "q243_benford_deviation": q243_benford_deviation,
    "q244_group_mode": q244_group_mode,
    "q245_lorenz_curve": q245_lorenz_curve,
    "q246_rfm_segmentation": q246_rfm_segmentation,
    "q247_life_table": q247_life_table,
    "q248_readability": q248_readability,
    "q249_market_basket": q249_market_basket,
    "q250_cumulative_distinct": q250_cumulative_distinct,
    "q251_pivot_report": q251_pivot_report,
    "q252_log2_quantile_sketch": q252_log2_quantile_sketch,
    "q253_bitmap_retention": q253_bitmap_retention,
    "q254_seasonal_decomposition": q254_seasonal_decomposition,
    "qd55_streaming_log2_histogram": qd55_streaming_log2_histogram,
    "q255_runtime_filter_join": q255_runtime_filter_join,
    "q256_max_drawdown": q256_max_drawdown,
    "q257_functional_deps": q257_functional_deps,
    "qd56_hodl_waves": qd56_hodl_waves,
    "q258_split_scoring": q258_split_scoring,
    "q259_quantile_normalization": q259_quantile_normalization,
    "qd57_streaming_bitmap_dau": qd57_streaming_bitmap_dau,
    "q260_linear_interpolation": q260_linear_interpolation,
    "q261_pps_sample": q261_pps_sample,
    "qd58_tagged_netflow": qd58_tagged_netflow,
    "q262_kaplan_meier": q262_kaplan_meier,
    "q263_k_anonymity": q263_k_anonymity,
    "q264_ordered_string_agg": q264_ordered_string_agg,
    "q265_mixing_manifest": q265_mixing_manifest,
    "q266_referential_integrity": q266_referential_integrity,
    "q267_seasonal_anomalies": q267_seasonal_anomalies,
    "q268_rollup_share": q268_rollup_share,
    "qd59_multi_chain_summary": qd59_multi_chain_summary,
    "qd52_change_heuristics": qd52_change_heuristics,
    "qd53_fee_percentiles": qd53_fee_percentiles,
    "qd54_streaming_changepoint": qd54_streaming_changepoint,
    "qd40_streaming_topn_others": qd40_streaming_topn_others,
    "qd41_streaming_drift": qd41_streaming_drift,
    "qd42_address_transactions": qd42_address_transactions,
    "qd43_entity_transactions": qd43_entity_transactions,
    "q216_epoch_shuffle": q216_epoch_shuffle,
    "q217_domain_mixture": q217_domain_mixture,
    "qd44_incremental_address_index": qd44_incremental_address_index,
    "q218_hits": q218_hits,
    "q219_degree_assortativity": q219_degree_assortativity,
    "q220_containment_join": q220_containment_join,
    "qd45_balance_gini": qd45_balance_gini,
    "qd46_nakamoto_coefficient": qd46_nakamoto_coefficient,
    "qd47_coin_days_destroyed": qd47_coin_days_destroyed,
    "q221_duplicate_sentences": q221_duplicate_sentences,
    "q222_pii_prevalence": q222_pii_prevalence,
    "qd48_streaming_index_daemon": qd48_streaming_index_daemon,
    "qd49_reorg_recovery": qd49_reorg_recovery,
    "qd50_address_relations": qd50_address_relations,
    "q223_scc": q223_scc,
    "q224_orc_roundtrip": q224_orc_roundtrip,
    "q225_sql_interface": q225_sql_interface,
    "qd51_streaming_duplicate_sentences": qd51_streaming_duplicate_sentences,
    "q226_tokenizer_fertility": q226_tokenizer_fertility,
    "q227_cross_source_overlap": q227_cross_source_overlap,
    "q135_ewma_smoothing": q135_ewma_smoothing,
    "q136_zorder_key": q136_zorder_key,
    "q142_systematic_sample": q142_systematic_sample,
    "q143_scene_changes": q143_scene_changes,
    "q144_random_walks": q144_random_walks,
    "q147_negative_sampling": q147_negative_sampling,
    "q149_weighted_reservoir": q149_weighted_reservoir,
    "q151_corpus_drift": q151_corpus_drift,
    "q152_equiwidth_bins": q152_equiwidth_bins,
    "q153_zscore_normalize": q153_zscore_normalize,
    "q154_kfold_assign": q154_kfold_assign,
    "q156_tf_cosine_join": q156_tf_cosine_join,
    "q158_two_hop": q158_two_hop,
    "q159_simhash_join": q159_simhash_join,
    "q161_attribution": q161_attribution,
    "q162_rank_fusion": q162_rank_fusion,
    "q163_count_min": q163_count_min,
    "q164_event_transitions": q164_event_transitions,
    "q166_gram_matrix": q166_gram_matrix,
    "q168_path_counts": q168_path_counts,
    "q171_feature_hash": q171_feature_hash,
    "q172_skew_report": q172_skew_report,
    "q174_seasonal_profile": q174_seasonal_profile,
    "q175_data_quality": q175_data_quality,
    "q176_minhash_estimate": q176_minhash_estimate,
    "q186_edit_distance_join": q186_edit_distance_join,
    "q187_map_at_10": q187_map_at_10,
    "q188_autocorrelation": q188_autocorrelation,
    "q189_msf_boruvka": q189_msf_boruvka,
    "q190_nb_token_model": q190_nb_token_model,
    "q191_chi2_independence": q191_chi2_independence,
    "q192_groupwise_ols": q192_groupwise_ols,
    "q193_mann_kendall": q193_mann_kendall,
    "q194_clustering_coefficient": q194_clustering_coefficient,
    "q195_target_encoding": q195_target_encoding,
    "q196_rendezvous_hashing": q196_rendezvous_hashing,
    "q197_fk_inference": q197_fk_inference,
    "q198_merkle_diff": q198_merkle_diff,
    "q199_hll_deterministic": q199_hll_deterministic,
    "q200_merge_upsert": q200_merge_upsert,
    "q201_topn_others": q201_topn_others,
    "q202_degree_histogram": q202_degree_histogram,
    "q203_groupwise_hll": q203_groupwise_hll,
    "q204_embedding_decontamination": q204_embedding_decontamination,
    "q205_confusion_metrics": q205_confusion_metrics,
    "q206_decile_lift": q206_decile_lift,
    "q207_equidepth_bins": q207_equidepth_bins,
    "q208_pareto_curve": q208_pareto_curve,
    "q209_theil_sen": q209_theil_sen,
    "q210_ks_test": q210_ks_test,
    "q211_quality_keeper": q211_quality_keeper,
    "q212_time_to_convert": q212_time_to_convert,
    "q213_fit_apply_bins": q213_fit_apply_bins,
    "q214_rolling_mad_anomalies": q214_rolling_mad_anomalies,
    "q215_profile_similarity": q215_profile_similarity,
    "qd32_streaming_shard_router": qd32_streaming_shard_router,
    "qd33_streaming_hll": qd33_streaming_hll,
    "qd34_peeling_chains": qd34_peeling_chains,
    "qd35_address_reuse": qd35_address_reuse,
    "qd36_miner_revenue": qd36_miner_revenue,
    "qd37_streaming_lsh_pairs": qd37_streaming_lsh_pairs,
    "qd38_streaming_simhash_pairs": qd38_streaming_simhash_pairs,
    "qd39_entity_tags": qd39_entity_tags,
    "q43_knn_gemm": q43_knn_gemm,
    "q125_knn_ivfpq": q125_knn_ivfpq,
    "q130_personalized_pagerank": q130_personalized_pagerank,
    "q109_temperature_sample": q109_temperature_sample,
    "q117_group_capped_sample": q117_group_capped_sample,
    "q118_batch_planning": q118_batch_planning,
    "q119_language_confusion": q119_language_confusion,
    "qd23_binary_files": qd23_binary_files,
    "q129_skyline": q129_skyline,
    "q132_record_linkage": q132_record_linkage,
    "q134_mad_outliers": q134_mad_outliers,
    "q111_kmeans_lloyd": q111_kmeans_lloyd,
    "q140_bpe_train": q140_bpe_train,
    "q160_louvain": q160_louvain,
    "q167_ridge_fit": q167_ridge_fit,
    "q169_betweenness": q169_betweenness,
    "q170_pca_scatter": q170_pca_scatter,
    "q173_logistic_gd": q173_logistic_gd,
    "q177_calibration_curve": q177_calibration_curve,
    "q178_cms_join_size": q178_cms_join_size,
    "q37_simhash": q37_simhash,
    "q38_jaccard_pairs": q38_jaccard_pairs,
    "q45_curation_pipeline": q45_curation_pipeline,
    "q47_bpe_tokens": q47_bpe_tokens,
    "q51_cube": q51_cube,
    "q52_lead_lag_running": q52_lead_lag_running,
    "q53_set_ops": q53_set_ops,
    "q54_approx_distinct": q54_approx_distinct,
    "q55_salted_join": q55_salted_join,
    "q59_percentiles": q59_percentiles,
    "q61_approx_percentiles": q61_approx_percentiles,
    "q72_stratified_sample": q72_stratified_sample,
    "q73_train_test_split": q73_train_test_split,
    "q74_session_window": q74_session_window,
    "q75_pivot": q75_pivot,
    "q76_hopping_windows": q76_hopping_windows,
    "q82_vocabulary": q82_vocabulary,
    "q83_doc_frequency": q83_doc_frequency,
    "q85_range_frame": q85_range_frame,
    "q86_grouping_sets": q86_grouping_sets,
    "q93_ranking_suite": q93_ranking_suite,
    "q94_lateral_topk": q94_lateral_topk,
    "q95_date_spine": q95_date_spine,
    "q96_snapshot_diff": q96_snapshot_diff,
    "q97_hll_partials": q97_hll_partials,
    "q41_media_features": q41_media_features,
    "q42_frame_sample": q42_frame_sample,
    "q56_resize_thumbs": q56_resize_thumbs,
    "q120_triangle_count": q120_triangle_count,
    "q121_heavy_hitters": q121_heavy_hitters,
    "q126_hdr_quantiles": q126_hdr_quantiles,
    "q146_kmv_sketch": q146_kmv_sketch,
    "q155_jaccard_join": q155_jaccard_join,
    "q157_modularity": q157_modularity,
    "q165_span_dedup_rewrite": q165_span_dedup_rewrite,
    "q179_window_distinct_merge": q179_window_distinct_merge,
    "q180_point_in_time_lookup": q180_point_in_time_lookup,
    "q181_golden_record": q181_golden_record,
    "q182_ab_test": q182_ab_test,
    "q183_cuped": q183_cuped,
    "q184_winsorized_mean": q184_winsorized_mean,
    "q185_mrr": q185_mrr,
    "qd27_daily_balances": qd27_daily_balances,
    "qd28_utxo_snapshot": qd28_utxo_snapshot,
    "qd29_tx_fees": qd29_tx_fees,
    "qd30_block_intervals": qd30_block_intervals,
    "qd31_entity_daily_balances": qd31_entity_daily_balances,
    "q84_pagerank": q84_pagerank,
    "q40_knn_lsh": q40_knn_lsh,
    "q103_knn_lsh_gemm": q103_knn_lsh_gemm,
    "q44_knn_ivf": q44_knn_ivf,
    "q50_embedding_neardup_gemm": q50_embedding_neardup_gemm,
    "q107_bm25_topk": q107_bm25_topk,
    "q108_quality_classifier": q108_quality_classifier,
    "q110_kmeans_assign": q110_kmeans_assign,
    "q112_semdedup": q112_semdedup,
    "q113_chunking": q113_chunking,
    "q114_pii_redaction": q114_pii_redaction,
    "q115_pmi_collocations": q115_pmi_collocations,
    "q116_wav_decode": q116_wav_decode,
    "q122_bloom_decontaminate": q122_bloom_decontaminate,
    "q123_image_dhash": q123_image_dhash,
    "q124_audio_frames": q124_audio_frames,
    "qd24_streaming_heavy_hitters": qd24_streaming_heavy_hitters,
    "qd25_streaming_hdr_quantiles": qd25_streaming_hdr_quantiles,
    "qd26_streaming_count_min": qd26_streaming_count_min,
    "q127_funnel": q127_funnel,
    "q128_cohort_retention": q128_cohort_retention,
    "q131_max_concurrency": q131_max_concurrency,
    "q133_scd2_intervals": q133_scd2_intervals,
    "q137_shortest_paths": q137_shortest_paths,
    "q138_kcore": q138_kcore,
    "q139_column_profile": q139_column_profile,
    "q141_interval_overlap_join": q141_interval_overlap_join,
    "q145_bigram_lm": q145_bigram_lm,
    "q148_harmonic_centrality": q148_harmonic_centrality,
    "q150_roc_auc": q150_roc_auc,
    "qd15_address_balances": qd15_address_balances,
    "qd16_cospend_entities": qd16_cospend_entities,
    "qd17_entity_summary": qd17_entity_summary,
    "qd18_stateful_sessions": qd18_stateful_sessions,
    "qd19_entity_relations": qd19_entity_relations,
    "qd20_incremental_clustering": qd20_incremental_clustering,
    "qd21_streaming_clustering": qd21_streaming_clustering,
    "q71_fuzzy_dedup": q71_fuzzy_dedup,
    "q46_embedding_neardup": q46_embedding_neardup,
    "q63_entity_clustering": q63_entity_clustering,
    "q98_sequence_packing": q98_sequence_packing,
    "q104_packed_segments": q104_packed_segments,
    "q48_shipping_priority": q48_shipping_priority,
    "q49_regional_revenue": q49_regional_revenue,
    "q57_forecast_revenue": q57_forecast_revenue,
    "q58_shipmode_priority": q58_shipmode_priority,
    "q60_large_orders": q60_large_orders,
    "q62_returned_items": q62_returned_items,
    "q64_min_cost_supplier": q64_min_cost_supplier,
    "q65_order_priority": q65_order_priority,
    "q66_order_distribution": q66_order_distribution,
    "q67_promo_revenue": q67_promo_revenue,
    "q68_supplier_counts": q68_supplier_counts,
    "q69_small_qty_revenue": q69_small_qty_revenue,
    "q70_idle_rich_customers": q70_idle_rich_customers,
    "q77_nation_volume": q77_nation_volume,
    "q78_market_share": q78_market_share,
    "q79_top_supplier": q79_top_supplier,
    "q80_disjunctive_predicates": q80_disjunctive_predicates,
    "q81_lone_late_supplier": q81_lone_late_supplier,
    "q88_product_profit": q88_product_profit,
    "q89_national_part_value": q89_national_part_value,
    "q90_dominant_suppliers": q90_dominant_suppliers,
    "q87_label_propagation": q87_label_propagation,
    "q39_knn_bruteforce": q39_knn_bruteforce,
    "q99_unigram_likelihood": q99_unigram_likelihood,
    "q100_boilerplate_ngrams": q100_boilerplate_ngrams,
    "q101_vocab_overlap": q101_vocab_overlap,
    "q102_netpbm_decode": q102_netpbm_decode,
    "q91_decontamination": q91_decontamination,
    "q92_repetition_quality": q92_repetition_quality,
    "q105_substring_dedup": q105_substring_dedup,
    "q106_bpe_encode": q106_bpe_encode,
    "qd22_fiat_conversion": qd22_fiat_conversion,
    "q02_range_scan": q02_range_scan,
    "q03_bucket_projection": q03_bucket_projection,
    "q04_prefix_key": q04_prefix_key,
    "q05_grouped_array": q05_grouped_array,
    "q06_summary_stats": q06_summary_stats,
    "q07_latest_per_group": q07_latest_per_group,
    "q08_top_k": q08_top_k,
    "q09_hwm_resume": q09_hwm_resume,
    "q10_hwm_cold_start": q10_hwm_cold_start,
    "q11_dedup_lww": q11_dedup_lww,
    "q12_linkage_join": q12_linkage_join,
    "q13_join_agg": q13_join_agg,
    "q14_asof_rates": q14_asof_rates,
    "q15_previous_day": q15_previous_day,
    "q16_reorg_lag": q16_reorg_lag,
    "q17_incremental_delta": q17_incremental_delta,
    "q18_address_render": q18_address_render,
    "q19_coinjoin": q19_coinjoin,
    "q20_hourly_window": q20_hourly_window,
    "q21_sessionize": q21_sessionize,
    "q22_topk_per_group": q22_topk_per_group,
    "q23_distinct_agg": q23_distinct_agg,
    "q24_rollup": q24_rollup,
    "q25_semi_anti": q25_semi_anti,
    "q26_scalar_funcs": q26_scalar_funcs,
    "q27_range_join": q27_range_join,
    "q28_salted_agg": q28_salted_agg,
    "q29_json_extract": q29_json_extract,
    "qd01_block_table": qd01_block_table,
    "qd02_transaction_table": qd02_transaction_table,
    "qd03_tx_prefix_table": qd03_tx_prefix_table,
    "qd04_block_transactions": qd04_block_transactions,
    "qd05_summary_statistics": qd05_summary_statistics,
    "qd06_rates_asof": qd06_rates_asof,
    "qd07_streaming_roundtrip": qd07_streaming_roundtrip,
    "qd08_utxo_linkage": qd08_utxo_linkage,
    "qd09_streaming_dedup": qd09_streaming_dedup,
    "qd10_streaming_curation": qd10_streaming_curation,
    "qd12_streaming_ann": qd12_streaming_ann,
    "qd13_taint_trace": qd13_taint_trace,
    "qd14_stream_stream_join": qd14_stream_stream_join,
    "qd11_unnest_roundtrip": qd11_unnest_roundtrip,
    "q30_dedup_exact": q30_dedup_exact,
    "q31_text_stats": q31_text_stats,
    "q32_quality_score": q32_quality_score,
    "q33_language_id": q33_language_id,
    "q34_doc_fingerprint": q34_doc_fingerprint,
    "q35_minhash_signatures": q35_minhash_signatures,
    "q36_lsh_pairs": q36_lsh_pairs,
}


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

# Shared text-normalization pipeline (mirror of operators/textops.py):
# norm → whitespace tokens → distinct word trigrams → 28-bit md5 hashes.
_TEXT_CTE = r"""
norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           ELSE [] END AS gs
    FROM tok
),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               gs, g -> ('0x' || substr(md5(g), 1, 7))::BIGINT)) AS hs
    FROM grams
)
"""


def _minhash_sig_select() -> str:
    cols = []
    for i, (a, b) in enumerate(MINHASH_COEFFS):
        cols.append(
            f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_PRIME}))"
            f" AS mh{i}"
        )
    return ",\n           ".join(cols)


_SIGS_CTE = (
    _TEXT_CTE
    + f""",
sigs AS (
    SELECT doc_id,
           {_minhash_sig_select()}
    FROM sh WHERE len(hs) > 0
)
"""
)


def _bands_sql() -> str:
    n_bands = MINHASH_PERMS // LSH_BAND_ROWS
    selects = []
    for band in range(n_bands):
        parts = " || '_' || ".join(
            f"mh{band * LSH_BAND_ROWS + r}::VARCHAR" for r in range(LSH_BAND_ROWS)
        )
        selects.append(
            f"SELECT doc_id, {band} AS band, {parts} AS key FROM sigs"
        )
    return "\nUNION ALL\n".join(selects)


def _simhash_sql() -> str:
    bit_terms = []
    for j in range(32):
        s = (
            f"list_sum(list_transform(th, h -> CASE WHEN (h >> {j}) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bit_terms.append(
            f"CASE WHEN {s} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
        )
    total = " + ".join(bit_terms)
    return rf"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
th_t AS (
    SELECT doc_id,
           list_transform(toks, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS th
    FROM tok
)
SELECT doc_id, {total} AS simhash FROM th_t
"""


def _dot64(a: str, b: str) -> str:
    """Unrolled 64-term dot product — left-associated additions match
    Spark's sequential aggregate fold bit-for-bit."""
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, 65))


def _distsq64(a: str, b: str) -> str:
    """Unrolled 64-term squared-L2 — left-associated additions match
    the Spark `dist_sq` fold (clustering.py) bit-for-bit."""
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, 65)
    )


def _kmeans_assign_sql(k: int = 10) -> str:
    """Mirror of operators.clustering.kmeans_assign with the
    deterministic smallest-id seed centroids: identical fold order,
    identical (dist asc, cid asc) argmin tie-break."""
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {k}),
d AS (
    SELECT a.vec_id, c.cid, ({_distsq64('a.e', 'c.ce')}) AS dist_sq
    FROM v a CROSS JOIN c
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dist_sq
FROM d
QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY dist_sq ASC, cid ASC) = 1
"""


def _louvain_sql(sub_rounds: int = 3, levels: int = 2) -> str:
    """Mirror of operators.graph.louvain over the q157 edge frame,
    unrolled one CTE block per (level, sub-round) — the kmeans/k-truss
    unroll discipline (VERDICT r8 item 5, upgrading q160 from
    rows-only to cell-exact). Every piece is already integer-exact
    and deterministic in the engine (2m-scaled gains, stay-biased
    total tie-breaks, parity-alternating moves), so the SQL replays
    it literally: per sub-round one Σtot aggregate, one
    parity-filtered neighbor-label aggregate, one stay-candidate
    union, and the argmax as row_number over (score DESC, is_cur
    DESC, cj ASC); per level one min-member canonicalization and one
    contraction aggregate. MATERIALIZED stops DuckDB re-inlining the
    multiply-referenced per-round frames."""
    parts = [
        r"""
WITH eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
und_0 AS MATERIALIZED (
    SELECT least(src, dst) AS a, greatest(src, dst) AS b,
           CAST(count(*) AS BIGINT) AS w
    FROM eraw GROUP BY 1, 2
),
mm AS MATERIALIZED (SELECT CAST(sum(2 * w) AS BIGINT) AS m FROM und_0)"""
    ]
    for lvl in range(levels):
        u = f"und_{lvl}"
        parts.append(
            f""",
adj_{lvl} AS MATERIALIZED (
    SELECT a AS i, b AS j, w FROM {u} WHERE a <> b
    UNION ALL
    SELECT b AS i, a AS j, w FROM {u} WHERE a <> b
),
selfw_{lvl} AS (
    SELECT a AS i, w AS ws FROM {u} WHERE a = b
),
nodes_{lvl} AS MATERIALIZED (
    SELECT DISTINCT i
    FROM (SELECT a AS i FROM {u} UNION ALL SELECT b FROM {u})
),
k_{lvl} AS MATERIALIZED (
    SELECT n.i,
           CAST(coalesce(s._s, 0) + 2 * coalesce(sw.ws, 0) AS BIGINT) AS k
    FROM nodes_{lvl} n
    LEFT JOIN (SELECT i, sum(w) AS _s FROM adj_{lvl} GROUP BY i) s
        ON n.i = s.i
    LEFT JOIN selfw_{lvl} sw ON n.i = sw.i
),
lab_{lvl}_0 AS MATERIALIZED (SELECT i, i AS comm FROM nodes_{lvl})"""
        )
        for r in range(sub_rounds):
            L = f"lab_{lvl}_{r}"
            parts.append(
                f""",
sig_{lvl}_{r} AS (
    SELECT l.comm, CAST(sum(k.k) AS BIGINT) AS sig
    FROM {L} l JOIN k_{lvl} k ON l.i = k.i GROUP BY l.comm
),
cand_{lvl}_{r} AS MATERIALIZED (
    SELECT i, cj, CAST(max(kc) AS BIGINT) AS kc FROM (
        SELECT a.i, l.comm AS cj, CAST(sum(a.w) AS BIGINT) AS kc
        FROM adj_{lvl} a JOIN {L} l ON a.j = l.i
        WHERE a.i % 2 = {r % 2}
        GROUP BY a.i, l.comm
        UNION ALL
        SELECT i, comm AS cj, CAST(0 AS BIGINT) AS kc
        FROM {L} WHERE i % 2 = {r % 2}
    ) GROUP BY i, cj
),
moved_{lvl}_{r} AS MATERIALIZED (
    SELECT i, cj AS comm FROM (
        SELECT c.i, c.cj,
               row_number() OVER (PARTITION BY c.i ORDER BY
                   (2 * mm.m * c.kc - k.k * (s.sig -
                        CASE WHEN c.cj = cur.comm THEN k.k
                             ELSE 0 END)) DESC,
                   CASE WHEN c.cj = cur.comm THEN 1 ELSE 0 END DESC,
                   c.cj ASC) AS rn
        FROM cand_{lvl}_{r} c
        JOIN {L} cur ON c.i = cur.i
        JOIN k_{lvl} k ON c.i = k.i
        JOIN sig_{lvl}_{r} s ON c.cj = s.comm
        CROSS JOIN mm
    ) WHERE rn = 1
),
lab_{lvl}_{r + 1} AS MATERIALIZED (
    SELECT l.i, coalesce(mv.comm, l.comm) AS comm
    FROM {L} l LEFT JOIN moved_{lvl}_{r} mv ON l.i = mv.i
)"""
            )
        LF = f"lab_{lvl}_{sub_rounds}"
        parts.append(
            f""",
res_{lvl} AS MATERIALIZED (
    SELECT l.i AS node, c.canon AS comm
    FROM {LF} l
    JOIN (SELECT comm, min(i) AS canon FROM {LF} GROUP BY comm) c
      ON l.comm = c.comm
)"""
        )
        if lvl == 0:
            parts.append(
                """,
map_0 AS MATERIALIZED (SELECT node, comm AS community FROM res_0)"""
            )
        else:
            parts.append(
                f""",
map_{lvl} AS MATERIALIZED (
    SELECT m.node, r.comm AS community
    FROM map_{lvl - 1} m JOIN res_{lvl} r ON m.community = r.node
)"""
            )
        if lvl < levels - 1:
            parts.append(
                f""",
und_{lvl + 1} AS MATERIALIZED (
    SELECT least(ra.comm, rb.comm) AS a,
           greatest(ra.comm, rb.comm) AS b,
           CAST(sum(u.w) AS BIGINT) AS w
    FROM und_{lvl} u
    JOIN res_{lvl} ra ON u.a = ra.node
    JOIN res_{lvl} rb ON u.b = rb.node
    GROUP BY 1, 2
)"""
            )
    parts.append(
        f"""
SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node,
       CAST(max(node) AS BIGINT) AS max_node
FROM map_{levels - 1} GROUP BY community
"""
    )
    return "".join(parts)


def _bpe_train_sql(n_merges: int = 8) -> str:
    """Mirror of operators.tokenizer.bpe_train, unrolled one CTE
    block per merge round (the kmeans/k-truss unroll discipline —
    VERDICT r8 item 5, upgrading q140 from rows-only to cell-exact):
    same normalize/tokenize pipeline, overlapping pair counts as a
    lead() aggregate, argmax via ORDER BY (count DESC, pair ASC)
    LIMIT 1, and the greedy left-to-right non-overlapping merge
    application expressed positionally — fuse_i = cand_i AND NOT
    fuse_{i-1} collapses to odd-rank positions within each
    gaps-and-islands run of consecutive candidates (adjacent
    candidates only arise when left = right), then kept positions
    renumber for the next round. MATERIALIZED blocks stop DuckDB
    from inlining each round's CTE into its 3 consumers (3^8 scan
    blowup otherwise). Integer counts throughout — cell-exact."""
    parts = [
        r"""
WITH norm AS (
    SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
w AS (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(list_filter(string_split(s, ' '), t -> t <> ''))
                 AS word
          FROM norm)
    GROUP BY word
),
pos0 AS (
    SELECT row_number() OVER (ORDER BY word) AS wid, cnt,
           unnest(range(1, len(string_split(word, '')) + 1)) AS i,
           unnest(string_split(word, '')) AS sym
    FROM w
)"""
    ]
    for t in range(1, n_merges + 1):
        parts.append(
            f""",
adj{t} AS MATERIALIZED (
    SELECT wid, cnt, i, sym,
           lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt
    FROM pos{t - 1}
),
b{t} AS MATERIALIZED (
    SELECT sym AS l, nxt AS r, CAST(sum(cnt) AS BIGINT) AS pc
    FROM adj{t} WHERE nxt IS NOT NULL
    GROUP BY 1, 2
    ORDER BY pc DESC, l ASC, r ASC LIMIT 1
),
cand{t} AS (
    SELECT a.wid, a.i,
           a.i - row_number() OVER (PARTITION BY a.wid ORDER BY a.i) AS grp
    FROM adj{t} a, b{t} b
    WHERE a.sym = b.l AND a.nxt = b.r
),
fuse{t} AS MATERIALIZED (
    SELECT wid, i FROM (
        SELECT wid, i,
               row_number() OVER (PARTITION BY wid, grp ORDER BY i) AS rn
        FROM cand{t})
    WHERE rn % 2 = 1
),
pos{t} AS MATERIALIZED (
    SELECT a.wid, a.cnt,
           row_number() OVER (PARTITION BY a.wid ORDER BY a.i) AS i,
           CASE WHEN f.i IS NOT NULL THEN a.sym || a.nxt ELSE a.sym END AS sym
    FROM adj{t} a
    LEFT JOIN fuse{t} f ON a.wid = f.wid AND a.i = f.i
    LEFT JOIN fuse{t} g ON a.wid = g.wid AND a.i = g.i + 1
    WHERE g.i IS NULL
)"""
        )
    finals = "\nUNION ALL ".join(
        f'SELECT CAST({t - 1} AS BIGINT) AS rank, l AS "left", r AS "right", '
        f"pc AS pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    )
    parts.append("\n" + finals)
    return "".join(parts)


def _kmeans_quantized_sql(
    k: int = 10, dim: int = 64, iters: int = 5, scale: int = 1_000_000
) -> str:
    """Mirror of operators.clustering.kmeans_lloyd_quantized: the
    same quantize-once int64 coordinates, (dist asc, cid asc) argmin
    tie-break, truncated-integer-mean M-step (// ≡ Spark DIV on
    negatives), and empty-cluster carry — unrolled as one CTE pair
    per Lloyd iteration."""
    parts = [
        f"""
WITH v AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
               AS e
    FROM embeddings
),
c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {k})"""
    ]
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        " i -> (a.e[i] - c.ce[i]) * (a.e[i] - c.ce[i])))"
    )
    for t in range(1, iters + 1):
        parts.append(
            f""",
a{t} AS (
    SELECT a.vec_id, a.e, c.cid
    FROM v a CROSS JOIN c{t - 1} c
    QUALIFY row_number() OVER (
        PARTITION BY a.vec_id ORDER BY {dist} ASC, c.cid ASC) = 1
),
u{t} AS (
    SELECT cid, ii.i AS i, e[ii.i] AS x
    FROM a{t}, (SELECT unnest(range(1, {dim + 1})) AS i) ii
),
m{t} AS (
    SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS ce
    FROM (SELECT cid, i, sum(x) AS s, count(*) AS n
          FROM u{t} GROUP BY 1, 2)
    GROUP BY 1
),
c{t} AS (
    SELECT p.cid, coalesce(m{t}.ce, p.ce) AS ce
    FROM c{t - 1} p LEFT JOIN m{t} ON p.cid = m{t}.cid
)"""
        )
    parts.append(
        f"""
SELECT a.vec_id, CAST(c.cid AS BIGINT) AS cluster_id,
       CAST({dist} AS BIGINT) AS dist_sq
FROM v a CROSS JOIN c{iters} c
QUALIFY row_number() OVER (
    PARTITION BY a.vec_id ORDER BY {dist} ASC, c.cid ASC) = 1
"""
    )
    return "".join(parts)


def _semdedup_sql(k: int = 10, threshold: float = 0.35) -> str:
    """Mirror of operators.clustering.semdedup: deterministic E-step
    assignment, unit-vector normalize-then-fold cosine on same-cluster
    (smaller-id, larger-id) pairs, drop the larger id at
    cos >= threshold."""
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {k}),
d AS (
    SELECT a.vec_id, c.cid, ({_distsq64('a.e', 'c.ce')}) AS dist_sq
    FROM v a CROSS JOIN c
),
asg AS (
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
    FROM d
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY dist_sq ASC, cid ASC) = 1
),
n AS (
    SELECT vec_id,
           list_transform(e, x -> x / sqrt({_dot64('e', 'e')})) AS u
    FROM v
),
m AS (SELECT n.vec_id, u, cluster_id FROM n JOIN asg USING (vec_id)),
dropped AS (
    SELECT DISTINCT a.vec_id
    FROM m a JOIN m b
      ON a.cluster_id = b.cluster_id AND b.vec_id < a.vec_id
    WHERE ({_dot64('a.u', 'b.u')}) >= {threshold!r}
)
SELECT asg.vec_id, cluster_id,
       (dropped.vec_id IS NULL) AS keep
FROM asg LEFT JOIN dropped ON asg.vec_id = dropped.vec_id
"""


def _knn_bruteforce_sql(k: int = 3) -> str:
    # Mirrors the normalize-first Spark plan exactly: unit vectors
    # (each component divided by the sequential-fold L2 norm), then a
    # left-associated 64-term dot product — bit-identical IEEE ops.
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
n AS (
    SELECT vec_id,
           list_transform(e, x -> x / sqrt({_dot64('e', 'e')})) AS u
    FROM v
),
scored AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           ({_dot64('a.u', 'b.u')}) AS cos_sim
    FROM n a CROSS JOIN n b
    WHERE a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id,
       CAST(row_number() OVER (
           PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id ASC
       ) AS INTEGER) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {k}
"""


def _plane_dot(e: str, plane: list[float]) -> str:
    """Unrolled raw-double dot against hyperplane literals; left-assoc
    additions ≡ Spark's sequential `lsh_bucket` fold (a leading +0.0
    is an IEEE no-op). Float literals via repr() round-trip exactly."""
    return " + ".join(f"{e}[{i + 1}] * ({plane[i]!r})" for i in range(len(plane)))


def _neardup_sql(
    threshold: float = 0.35, n_bands: int = 4, band_planes: int = 4, dim: int = 64
) -> str:
    """Mirror of operators.similarity.embedding_neardup: same seeded
    hyperplanes, same band/bucket construction (bit j set iff the raw
    double dot with plane j of the band is > 0), same unit-vector
    normalize-then-fold cosine — bit-identical pairs and values."""
    from graphsense_blocksci_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_bands * band_planes, seed=42)
    band_rows = []
    for t in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN ({_plane_dot('e', planes[t * band_planes + j])}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(band_planes)
        )
        band_rows.append(
            f"SELECT vec_id, {t} AS band, CAST({bits} AS BIGINT) AS bucket FROM n"
        )
    bands_union = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
n AS (
    SELECT vec_id, e, list_transform(e, x -> x / sqrt({_dot64('e', 'e')})) AS u
    FROM v
),
bkt AS (
{bands_union}
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM bkt a
    JOIN bkt b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b, ({_dot64('x.u', 'y.u')}) AS cos_sim
FROM cand c
JOIN n x ON x.vec_id = c.id_a
JOIN n y ON y.vec_id = c.id_b
WHERE ({_dot64('x.u', 'y.u')}) >= {threshold!r}
"""


def _stream_ann_sql(
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 2,
    seed: int = 42,
    multiprobe: int = 1,
    dim: int = 64,
) -> str:
    """Mirror of streaming/ann.py (== batch cosine_topk_lsh semantics):
    per-table seeded hyperplanes, sign-pattern buckets, Hamming-1
    multi-probes on the query side only, fold cosines on unit vectors,
    ranked top-k with the (cos_sim DESC, neighbor_id ASC) tie-break —
    bit-identical to the streamed result."""
    from graphsense_blocksci_spark.operators.similarity import hyperplanes

    idx_rows = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        bits = " + ".join(
            f"(CASE WHEN ({_plane_dot('e', planes[j])}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        idx_rows.append(
            f"SELECT vec_id, {t} AS tbl, CAST({bits} AS BIGINT) AS bucket, u FROM n"
        )
    idx_union = "\nUNION ALL\n".join(idx_rows)
    probe_rows = ["SELECT vec_id, tbl, bucket, u FROM idx"]
    for j in range(multiprobe):
        probe_rows.append(
            f"SELECT vec_id, tbl, xor(bucket, {1 << j}) AS bucket, u FROM idx"
        )
    probe_union = "\nUNION ALL\n".join(probe_rows)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
n AS (
    SELECT vec_id, e, list_transform(e, x -> x / sqrt({_dot64('e', 'e')})) AS u
    FROM v
),
idx AS (
{idx_union}
),
probes AS (
{probe_union}
),
cand AS (
    SELECT DISTINCT q.vec_id AS vec_id, i.vec_id AS neighbor_id
    FROM probes q
    JOIN idx i ON q.tbl = i.tbl AND q.bucket = i.bucket
              AND q.vec_id <> i.vec_id
)
SELECT c.vec_id AS vec_id, c.neighbor_id AS neighbor_id,
       CAST(row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY ({_dot64('x.u', 'y.u')}) DESC, c.neighbor_id ASC
       ) AS INTEGER) AS rank,
       ({_dot64('x.u', 'y.u')}) AS cos_sim
FROM cand c
JOIN n x ON x.vec_id = c.vec_id
JOIN n y ON y.vec_id = c.neighbor_id
QUALIFY rank <= {k}
"""


_ADDR_CASE = " ".join(
    f"WHEN type_name = '{name}' THEN {code}" for name, code in ADDRESS_TYPES.items()
)


ORACLE_SQL: dict[str, str] = {
    "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "q02_range_scan": """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 5000
""",
    "q03_bucket_projection": """
SELECT CAST(floor(o_orderkey / 100) AS BIGINT) AS key_group,
       o_orderkey, o_totalprice
FROM orders
""",
    "q04_prefix_key": """
SELECT c_custkey, substr(md5(c_name), 1, 5) AS prefix FROM customer
""",
    "q05_grouped_array": """
SELECT l_orderkey,
       string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS linenumbers_csv,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
""",
    "q06_summary_stats": """
SELECT CAST(max(o_orderkey) + 1 AS BIGINT) AS next_key,
       count(*) AS no_orders,
       arg_max(o_orderdate, o_orderkey) AS latest_date
FROM orders
""",
    "q07_latest_per_group": """
SELECT user_id, event_id, ts, event_type FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
""",
    "q08_top_k": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    "q09_hwm_resume": """
SELECT event_id, user_id, event_type, value FROM events
WHERE event_id > (SELECT max(event_id) FROM events WHERE event_id <= 5000)
""",
    "q10_hwm_cold_start": """
SELECT event_id, user_id FROM events
""",
    "q11_dedup_lww": """
SELECT user_id, event_type, event_id, value FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
""",
    "q12_linkage_join": """
SELECT a.l_orderkey AS spent_tx_id,
       CAST(a.l_linenumber AS BIGINT) AS spent_index,
       a.l_suppkey,
       CAST(round(b.l_extendedprice * 100) AS BIGINT) AS value
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
""",
    "q13_join_agg": """
SELECT n_name, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "q14_asof_rates": """
WITH rates AS (
    SELECT date_trunc('day', ts) AS day, max(value) AS rate
    FROM events
    WHERE extract(day FROM ts) % 2 = 1
    GROUP BY 1
)
SELECT e.event_id, e.ts, r.rate
FROM events e ASOF LEFT JOIN rates r ON e.ts >= r.day
""",
    "q15_previous_day": f"""
SELECT event_id, ts, user_id FROM events WHERE ts < {PIN_CUTOFF_SQL}
""",
    "q16_reorg_lag": """
SELECT event_id, user_id, event_type FROM events
WHERE event_id <= (SELECT max(event_id) - 6 FROM events)
""",
    "q17_incremental_delta": f"""
SELECT event_id, ts, user_id FROM events
WHERE event_id <= (SELECT max(event_id) - 6 FROM events)
  AND ts < {PIN_CUTOFF_SQL}
  AND event_id > (SELECT max(event_id) FROM events WHERE event_id <= 3000)
""",
    "q18_address_render": f"""
WITH typed AS (
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           (['{"','".join(_ADDR_NAMES)}'])[(n_nationkey % 10) + 1] AS type_name
    FROM nation
),
coded AS (
    SELECT *, CASE {_ADDR_CASE} ELSE NULL END AS code FROM typed
)
SELECT n_nationkey, type_name, CAST(code AS BIGINT) AS type_code,
       CASE WHEN code = 6 THEN n_name || ',' || 'ms2'
            WHEN code IN (1, 7, 10) THEN NULL
            ELSE n_name END AS rendered_csv
FROM coded
""",
    "q19_coinjoin": """
WITH per_val AS (
    SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS v, count(*) AS c
    FROM lineitem GROUP BY 1, 2
),
agg1 AS (
    SELECT l_orderkey, CAST(sum(c) AS BIGINT) AS n, CAST(max(c) AS BIGINT) AS maxc
    FROM per_val GROUP BY 1
),
dust AS (
    SELECT p.l_orderkey,
           bool_or(p.c = a.maxc AND p.v IN (546, 2730)) AS is_dust
    FROM per_val p JOIN agg1 a USING (l_orderkey) GROUP BY 1
),
addr AS (
    SELECT l_orderkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS na
    FROM lineitem GROUP BY 1
)
SELECT a.l_orderkey,
       (a.n >= 2 AND a.n >= 3
        AND ((a.n + 1) // 2) <= a.n
        AND ((a.n + 1) // 2) <= d2.na
        AND a.maxc = ((a.n + 1) // 2)
        AND NOT d.is_dust) AS coinjoin
FROM agg1 a JOIN dust d USING (l_orderkey) JOIN addr d2 USING (l_orderkey)
""",
    "q20_hourly_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, max(value) AS max_value
FROM events GROUP BY 1, 2
""",
    "q21_sessionize": """
WITH lagged AS (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) > 1800
                THEN 1 ELSE 0 END AS ns
    FROM lagged
),
sess AS (
    SELECT user_id, ts,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY 1, 2
""",
    "q22_topk_per_group": """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
       ) AS BIGINT) AS rn
FROM orders QUALIFY rn <= 3
""",
    "q23_distinct_agg": """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_lines
FROM lineitem GROUP BY 1
""",
    "q24_rollup": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "q25_semi_anti": """
WITH w AS (
    SELECT c_nationkey, count(*) AS n_with_orders FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
),
wo AS (
    SELECT c_nationkey, count(*) AS n_without_orders FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
)
SELECT CAST(coalesce(w.c_nationkey, wo.c_nationkey) AS BIGINT) AS c_nationkey,
       coalesce(n_with_orders, 0) AS n_with_orders,
       coalesce(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
""",
    "q26_scalar_funcs": """
SELECT o_orderkey,
       md5(o_orderstatus) AS hex_roundtrip,
       substr(o_orderpriority, 1, 1) || '-' || o_orderstatus AS prio_code,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(extract(day FROM o_orderdate) AS BIGINT) AS order_dom,
       CAST(floor(o_orderkey / 7) AS BIGINT) AS key_div7,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
FROM orders
""",
    "q29_json_extract": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(props->>'k' AS BIGINT)) AS max_k,
       count(*) FILTER (props->>'k' IS NULL) AS n_null_k
FROM events GROUP BY 1
""",
    "q28_salted_agg": """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(l_orderkey) AS max_key
FROM lineitem GROUP BY 1
""",
    "q27_range_join": """
WITH w AS (
    SELECT date_trunc('day', ts) AS w_start,
           date_trunc('day', ts) + INTERVAL 6 HOUR AS w_end
    FROM events GROUP BY 1
)
SELECT CAST(w.w_start AS TIMESTAMP) AS w_start, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1
""",
    "qd01_block_table": f"""
SELECT CAST(floor(block_id / 100) AS BIGINT) AS block_id_group,
       CAST(block_id AS BIGINT) AS block_id,
       lower(hex(block_hash)) AS block_hash_hex,
       CAST(timestamp AS BIGINT) AS timestamp,
       CAST(no_transactions AS BIGINT) AS no_transactions
FROM read_parquet('{_FIXTURE_DIR}/raw_blocks.parquet')
""",
    "qd02_transaction_table": f"""
WITH t AS (
    SELECT *,
           list_transform(outputs, x -> x.value) AS ov,
           coalesce(len(inputs), 0) AS n_in,
           coalesce(len(outputs), 0) AS n_out,
           (coalesce(len(outputs), 0) + 1) // 2 AS part,
           len(list_distinct(list_transform(inputs,
               x -> x.address_type::VARCHAR || '#'
                    || coalesce(array_to_string(x.address, '|'), '<null>'))))
               AS n_ident
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
m AS (
    SELECT *,
           list_max(list_transform(ov,
               v -> len(list_filter(ov, y -> y = v)))) AS maxc
    FROM t
)
SELECT CAST(floor(tx_id / 25000) AS BIGINT) AS tx_id_group,
       tx_id,
       lower(hex(tx_hash)) AS tx_hash_hex,
       CAST(block_id AS BIGINT) AS block_id,
       CAST(timestamp AS BIGINT) AS timestamp,
       coinbase,
       CAST(coalesce(list_sum(list_transform(inputs, x -> x.value)), 0) AS BIGINT) AS total_input,
       CAST(coalesce(list_sum(ov), 0) AS BIGINT) AS total_output,
       CAST(n_in AS BIGINT) AS no_inputs,
       CAST(n_out AS BIGINT) AS no_outputs,
       (n_in >= 2 AND n_out >= 3 AND part <= n_in AND part <= n_ident
        AND maxc = part
        AND NOT len(list_filter(ov,
                v -> len(list_filter(ov, y -> y = v)) = maxc
                     AND v IN (546, 2730))) > 0) AS coinjoin
FROM m
""",
    "qd03_tx_prefix_table": f"""
SELECT substr(lower(hex(tx_hash)), 1, 5) AS tx_prefix,
       lower(hex(tx_hash)) AS tx_hash_hex,
       tx_id
FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
QUALIFY row_number() OVER (PARTITION BY tx_hash ORDER BY tx_id DESC) = 1
""",
    "qd04_block_transactions": f"""
SELECT CAST(floor(block_id / 100) AS BIGINT) AS block_id_group,
       CAST(block_id AS BIGINT) AS block_id,
       string_agg(tx_id::VARCHAR, ',' ORDER BY tx_id) AS tx_ids_csv,
       count(*) AS no_txs,
       CAST(sum(coalesce(list_sum(list_transform(outputs, x -> x.value)), 0))
            AS BIGINT) AS block_total_output
FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
GROUP BY 1, 2
""",
    "qd05_summary_statistics": f"""
SELECT 'btc' AS id,
       (SELECT CAST(max(block_id) + 1 AS BIGINT)
        FROM read_parquet('{_FIXTURE_DIR}/raw_blocks.parquet')) AS no_blocks,
       (SELECT CAST(max(tx_id) + 1 AS BIGINT)
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')) AS no_txs,
       (SELECT CAST(arg_max(timestamp, block_id) AS BIGINT)
        FROM read_parquet('{_FIXTURE_DIR}/raw_blocks.parquet')) AS timestamp
""",
    "qd06_rates_asof": f"""
WITH txs AS (
    SELECT tx_id,
           CAST(to_timestamp(CAST(timestamp AS BIGINT)) AS DATE) AS tx_date
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
rates AS (
    SELECT CAST(date AS DATE) AS rate_date,
           fiat_values['USD'][1] AS usd,
           CAST(cardinality(fiat_values) AS BIGINT) AS n_currencies
    FROM read_parquet('{_FIXTURE_DIR}/raw_exchange_rates.parquet')
)
SELECT t.tx_id, CAST(r.usd AS DOUBLE) AS usd, r.n_currencies
FROM txs t ASOF LEFT JOIN rates r ON t.tx_date >= r.rate_date
""",
    "q45_curation_pipeline": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
keepers AS (
    SELECT min(doc_id) AS doc_id, count(*) AS n_dups
    FROM norm GROUP BY md5(s)
),
stats AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS mtl,
           CASE WHEN len(toks) > 0 THEN
               CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS ttr
    FROM tok
),
quality AS (
    SELECT doc_id, n_tokens FROM stats
    WHERE n_tokens >= 5 AND n_tokens <= 100000
      AND mtl >= 2.0 AND mtl <= 12.0 AND ttr >= 0.1
),
scores AS (
    SELECT doc_id,
        CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','zu','ist','ein'], t))) AS BIGINT) AS s_de,
        CAST(len(list_filter(toks, t -> list_contains(['el','la','y','los','que','es','un'], t))) AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','est','un'], t))) AS BIGINT) AS s_fr
    FROM tok
),
lang AS (
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scores
)
SELECT l.lang_pred, count(*) AS n_docs,
       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(k.n_dups) AS BIGINT) AS dups_absorbed
FROM keepers k
JOIN quality q USING (doc_id)
JOIN lang l USING (doc_id)
WHERE l.lang_pred IN ('en', 'und')
GROUP BY 1
""",
    "qd14_stream_stream_join": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate - INTERVAL 2500 DAY
  AND l_shipdate <= o_orderdate + INTERVAL 2500 DAY
""",
    "qd13_taint_trace": f"""
WITH RECURSIVE ins AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> inputs[i].spent_tx_id)) AS stx
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
edges AS (
    SELECT DISTINCT stx AS src, tx_id AS dst FROM ins
),
seeds AS (
    SELECT tx_id FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE coinbase AND block_id < 10
),
walk(node, hops) AS (
    SELECT tx_id, 0 FROM seeds
    UNION
    SELECT e.dst, w.hops + 1
    FROM edges e JOIN walk w ON e.src = w.node
    WHERE w.hops < 4
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(hops) AS BIGINT) AS hops
FROM walk GROUP BY node
""",
    "qd08_utxo_linkage": f"""
WITH ins AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{ii: i - 1,
                      stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index,
                      cval: inputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
i2 AS (
    SELECT tx_id, CAST(u.ii AS BIGINT) AS input_index,
           u.stx AS spent_tx_id, CAST(u.sidx AS BIGINT) AS spent_index,
           u.cval AS claimed_value
    FROM ins
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1, oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS output_index, u.oval AS resolved_value
    FROM outs
)
SELECT i2.tx_id, i2.input_index, i2.spent_tx_id, i2.spent_index,
       i2.claimed_value, o2.resolved_value,
       (i2.claimed_value = o2.resolved_value) AS value_matches
FROM i2 LEFT JOIN o2
  ON i2.spent_tx_id = o2.otx AND i2.spent_index = o2.output_index
""",
    "qd07_streaming_roundtrip": f"""
SELECT CAST(floor(tx_id / 25000) AS BIGINT) AS tx_id_group,
       tx_id,
       lower(hex(tx_hash)) AS tx_hash_hex,
       CAST(block_id AS BIGINT) AS block_id,
       coinbase,
       CAST(coalesce(list_sum(list_transform(inputs, x -> x.value)), 0) AS BIGINT) AS total_input,
       CAST(coalesce(list_sum(list_transform(outputs, x -> x.value)), 0) AS BIGINT) AS total_output
FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
""",
    "qd09_streaming_dedup": r"""
SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
FROM documents
""",
    "qd11_unnest_roundtrip": f"""
SELECT CAST(block_id AS BIGINT) AS block_id, 
       CAST(row_number() OVER (PARTITION BY block_id ORDER BY tx_id) - 1 AS BIGINT)
           AS pos,
       tx_id,
       CAST(coalesce(len(inputs), 0) AS BIGINT) AS no_inputs,
       CAST(coalesce(len(outputs), 0) AS BIGINT) AS no_outputs,
       CAST(coalesce(list_sum(list_transform(inputs, x -> x.value)), 0) AS BIGINT)
           AS total_input,
       CAST(coalesce(list_sum(list_transform(outputs, x -> x.value)), 0) AS BIGINT)
           AS total_output
FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
""",
    "qd10_streaming_curation": r"""
WITH norm AS (
    SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT s, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
stats AS (
    SELECT s, toks,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS mtl,
           CASE WHEN len(toks) > 0 THEN
               CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS ttr
    FROM tok
),
quality AS (
    SELECT s, toks, n_tokens FROM stats
    WHERE n_tokens >= 5 AND n_tokens <= 100000
      AND mtl >= 2.0 AND mtl <= 12.0 AND ttr >= 0.1
),
lang AS (
    SELECT s, n_tokens,
        CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','zu','ist','ein'], t))) AS BIGINT) AS s_de,
        CAST(len(list_filter(toks, t -> list_contains(['el','la','y','los','que','es','un'], t))) AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','est','un'], t))) AS BIGINT) AS s_fr
    FROM quality
),
pred AS (
    SELECT n_tokens,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM lang
)
SELECT lang_pred, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM pred
WHERE lang_pred IN ('en', 'und')
GROUP BY 1
""",
    "q30_dedup_exact": r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
    "q31_text_stats": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, length(s) AS n_chars_norm,
           list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       CAST(n_chars_norm AS BIGINT) AS n_chars_norm,
       CASE WHEN len(toks) > 0 THEN
           CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) END AS mean_token_len,
       CASE WHEN len(toks) > 0 THEN
           CAST(len(list_distinct(toks)) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) END AS type_token_ratio
FROM tok
""",
    "q32_quality_score": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
stats AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS mtl,
           CASE WHEN len(toks) > 0 THEN
               CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS ttr
    FROM tok
)
SELECT doc_id, n_tokens, ttr AS type_token_ratio,
       (n_tokens >= 5 AND n_tokens <= 100000
        AND mtl >= 2.0 AND mtl <= 12.0 AND ttr >= 0.1) AS quality_ok
FROM stats
""",
    "q33_language_id": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
scores AS (
    SELECT doc_id,
        CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, t -> list_contains(['der','die','das','und','zu','ist','ein'], t))) AS BIGINT) AS s_de,
        CAST(len(list_filter(toks, t -> list_contains(['el','la','y','los','que','es','un'], t))) AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','est','un'], t))) AS BIGINT) AS s_fr
    FROM tok
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
            WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred,
       greatest(s_en, s_de, s_es, s_fr) AS score
FROM scores
""",
    "q34_doc_fingerprint": "WITH "
    + _TEXT_CTE
    + """
SELECT doc_id,
       array_to_string(list_transform(list_sort(hs)[1:4], x -> x::VARCHAR), ',')
           AS fingerprint,
       CAST(len(hs) AS BIGINT) AS n_shingles
FROM sh
""",
    "q85_range_frame": """
SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
       count(*) OVER w AS n_24h,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS mills_24h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
""",
    "q86_grouping_sets": """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    # q87: the oracle unrolls the SAME 3 synchronized LPA rounds the
    # operator runs — deterministic tie-break makes this hash-exact.
    "q87_label_propagation": """
WITH g0 AS (
    SELECT DISTINCT l_orderkey AS g, l_suppkey AS node
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
),
chain AS (
    SELECT g, node AS src,
           lead(node) OVER (PARTITION BY g ORDER BY node) AS dst
    FROM g0
),
edges AS (
    SELECT src AS u, dst AS v FROM chain WHERE dst IS NOT NULL
    UNION
    SELECT dst AS u, src AS v FROM chain WHERE dst IS NOT NULL
),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),
f1 AS (
    SELECT e.u, l.label, count(*) AS c
    FROM edges e JOIN l0 l ON e.v = l.node
    GROUP BY e.u, l.label
),
l1 AS (
    SELECT u AS node, label FROM (
        SELECT u, label,
               row_number() OVER (PARTITION BY u ORDER BY c DESC, label ASC)
                   AS rn
        FROM f1
    ) WHERE rn = 1
),
f2 AS (
    SELECT e.u, l.label, count(*) AS c
    FROM edges e JOIN l1 l ON e.v = l.node
    GROUP BY e.u, l.label
),
l2 AS (
    SELECT u AS node, label FROM (
        SELECT u, label,
               row_number() OVER (PARTITION BY u ORDER BY c DESC, label ASC)
                   AS rn
        FROM f2
    ) WHERE rn = 1
),
f3 AS (
    SELECT e.u, l.label, count(*) AS c
    FROM edges e JOIN l2 l ON e.v = l.node
    GROUP BY e.u, l.label
),
l3 AS (
    SELECT u AS node, label FROM (
        SELECT u, label,
               row_number() OVER (PARTITION BY u ORDER BY c DESC, label ASC)
                   AS rn
        FROM f3
    ) WHERE rn = 1
)
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM l3
""",
    "q88_product_profit": """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           - CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, year(o_orderdate)
""",
    "q89_national_part_value": """
WITH v AS (
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
),
t AS (SELECT sum(value_cents) AS total FROM v)
SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM v, t
WHERE value_cents * 1000 > total
""",
    "q90_dominant_suppliers": """
WITH q AS (
    SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sq
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
),
d AS (
    SELECT l_suppkey, sq,
           sum(sq) OVER (PARTITION BY l_partkey) AS tq
    FROM q
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM d WHERE 2 * sq > tq)
""",
    "qd15_address_balances": f"""
WITH outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credit AS (
    SELECT addr, count(*) AS n_received, sum(oval) AS received_value
    FROM o2 GROUP BY addr
),
ins AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
debit AS (
    SELECT o2.addr, count(*) AS n_spent, sum(o2.oval) AS spent_value
    FROM ins JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    GROUP BY o2.addr
)
SELECT credit.addr, credit.n_received, CAST(credit.received_value AS BIGINT) AS received_value,
       coalesce(debit.n_spent, 0) AS n_spent,
       CAST(coalesce(debit.spent_value, 0) AS BIGINT) AS spent_value,
       CAST(credit.received_value - coalesce(debit.spent_value, 0) AS BIGINT) AS balance
FROM credit LEFT JOIN debit ON credit.addr = debit.addr
""",
    "qd16_cospend_entities": f"""
WITH RECURSIVE ia0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|')}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ia AS (
    SELECT DISTINCT tx_id, u.addr AS addr FROM ia0 WHERE u.alen > 0
),
n AS (
    SELECT tx_id, addr,
           ('0x' || substr(md5(addr), 1, 7))::BIGINT AS node
    FROM ia
),
chain AS (
    SELECT tx_id, node AS src,
           lead(node) OVER (PARTITION BY tx_id ORDER BY addr) AS dst
    FROM n
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL AND src <> dst
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL AND src <> dst
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
cc AS (SELECT node, min(comp) AS component FROM walk GROUP BY node)
SELECT DISTINCT n.addr AS addr,
       CAST(coalesce(cc.component, n.node) AS BIGINT) AS entity
FROM n LEFT JOIN cc ON n.node = cc.node
""",
    "qd17_entity_summary": f"""
WITH RECURSIVE bouts AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
bo2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM bouts WHERE u.alen > 0
),
bcredit AS (
    SELECT addr, count(*) AS n_received, sum(oval) AS received_value
    FROM bo2 GROUP BY addr
),
bins AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
bdebit AS (
    SELECT bo2.addr, sum(bo2.oval) AS spent_value
    FROM bins JOIN bo2 ON bins.u.stx = bo2.otx AND bins.u.sidx = bo2.oi
    GROUP BY bo2.addr
),
bal AS (
    SELECT bcredit.addr, bcredit.n_received, bcredit.received_value,
           coalesce(bdebit.spent_value, 0) AS spent_value,
           bcredit.received_value - coalesce(bdebit.spent_value, 0)
               AS balance
    FROM bcredit LEFT JOIN bdebit ON bcredit.addr = bdebit.addr
),
ea0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|')}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ea AS (
    SELECT DISTINCT tx_id, u.addr AS addr FROM ea0 WHERE u.alen > 0
),
en AS (
    SELECT tx_id, addr,
           ('0x' || substr(md5(addr), 1, 7))::BIGINT AS node
    FROM ea
),
echain AS (
    SELECT tx_id, node AS src,
           lead(node) OVER (PARTITION BY tx_id ORDER BY addr) AS dst
    FROM en
),
eedges AS (
    SELECT src, dst FROM echain WHERE dst IS NOT NULL AND src <> dst
    UNION
    SELECT dst, src FROM echain WHERE dst IS NOT NULL AND src <> dst
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM eedges
    UNION
    SELECT e.src, w.comp FROM eedges e JOIN walk w ON e.dst = w.node
),
ecc AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
ent AS (
    SELECT DISTINCT en.addr AS addr,
           coalesce(ecc.component, en.node) AS entity
    FROM en LEFT JOIN ecc ON en.node = ecc.node
)
SELECT CAST(coalesce(ent.entity,
           ('0x' || substr(md5(bal.addr), 1, 7))::BIGINT) AS BIGINT)
           AS entity,
       count(*) AS n_addresses,
       CAST(sum(bal.n_received) AS BIGINT) AS n_received,
       CAST(sum(bal.received_value) AS BIGINT) AS received_value,
       CAST(sum(bal.spent_value) AS BIGINT) AS spent_value,
       CAST(sum(bal.balance) AS BIGINT) AS balance
FROM bal LEFT JOIN ent ON bal.addr = ent.addr
GROUP BY 1
""",
    "q93_ranking_suite": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS BIGINT) AS tile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                      o_orderkey)
""",
    "q94_lateral_topk": """
SELECT n_name, s_suppkey, acct_cents
FROM nation, LATERAL (
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(round(s_acctbal * 100) AS BIGINT) AS acct_cents
    FROM supplier
    WHERE s_nationkey = n_nationkey
    ORDER BY acct_cents DESC, s_suppkey
    LIMIT 2
) t
""",
    "q95_date_spine": """
WITH b AS (
    SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
    FROM events
),
spine AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
    FROM b
),
c AS (
    SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
    FROM events GROUP BY 1
)
SELECT CAST(spine.d AS TIMESTAMP) AS d,
       CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
FROM spine LEFT JOIN c ON spine.d = c.d
""",
    "q96_snapshot_diff": """
WITH o AS (
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           year(o_orderdate) AS y, o_orderpriority
    FROM orders
),
oldv AS (
    SELECT o_orderkey, cents FROM o WHERE y BETWEEN 1995 AND 1997
),
newv AS (
    SELECT o_orderkey,
           cents + CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS cents
    FROM o WHERE y BETWEEN 1996 AND 1998
)
SELECT * FROM (
    SELECT CAST(coalesce(oldv.o_orderkey, newv.o_orderkey) AS BIGINT)
               AS o_orderkey,
           CASE WHEN oldv.o_orderkey IS NULL THEN 'added'
                WHEN newv.o_orderkey IS NULL THEN 'removed'
                WHEN oldv.cents <> newv.cents THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM oldv FULL OUTER JOIN newv ON oldv.o_orderkey = newv.o_orderkey
)
WHERE change <> 'unchanged'
""",
    "q91_decontamination": "WITH "
    + _TEXT_CTE
    + """,
eh AS (
    SELECT DISTINCT h FROM (
        SELECT unnest(hs) AS h FROM sh WHERE doc_id % 20 = 0
    )
),
tr AS (
    SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id % 20 <> 0
)
SELECT CAST(tr.doc_id AS BIGINT) AS doc_id,
       count(*) AS n_shared_shingles
FROM tr JOIN eh ON tr.h = eh.h
GROUP BY tr.doc_id
""",
    "q92_repetition_quality": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT doc_id, unnest(toks) AS tkn FROM tok),
tc AS (SELECT doc_id, tkn, count(*) AS c FROM t GROUP BY doc_id, tkn),
ts AS (
    SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct_tokens,
           max(c) AS top_token_count
    FROM tc GROUP BY doc_id
),
g0 AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1])
           ELSE [] END AS gs2
    FROM tok
),
g AS (SELECT doc_id, unnest(gs2) AS gm FROM g0),
gc AS (SELECT doc_id, gm, count(*) AS c FROM g GROUP BY doc_id, gm),
gst AS (
    SELECT doc_id, sum(c) AS n_2grams, count(*) AS n_distinct_2grams
    FROM gc GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(ts.n_distinct_tokens, 0) AS BIGINT)
           AS n_distinct_tokens,
       CAST(coalesce(ts.top_token_count, 0) AS BIGINT) AS top_token_count,
       CAST(coalesce(gst.n_2grams, 0) AS BIGINT) AS n_2grams,
       CAST(coalesce(gst.n_distinct_2grams, 0) AS BIGINT)
           AS n_distinct_2grams,
       CAST(gst.n_2grams - gst.n_distinct_2grams AS DOUBLE)
           / CAST(nullif(gst.n_2grams, 0) AS DOUBLE) AS dup_2gram_frac
FROM documents d
LEFT JOIN ts ON d.doc_id = ts.doc_id
LEFT JOIN gst ON d.doc_id = gst.doc_id
""",
    "q82_vocabulary": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT doc_id, unnest(toks) AS token FROM tok)
SELECT token, count(*) AS tf
FROM t GROUP BY token
ORDER BY tf DESC, token ASC
LIMIT 200
""",
    "q83_doc_frequency": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT doc_id, unnest(toks) AS token FROM tok)
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM t GROUP BY token
HAVING count(DISTINCT doc_id) >= 5
""",
    "q35_minhash_signatures": "WITH " + _SIGS_CTE + "\nSELECT * FROM sigs",
    "q36_lsh_pairs": "WITH "
    + _SIGS_CTE
    + f""",
bands AS (
{_bands_sql()}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
""",
    "q37_simhash": _simhash_sql(),
    "q38_jaccard_pairs": "WITH "
    + _SIGS_CTE
    + f""",
bands AS (
{_bands_sql()}
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
),
ja AS (
    SELECT p.id_a, p.id_b,
           CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE)
               AS jaccard
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
)
SELECT * FROM ja WHERE jaccard >= 0.2
""",
    "q71_fuzzy_dedup": "WITH RECURSIVE "
    + _SIGS_CTE
    + f""",
bands AS (
{_bands_sql()}
),
cpairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
),
ja AS (
    SELECT p.id_a, p.id_b,
           CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE)
               AS jaccard
    FROM cpairs p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM ja WHERE jaccard >= 0.2
    UNION
    SELECT id_b AS src, id_a AS dst FROM ja WHERE jaccard >= 0.2
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
comp AS (
    SELECT node, min(comp) AS component FROM walk GROUP BY node
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canonical_id,
       (d.doc_id = coalesce(c.component, d.doc_id)) AS is_keeper
FROM documents d
LEFT JOIN comp c ON c.node = d.doc_id
""",
    "q74_session_window": """
WITH e AS (
    SELECT user_id, ts,
           CAST(round(value * 1000) AS BIGINT) AS mills,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 12 HOUR
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
s AS (
    SELECT user_id, ts, mills,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM e
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 12 HOUR AS session_end,
       count(*) AS n_events,
       CAST(sum(mills) AS BIGINT) AS sum_mills
FROM s
GROUP BY user_id, session_id
""",
    "q75_pivot": """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'F'
           THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_f,
       CAST(sum(CASE WHEN l_linestatus = 'O'
           THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_o
FROM lineitem
GROUP BY l_returnflag
""",
    "q76_hopping_windows": """
WITH hops AS (
    -- NB: DuckDB `//` on DOUBLE is plain division; quantize with an
    -- explicit floor to integer half-day slots
    SELECT ts, CAST(round(value * 1000) AS BIGINT) AS mills,
           CAST(to_timestamp((CAST(floor(epoch(ts) / 43200) AS BIGINT) - k.k)
                             * 43200) AS TIMESTAMP) AS win_start
    FROM events, (SELECT 0 AS k UNION ALL SELECT 1) k
    WHERE epoch(ts) >= ((CAST(floor(epoch(ts) / 43200) AS BIGINT) - k.k)
                        * 43200)
      AND epoch(ts) <  ((CAST(floor(epoch(ts) / 43200) AS BIGINT) - k.k)
                        * 43200 + 86400)
)
SELECT win_start,
       win_start + INTERVAL 1 DAY AS win_end,
       count(*) AS n_events,
       CAST(sum(mills) AS BIGINT) AS sum_mills
FROM hops
GROUP BY win_start
""",
    "q77_nation_volume": """
SELECT cust_nation, supp_nation, l_year,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM (
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY cust_nation, supp_nation, l_year
""",
    "q78_market_share": """
SELECT o_year, CAST(nation_cents AS BIGINT) AS nation_cents, CAST(total_cents AS BIGINT) AS total_cents,
       CAST(nation_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
           AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CASE WHEN n2.n_name = 'NATION_2'
               THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                    AS BIGINT) ELSE 0 END) AS nation_cents,
           sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
               AS BIGINT)) AS total_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    GROUP BY o_year
)
""",
    "q79_top_supplier": """
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
               AS BIGINT)) AS total_revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT CAST(supplier_no AS BIGINT) AS supplier_no, s_name,
       CAST(total_revenue_cents AS BIGINT) AS total_revenue_cents
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
""",
    "q80_disjunctive_predicates": """
SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size <= 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    "q81_lone_late_supplier": """
SELECT CAST(l1.l_suppkey AS BIGINT) AS l_suppkey,
       count(*) AS numwait
FROM lineitem l1
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY l1.l_suppkey
""",
    "q72_stratified_sample": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000)
      < CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 5000
                  WHEN 'fr' THEN 5000 WHEN 'es' THEN 5000 ELSE 0 END
""",
    "q73_train_test_split": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
                  % 10000) < 2000
            THEN 'test' ELSE 'train' END AS split
FROM documents
""",
    "q39_knn_bruteforce": _knn_bruteforce_sql(3),
    # q40: the LSH result is a pure function of the data (seeded
    # hyperplane literals, fixed-order folds), so the streaming-ANN SQL
    # mirror re-derives it bit-exactly with q40's batch geometry.
    "q40_knn_lsh": _stream_ann_sql(
        k=1, n_planes=8, n_tables=2, seed=42, multiprobe=0, dim=64
    ),
    # q103: GEMM-vs-fold parity frame — expected pair count comes from
    # the same bit-exact LSH mirror; the symmetric difference is an
    # identity (0).
    "q103_knn_lsh_gemm": (
        "SELECT count(*) AS n_pairs, CAST(0 AS BIGINT) AS n_gemm_only,"
        " CAST(0 AS BIGINT) AS n_fold_only FROM ("
        + _stream_ann_sql(k=1, n_planes=8, n_tables=2, seed=42, multiprobe=0, dim=64)
        + ")"
    ),
    # q44: invariant frame — full-probe IVF ≡ exact top-1 is a
    # mathematical identity (candidate set = corpus), and at k=1 both
    # the exact and the probe-4 result carry one row per vector.
    "q44_knn_ivf": (
        "SELECT count(*) AS n_queries, count(*) AS n_results,"
        " CAST(0 AS BIGINT) AS n_fullprobe_mismatch FROM embeddings"
    ),
    # q50: GEMM-vs-fold near-dup parity — expected pair count from the
    # bit-exact q46 mirror; symmetric difference is an identity (0).
    "q50_embedding_neardup_gemm": (
        "SELECT count(*) AS n_pairs, CAST(0 AS BIGINT) AS n_gemm_only,"
        " CAST(0 AS BIGINT) AS n_fold_only FROM ("
        + _neardup_sql(0.35, 4, 4, 64)
        + ")"
    ),
    # q84: conservation-law invariant frame — graph shape from the
    # chain-edge CTE (directed), mass/positivity are identities.
    "q84_pagerank": """
WITH g0 AS (
    SELECT DISTINCT l_orderkey AS g, l_suppkey AS node
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
),
chain AS (
    SELECT g, node AS src,
           lead(node) OVER (PARTITION BY g ORDER BY node) AS dst
    FROM g0
),
e AS (SELECT DISTINCT src, dst FROM chain WHERE dst IS NOT NULL),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       (SELECT count(*) FROM nodes
        WHERE node NOT IN (SELECT src FROM e)) AS n_dangling,
       CAST(1000000 AS BIGINT) AS mass_e6,
       CAST(0 AS BIGINT) AS n_nonpos
""",
    "q46_embedding_neardup": _neardup_sql(0.35, 4, 4, 64),
    "qd12_streaming_ann": _stream_ann_sql(3, 6, 2, 42, 1, 64),
    "q55_salted_join": """
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    "q57_forecast_revenue": """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    "q58_shipmode_priority": """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""",
    "q59_percentiles": """
SELECT l_returnflag,
       quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS p25,
       quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)  AS p50,
       quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS p75,
       quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.99) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
    "q63_entity_clustering": """
WITH RECURSIVE g0 AS (
    SELECT DISTINCT l_orderkey AS g, l_suppkey AS node
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
),
chain AS (
    SELECT g, node AS src,
           lead(node) OVER (PARTITION BY g ORDER BY node) AS dst
    FROM g0
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node
""",
    "q64_min_cost_supplier": """
SELECT DISTINCT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(l_suppkey AS BIGINT) AS l_suppkey, min_cents
FROM (
    SELECT l_partkey, l_suppkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           min(CAST(round(l_extendedprice * 100) AS BIGINT))
               OVER (PARTITION BY l_partkey) AS min_cents
    FROM lineitem
)
WHERE cents = min_cents
""",
    "q65_order_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
GROUP BY o_orderpriority
""",
    "q66_order_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN (
        SELECT o_custkey, o_orderkey FROM orders
        WHERE o_orderpriority <> '1-URGENT'
    ) ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
""",
    "q67_promo_revenue": """
SELECT CAST(promo_cents AS BIGINT) AS promo_cents, CAST(total_cents AS BIGINT) AS total_cents,
       CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
           AS promo_share
FROM (
    SELECT
        sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                 AS BIGINT) ELSE 0 END) AS promo_cents,
        sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
            AS BIGINT)) AS total_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
)
""",
    "q68_supplier_counts": """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p_brand, p_size
""",
    "q69_small_qty_revenue": """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS small_qty_cents
FROM lineitem li
JOIN (
    SELECT l_partkey, count(*) AS cnt,
           sum(CAST(l_quantity AS BIGINT)) AS sum_qty
    FROM lineitem GROUP BY l_partkey
) s ON li.l_partkey = s.l_partkey
WHERE 5 * CAST(li.l_quantity AS BIGINT) * s.cnt < s.sum_qty
""",
    "q70_idle_rich_customers": """
WITH stats AS (
    SELECT count(*) AS n_pos,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_pos_cents
    FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer, stats
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos_cents
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-06-01'
  )
GROUP BY c_nationkey
""",
    "q62_returned_items": """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS lost_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_cents DESC, c_custkey ASC
LIMIT 20
""",
    "q60_large_orders": """
SELECT c_custkey, c_name, l_orderkey, o_orderdate, CAST(total_qty AS BIGINT) AS total_qty
FROM (
    SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "q51_cube": """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "q52_lead_lag_running": """
SELECT user_id, event_id, ts,
       CAST(round(value * 1000) AS BIGINT) AS value_mills,
       lag(CAST(round(value * 1000) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value_mills,
       lead(CAST(round(value * 1000) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value_mills,
       CAST(sum(CAST(round(value * 1000) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_mills,
       CAST(row_number()
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS event_seq
FROM events
""",
    "q53_set_ops": """
SELECT o_custkey, 'retained' AS cohort FROM (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
UNION ALL
SELECT o_custkey, 'churned' AS cohort FROM (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
""",
    "q47_bpe_tokens": r"""
WITH p AS (
    SELECT doc_id,
           regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f]') AS pieces,
           list_filter(
               string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               t -> t <> ''
           ) AS ws
    FROM documents
)
SELECT doc_id,
       CAST(len(pieces) AS BIGINT) AS n_pieces,
       CAST(len(list_distinct(pieces)) AS BIGINT) AS n_distinct_pieces,
       CAST(len(ws) AS BIGINT) AS n_ws_tokens,
       CAST(len(pieces) AS DOUBLE) / CAST(nullif(len(ws), 0) AS DOUBLE)
           AS pieces_per_ws_token
FROM p
""",
    "q48_shipping_priority": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
""",
    "q49_regional_revenue": """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
""",
    "q41_media_features": """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS width,
       ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS height,
       3::BIGINT AS channels
FROM documents
""",
    "q56_resize_thumbs": """
SELECT doc_id AS media_id,
       CAST(64 AS INTEGER) AS target_w,
       CAST(64 AS INTEGER) AS target_h,
       CAST(64 * 64 * 3 AS BIGINT) AS thumb_n_bytes,
       md5(text || '64x64') AS thumb_md5
FROM documents
""",
    "q42_frame_sample": """
WITH m AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
),
f AS (
    SELECT media_id,
           unnest(range(0, CAST(floor((n_bytes - 1) / 64.0) AS BIGINT) + 1))
               AS frame_no
    FROM m
)
SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST(frame_no * 64 AS BIGINT) AS offset
FROM f
""",
    "q98_sequence_packing": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
c AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM n
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / 256.0) AS BIGINT) AS start_bin,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((tok_offset + n_tokens - 1) / 256.0) AS BIGINT)
            ELSE CAST(floor(tok_offset / 256.0) AS BIGINT)
       END AS end_bin
FROM c
""",
    "q104_packed_segments": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
c AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM n
),
bins AS (
    SELECT doc_id, n_tokens, tok_offset,
           unnest(range(
               CAST(floor(tok_offset / 256.0) AS BIGINT),
               CAST(floor((tok_offset + n_tokens - 1) / 256.0) AS BIGINT) + 1
           )) AS bin
    FROM c WHERE n_tokens > 0
)
SELECT CAST(bin AS BIGINT) AS bin,
       doc_id,
       CAST(greatest(bin * 256, tok_offset) - tok_offset AS BIGINT)
           AS slice_start,
       CAST(least((bin + 1) * 256, tok_offset + n_tokens)
            - greatest(bin * 256, tok_offset) AS BIGINT) AS slice_len
FROM bins
""",
    "q99_unigram_likelihood": "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT doc_id, unnest(toks) AS token FROM tok),
tf AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n FROM tf)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf.tf) AS BIGINT) AS sum_tf,
       CAST(CAST(sum(tf.tf) AS BIGINT) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE)
              * CAST((SELECT n FROM tot) AS DOUBLE)) AS mean_rel_freq
FROM t JOIN tf USING (token)
GROUP BY t.doc_id
""",
    "q100_boilerplate_ngrams": "WITH "
    + _TEXT_CTE
    + """,
pg AS (SELECT doc_id, unnest(hs) AS g FROM sh),
nd AS (SELECT count(*) AS n FROM documents),
dfq AS (SELECT g, count(*) AS df FROM pg GROUP BY g),
b AS (SELECT g FROM dfq WHERE df * 100 >= 1 * (SELECT n FROM nd))
SELECT pg.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(b.g) AS BIGINT) AS n_boiler,
       CAST(count(b.g) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS boiler_frac
FROM pg LEFT JOIN b ON pg.g = b.g
GROUP BY pg.doc_id
""",
    "q101_vocab_overlap": r"""
WITH norm AS (
    SELECT lang, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
gv AS (
    SELECT DISTINCT lang AS g,
           unnest(list_filter(string_split(s, ' '), x -> x <> '')) AS token
    FROM norm
),
sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS vsize FROM gv GROUP BY g),
inter AS (
    SELECT a.g AS g_a, b.g AS g_b, CAST(count(*) AS BIGINT) AS n_common
    FROM gv a JOIN gv b ON a.token = b.token AND a.g < b.g
    GROUP BY a.g, b.g
),
pairs AS (
    SELECT sa.g AS g_a, sb.g AS g_b,
           sa.vsize AS size_a, sb.vsize AS size_b
    FROM sizes sa CROSS JOIN sizes sb
    WHERE sa.g < sb.g
)
SELECT p.g_a, p.g_b, p.size_a, p.size_b,
       CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(i.n_common, 0) AS DOUBLE)
           / CAST(p.size_a + p.size_b - COALESCE(i.n_common, 0) AS DOUBLE)
           AS jaccard
FROM pairs p
LEFT JOIN inter i ON p.g_a = i.g_a AND p.g_b = i.g_b
""",
    "qd19_entity_relations": f"""
WITH RECURSIVE ia0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|')}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ia AS (
    SELECT DISTINCT tx_id, u.addr AS addr FROM ia0 WHERE u.alen > 0
),
n AS (
    SELECT tx_id, addr,
           ('0x' || substr(md5(addr), 1, 7))::BIGINT AS node
    FROM ia
),
chain AS (
    SELECT tx_id, node AS src,
           lead(node) OVER (PARTITION BY tx_id ORDER BY addr) AS dst
    FROM n
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL AND src <> dst
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL AND src <> dst
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
cc AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
ent AS (
    SELECT DISTINCT n.addr AS addr,
           coalesce(cc.component, n.node) AS entity
    FROM n LEFT JOIN cc ON n.node = cc.node
),
srcs AS (
    SELECT ia.tx_id, min(ent.entity) AS src_entity
    FROM ia JOIN ent ON ia.addr = ent.addr
    GROUP BY ia.tx_id
),
o0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id, u.addr AS addr, u.oval AS value FROM o0 WHERE u.alen > 0
),
dsts AS (
    SELECT outs.tx_id,
           coalesce(ent.entity,
                    ('0x' || substr(md5(outs.addr), 1, 7))::BIGINT)
               AS dst_entity,
           outs.value
    FROM outs LEFT JOIN ent ON outs.addr = ent.addr
)
SELECT CAST(src_entity AS BIGINT) AS src_entity,
       CAST(dst_entity AS BIGINT) AS dst_entity,
       CAST(count(DISTINCT srcs.tx_id) AS BIGINT) AS n_txs,
       CAST(count(*) AS BIGINT) AS n_outputs,
       CAST(sum(value) AS BIGINT) AS total_value
FROM srcs JOIN dsts ON srcs.tx_id = dsts.tx_id
GROUP BY 1, 2
""",
    "qd20_incremental_clustering": f"""
WITH RECURSIVE ia0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|')}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ia AS (
    SELECT DISTINCT tx_id, u.addr AS addr FROM ia0 WHERE u.alen > 0
),
n AS (
    SELECT tx_id, addr,
           ('0x' || substr(md5(addr), 1, 7))::BIGINT AS node
    FROM ia
),
chain AS (
    SELECT tx_id, node AS src,
           lead(node) OVER (PARTITION BY tx_id ORDER BY addr) AS dst
    FROM n
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL AND src <> dst
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL AND src <> dst
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
)
SELECT node, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node
""",
    "qd21_streaming_clustering": f"""
WITH RECURSIVE ia0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|')}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ia AS (
    SELECT DISTINCT tx_id, u.addr AS addr FROM ia0 WHERE u.alen > 0
),
n AS (
    SELECT tx_id, addr,
           ('0x' || substr(md5(addr), 1, 7))::BIGINT AS node
    FROM ia
),
chain AS (
    SELECT tx_id, node AS src,
           lead(node) OVER (PARTITION BY tx_id ORDER BY addr) AS dst
    FROM n
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL AND src <> dst
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL AND src <> dst
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
)
SELECT node, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node
""",
    "q102_netpbm_decode": """
WITH raster AS (
    SELECT doc_id AS media_id,
           substring(
               repeat(text, CAST(floor(144.0 / len(text)) AS INT) + 1),
               1, 144
           ) AS r
    FROM documents
    WHERE len(text) > 0 AND len(text) = octet_length(encode(text))
)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(144 AS BIGINT) AS n_pixels,
       CAST(list_sum(list_transform(string_split(r, ''), x -> ascii(x)))
            AS BIGINT) AS px_sum
FROM raster
""",
    "q109_temperature_sample": r"""
WITH counts AS (
    SELECT lang AS g, CAST(count(*) AS BIGINT) AS c
    FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
weighted AS (
    SELECT g,
           CAST(c AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE) AS share,
           sqrt(CAST(c AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)) AS w
    FROM counts
),
z AS (
    SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list_sort(list({'g': g, 'w': w})),
                                  x -> x.w)),
               (a, b) -> a + b) AS z
    FROM weighted
),
rates AS (
    SELECT g, share,
           least(CAST(1.0 AS DOUBLE),
                 (0.5 * (w / (SELECT z FROM z))) / share) AS rate
    FROM weighted
)
SELECT d.doc_id, d.lang, r.share, r.rate,
       CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
            AS DOUBLE) < r.rate * 268435456.0 AS keep
FROM documents d JOIN rates r ON d.lang = r.g
""",
    "q108_quality_classifier": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
pt AS (SELECT doc_id, unnest(toks) AS token FROM tok),
wt AS (
    SELECT doc_id,
           (('0x' || substr(md5('w#' || CAST(
                (('0x' || substr(md5(token), 1, 7))::BIGINT) % 1024
            AS VARCHAR)), 1, 7))::BIGINT % 2001) - 1000 AS w
    FROM pt
),
per AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w) AS BIGINT) AS logit_milli
    FROM wt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.logit_milli, 0) AS BIGINT) AS logit_milli,
       CAST(COALESCE(per.logit_milli, 0) AS DOUBLE) / 1000.0 AS logit,
       COALESCE(per.logit_milli, 0) >= 0 AS keep
FROM documents d LEFT JOIN per USING (doc_id)
""",
    "q107_bm25_topk": r"""
WITH queries(query_id, qtext) AS (VALUES """
    + ", ".join(f"({i}, '{q}')" for i, q in BM25_FIXTURE_QUERIES)
    + r"""),
norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl
    FROM dl
),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM terms GROUP BY doc_id, term
),
dfq AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
qn AS (
    SELECT query_id,
           lower(trim(regexp_replace(qtext, '\s+', ' ', 'g'))) AS qs
    FROM queries
),
qterms AS (
    SELECT query_id,
           unnest(list_distinct(
               list_filter(string_split(qs, ' '), t -> t <> ''))) AS term
    FROM qn
),
scored AS (
    SELECT q.query_id, tf.doc_id, tf.term,
           ((CAST(s.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
            / (CAST(d.df AS DOUBLE) + 0.5))
           * ((CAST(tf.tf AS DOUBLE) * 2.2)
              / (CAST(tf.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                     / (CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE))))))
               AS sc
    FROM tf
    JOIN qterms q USING (term)
    JOIN dfq d USING (term)
    JOIN dl l USING (doc_id)
    CROSS JOIN stats s
),
folded AS (
    SELECT query_id, doc_id,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(
                       list_sort(list({'t': term, 's': sc})),
                       x -> x.s)),
               (a, b) -> a + b) AS score
    FROM scored GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM folded
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 10
""",
    "qd22_fiat_conversion": f"""
WITH txs AS (
    SELECT tx_id,
           CAST(to_timestamp(CAST(timestamp AS BIGINT)) AS DATE) AS tx_date,
           CAST(coalesce(list_sum(list_transform(outputs, x -> x.value)), 0)
                AS BIGINT) AS total_output
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
rates AS (
    SELECT CAST(date AS DATE) AS rate_date, fiat_values
    FROM read_parquet('{_FIXTURE_DIR}/raw_exchange_rates.parquet')
),
joined AS (
    SELECT t.tx_id, t.total_output, r.fiat_values
    FROM txs t ASOF LEFT JOIN rates r ON t.tx_date >= r.rate_date
),
ex AS (
    SELECT tx_id, total_output,
           unnest(map_entries(fiat_values)) AS e
    FROM joined
)
SELECT tx_id,
       e.key AS currency,
       CAST(e.value AS DOUBLE) AS rate,
       total_output AS value_satoshi,
       CAST(total_output AS DOUBLE) / 100000000.0 * CAST(e.value AS DOUBLE)
           AS fiat_value
FROM ex
""",
    "q106_bpe_encode": r"""
WITH RECURSIVE vocab(piece, plen) AS (VALUES """
    + ", ".join(f"('{p}', {len(p)})" for p in BPE_FIXTURE_VOCAB)
    + r"""),
norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
dw AS (SELECT doc_id, unnest(toks) AS word FROM tok),
words AS (SELECT DISTINCT word FROM dw),
pos_tab AS (
    SELECT word, unnest(range(1, len(word) + 1)) AS pos FROM words
),
mlen AS (
    SELECT p.word, p.pos, COALESCE(max(v.plen), 0) AS best
    FROM pos_tab p
    LEFT JOIN vocab v
      ON v.plen <= len(p.word) - p.pos + 1
     AND substr(p.word, CAST(p.pos AS INT), v.plen) = v.piece
    GROUP BY p.word, p.pos
),
walk AS (
    SELECT word, CAST(1 AS BIGINT) AS pos,
           CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS unk
    FROM words
    UNION ALL
    SELECT w.word,
           w.pos + CASE WHEN m.best = 0 THEN 1 ELSE m.best END,
           w.n + 1,
           w.unk + CASE WHEN m.best = 0 THEN 1 ELSE 0 END
    FROM walk w
    JOIN mlen m ON m.word = w.word AND m.pos = w.pos
    WHERE w.pos <= len(w.word)
),
wstat AS (
    SELECT word, n AS n_tok, unk AS n_unk
    FROM walk WHERE pos = len(word) + 1
),
per AS (
    SELECT dw.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(ws.n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(ws.n_unk) AS BIGINT) AS n_unk
    FROM dw JOIN wstat ws USING (word)
    GROUP BY dw.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(per.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
       CAST(COALESCE(per.n_unk, 0) AS BIGINT) AS n_unk,
       CASE WHEN COALESCE(per.n_words, 0) > 0
            THEN CAST(per.n_bpe_tokens AS DOUBLE)
                 / CAST(per.n_words AS DOUBLE)
            ELSE 0.0 END AS tokens_per_word
FROM documents d LEFT JOIN per USING (doc_id)
""",
    "q110_kmeans_assign": _kmeans_assign_sql(10),
    "q112_semdedup": _semdedup_sql(10, 0.35),
    "q117_group_capped_sample": """
SELECT doc_id, lang, CAST(rn AS INTEGER) AS sample_rank
FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
           ) AS rn
    FROM documents
)
WHERE rn <= 40
""",
    "q118_batch_planning": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
pd AS (
    SELECT doc_id, len(toks) AS n_tokens FROM tok WHERE len(toks) > 0
),
sl AS (
    SELECT n_tokens, n_tokens // 16 AS bucket,
           (row_number() OVER (
               PARTITION BY n_tokens // 16
               ORDER BY n_tokens ASC, doc_id ASC
           ) - 1) // 8 AS batch_id
    FROM pd
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(batch_id AS BIGINT) AS batch_id,
       count(*) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS sum_len,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
           AS padding_waste
FROM sl GROUP BY 1, 2
""",
    "q116_wav_decode": r"""
WITH tiled AS (
    SELECT doc_id AS media_id,
           substring(
               repeat(text, CAST(floor(120.0 / len(text)) AS INT) + 1),
               1, 120
           ) AS t
    FROM documents
    WHERE len(text) > 0 AND len(text) = octet_length(encode(text))
)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(120 AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(
           string_split(t, ''), x -> abs(ascii(x) - 128) * 256))
           AS BIGINT) AS abs_sum,
       CAST(list_max(list_transform(
           string_split(t, ''), x -> abs(ascii(x) - 128) * 256))
           AS INTEGER) AS peak
FROM tiled
""",
    "q113_chunking": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
ch AS (
    SELECT doc_id, toks, len(toks) AS n,
           CASE WHEN len(toks) > 0
                THEN ((greatest(len(toks) - 64, 0) + 48 - 1) // 48) + 1
                ELSE 0 END AS nc
    FROM tok
),
ex AS (SELECT doc_id, unnest(range(nc)) AS chunk_id, toks, n FROM ch)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id * 48 + 1,
                           least(chunk_id * 48 + 64, n))) AS BIGINT)
           AS n_chunk_tokens,
       array_to_string(list_slice(toks, chunk_id * 48 + 1,
                                  least(chunk_id * 48 + 64, n)), ' ')
           AS chunk_text
FROM ex
""",
    "q114_pii_redaction": r"""
WITH dirty AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail' || CAST(doc_id % 7 AS VARCHAR)
           || '.com visit https://host' || CAST(doc_id AS VARCHAR)
           || '.example/p/' || CAST(doc_id AS VARCHAR)
           || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
           || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
           || ' acct ' || CAST(100000000 + doc_id * 917 AS VARCHAR) AS s
    FROM documents
),
s1 AS (
    SELECT doc_id,
           len(regexp_extract_all(s, 'https?://[^\s]+')) AS n_urls,
           regexp_replace(s, 'https?://[^\s]+', '<URL>', 'g') AS s
    FROM dirty
),
s2 AS (
    SELECT doc_id, n_urls,
           len(regexp_extract_all(
               s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
           regexp_replace(
               s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS s
    FROM s1
),
s3 AS (
    SELECT doc_id, n_urls, n_emails,
           len(regexp_extract_all(
               s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS n_ips,
           regexp_replace(
               s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g') AS s
    FROM s2
)
SELECT doc_id, n_urls, n_emails, n_ips,
       len(regexp_extract_all(s, '[0-9]{9,}')) AS n_longnums,
       regexp_replace(s, '[0-9]{9,}', '<NUM>', 'g') AS clean_text
FROM s3
""",
    "q115_pmi_collocations": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
p AS (
    SELECT flatten(list_transform(
               range(1, len(toks) + 1),
               i -> list_transform(
                   range(i + 1, least(i + 3, len(toks)) + 1),
                   j -> [toks[i], toks[j]]))) AS pairs,
           toks
    FROM tok
),
pc AS (
    SELECT pr[1] AS tok_a, pr[2] AS tok_b, count(*) AS c_ab
    FROM (SELECT unnest(pairs) AS pr FROM p)
    GROUP BY 1, 2
    HAVING count(*) >= 5
),
uc AS (
    SELECT token, count(*) AS c
    FROM (SELECT unnest(toks) AS token FROM tok)
    GROUP BY 1
),
tot AS (
    SELECT (SELECT sum(len(pairs)) FROM p) AS n_pairs,
           (SELECT sum(len(toks)) FROM tok) AS n_tok
)
SELECT tok_a, tok_b, c_ab, a.c AS c_a, b.c AS c_b,
       CAST(c_ab AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE)
           / CAST(n_pairs AS DOUBLE) / CAST(a.c AS DOUBLE)
           / CAST(b.c AS DOUBLE) AS lift
FROM pc JOIN uc a ON pc.tok_a = a.token
        JOIN uc b ON pc.tok_b = b.token
        CROSS JOIN tot
""",
    "q105_substring_dedup": r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
b AS (SELECT doc_id, s, len(s) AS l FROM norm),
pos AS (
    SELECT doc_id, unnest(range(1, l - 50 + 2)) AS p, s
    FROM b WHERE l >= 50
),
ph AS (
    SELECT doc_id, p,
           ('0x' || substr(md5(substr(s, CAST(p AS INT), 50)), 1, 15))::BIGINT AS h
    FROM pos
),
duph AS (
    SELECT h FROM (
        SELECT h, count(DISTINCT doc_id) AS nd FROM ph GROUP BY h
    ) WHERE nd >= 2
),
dp AS (SELECT ph.doc_id, ph.p FROM ph JOIN duph USING (h)),
isl AS (
    SELECT doc_id, p,
           CASE WHEN lag(p) OVER w IS NULL OR p - lag(p) OVER w > 50
                THEN 1 ELSE 0 END AS ni
    FROM dp
    WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
isl2 AS (
    SELECT doc_id, p,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS island
    FROM isl
),
agg AS (
    SELECT doc_id, island, max(p) - min(p) + 50 AS ilen, count(*) AS np
    FROM isl2 GROUP BY doc_id, island
),
per AS (
    SELECT doc_id,
           CAST(sum(ilen) AS BIGINT) AS dup_chars,
           CAST(sum(np) AS BIGINT) AS n_dup_positions
    FROM agg GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(CASE WHEN l >= 50 THEN l - 49 ELSE 0 END AS BIGINT) AS n_positions,
       CAST(COALESCE(per.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
       CAST(COALESCE(per.dup_chars, 0) AS BIGINT) AS dup_chars,
       CASE WHEN l > 0
            THEN CAST(COALESCE(per.dup_chars, 0) AS DOUBLE) / CAST(l AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM b LEFT JOIN per USING (doc_id)
""",
    "qd18_stateful_sessions": """
WITH ev AS (
    SELECT user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS ts_epoch
    FROM events
),
flagged AS (
    SELECT user_id, ts_epoch,
           CASE WHEN lag(ts_epoch) OVER w IS NULL
                  OR ts_epoch - lag(ts_epoch) OVER w > 1800
                THEN 1 ELSE 0 END AS ns
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch)
),
sess AS (
    SELECT user_id, ts_epoch,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_epoch
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
    FROM flagged
),
agg AS (
    SELECT user_id, sid,
           min(ts_epoch) AS session_start,
           max(ts_epoch) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events
FROM agg
QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
""",
}

# q119 nests the ENTIRE q33 oracle as its prediction CTE — the
# confusion matrix is evaluated against the exact same heuristic
# derivation the q33 gate already pins, never a re-implementation.
ORACLE_SQL["q119_language_confusion"] = f"""
WITH pred AS ({ORACLE_SQL["q33_language_id"]})
SELECT d.lang, p.lang_pred, count(*) AS n_docs
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""

# qd23 emits exactly q102's rows — the binaryFile round-trip must be
# invisible to the decode — so it shares the q102 oracle verbatim.
ORACLE_SQL["qd23_binary_files"] = ORACLE_SQL["q102_netpbm_decode"]

# q120: DuckDB replays the identical degree-ordered orientation and
# wedge-join algebra (rank = degree * 2^32 + node makes the total
# order deterministic in both engines, no row_number anywhere).
ORACLE_SQL["q120_triangle_count"] = """
WITH su AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
ed AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM su a JOIN su b ON a.k = b.k AND a.s < b.s
),
sym AS (SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
rk AS (SELECT node, d * 4294967296 + node AS r FROM deg),
orient AS (
    SELECT CASE WHEN ru.r < rv.r THEN e.u ELSE e.v END AS a,
           CASE WHEN ru.r < rv.r THEN e.v ELSE e.u END AS b,
           greatest(ru.r, rv.r) AS rb
    FROM ed e
    JOIN rk ru ON e.u = ru.node
    JOIN rk rv ON e.v = rv.node
),
wedge AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM orient e1 JOIN orient e2 ON e1.a = e2.a AND e1.rb < e2.rb
),
tri AS (
    SELECT w.x, w.y, w.z
    FROM wedge w JOIN orient o ON w.y = o.a AND w.z = o.b
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
    UNION ALL SELECT z AS node FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
"""

# q121: the oracle is the DIRECT definition (full group-by + integer
# threshold); the Spark side must reach the same set through the
# Misra-Gries candidate/recount composition.
ORACLE_SQL["q121_heavy_hitters"] = (
    "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT unnest(toks) AS token FROM tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM t GROUP BY token
HAVING count(*) >= (SELECT (n + 511) // 512 FROM tot)
"""
)

# q122: identical to the q91 oracle shape with the %7 eval split — the
# Bloom pipeline's one-sided error must be invisible in the output.
ORACLE_SQL["q122_bloom_decontaminate"] = (
    "WITH "
    + _TEXT_CTE
    + """,
eh AS (
    SELECT DISTINCT h FROM (
        SELECT unnest(hs) AS h FROM sh WHERE doc_id % 7 = 0
    )
),
tr AS (
    SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id % 7 <> 0
)
SELECT CAST(tr.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shared_shingles
FROM tr JOIN eh ON tr.h = eh.h
GROUP BY tr.doc_id
"""
)

# q123: every dhash bit re-derived from the tiled text's code points.
# Sampling arithmetic mirrors image_dhash exactly: an 18x16 P5 raster
# NN-resized to 8 cols x 8 rows means gray[r][c] = code point at
# 1-based position 36*r + (c*18)//8 + 1; bit k (k = r*7 + c, c < 7)
# compares sample column c against c+1. 56 bits keeps every weight
# positive in BIGINT (DuckDB raises on 1<<63; numpy would wrap).
ORACLE_SQL["q123_image_dhash"] = """
WITH raster AS (
    SELECT doc_id AS media_id,
           substring(
               repeat(text, CAST(floor(288.0 / len(text)) AS INT) + 1),
               1, 288
           ) AS r
    FROM documents
    WHERE len(text) > 0 AND len(text) = octet_length(encode(text))
),
hashed AS (
    SELECT media_id,
           CAST(list_sum(list_transform(range(0, 56), k ->
               CASE WHEN
                   ascii(substr(r, CAST(36*(k//7) + ((k%7)*18)//8 + 1 AS INT), 1))
                 > ascii(substr(r, CAST(36*(k//7) + (((k%7)+1)*18)//8 + 1 AS INT), 1))
               THEN 1::BIGINT << CAST(k AS INT) ELSE 0::BIGINT END
           )) AS BIGINT) AS dhash
    FROM raster
)
SELECT media_id, dhash,
       CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS n_same_hash
FROM hashed
"""

# q124: sample(i) = (code(i) - 128) * 256, so frame energy is
# 65536 * sum((code-128)^2) and a zero crossing is (code < 128)
# flipping between adjacent samples within the 30-sample frame.
ORACLE_SQL["q124_audio_frames"] = """
WITH tiled AS (
    SELECT doc_id AS media_id,
           substring(
               repeat(text, CAST(floor(120.0 / len(text)) AS INT) + 1),
               1, 120
           ) AS r
    FROM documents
    WHERE len(text) > 0 AND len(text) = octet_length(encode(text))
),
frames AS (
    SELECT media_id, r, unnest(range(0, 4)) AS f FROM tiled
)
SELECT media_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(list_sum(list_transform(range(1, 31), i ->
           65536 * (ascii(substr(r, CAST(30*f + i AS INT), 1)) - 128)
                 * (ascii(substr(r, CAST(30*f + i AS INT), 1)) - 128)
       )) AS BIGINT) AS sq_sum,
       CAST(list_sum(list_transform(range(1, 30), i ->
           CASE WHEN (ascii(substr(r, CAST(30*f + i AS INT), 1)) < 128)
                  <> (ascii(substr(r, CAST(30*f + i + 1 AS INT), 1)) < 128)
           THEN 1 ELSE 0 END
       )) AS BIGINT) AS n_crossings
FROM frames
"""

# qd24: one micro-batch + capacity above the per-shard distinct count
# means the Misra-Gries snapshot IS the exact token count — the
# streaming plumbing must be invisible in the output.
ORACLE_SQL["qd24_streaming_heavy_hitters"] = (
    "WITH "
    + _TEXT_CTE.split(",\ngrams")[0]
    + """,
t AS (SELECT unnest(toks) AS token FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM t GROUP BY token
"""
)

# q126: DuckDB re-derives the HDR buckets with pure integer bit
# arithmetic (bit length via length(bin(v)), shifts as >>/<<), the
# integer ceil-rank, and the bucket lower-bound estimates. Per-day
# partials on the Spark side are invisible here by merge invariance:
# summing per-day bucket counts equals bucketing the whole table.
ORACLE_SQL["q126_hdr_quantiles"] = """
WITH vals AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
b AS (
    SELECT CASE WHEN v <= 31 THEN v
                ELSE length(bin(v)) * 16 + (v >> (length(bin(v)) - 5)) - 16
           END AS bucket
    FROM vals
),
h AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
cum AS (
    SELECT bucket,
           sum(c) OVER (ORDER BY bucket) AS cum,
           sum(c) OVER () AS n
    FROM h
),
qs AS (SELECT * FROM (VALUES (50, 100), (90, 100), (99, 100)) AS t(qn, qd)),
pick AS (
    SELECT qn, qd, min(bucket) AS bucket
    FROM qs JOIN cum ON cum >= (n * qn + qd - 1) // qd
    GROUP BY qn, qd
)
SELECT CAST(qn AS BIGINT) AS q_num,
       CAST(qd AS BIGINT) AS q_den,
       CAST(CASE WHEN bucket <= 31 THEN bucket
                 ELSE (bucket % 16 + 16) * (1::BIGINT << CAST(bucket // 16 - 5 AS INT))
            END AS BIGINT) AS est
FROM pick
"""

# q127: the same chained conditional-min derivation as the Spark plan.
ORACLE_SQL["q127_funnel"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS e,
           event_type
    FROM events
),
v AS (
    SELECT user_id, min(e) AS t_view FROM ev
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT ev.user_id, min(e) AS t_click
    FROM ev JOIN v ON ev.user_id = v.user_id
    WHERE event_type = 'click' AND e >= t_view AND e <= t_view + 86400
    GROUP BY ev.user_id
),
p AS (
    SELECT ev.user_id, min(e) AS t_purchase
    FROM ev JOIN c ON ev.user_id = c.user_id
    WHERE event_type = 'purchase' AND e >= t_click AND e <= t_click + 86400
    GROUP BY ev.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""

ORACLE_SQL["q128_cohort_retention"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(floor(extract(epoch FROM ts)) / 604800) AS BIGINT) AS week
    FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM ev)
SELECT cohort_week,
       week - cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
"""

# q129: strict 2-D domination in ONE global pass — the Spark side's
# bucket-local superset phase must be invisible in the output.
ORACLE_SQL["q129_skyline"] = """
WITH base AS (
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
flagged AS (
    SELECT o_orderkey, day, cents,
           min(cents) OVER (
               ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS pre,
           min(cents) OVER (PARTITION BY day) AS same
    FROM base
)
SELECT o_orderkey, day, cents
FROM flagged
WHERE (pre IS NULL OR pre > cents) AND same >= cents
"""

ORACLE_SQL["q131_max_concurrency"] = """
WITH iv AS (
    SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS s,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT)
               + 60 + CAST(event_id AS BIGINT) % 3600 AS e
    FROM events
),
d AS (
    SELECT s AS t, 1 AS delta FROM iv
    UNION ALL
    SELECT e AS t, -1 AS delta FROM iv
),
coll AS (SELECT t, delta, sum(delta) AS w FROM d GROUP BY t, delta),
run AS (
    SELECT t,
           sum(w) OVER (
               ORDER BY t, delta ROWS UNBOUNDED PRECEDING
           ) AS concurrent
    FROM coll
)
SELECT CAST(floor(t / 86400.0) AS BIGINT) AS day,
       CAST(max(concurrent) AS BIGINT) AS max_concurrent
FROM run GROUP BY 1
"""

ORACLE_SQL["q132_record_linkage"] = """
WITH c AS (
    SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
           CAST(c_nationkey AS BIGINT) AS nation,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 10, 6) AS name_prefix
    FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM c a JOIN c b
  ON a.nation = b.nation AND a.name_len = b.name_len
 AND a.name_prefix = b.name_prefix AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 2
"""

ORACLE_SQL["q133_scd2_intervals"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS e,
           CAST(event_id AS BIGINT) AS event_id
    FROM events
),
flag AS (
    SELECT *,
           CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS nr
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)
),
run AS (
    SELECT *,
           sum(nr) OVER (
               PARTITION BY user_id ORDER BY e, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS r
    FROM flag
),
runs AS (
    SELECT user_id, r, min(event_type) AS event_type,
           min(e) AS valid_from
    FROM run GROUP BY user_id, r
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY r
       ) AS valid_to
FROM runs
"""

ORACLE_SQL["q134_mad_outliers"] = """
WITH o AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
med AS (
    SELECT o_orderpriority, quantile_cont(cents, 0.5) AS med
    FROM o GROUP BY o_orderpriority
),
dev AS (
    SELECT o.o_orderpriority, med, abs(cents - med) AS dev
    FROM o JOIN med USING (o_orderpriority)
),
mad AS (
    SELECT o_orderpriority, min(med) AS med,
           quantile_cont(dev, 0.5) AS mad,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority, min(m.med) AS med, min(m.mad) AS mad,
       min(m.n_orders) AS n_orders,
       CAST(sum(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev d JOIN mad m USING (o_orderpriority)
GROUP BY d.o_orderpriority
"""

ORACLE_SQL["q135_ewma_smoothing"] = """
WITH ev AS (
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS e,
           CAST(value AS DOUBLE) AS value
    FROM events
),
arr AS (
    SELECT event_id, user_id,
           list(value) OVER (
               PARTITION BY user_id ORDER BY e, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW
           ) AS l
    FROM ev
)
SELECT event_id, user_id,
       list_reduce(l, (a, b) -> (a + b) / 2.0) AS ewma
FROM arr
"""


def _morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The morton_key bit interleave unrolled for DuckDB (same 32-term
    shift/and/or tree as functions/layout.py:morton_key)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


ORACLE_SQL["q136_zorder_key"] = f"""
WITH base AS (
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               AS day,
           CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) / 100000.0)
               AS BIGINT) AS kbucket
    FROM orders
)
SELECT o_orderkey, day, kbucket,
       CAST({_morton_sql('day', 'kbucket')} AS BIGINT) AS zkey
FROM base
"""

ORACLE_SQL["q137_shortest_paths"] = """
WITH RECURSIVE eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst,
           CAST(l_quantity AS BIGINT) AS w
    FROM lineitem WHERE l_quantity < 10
),
e AS (SELECT src, dst, min(w) AS w FROM eraw GROUP BY src, dst),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 500 = 0),
walk(node, dist, hops) AS (
    SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
    UNION ALL
    SELECT e.dst, walk.dist + e.w, walk.hops + 1
    FROM walk JOIN e ON walk.node = e.src
    WHERE walk.hops < 4
)
SELECT node, min(dist) AS dist FROM walk GROUP BY node
"""

ORACLE_SQL["q138_kcore"] = """
WITH e0 AS (
    SELECT DISTINCT u, v FROM (
        SELECT CAST(l_partkey % 2000 AS BIGINT) AS u,
               CAST(2000 + l_suppkey % 2000 AS BIGINT) AS v
        FROM lineitem
        UNION ALL
        SELECT CAST(2000 + l_suppkey % 2000 AS BIGINT) AS u,
               CAST(l_partkey % 2000 AS BIGINT) AS v
        FROM lineitem
    ) s WHERE u <> v
),
k1 AS (SELECT u FROM e0 GROUP BY u HAVING count(*) >= 4),
e1 AS (
    SELECT e0.u, e0.v FROM e0
    JOIN k1 a ON e0.u = a.u JOIN k1 b ON e0.v = b.u
),
k2 AS (SELECT u FROM e1 GROUP BY u HAVING count(*) >= 4),
e2 AS (
    SELECT e1.u, e1.v FROM e1
    JOIN k2 a ON e1.u = a.u JOIN k2 b ON e1.v = b.u
),
k3 AS (SELECT u FROM e2 GROUP BY u HAVING count(*) >= 4),
e3 AS (
    SELECT e2.u, e2.v FROM e2
    JOIN k3 a ON e2.u = a.u JOIN k3 b ON e2.v = b.u
)
SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
FROM e3 GROUP BY u
"""


def _profile_col_sql(c: str) -> str:
    return f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_val,
       max(CAST({c} AS VARCHAR)) AS max_val
FROM prof"""


ORACLE_SQL["q139_column_profile"] = (
    """
WITH prof AS (
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           o_orderstatus, o_orderpriority,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               AS order_day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
"""
    + "\nUNION ALL\n".join(
        _profile_col_sql(c)
        for c in (
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "order_day",
            "cents",
        )
    )
)

ORACLE_SQL["q141_interval_overlap_join"] = """
WITH iv AS (
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS s,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT)
               + 60 + CAST(event_id AS BIGINT) % 3600 AS e
    FROM events
),
l AS (SELECT * FROM iv WHERE event_id % 7 = 0),
r AS (SELECT * FROM iv WHERE event_id % 7 = 3)
SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
       CAST(least(l.e, r.e) - greatest(l.s, r.s) AS BIGINT) AS overlap_s
FROM l JOIN r ON l.s <= r.e AND r.s <= l.e
"""

ORACLE_SQL["q142_systematic_sample"] = """
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(length(text) AS BIGINT) AS weight
    FROM documents
),
cum AS (
    SELECT doc_id, weight,
           CAST(sum(weight) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - weight AS BIGINT) AS "offset"
    FROM d
)
SELECT doc_id, weight, "offset",
       (weight > 0
        AND floor(("offset" + weight - 1) / 5000.0)
            > floor(("offset" - 1) / 5000.0)) AS selected
FROM cum
"""

# q143: per-frame dhash bits re-derived from code points (q123
# arithmetic) on each 7-byte-shifted 288-byte window, then the same
# lag + xor + popcount.
ORACLE_SQL["q143_scene_changes"] = """
WITH raster AS (
    SELECT doc_id AS media_id,
           substring(
               repeat(text, CAST(floor(309.0 / len(text)) AS INT) + 1),
               1, 309
           ) AS tiled
    FROM documents
    WHERE len(text) > 0 AND len(text) = octet_length(encode(text))
),
fr AS (
    SELECT media_id, CAST(f AS BIGINT) AS frame_no,
           substr(tiled, CAST(1 + 7 * f AS INT), 288) AS r
    FROM (SELECT media_id, tiled, unnest(range(0, 4)) AS f FROM raster)
),
hashed AS (
    SELECT media_id, frame_no,
           CAST(list_sum(list_transform(range(0, 56), k ->
               CASE WHEN
                   ascii(substr(r, CAST(36*(k//7) + ((k%7)*18)//8 + 1 AS INT), 1))
                 > ascii(substr(r, CAST(36*(k//7) + (((k%7)+1)*18)//8 + 1 AS INT), 1))
               THEN 1::BIGINT << CAST(k AS INT) ELSE 0::BIGINT END
           )) AS BIGINT) AS dhash
    FROM fr
),
lagd AS (
    SELECT media_id, frame_no, dhash,
           lag(dhash) OVER (PARTITION BY media_id ORDER BY frame_no) AS prev
    FROM hashed
)
SELECT media_id, frame_no, dhash,
       CAST(CASE WHEN prev IS NULL THEN NULL
                 ELSE bit_count(xor(dhash, prev)) END AS BIGINT) AS hamming,
       CASE WHEN prev IS NULL THEN NULL
            ELSE bit_count(xor(dhash, prev)) >= 10 END AS scene_change
FROM lagd
"""


def _walk_step_sql(step: int) -> str:
    p, s, w = f"w{step - 1}", f"s{step}", f"w{step}"
    return f"""
{s} AS (
    SELECT seed, walk_id, path,
           min(('0x' || substr(md5(concat(walk_id, '|', {step}, '|', dst)),
                1, 7))::BIGINT * 8192 + dst) AS hk
    FROM {p} LEFT JOIN e ON {p}.cur = e.src
    GROUP BY seed, walk_id, path
),
{w} AS (
    SELECT seed, walk_id, hk % 8192 AS cur,
           CASE WHEN hk IS NULL THEN path
                ELSE path || ',' || CAST(hk % 8192 AS VARCHAR) END AS path
    FROM {s}
)"""


ORACLE_SQL["q144_random_walks"] = (
    """
WITH e AS (
    SELECT DISTINCT CAST(l_orderkey % 5000 AS BIGINT) AS src,
                    CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 200 = 0),
w0 AS (
    SELECT node AS seed, CAST(wid AS BIGINT) AS walk_id, node AS cur,
           CAST(node AS VARCHAR) AS path
    FROM seeds CROSS JOIN (VALUES (0), (1), (2)) t(wid)
),"""
    + ",".join(_walk_step_sql(s) for s in (1, 2, 3, 4))
    + "\nSELECT seed, walk_id, path FROM w4"
)

ORACLE_SQL["q145_bigram_lm"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
pr AS (
    SELECT unnest(list_transform(
               range(1, len(toks)), i -> [toks[i], toks[i + 1]]
           )) AS p
    FROM tok WHERE len(toks) >= 2
),
pairs AS (
    SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c2
    FROM pr GROUP BY 1, 2
),
ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM pairs GROUP BY w1)
SELECT pairs.w1, w2, c2, c1,
       CAST(floor(1000000.0 * c2 / c1) AS BIGINT) AS pmill
FROM pairs JOIN ctx ON pairs.w1 = ctx.w1
WHERE c2 >= 3
"""

# qd25: one micro-batch means every state snapshot is the exact
# per-day histogram — the streaming plumbing must be invisible.
ORACLE_SQL["qd25_streaming_hdr_quantiles"] = """
WITH vals AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
b AS (
    SELECT day,
           CASE WHEN v <= 31 THEN v
                ELSE length(bin(v)) * 16 + (v >> (length(bin(v)) - 5)) - 16
           END AS bucket
    FROM vals
)
SELECT day, CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY day, bucket
"""

# q146: 68451041280.0 = (k-1)*2^28 for k=256 — the KMV estimator
# constant; the oracle replays every trim and the same floor chain.
ORACLE_SQL["q146_kmv_sketch"] = """
WITH base AS (
    SELECT DISTINCT o_orderpriority AS grp,
           ('0x' || substr(md5(CAST(CAST(o_custkey AS BIGINT) AS VARCHAR)),
               1, 7))::BIGINT AS h
    FROM orders
),
sk AS (
    SELECT grp, h FROM base
    QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= 256
),
perg AS (
    SELECT grp, CAST(count(*) AS BIGINT) AS n_sketch,
           max(h) AS kth_hash,
           CAST(CASE WHEN count(*) < 256 THEN count(*)
                     ELSE floor(68451041280.0 / max(h)) END AS BIGINT)
               AS est_distinct
    FROM sk GROUP BY grp
),
all_sk AS (
    SELECT h FROM (SELECT DISTINCT h FROM sk)
    QUALIFY row_number() OVER (ORDER BY h) <= 256
),
perall AS (
    SELECT 'ALL' AS grp, CAST(count(*) AS BIGINT) AS n_sketch,
           max(h) AS kth_hash,
           CAST(CASE WHEN count(*) < 256 THEN count(*)
                     ELSE floor(68451041280.0 / max(h)) END AS BIGINT)
               AS est_distinct
    FROM all_sk
),
a AS (SELECT h FROM sk WHERE grp = '1-URGENT'),
b AS (SELECT h FROM sk WHERE grp = '5-LOW'),
m AS (
    SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
    )
    QUALIFY row_number() OVER (ORDER BY h) <= 256
),
mm AS (SELECT count(*) AS n_m, max(h) AS kth FROM m),
mt AS (
    SELECT count(*) AS matches FROM m
    WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
),
inter AS (
    SELECT 'INTER:1-URGENT&5-LOW' AS grp,
           CAST(matches AS BIGINT) AS n_sketch,
           kth AS kth_hash,
           CAST(CASE WHEN n_m < 256 THEN matches
                     ELSE floor((matches
                          * CAST(floor(68451041280.0 / kth) AS BIGINT))
                          / 256.0)
                END AS BIGINT) AS est_distinct
    FROM mm, mt
)
SELECT * FROM perg
UNION ALL SELECT * FROM perall
UNION ALL SELECT * FROM inter
"""

ORACLE_SQL["q147_negative_sampling"] = """
WITH ranked AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS r,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM documents
),
drawn AS (
    SELECT doc_id AS anchor_doc, CAST(j AS BIGINT) AS j,
           (r * 2654435761 + j * 40503 + 7) % n AS p_rank, r
    FROM ranked, unnest(range(0, 4)) AS t(j)
)
SELECT anchor_doc, j, p.doc_id AS neg_doc
FROM drawn JOIN ranked p ON drawn.p_rank = p.r
WHERE drawn.p_rank <> drawn.r
"""

ORACLE_SQL["q148_harmonic_centrality"] = """
WITH RECURSIVE eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
e AS (SELECT DISTINCT src, dst FROM eraw),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 0),
walk(source, node, hops) AS (
    SELECT node, node, 0 FROM seeds
    UNION ALL
    SELECT walk.source, e.dst, hops + 1
    FROM walk JOIN e ON walk.node = e.src
    WHERE hops < 3
),
md AS (SELECT source, node, min(hops) AS d FROM walk GROUP BY source, node)
SELECT node,
       CAST(sum(CAST(floor(60 / d) AS BIGINT)) AS BIGINT) AS h60,
       CAST(count(*) AS BIGINT) AS n_src
FROM md WHERE d > 0 GROUP BY node
"""

# q149: identical max-of-w-md5-draws priority; range(0, w) mirrors
# Spark sequence(0, w-1); '#'-joined key||index string is byte-equal.
ORACLE_SQL["q149_weighted_reservoir"] = """
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(1 + CAST(n_chars AS BIGINT) % 8 AS BIGINT) AS weight
    FROM documents
),
pr AS (
    SELECT doc_id, lang, weight,
           list_max(list_transform(
               range(0, CAST(weight AS INT)),
               i -> ('0x' || substr(md5(doc_id::VARCHAR || '#' || i::VARCHAR),
                                    1, 7))::BIGINT
           )) AS priority
    FROM d
),
r AS (
    SELECT doc_id, lang, weight, priority,
           row_number() OVER (
               PARTITION BY lang ORDER BY priority DESC, doc_id ASC
           ) AS rn
    FROM pr
)
SELECT doc_id, lang, weight, priority, CAST(rn AS INTEGER) AS sample_rank
FROM r WHERE rn <= 5
"""

# q150: Mann-Whitney rank-sum with x2 integer midranks; one window
# over <=997 distinct scores, single final int/int division.
ORACLE_SQL["q150_roc_auc"] = """
WITH d AS (
    SELECT CAST(n_chars AS BIGINT) % 997 AS s, (lang = 'en') AS y
    FROM documents
),
per AS (
    SELECT s, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
    FROM d GROUP BY s
),
rk AS (
    SELECT n, n_pos,
           CAST(COALESCE(sum(n) OVER (
               ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS below
    FROM per
),
t AS (
    SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
           CAST(sum(n) - sum(n_pos) AS BIGINT) AS n_neg,
           CAST(sum(n_pos * (2 * below + n + 1)) AS BIGINT) AS rpos2
    FROM rk
)
SELECT n_pos, n_neg,
       CAST(rpos2 - n_pos * (n_pos + 1) AS BIGINT) AS auc_num2,
       CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
       CAST(rpos2 - n_pos * (n_pos + 1) AS DOUBLE)
           / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM t
"""

# q151: integer TVD numerator over the common denominator 2*N_a*N_b;
# repo-standard whitespace tokenizer.
ORACLE_SQL["q151_corpus_drift"] = r"""
WITH norm AS (
    SELECT source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents WHERE source IN ('src0', 'src1')
),
t AS (
    SELECT source,
           unnest(list_filter(string_split(s, ' '), x -> x <> '')) AS token
    FROM norm
),
c AS (
    SELECT token,
           CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM t GROUP BY token
),
tots AS (
    SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb FROM c
),
f AS (
    SELECT CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
           CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
           CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_common,
           CAST(sum(abs(ca * tb - cb * ta)) AS BIGINT) AS tvd_num,
           CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b
    FROM c, tots
)
SELECT n_a, n_b, vocab_a, vocab_b, vocab_common, tvd_num,
       CAST(2 * n_a * n_b AS BIGINT) AS tvd_den,
       CAST(tvd_num AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE) AS tvd,
       CAST(vocab_common AS DOUBLE)
           / CAST(vocab_a + vocab_b - vocab_common AS DOUBLE) AS vocab_jaccard
FROM f
"""

# q152: same integer floor-division bin edges; width = ceil(span/16).
ORACLE_SQL["q152_equiwidth_bins"] = """
WITH d AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
b AS (
    SELECT CAST(min(v) AS BIGINT) AS lo_all,
           CAST(ceil((max(v) - min(v) + 1) / 16.0) AS BIGINT) AS w
    FROM d
)
SELECT (v - lo_all) // w AS bin,
       CAST(lo_all + ((v - lo_all) // w) * w AS BIGINT) AS lo,
       CAST(lo_all + ((v - lo_all) // w + 1) * w - 1 AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(v) AS BIGINT) AS sum_value
FROM d, b
GROUP BY 1, 2, 3
"""

# q153: z = (n*x - S)/sqrt(nQ - S^2) — exact-integer inputs, one IEEE
# divide over one IEEE sqrt; zero-variance groups -> NULL.
ORACLE_SQL["q153_zscore_normalize"] = """
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(n_chars AS BIGINT) AS x
    FROM documents
),
s AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS qx
    FROM d GROUP BY lang
)
SELECT d.doc_id, d.lang, d.x AS n_chars,
       CASE WHEN n * qx - sx * sx > 0 THEN
           CAST(n * x - sx AS DOUBLE) / sqrt(CAST(n * qx - sx * sx AS DOUBLE))
       END AS z
FROM d JOIN s ON d.lang = s.lang
"""

# q154: md5-mod-5 fold assignment summarized per (fold, lang).
ORACLE_SQL["q154_kfold_assign"] = """
SELECT CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
             % 10000) % 5 AS INTEGER) AS fold,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(CAST(doc_id AS BIGINT)) AS BIGINT) AS min_doc,
       CAST(max(CAST(doc_id AS BIGINT)) AS BIGINT) AS max_doc
FROM documents
GROUP BY 1, 2
"""

# q155: brute-force all-pairs shingle-set Jaccard — the completeness
# oracle for the prefix-filtered plan (same integer threshold).
ORACLE_SQL["q155_jaccard_join"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), x -> x <> '') AS toks
    FROM norm
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           ELSE [] END AS gs
    FROM tok
),
hashed AS (
    SELECT doc_id,
           list_distinct(list_transform(
               gs, g -> ('0x' || substr(md5(g), 1, 7))::BIGINT)) AS hs
    FROM grams
),
d AS (
    SELECT CAST(doc_id AS BIGINT) AS id, hs AS gs, len(hs) AS n
    FROM hashed WHERE len(hs) > 0
),
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS inter,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
    FROM d a JOIN d b ON a.id < b.id
)
SELECT id_a, id_b, inter, n_a, n_b,
       CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS jaccard
FROM pairs
WHERE 100 * inter >= 60 * (n_a + n_b - inter)
"""

# q156: brute-force inverted-index bigram TF cosine (max_df=100 is
# inactive at this scale but mirrored for contract parity).
ORACLE_SQL["q156_tf_cosine_join"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), x -> x <> '') AS toks
    FROM norm
),
bi AS (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1])
           ELSE [] END) AS t
    FROM tok
),
tf AS (
    SELECT CAST(doc_id AS BIGINT) AS id, t,
           CAST(count(*) AS BIGINT) AS tf
    FROM bi GROUP BY 1, 2
),
kept AS (
    SELECT tf.* FROM tf
    JOIN (SELECT t FROM tf GROUP BY t HAVING count(*) <= 100) ok USING (t)
),
norms AS (
    SELECT id, CAST(sum(tf * tf) AS BIGINT) AS q FROM kept GROUP BY id
),
dots AS (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
    FROM kept a JOIN kept b ON a.t = b.t AND a.id < b.id
    GROUP BY 1, 2
)
SELECT id_a, id_b, dot, na.q AS q_a, nb.q AS q_b,
       CAST(dot AS DOUBLE) / sqrt(CAST(na.q * nb.q AS DOUBLE)) AS cosine
FROM dots
JOIN norms na ON dots.id_a = na.id
JOIN norms nb ON dots.id_b = nb.id
WHERE (100 * dot) * (100 * dot) >= 70 * 70 * na.q * nb.q
"""

# q157: same canonical undirected dedup, hash-partition labels,
# integer 4m*e_in - d^2 per community.
ORACLE_SQL["q157_modularity"] = """
WITH eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
und AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM eraw WHERE src <> dst
),
nodes AS (
    SELECT DISTINCT node FROM (
        SELECT src AS node FROM eraw UNION ALL SELECT dst FROM eraw
    )
),
lab AS (SELECT node AS n, CAST(node % 16 AS BIGINT) AS c FROM nodes),
m_row AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
tagged AS (
    SELECT la.c AS ca, lb.c AS cb
    FROM und JOIN lab la ON und.a = la.n JOIN lab lb ON und.b = lb.n
),
deg AS (
    SELECT c, CAST(count(*) AS BIGINT) AS d_tot FROM (
        SELECT ca AS c FROM tagged UNION ALL SELECT cb FROM tagged
    ) GROUP BY c
),
ein AS (
    SELECT ca AS c, CAST(count(*) AS BIGINT) AS e_in
    FROM tagged WHERE ca = cb GROUP BY ca
),
nn AS (SELECT c, CAST(count(*) AS BIGINT) AS n_nodes FROM lab GROUP BY c)
SELECT nn.c AS label, nn.n_nodes,
       COALESCE(deg.d_tot, 0) AS d_tot,
       COALESCE(ein.e_in, 0) AS e_in,
       CAST(4 * m * COALESCE(ein.e_in, 0)
            - COALESCE(deg.d_tot, 0) * COALESCE(deg.d_tot, 0) AS BIGINT)
           AS q_num,
       CAST(4 * m * COALESCE(ein.e_in, 0)
            - COALESCE(deg.d_tot, 0) * COALESCE(deg.d_tot, 0) AS DOUBLE)
           / CAST(4 * m * m AS DOUBLE) AS q_contrib
FROM nn LEFT JOIN deg ON nn.c = deg.c LEFT JOIN ein ON nn.c = ein.c, m_row
"""

# q158: identical mid-node self-join + direct-neighbor anti-join.
ORACLE_SQL["q158_two_hop"] = """
WITH eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
e AS (SELECT DISTINCT src AS s, dst AS d FROM eraw WHERE src <> dst),
h2 AS (
    SELECT DISTINCT e1.s AS s, e2.d AS y
    FROM e e1 JOIN e e2 ON e1.d = e2.s
    WHERE e1.s <> e2.d
),
indirect AS (
    SELECT h2.s, h2.y FROM h2
    ANTI JOIN e ON h2.s = e.s AND h2.y = e.d
)
SELECT s AS node, CAST(count(*) AS BIGINT) AS n_two_hop
FROM indirect GROUP BY s
"""


# q159: brute-force all-pairs Hamming over the q37 signatures — the
# completeness oracle for the pigeonhole block join.
ORACLE_SQL["q159_simhash_join"] = (
    "WITH sims AS ("
    + ORACLE_SQL["q37_simhash"]
    + """)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""
)


# q161: identical per-user range join + struct-ordered min/max.
ORACLE_SQL["q161_attribution"] = """
WITH base AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS t,
           event_type AS et,
           CAST(event_id AS BIGINT) AS eid
    FROM events
),
conv AS (
    SELECT user_id, eid AS conversion_id, t AS t_conv
    FROM base WHERE et = 'purchase'
),
touch AS (
    SELECT user_id, eid AS touch_id, t AS t_touch
    FROM base WHERE et IN ('view', 'click')
),
credited AS (
    SELECT conversion_id,
           CAST(count(*) AS BIGINT) AS n_touches,
           min({'t_touch': t_touch, 'touch_id': touch_id}) AS f,
           max({'t_touch': t_touch, 'touch_id': touch_id}) AS l
    FROM conv JOIN touch USING (user_id)
    WHERE t_touch <= t_conv AND t_touch >= t_conv - 604800
    GROUP BY conversion_id
)
SELECT conv.conversion_id, conv.user_id, conv.t_conv,
       COALESCE(credited.n_touches, 0) AS n_touches,
       credited.f.touch_id AS first_touch_id,
       credited.f.t_touch AS first_touch_ts,
       credited.l.touch_id AS last_touch_id,
       credited.l.t_touch AS last_touch_ts
FROM conv LEFT JOIN credited USING (conversion_id)
"""


# q162: the q107 oracle (k widened to 20) as the candidate CTE, then
# the same integer Borda fusion windows.
ORACLE_SQL["q162_rank_fusion"] = (
    "WITH cand AS (\n"
    + ORACLE_SQL["q107_bm25_topk"].replace(
        "WHERE rank <= 10", "WHERE rank <= 20"
    )
    + """),
pri AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS _prior
    FROM documents
),
j AS (
    SELECT c.query_id, c.doc_id, c.rank, p._prior
    FROM cand c JOIN pri p USING (doc_id)
),
counted AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS _n FROM j GROUP BY query_id
),
qr AS (
    SELECT j.*,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY _prior DESC, doc_id ASC
           ) AS BIGINT) AS prior_rank
    FROM j
),
f AS (
    SELECT qr.query_id, qr.doc_id, qr.rank, qr.prior_rank,
           CAST(2 * counted._n - qr.rank - qr.prior_rank AS BIGINT) AS borda
    FROM qr JOIN counted USING (query_id)
)
SELECT query_id, doc_id, rank, prior_rank, borda,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY borda DESC, doc_id ASC
       ) AS BIGINT) AS fused_rank
FROM f
QUALIFY fused_rank <= 10
"""
)


# q163: rebuild the identical md5 counter table and min-probe it.
ORACLE_SQL["q163_count_min"] = """
WITH ev AS (SELECT CAST(user_id AS BIGINT) AS user_id FROM events),
cells AS (
    SELECT d,
           (('0x' || substr(md5(d::VARCHAR || '#' || user_id::VARCHAR),
                            1, 7))::BIGINT % 256) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM ev, (SELECT unnest(range(0, 4)) AS d)
    GROUP BY 1, 2
),
keys AS (SELECT DISTINCT user_id FROM ev WHERE user_id % 20 = 0),
probes AS (
    SELECT user_id, d,
           (('0x' || substr(md5(d::VARCHAR || '#' || user_id::VARCHAR),
                            1, 7))::BIGINT % 256) AS bucket
    FROM keys, (SELECT unnest(range(0, 4)) AS d)
),
est AS (
    SELECT probes.user_id,
           CAST(min(COALESCE(cells.cnt, 0)) AS BIGINT) AS est
    FROM probes LEFT JOIN cells USING (d, bucket)
    GROUP BY probes.user_id
),
tc AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
    FROM ev GROUP BY user_id
)
SELECT est.user_id, est.est, tc.true_cnt
FROM est JOIN tc USING (user_id)
"""


# q164: identical per-user lag in (t, eid) order + floor(1e6*c/ctx).
ORACLE_SQL["q164_event_transitions"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS u,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS t,
           CAST(event_id AS BIGINT) AS eid,
           event_type AS et
    FROM events
),
lagged AS (
    SELECT u, et,
           lag(et) OVER (PARTITION BY u ORDER BY t, eid) AS prev_et
    FROM ev
),
pairs AS (
    SELECT prev_et AS from_type, et AS to_type,
           CAST(count(*) AS BIGINT) AS c
    FROM lagged WHERE prev_et IS NOT NULL
    GROUP BY 1, 2
),
ctx AS (
    SELECT from_type, CAST(sum(c) AS BIGINT) AS ctx
    FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.c, ctx.ctx,
       CAST(floor(1000000.0 * p.c / ctx.ctx) AS BIGINT) AS pmill
FROM pairs p JOIN ctx USING (from_type)
"""


# qd26: single-batch snapshot == the q163 counter table.
ORACLE_SQL["qd26_streaming_count_min"] = """
WITH ev AS (SELECT CAST(user_id AS BIGINT) AS user_id FROM events)
SELECT d,
       (('0x' || substr(md5(d::VARCHAR || '#' || user_id::VARCHAR),
                        1, 7))::BIGINT % 256) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM ev, (SELECT unnest(range(0, 4)) AS d)
GROUP BY 1, 2
"""


# q165: identical span cut / first-occurrence keep / ordered rebuild.
ORACLE_SQL["q165_span_dedup_rewrite"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT CAST(doc_id AS BIGINT) AS id,
           list_filter(string_split(s, ' '), t -> t <> '') AS toks
    FROM norm
),
spans AS (
    SELECT id, CAST(i AS INT) AS idx,
           array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ')
               AS span
    FROM (
        SELECT id, toks,
               unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i
        FROM tok WHERE len(toks) > 0
    )
),
keeper AS (
    SELECT span, min({'id': id, 'idx': idx}) AS k FROM spans GROUP BY span
),
kept AS (
    SELECT s.id, s.idx, s.span
    FROM spans s JOIN keeper USING (span)
    WHERE s.id = k.id AND s.idx = k.idx
),
stats AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY id
),
rebuilt AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(span, ' ' ORDER BY idx) AS new_text
    FROM kept GROUP BY id
)
SELECT stats.id AS doc_id, stats.n_spans,
       COALESCE(rebuilt.n_kept, 0) AS n_kept,
       CAST(length(COALESCE(rebuilt.new_text, '')) AS BIGINT) AS new_len,
       COALESCE(rebuilt.new_text, '') AS new_text
FROM stats LEFT JOIN rebuilt USING (id)
"""


# q166: the identical 9+3+1 integer sums in long form.
ORACLE_SQL["q166_gram_matrix"] = """
WITH d AS (
    SELECT CAST(1 AS BIGINT) AS one,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
),
w AS (
    SELECT
        CAST(sum(one * one) AS BIGINT) AS xx00,
        CAST(sum(one * qty) AS BIGINT) AS xx01,
        CAST(sum(one * disc_pct) AS BIGINT) AS xx02,
        CAST(sum(qty * one) AS BIGINT) AS xx10,
        CAST(sum(qty * qty) AS BIGINT) AS xx11,
        CAST(sum(qty * disc_pct) AS BIGINT) AS xx12,
        CAST(sum(disc_pct * one) AS BIGINT) AS xx20,
        CAST(sum(disc_pct * qty) AS BIGINT) AS xx21,
        CAST(sum(disc_pct * disc_pct) AS BIGINT) AS xx22,
        CAST(sum(one * y) AS BIGINT) AS xy0,
        CAST(sum(qty * y) AS BIGINT) AS xy1,
        CAST(sum(disc_pct * y) AS BIGINT) AS xy2,
        CAST(count(*) AS BIGINT) AS n
    FROM d
)
SELECT CAST(t.r AS BIGINT) AS "row", CAST(t.c AS BIGINT) AS col, t.v AS value
FROM w, LATERAL (VALUES
    (0, 0, xx00), (0, 1, xx01), (0, 2, xx02),
    (1, 0, xx10), (1, 1, xx11), (1, 2, xx12),
    (2, 0, xx20), (2, 1, xx21), (2, 2, xx22),
    (0, -1, xy0), (1, -1, xy1), (2, -1, xy2),
    (-1, -1, n)
) AS t(r, c, v)
"""


# q168: recursive path enumeration — length-d paths at the min
# distance d ARE the shortest paths, so count(*) == sigma.
ORACLE_SQL["q168_path_counts"] = """
WITH RECURSIVE eraw AS (
    SELECT CAST(l_orderkey % 5000 AS BIGINT) AS src,
           CAST(l_partkey % 5000 AS BIGINT) AS dst
    FROM lineitem WHERE l_quantity < 10
),
e AS (SELECT DISTINCT src, dst FROM eraw),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 0),
walk(source, node, hops) AS (
    SELECT node, node, 0 FROM seeds
    UNION ALL
    SELECT walk.source, e.dst, hops + 1
    FROM walk JOIN e ON walk.node = e.src
    WHERE hops < 3
),
md AS (
    SELECT source, node, min(hops) AS d FROM walk GROUP BY source, node
)
SELECT w.source, w.node, CAST(md.d AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS sigma
FROM walk w
JOIN md ON w.source = md.source AND w.node = md.node AND w.hops = md.d
GROUP BY w.source, w.node, md.d
"""


# q171: identical md5 bucket + sign-bit arithmetic.
ORACLE_SQL["q171_feature_hash"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
occ AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(list_filter(string_split(s, ' '), t -> t <> '')) AS t
    FROM norm
),
hashed AS (
    SELECT doc_id,
           ('0x' || substr(md5(t), 1, 7))::BIGINT AS h
    FROM occ
)
SELECT doc_id, h % 1024 AS bucket,
       CAST(sum(CASE WHEN (h // 1024) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
           AS value
FROM hashed
GROUP BY doc_id, h % 1024
HAVING sum(CASE WHEN (h // 1024) % 2 = 0 THEN 1 ELSE -1 END) <> 0
"""

# q172: identical integer share/salt arithmetic, same total order.
ORACLE_SQL["q172_skew_report"] = """
WITH c AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
SELECT user_id, cnt, total,
       CAST(floor(1000000 * cnt / total) AS BIGINT) AS share_ppm,
       CAST(greatest(1, ceil(32 * cnt / total)) AS BIGINT) AS salt_factor
FROM c, t
ORDER BY cnt DESC, user_id ASC
LIMIT 20
"""


# q174: DuckDB dayofweek is 0-6 (Sunday=0); Spark dayofweek is 1-7
# (Sunday=1) — the +1 aligns them.
ORACLE_SQL["q174_seasonal_profile"] = """
WITH c AS (
    SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT dow, hod,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_cents,
       CAST(greatest(
           max(cents) * count(*) - sum(cents),
           sum(cents) - min(cents) * count(*)
       ) AS BIGINT) AS peak_dev_num
FROM c GROUP BY dow, hod
"""

ORACLE_SQL["q175_data_quality"] = """
SELECT 'fk_orphan_lineitem_orders' AS check_name,
       CAST((SELECT count(*) FROM lineitem
             ANTI JOIN orders ON l_orderkey = o_orderkey) AS BIGINT)
           AS violations
UNION ALL
SELECT 'pk_duplicate_orders',
       CAST((SELECT count(*) FROM (
           SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1
       )) AS BIGINT)
UNION ALL
SELECT 'domain_qty_nonpositive',
       CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
UNION ALL
SELECT 'domain_discount_range',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
UNION ALL
SELECT 'null_shipdate',
       CAST((SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL)
           AS BIGINT)
UNION ALL
SELECT 'row_count_lineitem',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
"""


# qd27: qd15's linkage CTEs + spend-day attribution + running window.
ORACLE_SQL["qd27_daily_balances"] = f"""
WITH days AS (
    SELECT tx_id AS dtx,
           CAST(CAST(timestamp AS BIGINT) // 86400 AS BIGINT) AS day
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credits AS (
    SELECT o2.addr, days.day, CAST(o2.oval AS BIGINT) AS delta
    FROM o2 JOIN days ON o2.otx = days.dtx
),
ins AS (
    SELECT tx_id AS itx,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
debits AS (
    SELECT o2.addr, days.day, CAST(-o2.oval AS BIGINT) AS delta
    FROM ins
    JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    JOIN days ON ins.itx = days.dtx
),
net AS (
    SELECT addr, day, CAST(sum(delta) AS BIGINT) AS net_value
    FROM (SELECT * FROM credits UNION ALL SELECT * FROM debits)
    GROUP BY addr, day
)
SELECT addr, day, net_value,
       CAST(sum(net_value) OVER (
           PARTITION BY addr ORDER BY day
           ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS balance
FROM net
"""


# q176: q36's candidate CTE + slot-agreement estimate + exact shingle
# Jaccard, all from the shared md5 permutation constants.
_Q176_MATCHES = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
)
ORACLE_SQL["q176_minhash_estimate"] = f"""
WITH cand AS (
{ORACLE_SQL["q36_lsh_pairs"]}
),
sh2 AS (
{ORACLE_SQL["q35_minhash_signatures"]}
),
hsets AS (
    WITH {_TEXT_CTE}
    SELECT doc_id, hs FROM sh
)
SELECT cand.id_a, cand.id_b,
       CAST({_Q176_MATCHES} AS BIGINT) AS matches,
       CAST(8 AS BIGINT) AS n_perms,
       CAST({_Q176_MATCHES} AS DOUBLE) / 8.0 AS est,
       CAST(len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS inter,
       CAST(len(list_distinct(ha.hs || hb.hs)) AS BIGINT) AS uni,
       CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
           / CAST(len(list_distinct(ha.hs || hb.hs)) AS DOUBLE) AS exact,
       CAST({_Q176_MATCHES} AS DOUBLE) / 8.0
       - CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
           / CAST(len(list_distinct(ha.hs || hb.hs)) AS DOUBLE) AS err
FROM cand
JOIN sh2 a ON cand.id_a = a.doc_id
JOIN sh2 b ON cand.id_b = b.doc_id
JOIN hsets ha ON cand.id_a = ha.doc_id
JOIN hsets hb ON cand.id_b = hb.doc_id
"""


ORACLE_SQL["q177_calibration_curve"] = """
WITH d AS (
    SELECT CAST(n_chars AS BIGINT) % 997 AS score, (lang = 'en') AS label
    FROM documents
)
SELECT score // 100 AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score,
       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS pos_rate
FROM d GROUP BY 1
"""


# q178: rebuild both md5 counter tables, min-of-rows inner product.
ORACLE_SQL["q178_cms_join_size"] = """
WITH oa AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
cb AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
sa AS (
    SELECT d,
           (('0x' || substr(md5(d::VARCHAR || '#' || k::VARCHAR),
                            1, 7))::BIGINT % 256) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM oa, (SELECT unnest(range(0, 4)) AS d) GROUP BY 1, 2
),
sb AS (
    SELECT d,
           (('0x' || substr(md5(d::VARCHAR || '#' || k::VARCHAR),
                            1, 7))::BIGINT % 256) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM cb, (SELECT unnest(range(0, 4)) AS d) GROUP BY 1, 2
),
ips AS (
    SELECT sa.d, CAST(sum(sa.cnt * sb.cnt) AS BIGINT) AS ip
    FROM sa JOIN sb USING (d, bucket) GROUP BY sa.d
)
SELECT CAST((SELECT min(ip) FROM ips) AS BIGINT) AS est_join_size,
       CAST((SELECT count(*) FROM oa JOIN cb USING (k)) AS BIGINT)
           AS true_join_size,
       CAST((SELECT count(*) FROM oa) AS BIGINT) AS n_orders,
       CAST((SELECT count(*) FROM cb) AS BIGINT) AS n_customers
"""


ORACLE_SQL["qd28_utxo_snapshot"] = f"""
WITH outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      atype: outputs[i].address_type,
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi,
           CAST(u.atype AS BIGINT) AS address_type,
           CAST(u.oval AS BIGINT) AS oval
    FROM outs
),
ins AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
utxo AS (
    SELECT o2.* FROM o2
    ANTI JOIN ins ON o2.otx = ins.u.stx AND o2.oi = ins.u.sidx
)
SELECT address_type,
       CAST(count(*) AS BIGINT) AS n_utxos,
       CAST(sum(oval) AS BIGINT) AS total_value,
       CAST(max(oval) AS BIGINT) AS max_value
FROM utxo GROUP BY address_type
"""

ORACLE_SQL["qd29_tx_fees"] = f"""
WITH fees AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(coalesce(list_sum(list_transform(inputs, x -> x.value)), 0)
                - coalesce(list_sum(list_transform(outputs, x -> x.value)), 0)
                AS BIGINT) AS fee
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
)
SELECT block_id,
       CAST(count(*) AS BIGINT) AS n_txs,
       CAST(sum(fee) AS BIGINT) AS total_fee,
       CAST(max(fee) AS BIGINT) AS max_fee
FROM fees GROUP BY block_id
"""

ORACLE_SQL["qd30_block_intervals"] = f"""
WITH b AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(timestamp AS BIGINT) AS ts
    FROM read_parquet('{_FIXTURE_DIR}/raw_blocks.parquet')
),
iv AS (
    SELECT CAST(ts // 86400 AS BIGINT) AS day,
           ts - lag(ts) OVER (ORDER BY block_id) AS gap
    FROM b
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap,
       CAST(max(gap) AS BIGINT) AS max_gap,
       CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_gap
FROM iv WHERE gap IS NOT NULL
GROUP BY day
"""


# qd31: qd16's recursive entity oracle as a CTE over qd27's daily
# ledger CTEs, singleton rule coalesced identically to qd17.
ORACLE_SQL["qd31_entity_daily_balances"] = f"""
WITH ents AS (
{ORACLE_SQL["qd16_cospend_entities"]}
),
days AS (
    SELECT tx_id AS dtx,
           CAST(CAST(timestamp AS BIGINT) // 86400 AS BIGINT) AS day
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credits AS (
    SELECT o2.addr, days.day, CAST(o2.oval AS BIGINT) AS delta
    FROM o2 JOIN days ON o2.otx = days.dtx
),
ins AS (
    SELECT tx_id AS itx,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
debits AS (
    SELECT o2.addr, days.day, CAST(-o2.oval AS BIGINT) AS delta
    FROM ins
    JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    JOIN days ON ins.itx = days.dtx
),
anet AS (
    SELECT addr, day, CAST(sum(delta) AS BIGINT) AS net_value
    FROM (SELECT * FROM credits UNION ALL SELECT * FROM debits)
    GROUP BY addr, day
),
joined AS (
    SELECT CAST(coalesce(ents.entity,
               ('0x' || substr(md5(anet.addr), 1, 7))::BIGINT) AS BIGINT)
               AS entity,
           anet.day, anet.net_value
    FROM anet LEFT JOIN ents ON anet.addr = ents.addr
),
enet AS (
    SELECT entity, day, CAST(sum(net_value) AS BIGINT) AS net_value
    FROM joined GROUP BY entity, day
)
SELECT entity, day, net_value,
       CAST(sum(net_value) OVER (
           PARTITION BY entity ORDER BY day ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS balance
FROM enet
"""


# q179: the day sketch computed DIRECTLY — merged hourly partials
# must agree hash-for-hash (losslessness of KMV union).
ORACLE_SQL["q179_window_distinct_merge"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day
    FROM events
),
base AS (
    SELECT DISTINCT day,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h
    FROM ev
),
sk AS (
    SELECT day, h FROM base
    QUALIFY row_number() OVER (PARTITION BY day ORDER BY h) <= 64
),
est AS (
    SELECT day, CAST(count(*) AS BIGINT) AS n_sketch,
           max(h) AS kth_hash,
           CAST(CASE WHEN count(*) < 64 THEN count(*)
                     ELSE floor(16911433728.0 / max(h)) END AS BIGINT)
               AS est_distinct
    FROM sk GROUP BY day
),
tc AS (
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
    FROM ev GROUP BY day
)
SELECT est.day, est.n_sketch, est.kth_hash, est.est_distinct,
       tc.true_distinct
FROM est JOIN tc USING (day)
"""


# q180: q133's interval SQL over the dimension stream only, then the
# same half-open containment left join.
ORACLE_SQL["q180_point_in_time_lookup"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS e,
           CAST(event_id AS BIGINT) AS event_id
    FROM events
),
dimev AS (SELECT * FROM ev WHERE event_type IN ('view', 'click')),
flag AS (
    SELECT *,
           CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS nr
    FROM dimev
    WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)
),
run AS (
    SELECT *,
           sum(nr) OVER (
               PARTITION BY user_id ORDER BY e, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS r
    FROM flag
),
runs AS (
    SELECT user_id, r, min(event_type) AS state, min(e) AS valid_from
    FROM run GROUP BY user_id, r
),
dim AS (
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY r)
               AS valid_to
    FROM runs
),
facts AS (
    SELECT user_id, event_id AS purchase_id, e AS t
    FROM ev WHERE event_type = 'purchase'
)
SELECT facts.user_id, facts.purchase_id, facts.t, dim.state,
       dim.valid_from
FROM facts
LEFT JOIN dim ON facts.user_id = dim.user_id
    AND dim.valid_from <= facts.t
    AND (dim.valid_to IS NULL OR facts.t < dim.valid_to)
"""


# q181: q132's pair SQL -> recursive min-label components ->
# struct-ordered survivorship.
ORACLE_SQL["q181_golden_record"] = """
WITH RECURSIVE c AS (
    SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
           CAST(c_nationkey AS BIGINT) AS nation,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
           c_mktsegment AS segment,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 10, 6) AS name_prefix
    FROM customer
),
pairs AS (
    SELECT a.id AS src, b.id AS dst
    FROM c a JOIN c b
      ON a.nation = b.nation AND a.name_len = b.name_len
     AND a.name_prefix = b.name_prefix AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 2
),
edges AS (
    SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
cc AS (SELECT node, min(comp) AS component FROM walk GROUP BY node)
SELECT coalesce(cc.component, c.id) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       min({'id': c.id, 'name': c.name}).name AS canonical_name,
       CAST(max(c.bal_cents) AS BIGINT) AS best_bal_cents,
       CAST(count(DISTINCT c.segment) AS BIGINT) AS n_segments
FROM c LEFT JOIN cc ON c.id = cc.node
GROUP BY 1
"""


# q182: identical md5 arm split and the SAME float association order.
ORACLE_SQL["q182_ab_test"] = """
WITH users AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     >= 18 THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY 1
),
arms AS (
    SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
            % 2) AS arm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(converted) AS BIGINT) AS conv
    FROM users GROUP BY 1
),
a0 AS (SELECT n AS n0, conv AS c0 FROM arms WHERE arm = 0),
a1 AS (SELECT n AS n1, conv AS c1 FROM arms WHERE arm = 1)
SELECT n0, c0, n1, c1,
       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
       ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
       / sqrt(
           (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
           * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
       ) AS z_stat
FROM a0, a1
"""


ORACLE_SQL["q183_cuped"] = """
WITH users AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y
    FROM events GROUP BY 1
),
au AS (
    SELECT *, (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
               % 2) AS arm
    FROM users
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM au
),
a0 AS (
    SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(x) AS BIGINT) AS x0,
           CAST(sum(y) AS BIGINT) AS y0
    FROM au WHERE arm = 0
),
a1 AS (
    SELECT CAST(count(*) AS BIGINT) AS n1, CAST(sum(x) AS BIGINT) AS x1,
           CAST(sum(y) AS BIGINT) AS y1
    FROM au WHERE arm = 1
)
SELECT n,
       CAST(n * sxy - sx * sy AS BIGINT) AS theta_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS theta_den,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
       n0, y0, n1, y1,
       (CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE))
          * (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
       - (CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE))
            * (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))) AS cuped_delta,
       CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS raw_delta
FROM m, a0, a1
"""

ORACLE_SQL["q184_winsorized_mean"] = """
WITH o AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
caps AS (
    SELECT o_orderpriority,
           quantile_cont(cents, 0.05) AS p05,
           quantile_cont(cents, 0.95) AS p95
    FROM o GROUP BY 1
),
w AS (
    SELECT o.o_orderpriority,
           greatest(least(CAST(cents AS DOUBLE), p95), p05) AS wv
    FROM o JOIN caps USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(wv * 20) AS BIGINT)) AS BIGINT) AS win_sum20,
       CAST(sum(CAST(round(wv * 20) AS BIGINT)) AS DOUBLE)
           / CAST(20 * count(*) AS DOUBLE) AS win_mean
FROM w GROUP BY 1
"""


# q185: q107's ranking CTE (k=10), integer 2520/rank reciprocals.
ORACLE_SQL["q185_mrr"] = (
    "WITH ranked AS (\n"
    + ORACLE_SQL["q107_bm25_topk"]
    + """),
firsts AS (
    SELECT query_id, CAST(min(rank) AS BIGINT) AS first_rel_rank
    FROM ranked WHERE doc_id % 6 = query_id
    GROUP BY query_id
),
nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM ranked)
SELECT CAST(count(*) AS BIGINT) AS n_with_hit,
       nq.n AS n_queries,
       CAST(sum(2520 // first_rel_rank) AS BIGINT) AS mrr_num2520,
       CAST(sum(2520 // first_rel_rank) AS DOUBLE)
           / CAST(2520 * nq.n AS DOUBLE) AS mrr
FROM firsts, nq
GROUP BY nq.n
"""
)


# q186: brute-force all-pairs Levenshtein — the completeness oracle the
# FastSS deletion-blocking plan must match exactly.
ORACLE_SQL["q186_edit_distance_join"] = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a
JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# q187: q107's ranking CTE + exact-rational AP terms (2520 = lcm(1..10),
# so 2520//rank * cum_rel is an integer term).
ORACLE_SQL["q187_map_at_10"] = (
    "WITH ranked AS (\n"
    + ORACLE_SQL["q107_bm25_topk"]
    + """),
rel AS (
    SELECT query_id, rank,
           row_number() OVER (PARTITION BY query_id ORDER BY rank) AS cum
    FROM ranked WHERE doc_id % 6 = query_id
),
perq AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel_at10,
           CAST(sum((2520 // rank) * cum) AS BIGINT) AS ap_num2520
    FROM rel GROUP BY query_id
),
corpus AS (
    SELECT CAST(doc_id % 6 AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_rel_corpus
    FROM documents GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM ranked)
SELECT q.query_id,
       COALESCE(p.n_rel_at10, 0) AS n_rel_at10,
       COALESCE(c.n_rel_corpus, 0) AS n_rel_corpus,
       COALESCE(p.ap_num2520, 0) AS ap_num2520,
       CAST(2520 * LEAST(COALESCE(c.n_rel_corpus, 0), 10) AS BIGINT)
           AS ap_den2520,
       CAST(COALESCE(p.ap_num2520, 0) AS DOUBLE)
           / (2520.0 * CAST(LEAST(COALESCE(c.n_rel_corpus, 0), 10) AS DOUBLE))
           AS ap
FROM qs q
LEFT JOIN perq p USING (query_id)
LEFT JOIN corpus c USING (query_id)
"""
)


# q188: floor-mean-centered integer autocovariance — c_t = x_t - S DIV n
# deviations are integers, so Σ c_t·c_{t+k} and Σ c_t² are exact int64
# sums and the frame hash-compares. The floor centering carries a
# sub-unit (<1 count/day) bias vs the textbook mean-centered ACF.
ORACLE_SQL["q188_autocorrelation"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
    FROM daily
),
d AS (
    SELECT day, x - s // n AS c FROM daily, stats
),
lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
pairs AS (
    SELECT l.lag, a.c AS c_t, b.c AS c_tk
    FROM lags l
    JOIN d a ON TRUE
    JOIN d b ON b.day = a.day + l.lag
)
SELECT lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(c_t * c_tk) AS BIGINT) AS num_scaled,
       (SELECT CAST(sum(c * c) AS BIGINT) FROM d) AS den_scaled,
       CAST(sum(c_t * c_tk) AS DOUBLE)
           / CAST((SELECT sum(c * c) FROM d) AS DOUBLE) AS acf
FROM pairs GROUP BY lag
"""


# q190: Laplace-smoothed class-conditional token probabilities by
# integer division — mirror of the textops token pipeline.
ORACLE_SQL["q190_nb_token_model"] = r"""
WITH tok AS (
    SELECT lang,
           unnest(list_filter(
               string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               t -> t <> '')) AS token
    FROM documents
),
counts AS (
    SELECT lang, token, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY lang, token
),
nl AS (
    SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens FROM counts GROUP BY lang
),
v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM counts)
SELECT counts.lang, token, c, n_tokens, v.v AS v,
       CAST(1000000 * (c + 1) // (n_tokens + v.v) AS BIGINT) AS p_ppm
FROM counts JOIN nl ON counts.lang = nl.lang, v
WHERE c >= 2
"""


# q191: contingency + margins; chi2 contribution as ONE fixed-shape
# double expression over int64 inputs (correctly-rounded IEEE in both
# engines), floored to ppm.
ORACLE_SQL["q191_chi2_independence"] = """
WITH cells AS (
    SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT hour, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
SELECT cells.event_type, cells.hour, o, rt.rt AS rt, ct.ct AS ct, n.n AS n,
       CAST(floor(
           1e6 * pow(CAST(o AS DOUBLE) * CAST(n.n AS DOUBLE)
                     - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE), 2.0)
           / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
              * CAST(n.n AS DOUBLE))
       ) AS BIGINT) AS chi2_ppm
FROM cells
JOIN rt ON cells.event_type = rt.event_type
JOIN ct ON cells.hour = ct.hour, n
"""


# q189: recursive-CTE component count over the chain edges (as in
# q63); forest-edge count is the spanning-forest identity.
ORACLE_SQL["q189_msf_boruvka"] = """
WITH RECURSIVE g0 AS (
    SELECT DISTINCT l_orderkey AS g, l_suppkey AS node
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
),
chain AS (
    SELECT g, node AS src,
           lead(node) OVER (PARTITION BY g ORDER BY node) AS dst
    FROM g0
),
edges AS (
    SELECT src, dst FROM chain WHERE dst IS NOT NULL
    UNION
    SELECT dst, src FROM chain WHERE dst IS NOT NULL
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
lbl AS (
    SELECT node, min(comp) AS comp FROM walk GROUP BY node
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(count(DISTINCT comp) AS BIGINT) AS n_components
    FROM lbl
)
SELECT n_nodes, n_components,
       CAST(n_nodes - n_components AS BIGINT) AS n_forest_edges,
       CAST(0 AS BIGINT) AS euler_gap
FROM agg
"""


# q192: exact int64 sufficient statistics; slope/intercept as one
# fixed-shape double expression each, floored.
ORACLE_SQL["q192_groupwise_ols"] = """
WITH g AS (
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_y_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)
                    * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_xy,
           CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS sum_x2
    FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n, sum_x, sum_y_cents, sum_xy, sum_x2,
       CAST(floor(1e6 * (
           (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
            - CAST(sum_x AS DOUBLE) * CAST(sum_y_cents AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
              - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
       )) AS BIGINT) AS slope_ppm,
       CAST(floor(1e3 * (
           (CAST(sum_y_cents AS DOUBLE)
            - ((CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                - CAST(sum_x AS DOUBLE) * CAST(sum_y_cents AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)))
              * CAST(sum_x AS DOUBLE))
           / CAST(n AS DOUBLE)
       )) AS BIGINT) AS intercept_milli
FROM g
"""


# q193: exact-integer Mann-Kendall S and tie-corrected 18*Var(S).
ORACLE_SQL["q193_mann_kendall"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT a.x AS xi, b.x AS xj
    FROM daily a JOIN daily b ON a.day < b.day
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN xj > xi THEN 1 WHEN xj < xi THEN -1 ELSE 0 END)
                AS BIGINT) AS s,
           CAST(sum(CASE WHEN xj > xi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_concordant,
           CAST(sum(CASE WHEN xj < xi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_discordant
    FROM pairs
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
ties AS (
    SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT count(*) AS t FROM daily GROUP BY x HAVING count(*) > 1)
)
SELECT n_days, n_pairs, s, n_concordant, n_discordant,
       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)
           AS var_s_x18
FROM s, nd, ties
"""


# q194: q120's orientation/wedge CTEs + symmetric degrees; cc as the
# exact integer ppm division.
ORACLE_SQL["q194_clustering_coefficient"] = """
WITH su AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
ed AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM su a JOIN su b ON a.k = b.k AND a.s < b.s
),
sym AS (SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
rk AS (SELECT node, d * 4294967296 + node AS r FROM deg),
orient AS (
    SELECT CASE WHEN ru.r < rv.r THEN e.u ELSE e.v END AS a,
           CASE WHEN ru.r < rv.r THEN e.v ELSE e.u END AS b,
           greatest(ru.r, rv.r) AS rb
    FROM ed e
    JOIN rk ru ON e.u = ru.node
    JOIN rk rv ON e.v = rv.node
),
wedge AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM orient e1 JOIN orient e2 ON e1.a = e2.a AND e1.rb < e2.rb
),
tri AS (
    SELECT w.x, w.y, w.z
    FROM wedge w JOIN orient o ON w.y = o.a AND w.z = o.b
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
    UNION ALL SELECT z AS node FROM tri
),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY node)
SELECT deg.node, d AS deg,
       CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d >= 2
            THEN CAST(2000000 * COALESCE(t, 0) // (d * (d - 1)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS cc_ppm
FROM deg LEFT JOIN tc ON deg.node = tc.node
"""


# q195: the q154 fold hash + category/fold integer aggregates; the
# leave-fold-out mean is an exact integer ppm division.
ORACLE_SQL["q195_target_encoding"] = """
WITH rows_ AS (
    SELECT CAST(l_suppkey AS BIGINT) AS cat,
           CAST((('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 7))::BIGINT
                 % 10000) % 5 AS INTEGER) AS fold,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem
),
cell AS (
    SELECT cat, fold, CAST(count(*) AS BIGINT) AS n_f,
           CAST(sum(y) AS BIGINT) AS s_f
    FROM rows_ GROUP BY 1, 2
),
tot AS (
    SELECT cat, CAST(sum(n_f) AS BIGINT) AS n_cat,
           CAST(sum(s_f) AS BIGINT) AS s_cat
    FROM cell GROUP BY 1
)
SELECT cell.cat, fold, n_f, s_f, n_cat, s_cat,
       CASE WHEN n_cat > n_f
            THEN CAST(1000000 * (s_cat - s_f) // (n_cat - n_f) AS BIGINT)
            END AS enc_ppm
FROM cell JOIN tot ON cell.cat = tot.cat
"""


# q196: the HRW argmax re-derived per shard literal; DuckDB picks the
# max (weight, shard) struct via window.
ORACLE_SQL["q196_rendezvous_hashing"] = (
    "WITH w AS (\n"
    + "\nUNION ALL\n".join(
        f"    SELECT o_orderkey, {s} AS shard,"
        f" ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || '{s}'),"
        f" 1, 7))::BIGINT AS wt FROM orders"
        for s in range(8)
    )
    + """
),
best AS (
    SELECT o_orderkey, shard,
           row_number() OVER (PARTITION BY o_orderkey
                              ORDER BY wt DESC, shard DESC) AS rn
    FROM w
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM best WHERE rn = 1
GROUP BY 1
"""
)


# q197: containment counting per candidate pair — distinct scans +
# one key join each, mirrored directly.
ORACLE_SQL["q197_fk_inference"] = """
WITH pairs(child, parent) AS (
    VALUES ('lineitem.l_orderkey', 'orders.o_orderkey'),
           ('lineitem.l_partkey', 'part.p_partkey'),
           ('lineitem.l_suppkey', 'supplier.s_suppkey'),
           ('orders.o_custkey', 'customer.c_custkey'),
           ('orders.o_custkey', 'orders.o_orderkey')
),
stats AS (
    SELECT 'lineitem.l_orderkey' AS child, 'orders.o_orderkey' AS parent,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_child,
           (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_parent,
           (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem)
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS n_contained
    UNION ALL
    SELECT 'lineitem.l_partkey', 'part.p_partkey',
           (SELECT count(DISTINCT l_partkey) FROM lineitem),
           (SELECT count(DISTINCT p_partkey) FROM part),
           (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem)
            WHERE l_partkey IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
           (SELECT count(DISTINCT l_suppkey) FROM lineitem),
           (SELECT count(DISTINCT s_suppkey) FROM supplier),
           (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem)
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier))
    UNION ALL
    SELECT 'orders.o_custkey', 'customer.c_custkey',
           (SELECT count(DISTINCT o_custkey) FROM orders),
           (SELECT count(DISTINCT c_custkey) FROM customer),
           (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders)
            WHERE o_custkey IN (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'orders.o_custkey', 'orders.o_orderkey',
           (SELECT count(DISTINCT o_custkey) FROM orders),
           (SELECT count(DISTINCT o_orderkey) FROM orders),
           (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders)
            WHERE o_custkey IN (SELECT o_orderkey FROM orders))
)
SELECT child, parent,
       CAST(n_child AS BIGINT) AS n_child,
       CAST(n_parent AS BIGINT) AS n_parent,
       CAST(n_contained AS BIGINT) AS n_contained,
       CAST(1000000 * n_contained // n_child AS BIGINT) AS containment_ppm
FROM stats
"""


# q198: both snapshots re-derived in SQL; the same 48-bit md5-prefix
# row hash summed per bucket (order-independent), full-outer compare.
ORACLE_SQL["q198_merkle_diff"] = """
WITH snap_a AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
snap_b AS (
    SELECT a.k,
           CASE WHEN u.k IS NOT NULL THEN a.cents + 1 ELSE a.cents END AS cents
    FROM snap_a a
    LEFT JOIN (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
               WHERE o_orderpriority = '1-URGENT') u ON a.k = u.k
),
da AS (
    SELECT k % 64 AS bucket, CAST(count(*) AS BIGINT) AS n_a,
           CAST(sum(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                     CAST(cents AS VARCHAR)), 1, 12))::BIGINT) AS BIGINT)
               AS digest_a
    FROM snap_a GROUP BY 1
),
db AS (
    SELECT k % 64 AS bucket, CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                     CAST(cents AS VARCHAR)), 1, 12))::BIGINT) AS BIGINT)
               AS digest_b
    FROM snap_b GROUP BY 1
)
SELECT COALESCE(da.bucket, db.bucket) AS bucket,
       CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
       CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
       CAST(COALESCE(digest_a, 0) AS BIGINT) AS digest_a,
       CAST(COALESCE(digest_b, 0) AS BIGINT) AS digest_b,
       CAST(CASE WHEN COALESCE(digest_a, 0) = COALESCE(digest_b, 0)
                 THEN 1 ELSE 0 END AS INTEGER) AS bucket_matches
FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
"""


# qd32: the q196 HRW rule on event_id — the streamed router must land
# every event exactly where the batch rule puts it.
ORACLE_SQL["qd32_streaming_shard_router"] = (
    "WITH w AS (\n"
    + "\nUNION ALL\n".join(
        f"    SELECT event_id, {s} AS shard,"
        f" ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' || '{s}'),"
        f" 1, 7))::BIGINT AS wt FROM events"
        for s in range(8)
    )
    + """
),
best AS (
    SELECT event_id, shard,
           row_number() OVER (PARTITION BY event_id
                              ORDER BY wt DESC, shard DESC) AS rn
    FROM w
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(event_id) AS BIGINT) AS min_event,
       CAST(max(event_id) AS BIGINT) AS max_event
FROM best WHERE rn = 1
GROUP BY 1
"""
)


# q199: the register table rebuilt in SQL (same md5 split, bin-length
# rho), exact-integer harmonic sum, merge identity as constants.
ORACLE_SQL["q199_hll_deterministic"] = """
WITH h AS (
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM events
),
reg AS (
    SELECT hv % 256 AS bucket,
           max(CASE WHEN hv // 256 = 0 THEN 53
                    ELSE 53 - length(bin(hv // 256)) END) AS rho
    FROM h GROUP BY 1
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_present,
           CAST(sum(1::BIGINT << CAST(53 - rho AS INTEGER)) AS BIGINT)
               AS present_num
    FROM reg
),
truth AS (
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
    FROM events
)
SELECT CAST(256 AS BIGINT) AS m,
       CAST(256 - n_present AS BIGINT) AS n_zero_registers,
       CAST(present_num + (256 - n_present) * (1::BIGINT << 53) AS BIGINT)
           AS harmonic_num,
       CAST(floor(
           (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256
           * CAST(1::BIGINT << 53 AS DOUBLE)
           / CAST(present_num + (256 - n_present) * (1::BIGINT << 53)
                  AS DOUBLE)
       ) AS BIGINT) AS est_floor,
       CAST(0 AS BIGINT) AS n_merge_mismatch,
       true_distinct
FROM agg, truth
"""


# qd33: q199's register CTE — the single-batch streamed snapshot must
# equal the batch register table cell-for-cell.
ORACLE_SQL["qd33_streaming_hll"] = """
WITH h AS (
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM events
)
SELECT CAST(hv % 256 AS BIGINT) AS bucket,
       CAST(max(CASE WHEN hv // 256 = 0 THEN 53
                     ELSE 53 - length(bin(hv // 256)) END) AS BIGINT) AS rho
FROM h GROUP BY 1
"""


# q200: the MERGE compiled by hand in SQL — same change-set, same
# matched/not-matched/delete clauses, summarized per (status, action).
ORACLE_SQL["q200_merge_upsert"] = """
WITH o AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
changes AS (
    SELECT k, o_orderstatus AS cs, cents + 500 AS new_cents
    FROM o WHERE o_orderpriority = '1-URGENT'
),
merged AS (
    SELECT o.k, o.o_orderstatus,
           CASE WHEN c.k IS NOT NULL AND o.o_orderstatus = 'F' THEN 'delete'
                WHEN c.k IS NOT NULL THEN 'update'
                ELSE 'keep' END AS _action,
           CASE WHEN c.k IS NOT NULL THEN c.new_cents ELSE o.cents END AS cents
    FROM o LEFT JOIN changes c ON o.k = c.k
),
final AS (
    SELECT k, o_orderstatus, cents, _action FROM merged
    WHERE _action <> 'delete'
    UNION ALL
    SELECT k + 10000000000 AS k, 'I' AS o_orderstatus, new_cents AS cents,
           'insert' AS _action
    FROM changes
)
SELECT o_orderstatus, _action,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(k) AS BIGINT) AS min_key,
       CAST(max(k) AS BIGINT) AS max_key
FROM final GROUP BY 1, 2
"""


# q201: supplier rollup + ranked window + re-aggregate, mirrored.
ORACLE_SQL["q201_topn_others"] = """
WITH per_supp AS (
    SELECT l_returnflag, CAST(l_suppkey AS BIGINT) AS supp,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem GROUP BY 1, 2
),
ranked AS (
    SELECT l_returnflag, supp, cents,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY cents DESC, supp ASC) AS rk
    FROM per_supp
)
SELECT l_returnflag,
       CASE WHEN rk <= 3 THEN CAST(supp AS VARCHAR) ELSE 'OTHERS' END AS who,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM ranked GROUP BY 1, 2
"""


# q202: same clique edge set as q120; log2 bin via binary-string
# length (integer, no float log).
ORACLE_SQL["q202_degree_histogram"] = """
WITH su AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
ed AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM su a JOIN su b ON a.k = b.k AND a.s < b.s
),
sym AS (SELECT u FROM ed UNION ALL SELECT v AS u FROM ed),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u)
SELECT CAST(length(bin(deg)) AS BIGINT) AS log2_bin,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(deg) AS BIGINT) AS min_deg,
       CAST(max(deg) AS BIGINT) AS max_deg,
       CAST(sum(deg) AS BIGINT) AS sum_deg
FROM deg GROUP BY 1
"""


# q203: the q199 register/harmonic algebra, grouped by event_type.
ORACLE_SQL["q203_groupwise_hll"] = """
WITH h AS (
    SELECT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM events
),
reg AS (
    SELECT event_type, hv % 256 AS bucket,
           max(CASE WHEN hv // 256 = 0 THEN 53
                    ELSE 53 - length(bin(hv // 256)) END) AS rho
    FROM h GROUP BY 1, 2
),
agg AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_present,
           CAST(sum(1::BIGINT << CAST(53 - rho AS INTEGER)) AS BIGINT)
               AS present_num
    FROM reg GROUP BY 1
),
truth AS (
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
    FROM events GROUP BY 1
)
SELECT agg.event_type,
       CAST(256 AS BIGINT) AS m,
       CAST(256 - n_present AS BIGINT) AS n_zero_registers,
       CAST(present_num + (256 - n_present) * (1::BIGINT << 53) AS BIGINT)
           AS harmonic_num,
       CAST(floor(
           (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256
           * CAST(1::BIGINT << 53 AS DOUBLE)
           / CAST(present_num + (256 - n_present) * (1::BIGINT << 53)
                  AS DOUBLE)
       ) AS BIGINT) AS est_floor,
       true_distinct
FROM agg JOIN truth ON agg.event_type = truth.event_type
"""


# q43: GEMM-vs-fold parity over exact top-3 — expected row count from
# the q39 brute-force mirror; symmetric difference an identity (0).
ORACLE_SQL["q43_knn_gemm"] = (
    "SELECT count(*) AS n_pairs, CAST(0 AS BIGINT) AS n_gemm_only,"
    " CAST(0 AS BIGINT) AS n_fold_only FROM ("
    + _knn_bruteforce_sql(3)
    + ")"
)

# q125: full-probe + unbounded-rerank IVF-PQ equals exact top-1 (the
# candidate set is the corpus and the re-rank is exact), and both the
# exact and the production-path result carry one row per vector.
ORACLE_SQL["q125_knn_ivfpq"] = (
    "SELECT count(*) AS n_queries, count(*) AS n_results,"
    " CAST(0 AS BIGINT) AS n_fullprobe_mismatch FROM embeddings"
)

# q130: seeded-teleport conservation — graph shape from the
# supplier->part edge CTE, mass/non-negativity are identities.
ORACLE_SQL["q130_personalized_pagerank"] = """
WITH e AS (
    SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
           CAST(l_partkey AS BIGINT) AS dst
    FROM lineitem
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 10 = 0)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       (SELECT count(*) FROM seeds) AS n_seeds,
       CAST(1000000 AS BIGINT) AS mass_e6,
       CAST(0 AS BIGINT) AS n_negative
FROM (SELECT 1)
"""


# qd34: hop edges between single-input txs, min-label recursive CTE
# (q63's discipline), chains >= 3.
ORACLE_SQL["qd34_peeling_chains"] = f"""
WITH RECURSIVE single AS (
    SELECT tx_id, inputs[1].spent_tx_id AS parent
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase AND len(inputs) = 1
),
hop AS (
    SELECT s.parent AS src, s.tx_id AS dst
    FROM single s JOIN (SELECT DISTINCT tx_id FROM single) p
      ON s.parent = p.tx_id
),
edges AS (
    SELECT src, dst FROM hop UNION SELECT dst, src FROM hop
),
walk(node, comp) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.node
),
lbl AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node)
SELECT CAST(comp AS BIGINT) AS chain_id,
       CAST(count(*) AS BIGINT) AS n_txs,
       CAST(min(node) AS BIGINT) AS first_tx,
       CAST(max(node) AS BIGINT) AS last_tx
FROM lbl GROUP BY comp HAVING count(*) >= 3
"""


# qd35: unnest outputs then their address arrays; log2 bin via binary
# length.
ORACLE_SQL["qd35_address_reuse"] = f"""
WITH outs AS (
    SELECT unnest(outputs) AS o
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
flat AS (
    SELECT unnest(o.address) AS addr, o."value" AS value FROM outs
),
per_addr AS (
    SELECT addr, CAST(count(*) AS BIGINT) AS n_received,
           CAST(sum(value) AS BIGINT) AS total_value
    FROM flat GROUP BY addr
)
SELECT CAST(length(bin(n_received)) AS BIGINT) AS log2_bin,
       CAST(count(*) AS BIGINT) AS n_addresses,
       CAST(min(n_received) AS BIGINT) AS min_received,
       CAST(max(n_received) AS BIGINT) AS max_received,
       CAST(sum(total_value) AS BIGINT) AS sum_value
FROM per_addr GROUP BY 1
"""


# q204: the q46 normalize/fold machinery against the broadcast eval
# slice — count and max of identically-computed doubles are exact.
ORACLE_SQL["q204_embedding_decontamination"] = f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
n AS (
    SELECT vec_id, list_transform(e, x -> x / sqrt({_dot64('e', 'e')})) AS u
    FROM v
),
ev AS (SELECT vec_id AS eval_id, u AS ue FROM n WHERE vec_id % 20 = 0),
corpus AS (SELECT vec_id, u FROM n WHERE vec_id % 20 <> 0),
scored AS (
    SELECT c.vec_id, ({_dot64('c.u', 'e.ue')}) AS cos_sim
    FROM corpus c CROSS JOIN ev e
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       max(cos_sim) AS max_sim
FROM scored WHERE cos_sim >= 0.35
GROUP BY vec_id
"""


# q205: confusion counts + exact ppm divisions; kappa via the same
# fixed-shape double floor.
ORACLE_SQL["q205_confusion_metrics"] = """
WITH cm AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount > 0.05
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount <= 0.05
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount <= 0.05
                         THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM lineitem
)
SELECT n, tp, fp, fn, tn,
       CAST(1000000 * tp // (tp + fp) AS BIGINT) AS precision_ppm,
       CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm,
       CAST(2000000 * tp // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
       CAST(floor(1e6 *
           CAST((tp + tn) * n - ((tp + fp) * (tp + fn)
                + (fn + tn) * (fp + tn)) AS DOUBLE)
           / CAST(n * n - ((tp + fp) * (tp + fn)
                  + (fn + tn) * (fp + tn)) AS DOUBLE)) AS BIGINT)
           AS kappa_ppm
FROM cm
"""


# q206: same total-order ntile + running sums; lift in exact ppm.
ORACLE_SQL["q206_decile_lift"] = """
WITH c AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS resp
    FROM orders
),
edges AS (
    SELECT quantile_cont(cents, 0.9) AS e1, quantile_cont(cents, 0.8) AS e2,
           quantile_cont(cents, 0.7) AS e3, quantile_cont(cents, 0.6) AS e4,
           quantile_cont(cents, 0.5) AS e5, quantile_cont(cents, 0.4) AS e6,
           quantile_cont(cents, 0.3) AS e7, quantile_cont(cents, 0.2) AS e8,
           quantile_cont(cents, 0.1) AS e9
    FROM c
),
deciled AS (
    SELECT resp,
           CASE WHEN cents >= e1 THEN 1 WHEN cents >= e2 THEN 2
                WHEN cents >= e3 THEN 3 WHEN cents >= e4 THEN 4
                WHEN cents >= e5 THEN 5 WHEN cents >= e6 THEN 6
                WHEN cents >= e7 THEN 7 WHEN cents >= e8 THEN 8
                WHEN cents >= e9 THEN 9 ELSE 10 END AS decile
    FROM c, edges
),
per AS (
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(resp) AS BIGINT) AS n_resp
    FROM deciled GROUP BY 1
),
cum AS (
    SELECT decile, n, n_resp,
           CAST(sum(n) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
           CAST(sum(n_resp) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_resp
    FROM per
),
tot AS (
    SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_resp) AS BIGINT) AS tr
    FROM per
)
SELECT decile, n, n_resp, cum_n, cum_resp,
       CAST(1000000 * n_resp // n AS BIGINT) AS resp_rate_ppm,
       CAST(1000000 * cum_resp * tn // (cum_n * tr) AS BIGINT)
           AS cum_lift_ppm
FROM cum, tot
"""


# q207: quantile_cont edges (the q59 bit-portable contract) + one
# binned aggregate.
ORACLE_SQL["q207_equidepth_bins"] = """
WITH c AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
edges AS (
    SELECT quantile_cont(cents, 0.25) AS q1,
           quantile_cont(cents, 0.5) AS q2,
           quantile_cont(cents, 0.75) AS q3
    FROM c
)
SELECT CAST(CASE WHEN cents <= q1 THEN 0
                 WHEN cents <= q2 THEN 1
                 WHEN cents <= q3 THEN 2
                 ELSE 3 END AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM c, edges GROUP BY 1
"""


# q208: supplier rollup + running share, every 10th rank + the last.
ORACLE_SQL["q208_pareto_curve"] = """
WITH per AS (
    SELECT CAST(l_suppkey AS BIGINT) AS supp,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem GROUP BY 1
),
ranked AS (
    SELECT supp, cents,
           CAST(row_number() OVER (ORDER BY cents DESC, supp ASC) AS BIGINT)
               AS rk,
           CAST(sum(cents) OVER (ORDER BY cents DESC, supp ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM per
),
tot AS (
    SELECT CAST(sum(cents) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n
    FROM per
)
SELECT rk, supp, cum_cents, t AS total_cents,
       CAST(1000000 * cum_cents // t AS BIGINT) AS cum_share_ppm
FROM ranked, tot
WHERE rk % 10 = 0 OR rk = n
"""


# qd36: coinbase totals vs independently-derived fee totals, joined
# per block; subsidy is the difference.
ORACLE_SQL["qd36_miner_revenue"] = f"""
WITH cb AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(list_sum(list_transform(outputs, o -> o."value")) AS BIGINT)
               AS coinbase_value
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE coinbase
),
fees AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(sum(list_sum(list_transform(inputs, i -> i."value"))
                    - list_sum(list_transform(outputs, o -> o."value")))
                AS BIGINT) AS total_fee
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
    GROUP BY 1
)
SELECT cb.block_id, coinbase_value,
       CAST(COALESCE(total_fee, 0) AS BIGINT) AS total_fee,
       CAST(coinbase_value - COALESCE(total_fee, 0) AS BIGINT) AS subsidy
FROM cb LEFT JOIN fees ON cb.block_id = fees.block_id
"""


# q209: pairwise slopes (one divide each) + the interpolated median.
ORACLE_SQL["q209_theil_sen"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
slopes AS (
    SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
    FROM daily a JOIN daily b ON a.day < b.day
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_positive,
       CAST(sum(CASE WHEN slope < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_negative,
       quantile_cont(slope, 0.5) AS theil_sen_slope
FROM slopes
"""


# q210: quantized-grid CDFs; D as the exact integer cross-difference.
ORACLE_SQL["q210_ks_test"] = """
WITH o AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS cents,
           CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
               AS early
    FROM orders
),
per_value AS (
    SELECT cents, CAST(sum(early) AS BIGINT) AS ca,
           CAST(sum(1 - early) AS BIGINT) AS cb
    FROM o GROUP BY 1
),
cum AS (
    SELECT cents,
           CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_a,
           CAST(sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_b
    FROM per_value
),
tot AS (
    SELECT CAST(sum(early) AS BIGINT) AS n_a,
           CAST(sum(1 - early) AS BIGINT) AS n_b
    FROM o
)
SELECT n_a, n_b,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_scaled,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
FROM cum, tot
GROUP BY n_a, n_b
"""


# q211: q71's recursive-CTE clusters + argmax survivorship.
ORACLE_SQL["q211_quality_keeper"] = (
    ORACLE_SQL["q71_fuzzy_dedup"].rsplit("SELECT CAST(d.doc_id", 1)[0]
    + """, labeled AS (
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canonical_id,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT canonical_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(arg_max(doc_id, n_chars * 1000000000 - doc_id) AS BIGINT) AS keep_id,
       CAST(max(n_chars) AS BIGINT) AS keep_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM labeled GROUP BY canonical_id
"""
)


# q212: q127's funnel stages + quantile_cont quartiles over the
# converting users.
ORACLE_SQL["q212_time_to_convert"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS e,
           event_type
    FROM events
),
v AS (
    SELECT user_id, min(e) AS t_view FROM ev
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT ev.user_id, min(e) AS t_click
    FROM ev JOIN v ON ev.user_id = v.user_id
    WHERE event_type = 'click' AND e >= t_view AND e <= t_view + 86400
    GROUP BY ev.user_id
),
p AS (
    SELECT ev.user_id, min(e) AS t_purchase
    FROM ev JOIN c ON ev.user_id = c.user_id
    WHERE event_type = 'purchase' AND e >= t_click AND e <= t_click + 86400
    GROUP BY ev.user_id
),
conv AS (
    SELECT c.t_click - v.t_view AS s_click,
           p.t_purchase - v.t_view AS s_purchase
    FROM v JOIN c ON v.user_id = c.user_id
    JOIN p ON v.user_id = p.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       CAST(min(s_purchase) AS BIGINT) AS min_s,
       CAST(max(s_purchase) AS BIGINT) AS max_s,
       quantile_cont(s_click, 0.25) AS click_q1,
       quantile_cont(s_click, 0.5) AS click_q2,
       quantile_cont(s_click, 0.75) AS click_q3,
       quantile_cont(s_purchase, 0.25) AS purchase_q1,
       quantile_cont(s_purchase, 0.5) AS purchase_q2,
       quantile_cont(s_purchase, 0.75) AS purchase_q3
FROM conv
"""


# qd37: the single-batch streamed pair set must equal q36's banded
# SQL exactly.
ORACLE_SQL["qd37_streaming_lsh_pairs"] = ORACLE_SQL["q36_lsh_pairs"]


# q213: edges fit on the train period only, applied to both; integer
# ppm shares and drift.
ORACLE_SQL["q213_fit_apply_bins"] = """
WITH o AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
               AS is_train
    FROM orders
),
edges AS (
    SELECT quantile_cont(cents, 0.25) AS q1,
           quantile_cont(cents, 0.5) AS q2,
           quantile_cont(cents, 0.75) AS q3
    FROM o WHERE is_train = 1
),
binned AS (
    SELECT is_train,
           CAST(CASE WHEN cents <= q1 THEN 0
                     WHEN cents <= q2 THEN 1
                     WHEN cents <= q3 THEN 2
                     ELSE 3 END AS BIGINT) AS bin
    FROM o, edges
),
per AS (
    SELECT bin, CAST(sum(is_train) AS BIGINT) AS n_train,
           CAST(sum(1 - is_train) AS BIGINT) AS n_serve
    FROM binned GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n_train) AS BIGINT) AS tt,
           CAST(sum(n_serve) AS BIGINT) AS ts
    FROM per
)
SELECT bin, n_train, n_serve,
       CAST(1000000 * n_train // tt AS BIGINT) AS train_share_ppm,
       CAST(1000000 * n_serve // ts AS BIGINT) AS serve_share_ppm,
       CAST(1000000 * n_serve // ts - 1000000 * n_train // tt AS BIGINT)
           AS drift_ppm
FROM per, tot
"""


# qd38: the single-batch streamed candidates, popcount-verified, must
# equal q159's brute-force all-pairs oracle.
ORACLE_SQL["qd38_streaming_simhash_pairs"] = ORACLE_SQL["q159_simhash_join"]


# q214: identical trailing-frame list windows; exact element-4 medians.
ORACLE_SQL["q214_rolling_mad_anomalies"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
framed AS (
    SELECT day, x,
           list_sort(list(x) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr,
           row_number() OVER (ORDER BY day) AS rn
    FROM daily
),
scored AS (
    SELECT day, x, fr[4] AS med,
           list_sort(list_transform(fr, v -> abs(v - fr[4])))[4] AS mad
    FROM framed WHERE rn >= 7
)
SELECT day, x, CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
       CAST(CASE WHEN abs(x - med) > 3 * mad THEN 1 ELSE 0 END AS INTEGER)
           AS is_anomaly
FROM scored
"""


# q215: same contingency + integer min-sum over the common denominator.
ORACLE_SQL["q215_profile_similarity"] = """
WITH cells AS (
    SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
totals AS (
    SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1
),
prof AS (
    SELECT cells.event_type, hour, c, n
    FROM cells JOIN totals ON cells.event_type = totals.event_type
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.c AS ca, a.n AS na, b.c AS cb, b.n AS nb
    FROM prof a JOIN prof b
      ON a.hour = b.hour AND a.event_type < b.event_type
)
SELECT type_a, type_b,
       CAST(sum(least(ca * nb, cb * na)) AS BIGINT) AS inter_num,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       CAST(sum(least(ca * nb, cb * na)) AS DOUBLE)
           / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE))
           AS similarity
FROM pairs GROUP BY 1, 2
"""


# qd39: qd16's clustering CTEs + the seed-hash rule, grouped per
# entity.
ORACLE_SQL["qd39_entity_tags"] = (
    ORACLE_SQL["qd16_cospend_entities"].rsplit("SELECT DISTINCT n.addr", 1)[0]
    + """, ents AS (
    SELECT DISTINCT n.addr AS addr,
           CAST(coalesce(cc.component, n.node) AS BIGINT) AS entity
    FROM n LEFT JOIN cc ON n.node = cc.node
),
tagged AS (
    SELECT entity,
           CASE WHEN ('0x' || substr(md5(addr), 1, 7))::BIGINT % 37 = 0
                THEN 1 ELSE 0 END AS seed
    FROM ents
)
SELECT entity,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(seed) AS BIGINT) AS n_seeds,
       CAST(max(seed) AS INTEGER) AS is_tagged
FROM tagged GROUP BY entity
"""
)


# qd40: the stream's final snapshot must equal the batch rollup.
ORACLE_SQL["qd40_streaming_topn_others"] = ORACLE_SQL["q201_topn_others"]

# qd41: replay the identical day-window histogram + exact-integer KS.
ORACLE_SQL["qd41_streaming_drift"] = """
WITH c AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(round(value * 100) AS BIGINT) // 1000 AS cell
    FROM events
),
-- append mode emits a window once the watermark (max event time - 1
-- day) passes its END; the trailing in-flight windows are withheld,
-- exactly as the streaming sink is
wm AS (SELECT max(ts) - INTERVAL 1 DAY AS wm_ts FROM events),
wh AS (
    SELECT window_start, cell, count(*) AS w_cnt
    FROM c CROSS JOIN wm
    WHERE window_start + INTERVAL 1 DAY <= wm_ts
    GROUP BY 1, 2
),
ref AS (
    SELECT cell, count(*) AS r_cnt FROM c GROUP BY 1
),
nr AS (SELECT sum(r_cnt) AS n_ref FROM ref),
wins AS (SELECT DISTINCT window_start FROM wh),
spine AS (
    -- reference = whole corpus, so every window cell is a ref cell;
    -- wins x ref is the full union grid
    SELECT w.window_start, r.cell,
           coalesce(wh.w_cnt, 0) AS w_cnt, r.r_cnt
    FROM wins w
    CROSS JOIN ref r
    LEFT JOIN wh ON wh.window_start = w.window_start AND wh.cell = r.cell
),
cum AS (
    SELECT window_start,
           sum(w_cnt) OVER (PARTITION BY window_start ORDER BY cell
               ROWS UNBOUNDED PRECEDING) AS cum_w,
           sum(r_cnt) OVER (PARTITION BY window_start ORDER BY cell
               ROWS UNBOUNDED PRECEDING) AS cum_r
    FROM spine
),
tot AS (
    SELECT window_start, sum(w_cnt) AS n_window FROM spine GROUP BY 1
)
SELECT c.window_start,
       CAST(t.n_window AS BIGINT) AS n_window,
       CAST(nr.n_ref AS BIGINT) AS n_ref,
       CAST(max(abs(c.cum_w * nr.n_ref - c.cum_r * t.n_window)) AS BIGINT)
           AS d_scaled,
       CAST(max(abs(c.cum_w * nr.n_ref - c.cum_r * t.n_window)) AS DOUBLE)
           / CAST(t.n_window * nr.n_ref AS DOUBLE) AS ks_d
FROM cum c JOIN tot t USING (window_start) CROSS JOIN nr
GROUP BY c.window_start, t.n_window, nr.n_ref
"""

# qd42: qd15's exploded-output / linkage CTEs, per (addr, tx), with
# the clustering-key window.
ORACLE_SQL["qd42_address_transactions"] = f"""
WITH outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credit AS (
    SELECT addr, otx AS tx_id, count(*) AS nro, sum(oval) AS rv
    FROM o2 GROUP BY 1, 2
),
ins AS (
    SELECT tx_id AS stx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
debit AS (
    SELECT o2.addr, ins.stx_id AS tx_id, count(*) AS nsi, sum(o2.oval) AS sv
    FROM ins JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    GROUP BY 1, 2
),
per AS (
    SELECT coalesce(c.addr, d.addr) AS addr,
           coalesce(c.tx_id, d.tx_id) AS tx_id,
           coalesce(c.nro, 0) AS nro, coalesce(c.rv, 0) AS rv,
           coalesce(d.nsi, 0) AS nsi, coalesce(d.sv, 0) AS sv
    FROM credit c FULL OUTER JOIN debit d
      ON c.addr = d.addr AND c.tx_id = d.tx_id
),
h AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS block_id
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
)
SELECT p.addr,
       CAST(p.tx_id AS BIGINT) AS tx_id,
       h.block_id,
       CAST(p.nro AS BIGINT) AS n_received_outputs,
       CAST(p.rv AS BIGINT) AS received_value,
       CAST(p.nsi AS BIGINT) AS n_spent_inputs,
       CAST(p.sv AS BIGINT) AS spent_value,
       CAST(p.rv - p.sv AS BIGINT) AS net_value,
       CAST(row_number() OVER (PARTITION BY p.addr
           ORDER BY h.block_id, p.tx_id) AS BIGINT) AS tx_seq
FROM per p JOIN h ON p.tx_id = h.tx_id
"""

# qd43: qd16's clustering CTEs (via qd39's prefix split) + the qd42
# per-tx CTEs, rolled up per entity.
ORACLE_SQL["qd43_entity_transactions"] = (
    ORACLE_SQL["qd16_cospend_entities"].rsplit("SELECT DISTINCT n.addr", 1)[0]
    + """, ents AS (
    SELECT DISTINCT n.addr AS addr,
           CAST(coalesce(cc.component, n.node) AS BIGINT) AS entity
    FROM n LEFT JOIN cc ON n.node = cc.node
),
outs2 AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value})) AS u
    FROM read_parquet('"""
    + _FIXTURE_DIR
    + """/raw_txs.parquet')
),
o2b AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs2 WHERE u.alen > 0
),
credit2 AS (
    SELECT addr, otx AS tx_id, count(*) AS nro, sum(oval) AS rv
    FROM o2b GROUP BY 1, 2
),
ins2 AS (
    SELECT tx_id AS stx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index})) AS u
    FROM read_parquet('"""
    + _FIXTURE_DIR
    + """/raw_txs.parquet')
    WHERE NOT coinbase
),
debit2 AS (
    SELECT o2b.addr, ins2.stx_id AS tx_id, count(*) AS nsi,
           sum(o2b.oval) AS sv
    FROM ins2 JOIN o2b ON ins2.u.stx = o2b.otx AND ins2.u.sidx = o2b.oi
    GROUP BY 1, 2
),
per2 AS (
    SELECT coalesce(c.addr, d.addr) AS addr,
           coalesce(c.tx_id, d.tx_id) AS tx_id,
           coalesce(c.nro, 0) AS nro, coalesce(c.rv, 0) AS rv,
           coalesce(d.nsi, 0) AS nsi, coalesce(d.sv, 0) AS sv
    FROM credit2 c FULL OUTER JOIN debit2 d
      ON c.addr = d.addr AND c.tx_id = d.tx_id
),
h2 AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS block_id
    FROM read_parquet('"""
    + _FIXTURE_DIR
    + """/raw_txs.parquet')
),
etx AS (
    SELECT coalesce(e.entity,
               ('0x' || substr(md5(p.addr), 1, 7))::BIGINT) AS entity,
           p.tx_id, h2.block_id,
           sum(p.nro) AS nro, sum(p.rv) AS rv,
           sum(p.nsi) AS nsi, sum(p.sv) AS sv
    FROM per2 p
    JOIN h2 ON p.tx_id = h2.tx_id
    LEFT JOIN ents e ON p.addr = e.addr
    GROUP BY 1, 2, 3
)
SELECT CAST(entity AS BIGINT) AS entity,
       CAST(tx_id AS BIGINT) AS tx_id,
       block_id,
       CAST(nro AS BIGINT) AS n_received_outputs,
       CAST(rv AS BIGINT) AS received_value,
       CAST(nsi AS BIGINT) AS n_spent_inputs,
       CAST(sv AS BIGINT) AS spent_value,
       CAST(rv - sv AS BIGINT) AS net_value,
       CAST(row_number() OVER (PARTITION BY entity
           ORDER BY block_id, tx_id) AS BIGINT) AS tx_seq
FROM etx
"""
)


# q216: same seeded 28-bit hash, same (hash, doc_id) shard rank.
ORACLE_SQL["q216_epoch_shuffle"] = """
WITH k AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           ('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
    FROM documents
)
SELECT doc_id,
       h % 8 AS shard,
       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
           AS BIGINT) AS position
FROM k
"""

# q217: identical integer thresholds and admitted counts.
ORACLE_SQL["q217_domain_mixture"] = """
WITH k AS (
    SELECT source,
           ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
    FROM documents
),
per AS (SELECT source, count(*) AS n_docs FROM k GROUP BY 1),
tot AS (SELECT sum(n_docs) AS total, count(*) AS n_domains FROM per),
thr AS (
    SELECT source, n_docs,
           CAST(total // n_domains AS BIGINT) AS target_n,
           CAST(least(1 << 28,
               ((total // n_domains) * (1 << 28)) // n_docs) AS BIGINT) AS thr
    FROM per CROSS JOIN tot
)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       t.target_n,
       t.thr,
       CAST(sum(CASE WHEN k.h < t.thr THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled
FROM k JOIN thr t USING (source)
GROUP BY t.source, t.n_docs, t.target_n, t.thr
"""


# qd44: incremental maintenance must equal the FULL recompute — the
# oracle IS qd42's full-index SQL.
ORACLE_SQL["qd44_incremental_address_index"] = ORACLE_SQL[
    "qd42_address_transactions"
]


# q218: literal HITS CTE chain — one join+aggregate per half-round,
# h0 = 1, over the q84 chain-edge derivation.
ORACLE_SQL["q218_hits"] = """
WITH g0 AS (
    SELECT DISTINCT l_orderkey AS g, l_suppkey AS node
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
),
chain AS (
    SELECT g, node AS src,
           lead(node) OVER (PARTITION BY g ORDER BY node) AS dst
    FROM g0
),
e AS (SELECT DISTINCT src, dst FROM chain WHERE dst IS NOT NULL),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
a1 AS (SELECT dst AS node, count(*) AS a FROM e GROUP BY 1),
a1f AS (
    SELECT n.node, coalesce(a1.a, 0) AS a
    FROM nodes n LEFT JOIN a1 ON n.node = a1.node
),
h1 AS (
    SELECT e.src AS node, sum(a1f.a) AS h
    FROM e JOIN a1f ON e.dst = a1f.node GROUP BY 1
),
h1f AS (
    SELECT n.node, coalesce(h1.h, 0) AS h
    FROM nodes n LEFT JOIN h1 ON n.node = h1.node
),
a2 AS (
    SELECT e.dst AS node, sum(h1f.h) AS a
    FROM e JOIN h1f ON e.src = h1f.node GROUP BY 1
),
a2f AS (
    SELECT n.node, coalesce(a2.a, 0) AS a
    FROM nodes n LEFT JOIN a2 ON n.node = a2.node
),
h2 AS (
    SELECT e.src AS node, sum(a2f.a) AS h
    FROM e JOIN a2f ON e.dst = a2f.node GROUP BY 1
),
h2f AS (
    SELECT n.node, coalesce(h2.h, 0) AS h
    FROM nodes n LEFT JOIN h2 ON n.node = h2.node
)
SELECT CAST(a2f.node AS BIGINT) AS node,
       CAST(a2f.a AS BIGINT) AS authority,
       CAST(h2f.h AS BIGINT) AS hub
FROM a2f JOIN h2f ON a2f.node = h2f.node
"""

# q219: exact integer sufficient statistics over the symmetrized
# co-supplier edges; r is one final double expression.
ORACLE_SQL["q219_degree_assortativity"] = """
WITH m AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
edges AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM m a JOIN m b ON a.k = b.k AND a.s < b.s
),
deg AS (
    SELECT node, count(*) AS deg FROM (
        SELECT u AS node FROM edges
        UNION ALL
        SELECT v AS node FROM edges
    ) GROUP BY node
),
sym AS (
    SELECT u, v FROM edges
    UNION ALL
    SELECT v AS u, u AS v FROM edges
),
p AS (
    SELECT du.deg AS dx, dv.deg AS dy
    FROM sym
    JOIN deg du ON sym.u = du.node
    JOIN deg dv ON sym.v = dv.node
)
SELECT CAST(count(*) AS BIGINT) AS m2,
       CAST(sum(dx) AS BIGINT) AS sx,
       CAST(sum(dx * dy) AS BIGINT) AS sxy,
       CAST(sum(dx * dx) AS BIGINT) AS sx2,
       CAST(count(*) * sum(dx * dy) - sum(dx) * sum(dx) AS DOUBLE)
           / CAST(count(*) * sum(dx * dx) - sum(dx) * sum(dx) AS DOUBLE)
           AS assortativity
FROM p
"""

# q220: brute-force DIRECTED all-pairs containment over the identical
# hashed shingle sets (q155's CTE prefix, a != b instead of a < b).
ORACLE_SQL["q220_containment_join"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, list_filter(string_split(s, ' '), x -> x <> '') AS toks
    FROM norm
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           ELSE [] END AS gs
    FROM tok
),
hashed AS (
    SELECT doc_id,
           list_distinct(list_transform(
               gs, g -> ('0x' || substr(md5(g), 1, 7))::BIGINT)) AS hs
    FROM grams
),
d AS (
    SELECT CAST(doc_id AS BIGINT) AS id, hs AS gs, len(hs) AS n
    FROM hashed WHERE len(hs) > 0
),
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS inter,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
    FROM d a JOIN d b ON a.id <> b.id
)
SELECT id_a, id_b, inter, n_a, n_b,
       CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
FROM pairs
WHERE 100 * inter >= 80 * n_a
"""


# qd45: qd15's ledger CTEs + the exact-integer rank-formula Gini.
ORACLE_SQL["qd45_balance_gini"] = f"""
WITH outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credit AS (
    SELECT addr, sum(oval) AS rv FROM o2 GROUP BY 1
),
ins AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
debit AS (
    SELECT o2.addr, sum(o2.oval) AS sv
    FROM ins JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    GROUP BY 1
),
bal AS (
    SELECT c.addr, c.rv - coalesce(d.sv, 0) AS x
    FROM credit c LEFT JOIN debit d ON c.addr = d.addr
    WHERE c.rv - coalesce(d.sv, 0) > 0
),
rk AS (
    SELECT x, row_number() OVER (ORDER BY x, addr) AS r FROM bal
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(r * x) AS BIGINT) AS sum_rx
    FROM rk
)
SELECT n, sum_x,
       CAST(2 * sum_rx - (n + 1) * sum_x AS BIGINT) AS gini_num,
       CAST(n * sum_x AS BIGINT) AS gini_den,
       CAST(2 * sum_rx - (n + 1) * sum_x AS DOUBLE)
           / CAST(n * sum_x AS DOUBLE) AS gini
FROM s
"""

# qd46: qd16's clustering CTEs (qd39-style prefix split) + the qd15
# ledger + the rank-suffix cutover count.
ORACLE_SQL["qd46_nakamoto_coefficient"] = (
    ORACLE_SQL["qd16_cospend_entities"].rsplit("SELECT DISTINCT n.addr", 1)[0]
    + """, ents AS (
    SELECT DISTINCT n.addr AS addr,
           CAST(coalesce(cc.component, n.node) AS BIGINT) AS entity
    FROM n LEFT JOIN cc ON n.node = cc.node
),
outs3 AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value})) AS u
    FROM read_parquet('"""
    + _FIXTURE_DIR
    + """/raw_txs.parquet')
),
o3 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs3 WHERE u.alen > 0
),
credit3 AS (SELECT addr, sum(oval) AS rv FROM o3 GROUP BY 1),
ins3 AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index})) AS u
    FROM read_parquet('"""
    + _FIXTURE_DIR
    + """/raw_txs.parquet')
    WHERE NOT coinbase
),
debit3 AS (
    SELECT o3.addr, sum(o3.oval) AS sv
    FROM ins3 JOIN o3 ON ins3.u.stx = o3.otx AND ins3.u.sidx = o3.oi
    GROUP BY 1
),
bal3 AS (
    SELECT c.addr, c.rv - coalesce(d.sv, 0) AS balance
    FROM credit3 c LEFT JOIN debit3 d ON c.addr = d.addr
),
ebal AS (
    SELECT coalesce(e.entity,
               ('0x' || substr(md5(b.addr), 1, 7))::BIGINT) AS entity,
           sum(b.balance) AS bal
    FROM bal3 b LEFT JOIN ents e ON b.addr = e.addr
    GROUP BY 1
    HAVING sum(b.balance) > 0
),
cum AS (
    SELECT entity, bal,
           sum(bal) OVER (ORDER BY bal DESC, entity ASC
               ROWS UNBOUNDED PRECEDING) AS c
    FROM ebal
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_entities,
           CAST(sum(bal) AS BIGINT) AS total_balance
    FROM ebal
),
novr AS (
    SELECT CAST(count(*) AS BIGINT) AS n_over
    FROM cum CROSS JOIN tot WHERE 2 * c > total_balance
)
SELECT t.n_entities, t.total_balance,
       CAST(t.n_entities - v.n_over + 1 AS BIGINT) AS nakamoto
FROM tot t CROSS JOIN novr v
"""
)

# qd47: linkage with creating/spending timestamps; exact value-seconds
# sum, CDD as one final integer division.
ORACLE_SQL["qd47_coin_days_destroyed"] = f"""
WITH t AS (
    SELECT tx_id, CAST("timestamp" AS BIGINT) AS ts
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1, oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.oval AS oval FROM outs
),
ins AS (
    SELECT tx_id AS stx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
linked AS (
    SELECT ins.stx_id, o2.oval,
           tc.ts AS cts, tsp.ts AS sts
    FROM ins
    JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    JOIN t tc ON o2.otx = tc.tx_id
    JOIN t tsp ON ins.stx_id = tsp.tx_id
)
SELECT CAST(sts // 86400 AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_spends,
       CAST(sum(oval * (sts - cts)) AS BIGINT) AS value_seconds,
       CAST(sum(oval * (sts - cts)) // 86400 AS BIGINT) AS coin_days
FROM linked
GROUP BY 1
"""


# q221: identical split/trim/length/hash pipeline in DuckDB.
ORACLE_SQL["q221_duplicate_sentences"] = r"""
WITH aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0 THEN
                  '. this content is licensed for personal'
                  || ' noncommercial use only.'
              ELSE '' END
           || '. accept cookies to continue reading banner '
           || CAST(doc_id % 5 AS VARCHAR) || ' of this site.' AS text
    FROM documents
),
sents AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           trim(s) AS s
    FROM aug,
         unnest(regexp_split_to_array(text, '[.!?]')) AS u(s)
),
keyed AS (
    SELECT doc_id,
           ('0x' || substr(md5(s), 1, 7))::BIGINT AS sh
    FROM sents WHERE len(s) >= 20
)
SELECT sh,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM keyed
GROUP BY sh
HAVING count(DISTINCT doc_id) >= 2
"""

# q222: q114's dirty augmentation + staged counting, per source.
ORACLE_SQL["q222_pii_prevalence"] = r"""
WITH dirty AS (
    SELECT source,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail' || CAST(doc_id % 7 AS VARCHAR)
           || '.com visit https://host' || CAST(doc_id AS VARCHAR)
           || '.example/p/' || CAST(doc_id AS VARCHAR)
           || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
           || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
           || ' acct ' || CAST(100000000 + doc_id * 917 AS VARCHAR) AS s
    FROM documents
),
s1 AS (
    SELECT source,
           len(regexp_extract_all(s, 'https?://[^\s]+')) AS n_urls,
           regexp_replace(s, 'https?://[^\s]+', '<URL>', 'g') AS s
    FROM dirty
),
s2 AS (
    SELECT source, n_urls,
           len(regexp_extract_all(
               s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
           regexp_replace(
               s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS s
    FROM s1
),
s3 AS (
    SELECT source, n_urls, n_emails,
           len(regexp_extract_all(
               s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS n_ips,
           regexp_replace(
               s, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g') AS s
    FROM s2
),
s4 AS (
    SELECT source, n_urls, n_emails, n_ips,
           len(regexp_extract_all(s, '[0-9]{9,}')) AS n_longnums
    FROM s3
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_urls) AS BIGINT) AS total_urls,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(n_ips) AS BIGINT) AS total_ips,
       CAST(sum(n_longnums) AS BIGINT) AS total_longnums,
       CAST(sum(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_email,
       CAST(sum(CASE WHEN n_longnums > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_longnum
FROM s4
GROUP BY source
"""


# qd48: three streaming incremental merges must equal the full batch
# recompute — the oracle IS qd42's full-index SQL (same as qd44).
ORACLE_SQL["qd48_streaming_index_daemon"] = ORACLE_SQL[
    "qd42_address_transactions"
]


# qd49: the qd42 full recompute over the POST-REORG chain (blocks
# <= 75 plus the surviving replacement txs — coinbases and any tip tx
# whose outputs someone spends survive; unspent non-coinbase tip
# leaves were dropped by the competing chain).
ORACLE_SQL["qd49_reorg_recovery"] = f"""
WITH raw AS (
    SELECT * FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
spent AS (
    SELECT DISTINCT u.stx AS tx_id FROM (
        SELECT unnest(list_transform(range(1, len(inputs) + 1),
                   i -> {{stx: inputs[i].spent_tx_id}})) AS u
        FROM raw WHERE NOT coinbase
    )
),
chain AS (
    SELECT * FROM raw
    WHERE block_id <= 75
       OR coinbase
       OR tx_id IN (SELECT tx_id FROM spent)
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1,
                      alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM chain
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, u.addr AS addr, u.oval AS oval
    FROM outs WHERE u.alen > 0
),
credit AS (
    SELECT addr, otx AS tx_id, count(*) AS nro, sum(oval) AS rv
    FROM o2 GROUP BY 1, 2
),
ins AS (
    SELECT tx_id AS stx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM chain
    WHERE NOT coinbase
),
debit AS (
    SELECT o2.addr, ins.stx_id AS tx_id, count(*) AS nsi, sum(o2.oval) AS sv
    FROM ins JOIN o2 ON ins.u.stx = o2.otx AND ins.u.sidx = o2.oi
    GROUP BY 1, 2
),
per AS (
    SELECT coalesce(c.addr, d.addr) AS addr,
           coalesce(c.tx_id, d.tx_id) AS tx_id,
           coalesce(c.nro, 0) AS nro, coalesce(c.rv, 0) AS rv,
           coalesce(d.nsi, 0) AS nsi, coalesce(d.sv, 0) AS sv
    FROM credit c FULL OUTER JOIN debit d
      ON c.addr = d.addr AND c.tx_id = d.tx_id
),
h AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS block_id FROM chain
)
SELECT p.addr,
       CAST(p.tx_id AS BIGINT) AS tx_id,
       h.block_id,
       CAST(p.nro AS BIGINT) AS n_received_outputs,
       CAST(p.rv AS BIGINT) AS received_value,
       CAST(p.nsi AS BIGINT) AS n_spent_inputs,
       CAST(p.sv AS BIGINT) AS spent_value,
       CAST(p.rv - p.sv AS BIGINT) AS net_value,
       CAST(row_number() OVER (PARTITION BY p.addr
           ORDER BY h.block_id, p.tx_id) AS BIGINT) AS tx_seq
FROM per p JOIN h ON p.tx_id = h.tx_id
"""


# qd50: identical proportional attribution (HUGEINT-widened product,
# floor division) in DuckDB.
ORACLE_SQL["qd50_address_relations"] = f"""
WITH ins0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|'),
                      ival: inputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ins AS (
    SELECT tx_id, u.addr AS src_addr, sum(u.ival) AS in_val
    FROM ins0 WHERE u.alen > 0 GROUP BY 1, 2
),
tot AS (
    SELECT tx_id, sum(in_val) AS total_in FROM ins GROUP BY 1
),
outs0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id, u.addr AS dst_addr, sum(u.oval) AS out_val
    FROM outs0 WHERE u.alen > 0 GROUP BY 1, 2
),
pairs AS (
    SELECT i.tx_id, i.src_addr, o.dst_addr,
           CAST((o.out_val::HUGEINT * i.in_val) // t.total_in AS BIGINT)
               AS flow
    FROM ins i
    JOIN tot t ON i.tx_id = t.tx_id
    JOIN outs o ON i.tx_id = o.tx_id
)
SELECT src_addr, dst_addr,
       CAST(count(DISTINCT tx_id) AS BIGINT) AS n_txs,
       CAST(sum(flow) AS BIGINT) AS total_flow
FROM pairs
GROUP BY 1, 2
"""


# q223: recursive reachability closure + mutual-minimum SCC labels
# over the identical hashed transition edges.
ORACLE_SQL["q223_scc"] = r"""
WITH RECURSIVE seq AS (
    SELECT user_id,
           event_type AS et,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
),
e AS (
    SELECT DISTINCT
           ('0x' || substr(md5(et), 1, 7))::BIGINT AS u,
           ('0x' || substr(md5(nxt), 1, 7))::BIGINT AS v
    FROM seq WHERE nxt IS NOT NULL
    UNION
    SELECT DISTINCT
           ('0x' || substr(md5(event_type), 1, 7))::BIGINT AS u,
           ('0x' || substr(md5(event_type || '_archive'), 1, 7))::BIGINT AS v
    FROM events
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
reach AS (
    SELECT u AS a, v AS b FROM e
    UNION
    SELECT r.a, e.v AS b FROM reach r JOIN e ON r.b = e.u
),
mutual AS (
    SELECT r1.a AS node, r1.b AS m
    FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT n.node,
       CAST(least(n.node, coalesce(min(m.m), n.node)) AS BIGINT)
           AS component
FROM nodes n LEFT JOIN mutual m ON n.node = m.node
GROUP BY n.node
"""


# q224: the rollup that round-tripped through ORC.
ORACLE_SQL["q224_orc_roundtrip"] = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

# q225: the literal SQL text, DuckDB dialect-identical.
ORACLE_SQL["q225_sql_interface"] = """
SELECT n.n_name AS nation,
       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY n.n_name
"""


# qd51: the stream's final snapshot must equal the batch scan.
ORACLE_SQL["qd51_streaming_duplicate_sentences"] = ORACLE_SQL[
    "q221_duplicate_sentences"
]


# q226: q106's recursive segmentation CTEs rolled up per language.
ORACLE_SQL["q226_tokenizer_fertility"] = (
    ORACLE_SQL["q106_bpe_encode"].rsplit("SELECT d.doc_id", 1)[0]
    + """, perdoc AS (
    SELECT d.doc_id, d.lang,
           COALESCE(per.n_words, 0) AS n_words,
           COALESCE(per.n_bpe_tokens, 0) AS n_tok,
           COALESCE(per.n_unk, 0) AS n_unk
    FROM documents d LEFT JOIN per USING (doc_id)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_unk) AS BIGINT) AS total_unk,
       CAST(CASE WHEN sum(n_words) > 0
            THEN (1000000 * sum(n_tok)) // sum(n_words)
            ELSE 0 END AS BIGINT) AS fertility_ppm,
       CAST(CASE WHEN sum(n_tok) > 0
            THEN (1000000 * sum(n_unk)) // sum(n_tok)
            ELSE 0 END AS BIGINT) AS unk_ppm
FROM perdoc
GROUP BY lang
"""
)


# q227: source-level unioned shingle sets, brute-force pairwise
# intersection (q155's hashing convention).
ORACLE_SQL["q227_cross_source_overlap"] = r"""
WITH norm AS (
    SELECT doc_id, source,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id, source,
           list_filter(string_split(s, ' '), x -> x <> '') AS toks
    FROM norm
),
grams AS (
    SELECT doc_id, source,
           CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           ELSE [] END AS gs
    FROM tok
),
sh AS (
    SELECT DISTINCT source,
           ('0x' || substr(md5(g), 1, 7))::BIGINT AS h
    FROM grams, unnest(gs) AS u(g)
),
sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
)
SELECT p.src_a, p.src_b,
       CAST(p.inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(p.inter AS DOUBLE)
           / CAST(sa.n + sb.n - p.inter AS DOUBLE) AS jaccard
FROM pairs p
JOIN sizes sa ON p.src_a = sa.source
JOIN sizes sb ON p.src_b = sb.source
"""

ORACLE_SQL["q228_pr_curve"] = """
WITH d AS (
    SELECT CAST(n_chars % 997 AS BIGINT) AS s, (lang = 'en') AS y
    FROM documents
),
per AS (
    SELECT s, count(*) AS n,
           sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos
    FROM d GROUP BY 1
),
cum AS (
    SELECT s AS score,
           CAST(sum(pos) OVER w AS BIGINT) AS tp,
           CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp
    FROM per
    WINDOW w AS (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
),
tot AS (SELECT CAST(sum(pos) AS BIGINT) AS r_total FROM per)
SELECT score, tp, fp,
       CAST(t.r_total - tp AS BIGINT) AS fn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
       CAST(tp AS DOUBLE) / CAST(t.r_total AS DOUBLE) AS recall
FROM cum, tot t
"""

ORACLE_SQL["q229_unpivot_measures"] = """
WITH w AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           CAST(round(l_discount * 100) AS BIGINT) AS discount_cents,
           CAST(round(l_tax * 100) AS BIGINT) AS tax_cents
    FROM lineitem
),
long AS (
    SELECT l_returnflag, 'qty_cents' AS measure, qty_cents AS cents FROM w
    UNION ALL
    SELECT l_returnflag, 'price_cents', price_cents FROM w
    UNION ALL
    SELECT l_returnflag, 'discount_cents', discount_cents FROM w
    UNION ALL
    SELECT l_returnflag, 'tax_cents', tax_cents FROM w
)
SELECT l_returnflag, measure,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM long GROUP BY 1, 2
"""

ORACLE_SQL["q230_spearman_by_nation"] = """
WITH base AS (
    SELECT CAST(c_nationkey AS BIGINT) AS g,
           CAST(round(c_acctbal * 100) AS BIGINT) AS x,
           CAST(coalesce(o.cnt, 0) AS BIGINT) AS y
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
    ) o ON c_custkey = o.o_custkey
),
perx AS (SELECT g, x, count(*) AS n FROM base GROUP BY 1, 2),
rx AS (
    SELECT g, x,
           2 * coalesce(sum(n) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + n + 1 AS rx2
    FROM perx
),
pery AS (SELECT g, y, count(*) AS n FROM base GROUP BY 1, 2),
ry AS (
    SELECT g, y,
           2 * coalesce(sum(n) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + n + 1 AS ry2
    FROM pery
),
joined AS (
    SELECT b.g, rx.rx2, ry.ry2
    FROM base b
    JOIN rx ON b.g = rx.g AND b.x = rx.x
    JOIN ry ON b.g = ry.g AND b.y = ry.y
),
agg AS (
    SELECT g,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rx2) AS BIGINT) AS sx,
           CAST(sum(ry2) AS BIGINT) AS sy,
           CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
           CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
           CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
    FROM joined GROUP BY 1
)
SELECT g AS nation, n,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS rho
FROM agg
"""

ORACLE_SQL["q231_ndcg_at_10"] = (
    "WITH ranked AS (\n"
    + ORACLE_SQL["q107_bm25_topk"]
    + """),
wt AS (
    SELECT * FROM (VALUES
        (1, 1000000000000), (2, 630929753571), (3, 500000000000),
        (4, 430676558073), (5, 386852807234), (6, 356207187108),
        (7, 333333333333), (8, 315464876785), (9, 301029995663),
        (10, 289064826317)
    ) AS t(r, w)
),
idcg_tab AS (
    SELECT * FROM (VALUES
        (1, 1000000000000), (2, 1630929753571), (3, 2130929753571),
        (4, 2561606311644), (5, 2948459118878), (6, 3304666305986),
        (7, 3637999639319), (8, 3953464516104), (9, 4254494511767),
        (10, 4543559338084)
    ) AS t(r, s)
),
dcg AS (
    SELECT query_id, CAST(sum(w.w) AS BIGINT) AS dcg_fp
    FROM ranked JOIN wt w ON ranked.rank = w.r
    WHERE doc_id % 6 = query_id
    GROUP BY 1
),
corpus AS (
    SELECT CAST(doc_id % 6 AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_rel_corpus
    FROM documents GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM ranked)
SELECT q.query_id,
       CAST(coalesce(d.dcg_fp, 0) AS BIGINT) AS dcg_fp,
       CAST(CASE WHEN coalesce(c.n_rel_corpus, 0) > 0
                 THEN (SELECT s FROM idcg_tab
                       WHERE r = least(c.n_rel_corpus, 10))
                 ELSE 0 END AS BIGINT) AS idcg_fp,
       CASE WHEN coalesce(c.n_rel_corpus, 0) > 0
            THEN CAST(coalesce(d.dcg_fp, 0) AS DOUBLE)
                 / CAST((SELECT s FROM idcg_tab
                         WHERE r = least(c.n_rel_corpus, 10)) AS DOUBLE)
            ELSE 0.0 END AS ndcg
FROM qs q
LEFT JOIN dcg d ON q.query_id = d.query_id
LEFT JOIN corpus c ON q.query_id = c.query_id
"""
)

ORACLE_SQL["q232_resource_allocation"] = """
WITH li AS (
    SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS p
    FROM lineitem
),
deg AS (SELECT l_orderkey, count(*) AS deg FROM li GROUP BY 1),
sides AS (SELECT li.l_orderkey, li.p, deg.deg FROM li JOIN deg USING (l_orderkey)),
pairs AS (
    SELECT a.p AS part_a, b.p AS part_b,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(420 // a.deg) AS BIGINT) AS ra_420
    FROM sides a JOIN sides b
      ON a.l_orderkey = b.l_orderkey AND a.p < b.p
    GROUP BY 1, 2
    HAVING count(*) >= 2
)
SELECT part_a, part_b, n_common, ra_420,
       CAST(ra_420 AS DOUBLE) / 420.0 AS ra
FROM pairs
"""

ORACLE_SQL["q233_cusum_revenue"] = """
WITH daily AS (
    SELECT o_orderdate AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS s_total
    FROM daily
),
c AS (
    SELECT day, x, n_days,
           CAST(sum(x * n_days - s_total)
                OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS c_scaled
    FROM daily, tot
)
SELECT CAST(day AS TIMESTAMP) AS day,
       x AS revenue_cents,
       CAST(c_scaled - min(least(c_scaled, 0))
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cusum_scaled,
       CAST(c_scaled - min(least(c_scaled, 0))
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(n_days AS DOUBLE) AS cusum_cents
FROM c
"""

ORACLE_SQL["q234_cohens_kappa"] = """
WITH d AS (
    SELECT (n_chars > 300) AS a,
           (length(text) - length(replace(text, ' ', '')) > 54) AS b
    FROM documents
),
c AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS tt,
           CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS ff,
           CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS tb
    FROM d
)
SELECT n,
       tt AS both_true,
       ff AS both_false,
       ta AS only_a,
       tb AS only_b,
       CAST(n * (tt + ff) - ((tt + ta) * (tt + tb) + (ff + tb) * (ff + ta))
            AS BIGINT) AS kappa_num,
       CAST(n * n - ((tt + ta) * (tt + tb) + (ff + tb) * (ff + ta))
            AS BIGINT) AS kappa_den,
       CAST(n * (tt + ff) - ((tt + ta) * (tt + tb) + (ff + tb) * (ff + ta))
            AS DOUBLE)
           / CAST(n * n - ((tt + ta) * (tt + tb) + (ff + tb) * (ff + ta))
                  AS DOUBLE) AS kappa
FROM c
"""

ORACLE_SQL["q235_kendall_tau"] = """
WITH base AS (
    SELECT CAST(c_nationkey AS BIGINT) AS g,
           CAST(round(c_acctbal * 100) AS BIGINT) AS x,
           CAST(coalesce(o.cnt, 0) AS BIGINT) AS y
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
    ) o ON c_custkey = o.o_custkey
),
idx AS (
    SELECT g, x, y,
           row_number() OVER (PARTITION BY g ORDER BY x, y) AS i
    FROM base
),
pp AS (
    SELECT a.g,
           sign((a.x - b.x) * (a.y - b.y)) AS s,
           (a.x = b.x AND a.y <> b.y) AS is_tx,
           (a.y = b.y AND a.x <> b.x) AS is_ty
    FROM idx a JOIN idx b ON a.g = b.g AND a.i < b.i
),
agg AS (
    SELECT g,
           CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
           CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
           CAST(sum(CASE WHEN is_tx THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           CAST(sum(CASE WHEN is_ty THEN 1 ELSE 0 END) AS BIGINT) AS ty
    FROM pp GROUP BY 1
),
n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
j AS (
    SELECT n.g, n.n,
           CAST(coalesce(a.conc, 0) AS BIGINT) AS conc,
           CAST(coalesce(a.disc, 0) AS BIGINT) AS disc,
           CAST(coalesce(a.tx, 0) AS BIGINT) AS tx,
           CAST(coalesce(a.ty, 0) AS BIGINT) AS ty
    FROM n LEFT JOIN agg a ON a.g = n.g
)
SELECT g AS nation, n,
       conc AS concordant,
       disc AS discordant,
       CASE WHEN CAST(conc + disc + tx AS DOUBLE)
                 * CAST(conc + disc + ty AS DOUBLE) > 0
            THEN CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(conc + disc + tx AS DOUBLE)
                        * CAST(conc + disc + ty AS DOUBLE))
       END AS tau_b
FROM j
"""

ORACLE_SQL["q236_ancestor_closure"] = """
WITH RECURSIVE e AS (
    SELECT CAST(s_suppkey AS BIGINT) AS child,
           CAST(s_suppkey // 2 AS BIGINT) AS parent
    FROM supplier WHERE s_suppkey > 1
),
anc AS (
    SELECT child AS node, parent AS ancestor, CAST(1 AS BIGINT) AS dist
    FROM e
    UNION
    SELECT a.node, e.parent, a.dist + 1
    FROM anc a JOIN e ON a.ancestor = e.child
)
SELECT node, ancestor, CAST(dist AS BIGINT) AS dist FROM anc
"""

ORACLE_SQL["q237_simpson_diversity"] = r"""
WITH norm AS (
    SELECT source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
t AS (
    SELECT source,
           unnest(list_filter(string_split(s, ' '), x -> x <> '')) AS token
    FROM norm
),
counts AS (
    SELECT source, token, CAST(count(*) AS BIGINT) AS c
    FROM t GROUP BY 1, 2
),
agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(c * (c - 1)) AS BIGINT) AS sum_cc1
    FROM counts GROUP BY 1
)
SELECT source, vocab, n_tokens, sum_cc1,
       CAST(sum_cc1 AS DOUBLE)
           / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))
           AS simpson,
       1.0 / (CAST(sum_cc1 AS DOUBLE)
              / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)))
           AS inv_simpson
FROM agg
"""

ORACLE_SQL["q238_ngram_novelty"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
tok AS (
    SELECT doc_id,
           list_filter(string_split(s, ' '), x -> x <> '') AS toks
    FROM norm
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           ELSE [] END AS gs
    FROM tok
),
sh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(g), 1, 7))::BIGINT AS h
    FROM grams, unnest(gs) AS u(g)
),
first AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY 1)
SELECT CAST(sh.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_sh,
       CAST(sum(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
FROM sh JOIN first f ON sh.h = f.h
GROUP BY 1
"""

ORACLE_SQL["q239_weighted_median"] = """
WITH li AS (
    SELECT l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
per_v AS (
    SELECT l_returnflag, price_cents, CAST(sum(qty) AS BIGINT) AS w
    FROM li GROUP BY 1, 2
),
c AS (
    SELECT l_returnflag, price_cents,
           sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                        ROWS UNBOUNDED PRECEDING) AS cw,
           sum(w) OVER (PARTITION BY l_returnflag) AS tw
    FROM per_v
)
SELECT l_returnflag,
       CAST(min(price_cents) AS BIGINT) AS wmedian_cents,
       CAST(max(tw) AS BIGINT) AS total_weight
FROM c WHERE 2 * cw >= tw
GROUP BY 1
"""

ORACLE_SQL["qd52_change_heuristics"] = f"""
WITH t AS (
    SELECT CAST(tx_id AS BIGINT) AS tx_id,
           outputs[1].value AS v0,
           outputs[2].value AS v1,
           CAST(outputs[1].address_type AS BIGINT) AS t0,
           CAST(outputs[2].address_type AS BIGINT) AS t1,
           list_distinct(list_transform(inputs,
               x -> CAST(x.address_type AS BIGINT))) AS in_types,
           list_min(list_transform(inputs, x -> x.value)) AS min_in
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase AND len(outputs) = 2
)
SELECT tx_id,
       CAST(CASE WHEN v0 % 1000 = 0 AND v1 % 1000 <> 0 THEN 1
                 WHEN v1 % 1000 = 0 AND v0 % 1000 <> 0 THEN 0
            END AS BIGINT) AS h_power_of_ten,
       CAST(CASE WHEN len(in_types) = 1 AND t0 = in_types[1]
                      AND t1 <> in_types[1] THEN 0
                 WHEN len(in_types) = 1 AND t1 = in_types[1]
                      AND t0 <> in_types[1] THEN 1
            END AS BIGINT) AS h_address_type,
       CAST(CASE WHEN v0 < min_in AND v1 >= min_in THEN 0
                 WHEN v1 < min_in AND v0 >= min_in THEN 1
            END AS BIGINT) AS h_optimal_change
FROM t
"""

ORACLE_SQL["qd53_fee_percentiles"] = f"""
WITH fees AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(coalesce(list_sum(list_transform(inputs, x -> x.value)), 0)
                - coalesce(list_sum(list_transform(outputs, x -> x.value)), 0)
                AS BIGINT) AS fee
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
per_v AS (
    SELECT block_id, fee, CAST(count(*) AS BIGINT) AS w
    FROM fees GROUP BY 1, 2
),
c AS (
    SELECT block_id, fee,
           sum(w) OVER (PARTITION BY block_id ORDER BY fee
                        ROWS UNBOUNDED PRECEDING) AS cw,
           sum(w) OVER (PARTITION BY block_id) AS tw
    FROM per_v
),
med AS (
    SELECT block_id, CAST(min(fee) AS BIGINT) AS fee_med
    FROM c WHERE 2 * cw >= tw GROUP BY 1
),
p90 AS (
    SELECT block_id, CAST(min(fee) AS BIGINT) AS fee_p90
    FROM c WHERE 10 * cw >= 9 * tw GROUP BY 1
),
base AS (
    SELECT block_id,
           CAST(count(*) AS BIGINT) AS n_txs,
           CAST(min(fee) AS BIGINT) AS fee_min,
           CAST(max(fee) AS BIGINT) AS fee_max
    FROM fees GROUP BY 1
)
SELECT base.block_id, n_txs, fee_min, fee_max, fee_med, fee_p90
FROM base JOIN med ON base.block_id = med.block_id
JOIN p90 ON base.block_id = p90.block_id
"""

ORACLE_SQL["qd54_streaming_changepoint"] = """
-- append mode emits a day once the watermark (max event time - 1 day)
-- passes its END; the trailing in-flight days are withheld, exactly
-- as the streaming sink is (same contract as qd41)
WITH wm AS (SELECT max(ts) - INTERVAL 1 DAY AS wm_ts FROM events),
daily AS (
    SELECT date_trunc('day', ts) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
    FROM events CROSS JOIN wm
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm_ts
    GROUP BY 1
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS s_total
    FROM daily
),
c AS (
    SELECT day, x, n_days,
           CAST(sum(x * n_days - s_total)
                OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS c_scaled
    FROM daily, tot
)
SELECT CAST(day AS TIMESTAMP) AS day,
       x AS revenue_cents,
       CAST(c_scaled - min(least(c_scaled, 0))
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cusum_scaled,
       CAST(c_scaled - min(least(c_scaled, 0))
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(n_days AS DOUBLE) AS cusum_cents
FROM c
"""

ORACLE_SQL["q240_tfidf_keywords"] = r"""
WITH norm AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
t AS (
    SELECT doc_id,
           unnest(list_filter(string_split(s, ' '), x -> x <> '')) AS token
    FROM norm
),
tf AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM t GROUP BY 1, 2
),
dfm AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf, dfm.df,
           CAST(tf.tf * 1000000 // dfm.df AS BIGINT) AS score_fp
    FROM tf JOIN dfm ON tf.token = dfm.token
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score_fp DESC, token) AS rank
    FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank AS BIGINT) AS rank,
       token, tf, df, score_fp
FROM ranked WHERE rank <= 3
"""

ORACLE_SQL["q241_burstiness"] = """
WITH daily AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
agg AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS d,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS scc
    FROM daily GROUP BY 1
)
SELECT user_id, d, sc AS n_events,
       CAST(d * scc - sc * sc AS BIGINT) AS fano_num,
       CAST(d * sc AS BIGINT) AS fano_den,
       CAST(d * scc - sc * sc AS DOUBLE) / CAST(d * sc AS DOUBLE) AS fano
FROM agg
"""

ORACLE_SQL["q242_hhi_concentration"] = """
WITH o AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
    FROM orders GROUP BY 1
),
per_cust AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nation, o.r
    FROM o JOIN customer ON o.o_custkey = c_custkey
),
tot AS (
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(r) AS BIGINT) AS sum_r
    FROM per_cust GROUP BY 1
),
shares AS (
    SELECT p.nation, t.n_customers, t.sum_r,
           CAST(1000000 * p.r // t.sum_r AS BIGINT) AS s_ppm
    FROM per_cust p JOIN tot t ON p.nation = t.nation
)
SELECT nation,
       CAST(any_value(n_customers) AS BIGINT) AS n_customers,
       CAST(any_value(sum_r) AS BIGINT) AS sum_r,
       CAST(sum(s_ppm * s_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares GROUP BY 1
"""

ORACLE_SQL["q243_benford_deviation"] = """
WITH d AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders
),
per_d AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM per_d),
exp_tab AS (
    SELECT * FROM (VALUES
        (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        (6, 66947), (7, 57992), (8, 51153), (9, 45757)
    ) AS t(digit, benford_ppm)
)
SELECT p.digit, p.n_obs, t.n,
       CAST(p.n_obs * 1000000 // t.n AS BIGINT) AS obs_ppm,
       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(p.n_obs * 1000000 // t.n - e.benford_ppm AS BIGINT) AS dev_ppm
FROM per_d p CROSS JOIN tot t
JOIN exp_tab e ON p.digit = e.digit
"""

ORACLE_SQL["q244_group_mode"] = """
WITH counts AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY c DESC, event_type) AS rn
    FROM counts
)
SELECT user_id, event_type AS mode_event, c AS mode_count
FROM ranked WHERE rn = 1
"""

ORACLE_SQL["q245_lorenz_curve"] = """
WITH r AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS rk FROM r
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS total_r
    FROM r
)
SELECT CAST((rk * 10 + n - 1) // n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(ranked.r) AS BIGINT) AS decile_cents,
       CAST(sum(ranked.r) AS DOUBLE) / CAST(any_value(total_r) AS DOUBLE)
           AS rev_share
FROM ranked CROSS JOIN tot
GROUP BY 1
"""

ORACLE_SQL["q246_rfm_segmentation"] = """
WITH per_cust AS (
    SELECT o_custkey AS ck,
           max(o_orderdate) AS last_d,
           CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS money
    FROM orders GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_cust),
rq AS (
    SELECT ck, CAST((row_number() OVER (ORDER BY last_d, ck) * 4 + n.n - 1)
                    // n.n AS BIGINT) AS r_q
    FROM per_cust CROSS JOIN n
),
fq AS (
    SELECT ck, CAST((row_number() OVER (ORDER BY freq, ck) * 4 + n.n - 1)
                    // n.n AS BIGINT) AS f_q
    FROM per_cust CROSS JOIN n
),
mq AS (
    SELECT ck, CAST((row_number() OVER (ORDER BY money, ck) * 4 + n.n - 1)
                    // n.n AS BIGINT) AS m_q
    FROM per_cust CROSS JOIN n
)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers
FROM rq JOIN fq USING (ck) JOIN mq USING (ck)
GROUP BY 1, 2, 3
"""

ORACLE_SQL["q247_life_table"] = """
WITH o AS (
    -- BIGINT, not DOUBLE: DuckDB's // is floor division only for
    -- integers (on doubles it is plain division)
    SELECT o_custkey,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ts
    FROM orders
),
nxt AS (
    SELECT o_custkey, ts,
           lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts) AS next_ts
    FROM o
),
h AS (SELECT max(ts) AS h FROM o),
obs AS (
    SELECT CASE WHEN next_ts IS NOT NULL THEN next_ts - ts
                ELSE h.h - ts END AS gap_s,
           (next_ts IS NOT NULL) AS event
    FROM nxt CROSS JOIN h
),
per_b AS (
    SELECT CAST(gap_s // 2592000 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS events
    FROM obs GROUP BY 1
)
SELECT bucket,
       CAST(sum(n_obs) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS at_risk,
       events,
       CAST(n_obs - events AS BIGINT) AS censored
FROM per_b
"""

ORACLE_SQL["q248_readability"] = r"""
WITH norm AS (
    SELECT source, text,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents
),
per_doc AS (
    SELECT source,
           CAST(len(list_filter(string_split(s, ' '), x -> x <> ''))
                AS BIGINT) AS words,
           CAST(greatest(1, len(list_filter(
                string_split_regex(text, '[.!?]+'),
                x -> trim(x) <> ''))) AS BIGINT) AS sentences,
           CAST(len(list_filter(string_split(s, ' '),
                x -> x <> '' AND length(x) >= 7)) AS BIGINT) AS long_words
    FROM norm
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(words) AS BIGINT) AS words,
       CAST(sum(sentences) AS BIGINT) AS sentences,
       CAST(sum(long_words) AS BIGINT) AS long_words,
       CAST(sum(words) AS DOUBLE) / CAST(sum(sentences) AS DOUBLE)
           AS words_per_sentence,
       CAST(sum(long_words) AS DOUBLE) / CAST(sum(words) AS DOUBLE)
           AS long_word_ratio
FROM per_doc
GROUP BY 1
"""

ORACLE_SQL["q249_market_basket"] = """
WITH ob AS (
    SELECT DISTINCT l_orderkey, p_brand AS b
    FROM lineitem JOIN part ON p_partkey = l_partkey
),
n AS (
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob
),
pairs AS (
    SELECT a.b AS brand_a, o.b AS brand_b,
           CAST(count(*) AS BIGINT) AS c_ab
    FROM ob a JOIN ob o ON a.l_orderkey = o.l_orderkey AND a.b < o.b
    GROUP BY 1, 2
    HAVING count(*) >= 5
),
singles AS (
    SELECT b, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY 1
)
SELECT brand_a, brand_b, c_ab,
       sa.c AS c_a, sb.c AS c_b, n_orders,
       CAST(1000000 * c_ab // n_orders AS BIGINT) AS support_ppm,
       CAST(1000000 * c_ab // sa.c AS BIGINT) AS conf_ppm,
       CAST((1000000 * c_ab * n_orders) // (sa.c * sb.c) AS BIGINT)
           AS lift_ppm
FROM pairs
JOIN singles sa ON sa.b = brand_a
JOIN singles sb ON sb.b = brand_b
CROSS JOIN n
"""

ORACLE_SQL["q250_cumulative_distinct"] = """
WITH first_o AS (
    SELECT o_custkey, min(o_orderdate) AS d FROM orders GROUP BY 1
),
daily AS (
    SELECT d, CAST(count(*) AS BIGINT) AS new_customers
    FROM first_o GROUP BY 1
)
SELECT d, new_customers,
       CAST(sum(new_customers) OVER (ORDER BY d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
FROM daily
"""

ORACLE_SQL["q251_pivot_report"] = """
SELECT n_name,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT)
           AS urgent,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '2-HIGH'), 0) AS BIGINT)
           AS high,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '3-MEDIUM'), 0) AS BIGINT)
           AS medium,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 0) AS BIGINT)
           AS not_specified,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderpriority = '5-LOW'), 0) AS BIGINT)
           AS low
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""

ORACLE_SQL["q252_log2_quantile_sketch"] = """
WITH cents AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
hist AS (
    SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM cents GROUP BY 1
),
cum AS (
    SELECT bucket, cnt,
           CAST(sum(cnt) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM hist
),
tot AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM cum),
qs AS (SELECT * FROM (VALUES (50), (90), (99)) t(quantile_pct)),
hit AS (
    SELECT quantile_pct,
           CAST(min(bucket) AS BIGINT) AS bucket,
           CAST(any_value(n) AS BIGINT) AS n
    FROM qs CROSS JOIN tot
    JOIN cum ON cum >= CAST((quantile_pct * n + 99) // 100 AS BIGINT)
    GROUP BY 1
)
SELECT quantile_pct, bucket,
       CAST(1::BIGINT << CAST(bucket AS INT) AS BIGINT) AS lo,
       CAST((1::BIGINT << (CAST(bucket AS INT) + 1)) - 1 AS BIGINT) AS hi,
       n
FROM hit
"""

ORACLE_SQL["q253_bitmap_retention"] = """
WITH ev AS (
    SELECT CAST(ts AS DATE) AS day, CAST(user_id AS BIGINT) AS u FROM events
),
bm AS (
    SELECT day, u // 60 AS word,
           bit_or(1::BIGINT << CAST(u % 60 AS INT)) AS bits
    FROM ev GROUP BY 1, 2
),
dau AS (
    SELECT day, CAST(sum(bit_count(bits)) AS BIGINT) AS dau
    FROM bm GROUP BY 1
),
ret AS (
    SELECT a.day,
           CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS retained_next
    FROM bm a JOIN bm b ON b.day = a.day + 1 AND b.word = a.word
    GROUP BY 1
)
SELECT CAST(day AS TIMESTAMP) AS day, dau,
       CAST(coalesce(retained_next, 0) AS BIGINT) AS retained_next,
       CAST(1000000 * coalesce(retained_next, 0) // dau AS BIGINT)
           AS retention_ppm
FROM dau LEFT JOIN ret USING (day)
"""

ORACLE_SQL["q254_seasonal_decomposition"] = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
based AS (
    SELECT day, cents,
           CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS weekday,
           CAST(sum(cents) OVER (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) //
                count(*) OVER (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS trend
    FROM daily
),
seasonal AS (
    SELECT weekday,
           CAST(sum(cents - trend) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS seasonal_mean
    FROM based GROUP BY 1
)
SELECT CAST(day AS TIMESTAMP) AS day, cents, weekday, trend, seasonal_mean,
       CAST(cents - trend AS DOUBLE) - seasonal_mean AS remainder
FROM based JOIN seasonal USING (weekday)
"""

ORACLE_SQL["qd55_streaming_log2_histogram"] = """
SELECT CAST(length(bin(CAST(round(o_totalprice * 100) AS BIGINT))) - 1
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM orders
GROUP BY 1
"""

ORACLE_SQL["q255_runtime_filter_join"] = """
WITH hv AS (
    SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
)
SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS TIMESTAMP)
           AS month,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem SEMI JOIN hv ON l_orderkey = o_orderkey
GROUP BY 1
"""

ORACLE_SQL["q256_max_drawdown"] = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
p AS (
    SELECT day, cents,
           CAST(max(cents) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
    FROM daily
)
SELECT CAST(day AS TIMESTAMP) AS day, cents, peak,
       CAST(peak - cents AS BIGINT) AS drawdown,
       CAST(1000000 * (peak - cents) // peak AS BIGINT) AS drawdown_ppm
FROM p
"""

ORACLE_SQL["q257_functional_deps"] = """
WITH c1 AS (SELECT p_partkey AS lhs_v, count(DISTINCT p_brand) AS n
            FROM part GROUP BY 1),
c2 AS (SELECT p_name AS lhs_v, count(DISTINCT p_brand) AS n
       FROM part GROUP BY 1),
c3 AS (SELECT p_type AS lhs_v, count(DISTINCT p_size) AS n
       FROM part GROUP BY 1),
c4 AS (SELECT p_brand AS lhs_v, count(DISTINCT p_type) AS n
       FROM part GROUP BY 1),
c5 AS (SELECT o_orderkey AS lhs_v, count(DISTINCT o_custkey) AS n
       FROM orders GROUP BY 1),
c6 AS (SELECT o_custkey AS lhs_v, count(DISTINCT o_orderpriority) AS n
       FROM orders GROUP BY 1)
SELECT 'part' AS table_name, 'p_partkey' AS lhs, 'p_brand' AS rhs,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
FROM c1
UNION ALL
SELECT 'part', 'p_name', 'p_brand', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0
FROM c2
UNION ALL
SELECT 'part', 'p_type', 'p_size', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0
FROM c3
UNION ALL
SELECT 'part', 'p_brand', 'p_type', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0
FROM c4
UNION ALL
SELECT 'orders', 'o_orderkey', 'o_custkey', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0
FROM c5
UNION ALL
SELECT 'orders', 'o_custkey', 'o_orderpriority', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0
FROM c6
"""

ORACLE_SQL["qd56_hodl_waves"] = f"""
WITH t AS (
    SELECT tx_id, CAST(timestamp AS BIGINT) AS ts
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT tx_id AS otx,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{oi: i - 1, oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
o2 AS (
    SELECT otx, CAST(u.oi AS BIGINT) AS oi, CAST(u.oval AS BIGINT) AS oval,
           t.ts AS created_ts
    FROM outs JOIN t ON outs.otx = t.tx_id
),
ins AS (
    SELECT unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{stx: inputs[i].spent_tx_id,
                      sidx: inputs[i].spent_index}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
utxo AS (
    SELECT o2.* FROM o2
    ANTI JOIN ins ON o2.otx = ins.u.stx AND o2.oi = ins.u.sidx
),
tip AS (SELECT max(ts) AS tip_ts FROM t),
banded AS (
    SELECT CAST((tip_ts - created_ts) // 2592000 AS BIGINT) AS age_band,
           CAST(count(*) AS BIGINT) AS n_utxos,
           CAST(sum(oval) AS BIGINT) AS band_value
    FROM utxo CROSS JOIN tip
    GROUP BY 1
),
tot AS (SELECT CAST(sum(band_value) AS BIGINT) AS total_value FROM banded)
SELECT age_band, n_utxos, band_value,
       CAST(band_value AS DOUBLE) / CAST(total_value AS DOUBLE)
           AS supply_share
FROM banded CROSS JOIN tot
"""

ORACLE_SQL["q258_split_scoring"] = """
WITH fanned AS (
    SELECT t.threshold,
           CAST(l_quantity AS BIGINT) <= t.threshold AS is_left,
           l_returnflag
    FROM lineitem
    CROSS JOIN (SELECT CAST(unnest([10, 20, 30, 40]) AS BIGINT)
                AS threshold) t
),
cls AS (
    SELECT threshold, is_left, l_returnflag,
           CAST(count(*) AS BIGINT) AS c
    FROM fanned GROUP BY 1, 2, 3
),
branch AS (
    SELECT threshold, is_left, CAST(sum(c) AS BIGINT) AS n_b
    FROM cls GROUP BY 1, 2
),
shares AS (
    SELECT cls.threshold, cls.is_left, b.n_b,
           CAST(1000000 * cls.c // b.n_b AS BIGINT) AS p_ppm
    FROM cls JOIN branch b
      ON cls.threshold = b.threshold AND cls.is_left = b.is_left
),
gini_b AS (
    SELECT threshold, is_left,
           CAST(any_value(n_b) AS BIGINT) AS n_b,
           CAST(10000 - sum(p_ppm * p_ppm) // 100000000 AS BIGINT)
               AS gini_bp
    FROM shares GROUP BY 1, 2
),
tot AS (
    SELECT threshold, CAST(sum(n_b) AS BIGINT) AS n FROM gini_b GROUP BY 1
),
terms AS (
    SELECT g.threshold, g.is_left, g.n_b,
           CAST(g.n_b * g.gini_bp // t.n AS BIGINT) AS term_bp
    FROM gini_b g JOIN tot t ON g.threshold = t.threshold
)
SELECT threshold,
       CAST(sum(CASE WHEN is_left THEN n_b ELSE 0 END) AS BIGINT)
           AS n_left,
       CAST(sum(CASE WHEN NOT is_left THEN n_b ELSE 0 END) AS BIGINT)
           AS n_right,
       CAST(sum(term_bp) AS BIGINT) AS weighted_gini_bp
FROM terms GROUP BY 1
"""

ORACLE_SQL["q259_quantile_normalization"] = """
WITH o AS (
    SELECT CAST(o_orderkey AS BIGINT) AS ok, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (
    SELECT ok, o_orderpriority, cents,
           CAST(row_number() OVER (ORDER BY cents, ok) AS BIGINT) AS grank
    FROM o
),
n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
ranked AS (
    SELECT ok, o_orderpriority, cents,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY cents, ok) AS BIGINT) AS rk,
           CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS n_g
    FROM o
),
idx AS (
    SELECT ok, o_orderpriority, cents,
           CAST((rk * n + n_g - 1) // n_g AS BIGINT) AS gidx
    FROM ranked CROSS JOIN n_tot
)
SELECT idx.ok, idx.o_orderpriority, idx.cents,
       g.cents AS norm_cents
FROM idx JOIN g ON idx.gidx = g.grank
"""

ORACLE_SQL["qd57_streaming_bitmap_dau"] = """
WITH ev AS (
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(user_id AS BIGINT) AS u
    FROM events
),
bm AS (
    SELECT day, u // 60 AS word,
           bit_or(1::BIGINT << CAST(u % 60 AS INT)) AS bits
    FROM ev GROUP BY 1, 2
)
SELECT day, CAST(sum(bit_count(bits)) AS BIGINT) AS dau
FROM bm GROUP BY 1
"""

ORACLE_SQL["q260_linear_interpolation"] = """
WITH obs AS (
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
j AS (
    SELECT spine.h,
           CAST(epoch(spine.h) AS BIGINT) // 3600 AS eh,
           obs.cents
    FROM spine LEFT JOIN obs ON spine.h = obs.h
),
ctx AS (
    SELECT h, eh, cents,
           last_value(cents IGNORE NULLS) OVER (ORDER BY eh
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
           last_value(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
               OVER (ORDER BY eh
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
           first_value(cents IGNORE NULLS) OVER (ORDER BY eh
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
               OVER (ORDER BY eh
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
    FROM j
)
SELECT h,
       cents IS NOT NULL AS observed,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv + (nv - pv) * (eh - ph) // (nh - ph)
            END AS BIGINT) AS cents_filled
FROM ctx
"""

ORACLE_SQL["q261_pps_sample"] = """
WITH w AS (
    SELECT CAST(o_custkey AS BIGINT) AS ck,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS wt
    FROM orders GROUP BY 1
),
c AS (
    SELECT ck, wt,
           CAST(coalesce(sum(wt) OVER (ORDER BY ck
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS off
    FROM w
),
t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w)
SELECT ck AS o_custkey, wt AS weight_cents,
       CAST((off + wt) // greatest(tw // 100, 1)
            - off // greatest(tw // 100, 1) AS BIGINT)
           AS n_hits
FROM c CROSS JOIN t
WHERE (off + wt) // greatest(tw // 100, 1)
      - off // greatest(tw // 100, 1) > 0
"""

ORACLE_SQL["qd58_tagged_netflow"] = (
    ORACLE_SQL["qd16_cospend_entities"].rsplit("SELECT DISTINCT n.addr", 1)[0]
    + f""", ents AS (
    SELECT DISTINCT n.addr AS addr,
           CAST(coalesce(cc.component, n.node) AS BIGINT) AS entity
    FROM n LEFT JOIN cc ON n.node = cc.node
),
etag AS (
    SELECT entity,
           max(CASE WHEN ('0x' || substr(md5(addr), 1, 7))::BIGINT % 37 = 0
               THEN 1 ELSE 0 END) AS t
    FROM ents GROUP BY 1
),
atag AS (
    SELECT e.addr, CAST(max(g.t) AS INTEGER) AS tagged
    FROM ents e JOIN etag g ON e.entity = g.entity GROUP BY 1
),
times AS (
    SELECT tx_id AS ttx,
           CAST(CAST(timestamp AS BIGINT) // 86400 AS BIGINT) AS day
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
fi0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {{alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|'),
                      ival: inputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
fi AS (
    SELECT tx_id, u.addr AS src_addr, sum(u.ival) AS in_val
    FROM fi0 WHERE u.alen > 0 GROUP BY 1, 2
),
ftot AS (
    SELECT tx_id, sum(in_val) AS total_in FROM fi GROUP BY 1
),
fo0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {{alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value}})) AS u
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
fo AS (
    SELECT tx_id, u.addr AS dst_addr, sum(u.oval) AS out_val
    FROM fo0 WHERE u.alen > 0 GROUP BY 1, 2
),
fpairs AS (
    SELECT tm.day, i.src_addr, o.dst_addr,
           CAST((o.out_val::HUGEINT * i.in_val) // t.total_in AS BIGINT)
               AS flow
    FROM fi i
    JOIN ftot t ON i.tx_id = t.tx_id
    JOIN fo o ON i.tx_id = o.tx_id
    JOIN times tm ON i.tx_id = tm.ttx
),
labeled AS (
    SELECT day,
           CAST(coalesce(s.tagged, 0) AS INTEGER) AS src_tagged,
           CAST(coalesce(d.tagged, 0) AS INTEGER) AS dst_tagged,
           flow
    FROM fpairs
    LEFT JOIN atag s ON fpairs.src_addr = s.addr
    LEFT JOIN atag d ON fpairs.dst_addr = d.addr
)
SELECT day, src_tagged, dst_tagged,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(flow) AS BIGINT) AS total_flow
FROM labeled GROUP BY 1, 2, 3
"""
)

ORACLE_SQL["q262_kaplan_meier"] = """
WITH RECURSIVE o AS (
    SELECT o_custkey,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ts
    FROM orders
),
nxt AS (
    SELECT o_custkey, ts,
           lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts) AS next_ts
    FROM o
),
h AS (SELECT max(ts) AS h FROM o),
obs AS (
    SELECT CASE WHEN next_ts IS NOT NULL THEN next_ts - ts
                ELSE h.h - ts END AS gap_s,
           (next_ts IS NOT NULL) AS event
    FROM nxt CROSS JOIN h
),
per_b AS (
    SELECT CAST(gap_s // 2592000 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS events
    FROM obs GROUP BY 1
),
lt AS (
    SELECT bucket,
           CAST(sum(n_obs) OVER (ORDER BY bucket DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk,
           events,
           row_number() OVER (ORDER BY bucket) AS rn
    FROM per_b
),
km AS (
    SELECT rn, bucket, at_risk, events,
           CAST(1000000 * (at_risk - events) // at_risk AS BIGINT) AS s
    FROM lt WHERE rn = 1
    UNION ALL
    SELECT l.rn, l.bucket, l.at_risk, l.events,
           CAST(km.s * (l.at_risk - l.events) // l.at_risk AS BIGINT)
    FROM km JOIN lt l ON l.rn = km.rn + 1
)
SELECT bucket, at_risk, events, s AS survival_ppm FROM km
"""

ORACLE_SQL["q263_k_anonymity"] = """
WITH qi AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           c_mktsegment,
           CAST(CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS BIGINT)
               AS bal_kb,
           CAST(count(*) AS BIGINT) AS sz
    FROM customer GROUP BY 1, 2, 3
),
fanned AS (
    SELECT CAST(t.k AS BIGINT) AS k, sz
    FROM qi CROSS JOIN (SELECT unnest([2, 5, 10]) AS k) t
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small_groups,
       CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
           AS rows_at_risk
FROM fanned GROUP BY 1
"""

ORACLE_SQL["q264_ordered_string_agg"] = """
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""

ORACLE_SQL["q265_mixing_manifest"] = r"""
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(len(list_filter(string_split(
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               x -> x != '')) AS BIGINT) AS n_tokens
    FROM documents
),
per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tok_s
    FROM docs GROUP BY 1
),
tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS tok_total FROM per_src),
alloc AS (
    SELECT source, n_docs, tok_s,
           CAST(500 * tok_s // tok_total AS BIGINT) AS a_s
    FROM per_src CROSS JOIN tot
),
ranked AS (
    SELECT source, doc_id, n_tokens,
           row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM docs
),
picked AS (
    SELECT r.source,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(r.n_tokens) AS BIGINT) AS tok_selected
    FROM ranked r JOIN alloc a ON r.source = a.source
    WHERE r.rk <= a.a_s
    GROUP BY 1
)
SELECT a.source, a.n_docs, a.tok_s, a.a_s,
       CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected,
       CAST(coalesce(p.tok_selected, 0) AS BIGINT) AS tok_selected,
       CAST((coalesce(p.tok_selected, 0) + 255) // 256 AS BIGINT) AS n_bins
FROM alloc a LEFT JOIN picked p ON a.source = p.source
"""

ORACLE_SQL["q266_referential_integrity"] = """
WITH r1 AS (
    SELECT 'lineitem->orders' AS relationship,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
               AS n_orphans
    FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l_orderkey = o_orderkey
),
r2 AS (
    SELECT 'lineitem->part',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE p_partkey IS NULL) AS BIGINT)
    FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      ON l_partkey = p_partkey
),
r3 AS (
    SELECT 'orders->customer',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
    FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o_custkey = c_custkey
),
r4 AS (
    SELECT 'customer->nation',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE n_nationkey IS NULL) AS BIGINT)
    FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
      ON c_nationkey = n_nationkey
),
u AS (
    SELECT * FROM r1 UNION ALL SELECT * FROM r2
    UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
)
SELECT relationship, n_child, n_orphans,
       CAST(1000000 * n_orphans // n_child AS BIGINT) AS orphan_ppm
FROM u
"""

ORACLE_SQL["q267_seasonal_anomalies"] = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
based AS (
    SELECT day, cents,
           CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS weekday,
           CAST(sum(cents) OVER (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) //
                count(*) OVER (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS trend
    FROM daily
),
seasonal AS (
    SELECT weekday,
           CAST(sum(cents - trend) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS seasonal_mean
    FROM based GROUP BY 1
),
rem AS (
    SELECT CAST(b.day AS TIMESTAMP) AS day, b.cents, b.trend,
           CAST(abs(b.cents - b.trend
                - CAST(round(s.seasonal_mean) AS BIGINT)) AS BIGINT)
               AS abs_rem
    FROM based b JOIN seasonal s ON b.weekday = s.weekday
),
m AS (
    SELECT CAST(floor(quantile_cont(abs_rem, 0.5)) AS BIGINT) AS mad FROM rem
)
SELECT day, cents, trend, abs_rem, mad,
       abs_rem >= 4 * mad AS is_anomaly
FROM rem CROSS JOIN m
"""

ORACLE_SQL["q268_rollup_share"] = """
WITH j AS (
    SELECT r_name, n_name,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
),
nations AS (
    SELECT r_name, n_name, CAST(sum(cents) AS BIGINT) AS cents
    FROM j GROUP BY 1, 2
),
regions AS (
    SELECT r_name, CAST(sum(cents) AS BIGINT) AS region_cents
    FROM nations GROUP BY 1
),
grand AS (
    SELECT CAST(sum(region_cents) AS BIGINT) AS grand_cents FROM regions
)
SELECT n.r_name, n.n_name, n.cents, r.region_cents, g.grand_cents,
       CAST(1000000 * n.cents // r.region_cents AS BIGINT)
           AS share_of_region_ppm,
       CAST(1000000 * r.region_cents // g.grand_cents AS BIGINT)
           AS region_share_ppm
FROM nations n JOIN regions r ON n.r_name = r.r_name CROSS JOIN grand g
"""

ORACLE_SQL["qd59_multi_chain_summary"] = f"""
WITH base AS (
    SELECT tx_id, block_id, CAST(timestamp AS BIGINT) AS ts,
           CAST(coalesce(list_sum(list_transform(outputs, o -> o.value)), 0)
                AS BIGINT) AS out_value,
           coinbase
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
chains AS (
    SELECT c.chain, tx_id, block_id,
           CAST(ts // c.t_div AS BIGINT) AS ts,
           CAST(out_value // c.v_div AS BIGINT) AS out_value,
           coinbase
    FROM base
    CROSS JOIN (SELECT * FROM (VALUES ('btc', 1, 1), ('ltc', 4, 4))
                t(chain, t_div, v_div)) c
)
SELECT chain,
       CAST(count(DISTINCT block_id) AS BIGINT) AS n_blocks,
       CAST(count(*) AS BIGINT) AS n_txs,
       CAST(sum(out_value) AS BIGINT) AS total_out_value,
       CAST(sum(CASE WHEN coinbase THEN 1 ELSE 0 END) AS BIGINT)
           AS n_coinbase,
       CAST(max(ts) - min(ts) AS BIGINT) AS span_s
FROM chains GROUP BY 1
"""

ORACLE_SQL["q269_scd2_dimension"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
    FROM events
),
changed AS (
    SELECT * FROM ordered
    WHERE prev_type IS NULL OR prev_type != event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM changed
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLE_SQL["q270_funnel_conversion"] = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
),
counts AS (
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               AS n0,
           (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3
),
stacked AS (
    SELECT CAST(0 AS BIGINT) AS step, 'all_users' AS step_name,
           n0 AS n_users, n0 AS n_prev FROM counts
    UNION ALL SELECT 1, 'view', n1, n0 FROM counts
    UNION ALL SELECT 2, 'click', n2, n1 FROM counts
    UNION ALL SELECT 3, 'purchase', n3, n2 FROM counts
)
SELECT step, step_name, n_users, n_prev,
       CASE WHEN n_prev = 0 THEN NULL
            ELSE CAST(1000000 * n_users // n_prev AS BIGINT)
       END AS conversion_ppm
FROM stacked
"""

ORACLE_SQL["q271_max_concurrency"] = """
WITH iv AS (
    SELECT CAST(o_orderdate AS DATE) AS open_day,
           CAST(l_shipdate AS DATE) + 1 AS close_day
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deltas AS (
    SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM (
        SELECT open_day AS day, 1 AS d FROM iv
        UNION ALL SELECT close_day, -1 FROM iv
    ) GROUP BY 1
),
conc AS (
    SELECT day,
           CAST(sum(delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_lines
    FROM deltas
),
peaks AS (
    SELECT CAST(year(day) AS BIGINT) AS year,
           max(open_lines) AS peak_open
    FROM conc GROUP BY 1
)
SELECT p.year, p.peak_open,
       CAST(min(c.day) AS TIMESTAMP) AS peak_day
FROM conc c JOIN peaks p
  ON CAST(year(c.day) AS BIGINT) = p.year AND c.open_lines = p.peak_open
GROUP BY 1, 2
"""

ORACLE_SQL["q272_activity_streaks"] = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
    SELECT user_id, day,
           CAST(day - DATE '1970-01-01' AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
    FROM days
),
streaks AS (
    SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
           min(day) AS start_day
    FROM isl GROUP BY 1, 2
),
best AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY 1
)
SELECT b.user_id, b.n_streaks, b.n_active_days, b.longest_streak,
       CAST(min(s.start_day) AS TIMESTAMP) AS streak_start
FROM best b JOIN streaks s
  ON b.user_id = s.user_id AND s.len = b.longest_streak
GROUP BY 1, 2, 3, 4
"""

ORACLE_SQL["q273_cdc_apply"] = """
WITH ops AS (
    SELECT l_orderkey AS key,
           CAST(l_linenumber AS BIGINT) AS seq,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS payload_cents,
           CASE WHEN ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                || ':' || CAST(l_linenumber AS VARCHAR)), 1, 7))::BIGINT
                % 7 = 0
                THEN 'D' ELSE 'U' END AS op
    FROM lineitem
),
last AS (
    SELECT *, row_number() OVER (PARTITION BY key
        ORDER BY seq DESC, payload_cents DESC, op DESC) AS rn
    FROM ops
)
SELECT op, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(payload_cents) AS BIGINT) AS sum_payload_cents,
       CAST(sum(key) AS BIGINT) AS sum_keys,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM last WHERE rn = 1 GROUP BY 1
"""

ORACLE_SQL["q274_adjusted_rand"] = """
WITH cont AS (
    SELECT lang, CAST(n_chars // 64 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents GROUP BY 1, 2
),
sums AS (
    SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM cont) AS n_items,
           (SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) FROM cont)
               AS i_pairs,
           (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM (
                SELECT sum(cnt) AS c FROM cont GROUP BY lang)) AS sa,
           (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM (
                SELECT sum(cnt) AS c FROM cont GROUP BY bucket)) AS sb
)
SELECT n_items,
       CAST(n_items * (n_items - 1) // 2 AS BIGINT) AS n_pairs,
       i_pairs, sa, sb,
       CASE WHEN CAST(n_items * (n_items - 1) // 2 AS HUGEINT) * (sa + sb)
                 - 2 * CAST(sa AS HUGEINT) * sb = 0
            THEN NULL
            ELSE CAST(
                (2000000 * (CAST(i_pairs AS HUGEINT)
                    * (n_items * (n_items - 1) // 2)
                    - CAST(sa AS HUGEINT) * sb))
                // (CAST(n_items * (n_items - 1) // 2 AS HUGEINT)
                    * (sa + sb) - 2 * CAST(sa AS HUGEINT) * sb)
                AS BIGINT)
       END AS ari_ppm
FROM sums
"""

ORACLE_SQL["q275_record_linkage"] = """
WITH c AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS BIGINT)
               AS bal_bucket,
           CAST(c_custkey % 97 AS BIGINT) AS synth_id
    FROM customer
),
pairs AS (
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.bal_bucket = b.bal_bucket AS agree_bal,
           a.synth_id = b.synth_id AS agree_syn
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
),
scored AS (
    SELECT key_a, key_b, agree_bal, agree_syn,
           CAST((CASE WHEN agree_bal THEN 24 ELSE -8 END)
              + (CASE WHEN agree_syn THEN 18 ELSE -6 END) AS BIGINT)
               AS score
    FROM pairs
)
SELECT * FROM scored ORDER BY score DESC, key_a, key_b LIMIT 100
"""

ORACLE_SQL["q276_vwap_ohlc"] = """
WITH ev AS (
    SELECT CAST(ts AS DATE) AS day, event_type AS symbol, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(event_id % 7 + 1 AS BIGINT) AS vol
    FROM events
),
enriched AS (
    SELECT day, symbol, cents, vol,
           first_value(cents) OVER w AS open_c,
           last_value(cents) OVER w AS close_c
    FROM ev
    WINDOW w AS (PARTITION BY day, symbol ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT CAST(day AS TIMESTAMP) AS day, symbol,
       CAST(max(open_c) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max(close_c) AS BIGINT) AS close_cents,
       CAST(sum(vol) AS BIGINT) AS volume,
       CAST(sum(cents * vol) // sum(vol) AS BIGINT) AS vwap_cents
FROM enriched GROUP BY 1, 2
"""

ORACLE_SQL["q277_phrase_search"] = r"""
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           list_filter(string_split(
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               x -> x != '') AS toks
    FROM documents
),
tok AS (
    SELECT doc_id,
           unnest(list_transform(toks, (x, i) -> {'tok': x, 'pos': i})) AS u
    FROM docs
)
SELECT t1.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(t1.u.pos) AS BIGINT) AS first_pos
FROM tok t1 JOIN tok t2
  ON t1.doc_id = t2.doc_id AND t2.u.pos = t1.u.pos + 1
WHERE t1.u.tok = 'hash' AND t2.u.tok = 'join'
GROUP BY 1
"""

# The streaming twin must converge to the batch bars exactly.
ORACLE_SQL["qd60_streaming_ohlc"] = ORACLE_SQL["q276_vwap_ohlc"]

ORACLE_SQL["q278_cohort_ltv"] = """
WITH o AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
               AS midx,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
first AS (
    SELECT o_custkey, min(midx) AS cohort_midx FROM o GROUP BY 1
),
tri AS (
    SELECT f.cohort_midx,
           CAST(o.midx - f.cohort_midx AS BIGINT) AS age_months,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
           CAST(sum(o.cents) AS BIGINT) AS cents
    FROM o JOIN first f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
)
SELECT CAST(make_date(CAST(cohort_midx // 12 AS INT),
            CAST(cohort_midx % 12 + 1 AS INT), 1) AS TIMESTAMP)
           AS cohort_month,
       age_months, n_active, cents,
       CAST(sum(cents) OVER (PARTITION BY cohort_midx ORDER BY age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
FROM tri
"""

ORACLE_SQL["q279_event_trigrams"] = """
WITH tri AS (
    SELECT event_type AS t1,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1, 2, 3
)
SELECT * FROM counts ORDER BY n DESC, t1, t2, t3 LIMIT 10
"""

ORACLE_SQL["q280_locf_imputation"] = """
WITH daily AS (
    SELECT n_name, CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
),
spine AS (
    SELECT n.n_name, d.day
    FROM (SELECT DISTINCT day FROM daily) d
    CROSS JOIN (SELECT n_name FROM nation) n
),
dense AS (
    SELECT s.n_name, s.day, daily.cents
    FROM spine s LEFT JOIN daily
      ON s.n_name = daily.n_name AND s.day = daily.day
)
SELECT n_name, CAST(day AS TIMESTAMP) AS day, cents,
       last_value(cents IGNORE NULLS) OVER w AS filled_cents,
       CAST(day - last_value(CASE WHEN cents IS NOT NULL THEN day END
            IGNORE NULLS) OVER w AS BIGINT) AS staleness_days
FROM dense
WINDOW w AS (PARTITION BY n_name ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLE_SQL["qd61_fifo_taint"] = f"""
WITH seeds AS (
    SELECT tx_id AS seed_tx
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE coinbase AND block_id < 10
),
spend AS (
    SELECT tx_id, inputs, outputs
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
ins0 AS (
    SELECT tx_id,
           unnest(list_transform(inputs, (x, i) ->
               {{'pos': i, 'val': x.value, 'spent': x.spent_tx_id}})) AS u
    FROM spend
),
ins AS (
    SELECT tx_id, u.spent AS spent_tx_id,
           CAST(sum(u.val) OVER w AS BIGINT) AS in_end,
           CAST(sum(u.val) OVER w - u.val AS BIGINT) AS in_start
    FROM ins0
    WINDOW w AS (PARTITION BY tx_id ORDER BY u.pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tainted AS (
    SELECT i.tx_id, i.in_start, i.in_end
    FROM ins i JOIN seeds s ON i.spent_tx_id = s.seed_tx
),
outs0 AS (
    SELECT tx_id,
           unnest(list_transform(outputs, (x, i) ->
               {{'pos': i, 'val': x.value}})) AS u
    FROM spend
),
outs AS (
    SELECT tx_id, CAST(u.pos - 1 AS BIGINT) AS output_index,
           CAST(u.val AS BIGINT) AS value,
           CAST(sum(u.val) OVER w AS BIGINT) AS out_end,
           CAST(sum(u.val) OVER w - u.val AS BIGINT) AS out_start
    FROM outs0
    WINDOW w AS (PARTITION BY tx_id ORDER BY u.pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT o.tx_id, o.output_index, o.value,
       CAST(sum(greatest(0, least(t.in_end, o.out_end)
            - greatest(t.in_start, o.out_start))) AS BIGINT)
           AS tainted_value
FROM outs o JOIN tainted t ON o.tx_id = t.tx_id
GROUP BY 1, 2, 3
HAVING sum(greatest(0, least(t.in_end, o.out_end)
       - greatest(t.in_start, o.out_start))) > 0
"""

ORACLE_SQL["q281_skyline"] = """
WITH p AS (
    SELECT p_partkey,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
           CAST(p_size AS BIGINT) AS size
    FROM part
),
flagged AS (
    SELECT p_partkey, price_cents, size,
           max(size) OVER (PARTITION BY price_cents) AS same_max,
           max(size) OVER (ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cheaper_max
    FROM p
)
SELECT p_partkey, price_cents, size
FROM flagged
WHERE size = same_max
  AND (cheaper_max IS NULL OR size > cheaper_max)
"""

ORACLE_SQL["q282_rolling_distinct_users"] = """
WITH ev AS (
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS eday,
           CAST(user_id // 60 AS BIGINT) AS word,
           CAST(1::BIGINT << CAST(user_id % 60 AS INT) AS BIGINT) AS mask
    FROM events
),
bits AS (
    SELECT eday, word, CAST(bit_or(mask) AS BIGINT) AS bits
    FROM ev GROUP BY 1, 2
),
spine AS (
    SELECT d.eday, w.word
    FROM (SELECT DISTINCT eday FROM bits) d
    CROSS JOIN (SELECT DISTINCT word FROM bits) w
),
dense AS (
    SELECT s.eday, s.word, coalesce(b.bits, 0) AS bits
    FROM spine s LEFT JOIN bits b
      ON s.eday = b.eday AND s.word = b.word
),
rolled AS (
    SELECT eday, bits,
           bit_or(bits) OVER (PARTITION BY word ORDER BY eday
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wau_bits
    FROM dense
)
SELECT CAST(DATE '1970-01-01' + CAST(eday AS INT) AS TIMESTAMP) AS day,
       CAST(sum(bit_count(bits)) AS BIGINT) AS dau,
       CAST(sum(bit_count(wau_bits)) AS BIGINT) AS wau,
       CAST(1000000 * sum(bit_count(bits)) // sum(bit_count(wau_bits))
            AS BIGINT) AS stickiness_ppm
FROM rolled GROUP BY 1
"""

ORACLE_SQL["qd62_graph_reciprocity"] = """
WITH rel AS (
    SELECT src_addr, dst_addr FROM (
WITH ins0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|'),
                      ival: inputs[i].value})) AS u
    FROM read_parquet('/root/repo/fixtures/raw_txs.parquet')
    WHERE NOT coinbase
),
ins AS (
    SELECT tx_id, u.addr AS src_addr, sum(u.ival) AS in_val
    FROM ins0 WHERE u.alen > 0 GROUP BY 1, 2
),
tot AS (
    SELECT tx_id, sum(in_val) AS total_in FROM ins GROUP BY 1
),
outs0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value})) AS u
    FROM read_parquet('/root/repo/fixtures/raw_txs.parquet')
),
outs AS (
    SELECT tx_id, u.addr AS dst_addr, sum(u.oval) AS out_val
    FROM outs0 WHERE u.alen > 0 GROUP BY 1, 2
),
pairs AS (
    SELECT i.tx_id, i.src_addr, o.dst_addr,
           CAST((o.out_val::HUGEINT * i.in_val) // t.total_in AS BIGINT)
               AS flow
    FROM ins i
    JOIN tot t ON i.tx_id = t.tx_id
    JOIN outs o ON i.tx_id = o.tx_id
)
SELECT src_addr, dst_addr,
       CAST(count(DISTINCT tx_id) AS BIGINT) AS n_txs,
       CAST(sum(flow) AS BIGINT) AS total_flow
FROM pairs
GROUP BY 1, 2
)
    WHERE src_addr != dst_addr
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM rel) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM rel r
        WHERE EXISTS (SELECT 1 FROM rel s
            WHERE s.src_addr = r.dst_addr AND s.dst_addr = r.src_addr))
           AS n_reciprocal,
       CAST(1000000 * (SELECT count(*) FROM rel r
        WHERE EXISTS (SELECT 1 FROM rel s
            WHERE s.src_addr = r.dst_addr AND s.dst_addr = r.src_addr))
        // (SELECT count(*) FROM rel) AS BIGINT) AS reciprocity_ppm
"""

ORACLE_SQL["q283_tolerance_join"] = """
WITH o AS (
    SELECT o_custkey, o_orderkey AS okey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(o_orderdate AS DATE) AS day
    FROM orders
)
SELECT a.o_custkey, a.okey AS key_a, b.okey AS key_b,
       a.cents AS cents_a, b.cents AS cents_b,
       CAST(b.day - a.day AS BIGINT) AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.okey < b.okey
 AND abs(a.cents - b.cents) <= 100000
 AND abs(a.day - b.day) <= 90
"""

ORACLE_SQL["q284_conversion_lag"] = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events
),
s1 AS (
    SELECT user_id, min(tsu) AS t1 FROM ev
    WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.tsu) AS t2, min(s1.t1) AS t1
    FROM ev e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.tsu > s1.t1 GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.tsu) AS t3, min(s2.t2) AS t2
    FROM ev e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.tsu > s2.t2 GROUP BY 1
),
lags AS (
    SELECT 'view->click' AS transition, t2 - t1 AS lag_micros FROM s2
    UNION ALL
    SELECT 'click->purchase', t3 - t2 FROM s3
)
SELECT transition,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(lag_micros) AS BIGINT) AS min_micros,
       CAST(floor(quantile_cont(lag_micros, 0.5)) AS BIGINT) AS p50_micros,
       CAST(max(lag_micros) AS BIGINT) AS max_micros
FROM lags GROUP BY 1
"""

ORACLE_SQL["qd63_tx_motif_census"] = f"""
WITH shaped AS (
    SELECT CAST(len(inputs) AS BIGINT) AS n_in,
           CAST(len(outputs) AS BIGINT) AS n_out,
           CAST(coalesce(list_sum(list_transform(outputs, o -> o.value)), 0)
                AS BIGINT) AS out_value
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
motif AS (
    SELECT CASE WHEN n_in = 1 AND n_out = 1 THEN 'sweep'
                WHEN n_in >= 3 AND n_out >= 3 THEN 'coinjoin_shaped'
                WHEN n_in >= 3 THEN 'consolidation'
                WHEN n_out >= 3 THEN 'fan_out'
                ELSE 'simple_payment' END AS motif,
           n_in, n_out, out_value
    FROM shaped
)
SELECT motif,
       CAST(count(*) AS BIGINT) AS n_txs,
       CAST(sum(out_value) AS BIGINT) AS total_out_value,
       CAST(max(n_in) AS BIGINT) AS max_in,
       CAST(max(n_out) AS BIGINT) AS max_out
FROM motif GROUP BY 1
"""

# q285's default mode audits the fixed-size hash-sampled doc subset;
# the integer cutoff (least(10000, 10000*2000 DIV n)) re-derives the
# identical subset here, so the sampled audit frame hash-compares.
ORACLE_SQL["q285_lsh_quality_eval"] = (
    """WITH docs_s AS (
    SELECT * FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
          % 10000
          < (SELECT least(10000, 20000000 // count(*)) FROM documents)
), """
    + _SIGS_CTE.replace("FROM documents", "FROM docs_s")
    + f""",
bands AS (
{_bands_sql()}
),
lsh AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
),
post AS (
    SELECT doc_id, unnest(hs) AS shingle FROM sh
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM post a JOIN post b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
truth AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE)
          >= 0.2
),
m AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
           (SELECT CAST(count(*) AS BIGINT) FROM lsh l
            JOIN truth t ON l.id_a = t.id_a AND l.id_b = t.id_b) AS tp
)
SELECT n_truth, n_lsh, tp,
       CAST(1000000 * tp // n_lsh AS BIGINT) AS precision_ppm,
       CAST(1000000 * tp // n_truth AS BIGINT) AS recall_ppm
FROM m
"""
)

ORACLE_SQL["q286_subsample_ci"] = """
WITH o AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
    FROM orders
),
reps AS (
    SELECT b.b, CAST(sum(cents) // count(*) AS BIGINT) AS m
    FROM o CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
    WHERE (h >> CAST(b.b AS INT)) & 1 = 0
    GROUP BY 1
),
ci AS (
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           CAST(min(m) AS BIGINT) AS min_mean,
           CAST(floor(quantile_cont(m, 0.05)) AS BIGINT) AS p05_mean,
           CAST(floor(quantile_cont(m, 0.5)) AS BIGINT) AS p50_mean,
           CAST(floor(quantile_cont(m, 0.95)) AS BIGINT) AS p95_mean,
           CAST(max(m) AS BIGINT) AS max_mean
    FROM reps
),
fullm AS (
    SELECT CAST(sum(cents) // count(*) AS BIGINT) AS full_mean_cents
    FROM o
)
SELECT * FROM ci CROSS JOIN fullm
"""

ORACLE_SQL["q287_dedup_savings"] = (
    "WITH assign AS ("
    + ORACLE_SQL["q71_fuzzy_dedup"]
    + """
),
clusters AS (
    SELECT a.canonical_id,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(sum(d.n_chars) AS BIGINT) AS bytes_total,
           CAST(sum(CASE WHEN a.is_keeper THEN d.n_chars ELSE 0 END)
                AS BIGINT) AS bytes_kept
    FROM assign a JOIN documents d ON a.doc_id = d.doc_id
    GROUP BY 1
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(bytes_total) AS BIGINT) AS bytes_total,
       CAST(sum(bytes_kept) AS BIGINT) AS bytes_kept,
       CAST(sum(bytes_total - bytes_kept) AS BIGINT) AS bytes_removed
FROM clusters GROUP BY 1
"""
)

ORACLE_SQL["qd64_utxo_growth"] = f"""
WITH created AS (
    SELECT block_id,
           CAST(len(outputs) AS BIGINT) AS n_created,
           CAST(coalesce(list_sum(list_transform(outputs, o -> o.value)), 0)
                AS BIGINT) AS v_created
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
spent AS (
    SELECT block_id,
           CAST(len(inputs) AS BIGINT) AS n_spent,
           CAST(coalesce(list_sum(list_transform(inputs, i -> i.value)), 0)
                AS BIGINT) AS v_spent
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase
),
per_block AS (
    SELECT CAST(c.block_id AS BIGINT) AS block_id,
           CAST(sum(c.n_created) AS BIGINT) AS n_created,
           CAST(sum(c.v_created) AS BIGINT) AS v_created,
           CAST(coalesce(s.n_spent, 0) AS BIGINT) AS n_spent,
           CAST(coalesce(s.v_spent, 0) AS BIGINT) AS v_spent
    FROM (SELECT block_id, sum(n_created) AS n_created,
                 sum(v_created) AS v_created
          FROM created GROUP BY 1) c
    LEFT JOIN (SELECT block_id, sum(n_spent) AS n_spent,
                      sum(v_spent) AS v_spent
               FROM spent GROUP BY 1) s
      ON c.block_id = s.block_id
    GROUP BY 1, 4, 5
)
SELECT block_id, n_created, n_spent,
       CAST(sum(n_created - n_spent) OVER w AS BIGINT) AS utxo_count,
       CAST(sum(v_created - v_spent) OVER w AS BIGINT) AS utxo_value
FROM per_block
WINDOW w AS (ORDER BY block_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLE_SQL["q288_dataset_card"] = (
    "WITH base AS (\n"
    "    SELECT d.doc_id, d.source, d.lang, q.n_tokens, q.quality_ok,\n"
    "           l.lang_pred, a.is_keeper\n"
    "    FROM documents d\n"
    "    JOIN (" + ORACLE_SQL["q32_quality_score"] + ") q"
    " ON d.doc_id = q.doc_id\n"
    "    JOIN (" + ORACLE_SQL["q33_language_id"] + ") l"
    " ON d.doc_id = l.doc_id\n"
    "    JOIN (" + ORACLE_SQL["q71_fuzzy_dedup"] + ") a"
    " ON d.doc_id = a.doc_id\n"
    ")"
    + """,
per_src AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tok_total,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_true_langs,
           CAST(1000000 * sum(CASE WHEN quality_ok THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS quality_ok_ppm,
           CAST(1000000 * sum(CASE WHEN is_keeper THEN 0 ELSE 1 END)
                // count(*) AS BIGINT) AS dup_ppm,
           CAST(floor(quantile_cont(n_tokens, 0.5)) AS BIGINT)
               AS p50_tokens
    FROM base GROUP BY 1
),
lp AS (
    SELECT source, lang_pred, count(*) AS cnt FROM base GROUP BY 1, 2
),
top AS (
    SELECT source, lang_pred AS top_pred_lang
    FROM (SELECT source, lang_pred,
                 row_number() OVER (PARTITION BY source
                     ORDER BY cnt DESC, lang_pred) AS rn
          FROM lp)
    WHERE rn = 1
)
SELECT p.*, t.top_pred_lang
FROM per_src p JOIN top t ON p.source = t.source
"""
)

ORACLE_SQL["q289_json_props_stats"] = """
WITH ev AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unparsed,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM ev GROUP BY 1
"""

ORACLE_SQL["q290_nearest_asof"] = """
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
    FROM events
),
flagged AS (
    SELECT user_id, event_id, tsu, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN tsu END
               IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_p,
           first_value(CASE WHEN event_type = 'purchase' THEN tsu END
               IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_p
    FROM ev
)
SELECT user_id, event_id, tsu,
       CAST(CASE
            WHEN prev_p IS NULL AND next_p IS NULL THEN NULL
            WHEN prev_p IS NULL THEN next_p - tsu
            WHEN next_p IS NULL THEN tsu - prev_p
            WHEN tsu - prev_p <= next_p - tsu THEN tsu - prev_p
            ELSE next_p - tsu END AS BIGINT) AS gap_micros,
       CASE WHEN prev_p IS NULL AND next_p IS NULL THEN 'none'
            WHEN prev_p IS NULL THEN 'forward'
            WHEN next_p IS NULL THEN 'backward'
            WHEN tsu - prev_p <= next_p - tsu THEN 'backward'
            ELSE 'forward' END AS direction
FROM flagged WHERE event_type = 'error'
"""

ORACLE_SQL["qd65_haircut_taint_value"] = f"""
WITH outs AS (
    SELECT tx_id, coinbase, block_id,
           u.pos - 1 AS out_idx, CAST(u.val AS BIGINT) AS out_val
    FROM (SELECT tx_id, coinbase, block_id,
                 unnest(list_transform(outputs,
                     (x, i) -> {{'pos': i, 'val': x.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
),
ins AS (
    SELECT tx_id, u.stx AS spent_tx_id, u.sidx AS spent_index,
           CAST(u.val AS BIGINT) AS in_val
    FROM (SELECT tx_id,
                 unnest(list_transform(inputs,
                     x -> {{'stx': x.spent_tx_id, 'sidx': x.spent_index,
                            'val': x.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
          WHERE NOT coinbase)
),
tx_tot AS (
    SELECT tx_id, CAST(sum(in_val) AS BIGINT) AS total_in
    FROM ins GROUP BY 1
),
taint0 AS (
    SELECT tx_id, out_idx, out_val AS taint
    FROM outs WHERE coinbase AND block_id < 10
),
arr1 AS (
    SELECT i.tx_id, CAST(sum(t.taint) AS BIGINT) AS taint_in
    FROM ins i JOIN taint0 t
      ON i.spent_tx_id = t.tx_id AND i.spent_index = t.out_idx
    GROUP BY 1
),
taint1 AS (
    SELECT o.tx_id, o.out_idx,
           CAST((o.out_val::HUGEINT * a.taint_in) // tt.total_in AS BIGINT)
               AS taint
    FROM outs o
    JOIN arr1 a ON o.tx_id = a.tx_id
    JOIN tx_tot tt ON o.tx_id = tt.tx_id
    WHERE (o.out_val::HUGEINT * a.taint_in) // tt.total_in > 0
),
arr2 AS (
    SELECT i.tx_id, CAST(sum(t.taint) AS BIGINT) AS taint_in
    FROM ins i JOIN taint1 t
      ON i.spent_tx_id = t.tx_id AND i.spent_index = t.out_idx
    GROUP BY 1
),
taint2 AS (
    SELECT o.tx_id, o.out_idx,
           CAST((o.out_val::HUGEINT * a.taint_in) // tt.total_in AS BIGINT)
               AS taint
    FROM outs o
    JOIN arr2 a ON o.tx_id = a.tx_id
    JOIN tx_tot tt ON o.tx_id = tt.tx_id
    WHERE (o.out_val::HUGEINT * a.taint_in) // tt.total_in > 0
),
arr3 AS (
    SELECT i.tx_id, CAST(sum(t.taint) AS BIGINT) AS taint_in
    FROM ins i JOIN taint2 t
      ON i.spent_tx_id = t.tx_id AND i.spent_index = t.out_idx
    GROUP BY 1
),
taint3 AS (
    SELECT o.tx_id, o.out_idx,
           CAST((o.out_val::HUGEINT * a.taint_in) // tt.total_in AS BIGINT)
               AS taint
    FROM outs o
    JOIN arr3 a ON o.tx_id = a.tx_id
    JOIN tx_tot tt ON o.tx_id = tt.tx_id
    WHERE (o.out_val::HUGEINT * a.taint_in) // tt.total_in > 0
),
arr4 AS (
    SELECT i.tx_id, CAST(sum(t.taint) AS BIGINT) AS taint_in
    FROM ins i JOIN taint3 t
      ON i.spent_tx_id = t.tx_id AND i.spent_index = t.out_idx
    GROUP BY 1
),
taint4 AS (
    SELECT o.tx_id, o.out_idx,
           CAST((o.out_val::HUGEINT * a.taint_in) // tt.total_in AS BIGINT)
               AS taint
    FROM outs o
    JOIN arr4 a ON o.tx_id = a.tx_id
    JOIN tx_tot tt ON o.tx_id = tt.tx_id
    WHERE (o.out_val::HUGEINT * a.taint_in) // tt.total_in > 0
)
SELECT CAST(1 AS BIGINT) AS hop, tx_id, out_idx AS output_index, taint AS tainted_value FROM taint1
UNION ALL
SELECT CAST(2 AS BIGINT) AS hop, tx_id, out_idx AS output_index, taint AS tainted_value FROM taint2
UNION ALL
SELECT CAST(3 AS BIGINT) AS hop, tx_id, out_idx AS output_index, taint AS tainted_value FROM taint3
UNION ALL
SELECT CAST(4 AS BIGINT) AS hop, tx_id, out_idx AS output_index, taint AS tainted_value FROM taint4
"""

# Min-label propagation over the symmetrized address edges; the inner
# derived table IS qd50's oracle (proportional flow attribution).
ORACLE_SQL["qd66_address_component_census"] = """
WITH RECURSIVE rel AS (
    SELECT DISTINCT
        ('0x' || substr(md5(src_addr), 1, 15))::BIGINT AS src,
        ('0x' || substr(md5(dst_addr), 1, 15))::BIGINT AS dst
    FROM (
WITH ins0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(inputs) + 1),
               i -> {alen: len(inputs[i].address),
                      addr: array_to_string(inputs[i].address, '|'),
                      ival: inputs[i].value})) AS u
    FROM read_parquet('/root/repo/fixtures/raw_txs.parquet')
    WHERE NOT coinbase
),
ins AS (
    SELECT tx_id, u.addr AS src_addr, sum(u.ival) AS in_val
    FROM ins0 WHERE u.alen > 0 GROUP BY 1, 2
),
tot AS (
    SELECT tx_id, sum(in_val) AS total_in FROM ins GROUP BY 1
),
outs0 AS (
    SELECT tx_id,
           unnest(list_transform(range(1, len(outputs) + 1),
               i -> {alen: len(outputs[i].address),
                      addr: array_to_string(outputs[i].address, '|'),
                      oval: outputs[i].value})) AS u
    FROM read_parquet('/root/repo/fixtures/raw_txs.parquet')
),
outs AS (
    SELECT tx_id, u.addr AS dst_addr, sum(u.oval) AS out_val
    FROM outs0 WHERE u.alen > 0 GROUP BY 1, 2
),
pairs AS (
    SELECT i.tx_id, i.src_addr, o.dst_addr,
           CAST((o.out_val::HUGEINT * i.in_val) // t.total_in AS BIGINT)
               AS flow
    FROM ins i
    JOIN tot t ON i.tx_id = t.tx_id
    JOIN outs o ON i.tx_id = o.tx_id
)
SELECT src_addr, dst_addr,
       CAST(count(DISTINCT tx_id) AS BIGINT) AS n_txs,
       CAST(sum(flow) AS BIGINT) AS total_flow
FROM pairs
GROUP BY 1, 2
)
    WHERE src_addr != dst_addr
),
e AS (
    SELECT src AS u, dst AS v FROM rel
    UNION
    SELECT dst, src FROM rel
),
walk(node, comp) AS (
    SELECT u, u FROM e
    UNION
    SELECT e.v, w.comp FROM walk w JOIN e ON e.u = w.node
),
comp AS (
    SELECT node, min(comp) AS component FROM walk GROUP BY 1
),
sizes AS (
    SELECT component, CAST(count(*) AS BIGINT) AS component_size
    FROM comp GROUP BY 1
)
SELECT component_size, CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY 1
"""

ORACLE_SQL["qd67_time_weighted_balance"] = f"""
WITH recv AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(timestamp AS BIGINT) AS ts,
           CAST(u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(outputs,
                     o -> {{'a': o.address, 'v': o.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
    WHERE len(u.a) > 0
),
spent AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(timestamp AS BIGINT) AS ts,
           CAST(-u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(inputs,
                     i -> {{'a': i.address, 'v': i.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
          WHERE NOT coinbase)
    WHERE len(u.a) > 0
),
events AS (
    SELECT addr, ts, CAST(sum(delta) AS BIGINT) AS delta
    FROM (SELECT * FROM recv UNION ALL SELECT * FROM spent)
    GROUP BY 1, 2
),
tip AS (
    SELECT CAST(max(timestamp) AS BIGINT) AS tip
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
timeline AS (
    SELECT addr, ts,
           sum(delta) OVER (PARTITION BY addr ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal,
           coalesce(lead(ts) OVER (PARTITION BY addr ORDER BY ts), tip)
               - ts AS dt,
           tip
    FROM events CROSS JOIN tip
),
per_addr AS (
    SELECT addr,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS first_ts, max(tip) AS tip,
           sum(bal::HUGEINT * dt) AS bal_seconds
    FROM timeline GROUP BY 1
)
SELECT addr, n_events,
       CASE WHEN tip > first_ts
            THEN CAST(bal_seconds // (tip - first_ts) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS twab_satoshi
FROM per_addr
ORDER BY twab_satoshi DESC, addr LIMIT 20
"""

ORACLE_SQL["q291_identity_resolution"] = """
WITH RECURSIVE c AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS BIGINT)
               AS bal_bucket,
           CAST(c_custkey % 97 AS BIGINT) AS synth_id,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
),
edges0 AS (
    SELECT a.c_custkey AS src, b.c_custkey AS dst
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.bal_bucket = b.bal_bucket
     AND a.synth_id = b.synth_id
     AND a.c_custkey < b.c_custkey
),
e AS (
    SELECT src AS u, dst AS v FROM edges0
    UNION
    SELECT dst, src FROM edges0
),
walk(node, comp) AS (
    SELECT u, u FROM e
    UNION
    SELECT e.v, w.comp FROM walk w JOIN e ON e.u = w.node
),
comp AS (
    SELECT node, min(comp) AS component FROM walk GROUP BY 1
),
assigned AS (
    SELECT cu.c_custkey, cu.cents,
           CAST(coalesce(cm.component, cu.c_custkey) AS BIGINT)
               AS cluster_id
    FROM c cu LEFT JOIN comp cm ON cu.c_custkey = cm.node
),
ranked AS (
    SELECT cluster_id, c_custkey, cents,
           row_number() OVER (PARTITION BY cluster_id
               ORDER BY cents DESC, c_custkey) AS rn
    FROM assigned
),
agg AS (
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM ranked GROUP BY 1
)
SELECT a.cluster_id, a.n_members, a.total_cents,
       r.c_custkey AS golden_custkey, r.cents AS golden_cents
FROM agg a JOIN ranked r
  ON a.cluster_id = r.cluster_id AND r.rn = 1
WHERE a.n_members >= 2
"""

ORACLE_SQL["q292_interval_union"] = """
WITH iv AS (
    SELECT l_suppkey, CAST(l_shipdate AS DATE) AS open_day,
           CAST(l_shipdate AS DATE) + 30 AS close_day
    FROM lineitem
),
deltas AS (
    SELECT l_suppkey, day, CAST(sum(d) AS BIGINT) AS delta FROM (
        SELECT l_suppkey, open_day AS day, 1 AS d FROM iv
        UNION ALL SELECT l_suppkey, close_day, -1 FROM iv
    ) GROUP BY 1, 2
),
swept AS (
    SELECT l_suppkey, day,
           sum(delta) OVER w AS active,
           coalesce(sum(delta) OVER (PARTITION BY l_suppkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev_active,
           CAST(coalesce(lead(day) OVER (PARTITION BY l_suppkey
               ORDER BY day), day) - day AS BIGINT) AS dt
    FROM deltas
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(sum(CASE WHEN active > 0 THEN dt ELSE 0 END) AS BIGINT)
           AS union_days,
       CAST(sum(CASE WHEN active > 0 AND prev_active <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stretches
FROM swept GROUP BY 1
"""

ORACLE_SQL["q293_table_reconciliation"] = """
WITH o AS (
    SELECT o_orderkey AS key,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT
               % 17 AS coin
    FROM orders
),
migrated AS (
    SELECT CASE WHEN coin = 2 THEN key + 1000000000 ELSE key END AS key,
           CASE WHEN coin = 1 THEN cents + 1 ELSE cents END AS m_cents
    FROM o WHERE coin != 0
),
joined AS (
    SELECT coalesce(l.key, m.key) AS key, l.cents, m.m_cents,
           CASE WHEN l.cents IS NULL THEN 'ADDED'
                WHEN m.m_cents IS NULL THEN 'REMOVED'
                WHEN l.cents = m.m_cents THEN 'SAME'
                ELSE 'CHANGED' END AS status
    FROM (SELECT key, cents FROM o) l
    FULL OUTER JOIN migrated m ON l.key = m.key
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(coalesce(m_cents, 0) - coalesce(cents, 0)) AS BIGINT)
           AS cents_drift,
       CAST(min(key) AS BIGINT) AS min_key,
       CAST(max(key) AS BIGINT) AS max_key
FROM joined GROUP BY 1
"""

ORACLE_SQL["q294_forecast_backtest"] = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
scored AS (
    SELECT day, cents,
           lag(cents, 7) OVER (ORDER BY day) AS forecast,
           lag(day, 7) OVER (ORDER BY day) AS lag_day
    FROM daily
)
SELECT CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS weekday,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(1000000 * sum(abs(cents - forecast)) // sum(cents) AS BIGINT)
           AS wape_ppm,
       CAST(sum(CASE WHEN forecast > cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_over,
       CAST(sum(CASE WHEN forecast < cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_under
FROM scored
WHERE forecast IS NOT NULL AND day - lag_day = 7
GROUP BY 1
"""

ORACLE_SQL["qd68_whale_transfers"] = f"""
WITH vals AS (
    SELECT tx_id, block_id,
           CAST(coalesce(list_sum(list_transform(outputs, o -> o.value)), 0)
                AS BIGINT) AS out_value
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
flagged AS (
    SELECT tx_id, block_id, out_value,
           CAST(floor(quantile_cont(out_value, 0.5) OVER w) AS BIGINT)
               AS med,
           count(*) OVER w AS n_prev
    FROM vals
    WINDOW w AS (ORDER BY tx_id ROWS BETWEEN 200 PRECEDING AND 1 PRECEDING)
)
SELECT CAST(block_id AS BIGINT) AS block_id,
       CAST(count(*) AS BIGINT) AS n_whales,
       CAST(sum(out_value) AS BIGINT) AS whale_value,
       CAST(max(out_value) AS BIGINT) AS max_value
FROM flagged
WHERE n_prev >= 50 AND out_value > 5 * med
GROUP BY 1
"""

ORACLE_SQL["q295_sequence_pattern"] = """
WITH seqs AS (
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
    FROM events GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM seqs),
m AS (
    SELECT 'resilient_conversion' AS pattern,
           CAST(sum(CASE WHEN regexp_matches(seq, 'view (error )*click')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
    FROM seqs
    UNION ALL
    SELECT 'repeat_purchase',
           CAST(sum(CASE WHEN regexp_matches(seq,
                'purchase [^ ]+ purchase') THEN 1 ELSE 0 END) AS BIGINT)
    FROM seqs
    UNION ALL
    SELECT 'activation',
           CAST(sum(CASE WHEN regexp_matches(seq,
                'signup( [a-z]+)* purchase') THEN 1 ELSE 0 END) AS BIGINT)
    FROM seqs
)
SELECT pattern, n_matching, n_users,
       CAST(1000000 * n_matching // n_users AS BIGINT) AS match_ppm
FROM m CROSS JOIN n
"""

ORACLE_SQL["q296_five_number_summary"] = """
WITH base AS (
    SELECT n_name, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
),
summary AS (
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           list_transform(quantile_cont(cents,
               [0.0, 0.25, 0.5, 0.75, 1.0]),
               x -> CAST(floor(x) AS BIGINT)) AS q
    FROM base GROUP BY 1
),
named AS (
    SELECT n_name, n_orders,
           q[1] AS min_cents, q[2] AS q1_cents, q[3] AS median_cents,
           q[4] AS q3_cents, q[5] AS max_cents
    FROM summary
),
fenced AS (
    SELECT b.n_name, CAST(count(*) AS BIGINT) AS n_outliers
    FROM base b JOIN named s ON b.n_name = s.n_name
    WHERE b.cents > s.q3_cents + 3 * (s.q3_cents - s.q1_cents) / 2
       OR b.cents < s.q1_cents - 3 * (s.q3_cents - s.q1_cents) / 2
    GROUP BY 1
)
SELECT n.n_name, n.n_orders, n.min_cents, n.q1_cents, n.median_cents,
       n.q3_cents, n.max_cents,
       CAST(coalesce(f.n_outliers, 0) AS BIGINT) AS n_outliers
FROM named n LEFT JOIN fenced f ON n.n_name = f.n_name
"""

ORACLE_SQL["qd69_address_type_census"] = f"""
WITH outs AS (
    SELECT CAST(u.t AS BIGINT) AS address_type,
           CAST(u.v AS BIGINT) AS value,
           CASE WHEN len(u.a) > 0 THEN array_to_string(u.a, '|') END
               AS addr
    FROM (SELECT unnest(list_transform(outputs,
              o -> {{'t': o.address_type, 'v': o.value,
                     'a': o.address}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
)
SELECT address_type,
       CAST(count(*) AS BIGINT) AS n_outputs,
       CAST(sum(value) AS BIGINT) AS total_value,
       CAST(max(value) AS BIGINT) AS max_value,
       CAST(count(DISTINCT addr) AS BIGINT) AS n_addresses
FROM outs GROUP BY 1
"""

# The streaming compaction must converge to the batch apply exactly.
ORACLE_SQL["qd70_streaming_cdc"] = ORACLE_SQL["q273_cdc_apply"]

ORACLE_SQL["q297_pit_features"] = """
WITH o AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
feats AS (
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders_pre,
           CAST(sum(cents) AS BIGINT) AS cents_pre,
           CAST(DATE '2000-01-01' - max(day) AS BIGINT) AS recency_days
    FROM o WHERE day < DATE '2000-01-01' GROUP BY 1
),
labels AS (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_post
    FROM o WHERE day >= DATE '2000-01-01' GROUP BY 1
)
SELECT f.o_custkey, f.n_orders_pre, f.cents_pre, f.recency_days,
       coalesce(l.n_post, 0) > 0 AS retained
FROM feats f LEFT JOIN labels l ON f.o_custkey = l.o_custkey
"""

ORACLE_SQL["qd71_balance_audit"] = f"""
WITH recv AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(timestamp AS BIGINT) AS ts, 0 AS kind,
           CAST(u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(outputs,
                     o -> {{'a': o.address, 'v': o.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
    WHERE len(u.a) > 0
),
spent AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(timestamp AS BIGINT) AS ts, 1 AS kind,
           CAST(-u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(inputs,
                     i -> {{'a': i.address, 'v': i.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
          WHERE NOT coinbase)
    WHERE len(u.a) > 0
),
timeline AS (
    SELECT addr,
           sum(delta) OVER (PARTITION BY addr ORDER BY ts, kind
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
    FROM (SELECT * FROM recv UNION ALL SELECT * FROM spent)
),
per_addr AS (
    SELECT addr, CAST(min(bal) AS BIGINT) AS min_bal
    FROM timeline GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_addresses,
       CAST(sum(CASE WHEN min_bal >= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean,
       CAST(sum(CASE WHEN min_bal < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
       CAST(min(min_bal) AS BIGINT) AS worst_dip
FROM per_addr
"""

ORACLE_SQL["q298_balanced_sample"] = """
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents
),
sizes AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_avail
    FROM docs GROUP BY 1
),
floor_n AS (SELECT min(n_avail) AS n_keep FROM sizes),
ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM docs
),
kept AS (
    SELECT r.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(r.doc_id) AS BIGINT) AS kept_id_sum
    FROM ranked r CROSS JOIN floor_n f
    WHERE r.rk <= f.n_keep
    GROUP BY 1
)
SELECT s.lang, s.n_avail, k.n_kept, k.kept_id_sum,
       CAST(1000000 * k.n_kept // s.n_avail AS BIGINT) AS kept_ppm
FROM sizes s JOIN kept k ON s.lang = k.lang
"""

ORACLE_SQL["qd72_outpoint_conflicts"] = f"""
WITH spends AS (
    SELECT u.stx AS stx, CAST(u.sidx AS BIGINT) AS sidx
    FROM (SELECT unnest(list_transform(inputs,
              i -> {{'stx': i.spent_tx_id, 'sidx': i.spent_index}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
          WHERE NOT coinbase)
),
per_outpoint AS (
    SELECT stx, sidx, CAST(count(*) AS BIGINT) AS n_spenders
    FROM spends GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_outpoints,
       CAST(sum(CASE WHEN n_spenders = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean,
       CAST(sum(CASE WHEN n_spenders > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_conflicting,
       CAST(max(n_spenders) AS BIGINT) AS max_spenders
FROM per_outpoint
"""

# Composition oracle: qd65's unrolled taint hops + the output-address
# projection + qd16's recursive co-spend entities, singleton-coalesced
# with the shared 28-bit hash idiom.
ORACLE_SQL["qd73_entity_taint_exposure"] = f"""
WITH taint AS (
{ORACLE_SQL["qd65_haircut_taint_value"]}
),
outs_addr AS (
    SELECT tx_id, CAST(u.oi AS BIGINT) AS output_index,
           array_to_string(u.a, '|') AS addr
    FROM (SELECT tx_id,
                 unnest(list_transform(range(1, len(outputs) + 1),
                     i -> {{oi: i - 1,
                            alen: len(outputs[i].address),
                            a: outputs[i].address}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
    WHERE u.alen > 0
),
ents AS (
{ORACLE_SQL["qd16_cospend_entities"]}
),
j AS (
    SELECT coalesce(e.entity,
               ('0x' || substr(md5(oa.addr), 1, 7))::BIGINT) AS entity,
           t.tainted_value, t.hop
    FROM taint t
    JOIN outs_addr oa
      ON t.tx_id = oa.tx_id AND t.output_index = oa.output_index
    LEFT JOIN ents e ON oa.addr = e.addr
)
SELECT entity,
       CAST(count(*) AS BIGINT) AS n_tainted_outputs,
       CAST(sum(tainted_value) AS BIGINT) AS taint_total,
       CAST(min(hop) AS BIGINT) AS first_hop
FROM j GROUP BY 1
ORDER BY taint_total DESC, entity LIMIT 20
"""

ORACLE_SQL["q299_diff_in_diff"] = """
WITH base AS (
    SELECT r_name = 'ASIA' AS treated,
           CAST(o_orderdate AS DATE) >= DATE '1998-01-01' AS post,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
),
cells AS (
    SELECT treated, post,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) // count(*) AS BIGINT) AS m
    FROM base GROUP BY 1, 2
)
SELECT
    (SELECT m FROM cells WHERE treated AND NOT post) AS treat_pre_mean,
    (SELECT m FROM cells WHERE treated AND post) AS treat_post_mean,
    (SELECT m FROM cells WHERE NOT treated AND NOT post)
        AS control_pre_mean,
    (SELECT m FROM cells WHERE NOT treated AND post) AS control_post_mean,
    (SELECT CAST(sum(n) AS BIGINT) FROM cells WHERE treated) AS n_treat,
    (SELECT CAST(sum(n) AS BIGINT) FROM cells WHERE NOT treated)
        AS n_control,
    CAST(((SELECT m FROM cells WHERE treated AND post)
        - (SELECT m FROM cells WHERE treated AND NOT post))
        - ((SELECT m FROM cells WHERE NOT treated AND post)
        - (SELECT m FROM cells WHERE NOT treated AND NOT post))
        AS BIGINT) AS did_cents
"""

ORACLE_SQL["q300_revenue_bridge"] = """
WITH li AS (
    SELECT l_partkey,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           year(l_shipdate) AS yr
    FROM lineitem WHERE year(l_shipdate) IN (1997, 1998)
),
p AS (
    SELECT p_partkey, string_split(p_type, ' ')[1] AS category FROM part
),
cells AS (
    SELECT p.category, li.yr,
           CAST(sum(li.qty) AS BIGINT) AS q,
           CAST(sum(li.cents) AS BIGINT) AS r
    FROM li JOIN p ON li.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
wide AS (
    SELECT category,
           max(CASE WHEN yr = 1997 THEN r END) AS r_base_cents,
           max(CASE WHEN yr = 1998 THEN r END) AS r_next_cents,
           max(CASE WHEN yr = 1997 THEN q END) AS q_base,
           max(CASE WHEN yr = 1998 THEN q END) AS q_next
    FROM cells GROUP BY 1
)
SELECT category, r_base_cents, r_next_cents, q_base, q_next,
       CAST((q_next - q_base) * r_base_cents * 1000 // q_base AS BIGINT)
           AS volume_effect_milli,
       CAST(1000 * (r_next_cents - r_base_cents)
            - ((q_next - q_base) * r_base_cents * 1000 // q_base)
            AS BIGINT) AS price_mix_effect_milli
FROM wide
WHERE q_base IS NOT NULL AND q_next IS NOT NULL
"""

ORACLE_SQL["qd74_gini_timeseries"] = f"""
WITH recv AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(CAST(timestamp AS BIGINT) // 86400 AS BIGINT) AS day,
           CAST(u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(outputs,
                     o -> {{'a': o.address, 'v': o.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))
    WHERE len(u.a) > 0
),
spent AS (
    SELECT array_to_string(u.a, '|') AS addr,
           CAST(CAST(timestamp AS BIGINT) // 86400 AS BIGINT) AS day,
           CAST(-u.v AS BIGINT) AS delta
    FROM (SELECT timestamp,
                 unnest(list_transform(inputs,
                     i -> {{'a': i.address, 'v': i.value}})) AS u
          FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
          WHERE NOT coinbase)
    WHERE len(u.a) > 0
),
deltas AS (
    SELECT addr, day, CAST(sum(delta) AS BIGINT) AS delta
    FROM (SELECT * FROM recv UNION ALL SELECT * FROM spent)
    GROUP BY 1, 2
),
spine AS (
    SELECT a.addr, d.day
    FROM (SELECT DISTINCT addr FROM deltas) a
    CROSS JOIN (SELECT DISTINCT day FROM deltas) d
),
balances AS (
    SELECT s.addr, s.day,
           sum(coalesce(dl.delta, 0)) OVER (PARTITION BY s.addr
               ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
    FROM spine s LEFT JOIN deltas dl
      ON s.addr = dl.addr AND s.day = dl.day
),
ranked AS (
    SELECT day, x,
           CAST(row_number() OVER (PARTITION BY day ORDER BY x, addr)
                AS BIGINT) AS rk
    FROM balances WHERE x > 0
),
agg AS (
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_holders,
           CAST(sum(x) AS BIGINT) AS sum_x,
           sum(rk::HUGEINT * x) AS sum_rx
    FROM ranked GROUP BY 1
)
SELECT day, n_holders,
       CAST(2 * sum_rx - (n_holders + 1) * sum_x::HUGEINT AS BIGINT)
           AS gini_num,
       CAST(n_holders::HUGEINT * sum_x AS BIGINT) AS gini_den,
       CAST(2 * sum_rx - (n_holders + 1) * sum_x::HUGEINT AS DOUBLE)
           / CAST(n_holders::HUGEINT * sum_x AS DOUBLE) AS gini
FROM agg
"""

ORACLE_SQL["q301_edge_support"] = """
WITH a AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
edges AS (
    SELECT DISTINCT x.s AS u, y.s AS v
    FROM a x JOIN a y ON x.k = y.k AND x.s < y.s
),
adj AS (
    SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
),
support AS (
    SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS support
    FROM edges e
    JOIN adj n1 ON e.u = n1.u
    JOIN adj n2 ON e.v = n2.u AND n1.v = n2.v
    GROUP BY 1, 2
),
fulle AS (
    SELECT e.u, e.v, CAST(coalesce(s.support, 0) AS BIGINT) AS support
    FROM edges e LEFT JOIN support s ON e.u = s.u AND e.v = s.v
),
hist AS (
    SELECT 'hist' AS row_kind, support,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(NULL AS BIGINT) AS top_u, CAST(NULL AS BIGINT) AS top_v
    FROM fulle GROUP BY 2
),
top AS (
    SELECT 'max_edge' AS row_kind, support,
           CAST(NULL AS BIGINT) AS n_edges,
           u AS top_u, v AS top_v
    FROM fulle ORDER BY support DESC, u, v LIMIT 1
)
SELECT * FROM hist UNION ALL SELECT * FROM top
"""

ORACLE_SQL["q302_key_gaps"] = """
WITH keys AS (
    SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
),
gaps AS (
    SELECT prev + 1 AS gap_start, k - 1 AS gap_end,
           CAST(k - prev - 1 AS BIGINT) AS n_missing
    FROM (SELECT k, lag(k) OVER (ORDER BY k) AS prev FROM keys)
    WHERE prev IS NOT NULL AND k - prev > 1
)
SELECT * FROM gaps ORDER BY n_missing DESC, gap_start LIMIT 3
"""

ORACLE_SQL["qd75_supply_audit"] = f"""
WITH fees AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(sum(coalesce(list_sum(list_transform(inputs,
                    i -> i.value)), 0)
                - coalesce(list_sum(list_transform(outputs,
                    o -> o.value)), 0)) AS BIGINT) AS fees
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE NOT coinbase GROUP BY 1
),
claimed AS (
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(sum(coalesce(list_sum(list_transform(outputs,
                    o -> o.value)), 0)) AS BIGINT) AS claimed
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE coinbase GROUP BY 1
),
audit AS (
    SELECT c.block_id, c.claimed,
           5000000000 + coalesce(f.fees, 0) AS allowed
    FROM claimed c LEFT JOIN fees f ON c.block_id = f.block_id
)
SELECT CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN claimed = allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact,
       CAST(sum(CASE WHEN claimed < allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_underclaimed,
       CAST(sum(CASE WHEN claimed > allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_overclaimed,
       CAST(sum(CASE WHEN claimed < allowed THEN allowed - claimed
                     ELSE 0 END) AS BIGINT) AS burned_satoshi
FROM audit
"""

ORACLE_SQL["q303_ngram_coverage"] = r"""
WITH docs AS (
    SELECT list_filter(string_split(
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               x -> x != '') AS toks
    FROM documents
),
bigrams AS (
    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END) AS bg
    FROM docs
),
counts AS (
    SELECT bg, CAST(count(*) AS BIGINT) AS n FROM bigrams GROUP BY 1
),
ranked AS (
    SELECT n,
           CAST(sum(n) OVER (ORDER BY n DESC, bg
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(row_number() OVER (ORDER BY n DESC, bg) AS BIGINT) AS rk
    FROM counts
),
total AS (
    SELECT max(cum) AS mass, max(rk) AS vocab FROM ranked
)
SELECT CAST(max(vocab) AS BIGINT) AS vocab_size,
       CAST(max(mass) AS BIGINT) AS total_mass,
       CAST(min(CASE WHEN cum * 100 >= mass * 50 THEN rk END) AS BIGINT)
           AS k_50pct,
       CAST(min(CASE WHEN cum * 100 >= mass * 90 THEN rk END) AS BIGINT)
           AS k_90pct,
       CAST(min(CASE WHEN cum * 100 >= mass * 99 THEN rk END) AS BIGINT)
           AS k_99pct
FROM ranked CROSS JOIN total
"""

ORACLE_SQL["q304_daily_overlap"] = """
WITH ev AS (
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS eday,
           CAST(user_id // 60 AS BIGINT) AS word,
           CAST(1::BIGINT << CAST(user_id % 60 AS INT) AS BIGINT) AS mask
    FROM events
),
bits AS (
    SELECT eday, word, CAST(bit_or(mask) AS BIGINT) AS bits
    FROM ev GROUP BY 1, 2
),
spine AS (
    SELECT d.eday, w.word
    FROM (SELECT DISTINCT eday FROM bits) d
    CROSS JOIN (SELECT DISTINCT word FROM bits) w
),
dense AS (
    SELECT s.eday, s.word, coalesce(b.bits, 0) AS bits
    FROM spine s LEFT JOIN bits b
      ON s.eday = b.eday AND s.word = b.word
),
lagged AS (
    SELECT eday, bits,
           lag(bits) OVER w AS prev_bits,
           eday - lag(eday) OVER w AS day_gap
    FROM dense
    WINDOW w AS (PARTITION BY word ORDER BY eday)
)
SELECT CAST(DATE '1970-01-01' + CAST(eday AS INT) AS TIMESTAMP) AS day,
       CAST(sum(bit_count(bits & prev_bits)) AS BIGINT) AS n_both,
       CAST(sum(bit_count(bits | prev_bits)) AS BIGINT) AS n_union,
       CASE WHEN sum(bit_count(bits | prev_bits)) = 0 THEN NULL
            ELSE CAST(1000000 * sum(bit_count(bits & prev_bits))
                 // sum(bit_count(bits | prev_bits)) AS BIGINT) END
           AS jaccard_ppm
FROM lagged
WHERE prev_bits IS NOT NULL AND day_gap = 1
GROUP BY 1
"""

# The incremental fold must be cell-exact against the FULL REBUILD.
ORACLE_SQL["q305_scd2_incremental"] = ORACLE_SQL["q269_scd2_dimension"]

# round-8: exact quantized PCA scatter — unnest (i, j) coordinate
# pairs; 500 x 64^2 rows is nothing for the oracle, while the engine
# side stays one integer GEMM per Arrow batch
ORACLE_SQL["q170_pca_scatter"] = """
WITH v AS (
    SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
               AS e
    FROM embeddings
),
xx AS (
    SELECT CAST(i.i - 1 AS BIGINT) AS row, CAST(j.j - 1 AS BIGINT) AS col,
           CAST(sum(e[i.i] * e[j.j]) AS BIGINT) AS value
    FROM v,
         (SELECT unnest(range(1, 65)) AS i) i,
         (SELECT unnest(range(1, 65)) AS j) j
    GROUP BY 1, 2
),
s AS (
    SELECT CAST(i.i - 1 AS BIGINT) AS row, CAST(-1 AS BIGINT) AS col,
           CAST(sum(e[i.i]) AS BIGINT) AS value
    FROM v, (SELECT unnest(range(1, 65)) AS i) i
    GROUP BY 1, 2
)
SELECT * FROM xx
UNION ALL SELECT * FROM s
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST(count(*) AS BIGINT) FROM v
"""


# -- round-8 additions ------------------------------------------------

ORACLE_SQL["q306_grouped_ridge"] = """
WITH g AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           count(*)::HUGEINT AS n,
           sum(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))::HUGEINT
               AS sx,
           sum(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               * CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))::HUGEINT
               AS sxx,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::HUGEINT AS sy,
           sum(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               * CAST(round(o_totalprice * 100) AS BIGINT))::HUGEINT AS sxy
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
),
d AS (
    SELECT nation,
           (n + 1) * (sxx + 1) - sx * sx AS den,
           sy * (sxx + 1) - sx * sxy AS n0,
           (n + 1) * sxy - sy * sx AS n1
    FROM g
)
SELECT nation, u.coef_idx,
       CAST(CASE u.coef_idx WHEN 0 THEN n0 ELSE n1 END AS VARCHAR)
           AS beta_num,
       CAST(den AS VARCHAR) AS beta_den
FROM d CROSS JOIN (SELECT unnest(range(0, 2)) AS coef_idx) u
"""

ORACLE_SQL["q307_isotonic_trend"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS y
    FROM orders GROUP BY 1
),
d AS (
    SELECT day, y,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
           CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS s
    FROM daily
),
segmin AS (
    SELECT i.rn AS i,
           CAST(min((1000 * (j.s - (i.s - i.y))) // (j.rn - i.rn + 1))
               AS BIGINT) AS b
    FROM d i JOIN d j ON j.rn >= i.rn
    GROUP BY 1
),
fit AS (
    SELECT i, CAST(max(b) OVER (ORDER BY i) AS BIGINT) AS fit_milli
    FROM segmin
)
SELECT CAST(to_timestamp(d.day * 86400) AS TIMESTAMP) AS day, d.y,
       fit.fit_milli
FROM d JOIN fit ON d.rn = fit.i
"""

ORACLE_SQL["q308_hodges_lehmann"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS y
    FROM orders GROUP BY 1
),
walsh AS (
    SELECT a.y + b.y AS v, CAST(count(*) AS BIGINT) AS cnt
    FROM daily a JOIN daily b ON b.day >= a.day
    GROUP BY 1
),
cum AS (
    SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
    FROM walsh
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs FROM walsh),
med AS (
    SELECT CAST(min(v) AS BIGINT) AS hl2
    FROM cum CROSS JOIN tot WHERE cum >= (n_pairs + 1) / 2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       tot.n_pairs, med.hl2,
       CAST(med.hl2 AS DOUBLE) / 2.0 AS hl
FROM tot CROSS JOIN med
"""

ORACLE_SQL["q310_mann_whitney"] = """
WITH per AS (
    SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    GROUP BY 1
),
ranked AS (
    SELECT s, n, n_a,
           CAST(2 * coalesce(sum(n) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + n + 1 AS BIGINT) AS midrank2
    FROM per
),
agg AS (
    SELECT CAST(sum(n_a) AS BIGINT) AS n_a,
           CAST(sum(n) - sum(n_a) AS BIGINT) AS n_b,
           CAST(sum(n_a * midrank2) AS BIGINT) AS r_a2
    FROM ranked
)
SELECT n_a, n_b, r_a2,
       CAST(r_a2 - n_a * (n_a + 1) AS BIGINT) AS u2,
       CAST(1000000 * (r_a2 - n_a * (n_a + 1)) // (2 * n_a * n_b)
           AS BIGINT) AS u_ppm
FROM agg
"""

ORACLE_SQL["q311_cross_correlation"] = """
WITH daily AS (
    SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS b
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY 1
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS sa,
           CAST(sum(b) AS BIGINT) AS sb
    FROM daily
),
d AS (
    SELECT day, a - (sa // n) AS ca, b - (sb // n) AS cb
    FROM daily CROSS JOIN stats
),
dens AS (
    SELECT CAST(sum(ca * ca) AS BIGINT) AS da,
           CAST(sum(cb * cb) AS BIGINT) AS db
    FROM d
),
num AS (
    SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(x.ca * y.cb) AS BIGINT) AS num
    FROM (SELECT unnest(range(-3, 4)) AS lag) l
    JOIN d x ON TRUE
    JOIN d y ON y.day = x.day + l.lag
    GROUP BY 1
)
SELECT lag, n_pairs, num, da, db,
       CAST(num AS DOUBLE) / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE))
           AS xcorr
FROM num CROSS JOIN dens
"""

ORACLE_SQL["q312_keyword_in_context"] = r"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split(
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
               t -> t <> '') AS toks
    FROM documents
),
occ AS (
    SELECT doc_id, toks, u.p AS pos
    FROM tok,
         LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS p) u
    WHERE toks[u.p] = 'join'
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       coalesce(array_to_string(toks[greatest(pos - 2, 1):pos - 1], ' '),
                '') AS left_ctx,
       coalesce(array_to_string(toks[pos + 1:least(pos + 2, len(toks))],
                ' '), '') AS right_ctx
FROM occ
"""


ORACLE_SQL["qd76_coinbase_maturity"] = f"""
WITH heights AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS blk
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
cb_outs AS (
    SELECT t.tx_id, u.oi - 1 AS output_index, u.val AS value, h.blk
    FROM (
        SELECT tx_id,
               unnest(list_transform(range(1, len(outputs) + 1),
                   i -> {{oi: i, val: outputs[i].value}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        WHERE coinbase
    ) t JOIN heights h ON t.tx_id = h.tx_id
),
ins AS (
    SELECT u.sti AS spent_tx_id, u.sii AS spent_index, h.blk AS spend_blk
    FROM (
        SELECT tx_id,
               unnest(list_transform(inputs,
                   i -> {{sti: i.spent_tx_id, sii: i.spent_index}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        WHERE NOT coinbase
    ) t JOIN heights h ON t.tx_id = h.tx_id
)
SELECT CAST(i.spend_blk - o.blk AS BIGINT) AS delta_blocks,
       CAST(count(*) AS BIGINT) AS n_spends,
       CAST(sum(o.value) AS BIGINT) AS value_moved
FROM ins i JOIN cb_outs o
  ON i.spent_tx_id = o.tx_id AND i.spent_index = o.output_index
GROUP BY 1
"""

ORACLE_SQL["qd77_address_lifetime"] = f"""
WITH heights AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS blk
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT t.tx_id, u.oi - 1 AS output_index,
           u.addr AS addr, u.val AS value
    FROM (
        SELECT tx_id,
               unnest(list_transform(range(1, len(outputs) + 1),
                   i -> {{oi: i,
                          alen: len(outputs[i].address),
                          addr: array_to_string(outputs[i].address, '|'),
                          val: outputs[i].value}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    ) t WHERE u.alen > 0
),
credits AS (
    SELECT o.addr, o.tx_id, h.blk, o.value AS recv, 0::BIGINT AS spent
    FROM outs o JOIN heights h ON o.tx_id = h.tx_id
),
ins AS (
    SELECT t.tx_id, u.sti AS spent_tx_id, u.sii AS spent_index
    FROM (
        SELECT tx_id,
               unnest(list_transform(inputs,
                   i -> {{sti: i.spent_tx_id, sii: i.spent_index}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        WHERE NOT coinbase
    ) t
),
debits AS (
    SELECT o.addr, i.tx_id, h.blk, 0::BIGINT AS recv, o.value AS spent
    FROM ins i
    JOIN outs o ON i.spent_tx_id = o.tx_id AND i.spent_index = o.output_index
    JOIN heights h ON i.tx_id = h.tx_id
),
ev AS (SELECT * FROM credits UNION ALL SELECT * FROM debits)
SELECT addr,
       CAST(min(blk) AS BIGINT) AS first_block,
       CAST(max(blk) AS BIGINT) AS last_block,
       CAST(count(DISTINCT tx_id) AS BIGINT) AS n_txs,
       CAST(sum(recv) AS BIGINT) AS received_value,
       CAST(sum(spent) AS BIGINT) AS spent_value
FROM ev GROUP BY 1
"""

ORACLE_SQL["qd78_ktruss_peel"] = """
WITH a AS (
    SELECT DISTINCT l_orderkey AS k, CAST(l_suppkey AS BIGINT) AS s
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
),
edges AS (
    SELECT DISTINCT x.s AS u, y.s AS v
    FROM a x JOIN a y ON x.k = y.k AND x.s < y.s
),
adj0 AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
sup1 AS (
    SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
    FROM edges e
    JOIN adj0 n1 ON e.u = n1.u
    JOIN adj0 n2 ON e.v = n2.u AND n1.v = n2.v
    GROUP BY 1, 2
),
s1 AS (
    SELECT e.u, e.v, CAST(coalesce(sup1.sup, 0) AS BIGINT) AS support1
    FROM edges e LEFT JOIN sup1 ON e.u = sup1.u AND e.v = sup1.v
),
e1 AS (SELECT u, v FROM s1 WHERE support1 >= 2),
adj1 AS (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
sup2 AS (
    SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
    FROM e1 e
    JOIN adj1 n1 ON e.u = n1.u
    JOIN adj1 n2 ON e.v = n2.u AND n1.v = n2.v
    GROUP BY 1, 2
),
s2 AS (
    SELECT e.u, e.v, CAST(coalesce(sup2.sup, 0) AS BIGINT) AS support2
    FROM e1 e LEFT JOIN sup2 ON e.u = sup2.u AND e.v = sup2.v
)
SELECT s1.u, s1.v, s1.support1, s2.support2,
       coalesce(s2.support2 >= 2, FALSE) AS in_truss
FROM s1 LEFT JOIN s2 ON s1.u = s2.u AND s1.v = s2.v
"""

ORACLE_SQL["qd79_streaming_address_lifetime"] = f"""
WITH heights AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS blk
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT t.tx_id, u.oi - 1 AS output_index,
           u.addr AS addr, u.val AS value
    FROM (
        SELECT tx_id,
               unnest(list_transform(range(1, len(outputs) + 1),
                   i -> {{oi: i,
                          alen: len(outputs[i].address),
                          addr: array_to_string(outputs[i].address, '|'),
                          val: outputs[i].value}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    ) t WHERE u.alen > 0
),
credits AS (
    SELECT o.addr, h.blk, o.value AS recv, 0::BIGINT AS spent
    FROM outs o JOIN heights h ON o.tx_id = h.tx_id
),
ins AS (
    SELECT t.tx_id, u.sti AS spent_tx_id, u.sii AS spent_index
    FROM (
        SELECT tx_id,
               unnest(list_transform(inputs,
                   i -> {{sti: i.spent_tx_id, sii: i.spent_index}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        WHERE NOT coinbase
    ) t
),
debits AS (
    SELECT o.addr, h.blk, 0::BIGINT AS recv, o.value AS spent
    FROM ins i
    JOIN outs o ON i.spent_tx_id = o.tx_id AND i.spent_index = o.output_index
    JOIN heights h ON i.tx_id = h.tx_id
),
ev AS (SELECT * FROM credits UNION ALL SELECT * FROM debits)
SELECT addr,
       CAST(min(blk) AS BIGINT) AS first_block,
       CAST(max(blk) AS BIGINT) AS last_block,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(recv) AS BIGINT) AS received_value,
       CAST(sum(spent) AS BIGINT) AS spent_value
FROM ev GROUP BY 1
"""

ORACLE_SQL["q309_quantile_shift"] = """
WITH per AS (
    SELECT c_mktsegment AS seg,
           CAST(round(c_acctbal * 100) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS cnt
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    GROUP BY 1, 2
),
cum AS (
    SELECT seg, s,
           CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY s) AS BIGINT)
               AS cum
    FROM per
),
tot AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n FROM per GROUP BY 1),
targets AS (
    SELECT seg, d.decile, CAST((d.decile * n + 9) // 10 AS BIGINT) AS k
    FROM tot CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d
),
qtile AS (
    SELECT c.seg, t.decile, CAST(min(c.s) AS BIGINT) AS q
    FROM cum c JOIN targets t ON c.seg = t.seg AND c.cum >= t.k
    GROUP BY 1, 2
)
SELECT a.decile AS decile, a.q AS q_auto, b.q AS q_build,
       CAST(a.q - b.q AS BIGINT) AS shift
FROM qtile a JOIN qtile b
  ON a.decile = b.decile AND a.seg = 'AUTOMOBILE' AND b.seg = 'BUILDING'
"""

ORACLE_SQL["q313_recurring_payments"] = """
WITH ev AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT) AS tse,
           CAST(event_id AS BIGINT) AS event_id
    FROM events
),
gaps AS (
    SELECT user_id, event_type,
           tse - lag(tse) OVER (PARTITION BY user_id, event_type
                                ORDER BY tse, event_id) AS g
    FROM ev
),
agg AS (
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(g) AS BIGINT) AS sg,
           CAST(sum(g * g) AS BIGINT) AS sgg
    FROM gaps WHERE g IS NOT NULL
    GROUP BY 1, 2
    HAVING count(*) >= 3
)
SELECT user_id, event_type, n_gaps,
       CAST(sg // n_gaps AS BIGINT) AS mean_gap_s,
       CAST(n_gaps * sgg - sg * sg AS BIGINT) AS var_num,
       16 * (n_gaps * sgg - sg * sg) < sg * sg AS is_periodic
FROM agg
"""

ORACLE_SQL["q314_zipf_profile"] = r"""
WITH counts AS (
    SELECT t, CAST(count(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(list_filter(string_split(
            lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
            x -> x <> '')) AS t
        FROM documents
    )
    GROUP BY 1
),
top AS (
    SELECT t, freq FROM counts ORDER BY freq DESC, t LIMIT 50
),
ranked AS (
    SELECT t, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, t) AS BIGINT)
               AS rank
    FROM top
),
top1 AS (SELECT freq AS f1 FROM ranked WHERE rank = 1)
SELECT rank, t AS token, freq,
       CAST(1000000 * freq * rank // f1 AS BIGINT) AS zipf_ppm
FROM ranked CROSS JOIN top1
"""

ORACLE_SQL["q315_schema_evolution"] = """
WITH o AS (
    SELECT o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderpriority
    FROM orders
),
evolved AS (
    SELECT 'v1' AS era, cents, CAST(NULL AS BIGINT) AS priority_flag
    FROM o WHERE o_orderdate < TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT 'v2' AS era, cents,
           CAST(CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END
               AS BIGINT) AS priority_flag
    FROM o WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
SELECT era, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(CASE WHEN priority_flag IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_null_flag,
       CAST(coalesce(sum(priority_flag), 0) AS BIGINT) AS n_priority
FROM evolved GROUP BY 1
"""

ORACLE_SQL["q316_corrupt_records"] = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_quarantined,
       CAST(sum(CASE WHEN o_orderkey % 97 <> 0
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
           AS BIGINT) AS clean_cents
FROM orders
"""

ORACLE_SQL["qd80_utxo_survival"] = f"""
WITH heights AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS blk
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT t.tx_id, u.oi - 1 AS output_index, u.val AS value,
           h.blk AS created_blk
    FROM (
        SELECT tx_id,
               unnest(list_transform(range(1, len(outputs) + 1),
                   i -> {{oi: i, val: outputs[i].value}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    ) t JOIN heights h ON t.tx_id = h.tx_id
),
spends AS (
    SELECT u.sti AS tx_id, u.sii AS output_index, h.blk AS spend_blk
    FROM (
        SELECT tx_id,
               unnest(list_transform(inputs,
                   i -> {{sti: i.spent_tx_id, sii: i.spent_index}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        WHERE NOT coinbase
    ) t JOIN heights h ON t.tx_id = h.tx_id
),
joined AS (
    SELECT o.value, o.created_blk, s.spend_blk
    FROM outs o LEFT JOIN spends s
      ON o.tx_id = s.tx_id AND o.output_index = s.output_index
)
SELECT CAST(created_blk // 25 AS BIGINT) AS era_bucket,
       CAST(count(*) AS BIGINT) AS n_outputs,
       CAST(sum(value) AS BIGINT) AS value_created,
       CAST(sum(CASE WHEN spend_blk IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_spent,
       CAST(sum(CASE WHEN spend_blk IS NOT NULL
                      AND spend_blk - created_blk <= 10
                THEN 1 ELSE 0 END) AS BIGINT) AS n_spent_fast,
       CAST(sum(CASE WHEN spend_blk IS NULL THEN value ELSE 0 END)
           AS BIGINT) AS value_unspent
FROM joined GROUP BY 1
"""


ORACLE_SQL["q317_order_dependency"] = """
WITH o AS (
    SELECT CAST(o_orderkey AS BIGINT) AS okey,
           CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS oday,
           CAST(o_custkey AS BIGINT) AS ckey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
v1 AS (
    SELECT 'oday_to_okey' AS pair,
           CAST(sum(CASE WHEN pa IS NOT NULL AND a > pa AND b < pb
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM (SELECT oday AS a, okey AS b,
                 lag(oday) OVER (ORDER BY oday, okey) AS pa,
                 lag(okey) OVER (ORDER BY oday, okey) AS pb
          FROM o)
),
v2 AS (
    SELECT 'okey_to_oday' AS pair,
           CAST(sum(CASE WHEN pa IS NOT NULL AND a > pa AND b < pb
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM (SELECT okey AS a, oday AS b,
                 lag(okey) OVER (ORDER BY okey, oday) AS pa,
                 lag(oday) OVER (ORDER BY okey, oday) AS pb
          FROM o)
),
v3 AS (
    SELECT 'ckey_to_cents' AS pair,
           CAST(sum(CASE WHEN pa IS NOT NULL AND a > pa AND b < pb
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM (SELECT ckey AS a, cents AS b,
                 lag(ckey) OVER (ORDER BY ckey, cents) AS pa,
                 lag(cents) OVER (ORDER BY ckey, cents) AS pb
          FROM o)
)
SELECT pair, n_violations, n_violations = 0 AS holds FROM v1
UNION ALL SELECT pair, n_violations, n_violations = 0 FROM v2
UNION ALL SELECT pair, n_violations, n_violations = 0 FROM v3
"""

ORACLE_SQL["q318_lateness_audit"] = """
WITH ev AS (
    SELECT event_type, CAST(event_id AS BIGINT) AS eid,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT)
               AS tse
    FROM events
),
late AS (
    SELECT event_type,
           max(tse) OVER (PARTITION BY event_type
               ORDER BY eid // 100, md5(CAST(eid AS VARCHAR)), eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - tse AS late_s
    FROM ev
)
SELECT event_type,
       CASE WHEN late_s <= 0 THEN 'on_time'
            WHEN late_s <= 60 THEN 'le_1m'
            WHEN late_s <= 3600 THEN 'le_1h'
            WHEN late_s <= 86400 THEN 'le_1d'
            ELSE 'gt_1d' END AS lateness_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(late_s) AS BIGINT) AS max_late_s
FROM late GROUP BY 1, 2
"""

ORACLE_SQL["qd81_dust_analysis"] = f"""
WITH heights AS (
    SELECT tx_id, CAST(block_id AS BIGINT) AS blk
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
),
outs AS (
    SELECT t.tx_id, u.val AS value
    FROM (
        SELECT tx_id,
               unnest(list_transform(outputs, o -> {{val: o.value}})) AS u
        FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    ) t
),
j AS (
    SELECT o.value, h.blk FROM outs o JOIN heights h ON o.tx_id = h.tx_id
)
SELECT CAST(blk // 25 AS BIGINT) AS era_bucket,
       CAST(count(*) AS BIGINT) AS n_outputs,
       CAST(sum(CASE WHEN value < 10000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dust,
       CAST(sum(CASE WHEN value < 10000 THEN value ELSE 0 END) AS BIGINT)
           AS dust_value,
       CAST(1000000 * sum(CASE WHEN value < 10000 THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS dust_share_ppm
FROM j GROUP BY 1
"""

# round-8: the quantized Lloyd fixpoint is integer-exact end to end,
# upgrading the former rows-only q111 to a hash-green row
ORACLE_SQL["q111_kmeans_lloyd"] = _kmeans_quantized_sql(10, 64, 5)

# round-9: the 8-round BPE merge fold unrolled per the same discipline
# upgrades the former rows-only q140 to a cell-exact row (integer pair
# counts, deterministic tie-break, positional greedy-merge semantics)
ORACLE_SQL["q140_bpe_train"] = _bpe_train_sql(8)

# round-9: Louvain was already integer-exact and deterministic in the
# engine (2m-scaled gains, total tie-breaks, parity moves) — the SQL
# unroll replays the 2 levels x 3 sub-rounds literally, upgrading the
# former rows-only q160 to a cell-exact row
ORACLE_SQL["q160_louvain"] = _louvain_sql(3, 2)

# round-9 wave: incremental dedup / leakage-safe split / peel chains
ORACLE_SQL["q319_incremental_dedup"] = r"""
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
    FROM documents
),
newb AS (SELECT * FROM d WHERE doc_id % 5 = 0),
oldc AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
oi AS (SELECT h, min(doc_id) AS old_min FROM oldc GROUP BY h),
bm AS (SELECT h, min(doc_id) AS batch_min FROM newb GROUP BY h)
SELECT n.doc_id,
       CASE WHEN oi.old_min IS NOT NULL THEN 'dup_of_existing'
            WHEN n.doc_id > bm.batch_min THEN 'dup_in_batch'
            ELSE 'unique' END AS verdict,
       CAST(coalesce(oi.old_min, bm.batch_min) AS BIGINT) AS canonical_id
FROM newb n LEFT JOIN oi ON n.h = oi.h JOIN bm ON n.h = bm.h
"""

ORACLE_SQL["q320_leakage_safe_split"] = (
    ORACLE_SQL["q71_fuzzy_dedup"].rsplit("SELECT CAST(d.doc_id", 1)[0]
    + """,
assigned AS (
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(length(d.text) AS BIGINT) AS chars,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
splits AS (
    SELECT doc_id, chars, cluster_id,
           CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 7))
                         ::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 7))
                         ::BIGINT % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
),
leak AS (
    SELECT CAST(coalesce(sum(CASE WHEN s1.split <> s2.split
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS cross_split_dup_pairs
    FROM (SELECT id_a, id_b FROM ja WHERE jaccard >= 0.2) p
    JOIN splits s1 ON p.id_a = s1.doc_id
    JOIN splits s2 ON p.id_b = s2.doc_id
)
SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT s.cluster_id) AS BIGINT) AS n_clusters,
       CAST(sum(s.chars) AS BIGINT) AS total_chars,
       leak.cross_split_dup_pairs
FROM splits s CROSS JOIN leak
GROUP BY s.split, leak.cross_split_dup_pairs
"""
)

ORACLE_SQL["q321_incremental_neardup"] = (
    "WITH "
    + _TEXT_CTE
    + """,
szs AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
inter AS (
    SELECT CAST(a.doc_id AS BIGINT) AS new_doc_id,
           CAST(b.doc_id AS BIGINT) AS matched_old_id,
           CAST(count(*) AS BIGINT) AS inter
    FROM ex a JOIN ex b ON a.h = b.h
    WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
    GROUP BY 1, 2
)
SELECT i.new_doc_id, i.matched_old_id, i.inter,
       CAST(sa.n + sb.n - i.inter AS BIGINT) AS union_sz,
       CAST(1000000 * i.inter // (sa.n + sb.n - i.inter) AS BIGINT)
           AS jaccard_ppm
FROM inter i
JOIN szs sa ON i.new_doc_id = sa.doc_id
JOIN szs sb ON i.matched_old_id = sb.doc_id
WHERE 3 * i.inter >= sa.n + sb.n
"""
)

ORACLE_SQL["qd82_peel_chain"] = f"""
WITH RECURSIVE peel AS (
    SELECT CAST(tx_id AS BIGINT) AS tx_id,
           CAST(inputs[1].spent_tx_id AS BIGINT) AS parent,
           CAST(inputs[1].value AS BIGINT) AS in_value,
           CAST(inputs[1].spent_index AS BIGINT) AS in_index,
           CAST(list_sum(list_transform(outputs, o -> o.value)) AS BIGINT)
               AS out_total
    FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
    WHERE len(inputs) = 1 AND len(outputs) = 2
),
succ AS (
    SELECT parent, tx_id AS child, in_value AS continued_value
    FROM (
        SELECT p.parent, p.tx_id, p.in_value,
               row_number() OVER (PARTITION BY p.parent
                   ORDER BY p.in_value DESC, p.in_index ASC) AS rn
        FROM peel p JOIN peel q ON p.parent = q.tx_id
    ) WHERE rn = 1
),
edges AS (
    SELECT s.parent, s.child, pt.out_total - s.continued_value AS peeled
    FROM succ s JOIN peel pt ON s.parent = pt.tx_id
),
heads AS (
    -- anti-join, not EXCEPT: DuckDB rejects set ops other than UNION
    -- inside a WITH RECURSIVE block
    SELECT DISTINCT e.parent AS head FROM edges e
    WHERE NOT EXISTS (SELECT 1 FROM edges c WHERE c.child = e.parent)
),
walk(head, node, dist, psum) AS (
    SELECT head, head, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM heads
    UNION ALL
    SELECT w.head, e.child, w.dist + 1, w.psum + e.peeled
    FROM walk w JOIN edges e ON e.parent = w.node
),
tails AS (
    SELECT head, node, dist, psum,
           row_number() OVER (PARTITION BY head ORDER BY dist DESC) AS rn
    FROM walk
)
SELECT CAST(head AS BIGINT) AS head_tx,
       CAST(dist + 1 AS BIGINT) AS chain_len,
       CAST(node AS BIGINT) AS tail_tx,
       CAST(psum AS BIGINT) AS peeled_total
FROM tails WHERE rn = 1 AND dist >= 1
"""

# round-8: exact Cramer ridge — the determinants are reproduced in
# HUGEINT (3x3 products of ~1e8-1e14 sums stay far under 1.7e38) and
# compared as decimal strings, upgrading q167 to hash-green
ORACLE_SQL["q167_ridge_fit"] = """
WITH li AS (
    SELECT 1::BIGINT AS x0,
           CAST(l_quantity AS BIGINT) AS x1,
           CAST(round(l_discount * 100) AS BIGINT) AS x2,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
),
g AS (
    SELECT sum(x0*x0)::HUGEINT + 1 AS a11, sum(x0*x1)::HUGEINT AS a12,
           sum(x0*x2)::HUGEINT AS a13,
           sum(x1*x0)::HUGEINT AS a21, sum(x1*x1)::HUGEINT + 1 AS a22,
           sum(x1*x2)::HUGEINT AS a23,
           sum(x2*x0)::HUGEINT AS a31, sum(x2*x1)::HUGEINT AS a32,
           sum(x2*x2)::HUGEINT + 1 AS a33,
           sum(x0*y)::HUGEINT AS b1, sum(x1*y)::HUGEINT AS b2,
           sum(x2*y)::HUGEINT AS b3
    FROM li
),
d AS (
    SELECT a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
           + a13*(a21*a32 - a22*a31) AS den,
           b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3)
           + a13*(b2*a32 - a22*b3) AS n0,
           a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31)
           + a13*(a21*b3 - b2*a31) AS n1,
           a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31)
           + b1*(a21*a32 - a22*a31) AS n2
    FROM g
)
SELECT u.coef_idx,
       CAST(CASE u.coef_idx WHEN 0 THEN n0 WHEN 1 THEN n1 ELSE n2 END
            AS VARCHAR) AS beta_num,
       CAST(den AS VARCHAR) AS beta_den
FROM d CROSS JOIN (SELECT unnest(range(0, 3)) AS coef_idx) u
"""
