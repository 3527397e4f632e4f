"""Structural-invariant tests for the SCD2/funnel/sweep-line/streak/
CDC wave: properties that must hold regardless of data, checked on
sf0.001 against the Spark implementations directly."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_scd2_versions_chain(spark):
    """Versions are contiguous per user, intervals chain exactly
    (valid_to == next valid_from), exactly one current row per user,
    and consecutive versions never repeat the same attribute value."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q269_scd2_dimension"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for r in vs if r["is_current"]) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], user
            assert a["event_type"] != b["event_type"], user


def test_funnel_monotone(spark):
    """Stage populations can only shrink: n0 >= n1 >= n2 >= n3, and
    every conversion_ppm is in [0, 1e6]."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = {
        r["step"]: r
        for r in QUERIES["q270_funnel_conversion"](spark, SF).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    ns = [rows[k]["n_users"] for k in (0, 1, 2, 3)]
    assert ns == sorted(ns, reverse=True)
    for r in rows.values():
        assert 0 <= r["conversion_ppm"] <= 1_000_000


def test_max_concurrency_bounds(spark):
    """The yearly peak is positive, never exceeds the total number of
    lineitems, and the peak day falls inside its year."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    n_li = load_table(spark, SF, "lineitem").count()
    rows = QUERIES["q271_max_concurrency"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_open"] <= n_li
        assert r["peak_day"].year == r["year"]


def test_streaks_python_reference(spark):
    """Longest streak per user equals a pure-Python islands replay
    over the same distinct (user, day) set."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    days = (
        load_table(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in days:
        by_user.setdefault(r["user_id"], []).append(r["day"])
    expect = {}
    for user, ds in by_user.items():
        ds.sort()
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            best = max(best, cur)
        expect[user] = (len(ds), best)
    got = QUERIES["q272_activity_streaks"](spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        n_days, longest = expect[r["user_id"]]
        assert r["n_active_days"] == n_days
        assert r["longest_streak"] == longest
        assert r["n_streaks"] >= 1


def test_cdc_apply_partition(spark):
    """The applied table partitions the key space: n_keys summed over
    final ops equals the number of distinct order keys."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    n_keys = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    rows = QUERIES["q273_cdc_apply"](spark, SF).collect()
    assert {r["op"] for r in rows} <= {"U", "D"}
    assert sum(r["n_keys"] for r in rows) == n_keys


def test_adjusted_rand_python_reference(spark):
    """ARI ppm equals a pure-Python pair-count replay, and the two
    degenerate identities hold: ARI(lang, lang) would be 1e6 (checked
    via the closed form on the replayed sums)."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "lang", "n_chars"
    ).collect()
    from collections import Counter

    cells = Counter((r["lang"], r["n_chars"] // 64) for r in docs)
    comb2 = lambda x: x * (x - 1) // 2  # noqa: E731
    i_pairs = sum(comb2(v) for v in cells.values())
    rows_a = Counter()
    rows_b = Counter()
    for (lang, b), v in cells.items():
        rows_a[lang] += v
        rows_b[b] += v
    sa = sum(comb2(v) for v in rows_a.values())
    sb = sum(comb2(v) for v in rows_b.values())
    n = sum(cells.values())
    cn2 = comb2(n)
    den = cn2 * (sa + sb) - 2 * sa * sb
    expect = (2_000_000 * (i_pairs * cn2 - sa * sb)) // den if den else None
    got = QUERIES["q274_adjusted_rand"](spark, SF).collect()[0]
    assert got["n_items"] == n
    assert got["i_pairs"] == i_pairs
    assert (got["sa"], got["sb"]) == (sa, sb)
    # Spark DECIMAL DIV truncates toward zero; Python // floors —
    # they agree unless the quotient is negative and inexact.
    q = got["ari_ppm"]
    assert q == expect or (expect is not None and q == expect + 1
                           and expect < 0)


def test_record_linkage_scores(spark):
    """Scores decompose exactly from the agreement flags, the frame
    is sorted by (score DESC, key_a, key_b), and keys never pair with
    themselves."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q275_record_linkage"](spark, SF).collect()
    assert 0 < len(rows) <= 100
    prev = None
    for r in rows:
        expect = (24 if r["agree_bal"] else -8) + (
            18 if r["agree_syn"] else -6
        )
        assert r["score"] == expect
        assert r["key_a"] < r["key_b"]
        key = (-r["score"], r["key_a"], r["key_b"])
        assert prev is None or prev <= key
        prev = key


def test_vwap_ohlc_bounds(spark):
    """low <= {open, close, vwap} <= high for every bar, and volume
    is positive."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q276_vwap_ohlc"](spark, SF).collect()
    assert rows
    for r in rows:
        lo, hi = r["low_cents"], r["high_cents"]
        assert lo <= r["open_cents"] <= hi
        assert lo <= r["close_cents"] <= hi
        assert lo <= r["vwap_cents"] <= hi
        assert r["volume"] >= 1


def test_phrase_search_python_reference(spark):
    """Match counts equal a pure-Python scan over the same normalized
    token streams (overlaps included)."""
    import re

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = {}
    for r in docs:
        toks = [t for t in re.sub(r"\s+", " ", r["text"].lower().strip())
                .split(" ") if t]
        hits = [i + 1 for i, (a, b) in enumerate(zip(toks, toks[1:]))
                if a == "hash" and b == "join"]
        if hits:
            expect[r["doc_id"]] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in QUERIES["q277_phrase_search"](spark, SF).collect()
    }
    assert got == expect


def test_streaming_ohlc_equals_batch(spark):
    """The qd60 streaming fold must reproduce the q276 batch bars
    cell-exactly (order-independent state merge across two
    event-id-parity micro-batches)."""
    from graphsense_blocksci_spark.queries import QUERIES

    batch = {
        (r["day"], r["symbol"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["volume"], r["vwap_cents"],
        )
        for r in QUERIES["q276_vwap_ohlc"](spark, SF).collect()
    }
    stream = {
        (r["day"], r["symbol"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["volume"], r["vwap_cents"],
        )
        for r in QUERIES["qd60_streaming_ohlc"](spark, SF).collect()
    }
    assert stream == batch


def test_cohort_ltv_invariants(spark):
    """Cumulative LTV is non-decreasing in age within a cohort, every
    cell's n_active is at most the cohort's age-0 population, and
    age-0 exists for every cohort."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q278_cohort_ltv"](spark, SF).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    assert by_cohort
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r["age_months"])
        assert cells[0]["age_months"] == 0
        base = cells[0]["n_active"]
        run = 0
        for c in cells:
            assert c["n_active"] <= base
            run += c["cents"]
            assert c["cum_cents"] == run


def test_event_trigrams_python_reference(spark):
    """Top-10 trigram counts equal a pure-Python sequence replay."""
    from collections import Counter

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts: Counter = Counter()
    for s in seqs.values():
        s.sort()
        types = [t for _, _, t in s]
        for a, b, c in zip(types, types[1:], types[2:]):
            counts[(a, b, c)] += 1
    expect = sorted(
        ((n, k) for k, n in counts.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got = [
        (r["n"], (r["t1"], r["t2"], r["t3"]))
        for r in QUERIES["q279_event_trigrams"](spark, SF).collect()
    ]
    assert got == expect


def test_locf_python_reference(spark):
    """Filled values equal a pure-Python carry-forward replay and
    staleness is 0 exactly on observed days."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q280_locf_imputation"](spark, SF).collect()
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for cells in by_nation.values():
        cells.sort(key=lambda r: r["day"])
        carry = None
        carry_day = None
        for c in cells:
            if c["cents"] is not None:
                carry, carry_day = c["cents"], c["day"]
                assert c["staleness_days"] == 0
            assert c["filled_cents"] == carry
            if carry is None:
                assert c["staleness_days"] is None
            else:
                assert c["staleness_days"] == (c["day"] - carry_day).days


def test_fifo_taint_python_replay(spark):
    """The FIFO allocation equals a pure-Python interval replay over
    the fixture chain, and taint is conserved per tx: allocated
    output taint + fee-absorbed taint == tainted input mass."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.queries import _FIXTURE_DIR as FIXTURE_DIR

    con = duckdb.connect()
    txs = con.execute(
        f"SELECT tx_id, block_id, coinbase, inputs, outputs"
        f" FROM read_parquet('{FIXTURE_DIR}/raw_txs.parquet')"
    ).fetchall()
    seeds = {t[0] for t in txs if t[2] and t[1] < 10}
    expect = {}
    for tx_id, _, coinbase, ins, outs in txs:
        if coinbase:
            continue
        pos = 0
        tainted_iv = []
        taint_in = 0
        for i in ins:
            if i["spent_tx_id"] in seeds:
                tainted_iv.append((pos, pos + i["value"]))
                taint_in += i["value"]
            pos += i["value"]
        if not tainted_iv:
            continue
        opos = 0
        allocated = 0
        for oi, o in enumerate(outs):
            s, e = opos, opos + o["value"]
            t = sum(
                max(0, min(ie, e) - max(is_, s)) for is_, ie in tainted_iv
            )
            if t > 0:
                expect[(tx_id, oi)] = (o["value"], t)
                allocated += t
            opos = e
        fee_absorbed = sum(
            max(0, ie - max(is_, opos)) for is_, ie in tainted_iv
        )
        assert allocated + fee_absorbed == taint_in, tx_id
    got = {
        (r["tx_id"], r["output_index"]): (r["value"], r["tainted_value"])
        for r in QUERIES["qd61_fifo_taint"](spark, "unused").collect()
    }
    assert got == expect
    for (tx, oi), (value, taint) in got.items():
        assert 0 < taint <= value


def test_skyline_brute_force(spark):
    """The skyline equals the O(n^2) dominance definition."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    pts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in load_table(spark, SF, "part").collect()
    ]
    expect = {
        (k, p, s)
        for (k, p, s) in pts
        if not any(
            p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for (_, p2, s2) in pts
        )
    }
    got = {
        (r["p_partkey"], r["price_cents"], r["size"])
        for r in QUERIES["q281_skyline"](spark, SF).collect()
    }
    assert got == expect


def test_rolling_distinct_python_reference(spark):
    """DAU and trailing-7-day WAU equal a pure-Python set replay, and
    DAU <= WAU always."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    act = (
        load_table(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in act:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    got = QUERIES["q282_rolling_distinct_users"](spark, SF).collect()
    assert len(got) == len(by_day)
    for r in got:
        day = r["day"].date()
        dau = len(by_day[day])
        wau_set: set = set()
        for d, users in by_day.items():
            if 0 <= (day - d).days <= 6:
                wau_set |= users
        assert r["dau"] == dau
        assert r["wau"] == len(wau_set)
        assert r["dau"] <= r["wau"]
        assert r["stickiness_ppm"] == 1_000_000 * dau // len(wau_set)


def test_reciprocity_bounds(spark):
    """0 <= n_reciprocal <= n_edges and the ppm is consistent."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["qd62_graph_reciprocity"](spark, "unused").collect()[0]
    assert 0 <= r["n_reciprocal"] <= r["n_edges"]
    assert r["reciprocity_ppm"] == (
        1_000_000 * r["n_reciprocal"] // r["n_edges"]
    )


def test_tolerance_join_brute_force(spark):
    """The banded join equals the O(n^2)-per-customer brute-force
    pair set (banding loses nothing at bucket width == tolerance)."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders").collect()
    by_cust: dict = {}
    for r in orders:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["o_orderkey"], round(r["o_totalprice"] * 100),
             r["o_orderdate"].date())
        )
    expect = set()
    for rows in by_cust.values():
        for i, (k1, c1, d1) in enumerate(rows):
            for k2, c2, d2 in rows[i + 1:]:
                if abs(c1 - c2) <= 100_000 and abs((d1 - d2).days) <= 90:
                    a, b = sorted([(k1, c1, d1), (k2, c2, d2)])
                    expect.add((a[0], b[0]))
    got = {
        (r["key_a"], r["key_b"])
        for r in QUERIES["q283_tolerance_join"](spark, SF).collect()
    }
    assert got == expect


def test_conversion_lag_positive(spark):
    """Lags are strictly positive and min <= p50 <= max; populations
    match the funnel stage counts."""
    from graphsense_blocksci_spark.queries import QUERIES

    funnel = {
        r["step_name"]: r["n_users"]
        for r in QUERIES["q270_funnel_conversion"](spark, SF).collect()
    }
    rows = {
        r["transition"]: r
        for r in QUERIES["q284_conversion_lag"](spark, SF).collect()
    }
    assert rows["view->click"]["n_users"] == funnel["click"]
    assert rows["click->purchase"]["n_users"] == funnel["purchase"]
    for r in rows.values():
        assert 0 < r["min_micros"] <= r["p50_micros"] <= r["max_micros"]


def test_motif_census_partition(spark):
    """Motif counts partition the non-coinbase tx set and respect the
    degree definitions."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES, _FIXTURE_DIR

    n_spend = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')"
        " WHERE NOT coinbase"
    ).fetchone()[0]
    rows = QUERIES["qd63_tx_motif_census"](spark, "unused").collect()
    assert sum(r["n_txs"] for r in rows) == n_spend
    by = {r["motif"]: r for r in rows}
    if "sweep" in by:
        assert by["sweep"]["max_in"] == 1 and by["sweep"]["max_out"] == 1
    if "coinjoin_shaped" in by:
        assert by["coinjoin_shaped"]["max_in"] >= 3
        assert by["coinjoin_shaped"]["max_out"] >= 3


def test_lsh_quality_eval_invariants(spark):
    """tp is bounded by both pair sets and the ppm metrics are
    consistent with the counts."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["q285_lsh_quality_eval"](spark, SF).collect()[0]
    assert 0 <= r["tp"] <= min(r["n_lsh"], r["n_truth"])
    assert r["precision_ppm"] == 1_000_000 * r["tp"] // r["n_lsh"]
    assert r["recall_ppm"] == 1_000_000 * r["tp"] // r["n_truth"]


def test_subsample_ci_brackets(spark):
    """min <= p05 <= p50 <= p95 <= max, the full-sample mean lies in
    [min, max], and ~60 replicates materialize."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["q286_subsample_ci"](spark, SF).collect()[0]
    assert r["n_replicates"] == 60
    assert (
        r["min_mean"] <= r["p05_mean"] <= r["p50_mean"]
        <= r["p95_mean"] <= r["max_mean"]
    )
    assert r["min_mean"] <= r["full_mean_cents"] <= r["max_mean"]


def test_dedup_savings_conservation(spark):
    """Byte totals partition the corpus: sum(bytes_total) over the
    histogram equals the corpus n_chars sum, and every size class
    keeps exactly one doc's bytes per cluster."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    corpus = load_table(spark, SF, "documents").agg(
        F.sum("n_chars")
    ).collect()[0][0]
    rows = QUERIES["q287_dedup_savings"](spark, SF).collect()
    assert sum(r["bytes_total"] for r in rows) == corpus
    for r in rows:
        assert r["bytes_kept"] + r["bytes_removed"] == r["bytes_total"]
        if r["cluster_size"] == 1:
            assert r["bytes_removed"] == 0


def test_utxo_growth_matches_final_snapshot(spark):
    """The curve's final row equals the direct unspent-set totals and
    the count never goes negative."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES, _FIXTURE_DIR

    rows = sorted(
        QUERIES["qd64_utxo_growth"](spark, "unused").collect(),
        key=lambda r: r["block_id"],
    )
    assert all(r["utxo_count"] >= 0 for r in rows)
    n, v = duckdb.connect().execute(f"""
        WITH outs AS (
            SELECT tx_id,
                   unnest(list_transform(outputs,
                       (o, i) -> {{'idx': i - 1, 'val': o.value}})) AS u
            FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
        ),
        ins AS (
            SELECT unnest(list_transform(inputs,
                       i -> {{'stx': i.spent_tx_id,
                              'sidx': i.spent_index}})) AS u
            FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
            WHERE NOT coinbase
        )
        SELECT count(*), sum(o.u.val) FROM outs o
        WHERE NOT EXISTS (SELECT 1 FROM ins i
            WHERE i.u.stx = o.tx_id AND i.u.sidx = o.u.idx)
    """).fetchone()
    assert rows[-1]["utxo_count"] == n
    assert rows[-1]["utxo_value"] == v


def test_dataset_card_consistency(spark):
    """Per-source docs/tokens agree with direct aggregation and all
    ppm rates are in [0, 1e6]."""
    from pyspark.sql import functions as F

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    direct = {
        r["source"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = QUERIES["q288_dataset_card"](spark, SF).collect()
    assert {r["source"] for r in rows} == set(direct)
    for r in rows:
        assert r["n_docs"] == direct[r["source"]]
        assert 0 <= r["quality_ok_ppm"] <= 1_000_000
        assert 0 <= r["dup_ppm"] <= 1_000_000
        assert r["p50_tokens"] >= 0
        assert r["top_pred_lang"]


def test_json_props_parse_complete(spark):
    """Every event parses (the synthetic props are well-formed) and
    counts partition the event table."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    n = load_table(spark, SF, "events").count()
    rows = QUERIES["q289_json_props_stats"](spark, SF).collect()
    assert sum(r["n_events"] for r in rows) == n
    for r in rows:
        assert r["n_unparsed"] == 0
        assert r["min_k"] <= r["max_k"]


def test_nearest_asof_python_reference(spark):
    """Every error's nearest-purchase gap equals a pure-Python
    bidirectional scan (ties -> backward)."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
            "event_type",
        )
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["tsu"], r["event_id"], r["event_type"])
        )
    expect = {}
    for user, rows in by_user.items():
        rows.sort()
        for i, (tsu, eid, et) in enumerate(rows):
            if et != "error":
                continue
            prev_p = next_p = None
            for t2, _, e2 in rows[:i]:
                if e2 == "purchase":
                    prev_p = t2
            for t2, _, e2 in rows[i + 1:]:
                if e2 == "purchase":
                    next_p = t2
                    break
            if prev_p is None and next_p is None:
                expect[eid] = (None, "none")
            elif prev_p is None:
                expect[eid] = (next_p - tsu, "forward")
            elif next_p is None:
                expect[eid] = (tsu - prev_p, "backward")
            elif tsu - prev_p <= next_p - tsu:
                expect[eid] = (tsu - prev_p, "backward")
            else:
                expect[eid] = (next_p - tsu, "forward")
    got = {
        r["event_id"]: (r["gap_micros"], r["direction"])
        for r in QUERIES["q290_nearest_asof"](spark, SF).collect()
    }
    assert got == expect


def test_haircut_taint_conservation(spark):
    """Per hop and tx, allocated output taint never exceeds arriving
    taint (the floor + fee share absorb the rest), and hop-1 tainted
    txs are exactly the direct spenders of seed outputs."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES, _FIXTURE_DIR

    rows = QUERIES["qd65_haircut_taint_value"](spark, "unused").collect()
    assert rows
    con = duckdb.connect()
    direct = {
        t[0]
        for t in con.execute(f"""
            WITH seeds AS (
                SELECT tx_id FROM read_parquet(
                    '{_FIXTURE_DIR}/raw_txs.parquet')
                WHERE coinbase AND block_id < 10
            )
            SELECT DISTINCT t.tx_id
            FROM (SELECT tx_id, unnest(inputs) AS i
                  FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')
                  WHERE NOT coinbase) t
            JOIN seeds s ON t.i.spent_tx_id = s.tx_id
        """).fetchall()
    }
    hop1 = {r["tx_id"] for r in rows if r["hop"] == 1}
    assert hop1 <= direct
    for r in rows:
        assert r["tainted_value"] > 0
        assert 1 <= r["hop"] <= 4


def test_twab_bounds(spark):
    """TWAB is non-negative for every reported address and bounded by
    the chain's maximum single balance seen (coarse sanity), and the
    frame is the deterministic top-20."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["qd67_time_weighted_balance"](spark, "unused").collect()
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert r["twab_satoshi"] >= 0
        assert r["n_events"] >= 1
        key = (-r["twab_satoshi"], r["addr"])
        assert prev is None or prev <= key
        prev = key


def test_identity_resolution_golden(spark):
    """Golden record is the member with max balance (min key on tie)
    and clusters are agreement-consistent: every member shares the
    full blocking+agreement key."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    cust = {
        r["c_custkey"]: (
            r["c_nationkey"],
            r["c_mktsegment"],
            round(r["c_acctbal"] * 100) // 100_000,
            r["c_custkey"] % 97,
            round(r["c_acctbal"] * 100),
        )
        for r in load_table(spark, SF, "customer").collect()
    }
    rows = QUERIES["q291_identity_resolution"](spark, SF).collect()
    for r in rows:
        assert r["n_members"] >= 2
        assert r["golden_custkey"] in cust
        assert cust[r["golden_custkey"]][4] == r["golden_cents"]


def test_interval_union_python_reference(spark):
    """Union days per supplier equal a pure-Python merged-interval
    replay; n_stretches equals the merged-interval count; and the
    union never exceeds the span or the naive 30-day sum."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_suppkey", "l_shipdate"
    ).collect()
    by_supp: dict = {}
    for r in li:
        d = r["l_shipdate"].date()
        by_supp.setdefault(r["l_suppkey"], []).append(d)
    expect = {}
    for supp, days in by_supp.items():
        ivs = sorted((d, d) for d in days)
        merged = []
        for s, _ in ivs:
            from datetime import timedelta

            e = s + timedelta(days=30)
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        union = sum((e - s).days for s, e in merged)
        expect[supp] = (union, len(merged))
    got = {
        r["suppkey"]: (r["union_days"], r["n_stretches"])
        for r in QUERIES["q292_interval_union"](spark, SF).collect()
    }
    assert got == expect


def test_reconciliation_partition(spark):
    """Class counts reconcile with the deterministic twin derivation:
    REMOVED = coin-0 rows, ADDED = coin-2 rows, CHANGED = coin-1 rows
    with drift == count, and the four classes cover the union."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    rows = {
        r["status"]: r
        for r in QUERIES["q293_table_reconciliation"](spark, SF).collect()
    }
    n = load_table(spark, SF, "orders").count()
    assert set(rows) == {"SAME", "CHANGED", "ADDED", "REMOVED"}
    assert rows["CHANGED"]["cents_drift"] == rows["CHANGED"]["n_rows"]
    assert rows["ADDED"]["min_key"] >= 1_000_000_000
    # every LEFT row lands in exactly one of SAME/CHANGED/REMOVED
    # (a re-keyed coin-2 row is REMOVED under its old key AND ADDED
    # under its new one — that is the point of the report)
    total_left = (
        rows["SAME"]["n_rows"]
        + rows["CHANGED"]["n_rows"]
        + rows["REMOVED"]["n_rows"]
    )
    assert total_left == n
    assert rows["ADDED"]["n_rows"] <= rows["REMOVED"]["n_rows"]


def test_forecast_backtest_bounds(spark):
    """WAPE is non-negative, over+under never exceeds the day count,
    and all 7 weekdays report."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q294_forecast_backtest"](spark, SF).collect()
    # sf0.001's sparse day spine only yields exact d-7 pairs on a few
    # weekdays; sf0.01+ covers all 7
    assert 1 <= len(rows) <= 7
    for r in rows:
        assert r["wape_ppm"] >= 0
        assert r["n_over"] + r["n_under"] <= r["n_days"]


def test_whale_transfers_thresholds(spark):
    """Whale rows respect the adaptive threshold by construction:
    per-block whale value is at most the block's total output value
    and counts are positive."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["qd68_whale_transfers"](spark, "unused").collect()
    assert rows
    for r in rows:
        assert r["n_whales"] >= 1
        assert 0 < r["max_value"] <= r["whale_value"]


def test_sequence_pattern_python_reference(spark):
    """Pattern match counts equal a pure-Python regex replay over the
    same ordered sequences."""
    import re

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    strings = [
        " ".join(t for _, _, t in sorted(v)) for v in seqs.values()
    ]
    pats = {
        "resilient_conversion": r"view (error )*click",
        "repeat_purchase": r"purchase [^ ]+ purchase",
        "activation": r"signup( [a-z]+)* purchase",
    }
    expect = {
        k: sum(1 for s in strings if re.search(p, s))
        for k, p in pats.items()
    }
    got = {
        r["pattern"]: r["n_matching"]
        for r in QUERIES["q295_sequence_pattern"](spark, SF).collect()
    }
    assert got == expect


def test_five_number_summary_order(spark):
    """min <= q1 <= median <= q3 <= max per nation, and outliers are
    a minority."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q296_five_number_summary"](spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r["min_cents"] <= r["q1_cents"] <= r["median_cents"]
            <= r["q3_cents"] <= r["max_cents"]
        )
        assert 0 <= r["n_outliers"] < r["n_orders"]


def test_address_type_census_totals(spark):
    """Census totals equal the whole output table's count and value."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES, _FIXTURE_DIR

    n, v = duckdb.connect().execute(
        f"SELECT count(*), sum(u.value) FROM (SELECT unnest(outputs) AS u"
        f" FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet'))"
    ).fetchone()
    rows = QUERIES["qd69_address_type_census"](spark, "unused").collect()
    assert sum(r["n_outputs"] for r in rows) == n
    assert sum(r["total_value"] for r in rows) == v


def test_streaming_cdc_equals_batch(spark):
    """The qd70 streaming compaction must reproduce the q273 batch
    apply cell-exactly across the parity-split micro-batches."""
    from graphsense_blocksci_spark.queries import QUERIES

    batch = {
        r["op"]: (r["n_keys"], r["sum_payload_cents"], r["sum_keys"],
                  r["max_seq"])
        for r in QUERIES["q273_cdc_apply"](spark, SF).collect()
    }
    stream = {
        r["op"]: (r["n_keys"], r["sum_payload_cents"], r["sum_keys"],
                  r["max_seq"])
        for r in QUERIES["qd70_streaming_cdc"](spark, SF).collect()
    }
    assert stream == batch


def test_pit_features_no_leakage(spark):
    """Feature columns are reproducible from pre-cutoff data alone
    and every pre-cutoff customer appears exactly once."""
    from datetime import date

    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    cutoff = date(2000, 1, 1)
    orders = load_table(spark, SF, "orders").collect()
    pre: dict = {}
    post: set = set()
    for r in orders:
        d = r["o_orderdate"].date()
        if d < cutoff:
            n, c, last = pre.get(r["o_custkey"], (0, 0, None))
            pre[r["o_custkey"]] = (
                n + 1,
                c + round(r["o_totalprice"] * 100),
                max(last, d) if last else d,
            )
        else:
            post.add(r["o_custkey"])
    rows = QUERIES["q297_pit_features"](spark, SF).collect()
    assert len(rows) == len(pre)
    for r in rows:
        n, c, last = pre[r["o_custkey"]]
        assert r["n_orders_pre"] == n
        assert r["cents_pre"] == c
        assert r["recency_days"] == (cutoff - last).days
        assert r["retained"] == (r["o_custkey"] in post)


def test_balance_audit_clean_chain(spark):
    """The synthetic chain is linkage-consistent: zero negative-dip
    addresses, and the partition adds up."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["qd71_balance_audit"](spark, "unused").collect()[0]
    assert r["n_clean"] + r["n_violations"] == r["n_addresses"]
    assert r["n_violations"] == 0
    assert r["worst_dip"] >= 0


def test_balanced_sample_floor(spark):
    """Every class keeps exactly the minority-class size and ppm is
    consistent."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q298_balanced_sample"](spark, SF).collect()
    assert rows
    floor_n = min(r["n_avail"] for r in rows)
    for r in rows:
        assert r["n_kept"] == floor_n
        assert r["kept_ppm"] == 1_000_000 * floor_n // r["n_avail"]


def test_outpoint_conflicts_clean(spark):
    """The synthetic chain has no double spends and the partition
    adds up."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["qd72_outpoint_conflicts"](spark, "unused").collect()[0]
    assert r["n_clean"] + r["n_conflicting"] == r["n_outpoints"]
    assert r["n_conflicting"] == 0
    assert r["max_spenders"] == 1


def test_entity_taint_exposure_consistency(spark):
    """Exposure rows are sorted, positive, and first_hop within the
    4-hop horizon; total exposure never exceeds the seeds' value."""
    import duckdb

    from graphsense_blocksci_spark.queries import QUERIES, _FIXTURE_DIR

    seed_total = duckdb.connect().execute(
        f"SELECT sum(u.value) FROM (SELECT unnest(outputs) AS u"
        f" FROM read_parquet('{_FIXTURE_DIR}/raw_txs.parquet')"
        f" WHERE coinbase AND block_id < 10)"
    ).fetchone()[0]
    rows = QUERIES["qd73_entity_taint_exposure"](spark, "unused").collect()
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert r["taint_total"] > 0
        assert 1 <= r["first_hop"] <= 4
        key = (-r["taint_total"], r["entity"])
        assert prev is None or prev <= key
        prev = key
    # hop-decomposed exposure of the top-20 stays within 4x the seed
    # mass (each of the 4 hops re-counts a path-length slice)
    assert sum(r["taint_total"] for r in rows) <= 4 * seed_total


def test_diff_in_diff_identity(spark):
    """The DiD contrast equals the cell-mean arithmetic and cell
    populations partition the order table."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table

    r = QUERIES["q299_diff_in_diff"](spark, SF).collect()[0]
    assert r["did_cents"] == (
        (r["treat_post_mean"] - r["treat_pre_mean"])
        - (r["control_post_mean"] - r["control_pre_mean"])
    )
    n = load_table(spark, SF, "orders").count()
    assert r["n_treat"] + r["n_control"] == n


def test_revenue_bridge_additivity(spark):
    """The two effects sum EXACTLY to 1000x the revenue delta for
    every category — the bridge never leaves an unexplained
    remainder."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q300_revenue_bridge"](spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r["volume_effect_milli"] + r["price_mix_effect_milli"]
            == 1000 * (r["r_next_cents"] - r["r_base_cents"])
        )


def test_gini_timeseries_bounds(spark):
    """Per-day Gini lies in [0, 1), holders never shrink on this
    append-mostly synthetic chain's first day vs last, and the final
    day's statistic equals qd45's snapshot Gini."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = sorted(
        QUERIES["qd74_gini_timeseries"](spark, "unused").collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for r in rows:
        assert 0 <= r["gini"] < 1
        assert r["gini_den"] > 0
        assert abs(
            r["gini"] - r["gini_num"] / r["gini_den"]
        ) < 1e-12
    snap = QUERIES["qd45_balance_gini"](spark, "unused").collect()[0]
    last = rows[-1]
    assert last["n_holders"] == snap["n"]
    assert last["gini_num"] == snap["gini_num"]
    assert last["gini_den"] == snap["gini_den"]


def test_edge_support_consistency(spark):
    """Total triangle incidences (Σ support over edges) equal 3x the
    graph's triangle count, tying the new operator to q120's."""
    from graphsense_blocksci_spark.queries import QUERIES

    rows = QUERIES["q301_edge_support"](spark, SF).collect()
    hist = [r for r in rows if r["row_kind"] == "hist"]
    top = [r for r in rows if r["row_kind"] == "max_edge"]
    assert len(top) == 1
    assert top[0]["top_u"] is not None and top[0]["n_edges"] is None
    incidences = sum(r["support"] * r["n_edges"] for r in hist)
    assert incidences % 3 == 0
    assert top[0]["support"] == max(r["support"] for r in hist)


def test_key_gaps_python_reference(spark):
    """The widest-3 gaps equal a pure-Python scan of the finished
    key sequence."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ks = sorted(
        r["o_orderkey"]
        for r in load_table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .distinct()
        .collect()
    )
    gaps = [
        (b - a - 1, a + 1, b - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    ]
    gaps.sort(key=lambda g: (-g[0], g[1]))
    expect = [(s, e, n) for n, s, e in gaps[:3]]
    got = [
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in QUERIES["q302_key_gaps"](spark, SF).collect()
    ]
    assert got == expect


def test_supply_audit_no_inflation(spark):
    """No block over-claims (inflation would be a chain bug) and the
    verdict partitions the block set."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["qd75_supply_audit"](spark, "unused").collect()[0]
    assert r["n_overclaimed"] == 0
    assert r["n_exact"] + r["n_underclaimed"] == r["n_blocks"]
    assert r["burned_satoshi"] >= 0


def test_ngram_coverage_monotone(spark):
    """Coverage thresholds are monotone (k50 <= k90 <= k99 <= vocab)
    and Zipfian: half the mass needs well under half the vocab."""
    from graphsense_blocksci_spark.queries import QUERIES

    r = QUERIES["q303_ngram_coverage"](spark, SF).collect()[0]
    assert 1 <= r["k_50pct"] <= r["k_90pct"] <= r["k_99pct"]
    assert r["k_99pct"] <= r["vocab_size"]
    assert r["total_mass"] >= r["vocab_size"]


def test_daily_overlap_python_reference(spark):
    """Day-over-day Jaccard equals a pure-Python set replay."""
    from graphsense_blocksci_spark.queries import QUERIES
    from graphsense_blocksci_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    act = (
        load_table(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in act:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    expect = {}
    for a, b in zip(days, days[1:]):
        if (b - a).days != 1:
            continue
        both = len(by_day[a] & by_day[b])
        union = len(by_day[a] | by_day[b])
        expect[b] = (both, union, 1_000_000 * both // union)
    got = {
        r["day"].date(): (r["n_both"], r["n_union"], r["jaccard_ppm"])
        for r in QUERIES["q304_daily_overlap"](spark, SF).collect()
    }
    assert got == expect


def test_scd2_incremental_equals_rebuild(spark):
    """The incremental SCD2 fold equals the full rebuild row-for-row
    (versions, intervals, currency flags — everything)."""
    from graphsense_blocksci_spark.queries import QUERIES

    def key(rows):
        return sorted(
            (r["user_id"], r["version"], r["event_type"],
             r["valid_from"], r["valid_to"], r["is_current"])
            for r in rows
        )

    full = key(QUERIES["q269_scd2_dimension"](spark, SF).collect())
    inc = key(QUERIES["q305_scd2_incremental"](spark, SF).collect())
    assert inc == full
