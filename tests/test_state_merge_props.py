"""Hypothesis property tests for the stateful streaming group
functions: their correctness contract is ORDER-INDEPENDENT,
SPLIT-INDEPENDENT convergence (any batching of the same rows ends in
the same state), which is exactly what lets qd60/qd70 oracle
cell-exactly against their batch twins. Tested here as pure functions
with a fake GroupState — no Spark session, so hypothesis can hammer
hundreds of cases in seconds."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _run_groups(fn, key, batches, columns):
    state = FakeState()
    out = None
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=columns)
        out = list(fn(key, iter([pdf]), state))[-1]
    return state._v, out


# (ts_micros, event_id) is the UNIQUE event key by contract (event_id
# is a PK in the source) — arg-min/arg-max are only well-defined with
# it, so the strategy generates unique keys.
events = st.lists(
    st.tuples(
        st.integers(0, 1_000_000),      # ts_micros
        st.integers(0, 10_000),         # event_id
        st.integers(-10_000, 10_000),   # cents
        st.integers(1, 7),              # vol
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)


@given(events, st.randoms())
@settings(max_examples=150, deadline=None)
def test_bar_group_batching_invariant(rows, rng):
    """Any shuffling + re-batching of the same events converges to
    the same bar state as one big batch."""
    from graphsense_blocksci_spark.streaming.bars import _bar_group

    cols = ["ts_micros", "event_id", "cents", "vol"]
    base_state, _ = _run_groups(_bar_group, (0, "s"), [rows], cols)

    shuffled = list(rows)
    rng.shuffle(shuffled)
    cuts = sorted(
        rng.sample(range(1, len(shuffled)), min(3, len(shuffled) - 1))
    ) if len(shuffled) > 1 else []
    batches = []
    prev = 0
    for c in cuts + [len(shuffled)]:
        batches.append(shuffled[prev:c])
        prev = c
    split_state, _ = _run_groups(
        _bar_group, (0, "s"), [b for b in batches if b], cols
    )
    assert split_state == base_state
    # and the state equals the direct batch-semantics reference
    n, f_ts, f_eid, open_c, high_c, low_c, l_ts, l_eid, close_c, vol, pv = (
        base_state
    )
    ordered = sorted(rows, key=lambda r: (r[0], r[1]))
    assert n == len(rows)
    assert open_c == ordered[0][2]
    assert close_c == ordered[-1][2]
    assert high_c == max(r[2] for r in rows)
    assert low_c == min(r[2] for r in rows)
    assert vol == sum(r[3] for r in rows)
    assert pv == sum(r[2] * r[3] for r in rows)


ops = st.lists(
    st.tuples(
        st.integers(0, 50),                     # seq
        st.integers(-10_000, 10_000),           # payload_cents
        st.sampled_from(["U", "D"]),            # op
    ),
    min_size=1,
    max_size=30,
)


@given(ops, st.randoms())
@settings(max_examples=150, deadline=None)
def test_cdc_group_batching_invariant(rows, rng):
    """The survivor under (seq, payload, op) max-merge is identical
    for any batching/ordering, and equals the total-order maximum."""
    from graphsense_blocksci_spark.streaming.cdc import _cdc_group

    cols = ["seq", "payload_cents", "op"]
    base_state, _ = _run_groups(_cdc_group, (7,), [rows], cols)

    shuffled = list(rows)
    rng.shuffle(shuffled)
    mid = rng.randint(0, len(shuffled))
    batches = [b for b in (shuffled[:mid], shuffled[mid:]) if b]
    split_state, _ = _run_groups(_cdc_group, (7,), batches, cols)
    assert split_state == base_state
    n_seen, seq, payload, op = base_state
    assert n_seen == len(rows)
    assert (seq, payload, op) == max(rows)


mg_items = st.lists(
    st.sampled_from([f"i{k}" for k in range(12)]),
    min_size=1,
    max_size=120,
)


@given(mg_items, st.integers(2, 8), st.randoms())
@settings(max_examples=150, deadline=None)
def test_misra_gries_merge_guarantee(items, capacity, rng):
    """The mergeable MG reduce keeps its deviation guarantee under
    ANY batching: for every item, true_count - total/capacity <=
    approx <= true_count (undercount-only, bounded), and every item
    with true_count > total/capacity is PRESENT in the summary."""
    from collections import Counter

    from graphsense_blocksci_spark.streaming.sketches import _merge_mg

    shuffled = list(items)
    rng.shuffle(shuffled)
    n_batches = rng.randint(1, 4)
    size = max(1, len(shuffled) // n_batches)
    counts = None
    for i in range(0, len(shuffled), size):
        counts = _merge_mg(
            counts, pd.Series(shuffled[i:i + size]), capacity
        )
    total = len(items)
    true = Counter(items)
    bound = total / capacity
    for item, t in true.items():
        approx = float(counts.get(item, 0.0))
        assert approx <= t
        assert approx >= t - bound - 1e-9, (item, t, approx, bound)
        if t > bound:
            assert item in counts.index


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=40),
    st.randoms(),
)
@settings(max_examples=150, deadline=None)
def test_hll_register_batching_invariant(rhos, rng):
    """The HLL register state (max rho per bucket) is order- and
    split-invariant and equals the plain max."""
    from graphsense_blocksci_spark.streaming.sketches import _hll_group

    base_state, _ = _run_groups(
        _hll_group, (3,), [[(r,) for r in rhos]], ["rho"]
    )
    shuffled = list(rhos)
    rng.shuffle(shuffled)
    mid = rng.randint(0, len(shuffled))
    batches = [
        [(r,) for r in b]
        for b in (shuffled[:mid], shuffled[mid:])
        if b
    ]
    split_state, out = _run_groups(_hll_group, (3,), batches, ["rho"])
    assert split_state == base_state == (max(rhos),)
    assert out["rho"].iloc[0] == max(rhos)


@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=40),
    st.randoms(),
)
@settings(max_examples=100, deadline=None)
def test_log2_hist_split_invariant(marks, rng):
    """The per-bucket count state sums identically across any
    batching."""
    from graphsense_blocksci_spark.streaming.sketches import (
        _log2_hist_group,
    )

    rows = [(m,) for m in marks]
    base_state, _ = _run_groups(_log2_hist_group, (9,), [rows], ["v"])
    rng.shuffle(rows)
    mid = rng.randint(0, len(rows))
    batches = [b for b in (rows[:mid], rows[mid:]) if b]
    split_state, out = _run_groups(
        _log2_hist_group, (9,), batches, ["v"]
    )
    assert split_state == base_state == (len(marks),)
    assert out["cnt"].iloc[0] == len(marks)
