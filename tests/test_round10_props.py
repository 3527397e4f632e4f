"""Pure-Python property tests for the round-10 arithmetic contracts:
the ntile bucket formula, DIV-truncation slope arithmetic, and the
conformal rank clamp. No Spark session — these pin the MATH the
queries and oracles both implement."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _ntile_reference(n: int, k: int) -> list[int]:
    """Standard SQL ntile: first n % k buckets get the extra row."""
    out = []
    base, extra = divmod(n, k)
    for b in range(1, k + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=5000), st.integers(min_value=1, max_value=10))
def test_ntile_bucket_formula_matches_sql_semantics(n, k):
    """q323's contiguous-extras formula must equal SQL ntile's bucket
    for every row position and EVERY n — including n MOD k >= 2,
    where the naive even-spread formula ((rn-1)*k) DIV n + 1
    diverges (this property test caught exactly that: TPC-H's round
    customer counts had masked it at every tested scale factor)."""
    ref = _ntile_reference(n, k)
    base, extra = divmod(n, k)
    big = extra * (base + 1)
    for rn in range(1, n + 1):
        if rn <= big:
            got = (rn + base) // (base + 1)
        else:
            got = extra + (rn - big + base - 1) // base
        assert got == ref[rn - 1]


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-10**12, max_value=10**12),
    st.integers(min_value=1, max_value=10**4),
)
def test_div_truncation_mirrors_python(dy, dx):
    """q322's slope (dy*1000) DIV dx truncates toward zero in both
    engines; the pure-Python mirror used by the reference test must
    agree with C-style truncation for negative numerators."""
    q, rem = divmod(dy * 1000, dx)
    if q < 0 and rem != 0:
        q += 1
    import math

    assert q == math.trunc((dy * 1000) / dx) or abs(dy * 1000) >= 2**52, (
        "float-based trunc only checked inside exact-double range"
    )
    # exact definition: sign(dy)*(|dy*1000| // dx)
    expect = (abs(dy * 1000) // dx) * (1 if dy >= 0 else -1)
    assert q == expect


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=100000))
def test_conformal_rank_clamp(n_cal):
    """q328's k = ceil(0.9*(n_cal+1)) via (9*(n+1)+9) DIV 10, clamped
    to n_cal: always a valid 1-based rank, and unclamped exactly when
    the finite-sample guarantee is attainable (n_cal >= 9)."""
    k_raw = (9 * (n_cal + 1) + 9) // 10
    import math

    assert k_raw == math.ceil(0.9 * (n_cal + 1))
    k = min(k_raw, n_cal)
    assert 1 <= k <= n_cal
    if n_cal >= 9:
        assert k == k_raw
