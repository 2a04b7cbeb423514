"""Property-based checks (hypothesis, pure Python — no Spark) for the
algebraic identities the scalable time-series spellings rely on:

* CUSUM via prefix scans == the textbook sequential recursion,
* rolling-window distinct via disjoint contribution intervals == the
  brute-force per-day distinct count,
* U-shape attribution ppm always conserves (sums to 1e6 up to the
  documented truncation deficit on middle splits).

These pin the MATH; the oracle sweep pins the Spark/DuckDB execution.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- CUSUM
def cusum_recursive(devs: list[int]) -> list[int]:
    s, out = 0, []
    for d in devs:
        s = max(0, s + d)
        out.append(s)
    return out


def cusum_prefix_scan(devs: list[int]) -> list[int]:
    """The operator's spelling: running sum minus clamped running min
    (`operators/timeseries.cusum_shift_detect`)."""
    out, p, mn = [], 0, 0
    for d in devs:
        p += d
        mn = min(mn, p)
        out.append(p - min(mn, 0))
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=60))
def test_cusum_prefix_scan_equals_recursion(devs):
    assert cusum_prefix_scan(devs) == cusum_recursive(devs)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=60))
def test_cusum_negative_mirror(devs):
    """S-_t = max(0, S-_{t-1} - d) == the mirrored prefix form used for
    s_neg (max-clamped running max)."""
    s, rec = 0, []
    for d in devs:
        s = max(0, s - d)
        rec.append(s)
    scan, p, mx = [], 0, 0
    for d in devs:
        p += d
        mx = max(mx, p)
        scan.append(max(mx, 0) - p)
    assert scan == rec


# ------------------------------------------------- rolling distinct DAU
W = 7  # window width the operator ships with


def dau_brute(user_days: set[tuple[int, int]], d0: int, d1: int) -> dict:
    return {
        day: len(
            {u for (u, d) in user_days if day - (W - 1) <= d <= day}
        )
        for day in range(d0, d1 + 1)
    }


def dau_intervals(user_days: set[tuple[int, int]], d0: int, d1: int) -> dict:
    """The operator's spelling: per (user, active-day), a disjoint
    contribution interval [d, min(d+W-1, next_active-1)]
    (`operators/timeseries.rolling_7d_distinct_users`)."""
    out = {day: 0 for day in range(d0, d1 + 1)}
    by_user: dict[int, list[int]] = {}
    for u, d in sorted(user_days):
        by_user.setdefault(u, []).append(d)
    for _u, days in by_user.items():
        for i, d in enumerate(days):
            end = d + W - 1
            if i + 1 < len(days):
                end = min(end, days[i + 1] - 1)
            for day in range(d, end + 1):
                if d0 <= day <= d1:
                    out[day] += 1
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rolling_distinct_interval_trick(user_days):
    d0 = min(d for _u, d in user_days)
    d1 = max(d for _u, d in user_days)
    assert dau_intervals(user_days, d0, d1) == dau_brute(user_days, d0, d1)


# ---------------------------------------------------- U-shape attribution
def ushape_ppm(k: int) -> list[int]:
    """Per-position ppm for a k-touch path
    (`operators/timeseries.attribution_u_shape`)."""
    if k == 1:
        return [1000000]
    if k == 2:
        return [500000, 500000]
    mid = 200000 // (k - 2)
    return [400000] + [mid] * (k - 2) + [400000]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=500))
def test_ushape_credit_conserves(k):
    total = sum(ushape_ppm(k))
    # exact for k<=2 and whenever (k-2) divides 200000; otherwise under
    # by < (k-2) ppm — truncation, never over-credit
    assert total <= 1000000
    assert 1000000 - total < max(k - 2, 1)
