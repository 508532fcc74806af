"""Property-based merge invariants for the sketch library (hypothesis):
split-anywhere-and-merge must equal single-batch construction (exactly
for algebraic sketches, within sketch error for approximate ones)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

floats = st.lists(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, width=64),
    min_size=1, max_size=300)


@given(xs=floats, cut=st.integers(0, 300))
@settings(max_examples=60, deadline=None)
def test_moments_merge_exact(xs, cut):
    from advanced_data_profile_ray.state import Moments

    arr = np.array(xs)
    cut = min(cut, arr.size)
    one = Moments.from_array(arr)
    two = Moments.from_array(arr[:cut]).merge(Moments.from_array(arr[cut:]))
    assert two.n == one.n == arr.size
    assert np.isclose(two.avg, one.avg, rtol=0, atol=abs(one.avg) * 1e-12 + 1e-12)
    assert two.min == one.min and two.max == one.max
    if arr.size > 1 and one.std() == one.std():
        assert np.isclose(two.std(), one.std(), rtol=1e-6, atol=1e-9)


@given(xs=floats, cut=st.integers(0, 300))
@settings(max_examples=40, deadline=None)
def test_tdigest_quantiles_close(xs, cut):
    from advanced_data_profile_ray.state import TDigest

    arr = np.array(xs)
    cut = min(cut, arr.size)
    merged = TDigest.from_array(arr[:cut]).merge(TDigest.from_array(arr[cut:]))
    lo, hi = float(arr.min()), float(arr.max())
    assert merged.min == lo and merged.max == hi
    med = merged.quantile(0.5)
    assert lo <= med <= hi


@given(vals=st.lists(st.integers(-20, 20), min_size=1, max_size=300))
@settings(max_examples=80, deadline=None)
def test_median_from_value_counts_matches_numpy(vals):
    """The value-counts median (grouped_median's kernel) equals numpy's
    linear-interpolated median of the expanded multiset — the
    PERCENTILE_CONT(0.5) contract the DuckDB oracle checks."""
    from advanced_data_profile_ray.stages.fast_ops import (
        median_from_value_counts,
    )

    arr = np.array(vals, dtype=np.float64) / 2.0
    v, n = np.unique(arr, return_counts=True)
    got = median_from_value_counts(v, n)
    assert got == float(np.median(arr))


@given(vals=st.lists(st.integers(-20, 20), min_size=1, max_size=300),
       q=st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=80, deadline=None)
def test_quantile_from_value_counts_matches_numpy(vals, q):
    """The value-counts quantile kernel equals numpy's linear-method
    percentile of the expanded multiset for ANY q in [0, 1]."""
    from advanced_data_profile_ray.stages.fast_ops import (
        quantile_from_value_counts,
    )

    arr = np.array(vals, dtype=np.float64) / 2.0
    v, n = np.unique(arr, return_counts=True)
    got = quantile_from_value_counts(v, n, q)
    want = float(np.percentile(arr, q * 100.0, method="linear"))
    assert np.isclose(got, want, rtol=0, atol=1e-9)


@given(vals=st.lists(st.integers(0, 50), min_size=1, max_size=400),
       cut=st.integers(0, 400))
@settings(max_examples=60, deadline=None)
def test_valuecounts_and_heavyhitters_merge(vals, cut):
    from advanced_data_profile_ray.state import HeavyHitters, ValueCounts

    arr = np.array(vals, dtype=np.int64)
    cut = min(cut, arr.size)
    vc = ValueCounts.from_array(arr[:cut]).merge(ValueCounts.from_array(arr[cut:]))
    want = pd.Series(arr).value_counts().to_dict()
    assert {int(k): v for k, v in vc.counts.items()} == {int(k): int(v) for k, v in want.items()}
    hh = HeavyHitters.from_array(arr[:cut], 512).merge(
        HeavyHitters.from_array(arr[cut:], 512))
    top = hh.top_k(3)
    true_top = sorted(want.items(), key=lambda kv: (-kv[1], str(kv[0])))[:3]
    assert [int(c) for _, c in top] == [int(c) for _, c in true_top]


@given(secs=st.lists(st.integers(0, 2_000_000_000), min_size=1, max_size=200),
       cut=st.integers(0, 200))
@settings(max_examples=30, deadline=None)
def test_dateparts_merge_exact(secs, cut):
    from advanced_data_profile_ray.state import DatePartCounts

    ts = pa.array(pd.to_datetime(np.array(secs), unit="s"), pa.timestamp("us"))
    cut = min(cut, len(ts))
    one = DatePartCounts.from_timestamp(ts)
    two = DatePartCounts.from_timestamp(ts.slice(0, cut)).merge(
        DatePartCounts.from_timestamp(ts.slice(cut)))
    assert one.finalize() == two.finalize()


@given(vals=st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=500),
       cut=st.integers(0, 500))
@settings(max_examples=30, deadline=None)
def test_hll_merge_equals_single(vals, cut):
    from advanced_data_profile_ray.state import HyperLogLog
    from advanced_data_profile_ray.state.hll import hash64

    arr = np.array(vals, dtype=np.int64)
    cut = min(cut, arr.size)
    one = HyperLogLog.from_hashes(hash64(arr), 12)
    two = HyperLogLog.from_hashes(hash64(arr[:cut]), 12).merge(
        HyperLogLog.from_hashes(hash64(arr[cut:]), 12))
    assert np.array_equal(one.registers, two.registers)
