"""Unit tests for the mergeable sketch library: each sketch's
partial/merge/finalize is checked against the pandas/numpy one-liner it
replaces (SURVEY.md §5.1), plus merge-associativity property tests
(profile(A∪B) == merge(profile(A), profile(B))) — SURVEY.md §5.5."""

import math
import pickle

import numpy as np
import pandas as pd
import pytest

from advanced_data_profile_ray.state import (
    CorrState,
    FixedHistogram,
    HeavyHitters,
    HyperLogLog,
    MinMax,
    Moments,
    NullBlank,
    TDigest,
    TypeVote,
    ValueCounts,
)

RNG = np.random.default_rng(42)


def split_merge(cls, arr, k=5, **kw):
    """Build sketch from k random splits and merge — order-shuffled."""
    parts = np.array_split(arr, k)
    sks = [cls.from_array(p, **kw) for p in parts]
    order = RNG.permutation(len(sks))
    out = sks[order[0]]
    for i in order[1:]:
        out = out.merge(sks[i])
    return out


class TestMoments:
    @pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform", "tiny"])
    def test_matches_pandas(self, dist):
        if dist == "normal":
            x = RNG.normal(3, 2, 10_000)
        elif dist == "lognormal":
            x = RNG.lognormal(0, 1.5, 10_000)
        elif dist == "uniform":
            x = RNG.uniform(-5, 5, 997)
        else:
            x = np.array([1.0, 2.0, 2.0, 9.0, -3.0])
        s = pd.Series(x)
        m = split_merge(Moments, x, k=7)
        assert m.n == len(x)
        assert m.mean == pytest.approx(s.mean(), rel=1e-12)
        assert m.std() == pytest.approx(s.std(), rel=1e-10)
        assert m.skew() == pytest.approx(s.skew(), rel=1e-8)
        assert m.kurtosis() == pytest.approx(s.kurtosis(), rel=1e-8)
        assert m.min == x.min() and m.max == x.max()

    def test_merge_empty(self):
        def eq(a, b):
            return all(
                (a[k] != a[k] and b[k] != b[k]) or a[k] == b[k] for k in a
            )

        m = Moments.from_array(np.array([1.0, 2.0]))
        assert eq(m.merge(Moments()).finalize(), m.finalize())
        assert eq(Moments().merge(m).finalize(), m.finalize())

    def test_associativity(self):
        x = RNG.normal(0, 1, 5000)
        a, b, c = (Moments.from_array(p) for p in np.array_split(x, 3))
        left = a.merge(b).merge(c)
        right = a.merge(b.merge(c))
        assert left.mean == pytest.approx(right.mean, rel=1e-12)
        assert left.m4 == pytest.approx(right.m4, rel=1e-9)

    def test_pickle(self):
        m = Moments.from_array(RNG.normal(size=100))
        assert pickle.loads(pickle.dumps(m)).finalize() == m.finalize()


class TestHLL:
    @pytest.mark.parametrize("true_card", [10, 1000, 50_000])
    def test_estimate_within_error(self, true_card):
        vals = np.arange(true_card).repeat(3)
        h = split_merge(HyperLogLog, vals, k=9, p=12)
        err = abs(h.estimate() - true_card) / true_card
        assert err < 0.05  # p=12 → ~1.6% std error

    def test_strings(self):
        vals = np.array([f"user_{i % 500}" for i in range(5000)], dtype=object)
        h = HyperLogLog.from_array(vals)
        assert abs(h.estimate() - 500) / 500 < 0.06

    def test_merge_equals_union(self):
        a = np.arange(0, 3000)
        b = np.arange(1500, 4000)
        hu = HyperLogLog.from_array(np.concatenate([a, b]))
        hm = HyperLogLog.from_array(a).merge(HyperLogLog.from_array(b))
        assert np.array_equal(hu.registers, hm.registers)  # exact register equality

    def test_deterministic_across_builds(self):
        vals = np.array(["a", "b", "c"] * 10, dtype=object)
        assert np.array_equal(
            HyperLogLog.from_array(vals).registers,
            HyperLogLog.from_array(vals).registers,
        )


class TestTDigest:
    @pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform"])
    def test_quantiles_close(self, dist):
        n = 50_000
        x = {
            "normal": RNG.normal(10, 3, n),
            "lognormal": RNG.lognormal(0, 1, n),
            "uniform": RNG.uniform(0, 100, n),
        }[dist]
        td = split_merge(TDigest, x, k=10)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            exact = np.quantile(x, q)
            spread = np.quantile(x, min(q + 0.02, 1)) - np.quantile(x, max(q - 0.02, 0))
            assert abs(td.quantile(q) - exact) <= max(spread, 1e-9), q

    def test_min_max_exact(self):
        x = RNG.normal(size=10_000)
        td = split_merge(TDigest, x, k=4)
        assert td.quantile(0.0) == x.min()
        assert td.quantile(1.0) == x.max()

    def test_small(self):
        td = TDigest.from_array(np.array([5.0]))
        assert td.quantile(0.5) == 5.0
        assert TDigest().merge(td).quantile(0.5) == 5.0

    def test_cdf(self):
        x = RNG.uniform(0, 1, 20_000)
        td = TDigest.from_array(x)
        assert td.cdf(0.5) == pytest.approx(0.5, abs=0.02)


class TestHeavyHitters:
    def test_exact_small_domain(self):
        vals = np.array(["a"] * 50 + ["b"] * 30 + ["c"] * 20 + ["d"] * 5, dtype=object)
        RNG.shuffle(vals)
        hh = split_merge(HeavyHitters, vals, k=4, capacity=512)
        assert hh.top_k(3) == [("a", 50), ("b", 30), ("c", 20)]
        assert hh.finalize()["exact"]

    def test_zipf_top_k_survives_trim(self):
        vals = RNG.zipf(1.5, 100_000)
        vals = vals[vals < 10_000]
        hh = split_merge(HeavyHitters, vals, k=8, capacity=256)
        exact = pd.Series(vals).value_counts()
        got = dict(hh.top_k(5))
        for key, cnt in exact.head(5).items():
            assert got.get(key, 0) >= cnt - hh.error

    def test_tiebreak_deterministic(self):
        vals = np.array(list("abab"), dtype=object)
        assert HeavyHitters.from_array(vals).top_k(2) == [("a", 2), ("b", 2)]


class TestHistogram:
    def test_counts_and_merge(self):
        edges = np.linspace(0, 100, 21)
        x = RNG.uniform(-10, 110, 10_000)
        h = split_merge(FixedHistogram, x, k=6, edges=edges)
        inside = x[(x >= 0) & (x <= 100)]
        np.testing.assert_array_equal(h.counts, np.histogram(inside, bins=edges)[0])
        assert h.n_below == (x < 0).sum()
        assert h.n_above == (x > 100).sum()
        assert h.n == len(x)

    def test_cdf(self):
        edges = np.linspace(0, 1, 11)
        h = FixedHistogram.from_array(RNG.uniform(0, 1, 100_000), edges)
        assert h.cdf()[4] == pytest.approx(0.5, abs=0.01)


class TestBasicStates:
    def test_nullblank(self):
        a = NullBlank(10, 2, 1).merge(NullBlank(5, 0, 2))
        f = a.finalize()
        assert f["null_count"] == 2 and f["blank_count"] == 3 and f["total"] == 15
        assert f["non_null_count"] == 13

    def test_minmax(self):
        mm = MinMax.from_array(np.array([3, 1, 7])).merge(MinMax.from_array(np.array([0, 9])))
        assert (mm.min, mm.max) == (0, 9)
        assert MinMax().merge(MinMax.from_array(np.array([5]))).min == 5

    def test_value_counts_entropy(self):
        vals = np.array(["x"] * 50 + ["y"] * 50, dtype=object)
        vc = split_merge(ValueCounts, vals, k=3)
        assert vc.entropy() == pytest.approx(math.log(2))  # scipy.stats.entropy base e
        assert vc.counts["x"] == 50
        assert vc.distinct() == 2

    def test_value_counts_overflow(self):
        vc = ValueCounts.from_array(np.arange(10_000), cap=100)
        assert vc.overflow
        merged = vc.merge(ValueCounts.from_array(np.array([1]), cap=100))
        assert merged.overflow

    def test_type_lattice(self):
        assert TypeVote("integer").merge(TypeVote("float")).logical_type == "float"
        assert TypeVote("empty").merge(TypeVote("date")).logical_type == "date"
        assert TypeVote("date").merge(TypeVote("timestamp")).logical_type == "timestamp"
        assert TypeVote("integer").merge(TypeVote("string")).logical_type == "string"
        assert TypeVote("date").merge(TypeVote("integer")).logical_type == "string"


class TestCorrState:
    def test_matches_pandas_corr(self):
        n = 2000
        x = RNG.normal(size=(n, 4))
        x[:, 1] = x[:, 0] * 2 + RNG.normal(scale=0.1, size=n)
        df = pd.DataFrame(x, columns=list("abcd"))
        parts = np.array_split(x, 5)
        st = CorrState.from_matrix(parts[0], list("abcd"))
        for p in parts[1:]:
            st = st.merge(CorrState.from_matrix(p, list("abcd")))
        np.testing.assert_allclose(st.corr_matrix(), df.corr().values, atol=1e-10)

    def test_with_nans_mean_imputed(self):
        n = 1000
        x = RNG.normal(size=(n, 3))
        mask = RNG.uniform(size=(n, 3)) < 0.1
        x[mask] = np.nan
        df = pd.DataFrame(x, columns=list("abc"))
        imputed = df.fillna(df.mean())
        st = CorrState.from_matrix(x[:500], list("abc")).merge(
            CorrState.from_matrix(x[500:], list("abc"))
        )
        np.testing.assert_allclose(st.corr_matrix(), imputed.corr().values, atol=1e-9)

    def test_pca_importance_keys(self):
        x = RNG.normal(size=(500, 3))
        st = CorrState.from_matrix(x, list("abc"))
        imp = st.pca_importance()
        assert set(imp) == {"a", "b", "c"}
        assert all(v > 0 for v in imp.values())


class TestDatePartCounts:
    def test_matches_pandas_and_merges(self):
        import pandas as pd
        import pyarrow as pa

        from advanced_data_profile_ray.state import DatePartCounts

        ts = pd.to_datetime(
            RNG.integers(1_577_836_800, 1_700_000_000, 5000), unit="s"
        )
        arr = pa.array(ts, pa.timestamp("us"))
        one = DatePartCounts.from_timestamp(arr)
        merged = DatePartCounts.from_timestamp(arr.slice(0, 2000)).merge(
            DatePartCounts.from_timestamp(arr.slice(2000))
        )
        for part, attr in [("year", "year"), ("month", "month"), ("day", "day"),
                           ("hour", "hour"), ("minute", "minute"), ("second", "second")]:
            want = ts.to_series().dt.__getattribute__(attr).value_counts().sort_index()
            got = one.finalize()[part]
            assert got == {int(k): int(v) for k, v in want.items()}, part
            assert merged.finalize()[part] == got, part
