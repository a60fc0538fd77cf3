"""One-sample KS vs uniform (L243) and two-sample Anderson-Darling
with the Scholz-Stephens tie correction (L244)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.rankeval import (
    anderson_darling_2samp,
    ks_uniform,
)


def _ks_py(xs, lo, hi):
    n = len(xs)
    from collections import Counter

    cnt = Counter(xs)
    cum = 0
    dp = dm = -1e18
    for v in sorted(cnt):
        l = cnt[v]
        cum += l
        f = (v - lo) / (hi - lo)
        dp = max(dp, cum / n - f)
        dm = max(dm, f - (cum - l) / n)
    return dp, dm, max(dp, dm)


class TestKsUniform:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [0.1, 0.2, 0.2, 0.5, 0.9, 0.95, 0.55, 0.3]
        out = ks_uniform(self._df(spark, xs), ["g"], "x", "0", "1").collect()[0]
        dp, dm, d = _ks_py(xs, 0.0, 1.0)
        assert out["d_plus"] == pytest.approx(dp, rel=1e-12)
        assert out["d_minus"] == pytest.approx(dm, rel=1e-12)
        assert out["d"] == pytest.approx(d, rel=1e-12)
        assert out["stat"] == pytest.approx(math.sqrt(8) * d, rel=1e-12)

    def test_uniform_grid_small_d(self, spark):
        xs = [(i + 0.5) / 100 for i in range(100)]
        out = ks_uniform(self._df(spark, xs), ["g"], "x", "0", "1").collect()[0]
        assert out["d"] < 0.011

    def test_clumped_large_d(self, spark):
        xs = [0.9 + i * 0.001 for i in range(50)]
        out = ks_uniform(self._df(spark, xs), ["g"], "x", "0", "1").collect()[0]
        assert out["d"] > 0.8

    def test_out_of_range_refused(self, spark):
        with pytest.raises(ValueError, match="outside"):
            ks_uniform(self._df(spark, [0.5, 1.5]), ["g"], "x", "0", "1")


def _ad_py(a, b):
    """Scholz-Stephens A2_akN for k=2 with ties, literal formula."""
    from collections import Counter

    pooled = sorted(set(a) | set(b))
    ca, cb = Counter(a), Counter(b)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    total = 0.0
    for ni, cnt in ((n1, ca), (n2, cb)):
        s = 0.0
        bprev = mprev = 0
        for v in pooled:
            lj = ca[v] + cb[v]
            baj = bprev + lj / 2
            maj = mprev + cnt[v] / 2
            denom = baj * (n - baj) - n * lj / 4
            if denom > 0:
                s += (lj / n) * (n * maj - ni * baj) ** 2 / denom
            bprev += lj
            mprev += cnt[v]
        total += s / ni
    return (n - 1) / n * total


class TestAndersonDarling:
    def _df(self, spark, a, b, g="g1"):
        rows = [(g, "A", float(v)) for v in a] + [(g, "B", float(v)) for v in b]
        return spark.createDataFrame(rows, "g string, s string, x double")

    def test_matches_python_reference_with_ties(self, spark):
        a = [1, 2, 2, 3, 5, 8, 8, 9]
        b = [2, 3, 3, 4, 6, 7, 9, 9, 10]
        out = anderson_darling_2samp(
            self._df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["a2"] == pytest.approx(_ad_py(a, b), rel=1e-10)
        assert out["n_a"] == 8 and out["n_b"] == 9

    def test_identical_samples_small(self, spark):
        a = [1, 2, 3, 4, 5, 6, 7, 8]
        out = anderson_darling_2samp(
            self._df(spark, a, a), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert abs(out["a2"]) < 0.2

    def test_shifted_samples_large(self, spark):
        a = [float(i) for i in range(20)]
        b = [float(i + 100) for i in range(20)]
        out = anderson_darling_2samp(
            self._df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["a2"] > 5.0

    def test_single_distinct_value_zero_terms(self, spark):
        out = anderson_darling_2samp(
            self._df(spark, [5.0, 5.0], [5.0]), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["a2"] == 0.0

    def test_parallelism_invariance(self, spark):
        a = [float((i * 7) % 13) for i in range(40)]
        b = [float((i * 5) % 11) for i in range(35)]
        df = self._df(spark, a, b)
        x = anderson_darling_2samp(
            df.repartition(1), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        y = anderson_darling_2samp(
            df.repartition(8), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert x == y
