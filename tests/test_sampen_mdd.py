"""Sample entropy (L313) and maximum drawdown (L314)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.complexity import sample_entropy
from lmss_entity_extractor_spark.ops.timeseries import max_drawdown


def _sampen_py(xs, r):
    n = len(xs)

    def count(m):
        last = n - m
        c = 0
        for i in range(1, last):
            for j in range(i + 1, last + 1):
                if all(
                    abs(xs[i - 1 + k] - xs[j - 1 + k]) <= r
                    for k in range(m)
                ):
                    c += 1
        return c

    b, a = count(2), count(3)
    return b, a, (-math.log(a / b) if a and b else None)


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestSampleEntropy:
    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3]
        row = sample_entropy(
            _df(spark, xs), ["g"], "t", "x", r=2.0
        ).collect()[0]
        b, a, s = _sampen_py(xs, 2.0)
        assert row["b_matches"] == b and row["a_matches"] == a
        assert row["sampen"] == pytest.approx(s, rel=1e-12)

    def test_regular_lower_than_chaotic(self, spark):
        reg = [float(i % 4) for i in range(40)]
        x, chaos = 0.3, []
        for _ in range(40):
            x = 3.99 * x * (1 - x)
            chaos.append(10 * x)
        s_reg = sample_entropy(
            _df(spark, reg), ["g"], "t", "x", r=0.5
        ).collect()[0]["sampen"]
        s_chaos = sample_entropy(
            _df(spark, chaos), ["g"], "t", "x", r=0.5
        ).collect()[0]["sampen"]
        assert s_reg < 0.1  # near-perfect repeats (boundary residue)
        assert s_chaos > 5 * s_reg

    def test_bad_r_refused(self, spark):
        with pytest.raises(ValueError, match="r must"):
            sample_entropy(_df(spark, [1.0]), ["g"], "t", "x", r=0.0)


def _mdd_py(xs):
    peak, best = float("-inf"), None
    for t, x in enumerate(xs):
        peak = max(peak, x)
        dd = peak - x
        if best is None or dd > best[0]:
            best = (dd, peak, x)
    return best


class TestMaxDrawdown:
    def test_matches_python_reference(self, spark):
        xs = [10, 12, 8, 15, 11, 9, 14, 20, 13, 18]
        row = max_drawdown(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        dd, peak, trough = _mdd_py(xs)
        assert row["mdd"] == pytest.approx(dd)
        assert row["peak"] == pytest.approx(peak)
        assert row["trough"] == pytest.approx(trough)
        assert row["mdd_rel"] == pytest.approx(dd / peak, rel=1e-12)

    def test_monotone_zero_drawdown(self, spark):
        row = max_drawdown(
            _df(spark, list(range(10))), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["mdd"] == 0.0

    def test_earliest_trough_on_tie(self, spark):
        # two equal drawdowns of 5: picks the first (trough 5 after
        # peak 10), not the later one
        xs = [10, 5, 10, 5]
        row = max_drawdown(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["mdd"] == 5.0 and row["trough"] == 5.0

    def test_nonpositive_peak_null_rel(self, spark):
        xs = [-5, -8, -6]
        row = max_drawdown(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["mdd"] == 3.0
        assert row["mdd_rel"] is None
