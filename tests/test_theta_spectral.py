"""Theta method (L281) and spectral entropy (L282)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    spectral_entropy,
    theta_forecast,
)


def _theta_py(xs, alpha):
    n = len(xs)
    sx = 0.0
    for x in xs:
        sx += x
    six = 0.0
    for i, x in enumerate(xs, 1):
        six += i * x
    si = n * (n + 1) / 2.0
    sii = n * (n + 1) * (2 * n + 1) / 6.0
    b = (n * six - si * sx) / (n * sii - si * si)
    a = (sx - b * si) / n
    ys = [2.0 * x - (a + b * i) for i, x in enumerate(xs, 1)]
    s = ys[0]
    for y in ys[1:]:
        s = alpha * y + (1 - alpha) * s
    return a, b, s, (s + (a + b * (n + 1))) / 2.0


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestTheta:
    def test_matches_python_reference(self, spark):
        xs = [12.0, 13.5, 12.5, 15.0, 16.25, 15.5, 18.0, 19.5, 18.75,
              21.0]
        row = theta_forecast(
            _df(spark, xs), ["g"], "t", "x", alpha=0.4
        ).collect()[0]
        a, b, s, fc = _theta_py(xs, 0.4)
        assert row["intercept"] == pytest.approx(a, rel=1e-9)
        assert row["slope"] == pytest.approx(b, rel=1e-9)
        assert row["ses_theta2"] == pytest.approx(s, rel=1e-9)
        assert row["forecast"] == pytest.approx(fc, rel=1e-9)

    def test_pure_line_recovers_slope(self, spark):
        xs = [3.0 + 2.0 * i for i in range(8)]
        row = theta_forecast(_df(spark, xs), ["g"], "t", "x").collect()[0]
        assert row["slope"] == pytest.approx(2.0, rel=1e-12)
        # theta2 of a pure line IS the line; SES lags it, and the
        # combined forecast averages the lagged SES with the exact
        # next trend point
        assert row["forecast"] == pytest.approx(
            (row["ses_theta2"] + (3.0 + 2.0 * 8)) / 2.0, rel=1e-12
        )
        assert row["ses_theta2"] < 3.0 + 2.0 * 7 + 1e-9

    def test_single_point_null(self, spark):
        row = theta_forecast(_df(spark, [5.0]), ["g"], "t", "x").collect()[0]
        assert row["forecast"] is None

    def test_duplicate_order_refused(self, spark):
        df = _df(spark, [1.0, 2.0]).union(_df(spark, [9.0]))
        with pytest.raises(ValueError, match="duplicate"):
            theta_forecast(df, ["g"], "t", "x")


def _spectral_py(xs):
    n = len(xs)
    xbar = 0.0
    for x in xs:
        xbar += x
    xbar /= n
    ps = []
    for k in range(1, n // 2 + 1):
        c = s = 0.0
        for i, x in enumerate(xs):
            c += (x - xbar) * math.cos(2 * math.pi * k * i / n)
            s += (x - xbar) * math.sin(2 * math.pi * k * i / n)
        ps.append(c * c + s * s)
    tot = sum(ps)
    h = -sum(
        (p / tot) * math.log(p / tot) for p in ps if p > 0
    )
    return h, h / math.log(len(ps))


class TestSpectralEntropy:
    def test_pure_tone_low_entropy(self, spark):
        xs = [math.sin(2 * math.pi * 4 * i / 32) for i in range(32)]
        row = spectral_entropy(_df(spark, xs), ["g"], "t", "x").collect()[0]
        assert row["k_freqs"] == 16
        assert row["entropy_norm"] < 0.05

    def test_matches_python_reference(self, spark):
        xs = [1.0, 4.5, 2.0, 8.0, 5.5, 7.0, 0.5, 3.25, 6.0, 2.75,
              9.0, 1.25]
        row = spectral_entropy(_df(spark, xs), ["g"], "t", "x").collect()[0]
        h, hn = _spectral_py(xs)
        assert row["entropy"] == pytest.approx(h, rel=1e-9)
        assert row["entropy_norm"] == pytest.approx(hn, rel=1e-9)

    def test_constant_null(self, spark):
        row = spectral_entropy(
            _df(spark, [3.0] * 10), ["g"], "t", "x"
        ).collect()[0]
        assert row["entropy"] is None

    def test_null_refused(self, spark):
        df = _df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            spectral_entropy(df, ["g"], "t", "x")
