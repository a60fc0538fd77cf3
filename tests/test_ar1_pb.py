"""AR(1) fit panel (L353) and Passing-Bablok regression (L354)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.regression import passing_bablok
from lmss_entity_extractor_spark.ops.timeseries import ar1_fit


def _noise(i):
    return ((i * 7919) % 13 - 6) / 10.0


def _ar1_py(xs):
    ys, xp = xs[1:], xs[:-1]
    m = len(ys)
    sx, sy = sum(xp), sum(ys)
    sxx = sum(v * v for v in xp)
    sxy = sum(a * b for a, b in zip(xp, ys))
    phi = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    c = (sy - phi * sx) / m
    return phi, c


def _pb_py(xs, ys):
    n = len(xs)
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            if xs[j] == xs[i]:
                continue
            s = (ys[j] - ys[i]) / (xs[j] - xs[i])
            if ys[j] - ys[i] == -(xs[j] - xs[i]):
                continue
            slopes.append(s)
    slopes.sort()
    nn = len(slopes)
    k = sum(1 for s in slopes if s < -1.0)
    if nn % 2 == 1:
        b = slopes[(nn + 1) // 2 + k - 1]
    else:
        lo, hi = slopes[nn // 2 + k - 1], slopes[nn // 2 + k]
        b = math.sqrt(lo * hi)
    res = sorted(y - b * x for x, y in zip(xs, ys))
    m = len(res)
    if m % 2 == 1:
        a = res[m // 2]
    else:
        a = (res[m // 2 - 1] + res[m // 2]) / 2.0
    return b, a


class TestAr1:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, i, float(x)) for i, x in enumerate(xs)],
            "g string, t int, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [10.0]
        for i in range(50):
            xs.append(round(2.0 + 0.8 * xs[-1] + _noise(i), 2))
        xs = [round(v, 2) for v in xs]
        row = ar1_fit(self._df(spark, xs), ["g"], ["t"], "x").collect()[0]
        phi, c = _ar1_py(xs)
        assert row["phi"] == pytest.approx(phi, rel=1e-9)
        assert row["intercept"] == pytest.approx(c, rel=1e-9)
        assert row["mu_lr"] == pytest.approx(c / (1 - phi), rel=1e-9)
        assert row["half_life"] == pytest.approx(
            -math.log(2) / math.log(phi), rel=1e-9
        )

    def test_mean_reversion_direction(self, spark):
        # strongly persistent series: half-life longer than a fast one
        def gen(phi):
            xs = [0.0]
            for i in range(80):
                xs.append(round(phi * xs[-1] + _noise(i), 2))
            return xs

        df = self._df(spark, gen(0.9), "slow").union(
            self._df(spark, gen(0.2), "fast")
        )
        out = {r["g"]: r for r in ar1_fit(df, ["g"], ["t"], "x").collect()}
        assert out["slow"]["half_life"] > out["fast"]["half_life"]

    def test_oscillating_no_half_life(self, spark):
        xs = [round((-1.0) ** i * 5.0 + _noise(i), 2) for i in range(40)]
        row = ar1_fit(self._df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["phi"] < 0
        assert row["half_life"] is None
        assert row["mu_lr"] is not None

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            ar1_fit(
                spark.createDataFrame(
                    [("g", 0, None)], "g string, t int, x double"
                ),
                ["g"], ["t"], "x",
            )


class TestPassingBablok:
    def _df(self, spark, xs, ys, g="g1"):
        return spark.createDataFrame(
            [(g, float(x), float(y)) for x, y in zip(xs, ys)],
            "g string, x double, y double",
        )

    def test_matches_python_reference(self, spark):
        xs = [round(1.0 + 0.5 * i, 2) for i in range(15)]
        ys = [round(0.7 + 1.1 * x + _noise(i) / 5, 2) for i, x in enumerate(xs)]
        row = passing_bablok(
            self._df(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        b, a = _pb_py(xs, ys)
        assert row["slope"] == pytest.approx(b, rel=1e-9)
        assert row["intercept"] == pytest.approx(a, rel=1e-9)
        assert row["n"] == 15

    def test_outlier_resistant(self, spark):
        xs = [float(i) for i in range(1, 21)]
        ys = [2.0 * x for x in xs]
        ys[10] = 500.0  # gross outlier
        row = passing_bablok(
            self._df(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        assert row["slope"] == pytest.approx(2.0, abs=0.05)

    def test_identity_methods(self, spark):
        xs = [round(1.0 + 0.3 * i, 2) for i in range(12)]
        row = passing_bablok(
            self._df(spark, xs, xs), ["g"], "x", "y"
        ).collect()[0]
        assert row["slope"] == pytest.approx(1.0)
        assert row["intercept"] == pytest.approx(0.0, abs=1e-12)

    def test_vertical_pairs_excluded(self, spark):
        xs = [1.0, 1.0, 2.0, 3.0]
        ys = [1.0, 2.0, 3.0, 4.0]
        row = passing_bablok(
            self._df(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        # 6 pairs, 1 vertical (x equal) -> 5 candidate slopes, none = -1
        assert row["n_slopes"] == 5

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="max_len"):
            passing_bablok(
                self._df(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
                ["g"], "x", "y", max_len=2,
            )
        with pytest.raises(ValueError, match="NULL"):
            passing_bablok(
                spark.createDataFrame(
                    [("g", None, 1.0)], "g string, x double, y double"
                ),
                ["g"], "x", "y",
            )
