"""Grubbs max-residual test (L229) and Cochran-Armitage trend (L230)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import (
    cochran_armitage,
    grubbs_test,
)


def _grubbs_py(xs):
    n = len(xs)
    m = sum(xs) / n
    var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    s = math.sqrt(var)
    d, x = max((abs(x - m), x) for x in xs)
    return m, s, d / s, x


class TestGrubbs:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [10.0, 11.0, 10.5, 9.75, 10.25, 30.0]
        out = grubbs_test(self._df(spark, xs), ["g"], "x").collect()[0]
        m, s, g, x = _grubbs_py(xs)
        assert out["mean"] == pytest.approx(m, rel=1e-12)
        assert out["sd"] == pytest.approx(s, rel=1e-12)
        assert out["grubbs_g"] == pytest.approx(g, rel=1e-12)
        assert out["x_out"] == 30.0

    def test_low_side_outlier(self, spark):
        xs = [10.0, 11.0, 10.5, 9.75, -30.0]
        out = grubbs_test(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["x_out"] == -30.0

    def test_constant_null(self, spark):
        out = grubbs_test(self._df(spark, [5.0] * 6), ["g"], "x").collect()[0]
        assert out["grubbs_g"] is None and out["sd"] is None

    def test_too_small_null(self, spark):
        out = grubbs_test(self._df(spark, [1.0, 9.0]), ["g"], "x").collect()[0]
        assert out["grubbs_g"] is None

    def test_tie_resolves_to_larger(self, spark):
        xs = [0.0, 10.0, -10.0, 0.0]  # symmetric deviations
        out = grubbs_test(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["x_out"] == 10.0


def _ca_py(levels):
    """levels: {score: (n_j, a_j)}"""
    N = sum(n for n, _ in levels.values())
    A = sum(a for _, a in levels.values())
    S1 = sum(s * n for s, (n, _) in levels.items())
    S2 = sum(s * s * n for s, (n, _) in levels.items())
    T = sum(s * a for s, (_, a) in levels.items())
    num = T - A * S1 / N
    var = (A / N) * (1 - A / N) * (S2 - S1 * S1 / N)
    return num / math.sqrt(var)


class TestCochranArmitage:
    def _df(self, spark, levels, g="g1"):
        rows = []
        for s, (n, a) in levels.items():
            rows += [(g, int(s), 1)] * a + [(g, int(s), 0)] * (n - a)
        return spark.createDataFrame(rows, "g string, s int, y int")

    def test_matches_python_reference(self, spark):
        levels = {0: (20, 2), 1: (20, 5), 2: (20, 9), 3: (20, 15)}
        out = cochran_armitage(
            self._df(spark, levels), ["g"], "s", "y"
        ).collect()[0]
        assert out["z"] == pytest.approx(_ca_py(levels), rel=1e-12)
        assert out["k"] == 4 and out["n"] == 80 and out["n_success"] == 31

    def test_no_trend_small_z(self, spark):
        levels = {0: (30, 10), 1: (30, 10), 2: (30, 10)}
        out = cochran_armitage(
            self._df(spark, levels), ["g"], "s", "y"
        ).collect()[0]
        assert abs(out["z"]) < 1e-12

    def test_negative_trend_negative_z(self, spark):
        levels = {0: (20, 15), 1: (20, 8), 2: (20, 2)}
        out = cochran_armitage(
            self._df(spark, levels), ["g"], "s", "y"
        ).collect()[0]
        assert out["z"] < -3.0

    def test_degenerate_null(self, spark):
        out = cochran_armitage(
            self._df(spark, {1: (10, 0)}), ["g"], "s", "y"
        ).collect()[0]
        assert out["z"] is None

    def test_non_binary_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 2)], "g string, s int, y int"
        )
        with pytest.raises(ValueError, match="non-binary"):
            cochran_armitage(df, ["g"], "s", "y")
