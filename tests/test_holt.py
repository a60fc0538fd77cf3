"""Holt linear smoothing (L272)."""


import pytest

from lmss_entity_extractor_spark.ops.timeseries import holt_linear


def _holt_py(xs, alpha, beta):
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        lnew = alpha * x + (1 - alpha) * (l + b)
        b = beta * (lnew - l) + (1 - beta) * b
        l = lnew
    return l, b


class TestHoltLinear:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x)) for i, x in enumerate(xs)],
            "g string, t double, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [3.0, 5.5, 4.0, 7.25, 8.0, 6.5, 9.0, 11.0]
        out = holt_linear(
            self._df(spark, xs), ["g"], "t", "x", alpha=0.4, beta=0.2
        ).collect()[0]
        l, b = _holt_py(xs, 0.4, 0.2)
        assert out["n"] == 8
        assert out["level"] == pytest.approx(l, rel=1e-12)
        assert out["trend"] == pytest.approx(b, rel=1e-12)
        assert out["forecast"] == pytest.approx(l + b, rel=1e-12)

    def test_exact_linear_series(self, spark):
        xs = [1.0, 3.0, 5.0, 7.0, 9.0]
        out = holt_linear(
            self._df(spark, xs), ["g"], "t", "x", alpha=0.5, beta=0.5
        ).collect()[0]
        assert out["level"] == 9.0
        assert out["trend"] == 2.0
        assert out["forecast"] == 11.0

    def test_single_point(self, spark):
        out = holt_linear(
            self._df(spark, [4.5]), ["g"], "t", "x"
        ).collect()[0]
        assert out["level"] == 4.5
        assert out["trend"] is None and out["forecast"] is None

    def test_duplicate_order_refused(self, spark):
        df = self._df(spark, [1.0, 2.0]).union(self._df(spark, [9.0]))
        with pytest.raises(ValueError, match="duplicate order"):
            holt_linear(df, ["g"], "t", "x")

    def test_bad_params_refused(self, spark):
        with pytest.raises(ValueError, match="alpha"):
            holt_linear(self._df(spark, [1.0]), ["g"], "t", "x", alpha=0.0)
