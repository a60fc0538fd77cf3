"""Gumbel return levels (L309) and Hill tail index (L310)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.extremes import (
    gumbel_fit,
    hill_estimator,
)

EULER = 0.5772156649015329


def _gumbel_py(xs, t):
    n = len(xs)
    s = sum(xs)
    q = sum(x * x for x in xs)
    mean = s / n
    var = (n * q - s * s) / (n * (n - 1.0))
    beta = math.sqrt(var) * math.sqrt(6) / math.pi
    mu = mean - EULER * beta
    return mu, beta, mu - beta * math.log(-math.log(1 - 1.0 / t))


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(x)) for x in xs], "g string, x double"
    )


class TestGumbel:
    def test_matches_python_reference(self, spark):
        xs = [10, 14.5, 12, 18, 11.25, 16, 13, 20.5, 12.5, 15]
        rows = gumbel_fit(
            _df(spark, xs), ["g"], "x", return_periods=(10, 100)
        ).collect()
        got = {r["t_return"]: r for r in rows}
        for t in (10, 100):
            mu, beta, level = _gumbel_py(xs, t)
            assert got[t]["mu"] == pytest.approx(mu, rel=1e-9)
            assert got[t]["beta"] == pytest.approx(beta, rel=1e-9)
            assert got[t]["level"] == pytest.approx(level, rel=1e-9)

    def test_levels_increase_with_period(self, spark):
        xs = [10, 14.5, 12, 18, 11.25, 16, 13, 20.5]
        rows = gumbel_fit(
            _df(spark, xs), ["g"], "x", return_periods=(10, 100)
        ).collect()
        got = {r["t_return"]: r["level"] for r in rows}
        assert got[100] > got[10] > max(xs) * 0.8

    def test_constant_null(self, spark):
        rows = gumbel_fit(
            _df(spark, [5.0] * 6), ["g"], "x", return_periods=(10,)
        ).collect()
        assert rows[0]["mu"] is None and rows[0]["level"] is None

    def test_bad_period_refused(self, spark):
        with pytest.raises(ValueError, match="return periods"):
            gumbel_fit(_df(spark, [1.0]), ["g"], "x",
                       return_periods=(1,))


def _hill_py(xs, k):
    top = sorted(xs, reverse=True)[: k + 1]
    xk1 = top[k]
    h = sum(math.log(x / xk1) for x in top[:k]) / k
    return xk1, h, 1.0 / h


class TestHill:
    def test_matches_python_reference(self, spark):
        # Pareto(alpha=2)-ish deterministic sample: x = (1/u)^(1/2)
        xs = [(1.0 / ((i + 0.5) / 40)) ** 0.5 for i in range(40)]
        row = hill_estimator(_df(spark, xs), ["g"], "x", k=10).collect()[0]
        xk1, h, alpha = _hill_py(xs, 10)
        assert row["x_tail"] == pytest.approx(xk1, rel=1e-9)
        assert row["hill"] == pytest.approx(h, rel=1e-9)
        assert row["alpha"] == pytest.approx(alpha, rel=1e-9)
        # the estimator should land near the true tail index 2
        assert 1.2 < row["alpha"] < 3.0

    def test_too_few_rows_null(self, spark):
        row = hill_estimator(
            _df(spark, [1.0, 2.0, 3.0]), ["g"], "x", k=5
        ).collect()[0]
        assert row["hill"] is None

    def test_nonpositive_refused(self, spark):
        xs = [5.0, 4.0, -1.0]
        with pytest.raises(ValueError, match="nonpositive"):
            hill_estimator(_df(spark, xs), ["g"], "x", k=2)

    def test_bad_k_refused(self, spark):
        with pytest.raises(ValueError, match="k must"):
            hill_estimator(_df(spark, [1.0]), ["g"], "x", k=1)
