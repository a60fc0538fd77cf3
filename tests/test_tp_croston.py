"""Turning-points test (L279) and Croston's method (L280)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import croston
from lmss_entity_extractor_spark.ops.trend import turning_points


def _tp_py(xs):
    n = len(xs)
    t = sum(
        1
        for i in range(1, n - 1)
        if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
        or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
    )
    e = 2.0 * (n - 2) / 3.0
    var = (16.0 * n - 29.0) / 90.0
    return t, e, (t - e) / math.sqrt(var)


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestTurningPoints:
    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1.5, 5, 9, 2, 6, 5.5, 3.5, 5.25, 8, 9.5, 7]
        row = turning_points(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        t, e, z = _tp_py(xs)
        assert row["t_points"] == t
        assert row["expected"] == pytest.approx(e, rel=1e-12)
        assert row["z"] == pytest.approx(z, rel=1e-12)

    def test_monotone_zero_turns(self, spark):
        row = turning_points(
            _df(spark, list(range(12))), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["t_points"] == 0 and row["z"] < -3.0

    def test_sawtooth_max_turns(self, spark):
        xs = [i % 2 * 10 + i * 0.01 for i in range(12)]
        row = turning_points(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["t_points"] == 10 and row["z"] > 2.0

    def test_adjacent_tie_refused(self, spark):
        with pytest.raises(ValueError, match="adjacent tie"):
            turning_points(_df(spark, [1, 2, 2, 3]), ["g"], ["t"], "x")


def _croston_py(xs, alpha):
    nz = [(i + 1, x) for i, x in enumerate(xs) if x != 0]
    z, p, prev = nz[0][1], float(nz[0][0]), float(nz[0][0])
    for pos, x in nz[1:]:
        z = alpha * x + (1 - alpha) * z
        p = alpha * (pos - prev) + (1 - alpha) * p
        prev = float(pos)
    return z, p, z / p


class TestCroston:
    def test_matches_python_reference(self, spark):
        xs = [0, 0, 5, 0, 0, 0, 3, 0, 7, 0, 0, 4, 0, 0, 0, 0, 6]
        row = croston(_df(spark, xs), ["g"], "t", "x", alpha=0.2).collect()[0]
        z, p, fc = _croston_py(xs, 0.2)
        assert row["n"] == 17 and row["n_demands"] == 5
        assert row["z_hat"] == pytest.approx(z, rel=1e-12)
        assert row["p_hat"] == pytest.approx(p, rel=1e-12)
        assert row["forecast"] == pytest.approx(fc, rel=1e-12)
        assert row["forecast_sba"] == pytest.approx(
            0.9 * fc, rel=1e-12
        )

    def test_regular_demand(self, spark):
        # demand 4 every 2 periods: z->4, p->2, forecast->2
        xs = [0, 4] * 10
        row = croston(_df(spark, xs), ["g"], "t", "x", alpha=0.5).collect()[0]
        assert row["z_hat"] == pytest.approx(4.0)
        assert row["p_hat"] == pytest.approx(2.0)
        assert row["forecast"] == pytest.approx(2.0)

    def test_all_zero_null(self, spark):
        row = croston(_df(spark, [0.0] * 8), ["g"], "t", "x").collect()[0]
        assert row["n_demands"] == 0
        assert row["forecast"] is None and row["z_hat"] is None

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            croston(_df(spark, [0, -1, 2]), ["g"], "t", "x")

    def test_bad_alpha_refused(self, spark):
        with pytest.raises(ValueError, match="alpha"):
            croston(_df(spark, [1.0]), ["g"], "t", "x", alpha=1.5)
