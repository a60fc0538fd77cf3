"""Kalman local-level filter (L347) and Engle-Granger cointegration (L348)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    engle_granger,
    kalman_level,
)


def _kalman_py(xs, qv, rv, p0):
    a, p, k = xs[0], p0, None
    for x in xs[1:]:
        ppred = p + qv
        k = ppred / (ppred + rv)
        a = a + k * (x - a)
        p = (1.0 - k) * ppred
    return a, p, k


def _eg_py(ys, xs):
    n = len(ys)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    u = [y - a - b * x for y, x in zip(ys, xs)]
    up = u[:-1]
    du = [u[t] - u[t - 1] for t in range(1, n)]
    upp = sum(v * v for v in up)
    updu = sum(p * d for p, d in zip(up, du))
    du2 = sum(d * d for d in du)
    rho = updu / upp
    sse = du2 - rho * updu
    se = math.sqrt(sse / (n - 2) / upp)
    return a, b, rho, rho / se


def _series(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, i, float(x)) for i, x in enumerate(xs)],
        "g string, t int, x double",
    )


def _noise(i):
    return ((i * 7919) % 13 - 6) / 10.0


class TestKalman:
    def test_matches_python_reference(self, spark):
        xs = [10.0 + _noise(i) for i in range(30)]
        row = kalman_level(
            _series(spark, xs), ["g"], "t", "x", q_var=0.5, r_var=2.0,
            p0=100.0,
        ).collect()[0]
        a, p, k = _kalman_py(xs, 0.5, 2.0, 100.0)
        assert row["n"] == 30
        assert row["level"] == pytest.approx(a, rel=1e-12)
        assert row["p_var"] == pytest.approx(p, rel=1e-12)
        assert row["k_last"] == pytest.approx(k, rel=1e-12)

    def test_tracks_level_shift(self, spark):
        xs = [5.0 + _noise(i) for i in range(20)] + [
            50.0 + _noise(i) for i in range(20)
        ]
        row = kalman_level(
            _series(spark, xs), ["g"], "t", "x", q_var=1.0, r_var=1.0
        ).collect()[0]
        assert abs(row["level"] - 50.0) < 2.0

    def test_steady_state_gain(self, spark):
        # constant q/r -> K converges to the Riccati fixed point:
        # K* = (sqrt(q^2+4qr) + q... verify via long-run equality of
        # two different horizons instead of the closed form
        xs1 = [1.0 + _noise(i) for i in range(200)]
        k200 = kalman_level(
            _series(spark, xs1), ["g"], "t", "x", q_var=1.0, r_var=4.0
        ).collect()[0]["k_last"]
        k100 = kalman_level(
            _series(spark, xs1[:100]), ["g"], "t", "x", q_var=1.0,
            r_var=4.0,
        ).collect()[0]["k_last"]
        assert k200 == pytest.approx(k100, abs=1e-12)

    def test_single_point(self, spark):
        row = kalman_level(
            _series(spark, [7.0]), ["g"], "t", "x", q_var=1.0, r_var=1.0,
            p0=10.0,
        ).collect()[0]
        assert row["level"] == 7.0 and row["p_var"] == 10.0
        assert row["k_last"] is None

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="q_var"):
            kalman_level(
                _series(spark, [1.0]), ["g"], "t", "x", q_var=0.0,
                r_var=1.0,
            )
        with pytest.raises(ValueError, match="duplicate"):
            kalman_level(
                spark.createDataFrame(
                    [("g", 0, 1.0), ("g", 0, 2.0)],
                    "g string, t int, x double",
                ),
                ["g"], "t", "x", q_var=1.0, r_var=1.0,
            )


class TestEngleGranger:
    def _df2(self, spark, ys, xs, g="g1"):
        return spark.createDataFrame(
            [
                (g, i, float(y), float(x))
                for i, (y, x) in enumerate(zip(ys, xs))
            ],
            "g string, t int, y double, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [round(10.0 + 0.5 * i + _noise(i), 2) for i in range(40)]
        ys = [round(3.0 + 2.0 * x + _noise(i + 7), 2) for i, x in enumerate(xs)]
        row = engle_granger(
            self._df2(spark, ys, xs), ["g"], ["t"], "y", "x"
        ).collect()[0]
        a, b, rho, t = _eg_py(ys, xs)
        assert row["alpha"] == pytest.approx(a, rel=1e-9)
        assert row["beta"] == pytest.approx(b, rel=1e-9)
        assert row["rho"] == pytest.approx(rho, rel=1e-9)
        assert row["t_eg"] == pytest.approx(t, rel=1e-9)

    def test_cointegrated_vs_independent_walks(self, spark):
        # cointegrated: y = 2x + stationary noise around a shared walk
        wx, acc = [], 0.0
        for i in range(80):
            acc += 1.0 + _noise(i)
            wx.append(round(acc, 2))
        yc = [round(2.0 * x + _noise(i * 3), 2) for i, x in enumerate(wx)]
        # independent: y is its own walk
        wy, acc2 = [], 0.0
        for i in range(80):
            acc2 += 1.0 + _noise(i + 41) * 3
            wy.append(round(acc2, 2))
        df = self._df2(spark, yc, wx, "co").union(
            self._df2(spark, wy, wx, "ind")
        )
        out = {r["g"]: r["t_eg"] for r in
               engle_granger(df, ["g"], ["t"], "y", "x").collect()}
        # residuals of the cointegrated pair mean-revert hard
        assert out["co"] < -3.34
        assert out["co"] < out["ind"]

    def test_zero_x_variance_null(self, spark):
        row = engle_granger(
            self._df2(spark, [1.0, 2.0, 3.0, 4.0], [5.0] * 4),
            ["g"], ["t"], "y", "x",
        ).collect()[0]
        assert row["beta"] is None and row["t_eg"] is None

    def test_short_series_null(self, spark):
        row = engle_granger(
            self._df2(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 4.0]),
            ["g"], ["t"], "y", "x",
        ).collect()[0]
        assert row["t_eg"] is None

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            engle_granger(
                spark.createDataFrame(
                    [("g", 0, None, 1.0)],
                    "g string, t int, y double, x double",
                ),
                ["g"], ["t"], "y", "x",
            )
