"""Weighted least squares (L359) and Byar Poisson rate CI (L360)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import poisson_rate_ci
from lmss_entity_extractor_spark.ops.regression import wls_regression


def _wls_py(xs, ys, ws):
    W = sum(ws)
    swx = sum(w * x for w, x in zip(ws, xs))
    swy = sum(w * y for w, y in zip(ws, ys))
    swxx = sum(w * x * x for w, x in zip(ws, xs))
    swxy = sum(w * x * y for w, x, y in zip(ws, xs, ys))
    swyy = sum(w * y * y for w, y in zip(ws, ys))
    num = W * swxy - swx * swy
    dx = W * swxx - swx * swx
    dy = W * swyy - swy * swy
    b = num / dx
    a = (swy - b * swx) / W
    return b, a, num * num / (dx * dy)


class TestWls:
    def _df(self, spark, xs, ys, ws, g="g1"):
        return spark.createDataFrame(
            [
                (g, float(x), float(y), float(w))
                for x, y, w in zip(xs, ys, ws)
            ],
            "g string, x double, y double, w double",
        )

    def test_matches_python_reference(self, spark):
        xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        ys = [2.1, 3.9, 6.2, 7.8, 10.1, 11.9]
        ws = [1.0, 2.0, 1.0, 3.0, 1.0, 2.0]
        row = wls_regression(
            self._df(spark, xs, ys, ws), ["g"], "x", "y", "w"
        ).collect()[0]
        b, a, r2 = _wls_py(xs, ys, ws)
        assert row["slope"] == pytest.approx(b, rel=1e-12)
        assert row["intercept"] == pytest.approx(a, rel=1e-12)
        assert row["r2"] == pytest.approx(r2, rel=1e-12)
        assert row["w_total"] == 10.0

    def test_weights_equal_replication(self, spark):
        # weight w == replicating the row w times
        xs, ys, ws = [1.0, 2.0, 3.0], [1.0, 3.0, 2.0], [2.0, 1.0, 3.0]
        rep_x = [1.0, 1.0, 2.0, 3.0, 3.0, 3.0]
        rep_y = [1.0, 1.0, 3.0, 2.0, 2.0, 2.0]
        a = wls_regression(
            self._df(spark, xs, ys, ws), ["g"], "x", "y", "w"
        ).collect()[0]
        b = wls_regression(
            self._df(spark, rep_x, rep_y, [1.0] * 6), ["g"], "x", "y", "w"
        ).collect()[0]
        assert a["slope"] == pytest.approx(b["slope"], rel=1e-12)
        assert a["intercept"] == pytest.approx(b["intercept"], rel=1e-12)

    def test_zero_weight_rows_ignored(self, spark):
        xs, ys = [1.0, 2.0, 3.0, 100.0], [1.0, 2.0, 3.0, -50.0]
        ws = [1.0, 1.0, 1.0, 0.0]
        row = wls_regression(
            self._df(spark, xs, ys, ws), ["g"], "x", "y", "w"
        ).collect()[0]
        assert row["slope"] == pytest.approx(1.0, rel=1e-12)

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="negative weight"):
            wls_regression(
                self._df(spark, [1.0], [1.0], [-1.0]), ["g"], "x", "y",
                "w",
            )
        with pytest.raises(ValueError, match="NULL"):
            wls_regression(
                spark.createDataFrame(
                    [("g", None, 1.0, 1.0)],
                    "g string, x double, y double, w double",
                ),
                ["g"], "x", "y", "w",
            )


def _byar_py(x, t, z=1.96):
    lo = (
        0.0
        if x == 0
        else x * (1 - 1 / (9 * x) - z / (3 * math.sqrt(x))) ** 3 / t
    )
    xp = x + 1
    hi = xp * (1 - 1 / (9 * xp) + z / (3 * math.sqrt(xp))) ** 3 / t
    return lo, hi


class TestPoissonRateCi:
    def _df(self, spark, rows, g="g1"):
        return spark.createDataFrame(
            [(g, int(e), float(t)) for e, t in rows],
            "g string, ev int, t double",
        )

    def test_matches_python_reference(self, spark):
        rows = [(3, 10.0), (2, 5.5), (0, 4.5)]
        r = poisson_rate_ci(
            self._df(spark, rows), ["g"], "ev", "t"
        ).collect()[0]
        x, t = 5, 20.0
        lo, hi = _byar_py(x, t)
        assert r["events"] == 5 and r["exposure"] == 20.0
        assert r["rate"] == pytest.approx(0.25, rel=1e-12)
        assert r["rate_lo"] == pytest.approx(lo, rel=1e-12)
        assert r["rate_hi"] == pytest.approx(hi, rel=1e-12)

    def test_zero_events_pins_lower(self, spark):
        r = poisson_rate_ci(
            self._df(spark, [(0, 10.0)]), ["g"], "ev", "t"
        ).collect()[0]
        assert r["rate_lo"] == 0.0
        assert r["rate"] == 0.0
        assert r["rate_hi"] > 0.0

    def test_interval_narrows_with_exposure(self, spark):
        df = self._df(spark, [(10, 100.0)], "small").union(
            self._df(spark, [(1000, 10000.0)], "large")
        )
        out = {r["g"]: r for r in poisson_rate_ci(
            df, ["g"], "ev", "t"
        ).collect()}
        w_small = out["small"]["rate_hi"] - out["small"]["rate_lo"]
        w_large = out["large"]["rate_hi"] - out["large"]["rate_lo"]
        assert w_large < w_small
        for r in out.values():
            assert r["rate_lo"] < r["rate"] < r["rate_hi"]

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="negative"):
            poisson_rate_ci(
                self._df(spark, [(-1, 1.0)]), ["g"], "ev", "t"
            )
        with pytest.raises(ValueError, match="NULL"):
            poisson_rate_ci(
                spark.createDataFrame(
                    [("g", None, 1.0)], "g string, ev int, t double"
                ),
                ["g"], "ev", "t",
            )
