"""Seasonal strength (L285) and pinball/quantile loss (L286)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.calibration import quantile_loss
from lmss_entity_extractor_spark.ops.seasonal import (
    seasonal_decompose,
    seasonal_strength,
)


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestSeasonalStrength:
    def test_strong_seasonal_series(self, spark):
        # clean period-4 pattern + mild trend
        xs = [10 * (i % 4) + 0.1 * i for i in range(40)]
        row = seasonal_strength(
            _df(spark, xs), ["g"], "t", "x", period=4
        ).collect()[0]
        assert row["seasonal_strength"] > 0.95
        assert row["trend_strength"] > 0.95  # remainder ~ 0

    def test_pure_noiseless_trend(self, spark):
        xs = [2.0 * i for i in range(30)]
        row = seasonal_strength(
            _df(spark, xs), ["g"], "t", "x", period=5
        ).collect()[0]
        assert row["trend_strength"] > 0.999

    def test_matches_definition(self, spark):
        xs = [5 * (i % 3) + 0.5 * i + (1 if i % 7 == 0 else 0)
              for i in range(30)]
        d = seasonal_decompose(
            _df(spark, xs), ["g"], "t", "x", period=3
        ).collect()
        rows = [r for r in d if r["trend"] is not None]
        rows.sort(key=lambda r: r["t"])
        rs = [r["remainder"] for r in rows]
        trs = [r["trend"] + r["remainder"] for r in rows]
        srs = [r["seasonal"] + r["remainder"] for r in rows]

        def ss(v):
            m = sum(v) / len(v)
            return sum((x - m) ** 2 for x in v)

        ft = max(0.0, 1.0 - ss(rs) / ss(trs))
        fs = max(0.0, 1.0 - ss(rs) / ss(srs))
        row = seasonal_strength(
            _df(spark, xs), ["g"], "t", "x", period=3
        ).collect()[0]
        assert row["n_used"] == len(rows)
        assert row["trend_strength"] == pytest.approx(ft, rel=1e-9)
        assert row["seasonal_strength"] == pytest.approx(fs, rel=1e-9)


def _pinball_py(ys, qs, tau):
    terms = [
        max(tau * (y - q), (tau - 1) * (y - q)) for y, q in zip(ys, qs)
    ]
    cov = sum(1 for y, q in zip(ys, qs) if y <= q) / len(ys)
    return sum(terms) / len(terms), cov


class TestQuantileLoss:
    def _df(self, spark, ys, qs, g="g1"):
        return spark.createDataFrame(
            [(g, float(y), float(q)) for y, q in zip(ys, qs)],
            "g string, y double, q double",
        )

    def test_matches_python_reference(self, spark):
        ys = [10.0, 12.5, 9.0, 15.25, 11.0, 8.75]
        qs = [11.0, 11.0, 10.5, 14.0, 12.25, 9.0]
        row = quantile_loss(
            self._df(spark, ys, qs), ["g"], "y", "q", q_pct=90
        ).collect()[0]
        loss, cov = _pinball_py(ys, qs, 0.9)
        assert row["pinball"] == pytest.approx(loss, rel=1e-12)
        assert row["coverage"] == pytest.approx(cov, rel=1e-12)
        assert row["q_pct"] == 90

    def test_perfect_prediction_zero_loss(self, spark):
        ys = [1.0, 2.0, 3.0]
        row = quantile_loss(
            self._df(spark, ys, ys), ["g"], "y", "q", q_pct=50
        ).collect()[0]
        assert row["pinball"] == 0.0
        assert row["coverage"] == 1.0

    def test_asymmetry(self, spark):
        # under-prediction hurts more at high tau
        ys, qs = [10.0], [5.0]
        hi = quantile_loss(
            self._df(spark, ys, qs), ["g"], "y", "q", q_pct=90
        ).collect()[0]["pinball"]
        lo = quantile_loss(
            self._df(spark, ys, qs), ["g"], "y", "q", q_pct=10
        ).collect()[0]["pinball"]
        assert hi == pytest.approx(4.5) and lo == pytest.approx(0.5)

    def test_bad_q_refused(self, spark):
        with pytest.raises(ValueError, match="q_pct"):
            quantile_loss(
                self._df(spark, [1.0], [1.0]), ["g"], "y", "q", q_pct=0
            )
