"""Deming regression (L317) and difference-in-differences (L318)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.regression import (
    deming_regression,
    did_estimator,
)


def _deming_py(xs, ys, lam=1.0):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum((x - mx) ** 2 for x in xs) / n
    vy = sum((y - my) ** 2 for y in ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    disc = (vy - lam * vx) ** 2 + 4 * lam * cov * cov
    b = (vy - lam * vx + math.sqrt(disc)) / (2 * cov)
    return b, my - b * mx


def _df2(spark, xs, ys, g="g1"):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )


class TestDeming:
    def test_matches_python_reference(self, spark):
        xs = [1, 2.5, 2, 4.25, 3, 5.5, 0.5, 4]
        ys = [2.1, 5.2, 4.4, 8.3, 6.6, 10.9, 1.4, 8.2]
        row = deming_regression(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        b, a = _deming_py(xs, ys)
        assert row["slope"] == pytest.approx(b, rel=1e-9)
        assert row["intercept"] == pytest.approx(a, rel=1e-9)

    def test_symmetric_in_axes(self, spark):
        # orthogonal regression: slope(y~x) * slope(x~y) == 1
        xs = [1, 2.5, 2, 4.25, 3, 5.5, 0.5, 4]
        ys = [2.1, 5.2, 4.4, 8.3, 6.6, 10.9, 1.4, 8.2]
        b_xy = deming_regression(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]["slope"]
        b_yx = deming_regression(
            _df2(spark, ys, xs), ["g"], "x", "y"
        ).collect()[0]["slope"]
        assert b_xy * b_yx == pytest.approx(1.0, rel=1e-9)

    def test_steeper_than_ols_under_noise(self, spark):
        # noisy x attenuates OLS; Deming recovers a steeper slope
        xs = [1, 2, 3, 4, 5, 6, 7, 8, 1.8, 3.4, 5.2, 6.6]
        ys = [2.2, 3.8, 6.4, 7.6, 10.4, 11.6, 14.4, 15.6, 4.2, 6.6,
              10.8, 13.0]
        b, _ = _deming_py(xs, ys)
        row = deming_regression(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        assert row["slope"] == pytest.approx(b, rel=1e-9)

    def test_zero_cov_null(self, spark):
        xs = [1, 1, 2, 2]
        ys = [3, 5, 3, 5]
        row = deming_regression(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        assert row["slope"] is None


def _did_py(rows):
    cells = {}
    for g, p, v in rows:
        cells.setdefault((g, p), []).append(v)
    m = {k: sum(v) / len(v) for k, v in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    sev = 0.0
    for k, vs in cells.items():
        n = len(vs)
        mu = m[k]
        var = sum((v - mu) ** 2 for v in vs) / (n - 1)
        sev += var / n
    return did, math.sqrt(sev), did / math.sqrt(sev)


def _dfd(spark, rows, g="g1"):
    return spark.createDataFrame(
        [(g, int(t), int(p), float(v)) for t, p, v in rows],
        "g string, tr int, po int, v double",
    )


class TestDid:
    ROWS = (
        [(0, 0, v) for v in (10, 11, 9.5, 10.5, 10.25)]
        + [(0, 1, v) for v in (12, 13, 11.5, 12.5, 12.25)]
        + [(1, 0, v) for v in (10.5, 11.5, 10, 11, 10.75)]
        + [(1, 1, v) for v in (16, 17, 15.5, 16.5, 16.25)]
    )

    def test_matches_python_reference(self, spark):
        row = did_estimator(
            _dfd(spark, self.ROWS), ["g"], "tr", "po", "v"
        ).collect()[0]
        did, se, t = _did_py(self.ROWS)
        assert row["did"] == pytest.approx(did, rel=1e-9)
        assert row["se"] == pytest.approx(se, rel=1e-9)
        assert row["t"] == pytest.approx(t, rel=1e-9)

    def test_parallel_trends_zero(self, spark):
        rows = (
            [(0, 0, 10.0), (0, 0, 11.0), (0, 1, 12.0), (0, 1, 13.0)]
            + [(1, 0, 20.0), (1, 0, 21.0), (1, 1, 22.0), (1, 1, 23.0)]
        )
        row = did_estimator(
            _dfd(spark, rows), ["g"], "tr", "po", "v"
        ).collect()[0]
        assert row["did"] == pytest.approx(0.0, abs=1e-12)

    def test_missing_cell_null(self, spark):
        rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)]
        row = did_estimator(
            _dfd(spark, rows), ["g"], "tr", "po", "v"
        ).collect()[0]
        assert row["did"] is None and row["m11"] is None
