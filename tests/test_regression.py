"""Grouped OLS regression (L135)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.regression import grouped_linreg


def _fit(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_linreg(df, ["g"], "x", "y", **kw)
    return {r["g"]: r for r in out.collect()}


class TestFit:
    def test_exact_line(self, spark):
        # y = 3x + 2, perfectly: slope 3, intercept 2, r2 1
        rows = [("a", float(i), 3.0 * i + 2.0) for i in range(1, 6)]
        got = _fit(spark, rows)["a"]
        assert got["n"] == 5
        assert got["slope"] == pytest.approx(3.0, abs=1e-12)
        assert got["intercept"] == pytest.approx(2.0, abs=1e-12)
        assert got["r2"] == pytest.approx(1.0, abs=1e-12)

    def test_matches_numpy_reference(self, spark):
        rows = [
            ("g", float(i % 7), float((i * 13) % 29) + 0.25 * (i % 4))
            for i in range(40)
        ]
        got = _fit(spark, rows)["g"]
        xs = [r[1] for r in rows]
        ys = [r[2] for r in rows]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        syy = sum(v * v for v in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert got["slope"] == pytest.approx(slope, rel=1e-12)
        assert got["intercept"] == pytest.approx(intercept, rel=1e-12)
        assert got["r2"] == pytest.approx(r2, rel=1e-12)
        assert 0.0 <= got["r2"] <= 1.0

    def test_groups_fit_independently(self, spark):
        rows = [("up", float(i), 2.0 * i) for i in range(4)] + [
            ("down", float(i), -5.0 * i + 1.0) for i in range(4)
        ]
        got = _fit(spark, rows)
        assert got["up"]["slope"] == pytest.approx(2.0)
        assert got["down"]["slope"] == pytest.approx(-5.0)


class TestDegenerate:
    def test_zero_x_variance_is_null(self, spark):
        got = _fit(spark, [("a", 1.0, 1.0), ("a", 1.0, 2.0)])["a"]
        assert got["slope"] is None and got["intercept"] is None and got["r2"] is None

    def test_single_point_is_null(self, spark):
        got = _fit(spark, [("a", 1.0, 1.0)])["a"]
        assert got["n"] == 1 and got["slope"] is None

    def test_zero_y_variance_r2_null_slope_zero(self, spark):
        got = _fit(spark, [("a", 1.0, 7.0), ("a", 2.0, 7.0), ("a", 3.0, 7.0)])["a"]
        assert got["slope"] == 0.0 and got["intercept"] == 7.0
        assert got["r2"] is None

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("a", 2.0, None), ("a", None, 9.0), ("a", 3.0, 6.0)],
            "g string, x double, y double",
        )
        got = {r["g"]: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
        assert got["a"]["n"] == 2
        assert got["a"]["slope"] == pytest.approx(2.0)


class TestDeterminism:
    def test_parallelism_invariance_bitwise(self, spark):
        # messy values at scale=2; decimal sums make the fit partition-
        # order-independent BIT FOR BIT, not just approximately
        rows = [
            ("g%d" % (i % 3), i % 11 + 0.25 * (i % 2) * 2, (i * 7) % 13 + 0.5)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        a = sorted(
            (r["g"], r["slope"], r["intercept"], r["r2"])
            for r in grouped_linreg(df, ["g"], "x", "y").collect()
        )
        b = sorted(
            (r["g"], r["slope"], r["intercept"], r["r2"])
            for r in grouped_linreg(df.repartition(17), ["g"], "x", "y").collect()
        )
        for ra, rb in zip(a, b):
            for va, vb in zip(ra[1:], rb[1:]):
                assert math.copysign(1, va) == math.copysign(1, vb)
                assert va == vb  # exact equality, not approx
