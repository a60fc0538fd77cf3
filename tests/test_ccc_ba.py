"""Lin's CCC (L315) and Bland-Altman limits (L316)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    bland_altman,
    lins_ccc,
)


def _ccc_py(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum((x - mx) ** 2 for x in xs) / n
    vy = sum((y - my) ** 2 for y in ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    ccc = 2 * cov / (vx + vy + (mx - my) ** 2)
    r = cov / math.sqrt(vx * vy)
    return r, ccc / r, ccc


def _ba_py(xs, ys, z=1.96):
    ds = [x - y for x, y in zip(xs, ys)]
    n = len(ds)
    bias = sum(ds) / n
    var = sum((d - bias) ** 2 for d in ds) / (n - 1)
    sd = math.sqrt(var)
    lo, hi = bias - z * sd, bias + z * sd
    cov = sum(1 for d in ds if lo <= d <= hi) / n
    return bias, sd, lo, hi, cov


def _df(spark, xs, ys, g="g1"):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )


class TestCcc:
    def test_matches_python_reference(self, spark):
        xs = [10, 12.5, 9, 15.25, 11, 8.75, 14, 13.5]
        ys = [11, 12, 9.5, 14.75, 12.25, 9, 13, 14]
        row = lins_ccc(_df(spark, xs, ys), ["g"], "x", "y").collect()[0]
        r, cb, ccc = _ccc_py(xs, ys)
        assert row["pearson"] == pytest.approx(r, rel=1e-9)
        assert row["c_b"] == pytest.approx(cb, rel=1e-9)
        assert row["ccc"] == pytest.approx(ccc, rel=1e-9)

    def test_perfect_agreement_one(self, spark):
        xs = [1, 2, 3, 4, 5]
        row = lins_ccc(_df(spark, xs, xs), ["g"], "x", "y").collect()[0]
        assert row["ccc"] == pytest.approx(1.0, rel=1e-12)

    def test_offset_hurts_ccc_not_pearson(self, spark):
        xs = [1, 2, 3, 4, 5, 6]
        ys = [x + 10 for x in xs]
        row = lins_ccc(_df(spark, xs, ys), ["g"], "x", "y").collect()[0]
        assert row["pearson"] == pytest.approx(1.0, rel=1e-9)
        assert row["ccc"] < 0.1

    def test_degenerate_null(self, spark):
        row = lins_ccc(
            _df(spark, [3, 3, 3], [3, 3, 3]), ["g"], "x", "y"
        ).collect()[0]
        assert row["ccc"] is None


class TestBlandAltman:
    def test_matches_python_reference(self, spark):
        xs = [10, 12.5, 9, 15.25, 11, 8.75, 14, 13.5]
        ys = [11, 12, 9.5, 14.75, 12.25, 9, 13, 14]
        row = bland_altman(_df(spark, xs, ys), ["g"], "x", "y").collect()[0]
        bias, sd, lo, hi, cov = _ba_py(xs, ys)
        assert row["bias"] == pytest.approx(bias, rel=1e-9)
        assert row["sd_diff"] == pytest.approx(sd, rel=1e-9)
        assert row["loa_lo"] == pytest.approx(lo, rel=1e-9)
        assert row["loa_hi"] == pytest.approx(hi, rel=1e-9)
        assert row["coverage"] == pytest.approx(cov, rel=1e-12)

    def test_constant_offset(self, spark):
        xs = [1, 2, 3, 4.5]
        ys = [x - 2 for x in xs]
        row = bland_altman(_df(spark, xs, ys), ["g"], "x", "y").collect()[0]
        assert row["bias"] == pytest.approx(2.0)
        assert row["sd_diff"] is None  # zero spread -> NULL limits

    def test_outlier_outside_limits(self, spark):
        xs = [10.0] * 30 + [50.0]
        ys = [10.0 + 0.1 * ((i * 7) % 5 - 2) for i in range(30)] + [10.0]
        row = bland_altman(_df(spark, xs, ys), ["g"], "x", "y").collect()[0]
        assert row["coverage"] < 1.0
