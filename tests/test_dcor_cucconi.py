"""Distance correlation (L301) and Cucconi test (L302)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.correlation import (
    distance_correlation,
)
from lmss_entity_extractor_spark.ops.rankeval import cucconi_test


def _dcor_py(xs, ys):
    n = len(xs)
    a = [[abs(xs[i] - xs[j]) for j in range(n)] for i in range(n)]
    b = [[abs(ys[i] - ys[j]) for j in range(n)] for i in range(n)]

    def stats(m):
        rm = [sum(row) / n for row in m]
        gm = sum(rm) / n
        return rm, gm

    ra, ga = stats(a)
    rb, gb = stats(b)
    dcov = dvx = dvy = 0.0
    for i in range(n):
        for j in range(n):
            ca = a[i][j] - ra[i] - ra[j] + ga
            cb = b[i][j] - rb[i] - rb[j] + gb
            dcov += ca * cb
            dvx += ca * ca
            dvy += cb * cb
    dcov, dvx, dvy = dcov / n**2, dvx / n**2, dvy / n**2
    return dcov, dvx, dvy, math.sqrt(
        max(0.0, dcov) / math.sqrt(dvx * dvy)
    )


def _df2(spark, xs, ys, g="g1"):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )


class TestDistanceCorrelation:
    def test_matches_python_reference(self, spark):
        xs = [1, 2.5, 2, 4.25, 3, 5.5, 0.5, 4]
        ys = [2, 3.25, 1.5, 5, 4.25, 5.75, 1, 3.5]
        row = distance_correlation(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        dcov, dvx, dvy, dcor = _dcor_py(xs, ys)
        assert row["dcov2"] == pytest.approx(dcov, rel=1e-9)
        assert row["dvar_x"] == pytest.approx(dvx, rel=1e-9)
        assert row["dvar_y"] == pytest.approx(dvy, rel=1e-9)
        assert row["dcor"] == pytest.approx(dcor, rel=1e-9)

    def test_nonlinear_dependence_detected(self, spark):
        # y = x^2: Pearson near 0 on symmetric x, dCor clearly > 0
        xs = [-3, -2, -1, 0, 1, 2, 3, -2.5, 2.5, -1.5, 1.5, 0.5]
        ys = [x * x for x in xs]
        row = distance_correlation(
            _df2(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]
        assert row["dcor"] > 0.4

    def test_perfect_linear_dcor_one(self, spark):
        xs = [1, 2, 3, 4, 5, 6]
        row = distance_correlation(
            _df2(spark, xs, [2 * x for x in xs]), ["g"], "x", "y"
        ).collect()[0]
        assert row["dcor"] == pytest.approx(1.0, rel=1e-9)

    def test_constant_margin_null(self, spark):
        row = distance_correlation(
            _df2(spark, [1, 2, 3], [5, 5, 5]), ["g"], "x", "y"
        ).collect()[0]
        assert row["dcor"] is None

    def test_max_len_refused(self, spark):
        xs = list(range(20))
        with pytest.raises(ValueError, match="max_len"):
            distance_correlation(
                _df2(spark, xs, xs), ["g"], "x", "y", max_len=10
            )


def _midranks_pool(a, b):
    pooled = sorted(a + b)
    out, i = {}, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        out[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def _cucconi_py(a, b):
    r = _midranks_pool(a, b)
    na, nb = len(a), len(b)
    n = na + nb
    sr2 = sum(r[x] ** 2 for x in a)
    sc2 = sum((n + 1 - r[x]) ** 2 for x in a)
    den = math.sqrt(na * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * sr2 - na * (n + 1) * (2 * n + 1)) / den
    v = (6 * sc2 - na * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1.0
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    return u, v, c


def _dfg(spark, a, b, g="g1"):
    rows = [(g, "A", float(x)) for x in a] + [
        (g, "B", float(x)) for x in b
    ]
    return spark.createDataFrame(rows, "g string, s string, x double")


class TestCucconi:
    def test_matches_python_reference(self, spark):
        a = [1, 2, 2, 3, 5, 8, 8]
        b = [2, 3, 3, 4, 6, 7, 9, 9]
        row = cucconi_test(
            _dfg(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        u, v, c = _cucconi_py(a, b)
        assert row["u"] == pytest.approx(u, rel=1e-9)
        assert row["v"] == pytest.approx(v, rel=1e-9)
        assert row["c"] == pytest.approx(c, rel=1e-9)

    def test_location_shift_detected(self, spark):
        a = list(range(1, 13))
        b = [x + 10 for x in a]
        row = cucconi_test(
            _dfg(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["c"] > 3.0

    def test_scale_shift_detected(self, spark):
        a = [10 + d for d in (-1, -0.5, 0, 0.5, 1, -0.75, 0.75, 0.25)]
        b = [10 + d for d in (-9, -6, -3, 3, 6, 9, -7.5, 7.5)]
        row = cucconi_test(
            _dfg(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["c"] > 3.0

    def test_identical_small_c(self, spark):
        a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        row = cucconi_test(
            _dfg(spark, a, a), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["c"] < 0.5
