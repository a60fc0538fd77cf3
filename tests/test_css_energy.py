"""CUSUM-of-squares (L299) and energy distance (L300)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.changepoint import cusum_squares
from lmss_entity_extractor_spark.ops.rankeval import energy_distance


def _css_py(xs, scale=2):
    qs = [round(x * 10**scale) for x in xs]
    n = len(qs)
    cn = sum(q * q for q in qs)
    best = None
    ck = 0
    for k, q in enumerate(qs, 1):
        ck += q * q
        d = abs(ck / cn - k / n)
        if best is None or d > best[1] + 0 or (d == best[1] and k < best[0]):
            if best is None or d > best[1]:
                best = (k, d)
    return best[0], best[1], math.sqrt(n / 2.0) * best[1]


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestCusumSquares:
    def test_matches_python_reference(self, spark):
        xs = [1, -1.5, 2, -0.5, 1.25, -2, 8, -7, 9.5, -6, 7, -8.25]
        row = cusum_squares(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        k, d, stat = _css_py(xs)
        assert row["k_star"] == k
        assert row["d_max"] == pytest.approx(d, rel=1e-12)
        assert row["stat"] == pytest.approx(stat, rel=1e-12)

    def test_variance_break_located(self, spark):
        # quiet first half, loud second half: k* near the midpoint
        xs = [0.5 * (1 if i % 2 else -1) for i in range(20)] + [
            10 * (1 if i % 2 else -1) for i in range(20)
        ]
        row = cusum_squares(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert 18 <= row["k_star"] <= 21
        assert row["stat"] > 1.358  # ICSS 5% critical value

    def test_homogeneous_small_stat(self, spark):
        xs = [(1 if i % 2 else -1) * (1 + 0.01 * (i % 3))
              for i in range(40)]
        row = cusum_squares(_df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["stat"] < 1.0

    def test_null_refused(self, spark):
        df = _df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            cusum_squares(df, ["g"], ["t"], "x")


def _energy_py(a, b):
    na, nb = len(a), len(b)
    sxy = sum(abs(x - y) for x in a for y in b)
    sxx = sum(abs(x - y) for x in a for y in a)
    syy = sum(abs(x - y) for x in b for y in b)
    e = 2 * sxy / (na * nb) - sxx / na**2 - syy / nb**2
    return e, na * nb / (na + nb) * e


def _df2(spark, a, b, g="g1"):
    rows = [(g, "A", float(x)) for x in a] + [
        (g, "B", float(x)) for x in b
    ]
    return spark.createDataFrame(rows, "g string, s string, x double")


class TestEnergyDistance:
    def test_matches_python_reference(self, spark):
        a = [1.0, 2.5, 2.0, 4.25, 3.0]
        b = [2.0, 3.5, 5.0, 4.0, 6.25, 5.5]
        row = energy_distance(
            _df2(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        e, t = _energy_py(a, b)
        assert row["n_a"] == 5 and row["n_b"] == 6
        assert row["e_dist"] == pytest.approx(e, rel=1e-9)
        assert row["t_stat"] == pytest.approx(t, rel=1e-9)

    def test_identical_samples_zero(self, spark):
        a = [1.0, 2.0, 3.0, 4.0]
        row = energy_distance(
            _df2(spark, a, a), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["e_dist"] == pytest.approx(0.0, abs=1e-12)

    def test_shape_difference_detected(self, spark):
        # same mean and similar variance, different shape
        a = [-3, -3, -3, 3, 3, 3]
        b = [-4.2, -1, 0, 0, 1, 4.2]
        row = energy_distance(
            _df2(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["e_dist"] > 0.1

    def test_empty_side_null(self, spark):
        df = _df2(spark, [1.0, 2.0], []).filter("s = 'A'")
        row = energy_distance(
            df, ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert row["e_dist"] is None

    def test_max_len_refused(self, spark):
        a = [float(i) for i in range(30)]
        with pytest.raises(ValueError, match="max_len"):
            energy_distance(
                _df2(spark, a, a), ["g"], "s", "A", "B", "x", max_len=10
            )
