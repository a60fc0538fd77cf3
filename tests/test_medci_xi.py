"""Median CI (L331) and Chatterjee's xi (L332)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.rankeval import (
    chatterjee_xi,
    median_ci,
)


def _medci_py(xs, z=1.96):
    xs = sorted(xs)
    n = len(xs)
    lo = max(1, math.floor((n - z * math.sqrt(n)) / 2))
    hi = min(n, math.ceil(1 + (n + z * math.sqrt(n)) / 2))
    if n % 2 == 1:
        med = xs[(n // 2 + 1) - 1]
    else:
        med = (xs[(n + 1) // 2 - 1] + xs[n // 2]) / 2
    return med, xs[lo - 1], xs[hi - 1], lo, hi


def _df1(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(x)) for x in xs], "g string, x double"
    )


class TestMedianCi:
    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1.5, 5, 9, 2, 6, 5.5, 3.5, 8, 7, 2.5, 4.5,
              6.5, 0.5, 9.5, 1.25, 7.5, 8.5]
        row = median_ci(_df1(spark, xs), ["g"], "x").collect()[0]
        med, lo, hi, lr, hr = _medci_py(xs)
        assert row["median"] == pytest.approx(med)
        assert row["ci_lo"] == pytest.approx(lo)
        assert row["ci_hi"] == pytest.approx(hi)
        assert row["lo_rank"] == lr and row["hi_rank"] == hr

    def test_interval_contains_median(self, spark):
        xs = [float(i) for i in range(1, 50)]
        row = median_ci(_df1(spark, xs), ["g"], "x").collect()[0]
        assert row["ci_lo"] <= row["median"] <= row["ci_hi"]
        assert row["ci_hi"] - row["ci_lo"] < 20

    def test_bad_z_refused(self, spark):
        with pytest.raises(ValueError, match="z must"):
            median_ci(_df1(spark, [1.0]), ["g"], "x", z=0.0)


def _xi_py(pairs):
    pairs = sorted(pairs, key=lambda p: (p[0], p[1]))
    ys = [y for _, y in pairs]
    n = len(ys)
    r = [sum(1 for yj in ys if yj <= yi) for yi in ys]
    l = [sum(1 for yj in ys if yj >= yi) for yi in ys]
    num = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = 2 * sum(li * (n - li) for li in l)
    return 1 - n * num / den


def _df2(spark, pairs, g="g1"):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for x, y in pairs],
        "g string, x double, y double",
    )


class TestChatterjeeXi:
    def test_matches_python_reference(self, spark):
        pairs = [(1, 3), (2, 1), (3, 4), (4, 1.5), (5, 5), (6, 9),
                 (7, 2), (8, 6), (9, 5.5), (10, 3.5)]
        row = chatterjee_xi(_df2(spark, pairs), ["g"], "x", "y").collect()[0]
        assert row["xi"] == pytest.approx(_xi_py(pairs), rel=1e-12)

    def test_functional_dependence_high(self, spark):
        # y = (x-10)^2: non-monotone function; Pearson/Spearman ~ 0
        pairs = [(x, (x - 10) ** 2) for x in range(20)]
        row = chatterjee_xi(_df2(spark, pairs), ["g"], "x", "y").collect()[0]
        assert row["xi"] > 0.6

    def test_shuffled_independence_low(self, spark):
        ys = [7, 2, 9, 4, 1, 8, 3, 6, 0, 5, 2.5, 7.5, 4.5, 1.5,
              8.5, 3.5, 6.5, 0.5, 5.5, 9.5]
        pairs = list(zip(range(20), ys))
        row = chatterjee_xi(_df2(spark, pairs), ["g"], "x", "y").collect()[0]
        assert abs(row["xi"]) < 0.45

    def test_constant_y_null(self, spark):
        pairs = [(x, 5.0) for x in range(10)]
        row = chatterjee_xi(_df2(spark, pairs), ["g"], "x", "y").collect()[0]
        assert row["xi"] is None

    def test_ties_match_reference(self, spark):
        pairs = [(1, 2), (2, 2), (3, 5), (4, 5), (5, 1), (6, 2),
                 (7, 5), (8, 1)]
        row = chatterjee_xi(_df2(spark, pairs), ["g"], "x", "y").collect()[0]
        assert row["xi"] == pytest.approx(_xi_py(pairs), rel=1e-12)
