"""Mann-Kendall trend test (L161) + Theil-Sen slope (L162)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.trend import mann_kendall, theil_sen


def _mk_py(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    var_s = var18 / 18.0
    if var18 <= 0:
        return s, var_s, None
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    return s, var_s, z


def _ts_py(xs):
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    k = len(slopes)
    if k % 2 == 1:
        return slopes[k // 2]
    return (slopes[k // 2 - 1] + slopes[k // 2]) / 2.0


def _series(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(v)) for i, v in enumerate(xs)],
        "g string, t int, v double",
    )


class TestMannKendall:
    def test_matches_python(self, spark):
        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 7.0]
        row = mann_kendall(_series(spark, xs), ["g"], "t", "v").collect()[0]
        s, var_s, z = _mk_py(xs)
        assert row["n"] == 11 and row["s"] == s
        assert row["var_s"] == pytest.approx(var_s, abs=0)
        assert row["z"] == pytest.approx(z, rel=1e-15)

    def test_monotone_up_is_max_s(self, spark):
        xs = [float(i) for i in range(8)]
        row = mann_kendall(_series(spark, xs), ["g"], "t", "v").collect()[0]
        assert row["s"] == 8 * 7 // 2
        assert row["z"] > 2.5

    def test_all_tied_null_z(self, spark):
        xs = [5.0] * 6
        row = mann_kendall(_series(spark, xs), ["g"], "t", "v").collect()[0]
        assert row["s"] == 0 and row["z"] is None

    def test_max_len_guard(self, spark):
        xs = [float(i) for i in range(30)]
        with pytest.raises(ValueError, match="max_len"):
            mann_kendall(_series(spark, xs), ["g"], "t", "v", max_len=10).collect()


class TestTheilSen:
    def test_matches_python_even_and_odd(self, spark):
        for xs in (
            [1.0, 3.0, 2.0, 5.0, 4.0],           # C(5,2)=10 even
            [1.0, 3.0, 2.0, 5.0, 4.0, 8.0],      # C(6,2)=15 odd
        ):
            row = theil_sen(_series(spark, xs), ["g"], "t", "v").collect()[0]
            assert row["slope"] == pytest.approx(_ts_py(xs), abs=0)

    def test_outlier_robust(self, spark):
        xs = [float(i) for i in range(10)]
        xs[5] = 1000.0  # one wild outlier
        row = theil_sen(_series(spark, xs), ["g"], "t", "v").collect()[0]
        assert row["slope"] == pytest.approx(1.0, abs=0.01)

    def test_exact_line(self, spark):
        xs = [2.0 + 3.0 * i for i in range(7)]
        row = theil_sen(_series(spark, xs), ["g"], "t", "v").collect()[0]
        assert row["slope"] == 3.0
