"""Jarque-Bera normality test (L266) and inequality panel (L267)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import inequality_indices
from lmss_entity_extractor_spark.ops.stattests import jarque_bera


def _jb_py(xs, scale=2):
    qs = [round(x * 10**scale) for x in xs]
    n = len(qs)
    nd = float(n)
    s1, s2 = sum(qs), sum(q * q for q in qs)
    s3, s4 = sum(q**3 for q in qs), sum(q**4 for q in qs)
    mq, r2, r3, r4 = s1 / nd, s2 / nd, s3 / nd, s4 / nd
    m2 = r2 - mq * mq
    m3 = r3 - 3.0 * mq * r2 + 2.0 * mq * mq * mq
    m4 = r4 - 4.0 * mq * r3 + 6.0 * mq * mq * r2 - 3.0 * mq**4
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    return skew, kurt, nd / 6.0 * (skew * skew + kurt * kurt / 4.0)


class TestJarqueBera:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1.25, 2.5, 2.5, 3.0, 7.75, 0.5, 4.0, 3.25, 2.0, 9.5]
        out = jarque_bera(self._df(spark, xs), ["g"], "x").collect()[0]
        skew, kurt, jb = _jb_py(xs)
        assert out["n"] == len(xs)
        assert out["mean"] == pytest.approx(sum(xs) / len(xs), rel=1e-12)
        assert out["skew"] == pytest.approx(skew, rel=1e-12)
        assert out["ex_kurt"] == pytest.approx(kurt, rel=1e-12)
        assert out["jb"] == pytest.approx(jb, rel=1e-12)

    def test_symmetric_zero_skew(self, spark):
        xs = [1, 2, 3, 4, 5, 6, 7]
        out = jarque_bera(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["skew"] == pytest.approx(0.0, abs=1e-12)

    def test_right_skewed_positive(self, spark):
        xs = [1, 1, 1, 1, 2, 2, 3, 50]
        out = jarque_bera(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["skew"] > 1.0
        assert out["jb"] > 5.991  # chi2(2) 5% critical value

    def test_constant_group_null(self, spark):
        out = jarque_bera(self._df(spark, [3.0] * 5), ["g"], "x").collect()[0]
        assert out["skew"] is None
        assert out["ex_kurt"] is None
        assert out["jb"] is None

    def test_scale_invariance(self, spark):
        xs = [1.0, 2.0, 2.0, 5.0, 9.0]
        a = jarque_bera(self._df(spark, xs), ["g"], "x").collect()[0]
        b = jarque_bera(
            self._df(spark, [10 * x for x in xs]), ["g"], "x"
        ).collect()[0]
        assert a["jb"] == pytest.approx(b["jb"], rel=1e-9)


def _ineq_py(xs):
    n = len(xs)
    mu = sum(xs) / n
    t_t = sum((x / mu) * math.log(x / mu) for x in xs) / n
    t_l = sum(math.log(mu / x) for x in xs) / n
    atk = 1.0 - math.exp(sum(math.log(x) for x in xs) / n) / mu
    return t_t, t_l, atk


class TestInequality:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1.0, 2.0, 2.0, 3.5, 10.0, 0.25]
        out = inequality_indices(self._df(spark, xs), ["g"], "x").collect()[0]
        t_t, t_l, atk = _ineq_py(xs)
        assert out["n"] == 6 and out["k"] == 5
        assert out["theil_t"] == pytest.approx(t_t, rel=1e-9)
        assert out["theil_l"] == pytest.approx(t_l, rel=1e-9)
        assert out["atkinson"] == pytest.approx(atk, rel=1e-9)

    def test_equal_distribution_zero(self, spark):
        out = inequality_indices(
            self._df(spark, [5.0] * 8), ["g"], "x"
        ).collect()[0]
        assert out["theil_t"] == 0.0
        assert out["theil_l"] == 0.0
        assert out["atkinson"] == pytest.approx(0.0, abs=1e-15)

    def test_theil_ordering_under_concentration(self, spark):
        even = inequality_indices(
            self._df(spark, [10.0, 10.0, 10.0, 10.0]), ["g"], "x"
        ).collect()[0]["theil_t"]
        skew = inequality_indices(
            self._df(spark, [1.0, 1.0, 1.0, 37.0]), ["g"], "x"
        ).collect()[0]["theil_t"]
        assert skew > even + 0.5

    def test_nonpositive_refused(self, spark):
        with pytest.raises(ValueError, match="nonpositive"):
            inequality_indices(self._df(spark, [1.0, 0.0]), ["g"], "x")
