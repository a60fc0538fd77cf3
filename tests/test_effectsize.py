"""Wilson intervals (L185) + Cohen's d / Hedges' g (L186)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import (
    Z95,
    cohens_d,
    wilson_interval,
)


def _wilson_py(k, n, z=float(Z95)):
    p = k / n
    z2n = z * z / n
    denom = 1 + z2n
    center = (p + z2n / 2) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2n / (4 * n)) / denom
    return max(center - half, 0.0), min(center + half, 1.0)


class TestWilson:
    def test_matches_python(self, spark):
        rows = [("g", 1)] * 30 + [("g", 0)] * 70
        df = spark.createDataFrame(rows, "g string, s int")
        r = wilson_interval(df, ["g"], "s").collect()[0]
        lo, hi = _wilson_py(30, 100)
        assert (r["n"], r["k"]) == (100, 30)
        assert r["p"] == pytest.approx(0.3, abs=0)
        assert r["lo"] == pytest.approx(lo, rel=1e-15)
        assert r["hi"] == pytest.approx(hi, rel=1e-15)

    def test_extreme_p_stays_in_bounds(self, spark):
        rows = [("g", 1)] * 5  # p = 1 with tiny n
        df = spark.createDataFrame(rows, "g string, s int")
        r = wilson_interval(df, ["g"], "s").collect()[0]
        assert r["hi"] == 1.0 and 0.5 < r["lo"] < 1.0  # not a Wald [1, 1]

    def test_interval_narrows_with_n(self, spark):
        small = [("a", i % 2) for i in range(20)]
        big = [("b", i % 2) for i in range(2000)]
        df = spark.createDataFrame(small + big, "g string, s int")
        out = {r["g"]: r["hi"] - r["lo"] for r in
               wilson_interval(df, ["g"], "s").collect()}
        assert out["b"] < out["a"] / 3


def _d_py(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    ssa = sum((v - ma) ** 2 for v in xs)
    ssb = sum((v - mb) ** 2 for v in ys)
    s = math.sqrt((ssa + ssb) / (na + nb - 2))
    d = (ma - mb) / s
    return d, d * (1 - 3 / (4 * (na + nb) - 9))


class TestCohensD:
    def test_matches_python(self, spark):
        xs = [10.0, 12.0, 9.5, 11.25, 13.0]
        ys = [14.0, 15.5, 13.25, 16.0]
        rows = [("g", "a", v) for v in xs] + [("g", "b", v) for v in ys]
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        r = cohens_d(df, ["g"], "variant", "a", "b", "y").collect()[0]
        d, g = _d_py(xs, ys)
        assert r["d"] == pytest.approx(d, rel=1e-12)
        assert r["hedges_g"] == pytest.approx(g, rel=1e-12)
        assert abs(r["hedges_g"]) < abs(r["d"])  # correction shrinks

    def test_zero_variance_null(self, spark):
        rows = [("g", "a", 5.0)] * 3 + [("g", "b", 5.0)] * 3
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        r = cohens_d(df, ["g"], "variant", "a", "b", "y").collect()[0]
        assert r["d"] is None

    def test_missing_arm_null(self, spark):
        rows = [("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0)]
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        r = cohens_d(df, ["g"], "variant", "a", "b", "y").collect()[0]
        assert r["d"] is None and r["mean_b"] is None
