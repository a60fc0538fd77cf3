"""Cramer-von Mises 2-sample (L264) and Hoover index (L265)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import hoover_index
from lmss_entity_extractor_spark.ops.rankeval import cramer_von_mises_2samp


def _cvm_py(a, b):
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    n = na + nb
    s = 0.0
    cum_a = cum_b = 0
    for v in sorted(set(a) | set(b)):
        cum_a += ca[v]
        cum_b += cb[v]
        l = ca[v] + cb[v]
        s += l * (cum_a * nb - cum_b * na) ** 2
    return s / (n * n * na * nb)


class TestCvm:
    def _df(self, spark, a, b, g="g1"):
        rows = [(g, "A", float(v)) for v in a] + [(g, "B", float(v)) for v in b]
        return spark.createDataFrame(rows, "g string, s string, x double")

    def test_matches_python_reference(self, spark):
        a = [1, 2, 2, 3, 5, 8]
        b = [2, 3, 3, 4, 6, 7, 9]
        out = cramer_von_mises_2samp(
            self._df(spark, a, b), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["t"] == pytest.approx(_cvm_py(a, b), rel=1e-12)

    def test_identical_samples_small(self, spark):
        a = [1.0, 2.0, 3.0, 4.0]
        out = cramer_von_mises_2samp(
            self._df(spark, a, a), ["g"], "s", "A", "B", "x"
        ).collect()[0]
        assert out["t"] == 0.0

    def test_shifted_larger_than_similar(self, spark):
        a = [float(i) for i in range(20)]
        sim = cramer_von_mises_2samp(
            self._df(spark, a, [x + 0.5 for x in a]), ["g"], "s", "A", "B", "x"
        ).collect()[0]["t"]
        far = cramer_von_mises_2samp(
            self._df(spark, a, [x + 100 for x in a]), ["g"], "s", "A", "B", "x"
        ).collect()[0]["t"]
        assert far > 10 * sim


def _hoover_py(xs):
    n = len(xs)
    s = sum(xs)
    return sum(abs(n * x - s) for x in xs) / (2 * n * s)


class TestHoover:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1, 2, 3, 10, 0.5, 4.25]
        out = hoover_index(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["hoover"] == pytest.approx(_hoover_py(xs), rel=1e-12)

    def test_equal_distribution_zero(self, spark):
        out = hoover_index(self._df(spark, [5.0] * 8), ["g"], "x").collect()[0]
        assert out["hoover"] == 0.0

    def test_one_holder_approaches_one(self, spark):
        xs = [0.0] * 99 + [100.0]
        out = hoover_index(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["hoover"] == pytest.approx(0.99)

    def test_zero_total_null(self, spark):
        out = hoover_index(self._df(spark, [0.0, 0.0]), ["g"], "x").collect()[0]
        assert out["hoover"] is None

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            hoover_index(self._df(spark, [1.0, -2.0]), ["g"], "x")
