"""DTW distance (L303) and jackknife Gini SE (L304)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.complexity import dtw_distance
from lmss_entity_extractor_spark.ops.concentration import gini_jackknife


def _dtw_py(a, b, band=None):
    n, m = len(a), len(b)
    inf = float("inf")
    prev = [0.0] + [inf] * m
    for i in range(1, n + 1):
        cur = [inf]
        for j in range(1, m + 1):
            if band is not None and abs(i - j) > band:
                cur.append(inf)
                continue
            cost = abs(a[i - 1] - b[j - 1])
            cur.append(cost + min(prev[j - 1], prev[j], cur[j - 1]))
        prev = cur
    return prev[m]


def _df2(spark, a, b, g="g1"):
    rows = [(g, "A", float(i), float(x)) for i, x in enumerate(a)] + [
        (g, "B", float(i), float(x)) for i, x in enumerate(b)
    ]
    return spark.createDataFrame(
        rows, "g string, s string, t double, x double"
    )


class TestDtw:
    def test_matches_python_reference(self, spark):
        a = [1, 3, 4, 9, 8, 2, 1, 5.5, 7]
        b = [1, 6, 2, 3, 0, 9, 4, 3.5]
        row = dtw_distance(
            _df2(spark, a, b), ["g"], "s", "A", "B", "t", "x"
        ).collect()[0]
        ref = _dtw_py(a, b)
        assert row["n_a"] == 9 and row["n_b"] == 8
        assert row["dtw"] == pytest.approx(ref, rel=1e-12)
        assert row["dtw_norm"] == pytest.approx(ref / 17, rel=1e-12)

    def test_banded_matches(self, spark):
        a = [1, 3, 4, 9, 8, 2, 1, 5.5]
        b = [1, 6, 2, 3, 0, 9, 4, 3.5]
        row = dtw_distance(
            _df2(spark, a, b), ["g"], "s", "A", "B", "t", "x", band=2
        ).collect()[0]
        assert row["dtw"] == pytest.approx(_dtw_py(a, b, 2), rel=1e-12)

    def test_identical_series_zero(self, spark):
        a = [1.0, 5.0, 3.0, 8.0]
        row = dtw_distance(
            _df2(spark, a, a), ["g"], "s", "A", "B", "t", "x"
        ).collect()[0]
        assert row["dtw"] == 0.0

    def test_shifted_beats_l2(self, spark):
        # same shape shifted one step: DTW nearly 0
        a = [0, 0, 5, 9, 5, 0, 0, 0]
        b = [0, 0, 0, 5, 9, 5, 0, 0]
        row = dtw_distance(
            _df2(spark, a, b), ["g"], "s", "A", "B", "t", "x"
        ).collect()[0]
        l2 = sum(abs(x - y) for x, y in zip(a, b))
        assert row["dtw"] < l2 / 3

    def test_max_len_refused(self, spark):
        a = [float(i) for i in range(20)]
        with pytest.raises(ValueError, match="max_len"):
            dtw_distance(
                _df2(spark, a, a), ["g"], "s", "A", "B", "t", "x",
                max_len=10,
            )


def _gini_py(xs):
    xs = sorted(xs)
    n = len(xs)
    s = sum(xs)
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * t - (n + 1) * s) / (n * s)


def _gini_jk_py(xs):
    n = len(xs)
    loo = [
        _gini_py(sorted(xs)[:k] + sorted(xs)[k + 1:]) for k in range(n)
    ]
    gbar = sum(loo) / n
    return _gini_py(xs), math.sqrt(
        (n - 1) / n * sum((g - gbar) ** 2 for g in loo)
    )


class TestGiniJackknife:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1, 2, 2, 3.5, 10, 0.25, 4, 7, 6, 1.5]
        row = gini_jackknife(self._df(spark, xs), ["g"], "x").collect()[0]
        gini, se = _gini_jk_py(xs)
        assert row["gini"] == pytest.approx(gini, rel=1e-9)
        assert row["se_jack"] == pytest.approx(se, rel=1e-9)

    def test_equal_values_zero_everything(self, spark):
        row = gini_jackknife(
            self._df(spark, [5.0] * 8), ["g"], "x"
        ).collect()[0]
        assert row["gini"] == 0.0
        assert row["se_jack"] == pytest.approx(0.0, abs=1e-12)

    def test_tie_order_invariance_with_dupes(self, spark):
        # heavy duplication exercises the tie-invariant LOO identity
        xs = [1.0] * 5 + [9.0] * 5 + [3.0] * 3
        row = gini_jackknife(self._df(spark, xs), ["g"], "x").collect()[0]
        gini, se = _gini_jk_py(xs)
        assert row["gini"] == pytest.approx(gini, rel=1e-9)
        assert row["se_jack"] == pytest.approx(se, rel=1e-9)

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            gini_jackknife(self._df(spark, [1.0, -1.0]), ["g"], "x")

    def test_max_len_refused(self, spark):
        xs = [float(i) for i in range(20)]
        with pytest.raises(ValueError, match="max_len"):
            gini_jackknife(self._df(spark, xs), ["g"], "x", max_len=10)
