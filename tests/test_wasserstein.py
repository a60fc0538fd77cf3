"""1-D Wasserstein distance (L181)."""

import pytest

from lmss_entity_extractor_spark.ops.rankeval import wasserstein_1d


def _w1_py(xs, ys):
    na, nb = len(xs), len(ys)
    vals = sorted(set(xs) | set(ys))
    total = 0.0
    for v, nxt in zip(vals, vals[1:]):
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        total += abs(ca / na - cb / nb) * (nxt - v)
    return total


def _df(spark, xs, ys, grp="g"):
    rows = [(grp, "A", float(v)) for v in xs] + [
        (grp, "B", float(v)) for v in ys
    ]
    return spark.createDataFrame(rows, "g string, s string, v double")


class TestWasserstein:
    def test_matches_python(self, spark):
        xs = [1.0, 2.0, 2.5, 4.0, 9.0]
        ys = [2.0, 3.0, 3.5, 5.0]
        r = wasserstein_1d(_df(spark, xs, ys), ["g"], "s", "A", "B", "v").collect()[0]
        assert r["n_a"] == 5 and r["n_b"] == 4
        assert r["w1"] == pytest.approx(_w1_py(xs, ys), rel=1e-12)

    def test_shift_equals_distance(self, spark):
        # point masses at 0 and at 3: W1 is exactly the shift
        r = wasserstein_1d(
            _df(spark, [0.0, 0.0], [3.0, 3.0]), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert r["w1"] == 3.0

    def test_identical_zero(self, spark):
        xs = [1.0, 5.0, 7.0]
        r = wasserstein_1d(_df(spark, xs, xs), ["g"], "s", "A", "B", "v").collect()[0]
        assert r["w1"] == 0.0

    def test_fractional_widths_exact(self, spark):
        # widths of 0.25 must not be truncated (the decimal-scale bug
        # class this test pins)
        xs = [0.0, 0.25]
        ys = [0.25, 0.5]
        r = wasserstein_1d(_df(spark, xs, ys), ["g"], "s", "A", "B", "v").collect()[0]
        assert r["w1"] == pytest.approx(_w1_py(xs, ys), abs=0)
        assert r["w1"] == 0.25

    def test_missing_sample_null(self, spark):
        r = wasserstein_1d(
            _df(spark, [1.0], []), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert r["w1"] is None
