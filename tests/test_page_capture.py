"""Page's trend test (L245) and capture-recapture estimation (L246)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.rankeval import page_trend
from lmss_entity_extractor_spark.ops.sketches import capture_recapture


def _page_py(blocks):
    """blocks: list of dicts treatment->value; treatments sorted order
    gives scores 1..k."""
    treats = sorted(blocks[0])
    k, m = len(treats), len(blocks)
    rsum = {t: 0.0 for t in treats}
    for bl in blocks:
        vals = sorted(bl.values())
        for t in treats:
            v = bl[t]
            lo = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            rsum[t] += lo + (eq + 1) / 2
    L = sum((i + 1) * rsum[t] for i, t in enumerate(treats))
    e = m * k * (k + 1) ** 2 / 4
    v = m * k * k * (k + 1) * (k * k - 1) / 144
    return L, (L - e) / math.sqrt(v)


class TestPageTrend:
    def _df(self, spark, blocks):
        rows = [
            (i, t, float(v))
            for i, bl in enumerate(blocks)
            for t, v in bl.items()
        ]
        return spark.createDataFrame(rows, "b int, t string, v double")

    def test_matches_python_reference(self, spark):
        blocks = [
            {"t1": 1, "t2": 3, "t3": 2, "t4": 4},
            {"t1": 2, "t2": 2, "t3": 5, "t4": 6},
            {"t1": 1, "t2": 4, "t3": 4, "t4": 5},
        ]
        out = page_trend(self._df(spark, blocks), [], "b", "t", "v").collect()[0]
        L, z = _page_py(blocks)
        assert out["l_stat"] == pytest.approx(L, rel=1e-12)
        assert out["z"] == pytest.approx(z, rel=1e-12)
        assert out["k"] == 4 and out["n_blocks"] == 3

    def test_perfect_increasing_trend_large_z(self, spark):
        blocks = [{f"t{j}": j for j in range(1, 6)} for _ in range(8)]
        out = page_trend(self._df(spark, blocks), [], "b", "t", "v").collect()[0]
        assert out["z"] > 4.0

    def test_decreasing_trend_negative_z(self, spark):
        blocks = [{f"t{j}": -j for j in range(1, 6)} for _ in range(8)]
        out = page_trend(self._df(spark, blocks), [], "b", "t", "v").collect()[0]
        assert out["z"] < -4.0

    def test_k2_null(self, spark):
        blocks = [{"a": 1, "b": 2}, {"a": 2, "b": 1}]
        out = page_trend(self._df(spark, blocks), [], "b", "t", "v").collect()[0]
        assert out["z"] is None


class TestCaptureRecapture:
    def _dfs(self, spark, ids_a, ids_b):
        a = spark.createDataFrame([(i,) for i in ids_a], "id int")
        b = spark.createDataFrame([(i,) for i in ids_b], "id int")
        return a, b

    def test_estimates(self, spark):
        a, b = self._dfs(spark, range(0, 60), range(40, 120))
        out = capture_recapture(a, b, "id").collect()[0]
        assert (out["n_a"], out["n_b"], out["n_overlap"]) == (60, 80, 20)
        assert out["lincoln_petersen"] == (60.0 * 80.0) / 20.0
        assert out["chapman"] == (61.0 * 81.0) / 21.0 - 1.0
        assert out["se_chapman"] == math.sqrt(
            (61.0 * 81.0 * 40.0 * 60.0) / (21.0 * 21.0 * 22.0)
        )

    def test_disjoint_chapman_defined(self, spark):
        a, b = self._dfs(spark, range(10), range(100, 110))
        out = capture_recapture(a, b, "id").collect()[0]
        assert out["lincoln_petersen"] is None
        assert out["chapman"] == 11.0 * 11.0 / 1.0 - 1.0

    def test_full_overlap_recovers_n(self, spark):
        a, b = self._dfs(spark, range(50), range(50))
        out = capture_recapture(a, b, "id").collect()[0]
        assert out["lincoln_petersen"] == 50.0
        assert out["se_chapman"] == 0.0

    def test_duplicates_collapsed(self, spark):
        a, b = self._dfs(spark, [1, 1, 2, 2, 3], [2, 2, 3, 4])
        out = capture_recapture(a, b, "id").collect()[0]
        assert (out["n_a"], out["n_b"], out["n_overlap"]) == (3, 3, 2)
