"""Bowker symmetry test (L251) and the likelihood-ratio G-test (L252)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import bowker_symmetry, mcnemar
from lmss_entity_extractor_spark.ops.stattests import g_test


def _bowker_py(pairs):
    from collections import Counter

    c = Counter(pairs)
    cats = sorted({x for x, _ in pairs} | {y for _, y in pairs})
    chi2 = 0.0
    dof = 0
    for i, a in enumerate(cats):
        for b in cats[i + 1:]:
            nij, nji = c[(a, b)], c[(b, a)]
            if nij + nji > 0:
                dof += 1
                chi2 += (nij - nji) ** 2 / (nij + nji)
    return chi2, dof, len(cats)


class TestBowker:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "x string, y string"
        )

    def test_matches_python_reference(self, spark):
        pairs = [("a", "b")] * 5 + [("b", "a")] * 2 + [("a", "c")] * 3 \
            + [("c", "a")] * 3 + [("b", "c")] * 1 + [("a", "a")] * 10
        out = bowker_symmetry(self._df(spark, pairs), [], "x", "y").collect()[0]
        chi2, dof, k = _bowker_py(pairs)
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
        assert out["dof"] == dof and out["k"] == k
        assert out["n"] == len(pairs)

    def test_k2_equals_mcnemar_uncorrected(self, spark):
        rows = [(1, 0)] * 7 + [(0, 1)] * 3 + [(1, 1)] * 5 + [(0, 0)] * 4
        df = spark.createDataFrame(rows, "x int, y int")
        bow = bowker_symmetry(df, [], "x", "y").collect()[0]
        mc = mcnemar(df, [], "x", "y").collect()[0]
        assert bow["chi2"] == mc["chi2"]

    def test_symmetric_table_zero(self, spark):
        pairs = [("a", "b")] * 4 + [("b", "a")] * 4 + [("a", "a")] * 2
        out = bowker_symmetry(self._df(spark, pairs), [], "x", "y").collect()[0]
        assert out["chi2"] == 0.0

    def test_single_class_null(self, spark):
        pairs = [("a", "a")] * 5
        out = bowker_symmetry(self._df(spark, pairs), [], "x", "y").collect()[0]
        assert out["chi2"] is None and out["dof"] == 0 and out["k"] == 1


def _g_py(pairs):
    from collections import Counter

    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    n = len(pairs)
    g = 0.0
    for (x, y), o in sorted(cxy.items()):
        g = g + o * math.log(o * n / (cx[x] * cy[y]))
    return 2.0 * g


class TestGTest:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "x string, y string"
        )

    def test_matches_python_reference(self, spark):
        pairs = [("a", 1)] * 8 + [("a", 2)] * 2 + [("b", 1)] * 3 \
            + [("b", 2)] * 7 + [("c", 1)] * 5 + [("c", 2)] * 5
        out = g_test(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["g"] == pytest.approx(_g_py(pairs), rel=1e-12)
        assert out["dof"] == 2 and out["n"] == 30

    def test_identity_with_mutual_information(self, spark):
        from lmss_entity_extractor_spark.ops.infotheory import (
            mutual_information,
        )

        pairs = [("a", 1)] * 6 + [("a", 2)] * 4 + [("b", 1)] * 2 \
            + [("b", 2)] * 8
        df = self._df(spark, pairs)
        g = g_test(df, "x", "y").collect()[0]["g"]
        mi = mutual_information(df, "x", "y").collect()[0]["mi"]
        assert g == pytest.approx(2 * len(pairs) * mi, rel=1e-12)

    def test_independent_small_g(self, spark):
        pairs = [(x, y) for x in "ab" for y in (1, 2) for _ in range(10)]
        out = g_test(self._df(spark, pairs), "x", "y").collect()[0]
        assert abs(out["g"]) < 1e-9

    def test_degenerate_null(self, spark):
        pairs = [("a", 1), ("a", 2), ("a", 1)]
        out = g_test(self._df(spark, pairs), "x", "y").collect()[0]
        assert out["g"] is None and out["r"] == 1
