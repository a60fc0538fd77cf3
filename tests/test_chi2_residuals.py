"""Post-chi2 adjusted cell residuals (L263)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import (
    chi2_independence,
    chi2_residuals,
)


def _resid_py(pairs):
    from collections import Counter

    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    n = len(pairs)
    out = {}
    for (x, y), o in cxy.items():
        e = cx[x] * cy[y] / n
        r = (o - e) / math.sqrt(e)
        ra = (o - e) / math.sqrt(e * (1 - cx[x] / n) * (1 - cy[y] / n))
        out[(x, y)] = (e, r, ra)
    return out


class TestChi2Residuals:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "x string, y string"
        )

    def test_matches_python_reference(self, spark):
        pairs = [("a", 1)] * 9 + [("a", 2)] * 1 + [("b", 1)] * 3 \
            + [("b", 2)] * 7 + [("c", 1)] * 5 + [("c", 2)] * 5
        rows = chi2_residuals(self._df(spark, pairs), "x", "y").collect()
        ref = _resid_py(pairs)
        for r in rows:
            e, pr, ar = ref[(r["x"], int(r["y"]))]
            assert r["e"] == pytest.approx(e, rel=1e-12)
            assert r["pearson_resid"] == pytest.approx(pr, rel=1e-12)
            assert r["adj_resid"] == pytest.approx(ar, rel=1e-12)

    def test_squared_pearson_sums_to_chi2(self, spark):
        pairs = [("a", 1)] * 6 + [("a", 2)] * 4 + [("b", 1)] * 2 \
            + [("b", 2)] * 8
        df = self._df(spark, pairs)
        rows = chi2_residuals(df, "x", "y").collect()
        chi2 = chi2_independence(df, "x", "y").collect()[0]["chi2"]
        assert sum(r["pearson_resid"] ** 2 for r in rows) == pytest.approx(
            chi2, rel=1e-9
        )

    def test_independent_small_residuals(self, spark):
        pairs = [(x, y) for x in "ab" for y in (1, 2) for _ in range(10)]
        rows = chi2_residuals(self._df(spark, pairs), "x", "y").collect()
        assert all(abs(r["adj_resid"]) < 1e-9 for r in rows)

    def test_degenerate_margin_null(self, spark):
        pairs = [("a", 1), ("b", 1), ("c", 1)]  # ct = N
        rows = chi2_residuals(self._df(spark, pairs), "x", "y").collect()
        assert all(r["adj_resid"] is None for r in rows)
