"""Mantel-Haenszel stratified 2x2 (L239) and Cronbach's alpha (L240)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import cronbach_alpha
from lmss_entity_extractor_spark.ops.stattests import mantel_haenszel


def _mh_py(strata):
    """strata: {s: (a, b, c, d)}"""
    num = den = esum = vsum = suma = 0.0
    for s in sorted(strata):
        a, b, c, d = strata[s]
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        esum += (a + b) * (a + c) / n
        if n > 1:
            vsum += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        suma += a
    or_mh = num / den if den > 0 else None
    chi2 = (suma - esum) ** 2 / vsum if vsum > 0 else None
    return or_mh, chi2


class TestMantelHaenszel:
    def _df(self, spark, strata):
        rows = []
        for s, (a, b, c, d) in strata.items():
            rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b
            rows += [(s, 0, 1)] * c + [(s, 0, 0)] * d
        return spark.createDataFrame(rows, "s string, e int, y int")

    def test_matches_python_reference(self, spark):
        strata = {"x": (10, 5, 4, 12), "y": (8, 9, 3, 14), "z": (2, 1, 5, 6)}
        out = mantel_haenszel(self._df(spark, strata), "s", "e", "y").collect()[0]
        or_mh, chi2 = _mh_py(strata)
        assert out["or_mh"] == pytest.approx(or_mh, rel=1e-12)
        assert out["chi2_mh"] == pytest.approx(chi2, rel=1e-12)
        assert out["k_strata"] == 3 and out["n"] == 79

    def test_classic_textbook_or(self, spark):
        # one stratum reduces to the plain odds ratio ad/bc
        strata = {"only": (12, 6, 4, 8)}
        out = mantel_haenszel(self._df(spark, strata), "s", "e", "y").collect()[0]
        assert out["or_mh"] == pytest.approx((12 * 8) / (6 * 4))

    def test_no_discordant_null_or(self, spark):
        strata = {"x": (5, 0, 0, 5)}
        out = mantel_haenszel(self._df(spark, strata), "s", "e", "y").collect()[0]
        assert out["or_mh"] is None

    def test_confounder_adjustment(self, spark):
        # two strata each with OR = 1 but different base rates: pooled
        # naive table shows association, MH correctly reports ~1
        strata = {"lo": (1, 9, 2, 18), "hi": (18, 2, 9, 1)}
        out = mantel_haenszel(self._df(spark, strata), "s", "e", "y").collect()[0]
        assert out["or_mh"] == pytest.approx(1.0)

    def test_non_binary_refused(self, spark):
        df = spark.createDataFrame([("s", 2, 0)], "s string, e int, y int")
        with pytest.raises(ValueError, match="non-binary"):
            mantel_haenszel(df, "s", "e", "y")


def _cronbach_py(rows):
    k = len(rows[0])
    n = len(rows)

    def var(xs):
        m = sum(xs) / n
        return sum((x - m) ** 2 for x in xs) / (n - 1)

    sum_var = sum(var([r[j] for r in rows]) for j in range(k))
    tot = var([sum(r) for r in rows])
    return k / (k - 1) * (1 - sum_var / tot)


class TestCronbach:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [tuple(float(x) for x in r) for r in rows],
            ", ".join(f"i{j} double" for j in range(len(rows[0]))),
        )

    def test_matches_python_reference(self, spark):
        rows = [(3, 4, 3), (5, 5, 4), (2, 2, 3), (4, 5, 5), (1, 2, 1),
                (5, 4, 5), (3, 3, 2)]
        out = cronbach_alpha(self._df(spark, rows), ["i0", "i1", "i2"]).collect()[0]
        assert out["alpha"] == pytest.approx(_cronbach_py(rows), rel=1e-12)
        assert out["n"] == 7 and out["k"] == 3

    def test_parallel_items_high_alpha(self, spark):
        rows = [(x, x, x) for x in (1, 2, 3, 4, 5)]
        out = cronbach_alpha(self._df(spark, rows), ["i0", "i1", "i2"]).collect()[0]
        assert out["alpha"] == pytest.approx(1.0)

    def test_null_rows_dropped_listwise(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (3.0, None), (2.0, 1.0), (4.0, 5.0)],
            "i0 double, i1 double",
        )
        out = cronbach_alpha(df, ["i0", "i1"]).collect()[0]
        assert out["n"] == 3

    def test_degenerate_null(self, spark):
        rows = [(1, 1), (1, 1), (1, 1)]
        out = cronbach_alpha(self._df(spark, rows), ["i0", "i1"]).collect()[0]
        assert out["alpha"] is None

    def test_needs_two_items(self, spark):
        df = spark.createDataFrame([(1.0,)], "i0 double")
        with pytest.raises(ValueError, match="at least 2"):
            cronbach_alpha(df, ["i0"])
