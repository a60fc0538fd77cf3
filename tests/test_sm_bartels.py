"""Stuart-Maxwell 3x3 (L277) and Bartels rank von Neumann (L278)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import stuart_maxwell_3
from lmss_entity_extractor_spark.ops.rankeval import bartels_rank_test


def _sm_py(pairs):
    cats = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    n = {(i, j): 0 for i in cats for j in cats}
    for a, b in pairs:
        n[(a, b)] += 1
    row = {i: sum(n[(i, j)] for j in cats) for i in cats}
    col = {j: sum(n[(i, j)] for i in cats) for j in cats}
    d = [row[c] - col[c] for c in cats]
    m12 = n[(cats[0], cats[1])] + n[(cats[1], cats[0])]
    m13 = n[(cats[0], cats[2])] + n[(cats[2], cats[0])]
    m23 = n[(cats[1], cats[2])] + n[(cats[2], cats[1])]
    num = m23 * d[0] ** 2 + m13 * d[1] ** 2 + m12 * d[2] ** 2
    den = m12 * m13 + m12 * m23 + m13 * m23
    return d, (num / den if den else None)


class TestStuartMaxwell:
    def _df(self, spark, pairs, g="g1"):
        return spark.createDataFrame(
            [(g, a, b) for a, b in pairs], "g string, b string, a string"
        )

    def test_matches_python_reference(self, spark):
        pairs = (
            [("x", "x")] * 10 + [("x", "y")] * 7 + [("y", "x")] * 2
            + [("y", "y")] * 8 + [("y", "z")] * 5 + [("z", "y")] * 1
            + [("z", "z")] * 6 + [("x", "z")] * 3 + [("z", "x")] * 1
        )
        out = stuart_maxwell_3(
            self._df(spark, pairs), ["g"], "b", "a"
        ).collect()[0]
        d, chi2 = _sm_py(pairs)
        assert (out["d1"], out["d2"], out["d3"]) == tuple(d)
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
        assert out["dof"] == 2

    def test_equal_margins_zero(self, spark):
        pairs = [("x", "y"), ("y", "x"), ("y", "z"), ("z", "y"),
                 ("x", "z"), ("z", "x"), ("x", "x")]
        out = stuart_maxwell_3(
            self._df(spark, pairs), ["g"], "b", "a"
        ).collect()[0]
        assert out["chi2"] == 0.0

    def test_two_categories_refused(self, spark):
        with pytest.raises(ValueError, match="3 categories"):
            stuart_maxwell_3(
                self._df(spark, [("x", "y"), ("y", "x")]), ["g"], "b", "a"
            )

    def test_perfect_agreement_null(self, spark):
        pairs = [("x", "x"), ("y", "y"), ("z", "z")]
        out = stuart_maxwell_3(
            self._df(spark, pairs), ["g"], "b", "a"
        ).collect()[0]
        assert out["chi2"] is None


def _midranks_seq(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    r = [0.0] * len(xs)
    i = 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[order[j]] == xs[order[i]]:
            j += 1
        for t in range(i, j):
            r[order[t]] = (i + 1 + j) / 2.0
        i = j
    return r


def _bartels_py(xs):
    r = _midranks_seq(xs)
    n = len(xs)
    rbar = (n + 1) / 2.0
    nm = sum((r[i] - r[i + 1]) ** 2 for i in range(n - 1))
    d = sum((v - rbar) ** 2 for v in r)
    rvn = nm / d
    var = (
        4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1) * (n - 1) ** 2)
    )
    return rvn, (rvn - 2.0) / math.sqrt(var)


class TestBartels:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x)) for i, x in enumerate(xs)],
            "g string, t double, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
        out = bartels_rank_test(
            self._df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        rvn, z = _bartels_py(xs)
        assert out["rvn"] == pytest.approx(rvn, rel=1e-12)
        assert out["z"] == pytest.approx(z, rel=1e-12)

    def test_monotone_low_rvn(self, spark):
        out = bartels_rank_test(
            self._df(spark, list(range(20))), ["g"], ["t"], "x"
        ).collect()[0]
        assert out["rvn"] < 0.5 and out["z"] < -3.0

    def test_alternating_high_rvn(self, spark):
        xs = [i // 2 if i % 2 == 0 else 100 - i // 2 for i in range(20)]
        out = bartels_rank_test(
            self._df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        assert out["rvn"] > 3.0 and out["z"] > 3.0

    def test_all_tied_null(self, spark):
        out = bartels_rank_test(
            self._df(spark, [7.0] * 6), ["g"], ["t"], "x"
        ).collect()[0]
        assert out["rvn"] is None and out["z"] is None

    def test_null_refused(self, spark):
        df = self._df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            bartels_rank_test(df, ["g"], ["t"], "x")
