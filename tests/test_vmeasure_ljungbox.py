"""V-measure (L227) and the Ljung-Box portmanteau test (L228)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import acf, ljung_box
from lmss_entity_extractor_spark.ops.infotheory import v_measure


def _vm_py(pairs):
    from collections import Counter

    n = len(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    cxy = Counter(pairs)
    mi = sum(
        o / n * math.log(o * n / (cx[x] * cy[y]))
        for (x, y), o in sorted(cxy.items())
    )
    hx = -sum(c / n * math.log(c / n) for _, c in sorted(cx.items()))
    hy = -sum(c / n * math.log(c / n) for _, c in sorted(cy.items()))
    h = mi / hx if hx > 0 else 1.0
    c = mi / hy if hy > 0 else 1.0
    v = 2 * h * c / (h + c) if h + c > 0 else 0.0
    return h, c, v


class TestVMeasure:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(str(x), str(y)) for x, y in pairs], "label string, cl string"
        )

    def test_matches_python_reference(self, spark):
        pairs = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 2),
                 ("b", 3), ("c", 3), ("c", 3), ("c", 1)]
        out = v_measure(self._df(spark, pairs), "label", "cl").collect()[0]
        h, c, v = _vm_py(pairs)
        assert out["homogeneity"] == pytest.approx(h, rel=1e-12)
        assert out["completeness"] == pytest.approx(c, rel=1e-12)
        assert out["v_measure"] == pytest.approx(v, rel=1e-12)

    def test_perfect_clustering(self, spark):
        pairs = [("a", 1), ("a", 1), ("b", 2), ("b", 2), ("c", 3)]
        out = v_measure(self._df(spark, pairs), "label", "cl").collect()[0]
        assert out["homogeneity"] == pytest.approx(1.0)
        assert out["completeness"] == pytest.approx(1.0)
        assert out["v_measure"] == pytest.approx(1.0)

    def test_single_cluster_zero_homogeneity(self, spark):
        # everything in one cluster: h = 0, completeness = 1 (H(K)=0
        # convention? no: H(cluster)=0 -> completeness = 1.0)
        pairs = [("a", 1), ("a", 1), ("b", 1), ("b", 1)]
        out = v_measure(self._df(spark, pairs), "label", "cl").collect()[0]
        assert out["homogeneity"] == pytest.approx(0.0, abs=1e-12)
        assert out["completeness"] == 1.0
        assert out["v_measure"] == pytest.approx(0.0, abs=1e-12)

    def test_single_label_homogeneity_one(self, spark):
        pairs = [("a", 1), ("a", 2), ("a", 2)]
        out = v_measure(self._df(spark, pairs), "label", "cl").collect()[0]
        assert out["homogeneity"] == 1.0  # H(label) = 0 convention


def _lb_py(xs, m):
    n = len(xs)
    mean = sum(xs) / n
    c = [x - mean for x in xs]
    den = sum(v * v for v in c)
    q = 0.0
    for h in range(1, m + 1):
        r = sum(c[i] * c[i + h] for i in range(n - h)) / den
        q = q + r * r / (n - h)
    return n * (n + 2) * q


class TestLjungBox:
    def _df(self, spark, xs, g="s1"):
        return spark.createDataFrame(
            [(g, i, float(x)) for i, x in enumerate(xs)],
            "g string, t int, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
        out = ljung_box(self._df(spark, xs), ["g"], ["t"], "x", 3).collect()[0]
        assert out["q"] == pytest.approx(_lb_py(xs, 3), rel=1e-9)
        assert out["n"] == 12 and out["m"] == 3 and out["dof"] == 3

    def test_strong_autocorrelation_large_q(self, spark):
        xs = [float(i % 2) for i in range(40)]  # alternating
        out = ljung_box(self._df(spark, xs), ["g"], ["t"], "x", 2).collect()[0]
        assert out["q"] > 30.0  # chi2_2 at 0.01 is 9.2

    def test_short_series_null(self, spark):
        out = ljung_box(
            self._df(spark, [1.0, 2.0]), ["g"], ["t"], "x", 3
        ).collect()[0]
        assert out["q"] is None

    def test_constant_series_null(self, spark):
        out = ljung_box(
            self._df(spark, [5.0] * 10), ["g"], ["t"], "x", 2
        ).collect()[0]
        assert out["q"] is None

    def test_parallelism_invariance(self, spark):
        xs = [float((i * 7) % 11) for i in range(30)]
        df = self._df(spark, xs)
        a = ljung_box(df.repartition(1), ["g"], ["t"], "x", 4).collect()[0]
        b = ljung_box(df.repartition(8), ["g"], ["t"], "x", 4).collect()[0]
        assert a == b
