"""Katz centrality (L409) and Qn/Sn robust scale (L410)."""

import pytest

from lmss_entity_extractor_spark.graph.pagerank import katz_centrality
from lmss_entity_extractor_spark.ops.spc import qn_sn_scale


def _katz_ref(edges, iters, alpha, beta=1.0):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    x = {n: beta for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            inflow = sum(x[u] for u, v in edges if v == n)
            new[n] = beta + alpha * inflow
        x = new
    return x


class TestKatz:
    EDGES = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")]

    def _run(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            r["node"]: r["katz"]
            for r in katz_centrality(df, **kw).collect()
        }

    def test_matches_python_reference(self, spark):
        got = self._run(spark, self.EDGES, n_iters=6, alpha="0.05")
        ref = _katz_ref(self.EDGES, 6, 0.05)
        for n in ref:
            assert got[n] == pytest.approx(ref[n], rel=1e-12)

    def test_truncated_sum_semantics(self, spark):
        # one edge a->b, 3 iters: x_b = 1 + a*1 (a's katz stays 1)
        got = self._run(spark, [("a", "b")], n_iters=3, alpha="0.5")
        assert got["a"] == pytest.approx(1.0)
        assert got["b"] == pytest.approx(1.5)

    def test_parallel_edges_count_twice(self, spark):
        got = self._run(
            spark, [("a", "b"), ("a", "b")], n_iters=1, alpha="0.1"
        )
        assert got["b"] == pytest.approx(1.2)

    def test_scale_budget_refused(self, spark):
        with pytest.raises(ValueError, match="scale"):
            self._run(spark, self.EDGES, n_iters=9, alpha="0.05")

    def test_bad_iters_refused(self, spark):
        with pytest.raises(ValueError, match="n_iters"):
            self._run(spark, self.EDGES, n_iters=0)


def _med(a):
    a = sorted(a)
    k = len(a)
    hi = a[k // 2]
    lo = a[(k - 1) // 2]
    return hi if k % 2 == 1 else (lo + hi) / 2.0


def _qn_sn_ref(xs):
    xs = sorted(xs)
    n = len(xs)
    inner = [
        _med([abs(x - y) for j, y in enumerate(xs) if j != i])
        for i, x in enumerate(xs)
    ]
    sn = 1.1926 * _med(inner)
    diffs = sorted(
        abs(xs[i] - xs[j]) for i in range(n) for j in range(i + 1, n)
    )
    h = n // 2 + 1
    qn = 2.2219 * diffs[h * (h - 1) // 2 - 1]
    return sn, qn


class TestQnSn:
    def _run(self, spark, xs, **kw):
        df = spark.createDataFrame(
            [("g", float(x)) for x in xs], "k string, v double"
        )
        return qn_sn_scale(df, ["k"], "v", **kw).collect()[0]

    def test_python_reference_even(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6]
        r = self._run(spark, xs)
        sn, qn = _qn_sn_ref(xs)
        assert r["sn"] == pytest.approx(sn, rel=1e-12)
        assert r["qn"] == pytest.approx(qn, rel=1e-12)

    def test_python_reference_odd(self, spark):
        xs = [10, 2, 30, 4, 50, 6, 7]
        r = self._run(spark, xs)
        sn, qn = _qn_sn_ref(xs)
        assert r["sn"] == pytest.approx(sn, rel=1e-12)
        assert r["qn"] == pytest.approx(qn, rel=1e-12)

    def test_outlier_robustness(self, spark):
        base = [1, 2, 3, 4, 5, 6, 7, 8]
        r1 = self._run(spark, base)
        r2 = self._run(spark, base[:-1] + [10_000])
        assert r2["qn"] < 3 * r1["qn"]
        assert r2["sn"] < 3 * r1["sn"]

    def test_constant_zero_scale(self, spark):
        r = self._run(spark, [5, 5, 5, 5])
        assert r["sn"] == pytest.approx(0.0)
        assert r["qn"] == pytest.approx(0.0)

    def test_max_len_refused(self, spark):
        with pytest.raises(ValueError, match="max_len"):
            self._run(spark, list(range(30)), max_len=10)
