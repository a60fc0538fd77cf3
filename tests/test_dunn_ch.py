"""Dunn's post-hoc pairwise rank test (L233) and the
Calinski-Harabasz variance-ratio index (L234)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.clustereval import calinski_harabasz
from lmss_entity_extractor_spark.ops.rankeval import dunn_posthoc


def _dunn_py(groups):
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)

    def rank(x):
        lo = sum(1 for v in allv if v < x)
        eq = sum(1 for v in allv if v == x)
        return lo + (eq + 1) / 2

    from collections import Counter

    ties = Counter(allv)
    tt = sum(t**3 - t for t in ties.values())
    sigma2 = n * (n + 1) / 12 - tt / (12 * (n - 1))
    out = {}
    gs = sorted(groups)
    for i, ga in enumerate(gs):
        for gb in gs[i + 1:]:
            ra = sum(rank(v) for v in groups[ga]) / len(groups[ga])
            rb = sum(rank(v) for v in groups[gb]) / len(groups[gb])
            se = math.sqrt(sigma2 * (1 / len(groups[ga]) + 1 / len(groups[gb])))
            out[(ga, gb)] = (ra, rb, (ra - rb) / se)
    return out


class TestDunn:
    def _df(self, spark, groups):
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "lvl string, v double")

    def test_matches_python_reference(self, spark):
        groups = {
            "a": [1, 2, 3, 4, 2],
            "b": [5, 6, 7, 8],
            "c": [2, 3, 9, 10, 11, 3],
        }
        rows = dunn_posthoc(self._df(spark, groups), "lvl", "v").collect()
        ref = _dunn_py(groups)
        assert len(rows) == 3
        for r in rows:
            ra, rb, z = ref[(r["g_a"], r["g_b"])]
            assert r["mean_rank_a"] == pytest.approx(ra, rel=1e-12)
            assert r["mean_rank_b"] == pytest.approx(rb, rel=1e-12)
            assert r["z"] == pytest.approx(z, rel=1e-12)

    def test_separated_groups_large_z(self, spark):
        groups = {"lo": [1, 2, 3, 4, 5], "hi": [101, 102, 103, 104, 105]}
        r = dunn_posthoc(self._df(spark, groups), "lvl", "v").collect()[0]
        assert abs(r["z"]) > 2.5

    def test_all_tied_null(self, spark):
        groups = {"a": [5, 5], "b": [5, 5]}
        r = dunn_posthoc(self._df(spark, groups), "lvl", "v").collect()[0]
        assert r["z"] is None

    def test_orientation(self, spark):
        groups = {"a": [1, 2], "b": [3, 4]}
        rows = dunn_posthoc(self._df(spark, groups), "lvl", "v").collect()
        assert len(rows) == 1 and rows[0]["g_a"] == "a"


def _ch_py(points, quant=1 << 20):
    from collections import defaultdict

    qp = {g: [[math.floor(x * quant) for x in v] for v in vs]
          for g, vs in points.items()}
    d = len(next(iter(qp.values()))[0])
    n = sum(len(vs) for vs in qp.values())
    k = len(qp)
    ssw = parta = 0.0
    td = [0] * d
    for g in sorted(qp):
        vs = qp[g]
        nj = len(vs)
        for dim in range(d):
            s = sum(v[dim] for v in vs)
            q = sum(v[dim] ** 2 for v in vs)
            ssw += q - s * s / nj
            parta += s * s / nj
            td[dim] += s
    partb = sum(t * t / n for t in td)
    ssb = parta - partb
    return ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k))


class TestCalinskiHarabasz:
    def _df(self, spark, points):
        rows = [(g, [float(x) for x in v]) for g, vs in points.items() for v in vs]
        return spark.createDataFrame(rows, "cl string, embedding array<double>")

    def test_matches_python_reference(self, spark):
        points = {
            "a": [[0.1, 0.2], [0.15, 0.25], [0.12, 0.18]],
            "b": [[0.4, -0.3], [0.45, -0.25], [0.38, -0.33]],
            "c": [[-0.2, -0.1], [-0.22, -0.05]],
        }
        out = calinski_harabasz(self._df(spark, points), "cl").collect()[0]
        ssb, ssw, ch = _ch_py(points)
        assert out["ssb"] == pytest.approx(ssb, rel=1e-9)
        assert out["ssw"] == pytest.approx(ssw, rel=1e-9)
        assert out["ch"] == pytest.approx(ch, rel=1e-9)
        assert out["k"] == 3 and out["n"] == 8

    def test_tight_separated_beats_mixed(self, spark):
        tight = {
            "a": [[0.0, 0.0], [0.001, 0.0], [0.0, 0.001]],
            "b": [[0.4, 0.4], [0.401, 0.4], [0.4, 0.401]],
        }
        mixed = {
            "a": [[0.0, 0.0], [0.4, 0.4], [0.0, 0.001]],
            "b": [[0.001, 0.0], [0.401, 0.4], [0.4, 0.401]],
        }
        a = calinski_harabasz(self._df(spark, tight), "cl").collect()[0]["ch"]
        b = calinski_harabasz(self._df(spark, mixed), "cl").collect()[0]["ch"]
        assert a > 100 * b

    def test_single_cluster_null(self, spark):
        points = {"a": [[0.1, 0.2], [0.3, 0.4], [0.2, 0.1]]}
        out = calinski_harabasz(self._df(spark, points), "cl").collect()[0]
        assert out["ch"] is None and out["k"] == 1

    def test_identical_points_null(self, spark):
        points = {"a": [[0.1, 0.1]] * 3, "b": [[0.1, 0.1]] * 3}
        out = calinski_harabasz(self._df(spark, points), "cl").collect()[0]
        assert out["ch"] is None  # ssw = 0

    def test_parallelism_invariance(self, spark):
        import random

        rng = random.Random(7)
        points = {
            g: [[rng.uniform(-0.5, 0.5) for _ in range(8)] for _ in range(20)]
            for g in ("a", "b", "c")
        }
        df = self._df(spark, points)
        x = calinski_harabasz(df.repartition(1), "cl").collect()[0]
        y = calinski_harabasz(df.repartition(8), "cl").collect()[0]
        assert x == y
