"""Bradley-Terry strengths (L407) and geometric median (L408)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.kmeans import geometric_median
from lmss_entity_extractor_spark.ops.rating import bradley_terry


def _bt_ref(players, W, pairs, iters):
    pi = {p: 1.0 for p in players}
    for _ in range(iters):
        new = {}
        for p in players:
            den = 0.0
            for (x, y), g in pairs.items():
                if p == x:
                    den += g / (pi[p] + pi[y])
                elif p == y:
                    den += g / (pi[p] + pi[x])
            new[p] = W[p] / den
        tot = sum(new.values())
        pi = {p: v / tot for p, v in new.items()}
    return pi


class TestBradleyTerry:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", *r) for r in rows],
            "grp string, a string, b string, wa long, wb long",
        )

    def test_matches_python_mm(self, spark):
        rows = [("A", "B", 8, 2), ("A", "C", 7, 3), ("B", "C", 6, 4)]
        out = {
            r["player"]: r
            for r in bradley_terry(
                self._df(spark, rows), ["grp"], "a", "b", "wa", "wb",
                iters=100,
            ).collect()
        }
        ref = _bt_ref(
            "ABC", {"A": 15, "B": 8, "C": 7},
            {("A", "B"): 10, ("A", "C"): 10, ("B", "C"): 10}, 100,
        )
        for p in "ABC":
            assert out[p]["strength"] == pytest.approx(ref[p], rel=1e-12)
        assert [out[p]["rank"] for p in "ABC"] == [1, 2, 3]
        assert sum(r["strength"] for r in out.values()) == pytest.approx(1.0)

    def test_order_free_unlike_elo(self, spark):
        # same outcomes split across rows in any orientation/order
        rows1 = [("A", "B", 8, 2), ("A", "C", 7, 3), ("B", "C", 6, 4)]
        rows2 = [
            ("B", "A", 1, 4), ("C", "A", 3, 7), ("C", "B", 4, 6),
            ("B", "A", 1, 4),
        ]
        o1 = {
            r["player"]: r["strength"]
            for r in bradley_terry(
                self._df(spark, rows1), ["grp"], "a", "b", "wa", "wb"
            ).collect()
        }
        o2 = {
            r["player"]: r["strength"]
            for r in bradley_terry(
                self._df(spark, rows2), ["grp"], "a", "b", "wa", "wb"
            ).collect()
        }
        for p in "ABC":
            assert o1[p] == pytest.approx(o2[p], rel=1e-12)

    def test_symmetric_pool_equal_strengths(self, spark):
        rows = [("A", "B", 5, 5), ("B", "C", 5, 5), ("A", "C", 5, 5)]
        out = bradley_terry(
            self._df(spark, rows), ["grp"], "a", "b", "wa", "wb"
        ).collect()
        for r in out:
            assert r["strength"] == pytest.approx(1 / 3, rel=1e-9)

    def test_ford_violation_refused(self, spark):
        rows = [("A", "B", 5, 0), ("A", "C", 3, 2)]   # B never wins
        with pytest.raises(ValueError, match="zero wins or zero"):
            bradley_terry(
                self._df(spark, rows), ["grp"], "a", "b", "wa", "wb"
            )

    def test_self_pair_refused(self, spark):
        with pytest.raises(ValueError, match="self-pair"):
            bradley_terry(
                self._df(spark, [("A", "A", 1, 1)]),
                ["grp"], "a", "b", "wa", "wb",
            )


def _weiszfeld_ref(pts, iters):
    d = len(pts[0])
    pts = sorted(pts)
    n = len(pts)
    y = [sum(p[k] for p in pts) / n for k in range(d)]
    for _ in range(iters):
        ws = [
            1.0 / max(math.sqrt(sum((p[k] - y[k]) ** 2 for k in range(d))), 1e-12)
            for p in pts
        ]
        den = sum(ws)
        y = [sum(p[k] * w for p, w in zip(pts, ws)) / den for k in range(d)]
    return y


class TestGeometricMedian:
    def _run(self, spark, pts, **kw):
        df = spark.createDataFrame(
            [("g", p) for p in pts], "grp string, v array<double>"
        )
        out = geometric_median(df, ["grp"], "v", **kw).collect()
        return sorted(out, key=lambda r: r["k"])

    def test_matches_python_weiszfeld(self, spark):
        pts = [[float((i * 7) % 5), float((i * 3) % 4)] for i in range(9)]
        out = self._run(spark, pts, iters=60)
        ref = _weiszfeld_ref(pts, 60)
        assert [r["c"] for r in out] == pytest.approx(ref, rel=1e-12)

    def test_majority_point_attracts(self, spark):
        pts = [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [9.0, 0.0]]
        out = self._run(spark, pts, iters=80)
        assert abs(out[0]["c"]) < 1e-6 and abs(out[1]["c"]) < 1e-6

    def test_robust_vs_centroid(self, spark):
        # one far outlier: median stays near the cluster, centroid not
        pts = [[0.0], [1.0], [2.0], [1000.0]]
        out = self._run(spark, pts, iters=100)
        assert out[0]["c"] < 3.0

    def test_collinear_median(self, spark):
        pts = [[float(x)] for x in (0, 1, 2, 3, 10)]
        out = self._run(spark, pts, iters=200)
        assert out[0]["c"] == pytest.approx(2.0, abs=1e-3)

    def test_objective_reported(self, spark):
        pts = [[0.0, 0.0], [2.0, 0.0]]
        out = self._run(spark, pts, iters=30)
        assert out[0]["objective"] == pytest.approx(2.0, abs=1e-6)

    def test_ragged_refused(self, spark):
        df = spark.createDataFrame(
            [("g", [1.0]), ("g", [1.0, 2.0])], "grp string, v array<double>"
        )
        with pytest.raises(ValueError, match="ragged"):
            geometric_median(df, ["grp"], "v")

    def test_max_points_refused(self, spark):
        df = spark.createDataFrame(
            [("g", [float(i)]) for i in range(9)], "grp string, v array<double>"
        )
        with pytest.raises(ValueError, match="max_points"):
            geometric_median(df, ["grp"], "v", max_points=8)
