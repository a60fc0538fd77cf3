"""Davies-Bouldin index (L235) and average precision @k (L236)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.clustereval import (
    calinski_harabasz,
    davies_bouldin,
)
from lmss_entity_extractor_spark.ops.evalmetrics import average_precision


def _db_py(points, quant=1 << 20):
    qp = {g: [[math.floor(x * quant) for x in v] for v in vs]
          for g, vs in points.items()}
    d = len(next(iter(qp.values()))[0])
    stats = {}
    for g, vs in qp.items():
        nj = len(vs)
        ssw = 0.0
        means = []
        for dim in range(d):
            s = sum(v[dim] for v in vs)
            q = sum(v[dim] ** 2 for v in vs)
            ssw += q - s * s / nj
            means.append(s / nj)
        stats[g] = (math.sqrt(ssw / nj), means)
    worst = {}
    for a in stats:
        best = None
        for b in stats:
            if a == b:
                continue
            d2 = sum((x - y) ** 2 for x, y in zip(stats[a][1], stats[b][1]))
            if d2 > 0:
                r = (stats[a][0] + stats[b][0]) / math.sqrt(d2)
                best = r if best is None else max(best, r)
        worst[a] = best
    return sum(worst[g] for g in sorted(worst)) / len(worst)


class TestDaviesBouldin:
    def _df(self, spark, points):
        rows = [(g, [float(x) for x in v]) for g, vs in points.items() for v in vs]
        return spark.createDataFrame(rows, "cl string, embedding array<double>")

    def test_matches_python_reference(self, spark):
        points = {
            "a": [[0.1, 0.2], [0.15, 0.25], [0.12, 0.18]],
            "b": [[0.4, -0.3], [0.45, -0.25], [0.38, -0.33]],
            "c": [[-0.2, -0.1], [-0.22, -0.05]],
        }
        out = davies_bouldin(self._df(spark, points), "cl").collect()[0]
        assert out["db"] == pytest.approx(_db_py(points), rel=1e-9)
        assert out["k"] == 3 and out["n"] == 8

    def test_tight_separated_lower_than_mixed(self, spark):
        tight = {
            "a": [[0.0, 0.0], [0.001, 0.0], [0.0, 0.001]],
            "b": [[0.4, 0.4], [0.401, 0.4], [0.4, 0.401]],
        }
        mixed = {
            "a": [[0.0, 0.0], [0.4, 0.4], [0.0, 0.001]],
            "b": [[0.001, 0.0], [0.401, 0.4], [0.4, 0.401]],
        }
        a = davies_bouldin(self._df(spark, tight), "cl").collect()[0]["db"]
        b = davies_bouldin(self._df(spark, mixed), "cl").collect()[0]["db"]
        assert a < b / 100

    def test_identical_means_null(self, spark):
        points = {"a": [[0.1, 0.1], [0.3, 0.3]], "b": [[0.3, 0.3], [0.1, 0.1]]}
        out = davies_bouldin(self._df(spark, points), "cl").collect()[0]
        assert out["db"] is None

    def test_single_cluster_null(self, spark):
        points = {"a": [[0.1, 0.2], [0.2, 0.1]]}
        out = davies_bouldin(self._df(spark, points), "cl").collect()[0]
        assert out["db"] is None and out["k"] == 1

    def test_agrees_with_ch_ranking(self, spark):
        # better partitions: higher CH, lower DB
        import random

        rng = random.Random(3)
        good = {
            g: [[c + rng.uniform(-0.01, 0.01) for _ in range(4)]
                for _ in range(10)]
            for g, c in (("a", -0.3), ("b", 0.0), ("c", 0.3))
        }
        bad = {
            g: [[rng.uniform(-0.4, 0.4) for _ in range(4)] for _ in range(10)]
            for g in ("a", "b", "c")
        }
        chg = calinski_harabasz(self._df(spark, good), "cl").collect()[0]["ch"]
        chb = calinski_harabasz(self._df(spark, bad), "cl").collect()[0]["ch"]
        dbg = davies_bouldin(self._df(spark, good), "cl").collect()[0]["db"]
        dbb = davies_bouldin(self._df(spark, bad), "cl").collect()[0]["db"]
        assert chg > chb and dbg < dbb


def _ap_py(pred_items, rel_set, k):
    hits = 0
    ap = 0.0
    for d, it in enumerate(pred_items[:k], start=1):
        if it in rel_set:
            hits += 1
            ap += hits / d
    denom = min(len(rel_set), k)
    return (ap / denom if denom else None), hits


class TestAveragePrecision:
    def _frames(self, spark, pred_items, rel, q="q1"):
        pred = spark.createDataFrame(
            [(q, i + 1, it) for i, it in enumerate(pred_items)],
            "query_id string, rank int, item string",
        )
        truth = spark.createDataFrame(
            [(q, it) for it in rel], "query_id string, item string"
        )
        return pred, truth

    def test_matches_python_reference(self, spark):
        pred_items = ["a", "x", "b", "y", "c"]
        rel = {"a", "b", "c", "z"}
        pred, truth = self._frames(spark, pred_items, rel)
        out = average_precision(pred, truth, k=5).collect()[0]
        ap, hits = _ap_py(pred_items, rel, 5)
        assert out["ap"] == ap and out["hits"] == hits
        assert out["n_rel"] == 4

    def test_perfect_ranking_is_one(self, spark):
        pred, truth = self._frames(spark, ["a", "b"], {"a", "b"})
        out = average_precision(pred, truth, k=5).collect()[0]
        assert out["ap"] == 1.0

    def test_no_hits_zero(self, spark):
        pred, truth = self._frames(spark, ["x", "y"], {"a"})
        out = average_precision(pred, truth, k=5).collect()[0]
        assert out["ap"] == 0.0

    def test_truth_only_query_zero(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a"})
        truth2 = truth.union(
            spark.createDataFrame(
                [("q9", "z")], "query_id string, item string"
            )
        )
        rows = {r["query_id"]: r for r in
                average_precision(pred, truth2, k=3).collect()}
        assert rows["q9"]["ap"] == 0.0 and rows["q1"]["ap"] == 1.0

    def test_pred_only_query_null(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a"})
        pred2 = pred.union(
            spark.createDataFrame(
                [("q8", 1, "w")], "query_id string, rank int, item string"
            )
        )
        rows = {r["query_id"]: r for r in
                average_precision(pred2, truth, k=3).collect()}
        assert rows["q8"]["ap"] is None and rows["q8"]["n_rel"] is None

    def test_duplicate_rank_refused(self, spark):
        pred = spark.createDataFrame(
            [("q", 1, "a"), ("q", 1, "b")],
            "query_id string, rank int, item string",
        )
        truth = spark.createDataFrame(
            [("q", "a")], "query_id string, item string"
        )
        with pytest.raises(ValueError, match="duplicate"):
            average_precision(pred, truth, k=3)
