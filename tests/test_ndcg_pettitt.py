"""NDCG@k (L221) and the Pettitt changepoint test (L222)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.changepoint import pettitt
from lmss_entity_extractor_spark.ops.evalmetrics import ndcg


def _ndcg_py(pred_items, grades, k, gain="linear"):
    """Mirror of the operator's fold: weights in d order, left-assoc."""
    def g(r):
        return (2**r - 1) if gain == "exp" else r

    dcg = 0.0
    for d, it in enumerate(pred_items[:k], start=1):
        dcg = dcg + (1.0 / math.log2(d + 1)) * float(g(grades.get(it, 0)))
    ideal = sorted(grades.values(), reverse=True)[:k]
    idcg = 0.0
    for d, r in enumerate(ideal, start=1):
        idcg = idcg + (1.0 / math.log2(d + 1)) * float(g(r))
    return dcg, idcg, (dcg / idcg if idcg > 0 else None)


class TestNdcg:
    def _frames(self, spark, pred_items, grades, q="q1"):
        pred = spark.createDataFrame(
            [(q, i + 1, it) for i, it in enumerate(pred_items)],
            "query_id string, rank int, item string",
        )
        truth = spark.createDataFrame(
            [(q, it, r) for it, r in grades.items()],
            "query_id string, item string, rel int",
        )
        return pred, truth

    def test_matches_python_reference(self, spark):
        pred_items = ["c", "a", "e", "b", "d"]
        grades = {"a": 3, "b": 2, "c": 3, "d": 0, "e": 1, "f": 2}
        pred, truth = self._frames(spark, pred_items, grades)
        out = ndcg(pred, truth, k=5).collect()[0]
        dcg, idcg, nd = _ndcg_py(pred_items, grades, 5)
        assert out["dcg"] == dcg
        assert out["idcg"] == idcg
        assert out["ndcg"] == nd
        assert out["n_rel"] == 5

    def test_perfect_ranking_is_one(self, spark):
        grades = {"a": 3, "b": 2, "c": 1}
        pred, truth = self._frames(spark, ["a", "b", "c"], grades)
        out = ndcg(pred, truth, k=3).collect()[0]
        assert out["ndcg"] == 1.0

    def test_exp_gain(self, spark):
        pred_items = ["b", "a"]
        grades = {"a": 4, "b": 1}
        pred, truth = self._frames(spark, pred_items, grades)
        out = ndcg(pred, truth, k=2, gain="exp").collect()[0]
        dcg, idcg, nd = _ndcg_py(pred_items, grades, 2, gain="exp")
        assert out["dcg"] == dcg and out["idcg"] == idcg and out["ndcg"] == nd

    def test_truth_only_query_scores_zero(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a": 2})
        truth2 = truth.union(
            spark.createDataFrame(
                [("q2", "z", 3)], "query_id string, item string, rel int"
            )
        )
        rows = {r["query_id"]: r for r in ndcg(pred, truth2, k=3).collect()}
        assert rows["q2"]["dcg"] == 0.0
        assert rows["q2"]["ndcg"] == 0.0
        assert rows["q1"]["ndcg"] == 1.0

    def test_pred_only_query_null_idcg(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a": 2})
        pred2 = pred.union(
            spark.createDataFrame(
                [("q3", 1, "y")], "query_id string, rank int, item string"
            )
        )
        rows = {r["query_id"]: r for r in ndcg(pred2, truth, k=3).collect()}
        assert rows["q3"]["idcg"] is None and rows["q3"]["ndcg"] is None
        assert rows["q3"]["n_rel"] is None

    def test_all_zero_grades_null_ndcg(self, spark):
        pred, truth = self._frames(spark, ["a", "b"], {"a": 0, "b": 0})
        out = ndcg(pred, truth, k=2).collect()[0]
        assert out["idcg"] == 0.0 and out["ndcg"] is None and out["n_rel"] == 0

    def test_duplicate_rank_refused(self, spark):
        pred = spark.createDataFrame(
            [("q1", 1, "a"), ("q1", 1, "b")],
            "query_id string, rank int, item string",
        )
        truth = spark.createDataFrame(
            [("q1", "a", 1)], "query_id string, item string, rel int"
        )
        with pytest.raises(ValueError, match="duplicate"):
            ndcg(pred, truth, k=3)

    def test_negative_grade_refused(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a": 1})
        bad = truth.union(
            spark.createDataFrame(
                [("q1", "b", -1)], "query_id string, item string, rel int"
            )
        )
        with pytest.raises(ValueError, match="negative"):
            ndcg(pred, bad, k=3)

    def test_validation_params(self, spark):
        pred, truth = self._frames(spark, ["a"], {"a": 1})
        with pytest.raises(ValueError, match="k must"):
            ndcg(pred, truth, k=0)
        with pytest.raises(ValueError, match="gain"):
            ndcg(pred, truth, k=1, gain="log")


def _pettitt_py(xs):
    """Brute-force reference with average ranks."""
    n = len(xs)
    s = sorted(xs)
    # doubled average rank = 2*(#below) + (#tied) + 1
    d = [2 * sum(1 for v in xs if v < x) + sum(1 for v in xs if v == x) + 1
         for x in xs]
    best_u, best_t = -1, None
    w2 = 0
    for t in range(1, n):
        w2 += d[t - 1]
        u = abs(w2 - t * (n + 1))
        if u > best_u:
            best_u, best_t = u, t
    return n, best_u, best_t


class TestPettitt:
    def _df(self, spark, xs, g="s1"):
        return spark.createDataFrame(
            [(g, i + 1, float(x)) for i, x in enumerate(xs)],
            "g string, t int, x double",
        )

    def test_matches_brute_force_with_ties(self, spark):
        xs = [1.0, 2.0, 2.0, 1.0, 3.0, 9.0, 8.0, 9.0, 7.0, 8.0, 2.0]
        out = pettitt(self._df(spark, xs), ["g"], "t", "x").collect()[0]
        n, u, t = _pettitt_py(xs)
        assert (out["n"], out["u_abs"], out["t_index"]) == (n, u, t)
        assert out["t_split"] == t  # t column is 1..n
        assert out["stat"] == (6.0 * float(u) * float(u)) / (
            float(n) ** 3 + float(n) ** 2
        )

    def test_detects_mean_shift_at_split(self, spark):
        xs = [1.0] * 10 + [100.0] * 10
        out = pettitt(self._df(spark, xs), ["g"], "t", "x").collect()[0]
        assert out["t_index"] == 10
        # max possible |U| for a clean split: t*(n-t)*2/... exact: all
        # left ranks below all right ranks
        assert out["u_abs"] == 100

    def test_earliest_argmax_on_ties(self, spark):
        # symmetric series: |U| ties across t; earliest wins
        xs = [1.0, 2.0, 2.0, 1.0]
        out = pettitt(self._df(spark, xs), ["g"], "t", "x").collect()[0]
        n, u, t = _pettitt_py(xs)
        assert out["t_index"] == t

    def test_multiple_keys_and_n1_omitted(self, spark):
        df = self._df(spark, [1.0, 5.0, 5.0], "a").union(
            self._df(spark, [7.0], "b")
        )
        rows = pettitt(df, ["g"], "t", "x").collect()
        assert {r["g"] for r in rows} == {"a"}

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 1.0), ("g", 2, None)], "g string, t int, x double"
        )
        with pytest.raises(ValueError, match="NULL"):
            pettitt(df, ["g"], "t", "x")

    def test_parallelism_invariance(self, spark):
        xs = [float((i * 7) % 13) for i in range(40)]
        df = self._df(spark, xs)
        a = pettitt(df.repartition(1), ["g"], "t", "x").collect()[0]
        b = pettitt(df.repartition(8), ["g"], "t", "x").collect()[0]
        assert a == b
