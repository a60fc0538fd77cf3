"""Kendall's W (L247) and Hellinger/Bhattacharyya distance (L248)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.infotheory import hellinger_distance
from lmss_entity_extractor_spark.ops.rankeval import kendalls_w


class TestKendallsW:
    def _df(self, spark, raters):
        rows = [
            (i, item, float(score))
            for i, ranking in enumerate(raters)
            for item, score in ranking.items()
        ]
        return spark.createDataFrame(rows, "r int, item string, v double")

    def test_perfect_concordance_is_one(self, spark):
        ranking = {"a": 1, "b": 2, "c": 3, "d": 4}
        out = kendalls_w(
            self._df(spark, [ranking] * 5), [], "r", "item", "v"
        ).collect()[0]
        assert out["w"] == pytest.approx(1.0)

    def test_textbook_value(self, spark):
        # classic no-tie example: W = 12*S / (m^2 k (k^2-1)) with
        # S = sum (R_j - mean R)^2
        raters = [
            {"a": 1, "b": 2, "c": 3, "d": 4},
            {"a": 2, "b": 1, "c": 4, "d": 3},
            {"a": 1, "b": 3, "c": 2, "d": 4},
        ]
        m, k = 3, 4
        rsums = {it: sum(r[it] for r in raters) for it in "abcd"}
        mean = sum(rsums.values()) / k
        s = sum((v - mean) ** 2 for v in rsums.values())
        w_ref = 12 * s / (m * m * k * (k * k - 1))
        out = kendalls_w(
            self._df(spark, raters), [], "r", "item", "v"
        ).collect()[0]
        assert out["w"] == pytest.approx(w_ref, rel=1e-12)

    def test_identity_with_friedman(self, spark):
        from lmss_entity_extractor_spark.ops.rankeval import friedman

        raters = [
            {"a": 1, "b": 2, "c": 2},
            {"a": 3, "b": 1, "c": 2},
            {"a": 1, "b": 1, "c": 3},
            {"a": 2, "b": 3, "c": 1},
        ]
        df = self._df(spark, raters)
        q = friedman(df, [], "r", "item", "v").collect()[0]["q"]
        w = kendalls_w(df, [], "r", "item", "v").collect()[0]["w"]
        assert w == q / (4 * (3 - 1))


def _hell_py(a, b):
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    bc = 0.0
    for v in sorted(set(a) | set(b)):
        bc = bc + math.sqrt((ca[v] / na) * (cb[v] / nb))
    h = math.sqrt(max(0.0, 1.0 - bc))
    return bc, h, (-math.log(bc) if bc > 0 else None)


class TestHellinger:
    def _df(self, spark, a, b, g="g1"):
        rows = [(g, "A", str(v)) for v in a] + [(g, "B", str(v)) for v in b]
        return spark.createDataFrame(rows, "g string, s string, v string")

    def test_matches_python_reference(self, spark):
        a = list("aaabbbccd")
        b = list("abbccccdd")
        out = hellinger_distance(
            self._df(spark, a, b), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        bc, h, d = _hell_py(a, b)
        assert out["bc"] == bc and out["hellinger"] == h
        assert out["bhattacharyya"] == d

    def test_identical_distributions_zero(self, spark):
        a = list("aabbcc")
        out = hellinger_distance(
            self._df(spark, a, a), ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert out["hellinger"] == pytest.approx(0.0, abs=1e-8)

    def test_disjoint_supports_one(self, spark):
        out = hellinger_distance(
            self._df(spark, list("aab"), list("ccd")),
            ["g"], "s", "A", "B", "v",
        ).collect()[0]
        assert out["hellinger"] == 1.0
        assert out["bhattacharyya"] is None

    def test_empty_side_null(self, spark):
        df = self._df(spark, list("ab"), [])
        out = hellinger_distance(
            df, ["g"], "s", "A", "B", "v"
        ).collect()[0]
        assert out["hellinger"] is None and out["n_b"] == 0
