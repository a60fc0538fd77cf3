"""Elo rating fold (L371) and Expected Reciprocal Rank (L372)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    expected_reciprocal_rank,
)
from lmss_entity_extractor_spark.ops.rating import elo_ratings


def _elo_ref(games, k=32.0, init=1500.0):
    r, n = {}, {}
    for a, b, s in games:
        ra, rb = r.get(a, init), r.get(b, init)
        ea = 1.0 / (1.0 + 10.0 ** ((rb - ra) / 400.0))
        d = k * (s - ea)
        r[a], r[b] = ra + d, rb - d
        n[a] = n.get(a, 0) + 1
        n[b] = n.get(b, 0) + 1
    return r, n


class TestElo:
    def _df(self, spark, games, g="pool"):
        rows = [(g, i, a, b, s) for i, (a, b, s) in enumerate(games)]
        return spark.createDataFrame(
            rows, "pool string, t int, a string, b string, s double"
        )

    GAMES = [
        ("alice", "bob", 1.0),
        ("bob", "carol", 0.0),
        ("alice", "carol", 0.5),
        ("carol", "alice", 1.0),
        ("bob", "alice", 0.0),
        ("carol", "bob", 0.5),
    ]

    def test_vs_python_reference(self, spark):
        out = {
            r["player"]: r
            for r in elo_ratings(
                self._df(spark, self.GAMES),
                ["pool"], ["t"], "a", "b", "s",
            ).collect()
        }
        ref_r, ref_n = _elo_ref(self.GAMES)
        assert set(out) == set(ref_r)
        for p in ref_r:
            assert out[p]["rating"] == pytest.approx(ref_r[p], abs=1e-9)
            assert out[p]["n_games"] == ref_n[p]

    def test_rating_conservation(self, spark):
        out = elo_ratings(
            self._df(spark, self.GAMES), ["pool"], ["t"], "a", "b", "s"
        ).collect()
        assert sum(r["rating"] for r in out) == pytest.approx(
            1500.0 * 3, abs=1e-9
        )

    def test_winner_rises(self, spark):
        games = [("w", "l", 1.0)] * 0 + [
            ("w", "l", 1.0),
        ]
        rows = [("pool", i, "w", "l", 1.0) for i in range(5)]
        df = spark.createDataFrame(
            rows, "pool string, t int, a string, b string, s double"
        )
        out = {r["player"]: r["rating"] for r in elo_ratings(
            df, ["pool"], ["t"], "a", "b", "s"
        ).collect()}
        assert out["w"] > 1550 > 1450 > out["l"]
        # first win moves exactly K/2 = 16 from an even start
        one = {r["player"]: r["rating"] for r in elo_ratings(
            self._df(spark, [("w", "l", 1.0)]), ["pool"], ["t"],
            "a", "b", "s",
        ).collect()}
        assert one["w"] == pytest.approx(1516.0)

    def test_path_dependence_order_matters(self, spark):
        g1 = [("a", "b", 1.0), ("a", "c", 1.0)]
        g2 = [("a", "c", 1.0), ("a", "b", 1.0)]
        r1 = {r["player"]: r["rating"] for r in elo_ratings(
            self._df(spark, g1), ["pool"], ["t"], "a", "b", "s"
        ).collect()}
        r2 = {r["player"]: r["rating"] for r in elo_ratings(
            self._df(spark, g2), ["pool"], ["t"], "a", "b", "s"
        ).collect()}
        # b faces a stronger a in g2's second game than in g1's first
        assert r1["b"] != r2["b"]

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="self-game"):
            elo_ratings(
                self._df(spark, [("x", "x", 1.0)]),
                ["pool"], ["t"], "a", "b", "s",
            )
        with pytest.raises(ValueError, match="score"):
            elo_ratings(
                self._df(spark, [("a", "b", 0.7)]),
                ["pool"], ["t"], "a", "b", "s",
            )
        dup = spark.createDataFrame(
            [("p", 1, "a", "b", 1.0), ("p", 1, "b", "c", 1.0)],
            "pool string, t int, a string, b string, s double",
        )
        with pytest.raises(ValueError, match="order"):
            elo_ratings(dup, ["pool"], ["t"], "a", "b", "s")
        with pytest.raises(ValueError, match="max_players"):
            elo_ratings(
                self._df(spark, self.GAMES), ["pool"], ["t"],
                "a", "b", "s", max_players=2,
            )
        with pytest.raises(ValueError, match="max_games"):
            elo_ratings(
                self._df(spark, self.GAMES), ["pool"], ["t"],
                "a", "b", "s", max_games=3,
            )


def _err_ref(grades, g_max):
    p, err = 1.0, 0.0
    for r, g in enumerate(grades, 1):
        rr = (2**g - 1) / 2**g_max
        err += p * rr / r
        p *= 1 - rr
    return err


class TestERR:
    def _df(self, spark, grades, q="q1"):
        rows = [(q, i, g) for i, g in enumerate(grades)]
        return spark.createDataFrame(rows, "q string, r int, g int")

    def test_vs_python_reference(self, spark):
        grades = [3, 0, 2, 1, 0, 3, 1]
        out = expected_reciprocal_rank(
            self._df(spark, grades), ["q"], ["r"], "g", g_max=3
        ).collect()[0]
        assert out["n"] == 7
        assert out["err"] == pytest.approx(_err_ref(grades, 3), abs=1e-12)

    def test_cascade_beats_ndcg_story(self, spark):
        # perfect first result: everything below contributes almost
        # nothing; swapping it to the bottom collapses ERR
        top = expected_reciprocal_rank(
            self._df(spark, [3, 3, 3]), ["q"], ["r"], "g", g_max=3
        ).collect()[0]["err"]
        bottom = expected_reciprocal_rank(
            self._df(spark, [0, 0, 3]), ["q"], ["r"], "g", g_max=3
        ).collect()[0]["err"]
        assert top > 0.875 and bottom < 0.3

    def test_max_rank_truncation(self, spark):
        grades = [1, 2, 3, 3, 3]
        full = expected_reciprocal_rank(
            self._df(spark, grades), ["q"], ["r"], "g", g_max=3
        ).collect()[0]
        cut = expected_reciprocal_rank(
            self._df(spark, grades), ["q"], ["r"], "g", g_max=3,
            max_rank=2,
        ).collect()[0]
        assert cut["n"] == 2
        assert cut["err"] == pytest.approx(_err_ref(grades[:2], 3), abs=1e-12)
        assert full["err"] > cut["err"]

    def test_all_zero_grades(self, spark):
        out = expected_reciprocal_rank(
            self._df(spark, [0, 0, 0]), ["q"], ["r"], "g", g_max=3
        ).collect()[0]
        assert out["err"] == 0.0

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="grade"):
            expected_reciprocal_rank(
                self._df(spark, [5]), ["q"], ["r"], "g", g_max=3
            )
        dup = spark.createDataFrame(
            [("q", 1, 1), ("q", 1, 2)], "q string, r int, g int"
        )
        with pytest.raises(ValueError, match="duplicate"):
            expected_reciprocal_rank(dup, ["q"], ["r"], "g", g_max=3)
