"""Reciprocal-rank fusion (L443) and rank-biased precision (L444)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.rankeval import (
    rank_biased_precision,
    rrf_fusion,
)


class TestRrfFusion:
    def _run(self, spark, rows, systems, **kw):
        df = spark.createDataFrame(
            rows, "q string, sys string, doc string, rank int"
        )
        return rrf_fusion(
            df, ["q"], "sys", "doc", "rank", systems, **kw
        ).collect()

    def test_hand_computed(self, spark):
        rows = [
            ("q1", "bm25", "d1", 1), ("q1", "bm25", "d2", 2),
            ("q1", "ann", "d2", 1), ("q1", "ann", "d3", 2),
        ]
        out = {r["doc"]: r for r in self._run(spark, rows, ["bm25", "ann"])}
        assert out["d2"]["score"] == pytest.approx(1 / 62 + 1 / 61)
        assert out["d2"]["rank"] == 1
        assert out["d2"]["n_systems"] == 2
        assert out["d1"]["score"] == pytest.approx(1 / 61)
        # d1 (1/61) beats d3 (1/62)
        assert out["d1"]["rank"] == 2

    def test_consensus_beats_single_top(self, spark):
        # a doc ranked 2 by both systems beats a doc ranked 1 by one
        rows = [
            ("q", "a", "top", 1), ("q", "a", "both", 2),
            ("q", "b", "both", 2), ("q", "b", "other", 1),
        ]
        out = {r["doc"]: r["rank"] for r in self._run(spark, rows, ["a", "b"])}
        assert out["both"] == 1

    def test_top_n_bounds(self, spark):
        rows = [("q", "s", f"d{i}", i) for i in range(1, 30)]
        out = self._run(spark, rows, ["s"], top_n=5)
        assert len(out) == 5

    def test_unknown_system_refused(self, spark):
        rows = [("q", "mystery", "d", 1)]
        with pytest.raises(ValueError, match="outside the"):
            self._run(spark, rows, ["bm25"])

    def test_duplicate_refused(self, spark):
        rows = [("q", "s", "d", 1), ("q", "s", "d", 2)]
        with pytest.raises(ValueError, match="duplicate"):
            self._run(spark, rows, ["s"])


class TestRbp:
    def _run(self, spark, rels, **kw):
        df = spark.createDataFrame(
            [("q", i + 1, r) for i, r in enumerate(rels)],
            "q string, rank int, rel int",
        )
        return rank_biased_precision(
            df, ["q"], "rank", "rel", **kw
        ).collect()[0]

    def test_hand_computed(self, spark):
        r = self._run(spark, [1, 0, 1], p="0.5")
        assert r["rbp"] == pytest.approx(0.5 * (1 + 0.25))
        assert r["residual"] == pytest.approx(0.125)

    def test_python_reference(self, spark):
        rels = [1, 1, 0, 1, 0, 0, 1, 0]
        r = self._run(spark, rels, p="0.8")
        want = 0.2 * sum(
            0.8 ** d for d, rel in enumerate(rels) if rel == 1
        )
        assert r["rbp"] == pytest.approx(want, rel=1e-9)
        assert r["residual"] == pytest.approx(0.8 ** 8, rel=1e-9)

    def test_top_heavy_beats_bottom_heavy(self, spark):
        top = self._run(spark, [1, 1, 0, 0], p="0.5")
        bot = self._run(spark, [0, 0, 1, 1], p="0.5")
        assert top["rbp"] > bot["rbp"]

    def test_all_relevant_approaches_one(self, spark):
        r = self._run(spark, [1] * 30, p="0.5")
        assert r["rbp"] == pytest.approx(1.0 - 0.5 ** 30, rel=1e-9)
        assert r["rbp"] + r["residual"] <= 1.0 + 1e-12

    def test_rank_gaps_charge_residual(self, spark):
        # judged ranks {1, 3} at p=0.5: the unjudged rank 2 contributes
        # (1-p)·p to the residual alongside the p^3 tail — scoring it
        # rel=0 for free would understate the Moffat-Zobel uncertainty
        # bound (r4 ADVICE)
        df = spark.createDataFrame(
            [("q", 1, 1), ("q", 3, 0)], "q string, rank int, rel int"
        )
        r = rank_biased_precision(
            df, ["q"], "rank", "rel", p="0.5"
        ).collect()[0]
        assert r["rbp"] == pytest.approx(0.5)
        assert r["residual"] == pytest.approx(0.5 ** 3 + 0.5 * 0.5)
        assert r["rbp"] + r["residual"] <= 1.0 + 1e-12

    def test_residual_upper_bound_tight_when_all_relevant(self, spark):
        r = self._run(spark, [1, 1, 1], p="0.5")
        assert r["rbp"] + r["residual"] == pytest.approx(1.0)

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="p must"):
            self._run(spark, [1], p="1.0")
        df = spark.createDataFrame(
            [("q", 1, 1), ("q", 1, 0)], "q string, rank int, rel int"
        )
        with pytest.raises(ValueError, match="duplicate"):
            rank_biased_precision(df, ["q"], "rank", "rel")
