"""Reciprocity (L187) + conductance (L188)."""

import pytest

from lmss_entity_extractor_spark.graph.metrics import conductance, reciprocity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _comm(spark, mapping):
    return spark.createDataFrame(
        [(str(k), v) for k, v in mapping.items()], "node string, community int"
    )


class TestReciprocity:
    def test_hand_computed(self, spark):
        # a<->b reciprocated, a->c not: m=3 distinct, 2 reciprocated
        pairs = [("a", "b"), ("b", "a"), ("a", "c")]
        r = reciprocity(_edges(spark, pairs)).collect()[0]
        assert (r["m"], r["m_reciprocated"]) == (3, 2)
        assert r["r"] == pytest.approx(2 / 3, abs=0)

    def test_self_loops_and_dups_ignored(self, spark):
        pairs = [("a", "a"), ("a", "b"), ("a", "b")]
        r = reciprocity(_edges(spark, pairs)).collect()[0]
        assert (r["m"], r["m_reciprocated"]) == (1, 0)
        assert r["r"] == 0.0

    def test_fully_symmetric_one(self, spark):
        pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
        r = reciprocity(_edges(spark, pairs)).collect()[0]
        assert r["r"] == 1.0


class TestConductance:
    def test_two_cliques_with_bridge(self, spark):
        pairs = [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ]
        comm = {"a": 0, "b": 0, "c": 0, "x": 1, "y": 1, "z": 1}
        out = {
            r["community"]: r
            for r in conductance(_edges(spark, pairs), _comm(spark, comm)).collect()
        }
        # each side: vol = 7 (6 intra endpoints + 1 bridge endpoint),
        # cut = 1, total = 14 -> phi = 1/7
        for c in (0, 1):
            assert out[c]["vol"] == 7 and out[c]["cut"] == 1
            assert out[c]["phi"] == pytest.approx(1 / 7, abs=0)

    def test_isolated_community_zero(self, spark):
        pairs = [("a", "b"), ("x", "y")]
        comm = {"a": 0, "b": 0, "x": 1, "y": 1}
        out = {
            r["community"]: r["phi"]
            for r in conductance(_edges(spark, pairs), _comm(spark, comm)).collect()
        }
        assert out[0] == 0.0 and out[1] == 0.0

    def test_unmapped_refused(self, spark):
        with pytest.raises(ValueError, match="missing"):
            conductance(
                _edges(spark, [("a", "b")]), _comm(spark, {"a": 0})
            ).collect()
