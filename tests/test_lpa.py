"""Label propagation (graph/lpa.py, L59): community recovery on two
cliques, sync-update semantics hand-checked, determinism, edge cases."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.lpa import label_propagation


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _labels(df):
    return {(r["node"], r["label"]) for r in df.collect()}


def _clique(names):
    return [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]


class TestLabelPropagation:
    def test_two_cliques_bridge(self, spark):
        # K4 on a1..a4 and K4 on b1..b4, one bridge a4-b1: each clique
        # converges to its min label; the bridge does not merge them
        g = _edges(spark, _clique(["a1", "a2", "a3", "a4"]) + _clique(["b1", "b2", "b3", "b4"]) + [("a4", "b1")])
        got = _labels(label_propagation(g, iterations=4))
        by_label = {}
        for node, lab in got:
            by_label.setdefault(lab, set()).add(node)
        assert {frozenset(v) for v in by_label.values()} == {
            frozenset({"a1", "a2", "a3", "a4"}),
            frozenset({"b1", "b2", "b3", "b4"}),
        }

    def test_one_sync_round_hand_computed(self, spark):
        # path x-y-z, ONE sync round from the initial labeling:
        # x's neighbors {y} -> label y; y's neighbors {x,z} -> tie at
        # count 1, min label x wins; z's neighbors {y} -> label y
        g = _edges(spark, [("x", "y"), ("y", "z")])
        got = _labels(label_propagation(g, iterations=1))
        assert got == {("x", "y"), ("y", "x"), ("z", "y")}

    def test_zero_iterations_identity(self, spark):
        g = _edges(spark, [("a", "b")])
        assert _labels(label_propagation(g, iterations=0)) == {
            ("a", "a"),
            ("b", "b"),
        }

    def test_deterministic(self, spark):
        g = _edges(spark, _clique(["a", "b", "c"]) + _clique(["d", "e", "f"]) + [("c", "d")])
        a = _labels(label_propagation(g, iterations=3))
        b = _labels(label_propagation(g, iterations=3))
        assert a == b

    def test_self_loops_dropped(self, spark):
        g = _edges(spark, [("a", "a"), ("a", "b")])
        got = _labels(label_propagation(g, iterations=1))
        assert got == {("a", "b"), ("b", "a")}

    def test_validation(self, spark):
        g = _edges(spark, [("a", "b")])
        with pytest.raises(ValueError, match="iterations"):
            label_propagation(g, iterations=-1)
