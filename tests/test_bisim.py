"""k-bisimulation (graph/bisim.py, L74): refinement depth semantics,
predicate sensitivity, sink class, parallelism independence."""

import pytest

from lmss_entity_extractor_spark.graph.bisim import bisimulation_classes


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _cls(df):
    return {r["node"]: r["cls"] for r in df.collect()}


class TestBisimulation:
    def test_k0_everything_one_class(self, spark):
        got = _cls(bisimulation_classes(_t(spark, [("a", "p", "b")]), k=0))
        assert len(set(got.values())) == 1

    def test_k1_groups_by_outgoing_shape(self, spark):
        rows = [
            ("a", "p", "x"),
            ("b", "p", "y"),  # same shape as a
            ("c", "p", "x"),
            ("c", "q", "x"),  # different predicate set
        ]
        got = _cls(bisimulation_classes(_t(spark, rows), k=1))
        assert got["a"] == got["b"]
        assert got["a"] != got["c"]
        assert got["x"] == got["y"]  # sinks share the empty class
        assert got["x"] != got["a"]

    def test_depth_2_separates_what_depth_1_cannot(self, spark):
        # a -> b -> c   vs   d -> e : both have one p-edge at depth 1,
        # but a's neighbor has out-structure while d's is a sink
        rows = [("a", "p", "b"), ("b", "p", "c"), ("d", "p", "e")]
        k1 = _cls(bisimulation_classes(_t(spark, rows), k=1))
        k2 = _cls(bisimulation_classes(_t(spark, rows), k=2))
        assert k1["a"] == k1["d"]
        assert k2["a"] != k2["d"]
        assert k2["b"] == k2["d"]  # b and d both point at a sink

    def test_duplicate_edges_do_not_split_classes(self, spark):
        rows = [("a", "p", "x"), ("a", "p", "x"), ("b", "p", "y")]
        got = _cls(bisimulation_classes(_t(spark, rows), k=2))
        assert got["a"] == got["b"]

    def test_negative_k_rejected(self, spark):
        with pytest.raises(ValueError):
            bisimulation_classes(_t(spark, [("a", "p", "b")]), k=-1)

    def test_parallelism_independent(self, spark):
        rows = [
            ("n%d" % (i % 9), "p%d" % (i % 2), "n%d" % ((i * 5 + 2) % 9))
            for i in range(30)
        ]
        a = _cls(bisimulation_classes(_t(spark, rows).repartition(1), k=3))
        b = _cls(bisimulation_classes(_t(spark, rows).repartition(16), k=3))
        assert a == b
