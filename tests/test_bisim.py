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

    def test_k1_refines_exactly_like_charsets(self, spark):
        # class_0 is constant, so the depth-1 signature reduces to the
        # predicate SET — A(1) must induce the same partition of
        # subjects as characteristic sets (graph/charsets.py, L60)
        rows = [
            ("s%d" % (i % 8), "p%d" % ((i * 3) % 4), "o%d" % (i % 5))
            for i in range(40)
        ]
        t = _t(spark, rows)
        k1 = _cls(bisimulation_classes(t, k=1))
        from pyspark.sql import functions as F

        psets = {
            r["s"]: tuple(r["ps"])
            for r in t.groupBy("s")
            .agg(F.sort_array(F.collect_set("p")).alias("ps"))
            .collect()
        }
        # same partition: bisim class equality <=> predicate-set equality
        by_cls = {}
        for s, ps in psets.items():
            by_cls.setdefault(k1[s], set()).add(ps)
        assert all(len(v) == 1 for v in by_cls.values())
        assert len(by_cls) == len({ps for ps in psets.values()})

    def test_parallelism_independent(self, spark):
        rows = [
            ("n%d" % (i % 9), "p%d" % (i % 2), "n%d" % ((i * 5 + 2) % 9))
            for i in range(30)
        ]
        a = _cls(bisimulation_classes(_t(spark, rows).repartition(1), k=3))
        b = _cls(bisimulation_classes(_t(spark, rows).repartition(16), k=3))
        assert a == b
