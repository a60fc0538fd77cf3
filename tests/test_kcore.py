"""k-core (graph/kcore.py, L65): hand-peeled fixtures — pendant chains,
cascading removals, bridged cliques, self-loops, empty cores."""

import pytest

from lmss_entity_extractor_spark.graph.kcore import kcore


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _by_node(df):
    return {r["node"]: r["degree"] for r in df.collect()}


class TestKCore:
    def test_triangle_with_pendant_chain(self, spark):
        # triangle a-b-c, chain c-d-e: e peels (deg 1), then d, leaving
        # the triangle as the 2-core
        e = _edges(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        )
        assert _by_node(kcore(e, k=2)) == {"a": 2, "b": 2, "c": 2}

    def test_chain_cascades_to_empty(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        assert kcore(e, k=2).count() == 0

    def test_bridged_cliques_keep_bridge(self, spark):
        k4a = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        k4b = [("e", "f"), ("e", "g"), ("e", "h"), ("f", "g"), ("f", "h"), ("g", "h")]
        got = _by_node(kcore(_edges(spark, k4a + k4b + [("d", "e")]), k=3))
        assert got == {"a": 3, "b": 3, "c": 3, "d": 4, "e": 4, "f": 3, "g": 3, "h": 3}

    def test_self_loop_dropped(self, spark):
        e = _edges(spark, [("x", "x"), ("a", "b")])
        assert _by_node(kcore(e, k=1)) == {"a": 1, "b": 1}

    def test_duplicate_and_reverse_edges_count_once(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "b")])
        assert _by_node(kcore(e, k=1)) == {"a": 1, "b": 1}
        assert kcore(e, k=2).count() == 0

    def test_k_validation_and_round_bound(self, spark):
        e = _edges(spark, [("a", "b")])
        with pytest.raises(ValueError):
            kcore(e, k=0)
        # a 4-chain needs 2 peel rounds for k=2; max_rounds=1 must fail loudly
        chain = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        with pytest.raises(RuntimeError, match="did not converge"):
            kcore(chain, k=2, max_rounds=1)
