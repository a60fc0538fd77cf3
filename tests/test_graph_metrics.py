"""Modularity (L148) + degree assortativity (L149)."""

import pytest

from lmss_entity_extractor_spark.graph.metrics import (
    degree_assortativity,
    modularity,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _comm(spark, mapping):
    return spark.createDataFrame(
        [(str(k), v) for k, v in mapping.items()], "node string, community int"
    )


class TestModularity:
    def test_two_cliques_hand_computed(self, spark):
        # two triangles joined by one bridge; m=7
        pairs = [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ]
        comm = {"a": 0, "b": 0, "c": 0, "x": 1, "y": 1, "z": 1}
        row = modularity(_edges(spark, pairs), _comm(spark, comm)).collect()[0]
        # e_0=3, e_1=3, d_0=7, d_1=7, m=7:
        # Q = (4*7*6 - (49+49)) / (4*49) = (168-98)/196 = 70/196
        assert row["m"] == 7 and row["n_communities"] == 2
        assert row["q"] == pytest.approx(70 / 196, abs=0)

    def test_single_community_zero(self, spark):
        pairs = [("a", "b"), ("b", "c")]
        comm = {"a": 0, "b": 0, "c": 0}
        row = modularity(_edges(spark, pairs), _comm(spark, comm)).collect()[0]
        # all edges intra, d_c = 2m: Q = (4m·m − 4m²)/4m² = 0
        assert row["q"] == 0.0

    def test_self_loop_convention(self, spark):
        # one self-loop only: m=1, e_c=1, d_c=2 -> Q = (4-4)/4 = 0
        row = modularity(
            _edges(spark, [("a", "a")]), _comm(spark, {"a": 0})
        ).collect()[0]
        assert row["q"] == 0.0

    def test_unmapped_node_refused(self, spark):
        with pytest.raises(ValueError, match="missing from the community"):
            modularity(
                _edges(spark, [("a", "b")]), _comm(spark, {"a": 0})
            ).collect()


class TestAssortativity:
    def test_star_is_minus_one(self, spark):
        # star graphs are perfectly disassortative
        row = degree_assortativity(
            _edges(spark, [("h", "a"), ("h", "b"), ("h", "c")])
        ).collect()[0]
        assert row["m"] == 3
        assert row["r"] == pytest.approx(-1.0, abs=0)

    def test_regular_graph_null(self, spark):
        # cycle: every degree 2 -> zero variance -> NULL
        row = degree_assortativity(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        ).collect()[0]
        assert row["r"] is None

    def test_matches_python_pearson(self, spark):
        pairs = [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("d", "e"), ("e", "f"),
        ]
        row = degree_assortativity(_edges(spark, pairs)).collect()[0]
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs, ys = [], []
        for u, v in pairs:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        n = len(xs)
        sx, sxy = sum(xs), sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
        assert row["r"] == pytest.approx(r, rel=1e-15)

    def test_parallelism_invariant(self, spark):
        pairs = [(f"u{i % 17}", f"v{(i * 7) % 23}") for i in range(300)]
        df = _edges(spark, pairs)
        a = degree_assortativity(df.repartition(1)).collect()[0]
        b = degree_assortativity(df.repartition(16)).collect()[0]
        assert a["r"] == b["r"]
