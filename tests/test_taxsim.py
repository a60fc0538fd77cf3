"""Wu-Palmer taxonomic similarity (graph/taxsim.py, L78):
hand-computed depths/LCAs on a small tree, diamond (multiple
inheritance) tie behavior, forest pairs dropped."""

import pytest

from lmss_entity_extractor_spark.graph.taxsim import wu_palmer


def _anc(spark, rows):
    return spark.createDataFrame(rows, "node string, anc string, anc_depth int")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


@pytest.fixture(scope="module")
def tree(spark):
    # r(1) -> a(2), b(2); a -> a1(3), a2(3)
    rows = []
    chains = {
        "r": ["r"],
        "a": ["a", "r"],
        "b": ["b", "r"],
        "a1": ["a1", "a", "r"],
        "a2": ["a2", "a", "r"],
    }
    depth = {"r": 1, "a": 2, "b": 2, "a1": 3, "a2": 3}
    for node, ancs in chains.items():
        for anc in ancs:
            rows.append((node, anc, depth[anc]))
    return _anc(spark, rows)


class TestWuPalmer:
    def test_hand_computed(self, spark, tree):
        out = wu_palmer(
            tree, _pairs(spark, [("a1", "a2"), ("a1", "b"), ("a1", "a1")])
        )
        got = {(r["a"], r["b"]): r for r in out.collect()}
        sib = got[("a1", "a2")]
        assert (sib["lca"], sib["lca_depth"]) == ("a", 2)
        assert sib["wup"] == pytest.approx(2 * 2 / (3 + 3))
        far = got[("a1", "b")]
        assert (far["lca"], far["lca_depth"]) == ("r", 1)
        assert far["wup"] == pytest.approx(2 * 1 / (3 + 2))
        self_ = got[("a1", "a1")]
        assert (self_["lca"], self_["wup"]) == ("a1", 1.0)

    def test_forest_pair_absent(self, spark, tree):
        iso = tree.unionByName(
            _anc(spark, [("z", "z", 1)])  # disconnected root
        )
        out = wu_palmer(iso, _pairs(spark, [("a1", "z"), ("a1", "b")]))
        keys = {(r["a"], r["b"]) for r in out.collect()}
        assert keys == {("a1", "b")}  # no common ancestor -> dropped

    def test_diamond_tie_depth_independent(self, spark):
        # d inherits from both b and c (depth 2); LCA(a_leaf, d) ties at
        # depth 2 between b and c -> greatest node id wins, depth same
        rows = [
            ("r", "r", 1),
            ("b", "b", 2), ("b", "r", 1),
            ("c", "c", 2), ("c", "r", 1),
            ("d", "d", 3), ("d", "b", 2), ("d", "c", 2), ("d", "r", 1),
            ("e", "e", 3), ("e", "b", 2), ("e", "c", 2), ("e", "r", 1),
        ]
        out = wu_palmer(_anc(spark, rows), _pairs(spark, [("d", "e")]))
        r = out.collect()[0]
        assert r["lca"] == "c"          # tie at depth 2 -> max node id
        assert r["lca_depth"] == 2      # depth (and wup) tie-independent
        assert r["wup"] == pytest.approx(2 * 2 / (3 + 3))
