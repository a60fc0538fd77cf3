"""Reification (graph/reify.py, L73): four-triple lift, deterministic
node minting, round-trip, dedup, malformed lowering."""

from lmss_entity_extractor_spark.graph.reify import reify, unreify


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _g(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


class TestReify:
    def test_four_triples_per_input(self, spark):
        out = reify(_t(spark, [("a", "knows", "b")])).collect()
        assert len(out) == 4
        nodes = {r["s"] for r in out}
        assert len(nodes) == 1
        preds = {r["p"] for r in out}
        assert preds == {"rdf:type", "rdf:subject", "rdf:predicate", "rdf:object"}

    def test_same_triple_same_node_across_calls(self, spark):
        n1 = {r["s"] for r in reify(_t(spark, [("a", "p", "b")])).collect()}
        n2 = {r["s"] for r in reify(_t(spark, [("x", "q", "y"), ("a", "p", "b")])).collect()}
        assert n1 <= n2

    def test_duplicate_input_collapses(self, spark):
        out = reify(_t(spark, [("a", "p", "b"), ("a", "p", "b")]))
        assert out.count() == 4

    def test_round_trip(self, spark):
        rows = [("a", "knows", "b"), ("b", "worksAt", "acme"), ("a", "knows", "b")]
        t = _t(spark, rows)
        assert _g(unreify(reify(t))) == {
            ("a", "knows", "b"),
            ("b", "worksAt", "acme"),
        }

    def test_unreify_ignores_plain_and_incomplete(self, spark):
        rows = [
            ("n1", "rdf:subject", "a"),
            ("n1", "rdf:predicate", "p"),
            ("n1", "rdf:object", "b"),
            ("n2", "rdf:subject", "x"),  # incomplete: no predicate/object
            ("e", "plain", "f"),
        ]
        assert _g(unreify(_t(spark, rows))) == {("a", "p", "b")}

    def test_separator_prevents_boundary_collisions(self, spark):
        # ("ab","c","d") vs ("a","bc","d") must mint different nodes
        n = {
            r["s"]
            for r in reify(_t(spark, [("ab", "c", "d"), ("a", "bc", "d")])).collect()
        }
        assert len(n) == 2
