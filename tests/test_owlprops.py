"""OWL property rules (graph/owlprops.py, L71): hand-computed
inverse/symmetric/transitive entailments and their interactions."""

import pytest

from lmss_entity_extractor_spark.graph.owlprops import _mirror_map, owl_entail


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _triples(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


class TestMirrorMap:
    def test_inverse_pair(self):
        assert _mirror_map([("p", "q")], []) == [("p", "q", 1), ("q", "p", 1)]

    def test_inverse_chain_composes_parity(self):
        got = set(_mirror_map([("p", "q"), ("q", "r")], []))
        assert ("p", "r", 0) in got  # inverse of inverse: same orientation
        assert ("p", "q", 1) in got and ("r", "q", 1) in got

    def test_symmetry_propagates_through_inverse(self):
        got = set(_mirror_map([("p", "q")], ["p"]))
        # p symmetric + p inv q  =>  q carries both orientations of p
        assert {("p", "p", 1), ("p", "q", 1), ("p", "q", 0)} <= got


class TestOwlEntail:
    def test_inverse_both_directions(self, spark):
        rows = [
            ("hasParent", "owl:inverseOf", "hasChild"),
            ("a", "hasParent", "b"),
            ("y", "hasChild", "x"),
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert ("b", "hasChild", "a") in got
        assert ("x", "hasParent", "y") in got
        assert ("hasParent", "owl:inverseOf", "hasChild") in got  # schema kept

    def test_symmetric(self, spark):
        rows = [
            ("knows", "rdf:type", "owl:SymmetricProperty"),
            ("a", "knows", "b"),
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert ("b", "knows", "a") in got

    def test_transitive_chain(self, spark):
        rows = [
            ("anc", "rdf:type", "owl:TransitiveProperty"),
            ("a", "anc", "b"),
            ("b", "anc", "c"),
            ("c", "anc", "d"),
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert {("a", "anc", "c"), ("a", "anc", "d"), ("b", "anc", "d")} <= got

    def test_inverse_of_transitive_gets_closure_mirrored(self, spark):
        rows = [
            ("anc", "owl:inverseOf", "desc"),
            ("anc", "rdf:type", "owl:TransitiveProperty"),
            ("a", "anc", "b"),
            ("b", "anc", "c"),
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert ("a", "anc", "c") in got
        assert {("b", "desc", "a"), ("c", "desc", "b"), ("c", "desc", "a")} <= got

    def test_transitivity_composes_across_mirrored_edges(self, spark):
        # one leg asserted on desc only: anc's closure must see it
        rows = [
            ("anc", "owl:inverseOf", "desc"),
            ("anc", "rdf:type", "owl:TransitiveProperty"),
            ("a", "anc", "b"),
            ("c", "desc", "b"),  # == (b anc c)
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert ("a", "anc", "c") in got
        assert ("c", "desc", "a") in got

    def test_unmarked_predicates_untouched(self, spark):
        rows = [("a", "likes", "b")]
        got = _triples(owl_entail(_t(spark, rows)))
        assert got == {("a", "likes", "b")}

    def test_other_type_rows_pass_through(self, spark):
        rows = [
            ("knows", "rdf:type", "owl:SymmetricProperty"),
            ("a", "rdf:type", "Person"),
            ("a", "knows", "b"),
        ]
        got = _triples(owl_entail(_t(spark, rows)))
        assert ("a", "rdf:type", "Person") in got
        assert ("b", "knows", "a") in got
