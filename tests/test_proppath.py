"""Property paths (graph/proppath.py, L55): every combinator
hand-checked, including zero-length term semantics, nesting, and the
set-semantics contract."""

import pytest

from lmss_entity_extractor_spark.graph.proppath import property_path


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _pairs(df):
    return {(r["subj"], r["obj"]) for r in df.collect()}


@pytest.fixture(scope="module")
def graph(spark):
    """a -in-> b -in-> c; a -via-> c; x -alt_p-> y."""
    return _triples(
        spark,
        [
            ("a", "in", "b"),
            ("b", "in", "c"),
            ("a", "via", "c"),
            ("x", "alt_p", "y"),
        ],
    )


TERMS = {"a", "b", "c", "x", "y"}
IDENT = {(t, t) for t in TERMS}


class TestPropertyPath:
    def test_atomic(self, spark, graph):
        assert _pairs(property_path(graph, "in")) == {("a", "b"), ("b", "c")}

    def test_seq(self, spark, graph):
        assert _pairs(property_path(graph, ("seq", "in", "in"))) == {("a", "c")}

    def test_seq_dedups_multiple_witnesses(self, spark):
        # a→m1→z and a→m2→z: one (a, z) row under set semantics
        g = _triples(
            spark,
            [("a", "p", "m1"), ("a", "p", "m2"), ("m1", "q", "z"), ("m2", "q", "z")],
        )
        out = property_path(g, ("seq", "p", "q"))
        assert _pairs(out) == {("a", "z")}
        assert out.count() == 1

    def test_alt(self, spark, graph):
        assert _pairs(property_path(graph, ("alt", "in", "via"))) == {
            ("a", "b"),
            ("b", "c"),
            ("a", "c"),
        }

    def test_inv(self, spark, graph):
        assert _pairs(property_path(graph, ("inv", "in"))) == {("b", "a"), ("c", "b")}

    def test_plus(self, spark, graph):
        assert _pairs(property_path(graph, ("plus", "in"))) == {
            ("a", "b"),
            ("b", "c"),
            ("a", "c"),
        }

    def test_star_includes_all_terms(self, spark, graph):
        got = _pairs(property_path(graph, ("star", "in")))
        assert got == {("a", "b"), ("b", "c"), ("a", "c")} | IDENT

    def test_opt(self, spark, graph):
        assert _pairs(property_path(graph, ("opt", "via"))) == {("a", "c")} | IDENT

    def test_nested_inv_plus(self, spark, graph):
        # (^in)+ = descendants seen from above
        assert _pairs(property_path(graph, ("plus", ("inv", "in")))) == {
            ("b", "a"),
            ("c", "b"),
            ("c", "a"),
        }

    def test_seq_with_star_tail(self, spark, graph):
        # via / in* : a→c, then zero or more 'in' hops from c
        assert _pairs(property_path(graph, ("seq", "via", ("star", "in")))) == {
            ("a", "c")
        }

    def test_plus_on_cycle_terminates(self, spark):
        g = _triples(spark, [("a", "p", "b"), ("b", "p", "a")])
        assert _pairs(property_path(g, ("plus", "p"))) == {
            ("a", "b"),
            ("b", "a"),
            ("a", "a"),
            ("b", "b"),
        }

    def test_validation(self, spark, graph):
        with pytest.raises(ValueError, match="bad path expression"):
            property_path(graph, ("bogus", "in"))
        with pytest.raises(ValueError, match="exactly one"):
            property_path(graph, ("plus", "in", "in"))
        with pytest.raises(ValueError, match="at least two"):
            property_path(graph, ("seq", "in"))
        with pytest.raises(ValueError, match="bad path expression"):
            property_path(graph, 42)


class TestNegatedPropertySet:
    def test_neg_single(self, spark, graph):
        # !(in) = via + alt_p triples
        assert _pairs(property_path(graph, ("neg", "in"))) == {
            ("a", "c"),
            ("x", "y"),
        }

    def test_neg_multi(self, spark, graph):
        assert _pairs(property_path(graph, ("neg", "in", "via"))) == {("x", "y")}

    def test_neg_of_everything_is_empty(self, spark, graph):
        assert (
            property_path(graph, ("neg", "in", "via", "alt_p")).count() == 0
        )

    def test_inv_neg_composition(self, spark, graph):
        # !(^in) == ("inv", ("neg", "in")): reversed via/alt_p pairs
        assert _pairs(property_path(graph, ("inv", ("neg", "in")))) == {
            ("c", "a"),
            ("y", "x"),
        }

    def test_neg_in_seq(self, spark, graph):
        # in / !(in): pairs (s, o2) with s -in-> m -(non-in)-> o2; the
        # 'in' targets b and c have no non-'in' out-edges, so: empty
        assert _pairs(property_path(graph, ("seq", "in", ("neg", "in")))) == set()

    def test_neg_validation(self, spark, graph):
        with pytest.raises(ValueError, match="predicate strings"):
            property_path(graph, ("neg",))
        with pytest.raises(ValueError, match="predicate strings"):
            property_path(graph, ("neg", ("inv", "in")))
