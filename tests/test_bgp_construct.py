"""SPARQL CONSTRUCT (graph/bgp.py bgp_construct, L72): template
instantiation, unbound-OPTIONAL omission, constants, set semantics."""

import pytest

from lmss_entity_extractor_spark.graph.bgp import bgp_construct

TRIPLES = [
    ("alice", "worksAt", "acme"),
    ("bob", "worksAt", "acme"),
    ("carol", "worksAt", "initech"),
    ("acme", "locatedIn", "berlin"),
]


def _t(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def _g(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


class TestBgpConstruct:
    def test_rewrite_predicate(self, spark):
        got = _g(
            bgp_construct(
                _t(spark),
                [("?x", "worksAt", "?org")],
                [("?org", "employs", "?x")],
            )
        )
        assert got == {
            ("acme", "employs", "alice"),
            ("acme", "employs", "bob"),
            ("initech", "employs", "carol"),
        }

    def test_multi_template_and_constants(self, spark):
        got = _g(
            bgp_construct(
                _t(spark),
                [("?x", "worksAt", "?org")],
                [("?x", "rdf:type", "Employee"), ("?org", "rdf:type", "Org")],
            )
        )
        # set semantics: acme appears once despite two employees
        assert got == {
            ("alice", "rdf:type", "Employee"),
            ("bob", "rdf:type", "Employee"),
            ("carol", "rdf:type", "Employee"),
            ("acme", "rdf:type", "Org"),
            ("initech", "rdf:type", "Org"),
        }

    def test_unbound_optional_omits_triple_not_solution(self, spark):
        got = _g(
            bgp_construct(
                _t(spark),
                [("?x", "worksAt", "?org")],
                [("?x", "basedIn", "?city"), ("?x", "rdf:type", "Employee")],
                optional=[[("?org", "locatedIn", "?city")]],
            )
        )
        # carol's org has no location: her basedIn triple is omitted,
        # her Employee triple is kept
        assert ("alice", "basedIn", "berlin") in got
        assert ("bob", "basedIn", "berlin") in got
        assert ("carol", "rdf:type", "Employee") in got
        assert not any(s == "carol" and p == "basedIn" for s, p, _ in got)

    def test_unknown_template_variable_rejected(self, spark):
        with pytest.raises(ValueError, match="not bound"):
            bgp_construct(
                _t(spark), [("?x", "worksAt", "?org")], [("?x", "p", "?nope")]
            )

    def test_empty_template_rejected(self, spark):
        with pytest.raises(ValueError, match="empty template"):
            bgp_construct(_t(spark), [("?x", "worksAt", "?org")], [])
