"""BGP matching (graph/bgp.py, L54): join composition, repeated
variables, cross products, existence gates, and join-order invariance
— hand-checked on a small graph."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.bgp import bgp_match


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _rows(df):
    return {tuple(r[c] for c in df.columns) for r in df.collect()}


@pytest.fixture(scope="module")
def graph(spark):
    return _triples(
        spark,
        [
            ("o1", "placed_by", "c1"),
            ("o2", "placed_by", "c1"),
            ("o3", "placed_by", "c2"),
            ("c1", "located_in", "n1"),
            ("c2", "located_in", "n2"),
            ("n1", "rdf:type", "Nation"),
            # n2 untyped — drops c2's order from the 3-pattern result
            ("x", "likes", "x"),
            ("x", "likes", "y"),
        ],
    )


class TestBgpMatch:
    def test_chain_join(self, spark, graph):
        out = bgp_match(
            graph,
            [
                ("?o", "placed_by", "?c"),
                ("?c", "located_in", "?n"),
                ("?n", "rdf:type", "Nation"),
            ],
        )
        assert out.columns == ["c", "n", "o"]  # sorted variable names
        assert _rows(out) == {("c1", "n1", "o1"), ("c1", "n1", "o2")}

    def test_join_order_invariant(self, spark, graph):
        pats = [
            ("?o", "placed_by", "?c"),
            ("?c", "located_in", "?n"),
            ("?n", "rdf:type", "Nation"),
        ]
        assert _rows(bgp_match(graph, pats)) == _rows(bgp_match(graph, pats[::-1]))

    def test_repeated_variable_in_pattern(self, spark, graph):
        out = bgp_match(graph, [("?x", "likes", "?x")])
        assert out.columns == ["x"]
        assert _rows(out) == {("x",)}

    def test_constant_subject_and_predicate(self, spark, graph):
        out = bgp_match(graph, [("c1", "located_in", "?n")])
        assert _rows(out) == {("n1",)}

    def test_cross_product_disjoint_patterns(self, spark, graph):
        out = bgp_match(
            graph, [("?n", "rdf:type", "Nation"), ("?x", "likes", "?y")]
        )
        assert _rows(out) == {("n1", "x", "x"), ("n1", "x", "y")}

    def test_existence_gate_true_keeps_solutions(self, spark, graph):
        out = bgp_match(
            graph,
            [("?c", "located_in", "?n"), ("n1", "rdf:type", "Nation")],
        )
        assert _rows(out) == {("c1", "n1"), ("c2", "n2")}

    def test_existence_gate_false_empties(self, spark, graph):
        out = bgp_match(
            graph,
            [("?c", "located_in", "?n"), ("n9", "rdf:type", "Nation")],
        )
        assert out.count() == 0

    def test_all_gates(self, spark, graph):
        assert bgp_match(graph, [("n1", "rdf:type", "Nation")]).count() == 1
        assert bgp_match(
            graph,
            [("n1", "rdf:type", "Nation"), ("n2", "rdf:type", "Nation")],
        ).count() == 0

    def test_no_duplicate_solutions(self, spark, graph):
        out = bgp_match(graph, [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")])
        assert out.count() == out.distinct().count() == 3

    def test_validation(self, spark, graph):
        with pytest.raises(ValueError, match="empty pattern"):
            bgp_match(graph, [])
        with pytest.raises(ValueError, match="3 terms"):
            bgp_match(graph, [("?a", "p")])  # type: ignore[list-item]
        with pytest.raises(ValueError, match="bare '\\?'"):
            bgp_match(graph, [("?", "p", "?o")])

    def test_constant_filters_pushed_to_scan(self, spark, tmp_path, graph):
        path = str(tmp_path / "trip.parquet")
        graph.write.parquet(path)
        t = spark.read.parquet(path)
        plan = (
            bgp_match(t, [("?s", "located_in", "?n")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(p), EqualTo(p,located_in)" in plan

class TestBgpQuery:
    def test_optional_keeps_unmatched_with_nulls(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_query

        out = bgp_query(
            graph,
            [("?c", "located_in", "?n")],
            optional=[[("?n", "rdf:type", "?t")]],
        )
        rows = {(r["c"], r["n"], r["t"]) for r in out.collect()}
        assert rows == {("c1", "n1", "Nation"), ("c2", "n2", None)}

    def test_filter_after_optional(self, spark, graph):
        from pyspark.sql import functions as F

        from lmss_entity_extractor_spark.graph.bgp import bgp_query

        out = bgp_query(
            graph,
            [("?c", "located_in", "?n")],
            optional=[[("?n", "rdf:type", "?t")]],
            filters=["t IS NULL"],
        )
        assert {(r["c"], r["n"]) for r in out.select("c", "n").collect()} == {
            ("c2", "n2")
        }

    def test_two_optional_groups(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_query

        out = bgp_query(
            graph,
            [("?o", "placed_by", "?c")],
            optional=[
                [("?c", "located_in", "?n")],
                [("?n", "rdf:type", "?t")],
            ],
        )
        rows = {(r["o"], r["c"], r["n"], r["t"]) for r in out.collect()}
        assert rows == {
            ("o1", "c1", "n1", "Nation"),
            ("o2", "c1", "n1", "Nation"),
            ("o3", "c2", "n2", None),
        }

    def test_disjoint_optional_extends_all(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_query

        out = bgp_query(
            graph,
            [("?n", "rdf:type", "Nation")],
            optional=[[("?x", "likes", "?y")]],
        )
        assert out.count() == 2  # one base solution x two optional rows
