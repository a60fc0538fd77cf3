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


class TestBgpUnion:
    def test_differing_domains_pad_null(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_union

        out = bgp_union(
            graph,
            [
                [("?c", "located_in", "?n"), ("?n", "rdf:type", "Nation")],
                [("?o", "placed_by", "?c")],
            ],
        )
        assert out.columns == ["c", "n", "o"]
        assert _rows(out) == {
            ("c1", "n1", None),
            ("c1", None, "o1"),
            ("c1", None, "o2"),
            ("c2", None, "o3"),
        }

    def test_cross_branch_duplicates_collapse(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_union

        out = bgp_union(
            graph,
            [[("?c", "located_in", "?n")], [("?c", "located_in", "?n")]],
        )
        # same solutions from both branches -> set semantics, counted once
        assert _rows(out) == {("c1", "n1"), ("c2", "n2")}

    def test_empty_groups_rejected(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_union

        with pytest.raises(ValueError):
            bgp_union(graph, [])


class TestBgpMinus:
    def test_removes_compatible_solutions(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match, bgp_minus

        sols = bgp_match(
            graph, [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")]
        )
        out = bgp_minus(sols, graph, [("?n", "rdf:type", "Nation")])
        # n1 is typed -> o1/o2 removed; n2 untyped -> o3 survives
        assert _rows(out) == {("c2", "n2", "o3")}

    def test_disjoint_domain_is_noop(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match, bgp_minus

        sols = bgp_match(graph, [("?o", "placed_by", "?c")])
        out = bgp_minus(sols, graph, [("?a", "likes", "?b")])
        assert _rows(out) == _rows(sols)

    def test_null_shared_var_drops_out_of_domain(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_minus, bgp_query

        # OPTIONAL type: n1 rows bind ?t='Nation', n2 rows leave ?t NULL
        sols = bgp_query(
            graph,
            [("?c", "located_in", "?n")],
            optional=[[("?n", "rdf:type", "?t")]],
        )
        # MINUS {?n rdf:type ?t}: the (c1,n1,'Nation') row is compatible
        # and dies; (c2,n2,NULL) has dom = {n} on the shared side, and no
        # minus solution carries n=n2, so it survives
        out = bgp_minus(sols, graph, [("?n", "rdf:type", "?t")])
        assert _rows(out) == {("c2", "n2", None)}

    def test_all_null_shared_vars_survive(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_minus

        sols = spark.createDataFrame(
            [("k1", None), ("k2", "n1")], "keep string, n string"
        )
        # shared = {n}; the NULL-n row has disjoint domain -> survives;
        # the n1 row is compatible with (n1 rdf:type Nation) -> removed
        out = bgp_minus(sols, graph, [("?n", "rdf:type", "?x")])
        assert _rows(out) == {("k1", None)}


class TestBgpAggregate:
    def test_group_by_counts(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

        out = bgp_aggregate(
            graph,
            [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
            group_by=["n"],
            aggs=[
                ("count", "*", "n_orders"),
                ("count_distinct", "c", "n_cust"),
                ("min", "o", "first_o"),
            ],
        )
        assert _rows(out) == {("n1", 2, 1, "o1"), ("n2", 1, 1, "o3")}

    def test_implicit_single_group(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

        out = bgp_aggregate(
            graph,
            [("?o", "placed_by", "?c")],
            aggs=[("count", "*", "n"), ("sample", "c", "some_c")],
        )
        # SAMPLE pinned to MIN -> deterministic
        assert _rows(out) == {(3, "c1")}

    def test_count_var_skips_unbound(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

        out = bgp_aggregate(
            graph,
            [("?c", "located_in", "?n")],
            optional=[[("?n", "rdf:type", "?t")]],
            aggs=[("count", "*", "rows"), ("count", "t", "typed")],
        )
        # 2 solutions, only n1 typed -> COUNT(?t) = 1
        assert _rows(out) == {(2, 1)}

    def test_having_filters_groups(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

        out = bgp_aggregate(
            graph,
            [("?o", "placed_by", "?c"), ("?c", "located_in", "?n")],
            group_by=["n"],
            aggs=[("count", "*", "n_orders")],
            having=["n_orders >= 2"],
        )
        assert _rows(out) == {("n1", 2)}

    def test_star_only_valid_for_count(self, spark, graph):
        from lmss_entity_extractor_spark.graph.bgp import bgp_aggregate

        with pytest.raises(ValueError):
            bgp_aggregate(
                graph, [("?o", "placed_by", "?c")], aggs=[("min", "*", "x")]
            )


class TestQuads:
    @pytest.fixture(scope="class")
    def quads(self, spark):
        rows = [
            ("g1", "a", "knows", "b"),
            ("g1", "b", "knows", "c"),
            ("g2", "a", "knows", "b"),
            ("g2", "b", "type", "Person"),
            ("g3", "x", "knows", "y"),
        ]
        return spark.createDataFrame(rows, "g string, s string, p string, o string")

    def test_constant_graph_pins_group(self, spark, quads):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

        out = bgp_match_quads(quads, [("g1", "?x", "knows", "?y")])
        got = {(r["x"], r["y"]) for r in out.collect()}
        assert got == {("a", "b"), ("b", "c")}

    def test_variable_graph_binds_name(self, spark, quads):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

        out = bgp_match_quads(quads, [("?g", "a", "knows", "?y")])
        got = {(r["g"], r["y"]) for r in out.collect()}
        assert got == {("g1", "b"), ("g2", "b")}

    def test_shared_graph_variable_joins_within_one_graph(self, spark, quads):
        # GRAPH ?g { ?x knows ?y . ?y type Person }: both patterns must
        # hold in the SAME graph -> only g2 qualifies
        from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

        out = bgp_match_quads(
            quads,
            [("?g", "?x", "knows", "?y"), ("?g", "?y", "type", "Person")],
        )
        got = {(r["g"], r["x"], r["y"]) for r in out.collect()}
        assert got == {("g2", "a", "b")}

    def test_cross_graph_join_when_graphs_differ(self, spark, quads):
        # different graph variables: the chain may span graphs
        from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

        out = bgp_match_quads(
            quads,
            [("?g1", "?x", "knows", "?y"), ("?g2", "?y", "type", "Person")],
        )
        got = {(r["g1"], r["g2"], r["x"]) for r in out.collect()}
        assert got == {("g1", "g2", "a"), ("g2", "g2", "a")}

    def test_arity_validated(self, spark, quads):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match_quads

        with pytest.raises(ValueError, match="4 terms"):
            bgp_match_quads(quads, [("?x", "knows", "?y")])


class TestReorder:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # 'common' predicate: 200 triples; 'rare': 2; 'type': 1
        rows = (
            [(f"s{i}", "common", f"o{i % 10}") for i in range(200)]
            + [("s1", "rare", "m"), ("s2", "rare", "m")]
            + [("m", "type", "T")]
        )
        return spark.createDataFrame(rows, "s string, p string, o string")

    def test_orders_by_selectivity_then_connectivity(self, spark, skewed):
        from lmss_entity_extractor_spark.graph.bgp import reorder_patterns

        pats = [
            ("?a", "common", "?b"),      # 200 rows
            ("?c", "rare", "?m"),        # 2 rows
            ("?m", "type", "T"),         # 1 row, 1 extra constant
        ]
        got = reorder_patterns(skewed, pats)
        # cheapest first (type w/ constant), then its connected 'rare',
        # then the fat disconnected-until-now 'common'... which shares
        # no variable and lands last
        assert got == [("?m", "type", "T"), ("?c", "rare", "?m"), ("?a", "common", "?b")]

    def test_result_set_invariant_under_reorder(self, spark, skewed):
        from lmss_entity_extractor_spark.graph.bgp import (
            bgp_match,
            reorder_patterns,
        )

        pats = [
            ("?a", "common", "?b"),
            ("?c", "rare", "?m"),
            ("?m", "type", "T"),
        ]
        plain = {tuple(r) for r in bgp_match(skewed, pats).collect()}
        opt = {tuple(r) for r in bgp_match(skewed, reorder_patterns(skewed, pats)).collect()}
        assert plain == opt and plain

    def test_connected_preferred_over_cheaper_disconnected(self, spark, skewed):
        from lmss_entity_extractor_spark.graph.bgp import reorder_patterns

        pats = [
            ("?x", "common", "?y"),     # fat but first
            ("?y", "common", "?z"),     # fat, connected to ?y
            ("?c", "rare", "?m"),       # cheap but DISCONNECTED from ?x/?y
        ]
        got = reorder_patterns(skewed, pats)
        # rare is globally cheapest -> starts; nothing connects to it, so
        # the fold falls back to the fat pair (stable input order)
        assert got[0] == ("?c", "rare", "?m")
        assert set(got[1:]) == {("?x", "common", "?y"), ("?y", "common", "?z")}

    def test_empty_rejected(self, spark, skewed):
        from lmss_entity_extractor_spark.graph.bgp import reorder_patterns

        with pytest.raises(ValueError, match="empty"):
            reorder_patterns(skewed, [])


class TestExistsAndValues:
    @pytest.fixture(scope="class")
    def g2(self, spark):
        rows = [
            ("a", "knows", "b"),
            ("b", "knows", "c"),
            ("b", "type", "Person"),
            ("z", "flag", "on"),
        ]
        return spark.createDataFrame(rows, "s string, p string, o string")

    def _sols(self, g2):
        from lmss_entity_extractor_spark.graph.bgp import bgp_match

        return bgp_match(g2, [("?x", "knows", "?y")])  # (a,b), (b,c)

    def test_exists_keeps_matching_rows(self, spark, g2):
        from lmss_entity_extractor_spark.graph.bgp import bgp_filter_exists

        out = bgp_filter_exists(self._sols(g2), g2, [("?y", "type", "Person")])
        assert {(r["x"], r["y"]) for r in out.collect()} == {("a", "b")}

    def test_not_exists_removes_matching_rows(self, spark, g2):
        from lmss_entity_extractor_spark.graph.bgp import bgp_filter_exists

        out = bgp_filter_exists(
            self._sols(g2), g2, [("?y", "type", "Person")], negate=True
        )
        assert {(r["x"], r["y"]) for r in out.collect()} == {("b", "c")}

    def test_disjoint_not_exists_differs_from_minus(self, spark, g2):
        # THE spec teaching case: pattern shares no variable.
        # NOT EXISTS: pattern matches somewhere -> removes EVERYTHING.
        # MINUS: disjoint domains -> removes NOTHING.
        from lmss_entity_extractor_spark.graph.bgp import (
            bgp_filter_exists,
            bgp_minus,
        )

        sols = self._sols(g2)
        ne = bgp_filter_exists(sols, g2, [("?q", "flag", "on")], negate=True)
        assert ne.count() == 0
        mi = bgp_minus(sols, g2, [("?q", "flag", "on")])
        assert mi.count() == 2
        # and EXISTS with a disjoint non-matching pattern keeps nothing
        ex = bgp_filter_exists(sols, g2, [("?q", "flag", "off")])
        assert ex.count() == 0

    def test_values_constrains_and_undef_passes(self, spark, g2):
        from lmss_entity_extractor_spark.graph.bgp import bgp_values

        sols = self._sols(g2)
        out = bgp_values(sols, {"x": ["a", "zzz"]})
        assert {(r["x"], r["y"]) for r in out.collect()} == {("a", "b")}
        # UNDEF row: x=None means "any x" with y pinned
        out2 = bgp_values(sols, {"x": [None], "y": ["c"]})
        assert {(r["x"], r["y"]) for r in out2.collect()} == {("b", "c")}

    def test_values_validation(self, spark, g2):
        from lmss_entity_extractor_spark.graph.bgp import bgp_values

        sols = self._sols(g2)
        with pytest.raises(ValueError, match="empty"):
            bgp_values(sols, {})
        with pytest.raises(ValueError, match="ragged"):
            bgp_values(sols, {"x": ["a"], "y": ["b", "c"]})
        with pytest.raises(ValueError, match="unknown"):
            bgp_values(sols, {"nope": ["a"]})
