"""rdf:List flattening (graph/rdflist.py, L70): ordered decode,
multiple lists, shared-tail independence, malformed cells, cycles."""

import pytest

from lmss_entity_extractor_spark.graph.rdflist import flatten_lists


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _lists(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["head"], []).append((r["pos"], r["item"]))
    return {h: [i for _, i in sorted(v)] for h, v in out.items()}


def _cons(name, item, nxt):
    return [(name, "rdf:first", item), (name, "rdf:rest", nxt)]


class TestFlattenLists:
    def test_three_item_list(self, spark):
        rows = (
            _cons("l0", "a", "l1") + _cons("l1", "b", "l2") + _cons("l2", "c", "rdf:nil")
        )
        assert _lists(flatten_lists(_t(spark, rows))) == {"l0": ["a", "b", "c"]}

    def test_two_independent_lists(self, spark):
        rows = (
            _cons("x0", "a", "x1")
            + _cons("x1", "b", "rdf:nil")
            + _cons("y0", "z", "rdf:nil")
        )
        assert _lists(flatten_lists(_t(spark, rows))) == {
            "x0": ["a", "b"],
            "y0": ["z"],
        }

    def test_singleton_and_other_predicates_ignored(self, spark):
        rows = _cons("l0", "only", "rdf:nil") + [("e", "knows", "f")]
        assert _lists(flatten_lists(_t(spark, rows))) == {"l0": ["only"]}

    def test_missing_first_emits_nothing_but_walk_continues(self, spark):
        rows = (
            _cons("l0", "a", "l1")
            + [("l1", "rdf:rest", "l2")]  # no rdf:first on l1
            + _cons("l2", "c", "rdf:nil")
        )
        got = flatten_lists(_t(spark, rows))
        assert {(r["pos"], r["item"]) for r in got.collect()} == {(0, "a"), (2, "c")}

    def test_cyclic_rest_fails_loudly(self, spark):
        # cycle reachable from a head: l0 -> l1 -> l2 -> l1 -> ...
        rows = (
            _cons("l0", "a", "l1") + _cons("l1", "b", "l2") + _cons("l2", "c", "l1")
        )
        with pytest.raises(RuntimeError, match="max_len"):
            flatten_lists(_t(spark, rows), max_len=5)

    def test_headless_pure_cycle_is_empty_not_hung(self, spark):
        # a cycle no head points into has no list to decode; the walk
        # never enters it (bounded by construction, not by luck)
        rows = _cons("l0", "a", "l1") + _cons("l1", "b", "l0")
        assert flatten_lists(_t(spark, rows), max_len=5).count() == 0

    def test_empty_graph(self, spark):
        out = flatten_lists(_t(spark, []))
        assert out.count() == 0
        assert out.columns == ["head", "pos", "item"]
