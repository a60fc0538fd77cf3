"""Incremental closure (graph/incclosure.py, L69): recompute equality
on chained/bridging/shortcut deltas, depth shortening, no-op deltas,
round bound."""

import pytest

from lmss_entity_extractor_spark.graph.closure import transitive_closure
from lmss_entity_extractor_spark.graph.incclosure import closure_insert


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "child string, parent string")


def _rows(df):
    return {(r["desc_iri"], r["anc_iri"], r["depth"]) for r in df.collect()}


def _check(spark, base_pairs, delta_pairs, **kw):
    base = transitive_closure(_e(spark, base_pairs), include_self=False)
    got = _rows(closure_insert(base, _e(spark, delta_pairs), **kw))
    want = _rows(
        transitive_closure(_e(spark, base_pairs + delta_pairs), include_self=False)
    )
    assert got == want
    return got


class TestClosureInsert:
    def test_bridge_connects_two_chains(self, spark):
        # a->b and c->d; delta bridges b->c: paths a->c, a->d, b->d appear
        got = _check(spark, [("a", "b"), ("c", "d")], [("b", "c")])
        assert ("a", "d", 3) in got

    def test_shortcut_shortens_existing_depth(self, spark):
        # chain a->b->c->d (a->d depth 3); delta a->c makes a->d depth 2
        got = _check(
            spark, [("a", "b"), ("b", "c"), ("c", "d")], [("a", "c")]
        )
        assert ("a", "d", 2) in got and ("a", "d", 3) not in got

    def test_delta_chains_through_delta(self, spark):
        # both edges new, on fresh nodes: frontier must self-compose
        got = _check(spark, [("x", "y")], [("p", "q"), ("q", "r")])
        assert ("p", "r", 2) in got

    def test_noop_delta_returns_same_closure(self, spark):
        base = [("a", "b"), ("b", "c")]
        _check(spark, base, [("a", "b")])  # duplicate edge changes nothing

    def test_empty_delta(self, spark):
        _check(spark, [("a", "b"), ("b", "c")], [])

    def test_cycle_created_by_delta(self, spark):
        # delta closes a cycle: (x,x,d) rows appear exactly as recompute
        _check(spark, [("a", "b"), ("b", "c")], [("c", "a")])

    def test_round_bound_loud(self, spark):
        base = transitive_closure(_e(spark, [("a", "b")]), include_self=False)
        long_chain = [("n%d" % i, "n%d" % (i + 1)) for i in range(6)]
        with pytest.raises(RuntimeError, match="did not converge"):
            closure_insert(base, _e(spark, long_chain), max_rounds=2)
