"""owl:sameAs smushing (graph/sameas.py, L52): election, rewrite on
both positions, chain transitivity, and the documented edge choices —
all hand-checked."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.sameas import (
    SAMEAS_PRED,
    sameas_mapping,
    sameas_resolve,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _tset(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


@pytest.fixture(scope="module")
def graph(spark):
    """a ~ b ~ c chain (canonical a), x ~ y (canonical x); facts asserted
    on non-canonical ids on both subject and object positions."""
    return _triples(
        spark,
        [
            ("b", SAMEAS_PRED, "a"),
            ("c", SAMEAS_PRED, "b"),
            ("y", SAMEAS_PRED, "x"),
            ("c", "knows", "y"),
            ("a", "knows", "x"),  # collapses into the same fact as above
            ("b", "type", "Person"),
            ("q", "near", "z"),  # untouched — no sameAs membership
        ],
    )


class TestSameasMapping:
    def test_mapping_elects_min_with_identity_rows(self, spark, graph):
        got = {(r["node"], r["canonical"]) for r in sameas_mapping(graph).collect()}
        assert got == {
            ("a", "a"),
            ("b", "a"),
            ("c", "a"),
            ("x", "x"),
            ("y", "x"),
        }

    def test_self_loop_asserts_nothing(self, spark):
        g = _triples(spark, [("a", SAMEAS_PRED, "a"), ("a", "p", "b")])
        assert sameas_mapping(g).count() == 0


class TestSameasResolve:
    def test_hand_computed_rewrite(self, spark, graph):
        got = _tset(sameas_resolve(graph))
        assert got == {
            ("a", "knows", "x"),  # c→a subject, y→x object; dup collapsed
            ("a", "type", "Person"),
            ("q", "near", "z"),
        }

    def test_keep_sameas_collapses_to_self_loops(self, spark, graph):
        got = _tset(sameas_resolve(graph, drop_sameas=False))
        assert (SAMEAS_PRED in {p for _, p, _ in got}) and ("a", SAMEAS_PRED, "a") in got
        # every kept sameAs triple is now a canonical self-loop
        assert {(s, o) for s, p, o in got if p == SAMEAS_PRED} == {("a", "a"), ("x", "x")}

    def test_predicates_never_rewritten(self, spark):
        g = _triples(
            spark,
            [("knows", SAMEAS_PRED, "acquainted"), ("a", "knows", "b")],
        )
        got = _tset(sameas_resolve(g))
        assert got == {("a", "knows", "b")}

    def test_idempotent(self, spark, graph):
        once = sameas_resolve(graph).localCheckpoint(eager=True)
        assert _tset(sameas_resolve(once)) == _tset(once)

    def test_no_sameas_is_distinct_passthrough(self, spark):
        g = _triples(spark, [("a", "p", "b"), ("a", "p", "b")])
        out = sameas_resolve(g)
        assert _tset(out) == {("a", "p", "b")}
        assert out.count() == 1

    def test_star_algorithm_agrees(self, spark, graph):
        prop = _tset(sameas_resolve(graph))
        star = _tset(sameas_resolve(graph, algorithm="star"))
        assert prop == star

    def test_shuffle_join_path_agrees(self, spark, graph):
        assert _tset(sameas_resolve(graph, broadcast_mapping=False)) == _tset(
            sameas_resolve(graph)
        )

    def test_broadcast_in_plan(self, spark, graph):
        plan = (
            sameas_resolve(graph)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
