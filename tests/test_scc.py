"""Strongly connected components (graph/scc.py): hand-built digraphs,
DAG degeneration, ring detection, nested cycles.
"""

from __future__ import annotations

from lmss_entity_extractor_spark.graph.scc import strongly_connected


def _scc(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r["node"]: r["component"] for r in strongly_connected(df).collect()
    }


def test_dag_is_all_singletons(spark):
    got = _scc(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_simple_cycle_is_one_component(spark):
    got = _scc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_two_cycles_joined_by_one_way_bridge_stay_separate(spark):
    # ring1 {a,b} -> bridge -> ring2 {x,y}; the bridge is one-way, so
    # the rings are distinct components
    pairs = [("a", "b"), ("b", "a"), ("b", "x"), ("x", "y"), ("y", "x")]
    got = _scc(spark, pairs)
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x"}


def test_tail_into_cycle(spark):
    # t -> a, cycle {a,b}: t is a singleton, not dragged into the ring
    got = _scc(spark, [("t", "a"), ("a", "b"), ("b", "a")])
    assert got == {"t": "t", "a": "a", "b": "a"}


def test_self_loop_is_its_own_component(spark):
    got = _scc(spark, [("s", "s"), ("s", "z")])
    assert got == {"s": "s", "z": "z"}


def test_sameas_equivalence_ring_detected(spark):
    # the KG-hygiene case: a sameAs ring among 4 ids plus an acyclic
    # subclass chain — only the ring collapses
    ring = [("e1", "e2"), ("e2", "e3"), ("e3", "e4"), ("e4", "e1")]
    chain = [("c1", "c2"), ("c2", "c3")]
    got = _scc(spark, ring + chain)
    assert got["e1"] == got["e2"] == got["e3"] == got["e4"] == "e1"
    assert got["c1"] == "c1" and got["c2"] == "c2" and got["c3"] == "c3"
