"""DAG levels (graph/toposort.py): hand-built DAGs, longest-path (not
shortest) semantics, cycle loudness.
"""

from __future__ import annotations

import pytest

from lmss_entity_extractor_spark.graph.toposort import dag_levels


def _levels(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["node"]: r["level"] for r in dag_levels(df, **kw).collect()}


def test_chain(spark):
    assert _levels(spark, [("a", "b"), ("b", "c")]) == {"a": 0, "b": 1, "c": 2}


def test_longest_path_wins_over_shortcut(spark):
    # a->b->c->d plus the shortcut a->d: d levels at 3, not 1
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert _levels(spark, pairs)["d"] == 3


def test_diamond_and_multiple_sources(spark):
    #   a     s2
    #  / \    |
    # b   c   x    (b,c,x at 1; d joins at 2)
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("s2", "x")]
    got = _levels(spark, pairs)
    assert got == {"a": 0, "s2": 0, "b": 1, "c": 1, "x": 1, "d": 2}


def test_cycle_is_loud(spark):
    with pytest.raises(RuntimeError, match="cycle"):
        _levels(spark, [("a", "b"), ("b", "a")], max_rounds=8)


def test_levels_partition_into_independent_waves(spark):
    # no edge may connect two nodes of the SAME level — the property
    # wave-scheduling relies on
    pairs = [("a", "b"), ("a", "c"), ("c", "d"), ("b", "d"), ("d", "e"), ("a", "e")]
    got = _levels(spark, pairs)
    for u, v in pairs:
        assert got[u] != got[v]
