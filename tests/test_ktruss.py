"""k-truss peeling (graph/ktruss.py): hand-built graphs with known
truss structure, cascade behavior, canonicalization, loudness.
"""

from __future__ import annotations

import pytest

from lmss_entity_extractor_spark.graph.ktruss import ktruss


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _res(df):
    return {(r["a"], r["b"]): r["support"] for r in df.collect()}


def test_k4_clique_is_its_own_4_truss(spark):
    # K4: every edge is in exactly 2 triangles -> survives k=4
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for x in nodes for y in nodes if x < y]
    out = _res(ktruss(_edges(spark, pairs), k=4))
    assert out == {(x, y): 2 for x, y in pairs}


def test_pendant_triangle_peels_under_k4(spark):
    # K4 plus a triangle hanging off node 'd': the hanging triangle's
    # edges have support 1 -> removed at k=4; K4 survives intact
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for x in nodes for y in nodes if x < y]
    pendant = [("d", "e"), ("d", "f"), ("e", "f")]
    out = _res(ktruss(_edges(spark, k4 + pendant), k=4))
    assert set(out) == set(k4)
    # but the pendant triangle IS a 3-truss
    out3 = _res(ktruss(_edges(spark, k4 + pendant), k=3))
    assert set(out3) == set(k4) | set(pendant)


def test_cascading_peel(spark):
    # two K4s sharing ONE edge, plus a bridge edge in a single triangle:
    # at k=4 the bridge triangle dies first; its removal must not
    # affect the cliques (no false cascade), and each K4 survives.
    k4a = [(x, y) for x in "abcd" for y in "abcd" if x < y]
    k4b = [(x, y) for x in "cdef" for y in "cdef" if x < y]
    bridge = [("f", "g"), ("e", "g")]  # triangle (e, f, g) w/ edge (e, f)
    out = _res(ktruss(_edges(spark, k4a + k4b + bridge), k=4))
    assert set(out) == set(k4a) | set(k4b)
    # the shared edge (c, d) sits in BOTH cliques: support 2 + 2
    assert out[("c", "d")] == 4


def test_triangle_free_graph_empty(spark):
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert ktruss(_edges(spark, path), k=3).count() == 0


def test_direction_and_duplicates_canonicalized(spark):
    tri = [("b", "a"), ("a", "c"), ("c", "b"), ("a", "b"), ("a", "a")]
    out = _res(ktruss(_edges(spark, tri), k=3))
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_truss_is_subgraph_of_kminus1_core(spark):
    # theorem (Cohen '08 §3): the k-truss is contained in the
    # (k-1)-core — every truss node has >= k-1 truss neighbors.
    # Cross-operator check against graph/kcore.py on a seeded
    # pseudo-random graph (deterministic: edges from modular arithmetic).
    from pyspark.sql import functions as F

    from lmss_entity_extractor_spark.graph.kcore import kcore

    n = 40
    noise = {
        (min(a, b), max(a, b))
        for i in range(400)
        for a, b in [((i * 7) % n, (i * i * 3 + i) % n)]
        if a != b
    }
    cliques = {
        (a, b) for grp in (range(5), range(10, 15)) for a in grp for b in grp if a < b
    }
    pairs = sorted(noise | cliques)
    edges = spark.createDataFrame(
        [(f"v{a}", f"v{b}") for a, b in pairs], "src string, dst string"
    )
    truss = ktruss(edges, k=4).localCheckpoint()
    truss_nodes = {
        r["n"]
        for r in truss.select(F.col("a").alias("n"))
        .union(truss.select(F.col("b").alias("n")))
        .distinct()
        .collect()
    }
    assert truss_nodes, "fixture must have a non-empty 4-truss"
    core_nodes = {r["node"] for r in kcore(edges, k=3).collect()}
    assert truss_nodes <= core_nodes
    # and inside the truss itself every node has degree >= k-1 = 3
    deg = (
        truss.select(F.col("a").alias("n"))
        .union(truss.select(F.col("b").alias("n")))
        .groupBy("n")
        .count()
        .collect()
    )
    assert min(r["count"] for r in deg) >= 3


def test_k_validation_and_loud_bound(spark):
    with pytest.raises(ValueError, match=">= 3"):
        ktruss(_edges(spark, [("a", "b")]), k=2)
    # a graph that needs 2 peel rounds with max_rounds=1 must raise
    k4 = [(x, y) for x in "abcd" for y in "abcd" if x < y]
    pendant = [("d", "e"), ("d", "f"), ("e", "f")]
    with pytest.raises(RuntimeError, match="converge"):
        ktruss(_edges(spark, k4 + pendant), k=4, max_rounds=1)
