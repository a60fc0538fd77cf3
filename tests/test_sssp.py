"""Hop-bounded shortest paths (graph/sssp.py, L68): hand-traced
distances, hop-bound semantics, multi-source min, validation."""

import pytest

from lmss_entity_extractor_spark.graph.sssp import shortest_paths


def _e(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w int")


def _d(df):
    return {r["node"]: r["dist"] for r in df.collect()}


class TestShortestPaths:
    def test_cheap_detour_beats_direct(self, spark):
        # a->c direct costs 10; a->b->c costs 3
        e = _e(spark, [("a", "c", 10), ("a", "b", 1), ("b", "c", 2)])
        assert _d(shortest_paths(e, ["a"], n_rounds=2)) == {"a": 0, "b": 1, "c": 3}

    def test_hop_bound_is_exact(self, spark):
        # detour needs 2 hops: with 1 round only the direct edge counts
        e = _e(spark, [("a", "c", 10), ("a", "b", 1), ("b", "c", 2)])
        assert _d(shortest_paths(e, ["a"], n_rounds=1)) == {"a": 0, "b": 1, "c": 10}

    def test_unreachable_absent(self, spark):
        e = _e(spark, [("a", "b", 1), ("x", "y", 1)])
        got = _d(shortest_paths(e, ["a"], n_rounds=3))
        assert got == {"a": 0, "b": 1}

    def test_multi_source_takes_min(self, spark):
        e = _e(spark, [("a", "m", 5), ("b", "m", 2)])
        assert _d(shortest_paths(e, ["a", "b"], n_rounds=1)) == {
            "a": 0,
            "b": 0,
            "m": 2,
        }

    def test_cycle_safe_under_bound(self, spark):
        e = _e(spark, [("a", "b", 1), ("b", "a", 1)])
        assert _d(shortest_paths(e, ["a"], n_rounds=5)) == {"a": 0, "b": 1}

    def test_negative_weight_rejected(self, spark):
        with pytest.raises(ValueError, match="negative"):
            shortest_paths(_e(spark, [("a", "b", -1)]), ["a"])

    def test_sources_dataframe_form(self, spark):
        e = _e(spark, [("a", "b", 7)])
        srcs = spark.createDataFrame([("a",)], "n string")
        assert _d(shortest_paths(e, srcs, n_rounds=1)) == {"a": 0, "b": 7}
