"""Interval coalescing (graph/temporal.py, L67): overlap/adjacency
merging, gap preservation, containment, per-key isolation, validation."""

import pytest

from lmss_entity_extractor_spark.graph.temporal import coalesce_intervals


def _e(spark, rows):
    return spark.createDataFrame(
        rows, "s string, p string, o string, valid_from int, valid_to int"
    )


def _by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault((r["s"], r["p"], r["o"]), []).append(
            (r["valid_from"], r["valid_to"], r["n_merged"])
        )
    return {k: sorted(v) for k, v in out.items()}


K = ("e1", "worksAt", "acme")


class TestCoalesceIntervals:
    def test_overlap_adjacent_and_gap(self, spark):
        rows = [
            K + (1, 5),
            K + (3, 8),  # overlaps -> merges
            K + (8, 10),  # adjacent (shared bound) -> merges
            K + (12, 14),  # gap -> separate island
        ]
        assert _by_key(coalesce_intervals(_e(spark, rows))) == {
            K: [(1, 10, 3), (12, 14, 1)]
        }

    def test_containment_absorbed(self, spark):
        rows = [K + (1, 10), K + (2, 3), K + (4, 12)]
        assert _by_key(coalesce_intervals(_e(spark, rows))) == {K: [(1, 12, 3)]}

    def test_chain_through_running_max(self, spark):
        # [1,9] then [2,3] then [4,5]: naive lag(end) would split at
        # [4,5] (prev end 3 < 4); the running-max form keeps one island
        rows = [K + (1, 9), K + (2, 3), K + (4, 5)]
        assert _by_key(coalesce_intervals(_e(spark, rows))) == {K: [(1, 9, 3)]}

    def test_keys_isolated(self, spark):
        k2 = ("e2", "worksAt", "acme")
        rows = [K + (1, 5), k2 + (4, 8)]
        assert _by_key(coalesce_intervals(_e(spark, rows))) == {
            K: [(1, 5, 1)],
            k2: [(4, 8, 1)],
        }

    def test_inverted_interval_rejected(self, spark):
        with pytest.raises(ValueError, match="valid_from > valid_to"):
            coalesce_intervals(_e(spark, [K + (5, 1)]))

    def test_parallelism_independent(self, spark):
        rows = [
            ("e%d" % (i % 4), "p", "o", i % 13, i % 13 + (i % 3) + 1)
            for i in range(60)
        ]
        a = _by_key(coalesce_intervals(_e(spark, rows).repartition(1)))
        b = _by_key(coalesce_intervals(_e(spark, rows).repartition(16)))
        assert a == b
