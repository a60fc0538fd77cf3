"""Entity resolution (graph/er.py, L57): blocking, exact-rational
Jaccard boundary, stop-token guard, transitive clusters, totality —
hand-checked."""

import pytest

from lmss_entity_extractor_spark.graph.er import match_pairs, resolve_entities


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "node_id string, name string")


def _mapping(df):
    return {(r["node_id"], r["canonical_id"]) for r in df.collect()}


class TestMatchPairs:
    def test_exact_jaccard_boundary(self, spark):
        # {a b c d} vs {a b c d e}: 4/5 = 0.8 — MUST match at 0.8
        # (float 0.8*5 > 4 would wrongly reject; the rational compare
        # is the point of this test)
        n = _nodes(spark, [("1", "a b c d"), ("2", "a b c d e")])
        got = match_pairs(n, threshold=0.8).collect()
        assert len(got) == 1
        assert (got[0]["inter_size"], got[0]["union_size"]) == (4, 5)

    def test_below_boundary_rejected(self, spark):
        n = _nodes(spark, [("1", "a b c"), ("2", "a b c d e")])  # 3/5 = 0.6
        assert match_pairs(n, threshold=0.8).count() == 0

    def test_normalization(self, spark):
        n = _nodes(spark, [("1", "  Acme   CORP "), ("2", "acme corp")])
        got = match_pairs(n, threshold=1.0).collect()
        assert len(got) == 1 and got[0]["inter_size"] == 2

    def test_stop_token_guard(self, spark):
        # "inc" appears in all 3 records; with max_block_size=2 it is
        # dropped and only the 'zeta'-blocked pair survives
        n = _nodes(
            spark,
            [("1", "alpha inc"), ("2", "beta inc"), ("3", "alpha inc zeta")],
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in match_pairs(n, threshold=0.1, max_block_size=2).collect()
        }
        assert pairs == {("1", "3")}

    def test_duplicate_tokens_in_name_count_once(self, spark):
        n = _nodes(spark, [("1", "a a b"), ("2", "a b")])
        got = match_pairs(n, threshold=1.0).collect()
        assert len(got) == 1 and got[0]["union_size"] == 2

    def test_validation(self, spark):
        n = _nodes(spark, [("1", "a")])
        with pytest.raises(ValueError, match="threshold"):
            match_pairs(n, threshold=0.0)
        with pytest.raises(ValueError, match="max_block_size"):
            match_pairs(n, max_block_size=1)


class TestResolveEntities:
    def test_transitive_cluster_and_totality(self, spark):
        # 1~2 and 2~3 (chain), 4 is a singleton
        n = _nodes(
            spark,
            [
                ("1", "a b c d"),
                ("2", "a b c d e"),
                ("3", "b c d e"),
                ("4", "zz yy"),
            ],
        )
        got = _mapping(resolve_entities(n, threshold=0.8))
        assert got == {("1", "1"), ("2", "1"), ("3", "1"), ("4", "4")}

    def test_star_algorithm_agrees(self, spark):
        n = _nodes(
            spark,
            [("1", "a b c d"), ("2", "a b c d e"), ("3", "b c d e"), ("4", "q")],
        )
        prop = _mapping(resolve_entities(n, threshold=0.8))
        star = _mapping(resolve_entities(n, threshold=0.8, algorithm="star"))
        assert prop == star

    def test_empty_names_are_singletons(self, spark):
        n = _nodes(spark, [("1", "   "), ("2", "a")])
        assert _mapping(resolve_entities(n)) == {("1", "1"), ("2", "2")}
