"""Blocked edit-distance join (ops/fuzzyjoin.py): hand-computed
distances, self-join dedup, blocking recall trade, plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.fuzzyjoin import edit_distance_join


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


def test_hand_computed_pairs(spark):
    vals = ["kitten", "kitten", "kitchen", "kite", "mitten"]
    out = edit_distance_join(_df(spark, vals), None, "v", max_dist=2).collect()
    got = {(r["a"], r["b"]): r["dist"] for r in out}
    # kitten->kitchen = 2 (insert c, e->substitute? t->c,+h: classic 2)
    # kitten->kite = 2 (drop t, drop n)  [same 'ki' block]
    # mitten is in block 'mi' -> never compared to the kit* block
    assert got == {("kitchen", "kitten"): 2, ("kite", "kitten"): 2}


def test_self_join_emits_each_pair_once_no_diagonal(spark):
    out = edit_distance_join(_df(spark, ["abc", "abd", "abc"]), None, "v", max_dist=1)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["a"], rows[0]["b"], rows[0]["dist"]) == ("abc", "abd", 1)


def test_two_sided_join_keeps_exact_matches(spark):
    left = _df(spark, ["color"], "surface")
    right = _df(spark, ["color", "colour", "colr"], "label")
    out = edit_distance_join(left, right, "surface", "label", max_dist=1)
    got = sorted((r["a"], r["b"], r["dist"]) for r in out.collect())
    assert got == [("color", "color", 0), ("color", "colour", 1), ("color", "colr", 1)]


def test_length_band_is_consistent_with_distance(spark):
    # |len gap| > max_dist can never be within max_dist edits, so the
    # band is a pure optimization: widening max_dist must only ADD pairs
    vals = ["aa", "aaaa", "aaaaaa"]
    d2 = edit_distance_join(_df(spark, vals), None, "v", max_dist=2).count()
    d4 = edit_distance_join(_df(spark, vals), None, "v", max_dist=4).count()
    assert d2 == 2  # (aa,aaaa), (aaaa,aaaaaa)
    assert d4 == 3


def test_blocking_is_equi_join_not_cross(spark):
    df = _df(spark, [f"w{i}" for i in range(50)])
    plan = (
        edit_distance_join(df, None, "v", max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_validation(spark):
    with pytest.raises(ValueError):
        edit_distance_join(_df(spark, ["a"]), None, "v", max_dist=-1)
    with pytest.raises(ValueError):
        edit_distance_join(_df(spark, ["a"]), None, "v", block_prefix=0)


class TestJaroWinklerKernel:
    def test_textbook_values(self):
        from lmss_entity_extractor_spark.ops.fuzzyjoin import jaro_winkler

        assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15
        assert abs(jaro_winkler("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15
        assert abs(jaro_winkler("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("", "") == 0.0  # DuckDB convention
        assert jaro_winkler("abc", "") == 0.0
        assert jaro_winkler("ab", "ba") == 0.0  # window 0, no matches

    def test_boost_threshold(self):
        from lmss_entity_extractor_spark.ops.fuzzyjoin import jaro_winkler

        # jaro = 2/3 <= 0.7 with a 3-char common prefix: no boost
        assert abs(jaro_winkler("aaabbb", "aaaxxx") - 2.0 / 3.0) < 1e-15

    def test_duckdb_bit_parity_fuzz(self):
        """The engine-parity pin: the kernel must equal DuckDB's
        jaro_winkler_similarity BIT FOR BIT (the oracle for the
        jaro_join contract query runs on DuckDB)."""
        import random

        import duckdb

        from lmss_entity_extractor_spark.ops.fuzzyjoin import jaro_winkler

        con = duckdb.connect()
        rng = random.Random(20260819)
        for _ in range(1500):
            a = "".join(
                rng.choice("abcdef") for _ in range(rng.randint(0, 13))
            )
            b = "".join(
                rng.choice("abcdef") for _ in range(rng.randint(0, 13))
            )
            d = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert jaro_winkler(a, b) == d, (a, b)


class TestJaroWinklerJoin:
    def test_self_join_blocked(self, spark):
        from lmss_entity_extractor_spark.ops.fuzzyjoin import (
            jaro_winkler,
            jaro_winkler_join,
        )

        names = [
            "shackleford", "shackelford", "cunningham", "cunnigham",
            "johnson", "jonson", "zebra",
        ]
        df = spark.createDataFrame([(n,) for n in names], "name string")
        got = {
            (r["a"], r["b"]): r["sim"]
            for r in jaro_winkler_join(
                df, None, "name", min_sim=0.9, block_prefix=2
            ).collect()
        }
        # expected: all same-2-prefix pairs with kernel sim >= 0.9
        exp = {}
        for i, x in enumerate(names):
            for y in names[i + 1:]:
                a, b = min(x, y), max(x, y)
                if a[:2] == b[:2]:
                    s = jaro_winkler(a, b)
                    if s >= 0.9:
                        exp[(a, b)] = s
        assert got == exp
        assert ("shackelford", "shackleford") in got

    def test_two_sided_join(self, spark):
        from lmss_entity_extractor_spark.ops.fuzzyjoin import jaro_winkler_join

        l = spark.createDataFrame([("martha",), ("dwayne",)], "x string")
        r = spark.createDataFrame([("marhta",), ("duane",)], "y string")
        rows = jaro_winkler_join(
            l, r, "x", "y", min_sim=0.8, block_prefix=1
        ).collect()
        got = {(r2["a"], r2["b"]) for r2 in rows}
        assert got == {("martha", "marhta"), ("dwayne", "duane")}
