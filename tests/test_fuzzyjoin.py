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
