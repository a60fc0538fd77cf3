"""Distributed exact heavy hitters (L101) — two-pass Misra-Gries."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.heavyhitters import heavy_hitters


def _mk(spark, items, parts=4):
    return spark.createDataFrame([(i,) for i in items], "item string").repartition(parts)


def _got(df):
    return sorted((r["item"], r["n"]) for r in df.collect())


class TestHeavyHitters:
    def test_hand_computed_cut(self, spark):
        # 20 rows: a=8, b=5, c=4, d=2, e=1; phi=1/5 -> n > 4: a, b
        items = ["a"] * 8 + ["b"] * 5 + ["c"] * 4 + ["d"] * 2 + ["e"]
        out = _got(heavy_hitters(_mk(spark, items), "item", 1, 5))
        assert out == [("a", 8), ("b", 5)]

    def test_threshold_is_strict(self, spark):
        # c=4 of 20 is exactly 1/5 -- strict > excludes it
        items = ["a"] * 8 + ["b"] * 5 + ["c"] * 4 + ["d"] * 2 + ["e"]
        out = _got(heavy_hitters(_mk(spark, items), "item", 4, 20))
        assert ("c", 4) not in out and out == [("a", 8), ("b", 5)]

    def test_exact_under_forced_eviction(self, spark):
        # vocabulary (41 distinct) far wider than the summary (k at the
        # guarantee floor for phi=1/4: k=3 < 41) -- pass-1 must evict
        # constantly, pass-2 still returns the exact answer
        items = ["hot"] * 60 + [f"w{i}" for i in range(40)]  # hot: 60/100 > 1/4
        out = _got(
            heavy_hitters(_mk(spark, items, parts=7), "item", 1, 4, candidate_k=3)
        )
        assert out == [("hot", 60)]

    def test_parallelism_independent(self, spark):
        items = [f"t{i % 17}" for i in range(500)] + ["x"] * 300
        expected = None
        for parts in (1, 3, 13):
            out = _got(heavy_hitters(_mk(spark, items, parts), "item", 1, 20))
            expected = expected or out
            assert out == expected
        # exact counts: x=300, each t_i ~ 29-30 of 800; 1/20 -> n > 40
        assert expected == [("x", 300)]

    def test_nulls_dropped_empty_ok(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "item string")
        assert heavy_hitters(df, "item", 1, 2).count() == 0
        assert heavy_hitters(df.limit(0), "item", 1, 2).count() == 0

    def test_bad_threshold_raises(self, spark):
        df = _mk(spark, ["a"])
        with pytest.raises(ValueError, match="positive rational"):
            heavy_hitters(df, "item", 0, 5)
        with pytest.raises(ValueError, match="superset guarantee"):
            heavy_hitters(df, "item", 1, 100, candidate_k=5)

    def test_matches_plain_groupby(self, spark):
        # property: output == full groupBy + integer cut, on a skewed mix
        import random

        rng = random.Random(7)
        items = [f"v{rng.randrange(60) ** 2 % 97}" for _ in range(2000)]
        df = _mk(spark, items, parts=6)
        n = len(items)
        truth = sorted(
            (r["item"], r["n"])
            for r in df.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") * 50 > n)
            .collect()
        )
        assert _got(heavy_hitters(df, "item", 1, 50)) == truth
