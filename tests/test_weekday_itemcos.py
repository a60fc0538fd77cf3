"""Weekday profile (L361) and item-item cosine (L362)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.cohort import weekday_profile
from lmss_entity_extractor_spark.ops.itemsets import item_cosine


class TestWeekdayProfile:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", d, float(v)) for d, v in rows],
            "g string, ts string, v double",
        ).selectExpr("g", "CAST(ts AS TIMESTAMP) AS ts", "v")

    def test_means_and_index(self, spark):
        # 2024-01-07 is a Sunday (dow=1), 2024-01-08 Monday (dow=2)
        rows = [
            ("2024-01-07", 10.0), ("2024-01-14", 30.0),   # Sundays: mean 20
            ("2024-01-08", 40.0),                          # Monday: mean 40
        ]
        out = {r["dow"]: r for r in weekday_profile(
            self._df(spark, rows), ["g"], "ts", "v"
        ).collect()}
        overall = 80.0 / 3
        assert out[1]["n"] == 2 and out[1]["mean"] == 20.0
        assert out[2]["mean"] == 40.0
        assert out[1]["idx"] == pytest.approx(20.0 / overall, rel=1e-12)
        assert out[2]["idx"] == pytest.approx(40.0 / overall, rel=1e-12)

    def test_flat_series_all_ones(self, spark):
        rows = [(f"2024-01-{d:02d}", 5.0) for d in range(1, 15)]
        out = weekday_profile(
            self._df(spark, rows), ["g"], "ts", "v"
        ).collect()
        for r in out:
            assert r["idx"] == pytest.approx(1.0, rel=1e-12)

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            weekday_profile(
                spark.createDataFrame(
                    [("g", None, 1.0)], "g string, ts timestamp, v double"
                ),
                ["g"], "ts", "v",
            )


class TestItemCosine:
    def _df(self, spark, baskets):
        rows = [
            (b, it) for b, items in baskets.items() for it in items
        ]
        return spark.createDataFrame(rows, "b string, i string")

    def test_counts_and_cosine(self, spark):
        baskets = {
            "b1": ["a", "b", "c"],
            "b2": ["a", "b"],
            "b3": ["a", "c"],
            "b4": ["a"],
        }
        rows = item_cosine(self._df(spark, baskets), "b", "i", k=10)
        got = {(r["item"], r["neighbor"]): r for r in rows.collect()}
        r = got[("a", "b")]
        assert r["co"] == 2 and r["n_item"] == 4 and r["n_neighbor"] == 2
        assert r["cosine"] == pytest.approx(2 / math.sqrt(8), rel=1e-12)
        # symmetric
        assert got[("b", "a")]["cosine"] == r["cosine"]

    def test_presence_based_dedup(self, spark):
        baskets = {"b1": ["a", "a", "b"], "b2": ["a", "b"]}
        got = {(r["item"], r["neighbor"]): r for r in item_cosine(
            self._df(spark, baskets), "b", "i", k=10
        ).collect()}
        # a counted once per basket: co = 2, n_a = 2, n_b = 2 -> 1.0
        assert got[("a", "b")]["cosine"] == pytest.approx(1.0)

    def test_topk_tiebreak(self, spark):
        baskets = {
            "b1": ["x", "p"], "b2": ["x", "q"],
            "b3": ["x", "p"], "b4": ["x", "q"],
        }
        rows = [r for r in item_cosine(
            self._df(spark, baskets), "b", "i", k=1
        ).collect() if r["item"] == "x"]
        # p and q tie (co=2, n=2 each): neighbor asc -> p wins
        assert len(rows) == 1 and rows[0]["neighbor"] == "p"

    def test_min_co_prunes(self, spark):
        baskets = {"b1": ["a", "b"], "b2": ["a", "c"], "b3": ["a", "b"]}
        rows = item_cosine(
            self._df(spark, baskets), "b", "i", k=10, min_co=2
        ).collect()
        pairs = {(r["item"], r["neighbor"]) for r in rows}
        assert ("a", "b") in pairs and ("a", "c") not in pairs

    def test_refusals(self, spark):
        df = self._df(spark, {"b1": ["a"]})
        with pytest.raises(ValueError, match="k must"):
            item_cosine(df, "b", "i", k=0)
        with pytest.raises(ValueError, match="NULL"):
            item_cosine(
                spark.createDataFrame(
                    [("b", None)], "b string, i string"
                ),
                "b", "i",
            )
