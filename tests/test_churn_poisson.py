"""Top-k churn (L249) and the two-sample Poisson rate test (L250)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import topk_churn
from lmss_entity_extractor_spark.ops.stattests import poisson_rate_test


class TestTopkChurn:
    def _df(self, spark, periods):
        rows = [
            (p, item, float(score))
            for p, items in periods.items()
            for item, score in items.items()
        ]
        return spark.createDataFrame(rows, "p int, item string, s double")

    def test_basic_churn(self, spark):
        periods = {
            1: {"a": 9, "b": 8, "c": 7, "d": 1},
            2: {"a": 9, "b": 8, "e": 7, "f": 1},
        }
        out = topk_churn(self._df(spark, periods), "p", "item", "s", k=3)
        rows = out.collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["period"], r["prev_period"]) == (2, 1)
        assert r["n_common"] == 2  # a, b
        assert r["jaccard"] == 2.0 / 4.0
        assert r["entered"] == 1 and r["exited"] == 1

    def test_identical_periods_jaccard_one(self, spark):
        items = {"a": 3, "b": 2, "c": 1}
        periods = {1: items, 2: items, 3: items}
        rows = topk_churn(
            self._df(spark, periods), "p", "item", "s", k=3
        ).collect()
        assert len(rows) == 2
        assert all(r["jaccard"] == 1.0 for r in rows)

    def test_period_gaps_pair_with_previous_observed(self, spark):
        periods = {1: {"a": 1}, 5: {"a": 1}}
        rows = topk_churn(
            self._df(spark, periods), "p", "item", "s", k=2
        ).collect()
        assert len(rows) == 1
        assert (rows[0]["period"], rows[0]["prev_period"]) == (5, 1)

    def test_tiebreak_deterministic(self, spark):
        periods = {1: {"a": 5, "b": 5, "c": 5}, 2: {"b": 5, "c": 5, "z": 5}}
        r = topk_churn(
            self._df(spark, periods), "p", "item", "s", k=2
        ).collect()[0]
        # top-2 by (score desc, item asc): p1 {a,b}, p2 {b,c}
        assert r["n_common"] == 1

    def test_k_validation(self, spark):
        with pytest.raises(ValueError, match="k must"):
            topk_churn(self._df(spark, {1: {"a": 1}}), "p", "item", "s", k=0)


class TestPoissonRate:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(g, int(c), float(t)) for g, c, t in rows],
            "g string, c int, t double",
        )

    def test_matches_hand_formula(self, spark):
        rows = [("A", 30, 10.0), ("A", 20, 5.0), ("B", 25, 20.0)]
        out = poisson_rate_test(
            self._df(spark, rows), [], "g", "A", "B", "c", "t"
        ).collect()[0]
        ca, cb, ta, tb = 50, 25, 15.0, 20.0
        p0 = ta / (ta + tb)
        c = ca + cb
        z = (ca - c * p0) / math.sqrt(c * p0 * (1.0 - p0))
        assert out["z"] == pytest.approx(z, rel=1e-12)
        assert out["rate_a"] == ca / ta and out["rate_b"] == cb / tb
        assert out["rate_ratio"] == pytest.approx((ca / ta) / (cb / tb))

    def test_equal_rates_small_z(self, spark):
        rows = [("A", 100, 10.0), ("B", 200, 20.0)]
        out = poisson_rate_test(
            self._df(spark, rows), [], "g", "A", "B", "c", "t"
        ).collect()[0]
        assert abs(out["z"]) < 1e-9

    def test_zero_events_null_z(self, spark):
        rows = [("A", 0, 10.0), ("B", 0, 20.0)]
        out = poisson_rate_test(
            self._df(spark, rows), [], "g", "A", "B", "c", "t"
        ).collect()[0]
        assert out["z"] is None

    def test_negative_refused(self, spark):
        rows = [("A", 5, -1.0), ("B", 2, 3.0)]
        with pytest.raises(ValueError, match="negative"):
            poisson_rate_test(
                self._df(spark, rows), [], "g", "A", "B", "c", "t"
            )
