"""ABC / Pareto classification (L387) and count-dispersion panel (L388)."""

import datetime as dt
import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import abc_classification
from lmss_entity_extractor_spark.ops.timeseries import count_dispersion


def _items(spark):
    return spark.createDataFrame(
        [("g", "w", 50.0), ("g", "x", 30.0), ("g", "y", 15.0), ("g", "z", 5.0)],
        "grp string, item string, v double",
    )


class TestAbcClassification:
    def test_hand_case(self, spark):
        out = {
            r["item"]: r
            for r in abc_classification(
                _items(spark), ["grp"], ["item"], "v"
            ).collect()
        }
        # prev cumulative shares: 0, 50, 80, 95 of total 100
        assert out["w"]["abc_class"] == "A"
        assert out["x"]["abc_class"] == "A"   # crosses 0.80 -> stays A
        assert out["y"]["abc_class"] == "B"   # prev = 80, not < 80
        assert out["z"]["abc_class"] == "C"   # prev = 95, not < 95
        assert [out[k]["rank"] for k in "wxyz"] == [1, 2, 3, 4]
        assert out["z"]["cum_share"] == pytest.approx(1.0)
        assert out["x"]["cum_share"] == pytest.approx(0.8)
        assert float(out["y"]["cum_value"]) == pytest.approx(95.0)

    def test_tie_orders_by_item(self, spark):
        df = spark.createDataFrame(
            [("g", "b", 10.0), ("g", "a", 10.0)],
            "grp string, item string, v double",
        )
        out = abc_classification(df, ["grp"], ["item"], "v").collect()
        by_rank = sorted(out, key=lambda r: r["rank"])
        assert [r["item"] for r in by_rank] == ["a", "b"]

    def test_zero_total_null(self, spark):
        df = spark.createDataFrame(
            [("g", "a", 0.0), ("g", "b", 0.0)],
            "grp string, item string, v double",
        )
        for r in abc_classification(df, ["grp"], ["item"], "v").collect():
            assert r["abc_class"] is None
            assert r["cum_share"] is None

    def test_negative_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "a", -1.0)], "grp string, item string, v double"
        )
        with pytest.raises(ValueError, match="negative"):
            abc_classification(df, ["grp"], ["item"], "v")

    def test_bad_thresholds_refused(self, spark):
        with pytest.raises(ValueError, match="a_share"):
            abc_classification(
                _items(spark), ["grp"], ["item"], "v",
                a_share="0.95", b_share="0.80",
            )

    def test_boundary_decimal_exact(self, spark):
        # total = 10.00: a-limit = 8.000 and b-limit = 9.500 exactly;
        # prev of exactly 8.00 -> B and exactly 9.50 -> C (strict <),
        # never knife-edged by IEEE
        df = spark.createDataFrame(
            [("g", "a", 8.0), ("g", "b", 1.5), ("g", "c", 0.5)],
            "grp string, item string, v double",
        )
        out = {
            r["item"]: r["abc_class"]
            for r in abc_classification(
                df, ["grp"], ["item"], "v"
            ).collect()
        }
        assert out == {"a": "A", "b": "B", "c": "C"}


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class TestCountDispersion:
    def _df(self, spark, times):
        return spark.createDataFrame(
            [("k", t) for t in times], "k string, ts timestamp"
        )

    def test_periodic_fano_zero(self, spark):
        df = self._df(spark, [_ts(h) for h in range(5)])
        r = count_dispersion(df, ["k"], "ts", 3600).collect()[0]
        assert r["n_events"] == 5
        assert r["n_buckets"] == 5
        assert r["n_active_buckets"] == 5
        assert r["mean_per_bucket"] == pytest.approx(1.0)
        assert r["fano"] == pytest.approx(0.0)
        assert r["burstiness"] == pytest.approx(-1.0)

    def test_clumped(self, spark):
        times = [_ts(0, i) for i in range(9)] + [_ts(9)]
        r = count_dispersion(
            self._df(spark, times), ["k"], "ts", 3600
        ).collect()[0]
        # counts: b0=9, b9=1; n=10, S=10, Q=82, D=720
        assert r["n_buckets"] == 10
        assert r["n_active_buckets"] == 2
        assert r["fano"] == pytest.approx(7.2)
        sd = math.sqrt(720.0)
        assert r["burstiness"] == pytest.approx((sd - 10) / (sd + 10))

    def test_interior_empty_buckets_count(self, spark):
        r = count_dispersion(
            self._df(spark, [_ts(0), _ts(4)]), ["k"], "ts", 3600
        ).collect()[0]
        # counts over span 0..4: 1,0,0,0,1 -> n=5, S=2, Q=2, D=6
        assert r["n_buckets"] == 5
        assert r["mean_per_bucket"] == pytest.approx(0.4)
        assert r["fano"] == pytest.approx(0.6)

    def test_single_bucket(self, spark):
        r = count_dispersion(
            self._df(spark, [_ts(0), _ts(0, 30)]), ["k"], "ts", 3600
        ).collect()[0]
        assert r["n_buckets"] == 1
        assert r["fano"] == pytest.approx(0.0)
        assert r["burstiness"] == pytest.approx(-1.0)

    def test_null_ts_refused(self, spark):
        df = spark.createDataFrame(
            [("k", None)], "k string, ts timestamp"
        )
        with pytest.raises(ValueError, match="NULL timestamp"):
            count_dispersion(df, ["k"], "ts", 3600)

    def test_pre_epoch_refused(self, spark):
        df = self._df(spark, [dt.datetime(1969, 12, 31, 0)])
        with pytest.raises(ValueError, match="pre-epoch"):
            count_dispersion(df, ["k"], "ts", 3600)

    def test_bad_width_refused(self, spark):
        with pytest.raises(ValueError, match="bucket_seconds"):
            count_dispersion(
                self._df(spark, [_ts(0)]), ["k"], "ts", 0
            )
