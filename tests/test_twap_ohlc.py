"""Time-weighted average (L182) + OHLC bars (L183)."""

import datetime

import pytest

from lmss_entity_extractor_spark.ops.timeseries import ohlc_bars, time_weighted_avg


def _ts(sec):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


def _series(spark, pairs, grp="g"):
    return spark.createDataFrame(
        [(grp, _ts(s), float(v)) for s, v in pairs],
        "g string, ts timestamp, v double",
    )


class TestTwap:
    def test_hand_computed(self, spark):
        # v=10 held 60s, v=20 held 30s, last obs unweighted
        pairs = [(0, 10.0), (60, 20.0), (90, 99.0)]
        r = time_weighted_avg(_series(spark, pairs), ["g"], "ts", "v").collect()[0]
        assert r["span_micros"] == 90_000_000
        assert r["twap"] == pytest.approx((10 * 60 + 20 * 30) / 90, abs=0)

    def test_differs_from_plain_avg(self, spark):
        # spike held for 1s among long calm stretches: AVG says 34, TWAP ~1
        pairs = [(0, 1.0), (100, 100.0), (101, 1.0), (201, 77.0)]
        r = time_weighted_avg(_series(spark, pairs), ["g"], "ts", "v").collect()[0]
        assert r["twap"] < 2.0

    def test_single_obs_null(self, spark):
        r = time_weighted_avg(_series(spark, [(0, 5.0)]), ["g"], "ts", "v").collect()[0]
        assert r["twap"] is None and r["span_micros"] == 0

    def test_duplicate_ts_refused(self, spark):
        with pytest.raises(ValueError, match="duplicate"):
            time_weighted_avg(
                _series(spark, [(0, 1.0), (0, 2.0)]), ["g"], "ts", "v"
            ).collect()


class TestOhlc:
    def test_bar_values(self, spark):
        pairs = [(0, 5.0), (10, 9.0), (20, 2.0), (30, 7.0)]
        r = ohlc_bars(
            _series(spark, pairs), ["g"], "ts", "v", bucket_seconds=3600
        ).collect()[0]
        assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
            5.0,
            9.0,
            2.0,
            7.0,
            4,
        )

    def test_bucket_split(self, spark):
        pairs = [(0, 1.0), (3599, 2.0), (3600, 3.0)]
        rows = ohlc_bars(
            _series(spark, pairs), ["g"], "ts", "v", bucket_seconds=3600
        ).collect()
        assert len(rows) == 2
        by_start = {r["bucket_start"]: r for r in rows}
        starts = sorted(by_start)
        assert by_start[starts[0]]["close"] == 2.0
        assert by_start[starts[1]]["open"] == 3.0

    def test_duplicate_ts_refused(self, spark):
        with pytest.raises(ValueError, match="duplicate"):
            ohlc_bars(
                _series(spark, [(0, 1.0), (0, 2.0)]), ["g"], "ts", "v"
            ).collect()
