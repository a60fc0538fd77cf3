"""Regular-grid resampling + gap-fill / interpolation (L112)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.timeseries import resample_gap_fill

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def series(spark):
    # key 'a': observations at minutes 0, 3 (gap at 1, 2), value ramps 0 -> 30
    # key 'b': single observation
    rows = [
        ("a", _ts(0), 0.0),
        ("a", _ts(3), 30.0),
        ("b", _ts(5), 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


class TestResample:
    def test_linear_interpolation(self, spark, series):
        out = resample_gap_fill(series, "k", "ts", "v", step_seconds=60)
        got = {
            (r["k"], r["bucket_ts"].minute): (r["value"], r["is_observed"])
            for r in out.collect()
        }
        assert got[("a", 0)] == (0.0, True)
        assert got[("a", 1)] == (10.0, False)
        assert got[("a", 2)] == (20.0, False)
        assert got[("a", 3)] == (30.0, True)
        assert got[("b", 5)] == (7.0, True)
        assert len(got) == 5  # spine covers only [first, last] per key

    def test_ffill_and_null(self, spark, series):
        ff = resample_gap_fill(series, "k", "ts", "v", 60, fill="ffill")
        got = {(r["k"], r["bucket_ts"].minute): r["value"] for r in ff.collect()}
        assert got[("a", 1)] == 0.0 and got[("a", 2)] == 0.0
        nu = resample_gap_fill(series, "k", "ts", "v", 60, fill="null")
        gotn = {(r["k"], r["bucket_ts"].minute): r["value"] for r in nu.collect()}
        assert gotn[("a", 1)] is None and gotn[("a", 3)] == 30.0

    def test_in_bucket_aggregation(self, spark):
        rows = [
            ("a", _ts(0), 1.0),
            ("a", _ts(0) + dt.timedelta(seconds=30), 5.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        avg = resample_gap_fill(df, "k", "ts", "v", 60, agg="avg").collect()
        assert avg[0]["value"] == 3.0
        mx = resample_gap_fill(df, "k", "ts", "v", 60, agg="max").collect()
        assert mx[0]["value"] == 5.0

    def test_uneven_gap_time_weighting(self, spark):
        # observed at minutes 0 (v=0) and 4 (v=8): slope 2/min
        rows = [("a", _ts(0), 0.0), ("a", _ts(4), 8.0)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            r["bucket_ts"].minute: r["value"]
            for r in resample_gap_fill(df, "k", "ts", "v", 60).collect()
        }
        assert got == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0, 4: 8.0}

    def test_null_times_and_values_dropped(self, spark):
        rows = [("a", _ts(0), 1.0), ("a", None, 9.0), ("a", _ts(1), None)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = resample_gap_fill(df, "k", "ts", "v", 60).collect()
        assert len(out) == 1 and out[0]["value"] == 1.0

    def test_slot_guard_is_loud(self, spark, series):
        with pytest.raises(Exception, match="more than 2 slots"):
            resample_gap_fill(
                series, "k", "ts", "v", 60, max_buckets_per_key=2
            ).collect()

    def test_validation(self, spark, series):
        with pytest.raises(ValueError, match="step_seconds"):
            resample_gap_fill(series, "k", "ts", "v", 0)
        with pytest.raises(ValueError, match="agg"):
            resample_gap_fill(series, "k", "ts", "v", 60, agg="sum")
        with pytest.raises(ValueError, match="fill"):
            resample_gap_fill(series, "k", "ts", "v", 60, fill="spline")
        with pytest.raises(ValueError, match="not in DataFrame"):
            resample_gap_fill(series, "k", "ts", "nope", 60)
