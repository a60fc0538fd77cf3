"""Seasonal Theil-Sen (L307) and records test (L308)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.trend import (
    records_test,
    seasonal_theil_sen,
)


def _sts_py(ts, xs, period):
    phases = {}
    for t, x in zip(ts, xs):
        phases.setdefault(int(t) % period, []).append((t, x))
    slopes = []
    for pts in phases.values():
        pts = sorted(pts)
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                if pts[j][0] != pts[i][0]:
                    slopes.append(
                        (pts[j][1] - pts[i][1])
                        / (pts[j][0] - pts[i][0])
                    )
    slopes.sort()
    k = len(slopes)
    if k % 2 == 1:
        return k, slopes[k // 2]
    return k, (slopes[k // 2 - 1] + slopes[k // 2]) / 2.0


def _df(spark, ts, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(t), float(x)) for t, x in zip(ts, xs)],
        "g string, t double, x double",
    )


class TestSeasonalTheilSen:
    def test_matches_python_reference(self, spark):
        ts = list(range(21))
        xs = [7 * (t % 3) + 0.4 * t + (1 if t % 5 == 0 else 0)
              for t in ts]
        row = seasonal_theil_sen(
            _df(spark, ts, xs), ["g"], "t", "x", period=3
        ).collect()[0]
        k, slope = _sts_py(ts, xs, 3)
        assert row["n_slopes"] == k
        assert row["slope"] == pytest.approx(slope, rel=1e-12)

    def test_recovers_drift_despite_cycle(self, spark):
        ts = list(range(28))
        xs = [100 * (t % 7) + 0.25 * t for t in ts]
        row = seasonal_theil_sen(
            _df(spark, ts, xs), ["g"], "t", "x", period=7
        ).collect()[0]
        # within a phase the series is exactly linear with slope 0.25
        assert row["slope"] == pytest.approx(0.25, rel=1e-12)

    def test_bad_period_refused(self, spark):
        with pytest.raises(ValueError, match="period"):
            seasonal_theil_sen(
                _df(spark, [0], [1.0]), ["g"], "t", "x", period=1
            )


def _records_py(xs):
    n = len(xs)
    r, mx = 0, None
    for x in xs:
        if mx is None or x > mx:
            r += 1
            mx = x
    e = sum(1.0 / i for i in range(1, n + 1))
    var = sum(1.0 / i - 1.0 / (i * i) for i in range(1, n + 1))
    return r, e, (r - e) / math.sqrt(var)


class TestRecordsTest:
    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9.5, 7]
        ts = list(range(len(xs)))
        row = records_test(_df(spark, ts, xs), ["g"], ["t"], "x").collect()[0]
        r, e, z = _records_py(xs)
        assert row["n_records"] == r
        assert row["expected"] == pytest.approx(e, rel=1e-12)
        assert row["z"] == pytest.approx(z, rel=1e-12)

    def test_monotone_all_records(self, spark):
        xs = list(range(20))
        row = records_test(
            _df(spark, xs, xs), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["n_records"] == 20
        assert row["z"] > 5.0

    def test_ties_not_records(self, spark):
        xs = [5, 5, 5, 5]
        ts = list(range(4))
        row = records_test(_df(spark, ts, xs), ["g"], ["t"], "x").collect()[0]
        assert row["n_records"] == 1

    def test_null_refused(self, spark):
        df = _df(spark, [0, 1], [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            records_test(df, ["g"], ["t"], "x")
