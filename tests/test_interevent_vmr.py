"""Inter-event time stats (L261) and dispersion index (L262)."""

import datetime
import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import dispersion_index
from lmss_entity_extractor_spark.ops.timeseries import interevent_stats


def _ie_py(ts_us):
    gaps = [b - a for a, b in zip(ts_us, ts_us[1:])]
    n = len(gaps)
    mean = sum(gaps) / n
    var = (n * sum(g * g for g in gaps) - sum(gaps) ** 2) / (n * (n - 1))
    sd = math.sqrt(var)
    return mean, sd, sd / mean, (sd - mean) / (sd + mean)


class TestInterevent:
    def _df(self, spark, offsets_us, g="s1"):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (g, base + datetime.timedelta(microseconds=o))
            for o in offsets_us
        ]
        return spark.createDataFrame(rows, "g string, ts timestamp")

    def test_matches_python_reference(self, spark):
        offs = [0, 1_000_000, 2_500_000, 3_000_000, 7_000_000, 7_100_000]
        out = interevent_stats(self._df(spark, offs), ["g"], "ts").collect()[0]
        mean, sd, cv, b = _ie_py(offs)
        assert out["mean_us"] == pytest.approx(mean, rel=1e-12)
        assert out["sd_us"] == pytest.approx(sd, rel=1e-12)
        assert out["cv"] == pytest.approx(cv, rel=1e-12)
        assert out["burstiness"] == pytest.approx(b, rel=1e-12)
        assert out["n_gaps"] == 5

    def test_periodic_negative_burstiness(self, spark):
        offs = [i * 1_000_000 for i in range(20)]
        out = interevent_stats(self._df(spark, offs), ["g"], "ts").collect()[0]
        assert out["cv"] == pytest.approx(0.0, abs=1e-12)
        assert out["burstiness"] == pytest.approx(-1.0)

    def test_bursty_positive(self, spark):
        offs = [0, 1, 2, 3, 4, 60_000_000, 60_000_001, 60_000_002]
        out = interevent_stats(self._df(spark, offs), ["g"], "ts").collect()[0]
        assert out["burstiness"] > 0.3

    def test_single_event_omitted(self, spark):
        assert interevent_stats(
            self._df(spark, [0]), ["g"], "ts"
        ).count() == 0

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", None)], "g string, ts timestamp"
        )
        with pytest.raises(ValueError, match="NULL"):
            interevent_stats(df, ["g"], "ts")


class TestDispersion:
    def _df(self, spark, counts, g="t1"):
        return spark.createDataFrame(
            [(g, int(c)) for c in counts], "g string, c int"
        )

    def test_poisson_like_near_one(self, spark):
        # variance == mean exactly for this crafted multiset
        counts = [0, 1, 1, 2]  # mean 1, sample var 2/3 -> not 1; craft:
        counts = [0, 2, 0, 2]  # mean 1, var 4/3
        out = dispersion_index(self._df(spark, counts), ["g"], "c").collect()[0]
        n = 4
        mean = 1.0
        var = (n * 8 - 16) / (n * (n - 1))
        assert out["vmr"] == pytest.approx(var / mean, rel=1e-12)

    def test_overdispersed(self, spark):
        counts = [0] * 20 + [50]
        out = dispersion_index(self._df(spark, counts), ["g"], "c").collect()[0]
        assert out["vmr"] > 10

    def test_constant_underdispersed(self, spark):
        out = dispersion_index(
            self._df(spark, [3] * 10), ["g"], "c"
        ).collect()[0]
        assert out["vmr"] == 0.0

    def test_zero_mean_null(self, spark):
        out = dispersion_index(
            self._df(spark, [0, 0, 0]), ["g"], "c"
        ).collect()[0]
        assert out["vmr"] is None

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            dispersion_index(self._df(spark, [-1, 2]), ["g"], "c")
