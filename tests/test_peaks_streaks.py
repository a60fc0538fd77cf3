"""Peak detection with prominence (L415) and streak panel (L416)."""

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    detect_peaks,
    streak_panel,
)


def _series(spark, xs):
    return spark.createDataFrame(
        [("g", i, float(x)) for i, x in enumerate(xs)],
        "k string, t int, v double",
    )


class TestDetectPeaks:
    def _run(self, spark, xs, **kw):
        out = detect_peaks(_series(spark, xs), ["k"], "t", "v", **kw).collect()
        return {int(r["t"]): float(r["prominence"]) for r in out}

    def test_hand_computed(self, spark):
        # 1 3 2 5 1 4 2: peaks at idx 1 (prom 1), 3 (prom 4), 5 (prom 2)
        got = self._run(spark, [1, 3, 2, 5, 1, 4, 2])
        assert got == {1: 1.0, 3: 4.0, 5: 2.0}

    def test_global_max_prominence_to_min(self, spark):
        got = self._run(spark, [5, 2, 9, 3, 6])
        # peak 9: no higher either side -> bases min(2), min(3) -> 9-3
        assert got[2] == 6.0

    def test_plateau_not_a_peak(self, spark):
        got = self._run(spark, [1, 4, 4, 1])
        assert got == {}

    def test_endpoints_never_peaks(self, spark):
        got = self._run(spark, [9, 1, 8])
        assert got == {}

    def test_monotone_no_peaks(self, spark):
        assert self._run(spark, [1, 2, 3, 4]) == {}

    def test_duplicate_order_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 0, 2.0)], "k string, t int, v double"
        )
        with pytest.raises(ValueError, match="duplicate"):
            detect_peaks(df, ["k"], "t", "v")

    def test_max_len_refused(self, spark):
        with pytest.raises(ValueError, match="max_len"):
            detect_peaks(
                _series(spark, list(range(30))), ["k"], "t", "v",
                max_len=10,
            )


class TestStreakPanel:
    def _run(self, spark, xs):
        return streak_panel(
            _series(spark, xs), ["k"], ["t"], "v"
        ).collect()[0]

    def test_hand_computed(self, spark):
        r = self._run(spark, [1, 3, 2, 5, 1, 4, 2])
        assert r["n"] == 7
        assert r["max_inc_run"] == 2
        assert r["max_dec_run"] == 2
        assert r["max_flat_run"] == 1
        assert r["tail_inc_run"] == 1   # last step is a decrease

    def test_long_rally_and_tail(self, spark):
        r = self._run(spark, [5, 1, 2, 3, 4, 9])
        assert r["max_inc_run"] == 5
        assert r["tail_inc_run"] == 5

    def test_plateau(self, spark):
        r = self._run(spark, [2, 2, 2, 3, 1, 1])
        assert r["max_flat_run"] == 3
        assert r["max_dec_run"] == 2

    def test_single_row(self, spark):
        r = self._run(spark, [7])
        assert (
            r["max_inc_run"], r["max_dec_run"], r["max_flat_run"],
            r["tail_inc_run"],
        ) == (1, 1, 1, 1)

    def test_strictly_decreasing(self, spark):
        r = self._run(spark, [9, 7, 5, 3])
        assert r["max_dec_run"] == 4
        assert r["max_inc_run"] == 1

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, None)], "k string, t int, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            streak_panel(df, ["k"], ["t"], "v")
