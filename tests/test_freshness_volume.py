"""Freshness panel (L441) and volume-anomaly panel (L442)."""

import datetime as dt

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    freshness_panel,
    volume_anomaly,
)


class TestFreshnessPanel:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        return {
            r["part"] if "part" in r else r["k"]: r
            for r in freshness_panel(df, ["k"], "ts", **kw).collect()
        }

    def test_lag_and_staleness(self, spark):
        rows = [
            ("a", dt.datetime(2024, 1, 10, 13)),
            ("b", dt.datetime(2024, 1, 10, 10)),
        ]
        out = self._run(spark, rows, stale_after_s=3600)
        assert out["a"]["lag_s"] == pytest.approx(0.0)
        assert out["a"]["stale"] is False
        assert out["b"]["lag_s"] == pytest.approx(3 * 3600.0)
        assert out["b"]["stale"] is True

    def test_boundary_is_exact_not_stale(self, spark):
        rows = [
            ("a", dt.datetime(2024, 1, 1, 1, 0, 0)),
            ("b", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ]
        out = self._run(spark, rows, stale_after_s=3600)
        # lag is EXACTLY the threshold -> strict > -> not stale
        assert out["b"]["stale"] is False

    def test_null_refused(self, spark):
        df = spark.createDataFrame([("a", None)], "k string, ts timestamp")
        with pytest.raises(ValueError, match="NULL"):
            freshness_panel(df, ["k"], "ts")


class TestVolumeAnomaly:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        return volume_anomaly(df, ["k"], "ts", **kw).collect()

    def test_spike_scores_high(self, spark):
        rows = []
        counts = [3, 4, 3, 5, 3, 4, 20, 3, 4, 3]
        for d, c in enumerate(counts):
            for h in range(c):
                rows.append(("g", dt.datetime(2024, 1, 1 + d, h)))
        out = {r["n"]: r for r in self._run(spark, rows)}
        spike = out[20]
        import statistics

        med = statistics.median(sorted(counts))
        mad = statistics.median(
            sorted(abs(c - med) for c in counts)
        )
        assert spike["median_n"] == pytest.approx(med)
        assert spike["mad_n"] == pytest.approx(mad)
        assert spike["robust_z"] == pytest.approx(
            (20 - med) / (1.4826 * mad), rel=1e-12
        )
        assert spike["robust_z"] > 5

    def test_silent_day_counted_as_zero(self, spark):
        rows = []
        day_counts = {0: 3, 1: 5, 3: 4, 4: 6}   # day 2 silent
        for d, c in day_counts.items():
            for h in range(c):
                rows.append(("g", dt.datetime(2024, 1, 1 + d, h)))
        out = self._run(spark, rows)
        zero_rows = [r for r in out if r["n"] == 0]
        assert len(zero_rows) == 1
        assert zero_rows[0]["robust_z"] < -2

    def test_constant_volume_null_z(self, spark):
        rows = [
            ("g", dt.datetime(2024, 1, 1 + d, h))
            for d in range(5)
            for h in range(3)
        ]
        out = self._run(spark, rows)
        assert all(r["robust_z"] is None for r in out)
        assert all(r["mad_n"] == 0.0 for r in out)

    def test_span_cap_refused(self, spark):
        rows = [
            ("g", dt.datetime(2024, 1, 1)),
            ("g", dt.datetime(2025, 1, 1)),
        ]
        with pytest.raises(ValueError, match="max_buckets"):
            self._run(spark, rows, bucket_seconds=86400, max_buckets=100)
