"""Repo-wide validation-gate contract (VERDICT r5 item 1).

Inside ``skip_validation()`` a representative panel of ops must launch
ZERO Spark jobs at construction time — every eager refusal scan is
behind ``validation_enabled()``.  With validation on (the default) the
same constructions DO launch guard jobs and still refuse bad input, so
the job counter provably detects what the gate removes.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.validate import skip_validation, validation_enabled


def _jobs_run(spark, fn) -> int:
    """Run ``fn`` under a unique job group; return how many jobs it ran."""
    sc = spark.sparkContext
    group = f"vgate-{time.monotonic_ns()}"
    sc.setJobGroup(group, "validation-gate probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    return len(tracker.getJobIdsForGroup(group))


@pytest.fixture()
def ts_df(spark):
    rows = [(k, i, float(i % 7) + 1.0) for k in ("a", "b") for i in range(40)]
    return spark.createDataFrame(rows, "key string, t int, v double")


@pytest.fixture()
def ts_time_df(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [
        (k, base + dt.timedelta(minutes=i), float(i % 5) + 1.0)
        for k in ("a", "b")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, v double")


def _panel(ts_df, ts_time_df):
    """Construction-only calls across gated modules (all return lazily)."""
    from lmss_entity_extractor_spark.ops.changepoint import cusum, pettitt
    from lmss_entity_extractor_spark.ops.effectsize import cohens_d
    from lmss_entity_extractor_spark.ops.timeseries import (
        detect_peaks,
        time_weighted_avg,
    )
    from lmss_entity_extractor_spark.ops.trend import mann_kendall

    out = [
        time_weighted_avg(ts_time_df, by=["key"], ts_col="ts", value_col="v"),
        detect_peaks(ts_df, by=["key"], order_col="t", value_col="v"),
        mann_kendall(ts_df, by=["key"], order_col="t", value_col="v"),
        cusum(
            ts_df,
            by=["key"],
            order_cols=["t"],
            value_col="v",
            target="3.00",
            slack="0.50",
            threshold="5.00",
        ),
        pettitt(ts_df, by=["key"], order_col="t", value_col="v"),
    ]
    grp = ts_df.withColumn(
        "variant", F.when(F.col("t") % 2 == 0, "a").otherwise("b")
    )
    out.append(
        cohens_d(
            grp,
            by=["key"],
            variant_col="variant",
            variant_a="a",
            variant_b="b",
            metric_col="v",
        )
    )
    return out


class TestValidationGate:
    def test_skip_validation_runs_zero_jobs(self, spark, ts_df, ts_time_df):
        def build():
            assert not validation_enabled()
            _panel(ts_df, ts_time_df)

        with skip_validation():
            n = _jobs_run(spark, build)
        assert n == 0, f"{n} pre-flight job(s) ran under skip_validation()"

    def test_validation_on_runs_guard_jobs(self, spark, ts_df, ts_time_df):
        """The probe actually detects guard scans: with validation ON the
        same panel runs a positive number of jobs at construction."""
        n = _jobs_run(spark, lambda: _panel(ts_df, ts_time_df))
        assert n > 0

    def test_guards_still_refuse_bad_input(self, spark, ts_time_df):
        from lmss_entity_extractor_spark.ops.timeseries import time_weighted_avg

        dup = ts_time_df.union(ts_time_df.limit(1))
        with pytest.raises(ValueError, match="duplicate timestamp"):
            time_weighted_avg(dup, by=["key"], ts_col="ts", value_col="v")
        # and the same input passes silently under the knob (caller-beware)
        with skip_validation():
            time_weighted_avg(dup, by=["key"], ts_col="ts", value_col="v")

    def test_flag_is_process_wide_across_threads(self, spark):
        """ADVICE r5: ops submitted from worker threads inside an open
        skip_validation() block must see the gate too."""
        import threading

        seen = {}

        def probe():
            seen["enabled"] = validation_enabled()

        with skip_validation():
            t = threading.Thread(target=probe)
            t.start()
            t.join()
        assert seen["enabled"] is False
        assert validation_enabled() is True
