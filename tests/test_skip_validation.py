"""The ``skip_validation()`` escape hatch (r4 VERDICT depth ask):
eager validation guards are full input scans — 2–3 extra Spark
actions per op call — and a caller who already validated upstream
can disable them for the rest of the pipeline."""

import pytest

from lmss_entity_extractor_spark.ops.apportion import highest_averages
from lmss_entity_extractor_spark.ops.rankeval import (
    rank_biased_precision,
)
from lmss_entity_extractor_spark.ops.timeseries import detect_peaks
from lmss_entity_extractor_spark.ops.validate import (
    skip_validation,
    validation_enabled,
)


class TestSkipValidation:
    def test_flag_default_on_and_reentrant(self):
        assert validation_enabled()
        with skip_validation():
            assert not validation_enabled()
            with skip_validation():
                assert not validation_enabled()
            assert not validation_enabled()
        assert validation_enabled()

    def test_restored_after_exception(self):
        with pytest.raises(RuntimeError):
            with skip_validation():
                raise RuntimeError("boom")
        assert validation_enabled()

    def test_guards_fire_by_default(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 5.0), ("g", 1.0, 7.0)],
            "k string, t double, v double",
        )
        with pytest.raises(ValueError, match="duplicate"):
            detect_peaks(df, ["k"], "t", "v")

    def test_skip_bypasses_the_scan(self, spark):
        # same duplicate-keyed input: with validation off the guard
        # scan never runs and the op computes on whatever arrives
        df = spark.createDataFrame(
            [("g", 1.0, 5.0), ("g", 1.0, 7.0), ("g", 2.0, 1.0)],
            "k string, t double, v double",
        )
        with skip_validation():
            rows = detect_peaks(df, ["k"], "t", "v").collect()
        # no refusal: the op computed on the rows as they arrived
        # (caller-beware semantics — here the duplicate key produced a
        # nominal interior peak)
        assert len(rows) == 1

    def test_skip_spawns_no_jobs_before_the_real_action(self, spark):
        # the knob's point at 100 TB: zero Spark jobs until the caller
        # acts.  Building the plan under skip_validation() must not
        # trigger any count() — assert via the job-counting listener.
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        df = spark.createDataFrame(
            [("g", float(i), float(i % 3)) for i in range(10)],
            "k string, t double, v double",
        )
        before = len(tracker.getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobGroup("probe", "probe")
        with skip_validation():
            out = detect_peaks(df, ["k"], "t", "v")
            ha = highest_averages(
                spark.createDataFrame(
                    [("e", "A", 5), ("e", "B", 3)],
                    "el string, party string, votes long",
                ),
                ["el"],
                "party",
                "votes",
                4,
            )
            rb = rank_biased_precision(
                spark.createDataFrame(
                    [("q", 1, 1), ("q", 2, 0)],
                    "q string, rank int, rel int",
                ),
                ["q"],
                "rank",
                "rel",
            )
        mid = len(tracker.getJobIdsForGroup("probe") or [])
        assert mid == 0, "validation scans ran despite skip_validation()"
        # the plans still execute correctly afterwards
        assert out.count() >= 0
        assert {r["party"]: r["seats"] for r in ha.collect()} == {
            "A": 3,
            "B": 1,
        }
        assert rb.collect()[0]["rbp"] > 0
        spark.sparkContext.setJobGroup(None, None)
        _ = before  # silence unused warning on some pytest configs

    def test_results_identical_with_and_without(self, spark):
        df = spark.createDataFrame(
            [("g", float(i), float((i * 7) % 5)) for i in range(12)],
            "k string, t double, v double",
        )
        a = detect_peaks(df, ["k"], "t", "v").collect()
        with skip_validation():
            b = detect_peaks(df, ["k"], "t", "v").collect()
        assert a == b
