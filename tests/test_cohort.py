"""Cohort retention + ordered funnel (L114)."""

import datetime as dt

import pytest

from lmss_entity_extractor_spark.ops.cohort import cohort_retention, funnel

T0 = dt.datetime(2024, 1, 1)  # midnight Monday, aligned to the epoch week? (irrelevant: buckets are epoch-aligned)


def _ts(days, seconds=0):
    return T0 + dt.timedelta(days=days, seconds=seconds)


DAY = 24 * 3600


@pytest.fixture(scope="module")
def activity(spark):
    # day-long periods; users u1..u3 start day 0, u4 starts day 1
    rows = [
        ("u1", _ts(0)), ("u1", _ts(1)), ("u1", _ts(2)),
        ("u2", _ts(0)), ("u2", _ts(2)),
        ("u3", _ts(0)),
        ("u4", _ts(1)), ("u4", _ts(2)),
    ]
    return spark.createDataFrame(rows, "user string, ts timestamp")


class TestCohortRetention:
    def test_matrix(self, spark, activity):
        out = cohort_retention(activity, "user", "ts", period_seconds=DAY)
        got = {
            (r["cohort_period"].day, r["offset"]): (r["n_active"], r["retention"])
            for r in out.collect()
        }
        assert got[(1, 0)] == (3, 1.0)
        assert got[(1, 1)] == (1, pytest.approx(1 / 3, abs=1e-6))
        assert got[(1, 2)] == (2, pytest.approx(2 / 3, abs=1e-6))
        assert got[(2, 0)] == (1, 1.0)  # u4 is the only day-2 starter
        assert got[(2, 1)] == (1, 1.0)
        assert len(got) == 5

    def test_multiple_events_per_period_count_once(self, spark):
        rows = [("u1", _ts(0)), ("u1", _ts(0, 60)), ("u1", _ts(0, 120))]
        df = spark.createDataFrame(rows, "user string, ts timestamp")
        out = cohort_retention(df, "user", "ts", DAY).collect()
        assert len(out) == 1 and out[0]["n_active"] == 1

    def test_validation(self, spark, activity):
        with pytest.raises(ValueError, match="period_seconds"):
            cohort_retention(activity, "user", "ts", 0)
        with pytest.raises(ValueError, match="not in DataFrame"):
            cohort_retention(activity, "nope", "ts", DAY)


@pytest.fixture(scope="module")
def journey(spark):
    rows = [
        # completes all three in order
        ("a", _ts(0, 0), "view"), ("a", _ts(0, 10), "click"), ("a", _ts(0, 20), "buy"),
        # wrong order: click before view; after view there is no click
        ("b", _ts(0, 0), "click"), ("b", _ts(0, 10), "view"), ("b", _ts(0, 20), "buy"),
        # stops after two steps
        ("c", _ts(0, 0), "view"), ("c", _ts(0, 5), "click"),
        # same-timestamp events: strict ordering required, click not after view
        ("d", _ts(0, 0), "view"), ("d", _ts(0, 0), "click"),
        # no funnel events at all
        ("e", _ts(0, 0), "error"),
    ]
    return spark.createDataFrame(rows, "user string, ts timestamp, step string")


class TestFunnel:
    def test_depths(self, spark, journey):
        out = funnel(journey, "user", "ts", "step", ["view", "click", "buy"])
        got = {r["steps_completed"]: r["n_users"] for r in out.collect()}
        # e: 0 (no rows survive the step filter so e vanishes -> 0 bucket counts only users WITH funnel events)
        assert got == {0: 0, 1: 2, 2: 1, 3: 1}  # b and d depth 1, c depth 2, a depth 3

    def test_horizon(self, spark):
        rows = [
            ("a", _ts(0, 0), "view"), ("a", _ts(0, 100), "click"),
            ("b", _ts(0, 0), "view"), ("b", _ts(0, 5), "click"),
        ]
        df = spark.createDataFrame(rows, "user string, ts timestamp, step string")
        got = {
            r["steps_completed"]: r["n_users"]
            for r in funnel(df, "user", "ts", "step", ["view", "click"],
                            horizon_seconds=10).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1}

    def test_anchored_at_first_step0(self, spark):
        # first view at t=0; click at t=50 is outside horizon even though
        # the view at t=45 would allow it — documented greedy-first chain
        rows = [
            ("a", _ts(0, 0), "view"), ("a", _ts(0, 45), "view"),
            ("a", _ts(0, 50), "click"),
        ]
        df = spark.createDataFrame(rows, "user string, ts timestamp, step string")
        got = {
            r["steps_completed"]: r["n_users"]
            for r in funnel(df, "user", "ts", "step", ["view", "click"],
                            horizon_seconds=10).collect()
        }
        assert got == {0: 0, 1: 1, 2: 0}

    def test_guard_is_loud(self, spark, journey):
        with pytest.raises(Exception, match="max_events_per_user"):
            funnel(journey, "user", "ts", "step", ["view", "click"],
                   max_events_per_user=1).collect()

    def test_validation(self, spark, journey):
        with pytest.raises(ValueError, match="distinct step names"):
            funnel(journey, "user", "ts", "step", ["view", "view"])
        with pytest.raises(ValueError, match="not in DataFrame"):
            funnel(journey, "user", "ts", "nope", ["view"])
