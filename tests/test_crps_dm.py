"""CRPS ensemble score (L401) and Diebold-Mariano test (L402)."""

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    crps_ensemble,
    diebold_mariano,
)


def _ens(spark, cases):
    """cases: dict case -> (members, obs)."""
    rows = []
    for c, (xs, y) in cases.items():
        for x in xs:
            rows.append(("g", c, float(x), float(y)))
    return spark.createDataFrame(
        rows, "grp string, c string, x double, y double"
    )


def _crps_ref(xs, y):
    m = len(xs)
    a = sum(abs(x - y) for x in xs)
    b = sum(abs(x1 - x2) for x1 in xs for x2 in xs)
    return a / m - b / (2.0 * m * m)


class TestCrps:
    def test_hand_case(self, spark):
        r = crps_ensemble(
            _ens(spark, {"c1": ([1, 3], 2), "c2": ([5, 5], 5)}),
            ["grp"], "c", "x", "y",
        ).collect()[0]
        assert r["mean_crps"] == pytest.approx(0.25, abs=1e-8)
        assert r["mean_mae"] == pytest.approx(0.5, abs=1e-8)
        assert (r["m_min"], r["m_max"]) == (2, 2)

    def test_python_reference_ragged(self, spark):
        cases = {
            "a": ([1.5, 2.5, 9.0], 3.0),
            "b": ([4.0], 4.5),
            "c": ([0.0, 1.0, 2.0, 3.0, 10.0], 2.2),
        }
        r = crps_ensemble(
            _ens(spark, cases), ["grp"], "c", "x", "y"
        ).collect()[0]
        want = sum(_crps_ref(xs, y) for xs, y in cases.values()) / 3
        assert r["mean_crps"] == pytest.approx(want, abs=1e-8)

    def test_crps_le_mae(self, spark):
        cases = {"a": ([1, 2, 8], 4), "b": ([0, 10], 3)}
        r = crps_ensemble(
            _ens(spark, cases), ["grp"], "c", "x", "y"
        ).collect()[0]
        assert r["mean_crps"] <= r["mean_mae"] + 1e-12

    def test_perfect_point_ensemble_zero(self, spark):
        r = crps_ensemble(
            _ens(spark, {"a": ([7, 7, 7], 7)}), ["grp"], "c", "x", "y"
        ).collect()[0]
        assert r["mean_crps"] == pytest.approx(0.0, abs=1e-9)

    def test_varying_obs_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "c", 1.0, 2.0), ("g", "c", 1.0, 3.0)],
            "grp string, c string, x double, y double",
        )
        with pytest.raises(ValueError, match="non-constant"):
            crps_ensemble(df, ["grp"], "c", "x", "y")

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "c", None, 2.0)], "grp string, c string, x double, y double"
        )
        with pytest.raises(ValueError, match="NULL"):
            crps_ensemble(df, ["grp"], "c", "x", "y")

    def test_wide_refused(self, spark):
        df = _ens(spark, {"a": (list(range(9)), 4)})
        with pytest.raises(ValueError, match="max_members"):
            crps_ensemble(df, ["grp"], "c", "x", "y", max_members=8)


def _losses(spark, la, lb):
    return spark.createDataFrame(
        [("g", i, float(a), float(b)) for i, (a, b) in enumerate(zip(la, lb))],
        "grp string, t int, la double, lb double",
    )


class TestDieboldMariano:
    def test_clear_winner_negative_dm(self, spark):
        # A consistently smaller loss (with some noise) -> dm << 0
        la = [1.0 + 0.1 * ((i * 7) % 5) for i in range(24)]
        lb = [3.0 + 0.1 * ((i * 11) % 7) for i in range(24)]
        r = diebold_mariano(
            _losses(spark, la, lb), ["grp"], ["t"], "la", "lb", max_lag=2
        ).collect()[0]
        assert r["mean_d"] < 0
        assert r["dm"] < -3

    def test_identical_losses_null_dm(self, spark):
        la = [1.0, 2.0, 3.0, 1.5, 2.5, 3.5, 1.0, 2.0]
        r = diebold_mariano(
            _losses(spark, la, la), ["grp"], ["t"], "la", "lb", max_lag=2
        ).collect()[0]
        assert r["mean_d"] == pytest.approx(0.0)
        assert r["dm"] is None

    def test_symmetry(self, spark):
        la = [1.0 + ((i * 3) % 4) for i in range(20)]
        lb = [2.0 + ((i * 5) % 3) for i in range(20)]
        r1 = diebold_mariano(
            _losses(spark, la, lb), ["grp"], ["t"], "la", "lb", max_lag=1
        ).collect()[0]
        r2 = diebold_mariano(
            _losses(spark, lb, la), ["grp"], ["t"], "la", "lb", max_lag=1
        ).collect()[0]
        assert r1["dm"] == pytest.approx(-r2["dm"], rel=1e-12)

    def test_short_series_null(self, spark):
        r = diebold_mariano(
            _losses(spark, [1, 2, 3], [2, 3, 1]),
            ["grp"], ["t"], "la", "lb", max_lag=2,
        ).collect()[0]
        assert r["se_hac"] is None and r["dm"] is None

    def test_null_loss_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0, None)], "grp string, t int, la double, lb double"
        )
        with pytest.raises(ValueError, match="NULL loss"):
            diebold_mariano(df, ["grp"], ["t"], "la", "lb", max_lag=1)
