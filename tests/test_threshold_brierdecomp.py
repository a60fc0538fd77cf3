"""Threshold curve (L423) and Murphy Brier decomposition (L424)."""

import pytest

from lmss_entity_extractor_spark.ops.calibration import (
    brier_decomposition,
    brier_score,
)
from lmss_entity_extractor_spark.ops.evalmetrics import threshold_curve


class TestThresholdCurve:
    def _run(self, spark, rows, ts):
        df = spark.createDataFrame(
            [("g", *r) for r in rows], "grp string, s double, y int"
        )
        return {
            str(r["threshold"]): r
            for r in threshold_curve(df, ["grp"], "s", "y", ts).collect()
        }

    ROWS = [(0.9, 1), (0.8, 1), (0.6, 0), (0.4, 1), (0.2, 0)]

    def test_hand_computed(self, spark):
        out = self._run(spark, self.ROWS, ["0.5", "0.7"])
        r5 = out["0.5000"]
        assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 1, 1, 1)
        assert r5["precision"] == pytest.approx(2 / 3)
        assert r5["accuracy"] == pytest.approx(0.6)
        r7 = out["0.7000"]
        assert r7["precision"] == pytest.approx(1.0)
        assert r7["f1"] == pytest.approx(0.8)

    def test_boundary_is_inclusive_and_exact(self, spark):
        # score exactly at the threshold counts as predicted-positive
        out = self._run(spark, [(0.5, 1), (0.4999, 0)], ["0.5"])
        r = out["0.5000"]
        assert (r["tp"], r["fp"]) == (1, 0)

    def test_degenerate_rates_null(self, spark):
        out = self._run(spark, [(0.1, 0), (0.2, 0)], ["0.9"])
        r = out["0.9000"]
        assert r["precision"] is None and r["recall"] is None
        assert r["f1"] is None

    def test_refusals(self, spark):
        df = spark.createDataFrame(
            [("g", 0.5, 1)], "grp string, s double, y int"
        )
        with pytest.raises(ValueError, match="non-empty"):
            threshold_curve(df, ["grp"], "s", "y", [])
        with pytest.raises(ValueError, match="duplicate"):
            threshold_curve(df, ["grp"], "s", "y", ["0.5", "0.50"])


class TestBrierDecomposition:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "p double, y int")

    def test_hand_computed(self, spark):
        df = self._df(
            spark,
            [(0.8, 1), (0.8, 0), (0.8, 1), (0.2, 0), (0.2, 0), (0.2, 1)],
        )
        r = brier_decomposition(df, "p", "y", scale=1).collect()[0]
        assert r["base_rate"] == pytest.approx(0.5)
        assert r["uncertainty"] == pytest.approx(0.25)
        assert r["reliability"] == pytest.approx(
            (3 * (0.8 - 2 / 3) ** 2 + 3 * (0.2 - 1 / 3) ** 2) / 6
        )
        assert r["resolution"] == pytest.approx(2 * 3 * (1 / 6) ** 2 / 6)

    def test_identity_matches_direct_brier(self, spark):
        rows = [((i % 10) / 10.0, 1 if (i * 7) % 3 == 0 else 0) for i in range(60)]
        df = self._df(spark, rows)
        dec = brier_decomposition(df, "p", "y", scale=1).collect()[0]
        direct = brier_score(df, "p", "y", scale=1).collect()[0]
        assert dec["brier"] == pytest.approx(direct["brier"], abs=1e-12)

    def test_perfectly_calibrated_zero_reliability(self, spark):
        rows = (
            [(0.25, 1)] * 1 + [(0.25, 0)] * 3
            + [(0.75, 1)] * 3 + [(0.75, 0)] * 1
        )
        r = brier_decomposition(self._df(spark, rows), "p", "y", scale=2).collect()[0]
        assert r["reliability"] == pytest.approx(0.0, abs=1e-12)

    def test_out_of_range_refused(self, spark):
        with pytest.raises(ValueError, match="outside"):
            brier_decomposition(
                self._df(spark, [(1.5, 1)]), "p", "y", scale=1
            )
