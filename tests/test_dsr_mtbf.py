"""Direct standardization (L329) and MTBF/MTTR (L330)."""

import pytest

from lmss_entity_extractor_spark.ops.effectsize import (
    direct_standardization,
)
from lmss_entity_extractor_spark.ops.timeseries import mtbf_mttr


class TestDirectStandardization:
    def _df(self, spark, cells, g="g1"):
        rows = [
            (g, s, grp, int(x), int(t))
            for (s, grp), (x, t) in cells.items()
        ]
        return spark.createDataFrame(
            rows, "g string, s string, grp string, x long, t long"
        )

    CELLS = {
        ("young", "A"): (10, 100), ("old", "A"): (40, 400),
        ("young", "B"): (30, 400), ("old", "B"): (20, 100),
    }

    def test_matches_hand_computation(self, spark):
        rows = {
            r["group"]: r
            for r in direct_standardization(
                self._df(spark, self.CELLS), ["g"], "s", "grp",
                "x", "t",
            ).collect()
        }
        # pooled stratum shares: young 500/1000, old 500/1000
        # A: 0.5*0.1 + 0.5*0.1 = 0.1 ; B: 0.5*0.075 + 0.5*0.2
        assert rows["A"]["std_rate"] == pytest.approx(0.1, rel=1e-12)
        assert rows["B"]["std_rate"] == pytest.approx(
            0.5 * (30 / 400) + 0.5 * (20 / 100), rel=1e-12
        )
        assert rows["A"]["crude_rate"] == pytest.approx(50 / 500)

    def test_missing_stratum_null(self, spark):
        cells = dict(self.CELLS)
        del cells[("old", "B")]
        rows = {
            r["group"]: r
            for r in direct_standardization(
                self._df(spark, cells), ["g"], "s", "grp", "x", "t"
            ).collect()
        }
        assert rows["B"]["std_rate"] is None
        assert rows["A"]["std_rate"] is not None


class TestMtbfMttr:
    def _df(self, spark, events, g="g1"):
        return spark.createDataFrame(
            [(g, f"2024-01-01 00:00:{s:02d}", st) for s, st in events],
            "g string, ts string, state string",
        ).selectExpr("g", "CAST(ts AS TIMESTAMP) AS ts", "state")

    def test_basic_reliability(self, spark):
        # up 0-10, down 10-14, up 14-30, down 30-32, up 32-40
        events = [
            (0, "up"), (5, "up"), (10, "down"), (12, "down"),
            (14, "up"), (20, "up"), (30, "down"), (32, "up"),
            (40, "up"),
        ]
        row = mtbf_mttr(
            self._df(spark, events), ["g"], "ts", "state", "up"
        ).collect()[0]
        assert row["n_failures"] == 2
        assert row["mtbf_s"] == pytest.approx(20.0)  # 10 -> 30
        assert row["mttr_s"] == pytest.approx(3.0)  # (4 + 2)/2
        # closed observation 0..40: down 6s -> availability 34/40
        assert row["availability"] == pytest.approx(34 / 40)

    def test_single_failure_null_mtbf(self, spark):
        events = [(0, "up"), (10, "down"), (15, "up"), (20, "up")]
        row = mtbf_mttr(
            self._df(spark, events), ["g"], "ts", "state", "up"
        ).collect()[0]
        assert row["n_failures"] == 1
        assert row["mtbf_s"] is None
        assert row["mttr_s"] == pytest.approx(5.0)

    def test_never_down_full_availability(self, spark):
        events = [(0, "up"), (10, "up"), (20, "up")]
        row = mtbf_mttr(
            self._df(spark, events), ["g"], "ts", "state", "up"
        ).collect()[0]
        assert row["n_failures"] == 0
        assert row["mttr_s"] is None
        assert row["availability"] == 1.0
