"""Krippendorff interval α (L429) and rater severity panel (L430)."""

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    krippendorff_interval,
    rater_severity,
)


def _alpha_ref(units):
    vals = [x for u in units for x in u if len(u) >= 2]
    n = len(vals)
    do = sum(
        2 * (len(u) * sum(x * x for x in u) - sum(u) ** 2) / (len(u) - 1)
        for u in units
        if len(u) >= 2
    ) / n
    de = 2 * (n * sum(x * x for x in vals) - sum(vals) ** 2) / (n * (n - 1))
    return do, de, 1 - do / de


class TestKrippendorffInterval:
    def _run(self, spark, units):
        rows = [
            ("g", f"u{i}", float(x))
            for i, u in enumerate(units)
            for x in u
        ]
        df = spark.createDataFrame(rows, "grp string, u string, v double")
        return krippendorff_interval(df, ["grp"], "u", "v").collect()[0]

    def test_python_reference(self, spark):
        units = [[1, 2], [3, 3], [2, 4], [5]]
        r = self._run(spark, units)
        do, de, alpha = _alpha_ref(units)
        assert r["d_o"] == pytest.approx(do, abs=1e-8)
        assert r["d_e"] == pytest.approx(de, rel=1e-12)
        assert r["alpha"] == pytest.approx(alpha, abs=1e-8)
        assert r["n_values"] == 6   # the singleton unit is excluded

    def test_perfect_agreement_alpha_one(self, spark):
        r = self._run(spark, [[2, 2], [5, 5], [3, 3]])
        assert r["d_o"] == pytest.approx(0.0)
        assert r["alpha"] == pytest.approx(1.0)

    def test_all_identical_null(self, spark):
        r = self._run(spark, [[4, 4], [4, 4]])
        assert r["alpha"] is None

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", None, 1.0)], "grp string, u string, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            krippendorff_interval(df, ["grp"], "u", "v")


class TestRaterSeverity:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            [("g", *r) for r in rows], "grp string, r string, i string, v double"
        )
        return {
            r["rater"]: r
            for r in rater_severity(df, ["grp"], "r", "i", "v").collect()
        }

    def test_hand_computed_loo(self, spark):
        out = self._run(
            spark,
            [
                ("r1", "i1", 3.0), ("r2", "i1", 1.0),
                ("r1", "i2", 5.0), ("r2", "i2", 3.0), ("r3", "i2", 4.0),
            ],
        )
        # r1: i1 off 3-1=2; i2 loo (3+4)/2=3.5, off 1.5 -> bias 1.75
        assert out["r1"]["bias"] == pytest.approx(1.75, abs=1e-8)
        assert out["r2"]["bias"] == pytest.approx(-1.75, abs=1e-8)
        assert out["r1"]["rank"] == 1 and out["r2"]["rank"] == 3

    def test_unbiased_rater_zero(self, spark):
        out = self._run(
            spark,
            [("a", "i1", 2.0), ("b", "i1", 2.0), ("c", "i1", 2.0)],
        )
        for r in out.values():
            assert r["bias"] == pytest.approx(0.0)

    def test_single_rating_items_excluded(self, spark):
        out = self._run(
            spark,
            [("a", "solo", 9.0), ("a", "i1", 2.0), ("b", "i1", 4.0)],
        )
        assert out["a"]["n_rated"] == 1   # solo item dropped

    def test_duplicate_pair_refused(self, spark):
        with pytest.raises(ValueError, match="duplicate"):
            self._run(
                spark, [("a", "i1", 1.0), ("a", "i1", 2.0)]
            )
