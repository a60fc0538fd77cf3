"""Epidemiological decision panel (L425) and continuous MDE (L426)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import (
    mde_continuous,
    risk_decision_panel,
)


class TestRiskDecisionPanel:
    def _run(self, spark, a, b, c, d):
        rows = (
            [("g", 1, 1)] * a + [("g", 1, 0)] * b
            + [("g", 0, 1)] * c + [("g", 0, 0)] * d
        )
        df = spark.createDataFrame(rows, "grp string, e int, y int")
        return risk_decision_panel(df, ["grp"], "e", "y").collect()[0]

    def test_hand_computed(self, spark):
        r = self._run(spark, 8, 12, 4, 36)
        assert r["rr"] == pytest.approx(4.0)
        assert r["rd"] == pytest.approx(0.3)
        assert r["nnt"] == pytest.approx(1 / 0.3)
        assert r["paf"] == pytest.approx(0.5)
        assert r["e_value"] == pytest.approx(4 + math.sqrt(12))

    def test_protective_rr_inverted_for_evalue(self, spark):
        r = self._run(spark, 2, 18, 8, 12)   # RR = 0.1/0.4 = 0.25
        assert r["rr"] == pytest.approx(0.25)
        assert r["e_value"] == pytest.approx(4 + math.sqrt(12))

    def test_null_effect(self, spark):
        r = self._run(spark, 5, 5, 5, 5)
        assert r["rr"] == pytest.approx(1.0)
        assert r["e_value"] == pytest.approx(1.0)
        assert r["nnt"] is None
        assert r["paf"] == pytest.approx(0.0)

    def test_zero_unexposed_rate_null_rr(self, spark):
        r = self._run(spark, 3, 7, 0, 10)
        assert r["rr"] is None and r["e_value"] is None

    def test_nonbinary_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 2, 1)], "grp string, e int, y int"
        )
        with pytest.raises(ValueError):
            risk_decision_panel(df, ["grp"], "e", "y")


class TestMdeContinuous:
    Z = 1.959963984540054 + 0.8416212335729143

    def _run(self, spark, xs, **kw):
        df = spark.createDataFrame(
            [("g", float(x)) for x in xs], "grp string, v double"
        )
        return mde_continuous(df, ["grp"], "v", **kw).collect()[0]

    def test_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
        r = self._run(spark, xs, target_rel_effect="0.05")
        n = len(xs)
        m = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
        s = math.sqrt(var)
        assert r["sd"] == pytest.approx(s, rel=1e-12)
        assert r["mde_abs"] == pytest.approx(
            self.Z * s * math.sqrt(2 / n), rel=1e-12
        )
        assert r["n_per_arm_target"] == math.ceil(
            2 * (self.Z * s / (0.05 * m)) ** 2
        )

    def test_mde_shrinks_with_n(self, spark):
        small = self._run(spark, [1, 5, 3, 7] * 3)
        large = self._run(spark, [1, 5, 3, 7] * 30)
        assert large["mde_abs"] < small["mde_abs"]

    def test_constant_null(self, spark):
        r = self._run(spark, [4, 4, 4])
        assert r["sd"] is None and r["mde_abs"] is None

    def test_bad_target_refused(self, spark):
        with pytest.raises(ValueError, match="target_rel_effect"):
            self._run(spark, [1, 2], target_rel_effect="0")
