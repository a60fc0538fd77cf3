"""Fairness audit (L417) and Markov removal-effect attribution (L418)."""

import pytest

from lmss_entity_extractor_spark.ops.cohort import markov_attribution
from lmss_entity_extractor_spark.ops.evalmetrics import fairness_audit


class TestFairnessAudit:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, y int, p int"
        )

    def test_hand_computed_gaps(self, spark):
        # group a: 4 rows, preds 1,1,0,0 -> pos_rate .5
        # group b: 4 rows, preds 1,0,0,0 -> pos_rate .25
        rows = [
            ("a", 1, 1), ("a", 1, 1), ("a", 0, 0), ("a", 0, 0),
            ("b", 1, 1), ("b", 1, 0), ("b", 0, 0), ("b", 0, 0),
        ]
        out = {
            r["group"]: r
            for r in fairness_audit(
                self._df(spark, rows), [], "grp", "y", "p"
            ).collect()
        }
        assert out["a"]["pos_rate"] == pytest.approx(0.5)
        assert out["b"]["pos_rate"] == pytest.approx(0.25)
        assert out["a"]["tpr"] == pytest.approx(1.0)
        assert out["b"]["tpr"] == pytest.approx(0.5)
        assert out["a"]["dp_gap"] == pytest.approx(0.25)
        assert out["a"]["eo_tpr_gap"] == pytest.approx(0.5)
        assert out["a"]["eo_fpr_gap"] == pytest.approx(0.0)
        assert out["a"]["disparate_impact"] == pytest.approx(0.5)

    def test_perfectly_fair(self, spark):
        rows = [("a", 1, 1), ("a", 0, 0), ("b", 1, 1), ("b", 0, 0)]
        out = fairness_audit(
            self._df(spark, rows), [], "grp", "y", "p"
        ).collect()[0]
        assert out["dp_gap"] == pytest.approx(0.0)
        assert out["disparate_impact"] == pytest.approx(1.0)

    def test_undefined_rate_excluded_from_gap(self, spark):
        # group b has no labeled positives -> tpr NULL, excluded
        rows = [("a", 1, 1), ("a", 1, 0), ("b", 0, 1), ("b", 0, 0)]
        out = {
            r["group"]: r
            for r in fairness_audit(
                self._df(spark, rows), [], "grp", "y", "p"
            ).collect()
        }
        assert out["b"]["tpr"] is None
        assert out["a"]["eo_tpr_gap"] == pytest.approx(0.0)

    def test_nonbinary_refused(self, spark):
        rows = [("a", 2, 1)]
        with pytest.raises(ValueError):
            fairness_audit(self._df(spark, rows), [], "grp", "y", "p")

    def test_null_group_refused(self, spark):
        rows = [(None, 1, 1)]
        with pytest.raises(ValueError, match="NULL group"):
            fairness_audit(self._df(spark, rows), [], "grp", "y", "p")


def _journeys(spark, spec):
    rows = []
    for j, (chs, conv) in enumerate(spec):
        for r, c in enumerate(chs):
            rows.append(("g", f"j{j}", r, c, conv))
    return spark.createDataFrame(
        rows, "grp string, j string, r int, c string, conv boolean"
    )


class TestMarkovAttribution:
    SPEC = [(["C1", "C2"], True), (["C1"], False), (["C2", "C3"], True)]

    def test_hand_computed_model(self, spark):
        out = {
            r["channel"]: r
            for r in markov_attribution(
                _journeys(spark, self.SPEC), ["grp"], "j", "r", "c",
                "conv", n_steps=40,
            ).collect()
        }
        # hand absorption: base 2/3; removals: C1 -> 1/3, C2 -> 0,
        # C3 -> 1/3; effects .5, 1, .5; shares .25, .5, .25
        assert out["C1"]["base_p"] == pytest.approx(2 / 3, abs=1e-9)
        assert out["C1"]["removal_effect"] == pytest.approx(0.5, abs=1e-9)
        assert out["C2"]["removal_effect"] == pytest.approx(1.0, abs=1e-9)
        assert out["C3"]["removal_effect"] == pytest.approx(0.5, abs=1e-9)
        assert out["C1"]["share"] == pytest.approx(0.25, abs=1e-8)
        assert out["C2"]["share"] == pytest.approx(0.5, abs=1e-8)
        assert out["C1"]["n_touches"] == 2

    def test_single_channel_gets_all_credit(self, spark):
        spec = [(["A"], True), (["A"], False)]
        out = markov_attribution(
            _journeys(spark, spec), ["grp"], "j", "r", "c", "conv"
        ).collect()[0]
        assert out["removal_effect"] == pytest.approx(1.0)
        assert out["share"] == pytest.approx(1.0)

    def test_no_conversions_null(self, spark):
        spec = [(["A", "B"], False), (["B"], False)]
        out = markov_attribution(
            _journeys(spark, spec), ["grp"], "j", "r", "c", "conv"
        ).collect()
        for r in out:
            assert r["base_p"] == pytest.approx(0.0)
            assert r["removal_effect"] is None and r["share"] is None

    def test_varying_conversion_flag_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "j0", 0, "A", True), ("g", "j0", 1, "B", False)],
            "grp string, j string, r int, c string, conv boolean",
        )
        with pytest.raises(ValueError, match="non-constant"):
            markov_attribution(df, ["grp"], "j", "r", "c", "conv")

    def test_duplicate_order_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "j0", 0, "A", True), ("g", "j0", 0, "B", True)],
            "grp string, j string, r int, c string, conv boolean",
        )
        with pytest.raises(ValueError, match="duplicate"):
            markov_attribution(df, ["grp"], "j", "r", "c", "conv")

    def test_long_journey_refused(self, spark):
        spec = [([f"C{i % 3}" for i in range(9)], True)]
        with pytest.raises(ValueError, match="max_journey"):
            markov_attribution(
                _journeys(spark, spec), ["grp"], "j", "r", "c",
                "conv", max_journey=8,
            )
