"""Span-level eval (L433) and prediction churn (L434)."""

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    prediction_churn,
    span_eval,
)


def _spans(spark, rows):
    return spark.createDataFrame(rows, "doc string, s int, e int, t string")


class TestSpanEval:
    PRED = [
        ("d1", 0, 5, "PER"), ("d1", 10, 15, "ORG"),
        ("d2", 0, 3, "PER"), ("d2", 5, 9, "LOC"),
    ]
    GOLD = [
        ("d1", 0, 5, "PER"), ("d1", 10, 15, "PER"),
        ("d2", 0, 3, "PER"), ("d2", 20, 25, "LOC"),
    ]

    def _run(self, spark, pred, gold):
        return {
            r["type"]: r
            for r in span_eval(
                _spans(spark, pred), _spans(spark, gold), [],
                ["doc", "s", "e"], "t",
            ).collect()
        }

    def test_exact_match_per_type(self, spark):
        out = self._run(spark, self.PRED, self.GOLD)
        assert out["PER"]["tp"] == 2
        assert out["PER"]["precision"] == pytest.approx(1.0)
        assert out["PER"]["recall"] == pytest.approx(2 / 3)
        assert out["LOC"]["tp"] == 0 and out["LOC"]["f1"] == 0.0
        assert out["ORG"]["recall"] is None   # no gold ORG spans

    def test_micro_is_type_aware(self, spark):
        out = self._run(spark, self.PRED, self.GOLD)
        # d1 10-15 matches boundaries but not type: must NOT count
        assert out["__ALL__"]["tp"] == 2
        assert out["__ALL__"]["precision"] == pytest.approx(0.5)

    def test_duplicates_collapse(self, spark):
        out = self._run(
            spark,
            [("d", 0, 1, "A"), ("d", 0, 1, "A")],
            [("d", 0, 1, "A")],
        )
        assert out["A"]["n_pred"] == 1 and out["A"]["tp"] == 1

    def test_perfect(self, spark):
        out = self._run(spark, self.GOLD, self.GOLD)
        assert out["__ALL__"]["f1"] == pytest.approx(1.0)

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            self._run(spark, [("d", 0, 1, None)], self.GOLD)


class TestPredictionChurn:
    def _run(self, spark, pairs):
        df = spark.createDataFrame(pairs, "o string, n string")
        return {
            (r["old_label"], r["new_label"]): r
            for r in prediction_churn(df, [], "o", "n").collect()
        }

    def test_hand_computed(self, spark):
        out = self._run(
            spark, [("a", "a")] * 6 + [("a", "b")] * 2 + [("b", "b")] * 2
        )
        assert out[("a", "b")]["n"] == 2
        assert out[("a", "b")]["frac"] == pytest.approx(0.2)
        assert out[("a", "a")]["churn_rate"] == pytest.approx(0.2)
        assert out[("a", "b")]["net_drift_old"] == -2
        assert out[("a", "b")]["net_drift_new"] == 2

    def test_identical_models_zero_churn(self, spark):
        out = self._run(spark, [("x", "x")] * 5 + [("y", "y")] * 5)
        for r in out.values():
            assert r["churn_rate"] == pytest.approx(0.0)
            assert r["net_drift_old"] == 0

    def test_new_class_appears(self, spark):
        out = self._run(spark, [("a", "c"), ("a", "a")])
        assert out[("a", "c")]["net_drift_new"] == 1
        assert out[("a", "c")]["net_drift_old"] == -1

    def test_null_refused(self, spark):
        df = spark.createDataFrame([("a", None)], "o string, n string")
        with pytest.raises(ValueError, match="NULL"):
            prediction_churn(df, [], "o", "n")
