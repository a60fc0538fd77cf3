"""Hosmer-Lemeshow GOF (L375) and binary confusion panel (L376)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.calibration import hosmer_lemeshow
from lmss_entity_extractor_spark.ops.evalmetrics import (
    binary_confusion_panel,
)


def _hl_ref(rows, g):
    """(hl, g_occ) — same deterministic (p, okey) binning as the op."""
    rows = sorted(rows, key=lambda r: (r[0], r[2]))
    n = len(rows)
    bins = {}
    for i, (p, y, _) in enumerate(rows):
        b = (i * g) // n
        nb, o1, e1 = bins.get(b, (0, 0, 0.0))
        bins[b] = (nb + 1, o1 + y, e1 + p)
    hl = 0.0
    for b in sorted(bins):
        nb, o1, e1 = bins[b]
        hl += (o1 - e1) ** 2 / (e1 * (1 - e1 / nb))
    return hl, len(bins)


def _hl_df(spark, rows, key="k1"):
    return spark.createDataFrame(
        [(key, p, y, i) for p, y, i in rows],
        "key string, p double, y int, okey int",
    )


HL_ROWS = [
    (0.05 + 0.018 * i, 1 if (i * 7) % 10 < 3 else 0, i) for i in range(40)
]


class TestHosmerLemeshow:
    def test_vs_python_reference(self, spark):
        out = hosmer_lemeshow(
            _hl_df(spark, HL_ROWS), ["key"], "p", "y", ["okey"], g=5
        ).collect()[0]
        hl, g_occ = _hl_ref(HL_ROWS, 5)
        assert out["n"] == 40 and out["g_bins"] == g_occ == 5
        assert out["df"] == 3
        assert out["hl_stat"] == pytest.approx(hl, rel=1e-9)

    def test_equal_count_binning_is_rank_based(self, spark):
        # 20 rows, g=5 -> 4 per bin regardless of p clustering
        rows = [(0.5, i % 2, i) for i in range(10)] + [
            (0.9, 1, 100 + i) for i in range(10)
        ]
        out = hosmer_lemeshow(
            _hl_df(spark, rows), ["key"], "p", "y", ["okey"], g=5
        ).collect()[0]
        assert out["g_bins"] == 5
        # bins of constant p=0.9, all y=1: e1 = 0.9*4 < nb -> defined
        hl, _ = _hl_ref(rows, 5)
        assert out["hl_stat"] == pytest.approx(hl, rel=1e-9)

    def test_null_when_a_bin_expects_zero(self, spark):
        rows = [(0.0, 0, i) for i in range(8)] + [
            (0.5 + 0.01 * i, 1, 100 + i) for i in range(16)
        ]
        out = hosmer_lemeshow(
            _hl_df(spark, rows), ["key"], "p", "y", ["okey"], g=4
        ).collect()[0]
        assert out["hl_stat"] is None and out["df"] is None
        assert out["g_bins"] == 4

    def test_null_when_fewer_than_three_bins(self, spark):
        rows = [(0.25, 0, 0), (0.75, 1, 1)]  # n=2 < g -> 2 occupied
        out = hosmer_lemeshow(
            _hl_df(spark, rows), ["key"], "p", "y", ["okey"], g=10
        ).collect()[0]
        assert out["g_bins"] == 2
        assert out["hl_stat"] is None and out["df"] is None

    def test_miscalibration_scores_worse(self, spark):
        # y matches p closely vs y fed 1-p: inverted must score larger
        rows = [
            (0.1 + 0.08 * (i % 10), 1 if (i % 10) >= 7 else 0, i)
            for i in range(60)
        ]
        inv = [(round(1.0 - p, 6), y, i) for p, y, i in rows]
        good = hosmer_lemeshow(
            _hl_df(spark, rows), ["key"], "p", "y", ["okey"], g=5
        ).collect()[0]["hl_stat"]
        bad = hosmer_lemeshow(
            _hl_df(spark, inv), ["key"], "p", "y", ["okey"], g=5
        ).collect()[0]["hl_stat"]
        assert bad > good

    def test_refusals(self, spark):
        df = _hl_df(spark, [(1.5, 1, 0), (0.2, 0, 1)])
        with pytest.raises(ValueError, match="outside"):
            hosmer_lemeshow(df, ["key"], "p", "y", ["okey"]).collect()
        ok = _hl_df(spark, HL_ROWS)
        with pytest.raises(ValueError, match="g must be"):
            hosmer_lemeshow(ok, ["key"], "p", "y", ["okey"], g=2)
        with pytest.raises(ValueError, match="order_cols"):
            hosmer_lemeshow(ok, ["key"], "p", "y", [])

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [("k1", 0.5, 1, 0), ("k1", None, 1, 1), ("k1", 0.5, None, 2)],
            "key string, p double, y int, okey int",
        )
        out = hosmer_lemeshow(
            df, ["key"], "p", "y", ["okey"], g=3
        ).collect()[0]
        assert out["n"] == 1


def _conf_df(spark, cells, key="k1"):
    """cells = (tp, fp, fn, tn) -> rows."""
    tp, fp, fn, tn = cells
    rows = (
        [(key, 1, 1)] * tp
        + [(key, 0, 1)] * fp
        + [(key, 1, 0)] * fn
        + [(key, 0, 0)] * tn
    )
    return spark.createDataFrame(rows, "key string, y int, pred int")


class TestConfusionPanel:
    def test_hand_case(self, spark):
        tp, fp, fn, tn = 4, 2, 1, 3
        out = binary_confusion_panel(
            _conf_df(spark, (tp, fp, fn, tn)), ["key"], "y", "pred"
        ).collect()[0]
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (4, 2, 1, 3)
        assert out["accuracy"] == pytest.approx(7 / 10)
        assert out["tpr"] == pytest.approx(4 / 5)
        assert out["tnr"] == pytest.approx(3 / 5)
        assert out["ppv"] == pytest.approx(4 / 6)
        assert out["npv"] == pytest.approx(3 / 4)
        assert out["balanced_accuracy"] == pytest.approx(0.7)
        mcc = (4 * 3 - 2 * 1) / math.sqrt(6 * 5 * 5 * 4)
        assert out["mcc"] == pytest.approx(mcc, rel=1e-12)
        assert out["fowlkes_mallows"] == pytest.approx(
            math.sqrt((4 / 6) * (4 / 5)), rel=1e-12
        )
        assert out["informedness"] == pytest.approx(4 / 5 + 3 / 5 - 1)
        assert out["markedness"] == pytest.approx(4 / 6 + 3 / 4 - 1)

    def test_perfect_predictor(self, spark):
        out = binary_confusion_panel(
            _conf_df(spark, (5, 0, 0, 7)), ["key"], "y", "pred"
        ).collect()[0]
        assert out["mcc"] == pytest.approx(1.0)
        assert out["balanced_accuracy"] == 1.0
        assert out["fowlkes_mallows"] == 1.0

    def test_all_positive_predictor_nulls(self, spark):
        out = binary_confusion_panel(
            _conf_df(spark, (5, 5, 0, 0)), ["key"], "y", "pred"
        ).collect()[0]
        assert out["mcc"] is None  # tn+fn = 0 marginal
        assert out["npv"] is None and out["markedness"] is None
        assert out["tpr"] == 1.0 and out["tnr"] == 0.0
        assert out["balanced_accuracy"] == pytest.approx(0.5)

    def test_one_class_labels_nulls(self, spark):
        out = binary_confusion_panel(
            _conf_df(spark, (3, 0, 2, 0)), ["key"], "y", "pred"
        ).collect()[0]
        assert out["mcc"] is None and out["tnr"] is None
        assert out["balanced_accuracy"] is None

    def test_mcc_identity(self, spark):
        out = binary_confusion_panel(
            _conf_df(spark, (13, 4, 6, 9)), ["key"], "y", "pred"
        ).collect()[0]
        assert out["mcc"] * out["mcc"] == pytest.approx(
            out["informedness"] * out["markedness"], rel=1e-12
        )

    def test_refuses_non_binary(self, spark):
        df = spark.createDataFrame(
            [("k1", 2, 1), ("k1", 0, 0)], "key string, y int, pred int"
        )
        with pytest.raises(ValueError, match="non-binary"):
            binary_confusion_panel(df, ["key"], "y", "pred")

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [("k1", 1, 1), ("k1", None, 1), ("k1", 0, None)],
            "key string, y int, pred int",
        )
        out = binary_confusion_panel(df, ["key"], "y", "pred").collect()[0]
        assert out["n"] == 1 and out["tp"] == 1
