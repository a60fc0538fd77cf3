"""Youden cutpoint (L305) and PR-AUC (L306)."""

import pytest

from lmss_entity_extractor_spark.ops.rankeval import pr_auc, youden_cutpoint


def _youden_py(pairs):
    ts = sorted({s for _, s in pairs}, reverse=True)
    p = sum(1 for l, _ in pairs if l)
    n = len(pairs) - p
    best = None
    for t in ts:
        cp = sum(1 for l, s in pairs if l and s >= t)
        cn = sum(1 for l, s in pairs if not l and s >= t)
        j = cp / p - cn / n
        if best is None or j > best[3] or (j == best[3] and t > best[0]):
            best = (t, cp / p, cn / n, j)
    return best


def _ap_py(pairs):
    ts = sorted({s for _, s in pairs}, reverse=True)
    p = sum(1 for l, _ in pairs if l)
    ap, prev_r = 0.0, 0.0
    for t in ts:
        cp = sum(1 for l, s in pairs if l and s >= t)
        cn = sum(1 for l, s in pairs if not l and s >= t)
        r = cp / p
        prec = cp / (cp + cn)
        ap += (r - prev_r) * prec
        prev_r = r
    return ap


def _df(spark, pairs, g="g1"):
    return spark.createDataFrame(
        [(g, int(l), float(s)) for l, s in pairs],
        "g string, y int, s double",
    )


PAIRS = [
    (1, 0.9), (0, 0.8), (1, 0.8), (1, 0.7), (0, 0.6), (1, 0.55),
    (0, 0.5), (0, 0.4), (1, 0.35), (0, 0.3), (0, 0.2), (0, 0.1),
]


class TestYouden:
    def test_matches_python_reference(self, spark):
        row = youden_cutpoint(_df(spark, PAIRS), ["g"], "y", "s").collect()[0]
        t, tpr, fpr, j = _youden_py(PAIRS)
        assert row["threshold"] == pytest.approx(t)
        assert row["tpr"] == pytest.approx(tpr, rel=1e-12)
        assert row["fpr"] == pytest.approx(fpr, rel=1e-12)
        assert row["j"] == pytest.approx(j, rel=1e-12)

    def test_perfect_separation(self, spark):
        pairs = [(1, s) for s in (0.9, 0.8, 0.7)] + [
            (0, s) for s in (0.3, 0.2, 0.1)
        ]
        row = youden_cutpoint(_df(spark, pairs), ["g"], "y", "s").collect()[0]
        assert row["j"] == pytest.approx(1.0)
        assert row["threshold"] == pytest.approx(0.7)

    def test_one_class_only_empty(self, spark):
        pairs = [(1, 0.5), (1, 0.6)]
        assert (
            youden_cutpoint(_df(spark, pairs), ["g"], "y", "s").count()
            == 0
        )


class TestPrAuc:
    def test_matches_python_reference(self, spark):
        row = pr_auc(_df(spark, PAIRS), ["g"], "y", "s").collect()[0]
        assert row["n_pos"] == 5 and row["n_neg"] == 7
        assert row["ap"] == pytest.approx(_ap_py(PAIRS), rel=1e-12)

    def test_perfect_ranking_ap_one(self, spark):
        pairs = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        row = pr_auc(_df(spark, pairs), ["g"], "y", "s").collect()[0]
        assert row["ap"] == pytest.approx(1.0)

    def test_inverted_ranking_low_ap(self, spark):
        pairs = [(0, 0.9), (0, 0.8), (0, 0.7), (1, 0.2), (1, 0.1)]
        row = pr_auc(_df(spark, pairs), ["g"], "y", "s").collect()[0]
        assert row["ap"] < 0.45

    def test_max_points_refused(self, spark):
        pairs = [(i % 2, float(i)) for i in range(30)]
        with pytest.raises(ValueError, match="max_points"):
            pr_auc(_df(spark, pairs), ["g"], "y", "s", max_points=10)
