"""Retrieval metrics (L164) + classification report (L165)."""

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import (
    classification_report,
    retrieval_metrics,
)


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, rank int, neighbor_id bigint"
    )


class TestRetrievalMetrics:
    def test_hand_computed(self, spark):
        truth = _ranked(spark, [(1, 1, 10), (1, 2, 11), (1, 3, 12)])
        pred = _ranked(spark, [(1, 1, 10), (1, 2, 99), (1, 3, 12)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["n_rel"] == 3 and r["hits"] == 2
        assert r["precision"] == pytest.approx(2 / 3, abs=0)
        assert r["recall"] == pytest.approx(2 / 3, abs=0)
        assert r["rr"] == 1.0  # first prediction is relevant

    def test_no_hits(self, spark):
        truth = _ranked(spark, [(1, 1, 10)])
        pred = _ranked(spark, [(1, 1, 99)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["hits"] == 0 and r["precision"] == 0.0
        assert r["recall"] == 0.0 and r["rr"] is None

    def test_rr_uses_first_relevant_rank(self, spark):
        truth = _ranked(spark, [(1, 1, 10), (1, 2, 11)])
        pred = _ranked(spark, [(1, 1, 99), (1, 2, 98), (1, 3, 11)])
        r = retrieval_metrics(pred, truth, k=3).collect()[0]
        assert r["rr"] == pytest.approx(1 / 3, abs=0)

    def test_k_cutoff(self, spark):
        truth = _ranked(spark, [(1, 1, 10)])
        pred = _ranked(spark, [(1, 1, 99), (1, 2, 10)])
        r = retrieval_metrics(pred, truth, k=1).collect()[0]
        assert r["hits"] == 0  # the hit is at rank 2, beyond k=1


def _labeled(spark, pairs):
    return spark.createDataFrame(pairs, "y string, p string")


class TestClassificationReport:
    def test_hand_computed(self, spark):
        pairs = (
            [("a", "a")] * 3 + [("a", "b")] * 1  # a: tp=3, fn=1
            + [("b", "b")] * 2 + [("b", "a")] * 2  # b: tp=2, fn=2
        )
        out = {
            r["label"]: r
            for r in classification_report(_labeled(spark, pairs), "y", "p").collect()
        }
        a, b = out["a"], out["b"]
        assert (a["n_true"], a["n_pred"], a["tp"]) == (4, 5, 3)
        assert a["precision"] == pytest.approx(3 / 5, abs=0)
        assert a["recall"] == pytest.approx(3 / 4, abs=0)
        assert a["f1"] == pytest.approx(6 / 9, abs=0)
        assert (b["n_true"], b["n_pred"], b["tp"]) == (4, 3, 2)

    def test_class_only_predicted(self, spark):
        pairs = [("a", "a"), ("a", "c")]
        out = {
            r["label"]: r
            for r in classification_report(_labeled(spark, pairs), "y", "p").collect()
        }
        c = out["c"]
        assert c["n_true"] == 0 and c["n_pred"] == 1 and c["tp"] == 0
        assert c["precision"] == 0.0 and c["recall"] is None

    def test_perfect(self, spark):
        pairs = [("a", "a"), ("b", "b"), ("b", "b")]
        out = classification_report(_labeled(spark, pairs), "y", "p").collect()
        assert all(r["f1"] == 1.0 for r in out)


class TestCohensKappa:
    def test_hand_computed(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        # classic 2x2 example: tp sums 20+15=35 of n=50,
        # pe = (25*30 + 25*20)/50^2 -> kappa = (0.7-0.5)/(1-0.5) = 0.4
        rows = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["n"] == 50
        assert r["kappa"] == pytest.approx(0.4, abs=0)

    def test_perfect_agreement_one(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        rows = [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")]
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0

    def test_constant_raters_null(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        rows = [("x", "x")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] is None

    def test_chance_level_zero(self, spark):
        from lmss_entity_extractor_spark.ops.evalmetrics import cohens_kappa

        # independent balanced raters: agreement exactly at chance
        rows = [
            ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"),
        ] * 3
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 0.0
