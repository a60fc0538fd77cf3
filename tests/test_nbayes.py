"""Multinomial Naive Bayes (L136)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.nbayes import nb_predict, nb_score, train_nb


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


TRAIN = [
    (1, "spark shuffle join spark", "eng"),
    (2, "join spark partition shuffle", "eng"),
    (3, "etude plan requete jointure", "fra"),
    (4, "jointure plan etude plan", "fra"),
]


class TestClassification:
    def test_separable_corpora_classified(self, spark):
        train = _docs(spark, TRAIN)
        model, classes = train_nb(train, "label", alpha=0.5)
        test = _docs(
            spark,
            [(10, "spark join", "?"), (11, "plan jointure etude", "?")],
        )
        pred = {r["doc_id"]: r["label"] for r in nb_predict(test, model, classes).collect()}
        assert pred == {10: "eng", 11: "fra"}

    def test_matches_hand_computed_score(self, spark):
        train = _docs(spark, TRAIN)
        model, classes = train_nb(train, "label", alpha=0.5)
        test = _docs(spark, [(10, "spark novel", "?")])
        got = {
            r["label"]: r["score"] for r in nb_score(test, model, classes).collect()
        }
        # corpus: eng tokens = 8 (spark x3, shuffle x2, join x2, partition),
        # fra tokens = 8; V = 8 distinct tokens; alpha = .5; priors = ln(2/4)
        v = 8
        denom_eng = math.log(8 + 0.5 * (v + 1))
        denom_fra = math.log(8 + 0.5 * (v + 1))
        # 'spark': c=3 in eng, 0 in fra; 'novel': OOV both
        want_eng = (
            math.log(2 / 4)
            + (math.log(3 + 0.5) - denom_eng)
            + (math.log(0.5) - denom_eng)
        )
        want_fra = (
            math.log(2 / 4)
            + (math.log(0.5) - denom_fra)
            + (math.log(0.5) - denom_fra)
        )
        assert got["eng"] == pytest.approx(want_eng, abs=1e-12)
        assert got["fra"] == pytest.approx(want_fra, abs=1e-12)

    def test_sparse_model_equals_dense_zero_count(self, spark):
        # a vocab token absent from a class must score exactly oov_lp
        train = _docs(spark, TRAIN)
        model, classes = train_nb(train, "label", alpha=0.5)
        m = {(r["label"], r["token"]): r["logp"] for r in model.collect()}
        assert ("fra", "spark") not in m  # sparse: no zero-count rows
        oov = {r["label"]: r["oov_lp"] for r in classes.collect()}
        # ln(0 + alpha) - denom == oov_lp by construction
        assert ("eng", "spark") in m and oov["fra"] < m[("eng", "spark")]

    def test_empty_doc_scores_prior(self, spark):
        train = _docs(spark, TRAIN)
        model, classes = train_nb(train, "label")
        test = _docs(spark, [(10, "   ", "?")])
        got = {r["label"]: r["score"] for r in nb_score(test, model, classes).collect()}
        pri = {r["label"]: r["prior_lp"] for r in classes.collect()}
        assert got == pytest.approx(pri)

    def test_unbalanced_priors_shift_prediction(self, spark):
        rows = [(i, "common word", "big") for i in range(9)] + [
            (100, "common word", "small")
        ]
        model, classes = train_nb(_docs(spark, rows), "label")
        pred = nb_predict(_docs(spark, [(200, "common", "?")]), model, classes)
        assert pred.collect()[0]["label"] == "big"


class TestDeterminism:
    def test_vocab_cap_deterministic(self, spark):
        # cap to 2 tokens: keeps the 2 most frequent, ties by token ASC
        rows = [(1, "aa bb cc aa bb", "x"), (2, "aa cc", "y")]
        model, _ = train_nb(_docs(spark, rows), "label", vocab_size=2)
        toks = {r["token"] for r in model.collect()}
        assert toks == {"aa", "bb"}  # aa x3, bb x2, cc x2 -> bb wins tie

    def test_parallelism_invariance(self, spark):
        rows = [
            (i, " ".join(("abcdef"[(i * 5 + j) % 6]) * 2 for j in range(6)),
             "c%d" % (i % 3))
            for i in range(30)
        ]
        df = _docs(spark, rows)
        model, classes = train_nb(df, "label")
        a = sorted(map(tuple, nb_predict(df, model, classes).collect()))
        model2, classes2 = train_nb(df.repartition(11), "label")
        b = sorted(map(tuple, nb_predict(df.repartition(7), model2, classes2).collect()))
        assert a == b
