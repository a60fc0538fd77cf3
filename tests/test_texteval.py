"""Corpus BLEU (L389) and ROUGE-N panel (L390)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.texteval import corpus_bleu, rouge_n


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "grp string, cand string, ref string")


class TestCorpusBleu:
    def test_hand_computed_corpus(self, spark):
        df = _pairs(
            spark,
            [
                ("g", "the cat sat on the mat", "the cat sat on the mat"),
                ("g", "the the the the", "the cat"),
                ("g", "a b c d", "b c d e"),
            ],
        )
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=2).collect()[0]
        # clipped sums: m1 = 6+1+3, t1 = 6+4+4; m2 = 5+0+2, t2 = 5+3+3
        assert r["p1"] == pytest.approx(10 / 14)
        assert r["p2"] == pytest.approx(7 / 11)
        assert r["bp"] == 1.0  # cand 14 > ref 12
        assert r["bleu"] == pytest.approx(
            math.sqrt((10 / 14) * (7 / 11))
        )

    def test_papineni_clipping(self, spark):
        # Papineni 2002 §2.1: p1 = 2/7 (clipped to ref's two 'the')
        df = _pairs(
            spark,
            [("g", "the the the the the the the", "the cat is on the mat")],
        )
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=1).collect()[0]
        assert r["p1"] == pytest.approx(2 / 7)

    def test_perfect_match_is_one(self, spark):
        df = _pairs(spark, [("g", "a b c d e", "a b c d e")])
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=4).collect()[0]
        assert r["bleu"] == pytest.approx(1.0)
        assert r["bp"] == 1.0

    def test_zero_overlap_is_zero_not_null(self, spark):
        df = _pairs(spark, [("g", "x y z", "a b c")])
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=2).collect()[0]
        assert r["p1"] == 0.0
        assert r["bleu"] == 0.0

    def test_brevity_penalty(self, spark):
        # cand 2 tokens, ref 4 -> BP = exp(1 - 4/2)
        df = _pairs(spark, [("g", "a b", "a b c d")])
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=1).collect()[0]
        assert r["bp"] == pytest.approx(math.exp(-1.0))
        assert r["bleu"] == pytest.approx(math.exp(-1.0) * 1.0)

    def test_empty_gram_universe_null(self, spark):
        # every candidate shorter than 2 tokens -> st2 = 0 -> NULL
        df = _pairs(spark, [("g", "a", "a b")])
        r = corpus_bleu(df, ["grp"], "cand", "ref", max_n=2).collect()[0]
        assert r["p2"] is None
        assert r["bleu"] is None

    def test_null_refused(self, spark):
        df = _pairs(spark, [("g", None, "a b")])
        with pytest.raises(ValueError, match="NULL candidate"):
            corpus_bleu(df, ["grp"], "cand", "ref")

    def test_max_tokens_refused(self, spark):
        df = _pairs(spark, [("g", "a " * 600, "a b")])
        with pytest.raises(ValueError, match="max_tokens"):
            corpus_bleu(df, ["grp"], "cand", "ref")

    def test_max_n_bounds(self, spark):
        with pytest.raises(ValueError, match="max_n"):
            corpus_bleu(_pairs(spark, []), ["grp"], "cand", "ref", max_n=9)


class TestRougeN:
    def test_hand_computed_rouge1(self, spark):
        df = _pairs(
            spark,
            [
                ("g", "the cat sat on the mat", "the cat sat on the mat"),
                ("g", "the the the the", "the cat"),
                ("g", "a b c d", "b c d e"),
            ],
        )
        r = rouge_n(df, ["grp"], "cand", "ref", n=1).collect()[0]
        assert r["micro_p"] == pytest.approx(10 / 14)
        assert r["micro_r"] == pytest.approx(10 / 12)
        assert r["macro_p"] == pytest.approx((1 + 0.25 + 0.75) / 3, abs=1e-8)
        assert r["macro_r"] == pytest.approx((1 + 0.5 + 0.75) / 3, abs=1e-8)
        assert r["macro_f1"] == pytest.approx(
            (1 + 1 / 3 + 0.75) / 3, abs=1e-8
        )

    def test_empty_candidate_scores_zero_in_macro(self, spark):
        df = _pairs(spark, [("g", "", "a b"), ("g", "a b", "a b")])
        r = rouge_n(df, ["grp"], "cand", "ref", n=1).collect()[0]
        assert r["macro_p"] == pytest.approx(0.5, abs=1e-8)
        assert r["macro_f1"] == pytest.approx(0.5, abs=1e-8)
        # micro still defined: 2 matches / 2 cand grams, / 4 ref grams
        assert r["micro_p"] == pytest.approx(1.0)
        assert r["micro_r"] == pytest.approx(0.5)

    def test_bigram_counts(self, spark):
        df = _pairs(spark, [("g", "a b c d", "b c d e")])
        r = rouge_n(df, ["grp"], "cand", "ref", n=2).collect()[0]
        assert r["match_grams"] == 2   # "b c", "c d"
        assert r["cand_grams"] == 3
        assert r["ref_grams"] == 3

    def test_all_empty_micro_null(self, spark):
        df = _pairs(spark, [("g", "", "")])
        r = rouge_n(df, ["grp"], "cand", "ref", n=1).collect()[0]
        assert r["micro_p"] is None
        assert r["micro_f1"] is None
        assert r["macro_p"] == pytest.approx(0.0)

    def test_n_bounds(self, spark):
        with pytest.raises(ValueError, match="n must be"):
            rouge_n(_pairs(spark, []), ["grp"], "cand", "ref", n=0)
