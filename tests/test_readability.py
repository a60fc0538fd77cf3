"""Flesch / Flesch-Kincaid readability (L175)."""

import pytest

from lmss_entity_extractor_spark.ops.textstats import readability


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _scores(n_words, n_sent, n_syll):
    flesch = 206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words)
    fk = 0.39 * (n_words / n_sent) + 11.8 * (n_syll / n_words) - 15.59
    return flesch, fk


class TestReadability:
    def test_hand_counted(self, spark):
        # "the cat sat." -> 3 words, 1 sentence; syllables: the(1)
        # cat(1) sat(1) = 3 (vowel groups: e, a, a)
        r = readability(_docs(spark, ["the cat sat."])).collect()[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
        flesch, fk = _scores(3, 1, 3)
        assert r["flesch"] == pytest.approx(flesch, rel=1e-12)
        assert r["fk_grade"] == pytest.approx(fk, rel=1e-12)

    def test_multi_sentence_and_vowel_groups(self, spark):
        # "beautiful idea! really?" -> 3 words, 2 sentences;
        # beautiful: eau-i-u = 3 groups, idea: i-ea = 2, really: ea-y = 2
        r = readability(_docs(spark, ["beautiful idea! really?"])).collect()[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 2, 7)

    def test_no_vowel_word_floors_at_one(self, spark):
        # "tsk tsk." -> 2 words with zero vowel groups -> 2 syllables
        r = readability(_docs(spark, ["tsk tsk."])).collect()[0]
        assert r["n_syllables"] == 2

    def test_fragment_is_one_sentence(self, spark):
        r = readability(_docs(spark, ["no terminator here"])).collect()[0]
        assert r["n_sentences"] == 1

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame(
            [(0, ""), (1, None), (2, "123 456.")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in readability(df).collect()}
        for i in (0, 1, 2):  # no letter-bearing words anywhere
            assert out[i]["n_words"] == 0 and out[i]["flesch"] is None

    def test_simple_beats_complex_prose(self, spark):
        simple = "the dog ran. the cat sat. we go now."
        complex_ = (
            "extraordinarily convoluted administrative considerations "
            "necessitate comprehensive organizational restructuring."
        )
        out = readability(_docs(spark, [simple, complex_])).collect()
        scores = {r["doc_id"]: r["flesch"] for r in out}
        assert scores[0] > scores[1]
