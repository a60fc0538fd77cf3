"""Extended readability panel (L349) and lexical diversity (L350)."""

import math
import re

import pytest

from lmss_entity_extractor_spark.ops.textstats import (
    lexical_diversity,
    readability_extended,
)


def _counts_py(text):
    words = [w for w in text.strip().split() if re.search("[A-Za-z]", w)]
    n_words = len(words)
    sents = [
        s for s in re.split(r"[.!?]+", text) if re.search("[A-Za-z0-9]", s)
    ]
    n_sent = max(len(sents), 1) if n_words else 0
    letters = len(re.sub("[^A-Za-z]", "", text))
    alnum = len(re.sub("[^A-Za-z0-9]", "", text))
    poly = 0
    for w in text.lower().strip().split():
        if re.search("[a-z]", w):
            groups = [g for g in re.split("[^aeiouy]+", w) if g]
            if len(groups) >= 3:
                poly += 1
    return n_words, n_sent, letters, alnum, poly


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestReadabilityExtended:
    def test_matches_python_reference(self, spark):
        text = (
            "The judiciary interpreted constitutional amendments. "
            "Extraordinary deliberations continued! Was it fair?"
        )
        row = readability_extended(_docs(spark, [text])).collect()[0]
        w, s, le, al, po = _counts_py(text)
        assert (row["n_words"], row["n_sentences"]) == (w, s)
        assert (row["n_letters"], row["n_alnum"], row["n_poly"]) == (
            le, al, po,
        )
        assert row["ari"] == pytest.approx(
            4.71 * (al / w) + 0.5 * (w / s) - 21.43, rel=1e-12
        )
        assert row["coleman_liau"] == pytest.approx(
            0.0588 * (100.0 * le / w) - 0.296 * (100.0 * s / w) - 15.8,
            rel=1e-12,
        )
        assert row["smog"] == pytest.approx(
            1.043 * math.sqrt(po * 30.0 / s) + 3.1291, rel=1e-12
        )

    def test_simple_text_scores_lower(self, spark):
        simple = "The cat sat. The dog ran. It was fun."
        complx = (
            "Unquestionably, bureaucratic internationalization "
            "necessitates comprehensive organizational accountability."
        )
        out = {r["doc_id"]: r for r in readability_extended(
            _docs(spark, [simple, complx])
        ).collect()}
        assert out[0]["smog"] < out[1]["smog"]
        assert out[0]["coleman_liau"] < out[1]["coleman_liau"]

    def test_empty_text_null(self, spark):
        row = readability_extended(_docs(spark, [""])).collect()[0]
        assert row["ari"] is None and row["smog"] is None
        assert row["n_words"] == 0


class TestLexicalDiversity:
    def test_matches_python_reference(self, spark):
        text = "the cat and the dog and the bird chased the cat"
        row = lexical_diversity(_docs(spark, [text])).collect()[0]
        toks = [
            re.sub("[^a-z]", "", w)
            for w in text.lower().split()
            if re.search("[a-z]", w)
        ]
        toks = [w for w in toks if w]
        n, v = len(toks), len(set(toks))
        assert (row["n_tokens"], row["n_types"]) == (n, v)
        assert row["ttr"] == pytest.approx(v / n, rel=1e-12)
        assert row["rttr"] == pytest.approx(v / math.sqrt(n), rel=1e-12)
        assert row["cttr"] == pytest.approx(
            v / math.sqrt(2 * n), rel=1e-12
        )
        assert row["herdan_c"] == pytest.approx(
            math.log(v) / math.log(n), rel=1e-12
        )

    def test_repetitive_text_scores_lower(self, spark):
        rep = "spam spam spam spam spam spam spam spam"
        rich = "every single word here differs from all others entirely"
        out = {r["doc_id"]: r for r in lexical_diversity(
            _docs(spark, [rep, rich])
        ).collect()}
        assert out[0]["ttr"] < out[1]["ttr"]
        assert out[0]["herdan_c"] < out[1]["herdan_c"]

    def test_normalization_strips_punct(self, spark):
        row = lexical_diversity(
            _docs(spark, ["Hello, hello! HELLO?"])
        ).collect()[0]
        assert row["n_tokens"] == 3 and row["n_types"] == 1

    def test_empty_null(self, spark):
        row = lexical_diversity(_docs(spark, [""])).collect()[0]
        assert row["n_tokens"] == 0 and row["ttr"] is None

    def test_single_token_herdan_null(self, spark):
        row = lexical_diversity(_docs(spark, ["word"])).collect()[0]
        assert row["ttr"] == 1.0 and row["herdan_c"] is None
