"""Bigram-LM fluency score (L421) and OOV panel (L422)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.lmscore import (
    bigram_lm_score,
    oov_panel,
)


class TestBigramLm:
    def _run(self, spark, docs, **kw):
        df = spark.createDataFrame(
            [("g", d, t) for d, t in docs], "grp string, doc string, text string"
        )
        return {
            r["doc"]: r
            for r in bigram_lm_score(df, ["grp"], "doc", "text", **kw).collect()
        }

    def test_shuffled_doc_scores_worse(self, spark):
        out = self._run(
            spark,
            [
                ("d1", "the cat sat on the mat"),
                ("d2", "the cat sat on the rug"),
                ("d3", "mat the on sat cat the"),
            ],
        )
        assert out["d3"]["ppl"] > out["d1"]["ppl"]
        assert out["d1"]["ppl"] == pytest.approx(out["d2"]["ppl"])

    def test_python_reference(self, spark):
        docs = [("a", "x y x y"), ("b", "x y z")]
        out = self._run(spark, docs, k=0.5)
        toks = {d: t.split() for d, t in docs}
        c2, c1 = {}, {}
        vocab = set()
        for t in toks.values():
            vocab.update(t)
            for a, b in zip(t, t[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
        V = len(vocab)
        q = lambda x: math.floor(x * 1e9 + 0.5)  # noqa: E731
        for d, t in toks.items():
            s = sum(
                q(math.log((c2[(a, b)] + 0.5) / (c1[a] + 0.5 * V)))
                for a, b in zip(t, t[1:])
            )
            h = -(s / 1e9 / (len(t) - 1))
            assert out[d]["cross_entropy"] == pytest.approx(h, abs=1e-9)

    def test_single_token_doc_null(self, spark):
        out = self._run(spark, [("a", "hello"), ("b", "x y")])
        assert out["a"]["n_pairs"] == 0
        assert out["a"]["ppl"] is None
        assert out["b"]["ppl"] is not None

    def test_bad_k_refused(self, spark):
        with pytest.raises(ValueError, match="k must"):
            self._run(spark, [("a", "x y")], k=0.0)

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", "d", None)], "grp string, doc string, text string"
        )
        with pytest.raises(ValueError, match="NULL"):
            bigram_lm_score(df, ["grp"], "doc", "text")


class TestOovPanel:
    def _run(self, spark, ref_texts, probe_texts):
        rows = [("g", "ref", t) for t in ref_texts] + [
            ("g", "probe", t) for t in probe_texts
        ]
        df = spark.createDataFrame(rows, "grp string, side string, text string")
        return oov_panel(df, ["grp"], "side", "ref", "probe", "text").collect()[0]

    def test_hand_computed(self, spark):
        r = self._run(
            spark,
            ["the cat sat here"],
            ["the dog sat there", "dog runs"],
        )
        # probe types {the,dog,sat,there,runs}; oov {dog,there,runs}
        assert r["n_ref_types"] == 4
        assert r["n_probe_types"] == 5
        assert r["n_probe_tokens"] == 6
        assert r["type_oov"] == pytest.approx(3 / 5)
        assert r["token_oov"] == pytest.approx(4 / 6)
        # inter {the, sat}; union 7
        assert r["jaccard_types"] == pytest.approx(2 / 7)

    def test_identical_corpora_zero_oov(self, spark):
        r = self._run(spark, ["a b c"], ["a b c a"])
        assert r["type_oov"] == pytest.approx(0.0)
        assert r["token_oov"] == pytest.approx(0.0)
        assert r["jaccard_types"] == pytest.approx(1.0)

    def test_disjoint_full_oov(self, spark):
        r = self._run(spark, ["a b"], ["x y z"])
        assert r["type_oov"] == pytest.approx(1.0)
        assert r["token_oov"] == pytest.approx(1.0)
        assert r["jaccard_types"] == pytest.approx(0.0)

    def test_empty_probe_nulls(self, spark):
        r = self._run(spark, ["a b"], [])
        assert r["n_probe_types"] == 0
        assert r["type_oov"] is None and r["token_oov"] is None
