"""Heaps' law (L179) + Zipf fit (L180)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.corpuslaws import heaps_fit, zipf_fit


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _ols(points):
    xs = [math.log(x) for x, _ in points]
    ys = [math.log(y) for _, y in points]
    n = float(len(points))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    covn = n * sxy - sx * sy
    varxn = n * sxx - sx * sx
    slope = covn / varxn
    return slope, (sy - slope * sx) / n


class TestHeaps:
    def test_matches_python(self, spark):
        texts = [
            "a b c",          # N=3, V=3
            "a b d d",        # N=7, V=4
            "e f a",          # N=10, V=6
            "g g g",          # N=13, V=7
        ]
        row = heaps_fit(_docs(spark, texts)).collect()[0]
        pts = [(3, 3), (7, 4), (10, 6), (13, 7)]
        beta, log_k = _ols(pts)
        assert row["n_points"] == 4
        assert row["beta"] == pytest.approx(beta, rel=1e-12)
        assert row["log_k"] == pytest.approx(log_k, rel=1e-12)

    def test_sublinear_growth(self, spark):
        # repetitive corpus: vocabulary saturates -> beta well below 1
        texts = ["the cat sat on the mat"] * 10 + ["a new word appears here"]
        row = heaps_fit(_docs(spark, texts)).collect()[0]
        assert 0.0 < row["beta"] < 0.6

    def test_max_points_guard(self, spark):
        texts = ["x"] * 20
        with pytest.raises(ValueError, match="max_points"):
            heaps_fit(_docs(spark, texts), max_points=10)


class TestZipf:
    def test_matches_python(self, spark):
        # construct exact frequencies: t1 x8, t2 x4, t3 x2, t4 x1
        words = ["t1"] * 8 + ["t2"] * 4 + ["t3"] * 2 + ["t4"]
        row = zipf_fit(_docs(spark, [" ".join(words)])).collect()[0]
        slope, log_c = _ols([(1, 8), (2, 4), (3, 2), (4, 1)])
        assert row["n_points"] == 4
        assert row["s"] == pytest.approx(-slope, rel=1e-12)
        assert row["log_c"] == pytest.approx(log_c, rel=1e-12)

    def test_exact_power_law_r2_one(self, spark):
        # f(r) = 16/r for r=1,2,4,8,16 restricted to constructible ints
        words = []
        for i, (term, f) in enumerate(
            [("a", 16), ("b", 8), ("c", 4), ("d", 2), ("e", 1)]
        ):
            words += [term] * f
        row = zipf_fit(_docs(spark, [" ".join(words)])).collect()[0]
        # ranks 1,2,3,4,5 with freqs 16,8,4,2,1: not exactly linear in
        # ln/ln (ranks aren't powers of 2) — just sanity-check the fit
        assert row["s"] > 0 and row["r2"] > 0.9

    def test_top_k_cutoff(self, spark):
        words = [f"w{i}" for i in range(50)]
        row = zipf_fit(_docs(spark, [" ".join(words)]), top_k=10).collect()[0]
        assert row["n_points"] == 10

    def test_uniform_slope_zero(self, spark):
        words = [w for w in ("a", "b", "c", "d") for _ in range(5)]
        row = zipf_fit(_docs(spark, [" ".join(words)])).collect()[0]
        assert row["s"] == pytest.approx(0.0, abs=1e-12)


class TestVocabCoverage:
    def _df(self, spark, tokens):
        return spark.createDataFrame([(t,) for t in tokens], "term string")

    def test_hand_computed(self, spark):
        from lmss_entity_extractor_spark.ops.corpuslaws import vocab_coverage

        # freqs: a:3, b:2, c:1, d:1  -> N=7 D=4 f1=2 f2=1
        tokens = ["a"] * 3 + ["b"] * 2 + ["c", "d"]
        r = vocab_coverage(self._df(spark, tokens), "term").collect()[0]
        assert r["n_tokens"] == 7 and r["n_types"] == 4
        assert r["f1"] == 2 and r["f2"] == 1
        # chao1 = 4 + 2*1/(2*2) = 4.5
        assert abs(r["chao1"] - 4.5) < 1e-12
        assert abs(r["unseen_mass"] - 2 / 7) < 1e-12
        assert abs(r["coverage"] - 5 / 7) < 1e-12

    def test_no_singletons_complete(self, spark):
        from lmss_entity_extractor_spark.ops.corpuslaws import vocab_coverage

        tokens = ["a", "a", "b", "b", "b"]
        r = vocab_coverage(self._df(spark, tokens), "term").collect()[0]
        assert r["f1"] == 0
        assert r["chao1"] == 2.0  # D + 0
        assert r["coverage"] == 1.0

    def test_all_singletons_f2_zero(self, spark):
        from lmss_entity_extractor_spark.ops.corpuslaws import vocab_coverage

        tokens = ["a", "b", "c"]
        r = vocab_coverage(self._df(spark, tokens), "term").collect()[0]
        # bias-corrected: 3 + 3*2/(2*1) = 6
        assert abs(r["chao1"] - 6.0) < 1e-12
        assert r["coverage"] == 0.0

    def test_empty_absent(self, spark):
        from lmss_entity_extractor_spark.ops.corpuslaws import vocab_coverage

        assert vocab_coverage(self._df(spark, []), "term").count() == 0
