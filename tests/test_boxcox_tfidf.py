"""Box-Cox grid profile likelihood (L357) and corpus TF-IDF top-k (L358)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.scaling import boxcox_grid
from lmss_entity_extractor_spark.ops.textstats import tfidf_topk


def _ll_py(xs, lam):
    if lam == 0.0:
        ys = [math.log(x) for x in xs]
    else:
        ys = [(x**lam - 1.0) / lam for x in xs]
    n = len(ys)
    mu = sum(ys) / n
    m2 = sum(y * y for y in ys) / n - mu * mu
    return -(n / 2.0) * math.log(m2) + (lam - 1.0) * sum(
        math.log(x) for x in xs
    )


def _series(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(x)) for x in xs], "g string, x double"
    )


class TestBoxCox:
    def test_matches_python_reference(self, spark):
        xs = [round(1.0 + ((i * 7) % 13) * 0.5, 2) for i in range(40)]
        row = boxcox_grid(_series(spark, xs), ["g"], "x").collect()[0]
        for nm, lam in [
            ("ll_m1", -1.0), ("ll_m05", -0.5), ("ll_0", 0.0),
            ("ll_05", 0.5), ("ll_1", 1.0),
        ]:
            assert row[nm] == pytest.approx(_ll_py(xs, lam), rel=1e-9)

    def test_lognormal_prefers_log(self, spark):
        # x = exp(z) with z roughly symmetric -> log is the right move
        zs = [((i * 7919) % 97) / 20.0 for i in range(80)]
        xs = [round(math.exp(z), 2) for z in zs]
        row = boxcox_grid(_series(spark, xs), ["g"], "x").collect()[0]
        assert row["lambda_best"] in (-0.5, 0.0, 0.5)
        assert row["ll_0"] > row["ll_1"]

    def test_skew_direction_ordering(self, spark):
        # symmetric wide spread: identity beats reciprocal by a mile
        sym = [round(5.0 + ((i * 7919) % 13 - 6) * 0.6, 2) for i in range(60)]
        # right-skewed (squared symmetric): a concave transform wins
        skw = [
            round((2.0 + ((i * 7919) % 13 - 6) * 0.2) ** 2, 2)
            for i in range(60)
        ]
        df = _series(spark, sym, "sym").union(_series(spark, skw, "skw"))
        out = {r["g"]: r for r in boxcox_grid(df, ["g"], "x").collect()}
        assert out["sym"]["ll_1"] > out["sym"]["ll_m1"]
        assert out["skw"]["lambda_best"] < 1.0

    def test_constant_null(self, spark):
        row = boxcox_grid(_series(spark, [5.0] * 10), ["g"], "x").collect()[0]
        assert row["lambda_best"] is None and row["ll_0"] is None

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="non-positive"):
            boxcox_grid(_series(spark, [1.0, -2.0]), ["g"], "x")
        with pytest.raises(ValueError, match="max_distinct"):
            boxcox_grid(
                _series(spark, [1.0, 2.0, 3.0]), ["g"], "x",
                max_distinct=2,
            )


class TestTfidf:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_matches_python_reference(self, spark):
        texts = [
            "apple banana apple",
            "banana cherry",
            "durian durian apple",
        ]
        rows = tfidf_topk(self._docs(spark, texts), k=10).collect()
        got = {(r["doc_id"], r["term"]): r for r in rows}
        n = 3
        assert got[(0, "apple")]["tf"] == 2
        assert got[(0, "apple")]["df"] == 2
        assert got[(0, "apple")]["tfidf"] == pytest.approx(
            2 * math.log(n / 2), rel=1e-12
        )
        assert got[(2, "durian")]["tfidf"] == pytest.approx(
            2 * math.log(n / 1), rel=1e-12
        )

    def test_topk_and_tiebreak(self, spark):
        texts = ["zz aa zz aa qq", "bb", "cc"]
        rows = [
            r for r in tfidf_topk(self._docs(spark, texts), k=2).collect()
            if r["doc_id"] == 0
        ]
        assert len(rows) == 2
        # aa and zz tie on tfidf (tf=2, df=1 each): term asc wins
        assert rows[0]["term"] == "aa" and rows[0]["rnk"] == 1
        assert rows[1]["term"] == "zz"

    def test_ubiquitous_term_scores_zero(self, spark):
        texts = ["the cat", "the dog", "the fox"]
        rows = tfidf_topk(self._docs(spark, texts), k=10).collect()
        for r in rows:
            if r["term"] == "the":
                assert r["tfidf"] == 0.0

    def test_empty_docs_excluded_from_n(self, spark):
        texts = ["apple apple", "", "banana"]
        rows = tfidf_topk(self._docs(spark, texts), k=10).collect()
        # N = 2 (the empty doc has no tokens)
        got = {(r["doc_id"], r["term"]): r for r in rows}
        assert got[(0, "apple")]["tfidf"] == pytest.approx(
            2 * math.log(2 / 1), rel=1e-12
        )
        assert not any(r["doc_id"] == 1 for r in rows)

    def test_bad_k_refused(self, spark):
        with pytest.raises(ValueError, match="k must"):
            tfidf_topk(self._docs(spark, ["a"]), k=0)
