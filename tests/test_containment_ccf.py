"""Shingle containment (L171) + cross-correlation (L172)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import ccf
from lmss_entity_extractor_spark.ops.dedup import containment_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


class TestContainment:
    def test_embedded_quote_detected(self, spark):
        inner = "the quick brown fox jumps over the lazy dog"
        outer = (
            "preamble words here and then " + inner + " plus a very long "
            "trailing commentary that dilutes jaccard similarity a lot "
            "more words more words more words"
        )
        rows = containment_pairs(
            _docs(spark, [inner, outer]), n=3, threshold=0.8
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["cont_a"] == 1.0  # every inner shingle appears in outer
        assert r["cont_b"] < 0.8  # but outer is NOT contained in inner

    def test_unrelated_not_paired(self, spark):
        rows = containment_pairs(
            _docs(
                spark,
                ["alpha beta gamma delta epsilon", "one two three four five"],
            ),
            n=3,
            threshold=0.5,
        ).collect()
        assert rows == []

    def test_ratio_values_exact(self, spark):
        a = "w1 w2 w3 w4"          # shingles: 2
        b = "w1 w2 w3 w4 w5 w6"    # shingles: 4, shares 2
        r = containment_pairs(_docs(spark, [a, b]), n=3, threshold=0.5).collect()[0]
        assert (r["n_a"], r["n_b"], r["n_shared"]) == (2, 4, 2)
        assert r["cont_a"] == 1.0 and r["cont_b"] == 0.5


def _xy(spark, xs, ys, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(a), float(b)) for i, (a, b) in enumerate(zip(xs, ys))],
        "g string, t int, x double, y double",
    )


def _ccf_py(xs, ys, h):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((xs[t] - mx) * (ys[t - h] - my) for t in range(h, n))
    dx = sum((v - mx) ** 2 for v in xs)
    dy = sum((v - my) ** 2 for v in ys)
    return num / math.sqrt(dx * dy)


class TestCcf:
    def test_matches_python(self, spark):
        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        ys = [2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 8.0]
        out = {
            r["lag"]: r["r"]
            for r in ccf(_xy(spark, xs, ys), ["g"], ["t"], "x", "y", 2).collect()
        }
        for h in (0, 1, 2):
            assert out[h] == pytest.approx(_ccf_py(xs, ys, h), rel=1e-12)

    def test_shifted_copy_peaks_at_its_lag(self, spark):
        ys = [float((i * 7) % 13) for i in range(20)]
        xs = ys[2:] + [0.0, 0.0]  # x leads y by 2: x_t = y_{t+?}...
        # x_t = y_{t+2} so x correlates with y lagged... x_t vs y_{t-h}:
        # matches when h such that y_{t-h} = y-part aligned; peak at h=? -
        # just assert the max |r| lag equals the python argmax.
        out = {
            r["lag"]: r["r"]
            for r in ccf(_xy(spark, xs, ys), ["g"], ["t"], "x", "y", 3).collect()
        }
        ref = {h: _ccf_py(xs, ys, h) for h in range(4)}
        assert max(out, key=lambda h: abs(out[h])) == max(
            ref, key=lambda h: abs(ref[h])
        )
        for h in range(4):
            assert out[h] == pytest.approx(ref[h], rel=1e-12)

    def test_constant_series_null(self, spark):
        out = ccf(
            _xy(spark, [5.0] * 6, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
            ["g"],
            ["t"],
            "x",
            "y",
            1,
        ).collect()
        assert all(r["r"] is None for r in out)

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0, None)], "g string, t int, x double, y double"
        )
        with pytest.raises(ValueError, match="NULL"):
            ccf(df, ["g"], ["t"], "x", "y", 1).collect()
