"""chrF (L431) and WER/CER (L432)."""

import pytest

from lmss_entity_extractor_spark.ops.texteval import chrf, wer_cer


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "grp string, id string, cand string, ref string"
    )


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


class TestChrf:
    def test_identical_is_one(self, spark):
        df = _pairs(spark, [("g", "p", "the cat", "the cat")])
        r = chrf(df, ["grp"], "cand", "ref", max_n=3).collect()[0]
        assert r["chrf"] == pytest.approx(1.0)
        assert r["chr_p"] == pytest.approx(1.0)
        assert r["n_orders_eff"] == 3

    def test_python_reference(self, spark):
        cand, ref = "abcd", "abxd"
        df = _pairs(spark, [("g", "p", cand, ref)])
        r = chrf(df, ["grp"], "cand", "ref", max_n=2, beta=2.0).collect()[0]

        def grams(s, n):
            return [s[i:i + n] for i in range(len(s) - n + 1)]

        fs, ps, rs = [], [], []
        for n in (1, 2):
            cg, rg = grams(cand, n), grams(ref, n)
            m = sum(
                min(cg.count(g), rg.count(g)) for g in set(cg)
            )
            p, rr = m / len(cg), m / len(rg)
            f = (1 + 4) * p * rr / (4 * p + rr) if (p + rr) > 0 else 0.0
            ps.append(p); rs.append(rr); fs.append(f)
        assert r["chrf"] == pytest.approx(sum(fs) / 2, rel=1e-12)
        assert r["chr_p"] == pytest.approx(sum(ps) / 2, rel=1e-12)

    def test_whitespace_removed(self, spark):
        df = _pairs(spark, [("g", "p", "ab cd", "abcd")])
        r = chrf(df, ["grp"], "cand", "ref", max_n=2).collect()[0]
        assert r["chrf"] == pytest.approx(1.0)

    def test_short_orders_excluded(self, spark):
        # 2-char strings: order 3 has no grams on either side
        df = _pairs(spark, [("g", "p", "ab", "ab")])
        r = chrf(df, ["grp"], "cand", "ref", max_n=3).collect()[0]
        assert r["n_orders_eff"] == 2
        assert r["chrf"] == pytest.approx(1.0)

    def test_bad_params_refused(self, spark):
        df = _pairs(spark, [("g", "p", "a", "a")])
        with pytest.raises(ValueError, match="max_n"):
            chrf(df, ["grp"], "cand", "ref", max_n=0)
        with pytest.raises(ValueError, match="beta"):
            chrf(df, ["grp"], "cand", "ref", beta=0.0)


class TestWerCer:
    def _run(self, spark, rows):
        return {
            r["id"]: r
            for r in wer_cer(
                _pairs(spark, rows), ["grp"], "id", "cand", "ref"
            ).collect()
        }

    def test_hand_computed(self, spark):
        out = self._run(
            spark,
            [
                ("g", "p1", "the cat sat", "the cat sat on a mat"),
                ("g", "p2", "hello world", "hello word"),
            ],
        )
        assert out["p1"]["word_dist"] == 3
        assert out["p1"]["wer"] == pytest.approx(0.5)
        assert out["p2"]["word_dist"] == 1
        assert out["p2"]["char_dist"] == 1
        assert out["p2"]["cer"] == pytest.approx(1 / 9)

    def test_python_reference_word_dp(self, spark):
        cand = "a b c d e f g"
        ref = "a x c e f q g h"
        out = self._run(spark, [("g", "p", cand, ref)])
        assert out["p"]["word_dist"] == _lev(cand.split(), ref.split())

    def test_dp_fold_matches_builtin_on_chars(self, spark):
        # single-char tokens make word distance == char distance
        cand = " ".join("kitten")
        ref = " ".join("sitting")
        out = self._run(spark, [("g", "p", cand, ref)])
        assert out["p"]["word_dist"] == 3   # classic kitten/sitting
        assert out["p"]["char_dist"] == 3

    def test_identical_zero(self, spark):
        out = self._run(spark, [("g", "p", "same text", "same text")])
        assert out["p"]["word_dist"] == 0 and out["p"]["cer"] == 0.0

    def test_case_folded(self, spark):
        out = self._run(spark, [("g", "p", "The CAT", "the cat")])
        assert out["p"]["word_dist"] == 0

    def test_empty_ref_null_rates(self, spark):
        out = self._run(spark, [("g", "p", "x", "")])
        assert out["p"]["wer"] is None and out["p"]["cer"] is None

    def test_too_long_refused(self, spark):
        rows = [("g", "p", "a " * 300, "b")]
        with pytest.raises(ValueError, match="max_tokens"):
            self._run(spark, rows)
