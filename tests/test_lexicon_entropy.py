"""Lexicon scan panel (L437) and char-entropy panel (L438)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.textstats import (
    char_entropy,
    lexicon_scan,
)


class TestLexiconScan:
    def _run(self, spark, rows, lexicon, **kw):
        df = spark.createDataFrame(rows, "doc string, text string")
        return {
            r["doc"]: r
            for r in lexicon_scan(
                df, [], "doc", "text", lexicon, **kw
            ).collect()
        }

    def test_counts_and_case_folding(self, spark):
        out = self._run(
            spark,
            [("d1", "Buy CRYPTO now crypto is great"), ("d2", "clean")],
            ["crypto", "buy"],
        )
        assert out["d1"]["total_hits"] == 3
        assert out["d1"]["n_patterns_hit"] == 2
        assert out["d1"]["first_pattern"] == "buy"
        assert out["d1"]["flagged"] is True
        assert out["d2"]["total_hits"] == 0
        assert out["d2"]["first_pattern"] is None

    def test_non_overlapping_count(self, spark):
        out = self._run(spark, [("d", "aaaa")], ["aa"])
        assert out["d"]["total_hits"] == 2

    def test_multiword_pattern(self, spark):
        out = self._run(
            spark, [("d", "a merge sort of merge sort")], ["merge sort"]
        )
        assert out["d"]["total_hits"] == 2

    def test_density(self, spark):
        out = self._run(spark, [("d", "x" * 100 + "bad")], ["bad"])
        assert out["d"]["hits_per_kchar"] == pytest.approx(1000 / 103)

    def test_case_sensitive_mode(self, spark):
        out = self._run(
            spark, [("d", "Crypto crypto")], ["crypto"],
            case_insensitive=False,
        )
        assert out["d"]["total_hits"] == 1

    def test_refusals(self, spark):
        df = spark.createDataFrame([("d", "x")], "doc string, text string")
        with pytest.raises(ValueError, match="1..64"):
            lexicon_scan(df, [], "doc", "text", [])
        with pytest.raises(ValueError, match="empty pattern"):
            lexicon_scan(df, [], "doc", "text", ["a", ""])


class TestCharEntropy:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc string, text string")
        return {
            r["doc"]: r
            for r in char_entropy(df, [], "doc", "text", **kw).collect()
        }

    def test_uniform_two_symbols_one_bit(self, spark):
        out = self._run(spark, [("d", "aaaabbbb")])
        assert out["d"]["entropy_bits"] == pytest.approx(1.0)
        assert out["d"]["n_distinct_chars"] == 2
        assert out["d"]["est_ratio"] == pytest.approx(0.125)

    def test_single_symbol_zero(self, spark):
        out = self._run(spark, [("d", "zzzz")])
        assert out["d"]["entropy_bits"] == pytest.approx(0.0)

    def test_python_reference(self, spark):
        text = "hello world entropy"
        out = self._run(spark, [("d", text)])
        n = len(text)
        h = -sum(
            (text.count(c) / n) * math.log2(text.count(c) / n)
            for c in sorted(set(text))
        )
        assert out["d"]["entropy_bits"] == pytest.approx(h, rel=1e-12)

    def test_flat_distribution_flags_high(self, spark):
        import string

        gibberish = string.ascii_lowercase
        english = "the the the and and of of to in it"
        out = self._run(
            spark, [("g", gibberish), ("e", english)]
        )
        assert (
            out["g"]["entropy_bits"] / math.log2(out["g"]["n_distinct_chars"])
            > out["e"]["entropy_bits"] / math.log2(out["e"]["n_distinct_chars"])
        )

    def test_empty_null(self, spark):
        out = self._run(spark, [("d", "")])
        assert out["d"]["entropy_bits"] is None

    def test_too_long_refused(self, spark):
        with pytest.raises(ValueError, match="max_chars"):
            self._run(spark, [("d", "x" * 50)], max_chars=10)
