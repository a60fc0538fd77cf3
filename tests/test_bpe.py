"""BPE tokenizer training (ops/bpe.py, L79): pair counts vs hand
counts, merge application, and bpe_train vs an independent pure-Python
reference implementation on the Sennrich-style toy corpus."""

import pytest

from lmss_entity_extractor_spark.ops.bpe import (
    EOW,
    bpe_pair_counts,
    bpe_train,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _py_bpe(texts, n_merges):
    """Independent reference: dict-based Sennrich algorithm."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        # deterministic tie-break: highest count then lexicographically
        # smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        l, r = best
        for w, syms in vocab.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


class TestBpe:
    def test_word_counts(self, spark):
        wc = {
            r["word"]: r["cnt"]
            for r in word_counts(_docs(spark, ["low low  lower", "low"])).collect()
        }
        assert wc == {"low": 3, "lower": 1}

    def test_pair_counts_hand(self, spark):
        out = bpe_pair_counts(word_counts(_docs(spark, ["ab ab abc"])))
        got = {(r["left"], r["right"]): r["pair_count"] for r in out.collect()}
        assert got == {
            ("a", "b"): 3,
            ("b", EOW): 2,
            ("b", "c"): 1,
            ("c", EOW): 1,
        }

    def test_pair_counts_after_merge(self, spark):
        out = bpe_pair_counts(
            word_counts(_docs(spark, ["ab ab abc"])), merges=[("a", "b")]
        )
        got = {(r["left"], r["right"]): r["pair_count"] for r in out.collect()}
        assert got == {("ab", EOW): 2, ("ab", "c"): 1, ("c", EOW): 1}

    def test_train_matches_reference(self, spark):
        texts = [
            "low low low low low",
            "lower lower newest newest newest newest newest newest",
            "widest widest widest",
            "low lower newest",
        ]
        for k in (1, 5, 10):
            assert bpe_train(_docs(spark, texts), k) == _py_bpe(texts, k)

    def test_train_exhausts_gracefully(self, spark):
        # single 1-char word: after ("a", EOW) merges nothing remains
        merges = bpe_train(_docs(spark, ["a a"]), 5)
        assert merges == [("a", EOW)]
