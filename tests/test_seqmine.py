"""Sequential pattern mining / GSP (L133)."""

import pytest

from lmss_entity_extractor_spark.ops.seqmine import (
    frequent_sequences,
    keyed_sequences,
)


def _events(spark, seqs: dict):
    rows = [(k, i, s) for k, states in seqs.items() for i, s in enumerate(states)]
    return spark.createDataFrame(rows, "k int, i int, s string")


def _mine(spark, seqs, min_support, max_len=3, **kw):
    df = _events(spark, seqs)
    out = frequent_sequences(df, "k", "s", "i", min_support, max_len=max_len, **kw)
    return {r["pattern"]: r["support"] for r in out.collect()}


def _support(seqs, pat):
    """Python reference: greedy subsequence containment per key."""
    n = 0
    for states in seqs.values():
        idx = 0
        for s in states:
            if idx < len(pat) and s == pat[idx]:
                idx += 1
        n += idx == len(pat)
    return n


class TestContainment:
    def test_gapped_motifs(self, spark):
        seqs = {
            1: list("AXBYC"),  # contains A->B->C with gaps
            2: list("ABC"),
            3: list("CBA"),  # reversed: does NOT contain A->B->C
            4: list("AACB"),  # A->C yes, A->B->C no (B after last C)
        }
        out = _mine(spark, seqs, min_support=2, max_len=3)
        assert out["A -> B -> C"] == 2
        assert out["A -> C"] == 3
        assert out["C -> B"] == 2  # keys 3 and 4
        assert "B -> A" not in out  # support 1 (key 3 only) < min_support 2

    def test_support_is_per_key_not_per_embedding(self, spark):
        # AAAA embeds A->A three ways but supports it once
        out = _mine(spark, {1: list("AAAA"), 2: list("AA")}, min_support=2, max_len=2)
        assert out["A -> A"] == 2

    def test_matches_python_reference(self, spark):
        seqs = {
            k: [("ABCD")[(k * 7 + i * i) % 4] for i in range(9)] for k in range(12)
        }
        out = _mine(spark, seqs, min_support=3, max_len=3)
        for pat_str, sup in out.items():
            assert sup == _support(seqs, pat_str.split(" -> ")), pat_str
        # and nothing frequent is missing at length 2
        for a in "ABCD":
            for b in "ABCD":
                want = _support(seqs, [a, b])
                if want >= 3:
                    assert out.get(f"{a} -> {b}") == want

    def test_min_support_filters(self, spark):
        out = _mine(spark, {1: list("AB"), 2: list("AC")}, min_support=2, max_len=2)
        assert set(out) == {"A"}  # only A is in both

    def test_apriori_antimonotone(self, spark):
        seqs = {k: [("XYZ")[(k + i) % 3] for i in range(6)] for k in range(9)}
        out = _mine(spark, seqs, min_support=2, max_len=3)
        for pat_str, sup in out.items():
            pat = pat_str.split(" -> ")
            if len(pat) > 1:
                assert out[" -> ".join(pat[:-1])] >= sup  # prefix at least as frequent


class TestGuards:
    def test_hot_key_refused(self, spark):
        df = _events(spark, {1: list("AB" * 40)})
        with pytest.raises(ValueError, match="max_seq_len"):
            keyed_sequences(df, "k", "s", "i", max_seq_len=10)

    def test_candidate_cap(self, spark):
        seqs = {k: [str(x) for x in range(20)] for k in range(3)}
        with pytest.raises(ValueError, match="candidate blow-up"):
            _mine(spark, seqs, min_support=1, max_len=2, candidate_cap=100)

    def test_bad_params(self, spark):
        df = _events(spark, {1: ["A"]})
        with pytest.raises(ValueError, match="min_support"):
            frequent_sequences(df, "k", "s", "i", 0)
        with pytest.raises(ValueError, match="max_len"):
            frequent_sequences(df, "k", "s", "i", 1, max_len=0)

    def test_parallelism_invariance(self, spark):
        seqs = {k: [("ABC")[(k + i) % 3] for i in range(5)] for k in range(8)}
        df = _events(spark, seqs)
        a = sorted(frequent_sequences(df, "k", "s", "i", 2).collect())
        b = sorted(frequent_sequences(df.repartition(13), "k", "s", "i", 2).collect())
        assert a == b

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, 0, "A"), (1, 1, None), (1, 2, "B"), (2, 0, "A"), (2, 1, "B")],
            "k int, i int, s string",
        )
        out = frequent_sequences(df, "k", "s", "i", 2, max_len=2)
        got = {r["pattern"]: r["support"] for r in out.collect()}
        # unlike L132's chain-break, mining drops NULLs before sequencing:
        # a missing state does not interrupt a gapped pattern by definition
        assert got["A -> B"] == 2
