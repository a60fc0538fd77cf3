"""Empirical Markov chains (L132): transition mint + power iteration."""

import pytest

from lmss_entity_extractor_spark.ops.markov import (
    markov_transitions,
    stationary_distribution,
)


def _seq(spark, *states, key=1):
    rows = [(key, i, s) for i, s in enumerate(states)]
    return spark.createDataFrame(rows, "k int, i int, s string")


class TestTransitions:
    def test_counts_and_probs(self, spark):
        df = _seq(spark, "A", "B", "A", "C")
        out = {(r["src"], r["dst"]): r for r in markov_transitions(df, "k", "s", "i").collect()}
        assert out[("A", "B")]["n"] == 1 and out[("A", "B")]["prob"] == 0.5
        assert out[("A", "C")]["n"] == 1 and out[("A", "C")]["prob"] == 0.5
        assert out[("B", "A")]["n"] == 1 and out[("B", "A")]["prob"] == 1.0
        assert len(out) == 3

    def test_no_cross_sequence_pairs(self, spark):
        df = _seq(spark, "A", "B").union(_seq(spark, "C", "D", key=2))
        pairs = {(r["src"], r["dst"]) for r in markov_transitions(df, "k", "s", "i").collect()}
        # the boundary pair (B, C) must NOT be minted
        assert pairs == {("A", "B"), ("C", "D")}

    def test_row_stochastic(self, spark):
        df = _seq(spark, *"ABACBABCACBA")
        sums = (
            markov_transitions(df, "k", "s", "i")
            .groupBy("src")
            .sum("prob")
            .collect()
        )
        assert all(abs(r["sum(prob)"] - 1.0) < 1e-12 for r in sums)

    def test_parallelism_invariance(self, spark):
        df = _seq(spark, *"ABACBABCACBA")
        a = sorted(markov_transitions(df, "k", "s", "i").collect())
        b = sorted(markov_transitions(df.repartition(7), "k", "s", "i").collect())
        assert a == b

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 0, "A"), (1, 1, None), (1, 2, "B")], "k int, i int, s string"
        )
        pairs = {(r["src"], r["dst"]) for r in markov_transitions(df, "k", "s", "i").collect()}
        # a NULL state BREAKS the chain (mint-then-drop, not
        # filter-then-mint): (A,NULL) and (NULL,B) are both dropped and
        # no pair bridges the gap
        assert pairs == set()


class TestStationary:
    def test_two_state_analytic(self, spark):
        # P(A->B)=1, P(B->A)=.5, P(B->B)=.5  ->  pi = (1/3, 2/3)
        t = spark.createDataFrame(
            [("A", "B", 2, 1.0), ("B", "A", 1, 0.5), ("B", "B", 1, 0.5)],
            "src string, dst string, n int, prob double",
        )
        out = {r["state"]: r["pi"] for r in stationary_distribution(t, n_iters=40).collect()}
        assert out["A"] == pytest.approx(1 / 3, abs=1e-9)
        assert out["B"] == pytest.approx(2 / 3, abs=1e-9)
        assert sum(out.values()) == pytest.approx(1.0, abs=1e-12)

    def test_end_to_end_from_sequences(self, spark):
        df = _seq(spark, *"ABBABABBAB")
        pi = stationary_distribution(markov_transitions(df, "k", "s", "i"), n_iters=30)
        out = {r["state"]: r["pi"] for r in pi.collect()}
        assert set(out) == {"A", "B"} and sum(out.values()) == pytest.approx(1.0, abs=1e-9)

    def test_open_chain_refused(self, spark):
        t = spark.createDataFrame(
            [("A", "B", 1, 1.0), ("B", "C", 1, 1.0)], "src string, dst string, n int, prob double"
        )
        with pytest.raises(ValueError, match="open chain.*'C'"):
            stationary_distribution(t)

    def test_non_stochastic_refused(self, spark):
        t = spark.createDataFrame(
            [("A", "A", 1, 0.7)], "src string, dst string, n int, prob double"
        )
        with pytest.raises(ValueError, match="not row-stochastic"):
            stationary_distribution(t)

    def test_empty(self, spark):
        t = spark.createDataFrame([], "src string, dst string, n int, prob double")
        assert stationary_distribution(t).collect() == []
