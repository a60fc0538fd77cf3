"""VaR exception backtest (L291) and Markov entropy rate (L292)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.calibration import var_backtest
from lmss_entity_extractor_spark.ops.markov import markov_entropy_rate


def _xlnx(c, prob):
    return c * math.log(prob) if c > 0 else 0.0


def _var_py(es, p):
    n, x = len(es), sum(es)
    rate = x / n
    lr_pof = -2.0 * (
        _xlnx(n - x, 1 - p) + _xlnx(x, p)
        - _xlnx(n - x, 1 - rate) - _xlnx(x, rate)
    )
    n00 = n01 = n10 = n11 = 0
    for a, b in zip(es, es[1:]):
        if a == 0 and b == 0:
            n00 += 1
        elif a == 0 and b == 1:
            n01 += 1
        elif a == 1 and b == 0:
            n10 += 1
        else:
            n11 += 1
    t0, t1 = n00 + n01, n10 + n11
    pi = (n01 + n11) / (t0 + t1)
    pi0 = n01 / t0 if t0 else None
    pi1 = n11 / t1 if t1 else None
    ll0 = _xlnx(n00 + n10, 1 - pi) + _xlnx(n01 + n11, pi)
    ll1 = (
        _xlnx(n00, 1 - pi0) + _xlnx(n01, pi0)
        + _xlnx(n10, 1 - pi1) + _xlnx(n11, pi1)
    )
    return lr_pof, -2.0 * (ll0 - ll1)


class TestVarBacktest:
    def _df(self, spark, xs, var, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x), float(var)) for i, x in enumerate(xs)],
            "g string, t double, x double, v double",
        )

    def test_matches_python_reference(self, spark):
        xs = [10, 9, 12, 4, 11, 3, 13, 10, 2, 11, 12, 4, 10, 9, 3, 12]
        row = var_backtest(
            self._df(spark, xs, 5.0), ["g"], ["t"], "x", "v", p=0.05
        ).collect()[0]
        es = [1 if x < 5.0 else 0 for x in xs]
        lr_pof, lr_ind = _var_py(es, 0.05)
        assert row["n_exceptions"] == sum(es)
        assert row["lr_pof"] == pytest.approx(lr_pof, rel=1e-9)
        assert row["lr_ind"] == pytest.approx(lr_ind, rel=1e-9)
        assert row["lr_cc"] == pytest.approx(lr_pof + lr_ind, rel=1e-9)

    def test_no_exceptions_finite(self, spark):
        xs = [10.0] * 20
        row = var_backtest(
            self._df(spark, xs, 5.0), ["g"], ["t"], "x", "v", p=0.05
        ).collect()[0]
        assert row["n_exceptions"] == 0
        # LR_pof = -2*(n*ln(1-p)) since rate term vanishes
        assert row["lr_pof"] == pytest.approx(
            -2.0 * 20 * math.log(0.95), rel=1e-9
        )
        assert row["lr_ind"] is None  # no 1-state transitions

    def test_clustered_exceptions_high_lr_ind(self, spark):
        es = [0] * 10 + [1] * 6 + [0] * 10
        xs = [1.0 if e else 10.0 for e in es]
        row = var_backtest(
            self._df(spark, xs, 5.0), ["g"], ["t"], "x", "v", p=0.2
        ).collect()[0]
        assert row["lr_ind"] > 6.63  # chi2(1) 1%

    def test_bad_p_refused(self, spark):
        with pytest.raises(ValueError, match="0 < p < 1"):
            var_backtest(
                self._df(spark, [1.0], 5.0), ["g"], ["t"], "x", "v",
                p=1.0,
            )


def _h_py(seqs):
    from collections import Counter

    cells = Counter()
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    ni = Counter()
    for (a, _), c in cells.items():
        ni[a] += c
    n = sum(cells.values())
    h = -sum(
        (c / n) * math.log(c / ni[a]) for (a, _), c in cells.items()
    )
    return h, len(ni)


class TestEntropyRate:
    def _df(self, spark, seqs):
        rows = [
            (f"k{k}", float(i), s)
            for k, seq in enumerate(seqs)
            for i, s in enumerate(seq)
        ]
        return spark.createDataFrame(rows, "k string, t double, s string")

    def test_matches_python_reference(self, spark):
        seqs = [list("abcabcaab"), list("bcaacbbca")]
        row = markov_entropy_rate(
            self._df(spark, seqs), "k", "s", "t"
        ).collect()[0]
        h, k = _h_py(seqs)
        assert row["n_states"] == k
        assert row["h_rate"] == pytest.approx(h, rel=1e-9)
        assert row["h_norm"] == pytest.approx(h / math.log(k), rel=1e-9)

    def test_deterministic_chain_zero(self, spark):
        seqs = [list("ababababab")]
        row = markov_entropy_rate(
            self._df(spark, seqs), "k", "s", "t"
        ).collect()[0]
        assert row["h_rate"] == 0.0
        assert row["h_norm"] == 0.0

    def test_single_state_null_norm(self, spark):
        row = markov_entropy_rate(
            self._df(spark, [list("aaaa")]), "k", "s", "t"
        ).collect()[0]
        assert row["h_rate"] == 0.0
        assert row["h_norm"] is None
