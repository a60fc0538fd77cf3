"""Hjorth parameters (L381) and LZ76 complexity (L382)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.complexity import (
    hjorth_parameters,
    lz_complexity,
)


def _hjorth_ref(xs):
    def pvar(v):
        n = len(v)
        m = sum(v) / n
        return sum((a - m) ** 2 for a in v) / n

    dx = [b - a for a, b in zip(xs, xs[1:])]
    ddx = [b - a for a, b in zip(dx, dx[1:])]
    act = pvar(xs)
    mob = math.sqrt(pvar(dx) / act)
    cpx = math.sqrt(pvar(ddx) / pvar(dx)) / mob
    return act, mob, cpx


def _series_df(spark, xs, key="k1"):
    return spark.createDataFrame(
        [(key, i, float(x)) for i, x in enumerate(xs)],
        "key string, t int, x double",
    )


class TestHjorth:
    def test_vs_python_reference(self, spark):
        xs = [1.5, 3.25, 2.0, 5.75, 4.5, 6.0, 3.0, 7.25, 5.5, 8.0]
        out = hjorth_parameters(
            _series_df(spark, xs), ["key"], "t", "x"
        ).collect()[0]
        act, mob, cpx = _hjorth_ref(xs)
        assert out["n"] == 10
        assert out["activity"] == pytest.approx(act, rel=1e-12)
        assert out["mobility"] == pytest.approx(mob, rel=1e-12)
        assert out["complexity"] == pytest.approx(cpx, rel=1e-12)

    def test_pure_sine_complexity_one(self, spark):
        # a sampled sinusoid's complexity tends to 1 (Hjorth's anchor);
        # quantized at scale=4 it lands within a percent
        xs = [
            round(math.sin(2 * math.pi * i / 50), 4) for i in range(200)
        ]
        out = hjorth_parameters(
            _series_df(spark, xs), ["key"], "t", "x"
        ).collect()[0]
        assert out["complexity"] == pytest.approx(1.0, abs=0.02)

    def test_constant_signal_nulls(self, spark):
        out = hjorth_parameters(
            _series_df(spark, [2.0] * 8), ["key"], "t", "x"
        ).collect()[0]
        assert out["activity"] == 0.0
        assert out["mobility"] is None and out["complexity"] is None

    def test_linear_ramp_zero_mobility_path(self, spark):
        # Δx constant -> Var(Δx)=0 -> mobility 0, complexity NULL
        out = hjorth_parameters(
            _series_df(spark, [1.0, 2.0, 3.0, 4.0, 5.0]),
            ["key"], "t", "x",
        ).collect()[0]
        assert out["mobility"] == pytest.approx(0.0)
        assert out["complexity"] is None

    def test_short_series(self, spark):
        out = hjorth_parameters(
            _series_df(spark, [1.0]), ["key"], "t", "x"
        ).collect()[0]
        assert out["mobility"] is None and out["complexity"] is None


def _lz_ref(s):
    """Python twin of the pinned exhaustive parse."""
    pre, cur, c = "", "", 0
    for ch in s:
        cur2 = cur + ch
        t = pre + cur2
        if cur2 in t[:-1]:
            cur = cur2
        else:
            pre, cur, c = t, "", c + 1
    if cur:
        c += 1
    return c


def _sym_df(spark, s, key="k1"):
    return spark.createDataFrame(
        [(key, i, ch) for i, ch in enumerate(s)],
        "key string, t int, sym string",
    )


class TestLZComplexity:
    @pytest.mark.parametrize(
        "s",
        [
            "0001101001000101",  # Lempel-Ziv's own example family
            "aaaaaaaaaa",
            "abababababab",
            "abcdabcdabcd",
            "ab",
            "a",
        ],
    )
    def test_vs_python_reference(self, spark, s):
        out = lz_complexity(_sym_df(spark, s), ["key"], "t", "sym").collect()[
            0
        ]
        assert out["c_lz"] == _lz_ref(s)
        assert out["n"] == len(s)
        assert out["k"] == len(set(s))

    def test_repetitive_scores_below_random(self, spark):
        rep = "ab" * 64
        chars, seed = [], 42
        for _ in range(128):  # LCG noise, deterministic
            seed = (seed * 1103515245 + 12345) % 2**31
            chars.append("abcd"[(seed >> 16) % 4])
        rnd = "".join(chars)
        o_rep = lz_complexity(
            _sym_df(spark, rep), ["key"], "t", "sym"
        ).collect()[0]
        o_rnd = lz_complexity(
            _sym_df(spark, rnd), ["key"], "t", "sym"
        ).collect()[0]
        assert o_rep["c_lz"] < o_rnd["c_lz"]
        assert o_rep["c_norm"] < o_rnd["c_norm"]

    def test_single_symbol_alphabet_null_norm(self, spark):
        out = lz_complexity(
            _sym_df(spark, "aaaa"), ["key"], "t", "sym"
        ).collect()[0]
        assert out["k"] == 1 and out["c_norm"] is None
        assert out["c_lz"] == 2  # 'a' + 'aaa' (trailing phrase counts)

    def test_refusals(self, spark):
        bad = spark.createDataFrame(
            [("k1", 0, "ab")], "key string, t int, sym string"
        )
        with pytest.raises(ValueError, match="single"):
            lz_complexity(bad, ["key"], "t", "sym")
        long = _sym_df(spark, "ab" * 20)
        with pytest.raises(ValueError, match="max_len"):
            lz_complexity(long, ["key"], "t", "sym", max_len=10)
