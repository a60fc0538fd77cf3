"""R/S analysis (L297) and permutation entropy (L298)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.complexity import (
    permutation_entropy,
    rs_analysis,
)


def _rs_py(xs, m):
    nb = len(xs) // m
    vals = []
    for b in range(nb):
        block = xs[b * m:(b + 1) * m]
        mean = sum(block) / m
        var = sum((x - mean) ** 2 for x in block) / m
        if var <= 0:
            continue
        cum, mx, mn = 0.0, float("-inf"), float("inf")
        for x in block:
            cum += x - mean
            mx, mn = max(mx, cum), min(mn, cum)
        vals.append((mx - mn) / math.sqrt(var))
    return nb, (sum(vals) / len(vals) if vals else None)


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestRsAnalysis:
    def test_matches_python_reference(self, spark):
        xs = [math.sin(0.7 * i) * 10 + 0.3 * i + (i * 13 % 7)
              for i in range(70)]
        rows = rs_analysis(
            _df(spark, xs), ["g"], "t", "x", block_sizes=(8, 16, 32)
        ).collect()
        got = {r["m"]: r for r in rows}
        for m in (8, 16, 32):
            nb, rs = _rs_py(xs, m)
            assert got[m]["n_blocks"] == nb
            assert got[m]["rs_mean"] == pytest.approx(rs, rel=1e-9)

    def test_rs_grows_with_block_size(self, spark):
        # cumulative-walk-like series: R/S grows ~ m^H with H near 1
        xs, acc = [], 0.0
        for i in range(128):
            acc += 1.0 if (i * 7) % 11 < 6 else -1.0
            xs.append(acc)
        rows = rs_analysis(
            _df(spark, xs), ["g"], "t", "x", block_sizes=(8, 32)
        ).collect()
        got = {r["m"]: r["rs_mean"] for r in rows}
        assert got[32] > 1.8 * got[8]

    def test_constant_blocks_null(self, spark):
        rows = rs_analysis(
            _df(spark, [3.0] * 16), ["g"], "t", "x", block_sizes=(8,)
        ).collect()
        assert rows[0]["rs_mean"] is None

    def test_bad_size_refused(self, spark):
        with pytest.raises(ValueError, match="block sizes"):
            rs_analysis(_df(spark, [1.0]), ["g"], "t", "x",
                        block_sizes=(2,))


def _pe_py(xs):
    def c(a, b):
        return 0 if a < b else (1 if a == b else 2)

    from collections import Counter

    pats = Counter(
        c(xs[i], xs[i + 1]) * 9 + c(xs[i], xs[i + 2]) * 3
        + c(xs[i + 1], xs[i + 2])
        for i in range(len(xs) - 2)
    )
    n = sum(pats.values())
    h = -sum((v / n) * math.log(v / n) for v in pats.values())
    return n, len(pats), h


class TestPermutationEntropy:
    def test_matches_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]
        row = permutation_entropy(
            _df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        n, k, h = _pe_py(xs)
        assert row["n_windows"] == n and row["k_patterns"] == k
        assert row["h"] == pytest.approx(h, rel=1e-9)
        assert row["h_norm"] == pytest.approx(h / math.log(6), rel=1e-9)

    def test_monotone_single_pattern(self, spark):
        row = permutation_entropy(
            _df(spark, list(range(10))), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["k_patterns"] == 1
        assert row["h"] == 0.0

    def test_invariant_to_monotone_transform(self, spark):
        xs = [3, 1, 4, 1.5, 5, 9, 2, 6, 5.5, 3.5]
        a = permutation_entropy(
            _df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]["h"]
        b = permutation_entropy(
            _df(spark, [math.exp(x / 3) for x in xs]), ["g"], ["t"], "x"
        ).collect()[0]["h"]
        assert a == pytest.approx(b, rel=1e-12)

    def test_null_refused(self, spark):
        df = _df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            permutation_entropy(df, ["g"], ["t"], "x")
