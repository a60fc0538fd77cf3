"""Breusch-Pagan test (L270) and Quade test (L271)."""

import pytest

from lmss_entity_extractor_spark.ops.rankeval import quade_test
from lmss_entity_extractor_spark.ops.regression import breusch_pagan


def _bp_py(xs, ys, scale=2):
    qx = [round(x * 10**scale) for x in xs]
    qy = [round(y * 10**scale) for y in ys]
    n = float(len(qx))
    m10, m01 = sum(qx), sum(qy)
    m20 = sum(a * a for a in qx)
    m11 = sum(a * b for a, b in zip(qx, qy))
    b1 = (n * m11 - m10 * m01) / (n * m20 - m10 * m10)
    b0 = (m01 - b1 * m10) / n
    es = [b - b0 - b1 * a for a, b in zip(qx, qy)]
    a1 = sum(e * e for e in es)
    a2 = sum(a * e * e for a, e in zip(qx, es))
    a3 = sum(e**4 for e in es)
    sxx = n * m20 - m10 * m10
    see = n * a3 - a1 * a1
    sxe = n * a2 - m10 * a1
    return n * sxe * sxe / (sxx * see)


class TestBreuschPagan:
    def _df(self, spark, xs, ys, g="g1"):
        return spark.createDataFrame(
            [(g, float(a), float(b)) for a, b in zip(xs, ys)],
            "g string, x double, y double",
        )

    def test_matches_python_reference(self, spark):
        xs = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
        ys = [2.1, 3.9, 6.2, 7.8, 10.5, 11.4, 14.8, 15.1, 19.0, 19.5]
        out = breusch_pagan(self._df(spark, xs, ys), ["g"], "x", "y")
        row = out.collect()[0]
        assert row["lm"] == pytest.approx(_bp_py(xs, ys), rel=1e-6)
        assert row["df_bp"] == 1

    def test_heteroskedastic_flags_high(self, spark):
        # residual spread grows linearly with x: e ~ ±0.2·x
        xs = list(range(1, 21)) * 2
        ys = [2 * x + (0.2 * x if i < 20 else -0.2 * x)
              for i, x in enumerate(xs)]
        hi = breusch_pagan(
            self._df(spark, xs, ys), ["g"], "x", "y"
        ).collect()[0]["lm"]
        # residual spread uncorrelated with x: cycle ±1, ±0.5
        cyc = [1.0, -1.0, 0.5, -0.5]
        ys2 = [2 * x + cyc[i % 4] for i, x in enumerate(xs)]
        lo = breusch_pagan(
            self._df(spark, xs, ys2), ["g"], "x", "y"
        ).collect()[0]["lm"]
        assert hi > 3.841  # chi2(1) 5% critical value
        assert lo < 3.841 and lo < hi / 3

    def test_constant_x_null(self, spark):
        out = breusch_pagan(
            self._df(spark, [2, 2, 2, 2], [1, 2, 3, 4]), ["g"], "x", "y"
        ).collect()[0]
        assert out["slope"] is None and out["lm"] is None

    def test_perfect_fit_null(self, spark):
        xs = [1, 2, 3, 4, 5]
        out = breusch_pagan(
            self._df(spark, xs, [2 * x for x in xs]), ["g"], "x", "y"
        ).collect()[0]
        assert out["lm"] is None  # zero e2-variance


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    out = [0.0] * len(vals)
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[order[j]] == vals[order[i]]:
            j += 1
        for t in range(i, j):
            out[order[t]] = (i + 1 + j) / 2.0
        i = j
    return out


def _quade_py(table):
    """table: list of per-block lists of k values."""
    b, k = len(table), len(table[0])
    r = [_midranks(row) for row in table]
    rng = [max(row) - min(row) for row in table]
    q = _midranks(rng)
    s = [
        [q[i] * (r[i][j] - (k + 1) / 2.0) for j in range(k)]
        for i in range(b)
    ]
    a = sum(s[i][j] ** 2 for i in range(b) for j in range(k))
    sj = [sum(s[i][j] for i in range(b)) for j in range(k)]
    bb = sum(x * x for x in sj) / b
    return (b - 1) * bb / (a - bb)


class TestQuade:
    def _df(self, spark, table, g="g1"):
        rows = [
            (g, f"b{i}", f"t{j}", float(v))
            for i, row in enumerate(table)
            for j, v in enumerate(row)
        ]
        return spark.createDataFrame(
            rows, "g string, blk string, trt string, x double"
        )

    def test_matches_python_reference(self, spark):
        table = [
            [5, 4, 7, 10],
            [1, 3, 1, 0],
            [16, 12, 22, 22],
            [5, 4, 3, 5],
            [10, 9, 7, 13],
            [19, 18, 28, 37],
            [10, 7, 6, 8],
        ]
        out = quade_test(
            self._df(spark, table), ["g"], "blk", "trt", "x"
        ).collect()[0]
        assert out["n_blocks"] == 7 and out["k"] == 4
        assert out["f_stat"] == pytest.approx(_quade_py(table), rel=1e-12)
        assert out["df1"] == 3 and out["df2"] == 18

    def test_strong_effect_large_f(self, spark):
        table = [[1, 5, 9], [2, 6, 10], [0, 4, 8], [3, 7, 11]]
        out = quade_test(
            self._df(spark, table), ["g"], "blk", "trt", "x"
        ).collect()[0]
        # perfectly consistent ordering -> A == B -> F infinite -> NULL
        assert out["f_stat"] is None

    def test_mixed_effect_finite(self, spark):
        table = [[1, 5, 9], [2, 6, 10], [8, 4, 0], [3, 7, 11]]
        out = quade_test(
            self._df(spark, table), ["g"], "blk", "trt", "x"
        ).collect()[0]
        assert out["f_stat"] == pytest.approx(_quade_py(table), rel=1e-12)

    def test_incomplete_block_refused(self, spark):
        df = self._df(spark, [[1, 2, 3], [4, 5, 6]])
        df = df.filter(~((df.blk == "b1") & (df.trt == "t2")))
        with pytest.raises(ValueError, match="incomplete"):
            quade_test(df, ["g"], "blk", "trt", "x")

    def test_duplicate_cell_refused(self, spark):
        df = self._df(spark, [[1, 2], [3, 4]])
        with pytest.raises(ValueError, match="duplicate"):
            quade_test(df.union(df.limit(1)), ["g"], "blk", "trt", "x")
