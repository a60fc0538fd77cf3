"""Granger causality 1-lag (L289) and Engle's ARCH LM test (L290)."""

import pytest

from lmss_entity_extractor_spark.ops.timeseries import arch_lm, granger_1lag


def _granger_py(ys, xs):
    rows = [
        (ys[i], ys[i - 1], xs[i - 1]) for i in range(1, len(ys))
    ]
    n = float(len(rows))
    sy = sum(y for y, _, _ in rows)
    sa = sum(a for _, a, _ in rows)
    sb = sum(b for _, _, b in rows)
    syy = sum(y * y for y, _, _ in rows)
    saa = sum(a * a for _, a, _ in rows)
    sbb = sum(b * b for _, _, b in rows)
    sya = sum(y * a for y, a, _ in rows)
    syb = sum(y * b for y, _, b in rows)
    sab = sum(a * b for _, a, b in rows)
    det = (
        n * (saa * sbb - sab * sab)
        - sa * (sa * sbb - sab * sb)
        + sb * (sa * sab - saa * sb)
    )
    b0 = (
        sy * (saa * sbb - sab * sab)
        - sa * (sya * sbb - sab * syb)
        + sb * (sya * sab - saa * syb)
    ) / det
    b1 = (
        n * (sya * sbb - sab * syb)
        - sy * (sa * sbb - sab * sb)
        + sb * (sa * syb - sya * sb)
    ) / det
    b2 = (
        n * (saa * syb - sya * sab)
        - sa * (sa * syb - sya * sb)
        + sy * (sa * sab - saa * sb)
    ) / det
    sse_u = syy - b0 * sy - b1 * sya - b2 * syb
    a1 = (n * sya - sa * sy) / (n * saa - sa * sa)
    a0 = (sy - a1 * sa) / n
    sse_r = syy - a0 * sy - a1 * sya
    return b2, (sse_r - sse_u) / (sse_u / (n - 3.0))


def _df2(spark, ys, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(y), float(x))
         for i, (y, x) in enumerate(zip(ys, xs))],
        "g string, t double, y double, x double",
    )


class TestGranger:
    def test_matches_python_reference(self, spark):
        xs = [1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13]
        ys = [0.5, 1.5, 3.25, 2.5, 5.0, 4.25, 7.5, 6.0, 9.25, 8.0,
              11.5, 10.0]
        row = granger_1lag(
            _df2(spark, ys, xs), ["g"], ["t"], "y", "x"
        ).collect()[0]
        b2, f = _granger_py(ys, xs)
        assert row["n_used"] == 11
        assert row["beta_x"] == pytest.approx(b2, rel=1e-9)
        assert row["f_stat"] == pytest.approx(f, rel=1e-9)
        assert row["df1"] == 1 and row["df2"] == 8

    def test_x_leads_y_strongly(self, spark):
        xs = [1, 5, 2, 8, 3, 9, 1, 7, 4, 6, 2, 8, 5, 9, 3]
        # y_t ~ 2*x_{t-1} plus jitter (an exact fit would make
        # SSE_u = 0 -> NULL by design)
        ys = [0.0] + [
            2.0 * x + 0.01 * ((i * 3) % 7)
            for i, x in enumerate(xs[:-1])
        ]
        row = granger_1lag(
            _df2(spark, ys, xs), ["g"], ["t"], "y", "x"
        ).collect()[0]
        assert row["f_stat"] > 100.0

    def test_constant_x_null(self, spark):
        ys = [1, 2, 1, 3, 2, 4, 3]
        xs = [5.0] * 7
        row = granger_1lag(
            _df2(spark, ys, xs), ["g"], ["t"], "y", "x"
        ).collect()[0]
        assert row["f_stat"] is None

    def test_null_refused(self, spark):
        df = _df2(spark, [1.0, 2.0], [1.0, 2.0]).union(
            spark.createDataFrame(
                [("g1", 9.0, None, 1.0)],
                "g string, t double, y double, x double",
            )
        )
        with pytest.raises(ValueError, match="NULL"):
            granger_1lag(df, ["g"], ["t"], "y", "x")


def _arch_py(xs):
    n = len(xs)
    s = sum(xs)
    ws = [(n * x - s) ** 2 for x in xs]
    pairs = [(ws[i - 1], ws[i]) for i in range(1, n)]
    m = float(len(pairs))
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    sxy = sum(a * b for a, b in pairs)
    syy = sum(b * b for _, b in pairs)
    num = m * sxy - sx * sy
    r2 = num * num / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    return r2, m * r2


def _df1(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestArchLm:
    def test_matches_python_reference(self, spark):
        xs = [1, 5, 2, 8, 3, 9, 1, 7, 4, 6, 2, 8, 5, 9, 3, 7]
        row = arch_lm(_df1(spark, xs), ["g"], ["t"], "x").collect()[0]
        r2, lm = _arch_py([round(x * 100) for x in xs])
        # micro-unit scaling cancels in R2
        assert row["n_pairs"] == 15
        assert row["r2"] == pytest.approx(r2, rel=1e-9)
        assert row["lm"] == pytest.approx(lm, rel=1e-9)

    def test_volatility_clustering_high_lm(self, spark):
        # calm block then wild block: squared deviations correlate
        xs = [10 + 0.1 * (i % 2) for i in range(15)] + [
            10 + 8 * (1 if i % 2 else -1) for i in range(15)
        ]
        row = arch_lm(_df1(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["lm"] > 3.84  # chi2(1) 5%

    def test_constant_null(self, spark):
        row = arch_lm(
            _df1(spark, [4.0] * 8), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["lm"] is None

    def test_null_refused(self, spark):
        df = _df1(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            arch_lm(df, ["g"], ["t"], "x")
