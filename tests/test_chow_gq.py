"""Chow structural-break test (L373) and Goldfeld-Quandt (L374)."""

import pytest

from lmss_entity_extractor_spark.ops.regression import (
    chow_test,
    goldfeld_quandt,
)


def _ssr(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return (vary_n - cov_n * cov_n / varx_n) / n


def _chow_ref(a_pts, b_pts):
    ssr_p = _ssr(a_pts + b_pts)
    ssr_u = _ssr(a_pts) + _ssr(b_pts)
    n = len(a_pts) + len(b_pts)
    return ssr_p, ssr_u, ((ssr_p - ssr_u) / 2) / (ssr_u / (n - 4))


def _gq_ref(pts, num=3, den=8):
    pts = sorted(pts)
    n = len(pts)
    m = (n * num) // den
    lo, hi = pts[:m], pts[n - m :]
    ssr_l, ssr_h = _ssr(lo), _ssr(hi)
    return ssr_l, ssr_h, (ssr_h / (m - 2)) / (ssr_l / (m - 2))


REG_A = [(1.0, 2.0), (2.0, 4.25), (3.0, 5.75), (4.0, 8.5), (5.0, 10.0)]
REG_B = [(1.0, 10.0), (2.0, 8.25), (3.0, 6.5), (4.0, 4.0), (5.0, 2.25)]


def _chow_df(spark, a_pts, b_pts, key="k1"):
    rows = [(key, "a", x, y) for x, y in a_pts] + [
        (key, "b", x, y) for x, y in b_pts
    ]
    return spark.createDataFrame(
        rows, "key string, regime string, x double, y double"
    )


class TestChow:
    def test_vs_python_reference(self, spark):
        out = chow_test(
            _chow_df(spark, REG_A, REG_B), ["key"], "x", "y", "regime"
        ).collect()[0]
        ssr_p, ssr_u, f = _chow_ref(REG_A, REG_B)
        assert out["k"] == 2 and out["n"] == 10
        assert out["n_a"] == 5 and out["n_b"] == 5
        assert out["ssr_pooled"] == pytest.approx(ssr_p, rel=1e-9)
        assert out["ssr_split"] == pytest.approx(ssr_u, rel=1e-9)
        assert out["f_chow"] == pytest.approx(f, rel=1e-9)
        assert out["df2"] == 6.0

    def test_opposite_slopes_reject(self, spark):
        # regimes with opposite slopes: the pooled fit is terrible,
        # the split fit near-perfect -> huge F
        out = chow_test(
            _chow_df(spark, REG_A, REG_B), ["key"], "x", "y", "regime"
        ).collect()[0]
        assert out["f_chow"] > 50.0

    def test_same_line_small_f(self, spark):
        a = [(1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8)]
        b = [(5.0, 10.1), (6.0, 12.2), (7.0, 13.8), (8.0, 16.1)]
        out = chow_test(
            _chow_df(spark, a, b), ["key"], "x", "y", "regime"
        ).collect()[0]
        assert out["f_chow"] < 2.0

    def test_single_regime_null(self, spark):
        rows = [("k1", "a", x, y) for x, y in REG_A]
        df = spark.createDataFrame(
            rows, "key string, regime string, x double, y double"
        )
        out = chow_test(df, ["key"], "x", "y", "regime").collect()[0]
        assert out["k"] == 1
        assert out["f_chow"] is None and out["n_a"] is None

    def test_tiny_or_degenerate_regime_null(self, spark):
        # n_b = 2 < 3 -> NULL
        out = chow_test(
            _chow_df(spark, REG_A, REG_B[:2]), ["key"], "x", "y", "regime"
        ).collect()[0]
        assert out["f_chow"] is None
        # zero x-variance in one regime -> NULL
        flat = [(2.0, 1.0), (2.0, 2.0), (2.0, 3.0)]
        out = chow_test(
            _chow_df(spark, REG_A, flat), ["key"], "x", "y", "regime"
        ).collect()[0]
        assert out["f_chow"] is None

    def test_perfect_fit_null(self, spark):
        # both regimes exactly on one line -> SSR_split == 0 -> NULL
        a = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)]
        b = [(4.0, 8.0), (5.0, 10.0), (6.0, 12.0)]
        out = chow_test(
            _chow_df(spark, a, b), ["key"], "x", "y", "regime"
        ).collect()[0]
        assert out["f_chow"] is None and out["df2"] is None


PTS_HET = [
    (1.0, 1.1), (2.0, 1.9), (3.0, 3.2), (4.0, 3.8),
    (5.0, 5.5), (6.0, 5.2), (7.0, 8.5), (8.0, 5.0),
    (9.0, 13.0), (10.0, 6.0), (11.0, 17.5), (12.0, 5.5),
    (13.0, 22.0), (14.0, 4.0), (15.0, 28.0), (16.0, 2.0),
]


def _gq_df(spark, pts, key="k1"):
    rows = [(key, float(x), float(y), i) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "key string, x double, y double, okey int"
    )


class TestGoldfeldQuandt:
    def test_vs_python_reference(self, spark):
        out = goldfeld_quandt(
            _gq_df(spark, PTS_HET), ["key"], "x", "y", ["okey"]
        ).collect()[0]
        ssr_l, ssr_h, f = _gq_ref(PTS_HET)
        assert out["n"] == 16 and out["m"] == 6
        assert out["ssr_low"] == pytest.approx(ssr_l, rel=1e-9)
        assert out["ssr_high"] == pytest.approx(ssr_h, rel=1e-9)
        assert out["f_gq"] == pytest.approx(f, rel=1e-9)
        assert out["df_side"] == 4.0

    def test_heteroskedastic_f_large(self, spark):
        out = goldfeld_quandt(
            _gq_df(spark, PTS_HET), ["key"], "x", "y", ["okey"]
        ).collect()[0]
        assert out["f_gq"] > 10.0

    def test_middle_band_dropped(self, spark):
        # corrupting only the middle band must not change the result
        base = goldfeld_quandt(
            _gq_df(spark, PTS_HET), ["key"], "x", "y", ["okey"]
        ).collect()[0]
        bent = [
            (x, y + 100.0) if 6 < x <= 10 else (x, y)
            for x, y in PTS_HET
        ]
        out = goldfeld_quandt(
            _gq_df(spark, bent), ["key"], "x", "y", ["okey"]
        ).collect()[0]
        assert out["f_gq"] == base["f_gq"]

    def test_small_m_null(self, spark):
        out = goldfeld_quandt(
            _gq_df(spark, PTS_HET[:7]), ["key"], "x", "y", ["okey"]
        ).collect()[0]
        # n=7 -> m=2 < 3
        assert out["m"] == 2
        assert out["f_gq"] is None and out["ssr_low"] is None

    def test_custom_split(self, spark):
        out = goldfeld_quandt(
            _gq_df(spark, PTS_HET), ["key"], "x", "y", ["okey"],
            split_num=1, split_den=2,
        ).collect()[0]
        ssr_l, ssr_h, f = _gq_ref(PTS_HET, 1, 2)
        assert out["m"] == 8
        assert out["f_gq"] == pytest.approx(f, rel=1e-9)
