"""CAPM panel (L383) and ulcer index (L384)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    capm_panel,
    ulcer_index,
)


def _capm_ref(pairs):
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sm = sum(m for _, m in pairs)
    saa = sum(a * a for a, _ in pairs)
    smm = sum(m * m for _, m in pairs)
    sam = sum(a * m for a, m in pairs)
    cov_n = n * sam - sa * sm
    varm_n = n * smm - sm * sm
    vara_n = n * saa - sa * sa
    beta = cov_n / varm_n
    alpha = (sa - beta * sm) / n
    r2 = cov_n * cov_n / (varm_n * vara_n)
    d = [a - m for a, m in pairs]
    md = sum(d) / n
    te = math.sqrt(sum((x - md) ** 2 for x in d) / (n - 1))
    return beta, alpha, r2, te, md / te


def _capm_df(spark, pairs, key="k1"):
    return spark.createDataFrame(
        [(key, a, m) for a, m in pairs], "key string, a double, m double"
    )


PAIRS = [
    (0.011, 0.008), (-0.004, -0.002), (0.021, 0.015), (0.002, 0.001),
    (-0.013, -0.011), (0.007, 0.004), (0.016, 0.012), (-0.006, -0.005),
]


class TestCapm:
    def test_vs_python_reference(self, spark):
        out = capm_panel(_capm_df(spark, PAIRS), ["key"], "a", "m").collect()[
            0
        ]
        beta, alpha, r2, te, ir = _capm_ref(PAIRS)
        assert out["n"] == 8
        assert out["beta"] == pytest.approx(beta, rel=1e-9)
        assert out["alpha"] == pytest.approx(alpha, rel=1e-9)
        assert out["r2"] == pytest.approx(r2, rel=1e-9)
        assert out["tracking_error"] == pytest.approx(te, rel=1e-9)
        assert out["information_ratio"] == pytest.approx(ir, rel=1e-9)

    def test_perfect_tracker(self, spark):
        pairs = [(m, m) for m in (0.01, -0.02, 0.03, 0.005)]
        out = capm_panel(
            _capm_df(spark, pairs), ["key"], "a", "m"
        ).collect()[0]
        assert out["beta"] == pytest.approx(1.0)
        assert out["alpha"] == pytest.approx(0.0, abs=1e-15)
        assert out["r2"] == pytest.approx(1.0)
        # zero tracking difference -> TE and IR undefined, not 0/0
        assert out["tracking_error"] is None
        assert out["information_ratio"] is None

    def test_flat_benchmark_null_beta(self, spark):
        pairs = [(0.01, 0.002), (-0.01, 0.002), (0.02, 0.002)]
        out = capm_panel(
            _capm_df(spark, pairs), ["key"], "a", "m"
        ).collect()[0]
        assert out["beta"] is None and out["alpha"] is None
        assert out["r2"] is None
        assert out["tracking_error"] is not None

    def test_leveraged_asset_beta_two(self, spark):
        pairs = [(2 * m, m) for m in (0.01, -0.02, 0.03, -0.005)]
        out = capm_panel(
            _capm_df(spark, pairs), ["key"], "a", "m"
        ).collect()[0]
        assert out["beta"] == pytest.approx(2.0, rel=1e-12)
        assert out["r2"] == pytest.approx(1.0, rel=1e-12)


def _ulcer_ref(xs):
    peak = -float("inf")
    ds = []
    for x in xs:
        peak = max(peak, x)
        ds.append(100.0 * (x - peak) / peak)
    n = len(xs)
    ui = math.sqrt(sum(d * d for d in ds) / n)
    pain = sum(-d for d in ds) / n
    return ui, pain, -min(ds)


def _curve_df(spark, xs, key="k1"):
    return spark.createDataFrame(
        [(key, i, float(x)) for i, x in enumerate(xs)],
        "key string, t int, v double",
    )


CURVE = [100.0, 110.0, 104.5, 98.25, 102.0, 112.75, 107.0, 120.0, 95.5]


class TestUlcer:
    def test_vs_python_reference(self, spark):
        out = ulcer_index(
            _curve_df(spark, CURVE), ["key"], ["t"], "v"
        ).collect()[0]
        ui, pain, mdd = _ulcer_ref(CURVE)
        assert out["n"] == len(CURVE)
        assert out["ulcer_index"] == pytest.approx(ui, rel=1e-12)
        assert out["pain_index"] == pytest.approx(pain, rel=1e-12)
        assert out["max_dd_pct"] == pytest.approx(mdd, rel=1e-12)

    def test_monotone_curve_zero_risk(self, spark):
        out = ulcer_index(
            _curve_df(spark, [1.0, 2.0, 3.0, 4.0]), ["key"], ["t"], "v"
        ).collect()[0]
        assert out["ulcer_index"] == 0.0
        assert out["pain_index"] == 0.0
        assert out["max_dd_pct"] == 0.0

    def test_duration_sensitivity_vs_max_drawdown(self, spark):
        # same max drawdown, one stays underwater longer -> higher UI
        quick = [100, 80, 100, 100, 100, 100]
        slow = [100, 80, 80, 80, 80, 100]
        o_q = ulcer_index(
            _curve_df(spark, quick), ["key"], ["t"], "v"
        ).collect()[0]
        o_s = ulcer_index(
            _curve_df(spark, slow), ["key"], ["t"], "v"
        ).collect()[0]
        assert o_q["max_dd_pct"] == pytest.approx(o_s["max_dd_pct"])
        assert o_s["ulcer_index"] > o_q["ulcer_index"]
        assert o_s["pain_index"] > o_q["pain_index"]

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="non-positive"):
            ulcer_index(
                _curve_df(spark, [100.0, -5.0]), ["key"], ["t"], "v"
            )
        with pytest.raises(ValueError, match="max_len"):
            ulcer_index(
                _curve_df(spark, CURVE), ["key"], ["t"], "v", max_len=4
            )
