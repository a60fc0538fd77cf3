"""Risk-adjusted performance panel (L341) and Omega ratio (L342)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    omega_ratio,
    risk_panel,
)


def _risk_py(rs, periods=252, mar=0.0):
    n = len(rs)
    mu = sum(rs) / n
    sd = math.sqrt(sum((r - mu) ** 2 for r in rs) / (n - 1))
    ddev = math.sqrt(sum(min(r - mar, 0.0) ** 2 for r in rs) / n)
    cum, peak, mdd = 0.0, -1e18, 0.0
    for r in rs:
        cum += r
        peak = max(peak, cum)
        mdd = max(mdd, peak - cum)
    sharpe = math.sqrt(periods) * mu / sd if sd > 0 else None
    sortino = math.sqrt(periods) * mu / ddev if ddev > 0 else None
    calmar = mu * periods / mdd if mdd > 0 else None
    return sharpe, sortino, mdd, calmar


def _series(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, i, float(x)) for i, x in enumerate(xs)],
        "g string, t int, x double",
    )


def _noise(i):
    return ((i * 7919) % 13 - 6) / 10.0


class TestRiskPanel:
    def test_matches_python_reference(self, spark):
        rs = [round(0.5 + _noise(i), 2) for i in range(40)]
        row = risk_panel(_series(spark, rs), ["g"], ["t"], "x").collect()[0]
        sharpe, sortino, mdd, calmar = _risk_py(rs)
        assert row["n"] == 40
        assert row["sharpe"] == pytest.approx(sharpe, rel=1e-9)
        assert row["sortino"] == pytest.approx(sortino, rel=1e-9)
        assert row["mdd"] == pytest.approx(mdd, rel=1e-12)
        assert row["calmar"] == pytest.approx(calmar, rel=1e-9)

    def test_never_losing_series(self, spark):
        rs = [1.0, 2.0, 1.5, 3.0]
        row = risk_panel(_series(spark, rs), ["g"], ["t"], "x").collect()[0]
        # monotone-up cumulative curve: no drawdown, no downside
        assert row["sortino"] is None
        assert row["calmar"] is None
        assert row["mdd"] == 0.0
        assert row["sharpe"] is not None and row["sharpe"] > 0

    def test_riskier_series_scores_lower(self, spark):
        calm = [round(0.1 + _noise(i) / 100, 2) for i in range(30)]
        wild = [round(0.1 + _noise(i) * 20, 2) for i in range(30)]
        df = _series(spark, calm, "calm").union(_series(spark, wild, "wild"))
        out = {r["g"]: r for r in
               risk_panel(df, ["g"], ["t"], "x").collect()}
        assert out["calm"]["sharpe"] > out["wild"]["sharpe"]
        assert out["calm"]["mdd"] < out["wild"]["mdd"]

    def test_constant_zero_sd_null(self, spark):
        row = risk_panel(
            _series(spark, [1.0] * 8), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["sharpe"] is None

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            risk_panel(
                spark.createDataFrame(
                    [("g", 0, None)], "g string, t int, x double"
                ),
                ["g"], ["t"], "x",
            )


class TestOmegaRatio:
    def test_matches_python_reference(self, spark):
        rs = [round(_noise(i) + 0.2, 2) for i in range(50)]
        row = omega_ratio(_series(spark, rs), ["g"], "x").collect()[0]
        up = sum(max(r, 0.0) for r in rs)
        dn = sum(max(-r, 0.0) for r in rs)
        assert row["upside"] == pytest.approx(up, rel=1e-12)
        assert row["downside"] == pytest.approx(dn, rel=1e-12)
        assert row["omega"] == pytest.approx(up / dn, rel=1e-12)
        assert row["n_above"] == sum(1 for r in rs if r > 0)

    def test_threshold_shifts_ratio(self, spark):
        rs = [1.0, 2.0, -1.0, 3.0]
        df = _series(spark, rs)
        o0 = omega_ratio(df, ["g"], "x", threshold=0.0).collect()[0]
        o2 = omega_ratio(df, ["g"], "x", threshold=2.0).collect()[0]
        assert o0["omega"] == pytest.approx(6.0 / 1.0)
        # above 2: only 3.0 contributes 1; below: 1+0+3+0 = 4... check:
        # (1-2)^-=1, (2-2)=0, (-1-2)^-=3, (3-2)^+=1 -> 1/4
        assert o2["omega"] == pytest.approx(1.0 / 4.0)
        assert o2["n_above"] == 1

    def test_no_downside_null(self, spark):
        row = omega_ratio(
            _series(spark, [1.0, 2.0]), ["g"], "x"
        ).collect()[0]
        assert row["omega"] is None
        assert row["downside"] == 0.0

    def test_null_refused(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            omega_ratio(
                spark.createDataFrame(
                    [("g", None)], "g string, x double"
                ),
                ["g"], "x",
            )
