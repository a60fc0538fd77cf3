"""KPSS level stationarity (L339) and Lo-MacKinlay variance ratio (L340)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    kpss_level,
    variance_ratio,
)


def _kpss_py(xs, lags=4):
    n = len(xs)
    mu = sum(xs) / n
    e = [x - mu for x in xs]
    s = 0.0
    sp2 = 0.0
    for v in e:
        s += v
        sp2 += s * s
    g0 = sum(v * v for v in e) / n
    lrv = g0
    for j in range(1, lags + 1):
        gj = sum(e[t] * e[t - j] for t in range(j, n)) / n
        lrv += 2.0 * (1.0 - j / (lags + 1.0)) * gj
    return lrv, sp2 / (n * n) / lrv


def _vr_py(xs, q=4):
    n = len(xs)
    mu = sum(xs) / n
    var1 = sum((x - mu) ** 2 for x in xs) / n
    num = sum(
        (sum(xs[t - q + 1 : t + 1]) - q * mu) ** 2
        for t in range(q - 1, n)
    )
    vr = num / (n * q) / var1
    z = math.sqrt(n) * (vr - 1.0) / math.sqrt(
        2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)
    )
    return vr, z


def _series(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, i, float(x)) for i, x in enumerate(xs)],
        "g string, t int, x double",
    )


# deterministic pseudo-noise: small, zero-ish mean, no RNG
def _noise(i):
    return ((i * 7919) % 13 - 6) / 10.0


class TestKpss:
    def test_matches_python_reference(self, spark):
        xs = [round(10.0 + _noise(i) + 0.3 * math.sin(i), 2) for i in range(40)]
        row = kpss_level(_series(spark, xs), ["g"], ["t"], "x").collect()[0]
        lrv, eta = _kpss_py(xs)
        assert row["n"] == 40
        assert row["lrv"] == pytest.approx(lrv, rel=1e-9)
        assert row["eta_kpss"] == pytest.approx(eta, rel=1e-9)

    def test_discriminates_walk_from_level(self, spark):
        # stationary: level + bounded noise -> small eta
        stat = [50.0 + _noise(i) for i in range(60)]
        # random walk: cumulative drifty increments -> large eta
        walk, acc = [], 0.0
        for i in range(60):
            acc += 1.0 + _noise(i)
            walk.append(acc)
        df = _series(spark, stat, "stat").union(_series(spark, walk, "walk"))
        out = {r["g"]: r["eta_kpss"] for r in
               kpss_level(df, ["g"], ["t"], "x").collect()}
        assert out["stat"] < 0.463  # 5% critical value: accept H0
        assert out["walk"] > 0.739  # 1% critical value: reject H0

    def test_lags_zero_is_iid_form(self, spark):
        xs = [float((i * 3) % 7) for i in range(20)]
        row = kpss_level(
            _series(spark, xs), ["g"], ["t"], "x", lags=0
        ).collect()[0]
        lrv, eta = _kpss_py(xs, lags=0)
        assert row["eta_kpss"] == pytest.approx(eta, rel=1e-9)

    def test_constant_series_null(self, spark):
        row = kpss_level(
            _series(spark, [5.0] * 12), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["eta_kpss"] is None and row["lrv"] is None

    def test_short_series_null(self, spark):
        row = kpss_level(
            _series(spark, [1.0, 2.0, 3.0]), ["g"], ["t"], "x", lags=4
        ).collect()[0]
        assert row["eta_kpss"] is None

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="lags"):
            kpss_level(_series(spark, [1.0]), ["g"], ["t"], "x", lags=21)
        with pytest.raises(ValueError, match="NULL"):
            kpss_level(
                spark.createDataFrame(
                    [("g", 0, None)], "g string, t int, x double"
                ),
                ["g"], ["t"], "x",
            )


class TestVarianceRatio:
    def test_matches_python_reference(self, spark):
        xs = [1.0 + _noise(i) for i in range(50)]
        row = variance_ratio(
            _series(spark, xs), ["g"], ["t"], "x", q=4
        ).collect()[0]
        vr, z = _vr_py(xs, q=4)
        assert row["vr"] == pytest.approx(vr, rel=1e-9)
        assert row["z_vr"] == pytest.approx(z, rel=1e-9)

    def test_iid_near_one_mean_reversion_below(self, spark):
        # iid-ish increments: VR ~ 1
        iid = [_noise(i) for i in range(80)]
        # strongly alternating increments (mean-reverting level): VR << 1
        rev = [(-1.0) ** i * 5.0 + _noise(i) for i in range(80)]
        df = _series(spark, iid, "iid").union(_series(spark, rev, "rev"))
        out = {r["g"]: r["vr"] for r in
               variance_ratio(df, ["g"], ["t"], "x", q=2).collect()}
        assert abs(out["iid"] - 1.0) < 0.5
        assert out["rev"] < 0.3

    def test_trending_above_one(self, spark):
        # positively autocorrelated increments: VR > 1
        xs = []
        for i in range(40):
            xs.extend(
                [round(0.1 + _noise(i), 2), round(0.1 + _noise(i + 1), 2)]
            )
        row = variance_ratio(
            _series(spark, xs), ["g"], ["t"], "x", q=4
        ).collect()[0]
        vr, _ = _vr_py(xs, q=4)
        assert row["vr"] == pytest.approx(vr, rel=1e-9)

    def test_zero_variance_null(self, spark):
        row = variance_ratio(
            _series(spark, [2.0] * 10), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["vr"] is None and row["z_vr"] is None

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="q must"):
            variance_ratio(_series(spark, [1.0]), ["g"], ["t"], "x", q=1)
        with pytest.raises(ValueError, match="NULL"):
            variance_ratio(
                spark.createDataFrame(
                    [("g", 0, None)], "g string, t int, x double"
                ),
                ["g"], ["t"], "x",
            )
