"""Newey-West HAC mean inference (L393) and Page-Hinkley drift (L394)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.changepoint import page_hinkley
from lmss_entity_extractor_spark.ops.concentration import newey_west


def _series(spark, xs, key="k"):
    return spark.createDataFrame(
        [(key, i, float(x)) for i, x in enumerate(xs)],
        "k string, t int, v double",
    )


def _nw_ref(xs, L):
    n = len(xs)
    m = sum(xs) / n
    g = [
        sum((xs[t] - m) * (xs[t - h] - m) for t in range(h, n)) / n
        for h in range(L + 1)
    ]
    lrv = g[0] + 2.0 * sum((1.0 - h / (L + 1.0)) * g[h] for h in range(1, L + 1))
    return m, g[0], lrv


class TestNeweyWest:
    def test_python_reference(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        r = newey_west(
            _series(spark, xs), ["k"], ["t"], "v", max_lag=3
        ).collect()[0]
        m, g0, lrv = _nw_ref(xs, 3)
        assert r["mean"] == pytest.approx(m)
        assert r["lrv"] == pytest.approx(lrv, rel=1e-9)
        assert r["se_hac"] == pytest.approx(
            math.sqrt(max(0.0, lrv) / len(xs)), rel=1e-9
        )
        assert r["var_iid"] == pytest.approx(
            g0 * len(xs) / (len(xs) - 1), rel=1e-9
        )

    def test_positive_autocorr_inflates_se(self, spark):
        # slow level alternation -> strong positive lag-1 correlation
        xs = [0] * 6 + [10] * 6 + [0] * 6 + [10] * 6
        r = newey_west(
            _series(spark, xs), ["k"], ["t"], "v", max_lag=4
        ).collect()[0]
        assert r["se_hac"] > r["se_iid"]

    def test_alternating_deflates_se(self, spark):
        xs = [0, 10] * 10
        r = newey_west(
            _series(spark, xs), ["k"], ["t"], "v", max_lag=1
        ).collect()[0]
        assert r["se_hac"] < r["se_iid"]

    def test_short_series_null(self, spark):
        r = newey_west(
            _series(spark, [1, 2, 3]), ["k"], ["t"], "v", max_lag=3
        ).collect()[0]
        assert r["lrv"] is None and r["se_hac"] is None
        assert r["se_iid"] is not None

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("k", 0, 1.0), ("k", 1, None)], "k string, t int, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            newey_west(df, ["k"], ["t"], "v", max_lag=1)

    def test_bad_lag_refused(self, spark):
        with pytest.raises(ValueError, match="max_lag"):
            newey_west(_series(spark, [1.0]), ["k"], ["t"], "v", max_lag=0)


def _ph_ref(xs, delta, lam):
    mean = mi = mni = pi = 0.0
    md = mnd = pd = 0.0
    ti = td = None
    for t, x in enumerate(xs, 1):
        mean = mean + (x - mean) / t
        mi = mi + (x - mean - delta)
        mni = min(mni, mi)
        pi = max(pi, mi - mni)
        if ti is None and (mi - mni) > lam:
            ti = t
        md = md + (mean - x - delta)
        mnd = min(mnd, md)
        pd = max(pd, md - mnd)
        if td is None and (md - mnd) > lam:
            td = t
    return mean, pi, ti, pd, td


class TestPageHinkley:
    def test_level_shift_up_detected(self, spark):
        xs = [0.0] * 20 + [100.0] * 10
        r = page_hinkley(
            _series(spark, xs), ["k"], "t", "v", delta=1.0, lam=50.0
        ).collect()[0]
        mean, pi, ti, pd, td = _ph_ref(xs, 1.0, 50.0)
        assert r["detect_inc"] is True
        assert r["t_inc"] == ti
        assert 20 < r["t_inc"] <= 23
        assert r["ph_inc"] == pytest.approx(pi, rel=1e-9)
        assert r["mean"] == pytest.approx(mean, rel=1e-12)

    def test_level_shift_down_detected(self, spark):
        xs = [100.0] * 20 + [0.0] * 10
        r = page_hinkley(
            _series(spark, xs), ["k"], "t", "v", delta=1.0, lam=50.0
        ).collect()[0]
        assert r["detect_dec"] is True
        assert r["detect_inc"] is False
        _, _, _, pd, td = _ph_ref(xs, 1.0, 50.0)
        assert r["t_dec"] == td
        assert r["ph_dec"] == pytest.approx(pd, rel=1e-9)

    def test_constant_no_detection(self, spark):
        r = page_hinkley(
            _series(spark, [5.0] * 15), ["k"], "t", "v", lam=1.0
        ).collect()[0]
        assert r["detect_inc"] is False and r["detect_dec"] is False
        assert r["ph_inc"] == pytest.approx(0.0)

    def test_python_reference_noisy(self, spark):
        xs = [((i * 37) % 11) - 5.0 for i in range(40)]
        r = page_hinkley(
            _series(spark, xs), ["k"], "t", "v", delta=0.5, lam=8.0
        ).collect()[0]
        mean, pi, ti, pd, td = _ph_ref(xs, 0.5, 8.0)
        assert r["ph_inc"] == pytest.approx(pi, rel=1e-9)
        assert r["ph_dec"] == pytest.approx(pd, rel=1e-9)
        assert r["t_inc"] == ti and r["t_dec"] == td

    def test_duplicate_order_refused(self, spark):
        df = spark.createDataFrame(
            [("k", 0, 1.0), ("k", 0, 2.0)], "k string, t int, v double"
        )
        with pytest.raises(ValueError, match="duplicate"):
            page_hinkley(df, ["k"], "t", "v")

    def test_bad_params_refused(self, spark):
        df = _series(spark, [1.0])
        with pytest.raises(ValueError, match="lam"):
            page_hinkley(df, ["k"], "t", "v", lam=0.0)
        with pytest.raises(ValueError, match="delta"):
            page_hinkley(df, ["k"], "t", "v", delta=-1.0)
