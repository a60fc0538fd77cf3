"""Holt-Winters additive (L333) and Gwet's AC1 (L334)."""

import pytest

from lmss_entity_extractor_spark.ops.evalmetrics import gwet_ac1
from lmss_entity_extractor_spark.ops.timeseries import (
    holt_winters_additive,
)


def _hw_py(xs, p, a, b, g):
    m1 = sum(xs[:p]) / p
    m2 = sum(xs[p:2 * p]) / p
    l, tr = m1, (m2 - m1) / p
    s = [xs[i] - m1 for i in range(p)]
    for t in range(p, len(xs)):
        ph = t % p
        x = xs[t]
        lnew = a * (x - s[ph]) + (1 - a) * (l + tr)
        tr = b * (lnew - l) + (1 - b) * tr
        s[ph] = g * (x - lnew) + (1 - g) * s[ph]
        l = lnew
    return l, tr, l + tr + s[len(xs) % p]


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestHoltWinters:
    def test_matches_python_reference(self, spark):
        xs = [10 + 3 * (i % 4) + 0.2 * i + 0.1 * ((i * 7) % 5)
              for i in range(24)]
        row = holt_winters_additive(
            _df(spark, xs), ["g"], "t", "x", period=4,
            alpha=0.3, beta=0.1, gamma=0.2,
        ).collect()[0]
        l, tr, fc = _hw_py(xs, 4, 0.3, 0.1, 0.2)
        assert row["level"] == pytest.approx(l, rel=1e-12)
        assert row["trend"] == pytest.approx(tr, rel=1e-12)
        assert row["forecast"] == pytest.approx(fc, rel=1e-12)

    def test_clean_seasonal_trend_forecast(self, spark):
        # exact pattern: x = 2t + season(t%3), forecast near truth
        season = [5.0, -2.0, -3.0]
        xs = [2.0 * t + season[t % 3] for t in range(18)]
        row = holt_winters_additive(
            _df(spark, xs), ["g"], "t", "x", period=3,
            alpha=0.5, beta=0.3, gamma=0.5,
        ).collect()[0]
        truth = 2.0 * 18 + season[0]
        assert abs(row["forecast"] - truth) < 1.5

    def test_too_short_null(self, spark):
        row = holt_winters_additive(
            _df(spark, [1.0, 2.0, 3.0, 4.0, 5.0]), ["g"], "t", "x",
            period=4,
        ).collect()[0]
        assert row["forecast"] is None

    def test_bad_period_refused(self, spark):
        with pytest.raises(ValueError, match="period"):
            holt_winters_additive(
                _df(spark, [1.0]), ["g"], "t", "x", period=1
            )


def _ac1_py(pairs):
    n = len(pairs)
    pa = sum(1 for a, b in pairs if a == b) / n
    cats = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    q = len(cats)
    pe = sum(
        (sum(1 for a, b in pairs if a == c)
         + sum(1 for a, b in pairs if b == c)) / (2 * n)
        * (1 - (sum(1 for a, b in pairs if a == c)
                + sum(1 for a, b in pairs if b == c)) / (2 * n))
        for c in cats
    ) / (q - 1)
    return pa, pe, (pa - pe) / (1 - pe)


def _dfp(spark, pairs, g="g1"):
    return spark.createDataFrame(
        [(g, a, b) for a, b in pairs], "g string, ra string, rb string"
    )


class TestGwetAc1:
    def test_matches_python_reference(self, spark):
        pairs = (
            [("x", "x")] * 40 + [("x", "y")] * 5 + [("y", "x")] * 3
            + [("y", "y")] * 10 + [("z", "z")] * 2
        )
        row = gwet_ac1(_dfp(spark, pairs), ["g"], "ra", "rb").collect()[0]
        pa, pe, ac1 = _ac1_py(pairs)
        assert row["p_a"] == pytest.approx(pa, rel=1e-12)
        assert row["p_e"] == pytest.approx(pe, rel=1e-9)
        assert row["ac1"] == pytest.approx(ac1, rel=1e-9)

    def test_skewed_prevalence_stays_high(self, spark):
        # 95% one label, high agreement: kappa collapses, AC1 stays up
        pairs = [("x", "x")] * 95 + [("y", "y")] * 3 + [("x", "y")] * 2
        row = gwet_ac1(_dfp(spark, pairs), ["g"], "ra", "rb").collect()[0]
        assert row["ac1"] > 0.9

    def test_perfect_agreement_one(self, spark):
        pairs = [("x", "x")] * 5 + [("y", "y")] * 5
        row = gwet_ac1(_dfp(spark, pairs), ["g"], "ra", "rb").collect()[0]
        assert row["ac1"] == pytest.approx(1.0, rel=1e-12)

    def test_single_category_null(self, spark):
        pairs = [("x", "x")] * 5
        row = gwet_ac1(_dfp(spark, pairs), ["g"], "ra", "rb").collect()[0]
        assert row["ac1"] is None
