"""Seasonal Mann-Kendall (L295) and Lorenz curve points (L296)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import lorenz_points
from lmss_entity_extractor_spark.ops.trend import seasonal_mann_kendall


def _mk_py(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    return s, var


def _smk_py(ts, xs, period):
    phases = {}
    for t, x in zip(ts, xs):
        phases.setdefault(int(t) % period, []).append((t, x))
    s_tot, var_tot = 0, 0.0
    for ph in sorted(phases):
        series = [x for _, x in sorted(phases[ph])]
        s, var = _mk_py(series)
        s_tot += s
        var_tot += var
    if s_tot > 0:
        z = (s_tot - 1) / math.sqrt(var_tot)
    elif s_tot < 0:
        z = (s_tot + 1) / math.sqrt(var_tot)
    else:
        z = 0.0
    return s_tot, var_tot, z


def _df(spark, ts, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(t), float(x)) for t, x in zip(ts, xs)],
        "g string, t double, x double",
    )


class TestSeasonalMk:
    def test_matches_python_reference(self, spark):
        ts = list(range(28))
        xs = [10 * (t % 7) + 0.5 * t + (1 if t % 5 == 0 else 0)
              for t in ts]
        row = seasonal_mann_kendall(
            _df(spark, ts, xs), ["g"], "t", "x", period=7
        ).collect()[0]
        s, var, z = _smk_py(ts, xs, 7)
        assert row["s"] == s
        assert row["var_s"] == pytest.approx(var, rel=1e-12)
        assert row["z"] == pytest.approx(z, rel=1e-12)

    def test_seasonal_trend_detected_despite_cycle(self, spark):
        # strong weekly cycle + small upward drift: plain MK would
        # dilute, seasonal MK sees 4 clean rising subsequences
        ts = list(range(28))
        xs = [100 * (t % 7) + 0.1 * t for t in ts]
        row = seasonal_mann_kendall(
            _df(spark, ts, xs), ["g"], "t", "x", period=7
        ).collect()[0]
        assert row["s"] == 7 * 6  # every within-phase pair rises
        assert row["z"] > 2.0

    def test_all_tied_null(self, spark):
        ts = list(range(12))
        row = seasonal_mann_kendall(
            _df(spark, ts, [5.0] * 12), ["g"], "t", "x", period=3
        ).collect()[0]
        assert row["z"] is None

    def test_bad_period_refused(self, spark):
        with pytest.raises(ValueError, match="period"):
            seasonal_mann_kendall(
                _df(spark, [0], [1.0]), ["g"], "t", "x", period=1
            )


def _lorenz_py(xs, k):
    xs = sorted(xs)
    n = len(xs)
    tot = sum(xs)
    out = {}
    for i in range(1, k + 1):
        pos = (i * n) // k
        if pos == 0:
            continue
        out[i] = (pos / n, sum(xs[:pos]) / tot)
    return out


class TestLorenz:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1, 2, 2, 3.5, 10, 0.25, 4, 7, 6, 1.5, 8, 2.75]
        rows = lorenz_points(
            self._df(spark, xs), ["g"], "x", n_points=5
        ).collect()
        ref = _lorenz_py(xs, 5)
        assert len(rows) == 5
        for r in rows:
            pop, cum = ref[r["point"]]
            assert r["pop_share"] == pytest.approx(pop, rel=1e-12)
            assert r["cum_share"] == pytest.approx(cum, rel=1e-12)

    def test_equal_values_diagonal(self, spark):
        rows = lorenz_points(
            self._df(spark, [5.0] * 10), ["g"], "x", n_points=10
        ).collect()
        for r in rows:
            assert r["cum_share"] == pytest.approx(
                r["pop_share"], rel=1e-12
            )

    def test_curve_below_diagonal_when_unequal(self, spark):
        xs = [1.0] * 9 + [100.0]
        rows = lorenz_points(
            self._df(spark, xs), ["g"], "x", n_points=10
        ).collect()
        mid = [r for r in rows if r["point"] == 5][0]
        assert mid["cum_share"] < 0.1

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            lorenz_points(self._df(spark, [1.0, -1.0]), ["g"], "x")
