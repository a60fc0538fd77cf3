"""Yule-Walker AR(p) / PACF (L273) and periodogram (L274)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.timeseries import (
    ar_yule_walker,
    periodogram,
)


def _acf_py(xs, p):
    n = len(xs)
    xbar = sum(xs) / n
    c = [x - xbar for x in xs]
    den = sum(v * v for v in c)
    return [
        sum(c[t] * c[t - h] for t in range(h, n)) / den
        for h in range(1, p + 1)
    ]


def _dl_py(rs):
    phis, pacfs = [rs[0]], [rs[0]]
    e = 1.0 - rs[0] * rs[0]
    for m in range(2, len(rs) + 1):
        num = sum(phis[j - 1] * rs[m - j - 1] for j in range(1, m))
        k = (rs[m - 1] - num) / e
        phis = [
            phis[j - 1] - k * phis[m - j - 1] for j in range(1, m)
        ] + [k]
        pacfs.append(k)
        e = e * (1.0 - k * k)
    return phis, pacfs


class TestYuleWalker:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x)) for i, x in enumerate(xs)],
            "g string, t double, x double",
        )

    def test_matches_python_reference(self, spark):
        xs = [1.0, 2.5, 2.0, 3.5, 3.0, 4.25, 4.0, 5.5, 5.0, 6.75,
              6.0, 7.5, 7.25, 8.0, 9.5, 9.0]
        rows = ar_yule_walker(
            self._df(spark, xs), ["g"], ["t"], "x", p=3
        ).collect()
        rs = _acf_py(xs, 3)
        phis, pacfs = _dl_py(rs)
        got = {r["lag"]: r for r in rows}
        assert len(got) == 3
        for lag in (1, 2, 3):
            assert got[lag]["pacf"] == pytest.approx(
                pacfs[lag - 1], rel=1e-9
            )
            assert got[lag]["ar_coef"] == pytest.approx(
                phis[lag - 1], rel=1e-9
            )

    def test_pacf_lag1_equals_acf(self, spark):
        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        rows = ar_yule_walker(
            self._df(spark, xs), ["g"], ["t"], "x", p=2
        ).collect()
        r1 = _acf_py(xs, 1)[0]
        got = {r["lag"]: r for r in rows}
        assert got[1]["pacf"] == pytest.approx(r1, rel=1e-9)

    def test_p1(self, spark):
        xs = [1.0, 2.0, 1.5, 2.5, 1.0]
        rows = ar_yule_walker(
            self._df(spark, xs), ["g"], ["t"], "x", p=1
        ).collect()
        assert len(rows) == 1 and rows[0]["lag"] == 1

    def test_short_series_nulls(self, spark):
        rows = ar_yule_walker(
            self._df(spark, [1.0, 2.0]), ["g"], ["t"], "x", p=3
        ).collect()
        assert any(r["pacf"] is None for r in rows)

    def test_bad_p_refused(self, spark):
        with pytest.raises(ValueError, match="p >= 1"):
            ar_yule_walker(self._df(spark, [1.0]), ["g"], ["t"], "x", p=0)


def _pgram_py(xs, period):
    n = len(xs)
    xbar = 0.0
    for x in xs:
        xbar += x
    xbar /= n
    c = s = den = 0.0
    for i, x in enumerate(xs):
        c += (x - xbar) * math.cos(2 * math.pi * i / period)
        s += (x - xbar) * math.sin(2 * math.pi * i / period)
        den += (x - xbar) ** 2
    return 2.0 * (c * c + s * s) / (n * den)


class TestPeriodogram:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x)) for i, x in enumerate(xs)],
            "g string, t double, x double",
        )

    def test_pure_tone(self, spark):
        xs = [math.sin(2 * math.pi * i / 8) for i in range(32)]
        rows = periodogram(
            self._df(spark, xs), ["g"], "t", "x", periods=[5, 8]
        ).collect()
        got = {r["period"]: r["power"] for r in rows}
        assert got[8] == pytest.approx(1.0, abs=1e-9)
        assert got[5] < 0.05

    def test_matches_python_reference(self, spark):
        xs = [1.0, 4.0, 2.0, 8.0, 5.5, 7.0, 0.5, 3.25, 6.0, 2.75]
        rows = periodogram(
            self._df(spark, xs), ["g"], "t", "x", periods=[3, 4, 7]
        ).collect()
        for r in rows:
            assert r["power"] == pytest.approx(
                _pgram_py(xs, r["period"]), rel=1e-9
            )

    def test_constant_series_null(self, spark):
        rows = periodogram(
            self._df(spark, [2.0] * 10), ["g"], "t", "x", periods=[4]
        ).collect()
        assert rows[0]["power"] is None

    def test_null_refused(self, spark):
        df = self._df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 5.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            periodogram(df, ["g"], "t", "x", periods=[4])

    def test_bad_period_refused(self, spark):
        with pytest.raises(ValueError, match="periods"):
            periodogram(self._df(spark, [1.0]), ["g"], "t", "x",
                        periods=[1])
