"""GPD peaks-over-threshold (L311) and historical VaR/ES (L312)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.extremes import gpd_pot, hist_var_es


def _gpd_py(xs, u, t):
    ys = [x - u for x in xs if x > u]
    n, ne = len(xs), len(ys)
    s = sum(ys)
    q = sum(y * y for y in ys)
    m = s / ne
    v = (ne * q - s * s) / (ne * (ne - 1.0))
    r = m * m / v
    xi = 0.5 * (1.0 - r)
    sigma = 0.5 * m * (1.0 + r)
    rate = ne / n
    level = u + (sigma / xi) * ((t * rate) ** xi - 1.0)
    return xi, sigma, rate, level


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(x)) for x in xs], "g string, x double"
    )


class TestGpd:
    XS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15, 11, 14,
          22, 31, 48, 25, 37, 60]

    def test_matches_python_reference(self, spark):
        rows = gpd_pot(
            _df(spark, self.XS), ["g"], "x", threshold=10.0,
            return_periods=(100, 1000),
        ).collect()
        got = {r["t_return"]: r for r in rows}
        for t in (100, 1000):
            xi, sigma, rate, level = _gpd_py(self.XS, 10.0, t)
            assert got[t]["xi"] == pytest.approx(xi, rel=1e-9)
            assert got[t]["sigma"] == pytest.approx(sigma, rel=1e-9)
            assert got[t]["rate"] == pytest.approx(rate, rel=1e-12)
            assert got[t]["level"] == pytest.approx(level, rel=1e-9)

    def test_levels_grow_with_period(self, spark):
        rows = gpd_pot(
            _df(spark, self.XS), ["g"], "x", threshold=10.0,
            return_periods=(100, 1000),
        ).collect()
        got = {r["t_return"]: r["level"] for r in rows}
        assert got[1000] > got[100]

    def test_too_few_exceedances_null(self, spark):
        rows = gpd_pot(
            _df(spark, [1, 2, 3, 99]), ["g"], "x", threshold=50.0,
            return_periods=(100,),
        ).collect()
        assert rows[0]["xi"] is None and rows[0]["level"] is None


def _es_py(xs, q):
    n = len(xs)
    k = max(1, (n * (100 - q)) // 100)
    top = sorted(xs, reverse=True)[:k]
    return k, top[-1], sum(top) / k


class TestHistVarEs:
    def test_matches_python_reference(self, spark):
        xs = [float(i) for i in range(1, 41)]
        row = hist_var_es(_df(spark, xs), ["g"], "x", q_pct=90).collect()[0]
        k, var, es = _es_py(xs, 90)
        assert row["k_tail"] == k
        assert row["var_level"] == pytest.approx(var, rel=1e-12)
        assert row["es"] == pytest.approx(es, rel=1e-12)

    def test_es_at_least_var(self, spark):
        xs = [1, 2, 3, 50, 60, 4, 5, 6, 7, 8, 9, 10, 11, 12, 70,
              13, 14, 15, 16, 17]
        row = hist_var_es(_df(spark, xs), ["g"], "x", q_pct=90).collect()[0]
        assert row["es"] >= row["var_level"]

    def test_small_group_k_one(self, spark):
        row = hist_var_es(
            _df(spark, [5.0, 9.0, 1.0]), ["g"], "x", q_pct=95
        ).collect()[0]
        assert row["k_tail"] == 1
        assert row["var_level"] == 9.0 and row["es"] == 9.0

    def test_bad_q_refused(self, spark):
        with pytest.raises(ValueError, match="q_pct"):
            hist_var_es(_df(spark, [1.0]), ["g"], "x", q_pct=100)
