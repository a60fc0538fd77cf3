"""I-MR chart (L325) and EWMA chart (L326)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.spc import ewma_chart, imr_chart

D2 = 1.128


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestImr:
    def test_limits_match_formula(self, spark):
        xs = [10, 10.5, 9.8, 10.2, 9.9, 10.4, 10.1, 9.7, 10.3, 9.6]
        rows = imr_chart(_df(spark, xs), ["g"], ["t"], "x").collect()
        n = len(xs)
        centre = sum(xs) / n
        mrbar = sum(
            abs(xs[i] - xs[i - 1]) for i in range(1, n)
        ) / (n - 1)
        ucl = centre + 3 * mrbar / D2
        for r in rows:
            assert r["centre"] == pytest.approx(centre, rel=1e-12)
            assert r["ucl"] == pytest.approx(ucl, rel=1e-12)
            assert r["beyond"] is False

    def test_outlier_flagged(self, spark):
        xs = [10, 10.5, 9.8, 10.2, 9.9, 10.4, 10.1, 9.7, 25.0]
        rows = {
            r["t"]: r
            for r in imr_chart(_df(spark, xs), ["g"], ["t"], "x").collect()
        }
        assert rows[9]["beyond"] is True

    def test_run8_flagged(self, spark):
        # 8 consecutive points above the centre at the tail
        xs = [5, 15, 5, 15, 5, 15] + [10.6 + 0.01 * i for i in range(8)]
        rows = {
            r["t"]: r
            for r in imr_chart(_df(spark, xs), ["g"], ["t"], "x").collect()
        }
        assert rows[14]["run8"] is True
        assert rows[6]["run8"] is False


def _ewma_py(xs, lam):
    n = len(xs)
    centre = sum(xs) / n
    mrbar = sum(abs(xs[i] - xs[i - 1]) for i in range(1, n)) / (n - 1)
    sigma = mrbar / D2
    z, out = centre, []
    for t, x in enumerate(xs, 1):
        z = lam * x + (1 - lam) * z
        w = 3 * sigma * math.sqrt(
            lam / (2 - lam) * (1 - (1 - lam) ** (2 * t))
        )
        out.append((z, centre - w, centre + w))
    return out


class TestEwmaChart:
    def test_matches_python_reference(self, spark):
        xs = [10, 10.5, 9.8, 10.2, 9.9, 10.4, 10.1, 9.7, 10.3, 9.6]
        rows = sorted(
            ewma_chart(_df(spark, xs), ["g"], "t", "x", lam=0.3).collect(),
            key=lambda r: r["t"],
        )
        ref = _ewma_py(xs, 0.3)
        for r, (z, lcl, ucl) in zip(rows, ref):
            assert r["z"] == pytest.approx(z, rel=1e-12)
            assert r["lcl"] == pytest.approx(lcl, rel=1e-9)
            assert r["ucl"] == pytest.approx(ucl, rel=1e-9)

    def test_small_sustained_shift_detected(self, spark):
        xs = [10 + 0.2 * ((i * 7) % 5 - 2) for i in range(20)] + [
            10.9 + 0.2 * ((i * 7) % 5 - 2) for i in range(15)
        ]
        rows = ewma_chart(_df(spark, xs), ["g"], "t", "x", lam=0.2).collect()
        assert any(r["beyond"] for r in rows if r["t"] > 20)

    def test_bad_lam_refused(self, spark):
        with pytest.raises(ValueError, match="lam"):
            ewma_chart(_df(spark, [1.0]), ["g"], "t", "x", lam=0.0)
