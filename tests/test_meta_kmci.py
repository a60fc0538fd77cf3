"""Meta-analysis pooling (L293) and KM Greenwood bands (L294)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import meta_pool
from lmss_entity_extractor_spark.ops.survival import kaplan_meier_ci


def _meta_py(pairs):
    pairs = sorted(pairs)
    ws = [1.0 / (se * se) for _, se in pairs]
    sw = sum(ws)
    swy = sum(w * y for w, (y, _) in zip(ws, pairs))
    sww = sum(w * w for w in ws)
    yf = swy / sw
    q = sum(w * (y - yf) ** 2 for w, (y, _) in zip(ws, pairs))
    k = len(pairs)
    dl = sw - sww / sw
    tau2 = max(0.0, (q - (k - 1)) / dl) if dl > 0 and k >= 2 else 0.0
    wr = [1.0 / (se * se + tau2) for _, se in pairs]
    swr = sum(wr)
    yr = sum(w * y for w, (y, _) in zip(wr, pairs)) / swr
    i2 = max(0.0, (q - (k - 1)) / q) if q > 0 else None
    return yf, math.sqrt(1 / sw), q, i2, tau2, yr, math.sqrt(1 / swr)


class TestMetaPool:
    def _df(self, spark, pairs, g="g1"):
        return spark.createDataFrame(
            [(g, float(y), float(se)) for y, se in pairs],
            "g string, y double, se double",
        )

    def test_matches_python_reference(self, spark):
        pairs = [(0.5, 0.1), (0.8, 0.2), (0.3, 0.15), (1.1, 0.4),
                 (0.6, 0.12)]
        row = meta_pool(self._df(spark, pairs), ["g"], "y", "se").collect()[0]
        yf, sef, q, i2, tau2, yr, ser = _meta_py(pairs)
        assert row["k"] == 5
        assert row["effect_fixed"] == pytest.approx(yf, rel=1e-9)
        assert row["se_fixed"] == pytest.approx(sef, rel=1e-9)
        assert row["q"] == pytest.approx(q, rel=1e-9)
        assert row["i2"] == pytest.approx(i2, rel=1e-9)
        assert row["tau2"] == pytest.approx(tau2, rel=1e-9)
        assert row["effect_random"] == pytest.approx(yr, rel=1e-9)
        assert row["se_random"] == pytest.approx(ser, rel=1e-9)

    def test_homogeneous_fixed_equals_random(self, spark):
        pairs = [(0.5, 0.1), (0.5, 0.2), (0.5, 0.3)]
        row = meta_pool(self._df(spark, pairs), ["g"], "y", "se").collect()[0]
        assert row["tau2"] == 0.0
        assert row["effect_random"] == pytest.approx(
            row["effect_fixed"], rel=1e-12
        )

    def test_heterogeneous_widens_se(self, spark):
        pairs = [(0.0, 0.05), (2.0, 0.05), (4.0, 0.05), (-1.0, 0.05)]
        row = meta_pool(self._df(spark, pairs), ["g"], "y", "se").collect()[0]
        assert row["i2"] > 0.9
        assert row["se_random"] > 3 * row["se_fixed"]

    def test_bad_se_refused(self, spark):
        with pytest.raises(ValueError, match="nonpositive"):
            meta_pool(self._df(spark, [(0.5, 0.0)]), ["g"], "y", "se")


def _km_ci_py(durs, evs, z=1.96):
    pts = {}
    for t, e in zip(durs, evs):
        d, c = pts.get(t, (0, 0))
        pts[t] = (d + e, c + (1 - e))
    at_risk = len(durs)
    out, s, g = {}, 1.0, 0.0
    for t in sorted(pts):
        d, c = pts[t]
        s *= (at_risk - d) / at_risk
        if g is not None and at_risk > d:
            g += d / (at_risk * (at_risk - d))
        elif d > 0:
            g = None
        se = s * math.sqrt(g) if g is not None else None
        out[t] = (s, se)
        at_risk -= d + c
    return out


class TestKmCi:
    def _df(self, spark, durs, evs, g="g1"):
        return spark.createDataFrame(
            [(g, int(t), int(e)) for t, e in zip(durs, evs)],
            "g string, t long, e int",
        )

    def test_matches_python_reference(self, spark):
        durs = [3, 5, 5, 8, 12, 15, 15, 20, 25, 30]
        evs = [1, 1, 0, 1, 0, 1, 1, 0, 1, 0]
        rows = kaplan_meier_ci(
            self._df(spark, durs, evs), ["g"], "t", "e"
        ).collect()
        ref = _km_ci_py(durs, evs)
        for r in rows:
            s, se = ref[r["t"]]
            assert r["survival"] == pytest.approx(s, rel=1e-12)
            assert r["se"] == pytest.approx(se, rel=1e-12)
            assert r["ci_lo"] == pytest.approx(
                max(0.0, s - 1.96 * se), rel=1e-9
            )
            assert r["ci_hi"] == pytest.approx(
                min(1.0, s + 1.96 * se), rel=1e-9
            )

    def test_exhausted_risk_set_null_se(self, spark):
        rows = kaplan_meier_ci(
            self._df(spark, [1, 2, 2], [1, 1, 1]), ["g"], "t", "e"
        ).collect()
        last = max(rows, key=lambda r: r["t"])
        assert last["survival"] == 0.0
        assert last["se"] is None and last["ci_lo"] is None

    def test_no_events_unit_band(self, spark):
        rows = kaplan_meier_ci(
            self._df(spark, [4, 9], [0, 0]), ["g"], "t", "e"
        ).collect()
        for r in rows:
            assert r["survival"] == 1.0
            assert r["se"] == 0.0
            assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0
