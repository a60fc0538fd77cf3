"""Moran's I (L253) and Nelson-Aalen cumulative hazard (L254)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.geo import morans_i
from lmss_entity_extractor_spark.ops.survival import nelson_aalen


def _moran_py(points, neighbors):
    """points: {id: value}; neighbors: set of unordered pairs."""
    n = len(points)
    mean = sum(points.values()) / n
    den = sum((v - mean) ** 2 for v in points.values())
    num = sum(
        (points[a] - mean) * (points[b] - mean) for a, b in neighbors
    )
    w = 2 * len(neighbors)
    return (n / w) * (2 * num) / den


class TestMoransI:
    def _df(self, spark, pts):
        # pts: list of (id, lat, lon, value); 1-degree cells
        return spark.createDataFrame(
            [(i, float(la), float(lo), float(v)) for i, la, lo, v in pts],
            "id int, lat double, lon double, v double",
        )

    def test_clustered_positive(self, spark):
        # two far-apart tight clusters with different values
        pts = [(i, 0.1 * i, 0.0, 10.0) for i in range(5)] + [
            (10 + i, 50.0 + 0.1 * i, 0.0, -10.0) for i in range(5)
        ]
        out = morans_i(self._df(spark, pts), "id", "lat", "lon", "v").collect()[0]
        assert out["i_moran"] > 0.5

    def test_matches_python_reference(self, spark):
        pts = [(0, 0.0, 0.0, 1.0), (1, 0.2, 0.0, 3.0), (2, 0.4, 0.0, 2.0),
               (3, 50.0, 0.0, 7.0), (4, 50.2, 0.0, 5.25)]
        # all of 0,1,2 mutually neighbors (same/adjacent 1-deg cells);
        # 3,4 mutually neighbors
        neighbors = {(0, 1), (0, 2), (1, 2), (3, 4)}
        out = morans_i(self._df(spark, pts), "id", "lat", "lon", "v").collect()[0]
        vals = {0: 1.0, 1: 3.0, 2: 2.0, 3: 7.0, 4: 5.25}
        assert out["n_pairs"] == len(neighbors)
        assert out["i_moran"] == pytest.approx(
            _moran_py(vals, neighbors), rel=1e-9
        )
        assert out["e_i"] == -1.0 / 4.0

    def test_constant_values_null(self, spark):
        pts = [(i, 0.1 * i, 0.0, 5.0) for i in range(4)]
        out = morans_i(self._df(spark, pts), "id", "lat", "lon", "v").collect()[0]
        assert out["i_moran"] is None

    def test_no_neighbors_null(self, spark):
        pts = [(0, 0.0, 0.0, 1.0), (1, 60.0, 0.0, 2.0)]
        out = morans_i(self._df(spark, pts), "id", "lat", "lon", "v").collect()[0]
        assert out["i_moran"] is None and out["n_pairs"] == 0

    def test_duplicate_id_refused(self, spark):
        pts = [(0, 0.0, 0.0, 1.0), (0, 0.1, 0.0, 2.0)]
        with pytest.raises(ValueError, match="duplicate"):
            morans_i(self._df(spark, pts), "id", "lat", "lon", "v")


def _na_py(obs):
    """obs: list of (t, event). Returns {t: (cumhaz, var)}."""
    from collections import Counter

    d = Counter(t for t, e in obs if e)
    c = Counter(t for t, e in obs if not e)
    ts = sorted(set(d) | set(c))
    n = len(obs)
    out = {}
    h = v = 0.0
    at_risk = n
    for t in ts:
        dt, ct = d[t], c[t]
        h += dt / at_risk
        v += dt / (at_risk * at_risk)
        out[t] = (at_risk, h, v)
        at_risk -= dt + ct
    return out


class TestNelsonAalen:
    def _df(self, spark, obs, g="c1"):
        return spark.createDataFrame(
            [(g, int(t), int(e)) for t, e in obs],
            "cohort string, dur int, event int",
        )

    def test_matches_python_reference(self, spark):
        obs = [(1, 1), (2, 1), (2, 0), (3, 1), (3, 1), (5, 0), (7, 1), (8, 0)]
        rows = nelson_aalen(
            self._df(spark, obs), ["cohort"], "dur", "event"
        ).collect()
        ref = _na_py(obs)
        for r in rows:
            n_risk, h, v = ref[r["t"]]
            assert r["n_risk"] == n_risk
            assert r["cumhaz"] == pytest.approx(h, rel=1e-12)
            assert r["var_cumhaz"] == pytest.approx(v, rel=1e-12)

    def test_monotone_nondecreasing(self, spark):
        obs = [(t, 1) for t in (1, 2, 3, 4, 5)] + [(6, 0)]
        rows = sorted(
            nelson_aalen(
                self._df(spark, obs), ["cohort"], "dur", "event"
            ).collect(),
            key=lambda r: r["t"],
        )
        hz = [r["cumhaz"] for r in rows]
        assert hz == sorted(hz)

    def test_all_censored_zero_hazard(self, spark):
        obs = [(1, 0), (2, 0), (3, 0)]
        rows = nelson_aalen(
            self._df(spark, obs), ["cohort"], "dur", "event"
        ).collect()
        assert all(r["cumhaz"] == 0.0 for r in rows)

    def test_max_points_refused(self, spark):
        obs = [(t, 1) for t in range(30)]
        with pytest.raises(ValueError, match="max_points"):
            nelson_aalen(
                self._df(spark, obs), ["cohort"], "dur", "event",
                max_points=10,
            )
