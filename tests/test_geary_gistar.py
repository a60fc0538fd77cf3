"""Geary's C (L369) and Getis-Ord Gi* hot spots (L370)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.geo import geary_c, getis_gi_star


def _geary_ref(pts, cell=1.0):
    """pts: list of (id, lat, lon, x); binary 3x3-grid-neighbor W."""
    def cells(p):
        return (math.floor(p[1] / cell), math.floor(p[2] / cell) % 360)

    pairs = []
    for i, a in enumerate(pts):
        for b in pts[i + 1:]:
            ca, cb = cells(a), cells(b)
            if abs(ca[0] - cb[0]) <= 1 and min(
                abs(ca[1] - cb[1]), 360 - abs(ca[1] - cb[1])
            ) <= 1:
                pairs.append((a, b))
    n = len(pts)
    xbar = sum(p[3] for p in pts) / n
    den = sum((p[3] - xbar) ** 2 for p in pts)
    sp = sum((a[3] - b[3]) ** 2 for a, b in pairs)
    w = 2 * len(pairs)
    return len(pairs), (n - 1) / (2 * w) * (2 * sp) / den


class TestGearyC:
    def _df(self, spark, pts):
        return spark.createDataFrame(
            pts, "id int, lat double, lon double, x double"
        )

    PTS = [
        (1, 0.5, 0.5, 10.0),
        (2, 0.5, 1.5, 12.0),
        (3, 1.5, 0.5, 11.0),
        (4, 10.5, 10.5, 50.0),
        (5, 10.5, 11.5, 48.0),
        (6, -20.5, 30.5, 30.0),
    ]

    def test_vs_python_reference(self, spark):
        out = geary_c(
            self._df(spark, self.PTS), "id", "lat", "lon", "x"
        ).collect()[0]
        n_pairs, c = _geary_ref(self.PTS)
        assert out["n"] == 6
        assert out["n_pairs"] == n_pairs
        assert out["c_geary"] == pytest.approx(c, rel=1e-9)
        assert out["e_c"] == 1.0

    def test_smooth_vs_rough(self, spark):
        # same locations, smooth values (neighbors similar) vs rough
        # (neighbors alternate): C_smooth < 1 < C_rough
        locs = [(i, r + 0.5, q + 0.5) for i, (r, q) in enumerate(
            [(r, q) for r in range(4) for q in range(4)]
        )]
        smooth = [(i, la, lo, float(la + lo)) for i, la, lo in locs]
        rough = [
            (i, la, lo, 100.0 * ((int(la) + int(lo)) % 2))
            for i, la, lo in locs
        ]
        cs = geary_c(self._df(spark, smooth), "id", "lat", "lon", "x").collect()[0]["c_geary"]
        cr = geary_c(self._df(spark, rough), "id", "lat", "lon", "x").collect()[0]["c_geary"]
        assert cs < 1.0 < cr

    def test_shift_invariance(self, spark):
        shifted = [(i, la, lo, x + 500.0) for i, la, lo, x in self.PTS]
        c0 = geary_c(self._df(spark, self.PTS), "id", "lat", "lon", "x").collect()[0]["c_geary"]
        c1 = geary_c(self._df(spark, shifted), "id", "lat", "lon", "x").collect()[0]["c_geary"]
        assert c1 == pytest.approx(c0, rel=1e-9)

    def test_constant_and_dup_refusal(self, spark):
        const = [(i, la, lo, 7.0) for i, la, lo, _ in self.PTS]
        out = geary_c(self._df(spark, const), "id", "lat", "lon", "x").collect()[0]
        assert out["c_geary"] is None
        with pytest.raises(ValueError, match="duplicate"):
            geary_c(
                self._df(spark, self.PTS + [self.PTS[0]]),
                "id", "lat", "lon", "x",
            )


def _gi_ref(cells_xy):
    """cells_xy: dict (cx, cy) -> x. Returns dict cell -> gi*."""
    n = len(cells_xy)
    xs = list(cells_xy.values())
    xbar = sum(xs) / n
    s = math.sqrt(sum(x * x for x in xs) / n - xbar * xbar)
    out = {}
    for (cx, cy), _ in cells_xy.items():
        nb = [
            v
            for (ox, oy), v in cells_xy.items()
            if abs(ox - cx) <= 1
            and min(abs(oy - cy), 360 - abs(oy - cy)) <= 1
        ]
        wi = len(nb)
        if wi >= n or s == 0 or n < 2:
            out[(cx, cy)] = None
            continue
        out[(cx, cy)] = (sum(nb) - xbar * wi) / (
            s * math.sqrt((n * wi - wi * wi) / (n - 1))
        )
    return out


class TestGiStar:
    def _df(self, spark, pts):
        return spark.createDataFrame(pts, "lat double, lon double, x double")

    def test_vs_python_reference(self, spark):
        # a hot 2x2 block in a cold field, one point per cell
        pts = []
        for r in range(5):
            for q in range(5):
                v = 100.0 if (r in (1, 2) and q in (1, 2)) else 1.0
                pts.append((r + 0.5, q + 0.5, v))
        cells_xy = {
            (int(la), int(lo)): x for la, lo, x in pts
        }
        out = {
            (r["cx"], r["cy"]): r["gi_star"]
            for r in getis_gi_star(
                self._df(spark, pts), "lat", "lon", "x"
            ).collect()
        }
        ref = _gi_ref(cells_xy)
        assert set(out) == set(ref)
        for k in ref:
            if ref[k] is None:
                assert out[k] is None
            else:
                assert out[k] == pytest.approx(ref[k], rel=1e-9)
        # the centre of the hot block is the hottest z
        assert out[(1, 1)] == max(v for v in out.values() if v is not None)

    def test_multiple_points_per_cell_sum(self, spark):
        pts = [(0.2, 0.2, 3.0), (0.8, 0.8, 4.0), (2.5, 2.5, 9.0),
               (5.5, 9.5, 1.0)]
        out = {
            (r["cx"], r["cy"]): float(r["x_cell"])
            for r in getis_gi_star(
                self._df(spark, pts), "lat", "lon", "x"
            ).collect()
        }
        assert out[(0, 0)] == 7.0 and out[(2, 2)] == 9.0

    def test_degenerate_null(self, spark):
        # two adjacent cells: every cell's neighborhood covers all
        # cells -> w_i == n -> NULL
        pts = [(0.5, 0.5, 1.0), (0.5, 1.5, 9.0)]
        out = getis_gi_star(self._df(spark, pts), "lat", "lon", "x").collect()
        assert all(r["gi_star"] is None for r in out)

    def test_bounds_refusal(self, spark):
        with pytest.raises(ValueError, match="bounds"):
            getis_gi_star(
                self._df(spark, [(95.0, 0.0, 1.0)]), "lat", "lon", "x"
            )
