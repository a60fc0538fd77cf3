"""Grid-bucketed spatial neighbor pairs (L212)."""

import math


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2
    dl = math.radians(lon2 - lon1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * r * math.asin(math.sqrt(a))


class TestGridNeighborPairs:
    def _df(self, spark, pts):
        return spark.createDataFrame(
            [(i, float(la), float(lo)) for i, la, lo in pts],
            "id string, lat double, lon double",
        )

    def test_close_pair_found_distance_exact(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        pts = [("p1", 48.85, 2.35), ("p2", 48.86, 2.36), ("far", -33.9, 151.2)]
        rows = grid_neighbor_pairs(
            self._df(spark, pts), "id", "lat", "lon", cell_deg=1.0
        ).collect()
        got = {(r["a"], r["b"]): r["dist_km"] for r in rows}
        assert ("p1", "p2") in got
        assert abs(got[("p1", "p2")] - _hav(48.85, 2.35, 48.86, 2.36)) < 1e-9
        assert not any("far" in k for k in got)

    def test_adjacent_cell_pair_found_once(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        # straddles a cell boundary at lat=49
        pts = [("a", 48.99, 10.0), ("b", 49.01, 10.0)]
        rows = grid_neighbor_pairs(
            self._df(spark, pts), "id", "lat", "lon", cell_deg=1.0
        ).collect()
        assert len(rows) == 1
        assert rows[0]["a"] == "a" and rows[0]["b"] == "b"

    def test_distant_pair_not_emitted(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        pts = [("a", 10.5, 10.5), ("b", 13.5, 10.5)]  # 3 cells apart
        assert (
            grid_neighbor_pairs(
                self._df(spark, pts), "id", "lat", "lon", cell_deg=1.0
            ).count()
            == 0
        )

    def test_out_of_bounds_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        pts = [("a", 95.0, 0.0)]
        with pytest.raises(ValueError, match="bounds"):
            grid_neighbor_pairs(
                self._df(spark, pts), "id", "lat", "lon"
            )

    def test_antipodal_distance_sane(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        # same cell, near-antipodal longitudes is impossible; check a
        # known city pair instead (Paris-London ~343.5 km, cell 10)
        pts = [("paris", 48.8566, 2.3522), ("london", 51.5074, -0.1278)]
        r = grid_neighbor_pairs(
            self._df(spark, pts), "id", "lat", "lon", cell_deg=10.0
        ).collect()[0]
        assert abs(r["dist_km"] - _hav(48.8566, 2.3522, 51.5074, -0.1278)) < 1e-9
        assert 340 < r["dist_km"] < 347


class TestAntimeridianWrap:
    def _df(self, spark, pts):
        return spark.createDataFrame(
            [(i, float(la), float(lo)) for i, la, lo in pts],
            "id string, lat double, lon double",
        )

    def test_pair_across_the_seam_found(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        pts = [("w", 0.0, 179.95), ("e", 0.0, -179.95)]
        rows = grid_neighbor_pairs(
            self._df(spark, pts), "id", "lat", "lon", cell_deg=1.0
        ).collect()
        assert len(rows) == 1
        assert rows[0]["dist_km"] < 15  # ~11 km apart

    def test_same_location_both_encodings(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        pts = [("a", 10.0, 180.0), ("b", 10.0, -180.0)]
        rows = grid_neighbor_pairs(
            self._df(spark, pts), "id", "lat", "lon", cell_deg=1.0
        ).collect()
        assert len(rows) == 1
        assert abs(rows[0]["dist_km"]) < 1e-6

    def test_non_tiling_cell_no_wrap(self, spark):
        from lmss_entity_extractor_spark.ops.geo import grid_neighbor_pairs

        # 7 degrees does not tile 360: the seam hole is the documented
        # recall limit, but nothing crashes and normal pairs still work
        pts = [("w", 0.0, 179.95), ("e", 0.0, -179.95), ("c", 0.0, 0.0),
               ("d", 0.0, 0.5)]
        got = {
            (r["a"], r["b"])
            for r in grid_neighbor_pairs(
                self._df(spark, pts), "id", "lat", "lon", cell_deg=7.0
            ).collect()
        }
        assert ("c", "d") in got
        assert ("e", "w") not in got
