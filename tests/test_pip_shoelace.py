"""Point-in-polygon (L435) and polygon metrics (L436)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.geo import (
    point_in_polygon,
    polygon_metrics,
)

SQUARE = {"name": "sq", "vertices": [(0, 0), (4, 0), (4, 4), (0, 4)]}
TRI = {"name": "tri", "vertices": [(10, 0), (14, 0), (12, 4)]}


class TestPointInPolygon:
    def _run(self, spark, pts, polys):
        df = spark.createDataFrame(pts, "x double, y double")
        return {
            (r["x"], r["y"]): (r["polygon"], r["on_boundary"])
            for r in point_in_polygon(df, polys, "x", "y").collect()
        }

    def test_inside_outside_boundary(self, spark):
        out = self._run(
            spark,
            [(2.0, 2.0), (5.0, 5.0), (4.0, 2.0), (0.0, 0.0), (12.0, 1.0)],
            [SQUARE, TRI],
        )
        assert out[(2.0, 2.0)] == ("sq", False)
        assert out[(5.0, 5.0)] == (None, None)
        assert out[(4.0, 2.0)] == ("sq", True)    # edge
        assert out[(0.0, 0.0)] == ("sq", True)    # vertex
        assert out[(12.0, 1.0)] == ("tri", False)

    def test_precedence_first_polygon_wins(self, spark):
        a = {"name": "a", "vertices": [(0, 0), (10, 0), (10, 10), (0, 10)]}
        b = {"name": "b", "vertices": [(5, 5), (15, 5), (15, 15), (5, 15)]}
        out = self._run(spark, [(7.0, 7.0)], [a, b])
        assert out[(7.0, 7.0)][0] == "a"

    def test_concave_polygon(self, spark):
        # U-shape: the notch (2, 3) is OUTSIDE
        u = {
            "name": "u",
            "vertices": [
                (0, 0), (4, 0), (4, 4), (3, 4), (3, 1), (1, 1),
                (1, 4), (0, 4),
            ],
        }
        out = self._run(spark, [(2.0, 3.0), (0.5, 3.0)], [u])
        assert out[(2.0, 3.0)] == (None, None)
        assert out[(0.5, 3.0)] == ("u", False)

    def test_bad_polygons_refused(self, spark):
        df = spark.createDataFrame([(0.0, 0.0)], "x double, y double")
        with pytest.raises(ValueError, match="1..64"):
            point_in_polygon(df, [], "x", "y")
        with pytest.raises(ValueError, match="3..64"):
            point_in_polygon(
                df, [{"name": "l", "vertices": [(0, 0), (1, 1)]}],
                "x", "y",
            )


class TestPolygonMetrics:
    def _run(self, spark, verts):
        df = spark.createDataFrame(
            [("g", i, float(x), float(y)) for i, (x, y) in enumerate(verts)],
            "k string, o int, x double, y double",
        )
        return polygon_metrics(df, ["k"], "o", "x", "y").collect()[0]

    def test_square(self, spark):
        r = self._run(spark, [(0, 0), (4, 0), (4, 4), (0, 4)])
        assert r["area"] == pytest.approx(16.0)
        assert r["area2"] == pytest.approx(32.0)   # CCW positive
        assert (r["cx"], r["cy"]) == (pytest.approx(2.0), pytest.approx(2.0))
        assert r["perimeter"] == pytest.approx(16.0)

    def test_clockwise_negative_signed_area(self, spark):
        r = self._run(spark, [(0, 0), (0, 4), (4, 4), (4, 0)])
        assert r["area2"] == pytest.approx(-32.0)
        assert r["area"] == pytest.approx(16.0)

    def test_triangle(self, spark):
        r = self._run(spark, [(0, 0), (6, 0), (0, 6)])
        assert r["area"] == pytest.approx(18.0)
        assert r["cx"] == pytest.approx(2.0)
        assert r["perimeter"] == pytest.approx(12 + math.sqrt(72))

    def test_degenerate_ring(self, spark):
        r = self._run(spark, [(0, 0), (2, 2), (4, 4)])   # collinear
        assert r["area"] == pytest.approx(0.0)
        assert r["cx"] is None and r["cy"] is None

    def test_too_few_vertices_null(self, spark):
        r = self._run(spark, [(0, 0), (1, 1)])
        assert r["area"] is None and r["perimeter"] is None

    def test_duplicate_order_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 0.0, 0.0), ("g", 0, 1.0, 1.0), ("g", 1, 2.0, 0.0)],
            "k string, o int, x double, y double",
        )
        with pytest.raises(ValueError, match="duplicate"):
            polygon_metrics(df, ["k"], "o", "x", "y")
