"""Distributed skyline / Pareto frontier (L130)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.skyline import skyline


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        ("a", 1.0, 9.0),
        ("b", 5.0, 5.0),
        ("c", 9.0, 1.0),
        ("d", 4.0, 4.0),   # dominated by b
        ("e", 9.0, 1.0),   # duplicate of c: ties survive together
        ("f", 0.0, 0.0),   # dominated by everything
    ]
    return spark.createDataFrame(rows, "id string, x double, y double").repartition(4)


def _naive_skyline(rows, maximize=True):
    sign = 1 if maximize else -1
    out = []
    for r in rows:
        dominated = any(
            all(sign * q[i] >= sign * r[i] for i in (1, 2))
            and any(sign * q[i] > sign * r[i] for i in (1, 2))
            for q in rows
        )
        if not dominated:
            out.append(r[0])
    return sorted(out)


class TestSkyline:
    def test_maximize(self, spark, points):
        got = sorted(r["id"] for r in skyline(points, ["x", "y"]).collect())
        assert got == ["a", "b", "c", "e"]

    def test_minimize(self, spark, points):
        got = sorted(r["id"] for r in skyline(points, ["x", "y"], maximize=False).collect())
        assert got == ["f"]

    def test_matches_naive_model(self, spark):
        import random

        rng = random.Random(7)
        rows = [(f"p{i}", float(rng.randint(0, 20)), float(rng.randint(0, 20)))
                for i in range(200)]
        df = spark.createDataFrame(rows, "id string, x double, y double").repartition(8)
        got = sorted(r["id"] for r in skyline(df, ["x", "y"]).collect())
        assert got == _naive_skyline(rows)

    def test_parallelism_invariant(self, spark, points):
        a = sorted(r["id"] for r in skyline(points.repartition(1), ["x", "y"]).collect())
        b = sorted(r["id"] for r in skyline(points.repartition(6), ["x", "y"]).collect())
        assert a == b

    def test_null_criteria_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, None), ("b", 1.0, 1.0)], "id string, x double, y double"
        )
        got = [r["id"] for r in skyline(df, ["x", "y"]).collect()]
        assert got == ["b"]

    def test_columns_pass_through(self, spark, points):
        assert skyline(points, ["x", "y"]).columns == ["id", "x", "y"]

    def test_merge_cap_is_loud(self, spark):
        # perfectly anti-correlated: every point is on the frontier
        rows = [(f"p{i}", float(i), float(100 - i)) for i in range(100)]
        df = spark.createDataFrame(rows, "id string, x double, y double")
        with pytest.raises(ValueError, match="merge_cap"):
            skyline(df, ["x", "y"], merge_cap=10)

    def test_validation(self, spark, points):
        with pytest.raises(ValueError, match="distinct columns"):
            skyline(points, ["x", "x"])
        with pytest.raises(ValueError, match="not in DataFrame"):
            skyline(points, ["x", "nope"])
