"""Feature scaling (L143): standardize / min-max / winsorize."""

import math

import pytest

from lmss_entity_extractor_spark.ops.scaling import (
    minmax_scale,
    standardize,
    winsorize,
)


class TestStandardize:
    def test_matches_python_reference(self, spark):
        xs = [1.0, 2.0, 3.5, 4.25, 10.0]
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        got = sorted(r["z_x"] for r in standardize(df, ["x"]).collect())
        n = len(xs)
        m = sum(xs) / n
        sd = math.sqrt(sum((v - m) ** 2 for v in xs) / (n - 1))
        want = sorted((v - m) / sd for v in xs)
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-12)

    def test_zero_variance_null(self, spark):
        df = spark.createDataFrame([(2.0,), (2.0,), (2.0,)], "x double")
        assert all(r["z_x"] is None for r in standardize(df, ["x"]).collect())

    def test_null_passthrough(self, spark):
        df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
        out = {r["x"]: r["z_x"] for r in standardize(df, ["x"]).collect()}
        assert out[None] is None and out[1.0] is not None

    def test_parallelism_invariance_bitwise(self, spark):
        rows = [(0.25 * ((i * 7) % 40),) for i in range(100)]
        df = spark.createDataFrame(rows, "x double")
        a = sorted(r["z_x"] for r in standardize(df, ["x"]).collect())
        b = sorted(r["z_x"] for r in standardize(df.repartition(13), ["x"]).collect())
        assert a == b


class TestMinMax:
    def test_unit_interval(self, spark):
        df = spark.createDataFrame([(10.0,), (15.0,), (20.0,)], "x double")
        out = sorted(r["mm_x"] for r in minmax_scale(df, ["x"]).collect())
        assert out == [0.0, 0.5, 1.0]

    def test_constant_null(self, spark):
        df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
        assert all(r["mm_x"] is None for r in minmax_scale(df, ["x"]).collect())


class TestWinsorize:
    def test_clamps_to_discrete_bounds(self, spark):
        xs = [float(v) for v in range(1, 101)]
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        out = winsorize(df, ["x"], lo=0.05, hi=0.95).collect()
        ws = sorted(r["w_x"] for r in out)
        assert ws[0] == 5.0 and ws[-1] == 95.0  # discrete order stats
        assert all(w in xs for w in ws)  # never interpolated
        # interior values untouched
        mid = {r["x"]: r["w_x"] for r in out}
        assert mid[50.0] == 50.0

    def test_bad_bounds_raise(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="lo < hi"):
            winsorize(df, ["x"], lo=0.9, hi=0.1)

    def test_multiple_columns(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(100 - i)) for i in range(1, 21)],
            "a double, b double",
        )
        out = winsorize(df, ["a", "b"], lo=0.1, hi=0.9).collect()
        assert {c for c in out[0].asDict()} == {"a", "b", "w_a", "w_b"}
