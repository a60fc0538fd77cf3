"""Temperature grid (L427) and Spiegelhalter's Z (L428)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.calibration import (
    spiegelhalter_z,
    temperature_grid,
)


class TestTemperatureGrid:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "p double, y int")

    def test_overconfident_prefers_softening(self, spark):
        rows = []
        for i in range(40):
            rows.append((0.9 if i % 2 == 0 else 0.1, 1 if i % 4 == 0 else 0))
        out = {
            r["temperature"]: r
            for r in temperature_grid(
                self._df(spark, rows), "p", "y", ["0.5", "1", "2", "4"]
            ).collect()
        }
        assert out["2"]["is_best"] is True
        assert sum(1 for r in out.values() if r["is_best"]) == 1
        assert out["0.5"]["nll"] > out["1"]["nll"] > out["2"]["nll"]

    def test_python_reference_nll(self, spark):
        rows = [(0.7, 1), (0.3, 0), (0.6, 1), (0.8, 0)]
        out = {
            r["temperature"]: r["nll"]
            for r in temperature_grid(
                self._df(spark, rows), "p", "y", ["1", "2"]
            ).collect()
        }
        q = lambda x: math.floor(x * 1e9 + 0.5)  # noqa: E731
        for t in (1.0, 2.0):
            s = 0
            for p, y in rows:
                z = math.log(p / (1 - p)) / t
                pt = 1.0 / (1.0 + math.exp(-z))
                s += q(y * math.log(pt) + (1 - y) * math.log(1 - pt))
            assert out[str(int(t))] == pytest.approx(-s / 1e9, abs=1e-9)

    def test_tie_breaks_to_smallest(self, spark):
        # symmetric design: T and 1/T... easier: duplicate temperature
        # values are refused, so craft an exact tie via y=p symmetry
        rows = [(0.5, 1), (0.5, 0)]
        out = {
            r["temperature"]: r["is_best"]
            for r in temperature_grid(
                self._df(spark, rows), "p", "y", ["1", "3", "2"]
            ).collect()
        }
        # p=0.5 -> logit 0 -> identical NLL at every T -> smallest wins
        assert out == {"1": True, "2": False, "3": False}

    def test_saturated_refused(self, spark):
        with pytest.raises(ValueError, match="saturated"):
            temperature_grid(
                self._df(spark, [(1.0, 1)]), "p", "y", ["1"]
            )

    def test_bad_grid_refused(self, spark):
        df = self._df(spark, [(0.5, 1)])
        with pytest.raises(ValueError, match="non-empty"):
            temperature_grid(df, "p", "y", [])
        with pytest.raises(ValueError, match="duplicate"):
            temperature_grid(df, "p", "y", ["1", "1.0"])
        with pytest.raises(ValueError, match="> 0"):
            temperature_grid(df, "p", "y", ["-1"])


class TestSpiegelhalterZ:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "p double, y int")
        return spiegelhalter_z(df, "p", "y", **kw).collect()[0]

    def test_python_reference(self, spark):
        rows = [(0.8, 1), (0.8, 0), (0.3, 0), (0.3, 1), (0.6, 1), (0.9, 1)]
        r = self._run(spark, rows)
        num = sum((y - p) * (1 - 2 * p) for p, y in rows)
        den = sum(((1 - 2 * p) ** 2) * p * (1 - p) for p, y in rows)
        assert r["z"] == pytest.approx(num / math.sqrt(den), rel=1e-9)

    def test_perfectly_calibrated_small_z(self, spark):
        # exact expected outcomes at each p level
        rows = (
            [(0.25, 1)] * 1 + [(0.25, 0)] * 3
            + [(0.75, 1)] * 3 + [(0.75, 0)] * 1
        )
        r = self._run(spark, rows)
        assert abs(r["z"]) < 1e-9

    def test_degenerate_denominator_null(self, spark):
        # p = 0.5 exactly makes every (1-2p) term zero
        r = self._run(spark, [(0.5, 1), (0.5, 0)])
        assert r["z"] is None

    def test_out_of_range_refused(self, spark):
        with pytest.raises(ValueError, match="outside"):
            self._run(spark, [(1.5, 1)])
