"""Distribution-drift detection / PSI (L131)."""

import math

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.drift import psi_drift


class TestPsi:
    def test_identical_distributions_stable(self, spark):
        ref = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
        out = psi_drift(ref, ref, "v", n_bins=5).collect()
        assert all(r["verdict"] == "stable" for r in out)
        assert out[0]["psi_total"] == pytest.approx(0.0, abs=1e-3)

    def test_shift_detected(self, spark):
        ref = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
        cur = spark.range(0, 1000).select(
            ((F.col("id") % 100) + 80).cast("double").alias("v")
        )
        out = psi_drift(ref, cur, "v", n_bins=5).collect()
        assert out[0]["psi_total"] > 0.25
        assert out[0]["verdict"] == "major_shift"

    def test_categorical(self, spark):
        ref = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "v string")
        cur = spark.createDataFrame([("a",)] * 90 + [("b",)] * 10, "v string")
        out = {r["bucket"]: r for r in psi_drift(ref, cur, "v", categorical=True).collect()}
        # hand PSI: (0.9-0.5)ln(0.9/0.5) + (0.1-0.5)ln(0.1/0.5)
        want = (0.9 - 0.5) * math.log(0.9 / 0.5) + (0.1 - 0.5) * math.log(0.1 / 0.5)
        assert out["a"]["psi_total"] == pytest.approx(want, abs=1e-3)
        assert out["a"]["verdict"] == "major_shift"

    def test_new_category_floored_not_infinite(self, spark):
        ref = spark.createDataFrame([("a",)] * 10, "v string")
        cur = spark.createDataFrame([("a",)] * 5 + [("z",)] * 5, "v string")
        out = {r["bucket"]: r for r in psi_drift(ref, cur, "v", categorical=True).collect()}
        assert math.isfinite(out["z"]["term"]) and out["z"]["term"] > 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="both tables"):
            psi_drift(df, df.withColumnRenamed("v", "w"), "v")
        with pytest.raises(ValueError, match="epsilon"):
            psi_drift(df, df, "v", epsilon=0.5)
