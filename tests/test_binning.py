"""Equi-depth binning (L124)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.binning import (
    apply_bins,
    bin_expr,
    fit_equidepth_bins,
)


@pytest.fixture(scope="module")
def values(spark):
    return spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")


class TestFit:
    def test_quartile_boundaries(self, spark, values):
        assert fit_equidepth_bins(values, "v", 4) == [25.0, 50.0, 75.0]

    def test_duplicate_mass_collapses(self, spark):
        df = spark.createDataFrame([(1.0,)] * 90 + [(2.0,)] * 10, "v double")
        assert fit_equidepth_bins(df, "v", 4) == [1.0]

    def test_nulls_ignored_in_fit(self, spark):
        df = spark.createDataFrame(
            [(None,), (1.0,), (2.0,), (3.0,), (4.0,)], "v double"
        )
        assert fit_equidepth_bins(df, "v", 2) == [2.0]

    def test_approx_close_to_exact(self, spark, values):
        ap = fit_equidepth_bins(values, "v", 4, accuracy="approx")
        assert len(ap) == 3 and all(
            abs(a - e) <= 1.0 for a, e in zip(ap, [25.0, 50.0, 75.0])
        )

    def test_validation(self, spark, values):
        with pytest.raises(ValueError, match="n_bins"):
            fit_equidepth_bins(values, "v", 1)
        with pytest.raises(ValueError, match="accuracy"):
            fit_equidepth_bins(values, "v", 4, accuracy="fast")
        empty = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError, match="no non-null"):
            fit_equidepth_bins(empty, "v", 2)


class TestApply:
    def test_right_inclusive_assignment(self, spark, values):
        out = apply_bins(values, "v", [25.0, 50.0, 75.0])
        got = {r["v"]: r["bucket"] for r in out.collect()}
        assert got[25.0] == 0 and got[25.5 if 25.5 in got else 26.0] == 1
        assert got[1.0] == 0 and got[50.0] == 1 and got[51.0] == 2
        assert got[75.0] == 2 and got[76.0] == 3 and got[100.0] == 3

    def test_balanced_buckets_on_fit_data(self, spark, values):
        bounds = fit_equidepth_bins(values, "v", 4)
        counts = (
            apply_bins(values, "v", bounds)
            .groupBy("bucket").count().orderBy("bucket").collect()
        )
        assert [r["count"] for r in counts] == [25, 25, 25, 25]

    def test_applies_to_unseen_data(self, spark):
        new = spark.createDataFrame([(-5.0,), (1000.0,), (None,)], "v double")
        got = [r["bucket"] for r in apply_bins(new, "v", [25.0, 50.0]).collect()]
        assert got == [0, 2, None]

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="strictly ascending"):
            bin_expr(F.col("v"), [2.0, 1.0])
        with pytest.raises(ValueError, match="non-empty"):
            bin_expr(F.col("v"), [])
