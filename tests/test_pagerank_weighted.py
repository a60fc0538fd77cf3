"""Weighted PageRank (L129)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.pagerank import pagerank, pagerank_weighted


def _e(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


class TestWeightedPagerank:
    def test_uniform_weights_equal_unweighted(self, spark):
        rows = [("a", "b", 3.0), ("a", "c", 3.0), ("b", "c", 3.0), ("c", "a", 3.0)]
        w = {r["node"]: r["rank"] for r in pagerank_weighted(_e(spark, rows), 8).collect()}
        u = {
            r["node"]: r["rank"]
            for r in pagerank(_e(spark, rows).drop("weight"), 8).collect()
        }
        for k in u:
            assert w[k] == pytest.approx(u[k], rel=1e-12)

    def test_weight_shifts_rank(self, spark):
        # a sends 9x more mass to b than to c
        rows = [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)]
        got = {r["node"]: r["rank"] for r in pagerank_weighted(_e(spark, rows), 10).collect()}
        assert got["b"] > got["c"]

    def test_mass_conserved_without_dangling(self, spark):
        rows = [("a", "b", 2.0), ("b", "c", 5.0), ("c", "a", 1.0)]
        total = (
            pagerank_weighted(_e(spark, rows), 10)
            .agg(F.sum("rank")).collect()[0][0]
        )
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_bad_weights_refused(self, spark):
        with pytest.raises(ValueError, match="non-positive/NULL weights"):
            pagerank_weighted(_e(spark, [("a", "b", 0.0)]), 3)
        with pytest.raises(ValueError, match="non-positive/NULL weights"):
            pagerank_weighted(_e(spark, [("a", "b", None)]), 3)
