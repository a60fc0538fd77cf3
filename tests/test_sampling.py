"""Deterministic weighted sampling (L115)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.sampling import weighted_sample


@pytest.fixture(scope="module")
def pop(spark):
    # 4000 keys, two strata: even keys weight 9, odd keys weight 1
    return spark.range(0, 4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("w"),
        (F.col("id") % 4).alias("g"),
    )


class TestWeightedSample:
    def test_exact_k_and_passthrough(self, spark, pop):
        out = weighted_sample(pop, "k", "w", 100)
        assert out.count() == 100
        assert out.columns == ["k", "w", "g"]

    def test_weights_bias_inclusion(self, spark, pop):
        rows = weighted_sample(pop, "k", "w", 400).collect()
        heavy = sum(1 for r in rows if r["w"] == 9.0)
        # expected heavy share ~0.9 for k << n; allow wide slack (fixed
        # hash = one realization, not an average)
        assert heavy / len(rows) > 0.75

    def test_grouped_k_per_group(self, spark, pop):
        out = weighted_sample(pop, "k", "w", 7, group_cols=["g"])
        per = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert per == {0: 7, 1: 7, 2: 7, 3: 7}

    def test_deterministic_across_parallelism(self, spark, pop):
        a = {r["k"] for r in weighted_sample(pop.repartition(1), "k", "w", 50).collect()}
        b = {r["k"] for r in weighted_sample(pop.repartition(16), "k", "w", 50).collect()}
        assert a == b

    def test_priorities_append_stable(self, spark, pop):
        # selection is a pure function of the key set: the same keys
        # selected from a superset population iff their priorities stay
        # in the global top-k — and each key's priority never moves
        small = weighted_sample(pop.filter(F.col("k") < 2000), "k", "w", 30)
        big = weighted_sample(pop, "k", "w", 30)
        small_keys = {r["k"] for r in small.collect()}
        big_keys = {r["k"] for r in big.collect()}
        # keys in the big sample that belong to the small population
        # must be exactly the top of the small sample's ranking: subset
        assert (big_keys & set(range(2000))) <= small_keys

    def test_loud_on_bad_weight(self, spark):
        df = spark.createDataFrame([(1, 2.0), (2, 0.0)], "k int, w double")
        with pytest.raises(Exception, match="non-positive or NULL weight"):
            weighted_sample(df, "k", "w", 1).collect()

    def test_global_plan_is_take_ordered(self, spark, pop):
        plan = (
            weighted_sample(pop, "k", "w", 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan  # never a full sort

    def test_validation(self, spark, pop):
        with pytest.raises(ValueError, match="k must be"):
            weighted_sample(pop, "k", "w", 0)
        with pytest.raises(ValueError, match="not in DataFrame"):
            weighted_sample(pop, "k", "nope", 5)
