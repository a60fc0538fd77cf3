"""Bloom-filter join pruning (L110)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_probe,
    bloom_semi_join,
    expected_fp_rate,
)


@pytest.fixture(scope="module")
def sides(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("fk"), (F.col("id") * 3 % 97).alias("payload")
    ).repartition(4)
    dim = spark.range(0, 5000).filter(F.col("id") % 25 == 0).select(
        F.col("id").alias("dk")
    ).repartition(3)
    return fact, dim


class TestBloomBuild:
    def test_no_false_negatives(self, spark, sides):
        fact, dim = sides
        words = bloom_build(dim, "dk")
        kept = {r["fk"] for r in bloom_probe(fact, "fk", words).collect()}
        true_keys = {r["dk"] for r in dim.collect()}
        assert true_keys <= kept  # every real key survives the probe

    def test_fp_rate_within_bound(self, spark, sides):
        fact, dim = sides
        num_bits = 1 << 14
        words = bloom_build(dim, "dk", num_bits=num_bits)
        kept = bloom_probe(fact, "fk", words).count()
        true = dim.count()
        n_fact = fact.count()
        fp_observed = (kept - true) / (n_fact - true)
        # generous 5x slack over the textbook bound: this is a sanity
        # check on the hashing, not a statistical assertion
        assert fp_observed <= 5 * expected_fp_rate(true, num_bits) + 0.01

    def test_null_keys_dropped_and_test_false(self, spark):
        dim = spark.createDataFrame([(1,), (None,)], "dk int")
        words = bloom_build(dim, "dk")
        fact = spark.createDataFrame([(1,), (None,)], "fk int")
        got = [r["fk"] for r in bloom_probe(fact, "fk", words).collect()]
        assert got == [1]  # NULL never probes true

    def test_validation(self, spark, sides):
        _, dim = sides
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(dim, "dk", num_bits=100)
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_build(dim, "dk", num_hashes=0)
        with pytest.raises(ValueError, match="not in dim"):
            bloom_build(dim, "nope")
        with pytest.raises(ValueError, match="wrong tool"):
            bloom_build(dim, "dk", num_bits=1 << 31)


class TestBloomSemiJoin:
    def test_equals_plain_semi_join(self, spark, sides):
        fact, dim = sides
        got = bloom_semi_join(fact, dim, "fk", "dk")
        want = fact.join(
            dim.select(F.col("dk").alias("fk")).distinct(), on="fk", how="left_semi"
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_string_keys(self, spark):
        fact = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3), (None, 4)], "k string, v int"
        )
        dim = spark.createDataFrame([("b",), ("c",), ("zz",)], "k string")
        got = sorted(r["v"] for r in bloom_semi_join(fact, dim, "k", "k").collect())
        assert got == [2, 3]

    def test_probe_is_scan_side_no_shuffle(self, spark, sides):
        _, dim = sides
        words = bloom_build(dim, "dk")
        # plain scan (no repartition) so any Exchange must come from the probe
        fact = spark.range(0, 1000).select(F.col("id").alias("fk"))
        plan = bloom_probe(fact, "fk", words)._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan
        assert "Exchange" not in plan  # the probe filter alone never shuffles
