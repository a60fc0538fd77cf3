"""Generic salted skew join (L102) — plain-join equality under salting."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.skewjoin import salted_join


def _rows(df):
    cols = sorted(df.columns)
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


@pytest.fixture(scope="module")
def sides(spark):
    # skewed probe: key 1 carries 50 of 56 rows; dup rows; a null key
    left = spark.createDataFrame(
        [(1, f"l{i % 3}") for i in range(50)]
        + [(2, "x"), (2, "x"), (3, "y"), (4, "z"), (None, "n"), (9, "m")],
        "k int, lval string",
    ).repartition(5)
    right = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "C"), (3, "D"), (None, "N"), (7, "E")],
        "k int, rval string",
    )
    return left, right


class TestSaltedJoin:
    @pytest.mark.parametrize("how", ["inner", "left"])
    @pytest.mark.parametrize("salt", [1, 4, 13])
    def test_equals_plain_join(self, spark, sides, how, salt):
        left, right = sides
        plain = left.join(right, "k", how)
        assert _rows(salted_join(left, right, "k", how, salt)) == _rows(plain)

    def test_multiplicities_preserved(self, spark, sides):
        left, right = sides
        out = salted_join(left, right, "k", "inner", salt=8)
        # key 1: 50 left rows x 2 right rows = 100; key 2: 2 x 1 = 2
        got = {r["k"]: r["n"] for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()}
        assert got == {1: 100, 2: 2, 3: 1}

    def test_join_runs_on_salted_key(self, sides):
        left, right = sides
        plan = salted_join(left, right, "k", salt=8)._jdf.queryExecution().toString()
        assert "__skewjoin_salt" in plan  # key is (k, salt), not k alone

    def test_validation(self, spark, sides):
        left, right = sides
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, right, "k", "full")
        with pytest.raises(ValueError, match="salt must be"):
            salted_join(left, right, "k", salt=0)
        with pytest.raises(ValueError, match="must exist"):
            salted_join(left, right, "missing")
        with pytest.raises(ValueError, match="reserved"):
            salted_join(left.withColumn("__skewjoin_salt", F.lit(1)), right, "k")
