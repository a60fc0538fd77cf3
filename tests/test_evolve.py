"""Schema-drift union / evolution (L119)."""

import pytest
from pyspark.sql.types import DoubleType, LongType

from lmss_entity_extractor_spark.ops.evolve import evolved_schema, union_evolved


class TestEvolvedSchema:
    def test_added_column_and_order(self, spark):
        a = spark.createDataFrame([(1, "x")], "k int, v string")
        b = spark.createDataFrame([(2, "y", 1.5)], "k int, v string, score double")
        got = evolved_schema([a, b])
        assert [n for n, _ in got] == ["k", "v", "score"]

    def test_integral_widening(self, spark):
        a = spark.createDataFrame([(1,)], "k int")
        b = spark.createDataFrame([(2,)], "k bigint")
        assert dict(evolved_schema([a, b]))["k"] == LongType()

    def test_mixed_promotes_to_double(self, spark):
        a = spark.createDataFrame([(1,)], "k bigint")
        b = spark.createDataFrame([(2.5,)], "k float")
        assert dict(evolved_schema([a, b]))["k"] == DoubleType()

    def test_conflict_is_loud(self, spark):
        a = spark.createDataFrame([(1,)], "k int")
        b = spark.createDataFrame([("x",)], "k string")
        with pytest.raises(ValueError, match="schema conflict on column 'k'"):
            evolved_schema([a, b])

    def test_empty_input(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            evolved_schema([])


class TestUnionEvolved:
    def test_missing_columns_are_typed_nulls(self, spark):
        a = spark.createDataFrame([(1, "x")], "k int, v string")
        b = spark.createDataFrame([(2, "y", 1.5)], "k int, v string, score double")
        out = union_evolved([a, b])
        rows = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
        assert rows == {1: ("x", None), 2: ("y", 1.5)}
        assert dict(out.dtypes)["score"] == "double"

    def test_widened_values_roundtrip(self, spark):
        a = spark.createDataFrame([(2147483648,)], "k bigint")
        b = spark.createDataFrame([(7,)], "k int")
        got = sorted(r["k"] for r in union_evolved([a, b]).collect())
        assert got == [7, 2147483648]

    def test_three_way_drift(self, spark):
        a = spark.createDataFrame([(1,)], "k int")
        b = spark.createDataFrame([(2, "b")], "k int, v string")
        c = spark.createDataFrame([(3.0, "c", True)], "k double, v string, f boolean")
        out = union_evolved([a, b, c])
        assert out.columns == ["k", "v", "f"]
        assert dict(out.dtypes)["k"] == "double"
        assert out.count() == 3

    def test_no_shuffle_plan(self, spark):
        a = spark.createDataFrame([(1,)], "k int")
        b = spark.createDataFrame([(2,)], "k bigint")
        plan = union_evolved([a, b])._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
