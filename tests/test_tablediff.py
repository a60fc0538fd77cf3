"""Keyed table diff / reconciliation (L108)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.tablediff import table_diff


@pytest.fixture()
def snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    ).repartition(2)
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, "d", 40), (5, "e", 50)],
        "k int, s string, v int",
    ).repartition(3)
    return old, new


class TestTableDiff:
    def test_classification(self, spark, snapshots):
        old, new = snapshots
        got = {r["k"]: (r["diff_kind"], r["changed_cols"]) for r in table_diff(old, new, ["k"]).collect()}
        assert got == {
            1: ("removed", []),
            3: ("changed", ["s"]),
            4: ("changed", ["s"]),  # NULL -> 'd' is a change (null-safe)
            5: ("added", []),
        }

    def test_include_unchanged_and_sides(self, spark, snapshots):
        old, new = snapshots
        out = table_diff(old, new, ["k"], include_unchanged=True)
        rows = {r["k"]: r for r in out.collect()}
        assert rows[2]["diff_kind"] == "unchanged"
        assert rows[3]["left_s"] == "c" and rows[3]["right_s"] == "C"
        assert rows[1]["right_s"] is None and rows[1]["left_s"] == "a"

    def test_multi_column_changes_sorted(self, spark):
        old = spark.createDataFrame([(1, "a", 10)], "k int, s string, v int")
        new = spark.createDataFrame([(1, "z", 99)], "k int, s string, v int")
        r = table_diff(old, new, ["k"]).first()
        assert r["changed_cols"] == ["s", "v"]

    def test_compare_subset(self, spark, snapshots):
        old, new = snapshots
        out = table_diff(old, new, ["k"], compare_cols=["v"])
        got = {r["k"]: r["diff_kind"] for r in out.collect()}
        assert got == {1: "removed", 5: "added"}  # s ignored, v equal everywhere

    def test_identical_tables_diff_empty(self, spark, snapshots):
        old, _ = snapshots
        assert table_diff(old, old, ["k"]).count() == 0

    def test_validation(self, spark, snapshots):
        old, new = snapshots
        with pytest.raises(ValueError, match="non-empty"):
            table_diff(old, new, [])
        with pytest.raises(ValueError, match="both sides"):
            table_diff(old, new.drop("s"), ["k"], compare_cols=["s"])
        with pytest.raises(ValueError, match="both sides"):
            table_diff(old.withColumnRenamed("k", "kk"), new, ["k"])

    def test_pipeline_determinism_use(self, spark, snapshots):
        # the repo's own story: two identical derivations diff to zero
        old, _ = snapshots
        a = old.withColumn("d", F.col("v") * 2)
        b = old.withColumn("d", F.col("v") * 2)
        assert table_diff(a, b, ["k"]).count() == 0
