"""Declarative data-quality expectations (L113)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.expectations import (
    quarantine,
    validate_expectations,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "alice", 10.0, "A"),
        (2, None, 50.0, "B"),       # not_null(name) violation
        (3, "carol", -5.0, "A"),    # in_range violation
        (3, "carol2", 20.0, "Z"),   # dup key + in_set violation
        (4, "dave!", 30.0, "B"),    # regex violation
        (None, "eve", 40.0, "A"),   # ref passes (NULL), unique: NULL group of 1
    ]
    return spark.createDataFrame(rows, "k int, name string, bal double, seg string")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(1,), (2,), (4,)], "dk int")


def _rules(dim):
    return [
        ("not_null", "name"),
        ("in_range", "bal", 0.0, 100.0),
        ("regex", "name", "^[a-z]+[0-9]*$"),
        ("in_set", "seg", ["A", "B"]),
        ("unique", ["k"]),
        ("ref", "k", dim, "dk"),
    ]


class TestSummary:
    def test_counts(self, spark, table, dim):
        got = {
            r["rule_id"]: (r["kind"], r["target"], r["n_violations"])
            for r in validate_expectations(table, _rules(dim)).collect()
        }
        assert got["r00_not_null_name"] == ("not_null", "name", 1)
        assert got["r01_in_range_bal"] == ("in_range", "bal", 1)
        # NULL name passes regex (not_null owns that case)
        assert got["r02_regex_name"] == ("regex", "name", 1)
        assert got["r03_in_set_seg"] == ("in_set", "seg", 1)
        assert got["r04_unique_k"] == ("unique", "k", 2)  # both rows of k=3
        assert got["r05_ref_k"] == ("ref", "k", 2)  # k=3 missing from dim, 2 rows
        assert len(got) == 6

    def test_ref_counts_rows_not_keys(self, spark, table, dim):
        # k=3 appears twice and is missing from dim -> 2 violating ROWS
        got = {
            r["rule_id"]: r["n_violations"]
            for r in validate_expectations(table, [("ref", "k", dim, "dk")]).collect()
        }
        assert got["r00_ref_k"] == 2

    def test_clean_table_all_zero(self, spark, dim):
        df = dim.select(F.col("dk").alias("k"))
        out = validate_expectations(df, [("not_null", "k"), ("unique", ["k"])])
        assert all(r["n_violations"] == 0 for r in out.collect())

    def test_validation(self, spark, table, dim):
        with pytest.raises(ValueError, match="non-empty"):
            validate_expectations(table, [])
        with pytest.raises(ValueError, match="not in DataFrame"):
            validate_expectations(table, [("not_null", "nope")])
        with pytest.raises(ValueError, match="unknown rule kind"):
            validate_expectations(table, [("sorted", "k")])
        with pytest.raises(ValueError, match="in_range needs"):
            validate_expectations(table, [("in_range", "bal", 0.0)])
        with pytest.raises(ValueError, match="dim_df"):
            validate_expectations(table, [("ref", "k", "notadf", "dk")])


class TestQuarantine:
    def test_split(self, spark, table, dim):
        clean, bad = quarantine(table, _rules(dim))
        assert [r["k"] for r in clean.collect()] in ([1, None], [None, 1]) or sorted(
            r["k"] for r in clean.collect() if r["k"] is not None
        ) == [1]
        got = {
            (r["k"], r["name"]): r["violated"] for r in bad.collect()
        }
        assert got[(2, None)] == ["r00_not_null_name"]
        assert got[(3, "carol")] == ["r01_in_range_bal", "r04_unique_k", "r05_ref_k"]
        # 'carol2' matches the regex (letters then digits)
        assert got[(3, "carol2")] == ["r03_in_set_seg", "r04_unique_k", "r05_ref_k"]
        assert got[(4, "dave!")] == ["r02_regex_name"]

    def test_columns_pass_through(self, spark, table, dim):
        clean, bad = quarantine(table, _rules(dim))
        assert clean.columns == table.columns
        assert bad.columns == table.columns + ["violated"]

    def test_counts_reconcile_with_summary(self, spark, table, dim):
        rules = _rules(dim)
        clean, bad = quarantine(table, rules)
        assert clean.count() + bad.count() == table.count()
        per_rule = (
            bad.select(F.explode("violated").alias("rule_id"))
            .groupBy("rule_id")
            .count()
            .collect()
        )
        summary = {
            r["rule_id"]: r["n_violations"]
            for r in validate_expectations(table, rules).collect()
        }
        for r in per_rule:
            assert summary[r["rule_id"]] == r["count"]
