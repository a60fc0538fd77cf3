"""One-pass table profiling (L103)."""

import pytest

from lmss_entity_extractor_spark.ops.profile import profile_table


def _by_col(df):
    return {r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_value"], r["max_value"]) for r in df.collect()}


class TestProfileTable:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "b", 2.5), (1, None, 0.5), (3, "a", None), (None, "a", -1.0)],
            "k int, s string, v double",
        ).repartition(3)
        got = _by_col(profile_table(df))
        assert got["k"] == (4, 1, 2, "1", "3")
        assert got["s"] == (4, 1, 2, "a", "b")
        assert got["v"] == (4, 1, 3, "-1.0", "2.5")

    def test_column_subset_and_order(self, spark):
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        out = profile_table(df, ["b"])
        assert [r["column"] for r in out.collect()] == ["b"]

    def test_empty_and_all_null(self, spark):
        df = spark.createDataFrame([], "k int")
        assert _by_col(profile_table(df))["k"] == (0, 0, 0, None, None)
        dfn = spark.createDataFrame([(None,), (None,)], "k int")
        assert _by_col(profile_table(dfn))["k"] == (2, 2, 0, None, None)

    def test_single_scan_plan(self, spark):
        # all columns profile inside ONE aggregate over one scan: the
        # analyzed plan contains exactly one relation reference
        df = spark.range(100).selectExpr("id", "id % 7 AS m", "CAST(id AS STRING) AS s")
        cols = list(df.columns)
        from pyspark.sql import functions as F

        aggs = [F.count(F.lit(1))]
        for c in cols:
            aggs += [F.count(c), F.count_distinct(c), F.min(c), F.max(c)]
        plan = df.agg(*aggs)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.lower().count("range (0, 100") == 1

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="not in DataFrame"):
            profile_table(df, ["nope"])
        with pytest.raises(ValueError, match="no columns"):
            profile_table(df, [])

    def test_matches_sql_derivation(self, spark):
        df = spark.range(500).selectExpr(
            "CASE WHEN id % 11 = 0 THEN NULL ELSE id % 13 END AS k",
            "CAST(id % 5 AS STRING) AS s",
        )
        df.createOrReplaceTempView("prof_src")
        got = _by_col(profile_table(df))
        for c in ("k", "s"):
            exp = spark.sql(
                f"SELECT count(*) n, count(*) - count({c}) z, count(DISTINCT {c}) d, "
                f"CAST(min({c}) AS STRING) mn, CAST(max({c}) AS STRING) mx FROM prof_src"
            ).first()
            assert got[c] == (exp["n"], exp["z"], exp["d"], exp["mn"], exp["mx"])
