"""Paired sign test (L223) and Mood's median test (L224)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import mood_median, sign_test


class TestSignTest:
    def _df(self, spark, pairs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x) if x is not None else None,
              float(y) if y is not None else None) for x, y in pairs],
            "g string, x double, y double",
        )

    def test_counts_and_z(self, spark):
        pairs = [(3, 1), (5, 2), (2, 4), (7, 7), (9, 1), (0, 8)]
        out = sign_test(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert (out["n_pos"], out["n_neg"], out["n_tie"]) == (3, 2, 1)
        assert out["n"] == 5
        assert out["z"] == (2 * 3 - 5) / math.sqrt(5.0)

    def test_all_ties_null_z(self, spark):
        out = sign_test(
            self._df(spark, [(1, 1), (2, 2)]), ["g"], "x", "y"
        ).collect()[0]
        assert out["n"] == 0 and out["z"] is None and out["n_tie"] == 2

    def test_null_pairs_excluded(self, spark):
        out = sign_test(
            self._df(spark, [(1, 2), (None, 5), (3, None)]), ["g"], "x", "y"
        ).collect()[0]
        assert out["n"] == 1 and out["n_neg"] == 1

    def test_symmetry(self, spark):
        df = self._df(spark, [(3, 1), (5, 2), (2, 4)])
        a = sign_test(df, ["g"], "x", "y").collect()[0]
        b = sign_test(df, ["g"], "y", "x").collect()[0]
        assert a["n_pos"] == b["n_neg"] and a["z"] == -b["z"]


def _mood_py(groups):
    """Reference: pooled lower discrete median, k x 2 chi2."""
    allv = sorted(v for g in groups.values() for v in g)
    n = len(allv)
    # percentile_disc(0.5): smallest value with cum fraction >= 0.5
    m = allv[math.ceil(0.5 * n) - 1]
    a_tot = sum(1 for g in groups.values() for v in g if v > m)
    chi2 = 0.0
    for g in sorted(groups):
        nj = len(groups[g])
        aj = sum(1 for v in groups[g] if v > m)
        ea = nj * a_tot / n
        eb = nj * (n - a_tot) / n
        chi2 = chi2 + (aj - ea) ** 2 / ea + ((nj - aj) - eb) ** 2 / eb
    return n, a_tot, chi2


class TestMoodMedian:
    def _df(self, spark, groups):
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "lvl string, v double")

    def test_matches_python_reference(self, spark):
        groups = {
            "a": [1, 2, 3, 4, 10, 11],
            "b": [5, 6, 7, 8, 9, 12],
            "c": [0, 1, 2, 13, 14, 15],
        }
        out = mood_median(
            self._df(spark, groups), [], "lvl", "v"
        ).collect()[0]
        n, a_tot, chi2 = _mood_py(groups)
        assert out["n"] == n and out["n_above"] == a_tot
        assert out["k"] == 3 and out["dof"] == 2
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)

    def test_identical_groups_small_chi2(self, spark):
        groups = {"a": [1, 2, 3, 4], "b": [1, 2, 3, 4]}
        out = mood_median(
            self._df(spark, groups), [], "lvl", "v"
        ).collect()[0]
        assert out["chi2"] == pytest.approx(0.0, abs=1e-12)

    def test_equal_to_median_counts_below(self, spark):
        # median of [1,1,1,9] is 1 (disc); only 9 is above
        groups = {"a": [1, 1], "b": [1, 9]}
        out = mood_median(
            self._df(spark, groups), [], "lvl", "v"
        ).collect()[0]
        assert out["n_above"] == 1

    def test_degenerate_one_side_null(self, spark):
        # every value equals the median -> n_above = 0 -> NULL chi2
        groups = {"a": [5, 5], "b": [5, 5]}
        out = mood_median(
            self._df(spark, groups), [], "lvl", "v"
        ).collect()[0]
        assert out["chi2"] is None and out["n_above"] == 0

    def test_single_group_null(self, spark):
        out = mood_median(
            self._df(spark, {"a": [1, 2, 3]}), [], "lvl", "v"
        ).collect()[0]
        assert out["k"] == 1 and out["chi2"] is None

    def test_grouped_by_key(self, spark):
        from pyspark.sql import functions as F

        df = self._df(spark, {"a": [1, 2, 9, 10], "b": [3, 4, 11, 12]})
        d1 = df.withColumn("seg", F.lit("s1"))
        d2 = df.withColumn("seg", F.lit("s2"))
        out = mood_median(d1.union(d2), ["seg"], "lvl", "v").collect()
        assert len(out) == 2
        assert out[0]["chi2"] == out[1]["chi2"]
