"""Welch's t-test (L139) + chi-squared independence (L140)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import chi2_independence, welch_ttest


def _welch_py(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((v - ma) ** 2 for v in xs) / (na - 1)
    vb = sum((v - mb) ** 2 for v in ys) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dof


class TestWelch:
    def _df(self, spark, xs, ys, g="g1"):
        rows = [(g, "A", float(v)) for v in xs] + [(g, "B", float(v)) for v in ys]
        return spark.createDataFrame(rows, "g string, variant string, y double")

    def test_matches_python_reference(self, spark):
        xs = [10.0, 12.0, 9.5, 11.25, 13.0, 10.75]
        ys = [14.0, 15.5, 13.25, 16.0, 14.75]
        out = welch_ttest(
            self._df(spark, xs, ys), ["g"], "variant", "A", "B", "y"
        ).collect()[0]
        t, dof = _welch_py(xs, ys)
        assert out["t"] == pytest.approx(t, rel=1e-12)
        assert out["dof"] == pytest.approx(dof, rel=1e-12)
        assert out["mean_a"] == pytest.approx(sum(xs) / len(xs))
        assert out["n_a"] == 6 and out["n_b"] == 5

    def test_identical_groups_t_zero(self, spark):
        xs = [1.0, 2.0, 3.0]
        out = welch_ttest(
            self._df(spark, xs, xs), ["g"], "variant", "A", "B", "y"
        ).collect()[0]
        assert out["t"] == 0.0

    def test_degenerate_variants_null(self, spark):
        # n_b = 1 -> NULL t/dof; zero variance both sides -> NULL
        out = welch_ttest(
            self._df(spark, [1.0, 2.0], [5.0]), ["g"], "variant", "A", "B", "y"
        ).collect()[0]
        assert out["t"] is None and out["dof"] is None
        out2 = welch_ttest(
            self._df(spark, [3.0, 3.0], [3.0, 3.0]), ["g"], "variant", "A", "B", "y"
        ).collect()[0]
        assert out2["t"] is None

    def test_missing_variant_keeps_group(self, spark):
        rows = [("g1", "A", 1.0), ("g1", "A", 2.0)]
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        out = welch_ttest(df, ["g"], "variant", "A", "B", "y").collect()[0]
        assert out["n_b"] is None and out["mean_b"] is None and out["t"] is None
        assert out["mean_a"] == pytest.approx(1.5)

    def test_other_variants_ignored(self, spark):
        rows = [("g", "A", 1.0), ("g", "A", 3.0), ("g", "B", 2.0), ("g", "B", 4.0),
                ("g", "C", 999.0)]
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        out = welch_ttest(df, ["g"], "variant", "A", "B", "y").collect()[0]
        assert out["n_a"] == 2 and out["n_b"] == 2

    def test_parallelism_invariance_bitwise(self, spark):
        rows = [
            ("g%d" % (i % 2), ("A" if i % 3 else "B"), 0.25 * ((i * 7) % 40))
            for i in range(1, 200)
        ]
        df = spark.createDataFrame(rows, "g string, variant string, y double")
        a = sorted(map(tuple, welch_ttest(df, ["g"], "variant", "A", "B", "y").collect()))
        b = sorted(
            map(
                tuple,
                welch_ttest(
                    df.repartition(13), ["g"], "variant", "A", "B", "y"
                ).collect(),
            )
        )
        assert a == b  # exact: decimal sums pin the doubles


class TestChi2:
    def test_hand_computed_2x2(self, spark):
        # classic 2x2: o = [[10, 20], [20, 10]], margins 30/30, N=60,
        # e = 15 everywhere, chi2 = 4 * 25/15 = 20/3
        rows = (
            [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 20 + [("b", "y")] * 10
        )
        df = spark.createDataFrame(rows, "u string, v string")
        out = chi2_independence(df, "u", "v").collect()[0]
        assert out["chi2"] == pytest.approx(20 / 3, rel=1e-12)
        assert out["dof"] == 1 and out["n"] == 60

    def test_independent_columns_chi2_zero(self, spark):
        # perfectly proportional table -> expected == observed -> 0
        rows = []
        for u, base in (("a", 1), ("b", 2)):
            rows += [(u, "x")] * (10 * base) + [(u, "y")] * (30 * base)
        df = spark.createDataFrame(rows, "u string, v string")
        out = chi2_independence(df, "u", "v").collect()[0]
        assert out["chi2"] == pytest.approx(0.0, abs=1e-12)

    def test_dof_rectangular(self, spark):
        rows = [("r%d" % (i % 3), "c%d" % (i % 4)) for i in range(120)]
        df = spark.createDataFrame(rows, "u string, v string")
        out = chi2_independence(df, "u", "v").collect()[0]
        assert out["dof"] == (3 - 1) * (4 - 1)

    def test_parallelism_invariance_bitwise(self, spark):
        rows = [("r%d" % ((i * i) % 3), "c%d" % ((i * 7) % 5)) for i in range(300)]
        df = spark.createDataFrame(rows, "u string, v string")
        a = chi2_independence(df, "u", "v").collect()[0]
        b = chi2_independence(df.repartition(17), "u", "v").collect()[0]
        assert a["chi2"] == b["chi2"]  # ordered fold pins the sum
