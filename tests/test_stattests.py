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


class TestBrownForsythe:
    def _df(self, spark, groups):
        rows = [
            ("g", lvl, float(v)) for lvl, vals in groups.items() for v in vals
        ]
        return spark.createDataFrame(rows, "g string, lvl string, v double")

    @staticmethod
    def _ref(groups):
        # python reference with the DISCRETE (lower-middle) median
        def med(vs):
            s = sorted(vs)
            return s[(len(s) - 1) // 2]

        zs = {g: [abs(v - med(vs)) for v in vs] for g, vs in groups.items()}
        n = sum(len(z) for z in zs.values())
        k = len(zs)
        grand = sum(sum(z) for z in zs.values()) / n
        ssb = sum(
            len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs.values()
        )
        ssw = sum(
            sum(x * x for x in z) - sum(z) ** 2 / len(z)
            for z in zs.values()
        )
        return (ssb / (k - 1)) / (ssw / (n - k))

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import brown_forsythe

        groups = {
            "a": [1.0, 2.0, 3.0, 4.0, 100.0],
            "b": [10.0, 10.5, 11.0, 10.25, 10.75],
            "c": [5.0, 6.0, 5.5, 4.5, 6.5],
        }
        r = brown_forsythe(
            self._df(spark, groups), ["g"], "lvl", "v"
        ).collect()[0]
        assert r["k"] == 3 and r["n"] == 15
        assert abs(r["f"] - self._ref(groups)) < 1e-9

    def test_constant_groups_null(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import brown_forsythe

        groups = {"a": [1.0, 1.0, 1.0], "b": [2.0, 2.0, 2.0]}
        r = brown_forsythe(
            self._df(spark, groups), ["g"], "lvl", "v"
        ).collect()[0]
        assert r["f"] is None

    def test_single_group_null(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import brown_forsythe

        groups = {"a": [1.0, 2.0, 3.0]}
        r = brown_forsythe(
            self._df(spark, groups), ["g"], "lvl", "v"
        ).collect()[0]
        assert r["k"] == 1 and r["f"] is None


class TestCramersV:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import cramers_v

        # 3x2 contingency table with clear association
        table = {("a", "x"): 30, ("a", "y"): 5, ("b", "x"): 10,
                 ("b", "y"): 25, ("c", "x"): 7, ("c", "y"): 8}
        rows = [(x, y) for (x, y), c in table.items() for _ in range(c)]
        df = spark.createDataFrame(rows, "cx string, cy string")
        n = sum(table.values())
        rt = {x: sum(c for (a, _), c in table.items() if a == x)
              for x in "abc"}
        ct = {y: sum(c for (_, b), c in table.items() if b == y)
              for y in "xy"}
        chi2 = sum(
            (o - rt[x] * ct[y] / n) ** 2 / (rt[x] * ct[y] / n)
            for (x, y), o in table.items()
        )
        r_, c_ = 3, 2
        v_ref = (chi2 / (n * (min(r_, c_) - 1))) ** 0.5
        phi2p = max(0.0, chi2 / n - (r_ - 1) * (c_ - 1) / (n - 1))
        rt_ = r_ - (r_ - 1) ** 2 / (n - 1)
        ct_ = c_ - (c_ - 1) ** 2 / (n - 1)
        vc_ref = (phi2p / (min(rt_, ct_) - 1)) ** 0.5
        row = cramers_v(df, "cx", "cy").collect()[0]
        assert row["n"] == n and row["r"] == 3 and row["c"] == 2
        assert abs(row["chi2"] - chi2) < 1e-9
        assert abs(row["v"] - v_ref) < 1e-12
        assert abs(row["v_corrected"] - vc_ref) < 1e-12

    def test_independent_near_zero(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import cramers_v

        # perfectly proportional table -> chi2 = 0, v = 0, corrected 0
        rows = (
            [("a", "x")] * 20 + [("a", "y")] * 10
            + [("b", "x")] * 40 + [("b", "y")] * 20
        )
        df = spark.createDataFrame(rows, "cx string, cy string")
        row = cramers_v(df, "cx", "cy").collect()[0]
        assert abs(row["v"]) < 1e-12
        assert abs(row["v_corrected"]) < 1e-12

    def test_degenerate_single_column(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import cramers_v

        rows = [("a", "x")] * 5 + [("b", "x")] * 5
        df = spark.createDataFrame(rows, "cx string, cy string")
        row = cramers_v(df, "cx", "cy").collect()[0]
        assert row["v"] is None


class TestRatioMetric:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import ratio_metric

        units = [
            (3.0, 2.0), (5.0, 4.0), (1.0, 1.0), (7.0, 3.0), (2.0, 2.0),
            (4.0, 5.0), (6.0, 2.0), (0.0, 1.0),
        ]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in units], "g string, x double, y double"
        )
        n = len(units)
        sx = sum(x for x, _ in units)
        sy = sum(y for _, y in units)
        r_ref = sx / sy
        mx, my = sx / n, sy / n
        vx = sum((x - mx) ** 2 for x, _ in units) / (n - 1)
        vy = sum((y - my) ** 2 for _, y in units) / (n - 1)
        cxy = sum((x - mx) * (y - my) for x, y in units) / (n - 1)
        var = (vx + r_ref**2 * vy - 2 * r_ref * cxy) / (n * my**2)
        r = ratio_metric(df, ["g"], "x", "y").collect()[0]
        assert r["n"] == n
        assert abs(r["ratio"] - r_ref) < 1e-12
        assert abs(r["se"] - var**0.5) < 1e-9

    def test_constant_ratio_zero_se(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import ratio_metric

        # x = 2y exactly for every unit: delta variance is 0
        df = spark.createDataFrame(
            [("g", 2.0 * y, y) for y in (1.0, 2.0, 3.0, 4.0)],
            "g string, x double, y double",
        )
        r = ratio_metric(df, ["g"], "x", "y").collect()[0]
        assert r["ratio"] == 2.0 and abs(r["se"]) < 1e-12

    def test_degenerate_null(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import ratio_metric

        df = spark.createDataFrame(
            [("g", 1.0, 1.0)], "g string, x double, y double"
        )
        r = ratio_metric(df, ["g"], "x", "y").collect()[0]
        assert r["ratio"] is None and r["se"] is None


class TestMdeProportions:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            _Z_ALPHA_005,
            _Z_POWER_080,
            mde_proportions,
        )

        rows = [("g", 1)] * 30 + [("g", 0)] * 70
        df = spark.createDataFrame(rows, "g string, y int")
        r = mde_proportions(df, ["g"], "y").collect()[0]
        p = 0.3
        n = 100
        mde = (_Z_ALPHA_005 + _Z_POWER_080) * (2 * p * (1 - p) / n) ** 0.5
        assert r["n"] == n and r["k"] == 30
        assert abs(r["mde_abs"] - mde) < 1e-12
        assert abs(r["mde_rel"] - mde / p) < 1e-12

    def test_mde_shrinks_with_n(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import mde_proportions

        small = spark.createDataFrame(
            [("g", i % 2) for i in range(20)], "g string, y int"
        )
        big = spark.createDataFrame(
            [("g", i % 2) for i in range(2000)], "g string, y int"
        )
        ms = mde_proportions(small, ["g"], "y").collect()[0]["mde_abs"]
        mb = mde_proportions(big, ["g"], "y").collect()[0]["mde_abs"]
        assert mb < ms / 5

    def test_degenerate_null(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import mde_proportions

        df = spark.createDataFrame([("g", 1)] * 5, "g string, y int")
        r = mde_proportions(df, ["g"], "y").collect()[0]
        assert r["mde_abs"] is None

    def test_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import mde_proportions

        df = spark.createDataFrame([("g", 3)], "g string, y int")
        with pytest.raises(ValueError, match="non-binary"):
            mde_proportions(df, ["g"], "y")


class TestCovariateBalance:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            covariate_balance,
        )

        tvals = [3.0, 4.0, 5.0, 6.0, 7.0]
        cvals = [2.0, 3.0, 4.0, 5.0]
        rows = [("g", 1, v) for v in tvals] + [("g", 0, v) for v in cvals]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        mt = sum(tvals) / len(tvals)
        mc = sum(cvals) / len(cvals)
        vt = sum((v - mt) ** 2 for v in tvals) / (len(tvals) - 1)
        vc = sum((v - mc) ** 2 for v in cvals) / (len(cvals) - 1)
        smd = (mt - mc) / ((vt + vc) / 2) ** 0.5
        r = covariate_balance(df, ["g"], "t", "v").collect()[0]
        assert r["n_t"] == 5 and r["n_c"] == 4
        assert abs(r["smd"] - smd) < 1e-12

    def test_balanced_near_zero(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            covariate_balance,
        )

        rows = [("g", i % 2, float(i % 5)) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        r = covariate_balance(df, ["g"], "t", "v").collect()[0]
        assert abs(r["smd"]) < 1e-9

    def test_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import (
            covariate_balance,
        )

        df = spark.createDataFrame([("g", 2, 1.0)], "g string, t int, v double")
        with pytest.raises(ValueError, match="non-binary"):
            covariate_balance(df, ["g"], "t", "v")


class TestBhFdr:
    def test_textbook_stepup(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import bh_fdr

        # classic example: m=10, q=0.05
        ps = [0.001, 0.008, 0.012, 0.021, 0.028, 0.09, 0.11, 0.39, 0.58, 0.9]
        rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
        df = spark.createDataFrame(rows, "test string, p double")
        got = {
            r["test"]: r for r in bh_fdr(df, "test", "p", q="0.05").collect()
        }
        # thresholds k*0.05/10: 0.005,0.010,...; hits at k=1 (0.001<=0.005),
        # k=3 (0.012<=0.015), k=4 (0.021<=0.020? no), k=5 (0.028<=0.025? no)
        # max hit k=3 -> first three discoveries
        disc = {t for t, r in got.items() if r["discovery"]}
        assert disc == {"t00", "t01", "t02"}
        assert got["t00"]["m"] == 10

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import bh_fdr

        ps = [((7 * i * i + 3) % 97) / 100.0 for i in range(50)]
        rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
        df = spark.createDataFrame(rows, "test string, p double")
        order = sorted(rows, key=lambda r: (r[1], r[0]))
        m = len(order)
        kmax = 0
        for k, (_, p) in enumerate(order, 1):
            if p <= k * 0.05 / m:
                kmax = k
        expect = {t for t, _ in order[:kmax]}
        got = {
            r["test"]
            for r in bh_fdr(df, "test", "p", q="0.05").collect()
            if r["discovery"]
        }
        assert got == expect

    def test_bad_inputs_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import bh_fdr

        df = spark.createDataFrame([("a", 1.5)], "test string, p double")
        with pytest.raises(ValueError, match="outside"):
            bh_fdr(df, "test", "p")
        df2 = spark.createDataFrame([("a", 0.5)], "test string, p double")
        with pytest.raises(ValueError, match="q must be"):
            bh_fdr(df2, "test", "p", q="1.5")


class TestOnewayAnova:
    def _df(self, spark, groups):
        rows = [
            ("g", lvl, float(v)) for lvl, vals in groups.items() for v in vals
        ]
        return spark.createDataFrame(rows, "g string, lvl string, v double")

    @staticmethod
    def _ref(groups):
        vals = [v for vs in groups.values() for v in vs]
        n, k = len(vals), len(groups)
        grand = sum(vals) / n
        ssb = sum(
            len(vs) * (sum(vs) / len(vs) - grand) ** 2
            for vs in groups.values()
        )
        ssw = sum(
            sum(v * v for v in vs) - sum(vs) ** 2 / len(vs)
            for vs in groups.values()
        )
        f = (ssb / (k - 1)) / (ssw / (n - k))
        return f, ssb / (ssb + ssw)

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import oneway_anova

        groups = {
            "a": [1.0, 2.0, 3.0, 4.0],
            "b": [4.0, 5.0, 6.0],
            "c": [8.0, 9.0, 10.0, 11.0, 12.0],
        }
        f_ref, eta_ref = self._ref(groups)
        r = oneway_anova(self._df(spark, groups), ["g"], "lvl", "v").collect()[0]
        assert r["k"] == 3 and r["n"] == 12
        assert abs(r["f"] - f_ref) < 1e-9
        assert abs(r["eta_sq"] - eta_ref) < 1e-12

    def test_identical_groups_zero_f(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import oneway_anova

        groups = {"a": [1.0, 2.0, 3.0], "b": [1.0, 2.0, 3.0]}
        r = oneway_anova(self._df(spark, groups), ["g"], "lvl", "v").collect()[0]
        assert abs(r["f"]) < 1e-12 and abs(r["eta_sq"]) < 1e-12

    def test_constant_within_null_f(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import oneway_anova

        groups = {"a": [1.0, 1.0], "b": [5.0, 5.0]}
        r = oneway_anova(self._df(spark, groups), ["g"], "lvl", "v").collect()[0]
        assert r["f"] is None  # SSW = 0
        assert abs(r["eta_sq"] - 1.0) < 1e-12


class TestTwoProportion:
    def _df(self, spark, ka, na, kb, nb):
        rows = (
            [("g", "A", 1)] * ka + [("g", "A", 0)] * (na - ka)
            + [("g", "B", 1)] * kb + [("g", "B", 0)] * (nb - kb)
        )
        return spark.createDataFrame(rows, "g string, var string, y int")

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            two_proportion_test,
        )

        ka, na, kb, nb = 30, 100, 20, 120
        r = two_proportion_test(
            self._df(spark, ka, na, kb, nb), ["g"], "var", "A", "B", "y"
        ).collect()[0]
        pa, pb = ka / na, kb / nb
        pp = (ka + kb) / (na + nb)
        z = (pa - pb) / (pp * (1 - pp) * (1 / na + 1 / nb)) ** 0.5
        rr = pa / pb
        rr_se = (1 / ka - 1 / na + 1 / kb - 1 / nb) ** 0.5
        orat = (ka * (nb - kb)) / (kb * (na - ka))
        or_se = (1 / ka + 1 / (na - ka) + 1 / kb + 1 / (nb - kb)) ** 0.5
        assert abs(r["z"] - z) < 1e-12
        assert abs(r["risk_ratio"] - rr) < 1e-12
        assert abs(r["rr_se_log"] - rr_se) < 1e-12
        assert abs(r["odds_ratio"] - orat) < 1e-12
        assert abs(r["or_se_log"] - or_se) < 1e-12

    def test_zero_cell_nulls(self, spark):
        from lmss_entity_extractor_spark.ops.effectsize import (
            two_proportion_test,
        )

        r = two_proportion_test(
            self._df(spark, 0, 10, 5, 10), ["g"], "var", "A", "B", "y"
        ).collect()[0]
        assert r["risk_ratio"] is None and r["odds_ratio"] is None
        assert r["z"] is not None  # pooled rate is in (0,1)

    def test_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.effectsize import (
            two_proportion_test,
        )

        df = spark.createDataFrame([("g", "A", 2)], "g string, var string, y int")
        with pytest.raises(ValueError, match="non-binary"):
            two_proportion_test(df, ["g"], "var", "A", "B", "y")


class TestRunsTest:
    def _df(self, spark, seq):
        return spark.createDataFrame(
            [("g", i, int(x)) for i, x in enumerate(seq)],
            "g string, t int, x int",
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import runs_test

        seq = [1, 1, 0, 1, 0, 0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1]
        runs = 1 + sum(seq[i] != seq[i - 1] for i in range(1, len(seq)))
        n1, n0, n = sum(seq), len(seq) - sum(seq), len(seq)
        mean = 1 + 2 * n1 * n0 / n
        var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
        z_ref = (runs - mean) / var**0.5
        r = runs_test(self._df(spark, seq), ["g"], "t", "x").collect()[0]
        assert r["runs"] == runs and r["n1"] == n1 and r["n0"] == n0
        assert abs(r["z"] - z_ref) < 1e-12

    def test_perfect_alternation_positive_z(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import runs_test

        seq = [i % 2 for i in range(30)]
        r = runs_test(self._df(spark, seq), ["g"], "t", "x").collect()[0]
        assert r["runs"] == 30 and r["z"] > 4

    def test_clumped_negative_z(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import runs_test

        seq = [1] * 15 + [0] * 15
        r = runs_test(self._df(spark, seq), ["g"], "t", "x").collect()[0]
        assert r["runs"] == 2 and r["z"] < -4

    def test_one_sided_null(self, spark):
        from lmss_entity_extractor_spark.ops.stattests import runs_test

        r = runs_test(
            self._df(spark, [1, 1, 1]), ["g"], "t", "x"
        ).collect()[0]
        assert r["z"] is None

    def test_nonbinary_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.stattests import runs_test

        with pytest.raises(ValueError, match="non-binary"):
            runs_test(self._df(spark, [2]), ["g"], "t", "x")
