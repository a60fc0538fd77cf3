"""Pearson correlation matrix (L141) + Spearman (L142)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.correlation import (
    corr_matrix,
    doubled_ranks,
    spearman_corr,
)


def _pearson_py(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    return (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )


def _ranks_py(vs):
    order = sorted(vs)
    return [(order.index(v) + 1 + (len(vs) - 1 - order[::-1].index(v) + 1)) / 2
            for v in vs]


class TestPearson:
    def test_perfect_and_inverse(self, spark):
        rows = [(float(i), 2.0 * i, -3.0 * i + 10) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = {(r["col_a"], r["col_b"]): r["corr"]
               for r in corr_matrix(df, ["a", "b", "c"]).collect()}
        assert out[("a", "b")] == pytest.approx(1.0, abs=1e-12)
        assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-12)
        assert out[("b", "c")] == pytest.approx(-1.0, abs=1e-12)

    def test_matches_python_reference(self, spark):
        rows = [
            (float((i * 7) % 13), float((i * 5) % 11) + 0.25, float(i % 4))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = {(r["col_a"], r["col_b"]): r for r in corr_matrix(df, ["a", "b", "c"]).collect()}
        assert len(out) == 3 and all(r["n"] == 50 for r in out.values())
        cols = {"a": [r[0] for r in rows], "b": [r[1] for r in rows], "c": [r[2] for r in rows]}
        for (a, b), r in out.items():
            assert r["corr"] == pytest.approx(_pearson_py(cols[a], cols[b]), rel=1e-12)

    def test_zero_variance_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "a double, b double"
        )
        out = corr_matrix(df, ["a", "b"]).collect()[0]
        assert out["corr"] is None

    def test_listwise_null_deletion(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, None), (3.0, 3.0), (4.0, 4.0)],
            "a double, b double",
        )
        out = corr_matrix(df, ["a", "b"]).collect()[0]
        assert out["n"] == 3

    def test_requires_two_columns(self, spark):
        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError, match="need >= 2"):
            corr_matrix(df, ["a"])

    def test_parallelism_invariance_bitwise(self, spark):
        rows = [(0.25 * ((i * 7) % 40), 0.5 * ((i * 11) % 30)) for i in range(200)]
        df = spark.createDataFrame(rows, "a double, b double")
        x = corr_matrix(df, ["a", "b"]).collect()[0]["corr"]
        y = corr_matrix(df.repartition(17), ["a", "b"]).collect()[0]["corr"]
        assert x == y


class TestSpearman:
    def test_monotone_nonlinear_is_one(self, spark):
        # y = x^3 is monotone: spearman 1, pearson < 1
        rows = [(float(i), float(i) ** 3) for i in range(1, 10)]
        df = spark.createDataFrame(rows, "a double, b double")
        sp = spearman_corr(df, ["a", "b"]).collect()[0]
        assert sp["corr"] == pytest.approx(1.0, abs=1e-12)
        pe = corr_matrix(df, ["a", "b"]).collect()[0]
        assert pe["corr"] < 0.95

    def test_doubled_ranks_average_ties(self, spark):
        # values [10, 20, 20, 30]: avg ranks [1, 2.5, 2.5, 4] -> rk2 [2, 5, 5, 8]
        df = spark.createDataFrame([(10.0,), (20.0,), (20.0,), (30.0,)], "a double")
        got = sorted(r["rk2_a"] for r in doubled_ranks(df, ["a"]).collect())
        assert got == [2, 5, 5, 8]

    def test_matches_python_reference_with_ties(self, spark):
        rows = [(float((i * 3) % 5), float((i * 7) % 4) + 0.5) for i in range(30)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = spearman_corr(df, ["a", "b"]).collect()[0]
        ra = _ranks_py([r[0] for r in rows])
        rb = _ranks_py([r[1] for r in rows])
        assert out["corr"] == pytest.approx(_pearson_py(ra, rb), rel=1e-12)

    def test_column_names_restored(self, spark):
        df = spark.createDataFrame([(1.0, 2.0), (2.0, 1.0)], "a double, b double")
        out = spearman_corr(df, ["a", "b"]).collect()[0]
        assert (out["col_a"], out["col_b"]) == ("a", "b")


class TestKendallTauB:
    @staticmethod
    def _brute(pairs):
        import itertools

        conc = disc = 0
        for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
            s = (x1 - x2) * (y1 - y2)
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
        n = len(pairs)
        n0 = n * (n - 1) / 2
        import collections

        n1 = sum(
            t * (t - 1) / 2
            for t in collections.Counter(x for x, _ in pairs).values()
        )
        n2 = sum(
            t * (t - 1) / 2
            for t in collections.Counter(y for _, y in pairs).values()
        )
        tau = (conc - disc) / ((n0 - n1) * (n0 - n2)) ** 0.5
        return conc, disc, tau

    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [("g", int(x), int(y)) for x, y in pairs],
            "g string, x int, y int",
        )

    def test_brute_force_with_ties(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import kendall_tau_b

        pairs = [
            (1, 2), (1, 3), (2, 2), (2, 5), (3, 1), (3, 3), (3, 3),
            (4, 6), (4, 2), (5, 7), (5, 5), (6, 6), (6, 8), (7, 7),
        ]
        conc, disc, tau = self._brute(pairs)
        r = kendall_tau_b(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["n"] == len(pairs)
        assert r["concordant"] == conc
        assert r["discordant"] == disc
        assert abs(r["tau_b"] - tau) < 1e-12

    def test_perfect_orders(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import kendall_tau_b

        up = [(i, i * 2) for i in range(10)]
        dn = [(i, -i) for i in range(10)]
        ru = kendall_tau_b(self._df(spark, up), ["g"], "x", "y").collect()[0]
        rd = kendall_tau_b(self._df(spark, dn), ["g"], "x", "y").collect()[0]
        assert ru["tau_b"] == 1.0 and rd["tau_b"] == -1.0

    def test_constant_axis_null(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import kendall_tau_b

        pairs = [(1, 5), (2, 5), (3, 5)]
        r = kendall_tau_b(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["tau_b"] is None

    def test_pseudo_random_reference(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import kendall_tau_b

        pairs = [((7 * i * i + 3 * i) % 13, (5 * i + 11) % 9) for i in range(80)]
        conc, disc, tau = self._brute(pairs)
        r = kendall_tau_b(self._df(spark, pairs), ["g"], "x", "y").collect()[0]
        assert r["concordant"] == conc and r["discordant"] == disc
        assert abs(r["tau_b"] - tau) < 1e-12


class TestPartialCorrelation:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import (
            partial_correlation,
        )

        rows = [
            (float(z), float(2 * z + (i % 3)), float(-z + (i % 5)))
            for i, z in enumerate(range(20))
        ]
        df = spark.createDataFrame(
            [("g", x, y, z) for z, x, y in rows],
            "g string, x double, y double, z double",
        )

        def corr(a, b):
            n = len(a)
            sa, sb = sum(a), sum(b)
            sab = sum(u * v for u, v in zip(a, b))
            saa = sum(u * u for u in a)
            sbb = sum(v * v for v in b)
            return (n * sab - sa * sb) / (
                (n * saa - sa * sa) * (n * sbb - sb * sb)
            ) ** 0.5

        xs = [x for _, x, _ in rows]
        ys = [y for _, _, y in rows]
        zs = [z for z, _, _ in rows]
        rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
        ref = (rxy - rxz * ryz) / (
            (1 - rxz**2) * (1 - ryz**2)
        ) ** 0.5
        r = partial_correlation(df, ["g"], "x", "y", "z").collect()[0]
        assert abs(r["r_xy"] - rxy) < 1e-9
        assert abs(r["r_xy_given_z"] - ref) < 1e-9

    def test_confounder_fully_explains(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import (
            partial_correlation,
        )

        # x = z, y = z exactly: r_xy = 1 but |r_xz| = 1 -> NULL partial
        rows = [("g", float(z), float(z), float(z)) for z in range(10)]
        df = spark.createDataFrame(rows, "g string, x double, y double, z double")
        r = partial_correlation(df, ["g"], "x", "y", "z").collect()[0]
        assert abs(r["r_xy"] - 1.0) < 1e-12
        assert r["r_xy_given_z"] is None

    def test_independent_of_z(self, spark):
        from lmss_entity_extractor_spark.ops.correlation import (
            partial_correlation,
        )

        # x,y correlated, z pure noise pattern uncorrelated-ish:
        # partial stays close to raw
        rows = [
            ("g", float(i), float(2 * i + (i % 2)), float((i * 7) % 5))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double, z double")
        r = partial_correlation(df, ["g"], "x", "y", "z").collect()[0]
        assert abs(r["r_xy"] - r["r_xy_given_z"]) < 0.05
