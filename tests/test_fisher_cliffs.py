"""Fisher's exact test (L365) and Cliff's delta / Vargha-Delaney A
(L366)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import cliffs_delta
from lmss_entity_extractor_spark.ops.stattests import fisher_exact


def _fisher_ref(a, b, c, d):
    """Pure-python two-sided Fisher via exact binomials."""
    r1, r2, c1 = a + b, c + d, a + c
    n = r1 + r2
    denom = math.comb(n, c1)
    kmin, kmax = max(0, c1 - r2), min(r1, c1)
    pobs = math.comb(r1, a) * math.comb(r2, c1 - a) / denom
    p = sum(
        math.comb(r1, k) * math.comb(r2, c1 - k) / denom
        for k in range(kmin, kmax + 1)
        if math.comb(r1, k) * math.comb(r2, c1 - k) / denom
        <= pobs * (1 + 1e-7)
    )
    return min(p, 1.0)


class TestFisherExact:
    def _df(self, spark, table, g="g1"):
        a, b, c, d = table
        rows = (
            [(g, 1, 1)] * a
            + [(g, 1, 0)] * b
            + [(g, 0, 1)] * c
            + [(g, 0, 0)] * d
        )
        return spark.createDataFrame(rows, "g string, x int, y int")

    def test_tea_tasting(self, spark):
        # the classic (3,1,1,3) lady-tasting-tea table: p = 34/70
        out = fisher_exact(
            self._df(spark, (3, 1, 1, 3)), ["g"], "x", "y"
        ).collect()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (3, 1, 1, 3)
        assert out["p_two"] == pytest.approx(34 / 70, abs=1e-12)
        assert out["odds_ratio"] == pytest.approx(9.0)

    @pytest.mark.parametrize(
        "table",
        [(12, 1, 2, 13), (5, 5, 5, 5), (1, 9, 11, 3), (0, 4, 4, 0)],
    )
    def test_vs_python_reference(self, spark, table):
        out = fisher_exact(
            self._df(spark, table), ["g"], "x", "y"
        ).collect()[0]
        assert out["p_two"] == pytest.approx(
            _fisher_ref(*table), rel=1e-10
        )

    def test_degenerate_margin_is_one(self, spark):
        # all y=0: the support is a single point, p = 1 exactly
        out = fisher_exact(
            self._df(spark, (4, 0, 6, 0)), ["g"], "x", "y"
        ).collect()[0]
        assert out["p_two"] == 1.0
        assert out["odds_ratio"] is None

    def test_grouped(self, spark):
        df = self._df(spark, (3, 1, 1, 3), g="g1").union(
            self._df(spark, (8, 2, 1, 9), g="g2")
        )
        out = {r["g"]: r for r in fisher_exact(df, ["g"], "x", "y").collect()}
        assert out["g1"]["p_two"] == pytest.approx(34 / 70, abs=1e-12)
        assert out["g2"]["p_two"] == pytest.approx(
            _fisher_ref(8, 2, 1, 9), rel=1e-10
        )

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="NULL"):
            fisher_exact(
                spark.createDataFrame(
                    [("g", None, 1)], "g string, x int, y int"
                ),
                ["g"], "x", "y",
            )
        with pytest.raises(ValueError, match="non-0/1"):
            fisher_exact(
                spark.createDataFrame(
                    [("g", 2, 1)], "g string, x int, y int"
                ),
                ["g"], "x", "y",
            )
        with pytest.raises(ValueError, match="max_support"):
            fisher_exact(
                self._df(spark, (30, 30, 30, 30)),
                ["g"], "x", "y", max_support=10,
            )


def _cliff_ref(xs, ys):
    gt = sum(1 for x in xs for y in ys if x > y)
    lt = sum(1 for x in xs for y in ys if x < y)
    eq = sum(1 for x in xs for y in ys if x == y)
    n = len(xs) * len(ys)
    return gt, lt, eq, (gt - lt) / n, (gt + eq / 2) / n


class TestCliffsDelta:
    def _df(self, spark, xs, ys, g="g1"):
        rows = [(g, "A", float(v)) for v in xs] + [
            (g, "B", float(v)) for v in ys
        ]
        return spark.createDataFrame(rows, "g string, arm string, v double")

    def test_hand_case(self, spark):
        # A=[1,2,3] vs B=[1,1,2]: gt=5, lt=1, ties=3 of 9 pairs
        out = cliffs_delta(
            self._df(spark, [1, 2, 3], [1, 1, 2]),
            ["g"], "arm", "A", "B", "v",
        ).collect()[0]
        assert (out["n_a"], out["n_b"]) == (3, 3)
        assert (
            int(out["gt_pairs"]),
            int(out["lt_pairs"]),
            int(out["tie_pairs"]),
        ) == (5, 1, 3)
        assert out["delta"] == pytest.approx(4 / 9)
        assert out["a_measure"] == pytest.approx(6.5 / 9)

    def test_vs_python_reference(self, spark):
        xs = [((i * 7919) % 23) * 0.5 for i in range(40)]
        ys = [((i * 104729) % 19) * 0.5 + 1.0 for i in range(55)]
        out = cliffs_delta(
            self._df(spark, xs, ys), ["g"], "arm", "A", "B", "v"
        ).collect()[0]
        gt, lt, eq, delta, a = _cliff_ref(xs, ys)
        assert int(out["gt_pairs"]) == gt
        assert int(out["lt_pairs"]) == lt
        assert int(out["tie_pairs"]) == eq
        assert out["delta"] == pytest.approx(delta, abs=1e-12)
        assert out["a_measure"] == pytest.approx(a, abs=1e-12)

    def test_disjoint_and_identical(self, spark):
        out = cliffs_delta(
            self._df(spark, [10, 11], [1, 2, 3]),
            ["g"], "arm", "A", "B", "v",
        ).collect()[0]
        assert out["delta"] == 1.0 and out["a_measure"] == 1.0
        out = cliffs_delta(
            self._df(spark, [5, 5], [5, 5]),
            ["g"], "arm", "A", "B", "v",
        ).collect()[0]
        assert out["delta"] == 0.0 and out["a_measure"] == 0.5

    def test_empty_side_null(self, spark):
        df = spark.createDataFrame(
            [("g", "A", 1.0), ("g", "A", 2.0)],
            "g string, arm string, v double",
        )
        out = cliffs_delta(df, ["g"], "arm", "A", "B", "v").collect()[0]
        assert out["n_b"] == 0
        assert out["delta"] is None and out["a_measure"] is None

    def test_relation_between_delta_and_a(self, spark):
        out = cliffs_delta(
            self._df(spark, [1, 2, 3, 4], [2, 3]),
            ["g"], "arm", "A", "B", "v",
        ).collect()[0]
        assert out["a_measure"] == pytest.approx((out["delta"] + 1) / 2)
