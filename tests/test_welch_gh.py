"""Welch's one-way ANOVA (L367) and Games-Howell post-hoc (L368)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import (
    games_howell,
    welch_anova,
)


def _welch_ref(groups):
    stats = []
    for vals in groups:
        n = len(vals)
        m = sum(vals) / n
        v = sum((x - m) ** 2 for x in vals) / (n - 1)
        stats.append((n, m, v))
    k = len(stats)
    ws = [n / v for n, _, v in stats]
    W = sum(ws)
    xw = sum(w * m for w, (_, m, _) in zip(ws, stats)) / W
    A = sum(w * (m - xw) ** 2 for w, (_, m, _) in zip(ws, stats))
    B = sum(
        (1 - w / W) ** 2 / (n - 1) for w, (n, _, _) in zip(ws, stats)
    )
    f = (A / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * B)
    df2 = (k * k - 1) / (3 * B)
    return f, df2


def _gh_ref(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    ma, mb = sum(a_vals) / na, sum(b_vals) / nb
    va = sum((x - ma) ** 2 for x in a_vals) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b_vals) / (nb - 1)
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    return t, df, math.sqrt(2) * t


GROUPS = {
    "a": [50.0, 52.5, 49.25, 51.75, 53.0],
    "b": [55.5, 58.0, 61.25, 57.75, 60.0, 59.5],
    "c": [50.25, 60.5, 45.0, 65.75, 55.5],
}


def _df(spark, groups, g="k1"):
    rows = [(g, arm, v) for arm, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "key string, arm string, v double")


class TestWelchAnova:
    def test_vs_python_reference(self, spark):
        out = welch_anova(
            _df(spark, GROUPS), ["key"], "arm", "v"
        ).collect()[0]
        f, df2 = _welch_ref(list(GROUPS.values()))
        assert out["k"] == 3 and out["n"] == 16
        assert out["f"] == pytest.approx(f, rel=1e-9)
        assert out["df2"] == pytest.approx(df2, rel=1e-9)

    def test_identical_means_small_f(self, spark):
        groups = {
            "a": [10.0, 11.0, 9.0, 10.0],
            "b": [10.0, 12.0, 8.0, 10.0],
            "c": [10.25, 9.75, 10.5, 9.5],
        }
        out = welch_anova(
            _df(spark, groups), ["key"], "arm", "v"
        ).collect()[0]
        f, _ = _welch_ref(list(groups.values()))
        assert out["f"] == pytest.approx(f, rel=1e-9)
        assert out["f"] < 1.0

    def test_degenerate_null(self, spark):
        # a singleton group and a zero-variance group both refuse
        out = welch_anova(
            _df(spark, {"a": [1.0], "b": [2.0, 3.0]}),
            ["key"], "arm", "v",
        ).collect()[0]
        assert out["f"] is None and out["df2"] is None
        out = welch_anova(
            _df(spark, {"a": [5.0, 5.0], "b": [2.0, 3.0]}),
            ["key"], "arm", "v",
        ).collect()[0]
        assert out["f"] is None

    def test_scale_shift_invariance_of_f(self, spark):
        shifted = {k: [v + 100.0 for v in vs] for k, vs in GROUPS.items()}
        f0 = welch_anova(_df(spark, GROUPS), ["key"], "arm", "v").collect()[0]["f"]
        f1 = welch_anova(_df(spark, shifted), ["key"], "arm", "v").collect()[0]["f"]
        assert f1 == pytest.approx(f0, rel=1e-9)


class TestGamesHowell:
    def test_vs_python_reference(self, spark):
        out = {
            (r["g_a"], r["g_b"]): r
            for r in games_howell(
                _df(spark, GROUPS), ["key"], "arm", "v"
            ).collect()
        }
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        for (ga, gb), r in out.items():
            t, df, q = _gh_ref(GROUPS[ga], GROUPS[gb])
            assert r["t"] == pytest.approx(t, rel=1e-9)
            assert r["df_gh"] == pytest.approx(df, rel=1e-9)
            assert r["q"] == pytest.approx(q, rel=1e-9)

    def test_unequal_variance_df_shrinks(self, spark):
        # one tight group vs one wild group: df_gh must be far below
        # the pooled n_a+n_b-2
        groups = {
            "tight": [10.0, 10.1, 9.9, 10.0, 10.05, 9.95],
            "wild": [5.0, 25.0, -10.0, 40.0, 0.5, 15.0],
        }
        r = games_howell(_df(spark, groups), ["key"], "arm", "v").collect()[0]
        assert r["df_gh"] < 7.0  # pooled would be 10

    def test_degenerate_null(self, spark):
        r = games_howell(
            _df(spark, {"a": [5.0, 5.0], "b": [2.0, 3.0]}),
            ["key"], "arm", "v",
        ).collect()[0]
        assert r["t"] is None and r["q"] is None
        # means still emitted
        assert r["mean_a"] == 5.0
