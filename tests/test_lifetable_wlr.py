"""Actuarial life table (L379) and weighted log-rank family (L380)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.survival import (
    life_table,
    logrank_test,
    weighted_logrank,
)


def _surv_df(spark, rows, key="k1"):
    return spark.createDataFrame(
        [(key, t, e) for t, e in rows], "key string, dur int, event int"
    )


def _lt_ref(rows, width):
    """Python twin of the actuarial table."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for t, e in rows:
        cells[t // width][0 if e else 1] += 1
    total = len(rows)
    out = {}
    before = 0
    s = 1.0
    for k in sorted(cells):
        d, c = cells[k]
        n_enter = total - before
        n_eff = n_enter - c / 2.0
        q = d / n_eff if n_eff > 0 else None
        if n_eff > 0:
            s *= 1.0 - d / n_eff
        out[k] = (n_enter, d, c, n_eff, q, s)
        before += d + c
    return out


LT_ROWS = [
    (2, 1), (3, 0), (5, 1), (8, 1), (9, 0), (11, 1), (12, 1),
    (13, 0), (17, 1), (20, 0), (24, 1), (27, 1), (29, 0),
]


class TestLifeTable:
    def test_vs_python_reference(self, spark):
        out = {
            r["interval"]: r
            for r in life_table(
                _surv_df(spark, LT_ROWS), ["key"], "dur", "event", width=7
            ).collect()
        }
        ref = _lt_ref(LT_ROWS, 7)
        assert set(out) == set(ref)
        for k, (n_enter, d, c, n_eff, q, s) in ref.items():
            r = out[k]
            assert (r["n_enter"], r["d"], r["c"]) == (n_enter, d, c)
            assert r["t_start"] == k * 7 and r["t_end"] == (k + 1) * 7
            assert r["n_eff"] == pytest.approx(n_eff)
            assert r["q"] == pytest.approx(q, rel=1e-12)
            assert r["surv"] == pytest.approx(s, rel=1e-12)

    def test_no_censoring_matches_empirical(self, spark):
        rows = [(t, 1) for t in [1, 2, 3, 8, 9, 15]]
        out = {
            r["interval"]: r
            for r in life_table(
                _surv_df(spark, rows), ["key"], "dur", "event", width=7
            ).collect()
        }
        # S after interval 0 = 3/6, after 1 = 1/6, after 2 = 0
        assert out[0]["surv"] == pytest.approx(0.5)
        assert out[1]["surv"] == pytest.approx(1 / 6)
        assert out[2]["surv"] == pytest.approx(0.0)

    def test_all_censored_interval_null_q(self, spark):
        rows = [(1, 0), (2, 0)]  # one interval, all censored
        out = life_table(
            _surv_df(spark, rows), ["key"], "dur", "event", width=7
        ).collect()[0]
        assert out["n_eff"] == pytest.approx(1.0)  # 2 - 2/2
        assert out["q"] == pytest.approx(0.0)
        assert out["surv"] == pytest.approx(1.0)

    def test_half_censor_adjustment(self, spark):
        rows = [(1, 1), (2, 0), (3, 0)]  # d=1, c=2 -> n_eff = 3-1 = 2
        out = life_table(
            _surv_df(spark, rows), ["key"], "dur", "event", width=7
        ).collect()[0]
        assert out["n_eff"] == pytest.approx(2.0)
        assert out["q"] == pytest.approx(0.5)

    def test_refusals(self, spark):
        df = _surv_df(spark, LT_ROWS)
        with pytest.raises(ValueError, match="width"):
            life_table(df, ["key"], "dur", "event", width=0)
        with pytest.raises(ValueError, match="max_points"):
            life_table(df, ["key"], "dur", "event", width=1, max_points=3)


def _two_arm(spark, a_rows, b_rows):
    rows = [("a", t, e) for t, e in a_rows] + [
        ("b", t, e) for t, e in b_rows
    ]
    return spark.createDataFrame(
        rows, "cohort string, dur int, event int"
    )


def _wlr_ref(a_rows, b_rows, mode):
    """Python twin: grid, risk sets, weighted fold."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # d1,d2,c1,c2
    for t, e in a_rows:
        cells[t][0 if e else 2] += 1
    for t, e in b_rows:
        cells[t][1 if e else 3] += 1
    n1 = len(a_rows)
    n2 = len(b_rows)
    z = v = 0.0
    s = 1.0
    for t in sorted(cells):
        d1, d2, c1, c2 = cells[t]
        n = n1 + n2
        d = d1 + d2
        oe = d1 - d * n1 / n
        vt = (
            d * (n1 / n) * (n2 / n) * ((n - d) / (n - 1))
            if n > 1
            else 0.0
        )
        s_inc = s * (1.0 - d / (n + 1.0))
        w = {
            "gehan": float(n),
            "tarone_ware": math.sqrt(n),
            "peto": s_inc,
            "logrank": 1.0,
        }[mode]
        z += w * oe
        v += w * w * vt
        s = s_inc
        n1 -= d1 + c1
        n2 -= d2 + c2
    return z, v, z * z / v if v > 0 else None


A_ROWS = [(1, 1), (3, 1), (5, 0), (8, 1), (12, 0), (15, 1), (20, 1)]
B_ROWS = [(2, 1), (2, 1), (4, 1), (7, 1), (9, 0), (11, 1), (14, 1)]


class TestWeightedLogrank:
    @pytest.mark.parametrize(
        "mode", ["gehan", "tarone_ware", "peto", "logrank"]
    )
    def test_vs_python_reference(self, spark, mode):
        out = weighted_logrank(
            _two_arm(spark, A_ROWS, B_ROWS),
            "cohort", "a", "b", "dur", "event", weight=mode,
        ).collect()[0]
        z, v, chi2 = _wlr_ref(A_ROWS, B_ROWS, mode)
        assert out["n_a"] == 7 and out["n_b"] == 7
        assert out["z"] == pytest.approx(z, rel=1e-12)
        assert out["v"] == pytest.approx(v, rel=1e-12)
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
        assert out["weight"] == mode

    def test_logrank_mode_reduces_to_l160(self, spark):
        df = _two_arm(spark, A_ROWS, B_ROWS)
        wl = weighted_logrank(
            df, "cohort", "a", "b", "dur", "event", weight="logrank"
        ).collect()[0]
        lr = logrank_test(
            df, "cohort", "a", "b", "dur", "event"
        ).collect()[0]
        assert wl["chi2"] == pytest.approx(lr["chi2"], rel=1e-12)
        assert wl["v"] == pytest.approx(lr["v"], rel=1e-12)

    def test_gehan_weights_early_divergence_more(self, spark):
        # arms differ ONLY early (first two event times), identical late
        a = [(1, 1), (2, 1)] + [(t, 1) for t in range(10, 16)]
        b = [(5, 1), (6, 1)] + [(t, 1) for t in range(10, 16)]
        df = _two_arm(spark, a, b)
        ge = weighted_logrank(
            df, "cohort", "a", "b", "dur", "event", weight="gehan"
        ).collect()[0]
        lr = weighted_logrank(
            df, "cohort", "a", "b", "dur", "event", weight="logrank"
        ).collect()[0]
        assert ge["chi2"] > lr["chi2"]

    def test_identical_arms_zero_z(self, spark):
        rows = [(1, 1), (2, 1), (3, 0), (5, 1)]
        out = weighted_logrank(
            _two_arm(spark, rows, rows),
            "cohort", "a", "b", "dur", "event",
        ).collect()[0]
        assert out["z"] == pytest.approx(0.0, abs=1e-12)

    def test_no_events_null_chi2(self, spark):
        out = weighted_logrank(
            _two_arm(spark, [(1, 0), (2, 0)], [(1, 0), (3, 0)]),
            "cohort", "a", "b", "dur", "event",
        ).collect()[0]
        assert out["chi2"] is None and out["o1"] == 0

    def test_unknown_weight_refused(self, spark):
        df = _two_arm(spark, A_ROWS, B_ROWS)
        with pytest.raises(ValueError, match="unknown weight"):
            weighted_logrank(
                df, "cohort", "a", "b", "dur", "event", weight="wilcoxon"
            )
