"""Kaplan-Meier (L159) + log-rank test (L160)."""

import pytest

from lmss_entity_extractor_spark.ops.survival import kaplan_meier, logrank_test


def _km_py(pairs):
    """{t: (n, d, c, S)} — textbook product-limit over (dur, event)."""
    from collections import Counter

    d = Counter(t for t, e in pairs if e)
    c = Counter(t for t, e in pairs if not e)
    ts = sorted(set(d) | set(c))
    n = len(pairs)
    out, s = {}, 1.0
    for t in ts:
        s *= (n - d[t]) / n
        out[t] = (n, d[t], c[t], s)
        n -= d[t] + c[t]
    return out


def _df(spark, pairs, grp="g"):
    return spark.createDataFrame(
        [(grp, t, e) for t, e in pairs], "g string, dur int, ev int"
    )


class TestKaplanMeier:
    def test_matches_textbook(self, spark):
        pairs = [(1, 1), (2, 1), (2, 0), (3, 1), (5, 0), (5, 1), (8, 1), (9, 0)]
        rows = kaplan_meier(_df(spark, pairs), ["g"], "dur", "ev").collect()
        ref = _km_py(pairs)
        assert len(rows) == len(ref)
        for r in rows:
            n, d, c, s = ref[r["t"]]
            assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n, d, c)
            assert r["survival"] == pytest.approx(s, rel=1e-12)

    def test_censoring_is_not_an_event(self, spark):
        # all censored: survival stays exactly 1.0 at every point
        pairs = [(1, 0), (2, 0), (3, 0)]
        rows = kaplan_meier(_df(spark, pairs), ["g"], "dur", "ev").collect()
        assert all(r["survival"] == 1.0 for r in rows)

    def test_all_events_reach_zero(self, spark):
        pairs = [(1, 1), (2, 1)]
        rows = sorted(
            kaplan_meier(_df(spark, pairs), ["g"], "dur", "ev").collect(),
            key=lambda r: r["t"],
        )
        assert rows[0]["survival"] == 0.5
        assert rows[-1]["survival"] == 0.0

    def test_grid_guard(self, spark):
        pairs = [(t, 1) for t in range(50)]
        with pytest.raises(ValueError, match="max_points"):
            kaplan_meier(_df(spark, pairs), ["g"], "dur", "ev", max_points=10).collect()


def _lr_df(spark, a_pairs, b_pairs):
    rows = [("a", t, e) for t, e in a_pairs] + [("b", t, e) for t, e in b_pairs]
    return spark.createDataFrame(rows, "grp string, dur int, ev int")


def _logrank_py(a_pairs, b_pairs):
    from collections import Counter

    d1 = Counter(t for t, e in a_pairs if e)
    d2 = Counter(t for t, e in b_pairs if e)
    o1_ = Counter(t for t, _ in a_pairs)
    o2_ = Counter(t for t, _ in b_pairs)
    ts = sorted(set(o1_) | set(o2_))
    n1, n2 = len(a_pairs), len(b_pairs)
    oe = v = 0.0
    for t in ts:
        d = d1[t] + d2[t]
        n = n1 + n2
        if n > 1:
            v += d * (n1 / n) * (n2 / n) * ((n - d) / (n - 1))
        oe += d1[t] - d * n1 / n
        n1 -= o1_[t]
        n2 -= o2_[t]
    return oe, v


class TestLogrank:
    def test_matches_python(self, spark):
        a = [(1, 1), (3, 1), (4, 0), (7, 1), (9, 0)]
        b = [(2, 1), (2, 1), (3, 0), (5, 1), (8, 1), (9, 1)]
        row = logrank_test(
            _lr_df(spark, a, b), "grp", "a", "b", "dur", "ev"
        ).collect()[0]
        oe, v = _logrank_py(a, b)
        assert row["n_a"] == 5 and row["n_b"] == 6
        assert row["o1"] == 3
        assert row["e1"] == pytest.approx(row["o1"] - oe, rel=1e-12)
        assert row["v"] == pytest.approx(v, rel=1e-12)
        assert row["chi2"] == pytest.approx(oe * oe / v, rel=1e-12)

    def test_identical_arms_chi2_zero(self, spark):
        a = [(1, 1), (2, 0), (4, 1)]
        row = logrank_test(
            _lr_df(spark, a, a), "grp", "a", "b", "dur", "ev"
        ).collect()[0]
        assert row["chi2"] == 0.0

    def test_no_events_null(self, spark):
        a = [(1, 0), (2, 0)]
        b = [(1, 0), (3, 0)]
        row = logrank_test(
            _lr_df(spark, a, b), "grp", "a", "b", "dur", "ev"
        ).collect()[0]
        assert row["chi2"] is None and row["v"] == 0.0
