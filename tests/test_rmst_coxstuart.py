"""Restricted mean survival time (L275) and Cox-Stuart trend test
(L276)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.survival import rmst
from lmss_entity_extractor_spark.ops.trend import cox_stuart


def _rmst_py(durations, events, tau):
    pts = {}
    for t, e in zip(durations, events):
        d, c = pts.get(t, (0, 0))
        pts[t] = (d + e, c + (1 - e))
    at_risk = len(durations)
    prev, s, area = 0.0, 1.0, 0.0
    for t in sorted(pts):
        d, c = pts[t]
        area += s * (min(float(t), tau) - min(prev, tau))
        s *= (at_risk - d) / at_risk
        at_risk -= d + c
        prev = float(t)
    area += s * max(tau - min(prev, tau), 0.0)
    return area


class TestRmst:
    def _df(self, spark, durs, evs, g="g1"):
        return spark.createDataFrame(
            [(g, int(t), int(e)) for t, e in zip(durs, evs)],
            "g string, t long, e int",
        )

    def test_matches_python_reference(self, spark):
        durs = [3, 5, 5, 8, 12, 15, 15, 20, 25, 30]
        evs = [1, 1, 0, 1, 0, 1, 1, 0, 1, 0]
        out = rmst(self._df(spark, durs, evs), ["g"], "t", "e", tau=28.0)
        row = out.collect()[0]
        assert row["n"] == 10 and row["events"] == 6
        assert row["rmst"] == pytest.approx(
            _rmst_py(durs, evs, 28.0), rel=1e-12
        )

    def test_no_events_rmst_equals_tau(self, spark):
        out = rmst(
            self._df(spark, [5, 9, 14], [0, 0, 0]), ["g"], "t", "e",
            tau=10.0,
        ).collect()[0]
        assert out["rmst"] == 10.0

    def test_all_die_at_zero(self, spark):
        out = rmst(
            self._df(spark, [0, 0], [1, 1]), ["g"], "t", "e", tau=7.0
        ).collect()[0]
        assert out["rmst"] == 0.0

    def test_tau_before_first_event(self, spark):
        out = rmst(
            self._df(spark, [10, 20], [1, 1]), ["g"], "t", "e", tau=5.0
        ).collect()[0]
        assert out["rmst"] == 5.0

    def test_bad_tau_refused(self, spark):
        with pytest.raises(ValueError, match="tau"):
            rmst(self._df(spark, [1], [1]), ["g"], "t", "e", tau=0.0)

    def test_negative_duration_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            rmst(self._df(spark, [-1, 2], [1, 1]), ["g"], "t", "e",
                 tau=5.0)


def _cs_py(xs):
    n = len(xs)
    m = n // 2
    plus = minus = 0
    for i in range(m):
        a, b = xs[i], xs[i + (n - m)] if n % 2 else xs[i + m]
        b = xs[i + m + (n % 2)]
        if b > a:
            plus += 1
        elif b < a:
            minus += 1
    return plus, minus


class TestCoxStuart:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(i), float(x)) for i, x in enumerate(xs)],
            "g string, t double, x double",
        )

    def test_even_length_counts(self, spark):
        xs = [1, 2, 3, 4, 10, 20, 30, 40]
        out = cox_stuart(self._df(spark, xs), ["g"], ["t"], "x")
        row = out.collect()[0]
        assert row["n"] == 8 and row["n_pairs"] == 4
        assert row["plus"] == 4 and row["minus"] == 0
        assert row["z"] == pytest.approx(2.0)

    def test_odd_length_drops_middle(self, spark):
        # n=7, m=3: pairs (x1,x4),(x2,x5),(x3,x6) in 1-based terms
        xs = [5, 5, 5, 99, 4, 6, 5]
        out = cox_stuart(self._df(spark, xs), ["g"], ["t"], "x")
        row = out.collect()[0]
        assert row["n_pairs"] == 3
        # pairs: (5,4)- (5,6)+ (5,5)tie -> plus=1 minus=1
        assert row["plus"] == 1 and row["minus"] == 1
        assert row["z"] == pytest.approx(0.0)

    def test_downtrend_negative_z(self, spark):
        xs = list(range(20, 0, -1))
        row = cox_stuart(self._df(spark, xs), ["g"], ["t"], "x").collect()[0]
        assert row["minus"] == 10 and row["plus"] == 0
        assert row["z"] == pytest.approx(-math.sqrt(10))

    def test_all_ties_null_z(self, spark):
        row = cox_stuart(
            self._df(spark, [3.0] * 6), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["z"] is None

    def test_null_refused(self, spark):
        df = self._df(spark, [1.0, 2.0]).union(
            spark.createDataFrame([("g1", 9.0, None)],
                                  "g string, t double, x double")
        )
        with pytest.raises(ValueError, match="NULL"):
            cox_stuart(df, ["g"], ["t"], "x")
