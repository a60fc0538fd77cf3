"""Hodges-Lehmann estimator (L225) and the ordinal-association panel
(gamma / Somers' D / Stuart's tau-c, L226)."""

import itertools

import pytest

from lmss_entity_extractor_spark.ops.correlation import (
    kendall_tau_b,
    ordinal_association,
)
from lmss_entity_extractor_spark.ops.trend import hodges_lehmann


def _hl_py(xs):
    ws = sorted(x + y for x, y in itertools.combinations_with_replacement(sorted(xs), 2))
    k = len(ws)
    if k % 2 == 1:
        return ws[k // 2] / 2.0
    return (ws[k // 2 - 1] + ws[k // 2]) / 4.0


class TestHodgesLehmann:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference_odd(self, spark):
        xs = [1.0, 2.5, 4.0, 100.0, 3.25]
        out = hodges_lehmann(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["hl"] == _hl_py(xs)
        assert out["n"] == 5 and out["n_pairs"] == 15

    def test_matches_python_reference_even(self, spark):
        xs = [1.0, 2.0, 3.0, 10.0]
        out = hodges_lehmann(self._df(spark, xs), ["g"], "x").collect()[0]
        assert out["hl"] == _hl_py(xs)
        assert out["n_pairs"] == 10

    def test_robust_to_outlier(self, spark):
        base = [10.0, 11.0, 12.0, 13.0, 14.0]
        a = hodges_lehmann(self._df(spark, base), ["g"], "x").collect()[0]
        b = hodges_lehmann(
            self._df(spark, base[:-1] + [10000.0]), ["g"], "x"
        ).collect()[0]
        assert a["hl"] == 12.0
        assert abs(b["hl"] - 12.0) < 2.0  # mean would be ~2009

    def test_single_value(self, spark):
        out = hodges_lehmann(self._df(spark, [7.0]), ["g"], "x").collect()[0]
        assert out["hl"] == 7.0 and out["n_pairs"] == 1

    def test_max_len_refused(self, spark):
        df = self._df(spark, [float(i) for i in range(30)])
        with pytest.raises(ValueError, match="max_len"):
            hodges_lehmann(df, ["g"], "x", max_len=10)

    def test_parallelism_invariance(self, spark):
        xs = [float((i * 13) % 17) for i in range(50)]
        df = self._df(spark, xs)
        a = hodges_lehmann(df.repartition(1), ["g"], "x").collect()[0]
        b = hodges_lehmann(df.repartition(8), ["g"], "x").collect()[0]
        assert a == b


def _panel_py(pairs):
    n = len(pairs)
    conc = disc = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            conc += 1
        elif s < 0:
            disc += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    tx = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in pairs).values())
    ty = sum(t * (t - 1) // 2 for t in Counter(y for _, y in pairs).values())
    m = min(len({x for x, _ in pairs}), len({y for _, y in pairs}))
    gamma = (conc - disc) / (conc + disc) if conc + disc else None
    dyx = (conc - disc) / (n0 - tx) if n0 > tx else None
    dxy = (conc - disc) / (n0 - ty) if n0 > ty else None
    tau_c = (
        2 * m * (conc - disc) / (n * n * (m - 1)) if m >= 2 else None
    )
    return conc, disc, gamma, dyx, dxy, tau_c


class TestOrdinalAssociation:
    def _df(self, spark, pairs, g="g1"):
        return spark.createDataFrame(
            [(g, int(x), int(y)) for x, y in pairs],
            "g string, x int, y int",
        )

    def test_matches_python_reference(self, spark):
        pairs = [(1, 2), (1, 3), (2, 2), (2, 5), (3, 1),
                 (3, 3), (4, 4), (4, 4), (5, 6), (5, 2)]
        out = ordinal_association(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        conc, disc, gamma, dyx, dxy, tau_c = _panel_py(pairs)
        assert out["concordant"] == conc and out["discordant"] == disc
        assert out["gamma"] == pytest.approx(gamma, rel=1e-12)
        assert out["somers_d_yx"] == pytest.approx(dyx, rel=1e-12)
        assert out["somers_d_xy"] == pytest.approx(dxy, rel=1e-12)
        assert out["tau_c"] == pytest.approx(tau_c, rel=1e-12)

    def test_perfect_agreement(self, spark):
        pairs = [(i, i) for i in range(1, 6)]
        out = ordinal_association(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert out["gamma"] == 1.0
        assert out["somers_d_yx"] == 1.0 and out["somers_d_xy"] == 1.0

    def test_constant_axis_nulls(self, spark):
        pairs = [(1, 2), (2, 2), (3, 2)]
        out = ordinal_association(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        assert out["gamma"] is None  # no discriminating pairs
        assert out["somers_d_yx"] == 0.0  # untied-on-x pairs exist
        assert out["somers_d_xy"] is None  # every pair tied on y
        assert out["tau_c"] is None  # m = 1

    def test_tau_b_unchanged_by_refactor(self, spark):
        pairs = [(1, 2), (1, 3), (2, 2), (2, 5), (3, 1), (3, 3)]
        out = kendall_tau_b(
            self._df(spark, pairs), ["g"], "x", "y"
        ).collect()[0]
        conc, disc, *_ = _panel_py(pairs)
        assert out["concordant"] == conc and out["discordant"] == disc
        assert out["tau_b"] is not None
