"""FWER p-value adjustment panel (L355) and Siegel repeated median (L356)."""

import pytest

from lmss_entity_extractor_spark.ops.effectsize import pvalue_adjust
from lmss_entity_extractor_spark.ops.trend import siegel_slope


def _adjust_py(ps):
    """R p.adjust conventions over (id, p) pairs sorted by (p, id)."""
    order = sorted(range(len(ps)), key=lambda i: (ps[i][1], ps[i][0]))
    m = len(ps)
    raw = [(m - r) * ps[i][1] for r, i in enumerate(order)]
    holm, run = [], 0.0
    for v in raw:
        run = max(run, v)
        holm.append(min(1.0, run))
    hoch, run = [None] * m, float("inf")
    for r in range(m - 1, -1, -1):
        run = min(run, raw[r])
        hoch[r] = min(1.0, run)
    out = {}
    for r, i in enumerate(order):
        out[ps[i][0]] = (
            min(1.0, m * ps[i][1]), holm[r], hoch[r],
        )
    return out


def _med(vs):
    s = sorted(vs)
    k = len(s)
    return s[k // 2] if k % 2 == 1 else (s[k // 2 - 1] + s[k // 2]) / 2.0


def _siegel_py(ts, xs):
    meds = []
    pts = list(zip(ts, xs))
    for i, (ti, xi) in enumerate(pts):
        ss = [
            (xj - xi) / (tj - ti)
            for j, (tj, xj) in enumerate(pts)
            if j != i and tj != ti
        ]
        if ss:
            meds.append((_med(ss), ti, xi))
    b = _med([m for m, _, _ in meds])
    a = _med([x - b * t for _, t, x in meds])
    return b, a


class TestPvalueAdjust:
    def _df(self, spark, ps):
        return spark.createDataFrame(
            [(t, float(p)) for t, p in ps], "test string, p double"
        )

    def test_matches_r_conventions(self, spark):
        ps = [("t1", 0.01), ("t2", 0.04), ("t3", 0.03), ("t4", 0.005)]
        rows = {r["test"]: r for r in pvalue_adjust(
            self._df(spark, ps), "test", "p"
        ).collect()}
        ref = _adjust_py(ps)
        for t, (bonf, holm, hoch) in ref.items():
            assert rows[t]["p_bonferroni"] == pytest.approx(bonf, rel=1e-12)
            assert rows[t]["p_holm"] == pytest.approx(holm, rel=1e-12)
            assert rows[t]["p_hochberg"] == pytest.approx(hoch, rel=1e-12)

    def test_monotone_and_ordered(self, spark):
        ps = [(f"t{i}", 0.002 * (i + 1) ** 2) for i in range(10)]
        rows = sorted(
            pvalue_adjust(self._df(spark, ps), "test", "p").collect(),
            key=lambda r: r["rank"],
        )
        for a, b in zip(rows, rows[1:]):
            assert a["p_holm"] <= b["p_holm"] + 1e-15
            assert a["p_hochberg"] <= b["p_hochberg"] + 1e-15
        for r in rows:
            # hochberg is never more conservative than holm
            assert r["p_hochberg"] <= r["p_holm"] + 1e-15
            assert r["p_holm"] <= r["p_bonferroni"] + 1e-15

    def test_clamped_at_one(self, spark):
        ps = [("a", 0.9), ("b", 0.8), ("c", 0.95)]
        rows = pvalue_adjust(self._df(spark, ps), "test", "p").collect()
        for r in rows:
            assert r["p_bonferroni"] == 1.0 and r["p_holm"] <= 1.0

    def test_grouped_families(self, spark):
        df = spark.createDataFrame(
            [("f1", "a", 0.01), ("f1", "b", 0.5), ("f2", "a", 0.01)],
            "fam string, test string, p double",
        )
        rows = {(r["fam"], r["test"]): r for r in pvalue_adjust(
            df, "test", "p", by=["fam"]
        ).collect()}
        assert rows[("f1", "a")]["m"] == 2
        assert rows[("f2", "a")]["m"] == 1
        assert rows[("f2", "a")]["p_bonferroni"] == pytest.approx(0.01)

    def test_bad_p_refused(self, spark):
        with pytest.raises(ValueError, match="outside"):
            pvalue_adjust(
                self._df(spark, [("a", 1.5)]), "test", "p"
            )


class TestSiegel:
    def _df(self, spark, ts, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(t), float(x)) for t, x in zip(ts, xs)],
            "g string, t double, x double",
        )

    def test_matches_python_reference(self, spark):
        ts = [float(i) for i in range(11)]
        xs = [2.0 * t + ((int(t) * 7) % 5) * 0.1 for t in ts]
        row = siegel_slope(
            self._df(spark, ts, xs), ["g"], "t", "x"
        ).collect()[0]
        b, a = _siegel_py(ts, xs)
        assert row["slope"] == pytest.approx(b, rel=1e-12)
        assert row["intercept"] == pytest.approx(a, rel=1e-12)

    def test_survives_nearly_half_garbage(self, spark):
        ts = [float(i) for i in range(21)]
        xs = [3.0 * t + 1.0 for t in ts]
        for i in range(1, 21, 2):  # poison 10 of 21 points
            xs[i] = 1000.0 + 17.0 * i
        row = siegel_slope(
            self._df(spark, ts, xs), ["g"], "t", "x"
        ).collect()[0]
        assert row["slope"] == pytest.approx(3.0, abs=0.2)

    def test_matches_reference_even_count(self, spark):
        ts = [float(i) for i in range(8)]
        xs = [1.5 * t - 2.0 + ((int(t) * 3) % 4) * 0.25 for t in ts]
        row = siegel_slope(
            self._df(spark, ts, xs), ["g"], "t", "x"
        ).collect()[0]
        b, a = _siegel_py(ts, xs)
        assert row["slope"] == pytest.approx(b, rel=1e-12)
        assert row["intercept"] == pytest.approx(a, rel=1e-12)

    def test_max_len_refused(self, spark):
        with pytest.raises(ValueError, match="max_len"):
            siegel_slope(
                self._df(spark, [0.0, 1.0, 2.0], [1.0, 2.0, 3.0]),
                ["g"], "t", "x", max_len=2,
            )
