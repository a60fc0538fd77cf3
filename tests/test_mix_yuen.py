"""Mix-shift decomposition (L319) and Yuen's trimmed t (L320)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import (
    mix_shift_decomposition,
)
from lmss_entity_extractor_spark.ops.stattests import yuen_ttest


def _mix_py(cells):
    """cells: {(seg, grp): (s, t)}"""
    segs = sorted({k[0] for k in cells})
    tta = sum(cells[(s, "A")][1] for s in segs)
    ttb = sum(cells[(s, "B")][1] for s in segs)
    rate_eff = mix_eff = 0.0
    for s in segs:
        sa, ta = cells[(s, "A")]
        sb, tb = cells[(s, "B")]
        ra, rb = sa / ta, sb / tb
        wa, wb = ta / tta, tb / ttb
        rate_eff += (wa + wb) / 2 * (ra - rb)
        mix_eff += (ra + rb) / 2 * (wa - wb)
    ra_tot = sum(cells[(s, "A")][0] for s in segs) / tta
    rb_tot = sum(cells[(s, "B")][0] for s in segs) / ttb
    return ra_tot, rb_tot, rate_eff, mix_eff


class TestMixShift:
    CELLS = {
        ("mobile", "A"): (30, 300), ("mobile", "B"): (50, 200),
        ("web", "A"): (90, 600), ("web", "B"): (120, 900),
        ("api", "A"): (5, 100), ("api", "B"): (4, 50),
    }

    def _df(self, spark, cells, g="g1"):
        rows = [
            (g, seg, grp, int(s), int(t))
            for (seg, grp), (s, t) in cells.items()
        ]
        return spark.createDataFrame(
            rows, "g string, seg string, grp string, s long, t long"
        )

    def test_matches_python_and_identity(self, spark):
        row = mix_shift_decomposition(
            self._df(spark, self.CELLS), ["g"], "seg", "grp", "A", "B",
            "s", "t",
        ).collect()[0]
        ra, rb, re, me = _mix_py(self.CELLS)
        assert row["rate_a"] == pytest.approx(ra, rel=1e-12)
        assert row["rate_b"] == pytest.approx(rb, rel=1e-12)
        assert row["rate_effect"] == pytest.approx(re, rel=1e-9)
        assert row["mix_effect"] == pytest.approx(me, rel=1e-9)
        # Kitagawa identity: effects sum to the total delta
        assert row["rate_effect"] + row["mix_effect"] == pytest.approx(
            row["delta"], rel=1e-9
        )

    def test_pure_mix_shift(self, spark):
        # identical per-segment rates, different mix: rate effect 0
        cells = {
            ("m", "A"): (10, 100), ("m", "B"): (40, 400),
            ("w", "A"): (90, 300), ("w", "B"): (30, 100),
        }
        row = mix_shift_decomposition(
            self._df(spark, cells), ["g"], "seg", "grp", "A", "B",
            "s", "t",
        ).collect()[0]
        assert row["rate_effect"] == pytest.approx(0.0, abs=1e-12)
        assert row["mix_effect"] == pytest.approx(row["delta"], rel=1e-9)

    def test_one_sided_segment_refused(self, spark):
        cells = dict(self.CELLS)
        del cells[("api", "B")]
        with pytest.raises(ValueError, match="one side"):
            mix_shift_decomposition(
                self._df(spark, cells), ["g"], "seg", "grp", "A", "B",
                "s", "t",
            )


def _yuen_py(a, b, trim=20):
    def side(xs):
        xs = sorted(xs)
        n = len(xs)
        g = (n * trim) // 100
        h = n - 2 * g
        mid = xs[g:n - g]
        tmean = sum(mid) / h
        wx = [xs[g]] * g + mid + [xs[n - g - 1]] * g
        wbar = sum(wx) / n
        s2w = sum((x - wbar) ** 2 for x in wx) / (n - 1)
        return h, tmean, s2w * (n - 1) / (h * (h - 1))

    ha, ta_, da = side(a)
    hb, tb_, db = side(b)
    t = (ta_ - tb_) / math.sqrt(da + db)
    dfy = (da + db) ** 2 / (da * da / (ha - 1) + db * db / (hb - 1))
    return ha, hb, ta_, tb_, t, dfy


def _dfg(spark, a, b, g="g1"):
    rows = [(g, "A", float(x)) for x in a] + [
        (g, "B", float(x)) for x in b
    ]
    return spark.createDataFrame(rows, "g string, s string, x double")


class TestYuen:
    def test_matches_python_reference(self, spark):
        a = [10, 12, 11, 13, 12.5, 11.5, 14, 10.5, 13.5, 12.25]
        b = [9, 9.5, 10, 8.5, 9.25, 10.5, 8, 9.75, 10.25, 9.1]
        row = yuen_ttest(
            _dfg(spark, a, b), ["g"], "s", "A", "B", "x", trim_pct=20
        ).collect()[0]
        ha, hb, ta_, tb_, t, dfy = _yuen_py(a, b)
        assert row["h_a"] == ha and row["h_b"] == hb
        assert row["tmean_a"] == pytest.approx(ta_, rel=1e-9)
        assert row["tmean_b"] == pytest.approx(tb_, rel=1e-9)
        assert row["t"] == pytest.approx(t, rel=1e-9)
        assert row["df_y"] == pytest.approx(dfy, rel=1e-9)

    def test_outlier_resistant(self, spark):
        a = [10.0, 10.5, 11.0, 10.25, 10.75, 11.25, 10.1, 10.9,
             10.6, 1000.0]
        b = [9.0, 9.5, 10.0, 9.25, 9.75, 10.25, 9.1, 9.9, 9.6, 9.4]
        row = yuen_ttest(
            _dfg(spark, a, b), ["g"], "s", "A", "B", "x", trim_pct=20
        ).collect()[0]
        # the outlier is trimmed: the trimmed mean stays near 10.6
        assert 10.0 < row["tmean_a"] < 11.5
        assert row["t"] > 3.0

    def test_bad_trim_refused(self, spark):
        with pytest.raises(ValueError, match="trim_pct"):
            yuen_ttest(
                _dfg(spark, [1.0], [2.0]), ["g"], "s", "A", "B", "x",
                trim_pct=50,
            )
