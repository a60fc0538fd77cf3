"""One-way ICC(1,1) (L255) and Tukey-Kramer HSD pairs (L256)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import icc_oneway, tukey_hsd


def _icc_py(units):
    vals = [v for vs in units.values() for v in vs]
    n, j = len(vals), len(units)
    mean = sum(vals) / n
    ssb_units = sum(sum(vs) ** 2 / len(vs) for vs in units.values())
    ssb = ssb_units - sum(vals) ** 2 / n
    ssw = sum(v * v for v in vals) - ssb_units
    msb, msw = ssb / (j - 1), ssw / (n - j)
    k0 = (n - sum(len(vs) ** 2 for vs in units.values()) / n) / (j - 1)
    return msb, msw, k0, (msb - msw) / (msb + (k0 - 1) * msw)


class TestIcc:
    def _df(self, spark, units):
        rows = [(u, float(v)) for u, vs in units.items() for v in vs]
        return spark.createDataFrame(rows, "u string, v double")

    def test_matches_python_reference(self, spark):
        units = {
            "a": [9, 10, 11],
            "b": [1, 2, 2],
            "c": [5, 5, 6, 6],
            "d": [8, 7, 9],
        }
        out = icc_oneway(self._df(spark, units), [], "u", "v").collect()[0]
        msb, msw, k0, icc = _icc_py(units)
        assert out["msb"] == pytest.approx(msb, rel=1e-12)
        assert out["msw"] == pytest.approx(msw, rel=1e-12)
        assert out["k0"] == pytest.approx(k0, rel=1e-12)
        assert out["icc"] == pytest.approx(icc, rel=1e-12)

    def test_strong_clustering_high_icc(self, spark):
        units = {"a": [10.0, 10.25], "b": [50.0, 50.25], "c": [90.0, 90.25]}
        out = icc_oneway(self._df(spark, units), [], "u", "v").collect()[0]
        assert out["icc"] > 0.99

    def test_pure_noise_low_icc(self, spark):
        units = {"a": [1.0, 9.0], "b": [9.0, 1.0], "c": [1.0, 9.0]}
        out = icc_oneway(self._df(spark, units), [], "u", "v").collect()[0]
        assert out["icc"] < 0.0  # between-variance below within

    def test_single_unit_null(self, spark):
        out = icc_oneway(
            self._df(spark, {"a": [1.0, 2.0, 3.0]}), [], "u", "v"
        ).collect()[0]
        assert out["icc"] is None

    def test_max_units_refused(self, spark):
        units = {f"u{i}": [1.0] for i in range(30)}
        with pytest.raises(ValueError, match="max_units"):
            icc_oneway(self._df(spark, units), [], "u", "v", max_units=10)


def _tukey_py(groups):
    levels = sorted(groups)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(
        sum(x * x for x in vs) - sum(vs) ** 2 / len(vs)
        for vs in groups.values()
    )
    msw = ssw / (n - k)
    out = {}
    for i, a in enumerate(levels):
        for b in levels[i + 1:]:
            ma = sum(groups[a]) / len(groups[a])
            mb = sum(groups[b]) / len(groups[b])
            se = math.sqrt(
                (msw / 2) * (1 / len(groups[a]) + 1 / len(groups[b]))
            )
            out[(a, b)] = (ma - mb) / se
    return out


class TestTukey:
    def _df(self, spark, groups):
        rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "lvl string, v double")

    def test_matches_python_reference(self, spark):
        groups = {
            "a": [1, 2, 3, 4],
            "b": [5, 6, 7],
            "c": [2, 3, 4, 5, 6],
        }
        rows = tukey_hsd(self._df(spark, groups), [], "lvl", "v").collect()
        ref = _tukey_py(groups)
        assert len(rows) == 3
        for r in rows:
            assert r["q"] == pytest.approx(
                ref[(r["g_a"], r["g_b"])], rel=1e-12
            )

    def test_separated_pair_large_q(self, spark):
        groups = {"lo": [1, 2, 1, 2], "hi": [100, 101, 100, 101],
                  "mid": [50, 51, 50]}
        rows = {(r["g_a"], r["g_b"]): r["q"]
                for r in tukey_hsd(self._df(spark, groups), [], "lvl", "v").collect()}
        assert abs(rows[("hi", "lo")]) > 50

    def test_zero_within_variance_null(self, spark):
        groups = {"a": [5.0, 5.0], "b": [7.0, 7.0]}
        rows = tukey_hsd(self._df(spark, groups), [], "lvl", "v").collect()
        assert all(r["q"] is None for r in rows)

    def test_orientation_and_count(self, spark):
        groups = {g: [1.0, 2.0] for g in "abcd"}
        rows = tukey_hsd(self._df(spark, groups), [], "lvl", "v").collect()
        assert len(rows) == 6
        assert all(r["g_a"] < r["g_b"] for r in rows)
