"""Horvitz-Thompson (L323) and p-chart (L324)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.sampling import ht_estimator, p_chart


def _ht_py(pairs):
    total = sum(y / p for y, p in pairs)
    var = sum((1 - p) * (y / p) ** 2 for y, p in pairs)
    return total, var


class TestHt:
    def _df(self, spark, pairs, g="g1"):
        return spark.createDataFrame(
            [(g, float(y), float(p)) for y, p in pairs],
            "g string, y double, p double",
        )

    def test_matches_python_reference(self, spark):
        pairs = [(10, 0.5), (20, 0.5), (7, 0.25), (3, 0.25),
                 (100, 1.0), (5, 0.1)]
        row = ht_estimator(self._df(spark, pairs), ["g"], "y", "p")
        got = row.collect()[0]
        total, var = _ht_py(pairs)
        assert got["total_ht"] == pytest.approx(total, rel=1e-12)
        assert got["var_ht"] == pytest.approx(var, rel=1e-12)

    def test_census_zero_variance(self, spark):
        pairs = [(10, 1.0), (20, 1.0), (30, 1.0)]
        got = ht_estimator(
            self._df(spark, pairs), ["g"], "y", "p"
        ).collect()[0]
        assert got["total_ht"] == pytest.approx(60.0)
        assert got["var_ht"] == 0.0

    def test_bad_prob_refused(self, spark):
        with pytest.raises(ValueError, match="inclusion prob"):
            ht_estimator(
                self._df(spark, [(1, 0.0)]), ["g"], "y", "p"
            )


class TestPChart:
    def _df(self, spark, groups, g="g1"):
        rows = [
            (g, sg, int(d))
            for sg, defects in groups.items()
            for d in defects
        ]
        return spark.createDataFrame(
            rows, "g string, sg string, d int"
        )

    def test_limits_and_flags(self, spark):
        groups = {
            "d1": [0] * 95 + [1] * 5,
            "d2": [0] * 94 + [1] * 6,
            "d3": [0] * 96 + [1] * 4,
            "d4": [0] * 70 + [1] * 30,  # out of control
        }
        rows = {
            r["subgroup"]: r
            for r in p_chart(
                self._df(spark, groups), ["g"], "sg", "d"
            ).collect()
        }
        tx = 5 + 6 + 4 + 30
        tn = 400
        pbar = tx / tn
        for sg, r in rows.items():
            ni = len(groups[sg])
            spread = 3 * math.sqrt(pbar * (1 - pbar) / ni)
            assert r["p_bar"] == pytest.approx(pbar, rel=1e-12)
            assert r["ucl"] == pytest.approx(
                min(1.0, pbar + spread), rel=1e-12
            )
            assert r["lcl"] == pytest.approx(
                max(0.0, pbar - spread), rel=1e-12
            )
        assert rows["d4"]["out_of_control"] is True
        assert rows["d1"]["out_of_control"] is False

    def test_degenerate_centre_null(self, spark):
        groups = {"d1": [0] * 10, "d2": [0] * 10}
        rows = p_chart(
            self._df(spark, groups), ["g"], "sg", "d"
        ).collect()
        assert all(r["ucl"] is None for r in rows)
