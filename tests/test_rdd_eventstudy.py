"""Sharp regression discontinuity (L377) and event study (L378)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.regression import (
    event_study,
    rdd_sharp,
)


def _fit(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return slope, (sy - slope * sx) / n


def _rdd_df(spark, rows, key="k1"):
    return spark.createDataFrame(
        [(key, x, y) for x, y in rows], "key string, x double, y double"
    )


class TestRddSharp:
    def test_recovers_a_known_jump(self, spark):
        # y = 2 + 0.5x below 10, y = 7 + 0.5x at/above 10 -> tau = 5
        rows = [(float(x), 2.0 + 0.5 * x) for x in range(4, 10)] + [
            (float(x), 7.0 + 0.5 * x) for x in range(10, 16)
        ]
        out = rdd_sharp(
            _rdd_df(spark, rows), ["key"], "x", "y", "10", "6"
        ).collect()[0]
        assert out["n_below"] == 6 and out["n_above"] == 6
        assert out["slope_below"] == pytest.approx(0.5, rel=1e-9)
        assert out["slope_above"] == pytest.approx(0.5, rel=1e-9)
        # limits are intercepts AT the cutoff: 2+0.5*10 and 7+0.5*10
        assert out["limit_below"] == pytest.approx(7.0, rel=1e-9)
        assert out["limit_above"] == pytest.approx(12.0, rel=1e-9)
        assert out["tau"] == pytest.approx(5.0, rel=1e-9)

    def test_vs_python_reference(self, spark):
        rows = [
            (float(i % 20), 3.0 + 0.25 * (i % 20) + 0.01 * ((i * 7) % 5))
            for i in range(60)
        ]
        out = rdd_sharp(
            _rdd_df(spark, rows), ["key"], "x", "y", "10", "5"
        ).collect()[0]
        below = [(x - 10, y) for x, y in rows if -5 <= x - 10 < 0]
        above = [(x - 10, y) for x, y in rows if 0 <= x - 10 <= 5]
        sb, lb = _fit(below)
        sa, la = _fit(above)
        assert out["n_below"] == len(below)
        assert out["n_above"] == len(above)
        assert out["slope_below"] == pytest.approx(sb, rel=1e-9)
        assert out["limit_above"] == pytest.approx(la, rel=1e-9)
        assert out["tau"] == pytest.approx(la - lb, rel=1e-9)

    def test_window_is_inclusive_and_sided(self, spark):
        # xc = -h and xc = +h retained; cutoff row goes to the above side
        rows = [(4.0, 1.0), (7.0, 2.0), (10.0, 3.0), (13.0, 4.0), (16.0, 5.0)]
        out = rdd_sharp(
            _rdd_df(spark, rows), ["key"], "x", "y", "10", "6"
        ).collect()[0]
        assert out["n_below"] == 2 and out["n_above"] == 3
        # 3.0 and 19.0 would fall outside a ±6 window around 10? 16 is in
        out2 = rdd_sharp(
            _rdd_df(spark, rows + [(3.0, 9.0), (17.0, 9.0)]),
            ["key"], "x", "y", "10", "6",
        ).collect()[0]
        assert out2["n_below"] == 2 and out2["n_above"] == 3

    def test_degenerate_side_nulls(self, spark):
        rows = [(9.0, 1.0), (11.0, 2.0), (12.0, 3.0)]
        out = rdd_sharp(
            _rdd_df(spark, rows), ["key"], "x", "y", "10", "3"
        ).collect()[0]
        assert out["slope_below"] is None and out["limit_below"] is None
        assert out["tau"] is None
        assert out["slope_above"] is not None

    def test_refusals(self, spark):
        df = _rdd_df(spark, [(1.0, 1.0)])
        with pytest.raises(ValueError, match="decimal strings"):
            rdd_sharp(df, ["key"], "x", "y", "abc", "5")
        with pytest.raises(ValueError, match="bandwidth"):
            rdd_sharp(df, ["key"], "x", "y", "10", "0")


def _es_df(spark, rows, key="k1"):
    return spark.createDataFrame(
        [(key, r, v) for r, v in rows], "key string, rel int, v double"
    )


class TestEventStudy:
    def test_vs_python_reference(self, spark):
        rows = []
        vals = {}
        for r in range(-3, 4):
            vs = [10.0 + 2.0 * max(r, 0) + 0.5 * i for i in range(5)]
            vals[r] = vs
            rows += [(r, v) for v in vs]
        out = {
            row["rel_period"]: row
            for row in event_study(
                _es_df(spark, rows), ["key"], "rel", "v"
            ).collect()
        }
        mb = sum(vals[-1]) / 5
        vb = sum((x - mb) ** 2 for x in vals[-1]) / 4
        for r in range(-3, 4):
            m = sum(vals[r]) / 5
            assert out[r]["mean"] == pytest.approx(m, rel=1e-12)
            if r == -1:
                assert out[r]["effect"] == 0.0
                assert out[r]["se"] is None and out[r]["t"] is None
                continue
            v = sum((x - m) ** 2 for x in vals[r]) / 4
            assert out[r]["effect"] == pytest.approx(m - mb, rel=1e-12)
            assert out[r]["se"] == pytest.approx(
                math.sqrt(v / 5 + vb / 5), rel=1e-9
            )
        # flat pre-trend, jump of 2 per post period
        assert out[-3]["effect"] == pytest.approx(0.0, abs=1e-12)
        assert out[2]["effect"] == pytest.approx(4.0, rel=1e-12)

    def test_missing_baseline_nulls_effects(self, spark):
        rows = [(0, 1.0), (0, 2.0), (1, 3.0), (1, 5.0)]
        out = event_study(_es_df(spark, rows), ["key"], "rel", "v").collect()
        assert all(r["effect"] is None for r in out)
        assert all(r["mean"] is not None for r in out)

    def test_small_n_null_se(self, spark):
        rows = [(-1, 1.0), (-1, 2.0), (0, 5.0)]
        out = {
            r["rel_period"]: r
            for r in event_study(
                _es_df(spark, rows), ["key"], "rel", "v"
            ).collect()
        }
        assert out[0]["effect"] == pytest.approx(3.5)
        assert out[0]["se"] is None and out[0]["t"] is None

    def test_custom_base_period(self, spark):
        rows = [(0, 1.0), (0, 3.0), (5, 2.0), (5, 8.0)]
        out = {
            r["rel_period"]: r
            for r in event_study(
                _es_df(spark, rows), ["key"], "rel", "v", base_period=0
            ).collect()
        }
        assert out[0]["effect"] == 0.0
        assert out[5]["effect"] == pytest.approx(3.0)

    def test_constant_values_null_se(self, spark):
        rows = [(-1, 2.0), (-1, 2.0), (3, 2.0), (3, 2.0)]
        out = {
            r["rel_period"]: r
            for r in event_study(
                _es_df(spark, rows), ["key"], "rel", "v"
            ).collect()
        }
        assert out[3]["effect"] == 0.0
        assert out[3]["se"] is None  # zero variance both sides
