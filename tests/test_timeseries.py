"""EWMA closed form (ops/timeseries.py): recurrence equivalence,
exactness at alpha=1/2, multi-key isolation, guards.
"""

from __future__ import annotations

import pytest

from lmss_entity_extractor_spark.ops.timeseries import ewma


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)], "k string, t int, x double"
    )


def _ref(vals, alpha):
    e = [float(vals[0])]
    for x in vals[1:]:
        e.append((1 - alpha) * e[-1] + alpha * x)
    return e


def _got(df):
    return [r["ewma"] for r in df.orderBy("k", "t").collect()]


def test_matches_recurrence_exactly_at_half(spark):
    vals = [10, 2, 8, 4, 16, 1, 7, 3]
    out = ewma(_series(spark, vals), "k", "t", "x", alpha=0.5)
    assert _got(out) == _ref(vals, 0.5)  # dyadic-exact: == not approx


def test_matches_recurrence_general_alpha(spark):
    vals = [5, 1, 9, 2, 6]
    out = ewma(_series(spark, vals), "k", "t", "x", alpha=0.3)
    for got, want in zip(_got(out), _ref(vals, 0.3)):
        assert got == pytest.approx(want, rel=1e-12)


def test_first_row_is_identity_and_keys_isolated(spark):
    a = _series(spark, [100, 0], key="a")
    b = _series(spark, [4], key="b")
    out = ewma(a.unionByName(b), "k", "t", "x")
    rows = {(r["k"], r["t"]): r["ewma"] for r in out.collect()}
    assert rows[("a", 0)] == 100.0 and rows[("a", 1)] == 50.0
    assert rows[("b", 0)] == 4.0  # b's series never sees a's values


def test_alpha_validated_and_length_guard_loud(spark):
    with pytest.raises(ValueError, match="alpha"):
        ewma(_series(spark, [1]), "k", "t", "x", alpha=1.0)
    long = _series(spark, range(30))
    with pytest.raises(Exception, match="max_len"):
        ewma(long, "k", "t", "x", max_len=10).collect()


class TestForecastAccuracy:
    def _df(self, spark, series):
        rows = [
            ("g", t, float(y), float(p))
            for t, (y, p) in enumerate(series)
        ]
        return spark.createDataFrame(
            rows, "g string, t int, y double, p double"
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import (
            forecast_accuracy,
        )

        ys = [3, 5, 4, 6, 8, 7, 9, 12, 10, 11]
        ps = [2, 4, 5, 5, 7, 8, 8, 11, 11, 10]
        series = list(zip(ys, ps))
        r = forecast_accuracy(
            self._df(spark, series), ["g"], "t", "y", "p", season=1
        ).collect()[0]
        n = len(ys)
        es = [y - p for y, p in series]
        mae = sum(abs(e) for e in es) / n
        rmse = (sum(e * e for e in es) / n) ** 0.5
        wape = sum(abs(e) for e in es) / sum(abs(y) for y in ys)
        naive = [abs(ys[i] - ys[i - 1]) for i in range(1, n)]
        mase = mae / (sum(naive) / len(naive))
        assert r["n"] == n
        assert abs(r["mae"] - mae) < 1e-12
        assert abs(r["rmse"] - rmse) < 1e-12
        assert abs(r["wape"] - wape) < 1e-12
        assert abs(r["mase"] - mase) < 1e-12

    def test_seasonal_naive(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import (
            forecast_accuracy,
        )

        ys = [10, 20, 30, 11, 21, 31, 12, 22, 32]
        ps = ys  # perfect forecast: mae = 0, mase = 0
        r = forecast_accuracy(
            self._df(spark, list(zip(ys, ps))), ["g"], "t", "y", "p",
            season=3,
        ).collect()[0]
        assert r["mae"] == 0.0 and r["mase"] == 0.0

    def test_constant_series_null_mase(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import (
            forecast_accuracy,
        )

        series = [(5, 4)] * 6
        r = forecast_accuracy(
            self._df(spark, series), ["g"], "t", "y", "p"
        ).collect()[0]
        assert r["mase"] is None and r["mae"] == 1.0

    def test_duplicate_order_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.timeseries import (
            forecast_accuracy,
        )

        df = spark.createDataFrame(
            [("g", 1, 1.0, 1.0), ("g", 1, 2.0, 2.0)],
            "g string, t int, y double, p double",
        )
        with pytest.raises(ValueError, match="duplicate"):
            forecast_accuracy(df, ["g"], "t", "y", "p").collect()


class TestRollingSlope:
    def _df(self, spark, series):
        return spark.createDataFrame(
            [("g", float(t), float(y)) for t, y in series],
            "g string, t double, y double",
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import rolling_slope

        series = [(t, 2.0 * t * t - 3 * t + 1) for t in range(12)]
        out = {
            r["t"]: (r["n_win"], r["slope"])
            for r in rolling_slope(
                self._df(spark, series), ["g"], "t", "y", window_rows=4
            ).collect()
        }
        for i, (t, _) in enumerate(series):
            frame = series[max(0, i - 3): i + 1]
            n = len(frame)
            sx = sum(x for x, _ in frame)
            sy = sum(y for _, y in frame)
            sxx = sum(x * x for x, _ in frame)
            sxy = sum(x * y for x, y in frame)
            varx = n * sxx - sx * sx
            ref = (n * sxy - sx * sy) / varx if n >= 2 and varx else None
            got_n, got_s = out[float(t)]
            assert got_n == n
            if ref is None:
                assert got_s is None
            else:
                assert abs(got_s - ref) < 1e-9

    def test_linear_series_constant_slope(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import rolling_slope

        series = [(t, 5.0 * t + 2) for t in range(10)]
        rows = rolling_slope(
            self._df(spark, series), ["g"], "t", "y", window_rows=5
        ).collect()
        for r in rows:
            if r["n_win"] >= 2:
                assert abs(r["slope"] - 5.0) < 1e-9

    def test_first_row_null(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import rolling_slope

        series = [(1, 4.0), (2, 6.0)]
        rows = sorted(
            rolling_slope(
                self._df(spark, series), ["g"], "t", "y", window_rows=3
            ).collect(),
            key=lambda r: r["t"],
        )
        assert rows[0]["slope"] is None  # n_win = 1
        assert abs(rows[1]["slope"] - 2.0) < 1e-12

    def test_duplicate_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.timeseries import rolling_slope

        df = self._df(spark, [(1, 1.0), (1, 2.0)])
        with pytest.raises(ValueError, match="duplicate"):
            rolling_slope(df, ["g"], "t", "y")


class TestDurbinWatson:
    def _df(self, spark, series):
        return spark.createDataFrame(
            [("g", t, float(v)) for t, v in enumerate(series)],
            "g string, t int, v double",
        )

    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import durbin_watson

        series = [1.0, -2.0, 3.0, -1.0, 2.0, -3.0, 1.5]
        diffs = [series[i] - series[i - 1] for i in range(1, len(series))]
        ref = sum(d * d for d in diffs) / sum(v * v for v in series)
        r = durbin_watson(self._df(spark, series), ["g"], "t", "v").collect()[0]
        assert r["n"] == len(series)
        assert abs(r["dw"] - ref) < 1e-12

    def test_alternating_near_four(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import durbin_watson

        series = [1.0 if i % 2 == 0 else -1.0 for i in range(50)]
        r = durbin_watson(self._df(spark, series), ["g"], "t", "v").collect()[0]
        assert r["dw"] > 3.8

    def test_smooth_near_zero(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import durbin_watson

        series = [float(100 + i * 0.01) for i in range(50)]
        r = durbin_watson(self._df(spark, series), ["g"], "t", "v").collect()[0]
        assert r["dw"] < 0.1

    def test_all_zero_null(self, spark):
        from lmss_entity_extractor_spark.ops.timeseries import durbin_watson

        r = durbin_watson(
            self._df(spark, [0.0, 0.0, 0.0]), ["g"], "t", "v"
        ).collect()[0]
        assert r["dw"] is None
