"""Erlang capacity panel (L395) and Weibull median-rank fit (L396)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.queueing import erlang_panel
from lmss_entity_extractor_spark.ops.reliability import weibull_fit


class TestErlang:
    def _run(self, spark, a, s):
        df = spark.createDataFrame([(a, s)], "a double, s int")
        return erlang_panel(df, "a", "s").collect()[0]

    def test_closed_form_b(self, spark):
        # B(s=2, a=1) = (1/2) / (1 + 1 + 1/2) = 0.2
        r = self._run(spark, 1.0, 2)
        assert r["blocking"] == pytest.approx(0.2)
        # C = 2*0.2 / (2 - 1*(0.8)) = 1/3
        assert r["delay_prob"] == pytest.approx(1 / 3)
        assert r["utilization"] == pytest.approx(0.5)

    def test_single_server(self, spark):
        # B(1, a) = a/(1+a); C defined for a < 1
        r = self._run(spark, 0.5, 1)
        assert r["blocking"] == pytest.approx(1 / 3)
        assert r["delay_prob"] == pytest.approx(0.5)

    def test_unstable_queue_null_c(self, spark):
        r = self._run(spark, 10.0, 5)
        assert r["delay_prob"] is None
        assert 0.0 < r["blocking"] < 1.0

    def test_python_reference_recurrence(self, spark):
        a, s = 7.3, 12
        b = 1.0
        for k in range(1, s + 1):
            b = a * b / (k + a * b)
        r = self._run(spark, a, s)
        assert r["blocking"] == pytest.approx(b, rel=1e-12)

    def test_more_servers_less_blocking(self, spark):
        bs = [self._run(spark, 4.0, s)["blocking"] for s in (2, 4, 8)]
        assert bs[0] > bs[1] > bs[2]

    def test_bad_load_refused(self, spark):
        df = spark.createDataFrame([(0.0, 2)], "a double, s int")
        with pytest.raises(ValueError, match="non-positive"):
            erlang_panel(df, "a", "s")

    def test_wide_refused(self, spark):
        df = spark.createDataFrame([(1.0, 100)], "a double, s int")
        with pytest.raises(ValueError, match="max_servers"):
            erlang_panel(df, "a", "s", max_servers=50)


def _weibull_sample(shape, scale, n):
    # inverse-CDF on the midpoint grid: deterministic, dense
    return [
        scale * (-math.log(1.0 - (i + 0.5) / n)) ** (1.0 / shape)
        for i in range(n)
    ]


class TestWeibull:
    def _fit(self, spark, ts):
        df = spark.createDataFrame(
            [("g", t) for t in ts], "k string, v double"
        )
        return weibull_fit(df, ["k"], "v").collect()[0]

    def test_recovers_parameters(self, spark):
        r = self._fit(spark, _weibull_sample(2.0, 10.0, 400))
        assert r["shape"] == pytest.approx(2.0, rel=0.05)
        assert r["scale"] == pytest.approx(10.0, rel=0.02)
        assert r["r2"] > 0.995

    def test_exponential_is_shape_one(self, spark):
        r = self._fit(spark, _weibull_sample(1.0, 5.0, 400))
        assert r["shape"] == pytest.approx(1.0, rel=0.05)
        assert r["scale"] == pytest.approx(5.0, rel=0.03)

    def test_python_reference_exact(self, spark):
        ts = [1.0, 3.0, 7.0, 2.0, 5.0]
        xs = sorted(ts)
        n = len(xs)
        pts = [
            (
                math.log(t),
                math.log(-math.log(1.0 - (i + 1 - 0.3) / (n + 0.4))),
            )
            for i, t in enumerate(xs)
        ]
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r = self._fit(spark, ts)
        assert r["shape"] == pytest.approx(slope, rel=1e-9)
        assert r["scale"] == pytest.approx(
            math.exp(-((sy - slope * sx) / n) / slope), rel=1e-9
        )

    def test_constant_sample_null(self, spark):
        r = self._fit(spark, [4.0] * 10)
        assert r["shape"] is None and r["scale"] is None

    def test_nonpositive_refused(self, spark):
        with pytest.raises(ValueError, match="non-positive"):
            self._fit(spark, [1.0, 0.0])

    def test_max_len_refused(self, spark):
        df = spark.createDataFrame(
            [("g", float(i + 1)) for i in range(30)], "k string, v double"
        )
        with pytest.raises(ValueError, match="max_len"):
            weibull_fit(df, ["k"], "v", max_len=10)
