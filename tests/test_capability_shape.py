"""Process capability (L327) and robust shape panel (L328)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.spc import (
    process_capability,
    robust_shape,
)

D2 = 1.128


def _df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestCapability:
    def test_matches_formula(self, spark):
        xs = [10, 10.5, 9.8, 10.2, 9.9, 10.4, 10.1, 9.7, 10.3, 9.6]
        row = process_capability(
            _df(spark, xs), ["g"], ["t"], "x", lsl=8.0, usl=12.0
        ).collect()[0]
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        sig_o = math.sqrt(var)
        mrbar = sum(abs(xs[i] - xs[i - 1]) for i in range(1, n)) / (n - 1)
        sig_w = mrbar / D2
        assert row["mean"] == pytest.approx(mean, rel=1e-12)
        assert row["sigma_within"] == pytest.approx(sig_w, rel=1e-9)
        assert row["sigma_overall"] == pytest.approx(sig_o, rel=1e-9)
        assert row["cp"] == pytest.approx(4.0 / (6 * sig_w), rel=1e-9)
        assert row["cpk"] == pytest.approx(
            min(12.0 - mean, mean - 8.0) / (3 * sig_w), rel=1e-9
        )
        assert row["pp"] == pytest.approx(4.0 / (6 * sig_o), rel=1e-9)

    def test_off_centre_cpk_below_cp(self, spark):
        xs = [11.5 + 0.1 * ((i * 7) % 5 - 2) for i in range(20)]
        row = process_capability(
            _df(spark, xs), ["g"], ["t"], "x", lsl=8.0, usl=12.0
        ).collect()[0]
        assert row["cpk"] < row["cp"]

    def test_bad_limits_refused(self, spark):
        with pytest.raises(ValueError, match="lsl < usl"):
            process_capability(
                _df(spark, [1.0]), ["g"], ["t"], "x", lsl=5.0, usl=5.0
            )


def _shape_py(xs):
    xs = sorted(xs)
    n = len(xs)
    e = {i: xs[max(1, (i * n) // 8) - 1] for i in range(1, 8)}
    q1, q2, q3 = e[2], e[4], e[6]
    iqr = q3 - q1
    return (
        q1, q2, q3,
        (q3 + q1 - 2 * q2) / iqr,
        ((e[7] - e[5]) + (e[3] - e[1])) / iqr,
        iqr / (q3 + q1),
    )


class TestRobustShape:
    def _dfv(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [1, 2, 2, 3.5, 10, 0.25, 4, 7, 6, 1.5, 8, 2.75, 5, 9,
              3, 4.5]
        row = robust_shape(self._dfv(spark, xs), ["g"], "x").collect()[0]
        q1, q2, q3, bow, moo, qcv = _shape_py(xs)
        assert row["q1"] == pytest.approx(q1)
        assert row["q2"] == pytest.approx(q2)
        assert row["q3"] == pytest.approx(q3)
        assert row["bowley"] == pytest.approx(bow, rel=1e-9)
        assert row["moors"] == pytest.approx(moo, rel=1e-9)
        assert row["qcv"] == pytest.approx(qcv, rel=1e-9)

    def test_symmetric_zero_bowley(self, spark):
        xs = list(range(1, 17))
        row = robust_shape(self._dfv(spark, xs), ["g"], "x").collect()[0]
        assert abs(row["bowley"]) < 0.15

    def test_right_skew_positive_bowley(self, spark):
        xs = [1, 1.1, 1.2, 1.3, 1.5, 1.8, 2, 2.5, 3, 5, 9, 20, 50,
              120, 300, 800]
        row = robust_shape(self._dfv(spark, xs), ["g"], "x").collect()[0]
        assert row["bowley"] > 0.3

    def test_outlier_resistant(self, spark):
        base = [float(x) for x in range(1, 33)]
        spiked = base[:-1] + [1e9]
        a = robust_shape(self._dfv(spark, base), ["g"], "x").collect()[0]
        b = robust_shape(self._dfv(spark, spiked), ["g"], "x").collect()[0]
        assert b["bowley"] == pytest.approx(a["bowley"], abs=0.1)
