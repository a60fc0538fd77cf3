"""Gini concentration (L150) + autocorrelation function (L151)."""

import pytest

from lmss_entity_extractor_spark.ops.concentration import acf, gini


def _gini_py(xs):
    xs = sorted(xs)
    n = len(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    sx = sum(xs)
    return (2 * six - (n + 1) * sx) / (n * sx)


def _acf_py(xs, h):
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    num = sum((xs[t] - m) * (xs[t - h] - m) for t in range(h, n))
    return num / den


def _vals(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, float(v)) for v in xs], "g string, v double"
    )


class TestGini:
    def test_matches_python(self, spark):
        xs = [1.0, 4.0, 2.25, 10.0, 2.25, 0.5]
        row = gini(_vals(spark, xs), ["g"], "v").collect()[0]
        assert row["n"] == 6
        assert float(row["total"]) == sum(xs)
        assert row["gini"] == pytest.approx(_gini_py(xs), rel=1e-15)

    def test_perfect_equality_zero(self, spark):
        row = gini(_vals(spark, [5.0] * 8), ["g"], "v").collect()[0]
        assert row["gini"] == 0.0

    def test_total_concentration(self, spark):
        # one holder of everything among n: G = (n-1)/n
        xs = [0.0] * 9 + [100.0]
        row = gini(_vals(spark, xs), ["g"], "v").collect()[0]
        assert row["gini"] == pytest.approx(0.9, abs=0)

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            gini(_vals(spark, [1.0, -2.0]), ["g"], "v").collect()

    def test_zero_total_null(self, spark):
        row = gini(_vals(spark, [0.0, 0.0]), ["g"], "v").collect()[0]
        assert row["gini"] is None


def _series(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(v)) for i, v in enumerate(xs)],
        "g string, t int, v double",
    )


class TestAcf:
    def test_matches_python(self, spark):
        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
        out = {
            r["lag"]: r["r"]
            for r in acf(_series(spark, xs), ["g"], ["t"], "v", 3).collect()
        }
        for h in (1, 2, 3):
            assert out[h] == pytest.approx(_acf_py(xs, h), rel=1e-12)

    def test_alternating_series_lag1_negative(self, spark):
        xs = [1.0, -1.0] * 10
        out = {
            r["lag"]: r["r"]
            for r in acf(_series(spark, xs), ["g"], ["t"], "v", 2).collect()
        }
        assert out[1] == pytest.approx(_acf_py(xs, 1), rel=1e-12)
        assert out[1] < -0.9 and out[2] > 0.8

    def test_short_series_null(self, spark):
        out = {
            r["lag"]: r["r"]
            for r in acf(_series(spark, [1.0, 2.0]), ["g"], ["t"], "v", 3).collect()
        }
        assert out[3] is None  # series shorter than lag+1
        assert out[1] is not None

    def test_constant_series_null(self, spark):
        out = acf(_series(spark, [4.0] * 6), ["g"], ["t"], "v", 1).collect()
        assert out[0]["r"] is None  # zero variance

    def test_null_values_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 1, None)], "g string, t int, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            acf(df, ["g"], ["t"], "v", 1).collect()

    def test_parallelism_invariant(self, spark):
        xs = [float((i * 17) % 23) for i in range(100)]
        df = _series(spark, xs)
        a = sorted(
            (r["lag"], r["r"])
            for r in acf(df.repartition(1), ["g"], ["t"], "v", 3).collect()
        )
        b = sorted(
            (r["lag"], r["r"])
            for r in acf(df.repartition(16), ["g"], ["t"], "v", 3).collect()
        )
        assert a == b
