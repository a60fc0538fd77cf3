"""Classical seasonal decomposition (L163)."""

import pytest

from lmss_entity_extractor_spark.ops.seasonal import seasonal_decompose


def _series(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(v)) for i, v in enumerate(xs)],
        "g string, t int, v double",
    )


def _decomp_py(xs, p):
    """Textbook additive decomposition (odd or even p)."""
    n = len(xs)
    half = p // 2
    trend = [None] * n
    for i in range(n):
        if p % 2 == 1:
            if i - half >= 0 and i + half < n:
                trend[i] = sum(xs[i - half : i + half + 1]) / p
        else:
            if i - half >= 0 and i + half < n:
                wa = sum(xs[i - half : i + half])
                wb = sum(xs[i - half + 1 : i + half + 1])
                trend[i] = (wa + wb) / (2 * p)
    raw = {}
    for k in range(p):
        vals = [xs[i] - trend[i] for i in range(n) if i % p == k and trend[i] is not None]
        if vals:
            raw[k] = sum(vals) / len(vals)
    m = sum(raw.values()) / len(raw)
    return trend, {k: v - m for k, v in raw.items()}


class TestSeasonal:
    @pytest.mark.parametrize("p", [7, 4])
    def test_matches_textbook(self, spark, p):
        # trend + seasonal + small deterministic wiggle
        xs = [
            10.0 + 0.5 * i + [3.0, -1.0, -2.0, 0.0, 1.5, -1.0, -0.5][i % 7]
            for i in range(35)
        ]
        rows = sorted(
            seasonal_decompose(_series(spark, xs), ["g"], "t", "v", p).collect(),
            key=lambda r: r["t"],
        )
        trend, seasonal = _decomp_py(xs, p)
        for r in rows:
            i = r["t"]
            if trend[i] is None:
                assert r["trend"] is None and r["remainder"] is None
            else:
                assert r["trend"] == pytest.approx(trend[i], rel=1e-12)
                assert r["seasonal"] == pytest.approx(seasonal[i % p], rel=1e-9)
                assert r["remainder"] == pytest.approx(
                    (xs[i] - trend[i]) - seasonal[i % p], rel=1e-9, abs=1e-9
                )

    def test_pure_seasonal_recovered(self, spark):
        pat = [4.0, -1.0, -3.0, 0.0]
        xs = pat * 8
        rows = seasonal_decompose(_series(spark, xs), ["g"], "t", "v", 4).collect()
        for r in rows:
            if r["seasonal"] is not None and r["trend"] is not None:
                assert r["seasonal"] == pytest.approx(pat[r["phase"]], abs=1e-12)
                assert r["remainder"] == pytest.approx(0.0, abs=1e-12)

    def test_null_refused(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 1, None)], "g string, t int, v double"
        )
        with pytest.raises(ValueError, match="NULL"):
            seasonal_decompose(df, ["g"], "t", "v", 4).collect()

    def test_bad_period(self, spark):
        with pytest.raises(ValueError, match="period"):
            seasonal_decompose(_series(spark, [1.0]), ["g"], "t", "v", 1)

    def test_parallelism_invariant(self, spark):
        xs = [float((i * 13) % 17) + 0.25 * i for i in range(60)]
        df = _series(spark, xs)
        a = sorted(
            (r["t"], r["trend"], r["seasonal"], r["remainder"])
            for r in seasonal_decompose(df.repartition(1), ["g"], "t", "v", 7).collect()
        )
        b = sorted(
            (r["t"], r["trend"], r["seasonal"], r["remainder"])
            for r in seasonal_decompose(df.repartition(16), ["g"], "t", "v", 7).collect()
        )
        assert a == b
