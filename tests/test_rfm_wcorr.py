"""RFM scoring (L337) and winsorized correlation (L338)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.cohort import rfm_scores
from lmss_entity_extractor_spark.ops.correlation import winsorized_corr


class TestRfm:
    def _df(self, spark, rows, g="g1"):
        return spark.createDataFrame(
            [(g, cid, f"2024-01-{d:02d}", float(a)) for cid, d, a in rows],
            "g string, cid string, ts string, amount double",
        ).selectExpr("g", "cid", "CAST(ts AS TIMESTAMP) AS ts", "amount")

    def test_scores_and_code(self, spark):
        rows = (
            [("best", 28, 100.0)] * 5
            + [("mid", 15, 30.0)] * 3
            + [("worst", 2, 5.0)]
            + [("c4", 20, 50.0)] * 2
            + [("c5", 10, 20.0)] * 2
        )
        out = {
            r["id"]: r
            for r in rfm_scores(
                self._df(spark, rows), ["g"], "cid", "ts", "amount"
            ).collect()
        }
        assert out["best"]["rfm"] == "555"
        assert out["worst"]["rfm"] == "111"
        assert out["best"]["recency_days"] == 0
        assert out["worst"]["recency_days"] == 26
        assert out["best"]["frequency"] == 5
        assert out["best"]["monetary"] == pytest.approx(500.0)

    def test_deterministic_under_ties(self, spark):
        rows = [(f"c{i}", 10, 10.0) for i in range(10)]
        a = rfm_scores(
            self._df(spark, rows), ["g"], "cid", "ts", "amount"
        ).collect()
        b = rfm_scores(
            self._df(spark, rows), ["g"], "cid", "ts", "amount"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # ties split by id: scores 1..5 each appear twice
        scores = sorted(r["m_score"] for r in a)
        assert scores == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]

    def test_bad_bins_refused(self, spark):
        with pytest.raises(ValueError, match="n_bins"):
            rfm_scores(
                self._df(spark, [("c", 1, 1.0)]), ["g"], "cid", "ts",
                "amount", n_bins=1,
            )


def _wcorr_py(xs, ys, trim=10):
    n = len(xs)
    g = (n * trim) // 100

    def clamp(vs):
        s = sorted(vs)
        lo, hi = s[max(g, 1) - 1], s[min(n - g + 1, n) - 1]
        return [min(max(v, lo), hi) for v in vs]

    cx, cy = clamp(xs), clamp(ys)
    mx, my = sum(cx) / n, sum(cy) / n
    num = sum((a - mx) * (b - my) for a, b in zip(cx, cy))
    dx = sum((a - mx) ** 2 for a in cx)
    dy = sum((b - my) ** 2 for b in cy)
    return num / math.sqrt(dx * dy)


def _df2(spark, xs, ys, g="g1"):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )


class TestWinsorizedCorr:
    def test_matches_python_reference(self, spark):
        xs = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
        ys = [2.1, 3.9, 6.2, 7.8, 10.5, 11.4, 14.8, 15.1, 19.0,
              19.5, 22.2, 24.1]
        row = winsorized_corr(_df2(spark, xs, ys), ["g"], "x", "y").collect()[0]
        assert row["r_winsor"] == pytest.approx(
            _wcorr_py(xs, ys), rel=1e-9
        )

    def test_outlier_resistant(self, spark):
        xs = list(range(1, 20)) + [20]
        ys = [2.0 * x + 0.1 * ((x * 7) % 5) for x in xs[:-1]] + [-500.0]
        r_w = winsorized_corr(
            _df2(spark, xs, ys), ["g"], "x", "y", trim_pct=10
        ).collect()[0]["r_winsor"]
        # clamped: strongly positive despite the -500 spike (plain
        # Pearson here is near zero); the spike row keeps its
        # clamped-floor leverage, hence not ~1
        assert r_w > 0.7

    def test_constant_after_clamp_null(self, spark):
        xs = [5.0] * 10
        ys = list(range(10))
        row = winsorized_corr(_df2(spark, xs, ys), ["g"], "x", "y").collect()[0]
        assert row["r_winsor"] is None

    def test_bad_trim_refused(self, spark):
        with pytest.raises(ValueError, match="trim_pct"):
            winsorized_corr(
                _df2(spark, [1.0], [1.0]), ["g"], "x", "y", trim_pct=0
            )
