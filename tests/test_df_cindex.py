"""Dickey-Fuller test (L287) and Harrell's C-index (L288)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.survival import harrell_c
from lmss_entity_extractor_spark.ops.timeseries import dickey_fuller


def _df_py(xs):
    pairs = [(xs[i - 1], xs[i] - xs[i - 1]) for i in range(1, len(xs))]
    n = float(len(pairs))
    sx = sum(p for p, _ in pairs)
    sy = sum(d for _, d in pairs)
    sxx = sum(p * p for p, _ in pairs)
    sxy = sum(p * d for p, d in pairs)
    syy = sum(d * d for _, d in pairs)
    rho = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - rho * sx) / n
    sse = (
        syy + n * alpha**2 + rho**2 * sxx
        - 2 * alpha * sy - 2 * rho * sxy + 2 * alpha * rho * sx
    )
    se = math.sqrt(sse / (n - 2) / (sxx - sx * sx / n))
    return rho, rho / se


def _series_df(spark, xs, g="g1"):
    return spark.createDataFrame(
        [(g, float(i), float(x)) for i, x in enumerate(xs)],
        "g string, t double, x double",
    )


class TestDickeyFuller:
    def test_matches_python_reference(self, spark):
        xs = [10, 11.5, 10.5, 12, 11, 13.25, 12.5, 14, 13, 15.5,
              14.25, 16]
        row = dickey_fuller(
            _series_df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        rho, t = _df_py(xs)
        assert row["n_pairs"] == 11
        assert row["rho"] == pytest.approx(rho, rel=1e-9)
        assert row["t_df"] == pytest.approx(t, rel=1e-9)

    def test_mean_reverting_strongly_negative(self, spark):
        # jittered oscillation around 10: strong mean reversion
        # (pure +/-3 alternation fits the DF regression EXACTLY ->
        # SSE=0 -> NULL by design, so jitter keeps SSE > 0)
        xs = [10 + (3 if i % 2 == 0 else -3) + 0.1 * ((i * 7) % 5)
              for i in range(30)]
        row = dickey_fuller(
            _series_df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["t_df"] < -2.86  # DF 5% critical value

    def test_random_walk_like_near_zero(self, spark):
        # cumulative sum of a fixed +1/-1 pattern drifts like a walk
        steps = [1, 1, -1, 1, 1, -1, 1, -1, 1, 1, -1, 1, 1, 1, -1,
                 1, -1, 1, 1, -1]
        xs, acc = [], 0.0
        for s in steps:
            acc += s
            xs.append(acc)
        row = dickey_fuller(
            _series_df(spark, xs), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["t_df"] > -2.86

    def test_constant_series_null(self, spark):
        row = dickey_fuller(
            _series_df(spark, [5.0] * 6), ["g"], ["t"], "x"
        ).collect()[0]
        assert row["rho"] is None and row["t_df"] is None


def _c_py(rows):
    comp = conc = tied = 0
    for i in range(len(rows)):
        for j in range(len(rows)):
            if i >= j:
                continue
            (ta, ea, ra), (tb, eb, rb) = rows[i], rows[j]
            if ta < tb and ea == 1:
                er, lr = ra, rb
            elif tb < ta and eb == 1:
                er, lr = rb, ra
            else:
                continue
            comp += 1
            if er > lr:
                conc += 1
            elif er == lr:
                tied += 1
    return comp, conc, tied, (conc + 0.5 * tied) / comp


class TestHarrellC:
    def _df(self, spark, rows, g="g1"):
        return spark.createDataFrame(
            [(g, float(t), int(e), float(r)) for t, e, r in rows],
            "g string, t double, e int, r double",
        )

    def test_matches_python_reference(self, spark):
        rows = [(5, 1, 0.9), (8, 1, 0.7), (8, 0, 0.5), (12, 1, 0.6),
                (15, 0, 0.2), (20, 1, 0.3), (20, 1, 0.3), (3, 0, 0.8)]
        out = harrell_c(
            self._df(spark, rows), ["g"], "t", "e", "r"
        ).collect()[0]
        comp, conc, tied, c = _c_py(rows)
        assert out["n_comparable"] == comp
        assert out["n_concordant"] == conc
        assert out["n_tied_risk"] == tied
        assert out["c"] == pytest.approx(c, rel=1e-12)

    def test_perfect_ranking(self, spark):
        rows = [(t, 1, 100.0 - t) for t in (1, 2, 3, 4, 5)]
        out = harrell_c(
            self._df(spark, rows), ["g"], "t", "e", "r"
        ).collect()[0]
        assert out["c"] == 1.0

    def test_inverted_ranking(self, spark):
        rows = [(t, 1, float(t)) for t in (1, 2, 3, 4, 5)]
        out = harrell_c(
            self._df(spark, rows), ["g"], "t", "e", "r"
        ).collect()[0]
        assert out["c"] == 0.0

    def test_all_censored_null(self, spark):
        rows = [(1, 0, 0.5), (2, 0, 0.7)]
        out = harrell_c(
            self._df(spark, rows), ["g"], "t", "e", "r"
        ).collect()[0]
        assert out["c"] is None

    def test_max_len_refused(self, spark):
        rows = [(t, 1, float(t)) for t in range(5)]
        with pytest.raises(ValueError, match="max_len"):
            harrell_c(self._df(spark, rows), ["g"], "t", "e", "r",
                      max_len=3)
