"""mSPRT always-valid test (L283) and EB beta-binomial shrinkage
(L284)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.effectsize import msprt_normal
from lmss_entity_extractor_spark.ops.encoding import eb_beta_binomial


def _msprt_py(a, b, tau):
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa = sum(x * x for x in a)
    qb = sum(x * x for x in b)
    delta = sa / na - sb / nb
    ssq = (qa - sa * sa / na) + (qb - sb * sb / nb)
    s2 = ssq / (na + nb - 2.0)
    v = s2 * (1.0 / na + 1.0 / nb)
    t2 = tau * tau
    lam = math.sqrt(v / (v + t2)) * math.exp(
        delta * delta * t2 / (2.0 * v * (v + t2))
    )
    return delta, v, lam, min(1.0, 1.0 / lam)


class TestMsprt:
    def _df(self, spark, a, b, g="g1"):
        rows = [(g, "A", float(x)) for x in a] + [
            (g, "B", float(x)) for x in b
        ]
        return spark.createDataFrame(rows, "g string, s string, x double")

    def test_matches_python_reference(self, spark):
        a = [10.0, 12.5, 11.0, 13.0, 12.0, 14.5]
        b = [9.0, 10.5, 9.5, 11.0, 10.0]
        out = msprt_normal(
            self._df(spark, a, b), ["g"], "s", "A", "B", "x", tau=0.5
        ).collect()[0]
        delta, v, lam, p = _msprt_py(a, b, 0.5)
        assert out["delta"] == pytest.approx(delta, rel=1e-9)
        assert out["v"] == pytest.approx(v, rel=1e-9)
        assert out["lam"] == pytest.approx(lam, rel=1e-9)
        assert out["p_always_valid"] == pytest.approx(p, rel=1e-9)

    def test_strong_effect_small_p(self, spark):
        a = [100 + 0.1 * i for i in range(30)]
        b = [50 + 0.1 * i for i in range(30)]
        out = msprt_normal(
            self._df(spark, a, b), ["g"], "s", "A", "B", "x", tau=1.0
        ).collect()[0]
        assert out["p_always_valid"] < 1e-6

    def test_null_effect_p_one(self, spark):
        a = [10, 11, 10, 11, 10, 11]
        out = msprt_normal(
            self._df(spark, a, a), ["g"], "s", "A", "B", "x", tau=1.0
        ).collect()[0]
        assert out["p_always_valid"] == 1.0

    def test_degenerate_null(self, spark):
        out = msprt_normal(
            self._df(spark, [5.0, 5.0], [5.0, 5.0]), ["g"], "s",
            "A", "B", "x",
        ).collect()[0]
        assert out["lam"] is None

    def test_bad_tau_refused(self, spark):
        with pytest.raises(ValueError, match="tau"):
            msprt_normal(
                self._df(spark, [1.0], [2.0]), ["g"], "s", "A", "B",
                "x", tau=0.0,
            )


def _eb_py(cells):
    k = len(cells)
    rates = [s / t for _, s, t in cells]
    m = sum(rates) / k
    v = sum((r - m) ** 2 for r in rates) / (k - 1)
    mm = m * (1 - m)
    if v <= 0 or mm <= v:
        return None
    ab = mm / v - 1.0
    alpha = m * ab
    return {
        key: (s + alpha) / (t + ab) for key, s, t in cells
    }, alpha, ab - alpha


class TestEbShrink:
    def _df(self, spark, cells, g="g1"):
        return spark.createDataFrame(
            [(g, key, int(s), int(t)) for key, s, t in cells],
            "g string, key string, s long, t long",
        )

    def test_matches_python_reference(self, spark):
        cells = [("a", 5, 100), ("b", 30, 200), ("c", 1, 4),
                 ("d", 12, 80), ("e", 45, 500), ("f", 9, 60)]
        rows = eb_beta_binomial(
            self._df(spark, cells), ["g"], "key", "s", "t"
        ).collect()
        ref, alpha, beta = _eb_py(cells)
        assert len(rows) == 6
        for r in rows:
            assert r["alpha"] == pytest.approx(alpha, rel=1e-9)
            assert r["beta"] == pytest.approx(beta, rel=1e-9)
            assert r["shrunk_rate"] == pytest.approx(
                ref[r["key"]], rel=1e-9
            )

    def test_low_traffic_shrinks_more(self, spark):
        cells = [("tiny", 1, 2), ("big", 500, 1000),
                 ("x", 10, 100), ("y", 20, 100), ("z", 30, 100)]
        rows = {
            r["key"]: r
            for r in eb_beta_binomial(
                self._df(spark, cells), ["g"], "key", "s", "t"
            ).collect()
        }
        move_tiny = abs(rows["tiny"]["shrunk_rate"] - 0.5)
        move_big = abs(rows["big"]["shrunk_rate"] - 0.5)
        assert move_tiny > move_big

    def test_single_key_null(self, spark):
        rows = eb_beta_binomial(
            self._df(spark, [("a", 1, 10)]), ["g"], "key", "s", "t"
        ).collect()
        assert rows[0]["shrunk_rate"] is None
        assert rows[0]["raw_rate"] == pytest.approx(0.1)

    def test_zero_trials_refused(self, spark):
        with pytest.raises(ValueError, match="t<=0"):
            eb_beta_binomial(
                self._df(spark, [("a", 0, 0), ("b", 1, 2)]), ["g"],
                "key", "s", "t",
            )
