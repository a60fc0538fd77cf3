"""SRM check (L351) and D'Agostino-Pearson K² (L352)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.stattests import dagostino_k2, srm_check


def _k2_py(xs):
    n = len(xs)
    mq = sum(xs) / n
    m2 = sum((v - mq) ** 2 for v in xs) / n
    m3 = sum((v - mq) ** 3 for v in xs) / n
    m4 = sum((v - mq) ** 4 for v in xs) / n
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = (
        24.0 * n * (n - 2) * (n - 3)
        / ((n + 1) ** 2 * (n + 3) * (n + 5))
    )
    x = (b2 - eb2) / math.sqrt(vb2)
    sqbeta1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    a = 6.0 + 8.0 / sqbeta1 * (
        2.0 / sqbeta1 + math.sqrt(1 + 4.0 / sqbeta1**2)
    )
    inner = (1 - 2.0 / a) / (1 + x * math.sqrt(2.0 / (a - 4)))
    z2 = (
        (1 - 2.0 / (9 * a)) - math.copysign(abs(inner) ** (1 / 3), inner)
    ) / math.sqrt(2.0 / (9 * a))
    return z1, z2, z1 * z1 + z2 * z2


def _noise(i):
    return ((i * 7919) % 13 - 6) / 10.0


class TestSrm:
    def _df(self, spark, counts):
        rows = [
            ("g", arm, i) for arm, c in counts.items() for i in range(c)
        ]
        return spark.createDataFrame(rows, "g string, arm string, i int")

    def test_balanced_passes(self, spark):
        row = srm_check(
            self._df(spark, {"a": 500, "b": 500}), ["g"], "arm",
            {"a": 0.5, "b": 0.5},
        ).collect()[0]
        assert row["chi2"] == 0.0 and row["dof"] == 1

    def test_skewed_split_flags(self, spark):
        row = srm_check(
            self._df(spark, {"a": 550, "b": 450}), ["g"], "arm",
            {"a": 0.5, "b": 0.5},
        ).collect()[0]
        # chi2 = 50^2/500 * 2 = 10
        assert row["chi2"] == pytest.approx(10.0, rel=1e-12)

    def test_weighted_allocation(self, spark):
        row = srm_check(
            self._df(spark, {"a": 900, "b": 100}), ["g"], "arm",
            {"a": 0.9, "b": 0.1},
        ).collect()[0]
        assert row["chi2"] == 0.0

    def test_unknown_arm_refused(self, spark):
        with pytest.raises(ValueError, match="not in the planned"):
            srm_check(
                self._df(spark, {"a": 5, "zz": 5}), ["g"], "arm",
                {"a": 0.5, "b": 0.5},
            )

    def test_bad_weights_refused(self, spark):
        df = self._df(spark, {"a": 5})
        with pytest.raises(ValueError, match="sum to 1"):
            srm_check(df, ["g"], "arm", {"a": 0.7, "b": 0.7})
        with pytest.raises(ValueError, match="> 0"):
            srm_check(df, ["g"], "arm", {"a": 1.5, "b": -0.5})


class TestDagostinoK2:
    def _df(self, spark, xs, g="g1"):
        return spark.createDataFrame(
            [(g, float(x)) for x in xs], "g string, x double"
        )

    def test_matches_python_reference(self, spark):
        xs = [round(10.0 + _noise(i) + (i % 7) * 0.31, 2) for i in range(60)]
        row = dagostino_k2(self._df(spark, xs), ["g"], "x").collect()[0]
        z1, z2, k2 = _k2_py(xs)
        assert row["z_skew"] == pytest.approx(z1, rel=1e-9)
        assert row["z_kurt"] == pytest.approx(z2, rel=1e-9)
        assert row["k2"] == pytest.approx(k2, rel=1e-9)

    def test_flags_heavy_skew(self, spark):
        sym = [round(_noise(i), 2) for i in range(80)]
        skewed = [round(_noise(i), 2) for i in range(70)] + [
            50.0, 60.0, 70.0, 80.0, 90.0, 100.0, 110.0, 120.0, 130.0,
            140.0,
        ]
        out = {}
        df = self._df(spark, sym, "sym").union(
            self._df(spark, skewed, "skw")
        )
        for r in dagostino_k2(df, ["g"], "x").collect():
            out[r["g"]] = r["k2"]
        assert out["skw"] > 5.991  # rejects at 5%
        assert out["skw"] > out["sym"]

    def test_small_n_null(self, spark):
        row = dagostino_k2(
            self._df(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]),
            ["g"], "x",
        ).collect()[0]
        assert row["k2"] is None

    def test_zero_variance_null(self, spark):
        row = dagostino_k2(
            self._df(spark, [3.0] * 20), ["g"], "x"
        ).collect()[0]
        assert row["k2"] is None
