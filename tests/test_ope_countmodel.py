"""Off-policy evaluation (L413) and count-model diagnostics (L414)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import count_model_panel
from lmss_entity_extractor_spark.ops.evalmetrics import off_policy_eval


class TestOffPolicyEval:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [("g", *r) for r in rows],
            "grp string, p double, m boolean, r double",
        )

    def test_hand_computed(self, spark):
        rows = [
            (0.5, True, 1.0),    # w = 2, wr = 2
            (0.25, True, 0.5),   # w = 4, wr = 2
            (0.5, False, 3.0),   # w = 0
            (1.0, True, 0.0),    # w = 1, wr = 0
        ]
        out = off_policy_eval(
            self._df(spark, rows), ["grp"], "p", "m", "r", clip=3.0
        ).collect()[0]
        assert out["n"] == 4 and out["n_match"] == 3
        assert out["ips"] == pytest.approx(4 / 4, abs=1e-8)
        # clipped: w=4 -> 3, wr = 1.5
        assert out["ips_clipped"] == pytest.approx(3.5 / 4, abs=1e-8)
        assert out["snips"] == pytest.approx(4 / 7, abs=1e-8)
        assert out["ess"] == pytest.approx(49 / 21, abs=1e-7)
        assert out["mean_logged_reward"] == pytest.approx(4.5 / 4)

    def test_uniform_logging_identity_policy(self, spark):
        # target == logging policy (all match, p=1): IPS = mean reward
        rows = [(1.0, True, float(i % 3)) for i in range(9)]
        out = off_policy_eval(
            self._df(spark, rows), ["grp"], "p", "m", "r"
        ).collect()[0]
        assert out["ips"] == pytest.approx(out["mean_logged_reward"])
        assert out["ess"] == pytest.approx(9.0, abs=1e-6)

    def test_never_matches_snips_null(self, spark):
        rows = [(0.5, False, 1.0), (0.5, False, 2.0)]
        out = off_policy_eval(
            self._df(spark, rows), ["grp"], "p", "m", "r"
        ).collect()[0]
        assert out["ips"] == pytest.approx(0.0)
        assert out["snips"] is None and out["ess"] is None

    def test_positivity_floor_refused(self, spark):
        rows = [(1e-6, True, 1.0)]
        with pytest.raises(ValueError, match="positivity"):
            off_policy_eval(
                self._df(spark, rows), ["grp"], "p", "m", "r"
            )

    def test_bad_prob_refused(self, spark):
        with pytest.raises(ValueError, match="propensity"):
            off_policy_eval(
                self._df(spark, [(1.5, True, 1.0)]),
                ["grp"], "p", "m", "r",
            )


class TestCountModel:
    def _run(self, spark, xs):
        df = spark.createDataFrame(
            [("g", int(x)) for x in xs], "k string, x long"
        )
        return count_model_panel(df, ["k"], "x").collect()[0]

    def test_python_reference(self, spark):
        xs = [0, 0, 1, 2, 3, 5, 8, 0, 2, 4]
        r = self._run(spark, xs)
        n = len(xs)
        m = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
        assert r["mean"] == pytest.approx(m)
        assert r["var"] == pytest.approx(var, rel=1e-12)
        assert r["nb_r"] == pytest.approx(m * m / (var - m), rel=1e-12)
        assert r["nb_p"] == pytest.approx(m / var, rel=1e-12)
        assert r["p0_obs"] == pytest.approx(3 / 10)
        assert r["p0_poisson"] == pytest.approx(math.exp(-m), rel=1e-12)
        em = math.exp(-m)
        num = (3 - n * em) ** 2
        den = n * em * (1 - em) - n * m * em * em
        assert r["zi_chi2"] == pytest.approx(num / den, rel=1e-9)

    def test_underdispersed_nb_null(self, spark):
        r = self._run(spark, [2, 2, 3, 3, 2, 3])
        assert r["nb_r"] is None and r["nb_p"] is None

    def test_zero_inflated_high_chi2(self, spark):
        lam2 = [0, 0, 0, 0, 0, 0, 3, 4, 2, 3, 5, 4]
        clean = [2, 3, 4, 3, 2, 4, 3, 2, 3, 4, 2, 3]
        assert (
            self._run(spark, lam2)["zi_chi2"]
            > self._run(spark, clean)["zi_chi2"]
        )

    def test_negative_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            self._run(spark, [1, -1])

    def test_single_row_nulls(self, spark):
        r = self._run(spark, [5])
        assert r["var"] is None and r["nb_r"] is None
        assert r["zi_chi2"] is None
