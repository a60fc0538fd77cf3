"""Diversity indices (L257) and Aalen-Johansen cumulative incidence
(L258)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.concentration import diversity_indices
from lmss_entity_extractor_spark.ops.survival import (
    cumulative_incidence,
    kaplan_meier,
)


def _div_py(vals):
    from collections import Counter

    c = Counter(vals)
    n = len(vals)
    h = -sum((v / n) * math.log(v / n) for _, v in sorted(c.items()))
    d = sum((v / n) ** 2 for _, v in sorted(c.items()))
    return h, d, max(c.values()) / n, len(c)


class TestDiversity:
    def _df(self, spark, vals, g="g1"):
        return spark.createDataFrame(
            [(g, str(v)) for v in vals], "g string, v string"
        )

    def test_matches_python_reference(self, spark):
        vals = list("aaabbbbcdde")
        out = diversity_indices(self._df(spark, vals), ["g"], "v").collect()[0]
        h, d, bp, k = _div_py(vals)
        assert out["shannon"] == pytest.approx(h, rel=1e-12)
        assert out["simpson"] == pytest.approx(d, rel=1e-12)
        assert out["inv_simpson"] == pytest.approx(1 / d, rel=1e-12)
        assert out["berger_parker"] == bp
        assert out["evenness"] == pytest.approx(h / math.log(k), rel=1e-12)

    def test_uniform_max_entropy(self, spark):
        vals = list("abcd") * 5
        out = diversity_indices(self._df(spark, vals), ["g"], "v").collect()[0]
        assert out["evenness"] == pytest.approx(1.0)
        assert out["inv_simpson"] == pytest.approx(4.0)

    def test_single_category(self, spark):
        out = diversity_indices(
            self._df(spark, ["a"] * 7), ["g"], "v"
        ).collect()[0]
        assert out["shannon"] == pytest.approx(0.0, abs=1e-15)
        assert out["evenness"] is None
        assert out["simpson"] == pytest.approx(1.0)
        assert out["berger_parker"] == 1.0


def _cif_py(obs):
    """obs: (t, cause); returns {(cause, t): cif}."""
    from collections import Counter

    ts = sorted({t for t, _ in obs})
    n = len(obs)
    d_all = Counter(t for t, c in obs if c > 0)
    rem = Counter(t for t, _ in obs)
    causes = sorted({c for _, c in obs if c > 0})
    dk = {c: Counter(t for t, cc in obs if cc == c) for c in causes}
    out = {}
    surv = 1.0
    at_risk = n
    cif = {c: 0.0 for c in causes}
    for t in ts:
        for c in causes:
            if dk[c][t]:
                cif[c] += surv * dk[c][t] / at_risk
                out[(c, t)] = (at_risk, cif[c])
        surv *= (at_risk - d_all[t]) / at_risk
        at_risk -= rem[t]
    return out


class TestCumulativeIncidence:
    def _df(self, spark, obs, g="c1"):
        return spark.createDataFrame(
            [(g, int(t), int(c)) for t, c in obs],
            "cohort string, dur int, cause int",
        )

    def test_matches_python_reference(self, spark):
        obs = [(1, 1), (2, 2), (2, 1), (3, 0), (4, 1), (5, 2),
               (6, 0), (7, 1), (8, 0), (9, 2)]
        rows = cumulative_incidence(
            self._df(spark, obs), ["cohort"], "dur", "cause"
        ).collect()
        ref = _cif_py(obs)
        for r in rows:
            at_risk, cif = ref[(r["cause"], r["t"])]
            assert r["n_risk"] == at_risk
            assert r["cif"] == pytest.approx(cif, rel=1e-12)

    def test_single_cause_equals_one_minus_km(self, spark):
        obs = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0), (6, 1)]
        df = self._df(spark, obs)
        cif = {
            r["t"]: r["cif"]
            for r in cumulative_incidence(
                df, ["cohort"], "dur", "cause"
            ).collect()
        }
        km = {
            r["t"]: r["survival"]
            for r in kaplan_meier(
                df.withColumnRenamed("cause", "event"),
                ["cohort"], "dur", "event",
            ).collect()
        }
        for t, c in cif.items():
            assert c == pytest.approx(1.0 - km[t], rel=1e-12)

    def test_cifs_sum_below_one(self, spark):
        obs = [(t % 5 + 1, t % 3) for t in range(60)]
        rows = cumulative_incidence(
            self._df(spark, obs), ["cohort"], "dur", "cause"
        ).collect()
        last = {}
        for r in rows:
            last[r["cause"]] = max(
                last.get(r["cause"], (0, 0)), (r["t"], r["cif"])
            )
        total = sum(v for _, v in last.values())
        assert 0.0 < total <= 1.0 + 1e-12

    def test_negative_cause_refused(self, spark):
        with pytest.raises(ValueError, match="negative"):
            cumulative_incidence(
                self._df(spark, [(1, -1)]), ["cohort"], "dur", "cause"
            )
