"""Brier/calibration (L166) + Adamic-Adar link prediction (L167)."""

import math

import pytest

from lmss_entity_extractor_spark.graph.linkpred import adamic_adar
from lmss_entity_extractor_spark.ops.calibration import (
    brier_score,
    calibration_bins,
)


def _probs(spark, rows):
    return spark.createDataFrame(rows, "p double, y int")


class TestBrier:
    def test_hand_computed(self, spark):
        rows = [(0.8, 1), (0.8, 0), (0.25, 0), (1.0, 1)]
        r = brier_score(_probs(spark, rows), "p", "y").collect()[0]
        exp = (0.2**2 + 0.8**2 + 0.25**2 + 0.0) / 4
        assert r["n"] == 4
        assert r["brier"] == pytest.approx(exp, rel=1e-12)

    def test_perfect_zero(self, spark):
        rows = [(1.0, 1), (0.0, 0)]
        r = brier_score(_probs(spark, rows), "p", "y").collect()[0]
        assert r["brier"] == 0.0

    def test_out_of_range_refused(self, spark):
        with pytest.raises(ValueError, match="outside"):
            brier_score(_probs(spark, [(1.5, 1)]), "p", "y").collect()

    def test_nonbinary_label_refused(self, spark):
        with pytest.raises(ValueError, match="non-binary"):
            brier_score(_probs(spark, [(0.5, 2)]), "p", "y").collect()


class TestCalibrationBins:
    def test_bins_and_rates(self, spark):
        rows = [(0.05, 0), (0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1), (1.0, 1)]
        out = {
            r["bin"]: r
            for r in calibration_bins(_probs(spark, rows), "p", "y").collect()
        }
        assert set(out) == {0, 9}
        assert out[0]["n"] == 3
        assert out[0]["frac_pos"] == pytest.approx(1 / 3, abs=0)
        assert out[0]["mean_pred"] == pytest.approx(0.05, rel=1e-12)
        assert out[9]["n"] == 3  # p = 1.0 clamps into the last bin


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


class TestAdamicAdar:
    def test_hand_computed(self, spark):
        # a-z1, b-z1, a-z2, b-z2, z1-z2: pair (a,b) shares z1 (deg 3)
        # and z2 (deg 3); a-b not an edge
        pairs = [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"), ("z1", "z2")]
        rows = adamic_adar(_edges(spark, pairs)).collect()
        ab = [r for r in rows if {r["a"], r["b"]} == {"a", "b"}][0]
        assert ab["common"] == 2
        assert ab["aa"] == pytest.approx(2 / math.log(3), rel=1e-12)
        assert ab["ra"] == pytest.approx(2 / 3, rel=1e-12)

    def test_existing_edges_excluded(self, spark):
        pairs = [("a", "z"), ("b", "z"), ("a", "b")]
        rows = adamic_adar(_edges(spark, pairs)).collect()
        assert not any({r["a"], r["b"]} == {"a", "b"} for r in rows)
        rows2 = adamic_adar(_edges(spark, pairs), include_existing=True).collect()
        assert any({r["a"], r["b"]} == {"a", "b"} for r in rows2)

    def test_rare_hub_weighs_more(self, spark):
        # (a,b) share rare z (deg 2); (c,d) share hub h (deg 5)
        pairs = [("a", "z"), ("b", "z")] + [
            (n, "h") for n in ("c", "d", "e", "f", "g")
        ]
        rows = {frozenset((r["a"], r["b"])): r for r in
                adamic_adar(_edges(spark, pairs)).collect()}
        assert rows[frozenset(("a", "b"))]["aa"] > rows[frozenset(("c", "d"))]["aa"]


class TestIsotonicFit:
    @staticmethod
    def _pav(ws, ys):
        """Classic pool-adjacent-violators stack: ws = weights,
        ys = success counts per bin (ordered)."""
        stack = []  # (w, s)
        for w, s in zip(ws, ys):
            stack.append((w, s))
            while (
                len(stack) > 1
                and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
            ):
                w2, s2 = stack.pop()
                w1, s1 = stack.pop()
                stack.append((w1 + w2, s1 + s2))
        # expand back to per-bin values
        vals = []
        for w, s in stack:
            vals.append((w, s / w))
        expanded = []
        i = 0
        for w, v in vals:
            cnt = 0
            acc = 0
            while acc < w:
                acc += ws[i + cnt]
                cnt += 1
            expanded += [v] * cnt
            i += cnt
        return expanded

    def _make(self, spark, rates, per_bin=20, n_bins=10):
        # rates[i] = success rate of bin i; p placed mid-bin, exactly
        # representable at scale 4
        rows = []
        for i, r in enumerate(rates):
            p = (i * 10 + 5) / 100.0  # 0.05, 0.15, ...
            k = int(r * per_bin)
            rows += [(p, 1)] * k + [(p, 0)] * (per_bin - k)
        return spark.createDataFrame(rows, "p double, y int")

    def test_matches_pav_stack(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import isotonic_fit

        rates = [0.1, 0.3, 0.2, 0.5, 0.4, 0.4, 0.8, 0.6, 0.9, 0.95]
        df = self._make(spark, rates)
        got = {
            r["bin"]: r["iso"]
            for r in isotonic_fit(df, "p", "y", n_bins=10).collect()
        }
        ws = [20] * 10
        ys = [int(r * 20) for r in rates]
        ref = self._pav(ws, ys)
        for i in range(10):
            assert abs(got[i] - ref[i]) < 1e-12, (i, got[i], ref[i])

    def test_monotone_output(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import isotonic_fit

        rates = [0.9, 0.1, 0.8, 0.2, 0.7, 0.3, 0.6, 0.4, 0.5, 0.5]
        df = self._make(spark, rates)
        rows = sorted(
            isotonic_fit(df, "p", "y", n_bins=10).collect(),
            key=lambda r: r["bin"],
        )
        isos = [r["iso"] for r in rows]
        assert all(a <= b + 1e-12 for a, b in zip(isos, isos[1:]))

    def test_already_monotone_identity(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import isotonic_fit

        rates = [0.05, 0.2, 0.35, 0.5, 0.65, 0.8, 0.9, 0.95, 1.0, 1.0]
        df = self._make(spark, rates)
        for r in isotonic_fit(df, "p", "y", n_bins=10).collect():
            assert abs(r["iso"] - r["frac_pos"]) < 1e-12


class TestConformalQuantile:
    def _df(self, spark, scores):
        return spark.createDataFrame(
            [("g", float(s)) for s in scores], "g string, s double"
        )

    def test_textbook_indexing(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import (
            conformal_quantile,
        )

        # n=9, alpha=0.1: k = ceil(10*0.9) = 9 -> the 9th smallest
        scores = [0.1, 0.5, 0.3, 0.9, 0.7, 0.2, 0.8, 0.4, 0.6]
        r = conformal_quantile(
            self._df(spark, scores), ["g"], "s", alpha="0.1"
        ).collect()[0]
        assert r["n"] == 9 and r["k"] == 9
        assert r["qhat"] == 0.9

    def test_exact_boundary(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import (
            conformal_quantile,
        )

        # n=19, alpha=0.05: k = ceil(20*0.95) = 19 exactly (decimal
        # arithmetic must not wobble the ceiling)
        scores = [i / 100.0 for i in range(1, 20)]
        r = conformal_quantile(
            self._df(spark, scores), ["g"], "s", alpha="0.05"
        ).collect()[0]
        assert r["k"] == 19 and r["qhat"] == 0.19

    def test_vacuous_guarantee_null(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import (
            conformal_quantile,
        )

        # n=3, alpha=0.1: k = ceil(4*0.9) = 4 > n -> NULL
        r = conformal_quantile(
            self._df(spark, [0.1, 0.2, 0.3]), ["g"], "s", alpha="0.1"
        ).collect()[0]
        assert r["k"] == 4 and r["qhat"] is None


class TestExpectedCalibrationError:
    def test_python_reference(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import (
            expected_calibration_error,
        )

        rows = []
        for i in range(200):
            p = (i % 100) / 100.0
            y = 1 if (i * 7) % 100 < i % 100 else 0
            rows.append((p, y))
        df = spark.createDataFrame(rows, "p double, y int")
        # reference over 10 bins
        bins = {}
        for p, y in rows:
            b = min(int(p * 10), 9)
            nb, sp, sy = bins.get(b, (0, 0.0, 0))
            bins[b] = (nb + 1, sp + p, sy + y)
        n = len(rows)
        ece_ref = sum(abs(sy - sp) for _, sp, sy in bins.values()) / n
        mce_ref = max(abs(sy - sp) / nb for nb, sp, sy in bins.values())
        r = expected_calibration_error(df, "p", "y", n_bins=10).collect()[0]
        assert r["n"] == n
        assert abs(r["ece"] - ece_ref) < 1e-9
        assert abs(r["mce"] - mce_ref) < 1e-9

    def test_perfectly_calibrated_zero(self, spark):
        from lmss_entity_extractor_spark.ops.calibration import (
            expected_calibration_error,
        )

        # bin mean prob 0.5, empirical rate 0.5 -> ece = mce = 0
        rows = [(0.5, 1), (0.5, 0)] * 10
        df = spark.createDataFrame(rows, "p double, y int")
        r = expected_calibration_error(df, "p", "y").collect()[0]
        assert r["ece"] == 0.0 and r["mce"] == 0.0


class TestConformalValidation:
    def test_bad_alpha_refused(self, spark):
        import pytest

        from lmss_entity_extractor_spark.ops.calibration import (
            conformal_quantile,
        )

        df = spark.createDataFrame([("g", 1.0)], "g string, s double")
        with pytest.raises(ValueError, match="unparseable"):
            conformal_quantile(df, ["g"], "s", alpha="0.1%")
        with pytest.raises(ValueError, match="in \\(0,1\\)"):
            conformal_quantile(df, ["g"], "s", alpha="-0.5")
        with pytest.raises(ValueError, match="in \\(0,1\\)"):
            conformal_quantile(df, ["g"], "s", alpha="1.0")
