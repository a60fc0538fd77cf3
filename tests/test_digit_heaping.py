"""Digit forensics (L439) and heaping panel (L440)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.benford import (
    _BENFORD2,
    digit_forensics,
    heaping_panel,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double"
    )


class TestDigitForensics:
    def test_python_reference(self, spark):
        vals = [123, 145, 167, 109, 150, 200, 255, 30, 9, 75]
        r = digit_forensics(_df(spark, vals), ["k"], "v").collect()[0]
        ints = [int(abs(v)) for v in vals]
        seconds = [int(str(x)[1]) for x in ints if x >= 10]
        lasts = [int(str(x)[-1]) for x in ints if x >= 10]
        n2, nl = len(seconds), len(lasts)
        chi2s = sum(
            (seconds.count(d) - _BENFORD2[d] * n2) ** 2
            / (_BENFORD2[d] * n2)
            for d in range(10)
        )
        chi2l = sum(
            (lasts.count(d) - nl / 10) ** 2 / (nl / 10)
            for d in range(10)
        )
        assert r["n2"] == n2
        assert r["chi2_second"] == pytest.approx(chi2s, rel=1e-9)
        assert r["chi2_last"] == pytest.approx(chi2l, rel=1e-9)
        maxdev = max(
            abs(lasts.count(d) / nl - 0.1) for d in range(10)
        )
        assert r["max_dev_last"] == pytest.approx(maxdev, rel=1e-9)

    def test_benford_like_sample_scores_low(self, spark):
        # geometric growth approximates Benford across both digits
        benford = [int(1.7 ** k) for k in range(5, 45)]
        heaped = [d * 10 for d in range(10, 50)]
        rb = digit_forensics(_df(spark, benford), ["k"], "v").collect()[0]
        rh = digit_forensics(_df(spark, heaped), ["k"], "v").collect()[0]
        assert rh["chi2_last"] > rb["chi2_last"]

    def test_single_digit_values_excluded_from_second(self, spark):
        r = digit_forensics(_df(spark, [5, 7, 9]), ["k"], "v").collect()[0]
        assert r["n2"] == 0
        assert r["chi2_second"] is None

    def test_zeros_excluded_from_last(self, spark):
        r = digit_forensics(_df(spark, [0, 0, 0]), ["k"], "v").collect()[0]
        assert r["chi2_last"] is None

    def test_single_digits_excluded_from_last(self, spark):
        # for 1..9 the "last" digit IS the first digit (Benford-like,
        # not uniform) — small-integer-rich genuine data must not
        # false-flag the uniformity screen (r4 ADVICE)
        r = digit_forensics(
            _df(spark, [1, 2, 3, 11, 12]), ["k"], "v"
        ).collect()[0]
        lasts = [1, 2]  # only 11, 12 qualify
        nl = len(lasts)
        chi2l = sum(
            (lasts.count(d) - nl / 10) ** 2 / (nl / 10)
            for d in range(10)
        )
        assert r["chi2_last"] == pytest.approx(chi2l, rel=1e-9)


class TestHeapingPanel:
    def test_hand_computed(self, spark):
        vals = [123, 145, 167, 109, 150, 200, 255, 30, 9, 75]
        r = heaping_panel(_df(spark, vals), ["k"], "v").collect()[0]
        assert r["share_mult5"] == pytest.approx(0.6)
        assert r["share_mult10"] == pytest.approx(0.3)
        assert r["share_mult100"] == pytest.approx(0.1)
        assert r["excess5"] == pytest.approx(0.4)

    def test_uniform_residues_near_zero_excess(self, spark):
        vals = list(range(1, 101))
        r = heaping_panel(_df(spark, vals), ["k"], "v").collect()[0]
        assert r["excess5"] == pytest.approx(0.0)
        assert r["excess10"] == pytest.approx(0.0)
        assert r["excess100"] == pytest.approx(0.0)

    def test_fully_heaped(self, spark):
        r = heaping_panel(
            _df(spark, [10, 20, 50, 100]), ["k"], "v"
        ).collect()[0]
        assert r["share_mult10"] == pytest.approx(1.0)
        assert r["excess10"] == pytest.approx(0.9)

    def test_subunit_values_excluded(self, spark):
        # rates/probabilities floor to 0 and 0 mod K = 0 — without the
        # gate a continuous sub-unit column reads as maximally heaped
        # (r4 ADVICE); they are counted in n_subunit, not the shares
        r = heaping_panel(
            _df(spark, [0.3, 0.7, 5.0]), ["k"], "v"
        ).collect()[0]
        assert r["n"] == 3
        assert r["n_subunit"] == 2
        assert r["share_mult5"] == pytest.approx(1.0)

    def test_all_subunit_group_inapplicable(self, spark):
        r = heaping_panel(
            _df(spark, [0.1, 0.5, 0.9]), ["k"], "v"
        ).collect()[0]
        assert r["n_subunit"] == 3
        assert r["share_mult5"] is None
        assert r["excess100"] is None
