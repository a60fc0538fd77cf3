"""Benford's-law conformance (L144)."""

import math

import pytest

from lmss_entity_extractor_spark.ops.benford import benford_digits


def _rows(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


class TestBenford:
    def test_hand_counts_and_terms(self, spark):
        vals = [1.0, 12.5, 19.0, 2.0, 25.0, 9.5, 900.0]
        out = {r["digit"]: r for r in benford_digits(_rows(spark, vals), "x").collect()}
        assert len(out) == 9
        assert out[1]["n"] == 3 and out[2]["n"] == 2 and out[9]["n"] == 2
        assert out[3]["n"] == 0  # absent digit still present with n=0
        assert out[1]["share"] == pytest.approx(3 / 7)
        assert out[1]["expected"] == pytest.approx(math.log10(2))
        e = math.log10(2) * 7
        assert out[1]["chi2_term"] == pytest.approx((3 - e) ** 2 / e, rel=1e-12)

    def test_floor_not_round(self, spark):
        # 9.5 must read as digit 9, not round to 10 -> digit 1
        out = {r["digit"]: r["n"] for r in benford_digits(_rows(spark, [9.5]), "x").collect()}
        assert out[9] == 1 and out[1] == 0

    def test_negatives_and_small_values(self, spark):
        # |-23| -> digit 2; 0.5 and 0 excluded by the >= 1 convention
        out = {r["digit"]: r["n"] for r in benford_digits(
            _rows(spark, [-23.0, 0.5, 0.0]), "x").collect()}
        assert out[2] == 1 and sum(out.values()) == 1

    def test_benford_data_low_deviation(self, spark):
        # geometric growth is Benford-conformant
        vals = [1.05 ** i for i in range(1, 400)]
        out = benford_digits(_rows(spark, vals), "x").collect()
        assert sum(r["abs_dev"] for r in out) < 0.08

    def test_uniform_data_high_deviation(self, spark):
        # uniform [1, 9.99] is flat across digits: far from Benford
        vals = [1 + 8.99 * (i / 500) for i in range(500)]
        out = benford_digits(_rows(spark, vals), "x").collect()
        assert sum(r["abs_dev"] for r in out) > 0.3
