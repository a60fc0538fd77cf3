"""Checksum-validation audit (L397) and categorical overlap panel (L398)."""

import pytest

from lmss_entity_extractor_spark.ops.infotheory import overlap_panel
from lmss_entity_extractor_spark.ops.integrity import checksum_audit


class TestChecksumAudit:
    def _audit(self, spark, vals, scheme="luhn", **kw):
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v string"
        )
        return checksum_audit(df, ["grp"], "v", scheme=scheme, **kw).collect()[0]

    def test_luhn_knowns(self, spark):
        r = self._audit(
            spark,
            [
                "79927398713",           # classic valid
                "4539 5787 6362 1486",   # valid with separators
                "79927398710",           # bad check digit
                "12AB",                  # malformed
                None,
                "7",                     # too short -> malformed
            ],
        )
        assert r["n"] == 6
        assert r["n_null"] == 1
        assert r["n_malformed"] == 2
        assert r["n_valid"] == 2
        assert r["n_invalid"] == 1
        assert r["valid_rate"] == pytest.approx(2 / 3)
        assert r["sample_invalid"] == ["12AB", "7", "79927398710"]

    def test_mod97_knowns(self, spark):
        # 098 % 97 = 1 -> valid; 990 % 97 = 20, 197 % 97 = 3 -> invalid
        r = self._audit(spark, ["098", "990", "197", "abc"], scheme="mod97")
        assert r["n_valid"] == 1
        assert r["n_invalid"] == 2
        assert r["n_malformed"] == 1

    def test_mod97_long_string_fold(self, spark):
        # long digit string: fold must not overflow
        v = "1234567890" * 8
        expect = int(v) % 97
        digits = v + str((98 - (int(v + "00") % 97)) % 97).zfill(2)
        r = self._audit(spark, [digits], scheme="mod97")
        assert int(digits) % 97 == 1
        assert r["n_valid"] == 1

    def test_all_null_rate_null(self, spark):
        r = self._audit(spark, [None, None])
        assert r["valid_rate"] is None
        assert r["sample_invalid"] == []

    def test_sample_bounded(self, spark):
        r = self._audit(
            spark, [str(10 + i) for i in range(20)], sample=3
        )
        assert len(r["sample_invalid"]) == 3

    def test_bad_scheme_refused(self, spark):
        with pytest.raises(ValueError, match="scheme"):
            self._audit(spark, ["1"], scheme="crc32")


class TestOverlapPanel:
    def _panel(self, spark, a_vals, b_vals):
        rows = [("g", "a", v) for v in a_vals] + [
            ("g", "b", v) for v in b_vals
        ]
        df = spark.createDataFrame(rows, "grp string, g string, x int")
        return overlap_panel(df, ["grp"], "g", "a", "b", "x").collect()[0]

    def test_identical_distributions(self, spark):
        r = self._panel(spark, [1, 1, 2, 3], [1, 1, 2, 3])
        assert r["tv"] == pytest.approx(0.0)
        assert r["intersection"] == pytest.approx(1.0)
        assert r["bray_curtis"] == pytest.approx(0.0)

    def test_disjoint_supports(self, spark):
        r = self._panel(spark, [1, 2], [3, 4])
        assert r["tv"] == pytest.approx(1.0)
        assert r["intersection"] == pytest.approx(0.0)
        assert r["bray_curtis"] == pytest.approx(1.0)

    def test_hand_computed(self, spark):
        # a: {1:2, 2:2} over 4; b: {1:1, 3:3} over 4
        # p = (.5, .5, 0), q = (.25, 0, .75)
        # TV = (|.25| + |.5| + |.75|)/2 = 0.75; inter = 0.25
        r = self._panel(spark, [1, 1, 2, 2], [1, 3, 3, 3])
        assert r["tv"] == pytest.approx(0.75)
        assert r["intersection"] == pytest.approx(0.25)
        # BC = 1 - 2*min-sum/(8) = 1 - 2*1/8
        assert r["bray_curtis"] == pytest.approx(0.75)

    def test_identity_intersection_one_minus_tv(self, spark):
        r = self._panel(spark, [1, 2, 2, 5, 5, 5], [2, 5, 7])
        assert r["intersection"] == pytest.approx(1.0 - r["tv"], abs=1e-12)

    def test_bray_curtis_size_sensitive(self, spark):
        # same SHAPE, different sizes: TV = 0 but BC > 0
        r = self._panel(spark, [1, 2], [1, 1, 2, 2])
        assert r["tv"] == pytest.approx(0.0)
        assert r["bray_curtis"] == pytest.approx(
            (2 + 4 - 2 * 2) / 6
        )

    def test_empty_side_null(self, spark):
        r = self._panel(spark, [1, 2], [])
        assert r["tv"] is None and r["intersection"] is None
        assert r["bray_curtis"] == pytest.approx(1.0)
