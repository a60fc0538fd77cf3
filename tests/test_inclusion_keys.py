"""Inclusion-dependency audit (L385) and candidate-key audit (L386)."""

import pytest

from lmss_entity_extractor_spark.ops.integrity import (
    candidate_keys,
    inclusion_audit,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "y"), (9, "z"), (10, "z"), (None, "n")],
        "fk int, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (None, "w")],
        "pk int, tag string",
    )


class TestInclusionAudit:
    def test_partial_containment(self, spark):
        rows = {
            r["lhs_col"]: r
            for r in inclusion_audit(
                _left(spark), _right(spark), [("fk", "pk")]
            ).collect()
        }
        r = rows["fk"]
        # distinct non-NULL fk values: {1, 2, 9, 10}; missing: {9, 10}
        assert r["n_lhs"] == 4
        assert r["n_missing"] == 2
        assert r["containment"] == pytest.approx(0.5)
        assert r["holds"] is False
        # lexically smallest STRING: "10" < "9"
        assert r["sample_missing"] == "10"

    def test_holds_and_null_exempt(self, spark):
        left = spark.createDataFrame(
            [(1,), (2,), (None,)], "fk int"
        )
        r = inclusion_audit(left, _right(spark), [("fk", "pk")]).collect()[0]
        assert r["n_missing"] == 0
        assert r["holds"] is True
        assert r["containment"] == pytest.approx(1.0)
        assert r["sample_missing"] is None

    def test_multiple_pairs_one_row_each(self, spark):
        out = inclusion_audit(
            _left(spark), _right(spark), [("fk", "pk"), ("tag", "tag")]
        ).collect()
        assert len(out) == 2
        tag = [r for r in out if r["lhs_col"] == "tag"][0]
        # left tags {x,y,z,n}; right tags {x,y,z,w} -> n missing
        assert tag["n_missing"] == 1
        assert tag["sample_missing"] == "n"

    def test_empty_left_null_containment(self, spark):
        left = spark.createDataFrame([(None,)], "fk int")
        r = inclusion_audit(left, _right(spark), [("fk", "pk")]).collect()[0]
        assert r["n_lhs"] == 0
        assert r["containment"] is None
        assert r["holds"] is True

    def test_type_mismatch_refused(self, spark):
        with pytest.raises(ValueError, match="differ in type"):
            inclusion_audit(_left(spark), _right(spark), [("fk", "tag")])

    def test_empty_pairs_refused(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            inclusion_audit(_left(spark), _right(spark), [])

    def test_max_pairs_refused(self, spark):
        with pytest.raises(ValueError, match="max_pairs"):
            inclusion_audit(
                _left(spark),
                _right(spark),
                [("fk", "pk")] * 3,
                max_pairs=2,
            )


def _kdf(spark):
    return spark.createDataFrame(
        [
            (1, 1, "a"),
            (1, 2, "a"),
            (2, 1, "b"),
            (2, 1, "b"),     # dup of (2, 1)
            (3, 1, None),    # NULL in c
        ],
        "a int, b int, c string",
    )


class TestCandidateKeys:
    def test_key_and_non_key(self, spark):
        rows = {
            r["key_cols"]: r
            for r in candidate_keys(
                _kdf(spark), [["a"], ["a", "b"], ["a", "b", "c"]]
            ).collect()
        }
        a = rows["a"]
        assert a["n_rows"] == 5
        assert a["n_null_rows"] == 0
        assert a["n_distinct"] == 3
        assert a["n_dup_groups"] == 2
        assert a["max_group_rows"] == 2
        assert a["uniqueness"] == pytest.approx(3 / 5)
        assert a["is_key"] is False

        ab = rows["a,b"]
        # groups: (1,1) (1,2) (2,1)x2 (3,1) -> one dup group
        assert ab["n_distinct"] == 4
        assert ab["n_dup_groups"] == 1
        assert ab["is_key"] is False

        abc = rows["a,b,c"]
        # the (3,1,NULL) row is a null group: disqualifies is_key
        assert abc["n_null_rows"] == 1
        assert abc["n_distinct"] == 3   # (1,1,a) (1,2,a) (2,1,b)
        assert abc["n_dup_groups"] == 1
        assert abc["uniqueness"] == pytest.approx(3 / 4)
        assert abc["is_key"] is False

    def test_true_key(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
        r = candidate_keys(df, [["a"]]).collect()[0]
        assert r["is_key"] is True
        assert r["uniqueness"] == pytest.approx(1.0)
        assert r["n_dup_groups"] == 0
        assert r["max_group_rows"] == 1

    def test_all_null_uniqueness_null(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,)], "a int"
        )
        r = candidate_keys(df, [["a"]]).collect()[0]
        assert r["n_null_rows"] == 2
        assert r["n_distinct"] == 0
        assert r["uniqueness"] is None
        assert r["max_group_rows"] is None
        assert r["is_key"] is False

    def test_empty_combo_refused(self, spark):
        with pytest.raises(ValueError, match="empty column combo"):
            candidate_keys(_kdf(spark), [[]])

    def test_empty_candidates_refused(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            candidate_keys(_kdf(spark), [])

    def test_max_candidates_refused(self, spark):
        with pytest.raises(ValueError, match="max_candidates"):
            candidate_keys(_kdf(spark), [["a"]] * 3, max_candidates=2)
