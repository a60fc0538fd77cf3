"""Referential-integrity audit (L343) and FD-violation discovery (L344)."""

import pytest

from lmss_entity_extractor_spark.ops.integrity import fd_violations, fk_orphans


def _child(spark):
    return spark.createDataFrame(
        [
            (1, "a"), (2, "b"), (3, "c"),       # 3 -> orphan
            (3, "d"),                            # same orphan key again
            (None, "e"),                         # NULL fk: exempt
            (9, "f"),                            # orphan
        ],
        "fk int, payload string",
    )


def _parent(spark):
    return spark.createDataFrame([(1,), (2,), (4,)], "pk int")


class TestFkOrphans:
    def test_counts_and_sample(self, spark):
        row = fk_orphans(
            _child(spark), _parent(spark), ["fk"], ["pk"]
        ).collect()[0]
        assert row["n_child"] == 6
        assert row["n_fk_nonnull"] == 5
        assert row["n_orphan_rows"] == 3
        assert row["n_orphan_keys"] == 2
        assert row["orphan_rate"] == pytest.approx(3 / 5)
        assert row["sample_keys"] == ["3", "9"]

    def test_clean_fk_zero(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "fk int")
        row = fk_orphans(
            child, _parent(spark), ["fk"], ["pk"]
        ).collect()[0]
        assert row["n_orphan_rows"] == 0
        assert row["orphan_rate"] == 0.0
        assert row["sample_keys"] == []

    def test_composite_key(self, spark):
        child = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "x")], "a int, b string"
        )
        parent = spark.createDataFrame(
            [(1, "x"), (2, "x")], "a int, b string"
        )
        row = fk_orphans(
            child, parent, ["a", "b"], ["a", "b"]
        ).collect()[0]
        assert row["n_orphan_rows"] == 1
        assert row["sample_keys"] == ["1|y"]

    def test_all_null_fk_rate_null(self, spark):
        child = spark.createDataFrame(
            [(None,), (None,)], "fk int"
        )
        row = fk_orphans(
            child, _parent(spark), ["fk"], ["pk"]
        ).collect()[0]
        assert row["n_fk_nonnull"] == 0
        assert row["orphan_rate"] is None

    def test_refusals(self, spark):
        with pytest.raises(ValueError, match="same-length"):
            fk_orphans(_child(spark), _parent(spark), ["fk"], [])
        with pytest.raises(ValueError, match="sample"):
            fk_orphans(
                _child(spark), _parent(spark), ["fk"], ["pk"], sample=-1
            )


class TestFdViolations:
    def test_finds_violating_groups(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 1, "x"), ("a", 1, "x"),        # consistent
                ("b", 2, "y"), ("b", 3, "y"),        # b -> {2,3}: violation
                ("c", 4, "z"),
            ],
            "k string, v int, w string",
        )
        rows = fd_violations(df, ["k"], ["v"]).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["k"] == "b" and r["n_rows"] == 2 and r["n_dep"] == 2

    def test_null_is_a_value(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", None), ("b", None), ("b", "x")],
            "k string, v string",
        )
        rows = {r["k"]: r for r in fd_violations(df, ["k"], ["v"]).collect()}
        # a -> {NULL}: consistent; b -> {NULL, x}: violation
        assert "a" not in rows
        assert rows["b"]["n_dep"] == 2

    def test_holding_fd_empty(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 1), ("b", 2)], "k string, v int"
        )
        assert fd_violations(df, ["k"], ["v"]).count() == 0

    def test_refusals(self, spark):
        df = spark.createDataFrame([("a", 1)], "k string, v int")
        with pytest.raises(ValueError, match="non-empty"):
            fd_violations(df, [], ["v"])
        with pytest.raises(ValueError, match="both sides"):
            fd_violations(df, ["k"], ["k"])
