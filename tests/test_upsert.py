"""Keyed MERGE / upsert (L105)."""

import pytest

from lmss_entity_extractor_spark.ops.upsert import assert_unique_keys, merge_upsert


def _rows(df):
    return sorted((tuple(r[c] for c in sorted(df.columns)) for r in df.collect()), key=repr)


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    ).repartition(2)


class TestMergeUpsert:
    def test_update_insert_keep(self, spark, base):
        upd = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], "k int, s string, v int")
        out = _rows(merge_upsert(base, upd, ["k"]))
        assert out == _rows(
            spark.createDataFrame(
                [(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)],
                "k int, s string, v int",
            )
        )

    def test_column_order_irrelevant(self, spark, base):
        upd = spark.createDataFrame([(99, "z", 1)], "v int, s string, k int")
        out = merge_upsert(base, upd, ["k"])
        assert out.filter("k = 1").first()["v"] == 99

    def test_last_write_wins_with_order_col(self, spark, base):
        upd = spark.createDataFrame(
            [(2, "old", 1), (2, "new", 2), (5, "x", 7)], "k int, s string, v int"
        )
        out = merge_upsert(base, upd, ["k"], order_col="v")
        got = {r["k"]: r["s"] for r in out.collect()}
        assert got == {1: "a", 2: "new", 3: "c", 5: "x"}

    def test_duplicate_update_keys_raise_without_order_col(self, spark, base):
        upd = spark.createDataFrame([(2, "x", 1), (2, "y", 2)], "k int, s string, v int")
        with pytest.raises(ValueError, match="duplicate update keys"):
            merge_upsert(base, upd, ["k"])
        with pytest.raises(ValueError, match="duplicate update keys"):
            assert_unique_keys(upd, ["k"])

    def test_empty_updates_is_identity(self, spark, base):
        upd = base.limit(0)
        assert _rows(merge_upsert(base, upd, ["k"])) == _rows(base)

    def test_validation(self, spark, base):
        upd = base.limit(1).drop("v")
        with pytest.raises(ValueError, match="schema mismatch"):
            merge_upsert(base, upd, ["k"])
        with pytest.raises(ValueError, match="non-empty"):
            merge_upsert(base, base, [])
        with pytest.raises(ValueError, match="order column"):
            merge_upsert(base, base.limit(1), ["k"], order_col="nope")
