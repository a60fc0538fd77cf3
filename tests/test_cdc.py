"""CDC changelog apply (L116)."""

import pytest

from lmss_entity_extractor_spark.ops.cdc import apply_changelog


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).repartition(2)


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, op string, seq int")


class TestApplyChangelog:
    def test_iud_fold(self, spark, base):
        ch = _changes(
            spark,
            [
                (2, "b2", "U", 1),   # update
                (3, None, "D", 1),   # delete
                (4, "d", "I", 1),    # insert
            ],
        )
        got = sorted(map(tuple, apply_changelog(base, ch, ["k"], "seq").collect()))
        assert got == [(1, "a"), (2, "b2"), (4, "d")]

    def test_last_write_wins_across_ops(self, spark, base):
        ch = _changes(
            spark,
            [
                (2, "x", "U", 1), (2, None, "D", 2),   # U then D -> gone
                (5, "e1", "I", 1), (5, None, "D", 2), (5, "e3", "I", 3),  # I,D,I -> e3
            ],
        )
        got = sorted(map(tuple, apply_changelog(base, ch, ["k"], "seq").collect()))
        assert got == [(1, "a"), (3, "c"), (5, "e3")]

    def test_delete_unknown_key_is_noop(self, spark, base):
        ch = _changes(spark, [(99, None, "D", 1)])
        assert apply_changelog(base, ch, ["k"], "seq").count() == 3

    def test_tied_versions_raise(self, spark, base):
        ch = _changes(spark, [(2, "x", "U", 1), (2, "y", "U", 1)])
        with pytest.raises(ValueError, match="tied \\(key, order\\)"):
            apply_changelog(base, ch, ["k"], "seq")

    def test_tiebreak_resolves(self, spark, base):
        ch = _changes(spark, [(2, "x", "U", 1), (2, "y", "U", 1)])
        out = {r["k"]: r["v"] for r in
               apply_changelog(base, ch, ["k"], "seq", tiebreak_cols=["v"]).collect()}
        assert out[2] == "y"  # desc tiebreak on v

    def test_bad_op_raises(self, spark, base):
        ch = _changes(spark, [(2, "x", "UPSERT", 1)])
        with pytest.raises(ValueError, match="op column"):
            apply_changelog(base, ch, ["k"], "seq")

    def test_schema_validation(self, spark, base):
        ch = _changes(spark, [(2, "x", "U", 1)]).drop("v")
        with pytest.raises(ValueError, match="changes columns"):
            apply_changelog(base, ch, ["k"], "seq")
        with pytest.raises(ValueError, match="key_cols"):
            apply_changelog(base, _changes(spark, []), [], "seq")

    def test_idempotent_replay(self, spark, base):
        ch = _changes(spark, [(2, "b2", "U", 1), (3, None, "D", 1)])
        once = apply_changelog(base, ch, ["k"], "seq")
        twice = apply_changelog(once, ch, ["k"], "seq")
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
