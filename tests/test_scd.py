"""SCD Type-2 change-history collapse (L104)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.scd import scd2_collapse


def _rows(df):
    return sorted(
        (tuple(r[c] for c in ("k", "a", "valid_from", "valid_to", "is_current")) for r in df.collect()),
        key=repr,
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, a string").repartition(3)


class TestScd2Collapse:
    def test_hand_computed_runs(self, spark):
        ev = _mk(spark, [("u", 1, "A"), ("u", 2, "A"), ("u", 3, "B"), ("u", 4, "B"), ("u", 5, "A")])
        out = scd2_collapse(ev, ["k"], "ts", ["a"])
        assert _rows(out) == [
            ("u", "A", 1, 3, False),
            ("u", "A", 5, None, True),
            ("u", "B", 3, 5, False),
        ]

    def test_intervals_chain_exactly(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (f"k{i % 5}", t, rng.choice("XYZ"))
            for i in range(5)
            for t in range(1, 40)
        ]
        out = scd2_collapse(_mk(spark, rows), ["k"], "ts", ["a"]).collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r["k"], []).append(r)
        for k, vs in by_key.items():
            vs.sort(key=lambda r: r["valid_from"])
            assert vs[-1]["valid_to"] is None and vs[-1]["is_current"]
            for cur, nxt in zip(vs, vs[1:]):
                assert cur["valid_to"] == nxt["valid_from"]  # half-open chain
                assert not cur["is_current"]
                assert cur["a"] != nxt["a"]  # consecutive runs truly differ

    def test_null_attr_is_a_change(self, spark):
        ev = _mk(spark, [("u", 1, "A"), ("u", 2, None), ("u", 3, None), ("u", 4, "A")])
        out = _rows(scd2_collapse(ev, ["k"], "ts", ["a"]))
        assert out == [
            ("u", "A", 1, 2, False),
            ("u", "A", 4, None, True),
            ("u", None, 2, 4, False),
        ]

    def test_keys_isolated(self, spark):
        ev = _mk(spark, [("u", 1, "A"), ("v", 2, "A"), ("u", 3, "A")])
        out = scd2_collapse(ev, ["k"], "ts", ["a"])
        assert out.count() == 2 and out.filter("is_current").count() == 2

    def test_single_exchange(self, spark):
        ev = _mk(spark, [("u", 1, "A"), ("u", 2, "B")])
        plan = scd2_collapse(ev, ["k"], "ts", ["a"])._jdf.queryExecution().executedPlan().toString()
        # both windows + the change-point filter ride ONE hash exchange
        # (the repartition(3) RoundRobin exchange is the input's own)
        assert plan.count("hashpartitioning") == 1

    def test_validation(self, spark):
        ev = _mk(spark, [("u", 1, "A")])
        with pytest.raises(ValueError, match="not in DataFrame"):
            scd2_collapse(ev, ["k"], "ts", ["missing"])
        with pytest.raises(ValueError, match="non-empty"):
            scd2_collapse(ev, ["k"], "ts", [])


class TestPitJoin:
    def _dim(self, spark):
        from lmss_entity_extractor_spark.ops.scd import pit_join  # noqa

        # u: [1,3) A, [3,7) B, gap, [9, null) C   (gap: 7 <= ts < 9)
        return spark.createDataFrame(
            [("u", 1, 3, "A"), ("u", 3, 7, "B"), ("u", 9, None, "C")],
            "k string, valid_from long, valid_to long, a string",
        )

    def test_effective_version_boundaries_and_gap(self, spark):
        from lmss_entity_extractor_spark.ops.scd import pit_join

        facts = spark.createDataFrame(
            [(0,), (1,), (2,), (3,), (6,), (7,), (8,), (9,), (100,)], "ts long"
        ).withColumn("k", F.lit("u"))
        out = pit_join(facts, self._dim(spark), ["k"], "ts", ["a"])
        got = {r["ts"]: r["pit_a"] for r in out.collect()}
        assert got == {0: None, 1: "A", 2: "A", 3: "B", 6: "B",
                       7: None, 8: None, 9: "C", 100: "C"}

    def test_zero_length_versions_ignored(self, spark):
        from lmss_entity_extractor_spark.ops.scd import pit_join

        dim = spark.createDataFrame(
            [("u", 5, 5, "ghost"), ("u", 5, None, "real")],
            "k string, valid_from long, valid_to long, a string",
        )
        facts = spark.createDataFrame([(5,), (6,)], "ts long").withColumn("k", F.lit("u"))
        got = {r["ts"]: r["pit_a"] for r in pit_join(facts, dim, ["k"], "ts", ["a"]).collect()}
        assert got == {5: "real", 6: "real"}

    def test_composes_with_scd2_collapse(self, spark):
        ev = _mk(spark, [("u", 1, "A"), ("u", 2, "A"), ("u", 4, "B"), ("u", 9, "A")])
        from lmss_entity_extractor_spark.ops.scd import pit_join

        dim = scd2_collapse(ev, ["k"], "ts", ["a"])
        facts = spark.createDataFrame([(1,), (3,), (4,), (8,), (9,)], "ts long").withColumn(
            "k", F.lit("u")
        )
        got = {r["ts"]: r["pit_a"] for r in pit_join(facts, dim, ["k"], "ts", ["a"]).collect()}
        # chained history: every fact at/after the first observation matches
        assert got == {1: "A", 3: "A", 4: "B", 8: "B", 9: "A"}

    def test_validation(self, spark):
        from lmss_entity_extractor_spark.ops.scd import pit_join

        dim = self._dim(spark)
        facts = spark.createDataFrame([(1,)], "ts long")
        with pytest.raises(ValueError, match="missing"):
            pit_join(facts, dim.drop("valid_to"), ["k"], "ts", ["a"])
        with pytest.raises(ValueError, match="missing"):
            pit_join(facts.withColumnRenamed("ts", "zz"), dim, ["k"], "ts", ["a"])
