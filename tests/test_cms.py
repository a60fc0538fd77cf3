"""Count-min sketch columns (L120)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.cms import cms_build, cms_estimate, cms_merge


@pytest.fixture(scope="module")
def items(spark):
    # group 'g1': item 7 x5, item 13 x2; group 'g2': item 7 x1
    rows = [("g1", 7)] * 5 + [("g1", 13)] * 2 + [("g2", 7)]
    return spark.createDataFrame(rows, "g string, item long")


class TestCms:
    def test_exact_when_wide(self, spark, items):
        sk = cms_build(items, ["g"], "item", depth=4, width=4096)
        probes = spark.createDataFrame(
            [("g1", 7), ("g1", 13), ("g1", 99), ("g2", 7), ("g2", 13)],
            "g string, item long",
        )
        got = {
            (r["g"], r["item"]): r["est"]
            for r in cms_estimate(sk, probes, ["g"], "item", depth=4, width=4096).collect()
        }
        assert got == {
            ("g1", 7): 5, ("g1", 13): 2, ("g1", 99): 0,
            ("g2", 7): 1, ("g2", 13): 0,
        }

    def test_never_underestimates_when_narrow(self, spark):
        rows = [("g", i % 17) for i in range(500)]
        df = spark.createDataFrame(rows, "g string, item long")
        sk = cms_build(df, ["g"], "item", depth=3, width=8)  # heavy collisions
        probes = df.select("g", "item").distinct()
        est = cms_estimate(sk, probes, ["g"], "item", depth=3, width=8)
        true = df.groupBy("g", "item").agg(F.count("*").alias("t"))
        bad = est.join(true, ["g", "item"]).filter(F.col("est") < F.col("t")).count()
        assert bad == 0

    def test_merge_equals_rebuild(self, spark, items):
        # split the rows in two, sketch each half, merge — must equal
        # the sketch of the whole (counter addition is exact)
        rows = items.collect()
        h1 = spark.createDataFrame(rows[:4], items.schema)
        h2 = spark.createDataFrame(rows[4:], items.schema)
        merged = cms_merge(
            [cms_build(h1, ["g"], "item"), cms_build(h2, ["g"], "item")], ["g"]
        )
        rebuilt = cms_build(items, ["g"], "item")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_sketch_size_bounded(self, spark):
        rows = [("g", i) for i in range(1000)]
        df = spark.createDataFrame(rows, "g string, item long")
        sk = cms_build(df, ["g"], "item", depth=4, width=32)
        assert sk.count() <= 4 * 32

    def test_null_items_dropped(self, spark):
        df = spark.createDataFrame([("g", 1), ("g", None)], "g string, item long")
        sk = cms_build(df, ["g"], "item", depth=2, width=16)
        assert sk.agg(F.sum("cnt")).collect()[0][0] == 2  # one row x depth 2

    def test_validation(self, spark, items):
        with pytest.raises(ValueError, match="depth"):
            cms_build(items, ["g"], "item", depth=0)
        with pytest.raises(ValueError, match="width"):
            cms_build(items, ["g"], "item", width=1)
        with pytest.raises(ValueError, match="not in DataFrame"):
            cms_build(items, ["g"], "nope")
        with pytest.raises(ValueError, match="at least one"):
            cms_merge([], ["g"])


class TestJoinSize:
    def test_exact_when_wide_and_clean(self, spark):
        from lmss_entity_extractor_spark.ops.cms import cms_join_size

        a = spark.createDataFrame([("g", k) for k in [1, 1, 2, 3]], "g string, item long")
        b = spark.createDataFrame([("g", k) for k in [1, 2, 2, 9]], "g string, item long")
        ska = cms_build(a, ["g"], "item", depth=4, width=4096)
        skb = cms_build(b, ["g"], "item", depth=4, width=4096)
        est = cms_join_size(ska, skb, depth=4, group_cols=["g"]).collect()[0]
        # true join size: key1 2x1 + key2 1x2 = 4
        assert est["join_size_est"] == 4

    def test_disjoint_keys_estimate_zero(self, spark):
        from lmss_entity_extractor_spark.ops.cms import cms_join_size

        a = spark.createDataFrame([("g", 1)], "g string, item long")
        b = spark.createDataFrame([("g", 2)], "g string, item long")
        ska = cms_build(a, ["g"], "item", depth=4, width=4096)
        skb = cms_build(b, ["g"], "item", depth=4, width=4096)
        assert cms_join_size(ska, skb, 4, ["g"]).collect()[0]["join_size_est"] == 0

    def test_never_underestimates_when_narrow(self, spark):
        from lmss_entity_extractor_spark.ops.cms import cms_join_size

        rows_a = [("g", i % 13) for i in range(200)]
        rows_b = [("g", i % 9) for i in range(150)]
        a = spark.createDataFrame(rows_a, "g string, item long")
        b = spark.createDataFrame(rows_b, "g string, item long")
        true = a.join(b, ["g", "item"]).count()
        ska = cms_build(a, ["g"], "item", depth=3, width=8)
        skb = cms_build(b, ["g"], "item", depth=3, width=8)
        est = cms_join_size(ska, skb, 3, ["g"]).collect()[0]["join_size_est"]
        assert est >= true
