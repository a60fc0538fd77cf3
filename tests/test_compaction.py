"""Compaction planning (L176)."""

import pytest

from lmss_entity_extractor_spark.ops.compaction import (
    compaction_plan,
    compaction_summary,
)


def _files(spark, sizes):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "file_id bigint, bytes bigint"
    )


class TestCompaction:
    def test_small_files_grouped(self, spark):
        # ten 100-byte files into 400-byte buckets -> 4 per bucket
        plan = {
            r["file_id"]: r["bucket"]
            for r in compaction_plan(_files(spark, [100] * 10), 400).collect()
        }
        buckets = {}
        for f, b in plan.items():
            buckets.setdefault(b, []).append(f)
        assert sorted(len(v) for v in buckets.values()) == [2, 4, 4]

    def test_oversized_file_isolated(self, spark):
        # one 1000-byte file + small ones at target 400: the big file
        # sorts first and fills buckets 0-2 before any small file joins
        plan = {
            r["file_id"]: r["bucket"]
            for r in compaction_plan(
                _files(spark, [1000, 50, 50, 50]), 400
            ).collect()
        }
        assert plan[0] == 0
        assert all(plan[i] >= 2 for i in (1, 2, 3))

    def test_summary_conserves_bytes(self, spark):
        sizes = [317, 1021, 64, 64, 512, 9, 777]
        rows = compaction_summary(_files(spark, sizes), 512).collect()
        assert sum(r["bucket_bytes"] for r in rows) == sum(sizes)
        assert sum(r["n_files"] for r in rows) == len(sizes)

    def test_deterministic_across_parallelism(self, spark):
        sizes = [((i * 37) % 900) + 1 for i in range(200)]
        df = _files(spark, sizes)
        a = sorted(
            (r["file_id"], r["bucket"])
            for r in compaction_plan(df.repartition(1), 1000).collect()
        )
        b = sorted(
            (r["file_id"], r["bucket"])
            for r in compaction_plan(df.repartition(16), 1000).collect()
        )
        assert a == b

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="target_bytes"):
            compaction_plan(_files(spark, [1]), 0)
        df = spark.createDataFrame([(0, None)], "file_id bigint, bytes bigint")
        with pytest.raises(ValueError, match="NULL/negative"):
            compaction_plan(df, 100).collect()
