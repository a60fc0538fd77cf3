"""Zone-map data skipping (L121)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.zonemap import (
    prune_files,
    read_zone_pruned,
    write_with_zonemap,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    path = str(tmp_path / "zt")
    manifest = write_with_zonemap(df, path, "k", n_files=10)
    return df, path, manifest


class TestZoneMap:
    def test_manifest_covers_all_rows_disjointly(self, spark, table):
        _, _, m = table
        assert sum(e["n_rows"] for e in m["files"]) == 1000
        spans = sorted((e["zmin"], e["zmax"]) for e in m["files"])
        for (a1, b1), (a2, _) in zip(spans, spans[1:]):
            assert b1 < a2  # range clustering -> disjoint zones

    def test_pruned_read_equals_full_filter(self, spark, table):
        df, path, _ = table
        got = sorted(r["k"] for r in read_zone_pruned(spark, path, 150, 449).collect())
        want = sorted(
            r["k"] for r in df.filter(F.col("k").between(150, 449)).collect()
        )
        assert got == want

    def test_actually_skips_files(self, spark, table):
        _, path, _ = table
        keep, total = prune_files(path, 150, 449)
        assert total == 10
        assert 1 <= len(keep) <= 4  # ~3 of 10 zones overlap [150, 449]

    def test_no_overlap_returns_empty_with_schema(self, spark, table):
        _, path, _ = table
        out = read_zone_pruned(spark, path, 5000, 6000)
        assert out.count() == 0 and "k" in out.columns

    def test_boundary_inclusive(self, spark, table):
        _, path, m = table
        edge = m["files"][0]["zmax"]
        got = {r["k"] for r in read_zone_pruned(spark, path, edge, edge).collect()}
        assert got == {edge}

    def test_missing_manifest_refuses(self, spark, tmp_path):
        p = str(tmp_path / "plain")
        spark.range(5).write.parquet(p)
        with pytest.raises(ValueError, match="refusing a blind full scan"):
            read_zone_pruned(spark, p, 0, 1)

    def test_damaged_manifest_refuses(self, spark, table):
        _, path, _ = table
        with open(os.path.join(path, "zonemap.json"), "w") as f:
            f.write("{not json")
        with pytest.raises(ValueError, match="damaged zone manifest"):
            read_zone_pruned(spark, path, 0, 1)

    def test_null_zone_keys_refused(self, spark, tmp_path):
        df = spark.createDataFrame([(1,), (None,)], "k int")
        with pytest.raises(ValueError, match="NULL 'k'"):
            write_with_zonemap(df, str(tmp_path / "z2"), "k")

    def test_manifest_is_valid_json_on_disk(self, spark, table):
        _, path, m = table
        with open(os.path.join(path, "zonemap.json")) as f:
            assert json.load(f) == m
