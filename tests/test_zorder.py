"""Z-order keys (ops/zorder.py): hand-computed interleaves, locality
property, out-of-range loudness, layout pruning effect.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.zorder import zorder_key, zorder_repartition


def _keys(spark, rows, bits=4):
    df = spark.createDataFrame(rows, "x int, y int")
    return [
        r["z"] for r in df.select(zorder_key(["x", "y"], bits=bits).alias("z")).collect()
    ]


def _ref_morton(x, y, bits):
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_hand_computed_interleave(spark):
    # (1,0)->1, (0,1)->2, (1,1)->3, (2,2)->12, (3,5)->39
    rows = [(1, 0), (0, 1), (1, 1), (2, 2), (3, 5)]
    assert _keys(spark, rows) == [1, 2, 3, 12, 39]


def test_matches_reference_morton_exhaustively(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    got = _keys(spark, rows, bits=4)
    assert got == [_ref_morton(x, y, 4) for x, y in rows]


def test_three_columns(spark):
    df = spark.createDataFrame([(1, 1, 1), (0, 0, 2)], "a int, b int, c int")
    got = [
        r["z"]
        for r in df.select(zorder_key(["a", "b", "c"], bits=2).alias("z")).collect()
    ]
    # (1,1,1): bits 0,1,2 -> 7 ; (0,0,2): c bit1 -> position 1*3+2 = 5 -> 32
    assert got == [7, 32]


def test_out_of_range_is_loud(spark):
    df = spark.createDataFrame([(16, 0)], "x int, y int")
    with pytest.raises(Exception, match="out of"):
        df.select(zorder_key(["x", "y"], bits=4).alias("z")).collect()
    df2 = spark.createDataFrame([(-1, 0)], "x int, y int")
    with pytest.raises(Exception, match="out of"):
        df2.select(zorder_key(["x", "y"], bits=4).alias("z")).collect()


def test_bits_width_validated(spark):
    with pytest.raises(ValueError, match="in \\(0, 63\\]"):
        zorder_key(["a", "b"], bits=32)
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key(["a"], bits=8)


def test_layout_prunes_both_dimensions(spark):
    # 32x32 grid, 16 range partitions on the z-key: a selective box
    # predicate on (x, y) must touch a small fraction of partitions --
    # the file-skipping effect the layout exists for.
    df = spark.range(1024).select(
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
    )
    # localCheckpoint pins the layout: without it Catalyst pushes the
    # filter BELOW the range exchange and every partition gets data
    laid = zorder_repartition(df, ["x", "y"], bits=5, num_partitions=16).localCheckpoint()

    def hit_partitions(pred_df):
        return (
            pred_df.select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )

    box = laid.filter((F.col("x") < 8) & (F.col("y") < 8))
    assert box.count() == 64
    # 64/1024 of the data; with z-layout those rows live in the low key
    # range -> few partitions.  A row-number layout would smear y.
    assert hit_partitions(box) <= 4


def test_key_rides_projection_no_exchange(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).cast("int").alias("x"),
        (F.col("id") % 7).cast("int").alias("y"),
    )
    plan = (
        df.select(zorder_key(["x", "y"], bits=8).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
