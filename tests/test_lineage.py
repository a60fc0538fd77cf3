"""Per-partition lineage (north rule: "per-partition lineage + metrics")."""

import pytest

from lmss_entity_extractor_spark.lineage import partition_lineage, write_stage_lineage


@pytest.mark.spark
def test_partition_lineage_counts_and_key_ranges(spark):
    df = spark.range(0, 100).selectExpr("id", "id % 7 AS k").repartition(4, "k")
    lin = partition_lineage(df, "stage_x", ["k", "id"]).collect()
    assert sum(r["n_rows"] for r in lin) == 100
    assert all(r["stage"] == "stage_x" for r in lin)
    for r in lin:
        assert r["key_min"]["k"] <= r["key_max"]["k"]


@pytest.mark.spark
def test_write_stage_lineage_persists_and_summarizes(spark, tmp_path):
    df = spark.range(0, 50).selectExpr("id", "id % 3 AS k").repartition(5, "k")
    summary = write_stage_lineage(df, tmp_path, "links", ["k"], meta={"config_hash": "abc"})
    assert summary["rows"] == 50
    assert summary["partitions"] >= 1
    assert summary["max_partition_rows"] >= summary["mean_partition_rows"]

    persisted = spark.read.parquet(str(tmp_path / "_lineage" / "links"))
    rows = persisted.collect()
    assert sum(r["n_rows"] for r in rows) == 50
    assert all(r["config_hash"] == "abc" for r in rows)


@pytest.mark.spark
def test_pipeline_records_lineage_per_stage(spark, owl_path, tmp_path):
    from lmss_entity_extractor_spark.datagen import write_transcripts_parquet
    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

    tp = write_transcripts_parquet(tmp_path / "t.parquet", n_convs=6, seed=3)
    pipe = KGPipeline(spark, owl_path, tmp_path / "wh", PipelineConfig(output_partitions=8))
    pipe.run_path(tp)
    for stage in ("mentions", "links", "edges", "nodes"):
        lin = pipe.metrics[f"{stage}_lineage"]
        assert lin["rows"] == pipe.metrics[f"{stage}_rows"]
        assert (tmp_path / "wh" / "_lineage" / stage).exists()
        # observe() aggregates collected during the stage's write action
        obs = pipe.metrics[f"{stage}_observed"]
        assert obs["rows"] == lin["rows"]
        assert obs["approx_keys"] >= 1


@pytest.mark.spark
def test_observe_stage_rides_an_action(spark):
    from lmss_entity_extractor_spark.lineage import observe_stage

    df = spark.range(0, 40).selectExpr("id", "id % 4 AS k")
    observed, collect = observe_stage(df, "probe", key_col="k")
    observed.count()
    metrics = collect()
    assert metrics["rows"] == 40
    assert metrics["approx_keys"] == 4
