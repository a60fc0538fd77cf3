"""Checkpoint/resume (O3): stage skipping, invalidation on config/input
change, and byte-identical (row-set-identical) outputs after resume
(BASELINE.md "resume correctness")."""

import shutil

import pytest

from lmss_entity_extractor_spark.checkpoints import CheckpointManager, config_hash, file_fingerprint
from lmss_entity_extractor_spark.datagen import write_transcripts_parquet
from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig


def _edge_hash(df):
    return df.selectExpr(
        "bit_xor(xxhash64(subj, pred, obj, n_provenances, first_conv_id, first_turn_idx)) AS h"
    ).collect()[0][0]


@pytest.fixture(scope="module")
def transcripts_path(tmp_path_factory):
    return write_transcripts_parquet(
        tmp_path_factory.mktemp("t") / "transcripts.parquet", n_convs=10, seed=7
    )


@pytest.mark.spark
def test_resume_skips_stages_and_reproduces_output(spark, owl_path, tmp_path, transcripts_path):
    wh = tmp_path / "wh"
    pipe = KGPipeline(spark, owl_path, wh, PipelineConfig(output_partitions=8))
    h1 = _edge_hash(pipe.run_path(transcripts_path)["edges"])
    assert pipe.metrics.get("edges_rows", 0) > 0

    pipe2 = KGPipeline(spark, owl_path, wh, PipelineConfig(output_partitions=8))
    h2 = _edge_hash(pipe2.run_path(transcripts_path)["edges"])
    assert pipe2.metrics.get("mentions_skipped") is True
    assert pipe2.metrics.get("edges_skipped") is True
    assert h1 == h2


@pytest.mark.spark
def test_kill_midway_resume(spark, owl_path, tmp_path, transcripts_path):
    """Simulate a crash after the links stage: delete edges+nodes outputs;
    rerun must skip mentions/links, recompute edges/nodes, same rows."""
    wh = tmp_path / "wh"
    pipe = KGPipeline(spark, owl_path, wh, PipelineConfig(output_partitions=8))
    h1 = _edge_hash(pipe.run_path(transcripts_path)["edges"])

    shutil.rmtree(wh / "edges")
    shutil.rmtree(wh / "nodes")

    pipe2 = KGPipeline(spark, owl_path, wh, PipelineConfig(output_partitions=8))
    out = pipe2.run_path(transcripts_path)
    assert pipe2.metrics.get("mentions_skipped") is True
    assert pipe2.metrics.get("links_skipped") is True
    assert "edges_rows" in pipe2.metrics  # recomputed, not skipped
    assert _edge_hash(out["edges"]) == h1


@pytest.mark.spark
def test_config_change_invalidates(spark, owl_path, tmp_path, transcripts_path):
    wh = tmp_path / "wh"
    pipe = KGPipeline(spark, owl_path, wh, PipelineConfig(output_partitions=8))
    pipe.run_path(transcripts_path)

    pipe2 = KGPipeline(
        spark, owl_path, wh, PipelineConfig(output_partitions=8, similarity_threshold=0.3)
    )
    pipe2.run_path(transcripts_path)
    assert pipe2.metrics.get("links_skipped") is not True
    assert pipe2.metrics.get("links_rows", 0) > 0


def test_fingerprint_stability(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("hello")
    fp1 = file_fingerprint(p)
    p.write_text("hello")  # byte-identical rewrite -> same fingerprint
    assert file_fingerprint(p) == fp1
    p.write_text("world")  # SAME SIZE, different content -> new fingerprint
    assert file_fingerprint(p) != fp1  # (head/tail content samples)
    p.write_text("worlds!")  # size change -> new fingerprint
    assert file_fingerprint(p) != fp1
    assert file_fingerprint(tmp_path / "missing") == file_fingerprint(tmp_path / "missing2")


def test_manifest_roundtrip(tmp_path):
    ck = CheckpointManager(tmp_path)
    cfg = config_hash({"a": 1})
    assert not ck.is_current("s", "fp", cfg)
    out = ck.output_path("s")
    out.mkdir(parents=True)
    (out / "_SUCCESS").write_text("")
    ck.record("s", "fp", cfg, rows=3)
    assert ck.is_current("s", "fp", cfg)
    assert not ck.is_current("s", "fp2", cfg)
    assert not ck.is_current("s", "fp", config_hash({"a": 2}))
    ck.invalidate("s")
    assert not ck.is_current("s", "fp", cfg)
