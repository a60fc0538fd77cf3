"""The parity gate (SURVEY.md §5 item 2, BASELINE.md rows 1-2): the Spark
pipeline's canonical triple set vs the single-process oracle's, P/R >=
0.95, under per-turn text equality and stable (conv_id, turn_idx, start)
ordering — at both reference threshold profiles."""

import pytest

from lmss_entity_extractor_spark.datagen import write_fixture_owl
from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
from lmss_entity_extractor_spark.oracle import oracle_extract, oracle_triples
from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

PROFILES = {
    "api": dict(similarity_threshold=0.7, high_confidence_threshold=0.9),
    "cli": dict(similarity_threshold=0.3, high_confidence_threshold=0.9),
}


def _spark_triples(spark, tiny_transcripts, owl_path, warehouse, profile):
    cfg = PipelineConfig(**profile, output_partitions=8)
    pipe = KGPipeline(spark, owl_path, warehouse, cfg)
    tdf = spark.createDataFrame(rows_to_pandas(tiny_transcripts))
    out = pipe.run(tdf)
    return {
        (r.subj, r.pred, r.obj) for r in out["edges"].select("subj", "pred", "obj").collect()
    }


@pytest.mark.spark
@pytest.mark.parametrize("profile_name", sorted(PROFILES))
def test_triple_parity(spark, tiny_transcripts, owl_path, artifacts, warehouse, profile_name):
    profile = PROFILES[profile_name]
    got = _spark_triples(spark, tiny_transcripts, owl_path, warehouse / profile_name, profile)
    want = oracle_triples(
        [(c, t, x) for c, t, _, x, _, _ in tiny_transcripts],
        artifacts,
        **profile,
    )
    assert want, "oracle produced no triples — fixture corpus is broken"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f} (got {len(got)}, want {len(want)})"
    assert recall >= 0.95, f"recall {recall:.4f} (got {len(got)}, want {len(want)})"
    # with pinned deterministic encoder both sides should in fact be exact
    assert precision == 1.0 and recall == 1.0


@pytest.mark.spark
def test_mentions_match_oracle_and_are_stably_ordered(spark, tiny_transcripts, owl_path, artifacts, warehouse):
    """Extraction stage: per-turn mention rows equal the oracle's, and the
    materialized table is sorted by (conv_id, turn_idx, start) within
    partitions (T5)."""
    from lmss_entity_extractor_spark.extraction.stage import detect_mentions

    tdf = spark.createDataFrame(rows_to_pandas(tiny_transcripts))
    bc = spark.sparkContext.broadcast(artifacts)
    rows = detect_mentions(tdf, bc).collect()

    got = {}
    for r in rows:
        got.setdefault((r.conv_id, r.turn_idx), []).append((r.text, r.start, r.end, r.mtype))
    for key in got:
        got[key].sort(key=lambda m: (m[1], -m[2]))

    mismatches = 0
    total = 0
    for conv_id, turn_idx, _, text, _, _ in tiny_transcripts:
        want = [
            (m["text"], m["start"], m["end"], m["mtype"])
            for m in oracle_extract(text or "", artifacts)
        ]
        want.sort(key=lambda m: (m[1], -m[2]))
        total += 1
        if got.get((conv_id, turn_idx), []) != want:
            mismatches += 1
    assert total > 0
    assert mismatches == 0, f"{mismatches}/{total} turns mismatched"


@pytest.mark.spark
def test_mention_context_and_source(spark, artifacts):
    from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
    from lmss_entity_extractor_spark.extraction.stage import detect_mentions
    import datetime as dt

    long_text = ("x " * 80) + "patent law" + (" y" * 80)
    rows = [("c0", 0, "user", long_text, None, dt.datetime(2026, 1, 1))]
    tdf = spark.createDataFrame(rows_to_pandas(rows))
    bc = spark.sparkContext.broadcast(artifacts)
    out = [r for r in detect_mentions(tdf, bc).collect() if r.text == "patent law"]
    assert out, "expected a patent law mention"
    m = out[0]
    assert m.source == "NER"
    assert len(m.context) <= len("patent law") + 200
    assert "patent law" in m.context
    assert m.mention_id == f"mention://c0/0/{m.start}-{m.end}"
