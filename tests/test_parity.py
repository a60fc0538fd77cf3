"""The parity gate (SURVEY.md §5 item 2, BASELINE.md rows 1-2): the Spark
pipeline's canonical triple set vs the single-process oracle's, P/R >=
0.95, under per-turn text equality and stable (conv_id, turn_idx, start)
ordering — at both reference threshold profiles."""

import sys
from pathlib import Path

import pytest

from lmss_entity_extractor_spark.datagen import write_fixture_owl
from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
from lmss_entity_extractor_spark.ontology import build_artifacts
from lmss_entity_extractor_spark.oracle import oracle_extract, oracle_triples
from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

PROFILES = {
    "api": dict(similarity_threshold=0.7, high_confidence_threshold=0.9),
    "cli": dict(similarity_threshold=0.3, high_confidence_threshold=0.9),
}

# Encoder matrix for the parity gate: the pinned default, the built-in md5
# alternative, and a test-local module shipped to executors through the
# qualified-spec seam (tests/toy_encoder.py self-registers at import).
ENCODER_SPECS = ["hashed-v1", "hashed-md5-32", "toy_encoder:test-sha1-24"]

_TOY_MODULE = Path(__file__).resolve().parent / "toy_encoder.py"


def _ship_toy_encoder(spark):
    """Driver side: make ``import toy_encoder`` resolvable; executor side:
    ship the file exactly like ``spark-submit --py-files`` would."""
    if str(_TOY_MODULE.parent) not in sys.path:
        sys.path.insert(0, str(_TOY_MODULE.parent))
    try:
        spark.sparkContext.addPyFile(str(_TOY_MODULE))
    except Exception as exc:  # re-adding in one session is the only benign case
        if "already" not in str(exc).lower():
            raise


def _spark_triples(spark, tiny_transcripts, owl_path, warehouse, profile, encoder_spec):
    cfg = PipelineConfig(**profile, output_partitions=8, encoder_spec=encoder_spec)
    pipe = KGPipeline(spark, owl_path, warehouse, cfg)
    tdf = spark.createDataFrame(rows_to_pandas(tiny_transcripts))
    out = pipe.run(tdf)
    return {
        (r.subj, r.pred, r.obj) for r in out["edges"].select("subj", "pred", "obj").collect()
    }


@pytest.mark.spark
@pytest.mark.parametrize("encoder_spec", ENCODER_SPECS)
@pytest.mark.parametrize("profile_name", sorted(PROFILES))
def test_triple_parity(
    spark, tiny_transcripts, owl_path, index_rows, warehouse, profile_name, encoder_spec
):
    """The parity gate, parameterized over encoder specs (VERDICT r2 item
    4): the pinned default, the built-in md5 alternative, and a test-local
    encoder injected through register_encoder — each must flow broadcast
    -> executor Linker -> canonical edges with exact oracle parity."""
    profile = PROFILES[profile_name]
    if ":" in encoder_spec:
        _ship_toy_encoder(spark)
    got = _spark_triples(
        spark,
        tiny_transcripts,
        owl_path,
        warehouse / f"{profile_name}_{encoder_spec.replace(':', '_')}",
        profile,
        encoder_spec,
    )
    arts = build_artifacts(index_rows, encoder_spec=encoder_spec)
    want = oracle_triples(
        [(c, t, x) for c, t, _, x, _, _ in tiny_transcripts],
        arts,
        **profile,
    )
    assert want, "oracle produced no triples — fixture corpus is broken"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f} (got {len(got)}, want {len(want)})"
    assert recall >= 0.95, f"recall {recall:.4f} (got {len(got)}, want {len(want)})"
    # with pinned deterministic encoders both sides should in fact be exact
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
