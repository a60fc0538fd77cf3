"""Turtle export sink (K3 parity: /root/reference/app/lmss_parser.py:166-169)."""

import pytest

from lmss_entity_extractor_spark.graph import edges_to_turtle


@pytest.fixture()
def edges(spark):
    rows = [
        ("mention://c1/0/5", "lmss:isInstanceOf", "http://lmss.sali.org/R8pNP"),
        ("mention://c1/0/5", "prov:mentionedIn", "turn://c1/0"),
        ("turn://c1/0", "prov:partOf", "conv://c1"),
        ("mention://c2/1/9", "lmss:isInstanceOf", 'plain "literal" value'),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.mark.spark
def test_turtle_roundtrip_shape(spark, edges, tmp_path):
    out = tmp_path / "graph.ttl"
    n = edges_to_turtle(edges, out)
    assert n == 4
    text = out.read_text()
    assert text.startswith("@prefix lmss:")
    body = [l for l in text.splitlines() if l and not l.startswith("@prefix")]
    assert len(body) == 4
    assert all(l.endswith(" .") for l in body)
    # URIs bracketed, qnames kept, literals escaped
    assert "<mention://c1/0/5> lmss:isInstanceOf <http://lmss.sali.org/R8pNP> ." in text
    assert '"plain \\"literal\\" value"' in text
    # deterministic: re-export yields identical bytes
    edges_to_turtle(edges, tmp_path / "graph2.ttl")
    assert (tmp_path / "graph2.ttl").read_text() == text


@pytest.mark.spark
def test_turtle_row_cap_refuses_truncation(spark, edges, tmp_path):
    with pytest.raises(ValueError, match="max_rows"):
        edges_to_turtle(edges, tmp_path / "g.ttl", max_rows=2)


@pytest.mark.spark
def test_turtle_from_pipeline_edges(spark, owl_path, tmp_path):
    from lmss_entity_extractor_spark.datagen import gen_transcript_rows
    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig
    from lmss_entity_extractor_spark.schemas import TRANSCRIPTS

    tdf = spark.createDataFrame(gen_transcript_rows(n_convs=4, seed=7), schema=TRANSCRIPTS)
    pipe = KGPipeline(
        spark, owl_path, tmp_path / "wh", PipelineConfig(materialize_intermediate=False)
    )
    flow = pipe.dataflow(tdf)
    out = tmp_path / "kg.ttl"
    n = edges_to_turtle(flow["edges"], out)
    assert n == flow["edges"].count()
    assert "lmss:isInstanceOf" in out.read_text()


@pytest.mark.spark
def test_turtle_escapes_illegal_iri_chars(spark, tmp_path):
    """Regression: data-derived URIs with spaces/brackets must be
    percent-encoded — a raw space inside <...> is invalid Turtle."""
    e = spark.createDataFrame(
        [("conv://case 42", "prov:partOf", "turn://a<b>c"),
         ("mention://x", "lmss:isInstanceOf", 'line\rbreak\ttab')],
        "subj string, pred string, obj string",
    )
    out = tmp_path / "esc.ttl"
    edges_to_turtle(e, out)
    text = out.read_text()
    assert "<conv://case%2042>" in text
    assert "<turn://a%3Cb%3Ec>" in text
    assert '"line\\rbreak\\ttab"' in text
    assert " 42>" not in text  # no raw space survives inside an IRI ref
