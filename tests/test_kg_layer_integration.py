"""The KG query/quality layer consumes the engine's OWN edges table:
BGP matching, RDFS entailment, SHACL validation, property paths, and
N-Triples export all run directly over `KGPipeline` output (subj/pred/
obj columns) — the layer is not a parallel universe, it is the read
side of the pipeline (SURVEY §1.5 emission vocabulary)."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.datagen import (
    write_fixture_owl,
    write_transcripts_parquet,
)
from lmss_entity_extractor_spark.graph.bgp import bgp_match
from lmss_entity_extractor_spark.graph.ntriples import (
    assert_no_malformed,
    parse_ntriples,
    to_ntriples,
)
from lmss_entity_extractor_spark.graph.proppath import property_path
from lmss_entity_extractor_spark.graph.rdfs import rdfs_entail
from lmss_entity_extractor_spark.graph.shacl import validate_shapes
from lmss_entity_extractor_spark.graph.triples import (
    PRED_IS_INSTANCE_OF,
    PRED_MENTIONED_IN,
    PRED_PART_OF,
)
from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig


@pytest.fixture(scope="module")
def edges(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("kglayer")
    owl = write_fixture_owl(str(base / "fixture.owl"))
    tp = write_transcripts_parquet(str(base / "transcripts.parquet"), n_convs=10, seed=3)
    pipe = KGPipeline(spark, owl, str(base / "wh"), PipelineConfig())
    out = pipe.run_path(tp)
    return out["edges"].localCheckpoint(eager=True)


class TestLayerOverPipelineEdges:
    def test_bgp_chain_over_edges(self, spark, edges):
        # mention -isInstanceOf-> class, mention -mentionedIn-> turn,
        # turn -partOf-> conv: the full provenance chain as one BGP
        sols = bgp_match(
            edges,
            [
                ("?m", PRED_IS_INSTANCE_OF, "?cls"),
                ("?m", PRED_MENTIONED_IN, "?turn"),
                ("?turn", PRED_PART_OF, "?conv"),
            ],
            s_col="subj",
            p_col="pred",
            o_col="obj",
        )
        n = sols.count()
        assert n > 0
        # every solution's mention really carries all three edges
        assert sols.filter(~F.col("conv").startswith("conv://")).count() == 0

    def test_property_path_mention_to_conv(self, spark, edges):
        # mentionedIn / partOf — mention to conversation in one path
        pairs = property_path(
            edges,
            ("seq", PRED_MENTIONED_IN, PRED_PART_OF),
            s_col="subj",
            p_col="pred",
            o_col="obj",
        )
        got = pairs.limit(5).collect()
        assert got and all(r["obj"].startswith("conv://") for r in got)

    def test_rdfs_domain_types_mentions(self, spark, edges):
        schema = spark.createDataFrame(
            [
                (PRED_IS_INSTANCE_OF, "rdfs:domain", "lmss:Mention"),
                (PRED_PART_OF, "rdfs:range", "lmss:Conversation"),
            ],
            "s string, p string, o string",
        )
        entailed = rdfs_entail(
            edges, schema, s_col="subj", p_col="pred", o_col="obj"
        )
        typed = entailed.filter(
            (F.col("p") == "rdf:type") & (F.col("o") == "lmss:Mention")
        )
        n_mentions = (
            edges.filter(F.col("pred") == PRED_IS_INSTANCE_OF)
            .select("subj")
            .distinct()
            .count()
        )
        assert typed.count() == n_mentions

    def test_shacl_conformance_of_pipeline_output(self, spark, edges):
        # every typed mention must carry >= 1 mentionedIn edge — true by
        # construction of emit_triples; SHACL proves it on real output
        schema = spark.createDataFrame(
            [(PRED_IS_INSTANCE_OF, "rdfs:domain", "lmss:Mention")],
            "s string, p string, o string",
        )
        entailed = rdfs_entail(edges, schema, s_col="subj", p_col="pred", o_col="obj")
        shapes = spark.createDataFrame(
            [("MentionShape", "lmss:Mention", PRED_MENTIONED_IN, 1, 1, None, None)],
            "shape_id string, target_class string, path string, min_count int, "
            "max_count int, pattern string, value_class string",
        )
        assert validate_shapes(entailed, shapes).count() == 0

    def test_ntriples_roundtrip_of_edges(self, spark, edges):
        spo = edges.select(
            F.col("subj").alias("s"), F.col("pred").alias("p"), F.col("obj").alias("o")
        ).distinct()
        lines = to_ntriples(spo, o_kind_col=None)
        back = assert_no_malformed(parse_ntriples(lines, mode="strict"))
        assert back.select("s", "p", "o").exceptAll(spo).count() == 0
        assert spo.exceptAll(back.select("s", "p", "o")).count() == 0
