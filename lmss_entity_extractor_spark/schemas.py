"""StructType schemas asserted at stage boundaries (SURVEY.md §1.7 —
the Spark equivalent of the reference's Pydantic models,
/root/reference/app/entity_extraction.py:16-25,
/root/reference/app/lmss_search.py:11-27, /root/reference/app/main.py:56-74).
"""

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input table (BASELINE.json input_hint)
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# mentions — ExtractedEntity equivalent (+provenance keys)
MENTIONS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("mention_id", StringType()),
        StructField("text", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
        StructField("mtype", StringType()),
        StructField("source", StringType()),
        StructField("context", StringType()),
        StructField("confidence", FloatType()),
    ]
)

MENTIONS_WITH_VECTOR = StructType(MENTIONS.fields + [StructField("vector", ArrayType(FloatType()))])

# links — classifier output row equivalent
# (/root/reference/app/lmss_classification.py:140-148)
LINKS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("mention_id", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
        StructField("text", StringType()),
        StructField("branch", StringType()),
        StructField("label", StringType()),
        StructField("score", FloatType()),
        StructField("iri", StringType()),
    ]
)

LINK_RESULT = StructType(
    [
        StructField("iri", StringType()),
        StructField("label", StringType()),
        StructField("score", FloatType()),
        StructField("branch", StringType()),
    ]
)

# triples with provenance (FIXTURES.md §4)
TRIPLES = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("score", FloatType()),
    ]
)

# canonical graph tables
EDGES = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("n_provenances", LongType()),
        StructField("first_conv_id", StringType()),
        StructField("first_turn_idx", IntegerType()),
        StructField("max_score", FloatType()),
    ]
)

NODES = StructType(
    [
        StructField("node_id", StringType()),
        StructField("node_type", StringType()),
        StructField("node_label", StringType()),
    ]
)

# ontology build-stage tables (FIXTURES.md §2)
LMSS_INDEX = StructType(
    [
        StructField("rdf_about", StringType()),
        StructField("rdfs_label", StringType()),
        StructField("description", StringType()),
        StructField("rdfs_seeAlso", ArrayType(StringType())),
        StructField("skos_altLabel", ArrayType(StringType())),
        StructField("skos_definition", StringType()),
        StructField("skos_example", ArrayType(StringType())),
        StructField("skos_prefLabel", StringType()),
        StructField("subClassOf", ArrayType(StringType())),
        StructField("index_pos", IntegerType()),
    ]
)

ONTOLOGY_CLOSURE = StructType(
    [
        StructField("desc_iri", StringType()),
        StructField("anc_iri", StringType()),
        StructField("depth", IntegerType()),
    ]
)

ONTOLOGY_EMBEDDINGS = StructType(
    [
        StructField("iri", StringType()),
        StructField("field", StringType()),
        StructField("vec", ArrayType(FloatType())),
    ]
)

TOP_CLASSES = StructType(
    [
        StructField("iri", StringType()),
        StructField("label", StringType()),
        StructField("entities_count", IntegerType()),
    ]
)
