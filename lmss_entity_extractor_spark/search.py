"""Hybrid ontology search (operator J3/P10/P11/T1 — SURVEY.md §3.3).

Reference: ``LMSSSearch.search`` (/root/reference/app/lmss_search.py:61-104)
scores every (branch-filtered) index entity against one query string with

    0.3 * token_set_ratio + 0.3 * partial_ratio + 0.4 * cosine

keeps score > 0, sorts desc, top-10.  Spark form: a parameterized
DataFrame query over the ``lmss_index`` table — branch filtering is a
broadcast semi-join against the closure table (predicate pushdown does
the rest), fuzzy scores run in one Arrow-batched pandas UDF, and the
top-k is a TakeOrderedAndProject.

Note the reference's vector component is effectively 0 when the index
ships without per-entity embeddings (``Entity.embedding`` defaults to
None -> cosine guard returns 0, /root/reference/app/lmss_search.py:78,
106-110); here the build stage always provides mean embeddings, and
``use_embeddings=False`` reproduces the degenerate reference behavior.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .encoder import get_encoder
from .ontology.artifacts import OntologyArtifacts
from .textproc import partial_ratio, token_set_ratio

WEIGHT_TOKEN_SET = 0.3
WEIGHT_PARTIAL = 0.3
WEIGHT_VECTOR = 0.4


def ontology_index_df(spark: SparkSession, artifacts: OntologyArtifacts) -> DataFrame:
    """lmss_index as a DataFrame with the mean embedding column attached."""
    rows = [
        {
            "rdf_about": r["rdf_about"],
            "rdfs_label": r["rdfs_label"],
            "index_pos": r["index_pos"],
            "mean_vec": artifacts.mean_matrix[r["index_pos"]].tolist(),
        }
        for r in artifacts.index_rows
    ]
    return spark.createDataFrame(
        rows, "rdf_about string, rdfs_label string, index_pos int, mean_vec array<float>"
    )


def closure_df(spark: SparkSession, artifacts: OntologyArtifacts) -> DataFrame:
    return spark.createDataFrame(
        artifacts.closure, "desc_iri string, anc_iri string, depth int"
    )


def hybrid_search(
    spark: SparkSession,
    artifacts: OntologyArtifacts,
    query: str,
    selected_branches: list[str] | None = None,
    top_k: int = 10,
    use_embeddings: bool = True,
) -> DataFrame:
    """Returns (iri, label, score) — top_k by desc score, score > 0.

    Deterministic tiebreak: (desc score, asc iri)."""
    index = ontology_index_df(spark, artifacts)

    if selected_branches:
        # P10: restrict to selected branches ∪ transitive subclasses via
        # a broadcast left-semi join on the closure table.
        sel = spark.createDataFrame([(b,) for b in selected_branches], "anc_iri string")
        member = closure_df(spark, artifacts).join(F.broadcast(sel), "anc_iri").select(
            F.col("desc_iri").alias("rdf_about")
        )
        index = index.join(F.broadcast(member.distinct()), "rdf_about", "left_semi")

    qvec = get_encoder(artifacts.encoder_spec).encode(query).astype("float64")
    q_lower = query.lower()

    @pandas_udf("double")
    def fuzzy_score(labels: pd.Series) -> pd.Series:
        out = []
        for lbl in labels:
            ll = (lbl or "").lower()
            out.append(
                WEIGHT_TOKEN_SET * token_set_ratio(q_lower, ll) / 100.0
                + WEIGHT_PARTIAL * partial_ratio(q_lower, ll) / 100.0
            )
        return pd.Series(out)

    if use_embeddings:
        from .ops.similarity import cosine_expr

        qvec_col = F.array(*[F.lit(float(v)) for v in qvec])
        vector_score = F.lit(WEIGHT_VECTOR) * cosine_expr(qvec_col, F.col("mean_vec"))
    else:
        vector_score = F.lit(0.0)

    return (
        index.withColumn("score", fuzzy_score(F.col("rdfs_label")) + vector_score)
        .filter(F.col("score") > 0)  # P11
        .orderBy(F.desc("score"), F.asc("rdf_about"))  # T1 + deterministic tiebreak
        .limit(top_k)
        .select(F.col("rdf_about").alias("iri"), F.col("rdfs_label").alias("label"), F.round("score", 6).alias("score"))
    )
