"""Triple emission: links -> provenance-bearing (subj, pred, obj) rows.

North-rule emission (BASELINE.json): ``(mention_entity,
lmss:isInstanceOf, lmss_class)`` plus conv/turn provenance edges.  The
reference's terminal emission is the per-mention match dict
(/root/reference/app/lmss_classification.py:140-148); the triple families
here are its graph-table form (SURVEY.md §1.5, §2.7):

  mention --lmss:isInstanceOf--> class IRI     (one per link)
  mention --prov:mentionedIn--> turn URI       (one per link)
  turn    --prov:partOf-->      conv URI       (per turn with >=1 link)

Everything is built with narrow column expressions (unionByName of three
projections — no UDF, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRED_IS_INSTANCE_OF = "lmss:isInstanceOf"
PRED_MENTIONED_IN = "prov:mentionedIn"
PRED_PART_OF = "prov:partOf"


def mention_uri_expr():
    """THE mention identity: ``mention://<conv>/<turn>/<start>-<end>``.

    Single definition shared by both extraction paths (staged
    detect_mentions and fused extract_and_link): batch and incremental
    runs over the same turn must mint byte-identical mention URIs or
    canonicalize_triples stops deduplicating across them — keep every
    producer on this one expression."""
    return F.concat(
        F.lit("mention://"), F.col("conv_id"),
        F.lit("/"), F.col("turn_idx").cast("string"),
        F.lit("/"), F.col("start").cast("string"),
        F.lit("-"), F.col("end").cast("string"),
    )


def _turn_uri():
    return F.concat(F.lit("turn://"), F.col("conv_id"), F.lit("/"), F.col("turn_idx"))


def _conv_uri():
    return F.concat(F.lit("conv://"), F.col("conv_id"))


def emit_triples(links: DataFrame) -> DataFrame:
    """links -> triples(subj, pred, obj, conv_id, turn_idx, score).

    Single-pass fan-out: the three triple families are generated as an
    inline array per link row and exploded — a union of three selects
    over the same links plan would recompute the (UDF-heavy) upstream
    three times; this shape computes it once and stays narrow."""
    fam = F.array(
        F.struct(
            F.col("mention_id").alias("subj"),
            F.lit(PRED_IS_INSTANCE_OF).alias("pred"),
            F.col("iri").alias("obj"),
            F.col("score").cast("float").alias("score"),
        ),
        F.struct(
            F.col("mention_id").alias("subj"),
            F.lit(PRED_MENTIONED_IN).alias("pred"),
            _turn_uri().alias("obj"),
            F.lit(1.0).cast("float").alias("score"),
        ),
        F.struct(
            _turn_uri().alias("subj"),
            F.lit(PRED_PART_OF).alias("pred"),
            _conv_uri().alias("obj"),
            F.lit(1.0).cast("float").alias("score"),
        ),
    )
    return links.select("conv_id", "turn_idx", F.explode(fam).alias("_t")).select(
        F.col("_t.subj").alias("subj"),
        F.col("_t.pred").alias("pred"),
        F.col("_t.obj").alias("obj"),
        "conv_id",
        "turn_idx",
        F.col("_t.score").alias("score"),
    )
