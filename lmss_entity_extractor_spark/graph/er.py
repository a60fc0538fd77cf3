"""Entity resolution over node records: blocking → pairwise name
matching → connected components → canonical-id election — the record-
linkage step that turns "many strings naming the same thing" into one
KG node (Fellegi-Sunter lineage; the blocking+components shape of
Dedoop/Magellan-style ER systems, re-expressed relationally).

Stages, Spark-first, nothing all-pairs:

1. normalize: lower / trim / collapse whitespace — JVM expressions.
2. block: one (token, node) explode of the DISTINCT name tokens; a
   token appearing in more than ``max_block_size`` records is dropped
   (stop-token guard — the web-scale lever: a token like "inc" pairs
   everything with everything and carries no signal; same cap idea as
   linkpred's hub cap and dedup's stop-shingle guard).  Candidate
   pairs = within-token self-join with ``id < id``, distinct.
3. match: token-set Jaccard ≥ threshold, computed EXACTLY — the
   threshold is turned into a fraction (`Fraction(str(t))`) and the
   test is the integer cross-multiplication
   ``|A∩B| * den >= num * |A∪B|``, so no engine's float rounding can
   flip a boundary pair (0.8 * 5 is not 4.0 in IEEE — this matters).
4. cluster: connected components over the match edges
   (ops/components.py — propagation or star, caller's pick).
5. canonicalize: component minimum id; records that matched nothing
   map to themselves, so the output is a TOTAL (node, canonical)
   mapping ready for graph/sameas.py-style rewriting.

The only wide shuffles are the token-count aggregate, the pair join,
and the component rounds — all keyed; pair volume is bounded by
``max_block_size²`` per token, never by the corpus.

Reference counterpart: none — the reference links mentions to a fixed
ontology but never resolves its own emitted entities against each
other; part of the beyond-reference KG mandate (SURVEY §2.11).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ops.components import connected_components


def _norm(c: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def _tokens(c: Column) -> Column:
    # empty/whitespace-only names produce [""] from split — remove the
    # empty token so such records never block (they stay singletons
    # via the totality join in resolve_entities)
    return F.array_remove(F.array_distinct(F.split(_norm(c), " ")), "")


def match_pairs(
    nodes: DataFrame,
    *,
    id_col: str = "node_id",
    name_col: str = "name",
    threshold: float = 0.8,
    max_block_size: int = 100,
) -> DataFrame:
    """Candidate generation + exact-Jaccard matching: returns the match
    edges (id_a, id_b, inter_size, union_size) with id_a < id_b."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_block_size < 2:
        raise ValueError(f"max_block_size must be >= 2, got {max_block_size}")
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator

    recs = nodes.select(
        F.col(id_col).alias("id"), _tokens(F.col(name_col)).alias("toks")
    ).filter(F.size("toks") > 0)

    blocks = recs.select("id", F.explode("toks").alias("tok"))
    # stop-token guard: pair volume per token is capped structurally
    keep = (
        blocks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_block_size)
        .select("tok")
    )
    blocks = blocks.join(keep, "tok", "left_semi")
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), "tok")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ta = recs.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = recs.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    scored = (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("inter_size"),
            F.size(F.array_union("toks_a", "toks_b")).alias("union_size"),
        )
    )
    return scored.filter(
        F.col("inter_size") * F.lit(den) >= F.lit(num) * F.col("union_size")
    )


def resolve_entities(
    nodes: DataFrame,
    *,
    id_col: str = "node_id",
    name_col: str = "name",
    threshold: float = 0.8,
    max_block_size: int = 100,
    algorithm: str = "propagation",
    max_iter: int | None = None,
) -> DataFrame:
    """Full ER: returns the TOTAL (node_id, canonical_id) mapping —
    canonical = component-minimum id; singletons map to themselves."""
    edges = match_pairs(
        nodes,
        id_col=id_col,
        name_col=name_col,
        threshold=threshold,
        max_block_size=max_block_size,
    )
    comp = connected_components(
        edges, "id_a", "id_b", max_iter=max_iter, algorithm=algorithm
    ).select(F.col("node").alias("node_id"), F.col("component").alias("canonical_id"))
    all_ids = nodes.select(F.col(id_col).alias("node_id")).distinct()
    return all_ids.join(comp, "node_id", "left").select(
        "node_id", F.coalesce("canonical_id", "node_id").alias("canonical_id")
    )
