"""Taxonomic similarity over a class hierarchy: least common ancestor
(LCA) and Wu-Palmer similarity (Wu & Palmer, ACL'94 §2) for node
pairs — wup(a, b) = 2·depth(lca) / (depth(a) + depth(b)), depths
counted from the root.  This is the classic ontology-distance measure
an entity-linking pipeline uses to score how taxonomically close two
linked classes are (e.g. ranking candidate LMSS classes by closeness
to a conversation's dominant branch).

Input is a REFLEXIVE ancestor relation (node, anc, anc_depth): one row
per (node, ancestor) pair including (node, node, depth(node)), with
``anc_depth`` = the ancestor's own depth from the root (root = 1 by
the usual Wu-Palmer convention, which keeps the denominator positive).
``graph/closure.py transitive_closure(include_self=True)`` over the
subclass edges produces exactly the (node, anc) part; depths come from
the caller's hierarchy (min-depth map, or any exact integer rule).

Spark-first shape, and why it scales:

- candidate common ancestors = pairs ⋈ ancestors(a) ⋈ ancestors(b) on
  ancestor equality — two hash joins whose fan-out per pair is
  |anc(a) ∩ anc(b)|, bounded by hierarchy DEPTH (tens), never by
  hierarchy size;
- the LCA election is ONE map-side-combinable ``max(struct(depth,
  anc))`` aggregate per pair — deepest ancestor wins, ties broken by
  the GREATEST node id (deterministic; ties only exist under multiple
  inheritance, where the spec leaves the choice free — the DEPTH, and
  hence the similarity value, is tie-independent);
- depths of a and b ride in from the reflexive rows — no extra joins
  against a separate depth table;
- the only floating-point step is one division of small exact
  integers, bit-identical on any IEEE-754 engine — no float-sum
  ordering hazard, so the whole operator is value-oracle-checkable.

Pairs with NO common ancestor (forest inputs) are absent from the
output — surfaced, not silently scored 0; the caller chooses the
fill-in semantics.

Reference counterpart: the reference walks parent chains per-node in
Python for its branch map (`app/lmss_ontology.py`); pairwise
taxonomic similarity is part of the beyond-reference KG-analytics
mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wu_palmer(
    ancestors: DataFrame,
    pairs: DataFrame,
    *,
    node_col: str = "node",
    anc_col: str = "anc",
    depth_col: str = "anc_depth",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Wu-Palmer similarity for each (a, b) row of ``pairs`` over the
    reflexive ``ancestors`` relation.  Returns (a, b, lca, lca_depth,
    depth_a, depth_b, wup) — one row per input pair that has at least
    one common ancestor."""
    anc = ancestors.select(
        F.col(node_col).alias("node"),
        F.col(anc_col).alias("anc"),
        F.col(depth_col).alias("d"),
    )
    p = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))

    a_anc = p.join(anc, on=p["a"] == anc["node"]).select("a", "b", "anc", "d")
    b_anc = anc.select(
        F.col("node").alias("_bn"), F.col("anc").alias("_banc")
    )
    common = a_anc.join(
        b_anc,
        on=(F.col("b") == F.col("_bn")) & (F.col("anc") == F.col("_banc")),
    ).select("a", "b", "anc", "d")

    lca = common.groupBy("a", "b").agg(
        F.max(F.struct(F.col("d"), F.col("anc"))).alias("_lca")
    )

    # self rows carry each node's own depth
    self_d = anc.filter(F.col("node") == F.col("anc")).select(
        F.col("node").alias("_sn"), F.col("d").alias("_sd")
    )
    out = (
        lca.join(self_d, on=F.col("a") == F.col("_sn"))
        .select("a", "b", "_lca", F.col("_sd").alias("depth_a"))
        .join(self_d, on=F.col("b") == F.col("_sn"))
        .select(
            "a",
            "b",
            F.col("_lca.anc").alias("lca"),
            F.col("_lca.d").alias("lca_depth"),
            "depth_a",
            F.col("_sd").alias("depth_b"),
        )
    )
    return out.withColumn(
        "wup",
        (F.lit(2.0) * F.col("lca_depth"))
        / (F.col("depth_a") + F.col("depth_b")).cast("double"),
    )
