"""owl:sameAs resolution ("smushing"): collapse each sameAs-connected
identity group to one canonical IRI and rewrite the triple table so
every fact lands on the canonical node — the identity-consolidation
step a KG-construction pipeline runs after entity linking emits
equivalences between freshly-minted and pre-existing IRIs.

Semantics (the standard smushing contract, e.g. Hogan et al. "Scalable
OWL 2 Reasoning for Linked Data", and the sameAs handling in LDIF /
WebPIE):

- sameAs is symmetric + transitive: identity groups are the connected
  components of the sameAs graph.
- canonical id = MIN IRI of the group (natural string ordering) — a
  deterministic election, reproducible across engines and reruns.
- every triple's subject and object are rewritten to their canonical
  ids; PREDICATES are left untouched (property-position sameAs is
  outside the smushing contract and rare enough that silently rewriting
  predicates would surprise more than it helps — documented choice).
- the consumed sameAs triples are dropped from the output by default
  (their content now lives in the mapping); ``drop_sameas=False`` keeps
  them (rewritten like any other triple, so they collapse to canonical
  self-loops).

Scale shape (100 TB triples, sameAs graph ≪ instance data): the
component election runs on the sameAs edges ONLY (min-label propagation
or large-star/small-star from ops/components.py — diameter vs log-d
rounds, caller's pick).  The rewrite is two joins of the instance table
against the non-identity slice of the mapping — broadcast when the
mapping is dimension-sized (the default; entity-linking equivalences
are ontology-scale), shuffle hash joins otherwise
(``broadcast_mapping=False``).  The final ``distinct`` is semantics-
required (merging identities can make distinct facts collide) and is
the same dedup shuffle every KG load already pays.

Reference counterpart: none — the reference emits one IRI per linked
entity and never consolidates identities (`app/lmss_search.py` treats
each IRI as final); this operator is part of the beyond-reference
KG-construction mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.components import connected_components

SAMEAS_PRED = "owl:sameAs"


def sameas_mapping(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    sameas_pred: str = SAMEAS_PRED,
    algorithm: str = "propagation",
    max_iter: int | None = None,
) -> DataFrame:
    """(node, canonical) for every IRI touching a sameAs edge; canonical
    is the component's minimum IRI.  Includes the identity row of each
    elected canonical (node == canonical), so the mapping is total over
    group members.  Self-loops (x sameAs x) assert nothing and are
    filtered before the component run."""
    pairs = (
        triples.filter(F.col(p_col) == sameas_pred)
        .select(F.col(s_col).alias("src"), F.col(o_col).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
    )
    return connected_components(
        pairs, "src", "dst", max_iter=max_iter, algorithm=algorithm
    ).select("node", F.col("component").alias("canonical"))


def sameas_resolve(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    sameas_pred: str = SAMEAS_PRED,
    drop_sameas: bool = True,
    broadcast_mapping: bool = True,
    algorithm: str = "propagation",
    max_iter: int | None = None,
) -> DataFrame:
    """Rewrite ``triples`` onto canonical identities: returns (s, p, o)
    with subject/object replaced by their sameAs-component minimum,
    ``distinct`` (identity merges can collapse previously-distinct
    facts into one)."""
    mapping = (
        sameas_mapping(
            triples,
            s_col=s_col,
            p_col=p_col,
            o_col=o_col,
            sameas_pred=sameas_pred,
            algorithm=algorithm,
            max_iter=max_iter,
        )
        # only rows that actually rewrite; keeps the probe side minimal
        .filter(F.col("node") != F.col("canonical"))
        # read twice (s-side and o-side joins) and produced by an
        # iterative job — pin it instead of recomputing the fixpoint
        .localCheckpoint(eager=True)
    )
    if broadcast_mapping:
        mapping = F.broadcast(mapping)

    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    if drop_sameas:
        g = g.filter(F.col("p") != sameas_pred)

    s_map = mapping.select(
        F.col("node").alias("_s_node"), F.col("canonical").alias("_s_canon")
    )
    o_map = mapping.select(
        F.col("node").alias("_o_node"), F.col("canonical").alias("_o_canon")
    )
    return (
        g.join(s_map, g["s"] == s_map["_s_node"], "left")
        .join(o_map, g["o"] == o_map["_o_node"], "left")
        .select(
            F.coalesce("_s_canon", "s").alias("s"),
            F.col("p"),
            F.coalesce("_o_canon", "o").alias("o"),
        )
        .distinct()
    )
